#!/usr/bin/env python3
"""Time DuckDB executing the oracle SQL for the headline queries at a given
SF (the single-node baseline our bench is compared to)."""
import json, os, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout/oracle_sql.json"))
# comma-separated query names to skip (e.g. q47: its oracle is exact
# all-pairs and runs for hours at sf>=0.1 — report it as skipped rather
# than hanging the baseline run)
skip = set(filter(None, os.environ.get("DUCKDB_BENCH_SKIP", "").split(",")))
headline = ["q01_pricing_summary","q02_global_agg","q03_filter_topn","q05_join_agg",
  "q06_join_5way","q08_semi_join","q12_distinct_on","q16_window_topk_per_group",
  "q17_window_running_sum","q19_rollup","q25_date_parts","q28_in_subquery",
  "q33_events_hourly","q34_events_sessions","q36_events_funnel","q40_doc_tokens",
  "q44_dedup_exact","q46_ngram_jaccard","q47_minhash_lsh_neardup","q50_cosine_topk",
  "q52_embedding_near_dup","q53_multimodal_decode","q57_quality_signals"]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
total = 0.0
out = {}
for q in headline:
    if q not in oracle:
        continue
    if q in skip:
        out[q] = None
        continue
    # same run-twice-time-second methodology as graft.Bench: the timed
    # number is the steady-state second run
    try:
        con.execute(oracle[q]).fetchall()
        t0 = time.time()
        con.execute(oracle[q]).fetchall()
        dt = time.time() - t0
    except Exception as e:
        dt = -1.0
        print(f"{q}: ERROR {e}", file=sys.stderr)
    out[q] = round(dt, 3)
    if dt > 0: total += dt
print(json.dumps({"total": round(total, 2), "queries": out}))
