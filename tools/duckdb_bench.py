#!/usr/bin/env python3
"""Time DuckDB executing the oracle SQL for the headline queries at a given
SF (the single-node baseline our bench is compared to).

Methodology mirrors graft.Bench: one untimed cold run per query, then
three timed steady-state runs; the reported number is the MEDIAN of the
three. Output is a one-line JSON suitable for committing as
bench/duckdb_sf0.1.json (and the duckdb half of bench/sf1.json).

Usage: duckdb_bench.py <sf_dir> <oracle_sql.json> [runs=3]
  DUCKDB_BENCH_SKIP=q47_...  comma-separated queries to skip (q47's exact
  all-pairs oracle runs for hours at sf>=0.1).
  DUCKDB_BENCH_ONLY=q87_...  restrict to these queries (the duckdb half of
  a same-day ONLY-run re-measure pair — mirrors SPARK_GRAFT_BENCH_ONLY);
  recorded in the output's "only" field so a subset run is self-labeled.
"""
import json, os, statistics, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle = json.load(open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout/oracle_sql.json"))
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
skip = set(filter(None, os.environ.get("DUCKDB_BENCH_SKIP", "").split(",")))
only = set(filter(None, os.environ.get("DUCKDB_BENCH_ONLY", "").split(",")))
headline = ["q01_pricing_summary","q02_global_agg","q03_filter_topn","q05_join_agg",
  "q06_join_5way","q08_semi_join","q12_distinct_on","q16_window_topk_per_group",
  "q17_window_running_sum","q19_rollup","q25_date_parts","q28_in_subquery",
  "q33_events_hourly","q34_events_sessions","q36_events_funnel","q40_doc_tokens",
  "q44_dedup_exact","q46_ngram_jaccard","q47_minhash_lsh_neardup","q50_cosine_topk",
  "q52_embedding_near_dup","q53_multimodal_decode","q57_quality_signals",
  "q77_vocab_topk","q78_kmeans_step","q80_dup_ngram_spans","q81_bm25_search",
  "q87_paragraph_dedup"]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
total = 0.0
out = {}
for q in headline:
    if q not in oracle:
        continue
    if only and q not in only:
        continue
    if q in skip:
        out[q] = None
        continue
    try:
        con.execute(oracle[q]).fetchall()  # cold/warm-up, untimed
        times = []
        for _ in range(runs):
            t0 = time.time()
            con.execute(oracle[q]).fetchall()
            times.append(time.time() - t0)
        dt = statistics.median(times)
    except Exception as e:
        dt = -1.0
        print(f"{q}: ERROR {e}", file=sys.stderr)
    out[q] = round(dt, 3)
    if dt > 0: total += dt
sf = os.path.basename(sf_dir.rstrip("/")).lstrip("sf") or sf_dir
print(json.dumps({
    "engine": "duckdb", "version": duckdb.__version__, "sf": sf,
    "warm_runs": runs, "warm_stat": "median",
    **({"only": sorted(only)} if only else {}),
    "skipped": sorted(skip & set(headline)),
    "recipe": f"python3 tools/duckdb_bench.py {sf_dir} <oracle_sql.json> {runs}",
    "total": round(total, 2), "queries": out}))
