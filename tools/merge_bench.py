#!/usr/bin/env python3
"""Merge a graft.Bench JSON line and a duckdb_bench.py JSON into the
committed bench/sf{N}.json side-by-side artifact.

Usage: merge_bench.py <spark.json> <duck.json> <out.json> <sf> "<generated note>"

The comparable set is the intersection of successfully-measured queries
(value >= 0) present in BOTH engines, excluding the bench's `_bucketed`
plan variants (those are recorded separately under bucketed_variants).
`comparable_ex_q57` repeats the rollup without q57_quality_signals, the
one query where Spark is multiples FASTER than DuckDB — committed so the
headline ratio can be read without the flattering outlier.
"""
import json, sys

spark = json.load(open(sys.argv[1]))
duck = json.load(open(sys.argv[2]))
out_path, sf, note = sys.argv[3], sys.argv[4], sys.argv[5]

sq = {k: v for k, v in spark["queries"].items() if v is not None and v >= 0}
dq = {k: v for k, v in duck["queries"].items() if v is not None and v >= 0}
comparable = sorted(k for k in sq if k in dq and not k.endswith("_bucketed"))

def rollup(keys):
    s = sum(sq[k] for k in keys); d = sum(dq[k] for k in keys)
    return {"n": len(keys), "spark_sec": round(s, 2), "duckdb_sec": round(d, 2),
            "ratio": round(s / d, 2) if d else None}

bucketed = {}
for k, v in sq.items():
    if k.endswith("_bucketed") and k[:-9] in sq:
        bucketed[k[:-9]] = {"plain": sq[k[:-9]], "bucketed": v}

art = {
    "sf": float(sf) if "." in sf else int(sf),
    "generated": note,
    "recipe": ("python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf%s %d  "
               "# engines SEQUENTIAL on an idle box; 1 cold + 3 timed warm runs, median"
               % (sf, int(float(sf) * 10))),
    "spark": {"warm_runs": 3, "warm_stat": "median",
              "skipped": sorted(spark.get("skipped", [])),
              "queries": spark["queries"]},
    "duckdb": {"engine_version": duck.get("version", duck.get("engine_version", "1.0.0")),
               "warm_runs": 3, "warm_stat": "median",
               "skipped": sorted(duck.get("skipped", [])),
               "queries": duck["queries"]},
    "comparable": rollup(comparable),
    "bucketed_variants": bucketed,
    "comparable_ex_q57": rollup([k for k in comparable if k != "q57_quality_signals"]),
}
json.dump(art, open(out_path, "w"), indent=1)
print(out_path, art["comparable"], art["comparable_ex_q57"])
