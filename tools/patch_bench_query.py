#!/usr/bin/env python3
"""Overwrite ONE query's value in a merged per-engine bench JSON with the
min of pass-medians from dedicated SPARK_GRAFT_BENCH_ONLY re-measure
passes.

Why: when a query's shipped plan shape changes after a full campaign, the
committed artifact still measures the OLD shape (BENCH_r14 carried the
round-13 q44v2 numbers after q44v4 shipped). Re-running the whole
campaign for one query is wasteful; re-running that query alone (Bench
ONLY mode — same box, same files, same cold+3-warm-median methodology)
and REPLACING its value keeps the artifact honest about what the shipped
code does. REPLACING, not min'ing against the stale number: the old value
measured a plan that no longer exists, so letting it win the min would
report a shape the engine cannot produce. The only-run pass files are
committed next to the full passes for audit, and the replacement is
recorded in the output's "patched" list.

Usage: patch_bench_query.py <merged.json> <out.json> <query> <pass1.json> [...]
"""
import json
import sys

merged_p, out_p, q = sys.argv[1], sys.argv[2], sys.argv[3]
passes = [json.load(open(p)) for p in sys.argv[4:]]
vals = [p["queries"][q] for p in passes
        if p["queries"].get(q) is not None and p["queries"][q] >= 0]
assert vals, "no successful ONLY-run measurement of %s" % q
m = json.load(open(merged_p))
old = m["queries"].get(q)
m["queries"][q] = min(vals)
m.setdefault("patched", []).append({
    "query": q, "old": old, "new": min(vals),
    "method": "replaced by min of %d ONLY-run pass medians "
              "(shipped-shape re-measure; stale value never wins a min)"
              % len(vals)})
for k in ("total", "value"):
    if k in m:
        m[k] = round(sum(v for v in m["queries"].values() if v and v > 0), 3)
json.dump(m, open(out_p, "w"))
print("%s: %s -> %s (from %d passes)" % (q, old, min(vals), len(vals)))
