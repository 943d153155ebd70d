#!/usr/bin/env python3
"""Compose a final per-engine bench JSON as the per-query MINIMUM of
pass medians across several full/partial passes of the SAME methodology.

Why: the bench box exhibits roaming multi-second stall windows (SCALE.md
measurement notes) that inflate every query they cover; a median of 3
warm runs inside one window cannot see out of it. Running the pass
N times and taking each query's minimum pass-median selects, per query,
the window that agrees with its own scaling curve. Applied to BOTH
engines symmetrically — the per-pass inputs are preserved next to the
output for audit.

Usage: min_pass.py <out.json> <pass1.json> [pass2.json ...]
Pass files are graft.Bench one-line JSON or duckdb_bench.py JSON; the
first pass supplies all non-query metadata. null/negative (failed/
skipped) values never win the min; a query present in ANY pass appears
in the output (None if it never succeeded).
"""
import json, sys

out_path, paths = sys.argv[1], sys.argv[2:]
passes = [json.load(open(p)) for p in paths]
base = dict(passes[0])
names = []
for p in passes:
    for q in p["queries"]:
        if q not in names:
            names.append(q)
merged = {}
for q in names:
    vals = [p["queries"][q] for p in passes
            if p["queries"].get(q) is not None and p["queries"][q] >= 0]
    if vals:
        merged[q] = min(vals)
    elif any(p["queries"].get(q) is not None for p in passes):
        # errored in EVERY pass (-1): keep the -1 so the failure stays
        # visible in the merged artifact (merge_bench.py's invariant) —
        # dropping it would silently shrink the comparable set. A query
        # that only ever appeared as null (skipped) is still dropped:
        # skips are named in "skipped", and graft.Bench echoes these
        # files into its stdout tail where a null reads as a missing
        # measurement (the BENCH_r10 q47-null problem).
        merged[q] = -1
base["queries"] = merged
base["passes"] = len(paths)
base["pass_stat"] = "min of per-pass medians (stall-window guard; see SCALE.md)"
if "total" in base:
    base["total"] = round(sum(v for v in merged.values() if v and v > 0), 2)
if "value" in base:
    base["value"] = round(sum(v for v in merged.values() if v and v > 0), 3)
json.dump(base, open(out_path, "w"))
print(out_path, "queries:", len(merged))
