#!/usr/bin/env python3
"""Patch ONE spark query value inside a COMBINED bench/sf{N}.json
artifact from ONLY-mode re-measure pass files, with provenance.

Like tools/patch_bench_query.py, but operating on the merged
side-by-side artifact (its "spark" sub-object) instead of a per-engine
min file — the shape used by same-day re-measure pairs (bench/sf1.json
r16/r18/r19 addenda). Appends to spark.patched, replaces the value with
the min of the ONLY-run pass medians, and appends a note to
"generated". Rollups (comparable/*) are recomputed only when the query
participates in them; a spark-only query (e.g. q47 — DuckDB skips its
all-pairs oracle) leaves every rollup untouched.

Usage:
  apply_only_patch.py <combined.json> <query> "<note>" <pass1.json> [...]
Writes in place.
"""
import json
import sys

path, q, note = sys.argv[1], sys.argv[2], sys.argv[3]
passes = [json.load(open(p)) for p in sys.argv[4:]]
vals = [p["queries"][q] for p in passes
        if p["queries"].get(q) is not None and p["queries"][q] >= 0]
assert vals, "no successful ONLY-run measurement of %s" % q
art = json.load(open(path))
old = art["spark"]["queries"].get(q)
new = min(vals)
art["spark"]["queries"][q] = new
art["spark"].setdefault("patched", []).append({
    "query": q, "old": old, "new": new,
    "method": "replaced by min of %d ONLY-run pass medians "
              "(shipped-shape re-measure; stale value never wins a min)"
              % len(vals)})
art["generated"] = art.get("generated", "") + " | " + note

# comparable rollups store only totals + n, not the member list, so a
# participating query forces a full re-merge instead of an in-place
# patch — assert the spark-only case this tool exists for.
dq = art.get("duckdb", {}).get("queries", {})
assert q not in dq or dq[q] is None or dq[q] < 0, (
    "%s participates in the comparable rollups — re-merge with "
    "tools/merge_bench.py instead of patching in place" % q)
json.dump(art, open(path, "w"), indent=1)
print("%s: %s -> %s (from %d passes)" % (q, old, new, len(vals)))
