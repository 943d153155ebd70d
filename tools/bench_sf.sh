#!/bin/bash
# Run the full side-by-side bench at one SF: N full Spark passes, then N
# full DuckDB passes, SEQUENTIALLY on an idle box; per-engine per-query
# MIN of pass-medians (tools/min_pass.py — the stall-window guard, see
# SCALE.md measurement notes); merge into bench/sf${SF}.json. Pass
# inputs are committed under bench/passes/sf${SF}/ for audit.
# Usage:
#   tools/bench_sf.sh <sfDir> <sfLabel> "<note>" [sparkSkip] [duckSkip]
# Env: PASSES=2; SPARK_GRAFT_SKIP_BUCKETS=1 to skip bucketed variants;
#      ORACLE_JSON for the duckdb side's oracle SQL;
#      PASS_OFFSET=N to EXTEND an existing campaign (pass files are
#      written at indices N+1..N+PASSES instead of overwriting 1..PASSES;
#      the final merge globs ALL pass files either way).
set -e
cd "$(dirname "$0")/.."
SFDIR=$1; SF=$2; NOTE=$3
# A skip arg without its partner is almost always a stale 4-arg caller
# from before $4 changed meaning (was: both-engine skip) — fail loudly
# rather than silently running q47 on one engine only.
if [ $# -eq 4 ]; then
  echo "bench_sf.sh: pass BOTH [sparkSkip] and [duckSkip] (use '' for none);" >&2
  echo "  \$4 is spark-only since round 11 — a lone 4th arg silently drops" >&2
  echo "  the DuckDB skip list." >&2
  exit 2
fi
# Default the Spark side to skipping q47 too: it is the quadratic
# near-dup query (the committed sf30/sf100 passes always skip it), and
# an accidental default invocation at a replicated SF must not run it.
# Small-SF campaigns that WANT q47 pass an explicit '' — hence the
# colon-less ${4-...}: substitute only when UNSET, not when empty.
SPARK_SKIP=${4-q47_minhash_lsh_neardup}
DUCK_SKIP=${5-q47_minhash_lsh_neardup}
PASSES=${PASSES:-2}
ORACLE=${ORACLE_JSON:-/tmp/vout/oracle_sql.json}
mkdir -p bench/passes/sf${SF}

for n in $(seq 1 $PASSES); do
  i=$((n + ${PASS_OFFSET:-0}))
  # CANARY-GATED pass (round 19): graft.Bench runs the fixed canary pair
  # (q06 shuffle-heavy + q57 scan control) against the committed curve
  # BEFORE measuring; inside a degradation window it prints a
  # {"canary":"FAIL",...} line and records nothing. Wait out the window
  # and retry (the documented windows are multi-minute); a campaign that
  # cannot find a clean window within the retry budget aborts rather
  # than committing poisoned passes.
  ok=0
  for attempt in $(seq 1 ${CANARY_RETRIES:-8}); do
    SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_BENCH_SKIP=$SPARK_SKIP \
      SPARK_GRAFT_CANARY=1 \
      sbt -batch "runMain graft.Bench" > /tmp/bench_sf${SF}_spark_p$i.log 2>&1 || true
    if grep -q '"canary":"FAIL"' /tmp/bench_sf${SF}_spark_p$i.log; then
      echo "pass $i attempt $attempt: canary refused (degradation window):" >&2
      grep -o '"canary":"FAIL".*' /tmp/bench_sf${SF}_spark_p$i.log | tail -1 >&2
      sleep ${CANARY_WAIT:-120}
      continue
    fi
    # any other failure is a real error — surface the log tail and stop
    if ! grep -q '"metric":"total"' /tmp/bench_sf${SF}_spark_p$i.log; then
      echo "pass $i failed (not a canary refusal):" >&2
      tail -20 /tmp/bench_sf${SF}_spark_p$i.log >&2
      exit 1
    fi
    ok=1; break
  done
  if [ $ok -ne 1 ]; then
    echo "pass $i: canary never cleared after ${CANARY_RETRIES:-8} attempts — aborting campaign" >&2
    exit 3
  fi
  # capture the FILE artifact, not the compact stdout line: the file
  # carries the skip list, cold runs, bucket-setup time, and the canary
  # readings proving the pass was taken in a clean window — the compact
  # line omits "skipped" (driver-tail size budget), which left merged
  # artifacts recording skipped queries as silently absent.
  cp bench/last_run_sf${SF}.json bench/passes/sf${SF}/spark_pass$i.json
done
for n in $(seq 1 $PASSES); do
  i=$((n + ${PASS_OFFSET:-0}))
  DUCKDB_BENCH_SKIP=$DUCK_SKIP python3 tools/duckdb_bench.py "$SFDIR" "$ORACLE" 3 \
    > bench/passes/sf${SF}/duck_pass$i.json 2>/tmp/bench_sf${SF}_duck_p$i.err
done

python3 tools/min_pass.py /tmp/bench_sf${SF}_spark_min.json \
  bench/passes/sf${SF}/spark_pass*.json
python3 tools/min_pass.py /tmp/bench_sf${SF}_duck_min.json \
  bench/passes/sf${SF}/duck_pass*.json
python3 tools/merge_bench.py /tmp/bench_sf${SF}_spark_min.json \
  /tmp/bench_sf${SF}_duck_min.json bench/sf${SF}.json "$SF" "$NOTE"
python3 -c "
import json; d=json.load(open('bench/sf${SF}.json'))
print('sf${SF} comparable', d['comparable']); print('ex_q57', d['comparable_ex_q57'])"
