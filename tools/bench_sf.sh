#!/bin/bash
# Run the full side-by-side bench at one SF: Spark (graft.Bench) then
# DuckDB (tools/duckdb_bench.py) SEQUENTIALLY on an idle box, then merge
# into bench/sf${SF}.json. Usage:
#   tools/bench_sf.sh <sfDir> <sfLabel> "<note>" [extra skip queries]
# Env: SPARK_GRAFT_SKIP_BUCKETS=1 to skip bucketed variants.
set -e
cd "$(dirname "$0")/.."
SFDIR=$1; SF=$2; NOTE=$3
SKIP=${4:-q47_minhash_lsh_neardup}
ORACLE=${ORACLE_JSON:-/tmp/vout/oracle_sql.json}

SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_BENCH_SKIP=$SKIP \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf${SF}_spark.log 2>&1
grep -o '{"metric.*' /tmp/bench_sf${SF}_spark.log | tail -1 > /tmp/bench_sf${SF}_spark.json

DUCKDB_BENCH_SKIP=$SKIP python3 tools/duckdb_bench.py "$SFDIR" "$ORACLE" 3 \
  > /tmp/bench_sf${SF}_duck.json 2>/tmp/bench_sf${SF}_duck.err

python3 tools/merge_bench.py /tmp/bench_sf${SF}_spark.json \
  /tmp/bench_sf${SF}_duck.json bench/sf${SF}.json "$SF" "$NOTE"
python3 -c "
import json; d=json.load(open('bench/sf${SF}.json'))
print('sf${SF} comparable', d['comparable']); print('ex_q57', d['comparable_ex_q57'])"
