#!/usr/bin/env python3
"""Scale a testdata SF directory by key-shifted replication — for
BENCHMARKING only (correctness gates always run on the driver-generated
SFs). Usage:

    python3 tools/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10

Per replica i, every fact-table key is shifted by i*(max_key+1) so join
relationships hold within a replica and never cross replicas (join
selectivity and per-key cardinalities are preserved; output cardinalities
scale linearly). Dimension tables (nation, region) are shared, matching
how dims behave under real scale-up. Document text gets a short
per-replica suffix so replicas are near- (not exact-) duplicates —
keeping exact-dedup and MinHash workloads honest instead of planting
factor-sized exact-dup clusters.
"""
import sys, os
import duckdb

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
# Driver testdata carries UTC-adjusted parquet timestamps (Spark reads
# them as TimestampType); plain DuckDB TIMESTAMP would round-trip as
# isAdjustedToUTC=false -> TIMESTAMP_NTZ in Spark. Cast through
# TIMESTAMPTZ under a UTC session so the replicas keep the same types.
con.execute("SET TimeZone='UTC'")
# A factor-1000 replication is a 1000-way UNION ALL; DuckDB's default
# parser depth limit (1000) rejects it.
con.execute("SET max_expression_depth TO 100000")
con.execute(f"SET memory_limit='{os.environ.get('MAKE_SF_MEM', '24GB')}'")
con.execute(f"SET threads TO {os.environ.get('MAKE_SF_THREADS', '16')}")
# Stream the COPY for tables too big to buffer: with order preservation
# on, a factor-10 union of a 60M-row lineitem buffered ~100 GB before
# writing a byte (observed on the round-10 box; near-OOM next to a
# concurrently-running 32g bench JVM). But order preservation MATTERS
# for every table with key- or time-clustered access: scrambling sf100's
# embeddings cost q52's vec_id row-group pruning 5-8x (min/max stats
# became useless). So: stream (unordered) only the tables whose union
# cannot fit the memory limit; everything else keeps replica order.
# Default UNORDERED set is COMPUTED per table from the estimated union
# size vs the memory limit, not a static list: a static 'lineitem'
# default silently scrambled small-factor regenerations too, losing the
# orderkey/shipdate clustering (row-group pruning, map-side combine)
# at factors whose union fits memory fine. In-memory expansion measured
# on the round-10 box: a factor-1000 union of the 10.8 MB sf0.1
# lineitem buffered ~100 GB before writing (~9x parquet bytes); stream
# only when parquet_bytes * factor * 9 exceeds the memory limit.
_mem_s = os.environ.get('MAKE_SF_MEM', '24GB')
_mem_bytes = float(_mem_s.rstrip('GBgb')) * (1 << 30)
def _est_unordered():
    out = set()
    for f in os.listdir(src):
        if f.endswith('.parquet'):
            t = f[:-8]
            if os.path.getsize(os.path.join(src, f)) * factor * 9 > _mem_bytes:
                out.add(t)
    return out
_unordered_env = os.environ.get('MAKE_SF_UNORDERED')
UNORDERED = (set(_unordered_env.split(',')) if _unordered_env is not None
             else _est_unordered())
if UNORDERED:
    print(f"unordered (streamed) tables: {sorted(UNORDERED)}")
ONLY = set(filter(None, os.environ.get('MAKE_SF_ONLY', '').split(',')))

def mx(table, col):
    return con.execute(
        f"SELECT max({col})+1 FROM read_parquet('{src}/{table}.parquet')").fetchone()[0]

KO = mx('orders', 'o_orderkey')
KC = mx('customer', 'c_custkey')
KP = mx('part', 'p_partkey')
KS = mx('supplier', 's_suppkey')
KE = mx('events', 'event_id')
KU = mx('events', 'user_id')
KD = mx('documents', 'doc_id')
KV = mx('embeddings', 'vec_id')

def rep(table, tmpl):
    if ONLY and table not in ONLY:
        print(f"{table}: skipped (MAKE_SF_ONLY)")
        return
    con.execute(f"SET preserve_insertion_order={'false' if table in UNORDERED else 'true'}")
    sql = " UNION ALL ".join(tmpl.format(i=i) for i in range(factor))
    con.execute(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT parquet)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

rep('lineitem',
    f"SELECT l_orderkey + {{i}}*{KO} AS l_orderkey, l_partkey + {{i}}*{KP} AS l_partkey, "
    f"l_suppkey + {{i}}*{KS} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    f"l_discount, l_tax, l_returnflag, l_linestatus, CAST(l_shipdate AS TIMESTAMPTZ) AS l_shipdate "
    f"FROM read_parquet('{src}/lineitem.parquet')")
rep('orders',
    f"SELECT o_orderkey + {{i}}*{KO} AS o_orderkey, o_custkey + {{i}}*{KC} AS o_custkey, "
    f"o_orderstatus, o_totalprice, CAST(o_orderdate AS TIMESTAMPTZ) AS o_orderdate, o_orderpriority "
    f"FROM read_parquet('{src}/orders.parquet')")
rep('customer',
    f"SELECT c_custkey + {{i}}*{KC} AS c_custkey, c_name, c_nationkey, c_acctbal, "
    f"c_mktsegment FROM read_parquet('{src}/customer.parquet')")
rep('part',
    f"SELECT p_partkey + {{i}}*{KP} AS p_partkey, p_name, p_brand, p_type, p_size, "
    f"p_retailprice FROM read_parquet('{src}/part.parquet')")
rep('supplier',
    f"SELECT s_suppkey + {{i}}*{KS} AS s_suppkey, s_name, s_nationkey, s_acctbal "
    f"FROM read_parquet('{src}/supplier.parquet')")
rep('events',
    f"SELECT event_id + {{i}}*{KE} AS event_id, CAST(ts AS TIMESTAMPTZ) AS ts, user_id + {{i}}*{KU} AS user_id, "
    f"event_type, value, props FROM read_parquet('{src}/events.parquet')")
rep('documents',
    f"SELECT doc_id + {{i}}*{KD} AS doc_id, "
    f"CASE WHEN {{i}} = 0 THEN text ELSE text || ' #r{{i}}' END AS text, "
    f"lang, source, "
    # keep n_chars consistent with the suffixed text (replica suffix adds
    # len(' #rN') chars), so n_chars-derived metrics stay truthful
    f"n_chars + CASE WHEN {{i}} = 0 THEN 0 ELSE length(' #r{{i}}') END AS n_chars "
    f"FROM read_parquet('{src}/documents.parquet')")
rep('embeddings',
    f"SELECT vec_id + {{i}}*{KV} AS vec_id, embedding, label "
    f"FROM read_parquet('{src}/embeddings.parquet')")

for t in ('nation', 'region'):
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
    print(f"{t}: copied")
print("done:", dst)
