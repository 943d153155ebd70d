#!/usr/bin/env python3
"""Fixed-row, variable-universe long-tail token corpus for the
heavy-hitters two-regime benchmark (Probe hhvocab mode).

The SF replication in make_sf.py multiplies COUNTS, never the key
UNIVERSE, so the bench corpus can't exercise the regime where "shuffle
one row per distinct key" (q77's exact shape) becomes the bottleneck.
This generator holds the row count fixed and sweeps the universe:

    python3 tools/make_vocab.py /tmp/vocab 1e8 1e4 1e5 1e6 1e7

writes tokens_u{U}.parquet, each N rows of a single `word` column with a
log-uniform (Zipf-like, s≈1) rank distribution: rank = ceil(U^uniform)
lands on ranks 2..U with P(rank=m) = ln(m/(m-1))/ln(U) — rank 1 itself
is (almost) never drawn since U^u > 1 for u > 0, so the head is rank 2
at ~ln(2)/ln(U) of all rows (~4.3% at U=1e7), decaying as ~1/(m ln U)
down the tail — the standard token-frequency shape. The true top-k is
deeply inside the MG exactness bound N/(capacity+1) at every swept U.
"""
import sys, os
import duckdb

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vocab"
n = int(float(sys.argv[2])) if len(sys.argv) > 2 else 100_000_000
universes = [int(float(u)) for u in sys.argv[3:]] or [
    10_000, 100_000, 1_000_000, 10_000_000]

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.environ.get('MAKE_VOCAB_THREADS', '16')}")
con.execute("SELECT setseed(0.42)")
for u in universes:
    path = os.path.join(dst, f"tokens_u{u}.parquet")
    con.execute(
        f"COPY (SELECT 'w' || CAST(CEIL(POW({u}, RANDOM())) AS BIGINT) AS word "
        f"FROM range({n})) TO '{path}' (FORMAT PARQUET)")
    distinct = con.execute(
        f"SELECT count(DISTINCT word) FROM read_parquet('{path}')").fetchone()[0]
    print(f"{path} rows={n} universe={u} distinct={distinct}")
