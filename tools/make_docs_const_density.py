#!/usr/bin/env python3
"""Constant-DENSITY documents fixture for large-SF dedup probes.

make_sf.py scales the corpus by replicating every doc with a tiny text
suffix, so each doc's near-dup cluster size GROWS with the factor: at
factor 1000 every batch doc verifies against ~factor/split reference
near-dups, and every sf100 dedup measurement fights that artifact (the
"replicated-corpus density pathology" adjudicated in SCALE.md) instead
of measuring the operator. Real corpora don't densify as they grow —
they grow by NEW documents at roughly constant dup rates.

This tool grows the corpus on two axes:
  - GROUPS (new documents): group j rewrites the base text by
    interleaving a group token between every word
    (`replace(text, ' ', ' g<j> ')`), so group j's word 3-shingles all
    contain g<j> and share NOTHING with group j' or with the original —
    genuinely distinct documents, not near-dups;
  - REPLICAS (fixed density): within a group, replica r appends the
    same ' #r<r>' suffix make_sf.py uses — near-dups of each other.
Total factor = groups × replicas, with every doc's near-dup cluster
size pinned at `replicas` REGARDLESS of scale. Group texts (j > 0) are
~2x the base word count — heavier per doc than the replicated fixture,
which is fair for A/Bs that run both legs on this fixture.

Usage:
    python3 tools/make_docs_const_density.py /root/testdata/sf0.1 \
        /tmp/sfcd100 250 4     # 250 groups x 4 replicas = factor 1000

Writes documents.parquet only (the dedup probes read nothing else);
symlink the other tables from an existing SF dir if a probe's warmup
needs them.
"""
import sys, os
import duckdb

src, dst = sys.argv[1], sys.argv[2]
groups, replicas = int(sys.argv[3]), int(sys.argv[4])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
con.execute("SET max_expression_depth TO 1000000")
con.execute(f"SET memory_limit='{os.environ.get('MAKE_SF_MEM', '24GB')}'")
con.execute(f"SET threads TO {os.environ.get('MAKE_SF_THREADS', '16')}")
# doc_id order carries no pruning value for the dedup probes (signature
# scans read everything; splits are doc_id % m) — stream the union
con.execute("SET preserve_insertion_order=false")

KD = con.execute(
    f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]

terms = []
for j in range(groups):
    base = "text" if j == 0 else f"replace(text, ' ', ' g{j} ')"
    for r in range(replicas):
        shift = j * replicas + r
        text = base if r == 0 else f"{base} || ' #r{r}'"
        terms.append(
            f"SELECT doc_id + {shift}*{KD} AS doc_id, {text} AS text, "
            f"lang, source, length({text}) AS n_chars "
            f"FROM read_parquet('{src}/documents.parquet')")
sql = " UNION ALL ".join(terms)
con.execute(f"COPY ({sql}) TO '{dst}/documents.parquet' (FORMAT parquet)")
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()[0]
print(f"documents: {n} rows ({groups} groups x {replicas} replicas, "
      f"cluster size fixed at {replicas})")
