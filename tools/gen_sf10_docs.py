#!/usr/bin/env python3
"""Generate a DOCUMENTS-ONLY sf10 slice for the dedup-family scale probe
(VERDICT r10 next #6: the 10.9x-at-10x content-driven dedup ratios
deserve one more decade of evidence).

Same key-offset replication as gen_sf1.py, applied to sf1's documents
table (itself 10x sf0.1): doc_id shifts by r * (max_id + 1); text repeats
verbatim — at corpus scale duplicated content is realistic dedup input,
and it is exactly the regime that makes the dedup family's candidate
volume output-linear, which is what this probe measures.

Output: /tmp/testdata/sf10docs/documents.parquet (~500k docs). Only the
dedup keys run against it (SPARK_GRAFT_ONLY) — they read documents only.

Usage: python3 tools/gen_sf10_docs.py   (requires /tmp/testdata/sf1 first)
"""
import os
import duckdb

SRC = "/tmp/testdata/sf1"
DST = "/tmp/testdata/sf10docs"
R = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
base = con.execute(f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'").fetchone()[0]
con.execute(f"""
  COPY (
    SELECT d.doc_id + r.range * {base} AS doc_id, d.* EXCLUDE (doc_id)
    FROM '{SRC}/documents.parquet' d, range({R}) r
    ORDER BY doc_id
  ) TO '{DST}/documents.parquet' (FORMAT parquet)
""")
n = con.execute(f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
print(f"documents: {n} rows -> {DST}")
