#!/usr/bin/env python3
"""Generate a local sf1-scale dataset (~10x sf0.1) for scaling checks.

The driver's testdata is read-only and ships no generator, so sf1 is
synthesized by KEY-OFFSET REPLICATION of sf0.1: each table is replicated
R times with every identifier column shifted by r * (max_id + 1), which
preserves referential integrity across the star schema (an order's
customer exists in every replica under the same shifted key) and keeps
value distributions identical. Text/embedding payloads repeat verbatim —
at corpus scale duplicated content is realistic input for the dedup
family. Output: /tmp/testdata/sf1/*.parquet (never under /root/testdata,
which is read-only).

Usage: python3 tools/gen_sf1.py [replicas=10]
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/testdata/sf1"
R = int(sys.argv[1]) if len(sys.argv) > 1 else 10

# id columns to shift, per table (referential pairs share one offset base)
KEYS = {
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    # tiny fixed dimensions: copy a single instance
    "region": {},
    "nation": {},
}

def replicate_events(base):
    """events goes through pyarrow, NOT DuckDB: the driver's events.ts is
    timestamp[ns] with non-zero sub-microsecond components (99.9% of rows),
    and DuckDB 1.0 truncates ns->us on read, so a DuckDB COPY silently
    changes both the parquet logical type and the values. Sources.events
    reads ts with a forced LONG schema + nanosAsLong, so the ns logical
    type is load-bearing: a us file is misread 1000x off (the round-6 sf1
    oracle run failed 11 keys exactly this way)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    t = pq.read_table(f"{SRC}/events.parquet")
    reps = []
    for r in range(R):
        if r == 0:
            reps.append(t)
            continue
        shifted = t
        for col, key in (("event_id", "event_id"), ("user_id", "user_id")):
            i = shifted.column_names.index(col)
            shifted = shifted.set_column(
                i, col, pc.add(shifted.column(col), r * base[key]))
        reps.append(shifted)
    out = pa.concat_tables(reps)
    # format version 2.6 keeps timestamp[ns] instead of coercing to us
    pq.write_table(out, f"{DST}/events.parquet", version="2.6")
    print(f"events: {out.num_rows} rows (pyarrow, ns-preserving)")


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # one offset base per referenced key domain, from its owning table
    base = {}
    owners = {"o_orderkey": "orders", "p_partkey": "part", "s_suppkey": "supplier",
              "c_custkey": "customer", "event_id": "events", "user_id": "events",
              "doc_id": "documents", "vec_id": "embeddings"}
    for key, tbl in owners.items():
        base[key] = con.execute(
            f"SELECT max({key}) + 1 FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
    for tbl, keys in KEYS.items():
        if tbl == "events":
            replicate_events(base)
            continue
        src = f"'{SRC}/{tbl}.parquet'"
        if not keys:
            con.execute(f"COPY (SELECT * FROM {src}) TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        reps = []
        for r in range(R):
            sel = ", ".join(
                f"{c} + {r * base[keys[c]]} AS {c}" if c in keys else c
                for c in cols)
            reps.append(f"SELECT {sel} FROM {src}")
        con.execute(f"COPY ({' UNION ALL '.join(reps)}) TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{DST}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows")

if __name__ == "__main__":
    main()
