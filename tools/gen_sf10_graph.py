#!/usr/bin/env python3
"""Generate LINEITEM-ONLY sf10 slices for the graph-family scale probe
(VERDICT r11 next #2: the dedup family has two decades of scale
evidence, the wedge-join family has one).

Two variants, because "10x a graph" means two different things:

- sf10graphx (BOTH keys offset): 10 DISJOINT copies — edge count x10,
  degree structure unchanged. The volume decade: does wedge-join
  runtime scale ~linearly with edges when hub shape is held constant?

- sf10graphd (l_orderkey offset ONLY, suppliers fixed): 10x the orders
  over the SAME 10k suppliers — every co-order pair count x10, so the
  minCount>=5 filter passes nearly every pair (4.54M edges vs 477k at
  sf1) and hub degrees explode. The densification decade: the
  degree-orientation bound (hub out-degree <= sqrt(2m)) is exactly
  what this stresses.

Usage: python3 tools/gen_sf10_graph.py   (requires /tmp/testdata/sf1)
"""
import os
import duckdb

SRC = "/tmp/testdata/sf1"
R = 10

con = duckdb.connect()
okbase = con.execute(
    f"SELECT max(l_orderkey) + 1 FROM '{SRC}/lineitem.parquet'").fetchone()[0]
skbase = con.execute(
    f"SELECT max(l_suppkey) + 1 FROM '{SRC}/lineitem.parquet'").fetchone()[0]

for name, extra in [
    ("sf10graphx", f"l_suppkey + r.range * {skbase} AS l_suppkey,"),
    ("sf10graphd", ""),
]:
    dst = f"/tmp/testdata/{name}"
    os.makedirs(dst, exist_ok=True)
    con.execute(f"""
      COPY (
        SELECT l.* REPLACE (
          l_orderkey + r.range * {okbase} AS l_orderkey{"," if extra else ""}
          {extra.rstrip(",")}
        )
        FROM '{SRC}/lineitem.parquet' l, range({R}) r
      ) TO '{dst}/lineitem.parquet' (FORMAT parquet)
    """)
    n = con.execute(f"SELECT count(*) FROM '{dst}/lineitem.parquet'").fetchone()[0]
    print(f"{name}: {n} rows -> {dst}")
