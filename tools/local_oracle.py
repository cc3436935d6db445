#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle check (SURVEY.md §5.2.5).

Usage: python3 tools/local_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> as a DuckDB view under its bare name, runs each oracle SQL, and
compares against the Spark result parquet at <verifyOutDir>/<key>/ —
rows sorted by all columns, columns sorted by name, values compared
STRICTLY (Decimal keeps exact scale — '4434.70' != '4434.7'; floats via
repr; timestamps -> iso). The driver's comparator coerces DuckDB decimals
to float64 while Spark parquet keeps exact Decimal objects, so any
DecimalType in a declared output hash-splits on trailing zeros — the
schema lint below fails decimal/list/float32 output columns outright.

This is dev tooling only (driver-side python env); the shipped Scala
library never depends on it.
"""
import json, sys, glob, math
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow as pa


def unsafe_fields(schema: "pa.Schema"):
    """Column types the driver's comparator cannot hash stably:
    decimal (exact scale vs float64 coercion), nested lists (pandas
    sort_values chokes on ndarray cells), float32 (repr drift vs the
    oracle's float64)."""
    bad = []
    for f in schema:
        t = f.type
        if (pa.types.is_decimal(t) or pa.types.is_list(t)
                or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)
                or t == pa.float32()):
            bad.append(f"{f.name}:{t}")
    return bad

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (np.floating,)):
            return repr(float(v))
    except ImportError:
        pass
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return str(v)  # exact, scale-preserving — the strict form
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for key, sql in sorted(oracle.items()):
        try:
            expected = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {key}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{key}/*.parquet")
        if not files:
            print(f"FAIL {key}: no spark result parquet")
            n_fail += 1
            continue
        bad = unsafe_fields(pq.read_schema(sorted(files)[0]))
        if bad:
            print(f"FAIL {key}: driver-unsafe output column types: {bad}")
            n_fail += 1
            continue
        actual = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        ce, ca = sorted(expected.columns), sorted(actual.columns)
        if ce != ca:
            print(f"FAIL {key}: columns differ: oracle={ce} spark={ca}")
            n_fail += 1
            continue
        re_, ra = canon(expected), canon(actual)
        if re_ == ra:
            print(f"PASS {key} ({len(ra)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {key}: rows differ (oracle {len(re_)} vs spark {len(ra)})")
            for i, (x, y) in enumerate(zip(re_, ra)):
                if x != y:
                    print(f"  first diff at row {i}:\n    oracle: {x}\n    spark : {y}")
                    break
            else:
                if len(re_) != len(ra):
                    longer, tag = (re_, "oracle") if len(re_) > len(ra) else (ra, "spark")
                    print(f"  extra {tag} row: {longer[min(len(re_), len(ra))]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
