"""Local mimic of the driver's correctness gate.

Runs every queries() entry against its oracle_sql() on the same parquet
tables and compares row count, column names, and order-insensitive
values.  Usage:  python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("Int", "int", "uint")):
            df[c] = pd.to_numeric(df[c]).astype("int64")
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def driver_hash(df: pd.DataFrame) -> tuple:
    """Dtype-SENSITIVE value hash approximating the driver's gate: the
    tolerant compare below hid the HUGEINT-vs-int64 oracle mismatches
    round 1 (values equal, hashes differ).  Columns sorted by name,
    rows sorted, datetimes normalized to us (the driver demonstrably
    tolerates tz-less datetime width), ints/floats NOT coerced."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) == "string":
            df[c] = df[c].astype(object)
        elif str(df[c].dtype).startswith(("Int", "UInt")):
            df[c] = df[c].astype("int64")  # nullable-int wrapper only
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return tuple(int(pd.util.hash_pandas_object(df[c], index=False).sum())
                 for c in df.columns)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, sqls = e.queries(), e.oracle_sql()
    # tail entries past the 50-query driver window may still carry a
    # local DuckDB oracle — check those with the same rigor
    from rsyslog_ray.pipelines.queries import SQL_TAIL
    sqls = {**SQL_TAIL, **sqls}

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            raw_got = to_pandas(fn(sf_dir))
            got = normalize(raw_got.copy())
        except Exception as ex:
            print(f"FAIL {name}: ray error: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(got)} rows, no oracle)")
            continue
        try:
            raw_want = con.sql(sqls[name]).df()
            want = normalize(raw_want.copy())
        except Exception as ex:
            print(f"FAIL {name}: sql error: {ex}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, atol=1e-6)
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex).splitlines()[-1]}")
            failures += 1
            continue
        if driver_hash(raw_got) != driver_hash(raw_want):
            dg = {c: str(raw_got[c].dtype) for c in raw_got.columns}
            dw = {c: str(raw_want[c].dtype) for c in raw_want.columns}
            print(f"FAIL {name}: values match but dtype-sensitive hash "
                  f"differs (engine {dg} vs oracle {dw})")
            failures += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
