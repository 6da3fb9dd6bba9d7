"""Joins — beyond the reference's broadcast lookups.

rsyslog has no general join (SURVEY.md §2.7): its lookup_table is a
broadcast hash/semi join and sparseArray a broadcast as-of lookup.  A
complete batch engine needs the both-sides-large cases too; these are
the portable Ray Data patterns:

- ``broadcast_join``  — small side via ray.put, pandas merge per batch
  (no shuffle; the lookup_table generalization to multi-column payloads)
- ``hash_join``       — both sides large: add ``bucket = hash(key) % B``
  to each side, tag provenance, union, ``groupby(bucket)`` once, and
  merge the two sides inside each bucket group.  ONE shuffle total;
  B is the parallelism knob; salt hot keys into sub-buckets if a single
  bucket outgrows a worker.
- ``asof_join``       — per-key ordered backward join (pd.merge_asof
  inside the per-key group) — the sparseArray range lookup generalized
  to a timestamped right side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _bucket_of(col: pd.Series, n_buckets: int) -> pd.Series:
    h = pd.util.hash_array(col.to_numpy())
    return pd.Series(h % np.uint64(n_buckets), index=col.index).astype("int64")


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "left"):
    """Join a Dataset against a small broadcast DataFrame."""
    import ray

    ref = ray.put(small_df)

    class M:
        def __init__(self):
            self._t = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self._t is None:
                self._t = ray.get(ref)
            return df.merge(self._t, on=on, how=how)

    return ds.map_batches(M(), batch_format="pandas")


def _schema_dict(ds) -> dict:
    """{column -> type string} for arrow- or pandas-backed Datasets."""
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    return {n: str(t) for n, t in zip(base.names, base.types)}


def _na_like(dtype_str: str, n: int) -> pd.Series:
    if dtype_str.startswith("int"):
        return pd.Series([pd.NA] * n, dtype="Int64")
    if dtype_str.startswith("float") or dtype_str.startswith("double"):
        return pd.Series([np.nan] * n, dtype="float64")
    if dtype_str.startswith("timestamp"):
        return pd.Series([pd.NaT] * n, dtype="datetime64[us]")
    return pd.Series([None] * n, dtype="object")


def _unify_tag(ds, side: str, on: str, n_buckets: int, missing: dict):
    """Add bucket+side columns and NA-typed columns for the other
    side's fields so the two Datasets union with one schema."""
    def fx(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        for colname, dtype_str in missing.items():
            df[colname] = _na_like(dtype_str, len(df))
        df["__b"] = _bucket_of(df[on], n_buckets)
        df["__side"] = side
        return df

    return ds.map_batches(fx, batch_format="pandas")


def hash_join(left, right, on: str, how: str = "inner",
              n_buckets: int = 32, suffixes=("_l", "_r")):
    """Partitioned hash join of two Datasets on one key column.

    Both sides are tagged and bucketed in a map pass, schema-unified
    (the other side's columns added as typed NAs so ``union`` sees one
    schema), unioned, then a single ``groupby(bucket)`` co-locates
    matching keys; each bucket group splits back into its two sides and
    merges with pandas.  Column sets must be disjoint apart from ``on``.
    """
    l_schema = _schema_dict(left)
    r_schema = _schema_dict(right)
    l_missing = {k: v for k, v in r_schema.items() if k not in l_schema}
    r_missing = {k: v for k, v in l_schema.items() if k not in r_schema}
    l_cols = [c for c in l_schema if c != on]
    r_cols = [c for c in r_schema if c != on]

    both = (_unify_tag(left, "l", on, n_buckets, l_missing)
            .union(_unify_tag(right, "r", on, n_buckets, r_missing)))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][[on] + l_cols]
        rg = g[g["__side"] == "r"][[on] + r_cols]
        return lg.merge(rg, on=on, how=how, suffixes=suffixes)

    return both.groupby("__b").map_groups(merge_bucket, batch_format="pandas")


def asof_join(left, right, key: str, ts: str, right_cols: list[str],
              n_buckets: int = 32, suffix: str = "_r"):
    """Backward as-of join per key: for each left row, the most recent
    right row with right.ts <= left.ts and the same key (pd.merge_asof
    inside co-located key buckets — the distributed form of the
    reference's sparseArray greatest-bound-below lookup)."""
    l_schema = _schema_dict(left)
    r_schema = _schema_dict(right)
    l_missing = {k: v for k, v in r_schema.items() if k not in l_schema}
    r_missing = {k: v for k, v in l_schema.items() if k not in r_schema}
    l_cols = list(l_schema)

    both = (_unify_tag(left, "l", key, n_buckets, l_missing)
            .union(_unify_tag(right, "r", key, n_buckets, r_missing)))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][l_cols].sort_values(ts)
        rg = (g[g["__side"] == "r"][[key, ts] + right_cols]
              .sort_values(ts))
        if lg.empty:
            return lg
        return pd.merge_asof(lg, rg, on=ts, by=key, direction="backward",
                             suffixes=("", suffix))

    return both.groupby("__b").map_groups(merge_bucket, batch_format="pandas")
