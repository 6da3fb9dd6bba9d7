"""Column profiling — ANALYZE / SUMMARIZE-style table statistics.

A 100 TB operator needs to characterize a table it is about to process
(row counts, null densities, cardinalities, value ranges) without a
full SQL engine: the reference exposes the same self-description need
through statsobj/impstats (runtime/statsobj.c — every object publishes
its counters), and interactive engines ship it as ``SUMMARIZE``.
This is the batch analog, composed of the repo's two standard shapes:

- **moments pass**: ONE wide partial row per batch — count, per-column
  null count and TYPED min/max (stringifying per batch would corrupt
  the reduce: ``"9" > "10"``).  The driver reduce is O(n_batches) tiny
  rows through pyarrow kernels (CLAUDE.md invariant 3: finals of
  combiner partials run on the driver).
- **ndv pass**: EXACT distinct counts via the 128-bit key shuffle
  (same collision argument as dedup.content_key128_frame: two
  independent 64-bit hashes keep the expected collision count at
  10^12 values ~1e-15).  Per batch each column emits its DISTINCT
  value keys only; a salted hash partition then counts distinct keys
  per (column, partition) and the driver sums O(columns x nparts)
  rows.  Values are cast to utf8 before hashing — Arrow's cast is
  injective per type (shortest-roundtrip for floats, ISO for
  timestamps), so distinctness is preserved; the raw values never
  shuffle.

Output (one row per column, sorted by name):
  col, cnt, nulls, ndv, min_s, max_s   (min/max rendered as strings
  AFTER the typed reduce; numeric str() matches DuckDB's
  CAST(x AS VARCHAR), which the q:table_profile oracle pins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import content_key128_frame

_NPART = 64


def _render(v) -> str | None:
    """min/max rendering pinned to DuckDB CAST(x AS VARCHAR)."""
    if v is None:
        return None
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_profile(ds, columns: list[str], *, nparts: int = _NPART
                  ) -> pd.DataFrame:
    """Profile ``columns`` of ``ds``; returns the per-column stats
    frame.  Ray must already be initialised by the caller."""
    import ray

    cols = list(columns)

    # ---- pass 1: moments — one wide typed partial row per batch
    def mpart(t: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {
            "__rows": pa.array([len(t)], pa.int64())}
        for c in cols:
            arr = t[c]
            out[c + "::nulls"] = pa.array([arr.null_count], pa.int64())
            vc = arr.drop_null()
            typ = t.schema.field(c).type
            if len(vc):
                mn, mx = pc.min(vc).as_py(), pc.max(vc).as_py()
            else:
                mn = mx = None
            out[c + "::min"] = pa.array([mn], typ)
            out[c + "::max"] = pa.array([mx], typ)
        return pa.table(out)

    parts = ds.map_batches(mpart, batch_format="pyarrow")
    tbl = pa.concat_tables(ray.get(parts.to_arrow_refs()),
                           promote_options="default")

    # ---- pass 2: exact ndv — distinct 128-bit keys, salted two-phase
    def dpart(t: pa.Table) -> pd.DataFrame:
        frames = []
        for c in cols:
            u = pc.unique(pc.cast(t[c].drop_null(), pa.string()))
            if not len(u):
                continue
            a, b = content_key128_frame(u.to_pandas())
            frames.append(pd.DataFrame(
                {"col": c, "kh": a, "kl": b,
                 "pp": (a.astype(np.uint64) % np.uint64(nparts))
                 .astype("int64")}))
        if not frames:
            return pd.DataFrame({"col": pd.Series([], dtype=object),
                                 "kh": pd.Series([], dtype="int64"),
                                 "kl": pd.Series([], dtype="int64"),
                                 "pp": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    def pcount(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g.drop_duplicates(["kh", "kl"]))
        return pd.DataFrame({"col": [g["col"].iloc[0]], "n": [n]})

    nd = (ds.map_batches(dpart, batch_format="pyarrow")
          .groupby(["col", "pp"]).map_groups(pcount, batch_format="pandas")
          .to_pandas())                       # O(columns x nparts) rows
    ndv = nd.groupby("col")["n"].sum() if len(nd) else pd.Series(dtype=int)

    # ---- driver reduce of the moments partials (typed, then rendered)
    rows = int(pc.sum(tbl["__rows"]).as_py() or 0)
    recs = []
    for c in cols:
        mn = pc.min(tbl[c + "::min"]).as_py()
        mx = pc.max(tbl[c + "::max"]).as_py()
        recs.append({
            "col": c,
            "cnt": rows,
            "nulls": int(pc.sum(tbl[c + "::nulls"]).as_py() or 0),
            "ndv": int(ndv.get(c, 0)),
            "min_s": _render(mn),
            "max_s": _render(mx),
        })
    out = pd.DataFrame(recs).sort_values("col").reset_index(drop=True)
    return out.astype({"cnt": "int64", "nulls": "int64", "ndv": "int64"})


def table_profile_oracle(df: pd.DataFrame, columns: list[str]
                         ) -> pd.DataFrame:
    """Per-column spec oracle (pandas, driver-side) for pytest."""
    recs = []
    for c in columns:
        s = df[c]
        nn = s.dropna()
        recs.append({
            "col": c,
            "cnt": len(s),
            "nulls": int(s.isna().sum()),
            "ndv": int(nn.nunique()),
            "min_s": _render(nn.min()) if len(nn) else None,
            "max_s": _render(nn.max()) if len(nn) else None,
        })
    out = pd.DataFrame(recs).sort_values("col").reset_index(drop=True)
    return out.astype({"cnt": "int64", "nulls": "int64", "ndv": "int64"})
