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


# ---- Bloom join pruning -------------------------------------------------
# A fixed-size Bloom filter of the right side's join keys, broadcast
# once (ray.put), prunes definitely-unmatched LEFT rows before they
# enter the join shuffle — the classic runtime filter.  False
# positives only cost shuffled rows, never correctness; false
# negatives cannot happen (every right key sets its bits).

_JB_SEEDS = (np.uint64(0x9E3779B97F4A7C15),
             np.uint64(0xBF58476D1CE4E5B9),
             np.uint64(0x94D049BB133111EB))


def _jb_mix(u: np.ndarray) -> np.ndarray:
    u = (u ^ (u >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    u = (u ^ (u >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return u ^ (u >> np.uint64(31))


def key_bloom(ds, col, m_bits: int = 1 << 23) -> np.ndarray:
    """Packed-bitmap Bloom filter of a Dataset's key column (or
    composite key — pass a list): per-batch fixed-size partials
    OR-reduced on the driver (O(m_bits) driver memory — 1 MiB at the
    default — regardless of key count)."""
    cols = [col] if isinstance(col, str) else list(col)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits, dtype=bool)
        h = _multi_hash(df, cols)
        for s in _JB_SEEDS:
            bits[(_jb_mix(h ^ s) % np.uint64(m_bits)).astype(np.int64)] \
                = True
        return pd.DataFrame(
            {"bloom": [np.packbits(bits, bitorder="little").tobytes()]})

    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    parts = ds.map_batches(partial, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for buf in b["bloom"]:
            bloom |= np.frombuffer(buf, dtype=np.uint8)
    return bloom


def bloom_mask(col, bloom: np.ndarray,
               m_bits: int) -> np.ndarray:
    """Per-row might-match mask against :func:`key_bloom`'s bitmap —
    True for every key actually present (no false negatives).
    ``col`` is a Series or a key-column DataFrame (composite)."""
    h = (_multi_hash(col, list(col.columns))
         if isinstance(col, pd.DataFrame)
         else pd.util.hash_array(col.to_numpy()))
    keep = np.ones(len(col), dtype=bool)
    for s in _JB_SEEDS:
        pos = (_jb_mix(h ^ s) % np.uint64(m_bits)).astype(np.int64)
        keep &= ((bloom[pos >> 3] >> (pos & 7)) & 1).astype(bool)
    return keep


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


def as_typed_empty(df: pd.DataFrame):
    """Zero-row pandas frames become ARROW tables on the way out of a
    batch fn: Ray's pandas block layer size-estimates object columns
    with ``np.vectorize`` (which throws on size-0 input, spamming
    'Error calculating size' per empty block) and registers the block
    schema-less either way — an arrow return skips the estimator
    entirely.  Non-empty (or unconvertible) frames pass through."""
    import pyarrow as pa

    try:
        return pa.Table.from_pandas(df, preserve_index=False)
    except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError):
        return df


def _na_like(dtype_str: str, n: int) -> pd.Series:
    if dtype_str.startswith("int"):
        return pd.Series([pd.NA] * n, dtype="Int64")
    if dtype_str.startswith("float") or dtype_str.startswith("double"):
        return pd.Series([np.nan] * n, dtype="float64")
    if dtype_str.startswith("timestamp"):
        return pd.Series([pd.NaT] * n, dtype="datetime64[us]")
    return pd.Series([None] * n, dtype="object")


def _unify_tag(ds, side: str, on: str, n_buckets: int, missing: dict,
               order: list[str] | None = None):
    """Add bucket+side columns and NA-typed columns for the other
    side's fields so the two Datasets union with one schema; ``order``
    pins a canonical column order across both sides (schema-drift
    hygiene), and zero-row outputs leave as arrow."""
    def fx(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        for colname, dtype_str in missing.items():
            df[colname] = _na_like(dtype_str, len(df))
        df["__b"] = _bucket_of(df[on], n_buckets)
        df["__side"] = side
        if order is not None:
            df = df[order]
        return df if len(df) else as_typed_empty(df)

    return ds.map_batches(fx, batch_format="pandas")


_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _multi_hash(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """Order-sensitive combined uint64 hash of one or more key
    columns (golden-ratio chain — same mix as ndv_by_key)."""
    h = pd.util.hash_array(df[cols[0]].to_numpy())
    for c in cols[1:]:
        h = h * np.uint64(0x9E3779B97F4A7C15) \
            + pd.util.hash_array(df[c].to_numpy())
    return h


def hash_join(left, right, on, how: str = "inner",
              n_buckets: int = 32, suffixes=("_l", "_r"),
              hot_keys=None, hot_salts: int = 8,
              bloom_bits: int | None = None):
    """Partitioned hash join of two Datasets on one key column or a
    COMPOSITE key (``on`` a list) — composite keys bucket by the
    chained hash of every key column, and the per-bucket merge keys
    on all of them.

    Both sides are tagged and bucketed in a map pass, schema-unified
    (the other side's columns added as typed NAs so ``union`` sees one
    schema), unioned, then a single ``groupby(bucket)`` co-locates
    matching keys; each bucket group splits back into its two sides and
    merges with pandas.  Column sets must be disjoint apart from ``on``.

    Skew handling (``hot_keys``): a key carrying a constant fraction
    of the left side would land its entire row mass in ONE bucket —
    one worker.  Passing its value(s) salts the join: each hot LEFT
    row goes to one of ``hot_salts`` sub-buckets, and the hot RIGHT
    rows replicate into every sub-bucket, so each (l, r) pair still
    meets exactly once while the hot key's left mass spreads over
    ``hot_salts`` workers (the classic replicate-small-side salt;
    assumes the right side's per-hot-key rows are the modest side).
    Detect candidates with ``sketch.heavy_hitters(ds, on)`` — bounded
    memory at any key cardinality.  Inner/left joins only (replication
    would duplicate right_only rows of an outer join)."""
    ons = [on] if isinstance(on, str) else list(on)
    hot = {str(k) for k in (hot_keys or ())}
    if hot and how not in ("inner", "left"):
        raise ValueError("hot_keys salting supports inner/left joins")
    if hot and len(ons) > 1:
        raise ValueError("hot_keys salting supports single-key joins")
    n_salt = max(1, int(hot_salts))

    if bloom_bits:
        # runtime filter: Bloom of right keys (one extra pass over the
        # smaller side) prunes definitely-unmatched left rows BEFORE
        # the shuffle — inner joins only (other kinds keep unmatched
        # left rows).  False positives pass through to the exact merge.
        if how != "inner":
            raise ValueError("bloom_bits prefilter requires how='inner'")
        import ray

        bf_ref = ray.put(key_bloom(right, ons, bloom_bits))
        _mb = int(bloom_bits)

        def prefilter(df: pd.DataFrame) -> pd.DataFrame:
            bf = ray.get(bf_ref)
            return df[bloom_mask(df[ons], bf, _mb)]

        left = left.map_batches(prefilter, batch_format="pandas")

    l_schema = _schema_dict(left)
    r_schema = _schema_dict(right)
    l_missing = {k: v for k, v in r_schema.items() if k not in l_schema}
    r_missing = {k: v for k, v in l_schema.items() if k not in r_schema}
    l_cols = [c for c in l_schema if c not in ons]
    r_cols = [c for c in r_schema if c not in ons]

    # canonical transport layout for the union: both sides emit the
    # SAME column order, and int columns that ride as typed NA on one
    # side are nullable Int64 on BOTH (mixed int64/Int64 blocks and
    # side-dependent column orders are exactly the schema-drift noise
    # the streaming executor warns about)
    order = ons + l_cols + r_cols + ["__s", "__b", "__side"]
    int_unify = {c for c, t in {**l_missing, **r_missing}.items()
                 if t.startswith("int")}

    def tag(side: str, missing: dict):
        def fx(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            for colname, dtype_str in missing.items():
                df[colname] = _na_like(dtype_str, len(df))
            for colname in int_unify:
                if str(df[colname].dtype).startswith("int"):
                    df[colname] = df[colname].astype("Int64")
            if hot:
                ish = df[ons[0]].astype(str).isin(hot).to_numpy()
                if side == "l":
                    s = np.where(
                        ish, np.arange(len(df)) % n_salt, 0)
                    df["__s"] = s.astype("int64")
                else:
                    df["__s"] = np.int64(0)
                    if ish.any():
                        reps = [df]
                        hot_rows = df[ish]
                        for j in range(1, n_salt):
                            r = hot_rows.copy(deep=False)
                            r["__s"] = np.int64(j)
                            reps.append(r)
                        df = pd.concat(reps, ignore_index=True)
            else:
                df["__s"] = np.int64(0)
            h = _multi_hash(df, ons)
            b = (h + df["__s"].to_numpy().astype("uint64") * _GOLD) \
                % np.uint64(n_buckets)
            df["__b"] = b.astype("int64")
            df["__side"] = side
            return df[order] if len(df) else as_typed_empty(df[order])
        return fx

    both = (left.map_batches(tag("l", l_missing), batch_format="pandas")
            .union(right.map_batches(tag("r", r_missing),
                                     batch_format="pandas")))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # __s participates in the merge key: two salts of one hot key
        # can hash into the SAME bucket, and matching on (key, salt)
        # keeps each (l, r) pair meeting exactly once there too
        lg = g[g["__side"] == "l"][ons + ["__s"] + l_cols]
        rg = g[g["__side"] == "r"][ons + ["__s"] + r_cols]
        out = (lg.merge(rg, on=ons + ["__s"], how=how,
                        suffixes=suffixes)
               .drop(columns=["__s"]))
        return out if len(out) else as_typed_empty(out)

    return both.groupby("__b").map_groups(merge_bucket, batch_format="pandas")


def semi_join(left, right, on: str, *, anti: bool = False,
              n_buckets: int = 32,
              broadcast_threshold: int = 2_000_000):
    """Distributed semi join (SQL ``EXISTS``) / anti join (``NOT
    EXISTS``) on one key column — the filter-joins the reference's
    lookup_table covers only in broadcast form (runtime/lookup.c
    resolves per message against a driver-loaded table; here BOTH
    sides stream).

    Scale shape: the right side is reduced to its per-batch DISTINCT
    keys *before* the one shuffle (the combiner), so the exchange moves
    left rows + right distinct keys — right payload columns never
    travel.  Each hash bucket co-locates a left slice with exactly the
    right keys that could match it; the filter is one vectorized
    ``isin``.  A hot key costs one bucket entry, not one row per
    occurrence.

    Null semantics match SQL equality: right-side null keys are dropped
    from the membership set, and a left null key matches nothing — so
    ``anti=True`` KEEPS left rows with null keys, exactly like
    ``NOT EXISTS (SELECT 1 ... WHERE r.k = l.k)``.

    Adaptive final (the group_topk/distinct_rows pattern): when the
    right DISTINCT key set is at most ``broadcast_threshold`` rows, it
    broadcasts once via ``ray.put`` and the filter is a shuffle-free
    ``isin`` map over the left stream — the runtime/lookup.c
    broadcast-small / stream-big relationship.  Past the threshold the
    filter hash-partitions both sides (one shuffle)."""
    import ray

    l_schema = _schema_dict(left)
    l_cols = list(l_schema)

    def rkeys(df: pd.DataFrame) -> pd.DataFrame:
        return df[[on]].dropna().drop_duplicates()

    rk = right.map_batches(rkeys, batch_format="pandas").materialize()
    if rk.count() <= broadcast_threshold:
        keys = rk.to_pandas()[on].unique()
        ref = ray.put(keys)

        def bfilter(df: pd.DataFrame) -> pd.DataFrame:
            m = df[on].isin(ray.get(ref))
            out = df.loc[~m if anti else m, l_cols]
            return out if len(out) else as_typed_empty(out)

        return left.map_batches(bfilter, batch_format="pandas")

    missing = {k: v for k, v in l_schema.items() if k != on}
    order = list(l_schema) + ["__b", "__side"]
    both = (_unify_tag(left, "l", on, n_buckets, {}, order=order)
            .union(_unify_tag(rk, "r", on, n_buckets, missing,
                              order=order)))

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = g.loc[g["__side"] == "r", on].unique()
        lg = g[g["__side"] == "l"]
        m = lg[on].isin(keys)
        out = lg.loc[~m if anti else m, l_cols]
        # the NA-filled schema union promoted left int64 -> nullable
        # Int64; surviving rows are left rows (never the NA fill), so
        # restore the declared left dtypes
        for c, t in l_schema.items():
            if t.startswith(("int", "uint")) and str(out[c].dtype) != t:
                if not out[c].isna().any():
                    out[c] = out[c].astype(t)
        return out if len(out) else as_typed_empty(out)

    return both.groupby("__b").map_groups(filter_bucket,
                                          batch_format="pandas")


def anti_join(left, right, on: str, n_buckets: int = 32,
              broadcast_threshold: int = 2_000_000):
    """Left rows whose key appears NOWHERE on the right (SQL ``NOT
    EXISTS``) — see :func:`semi_join` for the scale shape."""
    return semi_join(left, right, on, anti=True, n_buckets=n_buckets,
                     broadcast_threshold=broadcast_threshold)


def asof_join(left, right, key: str, ts: str, right_cols: list[str],
              n_buckets: int = 32, suffix: str = "_r",
              direction: str = "backward", tolerance=None):
    """As-of join per key: for each left row, the nearest right row
    with the same key in the given ``direction`` — ``backward``
    (right.ts <= left.ts, the reference's sparseArray
    greatest-bound-below lookup), ``forward`` (right.ts >= left.ts)
    or ``nearest`` — optionally within ``tolerance`` (a pd.Timedelta
    for datetime keys).  pd.merge_asof inside co-located key buckets:
    one hash shuffle, each bucket sorts its own rows once."""
    l_schema = _schema_dict(left)
    r_schema = _schema_dict(right)
    l_missing = {k: v for k, v in r_schema.items() if k not in l_schema}
    r_missing = {k: v for k, v in l_schema.items() if k not in r_schema}
    l_cols = list(l_schema)
    order = (l_cols + [c for c in r_schema if c not in l_schema]
             + ["__b", "__side"])

    both = (_unify_tag(left, "l", key, n_buckets, l_missing, order=order)
            .union(_unify_tag(right, "r", key, n_buckets, r_missing,
                              order=order)))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][l_cols].sort_values(ts)
        rg = (g[g["__side"] == "r"][[key, ts] + right_cols]
              .sort_values(ts))
        if lg.empty:
            return as_typed_empty(lg)
        return pd.merge_asof(lg, rg, on=ts, by=key, direction=direction,
                             tolerance=tolerance, suffixes=("", suffix))

    return both.groupby("__b").map_groups(merge_bucket, batch_format="pandas")


def range_join(left, right, key: str, ts: str, right_cols: list[str],
               lookback_s: float, n_buckets: int = 32,
               suffix: str = "_r", how: str = "inner"):
    """Time-range (interval) join per key: every (left, right) pair
    with the same key and ``left.ts - lookback_s <= right.ts <=
    left.ts`` — the one-to-MANY generalization of :func:`asof_join`
    (which keeps only the latest such right row).  Same scale shape:
    both sides bucket by key hash, one groupby co-locates buckets,
    the pairing is a per-bucket sorted-merge.  Output can multiply
    rows (each left row joins all right rows in its window).

    Per-bucket pairing: the right side is (key, ts)-sorted once, so
    each left row's matches are one contiguous slice found by two
    C-level ``searchsorted`` calls (a per-row loop whose body is only
    C kernels — the small-kernel-per-row shape this host prefers over
    giant flat temporaries, see stages/multimodal.batch_features);
    materialization is one repeat + concatenate.  ``how="left"`` keeps
    windowless left rows with NA right columns.
    """
    l_schema = _schema_dict(left)
    r_schema = _schema_dict(right)
    l_missing = {k: v for k, v in r_schema.items() if k not in l_schema}
    r_missing = {k: v for k, v in l_schema.items() if k not in r_schema}
    l_cols = list(l_schema)
    order = (l_cols + [c for c in r_schema if c not in l_schema]
             + ["__b", "__side"])

    both = (_unify_tag(left, "l", key, n_buckets, l_missing, order=order)
            .union(_unify_tag(right, "r", key, n_buckets, r_missing,
                              order=order)))
    out_r = [c + suffix if c in l_cols else c for c in [ts] + right_cols]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][l_cols].sort_values([key, ts],
                                                       kind="mergesort")
        rg = (g[g["__side"] == "r"][[key, ts] + right_cols]
              .sort_values([key, ts], kind="mergesort"))
        if lg.empty:
            return as_typed_empty(pd.DataFrame(
                {**{c: lg.get(c, pd.Series(dtype=object))
                    for c in l_cols},
                 **{c: pd.Series(dtype=object) for c in out_r}}))
        # window bounds per left row: right rows are (key, ts)-sorted,
        # so each left row's matches are one contiguous slice found by
        # two searchsorted calls over a composite sort key
        def _ts_us(col: pd.Series) -> np.ndarray:
            # exact integer-microsecond domain: float seconds at epoch
            # scale lose sub-us precision and flip inclusive bounds
            d = str(col.dtype)
            if d.startswith("datetime64"):
                unit = d.split("[")[1].split(",")[0].rstrip("]")
                v = col.to_numpy().astype("int64")
                return {"ns": v // 1000, "us": v, "ms": v * 1000,
                        "s": v * 1_000_000}[unit]
            v = pd.to_numeric(col, errors="coerce").to_numpy(
                dtype="float64")
            return np.round(v * 1e6).astype("int64")

        lk = lg[key].to_numpy()
        lt = _ts_us(lg[ts])
        rk = rg[key].to_numpy()
        rt = _ts_us(rg[ts])
        lo = np.zeros(len(lg), dtype=np.int64)
        hi = np.zeros(len(lg), dtype=np.int64)
        # per-key slices of the right side
        rkeys, rstarts = np.unique(rk, return_index=True)
        rends = np.append(rstarts[1:], len(rk))
        kpos = np.searchsorted(rkeys, lk)
        found = (kpos < len(rkeys))
        found[found] &= rkeys[kpos[found]] == lk[found]
        tol = int(round(float(lookback_s) * 1_000_000))
        for i in np.flatnonzero(found):
            s, e = rstarts[kpos[i]], rends[kpos[i]]
            lo[i] = s + np.searchsorted(rt[s:e], lt[i] - tol, side="left")
            hi[i] = s + np.searchsorted(rt[s:e], lt[i], side="right")
        n = np.maximum(hi - lo, 0)
        n[~found] = 0
        ridx = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]) \
            if n.sum() else np.empty(0, dtype=np.int64)
        lrep = lg.iloc[np.repeat(np.arange(len(lg)), n)].reset_index(
            drop=True)
        rsel = rg.iloc[ridx][[ts] + right_cols].reset_index(drop=True)
        rsel.columns = out_r
        matched = pd.concat([lrep, rsel], axis=1)
        if how != "left":
            return matched
        miss = lg.iloc[np.flatnonzero(n == 0)].reset_index(drop=True)
        for c in out_r:
            miss[c] = pd.NA
        return pd.concat([matched, miss], ignore_index=True)

    return both.groupby("__b").map_groups(merge_bucket,
                                          batch_format="pandas")


def table_diff(left, right, key: str, cols: list[str], *,
               n_buckets: int = 32):
    """Snapshot diff by key: rows only in ``left`` -> 'removed', only
    in ``right`` -> 'added', present in both with any of ``cols``
    differing -> 'changed' (identical rows are dropped — the output is
    the CHANGE SET, which is what stays small when two 100 TB
    snapshots are mostly equal).

    Scale shape: each side reduces per batch to (key, 128-bit content
    hash over ``cols``) — the shuffle moves two ints + the key per
    row, never the payload.  One hash-partition co-locates a key's
    two sides; the compare is vectorized set logic per bucket.
    Assumes ``key`` is unique per side (a snapshot primary key)."""
    import pandas as pd

    def digest(side):
        def fx(df: pd.DataFrame) -> pd.DataFrame:
            h1 = pd.util.hash_pandas_object(df[cols], index=False
                                            ).astype("uint64")
            h2 = pd.util.hash_pandas_object(
                df[cols].iloc[:, ::-1], index=False,
                hash_key="raylog-diff-2ndk").astype("uint64")
            out = pd.DataFrame({key: df[key],
                                "h1": h1.to_numpy().astype("int64"),
                                "h2": h2.to_numpy().astype("int64")})
            out["__side"] = side
            out["__b"] = _bucket_of(out[key], n_buckets)
            return out
        return fx

    both = (left.map_batches(digest("l"), batch_format="pandas")
            .union(right.map_batches(digest("r"),
                                     batch_format="pandas")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"]
        rg = g[g["__side"] == "r"]
        m = lg.merge(rg, on=key, how="outer", suffixes=("_l", "_r"),
                     indicator=True)
        status = np.where(
            m["_merge"] == "left_only", "removed",
            np.where(m["_merge"] == "right_only", "added",
                     np.where((m["h1_l"] == m["h1_r"])
                              & (m["h2_l"] == m["h2_r"]),
                              "same", "changed")))
        m = m.assign(status=status)
        m = m[m["status"] != "same"]
        return m[[key, "status"]].reset_index(drop=True)

    return both.groupby("__b").map_groups(per_bucket,
                                          batch_format="pandas")


def apply_changelog(base, changes, key: str, seq: str, val: str, *,
                    op_col: str = "op", nparts: int = 32):
    """CDC MERGE: apply a keyed changelog to a snapshot with
    last-writer-wins ordering — the batch analog of a database upsert
    stream (the reference's nearest shape is omkafka-fed state rebuild;
    here it is a first-class storage op beside :func:`table_diff`).

    ``changes`` rows carry (key, seq, op, val): op "u" upserts val,
    op "d" deletes the key; the row with the LARGEST seq per key wins.
    Base rows rank below every change (seq -1).  Keys absent from the
    changelog keep their base value; "u" on a new key inserts it.

    Scale shape: both sides reduce to (key, seq, op, val) and
    hash-bucket by key (ONE shuffle — a key's history co-locates);
    each bucket sorts once by (key, seq) and keeps the last row per
    key with a boolean mask — no per-key loop.  The result stays a
    Dataset."""

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({key: df[key], "__seq": np.int64(-1),
                          op_col: "u", val: df[val]})
        t["__pp"] = _bucket_of(t[key], nparts)
        return t

    def tag_change(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({key: df[key],
                          "__seq": df[seq].astype("int64"),
                          op_col: df[op_col], val: df[val]})
        t["__pp"] = _bucket_of(t[key], nparts)
        return t

    both = (base.map_batches(tag_base, batch_format="pandas")
            .union(changes.map_batches(tag_change,
                                       batch_format="pandas")))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "__seq"], kind="mergesort")
        k = g[key].to_numpy()
        last = np.empty(len(g), dtype=bool)
        last[-1:] = True
        last[:-1] = k[1:] != k[:-1]
        w = g[last]
        w = w[w[op_col] == "u"]
        return w[[key, val]]

    return both.groupby("__pp").map_groups(per_bucket,
                                           batch_format="pandas")
