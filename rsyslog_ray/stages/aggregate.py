"""Aggregation stages — dynstats / statsobj / perctile analogs.

The reference's aggregation is incremental keyed counting flushed
periodically (runtime/dynstats.c dyn_inc; runtime/statsobj.c;
runtime/perctile_stats.c percentile_observe; omsendertrack per-sender
stats).  At 100 TB the cardinal rule is: NEVER ship rows into the
groupby shuffle — pre-aggregate inside ``map_batches`` (the combiner),
then reduce the tiny partials.  These helpers implement that two-phase
pattern generically, plus exact per-group percentiles and a salted
variant for skewed keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def two_phase_agg(ds, keys: list[str], *, count: str | None = "cnt",
                  sums: dict[str, str] | None = None,
                  mins: dict[str, str] | None = None,
                  maxs: dict[str, str] | None = None,
                  batch_size: int = 8192,
                  driver_reduce: bool = True,
                  empty_result=None):
    """count/sum/min/max per key group with per-batch partial aggregation.

    ``sums``/``mins``/``maxs`` map source column -> output alias.
    The shuffle moves only |keys|-cardinality partials per batch — a hot
    key (zipf host) costs the same as a cold one, which is the built-in
    skew handling (an explicit salt column is only needed for
    map_groups-style per-group computation, see ``salted_count``).

    ``driver_reduce=True`` (default): the final reduce of the partials
    runs as one pandas groupby on the driver — right up to ~10^7 keys
    (this Ray's sort-based ``groupby().aggregate()`` pays ~ms per
    group, 1000x the pandas cost at medium cardinality).  Set False for
    genuinely huge key spaces: the final becomes a distributed
    ``bucketed_final`` (hash-bucketed pandas reduces, bounded shuffle
    width) and the result a Dataset.
    """
    sums = sums or {}
    mins = mins or {}
    maxs = maxs or {}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, dropna=False, observed=True)
        parts = {}
        if count:
            parts[count] = g.size()
        for src, alias in sums.items():
            parts[alias] = g[src].sum()
        for src, alias in mins.items():
            parts[alias] = g[src].min()
        for src, alias in maxs.items():
            parts[alias] = g[src].max()
        out = pd.DataFrame(parts).reset_index()
        return out

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=batch_size)

    def reduce_partials(df: pd.DataFrame) -> pd.DataFrame:
        # ONE reduce definition shared by the driver and distributed
        # finals — they must never diverge
        g = df.groupby(keys, dropna=False, observed=True)
        parts = {}
        if count:
            parts[count] = g[count].sum()
        for _, alias in sums.items():
            parts[alias] = g[alias].sum()
        for _, alias in mins.items():
            parts[alias] = g[alias].min()
        for _, alias in maxs.items():
            parts[alias] = g[alias].max()
        return pd.DataFrame(parts).reset_index()

    if driver_reduce:
        df = partials.to_pandas()
        if df.empty and not set(keys).issubset(df.columns):
            # zero input batches leave a column-less empty frame (the
            # map stage never ran) — return a TYPED empty result so
            # callers' dict/sum folds see the expected columns
            cols = {k: pd.Series([], dtype="object") for k in keys}
            if count:
                cols[count] = pd.Series([], dtype="int64")
            for alias in list(sums.values()) + list(mins.values()) \
                    + list(maxs.values()):
                cols[alias] = pd.Series([], dtype="object")
            return pd.DataFrame(cols)
        return reduce_partials(df)

    return bucketed_final(partials, keys, reduce_partials,
                          empty_result=empty_result)


def bucketed_final(partials, keys: list[str], reduce_fn,
                   n_buckets: int = 64, empty_result=None):
    """Distributed final reduce over an UNBOUNDED key space — without
    Ray's sort-based ``groupby(keys).aggregate()``, which costs ~ms
    PER GROUP (CLAUDE.md invariant 3; measured 44 s for 340 k rows in
    the dynstats final): rows hash-partition on the key tuple into a
    BOUNDED bucket count, and each bucket reduces with ONE pandas pass
    (``reduce_fn``: frame -> reduced frame — every row of one key
    lands in one bucket, so any per-key computation is exact).  The
    shuffle sees ``n_buckets`` groups regardless of key cardinality;
    the result stays a Dataset.

    ``empty_result``: a TYPED zero-row frame matching the reduced
    schema.  A zero-row input produces zero groups, i.e. a Dataset
    with NO schema — a downstream join/union then dies on
    ``schema() is None``.  Unioning the typed empty frame in costs
    nothing and pins the schema in every case (dtypes must match the
    real reduced output)."""
    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__pp"] = (pd.util.hash_pandas_object(df[keys], index=False)
                       .to_numpy() % np.uint64(n_buckets)).astype("int64")
        return out

    def red(df: pd.DataFrame) -> pd.DataFrame:
        return reduce_fn(df.drop(columns=["__pp"]))

    out = (partials.map_batches(bucket, batch_format="pandas")
           .groupby("__pp").map_groups(red, batch_format="pandas"))
    if empty_result is not None:
        import ray.data
        out = out.union(ray.data.from_pandas(empty_result))
    return out


def exact_percentiles(ds, keys: list[str], value: str,
                      percentiles: list[float], prefix: str = "p"):
    """Exact per-group percentiles (perctile_stats analog,
    runtime/perctile_stats.c — the reference keeps a ring-buffer window;
    batch semantics = percentile over the whole group).  Linear
    interpolation (numpy default == duckdb quantile_cont).

    Requires group count × value width to fit one worker — document the
    partitioning assumption: keys must be low-cardinality enough that a
    single group's values fit in memory (true for our event_type-style
    keys; for high-card keys use a sketch instead).
    """
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[value].to_numpy(dtype=np.float64)
        row = {k: [g[k].iloc[0]] for k in keys}
        for p in percentiles:
            row[f"{prefix}{int(p * 100)}"] = [
                round(float(np.percentile(vals, p * 100)), 6)]
        return pd.DataFrame(row)

    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


def group_topk(ds, group: str, item: str, k: int, cnt: str = "n",
               driver_threshold: int = 2_000_000):
    """Top-k items per group by count (n desc, item asc tie-break),
    with an adaptive final: the (group, item) count partials are
    materialized and counted; below ``driver_threshold`` the exact
    top-k runs as one pandas pass on the driver, above it the counts
    stay a Dataset (distributed final reduce) and the per-group head
    runs as a keyed map_groups — each group's counts fit one worker
    (the partitioning assumption: items-per-group, not total items)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([group, item], dropna=False, observed=True)
                .size().rename(cnt).reset_index())

    partials = ds.map_batches(partial, batch_format="pandas").materialize()

    if partials.count() <= driver_threshold:
        counts = partials.to_pandas().groupby([group, item])[cnt].sum().reset_index()
        top = (counts.sort_values([group, cnt, item],
                                  ascending=[True, False, True])
               .groupby(group).head(k).reset_index(drop=True))
        top["rank"] = top.groupby(group).cumcount() + 1
        return top.astype({cnt: "int64", "rank": "int64"})

    # distributed final: bucket on GROUP alone, so one bucket holds a
    # group's complete counts — sum + head-k run in one pandas pass
    # (bounded shuffle width; a group's item count is the per-bucket
    # memory assumption, same as the old per-group map_groups had)
    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby([group, item], as_index=False)[cnt].sum()
        top = (counts.sort_values([group, cnt, item],
                                  ascending=[True, False, True])
               .groupby(group).head(k).reset_index(drop=True))
        top["rank"] = top.groupby(group).cumcount() + 1
        return top.astype({cnt: "int64", "rank": "int64"})

    return bucketed_final(partials, [group], topk_bucket)


def salted_count(ds, key: str, salt_buckets: int = 16, cnt: str = "cnt",
                 driver_reduce: bool = True):
    """Two-phase count with an explicit salt column — the pattern for
    skewed keys feeding map_groups-style finals (SURVEY.md §7 M5):
    partial count on (key, salt=hash%S), final sum on key.  The final
    is a driver pandas groupby by default (|keys|×|salts| partial rows;
    CLAUDE.md invariant 3); set driver_reduce=False for huge key
    spaces."""
    from ..functions import hash64mod

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        salt = hash64mod(df[key].astype(str), salt_buckets)
        g = df.assign(__salt=salt).groupby([key, "__salt"], dropna=False,
                                           observed=True)
        return g.size().rename(cnt).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    if driver_reduce:
        df = partials.to_pandas()
        return (df.groupby(key, as_index=False)[cnt].sum()
                .astype({cnt: "int64"}))
    return bucketed_final(
        partials, [key],
        lambda df: (df.groupby(key, as_index=False)[cnt].sum()
                    .astype({cnt: "int64"})))


def hopping_window_count(ds, ts_col: str, window_s: float, hop_s: float,
                         keys: list[str] | None = None, cnt: str = "cnt",
                         driver_reduce: bool = True):
    """Event-time hopping-window counts (tumbling when hop == window):
    each event lands in window_s/hop_s overlapping windows; the explode
    is a numpy repeat inside the combiner, so the shuffle moves only
    (window_start, keys) partial counts — dynstats_bucket generalized
    to overlapping windows (the streaming-aggregate shape the reference
    approximates with interval flushes, statsobj timer flush)."""
    assert window_s % hop_s == 0, "window must be a multiple of hop"
    k = int(window_s // hop_s)
    keys = keys or []

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # unit-robust epoch seconds (parquet gives us-resolution frames,
        # from_pandas gives ns — int64 division would differ 1000x)
        t = (df[ts_col] - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        last = (t // int(hop_s)) * int(hop_s)        # latest window start
        starts = (np.repeat(last.to_numpy(), k)
                  - np.tile(np.arange(k, dtype=np.int64) * int(hop_s),
                            len(df)))
        cols = {"window_start": pd.to_datetime(starts, unit="s")}
        for key in keys:
            cols[key] = np.repeat(df[key].to_numpy(), k)
        e = pd.DataFrame(cols)
        g = e.groupby(["window_start"] + keys, dropna=False, observed=True)
        return g.size().rename(cnt).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    if driver_reduce:
        df = partials.to_pandas()
        return (df.groupby(["window_start"] + keys, as_index=False)[cnt]
                .sum().astype({cnt: "int64"}))
    return bucketed_final(
        partials, ["window_start"] + keys,
        lambda df: (df.groupby(["window_start"] + keys,
                               as_index=False)[cnt]
                    .sum().astype({cnt: "int64"})))


def rollup_agg(ds, keys: list[str], *, sums: dict[str, str] | None = None,
               cnt: str = "cnt") -> pd.DataFrame:
    """``GROUP BY ROLLUP(keys)``: the finest level plus every prefix
    subtotal plus the grand total, rolled-up key columns set to None
    (SQL NULL).

    Scale shape: ONE distributed pass — the finest level comes from
    :func:`two_phase_agg`'s per-batch combiner partials; every coarser
    level is then derived from the finest GROUPS (not the rows) on the
    driver, O(finest-group-count) work.  Additive aggregates only
    (count/sum) — that additivity is exactly what makes the driver
    derivation correct.  Pair integer-cents inputs (floor(x*100+0.5)
    per row, CLAUDE.md invariant 6) with BIGINT-cast SQL oracles so the
    roll-up sums are order-independent."""
    sums = sums or {}
    fine = two_phase_agg(ds, list(keys), count=cnt, sums=sums)
    agg_cols = [cnt] + list(sums.values())
    frames = [fine[list(keys) + agg_cols].copy()]
    for lvl in range(len(keys) - 1, -1, -1):
        sub = list(keys[:lvl])
        if sub:
            g = (fine.groupby(sub, dropna=False)[agg_cols].sum()
                 .reset_index())
        else:
            g = fine[agg_cols].sum().to_frame().T
        for kcol in keys[lvl:]:
            g[kcol] = None
        frames.append(g[list(keys) + agg_cols])
    out = pd.concat(frames, ignore_index=True)
    out[agg_cols] = out[agg_cols].astype("int64")
    return out.sort_values(list(keys), na_position="last",
                           kind="mergesort").reset_index(drop=True)


def cube_agg(ds, keys: list[str], *, sums: dict[str, str] | None = None,
             cnt: str = "cnt") -> pd.DataFrame:
    """``GROUP BY CUBE(keys)``: every subset of the key set, absent
    keys as SQL NULL — same one-distributed-pass shape as
    :func:`rollup_agg` (all 2^|keys| levels derive from the finest
    GROUPS on the driver; additive aggregates only)."""
    from itertools import combinations

    sums = sums or {}
    fine = two_phase_agg(ds, list(keys), count=cnt, sums=sums)
    agg_cols = [cnt] + list(sums.values())
    frames = [fine[list(keys) + agg_cols].copy()]
    subsets = [list(c) for r in range(len(keys) - 1, -1, -1)
               for c in combinations(keys, r)]
    for sub in subsets:
        if sub:
            g = (fine.groupby(sub, dropna=False)[agg_cols].sum()
                 .reset_index())
        else:
            g = fine[agg_cols].sum().to_frame().T
        for kcol in keys:
            if kcol not in sub:
                g[kcol] = None
        frames.append(g[list(keys) + agg_cols])
    out = pd.concat(frames, ignore_index=True)
    out[agg_cols] = out[agg_cols].astype("int64")
    return out.sort_values(list(keys), na_position="last",
                           kind="mergesort").reset_index(drop=True)


def grouping_sets_agg(ds, keys: list[str], sets: list[tuple], *,
                      sums: dict[str, str] | None = None,
                      cnt: str = "cnt") -> pd.DataFrame:
    """``GROUP BY GROUPING SETS(sets)`` — the generalization
    :func:`rollup_agg` and :func:`cube_agg` are special cases of:
    exactly the requested key subsets, absent keys as SQL NULL.

    Same one-distributed-pass shape: the finest level (all keys) comes
    from :func:`two_phase_agg`'s combiner partials, every requested
    set derives from the finest GROUPS on the driver —
    O(finest-group-count) driver work, additive aggregates only
    (count/sum over integer cents)."""
    sums = sums or {}
    fine = two_phase_agg(ds, list(keys), count=cnt, sums=sums)
    agg_cols = [cnt] + list(sums.values())
    frames = []
    for sub in sets:
        sub = [k for k in keys if k in sub]     # canonical key order
        if len(sub) == len(keys):
            g = fine[list(keys) + agg_cols].copy()
        elif sub:
            g = (fine.groupby(sub, dropna=False)[agg_cols].sum()
                 .reset_index())
        else:
            g = fine[agg_cols].sum().to_frame().T
        for kcol in keys:
            if kcol not in sub:
                g[kcol] = None
        frames.append(g[list(keys) + agg_cols])
    out = pd.concat(frames, ignore_index=True)
    out[agg_cols] = out[agg_cols].astype("int64")
    return out.sort_values(list(keys), na_position="last",
                           kind="mergesort").reset_index(drop=True)


def unpivot(ds, id_cols: list[str], value_cols: list[str], *,
            var_name: str = "measure", value_name: str = "val"):
    """``UNPIVOT`` / melt: one output row per (input row, value
    column), the column name in ``var_name`` — purely row-local, so it
    is a single ``map_batches`` (no shuffle; output is
    len(value_cols) × input rows, streamed block by block)."""
    def melt(df: pd.DataFrame) -> pd.DataFrame:
        return df.melt(id_vars=id_cols, value_vars=value_cols,
                       var_name=var_name, value_name=value_name)

    return ds.map_batches(melt, batch_format="pandas")


def window_over_key(ds, key: str, order: list[str], value: str, *,
                    nparts: int = 32, rn: str = "rn",
                    lag_col: str = "prev_value",
                    run_value: str | None = None,
                    run_col: str = "run_sum",
                    lead_col: str | None = None,
                    ntile_n: int | None = None,
                    ntile_col: str = "tile",
                    pct_rank_col: str | None = None,
                    cume_dist_col: str | None = None,
                    first_col: str | None = None,
                    last_col: str | None = None,
                    rank_value: str | None = None,
                    rank_col: str | None = None,
                    dense_rank_col: str | None = None,
                    roll_n: int | None = None,
                    roll_value: str | None = None,
                    roll_sum_col: str = "roll_sum",
                    roll_cnt_col: str | None = None,
                    nth_n: int | None = None,
                    nth_col: str = "nth_v",
                    range_us: int | None = None,
                    range_ts: str | None = None,
                    range_value: str | None = None,
                    range_sum_col: str = "range_sum",
                    range_cnt_col: str | None = None,
                    mm_n: int | None = None,
                    mm_value: str | None = None,
                    mm_min_col: str | None = None,
                    mm_max_col: str | None = None,
                    lag_n: int | None = None,
                    lag_n_col: str = "lag_n",
                    lead_n: int | None = None,
                    lead_n_col: str = "lead_n",
                    ratio_value: str | None = None,
                    ratio_col: str = "ratio"):
    """Per-key ordered window functions — ``row_number()`` and
    ``lag(value)`` over ``PARTITION BY key ORDER BY order``, plus a
    per-key running sum of ``run_value``, ``lead(value)``
    (``lead_col``) and ``ntile(ntile_n)`` (SQL's
    larger-buckets-first split) when requested.

    Tie-aware ``rank()`` / ``dense_rank()``: pass ``rank_value`` (the
    ORDER BY expression column; it MUST be the first entry of
    ``order`` so the sort groups peers) with ``rank_col`` /
    ``dense_rank_col`` — peers are consecutive equal ``rank_value``
    rows within a key, rank is the first peer's row number.

    Frame aggregates: ``roll_n``/``roll_value`` adds the SQL
    ``ROWS BETWEEN roll_n-1 PRECEDING AND CURRENT ROW`` running
    window — ``roll_sum_col`` keeps ``roll_value``'s native dtype
    (pass integer cents for order-exactness) and ``roll_cnt_col``
    is the frame's row count (clipped at the partition start).

    Frame extrema: ``mm_n``/``mm_value`` adds min/max over the same
    ``ROWS BETWEEN mm_n-1 PRECEDING AND CURRENT ROW`` frame
    (``mm_min_col``/``mm_max_col``, either optional) via pandas'
    C-level monotonic-deque rolling kernel keyed by the per-bucket
    group id — O(rows), no per-key Python loop; integer inputs round-
    trip exactly (float64 intermediate is lossless under 2^53, cast
    back to the input dtype).

    Time frames: ``range_us``/``range_ts`` (an int64 microsecond
    column; it MUST be the first entry of ``order``)/``range_value``
    adds ``RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW`` —
    per group the frame is ``[t - range_us, t]`` INCLUSIVE OF PEERS
    (rows sharing the current timestamp, even later-positioned ones,
    exactly SQL's RANGE peer rule), computed as a cumsum difference
    between two searchsorted bounds.

    Scale shape: rows hash-bucket by ``key`` (ONE shuffle — a key's
    rows co-locate, so window state never crosses workers), each
    bucket sorts once by (key, *order) and computes every function
    with shift/cumsum vectorized over the whole bucket with key-change
    masking — no per-key loop, no global sort.  Bucket count is the
    parallelism knob; a hot key is bounded by that key's own row count
    (same assumption as any SQL PARTITION BY).

    Exactness contract: lag COPIES the value column (bit-identical to
    the SQL oracle), and the running sum keeps ``run_value``'s native
    dtype — pass integer cents (invariant 6) so the per-key cumsum is
    order-exact; a float running sum would drift vs the oracle's
    fresh per-partition sums."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__pp"] = _bucket_int(df[key], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        k = g[key].to_numpy()
        first = np.empty(len(g), dtype=bool)
        first[:1] = True
        first[1:] = k[1:] != k[:-1]
        v = g[value].to_numpy(dtype=np.float64)
        prev = np.empty_like(v)
        prev[0] = np.nan
        prev[1:] = v[:-1]
        prev[first] = np.nan
        # row_number: cumcount reset at key change
        idx = np.arange(len(g), dtype=np.int64)
        starts = np.maximum.accumulate(np.where(first, idx, 0))
        out = g.drop(columns=["__pp"]).reset_index(drop=True)
        out[rn] = (idx - starts + 1).astype("int64")
        out[lag_col] = prev
        if run_value is not None:
            rv = g[run_value].to_numpy()
            cs = np.cumsum(rv)
            base = np.concatenate(
                [np.zeros(1, dtype=cs.dtype), cs])[starts]
            out[run_col] = cs - base
        if lead_col is not None:
            nxt = np.empty_like(v)
            nxt[-1:] = np.nan
            nxt[:-1] = v[1:]
            # a row whose successor starts a new key has no lead
            nxt[:-1][first[1:]] = np.nan
            out[lead_col] = nxt
        if ntile_n is not None:
            # per-row group size: repeat each group's length
            sidx = np.flatnonzero(first)
            sizes = np.diff(np.append(sidx, len(g)))
            c = np.repeat(sizes, sizes)
            kpos = idx - starts              # 0-based rank in group
            n = int(ntile_n)
            base_sz = c // n
            rem = c % n
            cutoff = rem * (base_sz + 1)
            safe = np.maximum(base_sz, 1)
            tile = np.where(kpos < cutoff,
                            kpos // np.maximum(base_sz + 1, 1),
                            rem + (kpos - cutoff) // safe) + 1
            out[ntile_col] = tile.astype("int64")
        if pct_rank_col is not None or cume_dist_col is not None:
            # REQUIRES a tie-free ``order`` (include a unique id):
            # then rank == row_number and cume_dist == rn/c, and both
            # ratios are single IEEE divisions of the same ints the
            # SQL side divides — bit-identical
            sidx = np.flatnonzero(first)
            sizes = np.diff(np.append(sidx, len(g)))
            c = np.repeat(sizes, sizes).astype(np.float64)
            rn_f = (idx - starts + 1).astype(np.float64)
            if pct_rank_col is not None:
                out[pct_rank_col] = np.where(
                    c > 1, (rn_f - 1.0) / (c - 1.0), 0.0)
            if cume_dist_col is not None:
                out[cume_dist_col] = rn_f / c
        if rank_value is not None and (rank_col is not None
                                       or dense_rank_col is not None):
            rv_arr = g[rank_value].to_numpy()
            new_val = first.copy()
            new_val[1:] |= rv_arr[1:] != rv_arr[:-1]
            if rank_col is not None:
                # index of the current tie-run's first row, per row
                last_new = np.maximum.accumulate(
                    np.where(new_val, idx, 0))
                out[rank_col] = (last_new - starts + 1).astype("int64")
            if dense_rank_col is not None:
                d = np.cumsum(new_val)
                out[dense_rank_col] = (d - d[starts] + 1).astype("int64")
        if roll_n is not None and roll_value is not None:
            rv2 = g[roll_value].to_numpy()
            cs2 = np.cumsum(rv2)
            cs0 = np.concatenate(
                [np.zeros(1, dtype=cs2.dtype), cs2])
            lo = np.maximum(starts, idx - int(roll_n) + 1)
            out[roll_sum_col] = cs2 - cs0[lo]
            if roll_cnt_col is not None:
                out[roll_cnt_col] = (idx - lo + 1).astype("int64")
        if first_col is not None or last_col is not None:
            # first/last over the WHOLE partition (the UNBOUNDED
            # FOLLOWING frame) — bit-copies of the group's endpoint
            # values broadcast per row
            sidx = np.flatnonzero(first)
            sizes = np.diff(np.append(sidx, len(g)))
            if first_col is not None:
                out[first_col] = np.repeat(v[sidx], sizes)
            if last_col is not None:
                eidx = np.append(sidx[1:], len(g)) - 1
                out[last_col] = np.repeat(v[eidx], sizes)
        if range_us is not None and range_ts is not None \
                and range_value is not None:
            tsv = g[range_ts].to_numpy(np.int64)
            rv3 = g[range_value].to_numpy()
            cs3 = np.cumsum(rv3)
            cs0r = np.concatenate(
                [np.zeros(1, dtype=cs3.dtype), cs3])
            sidx = np.flatnonzero(first)
            bounds = np.append(sidx, len(g))
            rs = np.empty(len(g), dtype=cs3.dtype)
            rc = np.empty(len(g), dtype=np.int64)
            for gi in range(len(sidx)):
                a, b = bounds[gi], bounds[gi + 1]
                tg = tsv[a:b]
                lo = np.searchsorted(tg, tg - int(range_us),
                                     side="left") + a
                hi = np.searchsorted(tg, tg, side="right") + a
                rs[a:b] = cs0r[hi] - cs0r[lo]
                rc[a:b] = hi - lo
            out[range_sum_col] = rs
            if range_cnt_col is not None:
                out[range_cnt_col] = rc
        if lag_n is not None or lead_n is not None:
            # lag(value, n) / lead(value, n): a shift within the key
            # (rows within n of the partition edge -> NULL), pure
            # index arithmetic over the one sorted bucket
            sidx = np.flatnonzero(first)
            gpos = np.cumsum(first) - 1
            pstart = sidx[gpos]
            pend = (np.append(sidx[1:], len(g)) - 1)[gpos]
            for off, col, back in ((lag_n, lag_n_col, True),
                                   (lead_n, lead_n_col, False)):
                if off is None:
                    continue
                srcpos = idx - int(off) if back else idx + int(off)
                ok2 = (srcpos >= pstart) & (srcpos <= pend)
                shifted = np.full(len(g), np.nan)
                shifted[ok2] = v[srcpos[ok2]]
                out[col] = shifted
        if ratio_value is not None:
            # ratio_to_report: value / sum(value) over the partition —
            # ONE float64 division of the same ints the SQL divides
            rvr = g[ratio_value].to_numpy()
            csr = np.cumsum(rvr)
            sidx = np.flatnonzero(first)
            sizes = np.diff(np.append(sidx, len(g)))
            base = np.concatenate(
                [np.zeros(1, dtype=csr.dtype), csr])[sidx]
            tot = csr[np.append(sidx[1:], len(g)) - 1] - base
            out[ratio_col] = (rvr.astype(np.float64)
                              / np.repeat(tot, sizes).astype(np.float64))
        if mm_n is not None and mm_value is not None \
                and (mm_min_col is not None or mm_max_col is not None):
            gid = np.cumsum(first)              # contiguous per-key id
            s = pd.Series(g[mm_value].to_numpy())
            grp = s.groupby(gid, sort=False)
            roll = grp.rolling(int(mm_n), min_periods=1)
            dt = g[mm_value].dtype
            if mm_min_col is not None:
                mn = roll.min().to_numpy()
                out[mm_min_col] = mn.astype(dt) \
                    if np.issubdtype(dt, np.integer) else mn
            if mm_max_col is not None:
                mx = roll.max().to_numpy()
                out[mm_max_col] = mx.astype(dt) \
                    if np.issubdtype(dt, np.integer) else mx
        if nth_n is not None:
            # nth_value(value, n) over the whole partition: the n-th
            # row's value bit-copied to every row, NULL when the
            # partition has fewer than n rows
            sidx = np.flatnonzero(first)
            sizes = np.diff(np.append(sidx, len(g)))
            pos = np.minimum(sidx + int(nth_n) - 1, len(g) - 1)
            val = np.where(sizes >= int(nth_n), v[pos], np.nan)
            out[nth_col] = np.repeat(val, sizes)
        return out

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__pp").map_groups(per_bucket,
                                        batch_format="pandas"))


def _bucket_int(col: pd.Series, nparts: int) -> pd.Series:
    h = pd.util.hash_array(col.to_numpy())
    return pd.Series(h % np.uint64(nparts), index=col.index).astype("int64")


def group_concat(ds, key: str, val: str, order: list[str],
                 *, sep: str = ",", out: str = "agg",
                 nparts: int = 32, as_dataset: bool = False):
    """SQL ``string_agg(val, sep ORDER BY order)`` per key.  Rows
    hash-bucket by key (one shuffle), each bucket sorts once and joins
    per key group.  Partitioning assumption (same as the SQL it
    mirrors): one key's concatenated string fits a worker.

    The default pandas return collects one row per key on the driver —
    fine for small key spaces (nations, hosts).  For CORPUS-sized keys
    (per-document anchor aggregation at 10^12 docs) pass
    ``as_dataset=True`` and consume with write_parquet / a downstream
    stage; the concatenation itself is identical."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        need = [key, val] + [c for c in order if c != val]
        df = df[need].copy(deep=False)
        df["__pp"] = _bucket_int(df[key], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="mergesort")
        r = (g.groupby(key, sort=True)[val]
             .agg(lambda s: sep.join(s.astype(str))))
        return pd.DataFrame({key: r.index.to_numpy(), out: r.to_numpy()})

    res = (ds.map_batches(bucketed, batch_format="pandas")
           .groupby("__pp").map_groups(per_bucket,
                                       batch_format="pandas"))
    if as_dataset:
        return res
    return res.to_pandas().sort_values(key).reset_index(drop=True)


def funnel_counts(ds, user: str, ts: str, type_col: str,
                  steps: list[str], *, nparts: int = 32) -> pd.DataFrame:
    """Ordered-funnel analysis: for each prefix of ``steps``, how many
    users completed it IN ORDER (step k strictly after that user's
    earliest completion of step k-1 — the strict-``>`` semantics a
    per-step min-timestamp SQL chain has).

    Scale shape: one hash shuffle co-locates a user's events; inside a
    bucket each step is a vectorized filter + merge + groupby-min over
    the step's rows only (|steps| small passes, no per-user loop); the
    driver reduce sums |steps| ints per bucket."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[user, ts, type_col]].copy(deep=False)
        df["__pp"] = _bucket_int(df[user], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cur = None   # user -> earliest completion time of the prefix
        out = {"step": [], "users": []}
        for i, s in enumerate(steps):
            rows = g.loc[g[type_col] == s, [user, ts]]
            if cur is not None:
                rows = rows.merge(cur, on=user)
                rows = rows[rows[ts] > rows["__t"]]
                rows = rows[[user, ts]]
            cur = (rows.groupby(user, as_index=False)[ts].min()
                   .rename(columns={ts: "__t"}))
            out["step"].append(i + 1)
            out["users"].append(len(cur))
        return pd.DataFrame({"step": pd.Series(out["step"], dtype="int64"),
                             "users": pd.Series(out["users"],
                                                dtype="int64")})

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__pp").map_groups(per_bucket,
                                         batch_format="pandas")
             .to_pandas())
    agg = (parts.groupby("step", as_index=False)["users"].sum()
           .astype({"step": "int64", "users": "int64"})
           .sort_values("step").reset_index(drop=True))
    agg["event_type"] = [steps[i - 1] for i in agg["step"]]
    return agg[["step", "event_type", "users"]]


def resample_counts(ds, user: str, ts: str, *, step_s: int = 3600,
                    nparts: int = 32):
    """Per-key time-series resampling: an hourly (``step_s``) grid per
    key from ceil(first event) to floor(last event), each grid point
    carrying the CUMULATIVE event count at that instant — the
    regularize-an-irregular-stream primitive (downsample + running
    state at grid points).

    Exactness: all boundary math is int64 microseconds (ceil via
    integer division), mirrored by an epoch_us() SQL oracle — no float
    epoch arithmetic on either side.  Scale shape: one key-hash
    shuffle; per bucket one sort, then per-key grids via C-kernel
    searchsorted slices (the small-kernels-per-row pattern this host
    prefers); output rows stream back as a Dataset."""
    step_us = int(step_s) * 1_000_000

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[user, ts]].copy(deep=False)
        df["__pp"] = _bucket_int(df[user], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user, ts], kind="mergesort")
        k = g[user].to_numpy()
        d = str(g[ts].dtype)
        unit = d.split("[")[1].rstrip("]") if "[" in d else "us"
        scale = {"ns": 1, "us": 1000, "ms": 10**6, "s": 10**9}[unit]
        t_us = g[ts].to_numpy().astype("int64") * scale // 1000
        starts = np.flatnonzero(np.concatenate(
            [[True], k[1:] != k[:-1]]))
        ends = np.append(starts[1:], len(k))
        out_u, out_t, out_c = [], [], []
        for s, e in zip(starts, ends):
            seg = t_us[s:e]
            lo = -(-seg[0] // step_us)          # ceil hour index
            hi = seg[-1] // step_us             # floor hour index
            if lo > hi:
                continue
            grid = np.arange(lo, hi + 1, dtype=np.int64) * step_us
            cnt = np.searchsorted(seg, grid, side="right")
            out_u.append(np.full(len(grid), k[s]))
            out_t.append(grid)
            out_c.append(cnt.astype(np.int64))
        if not out_u:
            return pd.DataFrame({user: pd.Series([], dtype=g[user].dtype),
                                 "gts": pd.Series([], dtype="datetime64[us]"),
                                 "n_events": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            user: np.concatenate(out_u),
            "gts": np.concatenate(out_t).view("datetime64[us]"),
            "n_events": np.concatenate(out_c)})

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__pp").map_groups(per_bucket,
                                        batch_format="pandas"))


def event_paths(ds, user: str, order: list[str], type_col: str, *,
                n: int = 3, k: int = 10, nparts: int = 32
                ) -> pd.DataFrame:
    """Top-k length-``n`` event-type paths ('a>b>c') over per-key
    ordered streams — the behavioral-sequence mining staple (what do
    users do in what order).  One key-hash shuffle; inside a bucket
    the paths come from n-1 vectorized shifts masked at key changes
    (never crossing users), pre-counted per bucket (the combiner) so
    the driver reduce is O(distinct paths) — at most |types|^n rows.
    Deterministic tie-break (cnt desc, path asc) incl. the rank-k
    boundary."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[user, type_col] + [c for c in order]].copy(deep=False)
        df["__pp"] = _bucket_int(df[user], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user] + order, kind="mergesort")
        u = g[user].to_numpy()
        et = g[type_col].to_numpy(dtype=object)
        m = len(g) - n + 1
        if m <= 0:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
        ok = np.ones(m, dtype=bool)
        parts = [et[:m]]
        for j in range(1, n):
            ok &= u[j:m + j] == u[:m]
            parts.append(et[j:m + j])
        path = parts[0].copy()
        for p in parts[1:]:
            path = np.char.add(np.char.add(path.astype(str), ">"),
                               p.astype(str)).astype(object)
        vc = pd.Series(path[ok]).value_counts()
        return pd.DataFrame({"path": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy().astype("int64")})

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__pp").map_groups(per_bucket,
                                         batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("path", as_index=False)["cnt"].sum()
    return (agg.sort_values(["cnt", "path"], ascending=[False, True])
            .head(k).reset_index(drop=True).astype({"cnt": "int64"}))


def incremental_agg_update(prev: pd.DataFrame | None, new_ds,
                           keys: list[str], *,
                           count: str = "cnt",
                           sums: dict[str, str] | None = None
                           ) -> pd.DataFrame:
    """Materialized-aggregate maintenance: fold a NEW data increment
    into a previously computed count/sum aggregate without rescanning
    the old data — the cross-run form of the flagship's per-shard
    ``_agg`` checkpoint reduce (sinks.read_agg_partials), exposed as
    an operator.  Additive aggregates only; the increment pass is the
    usual two-phase combiner, the fold is O(prev groups + new
    groups)."""
    inc = two_phase_agg(new_ds, list(keys), count=count, sums=sums)
    if prev is None or not len(prev):
        return inc.sort_values(list(keys)).reset_index(drop=True)
    agg_cols = [count] + list((sums or {}).values())
    both = pd.concat([prev[list(keys) + agg_cols],
                      inc[list(keys) + agg_cols]], ignore_index=True)
    out = (both.groupby(list(keys), dropna=False, as_index=False)
           [agg_cols].sum())
    return (out.astype({c: "int64" for c in agg_cols
                        if str(out[c].dtype).startswith(("int", "Int"))})
            .sort_values(list(keys)).reset_index(drop=True))


def sequence_match(ds, key: str, order: list[str], type_col: str,
                   pattern: str, *, alphabet: dict[str, str],
                   nparts: int = 32) -> pd.DataFrame:
    """MATCH_RECOGNIZE-lite: keys whose ORDERED event-type sequence
    matches a regex over single-char type codes (``alphabet`` maps
    type value -> code char).  One key-hash shuffle; per bucket one
    sort + per-key string build + ONE compiled-regex pass over the
    key's whole sequence; the driver collect is the matching keys
    only.  Same encode trick a SQL oracle can reproduce with
    string_agg + regexp_matches, so the semantics stay checkable."""
    import re

    rx = re.compile(pattern)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, type_col] + list(order)].copy(deep=False)
        df["__pp"] = _bucket_int(df[key], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + list(order), kind="mergesort")
        codes = g[type_col].map(alphabet).fillna("_")
        s = codes.groupby(g[key].to_numpy()).agg("".join)
        hit = s[s.map(lambda x: rx.search(x) is not None)]
        return pd.DataFrame({key: hit.index.to_numpy()})

    out = (ds.map_batches(bucketed, batch_format="pandas")
           .groupby("__pp").map_groups(per_bucket,
                                       batch_format="pandas")
           .to_pandas())
    if not len(out.columns):
        out = pd.DataFrame({key: pd.Series([], dtype="int64")})
    return out.sort_values(key).reset_index(drop=True)


def retention_counts(ds, user: str, ts: str, *, nparts: int = 32
                     ) -> pd.DataFrame:
    """Cohort retention: users cohorted by the DATE of their first
    event; for every (cohort, day_offset) the number of DISTINCT
    users active that many days later — the product-analytics
    retention triangle.

    Scale shape: ONE user-hash shuffle.  A user's rows co-locate, so
    the per-bucket (cohort, offset) distinct-user counts are globally
    exact (each user contributes to exactly one bucket) and the
    driver reduce sums O(cohorts × offsets) ints per bucket — user
    identities never reach the driver."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[user, ts]].copy(deep=False)
        df["__pp"] = _bucket_int(df[user], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(g[ts]).dt.normalize()
        d0 = day.groupby(g[user].to_numpy()).transform("min")
        cohort = d0.dt.strftime("%Y-%m-%d")
        off = (day - d0).dt.days.astype("int64")
        sub = pd.DataFrame({"cohort": cohort.to_numpy(),
                            "day_offset": off.to_numpy(),
                            "u": g[user].to_numpy()})
        out = (sub.drop_duplicates()
               .groupby(["cohort", "day_offset"], as_index=False)
               .size().rename(columns={"size": "n_users"}))
        return out

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__pp").map_groups(per_bucket,
                                         batch_format="pandas")
             .to_pandas())
    out = (parts.groupby(["cohort", "day_offset"], as_index=False)
           ["n_users"].sum()
           .astype({"day_offset": "int64", "n_users": "int64"})
           .sort_values(["cohort", "day_offset"])
           .reset_index(drop=True))
    return out


def overlap_matrix(ds, entity: str, label: str, *, nparts: int = 32
                   ) -> pd.DataFrame:
    """Audience overlap: for every unordered label pair (a < b), the
    EXACT number of distinct entities carrying both labels — the
    co-occurrence / segment-overlap matrix.

    Scale shape: the retention_counts bucket-exact pattern — one
    entity-hash shuffle co-locates each entity's rows, the per-bucket
    pass reduces an entity to its distinct label set and emits its
    C(k,2) pairs ONCE, the driver sums O(labels²) ints per bucket.
    Entity identities never reach the driver; cost is bounded by
    labels-per-entity, not corpus size."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[entity, label]].copy(deep=False)
        df["__pp"] = _bucket_int(df[entity], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sub = g[[entity, label]].drop_duplicates()
        sub = sub.sort_values([entity, label], kind="mergesort")
        rows_a, rows_b = [], []
        for _, labs in sub.groupby(entity, sort=False)[label]:
            v = labs.to_numpy()
            if len(v) > 1:
                ia, ib = np.triu_indices(len(v), k=1)
                rows_a.append(v[ia])
                rows_b.append(v[ib])
        if not rows_a:
            return pd.DataFrame({"label_a": pd.Series([], dtype=object),
                                 "label_b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        t = pd.DataFrame({"label_a": np.concatenate(rows_a),
                          "label_b": np.concatenate(rows_b)})
        return (t.groupby(["label_a", "label_b"], as_index=False)
                .size().rename(columns={"size": "n"}))

    parts = (ds.map_batches(bucketed, batch_format="pandas")
             .groupby("__pp").map_groups(per_bucket,
                                         batch_format="pandas")
             .to_pandas())
    return (parts.groupby(["label_a", "label_b"], as_index=False)
            ["n"].sum().astype({"n": "int64"})
            .sort_values(["label_a", "label_b"])
            .reset_index(drop=True))


def corr_by_key(ds, key: str, x: str, y: str, *, out: str = "corr"
                ) -> pd.DataFrame:
    """Pearson correlation of INTEGER columns ``x``, ``y`` per key —
    the two-phase moment pattern: each batch ships six int64 moment
    partials (n, Σx, Σy, Σx², Σxy, Σy²) per key, integer addition
    makes the sums order-exact under any batch split, and the final
    correlation is ONE float64 expression over the exact sums —
    mirror the same expression in SQL and the match is bit-identical
    (the bm25 shared-expression-tree trick).  Integer inputs are the
    caller's job (cents, seconds); Σx² must fit int64 — fine to
    ~10^9 rows/key at cent scale, documented bound."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xa = df[x].to_numpy(np.int64)
        ya = df[y].to_numpy(np.int64)
        t = pd.DataFrame({key: df[key], "n": 1, "sx": xa, "sy": ya,
                          "sxx": xa * xa, "sxy": xa * ya,
                          "syy": ya * ya})
        return t.groupby(key, as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby(key, as_index=False).sum()
    n = m["n"].to_numpy(np.float64)
    sx = m["sx"].to_numpy(np.float64)
    sy = m["sy"].to_numpy(np.float64)
    sxx = m["sxx"].to_numpy(np.float64)
    sxy = m["sxy"].to_numpy(np.float64)
    syy = m["syy"].to_numpy(np.float64)
    # the shared expression tree — keep in sync with the SQL oracle
    m[out] = ((n * sxy - sx * sy)
              / (np.sqrt(n * sxx - sx * sx)
                 * np.sqrt(n * syy - sy * sy)))
    return (m[[key, out]].sort_values(key).reset_index(drop=True))


def linreg_by_key(ds, key: str, x: str, y: str, *,
                  slope: str = "slope", intercept: str = "icept"
                  ) -> pd.DataFrame:
    """OLS simple regression of INTEGER ``y`` on ``x`` per key — SQL's
    ``regr_slope``/``regr_intercept``, same contract as
    :func:`corr_by_key`: five int64 moment partials per key per batch
    (order-exact integer sums), then the closed-form slope and
    intercept as ONE float64 expression over the exact sums each —
    mirror the identical expression trees in SQL for a bit-identical
    match."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xa = df[x].to_numpy(np.int64)
        ya = df[y].to_numpy(np.int64)
        t = pd.DataFrame({key: df[key], "n": 1, "sx": xa, "sy": ya,
                          "sxx": xa * xa, "sxy": xa * ya})
        return t.groupby(key, as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby(key, as_index=False).sum()
    n = m["n"].to_numpy(np.float64)
    sx = m["sx"].to_numpy(np.float64)
    sy = m["sy"].to_numpy(np.float64)
    sxx = m["sxx"].to_numpy(np.float64)
    sxy = m["sxy"].to_numpy(np.float64)
    # shared expression trees — keep in sync with the SQL oracle
    m[slope] = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    m[intercept] = (sy * sxx - sx * sxy) / (n * sxx - sx * sx)
    return (m[[key, slope, intercept]].sort_values(key)
            .reset_index(drop=True))


def argmax_by_key(ds, key: str, val: str, payload: str, *,
                  largest: bool = True, out: str | None = None
                  ) -> pd.DataFrame:
    """SQL ``max_by(payload, val)`` / ``min_by`` per key with a
    DETERMINISTIC tie-break (extreme ``val``, then smallest
    ``payload`` — arg_max's unspecified-tie hole closed, so an SQL
    oracle can reproduce it with a row_number window).  Two-phase
    associative argmax: each batch keeps one (val, payload) champion
    per key, the driver reduces O(batches × keys) champions — rows
    never shuffle."""
    out = out or payload

    def champ(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values([val, payload],
                           ascending=[not largest, True],
                           kind="mergesort")
        return s.groupby(key, as_index=False).first()[[key, val, payload]]

    parts = ds.map_batches(champ, batch_format="pandas").to_pandas()
    final = (parts.sort_values([val, payload],
                               ascending=[not largest, True],
                               kind="mergesort")
             .groupby(key, as_index=False).first())
    final = final.rename(columns={payload: out})
    return (final[[key, val, out]].sort_values(key)
            .reset_index(drop=True))


def stats_by_key(ds, key: str, x: str) -> pd.DataFrame:
    """Descriptive statistics per key over an INTEGER column — n,
    mean, sample stddev — from the same int64 moment partials as
    :func:`corr_by_key` (order-exact sums, then one shared float64
    expression mirrored by the SQL oracle, bit-identical)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xa = df[x].to_numpy(np.int64)
        t = pd.DataFrame({key: df[key], "n": 1, "sx": xa,
                          "sxx": xa * xa})
        return t.groupby(key, as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby(key, as_index=False).sum()
    n = m["n"].to_numpy(np.float64)
    sx = m["sx"].to_numpy(np.float64)
    sxx = m["sxx"].to_numpy(np.float64)
    # the shared expression tree — keep in sync with the SQL oracle
    out = pd.DataFrame({key: m[key],
                        "n": m["n"].astype("int64"),
                        "mean": sx / n,
                        "stddev": np.sqrt((n * sxx - sx * sx)
                                          / (n * (n - 1.0)))})
    return out.sort_values(key).reset_index(drop=True)


def quantile_by_key(ds, key: str, val: str, pcts: list[int], *,
                    nparts: int = 32) -> pd.DataFrame:
    """EXACT per-key discrete quantiles — SQL
    ``quantile_disc(val, p/100) GROUP BY key`` with DuckDB's rank rule
    ``idx = ceil(p*n/100) - 1`` computed in integer arithmetic
    (``(p*n + 99)//100 - 1``), so the returned value is an actual
    column element and engine/oracle agree bit-for-bit.

    Scale shape: rows reduce to (key, val) and hash-bucket by key
    (ONE shuffle — a key's values co-locate); each bucket sorts once
    by (key, val) and selects every percentile by index arithmetic
    over the group-start offsets — no per-key loop.  Driver collect
    is O(distinct keys × len(pcts)).  Mirrors the holistic-aggregate
    posture of the reference's percentile buckets
    (contrib/impstats perctile_stats) at exact rather than
    bucket-approximate grain."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, val]].copy(deep=False)
        df["__pp"] = _bucket_int(df[key], nparts)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, val], kind="mergesort")
        k = g[key].to_numpy()
        v = g[val].to_numpy()
        first = np.empty(len(g), dtype=bool)
        first[:1] = True
        first[1:] = k[1:] != k[:-1]
        sidx = np.flatnonzero(first)
        sizes = np.diff(np.append(sidx, len(g)))
        cols = {key: k[sidx]}
        for p in pcts:
            ridx = sidx + (p * sizes + 99) // 100 - 1
            cols[f"p{p}"] = v[ridx]
        return pd.DataFrame(cols)

    return (ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__pp").map_groups(per_bucket,
                                        batch_format="pandas")
            .to_pandas().sort_values(key).reset_index(drop=True))


def set_op_keys(ds_a, ds_b, key: str, op: str, *,
                nparts: int = 32) -> pd.DataFrame:
    """Distinct-set operations on a key column — SQL ``INTERSECT`` /
    ``EXCEPT`` (``op`` = "intersect" | "except", A op B) without ever
    shuffling more than one deduped (key, side-bit) row per batch per
    key: each side's batches reduce to per-batch-unique keys tagged
    with a presence bit (A=1, B=2), the union hash-buckets by key
    (ONE shuffle of tiny rows), and each bucket ORs the bits per key —
    INTERSECT keeps bits==3, EXCEPT keeps bits==1.  Driver collect is
    O(result keys)."""
    import ray

    if op not in ("intersect", "except"):
        raise ValueError(op)

    def tag(bit):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            u = pd.DataFrame({key: df[key].unique()})
            u["__bit"] = np.int64(bit)
            u["__pp"] = _bucket_int(u[key], nparts)
            return u
        return f

    tagged = (ds_a.map_batches(tag(1), batch_format="pandas")
              .union(ds_b.map_batches(tag(2), batch_format="pandas")))

    want = 3 if op == "intersect" else 1

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bits = g.groupby(key, sort=False)["__bit"].agg(
            lambda s: int(np.bitwise_or.reduce(s.to_numpy())))
        keep = bits[bits == want].index.to_numpy()
        return pd.DataFrame({key: keep})

    res = (tagged.groupby("__pp").map_groups(per_bucket,
                                             batch_format="pandas")
           .to_pandas())
    if key not in res.columns:
        # every bucket was empty: Ray renders 0-row pandas blocks
        # schema-less, so re-assert the key column (int64 — the id
        # dtype of every table here) for a stable empty result
        res = pd.DataFrame({key: np.array([], dtype=np.int64)})
    return res.sort_values(key).reset_index(drop=True)


def ndv_by_key(ds, key: str, val: str, *, out: str = "ndv",
               nparts: int = 32) -> pd.DataFrame:
    """EXACT ``count(DISTINCT val) GROUP BY key`` at scale: batches
    reduce to per-batch-unique (key, val) pairs, pairs hash-bucket by
    BOTH columns (one tiny-row shuffle; each distinct pair lands in
    exactly one bucket), buckets dedupe and emit per-key partial
    counts, and the driver sums O(keys × nparts) ints — the raw values
    never reach the driver.  The exact complement of the HLL
    ``approx_distinct_bykey`` (stages/sketch.py); mirrors
    runtime/dynstats.c's keyed counting at distinct rather than row
    grain."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df[[key, val]].drop_duplicates()
        u = u.copy(deep=False)
        # golden-ratio mix, not XOR: equal key/val hash values would
        # XOR to 0 and pile every such pair into bucket 0
        hk = pd.util.hash_array(u[key].to_numpy())
        hv = pd.util.hash_array(u[val].to_numpy())
        u["__pp"] = ((hk * np.uint64(0x9E3779B97F4A7C15) + hv)
                     % np.uint64(nparts)).astype("int64")
        return u

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[key, val]].drop_duplicates()
        c = d.groupby(key, sort=False).size().rename(out).reset_index()
        return c

    parts = (ds.map_batches(pairs, batch_format="pandas")
             .groupby("__pp").map_groups(per_bucket,
                                         batch_format="pandas")
             .to_pandas())
    if key not in parts.columns:
        return pd.DataFrame({key: np.array([], dtype=np.int64),
                             out: np.array([], dtype=np.int64)})
    final = parts.groupby(key, as_index=False)[out].sum()
    final[out] = final[out].astype("int64")
    return final.sort_values(key).reset_index(drop=True)
