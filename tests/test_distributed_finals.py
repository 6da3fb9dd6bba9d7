"""Distributed finals: the adaptive operators must produce identical
results through the driver path (small partials) and the distributed
path (hash-partitioned dedup / keyed map_groups), exercised here by
forcing driver_threshold=0."""

import numpy as np
import pandas as pd


def _truth(df):
    dd = df.drop_duplicates()
    distinct = dd.groupby("k").size().rename("distinct_cnt").reset_index()
    counts = df.groupby(["k", "v"]).size().rename("n").reset_index()
    top = (counts.sort_values(["k", "n", "v"], ascending=[True, False, True])
           .groupby("k").head(3).reset_index(drop=True))
    top["rank"] = top.groupby("k").cumcount() + 1
    return dd, distinct, top


def test_distributed_finals_match_driver_path(ray_session):
    import ray.data

    from rsyslog_ray.stages.aggregate import group_topk
    from rsyslog_ray.stages.sketch import distinct_rows, exact_distinct_per_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 5, 20000).astype(str),
                       "v": rng.integers(0, 900, 20000).astype("int64")})
    dd, distinct, top = _truth(df)

    def mk():
        return ray.data.from_pandas(df).repartition(8)

    # exact_distinct_per_key: distributed == driver == pandas truth
    for thr in (0, 10**9):
        out = exact_distinct_per_key(mk(), "k", "v", driver_threshold=thr)
        got = out.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got, distinct.sort_values("k").reset_index(drop=True),
            check_dtype=False)

    # distinct_rows: distributed path returns a Dataset
    out = distinct_rows(mk(), ["k", "v"], driver_threshold=0)
    got = out.to_pandas()
    assert set(map(tuple, got.values)) == set(map(tuple, dd.values))
    assert len(got) == len(dd)

    # group_topk: distributed keyed head == driver exact top-k
    for thr in (0, 10**9):
        out = group_topk(mk(), "k", "v", k=3, cnt="n", driver_threshold=thr)
        got = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
        got = (got.sort_values(["k", "rank"]).reset_index(drop=True)
               [["k", "v", "n", "rank"]].astype({"n": "int64",
                                                 "rank": "int64"}))
        pd.testing.assert_frame_equal(
            got, top[["k", "v", "n", "rank"]].astype({"n": "int64",
                                                      "rank": "int64"}),
            check_dtype=False)


def test_hopping_window_count(ray_session):
    """Hopping windows: each event counted in window/hop overlapping
    windows; tumbling (hop == window) equals a plain time bucket."""
    import ray.data

    from rsyslog_ray.stages.aggregate import hopping_window_count

    ts = pd.to_datetime(["2026-01-01 00:00:05", "2026-01-01 00:00:35",
                         "2026-01-01 00:01:05", "2026-01-01 00:01:50"])
    df = pd.DataFrame({"ts": ts, "k": ["a", "a", "b", "a"]})
    ds = ray.data.from_pandas(df)
    # window 60s, hop 30s -> each event in 2 windows
    out = hopping_window_count(ds, "ts", 60, 30, keys=["k"])
    out["window_start"] = out["window_start"].astype(str)
    got = {(r.window_start, r.k): r.cnt for r in out.itertuples()}
    # pandas oracle
    want: dict = {}
    for t, key in zip(ts, df["k"]):
        sec = int(t.timestamp())
        last = sec // 30 * 30
        for w in (last, last - 30):
            ws = str(pd.Timestamp(w, unit="s"))
            want[(ws, key)] = want.get((ws, key), 0) + 1
    assert got == want
    # tumbling == floor-bucket counts
    ds2 = ray.data.from_pandas(df)
    tumb = hopping_window_count(ds2, "ts", 60, 60)
    bucket = df.groupby(df["ts"].dt.floor("60s")).size()
    assert sorted(tumb["cnt"]) == sorted(bucket.values)
    # distributed final agrees
    ds3 = ray.data.from_pandas(df).repartition(2)
    dist = hopping_window_count(ds3, "ts", 60, 30, keys=["k"],
                                driver_reduce=False).to_pandas()
    assert dist["cnt"].sum() == out["cnt"].sum()


def test_finalize_aggregates_adaptive(ray_session, tmp_path):
    """VERDICT r2 #4: the flagship dynstats final must survive key
    cardinality past driver memory.  Inflated host cardinality through
    (a) the streaming driver path with a tiny compaction threshold
    (driver memory = distinct keys, never keys x batches) and (b) the
    fully distributed spill_dir path (bucketed pandas reduce ->
    parquet, nothing on the driver) — all three must agree with the
    pandas truth."""
    import ray.data

    from rsyslog_ray.sinks import finalize_aggregates

    rng = np.random.default_rng(7)
    # inflated host cardinality: 3000 keys x several write batches
    parts = pd.DataFrame({
        "sink": rng.choice(["a", "b"], 20000),
        "kind": rng.choice(["host", "sev"], 20000),
        "key": rng.integers(0, 3000, 20000).astype(str),
        "cnt": rng.integers(1, 50, 20000).astype("int64"),
    })

    def mk():
        return ray.data.from_pandas(parts).repartition(8)

    driver = (finalize_aggregates(mk(), driver_threshold=10**9)
              .sort_values(["sink", "kind", "key"]).reset_index(drop=True))
    compacting = (finalize_aggregates(mk(), driver_threshold=1)
                  .sort_values(["sink", "kind", "key"])
                  .reset_index(drop=True))
    pd.testing.assert_frame_equal(compacting, driver, check_dtype=False)
    dist = (finalize_aggregates(mk(), spill_dir=str(tmp_path / "agg"))
            .to_pandas()
            .sort_values(["sink", "kind", "key"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        dist[["sink", "kind", "key", "cnt"]].astype({"cnt": "int64"}),
        driver, check_dtype=False)
    want = (parts.groupby(["sink", "kind", "key"], as_index=False)["cnt"]
            .sum().sort_values(["sink", "kind", "key"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(driver, want, check_dtype=False)


def test_range_join_semantics(ray_session):
    """stages/join.range_join: inclusive [ts - lookback, ts] window per
    key, one-to-many pairs, how='left' keeps windowless rows with NA,
    keys never cross."""
    import ray.data

    from rsyslog_ray.stages.join import range_join

    left = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "a", "b", "c"],
        "ts": [100.0, 200.0, 100.0, 50.0],
        "lid": [1, 2, 3, 4]}))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "a", "a", "b", "z"],
        "ts": [90.0, 100.0, 151.0, 40.0, 100.0],
        "rid": [10, 11, 12, 13, 14]}))

    out = (range_join(left, right, key="k", ts="ts", right_cols=["rid"],
                      lookback_s=50).to_pandas()
           .sort_values(["lid", "rid"]).reset_index(drop=True))
    got = list(zip(out["lid"], out["rid"]))
    # lid=1 window [50,100]: rids 10 (90) and 11 (100, inclusive upper)
    # lid=2 window [150,200]: rid 12 (151); 100 is out (lower bound 150)
    # lid=3 (key b) window [50,100]: nothing (40 < 50, exclusive? no —
    #   window is [50,100] inclusive, 40 misses)
    # lid=4 (key c): no right side at all
    assert got == [(1, 10), (1, 11), (2, 12)]

    outl = (range_join(left, right, key="k", ts="ts",
                       right_cols=["rid"], lookback_s=50, how="left")
            .to_pandas())
    assert len(outl) == 5                   # 3 pairs + 2 NA left rows
    na = outl[outl["rid"].isna()]
    assert sorted(na["lid"]) == [3, 4]
    # exact lower bound inclusive: lookback 60 brings (lid=3, rid=13)?
    # 40 < 100-60 -> still out; lookback exactly 60 gives [40, 100]
    out60 = (range_join(left, right, key="k", ts="ts",
                        right_cols=["rid"], lookback_s=60).to_pandas())
    assert (3, 13) in set(zip(out60["lid"], out60["rid"]))


def test_two_phase_agg_driver_equals_distributed(ray_session):
    """The driver and bucketed-distributed finals share ONE reduce
    definition — pin that they produce identical results (values AND
    dtypes-compatible) on a mixed count/sum/min/max spec with nulls
    and a hot key."""
    import numpy as np
    import pandas as pd
    import ray

    from rsyslog_ray.stages.aggregate import two_phase_agg

    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame({
        "k": np.where(rng.rand(n) < 0.5, "hot",
                      rng.randint(0, 300, n).astype(str)),
        "v": rng.randint(-100, 100, n).astype("int64"),
        "s": rng.randint(0, 10, n).astype("int64"),
    })
    ds = ray.data.from_pandas(df).repartition(13)
    kw = dict(count="cnt", sums={"s": "sum_s"},
              mins={"v": "min_v"}, maxs={"v": "max_v"},
              batch_size=256)
    drv = (two_phase_agg(ds, ["k"], **kw)
           .sort_values("k").reset_index(drop=True))
    dist = (two_phase_agg(ds, ["k"], driver_reduce=False, **kw)
            .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        drv, dist[drv.columns], check_dtype=False)
