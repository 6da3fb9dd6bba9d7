"""semi/anti join (EXISTS / NOT EXISTS semantics incl. null keys and
hot keys) and rollup_agg (GROUP BY ROLLUP vs a pandas spec)."""

import numpy as np
import pandas as pd


def _mk(ray, df):
    import ray.data
    return ray.data.from_pandas(df).repartition(6)


def test_semi_anti_join_sql_semantics(ray_session):
    import ray

    rng = np.random.default_rng(13)
    # hot key 7 repeats heavily on both sides; left has null keys
    lk = rng.integers(0, 40, 5000).astype("float64")
    lk[rng.random(5000) < 0.05] = np.nan
    lk[:1500] = 7.0
    left = pd.DataFrame({"k": lk, "payload": np.arange(5000, dtype="int64")})
    rk = rng.integers(0, 25, 8000).astype("float64")
    rk[:3000] = 7.0
    rk[rng.random(8000) < 0.03] = np.nan  # right nulls never match
    right = pd.DataFrame({"k": rk, "junk": np.ones(8000)})

    from rsyslog_ray.stages.join import anti_join, semi_join

    rset = set(pd.Series(rk).dropna().unique())
    lnn = left["k"].notna() & left["k"].isin(rset)
    want_semi = left[lnn].sort_values("payload").reset_index(drop=True)
    # NOT EXISTS keeps left null keys
    want_anti = left[~lnn].sort_values("payload").reset_index(drop=True)

    # thr=0 forces the hash-partitioned path, the default forces the
    # broadcast (shuffle-free) path — identical results required
    for thr in (0, 10**9):
        got_semi = (semi_join(_mk(ray, left), _mk(ray, right), "k",
                              broadcast_threshold=thr)
                    .to_pandas().sort_values("payload")
                    .reset_index(drop=True))
        got_anti = (anti_join(_mk(ray, left), _mk(ray, right), "k",
                              broadcast_threshold=thr)
                    .to_pandas().sort_values("payload")
                    .reset_index(drop=True))
        # the NA-filled schema union promotes int64 -> nullable Int64
        # on the wire; values are what the contract pins
        pd.testing.assert_frame_equal(got_semi[["k", "payload"]],
                                      want_semi[["k", "payload"]],
                                      check_dtype=False)
        pd.testing.assert_frame_equal(got_anti[["k", "payload"]],
                                      want_anti[["k", "payload"]],
                                      check_dtype=False)
    assert want_anti["k"].isna().any()  # the null-keeping path ran


def test_rollup_agg_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 20000),
        "b": rng.choice(["p", "q"], 20000),
        "v": rng.integers(0, 500, 20000).astype("int64"),
    })
    from rsyslog_ray.stages.aggregate import rollup_agg

    got = rollup_agg(_mk(ray, df), ["a", "b"], sums={"v": "sv"})

    fine = (df.groupby(["a", "b"]).agg(cnt=("v", "size"), sv=("v", "sum"))
            .reset_index())
    mid = df.groupby("a").agg(cnt=("v", "size"), sv=("v", "sum")).reset_index()
    mid["b"] = None
    tot = pd.DataFrame({"a": [None], "b": [None], "cnt": [len(df)],
                        "sv": [int(df["v"].sum())]})
    want = (pd.concat([fine, mid[["a", "b", "cnt", "sv"]],
                       tot], ignore_index=True)
            .astype({"cnt": "int64", "sv": "int64"})
            .sort_values(["a", "b"], na_position="last", kind="mergesort")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # level count: fine(3*2) + mid(3) + total(1)
    assert len(got) == 10


def test_window_over_key_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(17)
    n = 15000
    df = pd.DataFrame({
        "k": rng.integers(0, 30, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "value": rng.normal(10, 3, n),
    })
    df.loc[:4000, "k"] = 3  # hot key: one partition carries 4k rows
    df["v_c"] = np.floor(df["value"] * 100 + 0.5).astype("int64")

    from rsyslog_ray.stages.aggregate import window_over_key

    got = (window_over_key(_mk(ray, df), "k", ["t", "id"], "value",
                           run_value="v_c", run_col="rs")
           .to_pandas().sort_values("id").reset_index(drop=True))

    s = df.sort_values(["k", "t", "id"], kind="mergesort")
    g = s.groupby("k")
    want = s.assign(rn=(g.cumcount() + 1).astype("int64"),
                    prev_value=g["value"].shift(1),
                    rs=g["v_c"].cumsum().astype("int64"))
    want = want.sort_values("id").reset_index(drop=True)
    cols = ["id", "rn", "prev_value", "rs"]
    pd.testing.assert_frame_equal(got[cols], want[cols])
    # lag is a bit-copy: non-null prevs match the source doubles exactly
    nn = got["prev_value"].notna()
    assert (got.loc[nn, "prev_value"].to_numpy()
            == want.loc[nn, "prev_value"].to_numpy()).all()


def test_group_concat_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(23)
    n = 8000
    df = pd.DataFrame({
        "k": rng.integers(0, 12, n).astype("int64"),
        "name": [f"n{i:05d}" for i in rng.permutation(n)],
        "o": np.arange(n, dtype="int64"),
    })
    from rsyslog_ray.stages.aggregate import group_concat

    got = group_concat(_mk(ray, df), "k", "name", ["o"], sep="|",
                       out="agg")
    s = df.sort_values(["k", "o"], kind="mergesort")
    want = (s.groupby("k")["name"].agg("|".join).rename("agg")
            .reset_index())
    pd.testing.assert_frame_equal(got, want)


def test_funnel_counts_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(29)
    n = 20000
    df = pd.DataFrame({
        "u": rng.integers(0, 800, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "e": rng.choice(["a", "b", "c", "x"], n, p=[.3, .25, .15, .3]),
    })
    steps = ["a", "b", "c"]
    from rsyslog_ray.stages.aggregate import funnel_counts

    got = funnel_counts(_mk(ray, df), "u", "t", "e", steps)

    # spec: per-user strict-> chain over earliest completion times
    counts = []
    cur = None
    for s in steps:
        rows = df[df["e"] == s][["u", "t"]]
        if cur is not None:
            rows = rows.merge(cur.rename("pt"), left_on="u",
                              right_index=True)
            rows = rows[rows["t"] > rows["pt"]]
        cur = rows.groupby("u")["t"].min()
        counts.append(len(cur))
    want = pd.DataFrame({"step": pd.Series([1, 2, 3], dtype="int64"),
                         "event_type": steps,
                         "users": pd.Series(counts, dtype="int64")})
    pd.testing.assert_frame_equal(got, want)
    assert counts[0] >= counts[1] >= counts[2] > 0


def test_cube_agg_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 12000),
        "b": rng.choice(["p", "q", "r"], 12000),
        "v": rng.integers(0, 100, 12000).astype("int64"),
    })
    from rsyslog_ray.stages.aggregate import cube_agg

    got = cube_agg(_mk(ray, df), ["a", "b"], sums={"v": "sv"})

    def lvl(sub):
        if sub:
            g = (df.groupby(sub).agg(cnt=("v", "size"), sv=("v", "sum"))
                 .reset_index())
        else:
            g = pd.DataFrame({"cnt": [len(df)], "sv": [int(df["v"].sum())]})
        for k in ("a", "b"):
            if k not in sub:
                g[k] = None
        return g[["a", "b", "cnt", "sv"]]

    want = (pd.concat([lvl(["a", "b"]), lvl(["a"]), lvl(["b"]), lvl([])],
                      ignore_index=True)
            .astype({"cnt": "int64", "sv": "int64"})
            .sort_values(["a", "b"], na_position="last", kind="mergesort")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 2 * 3 + 2 + 3 + 1


def test_resample_counts_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(37)
    n = 12000
    base = 1_700_000_000_000_000  # us epoch
    df = pd.DataFrame({
        "u": rng.integers(0, 60, n).astype("int64"),
        "ts": pd.Series((base + rng.integers(0, 3 * 86400 * 10**6, n))
                        .astype("datetime64[us]")),
    })
    # plant exact-hour-boundary events (the integer-ceil edge)
    df.loc[:20, "ts"] = pd.Timestamp(base, unit="us").ceil("h")

    from rsyslog_ray.stages.aggregate import resample_counts

    got = (resample_counts(_mk(ray, df), "u", "ts")
           .to_pandas().sort_values(["u", "gts"]).reset_index(drop=True))

    H = 3_600_000_000
    rows = []
    for u, grp in df.groupby("u"):
        t = np.sort(grp["ts"].to_numpy().astype("int64"))
        lo, hi = -(-t[0] // H), t[-1] // H
        for gh in range(lo, hi + 1):
            rows.append((u, gh * H, int((t <= gh * H).sum())))
    want = pd.DataFrame(rows, columns=["u", "gts", "n_events"])
    want["gts"] = want["gts"].astype("datetime64[us]")
    want = (want.astype({"u": "int64", "n_events": "int64"})
            .sort_values(["u", "gts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # boundary sanity: a grid point equal to an event ts counts it
    assert (want["n_events"] > 0).all()


def test_event_paths_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(41)
    n = 10000
    df = pd.DataFrame({
        "u": rng.integers(0, 200, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "e": rng.choice(["a", "b", "c"], n),
    })
    from rsyslog_ray.stages.aggregate import event_paths

    got = event_paths(_mk(ray, df), "u", ["t", "id"], "e", n=3, k=8)

    s = df.sort_values(["u", "t", "id"], kind="mergesort")
    paths = {}
    for _, grp in s.groupby("u"):
        es = grp["e"].tolist()
        for i in range(len(es) - 2):
            p = ">".join(es[i:i + 3])
            paths[p] = paths.get(p, 0) + 1
    want = (pd.DataFrame({"path": list(paths), "cnt": list(paths.values())})
            .sort_values(["cnt", "path"], ascending=[False, True])
            .head(8).reset_index(drop=True).astype({"cnt": "int64"}))
    pd.testing.assert_frame_equal(got, want)


def test_approx_distinct_per_key_error_and_merge(ray_session):
    import ray

    from rsyslog_ray.stages.sketch import approx_distinct_per_key

    rng = np.random.default_rng(43)
    ks, vs = [], []
    truth = {"a": 50, "b": 900, "c": 4000}
    for k, nd in truth.items():
        draws = rng.integers(0, nd, nd * 4)  # repeats; nd distinct max
        ks += [k] * len(draws)
        vs += [f"{k}:{d}" for d in draws]
        truth[k] = len(set(draws))
    df = pd.DataFrame({"k": ks, "v": vs})

    got = approx_distinct_per_key(_mk(ray, df), "k", "v", p=10)
    est = dict(zip(got["k"], got["approx_distinct"]))
    for k, nd in truth.items():
        rel = abs(est[k] - nd) / nd
        assert rel < 0.15, (k, est[k], nd)  # ~3x the 1.04/sqrt(1024) sigma

    # merge associativity: different partitionings, identical registers
    got2 = approx_distinct_per_key(
        ray.data.from_pandas(df).repartition(2), "k", "v", p=10)
    pd.testing.assert_frame_equal(got, got2)


def test_table_diff_vs_pandas_spec(ray_session):
    import ray

    from rsyslog_ray.stages.join import table_diff

    rng = np.random.default_rng(47)
    n = 6000
    a = pd.DataFrame({
        "k": np.arange(n, dtype="int64"),
        "x": rng.integers(0, 50, n).astype("int64"),
        "y": rng.choice(["p", "q"], n),
    })
    b = a.copy()
    b = b[b["k"] % 7 != 0]                      # removed
    b.loc[b["k"] % 5 == 0, "x"] += 1            # changed
    extra = pd.DataFrame({"k": np.arange(n, n + 100, dtype="int64"),
                          "x": np.zeros(100, dtype="int64"),
                          "y": ["p"] * 100})    # added
    b = pd.concat([b, extra], ignore_index=True)

    got = (table_diff(_mk(ray, a), _mk(ray, b), "k", ["x", "y"])
           .to_pandas().sort_values("k").reset_index(drop=True))

    m = a.merge(b, on="k", how="outer", suffixes=("_a", "_b"),
                indicator=True)
    status = np.where(m["_merge"] == "left_only", "removed",
                      np.where(m["_merge"] == "right_only", "added",
                               np.where((m["x_a"] == m["x_b"])
                                        & (m["y_a"] == m["y_b"]),
                                        "same", "changed")))
    want = (m.assign(status=status)[["k", "status"]]
            .query("status != 'same'")
            .sort_values("k").reset_index(drop=True)
            .astype({"k": "int64"}))
    pd.testing.assert_frame_equal(got.astype({"k": "int64"}), want)
    assert set(want["status"]) == {"added", "removed", "changed"}


def test_hash_join_salted_hot_key(ray_session):
    import ray

    from rsyslog_ray.stages.join import hash_join

    rng = np.random.default_rng(61)
    nl, nr = 9000, 3000
    lk = rng.integers(0, 50, nl).astype("int64")
    lk[:5000] = 7  # hot key: >half the left mass
    left = pd.DataFrame({"k": lk, "lv": np.arange(nl, dtype="int64")})
    rk = rng.integers(0, 50, nr).astype("int64")
    right = pd.DataFrame({"k": rk, "rv": np.arange(nr, dtype="int64")})

    want = (left.merge(right, on="k", how="inner")
            .sort_values(["lv", "rv"]).reset_index(drop=True))

    for how in ("inner", "left"):
        w = (left.merge(right, on="k", how=how)
             .sort_values(["lv", "rv"]).reset_index(drop=True))
        got = (hash_join(_mk(ray, left), _mk(ray, right), "k", how=how,
                         hot_keys=[7], hot_salts=4, n_buckets=16)
               .to_pandas().sort_values(["lv", "rv"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k", "lv", "rv"]].astype({"k": "int64"}),
            w[["k", "lv", "rv"]].astype({"k": "int64"}),
            check_dtype=False)

    # unsalted control still matches too (same pairs, one bucket)
    got0 = (hash_join(_mk(ray, left), _mk(ray, right), "k",
                      n_buckets=16)
            .to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got0[["k", "lv", "rv"]].astype({"k": "int64"}),
        want[["k", "lv", "rv"]], check_dtype=False)

    # the salting spreads the hot key's left rows over >1 bucket
    import pandas.util as pu
    h = int(pu.hash_array(np.array([7], dtype="int64"))[0])
    gold = 0x9E3779B97F4A7C15
    buckets = {(h + s * gold) % (2**64) % 16 for s in range(4)}
    assert len(buckets) > 1

    import pytest
    with pytest.raises(ValueError):
        hash_join(_mk(ray, left), _mk(ray, right), "k", how="outer",
                  hot_keys=[7])


def test_window_lead_ntile_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(71)
    n = 9000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "value": rng.normal(size=n),
    })
    # tiny groups exercise the c < n ntile edge (one row per tile)
    df.loc[df["k"] == 3, "k"] = 4
    df = pd.concat([df, pd.DataFrame({
        "k": [3, 3], "t": [1, 2], "id": [n, n + 1],
        "value": [0.5, 0.7]})], ignore_index=True)

    from rsyslog_ray.stages.aggregate import window_over_key

    got = (window_over_key(_mk(ray, df), "k", ["t", "id"], "value",
                           lead_col="nv", ntile_n=4, ntile_col="tile")
           .to_pandas().sort_values("id").reset_index(drop=True))

    s = df.sort_values(["k", "t", "id"], kind="mergesort")
    g = s.groupby("k")
    def ntile4(c):
        base, rem = divmod(c, 4)
        out = []
        for b in range(4):
            out += [b + 1] * (base + (1 if b < rem else 0))
        return out
    want = s.assign(nv=g["value"].shift(-1),
                    tile=np.concatenate(
                        [ntile4(len(grp)) for _, grp in g]))
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["id", "nv", "tile"]],
        want[["id", "nv", "tile"]].astype({"tile": "int64"}))
    # lead is a bit-copy where defined
    nn = got["nv"].notna()
    assert (got.loc[nn, "nv"].to_numpy()
            == want.loc[nn, "nv"].to_numpy()).all()


def test_sequence_match_vs_pandas_spec(ray_session):
    import re

    import ray

    from rsyslog_ray.stages.aggregate import sequence_match

    rng = np.random.default_rng(73)
    n = 8000
    df = pd.DataFrame({
        "u": rng.integers(0, 300, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "e": rng.choice(["a", "b", "c"], n),
    })
    alpha = {"a": "a", "b": "b", "c": "c"}
    pat = "ab+c"

    got = sequence_match(_mk(ray, df), "u", ["t", "id"], "e", pat,
                         alphabet=alpha)

    s = df.sort_values(["u", "t", "id"], kind="mergesort")
    rx = re.compile(pat)
    want = sorted(u for u, grp in s.groupby("u")
                  if rx.search("".join(grp["e"])))
    assert got["u"].tolist() == want
    assert len(want) > 0


def test_retention_counts_vs_pandas_spec(ray_session):
    import ray

    from rsyslog_ray.stages.aggregate import retention_counts

    rng = np.random.default_rng(79)
    n = 10000
    base = pd.Timestamp("2024-03-01")
    df = pd.DataFrame({
        "u": rng.integers(0, 400, n).astype("int64"),
        "ts": base + pd.to_timedelta(
            rng.integers(0, 14 * 86400, n), unit="s"),
    })
    got = retention_counts(_mk(ray, df), "u", "ts")

    day = df["ts"].dt.normalize()
    d0 = day.groupby(df["u"]).transform("min")
    spec = pd.DataFrame({"cohort": d0.dt.strftime("%Y-%m-%d"),
                         "day_offset": (day - d0).dt.days.astype("int64"),
                         "u": df["u"]}).drop_duplicates()
    want = (spec.groupby(["cohort", "day_offset"], as_index=False)["u"]
            .nunique().rename(columns={"u": "n_users"})
            .astype({"day_offset": "int64", "n_users": "int64"})
            .sort_values(["cohort", "day_offset"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # day 0 of each cohort counts every cohort member exactly once
    day0 = got[got["day_offset"] == 0].set_index("cohort")["n_users"]
    first = d0.dt.strftime("%Y-%m-%d").groupby(df["u"]).first()
    pd.testing.assert_series_equal(
        day0.sort_index(), first.value_counts().sort_index()
        .rename("n_users").astype("int64"), check_names=False)


def test_window_pct_rank_cume_dist(ray_session):
    import ray

    from rsyslog_ray.stages.aggregate import window_over_key

    rng = np.random.default_rng(83)
    n = 6000
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "value": rng.normal(size=n),
    })
    # single-row group: percent_rank must be 0, cume_dist 1
    df = pd.concat([df, pd.DataFrame({"k": [99], "t": [5], "id": [n],
                                      "value": [1.0]})],
                   ignore_index=True)
    got = (window_over_key(_mk(ray, df), "k", ["t", "id"], "value",
                           pct_rank_col="pr", cume_dist_col="cd")
           .to_pandas().sort_values("id").reset_index(drop=True))

    s = df.sort_values(["k", "t", "id"], kind="mergesort")
    g = s.groupby("k")
    rn = g.cumcount() + 1
    c = g["id"].transform("size")
    want = s.assign(pr=np.where(c > 1, (rn - 1) / (c - 1), 0.0),
                    cd=rn / c).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "pr", "cd"]],
                                  want[["id", "pr", "cd"]])
    one = got[got["id"] == n]
    assert float(one["pr"]) == 0.0 and float(one["cd"]) == 1.0


def test_corr_by_key_exact_and_partition_invariant(ray_session):
    import ray

    from rsyslog_ray.stages.aggregate import corr_by_key

    rng = np.random.default_rng(89)
    n = 12000
    x = rng.integers(0, 5000, n).astype("int64")
    # construct y correlated with x plus noise, all integer
    y = (x // 2 + rng.integers(0, 2500, n)).astype("int64")
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], n),
                       "x": x, "y": y})

    got = corr_by_key(_mk(ray, df), "k", "x", "y")
    # statistical sanity vs numpy's own corrcoef
    for k, grp in df.groupby("k"):
        ref = np.corrcoef(grp["x"], grp["y"])[0, 1]
        v = float(got.loc[got["k"] == k, "corr"].iloc[0])
        assert abs(v - ref) < 1e-9
        assert 0.5 < v < 0.95  # genuinely correlated fixture

    # partition invariance: integer moment sums make the float final
    # bit-identical under any batch split
    got2 = corr_by_key(ray.data.from_pandas(df).repartition(13),
                       "k", "x", "y")
    assert (got["corr"].to_numpy() == got2["corr"].to_numpy()).all()


def test_argmax_by_key_ties_and_minby(ray_session):
    import ray

    from rsyslog_ray.stages.aggregate import argmax_by_key

    rng = np.random.default_rng(97)
    n = 9000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n).astype("int64"),
        "v": rng.integers(0, 40, n).astype("int64"),  # heavy ties
        "p": rng.permutation(n).astype("int64"),
    })
    got = argmax_by_key(_mk(ray, df), "k", "v", "p")

    s = df.sort_values(["v", "p"], ascending=[False, True],
                       kind="mergesort")
    want = (s.groupby("k", as_index=False).first()[["k", "v", "p"]]
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # min_by: smallest v, then smallest p
    got_min = argmax_by_key(_mk(ray, df), "k", "v", "p", largest=False)
    s2 = df.sort_values(["v", "p"], kind="mergesort")
    want_min = (s2.groupby("k", as_index=False).first()[["k", "v", "p"]]
                .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_min, want_min)


def test_window_first_last_value(ray_session):
    import ray

    from rsyslog_ray.stages.aggregate import window_over_key

    rng = np.random.default_rng(101)
    n = 7000
    df = pd.DataFrame({
        "k": rng.integers(0, 18, n).astype("int64"),
        "t": rng.integers(0, 10**6, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "value": rng.normal(size=n),
    })
    got = (window_over_key(_mk(ray, df), "k", ["t", "id"], "value",
                           first_col="fv", last_col="lv")
           .to_pandas().sort_values("id").reset_index(drop=True))

    s = df.sort_values(["k", "t", "id"], kind="mergesort")
    g = s.groupby("k")["value"]
    want = s.assign(fv=g.transform("first"), lv=g.transform("last"))
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "fv", "lv"]],
                                  want[["id", "fv", "lv"]])
    # bit-copies
    assert (got["fv"].to_numpy() == want["fv"].to_numpy()).all()
    assert (got["lv"].to_numpy() == want["lv"].to_numpy()).all()


def test_stats_by_key_exact_and_partition_invariant(ray_session):
    import ray

    from rsyslog_ray.stages.aggregate import stats_by_key

    rng = np.random.default_rng(103)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 10000),
                       "x": rng.integers(0, 10000, 10000).astype("int64")})
    got = stats_by_key(_mk(ray, df), "k", "x")
    for k, grp in df.groupby("k"):
        row = got[got["k"] == k].iloc[0]
        assert int(row["n"]) == len(grp)
        assert abs(row["mean"] - grp["x"].mean()) < 1e-9
        assert abs(row["stddev"] - grp["x"].std(ddof=1)) < 1e-9
    got2 = stats_by_key(ray.data.from_pandas(df).repartition(11),
                        "k", "x")
    assert (got["mean"].to_numpy() == got2["mean"].to_numpy()).all()
    assert (got["stddev"].to_numpy() == got2["stddev"].to_numpy()).all()


def test_window_rank_dense_and_frame_vs_pandas_spec(ray_session):
    """rank()/dense_rank() over a ties-heavy value, plus the
    ROWS BETWEEN n-1 PRECEDING frame sum/count — vs pandas rank()
    and rolling() specs, with a hot key in one partition."""
    import ray

    rng = np.random.default_rng(23)
    n = 12000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype("int64"),
        "id": np.arange(n, dtype="int64"),
        "vb": rng.integers(0, 12, n).astype("int64"),  # heavy ties
        "vc": rng.integers(-500, 500, n).astype("int64"),
    })
    df.loc[:3000, "k"] = 7

    from rsyslog_ray.stages.aggregate import window_over_key

    got = (window_over_key(_mk(ray, df), "k", ["vb", "id"], "vb",
                           rank_value="vb", rank_col="rnk",
                           dense_rank_col="drnk",
                           roll_n=4, roll_value="vc",
                           roll_sum_col="w4", roll_cnt_col="w4n")
           .to_pandas().sort_values("id").reset_index(drop=True))

    s = df.sort_values(["k", "vb", "id"], kind="mergesort")
    g = s.groupby("k")
    want = s.assign(
        rnk=g["vb"].rank(method="min").astype("int64"),
        drnk=g["vb"].rank(method="dense").astype("int64"),
        w4=g["vc"].rolling(4, min_periods=1).sum()
            .reset_index(level=0, drop=True).astype("int64"),
        w4n=g["vc"].rolling(4, min_periods=1).count()
            .reset_index(level=0, drop=True).astype("int64"),
    ).sort_values("id").reset_index(drop=True)
    cols = ["id", "rnk", "drnk", "w4", "w4n"]
    pd.testing.assert_frame_equal(got[cols], want[cols])
    # frame sums stay int64 (order-exact by construction)
    assert got["w4"].dtype == np.int64


def test_grouping_sets_and_unpivot_vs_pandas_spec(ray_session):
    import ray

    rng = np.random.default_rng(31)
    n = 8000
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), n),
        "b": rng.integers(0, 4, n).astype("int64"),
        "v": rng.integers(-100, 100, n).astype("int64"),
    })

    from rsyslog_ray.stages.aggregate import grouping_sets_agg, unpivot

    got = grouping_sets_agg(_mk(ray, df), ["a", "b"],
                            [("a",), ("b",), ("a", "b"), ()],
                            sums={"v": "sv"})
    frames = []
    for sub in (["a"], ["b"], ["a", "b"], []):
        if sub:
            g = (df.groupby(sub)
                 .agg(cnt=("v", "size"), sv=("v", "sum")).reset_index())
        else:
            g = pd.DataFrame({"cnt": [len(df)], "sv": [df["v"].sum()]})
        for k in ("a", "b"):
            if k not in sub:
                g[k] = None
        frames.append(g[["a", "b", "cnt", "sv"]])
    want = (pd.concat(frames, ignore_index=True)
            .astype({"cnt": "int64", "sv": "int64"})
            .sort_values(["a", "b"], na_position="last", kind="mergesort")
            .reset_index(drop=True))
    svals = lambda f: sorted(tuple(str(x) for x in row)
                             for row in f.fillna("~").to_numpy().tolist())
    assert svals(got) == svals(want)

    # unpivot: 2 value cols -> 2n rows, values preserved per id
    up = (unpivot(_mk(ray, df.assign(id=np.arange(n))),
                  ["id"], ["b", "v"]).to_pandas()
          .sort_values(["id", "measure"]).reset_index(drop=True))
    assert len(up) == 2 * n
    wb = up[up["measure"] == "b"].sort_values("id")["val"].to_numpy()
    assert (wb == df["b"].to_numpy()).all()


def test_asof_directions_and_window_nth(ray_session):
    """asof_join forward/nearest vs a per-row spec (tie-free ts), and
    nth_value NULL rule for partitions shorter than n."""
    import ray

    rng = np.random.default_rng(41)
    nl, nr = 4000, 3000
    left = pd.DataFrame({
        "k": rng.integers(0, 20, nl).astype("int64"),
        "t": (rng.integers(0, 10**6, nl) * 2).astype("int64"),  # even
        "lid": np.arange(nl, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 20, nr).astype("int64"),
        "t": (rng.integers(0, 10**6, nr) * 2 + 1).astype("int64"),  # odd
        "rv": rng.integers(0, 10**9, nr).astype("int64"),
    })

    from rsyslog_ray.stages.join import asof_join

    for direction in ("forward", "nearest"):
        got = (asof_join(_mk(ray, left), _mk(ray, right), key="k",
                         ts="t", right_cols=["rv"], direction=direction)
               .to_pandas().sort_values("lid").reset_index(drop=True))
        want = pd.merge_asof(left.sort_values("t"),
                             right[["k", "t", "rv"]].sort_values("t"),
                             on="t", by="k", direction=direction) \
            .sort_values("lid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["lid", "rv"]],
                                      want[["lid", "rv"]],
                                      check_dtype=False)

    from rsyslog_ray.stages.aggregate import window_over_key

    df = pd.DataFrame({"k": [1, 1, 1, 2, 2, 3],
                       "t": [1, 2, 3, 1, 2, 1],
                       "id": np.arange(6, dtype="int64"),
                       "value": [10., 20., 30., 40., 50., 60.]})
    got = (window_over_key(_mk(ray, df), "k", ["t", "id"], "value",
                           nth_n=3, nth_col="n3")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["n3"].tolist()[:3] == [30., 30., 30.]
    assert got["n3"].isna().tolist()[3:] == [True, True, True]


def test_linreg_by_key_exact_and_partition_invariant(ray_session):
    """regr_slope/regr_intercept from integer moment partials: equals
    the closed-form numpy spec bit-for-bit and is invariant to the
    batch split (integer partial sums commute)."""
    import ray

    rng = np.random.default_rng(47)
    n = 20000
    df = pd.DataFrame({
        "k": rng.integers(0, 8, n).astype("int64"),
        "x": rng.integers(0, 86_400, n).astype("int64"),
        "y": rng.integers(0, 50_000, n).astype("int64"),
    })
    from rsyslog_ray.stages.aggregate import linreg_by_key

    got3 = linreg_by_key(ray.data.from_pandas(df).repartition(3),
                         "k", "x", "y")
    got17 = linreg_by_key(ray.data.from_pandas(df).repartition(17),
                          "k", "x", "y")
    pd.testing.assert_frame_equal(got3, got17)   # bit-identical

    for _, r in got3.iterrows():
        sub = df[df["k"] == r["k"]]
        nn = float(len(sub))
        sx, sy = float(sub["x"].sum()), float(sub["y"].sum())
        sxx = float((sub["x"] * sub["x"]).sum())
        sxy = float((sub["x"] * sub["y"]).sum())
        assert r["slope"] == (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
        assert r["icept"] == (sy * sxx - sx * sxy) / (nn * sxx - sx * sx)


def test_pagerank_int_vs_dense_spec(ray_session):
    """Integer PageRank == a dense numpy power-iteration spec; a dst
    node with no outgoing edges is outside the rank table (masked, not
    clobbered), and a node with no incoming edges ranks at base."""
    import ray

    rng = np.random.default_rng(53)
    n_nodes, n_edges = 60, 600
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes + 3, n_edges)     # some dangling dst
    edges = pd.DataFrame({"src": [f"n{v}" for v in src],
                          "dst": [f"n{v}" for v in dst]})
    # guarantee one node with outgoing but no incoming edges
    edges = pd.concat([edges, pd.DataFrame(
        {"src": ["lonely"], "dst": ["n0"]})], ignore_index=True)

    from rsyslog_ray.stages.graph import pagerank_int

    got = pagerank_int(_mk(ray, edges), "src", "dst", iters=3)

    deg = edges.groupby("src").size()
    nodes = sorted(deg.index)
    r = {v: 1_000_000 for v in nodes}
    for _ in range(3):
        contrib = {v: r[v] // int(deg[v]) for v in nodes}
        s = {v: 0 for v in nodes}
        for a, b in zip(edges["src"], edges["dst"]):
            if b in s:
                s[b] += contrib[a]
        r = {v: 150_000 + (85 * s[v]) // 100 for v in nodes}
    want = pd.DataFrame({"node": nodes,
                         "rank_u": [r[v] for v in nodes]})
    got = got.sort_values("node").reset_index(drop=True)
    want = want.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"rank_u": "int64"}), want.astype({"rank_u": "int64"}))
    assert r["lonely"] == 150_000          # no incoming -> base


def test_overlap_matrix_vs_pandas_spec(ray_session):
    """Exact pairwise distinct-entity overlap == a pandas set spec,
    partition-invariant (each entity's pairs emit in exactly one
    bucket)."""
    import ray

    rng = np.random.default_rng(59)
    n = 15000
    df = pd.DataFrame({
        "u": rng.integers(0, 500, n).astype("int64"),
        "lab": rng.choice(list("abcdef"), n),
    })
    from rsyslog_ray.stages.aggregate import overlap_matrix

    got = overlap_matrix(ray.data.from_pandas(df).repartition(7),
                         "u", "lab")
    d = df.drop_duplicates()
    m = d.merge(d, on="u")
    m = m[m["lab_x"] < m["lab_y"]]
    want = (m.groupby(["lab_x", "lab_y"], as_index=False)["u"]
            .nunique().rename(columns={"lab_x": "label_a",
                                       "lab_y": "label_b", "u": "n"})
            .astype({"n": "int64"})
            .sort_values(["label_a", "label_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_window_range_frame_peers_and_bounds(ray_session):
    """Time RANGE frame vs a per-row spec with PLANTED duplicate
    timestamps: SQL's peer rule includes later-positioned rows sharing
    the current ts, and the trailing bound is inclusive."""
    import ray

    df = pd.DataFrame({
        "k": [1] * 7 + [2] * 2,
        "t": [0, 100, 100, 100, 150, 251, 400, 0, 50],
        "id": np.arange(9, dtype="int64"),
        "v": [1, 2, 4, 8, 16, 32, 64, 100, 200],
    })
    df["t"] = df["t"].astype("int64")
    df["v"] = df["v"].astype("int64")

    from rsyslog_ray.stages.aggregate import window_over_key

    got = (window_over_key(
        ray.data.from_pandas(df).repartition(3), "k", ["t", "id"],
        "v", range_us=150, range_ts="t", range_value="v",
        range_sum_col="s", range_cnt_col="c")
        .to_pandas().sort_values("id").reset_index(drop=True))

    def spec(row):
        sub = df[(df["k"] == row["k"]) & (df["t"] >= row["t"] - 150)
                 & (df["t"] <= row["t"])]          # peers included
        return int(sub["v"].sum()), int(len(sub))
    want = df.apply(lambda r: spec(r), axis=1)
    assert got["s"].tolist() == [w[0] for w in want]
    assert got["c"].tolist() == [w[1] for w in want]
    # the three t=100 peers all see each other regardless of id order
    assert got.loc[[1, 2, 3], "s"].tolist() == [15, 15, 15]


def test_window_minmax_clipping_and_dtype(ray_session):
    """Rolling min/max frame vs a per-row spec: clipped at partition
    starts, int64 round-trip (no float contamination), and the deque
    kernel keyed per group never leaks across keys."""
    import ray

    from rsyslog_ray.stages.aggregate import window_over_key

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": np.repeat(np.arange(6, dtype="int64"), [1, 2, 3, 7, 11, 4]),
        "id": np.arange(28, dtype="int64"),
        "v": rng.integers(-1000, 1000, 28).astype("int64"),
    })

    got = (window_over_key(
        ray.data.from_pandas(df).repartition(4), "k", ["id"], "v",
        mm_n=3, mm_value="v", mm_min_col="mn", mm_max_col="mx")
        .to_pandas().sort_values("id").reset_index(drop=True))

    assert got["mn"].dtype == np.int64 and got["mx"].dtype == np.int64
    for _, row in df.iterrows():
        sub = df[(df["k"] == row["k"]) & (df["id"] <= row["id"])
                 & (df["id"] > row["id"] - 3)]["v"]
        r = got[got["id"] == row["id"]].iloc[0]
        assert r["mn"] == sub.min() and r["mx"] == sub.max()


def test_quantile_by_key_rank_rule(ray_session):
    """quantile_by_key vs DuckDB's quantile_disc rule
    idx = ceil(p*n)-1 on PLANTED group sizes 1, 2, 3 and 10 —
    the returned value is always an actual column element."""
    import ray

    from rsyslog_ray.stages.aggregate import quantile_by_key

    df = pd.DataFrame({
        "k": np.repeat([10, 20, 30, 40], [1, 2, 3, 10]).astype("int64"),
        "v": np.concatenate([[5], [1, 2], [1, 2, 3],
                             np.arange(1, 11)]).astype("int64"),
    })
    got = quantile_by_key(
        ray.data.from_pandas(df.sample(frac=1, random_state=3))
        .repartition(3), "k", "v", [25, 50, 90])
    want = pd.DataFrame({
        "k": [10, 20, 30, 40],
        "p25": [5, 1, 1, 3],    # ceil(.25n)-1
        "p50": [5, 1, 2, 5],
        "p90": [5, 2, 3, 9],
    }).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_set_op_keys_bits_and_empty(ray_session):
    """set_op_keys: presence-bit OR per bucket (intersect==3,
    except==1) on a planted overlap, plus the all-empty EXCEPT path
    (Ray's schema-less 0-row blocks must still yield a typed empty
    frame)."""
    import ray

    from rsyslog_ray.stages.aggregate import set_op_keys

    a = pd.DataFrame({"id": np.array([1, 2, 3, 4, 5, 5], "int64")})
    b = pd.DataFrame({"id": np.array([4, 5, 6], "int64")})
    da = ray.data.from_pandas(a).repartition(2)
    db = ray.data.from_pandas(b).repartition(2)

    inter = set_op_keys(da, db, "id", "intersect")
    assert inter["id"].tolist() == [4, 5]
    exc = set_op_keys(da, db, "id", "except")
    assert exc["id"].tolist() == [1, 2, 3]

    sub = ray.data.from_pandas(pd.DataFrame(
        {"id": np.array([4, 5], "int64")}))
    empty = set_op_keys(sub, da, "id", "except")
    assert len(empty) == 0 and empty["id"].dtype == np.int64


def test_hash_join_full_outer_planted(ray_session):
    """FULL OUTER hash_join: left-only, right-only and matched keys
    each survive exactly once (a key lives in one bucket), payload
    NaNs are the only fills."""
    import ray

    from rsyslog_ray.stages.join import hash_join

    l = pd.DataFrame({"k": np.array([1, 2, 3], "int64"),
                      "lv": np.array([10, 20, 30], "int64")})
    r = pd.DataFrame({"k": np.array([2, 3, 4, 4], "int64"),
                      "rv": np.array([200, 300, 400, 401], "int64")})
    got = (hash_join(ray.data.from_pandas(l).repartition(2),
                     ray.data.from_pandas(r).repartition(2),
                     on="k", how="outer")
           .to_pandas().sort_values(["k", "rv"]).reset_index(drop=True))
    assert got["k"].tolist() == [1, 2, 3, 4, 4]
    assert got["lv"].fillna(-1).tolist() == [10, 20, 30, -1, -1]
    assert got["rv"].fillna(-1).tolist() == [-1, 200, 300, 400, 401]


def test_ndv_by_key_cross_batch_dedup(ray_session):
    """ndv_by_key counts a (key, val) pair ONCE however many batches
    and blocks repeat it — the pair-hash shuffle colocates duplicates."""
    import ray

    from rsyslog_ray.stages.aggregate import ndv_by_key

    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 3,
        "v": np.array([1, 1, 2, 2, 3, 1, 7, 7, 7], "int64"),
    })
    got = ndv_by_key(ray.data.from_pandas(df).repartition(5), "k", "v")
    assert got["k"].tolist() == ["a", "b"]
    assert got["ndv"].tolist() == [3, 1]
    assert got["ndv"].dtype == np.int64


def test_apply_changelog_semantics(ray_session):
    """CDC merge per-row spec: keep (no change), update (last 'u'),
    delete (last 'd'), insert (new-key 'u'), delete-then-reinsert
    ordering by seq, and delete of a never-present key is a no-op."""
    import ray

    from rsyslog_ray.stages.join import apply_changelog

    base = pd.DataFrame({"k": np.array([1, 2, 3, 4], "int64"),
                         "v": np.array([10, 20, 30, 40], "int64")})
    ch = pd.DataFrame({
        "k":   np.array([2,   3,   5,   4,   4,  9], "int64"),
        "seq": np.array([100, 101, 102, 103, 104, 105], "int64"),
        "op":  ["u",  "d",  "u",  "d",  "u", "d"],
        "v":   np.array([21, 0, 50, 0, 41, 0], "int64"),
    })
    got = (apply_changelog(
        ray.data.from_pandas(base).repartition(2),
        ray.data.from_pandas(ch).repartition(3), "k", "seq", "v")
        .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": np.array([1, 2, 4, 5], "int64"),
                         "v": np.array([10, 21, 41, 50], "int64")})
    pd.testing.assert_frame_equal(got, want)


def test_hash_join_bloom_prefilter(ray_session):
    """Bloom runtime filter: inner-join results identical with and
    without the prefilter, the mask has NO false negatives, and on a
    mostly-unmatched left side it prunes nearly everything before the
    shuffle."""
    import ray

    from rsyslog_ray.stages.join import (bloom_mask, hash_join,
                                         key_bloom)

    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k": rng.integers(0, 100_000, 5000).astype("int64"),
                      "lv": np.arange(5000, dtype="int64")})
    r = pd.DataFrame({"k": np.arange(0, 200, dtype="int64"),
                      "rv": np.arange(200, dtype="int64") * 7})
    dl = ray.data.from_pandas(l).repartition(4)
    dr = ray.data.from_pandas(r).repartition(2)

    plain = (hash_join(dl, dr, on="k").to_pandas()
             .sort_values(["k", "lv"]).reset_index(drop=True))
    pruned = (hash_join(dl, dr, on="k", bloom_bits=1 << 20).to_pandas()
              .sort_values(["k", "lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        pruned[sorted(pruned.columns)], plain[sorted(plain.columns)])

    bf = key_bloom(dr, "k", 1 << 20)
    mask = bloom_mask(l["k"], bf, 1 << 20)
    really = l["k"].isin(set(r["k"])).to_numpy()
    assert (mask | ~really).all()           # no false negatives
    # at 2^20 bits / 200 keys the FP rate is tiny: nearly every
    # non-matching left row is pruned before the shuffle
    assert mask.sum() <= really.sum() + 50

    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_join(dl, dr, on="k", how="outer", bloom_bits=1 << 20)


def test_bfs_hops_planted_graph(ray_session):
    """BFS spec on a planted graph: min-hop tie (two paths to one
    node), depth cap excludes the far tail, disconnected node absent,
    edge-less source still distance 0."""
    import ray

    from rsyslog_ray.stages.graph import bfs_hops

    e = pd.DataFrame({
        "src": ["a", "a", "b", "c", "d", "e", "x"],
        "dst": ["b", "c", "d", "d", "e", "f", "y"],
    })
    got = bfs_hops(ray.data.from_pandas(e).repartition(3),
                   "src", "dst", ["a", "lonely"], max_depth=3)
    want = pd.DataFrame({
        "node": ["a", "b", "c", "d", "e", "lonely"],
        "d": np.array([0, 1, 1, 2, 3, 0], "int64"),
    })
    pd.testing.assert_frame_equal(got, want)   # f at d=4 capped out


def test_window_offsets_and_ratio(ray_session):
    """lag_n/lead_n NULL within n of the partition edge; ratio
    shares sum to 1 per key; shifts never cross keys."""
    import ray

    from rsyslog_ray.stages.aggregate import window_over_key

    df = pd.DataFrame({
        "k": np.array([1, 1, 1, 1, 2, 2], "int64"),
        "id": np.arange(6, dtype="int64"),
        "v": np.array([10, 20, 30, 40, 5, 15], "int64"),
    })
    got = (window_over_key(
        ray.data.from_pandas(df).repartition(3), "k", ["id"], "v",
        lag_n=2, lag_n_col="l2", lead_n=1, lead_n_col="f1",
        ratio_value="v", ratio_col="r")
        .to_pandas().sort_values("id").reset_index(drop=True))
    assert got["l2"].fillna(-1).tolist() == [-1, -1, 10, 20, -1, -1]
    assert got["f1"].fillna(-1).tolist() == [20, 30, 40, -1, 15, -1]
    assert got.groupby("k")["r"].sum().tolist() == [1.0, 1.0]
    assert got.loc[0, "r"] == 10 / 100


def test_hash_join_composite_key(ray_session):
    """Composite-key hash_join == pandas merge on both columns; the
    single-column path is unchanged; bloom prefilter composes with
    composite keys."""
    import ray

    from rsyslog_ray.stages.join import hash_join

    rng = np.random.default_rng(5)
    l = pd.DataFrame({"a": rng.integers(0, 20, 400).astype("int64"),
                      "b": rng.integers(0, 5, 400).astype("int64"),
                      "lv": np.arange(400, dtype="int64")})
    r = pd.DataFrame({"a": rng.integers(0, 20, 100).astype("int64"),
                      "b": rng.integers(0, 5, 100).astype("int64"),
                      "rv": np.arange(100, dtype="int64") * 3})
    r = r.drop_duplicates(["a", "b"]).reset_index(drop=True)
    dl = ray.data.from_pandas(l).repartition(3)
    dr = ray.data.from_pandas(r).repartition(2)

    def norm(df):
        df = df.sort_values(["a", "b", "lv"]).reset_index(drop=True)
        return df.astype({c: "int64" for c in df.columns})

    want = norm(l.merge(r, on=["a", "b"], how="inner"))
    got = norm(hash_join(dl, dr, on=["a", "b"]).to_pandas())
    pd.testing.assert_frame_equal(got[want.columns], want)

    got2 = norm(hash_join(dl, dr, on=["a", "b"],
                          bloom_bits=1 << 18).to_pandas())
    pd.testing.assert_frame_equal(got2[want.columns], want)


def test_resolve_chains_pointer_jumping(ray_session):
    """Redirect-chain resolution == a per-row chase spec: mixed chain
    lengths (1..6 hops), branching onto shared suffixes, and a 2-cycle
    that must terminate (landing on a cycle member) — chains up to
    2**rounds resolve."""
    import ray

    edges = pd.DataFrame({
        "u": [1, 2, 3, 4, 5, 6,        # 6->5->4->3->2->1->0 chain
              10, 11,                  # short chains onto 12
              20, 21],                 # 2-cycle
        "t": [0, 1, 2, 3, 4, 5,
              12, 12,
              21, 20]})

    from rsyslog_ray.stages.graph import resolve_chains

    got = (resolve_chains(_mk(ray, edges), "u", "t", rounds=3)
           .to_pandas().sort_values("u").reset_index(drop=True))

    def chase(u, hops):
        m = dict(zip(edges["u"], edges["t"]))
        t = m[u]
        for _ in range(hops - 1):
            t = m.get(t, t)
        return t

    # 2**3 = 8 jumps: every acyclic chain (longest is 6) fully resolves
    for _, r in got[~got["u"].isin([20, 21])].iterrows():
        assert r["t"] == chase(r["u"], 8)
    # the cycle rows still emit one row each, landing inside the cycle
    cyc = got[got["u"].isin([20, 21])]
    assert len(cyc) == 2 and set(cyc["t"]).issubset({20, 21})
    # partition-invariance
    got1 = (resolve_chains(ray.data.from_pandas(edges), "u", "t",
                           rounds=3)
            .to_pandas().sort_values("u").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, got1)


def test_hits_int_vs_dense_spec(ray_session):
    """Integer HITS == a dense numpy spec (a1 = indegree, h1 = A @ a1,
    a2 = A.T @ h1, micro-unit scaling by max-division), including
    multigraph duplicate edges and pure-source / pure-sink nodes."""
    import ray

    rng = np.random.default_rng(7)
    n = 40
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    edges = pd.DataFrame({"src": src, "dst": dst})
    edges = pd.concat([edges, edges.head(5)], ignore_index=True)  # dups

    from rsyslog_ray.stages.graph import hits_int

    got = (hits_int(_mk(ray, edges), "src", "dst")
           .sort_values("node").reset_index(drop=True))

    nodes = np.union1d(edges["src"].unique(), edges["dst"].unique())
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for a, b in zip(edges["src"], edges["dst"]):
        A[idx[a], idx[b]] += 1
    a1 = A.sum(axis=0)
    h1 = A @ a1
    a2 = A.T @ h1
    want = pd.DataFrame({
        "node": nodes,
        "auth_u": (a2 * 1_000_000) // max(1, a2.max()),
        "hub_u": (h1 * 1_000_000) // max(1, h1.max())})
    pd.testing.assert_frame_equal(
        got.astype({"auth_u": "int64", "hub_u": "int64"}),
        want.astype({"auth_u": "int64", "hub_u": "int64"}))


def test_triangle_count_vs_dense_spec(ray_session):
    """Distributed exact triangle count == trace(A^3)/6 on a dense
    boolean adjacency spec — duplicate edges, reversed edges and
    self-loops all ignored; partition-invariant."""
    import ray

    rng = np.random.default_rng(31)
    n = 30
    src = rng.integers(0, n, 250)
    dst = rng.integers(0, n, 250)
    edges = pd.DataFrame({"src": src, "dst": dst})
    edges = pd.concat([edges, edges.head(7),                 # dups
                       edges.head(5).rename(                 # reversed
                           columns={"src": "dst", "dst": "src"}),
                       pd.DataFrame({"src": [3], "dst": [3]})],  # loop
                      ignore_index=True)

    A = np.zeros((n, n), dtype=np.int64)
    for a, b in zip(edges["src"], edges["dst"]):
        if a != b:
            A[a, b] = A[b, a] = 1
    want = int(np.trace(A @ A @ A)) // 6

    from rsyslog_ray.stages.graph import triangle_count

    for nparts in (1, 6):
        ds = ray.data.from_pandas(edges).repartition(nparts)
        assert triangle_count(ds, "src", "dst") == want
    assert want > 0          # the fixture actually has triangles


def test_resolve_chains_early_exit_high_rounds(ray_session):
    """A generous rounds budget on a short-chain mapping returns the
    same resolution (the no-movement early exit is behavior-neutral),
    including when round 1 already moves nothing."""
    import ray

    edges = pd.DataFrame({"u": [1, 2, 3], "t": [0, 0, 2]})

    from rsyslog_ray.stages.graph import resolve_chains

    want = (resolve_chains(_mk(ray, edges), "u", "t", rounds=1)
            .to_pandas().sort_values("u").reset_index(drop=True))
    got = (resolve_chains(_mk(ray, edges), "u", "t", rounds=10)
           .to_pandas().sort_values("u").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert got["t"].tolist() == [0, 0, 0]
    # already-resolved mapping: zero movement in round 1
    flat = pd.DataFrame({"u": [5, 6], "t": [0, 0]})
    out = (resolve_chains(_mk(ray, flat), "u", "t", rounds=8)
           .to_pandas().sort_values("u").reset_index(drop=True))
    assert out["t"].tolist() == [0, 0]


def test_hits_int_empty_graph(ray_session):
    """A link-free corpus (zero edges) returns an empty typed result
    instead of crashing."""
    import ray

    from rsyslog_ray.stages.graph import hits_int

    empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                          "dst": pd.Series([], dtype="int64")})
    got = hits_int(ray.data.from_pandas(empty), "src", "dst")
    assert len(got) == 0
    assert list(got.columns) == ["node", "auth_u", "hub_u"]


def test_pagerank_distributed_equals_broadcast(ray_session):
    """The hash-join (no-driver-table) PageRank == the broadcast
    variant bit-for-bit on a random multigraph with dangling dsts and
    a no-incoming node — the documented escape hatch, implemented."""
    import ray

    rng = np.random.default_rng(61)
    edges = pd.DataFrame({
        "src": rng.integers(0, 50, 400),
        "dst": rng.integers(0, 55, 400)})   # some dangling dsts
    edges = pd.concat([edges, pd.DataFrame(
        {"src": [999], "dst": [0]})], ignore_index=True)

    from rsyslog_ray.stages.graph import (pagerank_int,
                                          pagerank_int_distributed)

    want = (pagerank_int(_mk(ray, edges), "src", "dst", iters=3)
            .sort_values("node").reset_index(drop=True))
    got = (pagerank_int_distributed(_mk(ray, edges), "src", "dst",
                                    iters=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"node": "int64", "rank_u": "int64"}),
        want.astype({"node": "int64", "rank_u": "int64"}))


def test_hits_distributed_equals_broadcast(ray_session):
    """The hash-join (no-driver-table) HITS == the broadcast variant
    bit-for-bit, including multigraph duplicates and pure-source /
    pure-sink nodes."""
    import ray

    rng = np.random.default_rng(67)
    edges = pd.DataFrame({"src": rng.integers(0, 35, 260),
                          "dst": rng.integers(0, 40, 260)})
    edges = pd.concat([edges, edges.head(4)], ignore_index=True)

    from rsyslog_ray.stages.graph import hits_int, hits_int_distributed

    want = (hits_int(_mk(ray, edges), "src", "dst")
            .sort_values("node").reset_index(drop=True))
    got = (hits_int_distributed(_mk(ray, edges), "src", "dst")
           .to_pandas().sort_values("node").reset_index(drop=True))
    cast = {"node": "int64", "auth_u": "int64", "hub_u": "int64"}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))


def test_bfs_distributed_equals_broadcast(ray_session):
    """The hash-join (no-driver-dict) BFS == the broadcast variant on
    a random graph with unreachable nodes and multi-source seeds."""
    import ray

    rng = np.random.default_rng(71)
    edges = pd.DataFrame({"src": rng.integers(0, 40, 200),
                          "dst": rng.integers(0, 48, 200)})

    from rsyslog_ray.stages.graph import bfs_hops, bfs_hops_distributed

    want = (bfs_hops(_mk(ray, edges), "src", "dst", [0, 7],
                     max_depth=3)
            .sort_values("node").reset_index(drop=True))
    got = (bfs_hops_distributed(_mk(ray, edges), "src", "dst", [0, 7],
                                max_depth=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    cast = {"node": "int64", "d": "int64"}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))
