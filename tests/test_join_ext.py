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

    got_semi = (semi_join(_mk(ray, left), _mk(ray, right), "k")
                .to_pandas().sort_values("payload").reset_index(drop=True))
    got_anti = (anti_join(_mk(ray, left), _mk(ray, right), "k")
                .to_pandas().sort_values("payload").reset_index(drop=True))
    # the NA-filled schema union promotes int64 -> nullable Int64 on
    # the wire; values are what the contract pins
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
