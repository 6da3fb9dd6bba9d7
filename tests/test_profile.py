"""table_profile — distributed column statistics vs the pandas spec
oracle (stages/profile.py table_profile_oracle is the ground truth;
CLAUDE.md invariant 5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rsyslog_ray.stages.profile import table_profile, table_profile_oracle


def _fixture() -> pd.DataFrame:
    rng = np.random.RandomState(7)
    n = 4000
    df = pd.DataFrame({
        # numeric strings that sort differently as text ("9" > "10"):
        # catches a reduce that stringifies before the min/max
        "s": [str(v) for v in rng.randint(0, 2000, n)],
        "i": rng.randint(-500, 500, n).astype("int64"),
        "f": np.round(rng.randn(n) * 100, 3),
        "t": pd.to_datetime("2024-03-01")
             + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
    })
    # nulls in every column, plus one all-null stretch to exercise the
    # empty-batch partial path
    for c in df.columns:
        df.loc[df.index % 17 == 3, c] = None
    df.loc[:40, "f"] = None
    return df


@pytest.mark.usefixtures("ray_session")
def test_table_profile_matches_oracle():
    import ray.data

    df = _fixture()
    cols = ["f", "i", "s", "t"]
    # many small blocks so partial-reduce ordering and per-batch unique
    # sets actually matter
    ds = ray.data.from_pandas(df).repartition(13)
    got = table_profile(ds, cols, nparts=8)
    want = table_profile_oracle(df, cols)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_table_profile_all_null_column():
    import ray.data

    df = pd.DataFrame({"a": pd.array([None] * 50, dtype="Int64"),
                       "b": list(range(50))})
    ds = ray.data.from_pandas(df).repartition(4)
    got = table_profile(ds, ["a", "b"], nparts=4)
    want = table_profile_oracle(df, ["a", "b"])
    pd.testing.assert_frame_equal(got, want)
