"""Composed analytics pipeline: artifact correctness vs the already-
tested operators, and stage-level resume (a completed stage is never
recomputed; a torn stage rebuilds)."""

import os
import shutil

import numpy as np
import pandas as pd


def _events(n=12000, seed=7):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-05-01").value // 1000  # us
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, 300, n).astype("int64"),
        "ts": pd.Series((base + rng.integers(0, 10 * 86400 * 10**6, n))
                        .astype("datetime64[us]")),
        "event_type": rng.choice(
            ["view", "click", "purchase", "error", "signup"], n,
            p=[.4, .25, .1, .15, .1]),
        "value": rng.uniform(0.01, 490.0, n).round(2),
    })


def test_analytics_pipeline_artifacts_and_resume(ray_session, tmp_path):
    from rsyslog_ray.pipelines.analytics import (STAGES, read_report,
                                                 run_analytics)
    from rsyslog_ray.stages.aggregate import funnel_counts

    import ray.data

    df = _events()
    src = str(tmp_path / "events.parquet")
    df.to_parquet(src)
    out = str(tmp_path / "report")

    rec = run_analytics(src, out)
    assert set(rec) == set(STAGES) and all(v > 0 for v in rec.values())

    # funnel artifact == the operator run directly
    direct = funnel_counts(ray.data.read_parquet(src), "user_id", "ts",
                           "event_type", ["view", "click", "purchase"])
    stored = pd.read_parquet(os.path.join(out, "funnel"))
    pd.testing.assert_frame_equal(stored, direct)

    # hourly pivot: row per present hour, type columns sum to n_events
    hourly = pd.read_parquet(os.path.join(out, "hourly"))
    assert hourly.drop(columns=["hr"]).to_numpy().sum() == len(df)

    # resume: completed stages untouched (mtime), torn stage rebuilt
    mt_before = {s: os.path.getmtime(os.path.join(out, s))
                 for s in STAGES}
    shutil.rmtree(os.path.join(out, "paths"))
    os.makedirs(os.path.join(out, "paths.inprogress"))  # torn debris
    rec2 = run_analytics(src, out)
    assert rec2 == rec
    for s in STAGES:
        if s != "paths":
            assert os.path.getmtime(os.path.join(out, s)) == mt_before[s]
    assert os.path.isdir(os.path.join(out, "paths"))
    assert not os.path.isdir(os.path.join(out, "paths.inprogress"))

    rep = read_report(out)
    assert set(rep["section"]) == set(STAGES)
    assert (rep["n"] >= 0).all() and len(rep) == sum(rec.values())
