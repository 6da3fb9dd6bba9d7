"""Composed event-analytics pipeline — the product-analytics
counterpart to pipelines/curation.py and pipelines/pretrain.py: one
run over an event stream produces every standing analytics artifact a
log platform serves, each stage a parquet resume point (the same
`_run_stage` atomic-rename contract — a killed run resumes from the
last completed stage, and a finished artifact is never recomputed):

  1. funnel/       ordered view→click→purchase completion counts
                   (aggregate.funnel_counts)
  2. retention/    cohort retention triangle (aggregate.retention_counts)
  3. paths/        top event-type trigram paths (aggregate.event_paths)
  4. stats/        per-type n/mean/stddev of value cents
                   (aggregate.stats_by_key, bit-deterministic)
  5. hourly/       pivoted hour-of-day × type counts (two-phase +
                   reduced-rows pivot, the q_pivot_counts shape)

All five stages share ONE column-pruned read of the events table and
are pure combiner/bucket shapes — nothing event-stream-sized reaches
the driver; the artifacts themselves are the small side (cohorts ×
offsets, |types|^3 paths, 24×|types| cells).

Reference relationship: this is the dynstats/impstats idea
(runtime/dynstats.c keyed counters flushed to stable storage) grown
into the report set a batch engine can stand behind — resumable,
deterministic, oracle-checkable per stage (each stage's operator has
its own SQL_TAIL oracle in pipelines/queries.py).
"""

from __future__ import annotations

import json
import os

import pandas as pd

from .curation import _run_stage

STAGES = ("funnel", "retention", "paths", "stats", "hourly")


def run_analytics(events_path: str, out_dir: str, *,
                  steps: tuple = ("view", "click", "purchase"),
                  path_k: int = 10, fused: bool = False) -> dict:
    """Run all five artifact stages; returns (and writes) the stats
    record {stage: rows}.  Ray must already be initialised by the
    caller.  ``fused=True`` materializes the pruned event read ONCE in
    the object store and shares it across the five stages (default: a
    streaming re-read per stage — the 100 TB posture, nothing
    event-stream-sized pinned); artifacts and resume are identical in
    both modes."""
    import numpy as np
    import ray.data

    from ..stages.aggregate import (event_paths, funnel_counts,
                                    retention_counts, stats_by_key,
                                    two_phase_agg)

    os.makedirs(out_dir, exist_ok=True)

    def _read():
        return ray.data.read_parquet(
            events_path,
            columns=["event_id", "user_id", "ts", "event_type",
                     "value"])

    if fused:
        _shared = _read().materialize()
        _read = lambda: _shared  # noqa: E731

    def _write_df(df: pd.DataFrame, tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        df.to_parquet(os.path.join(tmp, "part-0.parquet"))

    _run_stage(os.path.join(out_dir, "funnel"), lambda tmp: _write_df(
        funnel_counts(_read(), "user_id", "ts", "event_type",
                      list(steps)), tmp))

    _run_stage(os.path.join(out_dir, "retention"), lambda tmp: _write_df(
        retention_counts(_read(), "user_id", "ts"), tmp))

    _run_stage(os.path.join(out_dir, "paths"), lambda tmp: _write_df(
        event_paths(_read(), "user_id", ["ts", "event_id"],
                    "event_type", n=3, k=path_k), tmp))

    def _stats(tmp: str) -> None:
        def cents(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "event_type": df["event_type"],
                "xc": np.floor(df["value"].to_numpy(np.float64) * 100
                               + 0.5).astype("int64")})
        _write_df(stats_by_key(
            _read().map_batches(cents, batch_format="pandas"),
            "event_type", "xc"), tmp)

    _run_stage(os.path.join(out_dir, "stats"), _stats)

    def _hourly(tmp: str) -> None:
        def hour(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "hr": df["ts"].dt.hour.astype("int64"),
                "event_type": df["event_type"]})
        flat = two_phase_agg(
            _read().map_batches(hour, batch_format="pandas"),
            ["hr", "event_type"], count="cnt")
        wide = (flat.pivot(index="hr", columns="event_type",
                           values="cnt").fillna(0).astype("int64")
                .reset_index())
        wide.columns.name = None
        _write_df(wide.sort_values("hr").reset_index(drop=True), tmp)

    _run_stage(os.path.join(out_dir, "hourly"), _hourly)

    rec = {}
    for st in STAGES:
        rec[st] = int(len(pd.read_parquet(os.path.join(out_dir, st))))
    tmp = os.path.join(out_dir, "_analytics_stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(rec, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_analytics_stats.json"))
    return rec


def read_report(out_dir: str) -> pd.DataFrame:
    """One summary frame over the persisted artifacts: a (section,
    item, n) long view — the driver-checkable face of the run."""
    rows = []
    for st in STAGES:
        df = pd.read_parquet(os.path.join(out_dir, st))
        for _, r in df.iterrows():
            first = r.iloc[0]
            last = r.iloc[-1]
            rows.append((st, str(first),
                         int(last) if float(last) == int(last)
                         else int(round(float(last)))))
    return pd.DataFrame(rows, columns=["section", "item", "n"]).astype(
        {"n": "int64"})
