"""Flagship pipeline: parse → enrich → route → deliver → aggregate.

The end-to-end job from BASELINE.json.north_rule, expressed as ONE
streaming ``ray.data`` pipeline over the pages Parquet table:

  read_parquet(shards)                         # prune nothing: all 5 cols used
    -> ParseStage        (map_batches, vectorized rule chain + extract;
                          drops the wide html column immediately after)
    -> EnrichFn          (stateless tasks; broadcast lookup tables via ray.put)
    -> FanoutWriter      (actor pool; single-pass routed writes to all
                          sinks + per-shard lineage commit; emits
                          dynstats partials)
    -> groupby(sink,kind,key).sum(cnt)         # tiny final shuffle

Resume: committed shards (from _lineage.jsonl) are skipped AT THE READ —
their input files never enter the Dataset; partial output of
uncommitted shards is deleted first (idempotent rewrite).  This is the
reference's disk-assisted-queue checkpoint semantics
(runtime/queue.c:104-160) re-homed to a batch engine.
"""

from __future__ import annotations

import glob
import os
import uuid

import pandas as pd

from .. import sinks as sk
from ..router import DEFAULT_ROUTES, Router
from ..stages.enrich import EnrichFn, default_lookups
from ..stages.parse import ParseStage


def input_shards(pages_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(pages_dir, "pages-*.parquet")))


def run_flagship(
    pages_dir: str,
    out_dir: str,
    *,
    routes=None,
    resume: bool = True,
    parse_batch_size: int = 8192,
    write_batch_size: int = 32768,
    lineage: bool = True,
    lineage_shards: int | None = None,
    impstats_every: int | None = None,
) -> pd.DataFrame:
    """Run the flagship job; returns the final per-sink aggregate counts
    as a small DataFrame (sink, kind, key, cnt) — the dynstats output.

    Assumes Ray is already initialised by the caller (driver contract).
    """
    import ray
    import ray.data

    routes = routes if routes is not None else DEFAULT_ROUTES
    router = Router(routes)
    files = input_shards(pages_dir)
    if not files:
        raise FileNotFoundError(f"no pages-*.parquet under {pages_dir}")

    os.makedirs(out_dir, exist_ok=True)
    if resume:
        pending, done = sk.plan_resume(files, out_dir, router.sinks)
    else:
        pending, done = files, set()

    import time as _time

    t_run0 = _time.perf_counter()
    if not pending:
        # everything already committed — no work, but the final
        # dynstats still come from the committed shards' _agg
        # checkpoints (a crash can land BETWEEN the last lineage
        # commit and write_run_metrics: the re-invoke must repair the
        # metrics, not report an empty corpus)
        out = sk.read_agg_partials(out_dir, done)
        out = out.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
        sk.repair_run_metrics(out_dir, out, _time.perf_counter() - t_run0)
        return out

    lineage_name = None
    actors: list = []
    n_lshards = 1
    if lineage:
        expected = sk.shard_expected_rows(pending)
        if lineage_shards is None:
            # auto: one commit-log actor per ~64 input shards, capped —
            # a single actor is fine at toy scale (and keeps the
            # historical one-file layout); a 100k-shard cluster run
            # spreads commits over 16 logs instead of serializing every
            # writer on one num_cpus=0 actor
            n_lshards = max(1, min(16, len(pending) // 64))
        else:
            n_lshards = max(1, int(lineage_shards))
        lineage_name = f"lineage-{uuid.uuid4().hex[:8]}"
        actors = sk.make_lineage_actors(out_dir, expected,
                                        name=lineage_name,
                                        n_shards=n_lshards)

    try:
        ds = ray.data.read_parquet(pending)
        # ONE fused task stage for parse+enrich: stateless tasks spread
        # over every CPU (an actor pool here would cap the hottest stage
        # at the pool size — observed 3× slower), zero-copy Arrow in,
        # Arrow out.
        lookups_ref = ray.put(default_lookups())
        parse_fn = ParseStage()
        enrich_fn = EnrichFn(lookups_ref)

        def parse_enrich(batch):
            return enrich_fn(parse_fn(batch))

        ds = ds.map_batches(parse_enrich, batch_format="pyarrow",
                            batch_size=parse_batch_size)
        # stateless-task writer: fuses with parse+enrich into ONE elastic
        # task operator spread over every CPU. Large write batches: small
        # batches here explode into thousands of tiny parquet files.
        partials = ds.map_batches(
            sk.FanoutWriter(router, out_dir, lineage_name,
                            lineage_shards=n_lshards,
                            impstats_every=impstats_every),
            batch_format="pyarrow",
            batch_size=write_batch_size,
        )
        out = sk.finalize_aggregates(partials)  # |sinks|×|kinds|×|keys|
        if done:
            # a resumed run skipped committed shards at the read — fold
            # in their per-shard aggregate checkpoints (_agg/shard=N) so
            # the final dynstats (and _metrics.json) stay FULL-corpus
            # across any kill/resume sequence (gated on `done`, not this
            # run's lineage flag: the checkpoints are plain parquet)
            prev = sk.read_agg_partials(out_dir, done)
            if len(prev):
                out = (pd.concat([out, prev], ignore_index=True)
                       .groupby(["sink", "kind", "key"],
                                as_index=False)["cnt"]
                       .sum().astype({"cnt": "int64"}))
        out = out.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
        sk.write_run_metrics(out_dir, out, _time.perf_counter() - t_run0,
                             len(pending))
    finally:
        for a in actors:   # a failed run must not leak the named actors
            ray.kill(a)
    return out
