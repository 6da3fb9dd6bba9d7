"""Flagship pipeline: parse → enrich → route → deliver → aggregate.

The end-to-end job from BASELINE.json.north_rule, expressed as ONE
streaming ``ray.data`` pipeline over the pages Parquet table:

  read_parquet(shards)                         # prune nothing: all 5 cols used
    -> ParseStage        (map_batches, vectorized rule chain + extract;
                          drops the wide html column immediately after)
    -> EnrichStage       (actor pool; broadcast lookup tables via ray.put)
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
from ..stages.enrich import EnrichStage, default_lookups
from ..stages.parse import parse_pages


def input_shards(pages_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(pages_dir, "pages-*.parquet")))


def run_flagship(
    pages_dir: str,
    out_dir: str,
    *,
    routes=None,
    resume: bool = True,
    parse_batch_size: int = 2048,
    enrich_concurrency=None,
    write_concurrency=None,
    lineage: bool = True,
) -> pd.DataFrame:
    """Run the flagship job; returns the final per-sink aggregate counts
    as a small DataFrame (sink, kind, key, cnt) — the dynstats output.

    Assumes Ray is already initialised by the caller (driver contract).
    """
    import ray
    import ray.data

    routes = routes if routes is not None else DEFAULT_ROUTES
    router = Router(routes)
    # autoscaling actor pools sized to the session: the two pools share
    # the CPUs with the stateless parse tasks — fixed pools that sum past
    # the CPU count would deadlock the streaming executor.
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if enrich_concurrency is None:
        enrich_concurrency = (1, max(1, ncpu // 2))
    if write_concurrency is None:
        write_concurrency = (1, max(1, ncpu // 2))
    files = input_shards(pages_dir)
    if not files:
        raise FileNotFoundError(f"no pages-*.parquet under {pages_dir}")

    os.makedirs(out_dir, exist_ok=True)
    if resume:
        pending, done = sk.plan_resume(files, out_dir, router.sinks)
    else:
        pending, done = files, set()

    if not pending:
        # everything already committed — nothing to (re)do
        return pd.DataFrame(columns=["sink", "kind", "key", "cnt"])

    lineage_name = None
    actor = None
    if lineage:
        expected = sk.shard_expected_rows(pending)
        lineage_name = f"lineage-{uuid.uuid4().hex[:8]}"
        actor = sk.make_lineage_actor(out_dir, expected, name=lineage_name)

    ds = ray.data.read_parquet(pending)
    ds = parse_pages(ds, batch_size=parse_batch_size)
    lookups_ref = ray.put(default_lookups())
    ds = ds.map_batches(
        EnrichStage,
        fn_constructor_args=(lookups_ref,),
        batch_format="pandas",
        batch_size=parse_batch_size,
        concurrency=enrich_concurrency,
    )
    partials = ds.map_batches(
        sk.FanoutWriter,
        fn_constructor_args=(router, out_dir, lineage_name),
        batch_format="pandas",
        batch_size=None,  # one batch per block ≈ per input shard
        concurrency=write_concurrency,
    )
    agg = sk.finalize_aggregates(partials)
    out = agg.to_pandas()  # small: |sinks| × |kinds| × |keys|
    if actor is not None:
        ray.kill(actor)
    return out.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
