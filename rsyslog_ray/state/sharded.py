"""Actor-resident corpus shards for ITERATIVE algorithms.

Streaming `map_batches` is the right shape for one-pass transforms,
but iterative optimizers (logistic-regression SGD, Lloyd k-means) run
the SAME small-output pass 5-40 times: re-launching a fresh streaming
stage graph per iteration pays ~0.5-1 s of fixed scheduling overhead
per pass and re-reads the corpus from the object store every time.
This is the one place the Dataset API genuinely can't express the
semantics (a loop whose state lives across passes), so we drop to raw
Ray actors, per the engine's architecture rules:

- ``ShardedCorpus(ds)`` splits a (materialized) Dataset into K
  actor-held shards; each actor pulls ITS shard once (actor-side
  ``to_pandas`` — the driver never sees the corpus) and optionally
  pre-computes a per-shard state via ``init_fn`` (e.g. the normalized
  embedding matrix, or unpacked feature triples).
- ``corpus.map(fn, *args)`` runs ``fn(shard_state, *args)`` on every
  shard concurrently and returns results in SHARD ORDER (deterministic
  — split order is fixed for a materialized dataset), so float
  reductions over the results are bit-stable run-to-run.

Scale: per-actor memory is O(corpus/K); K defaults to the cluster CPU
count (capped by block count) so shards shrink as the cluster grows.
Per-iteration cost is one broadcast `ray.put` + K task round-trips —
milliseconds — while the corpus stays pinned in distributed actor
memory across all iterations.
"""

from __future__ import annotations


def _make_shard_cls():
    import ray

    @ray.remote
    class _CorpusShard:
        def __init__(self, shard, init_fn=None):
            df = shard.to_pandas()
            self.state = init_fn(df) if init_fn is not None else df

        def apply(self, fn, *args):
            return fn(self.state, *args)

    return _CorpusShard


class ShardedCorpus:
    """K actor-held shards of a Dataset; ``map`` = one iteration."""

    def __init__(self, ds, *, shards: int | None = None, init_fn=None):
        import ray

        mat = ds.materialize()
        if shards is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            # size shards to the DATA (≥~64 MiB each), capped by CPU
            # headroom: a tiny corpus gets one actor (process startup
            # dominates below that), a 100-TB corpus gets cpus-2 —
            # never the full CPU count, so shard actors can't starve a
            # concurrent streaming stage (CLAUDE.md invariant 9)
            by_size = -(-int(mat.size_bytes() or 1) // (64 << 20))
            shards = max(1, min(max(1, cpus - 2),
                                mat.num_blocks() or 1, by_size))
        parts = mat.split(shards, equal=False)
        cls = _make_shard_cls()
        self.actors = [cls.remote(p, init_fn) for p in parts]

    def map(self, fn, *args) -> list:
        """fn(shard_state, *args) per shard; results in shard order."""
        import ray

        return ray.get([a.apply.remote(fn, *args) for a in self.actors])

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []
