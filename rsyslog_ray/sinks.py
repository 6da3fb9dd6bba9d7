"""Sinks — single-pass fan-out Parquet delivery with per-partition lineage.

rsyslog delivers one message to many actions through action queues with
transactional commit (reference runtime/action.c beginTransaction /
doAction / endTransaction; batch element states RDY/SUB/COMM/DISC,
runtime/batch.h:38-43) and checkpoints queue read/write pointers so a
crash redelivers only uncommitted work (.qi checkpoints,
runtime/queue.c:104-160; bounded duplication, at-least-once).

Ray-Data-first re-expression for 100 TB:

- **Single pass.** The routed fan-out happens INSIDE one terminal
  ``map_batches`` actor stage (`FanoutWriter`): each batch's route masks
  are evaluated once and every sink's rows are appended to
  ``out_dir/<sink>/shard=<K>/part-*.parquet``.  The input streams
  through the pipeline exactly once — no per-sink re-read, no
  materialization of the parsed dataset.
- **Partition = input shard.** Every row carries a ``shard`` id (the
  generator writes one file per shard).  Output files are laid out per
  (sink, shard) and written atomically (tmp + rename).
- **Per-partition commit.** A detached ``LineageActor`` knows the
  expected row count of every shard (read from parquet footers at plan
  time — cheap metadata).  Writer actors report rows after each file
  lands; the moment a shard's seen-count reaches its expected count the
  actor appends one lineage record (shard, rows_in, rows_out_per_sink,
  files, wall) to ``_lineage.jsonl`` — the .qi analog.  A killed run
  therefore loses only uncommitted shards.
- **Resume.** ``plan_resume`` lists committed shards from the manifest,
  deletes partial output of uncommitted shards (idempotent rewrite) and
  returns only the pending input files.

The stage's *output* is tiny: per-batch partial aggregate records
(dynstats partials — see stages/aggregate.py) that flow into a final
small ``groupby().sum()``.  This is the combiner pattern: the wide
shuffle moves (sink × kind × key) partials, never rows.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .router import Router

LINEAGE_FILE = "_lineage.jsonl"


def shard_expected_rows(files: list[str]) -> dict[int, int]:
    """Read per-shard row counts from parquet footers (metadata only)."""
    out: dict[int, int] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        # shard id from filename pages-NNNNN.parquet
        base = os.path.basename(f)
        sid = int(base.split("-")[-1].split(".")[0])
        out[sid] = out.get(sid, 0) + md.num_rows
    return out


def make_lineage_actor(out_dir: str, expected: dict[int, int], name: str | None = None):
    """Create the (named) lineage actor for a run."""
    import ray

    @ray.remote(num_cpus=0)
    class LineageActor:
        """Tracks per-shard completion; appends the lineage record the
        moment a shard is fully delivered (queue-checkpoint analog)."""

        def __init__(self, out_dir: str, expected: dict[int, int]):
            self.out_dir = out_dir
            self.expected = expected
            self.seen: dict[int, int] = {}
            self.sink_rows: dict[int, dict[str, int]] = {}
            self.files: dict[int, int] = {}
            self.t0: dict[int, float] = {}
            self.committed: set[int] = set()

        def report(self, shard: int, rows_in: int,
                   sink_rows: dict[str, int], n_files: int) -> None:
            self.t0.setdefault(shard, time.time())
            self.seen[shard] = self.seen.get(shard, 0) + rows_in
            sr = self.sink_rows.setdefault(shard, {})
            for s, r in sink_rows.items():
                sr[s] = sr.get(s, 0) + r
            self.files[shard] = self.files.get(shard, 0) + n_files
            if (shard not in self.committed
                    and self.seen[shard] >= self.expected.get(shard, -1)):
                self._commit(shard)

        def _commit(self, shard: int) -> None:
            rec = {
                "partition_id": shard,
                "rows_in": self.seen[shard],
                "rows_out_per_sink": self.sink_rows.get(shard, {}),
                "n_files": self.files.get(shard, 0),
                "wall_ms": int((time.time() - self.t0[shard]) * 1000),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            path = os.path.join(self.out_dir, LINEAGE_FILE)
            with open(path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                os.fsync(fh.fileno())
            self.committed.add(shard)

        def committed_shards(self) -> list[int]:
            return sorted(self.committed)

    os.makedirs(out_dir, exist_ok=True)
    # named (job-scoped, NOT detached) so it dies with the driver; writer
    # actors resolve it by name via ray.get_actor within the job.
    opts = {"name": name} if name else {}
    return LineageActor.options(**opts).remote(out_dir, expected)


def committed_shards(out_dir: str) -> set[int]:
    path = os.path.join(out_dir, LINEAGE_FILE)
    done: set[int] = set()
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    done.add(json.loads(line)["partition_id"])
    return done


def plan_resume(input_files: list[str], out_dir: str,
                sinks: list[str]) -> tuple[list[str], set[int]]:
    """Return (pending input files, committed shard ids); delete partial
    output of uncommitted shards so the rewrite is idempotent."""
    done = committed_shards(out_dir)
    pending = []
    for f in input_files:
        sid = int(os.path.basename(f).split("-")[-1].split(".")[0])
        if sid in done:
            continue
        pending.append(f)
        for s in sinks:
            d = os.path.join(out_dir, s, f"shard={sid}")
            if os.path.isdir(d):
                for p in os.listdir(d):
                    os.unlink(os.path.join(d, p))
    return pending, done


class FanoutWriter:
    """Terminal actor stage: route + write every sink in one pass.

    Output batches are dynstats PARTIALS:
      (sink:str, kind:str in {lang,host,bucket}, key:str, cnt:int64)
    plus per-shard row records are reported to the lineage actor.

    Use with ``batch_size=None`` so each input block (≈ one input shard
    file) is routed and written as one unit — few, large output files.
    """

    AGG_KINDS = (("lang", "lang"), ("host", "url_host"), ("bucket", None))

    def __init__(self, routes, out_dir: str, lineage_name: str | None = None,
                 drop_cols: tuple = ("html",)):
        import ray
        self.router = routes if isinstance(routes, Router) else Router(routes)
        self.out_dir = out_dir
        self.drop_cols = drop_cols
        self.lineage = ray.get_actor(lineage_name) if lineage_name else None
        self.wid = uuid.uuid4().hex[:8]
        self.n = 0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        masks = self.router.masks(batch)
        keep = [c for c in batch.columns if c not in self.drop_cols]
        partials: list[pd.DataFrame] = []
        # per-shard bookkeeping for lineage
        shard_counts = batch.groupby("shard").size()
        sink_shard_rows: dict[int, dict[str, int]] = {
            int(s): {} for s in shard_counts.index}
        files_per_shard: dict[int, int] = {int(s): 0 for s in shard_counts.index}

        for sink, m in masks.items():
            sub = batch.loc[m, keep]
            if len(sub) == 0:
                continue
            # ---- write one file per (sink, shard) present in this batch
            for sid, grp in sub.groupby("shard"):
                sid = int(sid)
                d = os.path.join(self.out_dir, sink, f"shard={sid}")
                os.makedirs(d, exist_ok=True)
                self.n += 1
                fp = os.path.join(d, f"part-{self.wid}-{self.n:05d}.parquet")
                tmp = fp + ".inprogress"
                pq.write_table(pa.Table.from_pandas(grp, preserve_index=False),
                               tmp, compression="zstd")
                os.replace(tmp, fp)
                sink_shard_rows[sid][sink] = sink_shard_rows[sid].get(sink, 0) + len(grp)
                files_per_shard[sid] += 1
            # ---- dynstats partials for this sink (combiner: counts
            # collapse to at most |keys| rows per batch before the shuffle)
            partials.append(_partials_for(sink, sub))

        if self.lineage is not None:
            import ray
            refs = [
                self.lineage.report.remote(
                    sid, int(shard_counts.loc[sid]),
                    sink_shard_rows[sid], files_per_shard[sid])
                for sid in shard_counts.index
            ]
            ray.get(refs)  # backpressure: don't outrun the commit log

        if partials:
            return pd.concat(partials, ignore_index=True)
        return pd.DataFrame({"sink": pd.Series([], dtype=object),
                             "kind": pd.Series([], dtype=object),
                             "key": pd.Series([], dtype=object),
                             "cnt": pd.Series([], dtype="int64")})


def _partials_for(sink: str, sub: pd.DataFrame) -> pd.DataFrame:
    outs = []
    by_lang = sub.groupby("lang").size()
    outs.append(pd.DataFrame({"kind": "lang", "key": by_lang.index.astype(str),
                              "cnt": by_lang.values}))
    by_host = sub.groupby("url_host").size()
    outs.append(pd.DataFrame({"kind": "host", "key": by_host.index.astype(str),
                              "cnt": by_host.values}))
    bucket = sub["warc_ts"].dt.floor("h").dt.strftime("%Y-%m-%dT%H:00:00")
    by_b = bucket.groupby(bucket).size()
    outs.append(pd.DataFrame({"kind": "bucket", "key": by_b.index.astype(str),
                              "cnt": by_b.values}))
    out = pd.concat(outs, ignore_index=True)
    out.insert(0, "sink", sink)
    out["cnt"] = out["cnt"].astype("int64")
    return out


def finalize_aggregates(partials_ds):
    """Final dynstats reduction: tiny shuffle over partial counts."""
    from ray.data.aggregate import Sum

    return (partials_ds
            .groupby(["sink", "kind", "key"])
            .aggregate(Sum("cnt", alias_name="cnt")))
