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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .router import Router

LINEAGE_FILE = "_lineage.jsonl"
AGG_DIR = "_agg"  # per-shard dynstats checkpoint files (resume source)


def shard_id_of(path: str) -> int:
    """Shard id of an input file: the trailing integer in the basename
    (pages-00042.parquet -> 42); files without one hash to a stable id."""
    import re as _re
    import zlib

    base = os.path.basename(path)
    m = _re.search(r"(\d+)\D*\.parquet$", base)
    if m:
        return int(m.group(1))
    return zlib.crc32(base.encode()) & 0x7FFFFFFF


def shard_expected_rows(files: list[str]) -> dict[int, int]:
    """Read per-shard row counts from parquet footers (metadata only)."""
    out: dict[int, int] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        sid = shard_id_of(f)
        out[sid] = out.get(sid, 0) + md.num_rows
    return out


def lineage_file_of(k: int) -> str:
    """Commit-log file owned by lineage actor ``k``: actor 0 keeps the
    historical ``_lineage.jsonl`` name (single-actor runs and external
    pollers see the same file), further actors get ``_lineage-<k>``."""
    return LINEAGE_FILE if k == 0 else f"_lineage-{k}.jsonl"


def lineage_files(out_dir: str) -> list[str]:
    """Every commit-log file of a run (base + sharded)."""
    import glob as _glob

    out = []
    base = os.path.join(out_dir, LINEAGE_FILE)
    if os.path.exists(base):
        out.append(base)
    out.extend(sorted(_glob.glob(
        os.path.join(out_dir, "_lineage-*.jsonl"))))
    return out


def make_lineage_actors(out_dir: str, expected: dict[int, int],
                        name: str | None = None, n_shards: int = 1):
    """Create the commit-log actor POOL for a run: ``n_shards`` named
    actors, actor ``k`` owning the shard ids with ``sid % n == k`` and
    appending to its own ``_lineage[-k].jsonl``.  One actor is the
    r4-and-earlier layout; sharding removes the single-actor commit
    serialization point on a multi-node run (every writer blocked on
    ONE num_cpus=0 actor whose jsonl lived on one node) while keeping
    the per-shard commit protocol — ``plan_resume`` merges all files.
    Returns the handle list (index = shard-id residue)."""
    import ray

    @ray.remote(num_cpus=0)
    class LineageActor:
        """Tracks per-shard completion; appends the lineage record the
        moment a shard is fully delivered (queue-checkpoint analog)."""

        def __init__(self, out_dir: str, expected: dict[int, int],
                     log_name: str = LINEAGE_FILE):
            self.out_dir = out_dir
            self.log_name = log_name
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
            # never auto-commit a shard absent from the expected map: a
            # default/mis-resolved shard id would otherwise commit on its
            # first batch, and a crash mid-run would resume past rows it
            # never wrote (silent data loss)
            exp = self.expected.get(shard)
            if (exp is not None and shard not in self.committed
                    and self.seen[shard] >= exp):
                self._commit(shard)

        def report_many(self, entries: list[tuple]) -> None:
            """One RPC per write batch: [(shard, rows_in, sink_rows,
            n_files), ...]."""
            for shard, rows_in, sink_rows, n_files in entries:
                self.report(shard, rows_in, sink_rows, n_files)

        def _commit(self, shard: int) -> None:
            rec = {
                "partition_id": shard,
                "rows_in": self.seen[shard],
                "rows_out_per_sink": self.sink_rows.get(shard, {}),
                "n_files": self.files.get(shard, 0),
                "wall_ms": int((time.time() - self.t0[shard]) * 1000),
                "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            # append + flush, NO fsync: an fsync per commit serializes on
            # writeback congestion (measured +20 s at sf1.0); losing a
            # tail record on a crash only means that shard is redone —
            # the resume path is idempotent either way.
            path = os.path.join(self.out_dir, self.log_name)
            with open(path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
            self.committed.add(shard)

        def committed_shards(self) -> list[int]:
            return sorted(self.committed)

    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, int(n_shards))
    # named (job-scoped, NOT detached) so they die with the driver;
    # writer tasks resolve them by name via ray.get_actor in the job.
    actors = []
    for k in range(n_shards):
        exp_k = {sid: v for sid, v in expected.items()
                 if sid % n_shards == k}
        opts = {"name": f"{name}:{k}"} if name else {}
        actors.append(LineageActor.options(**opts).remote(
            out_dir, exp_k, lineage_file_of(k)))
    return actors


def make_lineage_actor(out_dir: str, expected: dict[int, int],
                       name: str | None = None):
    """Single-actor convenience wrapper (the r4 API; tests use it)."""
    return make_lineage_actors(out_dir, expected, name=name,
                               n_shards=1)[0]


def committed_shards(out_dir: str) -> set[int]:
    """Committed partition ids from the manifest(s) — the base log plus
    every sharded ``_lineage-<k>.jsonl``.  Corrupt/truncated lines
    (crash mid-append — the reference's bad-.qi fixtures,
    tests/bad_qi/, tests/badqi.sh) are treated as ABSENT: the shard is
    simply redone, which the idempotent rewrite makes safe."""
    done: set[int] = set()
    for path in lineage_files(out_dir):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    done.add(int(rec["partition_id"]))
                except (ValueError, KeyError, TypeError):
                    continue  # torn write -> redo that shard
    return done


def _heal_lineage(out_dir: str) -> None:
    """Drop torn manifest content before the run appends: a crash
    mid-append leaves a HALF-WRITTEN final line with no newline, and a
    later flush-only append would fuse the next commit onto it —
    output stays correct (idempotent rewrite) but that shard would
    read as uncommitted forever, redone on EVERY subsequent resume.
    Rewrite keeps exactly the parseable lines (atomic tmp+rename);
    applied to every commit-log file of the run."""
    for path in lineage_files(out_dir):
        with open(path) as fh:
            raw = fh.read()
        good = []
        dirty = not raw.endswith("\n") and raw.strip() != ""
        for line in raw.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                json.loads(line)
                good.append(line)
            except ValueError:
                dirty = True
        if not dirty and len(good) == len([l for l in raw.splitlines()
                                           if l.strip()]):
            continue
        tmp = path + ".heal"
        with open(tmp, "w") as fh:
            fh.write("".join(l + "\n" for l in good))
        os.replace(tmp, path)


def plan_resume(input_files: list[str], out_dir: str,
                sinks: list[str]) -> tuple[list[str], set[int]]:
    """Return (pending input files, committed shard ids); delete partial
    output of uncommitted shards so the rewrite is idempotent."""
    _heal_lineage(out_dir)
    done = committed_shards(out_dir)
    pending = []
    for f in input_files:
        sid = shard_id_of(f)
        if sid in done:
            continue
        pending.append(f)
        for s in list(sinks) + [AGG_DIR]:
            d = os.path.join(out_dir, s, f"shard={sid}")
            if os.path.isdir(d):
                for p in os.listdir(d):
                    fp = os.path.join(d, p)
                    if os.path.isdir(fp):       # dynafile partition dirs
                        import shutil
                        shutil.rmtree(fp, ignore_errors=True)
                    else:
                        os.unlink(fp)
    return pending, done


_LINEAGE_CACHE: dict[tuple, list] = {}  # per-worker-process handle lists
_EMITTER_CACHE: dict[tuple, object] = {}  # per-process interval emitters


def _lineage_handles(name: str | None, n_shards: int) -> list:
    """Resolve the run's lineage actor pool by name, once per worker
    process.  Index k serves shard ids with ``sid % n_shards == k``."""
    if name is None:
        return []
    key = (name, n_shards)
    hs = _LINEAGE_CACHE.get(key)
    if hs is None:
        import ray
        hs = [ray.get_actor(f"{name}:{k}") for k in range(n_shards)]
        _LINEAGE_CACHE[key] = hs
    return hs


class FanoutWriter:
    """Terminal stage: route + write every sink in one pass.

    A plain callable (STATELESS TASKS, not an actor pool): passed as an
    instance to ``map_batches`` it fuses with the upstream parse+enrich
    tasks into one fully-elastic task operator — an actor pool here caps
    the fused hot stage at the pool size and pays ramp-up (measured 0.22
    scaling efficiency with a pool vs tasks).  The only cross-batch
    state, the lineage actor handle, is resolved once per worker
    process via ``ray.get_actor`` and cached.

    Output batches are dynstats PARTIALS:
      (sink:str, kind:str in {lang,host,bucket}, key:str, cnt:int64)
    plus per-shard row records are reported to the lineage actor.

    Use with a large ``batch_size`` (32k) — small batches explode into
    thousands of tiny parquet files.
    """

    # sinks that keep the full payload (the default template writes a
    # projection — rsyslog actions write template-rendered lines, not
    # the raw message; omfile default templates, tools/smfile.c):
    FULL_SINKS = ("archive", "deadletter")
    # heavy payload columns excluded from slim sinks
    HEAVY_COLS = ("text", "extracted")

    # dynstats dimensions: (kind label, source column); "__bucket" is
    # the hour-floor of `ts_col` computed per batch
    AGG_KINDS = (("lang", "lang"), ("host", "url_host"),
                 ("bucket", "__bucket"))

    def __init__(self, routes, out_dir: str, lineage_name: str | None = None,
                 drop_cols: tuple = ("html",), compression: str = "zstd",
                 full_sinks: tuple | None = None,
                 agg_kinds: tuple | None = None, ts_col: str = "warc_ts",
                 formats: dict | None = None,
                 partition_by: dict | None = None,
                 impstats_every: int | None = None,
                 connectors: dict | None = None,
                 lineage_shards: int = 1):
        self.router = routes if isinstance(routes, Router) else Router(routes)
        self.out_dir = out_dir
        self.drop_cols = drop_cols
        self.compression = compression
        self.full_sinks = self.FULL_SINKS if full_sinks is None else full_sinks
        self.agg_kinds = self.AGG_KINDS if agg_kinds is None else tuple(agg_kinds)
        self.ts_col = ts_col
        # per-sink output format (omfile template choice analog):
        # "parquet" (default) | "csv" | "jsonl" |
        # {"template": "<%prop% text>"} (rendered lines -> .log)
        self.formats = formats or {}
        self._tpls: dict = {}  # compiled Template cache (per worker)
        # dynafile analog (tools/omfile.c:133-192 template-computed
        # paths + handle cache): sink -> column whose VALUE becomes a
        # hive subdirectory under the shard dir
        self.partition_by = partition_by or {}
        self.lineage_name = lineage_name
        self.lineage_shards = max(1, int(lineage_shards))
        # interval impstats (impstats.c:114-123): emit a counter line
        # every N write batches per worker; None = end-of-run only
        # (write_run_metrics).  Lazy per-worker emitter — zero hot-path
        # cost when off.
        self.impstats_every = impstats_every
        self._emitter = None
        # network actions (omkafka/omfwd/DB sinks declared in config):
        # sink name -> {"factory": zero-arg callable -> transport,
        # "batch_rows"/"error_file"/"max_retries" optional}.  Routed
        # rows for these sinks are DELIVERED instead of written —
        # at-least-once on task retry (the reference's action-queue
        # resend); resume still skips committed shards, so finished
        # work is never re-sent on a re-invoke.  Zero hot-path cost
        # when empty.
        self.connectors = connectors or {}
        self._conn_cache: dict = {}  # per-worker ConnectorSink cache

    WRITE_RETRIES = 3

    def _deliver(self, sink: str, tbl: pa.Table) -> None:
        """Network delivery through a per-worker-cached ConnectorSink
        (transport connects lazily on first bulk; a stateless task's
        worker process keeps the connection across its batches)."""
        cs = self._conn_cache.get(sink)
        if cs is None:
            from .stages.connectors import ConnectorSink
            spec = self.connectors[sink]
            cs = ConnectorSink(
                transport=spec["factory"](),
                batch_rows=int(spec.get("batch_rows", 2048)),
                error_file=spec.get("error_file"),
                max_retries=int(spec.get("max_retries", 3)))
            self._conn_cache[sink] = cs
        cs(tbl.to_pandas())

    def _write(self, grp: pa.Table, d: str, stem: str, fmt: str) -> None:
        """Write with bounded retry + backoff (action suspend/retry
        analog, runtime/action.c:863-1015: iResumeInterval escalation).
        Transient FS errors retry; persistent ones raise after the last
        attempt — Ray then retries the task, and a truly dead
        filesystem fails the run loudly rather than dropping rows."""
        import sys as _sys
        import time as _time

        last = None
        for attempt in range(self.WRITE_RETRIES):
            try:
                return self._write_once(grp, d, stem, fmt)
            except OSError as ex:
                last = ex
                print(f"# sink write retry {attempt + 1}/"
                      f"{self.WRITE_RETRIES} for {d}/{stem}: {ex}",
                      file=_sys.stderr)
                _time.sleep(0.1 * (4 ** attempt))
        raise last

    def _write_once(self, grp: pa.Table, d: str, stem: str, fmt) -> None:
        if isinstance(fmt, dict) and ("template" in fmt
                                      or "template_list" in fmt):
            # omfile line output through the template engine; list
            # templates whose fields carry jsonf render n/v objects
            from .template import Template
            key = json.dumps(fmt, sort_keys=True)
            tpl = self._tpls.get(key)
            if tpl is None:
                tpl = (Template(fmt["template"]) if "template" in fmt
                       else Template.from_list(fmt["template_list"]))
                self._tpls[key] = tpl
            jsonf = any("jsonf" in e.opts for e in tpl.entries
                        if e.const is None)
            lines = (tpl.render_jsonf(grp.to_pandas()) if jsonf
                     else tpl.render(grp.to_pandas()))
            payload = "\n".join(lines.astype(str).tolist())
            if len(lines):
                payload += "\n"
            # zipLevel > 0: gzip the line file (omfile zip output,
            # tools/omfile.c:296-299 — one complete gzip stream per
            # file is the veryRobustZip="on" shape: every file
            # decompresses independently, a torn write loses only its
            # own file, which the lineage redo rewrites anyway)
            zlevel = int(fmt.get("zipLevel", 0))
            if zlevel > 0:
                import gzip
                tmp = os.path.join(d, stem + ".log.gz.inprogress")
                with open(tmp, "wb") as fh:
                    # mtime=0: byte-deterministic output for resume
                    # idempotence checks
                    with gzip.GzipFile(fileobj=fh, mode="wb",
                                       compresslevel=zlevel,
                                       mtime=0) as gz:
                        gz.write(payload.encode())
                os.replace(tmp, os.path.join(d, stem + ".log.gz"))
                return
            tmp = os.path.join(d, stem + ".log.inprogress")
            with open(tmp, "w") as fh:
                fh.write(payload)
            os.replace(tmp, os.path.join(d, stem + ".log"))
        elif fmt == "csv":
            from pyarrow import csv as pacsv
            tmp = os.path.join(d, stem + ".csv.inprogress")
            pacsv.write_csv(grp, tmp)
            os.replace(tmp, os.path.join(d, stem + ".csv"))
        elif fmt == "jsonl":
            tmp = os.path.join(d, stem + ".jsonl.inprogress")
            grp.to_pandas().to_json(tmp, orient="records", lines=True,
                                    date_format="iso")
            os.replace(tmp, os.path.join(d, stem + ".jsonl"))
        else:
            tmp = os.path.join(d, stem + ".parquet.inprogress")
            pq.write_table(grp, tmp, compression=self.compression)
            os.replace(tmp, os.path.join(d, stem + ".parquet"))

    @property
    def lineage(self):
        """Commit-log actor pool (empty list when lineage is off)."""
        return _lineage_handles(self.lineage_name, self.lineage_shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # file stem = md5 of the batch's identity-column buffers, NOT a
        # fresh uuid: a Ray task retry re-runs the SAME rows, derives
        # the same stem and OVERWRITES its own part files instead of
        # appending a second copy into a shard that then commits
        # (a killed attempt never reached the lineage report, so the
        # successful attempt's rows alone satisfy the expected count —
        # duplicates from a uuid stem would be permanent).  Batches
        # partition the input disjointly, so distinct batches hash to
        # distinct stems.
        wid = _batch_stem(batch)
        n = 0
        if "shard" not in batch.column_names:
            # inputs without a shard column: whole run = one partition
            # (resume granularity degrades to run-level; gen-produced
            # tables always carry `shard`)
            batch = batch.append_column(
                "shard", pa.array(np.zeros(len(batch), dtype=np.int32)))
        if any(col == "__bucket" for _, col in self.agg_kinds):
            # precompute the hour-bucket key once per batch (dynstats key)
            bucket = pc.strftime(
                pc.floor_temporal(batch[self.ts_col], unit="hour"),
                "%Y-%m-%dT%H:00:00")
            batch = batch.append_column("__bucket", bucket)
        masks = self.router.masks_arrow(batch)
        keep = [c for c in batch.column_names
                if c not in self.drop_cols and c != "__bucket"]
        slim_keep = [c for c in keep if c not in self.HEAVY_COLS]

        # per-shard bookkeeping for lineage
        shard_counts = {int(k): int(v) for k, v in zip(
            *_value_counts(batch["shard"]))}
        sink_shard_rows: dict[int, dict[str, int]] = {
            s: {} for s in shard_counts}
        files_per_shard: dict[int, int] = {s: 0 for s in shard_counts}

        partials: list[pa.Table] = []
        for sink, m in masks.items():
            sub = batch.filter(m)
            if len(sub) == 0:
                continue
            cols = keep if sink in self.full_sinks else slim_keep
            out_tbl = sub.select(cols)
            if sink in self.connectors:
                # network action: deliver instead of write; lineage
                # still counts rows per shard so commits/resume hold
                self._deliver(sink, out_tbl)
                for sid, cnt in zip(*_value_counts(sub["shard"])):
                    sink_shard_rows[int(sid)][sink] = (
                        sink_shard_rows[int(sid)].get(sink, 0) + int(cnt))
                partials.append(_partials_for(sink, sub, self.agg_kinds))
                continue
            # ---- write one file per (sink, shard[, dynafile key])
            fmt = self.formats.get(sink, "parquet")
            dyn_col = self.partition_by.get(sink)
            shard_vals, _ = _value_counts(sub["shard"])
            for sid in shard_vals:
                sid = int(sid)
                smask = pc.equal(sub["shard"], sid)
                grp = out_tbl.filter(smask)
                d = os.path.join(self.out_dir, sink, f"shard={sid}")
                if dyn_col is None:
                    os.makedirs(d, exist_ok=True)
                    n += 1
                    self._write(grp, d, f"part-{wid}-{n:05d}", fmt)
                    files_per_shard[sid] += 1
                else:
                    keycol = sub.filter(smask)[dyn_col]
                    for kv in pc.unique(pc.fill_null(
                            keycol.cast(pa.string()), "")):
                        kvs = kv.as_py()
                        kmask = pc.fill_null(pc.equal(
                            pc.fill_null(keycol.cast(pa.string()), ""),
                            kvs), False)
                        kgrp = grp.filter(kmask)
                        # sanitize the data-derived dir segment: a value
                        # containing '/' (or '..') would escape the
                        # shard dir, beyond plan_resume's wipe (omfile
                        # dynafiles have the same secpath option,
                        # template.h:157-160).  quote(safe="") is
                        # INJECTIVE (escapes '%' itself), so distinct
                        # values ('a/b' vs a literal 'a%2Fb') never
                        # merge into one partition dir.
                        from urllib.parse import quote as _quote
                        safe = _quote(kvs, safe="") if kvs else "__null__"
                        if safe in (".", ".."):
                            safe = "%2E" * len(safe)
                        kd = os.path.join(d, f"{dyn_col}={safe}")
                        os.makedirs(kd, exist_ok=True)
                        n += 1
                        self._write(kgrp, kd, f"part-{wid}-{n:05d}", fmt)
                        files_per_shard[sid] += 1
                sink_shard_rows[sid][sink] = (
                    sink_shard_rows[sid].get(sink, 0) + len(grp))
            # ---- dynstats partials for this sink (combiner: counts
            # collapse to at most |keys| rows per batch before the shuffle)
            partials.append(_partials_for(sink, sub, self.agg_kinds))

        agg_tbl = pa.concat_tables(partials) if partials else None
        lineage = self.lineage
        if agg_tbl is not None and lineage and len(agg_tbl):
            # per-shard aggregate CHECKPOINT (written before the shard's
            # lineage commit below): a resumed run skips committed
            # shards at the read, so without these files its final
            # dynstats would cover only the redone shards.  Same
            # atomic-file + shard-dir layout as the data sinks, so
            # plan_resume wipes stale ones with the same sweep.
            for sid in pc.unique(agg_tbl["shard"]).to_pylist():
                d = os.path.join(self.out_dir, AGG_DIR, f"shard={int(sid)}")
                os.makedirs(d, exist_ok=True)
                sl = (agg_tbl.filter(pc.equal(agg_tbl["shard"], sid))
                      .select(["sink", "kind", "key", "cnt"]))
                n += 1
                self._write(sl, d, f"part-{wid}-{n:05d}", "parquet")

        if lineage:
            import ray
            # hash-route entries to their owning commit-log actor
            # (sid % n): usually a batch holds ONE shard, so this stays
            # one RPC per batch; ray.get = backpressure on the log
            n_act = len(lineage)
            per_actor: dict[int, list] = {}
            for sid in shard_counts:
                per_actor.setdefault(sid % n_act, []).append(
                    (sid, shard_counts[sid], sink_shard_rows[sid],
                     files_per_shard[sid]))
            ray.get([lineage[k].report_many.remote(v)
                     for k, v in per_actor.items()])

        if self.impstats_every is not None:
            if self._emitter is None:
                # per-PROCESS emitter, shared across every task that
                # deserializes this writer in a worker: the interval
                # file is per-pid with RUNNING totals, so a fresh
                # emitter per task would reset the totals mid-file
                # and the exporter's last-line read would jump around
                from .stats import IntervalStatsEmitter
                key = (self.out_dir, self.impstats_every)
                em = _EMITTER_CACHE.get(key)
                if em is None:
                    em = _EMITTER_CACHE[key] = IntervalStatsEmitter(
                        self.out_dir, every_batches=self.impstats_every)
                self._emitter = em
            delivered = sum(sum(d.values()) for d in sink_shard_rows.values())
            self._emitter.tick({"rows_delivered": delivered, "batches": 1})

        if agg_tbl is not None:
            return agg_tbl.select(["sink", "kind", "key", "cnt"])
        return pa.table({"sink": pa.array([], pa.string()),
                         "kind": pa.array([], pa.string()),
                         "key": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})


# per-worker-process ordinal state for _task_slot(): holds ONE key at a
# time (workers are single-threaded; a new (task, attempt) evicts the old)
_TASK_ORD: dict = {}


def _task_slot() -> tuple[str, int]:
    """(stable task key, per-attempt batch ordinal) for the current Ray
    task.  The task ID is STABLE across retry attempts of the same task
    while the ordinal sequence restarts at 0 per attempt (keyed by
    (task_id, attempt_number) internally) — so a retry re-derives the
    same (key, ordinal) pairs in the same order and overwrites its own
    files, while two batches of identical CONTENT (heartbeat runs) in
    different tasks, or at different positions within one task, get
    distinct slots.  Driver-side direct calls (unit tests) fall back to
    a process-local counter."""
    tid, attempt = "driver", 0
    try:
        import ray
        import ray._private.worker as _w
        if ray.is_initialized() and _w.global_worker.mode == ray.WORKER_MODE:
            tid = ray.get_runtime_context().get_task_id() or "driver"
            if tid != "driver":
                attempt = (_w.global_worker.core_worker
                           .get_current_task_attempt_number())
    except Exception:
        pass
    k = (tid, attempt)
    if tid != "driver" and next(iter(_TASK_ORD), k) != k:
        _TASK_ORD.clear()                     # new task/attempt on this worker
    n = _TASK_ORD.get(k, 0)
    _TASK_ORD[k] = n + 1
    return tid, n


def _batch_stem(batch: pa.Table, slot: tuple[str, int] | None = None) -> str:
    """Deterministic identity of a batch: md5 over the raw Arrow buffers
    of the first few light columns (plus shard + length), suffixed with
    the POSITIONAL slot from :func:`_task_slot` — (task id, batch
    ordinal within the task attempt).  Content alone is not an identity:
    two byte-identical batches (runs of repeated heartbeat lines) at
    different positions must not share a stem, or the second silently
    overwrites the first's part files while both report to lineage.
    The slot disambiguates position; the content hash keeps retries
    self-overwriting even if the positional component ever drifted."""
    import hashlib

    tid, ordinal = slot if slot is not None else _task_slot()
    h = hashlib.md5()
    light = [n for n in batch.column_names
             if n not in FanoutWriter.HEAVY_COLS][:3]
    for name in dict.fromkeys(light + ["shard"]):
        if name in batch.column_names:
            for buf in batch[name].combine_chunks().buffers():
                if buf is not None:
                    h.update(buf)
    h.update(str(len(batch)).encode())
    h.update(tid.encode())
    return f"{h.hexdigest()[:12]}b{ordinal:03d}"


def _value_counts(col):
    """(values, counts) of an Arrow column via the C++ kernel."""
    import pyarrow.compute as pc

    vc = pc.value_counts(col.combine_chunks()
                         if isinstance(col, pa.ChunkedArray) else col)
    return vc.field("values").to_pylist(), vc.field("counts").to_pylist()


def _partials_for(sink: str, sub: pa.Table, agg_kinds) -> pa.Table:
    """dynstats partial counts for one sink over one batch, keyed by
    shard (Arrow group_by — C++).  The shard column keys the per-shard
    aggregate checkpoint files (_agg/shard=N) that keep a RESUMED run's
    final aggregates full-corpus; it is dropped before the partials
    enter the final reduce."""
    import pyarrow.compute as pc

    if "shard" not in sub.column_names:  # direct callers outside __call__
        sub = sub.append_column(
            "shard", pa.array(np.zeros(len(sub), dtype=np.int64)))
    outs = []
    for kind, col in agg_kinds:
        # count_all, NOT count: arrow's "count" counts non-null VALUES,
        # so the null-key group would report 0 and its rows would vanish
        # from delivery totals. Null keys count under "" (the stub
        # convention, matching the reference's onEmpty handling).
        g = (sub.select(["shard", col]).group_by(["shard", col])
             .aggregate([([], "count_all")]))
        key = pc.fill_null(g[col].cast(pa.string()),
                           pa.scalar("", pa.string()))
        cnt = g["count_all"].cast(pa.int64())
        outs.append(pa.table({
            "shard": g["shard"].cast(pa.int64()),
            "sink": pa.array([sink] * len(g), pa.string()),
            "kind": pa.array([kind] * len(g), pa.string()),
            "key": key,
            "cnt": cnt,
        }))
    if not outs:  # agg_kinds=() — pure fan-out sink, no dynstats
        return pa.table({"shard": pa.array([], pa.int64()),
                         "sink": pa.array([], pa.string()),
                         "kind": pa.array([], pa.string()),
                         "key": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.concat_tables(outs)


def write_run_metrics(out_dir: str, agg: pd.DataFrame,
                      wall_s: float, n_inputs: int,
                      impstats_formats: tuple = ("legacy", "cee",
                                                 "prometheus")) -> dict:
    """impstats analog (plugins/impstats): one machine-readable metrics
    record per run (_metrics.json) plus the reference's line formats
    (statsobj.h:67-86 legacy/CEE/JSON/Prometheus) as _impstats.<fmt>
    next to the data."""
    from .stats import StatsObject

    per_sink = {}
    if len(agg):
        first_kind = agg["kind"].iloc[0]
        per_sink = (agg[agg["kind"] == first_kind]
                    .groupby("sink")["cnt"].sum().astype(int).to_dict())
    rec = {
        "wall_s": round(wall_s, 3),
        "input_files": n_inputs,
        "rows_delivered_per_sink": per_sink,
        "total_delivered": int(sum(per_sink.values())),
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    tmp = os.path.join(out_dir, "_metrics.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(rec, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_metrics.json"))

    so = StatsObject("raylog", origin="core.action")
    for sink, n in sorted(per_sink.items()):
        so.set_ctr(f"{sink}.delivered", n)
    so.set_ctr("input_files", n_inputs)
    for fmt in impstats_formats:
        tmp = os.path.join(out_dir, f"_impstats.{fmt}.tmp")
        with open(tmp, "w") as fh:
            fh.write(so.render(fmt) + "\n")
        os.replace(tmp, os.path.join(out_dir, f"_impstats.{fmt}"))
    return rec


def compact_sink(out_dir: str, sink: str, compression: str = "zstd",
                 max_bytes: int | None = None) -> dict:
    """Compact each shard's part files (omfile size-rotation analog,
    tools/omfile.c:320-322 iSizeLimit): streaming runs leave one file
    per (write batch × shard); compaction rewrites each shard dir into
    compact files atomically (write tmp, swap, then unlink the parts —
    a reader sees either the parts or the compact files, never
    neither).  ``max_bytes`` is the size-rotation limit: parts are
    greedily binned so each compact file's INPUT bytes stay under the
    limit, rolling to ``compact-<n>.<k>.parquet`` like the reference
    rolls the outchannel when iSizeLimit trips (None = one file)."""
    import glob as _glob

    stats = {"shards": 0, "files_before": 0, "files_after": 0}
    for shard_dir in sorted(_glob.glob(os.path.join(out_dir, sink, "shard=*"))):
        parts = sorted(_glob.glob(os.path.join(shard_dir, "part-*.parquet")))
        if len(parts) <= 1:
            stats["files_after"] += len(parts)
            continue
        # size-rotation binning (input-size heuristic: parquet in ≈ out)
        bins: list[list[str]] = [[]]
        acc = 0
        for p in parts:
            sz = os.path.getsize(p)
            if max_bytes and bins[-1] and acc + sz > max_bytes:
                bins.append([])
                acc = 0
            bins[-1].append(p)
            acc += sz
        finals = []
        for k, group in enumerate(bins):
            merged = pa.concat_tables([pq.read_table(p) for p in group],
                                      promote_options="default")
            tmp = os.path.join(shard_dir, f"compact.{k}.inprogress")
            pq.write_table(merged, tmp, compression=compression)
            suffix = f"compact-{len(parts)}.parquet" if len(bins) == 1 \
                else f"compact-{len(parts)}.{k}.parquet"
            final = os.path.join(shard_dir, suffix)
            os.replace(tmp, final)
            finals.append(final)
        for p in parts:
            os.unlink(p)
        stats["shards"] += 1
        stats["files_before"] += len(parts)
        stats["files_after"] += len(finals)
    return stats


def repair_run_metrics(out_dir: str, agg: pd.DataFrame,
                       wall_s: float) -> None:
    """Metrics write for the NO-PENDING re-invoke path.  An out_dir
    whose shards committed before the _agg checkpoints existed (legacy
    layout) yields an empty read_agg_partials — overwriting an existing,
    previously-correct _metrics.json with zero counts would destroy the
    only record of the run.  Leave it untouched in that case; write
    normally whenever we have aggregates or no prior metrics exist."""
    if len(agg) == 0 and os.path.exists(
            os.path.join(out_dir, "_metrics.json")):
        return
    write_run_metrics(out_dir, agg, wall_s, 0)


def read_agg_partials(out_dir: str, shards) -> pd.DataFrame:
    """Reduce the per-shard aggregate checkpoints (_agg/shard=N) of the
    given committed shards — the dynstats contribution of work a
    resumed run skipped at the read.  Distributed read + the same
    streaming-compaction final as the live partials; returns the
    reduced (sink, kind, key, cnt) table."""
    import glob as _glob

    files = []
    for s in sorted(shards):
        files += sorted(_glob.glob(os.path.join(
            out_dir, AGG_DIR, f"shard={int(s)}", "*.parquet")))
    if not files:
        return pd.DataFrame(columns=["sink", "kind", "key", "cnt"])
    import ray.data

    return finalize_aggregates(ray.data.read_parquet(files))


def finalize_aggregates(partials_ds, driver_threshold: int = 2_000_000,
                        spill_dir: str | None = None):
    """Final dynstats reduction over the combiner output — scale-safe
    in both regimes.

    Default: stream the partials ONCE through the driver with
    incremental compaction — every ``driver_threshold`` buffered rows
    collapse to distinct keys, so driver memory is O(distinct keys),
    never O(keys × write batches).  (A distinct-key table the driver
    can't hold couldn't be RETURNED as a DataFrame anyway; Ray's
    sort-based Aggregate took 44 s on 340 k partial rows where this
    takes <1 s.)

    ``spill_dir``: the CC-scale regime where even the REDUCED table
    (10^7-10^8 ``host`` keys) must not land on the driver — the reduce
    runs as a distributed ``groupby().aggregate(Sum)`` straight to
    partitioned parquet and a disk-backed Dataset is returned.
    Reference analog: dynstats buckets are process-global but bounded
    (runtime/dynstats.c:43-45); ours must stay correct unbounded.
    """
    # NOTE: do NOT add a big-batch map_batches combine stage here — its
    # batch_size fuses into the upstream operator and collapses the whole
    # pipeline's parallelism to n_rows/batch_size tasks (observed: 10
    # tasks for 10M rows).  The partials are |sinks|×|keys| per write
    # batch (~4k rows), so the driver sum handles even 10^3 batches.
    # NOTE 2: no .materialize() here — pinning the partials costs ~0.3 s
    # on the flagship (measured same-day A/B) and the stream is consumed
    # exactly once below either way.
    if spill_dir is not None:
        # beyond-driver cardinality: ONE lazy execution ends in a
        # bucketed distributed reduce -> parquet; the reduced table
        # never lands on the driver (and never pays Ray's sort-based
        # aggregate's ~ms-per-group cost — the 44 s / 340 k rows
        # measurement above).  Returns the disk-backed reduced Dataset.
        import ray.data

        from .stages.aggregate import bucketed_final

        import pyarrow as pa

        from .pipelines.curation import _write_parquet_typed

        gkeys = ["sink", "kind", "key"]
        # _write_parquet_typed, not bare write_parquet: a zero-partial
        # pipeline emits no blocks and Ray's sink writes NOTHING — the
        # read_parquet below would fail on the empty dir
        _write_parquet_typed(
            bucketed_final(
                partials_ds, gkeys,
                lambda df: df.groupby(gkeys,
                                      as_index=False)["cnt"].sum()),
            spill_dir,
            {"sink": pa.string(), "kind": pa.string(),
             "key": pa.string(), "cnt": pa.int64()})
        return ray.data.read_parquet(spill_dir)

    keys = ["sink", "kind", "key"]

    def compact(fs: list) -> pd.DataFrame:
        df = pd.concat(fs, ignore_index=True)
        return df.groupby(keys, as_index=False)["cnt"].sum()

    frames: list = []
    rows = 0
    # batch_size=None: whole blocks, no re-slicing copy
    for b in partials_ds.iter_batches(batch_format="pandas",
                                      batch_size=None):
        frames.append(b)
        rows += len(b)
        if rows >= driver_threshold:
            # compact to distinct keys so keys × batches never piles up
            frames = [compact(frames)]
            rows = len(frames[0])
    if not frames:
        return pd.DataFrame(columns=keys + ["cnt"])
    out = compact(frames)
    if out.empty:
        return pd.DataFrame(columns=keys + ["cnt"])
    return out.astype({"cnt": "int64"})
