"""Range-partitioned parquet store — write once sorted-by-key into
value-range directories, then PRUNE AT THE READ: a range predicate
opens only the directories whose [lo, hi) intervals overlap it, the
way a 100 TB store must serve `WHERE ts BETWEEN ...` without touching
the other 99%.  The reference's rotation-by-name dynafiles
(tools/omfile.c dynaFile) partition output by VALUE for exactly this
retrieval reason; this generalizes it to numeric ranges with a
manifest.

Layout:
  out_dir/range=<i>/part-*.parquet   rows with lo_i <= col < hi_i
  out_dir/_ranges.json               {"col", "edges": [e0 ... eN]}
                                     (COMMIT MARKER, written last)

Boundaries come from :func:`..stages.sketch.exact_quantiles` — an
equi-DEPTH split (each range holds ~1/N of the rows even under skew),
computed in streaming passes, never a sort.  The write itself is a
per-batch fan-out (no shuffle): every batch appends its slice of each
range to that range's directory with the atomic tmp+rename and
batch-stem idempotence the other sinks use.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd


def write_range_partitioned(ds, col: str, out_dir: str, *,
                            n_ranges: int = 16) -> dict:
    """Partition ``ds`` by equi-depth ranges of ``col`` and persist.
    Returns the manifest.  Marker-last commit: re-invoking on a
    committed dir is a no-op; a torn dir (files, no marker) is wiped
    and rebuilt."""
    from .sketch import exact_quantiles

    marker = os.path.join(out_dir, "_ranges.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            return json.load(fh)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    pcts = [int(round(100.0 * i / n_ranges)) for i in range(1, n_ranges)]
    q = exact_quantiles(ds, col, sorted(set(pcts)))
    inner = sorted(set(float(v) for v in q["value"] if not np.isnan(v)))
    edges = [-np.inf] + inner + [np.inf]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        v = df[col].to_numpy(dtype=np.float64)
        # right-open ranges: edges[i] <= v < edges[i+1]
        ridx = np.searchsorted(edges, v, side="right") - 1
        ridx = np.clip(ridx, 0, len(edges) - 2)
        wid = hashlib.md5(np.ascontiguousarray(v).tobytes()).hexdigest()
        for i in np.unique(ridx[~np.isnan(v)]):
            d = os.path.join(out_dir, f"range={int(i)}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f"part-{wid}.parquet.inprogress")
            df[ridx == i].reset_index(drop=True).to_parquet(tmp)
            os.replace(tmp, os.path.join(d, f"part-{wid}.parquet"))
        return pd.DataFrame({"n": [int(len(df))]})

    ds.map_batches(part, batch_format="pandas").to_pandas()
    rec = {"col": col, "edges": [None if not np.isfinite(e) else e
                                 for e in edges]}
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, marker)
    return rec


def pruned_range_files(out_dir: str, lo: float, hi: float) -> list[str]:
    """The parquet files a ``lo <= col < hi`` predicate must read —
    only directories whose interval overlaps [lo, hi), and within
    them only the base files plus COMMITTED generations (a torn
    append's debris stays invisible, like the inverted index)."""
    with open(os.path.join(out_dir, "_ranges.json")) as fh:
        rec = json.load(fh)
    edges = [(-np.inf if e is None else e) for e in rec["edges"]]
    # interval i = [edges[i], edges[i+1]); the top edge is +inf
    edges[-1] = np.inf if rec["edges"][-1] is None else edges[-1]
    gids = [os.path.basename(m)[len("_gen-"):-len(".json")]
            for m in sorted(glob.glob(
                os.path.join(out_dir, "_gen-*.json")))]
    files: list[str] = []
    for i in range(len(edges) - 1):
        if edges[i] < hi and edges[i + 1] > lo:
            d = os.path.join(out_dir, f"range={i}")
            files += sorted(glob.glob(os.path.join(d, "part-*.parquet")))
            for gid in gids:
                files += sorted(glob.glob(
                    os.path.join(d, f"gen-{gid}-part-*.parquet")))
    return files


def read_range(out_dir: str, lo: float, hi: float):
    """Dataset of rows with ``lo <= col < hi`` — reads ONLY the
    overlapping range directories, then applies the exact row
    predicate (directory bounds are coarse)."""
    import ray.data

    with open(os.path.join(out_dir, "_ranges.json")) as fh:
        col = json.load(fh)["col"]
    files = pruned_range_files(out_dir, lo, hi)
    if not files:
        return ray.data.from_pandas(pd.DataFrame({col: []}))

    def rowf(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        return df[(v >= lo) & (v < hi)]

    return ray.data.read_parquet(files).map_batches(
        rowf, batch_format="pandas")


def append_range_partitioned(ds, out_dir: str, gen_id: str) -> dict:
    """Append new rows to a COMMITTED range store without recomputing
    boundaries (the rolling-ingest operation; values outside the
    original hull clip into the open-ended edge ranges).  Same
    generation protocol (state/genstore.py) as the inverted index's
    appends: increment files are
    ``range=<i>/gen-<gid>-part-*.parquet`` and the commit marker
    ``_gen-<gid>.json`` is written last — re-appending a committed
    generation is a no-op, a torn attempt's debris is wiped and
    rewritten, the base store is never touched."""
    import hashlib

    from ..state import genstore

    with open(os.path.join(out_dir, "_ranges.json")) as fh:
        rec = json.load(fh)
    col = rec["col"]
    edges = [(-np.inf if e is None else e) for e in rec["edges"]]
    edges[-1] = np.inf if rec["edges"][-1] is None else edges[-1]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        ridx = np.searchsorted(edges, v, side="right") - 1
        ridx = np.clip(ridx, 0, len(edges) - 2)
        wid = hashlib.md5(np.ascontiguousarray(v).tobytes()).hexdigest()
        for i in np.unique(ridx[~np.isnan(v)]):
            genstore.atomic_part(
                os.path.join(out_dir, f"range={int(i)}"),
                f"gen-{gen_id}-part-{wid}.parquet",
                df[ridx == i].reset_index(drop=True))
        return pd.DataFrame({"n": [int(len(df))]})

    return genstore.generation_append(
        ds, out_dir, gen_id, part,
        lambda got: {"n_rows": int(got["n"].sum())}, "range=*")


def _bucket_repair(out_dir: str) -> None:
    """Finish or roll back a torn compaction swap: for every
    ``range=<i>.old`` left behind, prefer the completed ``.compact``
    dir (finish the swap), else restore the original."""
    for old in glob.glob(os.path.join(out_dir, "range=*.old")):
        live = old[:-len(".old")]
        comp = live + ".compact"
        if not os.path.isdir(live):
            if os.path.isdir(comp) and os.path.exists(
                    os.path.join(comp, "_complete")):
                os.rename(comp, live)
            else:
                os.rename(old, live)
        shutil.rmtree(old, ignore_errors=True)
    for comp in glob.glob(os.path.join(out_dir, "range=*.compact")):
        shutil.rmtree(comp, ignore_errors=True)


def compact_range_store(out_dir: str) -> dict:
    """Small-file compaction — the 100 TB maintenance op a store
    accumulating generation appends eventually needs: every range
    bucket's base + COMMITTED generation part files rewrite into one
    file, per-bucket atomically (build ``range=<i>.compact`` with a
    ``_complete`` sentinel, swap via two renames, wipe the old dir).
    A crash anywhere is repaired on the next invocation by
    :func:`_bucket_repair` — a completed ``.compact`` finishes the
    swap, an incomplete one rolls back; readers between swaps see
    either the old or the new bucket, both with identical rows.
    Uncommitted (torn-append) gen debris is DROPPED, matching what
    readers could see.  Generation markers are retired afterwards
    (their rows now live in the base), so later appends may reuse
    fresh ids.  Runs per-bucket via Ray tasks — compaction
    parallelism = bucket count.  Returns {"buckets": n,
    "files_before": a, "files_after": b}."""
    import ray

    _bucket_repair(out_dir)
    gids = [os.path.basename(m)[len("_gen-"):-len(".json")]
            for m in sorted(glob.glob(
                os.path.join(out_dir, "_gen-*.json")))]
    buckets = sorted(
        d for d in glob.glob(os.path.join(out_dir, "range=*"))
        if os.path.isdir(d)
        and "." not in os.path.basename(d))   # not .old/.compact
    before = sum(len(glob.glob(os.path.join(d, "*.parquet")))
                 for d in buckets)

    @ray.remote
    def one(d: str) -> int:
        files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
        for gid in gids:
            files += sorted(glob.glob(
                os.path.join(d, f"gen-{gid}-part-*.parquet")))
        if len(files) <= 1:
            return 0
        merged = pd.concat([pd.read_parquet(f) for f in files],
                           ignore_index=True)
        comp = d + ".compact"
        shutil.rmtree(comp, ignore_errors=True)
        os.makedirs(comp)
        tmp = os.path.join(comp, "part-00000.parquet.inprogress")
        merged.to_parquet(tmp)
        os.replace(tmp, os.path.join(comp, "part-00000.parquet"))
        with open(os.path.join(comp, "_complete"), "w") as fh:
            fh.write("ok")
        os.rename(d, d + ".old")
        os.rename(comp, d)
        shutil.rmtree(d + ".old", ignore_errors=True)
        return 1

    ray.get([one.remote(d) for d in buckets])
    for gid in gids:
        os.remove(os.path.join(out_dir, f"_gen-{gid}.json"))
    after = sum(len(glob.glob(os.path.join(d, "*.parquet")))
                for d in buckets)
    return {"buckets": len(buckets), "files_before": before,
            "files_after": after}
