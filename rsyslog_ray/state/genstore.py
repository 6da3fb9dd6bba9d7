"""Shared increment ("generation") protocol for persisted stores.

Three stores append immutable increments to a committed base without
ever rewriting it — the inverted index (stages/search.py), the
range-partitioned parquet store (stages/rangestore.py) and the IVF
vector index (stages/vecstore.py).  They all follow one contract,
factored here:

  <root>/<bucket>/<base part files>             committed base
  <root>/<bucket>/gen-<gid>-part-<wid>.parquet  increment files
  <root>/_gen-<gid>.json                        increment COMMIT MARKER

* The caller NAMES the increment (a shard id, a date).  If the marker
  exists the append is a no-op returning the marker's record.
* If increment files exist without the marker, a previous attempt died
  mid-write; only that increment's debris is wiped and re-written —
  the base and other generations are never touched.
* Batch part files are written atomically (tmp + rename) with a stem
  derived from the batch's content, so a Ray task retry overwrites its
  own file instead of duplicating rows.
* The marker is written LAST (atomic rename), so readers that select
  "base + committed generations only" never observe a torn append.

Reference relationship: this is rsyslog's queue-disk commit discipline
(runtime/queue.c marker-after-data) applied to analytical stores.
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd


def marker_path(root: str, gen_id: str) -> str:
    return os.path.join(root, f"_gen-{gen_id}.json")


def committed_record(root: str, gen_id: str) -> dict | None:
    """The marker's record if generation ``gen_id`` is committed."""
    p = marker_path(root, gen_id)
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return None


def wipe_debris(root: str, gen_id: str, bucket_glob: str) -> None:
    """Remove a torn attempt's increment files (only)."""
    for f in glob.glob(os.path.join(root, bucket_glob,
                                    f"gen-{gen_id}-part-*.parquet")):
        os.remove(f)


def commit_marker(root: str, gen_id: str, rec: dict) -> dict:
    p = marker_path(root, gen_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, p)
    return rec


def committed_gen_ids(root: str) -> list[str]:
    """Generation ids with a landed marker, sorted."""
    return sorted(os.path.basename(m)[len("_gen-"):-len(".json")]
                  for m in glob.glob(os.path.join(root, "_gen-*.json")))


def committed_files(bucket_dir: str, gids: list[str]) -> list[str]:
    """Base part files + the given committed generations' files in one
    bucket dir — the reader-side file selection (torn appends are
    invisible because their gid is not in ``gids``)."""
    out = [f for f in glob.glob(os.path.join(bucket_dir, "*.parquet"))
           if not os.path.basename(f).startswith("gen-")]
    for g in gids:
        out += glob.glob(os.path.join(bucket_dir,
                                      f"gen-{g}-part-*.parquet"))
    return sorted(out)


def atomic_part(bucket_dir: str, stem: str, df: pd.DataFrame) -> None:
    """Atomic parquet part write (tmp + rename), dir auto-created."""
    os.makedirs(bucket_dir, exist_ok=True)
    tmp = os.path.join(bucket_dir, stem + ".inprogress")
    df.to_parquet(tmp)
    os.replace(tmp, os.path.join(bucket_dir, stem))


def generation_append(ds, root: str, gen_id: str, write_batch,
                      reduce_partials, bucket_glob: str) -> dict:
    """Run the full append protocol: no-op on a committed marker, wipe
    this increment's debris, fan the dataset through ``write_batch``
    (which writes atomic ``gen-<gid>-part-*`` files and returns a tiny
    per-batch partial frame), reduce the partials to the marker record
    and commit it last."""
    rec = committed_record(root, gen_id)
    if rec is not None:
        return rec
    wipe_debris(root, gen_id, bucket_glob)
    partials = (ds.map_batches(write_batch, batch_format="pandas")
                .to_pandas())
    return commit_marker(root, gen_id, reduce_partials(partials))


def parquet_footer_ok(path: str) -> bool:
    """One shared parquet-readability probe (metadata-only): the file
    exists and its footer parses.  Used by the stage-commit validator
    (pipelines/curation._stage_readable) and validate_store below."""
    import pyarrow.parquet as pq

    try:
        pq.ParquetFile(path).metadata
        return True
    except Exception:
        return False


def validate_store(root: str, bucket_glob: str) -> dict:
    """Post-commit durability audit (the `_run_stage` footer-check
    applied to generation stores): open every committed parquet
    footer (metadata-only — no data read).

    * A bad file in a committed GENERATION quarantines that whole
      generation — its marker and files are removed, so readers fall
      back to base + intact generations and the caller may simply
      re-append it (the increment protocol is idempotent by gen_id).
    * A bad BASE file cannot be auto-repaired increment-wise; it is
      reported in ``bad_base`` and the caller must rebuild the store.

    Returns {"ok": bool, "bad_base": [files], "quarantined": [gids]}.
    """
    readable = parquet_footer_ok

    bad_base = []
    for b in sorted(glob.glob(os.path.join(root, bucket_glob))):
        if not os.path.isdir(b):
            continue
        for f in glob.glob(os.path.join(b, "*.parquet")):
            if not os.path.basename(f).startswith("gen-") \
                    and not readable(f):
                bad_base.append(f)

    quarantined = []
    for gid in committed_gen_ids(root):
        files = []
        for b in glob.glob(os.path.join(root, bucket_glob)):
            files += glob.glob(os.path.join(
                b, f"gen-{gid}-part-*.parquet"))
        rec = committed_record(root, gid) or {}
        claims_content = any(
            isinstance(v, (int, float)) and v > 0 for v in rec.values())
        # zero files is legal only for an EMPTY increment (marker
        # committed with all-zero stats); a marker claiming content
        # with no files on disk is total file loss — same rot class
        if any(not readable(f) for f in files) or (
                not files and claims_content):
            os.remove(marker_path(root, gid))
            wipe_debris(root, gid, bucket_glob)
            quarantined.append(gid)

    return {"ok": not bad_base and not quarantined,
            "bad_base": bad_base, "quarantined": quarantined}
