"""Persisted IVF (inverted-file) vector index — the third incremental
store on the shared generation protocol (state/genstore.py), joining
the inverted text index (stages/search.py) and the range-partitioned
parquet store (stages/rangestore.py).

A rolling embedding corpus wants ANN search without re-reading or
re-clustering 100 TB per ingest: build the coarse quantizer once,
then append increments that only ASSIGN to the frozen centroids.

Layout::

  <root>/_centroids.json                 build COMMIT MARKER
                                         {k, dim, n_rows, centroids}
  <root>/list=<c>/part-<wid>.parquet     base vectors (id, vec)
  <root>/list=<c>/gen-<g>-part-<wid>.parquet  increments
  <root>/_gen-<g>.json                   increment commit markers

The build writes its marker LAST (a dir of list files without
``_centroids.json`` is torn debris and rebuilds); appends follow
genstore's marker-last increments.  The query side probes each
query's ``n_probe`` nearest centroids and reads ONLY those lists'
base + committed-generation files — cost scales with probed-list
volume, never corpus volume.

Scale shape: centroids are O(k x dim) and travel by broadcast
(``ray.put``); vectors shuffle zero times (each batch writes its own
rows to its lists' files); the query's driver reduce is
O(batches x queries x k) candidate rows.

Reference relationship: lookup_table's build-once / reload-increment
discipline (runtime/lookup.c:400-416) applied to a vector index.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd

from ..state import genstore
from .similarity import _normalize, _topk_ties, kmeans_fit

_MARKER = "_centroids.json"


def _load_marker(out_dir: str) -> dict:
    with open(os.path.join(out_dir, _MARKER)) as fh:
        return json.load(fh)


def _write_lists(df: pd.DataFrame, out_dir: str, vec_col: str,
                 id_col: str, cent: np.ndarray, stem_fmt: str
                 ) -> pd.DataFrame:
    """Assign a batch to its nearest centroids and write one atomic
    part file per touched list; returns the count partial."""
    if not len(df):
        return pd.DataFrame({"n": [0]})
    ids = df[id_col].to_numpy()
    v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
    assign = (v @ cent.T).argmax(axis=1).astype(np.int64)
    wid = hashlib.md5(
        np.ascontiguousarray(ids.astype(np.int64)).tobytes()).hexdigest()
    for c in np.unique(assign):
        m = assign == c
        genstore.atomic_part(
            os.path.join(out_dir, f"list={int(c)}"),
            stem_fmt.format(wid=wid),
            pd.DataFrame({id_col: ids[m],
                          vec_col: list(df[vec_col].to_numpy()[m])}))
    return pd.DataFrame({"n": [int(len(df))]})


def build_ivf_index(ds, vec_col: str, id_col: str, out_dir: str, *,
                    n_centroids: int = 16, sample_size: int = 4096,
                    iters: int = 8, seed: int = 5,
                    centroids: np.ndarray | None = None) -> dict:
    """Build the base index: fit the coarse quantizer on a driver-side
    sample (or use the given ``centroids``), broadcast it, fan every
    vector into its list's parquet dir, marker last.  A committed
    build is a no-op (resume point); torn list debris rebuilds."""
    import glob as _glob

    import ray

    marker = os.path.join(out_dir, _MARKER)
    if os.path.exists(marker):
        return _load_marker(out_dir)
    for d in _glob.glob(os.path.join(out_dir, "list=*")):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    if centroids is None:
        sample = np.stack(
            ds.limit(sample_size).to_pandas()[vec_col].to_numpy())
        centroids = kmeans_fit(sample, n_centroids, iters, seed)
    cent = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cent)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return _write_lists(df, out_dir, vec_col, id_col,
                            ray.get(ref), "part-{wid}.parquet")

    got = ds.map_batches(part, batch_format="pandas").to_pandas()
    rec = {"k": int(cent.shape[0]), "dim": int(cent.shape[1]),
           "n_rows": int(got["n"].sum()),
           "vec_col": vec_col, "id_col": id_col,
           "centroids": cent.tolist()}
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(rec, fh)
    os.replace(tmp, marker)
    return rec


def append_ivf_index(ds, out_dir: str, gen_id: str) -> dict:
    """Append new vectors to a COMMITTED index: assign to the FROZEN
    centroids (no retrain — the documented contract; recall for the
    increment matches the base as long as the data distribution
    holds), increment files + marker via the shared protocol."""
    import ray

    if not os.path.exists(os.path.join(out_dir, _MARKER)):
        raise FileNotFoundError(
            f"append requires a committed index (missing {_MARKER})")
    meta = _load_marker(out_dir)
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    ref = ray.put(np.asarray(meta["centroids"], dtype=np.float64))
    stem = "gen-" + gen_id + "-part-{wid}.parquet"

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return _write_lists(df, out_dir, vec_col, id_col,
                            ray.get(ref), stem)

    return genstore.generation_append(
        ds, out_dir, gen_id, part,
        lambda got: {"n_rows": int(got["n"].sum())}, "list=*")


def ivf_query_index(out_dir: str, queries: np.ndarray, query_ids: list,
                    k: int = 5, n_probe: int = 4) -> pd.DataFrame:
    """Top-k cosine neighbors per query over the persisted index:
    probe each query's ``n_probe`` nearest centroids, read ONLY those
    lists' base + committed-generation files (pruned read), score
    batches against the broadcast query matrix, reduce per-batch local
    top-k on the driver.  Same (-sim, id) deterministic tie rule as
    stages/similarity.knn_* — with ``n_probe == k_centroids`` the
    result equals brute force exactly."""
    import ray
    import ray.data

    meta = _load_marker(out_dir)
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]  # (nq, p)

    gids = genstore.committed_gen_ids(out_dir)
    files: list[str] = []
    # per-query probe sets as row masks need the list id per row; the
    # list id is recoverable from the file path, but re-assigning
    # inside the scorer is one small matmul and keeps files pure
    for c in sorted({int(c) for row in probes for c in row}):
        files += genstore.committed_files(
            os.path.join(out_dir, f"list={c}"), gids)
    empty = pd.DataFrame({"qid": [], "id": [], "rank": []})
    if not files:
        return empty
    ref = ray.put((qm, cent, probes))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        q, c, pr = ray.get(ref)
        ids = df[id_col].to_numpy()
        v = _normalize(np.stack(df[vec_col].to_numpy())
                       .astype(np.float64))
        assign = (v @ c.T).argmax(axis=1)
        out = {"qid": [], "id": [], "sim": []}
        for j in range(q.shape[0]):
            mask = np.isin(assign, pr[j])
            if not mask.any():
                continue
            sim = v[mask] @ q[j]
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            part = _topk_ties(sim, sub_ids, kk)
            out["qid"].extend([query_ids[j]] * len(part))
            out["id"].extend(sub_ids[part])
            out["sim"].extend(sim[part])
        return pd.DataFrame(out)

    partials = (ray.data.read_parquet(files)
                .map_batches(local, batch_format="pandas").to_pandas())
    if partials.empty:
        return empty
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)
