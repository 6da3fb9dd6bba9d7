"""Similarity search over an embedding column (list<float>).

- knn_bruteforce: exact top-k cosine against a broadcast query matrix —
  numpy matmul per batch; the baseline and the verify path.
- lsh_buckets / knn_lsh: random-hyperplane LSH bucketing — the scale
  path: queries only score against their (multi-probe) buckets.

The query matrix is broadcast ONCE (ray.put) and fetched per task;
each batch's work is one (batch × dim) @ (dim × q) GEMM — never a
Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .dedup import _splitmix


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_ties(sim: np.ndarray, ids: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the exact top-kk rows by (-sim, id).

    A bare argpartition cut is tie-arbitrary: with > kk rows tied at
    the kk-th similarity, the batch-local cut could drop the smaller-id
    row the documented (-sim, id) tie-break keeps.  Take every row at or
    above the kk-th similarity, then lexsort the (tiny) candidate set.
    """
    if kk >= len(ids):
        cand = np.arange(len(ids))
    else:
        kth = np.partition(sim, len(ids) - kk)[len(ids) - kk]
        cand = np.flatnonzero(sim >= kth)
    order = cand[np.lexsort((ids[cand], -sim[cand]))]
    return order[:kk]


def knn_bruteforce(ds, vec_col: str, id_col: str, queries: np.ndarray,
                   query_ids: list, k: int = 5):
    """Exact top-k cosine neighbors for each query vector.

    Two-phase top-k (the combiner pattern): each batch emits its local
    top-k per query (batch_size × q score matrix → argpartition), the
    final exact top-k reduces the small partials on the driver.
    Deterministic tie-break: (-sim, id).
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        ids = df[id_col].to_numpy()
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        sim = v @ q.T                                   # (n, nq)
        out = {"qid": [], "id": [], "sim": []}
        kk = min(k, len(ids))
        for j in range(sim.shape[1]):
            part = _topk_ties(sim[:, j], ids, kk)
            out["qid"].extend([query_ids[j]] * len(part))
            out["id"].extend(ids[part])
            out["sim"].extend(sim[part, j])
        return pd.DataFrame(out)

    partials = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    # final exact reduce (tiny: batches × q × k rows)
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)


def knn_bruteforce_oracle(ids, vecs, queries, query_ids, k=5) -> pd.DataFrame:
    v = _normalize(np.stack(vecs).astype(np.float64))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    sim = v @ q.T
    rows = {"qid": [], "id": [], "rank": []}
    ids = np.asarray(ids)
    for j, qid in enumerate(query_ids):
        order = sorted(range(len(ids)), key=lambda i: (-sim[i, j], ids[i]))[:k]
        for r, i in enumerate(order, 1):
            rows["qid"].append(qid)
            rows["id"].append(ids[i])
            rows["rank"].append(r)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — k-means coarse quantizer + probed clusters

def kmeans_fit(vecs: np.ndarray, k: int, iters: int = 8,
               seed: int = 5) -> np.ndarray:
    """Deterministic Lloyd k-means on normalized vectors (splitmix-
    seeded init — no RNG state).  Returns (k, dim) normalized
    centroids; empty clusters re-seed from the farthest points."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    n = len(v)
    init = (_splitmix(np.arange(k, dtype=np.uint64)
                      + np.uint64(seed * 7919)) % np.uint64(n)).astype(int)
    cent = v[np.unique(init)]
    while len(cent) < k:                      # collision fallback
        cent = np.vstack([cent, v[(len(cent) * 131) % n]])
    for _ in range(iters):
        sim = v @ cent.T
        assign = sim.argmax(axis=1)
        new = np.zeros_like(cent)
        for c in range(k):
            m = assign == c
            if m.any():
                new[c] = v[m].mean(axis=0)
            else:                              # re-seed empty cluster
                new[c] = v[sim.max(axis=1).argmin()]
        cent = _normalize(new)
    return cent


def knn_ivf(ds, vec_col: str, id_col: str, queries: np.ndarray,
            query_ids: list, k: int = 5, n_centroids: int = 16,
            n_probe: int = 4, sample_size: int = 4096, iters: int = 8,
            seed: int = 5):
    """IVF ANN top-k: a k-means coarse quantizer is fit on a driver-side
    sample, centroids broadcast; each batch assigns its vectors to
    their nearest centroid and scores a query only against vectors in
    that query's ``n_probe`` closest clusters.  Cost ≈ brute force ×
    (n_probe / n_centroids); the index is just the centroid matrix —
    nothing is materialized per row.  Same exact (-sim, id) local
    tie-break + tiny driver reduce as knn_bruteforce."""
    import ray

    sample = np.stack(
        ds.limit(sample_size).to_pandas()[vec_col].to_numpy())
    cent = kmeans_fit(sample, n_centroids, iters, seed)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]  # (nq, p)
    ref = ray.put((qm, cent, probes))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        q, c, pr = ray.get(ref)
        ids = df[id_col].to_numpy()
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
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

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    if partials.empty:
        return pd.DataFrame({"qid": [], "id": [], "rank": []})
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)


# ---------------------------------------------------------------------
# LSH bucketing (random hyperplanes) — the ANN scale path

def hyperplanes(dim: int, n_planes: int = 12, seed: int = 7) -> np.ndarray:
    """Deterministic Gaussian-ish hyperplanes from splitmix streams."""
    u = _splitmix(np.arange(dim * n_planes * 2, dtype=np.uint64)
                  + np.uint64(seed * 1_000_003))
    u = (u.astype(np.float64) / 2.0**64).reshape(2, dim * n_planes)
    # Box-Muller for proper Gaussian planes
    g = np.sqrt(-2 * np.log(np.clip(u[0], 1e-12, 1))) * np.cos(2 * np.pi * u[1])
    return g.reshape(n_planes, dim)


def bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    return (bits.astype(np.uint64)
            << np.arange(planes.shape[0], dtype=np.uint64)[None, :]).sum(axis=1)


def knn_lsh(ds, vec_col: str, id_col: str, queries: np.ndarray,
            query_ids: list, k: int = 5, n_planes: int = 8,
            n_probes: int = 1):
    """ANN top-k: score each query only against its hyperplane bucket.

    ``n_probes`` > 1 enables multiprobe: each query also searches the
    buckets reached by flipping its (n_probes - 1) WEAKEST plane bits —
    the planes whose margin |v·p| is smallest are the likeliest to
    disagree between near-neighbors, so flipping them first recovers
    most of the recall single-probe loses at a fraction of brute-force
    cost.  Trades recall for a (probes × bucket)/N cost reduction;
    tests pin the recall contract vs knn_bruteforce."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    planes = hyperplanes(qm.shape[1], n_planes)
    q_buckets = bucket_of(qm, planes)
    # multiprobe bucket set per query: flip weakest-margin bits
    margins = np.abs(qm @ planes.T)                   # (nq, n_planes)
    probe_sets = []
    for j in range(qm.shape[0]):
        buckets = {int(q_buckets[j])}
        weakest = np.argsort(margins[j])[:max(0, n_probes - 1)]
        for bit in weakest:
            buckets.add(int(q_buckets[j]) ^ (1 << int(bit)))
        probe_sets.append(np.array(sorted(buckets), dtype=np.uint64))
    q_ref = ray.put((qm, probe_sets))
    p_ref = ray.put(planes)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        q, probes = ray.get(q_ref)
        pl = ray.get(p_ref)
        ids = df[id_col].to_numpy()
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        vb = bucket_of(v, pl)
        out = {"qid": [], "id": [], "sim": []}
        for j in range(q.shape[0]):
            mask = np.isin(vb, probes[j])
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

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    if partials.empty:
        return pd.DataFrame({"qid": [], "id": [], "rank": []})
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)


# ---------------------------------------------------------------------
# distributed k-means — full-corpus document clustering (the
# cluster-then-sample curation step: DSIR/DoReMi-style pipelines
# cluster embeddings and rebalance the mixture per cluster).  The IVF
# quantizer above fits on a driver-side SAMPLE; this one runs Lloyd
# iterations over the WHOLE corpus: per iteration, centroids broadcast
# once (ray.put), each batch emits ONE fixed-size partial (k x dim
# vector sums + k counts) and the driver reduce is O(k x dim) -- never
# O(corpus).  iters full passes, each a streaming map_batches.

def _kmeans_shard_state(df: pd.DataFrame, vec_col: str,
                        id_col: str) -> np.ndarray:
    """Shard init (inside the actor): the shard's normalized matrix,
    rows in id order so the within-shard sum order is fixed."""
    if not len(df):
        return np.zeros((0, 1), dtype=np.float64)
    df = df.sort_values(id_col)
    return _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))


def _kmeans_partial(v: np.ndarray, cent: np.ndarray) -> tuple:
    """One shard's (vector sums per cluster, counts per cluster)."""
    if not len(v):
        return (np.zeros_like(cent),
                np.zeros(len(cent), dtype=np.int64))
    a = (v @ cent.T).argmax(axis=1)
    sums = np.zeros_like(cent)
    np.add.at(sums, a, v)
    return sums, np.bincount(a, minlength=len(cent)).astype(np.int64)


def kmeans_fit_distributed(ds, vec_col: str = "embedding", *,
                           id_col: str = "vec_id", k: int = 8,
                           iters: int = 8, sample_size: int = 1024,
                           seed: int = 5,
                           shards: int | None = None) -> np.ndarray:
    """Deterministic distributed Lloyd: init = splitmix pick from a
    bounded head sample (same rule as ``kmeans_fit``), then ``iters``
    rounds over actor-resident shards (state/sharded.py — the corpus
    normalizes ONCE into distributed actor memory; each round is a
    centroid broadcast + one O(k x dim) partial per shard, reduced in
    fixed shard order, so the float reduce is deterministic
    run-to-run).  Empty clusters keep their previous centroid."""
    import ray
    from functools import partial

    from ..state.sharded import ShardedCorpus

    sample = np.stack(
        ds.limit(sample_size).to_pandas()[vec_col].to_numpy())
    cent = kmeans_fit(sample, k, iters=0, seed=seed)

    corpus = ShardedCorpus(
        ds, shards=shards,
        init_fn=partial(_kmeans_shard_state, vec_col=vec_col,
                        id_col=id_col))
    try:
        for _ in range(iters):
            ref = ray.put(cent)
            outs = corpus.map(_kmeans_partial, ref)
            sums = np.zeros_like(cent)
            cnt = np.zeros(len(cent), dtype=np.int64)
            for s, c_ in outs:
                sums += s
                cnt += c_
            new = cent.copy()
            nz = cnt > 0
            new[nz] = sums[nz] / cnt[nz, None]
            cent = _normalize(new)
    finally:
        corpus.shutdown()
    return cent


def kmeans_assign(ds, centroids: np.ndarray, *,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """-> (id, cluster) per row; centroids broadcast once."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64")})
        c = ray.get(ref)
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": (v @ c.T).argmax(axis=1)
                             .astype(np.int64)})

    return ds.map_batches(assign, batch_format="pandas")


def kmeans_oracle(vecs: np.ndarray, k: int, iters: int,
                  sample_size: int = 1024, seed: int = 5) -> np.ndarray:
    """Single-node reference of the SAME fit (init from the first
    ``sample_size`` rows, whole-matrix Lloyd, empty keeps previous) —
    the test oracle for the distributed path."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    cent = kmeans_fit(v[:sample_size], k, iters=0, seed=seed)
    for _ in range(iters):
        a = (v @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in range(k):
            m = a == c
            if m.any():
                new[c] = v[m].mean(axis=0)
        cent = _normalize(new)
    return cent


# ---------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication" — public method): k-means
# the embedding space, then prune near-duplicate pairs WITHIN each
# cluster, keeping one exemplar per duplicate group (the paper keeps
# the member LEAST similar to its centroid).  Clustering is what makes
# 100 TB feasible: pairwise cosine is O(m^2) only within a cluster
# (m ~= n/k; at CC scale k is 10k-100k so a cluster fits one worker —
# the same documented partitioning assumption as the blocked
# embedding near-dup).  The per-cluster prune runs as
# groupby(cluster).map_groups; the pair scan is row-chunked so memory
# is O(chunk x m), never O(m^2) resident.

def _uf_find(parent: np.ndarray, x: int) -> int:
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


def _semantic_prune_group(ids: np.ndarray, v: np.ndarray,
                          centroid: np.ndarray, threshold: float,
                          chunk: int = 1024) -> np.ndarray:
    """keep mask for one cluster: union near-dup pairs, keep ONE per
    component — the member with the LOWEST centroid similarity (the
    SemDeDup rule; ties break toward the lower id).  ids must be
    sorted ascending; v row-aligned and L2-normalized."""
    m = len(ids)
    parent = np.arange(m)
    for lo in range(0, m, chunk):
        s = v[lo:lo + chunk] @ v.T
        ia, ib = np.where(s >= threshold)
        for a, b in zip(ia + lo, ib):
            if a >= b:
                continue
            ra, rb = _uf_find(parent, a), _uf_find(parent, b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    csim = v @ centroid
    keep = np.ones(m, dtype=bool)
    best: dict = {}
    for i in range(m):
        r = _uf_find(parent, i)
        cur = best.get(r)
        # lexicographic (centroid similarity, id): lowest wins
        if cur is None or (csim[i], ids[i]) < (csim[cur], ids[cur]):
            best[r] = i
    for i in range(m):
        r = _uf_find(parent, i)
        keep[i] = best[r] == i
    return keep


def semantic_dedup(ds, *, vec_col: str = "embedding",
                   id_col: str = "vec_id", k: int = 8, iters: int = 4,
                   threshold: float = 0.95, sample_size: int = 1024,
                   seed: int = 5):
    """-> (id, cluster, keep) for every row; keep=False marks members
    pruned as semantic duplicates of a kept exemplar."""
    import ray

    cent = kmeans_fit_distributed(ds, vec_col, id_col=id_col, k=k,
                                  iters=iters, sample_size=sample_size,
                                  seed=seed)
    ref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "cluster": pd.Series([], dtype="int64"),
                                 vec_col: pd.Series([], dtype=object)})
        c = ray.get(ref)
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "cluster": (v @ c.T).argmax(axis=1)
                             .astype("int64"),
                             vec_col: df[vec_col]})

    assigned = ds.map_batches(assign, batch_format="pandas")

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order]
        v = _normalize(np.stack(g[vec_col].to_numpy()[order])
                       .astype(np.float64))
        cl = int(g["cluster"].iloc[0])
        keep = _semantic_prune_group(ids, v, ray.get(ref)[cl], threshold)
        return pd.DataFrame({id_col: ids,
                             "cluster": np.full(len(ids), cl,
                                                dtype="int64"),
                             "keep": keep})

    return assigned.groupby("cluster").map_groups(
        prune, batch_format="pandas")


def semantic_dedup_oracle(ids, vecs: np.ndarray, centroids: np.ndarray,
                          threshold: float = 0.95) -> dict:
    """Single-node spec of assign+prune given fixed centroids (test
    oracle): {id: (cluster, keep)}."""
    ids = np.asarray(ids)
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    a = (v @ centroids.T).argmax(axis=1)
    out: dict = {}
    for cl in np.unique(a):
        m = a == cl
        sub_ids = ids[m]
        order = np.argsort(sub_ids)
        sub_ids = sub_ids[order]
        keep = _semantic_prune_group(sub_ids, v[m][order],
                                     centroids[cl], threshold)
        for i, kp in zip(sub_ids, keep):
            out[int(i)] = (int(cl), bool(kp))
    return out


# ---------------------------------------------------------------------
# Product quantization ANN (Jégou et al. 2011, "Product Quantization
# for Nearest Neighbor Search" — public method): vectors compress to
# m uint8 codes; queries score via asymmetric distance computation
# (ADC) — one (m × ksub) inner-product table per query, then a table
# gather per document.  The 100-TB shape: codebooks train ONCE on a
# bounded sample and broadcast; each batch scores against in-batch
# codes; memory per vector is m bytes instead of dim floats.
# ---------------------------------------------------------------------

def _kmeans_l2(v: np.ndarray, k: int, iters: int = 8,
               seed: int = 11) -> np.ndarray:
    """Plain (UNnormalized) deterministic Lloyd for PQ subspaces —
    codebooks live in raw subvector space, unlike the cosine
    centroids of kmeans_fit."""
    n = len(v)
    init = (_splitmix(np.arange(k, dtype=np.uint64)
                      + np.uint64(seed * 104729)) % np.uint64(n)).astype(int)
    cent = v[np.unique(init)]
    while len(cent) < k:
        cent = np.vstack([cent, v[(len(cent) * 131) % n]])
    for _ in range(iters):
        d = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                new[c] = v[mask].mean(axis=0)
        cent = new
    return cent


def pq_train(vecs: np.ndarray, m: int = 4, ksub: int = 16,
             iters: int = 8, seed: int = 11) -> np.ndarray:
    """-> (m, ksub, dim//m) codebooks from NORMALIZED vectors (cosine
    scoring downstream).  dim must divide by m."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    dim = v.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack([
        _kmeans_l2(v[:, j * dsub:(j + 1) * dsub], ksub, iters,
                   seed + j) for j in range(m)])


def pq_encode(vecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """-> (n, m) uint8 codes: nearest codeword per subspace."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    m, ksub, dsub = codebooks.shape
    codes = np.empty((len(v), m), dtype=np.uint8)
    for j in range(m):
        sub = v[:, j * dsub:(j + 1) * dsub]
        d = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1).astype(np.uint8)
    return codes


def pq_adc_scores(codes: np.ndarray, codebooks: np.ndarray,
                  query: np.ndarray) -> np.ndarray:
    """ADC: approx cosine = sum_j <q_sub_j, codeword_j(code_j)> —
    one (m × ksub) table per query, then a gather per document."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    tables = np.stack([codebooks[j] @ q[j * dsub:(j + 1) * dsub]
                       for j in range(m)])          # (m, ksub)
    return tables[np.arange(m)[None, :], codes.astype(np.int64)].sum(axis=1)


def knn_pq(ds, vec_col: str, id_col: str, queries: np.ndarray,
           query_ids: list, k: int = 5, m: int = 4, ksub: int = 16,
           sample_size: int = 1024):
    """PQ/ADC top-k: codebooks from a bounded head sample (broadcast),
    per-batch encode + ADC local top-k, exact driver reduce of the
    O(batches × queries × k) partials — knn_bruteforce's shape with
    m-byte codes in place of full vectors."""
    import ray

    sample = np.stack(ds.limit(sample_size).to_pandas()[vec_col]
                      .to_numpy())
    books = pq_train(sample, m=m, ksub=ksub)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((books, qm))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        books_, qm_ = ray.get(ref)
        ids = df[id_col].to_numpy()
        codes = pq_encode(np.stack(df[vec_col].to_numpy()), books_)
        out = {"qid": [], "id": [], "sim": []}
        kk = min(k, len(ids))
        for j in range(len(qm_)):
            sim = pq_adc_scores(codes, books_, qm_[j])
            part = _topk_ties(sim, ids, kk)
            out["qid"].extend([query_ids[j]] * len(part))
            out["id"].extend(ids[part])
            out["sim"].extend(sim[part])
        return pd.DataFrame(out)

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)


def knn_ivfpq(ds, vec_col: str, id_col: str, queries: np.ndarray,
              query_ids: list, k: int = 5, n_centroids: int = 16,
              n_probe: int = 4, m: int = 4, ksub: int = 16,
              sample_size: int = 2048, iters: int = 8, seed: int = 5):
    """Composed IVF-PQ (the classic large-scale ANN recipe): a coarse
    k-means quantizer routes each vector to a cluster, PQ codebooks
    are trained on the RESIDUALS (v - centroid) of the sample, and a
    query scores only its ``n_probe`` closest clusters via ADC over
    the residual codes plus the exact query·centroid term:

        sim(q, v) ≈ q·c(v) + q·decode(residual_code(v))

    Per-vector state at scale is m bytes + a cluster id; the whole
    index is (centroids, codebooks) broadcast once.  Same exact local
    tie-break + tiny driver reduce as the other knn entries."""
    import ray

    sample = _normalize(np.stack(
        ds.limit(sample_size).to_pandas()[vec_col].to_numpy())
        .astype(np.float64))
    cent = kmeans_fit(sample, n_centroids, iters, seed)
    res = sample - cent[(sample @ cent.T).argmax(axis=1)]
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.stack([
        _kmeans_l2(res[:, j * dsub:(j + 1) * dsub], ksub, iters,
                   seed + 17 * (j + 1)) for j in range(m)])
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((qm, cent, probes, books))

    def _encode_res(r: np.ndarray, books_: np.ndarray) -> np.ndarray:
        codes = np.empty((len(r), m), dtype=np.uint8)
        for j in range(m):
            sub = r[:, j * dsub:(j + 1) * dsub]
            d = ((sub[:, None, :] - books_[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return codes

    def local(df: pd.DataFrame) -> pd.DataFrame:
        q, c, pr, books_ = ray.get(ref)
        ids = df[id_col].to_numpy()
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        assign = (v @ c.T).argmax(axis=1)
        codes = _encode_res(v - c[assign], books_)
        out = {"qid": [], "id": [], "sim": []}
        for j in range(q.shape[0]):
            mask = np.isin(assign, pr[j])
            if not mask.any():
                continue
            sim = (q[j] @ c[assign[mask]].T
                   + pq_adc_scores(codes[mask], books_, q[j]))
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            part = _topk_ties(sim, sub_ids, kk)
            out["qid"].extend([query_ids[j]] * len(part))
            out["id"].extend(sub_ids[part])
            out["sim"].extend(sim[part])
        return pd.DataFrame(out)

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    if partials.empty:
        return pd.DataFrame({"qid": [], "id": [], "rank": []})
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)


# ---------------------------------------------------------------------
# Scalar quantization (SQ8) — the third classic ANN compression next
# to PQ and IVF-PQ above: per-dimension affine uint8 codes
# (v_i ≈ lo_i + step_i·c_i), 4× smaller than float32 with near-exact
# recall at web-embedding dimensionality.  Scoring stays one matmul:
#   cos(q, v) ≈ q·lo + (q∘step)·codes
# so a batch scores as codes_f32 @ (q∘step) + const — no gather
# tables, no codebooks, and the train state is just two dim-length
# vectors broadcast once.
# ---------------------------------------------------------------------

def sq_train(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (lo, step) per-dimension affine params from NORMALIZED
    sample vectors; constant dimensions get step=0 (codes 0, decoded
    exactly to lo)."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    lo = v.min(axis=0)
    rng = v.max(axis=0) - lo
    step = rng / 255.0
    return lo, step


def sq_encode(vecs: np.ndarray, lo: np.ndarray, step: np.ndarray
              ) -> np.ndarray:
    """-> (n, dim) uint8 codes: round((v - lo)/step), clipped — values
    outside the training extent saturate at 0/255."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    safe = np.where(step > 0, step, 1.0)
    c = np.rint((v - lo) / safe)
    np.clip(c, 0, 255, out=c)
    return c.astype(np.uint8)


def sq_scores(codes: np.ndarray, lo: np.ndarray, step: np.ndarray,
              query: np.ndarray) -> np.ndarray:
    """Approx cosine of every code row vs one normalized query:
    q·lo + codes @ (q∘step)."""
    q = np.asarray(query, dtype=np.float64)
    return float(q @ lo) + codes.astype(np.float64) @ (q * step)


def knn_sq(ds, vec_col: str, id_col: str, queries: np.ndarray,
           query_ids: list, k: int = 5, sample_size: int = 1024):
    """SQ8 top-k: affine params from a bounded head sample (broadcast
    once via ray.put), per-batch encode + matmul scoring with local
    top-k, exact driver reduce of O(batches × queries × k) partials —
    knn_bruteforce's shape with 1-byte dims in place of floats."""
    import ray

    sample = np.stack(ds.limit(sample_size).to_pandas()[vec_col]
                      .to_numpy())
    lo, step = sq_train(sample)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((lo, step, qm))

    def local(df: pd.DataFrame) -> pd.DataFrame:
        lo_, step_, qm_ = ray.get(ref)
        ids = df[id_col].to_numpy()
        codes = sq_encode(np.stack(df[vec_col].to_numpy()), lo_, step_)
        out = {"qid": [], "id": [], "sim": []}
        kk = min(k, len(ids))
        for j in range(len(qm_)):
            sim = sq_scores(codes, lo_, step_, qm_[j])
            part = _topk_ties(sim, ids, kk)
            out["qid"].extend([query_ids[j]] * len(part))
            out["id"].extend(ids[part])
            out["sim"].extend(sim[part])
        return pd.DataFrame(out)

    partials = ds.map_batches(local, batch_format="pandas").to_pandas()
    partials = partials.sort_values(["qid", "sim", "id"],
                                    ascending=[True, False, True])
    top = partials.groupby("qid", as_index=False).head(k).copy()
    top["rank"] = top.groupby("qid").cumcount() + 1
    return top[["qid", "id", "rank"]].reset_index(drop=True)
