"""Deduplication operators — exact and near-duplicate, at 100 TB shape.

rsyslog's only dedup is adjacent "last message repeated n times"
(plugins/pmlastmsg/pmlastmsg.c, bRepMsgRed in runtime/action.c); a
training-data pipeline needs corpus-level dedup.  All operators here
follow the same scale pattern: per-batch vectorized signatures
(map_batches) → hash-partitioned groupby on the signature (the only
shuffle — signatures, never documents) → per-group resolution.

- exact_dedup          content-hash groupby, keep min id
- wordset_dedup        near-dup: same SET of words (order/dup-insensitive)
- minhash_lsh_pairs    MinHash signatures + LSH banding → candidate
                       pairs → exact-Jaccard verify
- simhash_pairs        64-bit SimHash + chunk banding → Hamming verify
- embedding_neardup    cosine ≥ τ pairs via per-bucket numpy matmul

Each has a pure-Python reference (``*_oracle``) used by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------
# deterministic 64-bit hashing (shared by engine and oracles)

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash_str64(s: str) -> int:
    """FNV-1a 64 of utf-8 bytes (scalar, for oracles)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Vectorized stable 64-bit token hashing (pandas siphash with its
    fixed default key — deterministic across processes/versions, C
    speed; a per-byte Python FNV here was the dedup bottleneck)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object)).astype(np.uint64)


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-gram shingles."""
    w = text.split()
    if len(w) < k:
        return [" ".join(w)] if w else []
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


# ---------------------------------------------------------------------
# MinHash + LSH

_NPART = 64  # hash-partition fan for bucket/pair shuffles


def distributed_pair_dedup(pairs_ds, npart: int = 64):
    """Global pair dedup WITHOUT a driver collect: hash-partition on
    (id_a, id_b), drop duplicates per partition.  A pair surfacing from
    several bands/chunks lands in one partition, so the dedup is exact;
    the shuffle moves only (id_a, id_b[, extras]) rows."""
    gold = np.uint64(0x9E3779B97F4A7C15)

    def add_ppk(df: pd.DataFrame) -> pd.DataFrame:
        ppk = (((df["id_a"].to_numpy().astype(np.uint64) * gold)
                ^ df["id_b"].to_numpy().astype(np.uint64))
               % np.uint64(npart)).astype("int64")
        return df.assign(ppk=ppk)

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns=["ppk"])

    return (pairs_ds.map_batches(add_ppk, batch_format="pandas")
            .groupby("ppk").map_groups(drop, batch_format="pandas"))


N_PERM = 64
LSH_BANDS = 16
LSH_ROWS = N_PERM // LSH_BANDS  # 4
_SEEDS = _splitmix(np.arange(1, N_PERM + 1, dtype=np.uint64))


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash over word k-gram shingles.
    h_i(x) = splitmix64(hash(x) XOR seed_i), signature = min over shingles."""
    sh = shingles(text, k)
    if not sh:
        return np.full(N_PERM, _MASK, dtype=np.uint64)
    hv = _hash_tokens(sh)                       # (n,)
    m = _splitmix(hv[:, None] ^ _SEEDS[None, :])  # (n, N_PERM)
    return m.min(axis=0)


def band_keys(sig: np.ndarray) -> list[int]:
    """LSH band keys: hash of each band's rows (b=16, r=4)."""
    out = []
    for b in range(LSH_BANDS):
        rows = sig[b * LSH_ROWS:(b + 1) * LSH_ROWS]
        h = np.uint64(b + 1)
        for v in rows:
            h = _splitmix(np.uint64(h) ^ np.uint64(v))
        out.append(int(h))
    return out


def band_keys_matrix(sigs: np.ndarray) -> np.ndarray:
    """Vectorized band_keys for a (n, N_PERM) signature matrix ->
    (n, LSH_BANDS) uint64 keys (same fold as the scalar version)."""
    m = sigs.reshape(len(sigs), LSH_BANDS, LSH_ROWS)
    h = np.broadcast_to(np.arange(1, LSH_BANDS + 1, dtype=np.uint64),
                        (len(sigs), LSH_BANDS)).copy()
    for r in range(LSH_ROWS):
        h = _splitmix(h ^ m[:, :, r])
    return h


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(ds, id_col: str, text_col: str, threshold: float = 0.8,
                      k: int = 3):
    """Near-dup pairs (id_a < id_b, true Jaccard >= threshold) found via
    MinHash-LSH, 100-TB shaped:

    1. signature+banding per batch -> explode to (pk, band, key, id) —
       the ONLY thing the bucket shuffle moves is four ints per
       (doc, band); the text never leaves its source block;
    2. candidate pairs per hash-partitioned bucket space (64-way pk:
       a ray groupby over ~10^5 tiny (band, key) buckets would pay
       per-group overhead; one pandas groupby per partition is C speed);
    3. global pair dedup by hash partition (distributed_pair_dedup —
       no driver collect of the band-inflated pair stream);
    4. exact-Jaccard verify against texts GATHERED by candidate id
       from the source (a broadcast id-set filter scan; candidates
       scale with near-dup density, not corpus size — the one driver
       materialization left is the operator's own output).
    """
    import ray

    def sig_explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        cache: dict[str, np.ndarray] = {}  # one signature per text
        sig_rows = []
        for t in df[text_col]:
            s = cache.get(t)
            if s is None:
                s = minhash_signature(t, k)
                cache[t] = s
            sig_rows.append(s)
        keys = band_keys_matrix(np.stack(sig_rows))          # (n, 16)
        n = len(ids)
        band = np.tile(np.arange(LSH_BANDS, dtype=np.uint64), n)
        key = keys.reshape(-1)
        pk = ((key ^ (band * np.uint64(0x9E3779B97F4A7C15)))
              % np.uint64(_NPART)).astype("int64")
        return pd.DataFrame({"pk": pk,
                             "band": band.astype("int64"),
                             "key": key.view(np.int64),
                             "id": np.repeat(ids, LSH_BANDS)})

    def part_cands(part: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out = [], []
        for _, g in part.groupby(["band", "key"]):
            u = np.sort(pd.unique(g["id"].to_numpy()))
            if len(u) > 1:
                ia, ib = np.triu_indices(len(u), 1)
                a_out.append(u[ia])
                b_out.append(u[ib])
        if not a_out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out)}).drop_duplicates()

    exploded = ds.map_batches(sig_explode, batch_format="pandas")
    cands = exploded.groupby("pk").map_groups(part_cands,
                                              batch_format="pandas")
    pairs = distributed_pair_dedup(cands, _NPART).to_pandas()
    if pairs.empty:
        return pairs.reset_index(drop=True)

    # gather candidate texts: broadcast the (small) id set, scan the
    # source once keeping only candidates
    cand_ids = ray.put(frozenset(
        np.union1d(pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy())
        .tolist()))

    def gather(df: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(cand_ids)
        return df[df[id_col].isin(wanted)][[id_col, text_col]]

    texts = ds.map_batches(gather, batch_format="pandas").to_pandas()
    sh = {i: set(shingles(t, k))
          for i, t in zip(texts[id_col], texts[text_col])}

    def _jac(a, b):
        sa, sb = sh[a], sh[b]
        if not sa and not sb:
            return 1.0
        return len(sa & sb) / len(sa | sb)

    keep = [_jac(a, b) >= threshold
            for a, b in zip(pairs["id_a"], pairs["id_b"])]
    return pairs[keep].reset_index(drop=True)


def minhash_lsh_pairs_oracle(ids: list, texts: list, threshold: float = 0.8,
                             k: int = 3) -> set[tuple]:
    """Brute force: all pairs with Jaccard >= threshold that share at
    least one LSH band (the exact semantic the engine implements)."""
    sigs = {i: minhash_signature(t, k) for i, t in zip(ids, texts)}
    bands = {i: set(zip(range(LSH_BANDS), band_keys(sigs[i]))) for i in ids}
    out = set()
    order = sorted(range(len(ids)), key=lambda x: ids[x])
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            a, b = ids[order[x]], ids[order[y]]
            if bands[a] & bands[b] and jaccard(texts[order[x]], texts[order[y]], k) >= threshold:
                out.add((a, b))
    return out


# ---------------------------------------------------------------------
# SimHash

def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over word hashes."""
    w = text.split()
    if not w:
        return 0
    hv = _hash_tokens(w)                                # (n,) uint64
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)            # (n, 64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_pairs(ds, id_col: str, text_col: str, max_hamming: int = 3):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.
    Banding: 4 chunks of 16 bits — any pair within distance 3 shares at
    least one exact chunk (pigeonhole), so grouping by (chunk_idx,
    chunk_value) finds all candidates without an all-pairs pass."""
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"chunk": [], "val": [], "id": [], "sig": []}
        cache: dict[str, int] = {}
        for i, t in zip(df[id_col], df[text_col]):
            s = cache.get(t)
            if s is None:
                s = simhash64(t)
                cache[t] = s
            for c in range(4):
                rows["chunk"].append(c)
                rows["val"].append((s >> (16 * c)) & 0xFFFF)
                rows["id"].append(i)
                rows["sig"].append(s)
        return pd.DataFrame(rows)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # compare DISTINCT signatures, expand to id pairs (see the
        # minhash bucket_pairs note on duplicate-heavy corpora)
        g = g.drop_duplicates("id")
        groups = g.groupby("sig")["id"].apply(
            lambda s: np.sort(s.to_numpy()))
        sigs = groups.index.tolist()
        idlists = groups.tolist()
        a_out, b_out, h_out = [], [], []
        for x in range(len(sigs)):
            ids_x = idlists[x]
            if len(ids_x) > 1:
                ia, ib = np.triu_indices(len(ids_x), 1)
                a_out.append(ids_x[ia])
                b_out.append(ids_x[ib])
                h_out.append(np.zeros(len(ia), dtype="int64"))
            for y in range(x + 1, len(sigs)):
                d = hamming64(sigs[x], sigs[y])
                if d <= max_hamming:
                    aa, bb = np.meshgrid(ids_x, idlists[y], indexing="ij")
                    lo = np.minimum(aa.ravel(), bb.ravel())
                    hi = np.maximum(aa.ravel(), bb.ravel())
                    a_out.append(lo)
                    b_out.append(hi)
                    h_out.append(np.full(lo.size, d, dtype="int64"))
        if not a_out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out),
                             "hamming": np.concatenate(h_out)})

    def explode_part(df: pd.DataFrame) -> pd.DataFrame:
        out = explode(df)
        out["pk"] = ((np.asarray(out["val"], dtype=np.uint64)
                      ^ (np.asarray(out["chunk"], dtype=np.uint64)
                         * np.uint64(0x9E3779B97F4A7C15)))
                     % np.uint64(_NPART)).astype("int64")
        return out

    def part_pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in part.groupby(["chunk", "val"])]
        res = (pd.concat(outs, ignore_index=True) if outs
               else bucket_pairs(part.iloc[0:0]))
        return res.drop_duplicates(["id_a", "id_b"])

    exploded = ds.map_batches(explode_part, batch_format="pandas")
    pairs = exploded.groupby("pk").map_groups(part_pairs,
                                              batch_format="pandas")
    return distributed_pair_dedup(pairs, _NPART).to_pandas().reset_index(drop=True)


def simhash_pairs_oracle(ids: list, texts: list, max_hamming: int = 3) -> set[tuple]:
    sigs = {i: simhash64(t) for i, t in zip(ids, texts)}
    out = set()
    s_ids = sorted(ids)
    for x in range(len(s_ids)):
        for y in range(x + 1, len(s_ids)):
            if hamming64(sigs[s_ids[x]], sigs[s_ids[y]]) <= max_hamming:
                out.add((s_ids[x], s_ids[y]))
    return out


# ---------------------------------------------------------------------
# Embedding cosine near-dup

def embedding_neardup_lsh(ds, id_col: str, vec_col: str,
                          threshold: float = 0.95, n_planes: int = 8,
                          n_probes: int = 3, seed: int = 11):
    """Near-dup pairs (cosine >= threshold) for an UNBLOCKED corpus:
    multiprobe hyperplane-LSH blocking, then per-bucket GEMM verify.

    Each vector lands in its own bucket plus the buckets reached by
    flipping its (n_probes - 1) weakest-margin plane bits — near-dup
    vectors sit close to the same hyperplanes, so the flipped buckets
    recover pairs a single-probe split would separate.  The shuffle
    moves (bucket, id, vec); verification is a bucket-local normalized
    matmul; pair dedup is the hash-partitioned distributed pass.
    Partitioning assumption: one bucket's vectors fit one worker —
    raise n_planes for denser corpora."""
    from .similarity import _normalize, bucket_of, hyperplanes

    planes_holder: dict = {}

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        planes = planes_holder.get("p")
        if planes is None:
            planes = hyperplanes(v.shape[1], n_planes, seed)
            planes_holder["p"] = planes
        margins = v @ planes.T                       # (n, planes)
        base = bucket_of(v, planes)
        ids = df[id_col].to_numpy()
        rows_b, rows_i, rows_v = [], [], []
        order = np.argsort(np.abs(margins), axis=1)[:, :max(0, n_probes - 1)]
        for j in range(len(ids)):
            buckets = {int(base[j])}
            for bit in order[j]:
                buckets.add(int(base[j]) ^ (1 << int(bit)))
            for b in buckets:
                rows_b.append(b)
                rows_i.append(ids[j])
                rows_v.append(v[j])
        return pd.DataFrame({"b": np.array(rows_b, dtype="int64"),
                             "id": rows_i, "v": rows_v})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("id")
        ids = g["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.stack(g["v"].to_numpy()[order])
        sim = v @ v.T
        ia, ib = np.where(np.triu(sim >= threshold, k=1))
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    exploded = ds.map_batches(explode, batch_format="pandas")
    pairs = exploded.groupby("b").map_groups(bucket_pairs,
                                             batch_format="pandas")
    return distributed_pair_dedup(pairs, _NPART).to_pandas().reset_index(drop=True)


def embedding_neardup_pairs(ds, id_col: str, vec_col: str, bucket_col: str,
                            threshold: float = 0.95):
    """Pairs with cosine >= threshold within each bucket (per-label
    blocking): numpy matmul per group — the brute-force verify path.
    Partitioning assumption: each bucket's vectors fit one worker; for
    unblocked corpora use embedding_neardup_lsh above."""
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.stack(g[vec_col].to_numpy()[order]).astype(np.float64)
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0] = 1.0
        v = v / n
        sim = v @ v.T
        ia, ib = np.where(np.triu(sim >= threshold, k=1))
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    return ds.groupby(bucket_col).map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------
# exact + wordset dedup (engine versions live in queries.py via
# two_phase_agg; these are the oracle helpers)

def wordset_key(text: str) -> str:
    return " ".join(sorted(set(text.split())))
