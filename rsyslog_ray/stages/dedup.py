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
    return np.array([hash_str64(t) for t in tokens], dtype=np.uint64)


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-gram shingles."""
    w = text.split()
    if len(w) < k:
        return [" ".join(w)] if w else []
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


# ---------------------------------------------------------------------
# MinHash + LSH

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


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(shingles(a, k)), set(shingles(b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_pairs(ds, id_col: str, text_col: str, threshold: float = 0.8,
                      k: int = 3):
    """Near-dup pairs (id_a < id_b, true Jaccard >= threshold) found via
    MinHash-LSH.  Shuffle moves only (band, key, id, sig) rows — 64×8B
    signature per doc, never the text; verification re-reads only
    candidate shingle sets (here: signatures ride along; exact Jaccard
    is computed from text fetched per candidate group, so the text
    column is carried into the explode — at 100 TB swap the carry for a
    gather against the source table keyed by id).
    """
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"band": [], "key": [], "id": [], "text": []}
        for i, t in zip(df[id_col], df[text_col]):
            sig = minhash_signature(t, k)
            for b, kk in enumerate(band_keys(sig)):
                rows["band"].append(b)
                rows["key"].append(kk)
                rows["id"].append(i)
                rows["text"].append(t)
        return pd.DataFrame(rows)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": []}
        g = g.drop_duplicates("id").sort_values("id")
        ids = g["id"].tolist()
        texts = g["text"].tolist()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if jaccard(texts[x], texts[y], k) >= threshold:
                    out["id_a"].append(ids[x])
                    out["id_b"].append(ids[y])
        return pd.DataFrame(out)

    exploded = ds.map_batches(explode, batch_format="pandas")
    pairs = (exploded.groupby(["band", "key"])
             .map_groups(bucket_pairs, batch_format="pandas"))

    # candidate pairs can appear in several bands -> distinct
    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return (pairs.groupby(["id_a", "id_b"])
            .map_groups(lambda g: g.head(1), batch_format="pandas"))


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
        for i, t in zip(df[id_col], df[text_col]):
            s = simhash64(t)
            for c in range(4):
                rows["chunk"].append(c)
                rows["val"].append((s >> (16 * c)) & 0xFFFF)
                rows["id"].append(i)
                rows["sig"].append(s)
        return pd.DataFrame(rows)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": [], "hamming": []}
        g = g.drop_duplicates("id").sort_values("id")
        ids, sigs = g["id"].tolist(), g["sig"].tolist()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = hamming64(sigs[x], sigs[y])
                if d <= max_hamming:
                    out["id_a"].append(ids[x])
                    out["id_b"].append(ids[y])
                    out["hamming"].append(d)
        return pd.DataFrame(out)

    exploded = ds.map_batches(explode, batch_format="pandas")
    pairs = (exploded.groupby(["chunk", "val"])
             .map_groups(bucket_pairs, batch_format="pandas"))
    return (pairs.groupby(["id_a", "id_b"])
            .map_groups(lambda g: g.head(1), batch_format="pandas"))


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

def embedding_neardup_pairs(ds, id_col: str, vec_col: str, bucket_col: str,
                            threshold: float = 0.95):
    """Pairs with cosine >= threshold within each bucket (per-label
    blocking): numpy matmul per group — the brute-force verify path.
    Partitioning assumption: each bucket's vectors fit one worker; for
    unblocked corpora add LSH hyperplane bucketing first (see
    similarity.lsh_buckets)."""
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
