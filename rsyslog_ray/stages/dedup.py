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


def _distinct_pairs(pairs_ds) -> pd.DataFrame:
    """Global pair dedup (a pair can surface from several bands/chunks).

    Done on the driver: the pair list is the operator's OUTPUT —
    orders of magnitude smaller than the corpus, already de-duplicated
    within each partition.  (A second ray groupby here costs ~10 s of
    fixed shuffle overhead; if a corpus ever yields driver-breaking
    pair counts, switch to the hash-partition drop_duplicates pattern
    used for the bucket stage.)"""
    df = pairs_ds.to_pandas()
    if df.empty:
        return df
    return df.drop_duplicates(["id_a", "id_b"]).reset_index(drop=True)


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
        cache: dict[str, list[int]] = {}  # duplicate-heavy corpora: one
        for i, t in zip(df[id_col], df[text_col]):  # signature per text
            keys = cache.get(t)
            if keys is None:
                keys = band_keys(minhash_signature(t, k))
                cache[t] = keys
            for b, kk in enumerate(keys):
                rows["band"].append(b)
                rows["key"].append(kk)
                rows["id"].append(i)
                rows["text"].append(t)
        return pd.DataFrame(rows)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # duplicate-heavy corpora: compare DISTINCT texts (O(u^2) with u
        # = unique texts in the bucket), then expand qualifying text
        # pairs to id cross-products with numpy — identical texts pair
        # without any Jaccard call (J == 1).
        g = g.drop_duplicates("id")
        groups = g.groupby("text")["id"].apply(
            lambda s: np.sort(s.to_numpy()))
        texts = groups.index.tolist()
        idlists = groups.tolist()
        a_out, b_out = [], []
        for x in range(len(texts)):
            ids_x = idlists[x]
            if len(ids_x) > 1:  # identical-text pairs
                ia, ib = np.triu_indices(len(ids_x), 1)
                a_out.append(ids_x[ia])
                b_out.append(ids_x[ib])
            for y in range(x + 1, len(texts)):
                if jaccard(texts[x], texts[y], k) >= threshold:
                    aa, bb = np.meshgrid(ids_x, idlists[y], indexing="ij")
                    lo = np.minimum(aa.ravel(), bb.ravel())
                    hi = np.maximum(aa.ravel(), bb.ravel())
                    a_out.append(lo)
                    b_out.append(hi)
        if not a_out:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(a_out),
                             "id_b": np.concatenate(b_out)})

    # hash-partition the bucket space: a ray groupby over ~10^5 tiny
    # (band, key) buckets pays per-group overhead; grouping by a 64-way
    # hash of the bucket key shuffles identically but runs the inner
    # per-bucket loop as ONE pandas groupby per partition (C speed)
    def explode_part(df: pd.DataFrame) -> pd.DataFrame:
        out = explode(df)
        out["pk"] = ((np.asarray(out["key"], dtype=np.uint64)
                      ^ (np.asarray(out["band"], dtype=np.uint64)
                         * np.uint64(0x9E3779B97F4A7C15)))
                     % np.uint64(_NPART)).astype("int64")
        return out

    def part_pairs(part: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in part.groupby(["band", "key"])]
        res = (pd.concat(outs, ignore_index=True) if outs
               else bucket_pairs(part.iloc[0:0]))
        return res.drop_duplicates()

    exploded = ds.map_batches(explode_part, batch_format="pandas")
    pairs = exploded.groupby("pk").map_groups(part_pairs,
                                              batch_format="pandas")
    return _distinct_pairs(pairs)


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
    return _distinct_pairs(pairs)


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
