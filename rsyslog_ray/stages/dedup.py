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


# second independent siphash key for the 128-bit content key (pandas
# hash_key must be exactly 16 chars; the default is "0123456789123456")
_HASH_KEY2 = "raylog-dedup-2nd"


def content_key128_frame(texts: pd.Series | np.ndarray, h1=None, h2=None
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Two INDEPENDENT 64-bit content hashes = one 128-bit dedup key.

    A single 64-bit hash is not collision-safe at target scale: at
    10^12 documents the birthday bound makes ~10^4-10^5 colliding pairs
    *expected*, each silently merging two distinct documents (the
    reference never dedups on a hash alone — pmlastmsg compares the
    actual message, plugins/pmlastmsg/pmlastmsg.c).  Two independent
    siphash keys push the expected collision count at 10^12 docs to
    ~10^-15.  ``h1``/``h2`` are injectable for tests (forcing a primary
    collision proves the secondary key keeps distinct texts apart).
    """
    arr = texts.to_numpy(object) if hasattr(texts, "to_numpy") else \
        np.asarray(texts, dtype=object)
    a = (h1(arr) if h1 is not None else pd.util.hash_array(arr))
    b = (h2(arr) if h2 is not None else
         pd.util.hash_array(arr, hash_key=_HASH_KEY2))
    return np.asarray(a).astype("int64"), np.asarray(b).astype("int64")


def exact_dedup(ds, id_col: str, text_col: str, *, count: str = "copies",
                keeper: str = "keeper_id", h1=None, h2=None):
    """Exact dedup on the 128-bit content key: keep min id per
    identical-content group, count copies.  The shuffle moves
    (key_hi, key_lo, id) — never the text."""
    from .aggregate import two_phase_agg

    def key(df: pd.DataFrame) -> pd.DataFrame:
        a, b = content_key128_frame(df[text_col], h1, h2)
        return pd.DataFrame({id_col: df[id_col], "th": a, "th2": b})

    return two_phase_agg(ds.map_batches(key, batch_format="pandas"),
                         ["th", "th2"], count=count,
                         mins={id_col: keeper})[[keeper, count]]


def exact_dedup_best(ds, id_col: str, text_col: str, score_col: str, *,
                     count: str = "copies", keeper: str = "keeper_id",
                     score_out: str = "keeper_score", h1=None, h2=None):
    """:func:`exact_dedup` with a QUALITY-RANKED survivor: per
    identical-content group keep the highest-``score_col`` copy (ties
    -> min id) instead of the min id — the curation variant where
    byte-identical docs differ in metadata quality (crawl timestamp,
    render score) and the survivor should be the best copy.

    Same scale shape: the shuffle moves (key_hi, key_lo, id, score)
    partials — one row per (batch, group) after the combiner, never
    the text.  The (score desc, id asc) argmax is associative, so the
    driver reduce is the same sort+first pass over partials."""
    def best_first(df: pd.DataFrame, cnt_col: str) -> pd.DataFrame:
        df = df.sort_values(["th", "th2", score_col, id_col],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        first = df.drop_duplicates(["th", "th2"], keep="first")
        cnt = (df.groupby(["th", "th2"], sort=False)[cnt_col].sum()
               .reset_index())
        return first.drop(columns=[cnt_col]).merge(cnt, on=["th", "th2"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        a, b = content_key128_frame(df[text_col], h1, h2)
        keyed = pd.DataFrame({id_col: df[id_col],
                              score_col: df[score_col],
                              "th": a, "th2": b, "__n": 1})
        return best_first(keyed, "__n")

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas())                  # one row per (batch, group)
    out = best_first(parts, "__n")
    return (out.rename(columns={id_col: keeper, score_col: score_out,
                                "__n": count})
            [[keeper, score_out, count]].reset_index(drop=True))


def write_corpus_keys(ds, text_col: str, out_dir: str, *,
                      h1=None, h2=None) -> str:
    """Persist a corpus's 128-bit content-key SET as parquet (th, th2)
    — the artifact a later incremental ingest dedups against.  Keys
    only: the 100 TB of text never needs re-reading."""
    def key(df: pd.DataFrame) -> pd.DataFrame:
        a, b = content_key128_frame(df[text_col], h1, h2)
        return pd.DataFrame({"th": a, "th2": b})

    ds.map_batches(key, batch_format="pandas").write_parquet(out_dir)
    return out_dir


def incremental_dedup(new_ds, id_col: str, text_col: str,
                      corpus_keys_dir: str, *, npart: int = 32,
                      h1=None, h2=None):
    """Dedup a NEW ingest batch against a PERSISTED corpus — the
    production cross-run shape (dedup today's crawl against everything
    already curated) the reference's single-process engine cannot
    express.  Distributed anti-join on the 128-bit content key: both
    sides hash-partitioned on th, no driver-held key set, the corpus
    text is never read.  Also dedups WITHIN the new batch (keep min id
    per key).  Requires ids >= 0 (the corpus side is marked id=-1).
    Returns the surviving (id) rows as a Dataset."""
    import ray.data

    corpus = ray.data.read_parquet(corpus_keys_dir, columns=["th", "th2"])

    def new_keys(df: pd.DataFrame) -> pd.DataFrame:
        a, b = content_key128_frame(df[text_col], h1, h2)
        return pd.DataFrame({id_col: df[id_col].astype("int64"),
                             "th": a, "th2": b})

    def corpus_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: np.full(len(df), -1, dtype=np.int64),
                             "th": df["th"], "th2": df["th2"]})

    both = (new_ds.map_batches(new_keys, batch_format="pandas")
            .union(corpus.map_batches(corpus_side, batch_format="pandas")))

    def add_pp(df: pd.DataFrame) -> pd.DataFrame:
        pp = (df["th"].to_numpy().astype(np.uint64)
              % np.uint64(npart)).astype("int64")
        return df.assign(pp=pp)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["th", "th2"], as_index=False)[id_col].min()
        # a key whose min id is -1 already exists in the corpus ->
        # every new copy drops; otherwise the min new id survives
        return m[m[id_col] >= 0][[id_col]]

    return (both.map_batches(add_pp, batch_format="pandas")
            .groupby("pp").map_groups(resolve, batch_format="pandas"))


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
                      k: int = 3, as_dataset: bool = False):
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
    4. DISTRIBUTED exact-Jaccard verify: a fixed-size Bloom filter of
       candidate ids (built from per-batch partials OR-reduced on the
       driver — O(filter bits), NOT O(candidates)) prunes the source
       scan, then two hash-partitioned id-joins attach text_a and
       text_b to each pair and the Jaccard check runs inside the
       second join's map_groups.  Nothing proportional to duplicate
       density ever lands on the driver; the only driver collect is
       the operator's own verified output.
    """
    import ray
    import ray.data

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
    # materialize ONCE: candidate pairs feed both the bloom build and
    # the joins (object-store blocks, distributed — not a driver
    # collect).  No distributed_pair_dedup stage here: a duplicate
    # pair surfacing from several bands hashes to the SAME id_a group
    # in the verify join, which drops it — one fewer all-to-all pass.
    pairs_ds = exploded.groupby("pk").map_groups(
        part_cands, batch_format="pandas").materialize()
    empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                          "id_b": pd.Series([], dtype="int64")})
    if pairs_ds.count() == 0:
        return ray.data.from_pandas(empty) if as_dataset else empty

    verified = verify_pairs_jaccard(ds, pairs_ds, id_col, text_col,
                                    threshold=threshold, k=k)
    if as_dataset:
        return verified
    return (verified.to_pandas().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------
# distributed pair verify (Bloom-pruned id-join; no driver gather)

_BLOOM_BITS = 1 << 23          # 1 MiB packed — fixed driver memory
_BLOOM_SEEDS = (np.uint64(0xA076_1D64_78BD_642F),
                np.uint64(0xE703_7ED1_A0B4_28DB))


def _bloom_positions(ids: np.ndarray, m_bits: int):
    u = ids.astype(np.uint64)
    return [( _splitmix(u ^ s) % np.uint64(m_bits)).astype(np.int64)
            for s in _BLOOM_SEEDS]


def _bloom_build(pairs_ds, m_bits: int = _BLOOM_BITS) -> np.ndarray:
    """Fixed-size Bloom filter over both pair id columns: per-batch
    packed-bitmap partials, OR-reduced on the driver.  Driver memory is
    O(m_bits) regardless of candidate count; false positives only cost
    extra (id, text) rows in the join shuffle, never correctness."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits, dtype=bool)
        both = np.concatenate([df["id_a"].to_numpy(),
                               df["id_b"].to_numpy()])
        for pos in _bloom_positions(both, m_bits):
            bits[pos] = True
        # bitorder="little": byte b holds bits 8b..8b+7 LSB-first, so
        # membership is (bloom[pos//8] >> (pos%8)) & 1
        return pd.DataFrame(
            {"bloom": [np.packbits(bits, bitorder="little").tobytes()]})

    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    parts = pairs_ds.map_batches(partial, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for buf in b["bloom"]:
            bloom |= np.frombuffer(buf, dtype=np.uint8)
    return bloom


# count-min sketch over the pair id columns — the FIXED-driver-memory
# fan-in estimator behind the verify join's hot-key salting.  CMS only
# ever OVERestimates, so an estimation error can only over-salt (extra
# doc-row replication), never under-split a hot group.
_CMS_W = 1 << 18
_CMS_SEEDS = (np.uint64(0x2545F4914F6CDD1D),
              np.uint64(0xC2B2AE3D27D4EB4F))


def _cms_positions(ids: np.ndarray, w: int = _CMS_W):
    u = ids.astype(np.uint64)
    return [(_splitmix(u ^ s) % np.uint64(w)).astype(np.int64)
            for s in _CMS_SEEDS]


def _pair_sketches(pairs_ds, m_bits: int = _BLOOM_BITS):
    """ONE pass over the candidate pairs -> (bloom, cms): the Bloom
    filter that prunes the corpus scan plus two count-min sketches —
    cms[0] counts id_a occurrences (first join's fan-in), cms[1]
    counts id_b occurrences (second join's).  Per-batch fixed-size
    partials, OR/SUM-reduced on the driver: driver memory is
    O(m_bits + 4·CMS_W), independent of candidate count."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits, dtype=bool)
        both = np.concatenate([df["id_a"].to_numpy(),
                               df["id_b"].to_numpy()])
        for pos in _bloom_positions(both, m_bits):
            bits[pos] = True
        cms = np.zeros((2, len(_CMS_SEEDS), _CMS_W), dtype=np.int64)
        for side, coln in enumerate(("id_a", "id_b")):
            for r, pos in enumerate(_cms_positions(df[coln].to_numpy())):
                cms[side, r] += np.bincount(pos, minlength=_CMS_W)
        return pd.DataFrame(
            {"bloom": [np.packbits(bits, bitorder="little").tobytes()],
             "cms": [cms.tobytes()]})

    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    cms = np.zeros((2, len(_CMS_SEEDS), _CMS_W), dtype=np.int64)
    parts = pairs_ds.map_batches(partial, batch_format="pandas")
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for buf in b["bloom"]:
            bloom |= np.frombuffer(buf, dtype=np.uint8)
        for buf in b["cms"]:
            cms += np.frombuffer(buf, dtype=np.int64).reshape(cms.shape)
    return bloom, cms


def _nsalt(ids: np.ndarray, cms_side: np.ndarray, bound: int,
           max_salt: int = 256) -> np.ndarray:
    """Per-id salt count: ceil(estimated fan-in / bound), in
    [1, max_salt].  ids with fan-in <= bound get nsalt 1 — the
    unsalted fast path is byte-identical to the pre-salting engine."""
    est = None
    for r, pos in enumerate(_cms_positions(ids)):
        v = cms_side[r][pos]
        est = v if est is None else np.minimum(est, v)
    return np.clip((est + bound - 1) // bound, 1, max_salt).astype(np.int64)


def verify_pairs_jaccard(docs_ds, pairs_ds, id_col: str, text_col: str, *,
                         threshold: float, k: int = 3,
                         fanin_bound: int = 100_000,
                         max_group_rows: int | None = None):
    """Exact-Jaccard verify of candidate (id_a, id_b) pairs WITHOUT any
    driver-side text gather: Bloom-prune the corpus scan to candidate
    ids, then two sort-based id-joins (union + groupby) attach text_a
    and text_b; the Jaccard check runs inside the second join's
    map_groups.  Returns a Dataset of verified (id_a, id_b).

    HOT-KEY SALTING (VERDICT r3 #5): a viral doc (boilerplate page
    near-dupping a constant fraction of a crawl) would fan every one of
    its pairs into ONE join group.  A count-min sketch of per-id pair
    counts (built in the same single pass as the Bloom filter; fixed
    driver memory; overestimates only) sizes a per-id salt count
    nsalt = ceil(fan-in / fanin_bound): pair rows split into nsalt
    subgroups keyed by the OTHER id's hash, and the group's single doc
    row is replicated once per salt — per-group size is bounded by
    ~fanin_bound while duplicate copies of a pair still share a
    subgroup (their salt is a pure function of the pair), keeping the
    in-join dedup exact.  Ids under the bound take nsalt=1: byte-for-
    byte the unsalted plan.  ``max_group_rows`` is a test hook — when
    set, any join group larger than it raises inside the worker."""
    import ray

    bloom, cms = _pair_sketches(pairs_ds)
    bloom_ref = ray.put(bloom)
    cms_ref = ray.put(cms)

    def _check(g: pd.DataFrame) -> None:
        if max_group_rows is not None and len(g) > max_group_rows:
            raise AssertionError(
                f"verify join group of {len(g)} rows exceeds "
                f"max_group_rows={max_group_rows}")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        bloom = ray.get(bloom_ref)
        ids = df[id_col].to_numpy()
        keep = np.ones(len(df), dtype=bool)
        for pos in _bloom_positions(ids, _BLOOM_BITS):
            keep &= ((bloom[pos // 8] >> (pos % 8)) & 1).astype(bool)
        out = df[keep]
        return pd.DataFrame({"key": out[id_col].to_numpy(),
                             "id_a": np.full(keep.sum(), -1, dtype="int64"),
                             "id_b": np.full(keep.sum(), -1, dtype="int64"),
                             "t": out[text_col].to_numpy()})

    # candidate (+Bloom-FP) texts; materialized so both joins reuse the
    # pruned scan instead of re-reading the corpus
    docs_f = docs_ds.map_batches(prune, batch_format="pandas").materialize()

    def _rep_docs(side: int):
        """Replicate each doc row once per salt of its OWN id, so every
        salted subgroup of that id's join still contains the text."""
        def rep(df: pd.DataFrame) -> pd.DataFrame:
            ns = _nsalt(df["key"].to_numpy(), ray.get(cms_ref)[side],
                        fanin_bound)
            idx = np.repeat(np.arange(len(df)), ns)
            out = df.iloc[idx].reset_index(drop=True)
            starts = np.cumsum(ns) - ns
            out["salt"] = (np.arange(int(ns.sum()))
                           - np.repeat(starts, ns)).astype("int64")
            # column order must match the pair-side frames (union
            # requires identical block schemas)
            return out[["key", "salt", "id_a", "id_b", "t"]]
        return rep

    def _pair_salt(key_ids: np.ndarray, other_ids: np.ndarray,
                   side: int) -> np.ndarray:
        ns = _nsalt(key_ids, ray.get(cms_ref)[side], fanin_bound)
        return (_splitmix(other_ids.astype(np.uint64))
                % ns.astype(np.uint64)).astype("int64")

    def pairs_keyed_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["id_a"],
                             "salt": _pair_salt(df["id_a"].to_numpy(),
                                                df["id_b"].to_numpy(), 0),
                             "id_a": df["id_a"],
                             "id_b": df["id_b"],
                             "t": np.full(len(df), "", dtype=object)})

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        _check(g)
        doc = g[g["id_a"] < 0]
        prs = g[g["id_a"] >= 0]
        if doc.empty or prs.empty:   # Bloom FP doc, or id missing
            return pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                 "salt": pd.Series([], dtype="int64"),
                                 "id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "ta": pd.Series([], dtype=object)})
        # global pair dedup happens HERE: every copy of (id_a, id_b)
        # is in this (id_a, salt) group — the salt is a pure function
        # of the pair — regardless of which band/partition produced it
        prs = prs.drop_duplicates(["id_a", "id_b"])
        return pd.DataFrame({"key": prs["id_b"].to_numpy(),
                             "salt": _pair_salt(prs["id_b"].to_numpy(),
                                                prs["id_a"].to_numpy(), 1),
                             "id_a": prs["id_a"].to_numpy(),
                             "id_b": prs["id_b"].to_numpy(),
                             "ta": np.full(len(prs), doc["t"].iloc[0],
                                           dtype=object)})

    with_ta = (pairs_ds.map_batches(pairs_keyed_a, batch_format="pandas")
               .union(docs_f.map_batches(_rep_docs(0),
                                         batch_format="pandas"))
               .groupby(["key", "salt"])
               .map_groups(attach_a, batch_format="pandas"))

    def docs_as_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": df["key"], "salt": df["salt"],
                             "id_a": df["id_a"], "id_b": df["id_b"],
                             "ta": df["t"]})

    def verify_b(g: pd.DataFrame) -> pd.DataFrame:
        _check(g)
        doc = g[g["id_a"] < 0]
        prs = g[g["id_a"] >= 0]
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if doc.empty or prs.empty:
            return empty
        sb = set(shingles(doc["ta"].iloc[0], k))
        cache: dict[str, set] = {}
        keep_a, keep_b = [], []
        for a, b_, ta in zip(prs["id_a"], prs["id_b"], prs["ta"]):
            sa = cache.get(ta)
            if sa is None:
                sa = set(shingles(ta, k))
                cache[ta] = sa
            j = 1.0 if not sa and not sb else \
                len(sa & sb) / len(sa | sb)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b_)
        if not keep_a:
            return empty
        return pd.DataFrame({"id_a": np.asarray(keep_a, dtype="int64"),
                             "id_b": np.asarray(keep_b, dtype="int64")})

    return (with_ta.union(docs_f.map_batches(_rep_docs(1),
                                             batch_format="pandas")
                          .map_batches(docs_as_b, batch_format="pandas"))
            .groupby(["key", "salt"])
            .map_groups(verify_b, batch_format="pandas"))


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


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_tile(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """(len(sa), len(sb)) Hamming-distance matrix over uint64 sigs:
    XOR broadcast + byte-LUT popcount — C speed, no Python pair loop."""
    x = np.ascontiguousarray(sa[:, None] ^ sb[None, :])
    return _POPCNT8[x.view(np.uint8).reshape(len(sa), len(sb), 8)].sum(
        axis=2, dtype=np.int64)


def _close_sig_pairs(sigs: np.ndarray, max_hamming: int, exclude_chunk: int,
                     cap: int = 4096, tile: int = 1024):
    """Index pairs (x < y, hamming) over DISTINCT signatures with
    distance <= max_hamming.

    m <= cap: tiled vectorized Hamming matrix (tiles bound the
    temporary to tile^2 x 8 bytes — CLAUDE.md: giant flat temporaries
    lose on this host).  m > cap (a degenerate bucket — short/similar
    docs piling distinct-but-close sigs onto one 16-bit chunk value):
    sub-band the 48 bits OUTSIDE the shared chunk into max_hamming+1
    slices; pigeonhole guarantees any qualifying pair matches exactly
    on at least one slice, so grouping by slice value finds every pair
    without the m^2 pass."""
    m = len(sigs)
    if m < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64), \
            np.empty(0, np.int64)
    if m <= cap:
        xs_o, ys_o, hs_o = [], [], []
        for i0 in range(0, m, tile):
            a = sigs[i0:i0 + tile]
            for j0 in range(i0, m, tile):
                h = _hamming_tile(a, sigs[j0:j0 + tile])
                xs, ys = np.where(h <= max_hamming)
                gx, gy = xs + i0, ys + j0
                keep = gx < gy
                xs_o.append(gx[keep])
                ys_o.append(gy[keep])
                hs_o.append(h[xs[keep], ys[keep]])
        return (np.concatenate(xs_o), np.concatenate(ys_o),
                np.concatenate(hs_o))
    # degenerate bucket: sub-band the non-shared 48 bits
    other = [c for c in range(4) if c != exclude_chunk]
    bits48 = np.zeros(m, dtype=np.uint64)
    for pos, c in enumerate(other):
        bits48 |= (((sigs >> np.uint64(16 * c)) & np.uint64(0xFFFF))
                   << np.uint64(16 * pos))
    n_slices = max_hamming + 1
    width = 48 // n_slices
    seen: set[tuple[int, int]] = set()
    xs_o, ys_o, hs_o = [], [], []
    for s in range(n_slices):
        sub = (bits48 >> np.uint64(width * s)) & np.uint64((1 << width) - 1)
        order = np.argsort(sub, kind="stable")
        sv = sub[order]
        starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
        ends = np.r_[starts[1:], m]
        for lo, hi in zip(starts, ends):
            if hi - lo < 2:
                continue
            idx = np.sort(order[lo:hi])
            gx, gy, gh = _close_sig_pairs(sigs[idx], max_hamming,
                                          exclude_chunk, cap=2**62,
                                          tile=tile)
            for x, y, hd in zip(idx[gx], idx[gy], gh):
                if (x, y) not in seen:
                    seen.add((x, y))
                    xs_o.append(x)
                    ys_o.append(y)
                    hs_o.append(hd)
    return (np.asarray(xs_o, np.int64), np.asarray(ys_o, np.int64),
            np.asarray(hs_o, np.int64))


def simhash_pairs(ds, id_col: str, text_col: str, max_hamming: int = 3,
                  as_dataset: bool = False):
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.
    Banding: 4 chunks of 16 bits — any pair within distance 3 shares at
    least one exact chunk (pigeonhole), so grouping by (chunk_idx,
    chunk_value) finds all candidates without an all-pairs pass.

    ``as_dataset=True`` returns the deduped pair Dataset WITHOUT any
    driver collect (pair lists are O(corpus x dup-density) — same
    contract as minhash_lsh_pairs); the default pandas return is for
    small/interactive use only."""
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
        out = pd.DataFrame(rows)
        # pin sig to int64 via a uint64 view: raw Python ints infer
        # int64 OR uint64 per batch depending on whether any sig has
        # bit 63 set, and mismatched block schemas fail the groupby
        # shuffle (same normalization as minhash's sig_explode)
        if len(out):
            out["sig"] = (np.asarray(rows["sig"], dtype=np.uint64)
                          .view(np.int64))
        return out

    def bucket_pairs(g: pd.DataFrame, chunk_idx: int) -> pd.DataFrame:
        # compare DISTINCT signatures (vectorized XOR+popcount, with a
        # sub-band fallback for degenerate buckets), then expand to id
        # pairs (see the minhash bucket_pairs note on duplicate-heavy
        # corpora)
        g = g.drop_duplicates("id")
        groups = g.groupby("sig")["id"].apply(
            lambda s: np.sort(s.to_numpy()))
        sigs = groups.index.to_numpy().astype(np.uint64)
        idlists = groups.tolist()
        a_out, b_out, h_out = [], [], []
        for ids_x in idlists:
            if len(ids_x) > 1:
                ia, ib = np.triu_indices(len(ids_x), 1)
                a_out.append(ids_x[ia])
                b_out.append(ids_x[ib])
                h_out.append(np.zeros(len(ia), dtype="int64"))
        xs, ys, hs = _close_sig_pairs(sigs, max_hamming, chunk_idx)
        for x, y, d in zip(xs, ys, hs):
            aa, bb = np.meshgrid(idlists[x], idlists[y], indexing="ij")
            lo = np.minimum(aa.ravel(), bb.ravel())
            hi = np.maximum(aa.ravel(), bb.ravel())
            a_out.append(lo)
            b_out.append(hi)
            h_out.append(np.full(lo.size, int(d), dtype="int64"))
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
        outs = [bucket_pairs(g, int(ck))
                for (ck, _), g in part.groupby(["chunk", "val"])]
        res = (pd.concat(outs, ignore_index=True) if outs
               else bucket_pairs(part.iloc[0:0], 0))
        return res.drop_duplicates(["id_a", "id_b"])

    exploded = ds.map_batches(explode_part, batch_format="pandas")
    pairs = exploded.groupby("pk").map_groups(part_pairs,
                                              batch_format="pandas")
    deduped = distributed_pair_dedup(pairs, _NPART)
    if as_dataset:
        return deduped
    return deduped.to_pandas().reset_index(drop=True)


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
                          n_probes: int = 3, seed: int = 11,
                          as_dataset: bool = False):
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
    deduped = distributed_pair_dedup(pairs, _NPART)
    if as_dataset:
        return deduped
    return deduped.to_pandas().reset_index(drop=True)


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



# ---------------------------------------------------------------------
# connected components over the near-dup pair graph — the step public
# dedup pipelines run between LSH pairs and the keep-decision: pairs
# only say "a~b"; keeping one doc per transitive CLUSTER needs the
# component (a~b, b~c must collapse to one survivor even though a~c was
# never emitted).  Iterative block-local contraction: each round runs
# union-find INSIDE every edge block (C-speed, zero communication),
# then a node-keyed exchange reconciles nodes that got different roots
# in different blocks — the min root wins and the losers become BRIDGE
# edges for the next round's (4x fewer) blocks.  Rounds =
# O(log #blocks), NOT O(component diameter) like plain min-label
# propagation, which pays a full Ray shuffle per hop of the longest
# chain (perturbed-copy chains in web corpora are 10+ docs deep).
# Every exchange moves int pairs only; worker memory is O(edges per
# block); the final round's bridge graph must fit one block (it is
# roots + cross-links, orders of magnitude below the pair list).

def _ppk_of(ids: np.ndarray, npart: int) -> np.ndarray:
    gold = np.uint64(0x9E3779B97F4A7C15)
    return ((ids.astype(np.uint64) * gold) >> np.uint64(40)) \
        .astype(np.int64) % npart


def _block_union_find(u: np.ndarray, v: np.ndarray):
    """Union-by-min over one block's edges.  Returns (nodes, roots):
    every node in the block mapped to the min id of its block-local
    component."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = np.fromiter(
        {n for ab in (u, v) for n in ab.tolist()}, dtype=np.int64)
    roots = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64,
                        count=len(nodes))
    return nodes, roots


def connected_components(pairs_ds, *, npart: int = _NPART,
                         max_iters: int = 16):
    """Dataset[id_a, id_b] -> Dataset[node, cluster] where cluster is
    the minimum id reachable from node (docs in no pair are absent —
    they are their own singleton cluster by definition).

    Per round: (1) union-find inside each edge block; (2) a node-keyed
    groupby reconciles per-block roots — min root per node becomes the
    round's mapping, conflicting roots become bridge edges; (3) the
    mapping folds into the global label map with one root-keyed join;
    (4) bridge edges coalesce into 4x fewer blocks.  Terminates when a
    round leaves no bridges or ran over a single block.  Labels,
    mappings and edges are ints only, re-materialized per round (the
    lineage would otherwise replay all prior rounds)."""
    def norm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["id_a"].to_numpy(np.int64),
                             "v": df["id_b"].to_numpy(np.int64)})

    edges = pairs_ds.map_batches(norm, batch_format="pandas").materialize()
    # right-size the block count to the graph: pairs parquet often
    # arrives as dozens of near-empty blocks, and every extra block
    # generation costs a full contraction round (~1.5 s of fixed Ray
    # overhead).  ~1M edges per block keeps the per-block union-find
    # dict ~200 MB; a small graph collapses to ONE block = one round.
    n_edges = edges.count()
    target = max(1, min(edges.num_blocks(), n_edges // 1_000_000 + 1))
    if target < edges.num_blocks():
        edges = edges.repartition(target).materialize()
    labels = None  # Dataset[node, root]

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"ppk": np.empty(0, np.int64),
                                 "node": np.empty(0, np.int64),
                                 "root": np.empty(0, np.int64)})
        nodes, roots = _block_union_find(df["u"].to_numpy(np.int64),
                                         df["v"].to_numpy(np.int64))
        return pd.DataFrame({"ppk": _ppk_of(nodes, npart),
                             "node": nodes, "root": roots})

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # per node: min root wins (k=0 mapping row); every other root
        # is transitively equal to it -> k=1 bridge edge
        mn = g.groupby("node")["root"].transform("min")
        root = g["root"].to_numpy(np.int64)
        mn = mn.to_numpy(np.int64)
        node = g["node"].to_numpy(np.int64)
        first = pd.DataFrame({"node": node, "mn": mn}).drop_duplicates("node")
        conflict = root > mn
        bridges = pd.DataFrame({"a": mn[conflict],
                                "b": root[conflict]}).drop_duplicates()
        return pd.DataFrame({
            "k": np.concatenate([np.zeros(len(first), np.int64),
                                 np.ones(len(bridges), np.int64)]),
            "a": np.concatenate([first["node"].to_numpy(np.int64),
                                 bridges["a"].to_numpy(np.int64)]),
            "b": np.concatenate([first["mn"].to_numpy(np.int64),
                                 bridges["b"].to_numpy(np.int64)])})

    for _ in range(max_iters):
        n_blocks = max(1, edges.num_blocks())
        both = (edges.map_batches(contract, batch_format="pandas")
                .groupby("ppk").map_groups(resolve, batch_format="pandas")
                .materialize())
        mapping = both.filter(expr="k == 0")  # (a=node, b=min root)

        if labels is None:
            labels = (mapping.map_batches(
                lambda df: pd.DataFrame({"node": df["a"], "root": df["b"]}),
                batch_format="pandas").materialize())
        else:
            # new root of a labeled node = mapping[old root] if present
            # else old root: one union + root-keyed groupby join
            def lab_rows(df: pd.DataFrame) -> pd.DataFrame:
                key = df["root"].to_numpy(np.int64)
                return pd.DataFrame({"ppk": _ppk_of(key, npart), "key": key,
                                     "node": df["node"].to_numpy(np.int64),
                                     "newroot": np.full(len(df), -1,
                                                        np.int64)})

            def map_rows(df: pd.DataFrame) -> pd.DataFrame:
                key = df["a"].to_numpy(np.int64)
                return pd.DataFrame({"ppk": _ppk_of(key, npart), "key": key,
                                     "node": np.full(len(df), -1, np.int64),
                                     "newroot": df["b"].to_numpy(np.int64)})

            def fold(g: pd.DataFrame) -> pd.DataFrame:
                m = g[g["newroot"] >= 0]
                lut = pd.Series(m["newroot"].to_numpy(np.int64),
                                index=m["key"].to_numpy(np.int64))
                lut = lut[~lut.index.duplicated()]
                la = g[g["node"] >= 0]
                key = la["key"].to_numpy(np.int64)
                new = lut.reindex(key).to_numpy()
                new = np.where(np.isnan(new), key, new).astype(np.int64)
                return pd.DataFrame({"node": la["node"].to_numpy(np.int64),
                                     "root": new})

            labels = (labels.map_batches(lab_rows, batch_format="pandas")
                      .union(mapping.map_batches(map_rows,
                                                 batch_format="pandas"))
                      .groupby("ppk").map_groups(fold,
                                                 batch_format="pandas")
                      .materialize())

        if n_blocks <= 1:
            break  # single block = full union-find: no bridges possible
        edges = (both.filter(expr="k == 1")
                 .map_batches(lambda df: pd.DataFrame({"u": df["a"],
                                                       "v": df["b"]}),
                              batch_format="pandas")
                 .repartition(max(1, n_blocks // 4)).materialize())
        if edges.count() == 0:
            break

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "cluster": df["root"]})

    return labels.map_batches(finish, batch_format="pandas")


def connected_components_oracle(pairs: list[tuple]) -> dict:
    """Union-find ground truth: node -> min id in its component."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for ab in pairs for n in ab}


# ---------------------------------------------------------------------
# Cross-corpus Jaccard decontamination — flag every training document
# whose word-SET Jaccard against ANY benchmark/eval document reaches a
# threshold.  The document-level companion to the 13-gram membership
# decontaminate (stages/text.py): n-gram membership catches verbatim
# spans, set-Jaccard catches paraphrase-level near-copies of whole
# benchmark items.  Normalization contract (mirrored by the
# q:cross_decontaminate DuckDB oracle): lower, [^a-z0-9]+ -> space,
# split, DISTINCT words.
#
# Thresholding is EXACT integer arithmetic — match iff
# inter * t_den >= t_num * union (and inter >= 1) — so the oracle
# never touches floats.  The eval side is broadcast once (ray.put of a
# CSR inverted index term -> eval postings); the partitioning
# assumption, stated: the BENCHMARK side fits one broadcast object
# (true for real benchmark suites — thousands of items — while the
# train side streams at any scale, zero shuffles).
# ---------------------------------------------------------------------

_XJ_SPLIT = r"[^a-z0-9]+"


def _distinct_words_row(text: str) -> set:
    import re as _re

    return {w for w in _re.sub(_XJ_SPLIT, " ", text.lower()).split() if w}


def build_eval_word_index(eval_texts) -> tuple:
    """CSR inverted index over the eval side: (sorted unique terms,
    postings offsets, postings eval-positions, eval set sizes)."""
    terms_all: list = []
    epos_all: list = []
    sizes = np.empty(len(eval_texts), dtype=np.int64)
    for j, t in enumerate(eval_texts):
        ws = sorted(_distinct_words_row(t))
        sizes[j] = len(ws)
        terms_all.extend(ws)
        epos_all.extend([j] * len(ws))
    ta = np.asarray(terms_all, dtype=object)
    ea = np.asarray(epos_all, dtype=np.int64)
    order = np.argsort(ta, kind="stable")
    ta, ea = ta[order], ea[order]
    uniq, starts = np.unique(ta, return_index=True) if len(ta) else (
        np.asarray([], dtype=object), np.asarray([], dtype=np.int64))
    offsets = np.append(starts, len(ta)).astype(np.int64)
    return uniq, offsets, ea, sizes


def cross_jaccard_matches(ds, eval_ids, eval_texts, *,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          t_num: int = 4, t_den: int = 5):
    """Per train doc: how many eval docs it near-duplicates (word-set
    Jaccard >= t_num/t_den) and the keep flag.  One embarrassingly
    parallel pass; output (doc_id, n_terms, n_matches, kept)."""
    import ray

    idx = build_eval_word_index(list(eval_texts))
    n_eval = len(list(eval_ids))
    ref = ray.put(idx)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        vocab, off, postings, esize = ray.get(ref)
        toks = (df[text_col].str.lower()
                .str.replace(_XJ_SPLIT, " ", regex=True).str.split())
        ex = toks.explode().dropna()
        ex = ex[ex != ""]
        nrows = len(df)
        if len(ex):
            pairs = pd.DataFrame({"r": ex.index.to_numpy(),
                                  "t": ex.to_numpy(object)}
                                 ).drop_duplicates()
            rows = pairs["r"].to_numpy(np.int64)
            terms = pairs["t"].to_numpy(object)
        else:
            rows = np.empty(0, np.int64)
            terms = np.empty(0, object)
        tsize = np.bincount(rows, minlength=nrows).astype(np.int64)
        n_matches = np.zeros(nrows, dtype=np.int64)
        if len(terms) and len(vocab):
            vpos = np.searchsorted(vocab, terms)
            vpos_c = np.clip(vpos, 0, len(vocab) - 1)
            hit = vocab[vpos_c] == terms
            rows_h, vpos_h = rows[hit], vpos_c[hit]
            cnt = off[vpos_h + 1] - off[vpos_h]
            total = int(cnt.sum())
            if total:
                # expand each hit term's posting slice (eval is small,
                # so the flat expansion stays tiny per batch)
                csum = np.cumsum(cnt)
                flat = (np.arange(total, dtype=np.int64)
                        - np.repeat(csum - cnt, cnt)
                        + np.repeat(off[vpos_h], cnt))
                r_exp = np.repeat(rows_h, cnt)
                e_exp = postings[flat]
                key = r_exp * n_eval + e_exp
                u, inter = np.unique(key, return_counts=True)
                ur, ue = u // n_eval, u % n_eval
                union = tsize[ur] + esize[ue] - inter
                m = inter * t_den >= t_num * union
                n_matches = np.bincount(ur[m], minlength=nrows
                                        ).astype(np.int64)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy("int64"),
            "n_terms": tsize,
            "n_matches": n_matches,
            "kept": (n_matches == 0).astype("int64")})

    return ds.map_batches(probe, batch_format="pandas")


def cross_jaccard_oracle(train, evals, t_num: int = 4,
                         t_den: int = 5) -> list[dict]:
    """Pure-Python spec oracle: train/evals are (id, text) pairs."""
    esets = [(j, _distinct_words_row(t)) for j, t in evals]
    rows = []
    for i, t in train:
        ws = _distinct_words_row(t)
        m = 0
        for _, es in esets:
            inter = len(ws & es)
            union = len(ws | es)
            if inter >= 1 and inter * t_den >= t_num * union:
                m += 1
        rows.append({"doc_id": i, "n_terms": len(ws), "n_matches": m,
                     "kept": int(m == 0)})
    return rows
