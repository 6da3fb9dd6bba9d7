"""Content-defined chunking (CDC) — gear-hash rolling boundaries.

Splits byte streams at positions where a rolling hash of the trailing
window hits a mask, so INSERTING OR DELETING bytes only moves the
boundaries near the edit (shift-resistant chunking) — the primitive
behind dedup of re-crawled / re-uploaded content where fixed-size
blocks would mis-align after one byte of drift.  Gear hashing per
FastCDC (Xia et al., USENIX ATC'16 — public): the sequential recurrence

    h_i = ((h_{i-1} << 1) + GEAR[b_i]) mod 2^64
    boundary after i  iff  (h_i & mask) == 0

has the closed form h_i = SUM_j GEAR[b_{i-j}] << j, so its low k mask
bits depend on only the last k bytes — the engine computes them with k
shifted vector adds (pure numpy, no per-byte Python), and the per-row
sequential oracle (:func:`cdc_boundaries_oracle`) must match exactly.

Min/max chunk bounds: after a cut at p the next cut is the first
candidate at offset >= p+min_size, else forced at p+max_size; the tail
remainder is the final chunk.  Candidates are position-independent
(the hash never resets), so the vectorized candidate scan is exact.

Scale shape: pure per-batch kernel (map_batches, no shuffle, no
state); emits (id, chunk_idx, offset, length) int rows — chunk BYTES
never move unless the caller slices them.

Reference relationship: rsyslog has no CDC; engine extension surface
(SURVEY.md §8 'beyond-reference') for re-crawl/byte-stream dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# deterministic 256-entry gear table: splitmix64 of the byte value —
# fixed constants, no RNG state, reproducible everywhere
def _gear_table() -> np.ndarray:
    x = np.arange(256, dtype=np.uint64)
    z = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0xFF51AFD7ED558CCD)
    z ^= z >> np.uint64(31)
    return z


GEAR = _gear_table()


def _candidates(data: np.ndarray, mask_bits: int) -> np.ndarray:
    """Boolean per position: (gear-hash low ``mask_bits``) == 0.
    Only shifts < mask_bits can reach the masked bits, so the closed
    form needs ``mask_bits`` shifted adds — vectorized, no carry
    worries (uint64 wraps like the recurrence)."""
    g = GEAR[data]
    acc = g.copy()
    for j in range(1, min(mask_bits, len(g))):
        acc[j:] += g[:-j] << np.uint64(j)
    mask = np.uint64((1 << mask_bits) - 1)
    return (acc & mask) == 0


def cdc_boundaries(data: bytes, *, mask_bits: int = 6,
                   min_size: int = 16, max_size: int = 256
                   ) -> list[tuple[int, int]]:
    """(offset, length) chunks of ``data`` — vectorized engine path."""
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    cand = np.flatnonzero(_candidates(arr, mask_bits)) + 1  # cut AFTER i
    out = []
    p = 0
    ci = 0
    while p < n:
        lo, hi = p + min_size, p + max_size
        ci = np.searchsorted(cand, lo)
        cut = int(cand[ci]) if ci < len(cand) and cand[ci] <= hi else hi
        cut = min(cut, n)
        out.append((p, cut - p))
        p = cut
    return out


def cdc_boundaries_oracle(data: bytes, *, mask_bits: int = 6,
                          min_size: int = 16, max_size: int = 256
                          ) -> list[tuple[int, int]]:
    """Per-byte sequential reference implementation (the published
    recurrence, no vectorization) — ground truth for the engine."""
    mask = (1 << mask_bits) - 1
    m64 = (1 << 64) - 1
    h = 0
    cand = []
    for i, b in enumerate(data):
        h = ((h << 1) + int(GEAR[b])) & m64
        if (h & mask) == 0:
            cand.append(i + 1)
    out = []
    p, n = 0, len(data)
    while p < n:
        cut = p + max_size
        for c in cand:
            if p + min_size <= c <= p + max_size:
                cut = c
                break
            if c > p + max_size:
                break
        cut = min(cut, n)
        out.append((p, cut - p))
        p = cut
    return out


def cdc_chunk_frame(ids: pd.Series, payloads: pd.Series, *,
                    mask_bits: int = 6, min_size: int = 16,
                    max_size: int = 256) -> pd.DataFrame:
    """Per-batch kernel: one (id, chunk_idx, offset, length) row per
    chunk.  ``payloads`` is a bytes column (encode text upstream)."""
    out_id, out_ix, out_off, out_len = [], [], [], []
    for i, raw in zip(ids, payloads):
        ch = cdc_boundaries(bytes(raw), mask_bits=mask_bits,
                            min_size=min_size, max_size=max_size)
        out_id.extend([i] * len(ch))
        out_ix.extend(range(len(ch)))
        out_off.extend(o for o, _ in ch)
        out_len.extend(ln for _, ln in ch)
    return pd.DataFrame({
        "doc_id": pd.Series(out_id),
        "chunk_idx": pd.Series(out_ix, dtype="int64"),
        "offset": pd.Series(out_off, dtype="int64"),
        "length": pd.Series(out_len, dtype="int64")})


def cdc_chunks(ds, id_col: str = "doc_id", text_col: str = "text", *,
               mask_bits: int = 6, min_size: int = 16,
               max_size: int = 256):
    """Dataset -> Dataset[(doc_id, chunk_idx, offset, length)]."""
    def fx(df: pd.DataFrame) -> pd.DataFrame:
        return cdc_chunk_frame(
            df[id_col], df[text_col].str.encode("utf-8"),
            mask_bits=mask_bits, min_size=min_size, max_size=max_size)

    return ds.map_batches(fx, batch_format="pandas")


def cdc_dedup_stats(ds, id_col: str = "doc_id",
                    text_col: str = "text", *, mask_bits: int = 6,
                    min_size: int = 16, max_size: int = 256,
                    nparts: int = 32) -> pd.DataFrame:
    """Chunk-level dedup savings: CDC-chunk every document, content-
    hash each chunk (md5 -> two int64 halves, collision-proof at any
    corpus size), count/byte-sum the DISTINCT chunks — the "how much
    storage does shift-resistant chunking recover on a re-crawl"
    number.  One row out: (n_chunks, n_distinct, bytes_total,
    bytes_distinct).

    Scale shape: chunk BYTES never leave their batch — the per-batch
    kernel hashes slices locally and per-batch drop_duplicates
    pre-shrinks; the one shuffle moves (h1, h2, length) int rows
    hash-partitioned on h1, each partition dedups vectorized and
    emits two ints; the driver sums O(nparts) rows."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h1, h2, ln = [], [], []
        n_chunks = 0
        bytes_total = 0
        for raw in df[text_col].str.encode("utf-8"):
            raw = bytes(raw)
            for off, length in cdc_boundaries(
                    raw, mask_bits=mask_bits, min_size=min_size,
                    max_size=max_size):
                d = hashlib.md5(raw[off:off + length]).digest()
                h1.append(int.from_bytes(d[:8], "big", signed=True))
                h2.append(int.from_bytes(d[8:], "big", signed=True))
                ln.append(length)
                n_chunks += 1
                bytes_total += length
        t = pd.DataFrame({"h1": pd.Series(h1, dtype="int64"),
                          "h2": pd.Series(h2, dtype="int64"),
                          "length": pd.Series(ln, dtype="int64")})
        t = t.drop_duplicates(["h1", "h2"])
        t["__pp"] = (t["h1"].to_numpy().astype(np.uint64)
                     % np.uint64(nparts)).astype("int64")
        t["n_chunks"] = np.int64(0)
        t["bytes_total"] = np.int64(0)
        if len(t):
            t.iloc[0, t.columns.get_loc("n_chunks")] = n_chunks
            t.iloc[0, t.columns.get_loc("bytes_total")] = bytes_total
        return t

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["h1", "h2"])
        return pd.DataFrame({
            "n_chunks": [g["n_chunks"].sum()],
            "bytes_total": [g["bytes_total"].sum()],
            "n_distinct": [len(u)],
            "bytes_distinct": [u["length"].sum()]})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("__pp").map_groups(per_part,
                                         batch_format="pandas")
             .to_pandas())
    return pd.DataFrame({
        "n_chunks": [int(parts["n_chunks"].sum())],
        "n_distinct": [int(parts["n_distinct"].sum())],
        "bytes_total": [int(parts["bytes_total"].sum())],
        "bytes_distinct": [int(parts["bytes_distinct"].sum())]})
