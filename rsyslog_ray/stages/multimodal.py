"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Image/audio/video travel as ``binary`` columns with typed metadata —
never decoded at rest, never through pandas object churn (stay
``batch_format="pyarrow"`` into the stage, small ``batch_size`` because
payloads are wide).  The decode libraries (PIL/av/torchaudio) are NOT
in this container, so the decode body is stubbed two ways:

- ``deterministic_features`` / ``batch_features``: a real, tested fake
  — byte-level features (length, position-mixed hash, entropy
  estimate, head bytes) standing in for decode output with a stable
  schema.  ``batch_features`` is the engine path: ONE numpy pass over
  the batch's concatenated payload buffer (splitmix hash via
  ``bitwise_xor.reduceat``, entropy via a (rows × 256) bincount) — no
  per-byte Python anywhere; ``deterministic_features`` is the per-row
  oracle pinned equal by tests.
- ``MediaDecodeStage(strict=True)`` raises ``NotImplementedError``
  exactly where the real decoder would run, so swapping in PIL is a
  one-method change.

The Ray-side plumbing — actor pool (model/codec loaded once per actor
in ``__init__``), pyarrow batches, explicit ``batch_size``/``num_cpus``,
fixed output schema — is the real deliverable and is tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _splitmix

MEDIA_FEATURE_SCHEMA = pa.schema([
    pa.field("media_len", pa.int64()),
    pa.field("media_hash", pa.uint64()),
    pa.field("entropy_milli", pa.int64()),   # Shannon entropy × 1000 (int: hash-stable)
    pa.field("head4", pa.binary()),
])

_HASH_CLIP = 4096  # hash the first 4 KiB only (decode-header analog)


def _hash_spec(clipped: np.ndarray, full_len: int) -> int:
    """splitmix64(XOR_j splitmix64(byte_j ^ splitmix64(j+1)) ^ len):
    order-sensitive via the position mix, batchable via XOR."""
    h = np.uint64(0)
    if len(clipped):
        pos = np.arange(len(clipped), dtype=np.uint64)
        h = np.bitwise_xor.reduce(
            _splitmix(clipped.astype(np.uint64) ^ _splitmix(pos + np.uint64(1))))
    return int(_splitmix(np.uint64(h) ^ np.uint64(full_len)))


def deterministic_features(payload: bytes | None) -> dict:
    """Per-row reference feature extractor (oracle for batch_features)."""
    if payload is None:
        payload = b""
    payload = bytes(payload)
    c = np.frombuffer(payload[:_HASH_CLIP], dtype=np.uint8)
    counts = (np.bincount(np.frombuffer(payload, dtype=np.uint8),
                          minlength=256) if payload else np.zeros(256))
    p = counts[counts > 0] / max(1, len(payload))
    ent = float(-(p * np.log2(p)).sum()) if len(p) else 0.0
    return {
        "media_len": len(payload),
        "media_hash": _hash_spec(c, len(payload)),
        "entropy_milli": int(np.round(ent * 1000)),
        "head4": payload[:4],
    }


# position mix precomputed once per process (the per-batch win: the
# hash inner loop is then two u64 kernels per row, no arange/repeat)
_POSMIX = _splitmix(np.arange(1, _HASH_CLIP + 1, dtype=np.uint64))


def batch_features(payloads: list) -> dict[str, np.ndarray | list]:
    """Feature extraction for a whole batch: a row-level loop whose
    body is only C kernels (frombuffer view, splitmix xor-reduce,
    bincount histogram) — no per-byte Python, no giant flat-buffer
    intermediates (measured slower than per-row kernels on this data:
    the arange/repeat/int64-histogram temporaries are memory-bound)."""
    n = len(payloads)
    payloads = [b"" if p is None else bytes(p) for p in payloads]
    full_lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                            count=n)
    h = np.zeros(n, dtype=np.uint64)
    ent = np.zeros(n, dtype=np.float64)
    for i, p in enumerate(payloads):
        if not p:
            continue
        b = np.frombuffer(p, dtype=np.uint8)
        c = b[:_HASH_CLIP].astype(np.uint64)
        h[i] = np.bitwise_xor.reduce(_splitmix(c ^ _POSMIX[:len(c)]))
        counts = np.bincount(b, minlength=256)
        prob = counts[counts > 0] / len(b)
        ent[i] = -(prob * np.log2(prob)).sum()
    media_hash = _splitmix(h ^ full_lens.astype(np.uint64))
    return {
        "media_len": full_lens,
        "media_hash": media_hash,
        "entropy_milli": np.round(ent * 1000).astype(np.int64),
        "head4": [p[:4] for p in payloads],
    }


class MediaDecodeStage:
    """Actor-pool decode stage:
    ``ds.map_batches(MediaDecodeStage, fn_constructor_kwargs=dict(...),
    batch_format="pyarrow", batch_size=256, concurrency=(1, N),
    num_cpus=1)``

    ``__init__`` is where the real system loads the codec/model ONCE
    per actor (mmdblookup opens its DB the same way,
    plugins/mmdblookup/mmdblookup.c:470-497).  Small batch_size: a
    batch is ``batch_size × payload`` bytes of heap.
    """

    def __init__(self, media_col: str = "html", strict: bool = False,
                 keep_payload: bool = False):
        self.media_col = media_col
        self.strict = strict
        self.keep_payload = keep_payload
        # real system: self.codec = load_codec(); here the stub is the
        # vectorized deterministic feature extractor
        self._decode_batch = batch_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires an image/audio library not present "
                "in this environment; plug a real decoder in here")
        feats = self._decode_batch(batch[self.media_col].to_pylist())
        out = batch if self.keep_payload else batch.drop_columns(
            [self.media_col])
        for name in MEDIA_FEATURE_SCHEMA.names:
            out = out.append_column(
                name, pa.array(feats[name],
                               MEDIA_FEATURE_SCHEMA.field(name).type))
        return out


def media_features(ds, media_col: str = "html", concurrency=(1, 8),
                   batch_size: int = 256):
    """Attach the decode stage (actor pool, wide-payload batch sizing)."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"media_col": media_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
