"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Image/audio/video travel as ``binary`` columns with typed metadata —
never decoded at rest, never through pandas object churn (stay
``batch_format="pyarrow"`` into the stage, small ``batch_size`` because
payloads are wide).  The decode libraries (PIL/av/torchaudio) are NOT
in this container, so the decode body is stubbed two ways:

- ``deterministic_features``: a real, tested fake — byte-level features
  (length, FNV hash, entropy estimate, head bytes) standing in for
  decode output with a stable schema;
- ``MediaDecodeStage(strict=True)`` raises ``NotImplementedError``
  exactly where the real decoder would run, so swapping in PIL is a
  one-method change.

The Ray-side plumbing — actor pool (model/codec loaded once per actor
in ``__init__``), pyarrow batches, explicit ``batch_size``/``num_cpus``,
fixed output schema — is the real deliverable and is tested.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

MEDIA_FEATURE_SCHEMA = pa.schema([
    pa.field("media_len", pa.int64()),
    pa.field("media_hash", pa.uint64()),
    pa.field("entropy_milli", pa.int64()),   # Shannon entropy × 1000 (int: hash-stable)
    pa.field("head4", pa.binary()),
])


def deterministic_features(payload: bytes) -> dict:
    """Per-row reference feature extractor (oracle + stub decode)."""
    if payload is None:
        payload = b""
    h = 0xCBF29CE484222325
    for b in payload[:4096]:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8),
                         minlength=256) if payload else np.zeros(256)
    p = counts[counts > 0] / max(1, len(payload))
    ent = float(-(p * np.log2(p)).sum()) if len(p) else 0.0
    return {
        "media_len": len(payload),
        "media_hash": h,
        "entropy_milli": int(round(ent * 1000)),
        "head4": payload[:4],
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
        # deterministic feature extractor
        self._decode = self._decode_stub

    def _decode_stub(self, payload: bytes) -> dict:
        if self.strict:
            raise NotImplementedError(
                "media decode requires an image/audio library not present "
                "in this environment; plug a real decoder in here")
        return deterministic_features(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        feats = [self._decode(p) for p in payloads]
        cols = {name: pa.array([f[name] for f in feats],
                               MEDIA_FEATURE_SCHEMA.field(name).type)
                for name in MEDIA_FEATURE_SCHEMA.names}
        out = batch if self.keep_payload else batch.drop_columns(
            [self.media_col])
        for name, arr in cols.items():
            out = out.append_column(name, arr)
        return out


def media_features(ds, media_col: str = "html", concurrency=(1, 4),
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
