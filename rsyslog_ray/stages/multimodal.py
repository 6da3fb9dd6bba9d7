"""Multimodal columns: opaque binary payloads + actor-pool decode stages.

Image/audio/video travel as ``binary`` columns with typed metadata —
never decoded at rest, never through pandas object churn (stay
``batch_format="pyarrow"`` into the stage, small ``batch_size`` because
payloads are wide).

The decode kernels are REAL for PNG/APNG — an in-repo from-spec codec
(``state/pngwire.py``: zlib inflate, numpy per-row unfiltering,
Adam7, palette, CRC checks) decodes actual pixels; resize is a true
box filter; frame sampling walks a real animated-PNG container and
composites frames per the APNG spec.  Payloads that are not PNG
(e.g. raw HTML travelling in the same binary column) take the
deterministic byte-feature path with sentinel pixel stats
(``width = -1``) — ``strict`` controls whether a payload that CLAIMS
to be PNG (signature present) but fails to decode raises
(``strict=True``, the default) or falls back too.

Byte-level features stay as the universal fallback:

- ``deterministic_features`` / ``batch_features``: byte features
  (length, position-mixed hash, entropy estimate, head bytes) with a
  stable schema.  ``batch_features`` is the engine path: ONE numpy
  pass per row over small C kernels; ``deterministic_features`` is
  the per-row oracle pinned equal by tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.pngwire import (PNG_SIG, PngError, decode_apng, decode_png,
                             encode_png)
from .dedup import _splitmix

MEDIA_FEATURE_SCHEMA = pa.schema([
    pa.field("media_len", pa.int64()),
    pa.field("media_hash", pa.uint64()),
    pa.field("entropy_milli", pa.int64()),   # Shannon entropy × 1000 (int: hash-stable)
    pa.field("head4", pa.binary()),
    # pixel stats (real PNG decode; -1/-1/0/-1 for non-image payloads)
    pa.field("width", pa.int64()),
    pa.field("height", pa.int64()),
    pa.field("channels", pa.int64()),
    pa.field("pix_mean_milli", pa.int64()),
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


# ---- deterministic image fixtures -----------------------------------

def synth_image(doc_id: int, *, salt: int = 0, w: int | None = None,
                h: int | None = None, nc: int | None = None) -> np.ndarray:
    """Closed-form fixture image for the media oracles: pixel
    ``(y, x, k) = (doc_id·7919 + salt·997 + y·31 + x·17 + k·131) mod
    256`` over default dims ``w = 8 + doc_id % 13``, ``h = 6 +
    doc_id % 7``, channels ``(1, 3, 4)[doc_id % 3]`` — the SAME
    arithmetic the SQL_TAIL oracles restate in DuckDB, which is what
    lets real pixel decoding be hash-gated end-to-end."""
    if w is None:
        w = 8 + doc_id % 13
    if h is None:
        h = 6 + doc_id % 7
    if nc is None:
        nc = (1, 3, 4)[doc_id % 3]
    y = np.arange(h)[:, None, None]
    x = np.arange(w)[None, :, None]
    k = np.arange(nc)[None, None, :]
    return ((doc_id * 7919 + salt * 997 + y * 31 + x * 17 + k * 131)
            % 256).astype(np.uint8)


# ---- pixel kernels ---------------------------------------------------

def pixel_stats(img: np.ndarray) -> tuple[int, int, int, int]:
    """(width, height, channels, pix_mean_milli) of a decoded image.
    pix_mean_milli = round-half-up(1000 × mean sample) as an exact
    integer — (2000·S + N) // (2·N) — so engine and SQL oracles can
    match hash-exactly."""
    h, w, c = img.shape
    s = int(img.sum(dtype=np.int64))
    n = h * w * c
    return w, h, c, (2000 * s + n) // (2 * n)


_NO_PIXELS = (-1, -1, 0, -1)


def media_row_oracle(payload: bytes | None, *, strict: bool = True) -> dict:
    """Per-row oracle for :class:`MediaDecodeStage`: byte features +
    pixel stats (sentinels for non-PNG; strict raises on a payload
    with a PNG signature that fails to decode)."""
    out = deterministic_features(payload)
    b = bytes(payload) if payload else b""
    if b.startswith(PNG_SIG):
        try:
            img, _ = decode_png(b)
        except PngError:
            if strict:
                raise
            img = None
    else:
        img = None
    w, h, c, mean = pixel_stats(img) if img is not None else _NO_PIXELS
    out.update({"width": w, "height": h, "channels": c,
                "pix_mean_milli": mean})
    return out


def box_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """True box-filter downscale: source column x belongs to target
    bucket x·tw // w (row analog with th // h); each target sample is
    the round-half-up mean of its bucket.  Vectorized as two
    ``np.add.reduceat`` passes; :func:`box_resize_oracle` is the
    per-pixel loop spec tests pin this against."""
    h, w, c = img.shape
    tw, th = min(tw, w), min(th, h)
    ex = np.searchsorted(np.arange(w) * tw // w, np.arange(tw))
    ey = np.searchsorted(np.arange(h) * th // h, np.arange(th))
    s = np.add.reduceat(
        np.add.reduceat(img.astype(np.int64), ey, axis=0), ex, axis=1)
    cnt = np.outer(np.diff(np.append(ey, h)),
                   np.diff(np.append(ex, w)))[:, :, None]
    return ((2 * s + cnt) // (2 * cnt)).astype(np.uint8)


def box_resize_oracle(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Loop-form spec of :func:`box_resize` (the test oracle)."""
    h, w, c = img.shape
    tw, th = min(tw, w), min(th, h)
    out = np.zeros((th, tw, c), dtype=np.uint8)
    for by in range(th):
        for bx in range(tw):
            ys = [y for y in range(h) if y * th // h == by]
            xs = [x for x in range(w) if x * tw // w == bx]
            for k in range(c):
                vals = [int(img[y, x, k]) for y in ys for x in xs]
                n = len(vals)
                out[by, bx, k] = (2 * sum(vals) + n) // (2 * n)
    return out


class MediaDecodeStage:
    """Actor-pool decode stage:
    ``ds.map_batches(MediaDecodeStage, fn_constructor_kwargs=dict(...),
    batch_format="pyarrow", batch_size=256, concurrency=(1, N),
    num_cpus=1)``

    ``__init__`` is where codec state loads ONCE per actor (mmdblookup
    opens its DB the same way, plugins/mmdblookup/mmdblookup.c:470-497)
    — here the PNG codec needs no model, so init just pins config.
    Small batch_size: a batch is ``batch_size × payload`` bytes of
    heap.  PNG payloads decode to real pixels (width/height/channels/
    pix_mean_milli); anything else gets byte features + sentinel pixel
    stats.  ``strict=True`` (default): a payload bearing the PNG
    signature that fails to decode raises — corruption is an error,
    not a silent feature row; ``strict=False`` degrades it to the
    sentinel path."""

    def __init__(self, media_col: str = "html", strict: bool = True,
                 keep_payload: bool = False):
        self.media_col = media_col
        self.strict = strict
        self.keep_payload = keep_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col].to_pylist()
        feats = batch_features(payloads)
        n = len(payloads)
        w = np.full(n, -1, dtype=np.int64)
        h = np.full(n, -1, dtype=np.int64)
        nc = np.zeros(n, dtype=np.int64)
        mean = np.full(n, -1, dtype=np.int64)
        for i, p in enumerate(payloads):
            b = bytes(p) if p else b""
            if not b.startswith(PNG_SIG):
                continue
            try:
                img, _ = decode_png(b)
            except PngError:
                if self.strict:
                    raise
                continue
            w[i], h[i], nc[i], mean[i] = pixel_stats(img)
        feats.update({"width": w, "height": h, "channels": nc,
                      "pix_mean_milli": mean})
        out = batch if self.keep_payload else batch.drop_columns(
            [self.media_col])
        for name in MEDIA_FEATURE_SCHEMA.names:
            out = out.append_column(
                name, pa.array(feats[name],
                               MEDIA_FEATURE_SCHEMA.field(name).type))
        return out


def media_features(ds, media_col: str = "html", concurrency=(1, 8),
                   batch_size: int = 256, strict: bool = False):
    """Attach the decode stage (actor pool, wide-payload batch sizing).
    Default ``strict=False`` here because this helper is commonly
    pointed at mixed binary columns (html + images)."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"media_col": media_col, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class FrameSampleStage:
    """Frame sampling — the video half of the multimodal brief: one
    input row (animated-PNG payload) explodes to up to ``n_frames``
    frame rows.  The container walk is REAL: ``decode_apng`` composites
    every frame per the APNG spec (fcTL/fdAT sequence, region
    placement, dispose/blend), then ``k = min(n_frames, total)``
    frames are sampled evenly — original indices ``(j·total) // k`` —
    and re-encoded as standalone PNGs.  A plain (single-image) PNG
    yields one frame.  Output columns: (id, frame_idx, frame,
    frame_len, frame_w, frame_h, frame_mean_milli).

    Non-PNG payloads: ``strict=True`` (default) raises; with
    ``strict=False`` they degrade to the legacy byte-window stand-in
    (evenly-strided ``frame_bytes`` slices, sentinel -1 pixel stats),
    which keeps mixed binary columns flowing.  Empty/null payloads
    yield zero frames in both modes."""

    def __init__(self, media_col: str = "payload", id_col: str = "url",
                 n_frames: int = 4, frame_bytes: int = 256,
                 strict: bool = True):
        self.media_col = media_col
        self.id_col = id_col
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.strict = strict

    def _byte_windows(self, payload: bytes):
        k = min(self.n_frames, max(1, len(payload) // self.frame_bytes))
        stride = max((len(payload) - self.frame_bytes) // k, 1) \
            if len(payload) > self.frame_bytes else 1
        for j in range(k):
            off = j * stride
            yield j, payload[off:off + self.frame_bytes], -1, -1, -1

    def _png_frames(self, payload: bytes):
        frames = decode_apng(payload)
        total = len(frames)
        k = min(self.n_frames, total)
        for j in range(k):
            idx = (j * total) // k
            img = frames[idx]
            w, h, _c, mean = pixel_stats(img)
            yield idx, encode_png(img, filters=0), w, h, mean

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames, ws, hs, means = [], [], [], [], [], []
        for rid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.media_col].to_pylist()):
            if not payload:
                continue
            payload = bytes(payload)
            if payload.startswith(PNG_SIG):
                it = self._png_frames(payload)
            elif self.strict:
                raise PngError(
                    f"frame sampling needs a PNG/APNG payload "
                    f"(head {payload[:4]!r}); strict=False degrades "
                    f"to byte windows")
            else:
                it = self._byte_windows(payload)
            for idx, frame, w, h, mean in it:
                ids.append(rid)
                idxs.append(idx)
                frames.append(frame)
                ws.append(w)
                hs.append(h)
                means.append(mean)
        return pa.table({
            self.id_col: pa.array(ids),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
            "frame_len": pa.array([len(f) for f in frames], pa.int64()),
            "frame_w": pa.array(ws, pa.int64()),
            "frame_h": pa.array(hs, pa.int64()),
            "frame_mean_milli": pa.array(means, pa.int64()),
        })


class ThumbnailStage:
    """Resize — the image half of the brief: PNG payload -> decoded
    pixels -> REAL box-filter downscale (:func:`box_resize`, exact
    integer round-half-up means) -> re-encoded PNG ``thumb`` column
    plus (thumb_len, thumb_w, thumb_h).

    Non-PNG payloads: ``strict=True`` (default) raises; with
    ``strict=False`` they fall back to the legacy byte subsample
    (every ``scale``-th byte, ``max_bytes`` cap) with sentinel -1
    dims — mixed columns keep flowing."""

    def __init__(self, media_col: str = "payload", tw: int = 4,
                 th: int = 3, scale: int = 8, max_bytes: int = 4096,
                 strict: bool = True):
        self.media_col = media_col
        self.tw = max(1, int(tw))
        self.th = max(1, int(th))
        self.scale = max(1, int(scale))
        self.max_bytes = max_bytes
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, ws, hs = [], [], []
        for payload in batch[self.media_col].to_pylist():
            b = bytes(payload) if payload else b""
            if b.startswith(PNG_SIG):
                img, _ = decode_png(b)
                small = box_resize(img, self.tw, self.th)
                thumbs.append(encode_png(small, filters=0))
                ws.append(small.shape[1])
                hs.append(small.shape[0])
            elif b and self.strict:
                raise PngError(
                    f"thumbnailing needs a PNG payload (head "
                    f"{b[:4]!r}); strict=False degrades to byte "
                    f"subsampling")
            else:
                thumbs.append(b[::self.scale][:self.max_bytes])
                ws.append(-1)
                hs.append(-1)
        out = batch.drop_columns([self.media_col])
        out = out.append_column("thumb", pa.array(thumbs, pa.binary()))
        out = out.append_column(
            "thumb_len", pa.array([len(t) for t in thumbs], pa.int64()))
        out = out.append_column("thumb_w", pa.array(ws, pa.int64()))
        return out.append_column("thumb_h", pa.array(hs, pa.int64()))


def sample_frames(ds, media_col: str = "payload", id_col: str = "url",
                  n_frames: int = 4, frame_bytes: int = 256,
                  concurrency=(1, 8), batch_size: int = 128,
                  strict: bool = True):
    """Attach the frame-sample explode stage (actor pool; small
    batches — a batch is batch_size × payload bytes of heap)."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"media_col": media_col, "id_col": id_col,
                               "n_frames": n_frames,
                               "frame_bytes": frame_bytes,
                               "strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def thumbnails(ds, media_col: str = "payload", tw: int = 4, th: int = 3,
               concurrency=(1, 8), batch_size: int = 128,
               strict: bool = True):
    """Attach the thumbnail stage (actor pool, real box-filter)."""
    return ds.map_batches(
        ThumbnailStage,
        fn_constructor_kwargs={"media_col": media_col, "tw": tw,
                               "th": th, "strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
