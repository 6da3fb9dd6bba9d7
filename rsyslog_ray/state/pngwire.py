"""PNG / APNG codec built from the public specs (RFC 2083 / W3C
PNG-1.2, plus the APNG extension chunks) on stdlib ``zlib`` + numpy —
the real decode kernel behind ``stages/multimodal.py`` (this container
has no PIL/cv2; the repo convention for such gaps is an in-repo wire
implementation, like ``state/mmdb.py`` / ``state/dbwire.py``).

Decoder surface (``decode_png``):
- 8-bit samples; color types 0 (gray), 2 (RGB), 3 (palette), 4
  (gray+alpha), 6 (RGBA); filters 0-4 (None/Sub/Up/Average/Paeth);
  interlace 0 (progressive) and 1 (Adam7, all seven passes);
  multi-IDAT streams; chunk CRCs verified.  Ancillary chunks are
  skipped.  Malformed input raises :class:`PngError` (bad signature,
  CRC mismatch, truncated stream, geometry overflow).
- APNG (``decode_apng``): acTL/fcTL/fdAT walk with strict sequence
  numbering, frame regions composited onto the canvas with dispose
  ops NONE/BACKGROUND and blend ops SOURCE/OVER (integer alpha
  blend, round-half-up).

Encoder surface (``encode_png`` / ``encode_apng``) is the
spec-conformant fixture writer: per-row filter control (including a
deterministic 0..4 cycle), Adam7 serialization, IDAT splitting,
palette emission — so tests can pin the decoder against every
branch from independently synthesized pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (after palette expansion for type 3)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG byte stream."""


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


# ---- filtering (encoder) / unfiltering (decoder) --------------------
#
# Per PNG-1.2 §6: each scanline is prefixed by one filter-type byte;
# all arithmetic is mod 256 on bytes, with a/b/c the reconstructed
# left / up / up-left bytes at distance bpp.

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, raw: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """raw scanline (uint8) -> filtered bytes for ``ftype``."""
    n = len(raw)
    left = np.zeros(n, dtype=np.uint8)
    left[bpp:] = raw[:-bpp]
    upleft = np.zeros(n, dtype=np.uint8)
    upleft[bpp:] = prev[:-bpp]
    if ftype == 0:
        return raw.copy()
    if ftype == 1:
        return raw - left
    if ftype == 2:
        return raw - prev
    if ftype == 3:
        avg = ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2
               ).astype(np.uint8)
        return raw - avg
    if ftype == 4:
        pred = np.empty(n, dtype=np.uint8)
        for i in range(n):
            pred[i] = _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
        return raw - pred
    raise PngError(f"unknown filter type {ftype}")


def _unfilter_row(ftype: int, filt: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """filtered scanline bytes -> reconstructed (uint8)."""
    n = len(filt)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return filt + prev
    if ftype == 1:
        # recon[x] = filt[x] + recon[x-bpp]: a mod-256 prefix sum per
        # byte lane (np.add.accumulate on uint8 wraps)
        out = filt.copy()
        for k in range(bpp):
            out[k::bpp] = np.add.accumulate(out[k::bpp],
                                            dtype=np.uint8)
        return out
    out = np.empty(n, dtype=np.uint8)
    if ftype == 3:
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(filt[i]) + (a + int(prev[i])) // 2) & 0xFF
        return out
    if ftype == 4:
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            c = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(filt[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        return out
    raise PngError(f"unknown filter type {ftype}")


# ---- Adam7 interlacing ----------------------------------------------
# (x_start, y_start, x_step, y_step) per pass, PNG-1.2 §8.2

_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _pass_dims(w: int, h: int):
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        yield x0, y0, dx, dy, pw, ph


# ---- serialization helpers ------------------------------------------

def _serialize_scanlines(img: np.ndarray, filters) -> bytes:
    """img (H, W, C) uint8 -> filter-prefixed scanline stream.
    ``filters``: int, per-row list, or "cycle" (row % 5)."""
    h, w, c = img.shape
    raw = img.reshape(h, w * c)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        if filters == "cycle":
            ft = y % 5
        elif isinstance(filters, int):
            ft = filters
        else:
            ft = int(filters[y])
        out.append(ft)
        out += _filter_row(ft, raw[y], prev, c).tobytes()
        prev = raw[y]
    return bytes(out)


def _deserialize_scanlines(data: bytes, w: int, h: int,
                           c: int) -> np.ndarray:
    stride = w * c
    need = h * (stride + 1)
    if len(data) < need:
        raise PngError(f"decompressed stream short: {len(data)} < {need}")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = data[pos]
        row = np.frombuffer(data, dtype=np.uint8,
                            count=stride, offset=pos + 1)
        out[y] = _unfilter_row(ft, row, prev, c)
        prev = out[y]
        pos += stride + 1
    return out.reshape(h, w, c)


def _encode_pixel_stream(img: np.ndarray, filters, interlace: int) -> bytes:
    h, w, c = img.shape
    if interlace == 0:
        return _serialize_scanlines(img, filters)
    parts = []
    for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
        if pw == 0 or ph == 0:
            continue
        sub = img[y0::dy, x0::dx][:ph, :pw]
        parts.append(_serialize_scanlines(np.ascontiguousarray(sub),
                                          filters))
    return b"".join(parts)


def _decode_pixel_stream(data: bytes, w: int, h: int, c: int,
                         interlace: int) -> np.ndarray:
    if interlace == 0:
        return _deserialize_scanlines(data, w, h, c)
    img = np.zeros((h, w, c), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
        if pw == 0 or ph == 0:
            continue
        need = ph * (pw * c + 1)
        sub = _deserialize_scanlines(data[pos:pos + need], pw, ph, c)
        img[y0::dy, x0::dx] = sub
        pos += need
    return img


# ---- public encoder -------------------------------------------------

def encode_png(img: np.ndarray, *, filters="cycle", interlace: int = 0,
               idat_size: int = 8192, palette: np.ndarray | None = None,
               level: int = 6) -> bytes:
    """uint8 array -> PNG bytes.  2-D = grayscale; (H, W, C) with C in
    {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}.  ``palette`` (N, 3)
    turns a 2-D index array into color type 3.  ``filters`` exercises
    specific filter rows ("cycle" walks 0..4); ``idat_size`` splits
    the compressed stream into multiple IDAT chunks."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, c = img.shape
    if palette is not None:
        if c != 1:
            raise ValueError("palette requires a 2-D index array")
        color_type = 3
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    body = zlib.compress(
        _encode_pixel_stream(img, filters, 1 if interlace else 0), level)
    chunks = [_chunk(b"IHDR", ihdr)]
    if palette is not None:
        chunks.append(_chunk(
            b"PLTE", np.asarray(palette, np.uint8).tobytes()))
    for i in range(0, max(len(body), 1), idat_size):
        chunks.append(_chunk(b"IDAT", body[i:i + idat_size]))
    chunks.append(_chunk(b"IEND", b""))
    return PNG_SIG + b"".join(chunks)


# ---- chunk walker ---------------------------------------------------

def _walk_chunks(data: bytes):
    if data[:8] != PNG_SIG:
        raise PngError("bad PNG signature")
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4:pos + 8]
        end = pos + 8 + ln
        if end + 4 > n:
            raise PngError(f"truncated {typ!r} chunk")
        payload = data[pos + 8:end]
        (crc,) = struct.unpack_from(">I", data, end)
        if crc != (zlib.crc32(typ + payload) & 0xFFFFFFFF):
            raise PngError(f"CRC mismatch in {typ!r} chunk")
        yield typ, payload
        pos = end + 4
        if typ == b"IEND":
            return
    raise PngError("missing IEND")


_MAX_PIXELS = 1 << 26       # 64M samples: fixture-scale safety bound


def _parse_ihdr(payload: bytes):
    if len(payload) != 13:
        raise PngError("bad IHDR length")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", payload)
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth} (8 only)")
    if color not in _CHANNELS:
        raise PngError(f"unknown color type {color}")
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise PngError("bad IHDR method fields")
    if w == 0 or h == 0 or w * h * _CHANNELS[color] > _MAX_PIXELS:
        raise PngError(f"bad geometry {w}x{h}")
    return w, h, color, interlace


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """PNG bytes -> ((H, W, C) uint8, info).  C is 1/2/3/4 by color
    type; palette images come back expanded to RGB."""
    ihdr = None
    plte = None
    idat = []
    for typ, payload in _walk_chunks(bytes(data)):
        if typ == b"IHDR":
            ihdr = _parse_ihdr(payload)
        elif typ == b"PLTE":
            if len(payload) % 3 or not payload:
                raise PngError("bad PLTE length")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(payload)
    if ihdr is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    w, h, color, interlace = ihdr
    try:
        stream = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT zlib stream: {e}") from None
    c = _CHANNELS[color]
    img = _decode_pixel_stream(stream, w, h, c, interlace)
    if color == 3:
        if plte is None:
            raise PngError("palette image without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise PngError("palette index out of range")
        img = plte[idx]
    info = {"width": w, "height": h, "color_type": color,
            "channels": img.shape[2], "interlace": interlace}
    return img, info


# ---- APNG -----------------------------------------------------------

DISPOSE_NONE, DISPOSE_BACKGROUND = 0, 1
BLEND_SOURCE, BLEND_OVER = 0, 1


def encode_apng(frames, *, delays=None, filters=0,
                idat_size: int = 8192, level: int = 6) -> bytes:
    """frames -> APNG bytes.  Each frame is an array (full canvas) or
    a dict {img, x, y, blend, dispose} placing a sub-region.  Frame 0
    must be full-canvas (it doubles as the default image)."""
    norm = []
    for f in frames:
        if isinstance(f, dict):
            norm.append({"img": np.asarray(f["img"], np.uint8),
                         "x": int(f.get("x", 0)), "y": int(f.get("y", 0)),
                         "blend": int(f.get("blend", BLEND_SOURCE)),
                         "dispose": int(f.get("dispose", DISPOSE_NONE))})
        else:
            norm.append({"img": np.asarray(f, np.uint8), "x": 0, "y": 0,
                         "blend": BLEND_SOURCE, "dispose": DISPOSE_NONE})
    if not norm:
        raise ValueError("need at least one frame")
    base = norm[0]["img"]
    if base.ndim == 2:
        base = base[:, :, None]
    h, w, c = base.shape
    if norm[0]["x"] or norm[0]["y"] or norm[0]["img"].shape[:2] != (h, w):
        raise ValueError("frame 0 must be full-canvas at (0, 0)")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    chunks = [_chunk(b"IHDR", ihdr),
              _chunk(b"acTL", struct.pack(">II", len(norm), 0))]
    seq = 0

    def fctl(fr) -> bytes:
        nonlocal seq
        img = fr["img"] if fr["img"].ndim == 3 else fr["img"][:, :, None]
        fh, fw = img.shape[:2]
        d_num, d_den = (delays or (1, 10)) if not isinstance(
            delays, list) else delays[0]
        data = struct.pack(">IIIIIHHBB", seq, fw, fh, fr["x"], fr["y"],
                           d_num, d_den, fr["dispose"], fr["blend"])
        seq += 1
        return _chunk(b"fcTL", data)

    for i, fr in enumerate(norm):
        img = fr["img"] if fr["img"].ndim == 3 else fr["img"][:, :, None]
        if img.shape[2] != c:
            raise ValueError("all frames need the same channel count")
        chunks.append(fctl(fr))
        body = zlib.compress(_serialize_scanlines(img, filters), level)
        for j in range(0, max(len(body), 1), idat_size):
            part = body[j:j + idat_size]
            if i == 0:
                chunks.append(_chunk(b"IDAT", part))
            else:
                chunks.append(_chunk(
                    b"fdAT", struct.pack(">I", seq) + part))
                seq += 1
    chunks.append(_chunk(b"IEND", b""))
    return PNG_SIG + b"".join(chunks)


def decode_apng(data: bytes) -> list[np.ndarray]:
    """APNG bytes -> composited full-canvas frames (uint8 arrays).
    A plain PNG decodes to a single frame.  Sequence numbers are
    checked strictly monotone; dispose NONE/BACKGROUND and blend
    SOURCE/OVER are applied per the APNG spec (alpha blend is
    integer round-half-up)."""
    ihdr = None
    n_frames = None
    # frame build-up: list of (fctl_fields, [raw_datas])
    frames: list[tuple[tuple, list]] = []
    default_idat: list[bytes] = []
    idat_in_frame = False
    last_seq = -1
    for typ, payload in _walk_chunks(bytes(data)):
        if typ == b"IHDR":
            ihdr = _parse_ihdr(payload)
        elif typ == b"acTL":
            n_frames = struct.unpack(">II", payload)[0]
        elif typ == b"fcTL":
            f = struct.unpack(">IIIIIHHBB", payload)
            if f[0] <= last_seq:
                raise PngError("fcTL sequence out of order")
            last_seq = f[0]
            frames.append((f, []))
            idat_in_frame = not default_idat       # IDAT joins frame 0
        elif typ == b"IDAT":
            default_idat.append(payload)
            if frames and idat_in_frame:
                frames[-1][1].append(payload)
        elif typ == b"fdAT":
            seq = struct.unpack(">I", payload[:4])[0]
            if seq <= last_seq:
                raise PngError("fdAT sequence out of order")
            last_seq = seq
            if not frames:
                raise PngError("fdAT before any fcTL")
            frames[-1][1].append(payload[4:])
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, color, interlace = ihdr
    c = _CHANNELS[color]
    if n_frames is None or not frames:
        return [decode_png(data)[0]]
    if interlace:
        raise PngError("interlaced APNG is unsupported")
    if len(frames) != n_frames:
        raise PngError(f"acTL claims {n_frames} frames, "
                       f"found {len(frames)}")

    canvas = np.zeros((h, w, c), dtype=np.uint8)
    out = []
    pending_dispose = None        # (dispose_op, x, y, fw, fh)
    for (f, datas) in frames:
        _seq, fw, fh, x, y, _dn, _dd, dispose, blend = f
        if x + fw > w or y + fh > h:
            raise PngError("frame region outside canvas")
        if not datas:
            raise PngError("frame without image data")
        try:
            stream = zlib.decompress(b"".join(datas))
        except zlib.error as e:
            raise PngError(f"bad frame zlib stream: {e}") from None
        region = _decode_pixel_stream(stream, fw, fh, c, 0)
        if pending_dispose is not None:
            dop, px, py, pw, ph = pending_dispose
            if dop == DISPOSE_BACKGROUND:
                canvas[py:py + ph, px:px + pw] = 0
        if blend == BLEND_OVER and c in (2, 4):
            dst = canvas[y:y + fh, x:x + fw].astype(np.uint32)
            src = region.astype(np.uint32)
            a = src[:, :, -1:]
            mixed = (src * a + dst * (255 - a) + 127) // 255
            canvas[y:y + fh, x:x + fw] = mixed.astype(np.uint8)
        else:
            canvas[y:y + fh, x:x + fw] = region
        pending_dispose = (dispose, x, y, fw, fh)
        out.append(canvas.copy())
    return out
