"""PNG/APNG codec (state/pngwire.py): decode pinned against
hand-built spec bytes (not just roundtrip), full filter × color-type
× interlace roundtrip battery, malformed-stream battery, APNG
sequence/compositing rules."""

import struct
import zlib

import numpy as np
import pytest

from rsyslog_ray.state.pngwire import (PNG_SIG, PngError, decode_apng,
                                       decode_png, encode_apng,
                                       encode_png)


def _chunk(t: bytes, d: bytes) -> bytes:
    return (struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))


def test_decode_hand_built_spec_bytes():
    """A 2x2 RGB PNG assembled field-by-field per PNG-1.2 (big-endian
    IHDR, filter-0 scanlines, zlib IDAT) — decoding is pinned to the
    SPEC, independent of our encoder."""
    raw = bytes([0, 255, 0, 0, 0, 255, 0,
                 0, 0, 0, 255, 10, 20, 30])
    data = (PNG_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))
    img, info = decode_png(data)
    assert img.tolist() == [[[255, 0, 0], [0, 255, 0]],
                            [[0, 0, 255], [10, 20, 30]]]
    assert (info["width"], info["height"], info["channels"]) == (2, 2, 3)


def test_decode_hand_built_filters():
    """Sub/Up/Average/Paeth unfiltering pinned against hand-computed
    filtered bytes for a 3x3 grayscale image."""
    # target image rows: [10 20 30], [40 50 60], [70 80 90]
    lines = (bytes([1, 10, 10, 10])          # Sub: v[x]-v[x-1]
             + bytes([2, 30, 30, 30])        # Up: v - prev-row
             + bytes([3, (70 - 20) & 0xFF,   # Average: v-(left+up)//2
                      (80 - (70 + 50) // 2) & 0xFF,
                      (90 - (80 + 60) // 2) & 0xFF]))
    data = (PNG_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(lines))
            + _chunk(b"IEND", b""))
    img, _ = decode_png(data)
    assert img[:, :, 0].tolist() == [[10, 20, 30], [40, 50, 60],
                                     [70, 80, 90]]


def test_roundtrip_battery():
    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):
        for filters in (0, 1, 2, 3, 4, "cycle"):
            for interlace in (0, 1):
                for (h, w) in ((1, 1), (3, 5), (9, 17), (7, 2)):
                    a = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
                    png = encode_png(a, filters=filters,
                                     interlace=interlace, idat_size=13)
                    img, info = decode_png(png)
                    assert np.array_equal(img, a), (c, filters,
                                                    interlace, h, w)
                    assert info["interlace"] == interlace


def test_palette_roundtrip():
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 16, (6, 9)).astype(np.uint8)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    png = encode_png(idx, palette=palette, filters="cycle")
    img, info = decode_png(png)
    assert np.array_equal(img, palette[idx])
    assert info["color_type"] == 3 and info["channels"] == 3
    # out-of-range palette index is malformed
    bad = encode_png(np.full((2, 2), 200, np.uint8),
                     palette=palette[:8])
    with pytest.raises(PngError):
        decode_png(bad)


def test_malformed_battery():
    png = encode_png(np.zeros((4, 4, 3), np.uint8))
    cases = {
        "bad signature": b"X" + png[1:],
        "truncated chunk": png[:-6],
        "CRC flip": png[:30] + bytes([png[30] ^ 0xFF]) + png[31:],
        "no chunks": PNG_SIG + b"junk",
        "empty": b"",
    }
    for name, data in cases.items():
        with pytest.raises(PngError):
            decode_png(data)
    # bad depth / short stream via hand-built headers
    with pytest.raises(PngError):
        decode_png(PNG_SIG
                   + _chunk(b"IHDR",
                            struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
                   + _chunk(b"IDAT", zlib.compress(b"\0" * 10))
                   + _chunk(b"IEND", b""))
    with pytest.raises(PngError):
        decode_png(PNG_SIG
                   + _chunk(b"IHDR",
                            struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
                   + _chunk(b"IDAT", zlib.compress(b"\0" * 5))
                   + _chunk(b"IEND", b""))


def test_apng_roundtrip_and_sequence_rules():
    rng = np.random.RandomState(11)
    f0 = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    f1 = rng.randint(0, 256, (5, 7, 3)).astype(np.uint8)
    apng = encode_apng([f0, f1], idat_size=32)
    frames = decode_apng(apng)
    assert len(frames) == 2
    assert np.array_equal(frames[0], f0)
    assert np.array_equal(frames[1], f1)
    # a plain PNG is a single frame
    assert len(decode_apng(encode_png(f0))) == 1
    # frame region outside the canvas is malformed
    with pytest.raises((PngError, ValueError)):
        decode_apng(encode_apng(
            [f0, {"img": rng.randint(0, 256, (4, 4, 3)).astype(np.uint8),
                  "x": 5, "y": 3}]))


def test_fuzz_mutations_fail_closed():
    """Decoder robustness: random byte flips / truncations / splices
    of valid PNGs either decode (mutation hit a don't-care byte — CRC
    would normally catch it, but we flip data too) or raise PngError —
    NEVER any other exception type (no IndexError/struct.error/
    MemoryError escapes into a pipeline stage)."""
    rng = np.random.RandomState(99)
    base = [encode_png(rng.randint(0, 256, (h, w, c)).astype(np.uint8),
                       filters="cycle", interlace=h % 2, idat_size=31)
            for (h, w, c) in ((5, 7, 3), (4, 4, 1), (6, 3, 4))]
    apng = encode_apng([rng.randint(0, 256, (4, 6, 3)).astype(np.uint8)
                        for _ in range(3)], idat_size=17)
    corpus = base + [apng]
    for trial in range(400):
        src = bytearray(corpus[trial % len(corpus)])
        op = trial % 4
        if op == 0:      # flip 1-4 random bytes
            for _ in range(rng.randint(1, 5)):
                src[rng.randint(len(src))] ^= rng.randint(1, 256)
        elif op == 1:    # truncate anywhere
            src = src[:rng.randint(len(src))]
        elif op == 2:    # splice a random window out
            a = rng.randint(len(src))
            b = min(len(src), a + rng.randint(1, 64))
            del src[a:b]
        else:            # inject garbage
            at = rng.randint(len(src))
            src[at:at] = bytes(rng.randint(0, 256, rng.randint(1, 32))
                               .astype(np.uint8))
        for fn in (decode_png, decode_apng):
            try:
                fn(bytes(src))
            except PngError:
                pass       # fail-closed is the contract
