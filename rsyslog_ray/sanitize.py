"""Byte-stable sanitization (SanitizeMsg / mmutf8fix analog).

The reference sanitizes every raw message before parsing: control-char
handling, NUL handling, trailing-LF strip (reference
runtime/parser.c:330 SanitizeMsg) and repairs invalid UTF-8 by
replacing offending bytes with spaces (reference
plugins/mmutf8fix/mmutf8fix.c).

Our spec (shared verbatim by the vectorized engine stage and the
per-row oracle, so extracted text is byte-identical by construction —
see SURVEY.md §7 "hard parts"):

1. decode bytes as UTF-8 with the 'replace' error handler, then map
   every U+FFFD replacement char to a single space;
2. map every control char (codepoint < 0x20) except '\\n' and '\\t'
   to a single space;
3. strip one trailing '\\n' if present.
"""

from __future__ import annotations

import pandas as pd

# translation table: C0 controls (minus \n \t) -> space; U+FFFD -> space
_CTRL = {c: 0x20 for c in range(0x20) if c not in (0x09, 0x0A)}
_CTRL[0xFFFD] = 0x20


def sanitize_bytes(raw: bytes) -> str:
    """Reference (oracle) implementation — simple, obviously correct."""
    s = raw.decode("utf-8", errors="replace")
    s = s.translate(_CTRL)
    if s.endswith("\n"):
        s = s[:-1]
    return s


def sanitize_series(values):
    """Vectorized pandas implementation of the same spec.

    ``values``: pandas Series of bytes (object dtype). Returns Series of str.
    """
    s = values.str.decode("utf-8", errors="replace")
    s = s.str.translate(_CTRL)
    # strip exactly one trailing newline
    return s.str.replace(r"\n$", "", regex=True, n=1)


def sanitize_arrow(binary_arr):
    """Arrow-vectorized implementation of the same spec, with a fast
    path: rows with NO control bytes and NO non-ASCII bytes are valid
    UTF-8 with nothing to replace, so they cast binary→string in C (the
    overwhelming majority); only the dirty minority takes the per-row
    decode path — far less memory traffic per batch.

    Dirty path order of ops: control bytes (C0 minus \\t \\n) are
    replaced with spaces ON THE BYTES first — safe, because those bytes
    are never UTF-8 continuation bytes, so pre-replacing them cannot
    merge or split an invalid multi-byte sequence — then
    decode-with-replace + U+FFFD→space runs in pandas.  Byte-identical
    to ``sanitize_bytes`` (tested per row).

    ``binary_arr``: pa.Array/ChunkedArray of binary. Returns pandas str
    Series (the caller decides the final container).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(binary_arr, pa.ChunkedArray):
        binary_arr = binary_arr.combine_chunks()
    # null payloads stay null (real-corpus rows can lack the column)
    null_np = binary_arr.is_null().to_numpy(zero_copy_only=False)
    dirty_mask = pc.fill_null(pc.match_substring_regex(
        binary_arr, r"[\x00-\x08\x0B-\x1F\x80-\xFF]"), False)
    dirty_np = dirty_mask.to_numpy(zero_copy_only=False)

    out = np.empty(len(binary_arr), dtype=object)
    clean_idx = np.nonzero(~dirty_np & ~null_np)[0]
    if len(clean_idx):
        clean = pc.cast(binary_arr.take(pa.array(clean_idx)), pa.string())
        out[clean_idx] = clean.to_pandas().to_numpy(dtype=object)
    dirty_idx = np.nonzero(dirty_np)[0]
    if len(dirty_idx):
        d = binary_arr.take(pa.array(dirty_idx))
        d = pc.replace_substring_regex(d, r"[\x00-\x08\x0B-\x1F]", b" ")
        s = d.to_pandas().str.decode("utf-8", errors="replace")
        s = s.str.replace("\ufffd", " ", regex=False)
        out[dirty_idx] = s.to_numpy(dtype=object)

    res = pd.Series(out)
    return res.str.replace(r"\n$", "", regex=True, n=1)
