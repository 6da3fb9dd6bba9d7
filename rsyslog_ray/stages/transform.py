"""Per-record transform operators beyond the parse stage.

- flatten_json / unflatten_json — mmjsontransform analog
  (plugins/mmjsontransform/mmjsontransform.c:63-71: flatten/unflatten
  modes with conflict policy "last wins").
- ConsistentAnonymizer — mmanon random-consistent mode
  (plugins/mmanon/mmanon.c:59-166): every distinct IPv4 maps to a
  stable random-looking replacement, consistent ACROSS the whole run.
  The reference shares one map across worker threads under a mutex;
  here consistency comes from a keyed HASH (deterministic function of
  the ip + secret), so no shared mutable state is needed at all —
  every worker computes the same replacement independently.  This is
  the scale-correct re-homing of "shared dict under mutex".
- hmac_column — mmrfc5424addhmac analog: keyed digest per row.
- capped_dynstats — dynstats maxCardinality semantics
  (runtime/dynstats.c:43-45): at most `max_cardinality` tracked keys
  (by first-seen in deterministic key order here — batch semantics);
  overflow keys are counted in the `__rejected__` bucket instead of
  being tracked (the reference refuses new metrics the same way).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import json
import re

import numpy as np
import pandas as pd

IPV4_RE = re.compile(r"\b(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})\b")


# ---------------------------------------------------------------------
# mmjsontransform

def flatten_json(obj, sep: str = ".", prefix: str = "") -> dict:
    """Nested dict -> single-level dotted keys (lists kept as values)."""
    out: dict = {}
    for k, v in obj.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_json(v, sep, key))
        else:
            out[key] = v
    return out


def unflatten_json(flat: dict, sep: str = ".") -> dict:
    """Dotted keys -> nested dict; conflicts resolve last-wins (the
    reference's overwrite policy)."""
    out: dict = {}
    for k, v in flat.items():
        parts = str(k).split(sep)
        cur = out
        for p in parts[:-1]:
            nxt = cur.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[p] = nxt
            cur = nxt
        cur[parts[-1]] = v
    return out


def flatten_json_series(s: pd.Series, sep: str = ".") -> pd.Series:
    return s.map(lambda x: json.dumps(
        flatten_json(json.loads(x), sep), sort_keys=True, separators=(",", ":")))


def unflatten_json_series(s: pd.Series, sep: str = ".") -> pd.Series:
    return s.map(lambda x: json.dumps(
        unflatten_json(json.loads(x), sep), sort_keys=True,
        separators=(",", ":")))


# ---------------------------------------------------------------------
# mmanon random-consistent

class ConsistentAnonymizer:
    """Replace every IPv4 with a stable pseudonym: the same input ip
    yields the same output ip in every batch, task and run, with no
    shared state.  The reference keeps one random map under a mutex
    across threads; any deterministic map satisfies the same
    consistency contract — we derive the pseudonym from md5(salt+ip)
    bytes so the spec is also exactly replicable in SQL (DuckDB md5)."""

    def __init__(self, salt: str = ""):
        self.salt = salt

    def _repl(self, m: re.Match) -> str:
        d = hashlib.md5((self.salt + m.group(0)).encode()).digest()
        return f"10.{d[0]}.{d[1]}.{d[2]}"  # pseudonyms live in 10/8

    def anonymize(self, s: pd.Series) -> pd.Series:
        return s.str.replace(IPV4_RE, self._repl, regex=True)

    def _repl6(self, m: re.Match) -> str:
        # keep the network half, pseudonymize the interface identifier
        # (mmanon ipv6 random-consistent, low 64 bits) from md5 bytes
        d = hashlib.md5((self.salt + m.group(0)).encode()).digest()
        tail = ":".join(format((d[i] << 8) | d[i + 1], "x")
                        for i in (0, 2, 4, 6))
        return m.group(1) + tail

    def anonymize_ipv6(self, s: pd.Series) -> pd.Series:
        from ..functions import IPV6_RE
        return s.str.replace(IPV6_RE, self._repl6, regex=True)


# ---------------------------------------------------------------------
# mmrfc5424addhmac

def hmac_column(s: pd.Series, key: bytes = b"k", algo: str = "sha256") -> pd.Series:
    return s.map(lambda v: _hmac.new(key, str(v).encode(), algo).hexdigest())


def keyed_digest(s: pd.Series, key: str = "k") -> pd.Series:
    """sha256(key || payload) keyed digest — the oracle-exact variant
    of the mmrfc5424addhmac signature column (DuckDB core has sha256
    but no HMAC, so the driver-checked query uses this spec; true
    RFC2104 HMAC stays available as hmac_column)."""
    kb = key.encode()
    return s.map(lambda v: hashlib.sha256(kb + str(v).encode()).hexdigest())


# ---------------------------------------------------------------------
# dynstats maxCardinality

def capped_dynstats(counts: pd.DataFrame, key: str, cnt: str,
                    max_cardinality: int,
                    rejected_key: str = "__rejected__") -> pd.DataFrame:
    """Apply the cardinality cap to a finished (key, cnt) count table:
    keep the first `max_cardinality` keys in sorted order, fold the
    rest into one `__rejected__` bucket (the reference refuses new
    metrics past the cap and counts the refusals,
    runtime/dynstats.c:43-45)."""
    counts = counts.sort_values(key).reset_index(drop=True)
    if len(counts) <= max_cardinality:
        return counts
    kept = counts.iloc[:max_cardinality]
    rejected = int(counts.iloc[max_cardinality:][cnt].sum())
    extra = pd.DataFrame({key: [rejected_key], cnt: [rejected]})
    return (pd.concat([kept, extra], ignore_index=True)
            .astype({cnt: "int64"}))


# ---------------------------------------------------------------------
# immark heartbeat rows

def mark_rows(ds, ts_col: str, interval_s: int = 1200,
              record_col: str = "record", mark_text: str = "-- MARK --"):
    """immark analog (plugins/immark/immark.c: a thread injects a
    "-- MARK --" message every ``interval`` seconds of wall time).  The
    batch re-homing is EVENT time: one mark row at every interval
    boundary inside the stream's [min, max] event-time span, unioned
    into the stream.  Mark rows carry ``mark_text`` in ``record_col``,
    the boundary timestamp in ``ts_col``, and null for every other
    column.  Two small driver aggregates (min/max — O(1) results) are
    the only non-streaming work."""
    import ray.data

    names = ds.schema().names
    lo = ds.min(ts_col)
    hi = ds.max(ts_col)
    if lo is None or hi is None:        # empty stream: no heartbeats
        return ds
    is_ts = not isinstance(lo, (int, float, np.integer, np.floating))
    lo_s = int(pd.Timestamp(lo).timestamp()) if is_ts else int(lo)
    hi_s = int(pd.Timestamp(hi).timestamp()) if is_ts else int(hi)
    first = (lo_s // interval_s + 1) * interval_s
    bounds = list(range(first, hi_s + 1, interval_s))
    if not bounds:
        return ds
    n = len(bounds)
    cols: dict = {}
    for name in names:
        if name == ts_col:
            cols[name] = (pd.to_datetime(bounds, unit="s") if is_ts
                          else np.asarray(bounds, dtype=type(lo)))
        elif name == record_col:
            cols[name] = np.full(n, mark_text, dtype=object)
        else:
            cols[name] = np.full(n, None, dtype=object)
    marks = ray.data.from_pandas(pd.DataFrame(cols))
    return ds.union(marks)
