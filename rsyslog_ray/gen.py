"""Deterministic synthetic generator for the `pages` input table.

Mirrors the reference testbench's sequence-numbered generators
(reference tests/tcpflood.c, tests/inputfilegen.c, tools/msggen.c): every
column is a pure function of the dense row id ``seq`` via a counter-based
hash (splitmix64), so any shard can be generated independently and in
parallel with identical results — no global RNG state, no ordering
dependence.  ``seq`` doubles as the seq_check-style gap/dup detector key
(it is embedded in the url).

Schema: (url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string) per BASELINE.json.input_hint, plus a ``shard`` int32 column
used as the resumable-partition id (lineage analog of the reference's
queue checkpoint, runtime/queue.c:104-160).

~5% of rows have a deliberately malformed `text` line (exercises the
first-match-wins fallback + parse_ok=false path, reference
runtime/parser.c:668-685); ~2% of html payloads carry invalid-UTF-8 and
control bytes (SanitizeMsg analog, reference runtime/parser.c:330).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schema as S

BASE_TS_US = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00Z in epoch-us
SPAN_S = 48 * 3600  # warc_ts spans 48 hourly buckets

_VERBS = np.array(
    ["accept", "reject", "retry", "fail", "open", "close", "read", "write",
     "connect", "timeout", "flush", "rotate"], dtype=object)
_OBJS = np.array(
    ["session", "request", "socket", "file", "index", "cache", "queue",
     "batch", "token", "page"], dtype=object)
_FILLER = np.array(
    ["lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit",
     "tempor", "incididunt", "labore", "magna", "aliqua", "veniam", "nostrud",
     "exercitation", "ullamco"], dtype=object)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 — the per-row hash source."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(seq: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """Independent uint64 hash stream per (seed, stream, seq)."""
    with np.errstate(over="ignore"):
        seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % 2**64)
        return _splitmix64(
            seq.astype(np.uint64) ^ seed_mix ^ (np.uint64(stream) << np.uint64(48))
        )


def _u01(seq: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return _h(seq, stream, seed).astype(np.float64) / 2.0**64


def _weighted_pick(u: np.ndarray, weights: list[int]) -> np.ndarray:
    cdf = np.cumsum(np.asarray(weights, dtype=np.float64))
    cdf /= cdf[-1]
    return np.searchsorted(cdf, u, side="right").astype(np.int64)


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    c = np.cumsum(w)
    return c / c[-1]


_HOST_CDF = _zipf_cdf(S.N_HOSTS, S.ZIPF_S)
_HOST_NAMES = np.array([S.host_name(i) for i in range(S.N_HOSTS)], dtype=object)


def gen_batch(seq: np.ndarray, seed: int = 42) -> pa.Table:
    """Generate the pages rows for the given seq ids (vectorized)."""
    seq = np.asarray(seq, dtype=np.int64)
    n = len(seq)

    host_idx = np.searchsorted(_HOST_CDF, _u01(seq, 1, seed), side="right")
    host_idx = np.minimum(host_idx, S.N_HOSTS - 1)
    hosts = _HOST_NAMES[host_idx]

    lang_idx = _weighted_pick(_u01(seq, 2, seed), S.LANG_WEIGHTS)
    langs = np.array(S.LANGS, dtype=object)[lang_idx]

    app_idx = _h(seq, 3, seed) % np.uint64(len(S.APPS))
    apps = np.array(S.APPS, dtype=object)[app_idx.astype(np.int64)]

    sev = _weighted_pick(_u01(seq, 4, seed), S.SEV_WEIGHTS)
    status = np.array(S.STATUSES, dtype=np.int64)[
        (_h(seq, 5, seed) % np.uint64(len(S.STATUSES))).astype(np.int64)]
    nbytes = (_h(seq, 6, seed) % np.uint64(65536)).astype(np.int64) + 64

    ts_us = (
        BASE_TS_US
        + (seq * np.int64(7919)) % np.int64(SPAN_S) * np.int64(1_000_000)
        + (_h(seq, 7, seed) % np.uint64(1_000_000)).astype(np.int64)
    )
    # ISO string for the log line (UTC, us precision) — vectorized via np.datetime64
    ts_iso = np.datetime_as_string(ts_us.astype("datetime64[us]"), unit="us")
    ts_iso = np.char.add(ts_iso, "Z").astype(object)

    verb = _VERBS[(_h(seq, 8, seed) % np.uint64(len(_VERBS))).astype(np.int64)]
    obj = _OBJS[(_h(seq, 9, seed) % np.uint64(len(_OBJS))).astype(np.int64)]
    msg = verb + " " + obj + " id=" + seq.astype(str).astype(object)

    urls = (
        "https://" + hosts + "/p/"
        + (_h(seq, 10, seed) % np.uint64(997)).astype(np.int64).astype(str).astype(object)
        + "?id=" + seq.astype(str).astype(object)
    )

    text = (
        "ts=" + ts_iso + " host=" + hosts + " app=" + apps
        + " sev=" + sev.astype(str).astype(object)
        + " msg=\"" + msg + "\""
        + " status=" + status.astype(str).astype(object)
        + " bytes=" + nbytes.astype(str).astype(object)
    )
    # ~5% malformed: three shapes — truncated (no status/bytes), garbled
    # prefix, empty msg — to exercise the fallback rules.
    bad = _h(seq, 11, seed) % np.uint64(100)
    trunc_mask = bad < np.uint64(2)
    garble_mask = (bad >= np.uint64(2)) & (bad < np.uint64(4))
    empty_mask = bad == np.uint64(4)
    if trunc_mask.any():
        text[trunc_mask] = (
            "ts=" + ts_iso[trunc_mask] + " host=" + hosts[trunc_mask]
            + " app=" + apps[trunc_mask]
            + " sev=" + sev[trunc_mask].astype(str).astype(object)
            + " msg=\"" + msg[trunc_mask] + "\""
        )
    if garble_mask.any():
        text[garble_mask] = "?? corrupt frame " + msg[garble_mask]
    if empty_mask.any():
        text[empty_mask] = (
            "ts=" + ts_iso[empty_mask] + " host=" + hosts[empty_mask]
            + " app=" + apps[empty_mask]
            + " sev=" + sev[empty_mask].astype(str).astype(object)
            + " msg=\"\" status=" + status[empty_mask].astype(str).astype(object)
            + " bytes=" + nbytes[empty_mask].astype(str).astype(object)
        )

    # html: title + N filler paragraphs (~0.5-2 KiB), ~2% with invalid
    # UTF-8 + control bytes injected.
    npara = ((_h(seq, 12, seed) % np.uint64(6)) + np.uint64(2)).astype(np.int64)
    f1 = _FILLER[(_h(seq, 13, seed) % np.uint64(len(_FILLER))).astype(np.int64)]
    f2 = _FILLER[(_h(seq, 14, seed) % np.uint64(len(_FILLER))).astype(np.int64)]
    para = "<p>" + f1 + " " + f2 + " " + msg + " " + f1 + "</p>"
    # repeat each row's paragraph npara times (object-array multiply is
    # elementwise string repetition)
    body = para * npara
    pad = para * 8  # constant-ish padding to reach ~1 KiB
    html_str = (
        "<html><head><title>T" + seq.astype(str).astype(object)
        + " " + msg + "</title></head><body>" + body
        + "<div>" + pad + "</div></body></html>"
    )
    dirty = (_h(seq, 15, seed) % np.uint64(100)) < np.uint64(2)
    html_bytes = np.empty(n, dtype=object)
    html_bytes[:] = [s.encode("utf-8") for s in html_str]
    if dirty.any():
        for i in np.nonzero(dirty)[0]:
            b = html_bytes[i]
            # inject an invalid utf-8 byte and a control char mid-body
            cut = len(b) // 2
            html_bytes[i] = b[:cut] + b"\xff\x01\xfe" + b[cut:]

    shard = np.zeros(n, dtype=np.int32)  # caller overwrites with real shard id

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts_us, type=pa.timestamp("us")),
            "html": pa.array(list(html_bytes), type=pa.binary()),
            "text": pa.array(text, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "shard": pa.array(shard, type=pa.int32()),
        }
    )


def rows_for_sf(sf: float) -> int:
    return int(sf * 10_000_000)


def generate(out_dir: str, n_rows: int, seed: int = 42,
             rows_per_shard: int = 50_000, use_ray: bool = True) -> list[str]:
    """Write the pages table as one parquet file per shard.

    Shard files are the resumable-partition unit; each is generated
    independently (counter-based hashing) so generation itself is
    embarrassingly parallel via Ray tasks.
    Returns the list of shard file paths (existing files are reused —
    generation is idempotent per (seed, n_rows, rows_per_shard)).
    """
    os.makedirs(out_dir, exist_ok=True)
    n_shards = (n_rows + rows_per_shard - 1) // rows_per_shard
    paths, pending = [], []
    for s in range(n_shards):
        p = os.path.join(out_dir, f"pages-{s:05d}.parquet")
        paths.append(p)
        if not os.path.exists(p):
            pending.append((s, p))
    if not pending:
        return paths

    def _write(s: int, p: str) -> None:
        lo, hi = s * rows_per_shard, min((s + 1) * rows_per_shard, n_rows)
        t = gen_batch(np.arange(lo, hi, dtype=np.int64), seed=seed)
        t = t.set_column(t.schema.get_field_index("shard"), "shard",
                         pa.array(np.full(hi - lo, s, dtype=np.int32)))
        tmp = p + ".tmp"
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, p)

    if use_ray and len(pending) > 1:
        import ray

        @ray.remote(num_cpus=1)
        def _w(s: int, p: str) -> None:
            _write(s, p)

        ray.get([_w.remote(s, p) for s, p in pending])
    else:
        for s, p in pending:
            _write(s, p)
    return paths


def pages_dir(sf: float, root: str = "/tmp/rsyslog_ray_pages") -> str:
    return os.path.join(root, f"sf{sf}")


def ensure_pages(sf: float, seed: int = 42, use_ray: bool = True,
                 root: str = "/tmp/rsyslog_ray_pages") -> list[str]:
    """Generate (once) and return shard paths for scale factor sf."""
    n = rows_for_sf(sf)
    # small scales get several shards so partition/resume paths are exercised
    rps = 2_000 if n <= 20_000 else (10_000 if n <= 100_000 else 50_000)
    return generate(pages_dir(sf, root), n, seed=seed,
                    rows_per_shard=rps, use_ray=use_ray)
