"""Driver-facing query catalog: one entry per operator from SURVEY.md §2.

Each ``q_*`` function takes ``sf_dir`` (a /root/testdata/sfX directory)
and returns a Dataset / DataFrame / Table; ``SQL[name]`` holds the
equivalent DuckDB oracle.  Column names match the SQL aliases exactly
(the driver hash-compares values after sorting columns by name).

All implementations are Ray-Data-first: vectorized map_batches,
two-phase aggregation (combiner before shuffle), broadcast lookups —
never per-row Python in a hot path, never a driver-side row loop.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..functions import anon_ipv4_zero, field, num2ipv4, substring, toupper
from ..router import Route, Router
from ..stages.aggregate import two_phase_agg


def _read(sf_dir: str, table: str, columns=None, parallel: int = 0):
    """Column-pruned table read.  ``parallel``: minimum map parallelism
    for compute-heavy DOWNSTREAM map stages — the bench/gate tables are
    ONE file with ONE row group, which reads as one block and caps any
    downstream map at a single task (CLAUDE.md invariant 10).  The
    repartition fires ONLY when the parquet footer shows fewer row
    groups than requested; a real corpus (thousands of row groups /
    files) passes through untouched, so this never collapses
    at-scale parallelism and never adds a shuffle there.  Only for
    order-insensitive queries — repartition does not preserve row
    order."""
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    ds = ray.data.read_parquet(path, columns=columns)
    if parallel:
        import pyarrow.parquet as pq

        if pq.ParquetFile(path).metadata.num_row_groups < parallel:
            ds = ds.repartition(parallel)
    return ds


def _doc_count(sf_dir: str) -> int:
    """Row count of the documents table (footer-only read) — the ``n``
    of the planted deterministic link rule, shared by every consumer
    so rule and count can't drift apart."""
    import os

    import pyarrow.parquet as pq

    return int(pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows)


def _planted_edges(df: pd.DataFrame, n: int) -> pd.DataFrame:
    """The planted deterministic link rule i -> (7i+1)%n, (i+1)%n as
    (src, dst) rows — ONE definition for every graph query
    (q:hits_scores, q:triangle_count; q:link_graph and q:anchor_text
    exercise the same rule through the WARC fixture in
    pipelines/crawl.documents_to_warc).  The SQL_TAIL oracles restate
    it arithmetically; change it here and there together."""
    i = df["doc_id"].astype("int64").to_numpy()
    return pd.DataFrame({
        "src": np.concatenate([i, i]),
        "dst": np.concatenate([(i * 7 + 1) % n, (i + 1) % n])})


def _scratch(name: str, sf_dir: str) -> str:
    """Per-(query, sf, RUN) scratch dir, wiped on entry — repeated
    driver-gate/bench runs reuse ONE tree per run instead of leaking a
    mkdtemp-per-call copy of the data until /tmp fills.  Wiping (not
    reusing) also keeps composed pipelines' stage-resume from silently
    skipping work across bench runs.

    The run key (env ``GRAFT_RUN_ID``, else uid+pid) isolates CONCURRENT
    runs of the same query on the same sf dir (bench alongside the
    driver gate, two users on a shared box) — without it the second
    run's wipe-on-entry clobbers the first's in-flight bm25/pretrain
    stage files.  Dead runs' trees are reaped here: any sibling dir
    whose pid no longer exists is removed, so per-pid keys don't leak."""
    import shutil
    import tempfile

    run = os.environ.get("GRAFT_RUN_ID") or f"u{os.getuid()}p{os.getpid()}"
    root = os.path.join(tempfile.gettempdir(), "raylog_q", run)
    # reap trees left by exited processes (same-uid pid-keyed siblings)
    base = os.path.dirname(root)
    if os.path.isdir(base):
        for sib in os.listdir(base):
            m = sib.startswith(f"u{os.getuid()}p") and sib != os.path.basename(root)
            if m:
                try:
                    pid = int(sib.rsplit("p", 1)[1])
                    os.kill(pid, 0)
                except ProcessLookupError:
                    shutil.rmtree(os.path.join(base, sib),
                                  ignore_errors=True)
                except (ValueError, PermissionError):
                    pass
    d = os.path.join(root, f"{name}-{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


# ======================================================================
# Parse / per-record transforms (mm* analogs)
# ======================================================================

def q_parse_json(sf_dir):
    """mmjsonparse analog (plugins/mmjsonparse/mmjsonparse.c:210-254):
    parse the JSON props column, lift $!k, aggregate per event_type.
    Fast path: a vectorized regex lifts the scalar `"k": <int>` member
    (RE2 speed); rows the regex can't serve fall back to one
    json.loads — same values, no per-row Python on the common shape."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"], parallel=16)

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k"\s*:\s*(-?\d+)[,}\s]',
                                    expand=False), errors="coerce")
        miss = k.isna()
        if miss.any():
            k = k.copy()
            k[miss] = df["props"][miss].map(
                lambda s: json.loads(s).get("k"))
        return pd.DataFrame({"event_type": df["event_type"],
                             "k": k.astype("int64")})

    ds = ds.map_batches(parse, batch_format="pandas")
    return two_phase_agg(ds, ["event_type"], count="cnt", sums={"k": "sum_k"})


def q_fields_split(sf_dir):
    """mmfields analog (plugins/mmfields/mmfields.c:54-71): split text on
    the separator, take field 1, count per value — zero-copy Arrow
    (split_pattern + list_element)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["text"], parallel=16)

    def f1(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], " ")
        return pa.table({"f1": pc.list_element(parts, 0)})

    return two_phase_agg(ds.map_batches(f1, batch_format="pyarrow"), ["f1"])


def q_scalar_funcs(sf_dir):
    """String function library (grammar/rainerscript.c:4467-4510):
    toupper, strlen, substring, int2hex, wrap, base64 encode/decode
    roundtrip as computed columns."""
    from ..functions import b64_decode, b64_encode, int2hex, wrap

    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": df["c_custkey"],
            "uname": toupper(df["c_name"]),
            "name_len": df["c_name"].str.len().astype("int64"),
            "seg3": substring(df["c_mktsegment"], 0, 3),
            "hex_key": int2hex(df["c_custkey"]),
            "wseg": wrap(df["c_mktsegment"], '"'),
            "b64": b64_encode(df["c_name"]),
            "b64rt": b64_decode(b64_encode(df["c_name"])),
        })

    return ds.map_batches(fx, batch_format="pandas")


def q_regex_extract(sf_dir):
    """re_extract analog (grammar/rainerscript.c:1681): extract the
    numeric suffix of source, count per value."""
    ds = _read(sf_dir, "documents", columns=["source"], parallel=16)

    def ex(df: pd.DataFrame) -> pd.DataFrame:
        n = df["source"].str.extract(r"src(\d+)", expand=False)
        return pd.DataFrame({"src_num": pd.to_numeric(n).astype("int64")})

    return two_phase_agg(ds.map_batches(ex, batch_format="pandas"), ["src_num"])


def q_anon_modes(sf_dir):
    """mmanon, all three modes (plugins/mmanon/mmanon.c:59-166): IPv4
    zero (last octet), IPv6 zero (low 64 bits of full-form addresses),
    and consistent pseudonymization — the md5-derived stable map that
    replaces the reference's mutex-shared random dict (see
    ConsistentAnonymizer).  One vectorized pass produces all three."""
    from ..functions import anon_ipv6_zero
    from ..stages.transform import ConsistentAnonymizer

    an = ConsistentAnonymizer()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        ip = num2ipv4(df["user_id"] * 7919 % 4294967296)
        # decimal hextets are valid hex tokens — keeps construction
        # vectorized (no per-row hex formatting) and the oracle trivial
        h2 = (df["user_id"] % 9999).astype(str)
        h3 = (df["user_id"] * 3 % 9999).astype(str)
        ip6 = "2001:" + h2 + ":" + h3 + ":4:5:6:7:8"
        return pd.DataFrame({
            "event_id": df["event_id"],
            "ip_anon": anon_ipv4_zero("src=" + ip + " ok"),
            "ip6_anon": anon_ipv6_zero("v6=" + ip6 + " ok"),
            "ip_cons": an.anonymize("from=" + ip + " ok"),
        })

    return ds.map_batches(fx, batch_format="pandas")


# ======================================================================
# Filters (propfilt / prifilt, runtime/ruleset.c:424-501)
# ======================================================================

def q_filter_contains(sf_dir):
    """FIOP_CONTAINS (runtime/typedefs.h:170-180): docs containing
    'spark', counted per lang — Arrow match_substring, zero-copy."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["text", "lang"], parallel=16)
    ds = ds.map_batches(
        lambda t: t.filter(pc.match_substring(t["text"], "spark"))
        .select(["lang"]),
        batch_format="pyarrow")
    return two_phase_agg(ds, ["lang"])


def q_filter_rules(sf_dir):
    """FIOP_REGEX + prifilt in one ruleset pass (runtime/ruleset.c:403):
    each row is tagged by the first filter class it matches — an ERE on
    event_type (Arrow RE2 kernel) or the numeric priority band
    ('error' with low value).  ONE read serves both rules (the
    reference evaluates its filter chain per message, not per rule)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        rx = pc.match_substring_regex(t["event_type"],
                                      r"^(?:purchase|signup)$")
        pri = pc.and_(pc.equal(t["event_type"], "error"),
                      pc.less(t["value"], 10.0))
        keep = t.filter(pc.or_(rx, pri))
        rule = pc.if_else(
            pc.match_substring_regex(keep["event_type"],
                                     r"^(?:purchase|signup)$"),
            "regex", "prifilt")
        return pa.table({"event_id": keep["event_id"], "rule": rule})

    return ds.map_batches(tag, batch_format="pyarrow")


# ======================================================================
# Router (ruleset program, fan-out + stop — runtime/ruleset.c:536-594)
# ======================================================================

EVENT_ROUTES = [
    Route("errors", ("==", "event_type", "error"), stop=True),
    Route("big", (">=", "value", 50.0)),
    Route("commerce", ("in", "event_type", ["signup", "purchase"])),
    Route("archive", ("true",)),
]


def q_route_fanout(sf_dir):
    """Full router semantics over events: fan-out + stop; output =
    per-sink delivered-row counts (the action-queue delivery totals).
    Final reduce on the driver: |sinks| partial rows per batch —
    a distributed groupby here costs seconds of fixed overhead for a
    4-row result (CLAUDE.md invariant 3)."""
    router = Router(EVENT_ROUTES)
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        masks = router.masks(df)
        return pd.DataFrame({"sink": list(masks),
                             "cnt": [int(m.sum()) for m in masks.values()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (parts.groupby("sink", as_index=False)["cnt"].sum()
            .astype({"cnt": "int64"}))


# ======================================================================
# Aggregations (dynstats / sendertrack / percentiles, SURVEY.md §2.8)
# ======================================================================

def q_dynstats_kinds(sf_dir):
    """dyn_inc(bucket, key) analog (runtime/dynstats.c) — three named
    stats buckets in one result, the way impstats emits every bucket's
    counters together: per-lang doc counts, per-hour event counts, and
    a maxCardinality-capped per-sender bucket (dynstats.c:43-45 — track
    at most 100 sender keys, fold the rest into __rejected__).  The two
    event-keyed buckets share ONE read and ONE combiner pass (the
    reference resolves every dyn_inc against the same message)."""
    from ..stages.transform import capped_dynstats

    langs = two_phase_agg(
        _read(sf_dir, "documents", columns=["lang"]), ["lang"])
    ds = _read(sf_dir, "events", columns=["ts", "user_id"], parallel=16)

    def kk(df: pd.DataFrame) -> pd.DataFrame:
        hours = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        return pd.DataFrame({
            "kind": np.repeat(np.array(["hour", "sender"], dtype=object),
                              len(df)),
            "key": pd.concat([hours, "u" + df["user_id"].astype(str)],
                             ignore_index=True),
        })

    both = two_phase_agg(ds.map_batches(kk, batch_format="pandas"),
                         ["kind", "key"])
    hours = both[both["kind"] == "hour"].reset_index(drop=True)
    senders = (both[both["kind"] == "sender"][["key", "cnt"]]
               .reset_index(drop=True))
    capped = capped_dynstats(senders, "key", "cnt", max_cardinality=100)
    capped.insert(0, "kind", "sender")
    langs = langs.rename(columns={"lang": "key"})
    langs.insert(0, "kind", "lang")
    return pd.concat([langs, hours, capped], ignore_index=True)


def q_sendertrack(sf_dir):
    """omsendertrack analog (plugins/omsendertrack/omsendertrack.c:76-96):
    per-sender msg count + first/last seen."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"], parallel=16)
    return two_phase_agg(ds, ["user_id"], count="cnt",
                         mins={"ts": "first_seen"}, maxs={"ts": "last_seen"})


def q_percentiles(sf_dir):
    """perctile_stats analog (runtime/perctile_stats.c:54-55): exact
    p50/p95 of value per event_type, PLUS the reference's ring-buffer
    window semantics (p50 of the last `windowsize`=10 observations) —
    one shuffle, one map_groups pass for all three."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "event_id",
                                          "value"], parallel=16)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["value"].to_numpy(dtype=np.float64)
        last = (g.sort_values(["ts", "event_id"]).tail(10)["value"]
                .to_numpy(dtype=np.float64))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "p50": [round(float(np.percentile(vals, 50)), 6)],
            "p95": [round(float(np.percentile(vals, 95)), 6)],
            "p50_last10": [round(float(np.percentile(last, 50)), 6)],
        })

    return ds.groupby("event_type").map_groups(per_group,
                                               batch_format="pandas")


def q_mmcount(sf_dir):
    """mmcount analog (contrib/mmcount/mmcount.c:91-): total messages
    per event_type, counted via the salted two-phase pattern (partial
    count on (key, hash-salt), final sum on key — the skew-proof shape
    of SURVEY.md §7 M5; must equal a plain group count exactly)."""
    from ..stages.aggregate import salted_count

    ds = _read(sf_dir, "events", columns=["event_type"], parallel=16)
    return salted_count(ds, "event_type", salt_buckets=16, cnt="msg_count")


# ======================================================================
# Rate limiting / sampling / dedup (ratelimit.c, action throttles,
# pmlastmsg — SURVEY.md §2.8/2.9)
# ======================================================================

def q_ratelimit_burst(sf_dir):
    """ratelimit token-bucket analog (runtime/ratelimit.c:67-69 burst):
    keep the first 5 events per user (by ts, event_id) — batch
    semantics of 'burst within the whole interval'.  Partition-aligned:
    groupby(user_id) shuffles each key to one group."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def head5(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(["ts", "event_id"]).head(5)[["event_id", "user_id"]])

    return ds.groupby("user_id").map_groups(head5, batch_format="pandas")


def q_exec_throttles(sf_dir):
    """Both exec throttles in one driver row: execOnlyOnceEveryInterval
    (runtime/action.c:535-546 — first event per user per hour, mode
    'interval_first') and execOnlyEveryNthTime (action.c:370-385 —
    every 10th event by id, mode 'nth'; Arrow modulo-compare,
    zero-copy)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def first_per_hour(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g["__h"] = g["ts"].dt.floor("h")
        out = g.groupby("__h", as_index=False).head(1)[["event_id"]]
        return out.assign(mode="interval_first")[["mode", "event_id"]]

    interval = ds.groupby("user_id").map_groups(first_per_hour,
                                                batch_format="pandas")

    def nth(t: pa.Table) -> pa.Table:
        # x % 10 == 0 via x - (x // 10) * 10 (integer divide truncates)
        mod = pc.subtract(t["event_id"],
                          pc.multiply(pc.divide(t["event_id"], 10), 10))
        out = t.filter(pc.equal(mod, 0)).select(["event_id"])
        return out.add_column(0, "mode",
                              pa.array(["nth"] * len(out), pa.string()))

    sampled = (_read(sf_dir, "events", columns=["event_id"])
               .map_batches(nth, batch_format="pyarrow"))
    return interval.union(sampled)


def q_parse_time(sf_dir):
    """parse_time / is_time (grammar/rainerscript.c doFunct_ParseTime
    :2823, doFunc_is_time:2914; runtime/datetime.c ParseTIMESTAMP3339
    :282, ParseTIMESTAMP3164:440): render each event ts as RFC3339 and
    RFC3164 strings and parse them back; a garbage string yields 0/not-
    a-time.  RFC3164 carries no year — the estimateYear inference
    clock (rainerscript.c:2811) is pinned to 2026-08-17 UTC so the
    January event stamps resolve to 2026 on both engine and oracle."""
    from .. import functions as F

    ds = _read(sf_dir, "events", columns=["event_id", "ts"], parallel=16)
    now = pd.Timestamp("2026-08-17 00:00:00", tz="UTC")

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        s39 = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        s64 = df["ts"].dt.strftime("%b %d %H:%M:%S")
        bad = "no time " + df["event_id"].astype(str)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "ep_rfc3339": F.parse_time(s39, now=now),
            "ep_rfc3164": F.parse_time(s64, now=now),
            "ok_rfc3339": F.is_time(s39),
            "ok_rfc3164": F.is_time(s64, "date-rfc3164"),
            "ep_bad": F.parse_time(bad, now=now),
            "ok_bad": F.is_time(bad),
        })

    return ds.map_batches(fx, batch_format="pandas")


def q_dedup_exact(sf_dir):
    """Exact dedup (pmlastmsg/bRepMsgRed global analog + the training-
    data dedup op): hash-partition by content, keep min doc_id, count
    copies."""
    from ..stages.dedup import exact_dedup

    # group on the 128-bit content key (two independent 64-bit
    # siphashes), not the raw text: ray's sort-based groupby on long
    # string keys is ~10x slower, at 100 TB the shuffle would move full
    # documents, and a SINGLE 64-bit hash silently merges distinct docs
    # at the 10^12-doc birthday bound (see dedup.content_key128_frame)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds, "doc_id", "text")


def q_ratelimit_summary(sf_dir):
    """ratelimit 'begin to drop' summary records (runtime/ratelimit.c
    ratelimitMsg / tellLostCnt: when an interval closes over the limit
    the module emits ONE message reporting how many were discarded):
    per (user, hour) with more than burst=2 events, the drop count."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"],
                             "w": df["ts"].dt.floor("h")})

    counts = two_phase_agg(ds.map_batches(key, batch_format="pandas"),
                           ["user_id", "w"])
    over = counts[counts["cnt"] > 2].copy()
    over["dropped"] = (over["cnt"] - 2).astype("int64")
    return over[["user_id", "w", "dropped"]].reset_index(drop=True)


# ======================================================================
# Lookups / joins (lookup_table — runtime/lookup.c; SURVEY.md §2.7)
# ======================================================================

# ======================================================================
# Sort / top-k / distinct / union (free Dataset primitives, §2.9)
# ======================================================================

def q_topk_orders(sf_dir):
    """Top-10 orders by total price (deterministic tie-break on key)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, True]).limit(10)


def q_union_tagged(sf_dir):
    """omruleset/call re-injection analog (plugins/omruleset): two
    filtered routes unioned with a route tag."""
    ds1 = _read(sf_dir, "events", columns=["event_id", "event_type"])
    a = ds1.map_batches(
        lambda df: df[df["event_type"] == "error"].assign(route="errors"),
        batch_format="pandas")
    ds2 = _read(sf_dir, "events", columns=["event_id", "event_type"])
    b = ds2.map_batches(
        lambda df: df[df["event_type"] == "signup"].assign(route="signups"),
        batch_format="pandas")
    return a.union(b)


# ======================================================================
# Projection / templates (runtime/template.c tplToString analog)
# ======================================================================

def q_template_render(sf_dir):
    """Template rendering through the REAL template engine
    (template.py: %property% text syntax, tplToString semantics,
    template.c:863): constant+field concatenation with date options —
    the omfile line format as a computed column."""
    from ..functions import format_time
    from ..template import Template

    tpl = Template("order=%o_orderkey% status=%o_orderstatus%"
                   " date=%d% cents=%cents%")
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_orderdate",
                        "o_totalprice"], parallel=16)

    def render(df: pd.DataFrame) -> pd.DataFrame:
        aug = pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_orderstatus": df["o_orderstatus"],
            "d": format_time(df["o_orderdate"], "date"),
            "cents": (df["o_totalprice"] * 100).round().astype("int64"),
        })
        return pd.DataFrame({"o_orderkey": df["o_orderkey"],
                             "line": tpl.render(aug)})

    return ds.map_batches(render, batch_format="pandas")


# ======================================================================
# TPC-H-style wide aggregate (general groupby parity)
# ======================================================================

def q_lineitem_agg(sf_dir):
    """General grouped aggregate with combiner (statsobj flush analog):
    lineitem by (returnflag, linestatus)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        # integer cents avoid float-sum nondeterminism across plans
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "qty_c": (df["l_quantity"] * 100).round().astype("int64"),
        })

    return two_phase_agg(ds.map_batches(cents, batch_format="pandas"),
                         ["l_returnflag", "l_linestatus"],
                         count="cnt", sums={"qty_c": "sum_qty_cents"})


# ======================================================================
# Syslog-core parity: header parse roundtrip, SD parse, PRI decompose,
# property-replacer options, template formats, remaining lookup kinds,
# salted aggregation, windowed percentile
# ======================================================================

def q_syslog_roundtrip(sf_dir):
    """pmrfc5424 + PRI decompose (tools/pmrfc5424.c, parserParsePRI
    runtime/parser.c:575): render an RFC5424 line per event, parse it
    back through the SYSLOG_RULEBASE chain, decompose PRI.  The oracle
    computes the same fields directly — proving the render→parse cycle
    is lossless."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..rulebase import SYSLOG_RULEBASE, pri_decompose

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type", "value"], parallel=16)

    def roundtrip(df: pd.DataFrame) -> pd.DataFrame:
        pri = (df["event_id"] % 192).astype("int64")
        line = ("<" + pri.astype(str) + ">1 "
                + df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
                + " host" + (df["user_id"] % 50).astype(str)
                + " app-" + df["event_type"]
                + " " + df["event_id"].astype(str)
                + " ID" + (df["event_id"] % 97).astype(str)
                + " [meta seq=\"" + df["event_id"].astype(str) + "\"]"
                + " value=" + df["value"].round(3).astype(str))
        parsed = SYSLOG_RULEBASE.parse_table(pa.array(line, pa.string()))
        sev, fac = pri_decompose(parsed["pri"])
        return pd.DataFrame({
            "event_id": pc.cast(parsed["procid"], pa.int64()).to_pandas(),
            "severity": sev.to_pandas(),
            "facility": fac.to_pandas(),
            "hostname": parsed["hostname"].to_pandas(),
            "app_name": parsed["app_name"].to_pandas(),
            "ts": parsed["ts5424"].to_pandas(),
            "parse_ok": parsed["parse_ok"].to_pandas(),
        })

    return ds.map_batches(roundtrip, batch_format="pandas")


def q_mmpstrucdata(sf_dir):
    """mmpstrucdata analog (plugins/mmpstrucdata/mmpstrucdata.c): parse
    RFC5424 STRUCTURED-DATA params out of a rendered SD string."""
    from ..functions import sd_param

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        sd = ('[evt@1 seq="' + df["event_id"].astype(str)
              + '" type="' + df["event_type"] + '"]')
        return pd.DataFrame({
            "event_id": df["event_id"],
            "sd_seq": pd.to_numeric(sd_param(sd, "seq")).astype("int64"),
            "sd_type": sd_param(sd, "type"),
        })

    return ds.map_batches(fx, batch_format="pandas")


def q_lookup_kinds(sf_dir):
    """ALL FOUR lookup-table kinds in ONE pass (runtime/lookup.c:
    string :400-416 bsearch exact match with stub, regex :486- ordered
    first-matching list, array :418-435 dense uint index with
    out-of-range -> stub, sparseArray :437-485 greatest bound <= key)
    — the reference resolves every lookup() in a rule against the same
    message, so one read serves all four.  The string table is
    FILE-LOADED (region.parquet) and broadcast once via ray.put — one
    object-store fetch per worker, the batch analog of the reference's
    process-global table behind a rwlock."""
    import pyarrow.parquet as pq
    import ray

    from ..lookup import LookupTable

    r = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    ref = ray.put(LookupTable(
        "string", dict(zip(r["r_regionkey"].astype(int), r["r_name"])),
        stub=""))
    table_re = LookupTable("regex", [(r"^purch", "buy"), (r"^sign", "join"),
                                     (r"err", "bad")], stub="other")
    table_arr = LookupTable("array", ["zero", "one", "two", "three", "four",
                                      "five"], stub="??")
    bounds = LookupTable("sparseArray", {0: "low", 50: "mid", 200: "high"},
                         stub="neg")
    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "user_id", "value"], parallel=16)

    class Fx:
        def __init__(self, ref):
            self.ref = ref
            self._t = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self._t is None:  # one object-store fetch per worker
                self._t = ray.get(self.ref)
            return pd.DataFrame({
                "event_id": df["event_id"],
                "region": self._t.lookup_series(df["user_id"] % 5),
                "klass": table_re.lookup_series(df["event_type"]),
                "slot": table_arr.lookup_series(df["user_id"] % 8),
                "band": bounds.lookup_series(
                    np.floor(df["value"]).astype("int64")),
            })

    return ds.map_batches(Fx(ref), batch_format="pandas")


def q_net_funcs(sf_dir):
    """Net + URL function library: num2ipv4/ipv42num roundtrip, REAL
    CIDR is_in_subnet (octet-aligned /8 and the non-aligned /12,
    rainerscript.c:4505), and the full ffaup URL decomposition
    (contrib/ffaup/ffaup.c:306-315) — the oracle rebuilds every part
    from the raw components, so the regex decompose is genuinely
    checked."""
    from ..functions import faup_decompose, ipv42num, is_in_subnet, num2ipv4

    ds = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        n = (df["user_id"] * 2654435761 + 167772160) % 4294967296
        ip = num2ipv4(n)
        back = ipv42num(ip).astype("int64")
        tld = df["user_id"].mod(3).map({0: "com", 1: "org", 2: "net"})
        url = ("https://u" + df["user_id"].astype(str) + ".example." + tld
               + ":8080/p/" + df["event_id"].astype(str)
               + "?q=" + df["event_type"])
        u = faup_decompose(url)
        return pd.DataFrame({
            "event_id": df["event_id"], "ip": ip, "ip_num": back,
            "in_net10": is_in_subnet(ip, "10.0.0.0/8").astype("int64"),
            "in_net172": is_in_subnet(ip, "172.16.0.0/12").astype("int64"),
            "u_scheme": u["scheme"], "u_sub": u["subdomain"],
            "u_domain": u["domain"], "u_tld": u["tld"],
            "u_port": u["port"], "u_path": u["resource_path"],
            "u_query": u["query_string"],
        })

    return ds.map_batches(fx, batch_format="pandas")


def q_property_replacer(sf_dir):
    """Property-replacer options (runtime/template.h:125-146, applied
    in runtime/msg.c:4350-4650): substring, case conversion,
    field-by-delimiter, regex-select with match# / submatch# and every
    no-match policy, end-relative substring, fixed width, the
    control-char options (drop/space/escape) and space compression."""
    from ..functions import (compress_sp, drop_cc, escape_cc, field,
                             fixed_width, re_select, space_cc,
                             substring, substring_end, toupper)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        cc_in = df["source"] + "\ta  b"   # inject a CC + space run
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "sub8": substring(df["text"], 0, 8),
            "up_src": toupper(df["source"]),
            "field3": field(df["text"], " ", 3),
            "re_sel": re_select(df["text"], r"\b(\w*ar\w*)\b",
                                0, 1, "blank"),
            "re_m2": re_select(df["text"], r"\b(\w*ar\w*)\b",
                               1, 1, "blank"),
            "re_miss": re_select(df["source"], r"(zz[0-9]+)",
                                 0, 1, "field"),
            "re_zero": re_select(df["source"], r"(qq)", 0, 1, "zero"),
            "sub_end4": substring_end(df["text"], 8, 4),
            "fixw": fixed_width(df["source"], 10),
            "cc_drop": drop_cc(cc_in),
            "cc_space": space_cc(cc_in),
            "cc_esc": escape_cc(cc_in),
            "sp_comp": compress_sp(space_cc(cc_in)),
        })

    return ds.map_batches(fx, batch_format="pandas")


def q_template_formats(sf_dir):
    """Sink-format template options in one pass: tplToJSON
    (runtime/template.c:1027, byte-identical to DuckDB's to_json),
    RFC4180 CSV (template.h:150-154; props contains quotes so the
    escaping path is exercised), stdSQL escaping (template.c:947-951
    doSQLEscape, quote doubling), and CEF (tocef/cef_ext_escape,
    rainerscript.c:3324-3412: header, eventclassid and extension
    escaping)."""
    from ..functions import (cef_ext_escape, csv_escape,
                             json_string_escape, sql_escape, tocef)

    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "props"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        j = ('{"id":' + df["event_id"].astype(str)
             + ',"et":"' + json_string_escape(df["event_type"]) + '"}')
        line = df["event_id"].astype(str) + "," + csv_escape(df["props"])
        sqlq = "VALUES('" + sql_escape(df["props"]) + "')"
        cef = tocef("0", "raylog", "engine", "1.0", df["event_type"],
                    df["props"], "5", "src=" + cef_ext_escape(df["props"]))
        return pd.DataFrame({"event_id": df["event_id"], "j": j,
                             "line": line, "sqlq": sqlq, "cef": cef})

    return ds.map_batches(fx, batch_format="pandas")


def q_format_time(sf_dir):
    """ALL 22 reference template date formats (template.h:72-95
    tplFmt*, rendering per msg.c:1639-1736 / datetime.c:777-1000),
    rendered as one vectorized pass; the TZ formats are the UTC
    constants because the data is tz-naive."""
    from ..functions import format_time

    ds = _read(sf_dir, "events", columns=["event_id", "ts"], parallel=16)

    FMTS = ["rfc3339", "mysql", "pgsql", "rfc3164", "rfc3164-buggyday",
            "unixtimestamp", "secfrac", "wdayname", "wday", "year",
            "month", "day", "hour", "minute", "second", "ordinal",
            "week", "isoweek", "isoweekyear", "tzoffshour", "tzoffsmin",
            "tzoffsdirection"]

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        out = {"event_id": df["event_id"]}
        for f in FMTS:
            out["t_" + f.replace("-", "_")] = format_time(df["ts"], f)
        return pd.DataFrame(out)

    return ds.map_batches(fx, batch_format="pandas")


# ======================================================================
# Joins (beyond the reference) + windowed/streaming shapes
# ======================================================================

def q_multi_join(sf_dir):
    """Join composition (TPC-H-q5 shape): lineitem ⋈ supplier ⋈ nation
    ⋈ region — three broadcast dimension hops chained in ONE map stage
    (a star join never needs a shuffle when the dimensions are small)."""
    import pyarrow.parquet as pq
    import ray

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    dim = (supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
           .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
           [["s_suppkey", "n_name", "r_name"]]
           .rename(columns={"s_suppkey": "l_suppkey"}))
    ref = ray.put(dim)

    class J:
        def __init__(self):
            self._d = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self._d is None:
                self._d = ray.get(ref)
            m = df.merge(self._d, on="l_suppkey", how="inner")
            # half-away-from-zero like DuckDB round() — pandas .round()
            # is half-even, and the 4-decimal discount product DOES hit
            # exact half-cents (values are positive here)
            rev = (m["l_extendedprice"] * (1 - m["l_discount"]) * 100).to_numpy()
            return pd.DataFrame({
                "r_name": m["r_name"],
                "n_name": m["n_name"],
                "rev_c": np.floor(rev + 0.5).astype("int64"),
            })

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    return two_phase_agg(ds.map_batches(J(), batch_format="pandas"),
                         ["r_name", "n_name"], count="cnt",
                         sums={"rev_c": "revenue_cents"})


def q_group_topk(sf_dir):
    """Top-2 users by event count per event_type (grouped top-k).
    group_topk is adaptive: driver-side exact top-k below its partial
    threshold, distributed keyed map_groups above it (pytest exercises
    the distributed path at inflated cardinality)."""
    from ..stages.aggregate import group_topk

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return group_topk(ds, "event_type", "user_id", k=2, cnt="n")


def q_explode_words(sf_dir):
    """S_FOREACH / flat_map analog (runtime/ruleset.c:377-402 iterates
    JSON arrays per message): explode documents into words, count per
    word, top... full counts for the 30-word vocabulary."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].str.split().explode()
        return pd.DataFrame({"word": s[s.notna()]})

    return two_phase_agg(ds.map_batches(explode, batch_format="pandas"),
                         ["word"])


def q_distinct_pairs(sf_dir):
    """Multi-column distinct + exact distinct-count per key in ONE
    pass (merged count_distinct): each distinct (user_id, event_type)
    pair carries its type's exact distinct-sender count.  distinct_rows
    is adaptive — driver drop_duplicates below its partial threshold,
    hash-partitioned distributed dedup above it; the per-type counts
    come from the distinct result itself (a tiny keyed aggregate,
    broadcast back when the distinct stayed distributed)."""
    from ..stages.sketch import distinct_rows

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    pairs = distinct_rows(ds, ["user_id", "event_type"])
    if isinstance(pairs, pd.DataFrame):
        out = pairs.copy()
        out["distinct_cnt"] = (out.groupby("event_type")["user_id"]
                               .transform("size").astype("int64"))
        return out
    import ray

    cnts = two_phase_agg(pairs, ["event_type"], count="distinct_cnt")
    ref = ray.put(cnts)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on="event_type")

    return pairs.map_batches(attach, batch_format="pandas")


def q_epoch_shuffle(sf_dir):
    """Deterministic epoch shuffle: key = md5('{seed}:{id}'), then a
    range-partitioned distributed sort on the key — the reproducible,
    coordination-free global training-data shuffle (the key IS the
    permutation position; sortedness is pinned in test_text_ops)."""
    from ..stages.text import epoch_shuffle

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return epoch_shuffle(ds, seed=7)


def q_approx_distinct(sf_dir):
    """HyperLogLog approximate distinct urls... user_ids: mergeable
    per-batch sketches (4 KiB each over the wire, any cardinality).
    Rows-only driver check; the error bound vs exact is pinned in
    pytest."""
    from ..stages.sketch import approx_distinct

    ds = _read(sf_dir, "events", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pd.DataFrame({"metric": ["approx_distinct_users"],
                         "estimate": [int(round(est))]})


def q_join_topk(sf_dir):
    """Composite showcase (TPC-H-q3-ish): orders ⋈ customer, revenue
    per segment, exact ordering.  Customer is the DIMENSION side (150k
    rows at sf1) — broadcast it instead of shuffling both sides (the
    both-sides-large shuffle join stays demonstrated by q_hash_join)."""
    import pyarrow.parquet as pq

    from ..stages.join import broadcast_join

    cust = (pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_mktsegment"]).to_pandas()
            .rename(columns={"c_custkey": "o_custkey"}))
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, on="o_custkey", how="inner")

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": df["c_mktsegment"],
            "price_c": (df["o_totalprice"] * 100).round().astype("int64")})

    agg = two_phase_agg(joined.map_batches(cents, batch_format="pandas"),
                        ["c_mktsegment"], count="orders",
                        sums={"price_c": "revenue_cents"})
    return agg.sort_values("revenue_cents", ascending=False).reset_index(drop=True)


def q_hash_join(sf_dir):
    """Partitioned hash join, both sides large (ONE shuffle; bucket =
    hash(key) % B — the pattern the reference never needed but a
    complete engine does): orders ⋈ customer."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "custkey"}),
        batch_format="pandas")
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust = cust.map_batches(
        lambda df: df.rename(columns={"c_custkey": "custkey"}),
        batch_format="pandas")
    return hash_join(orders, cust, on="custkey", how="inner")


def q_broadcast_join(sf_dir):
    """Broadcast join (small dimension side via ray.put): lineitem ⋈
    supplier, aggregated per supplier."""
    import pyarrow.parquet as pq

    from ..stages.join import broadcast_join

    supp = (pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"]).to_pandas()
            .rename(columns={"s_suppkey": "l_suppkey"}))
    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_quantity"])
    joined = broadcast_join(li, supp, on="l_suppkey", how="inner")

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "s_name": df["s_name"],
            "qty_c": (df["l_quantity"] * 100).round().astype("int64"),
        })

    return two_phase_agg(joined.map_batches(cents, batch_format="pandas"),
                         ["s_name"], count="cnt", sums={"qty_c": "sum_qty_cents"})


def q_asof_join(sf_dir):
    """As-of join (sparseArray range-lookup generalized, SURVEY §2.7):
    for each purchase, the user's most recent signup at or before it."""
    from ..stages.join import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])
    purchases = ev.map_batches(
        lambda df: df[df["event_type"] == "purchase"]
        [["event_id", "user_id", "ts"]], batch_format="pandas")
    ev2 = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    signups = ev2.map_batches(
        lambda df: df[df["event_type"] == "signup"]
        .assign(last_signup=lambda x: x["ts"])[["user_id", "ts", "last_signup"]],
        batch_format="pandas")
    out = asof_join(purchases, signups, key="user_id", ts="ts",
                    right_cols=["last_signup"])
    return out.select_columns(["event_id", "user_id", "last_signup"])


def q_range_join(sf_dir):
    """Time-range (interval) join (stages/join.range_join — the
    one-to-many generalization of asof_join): every (purchase, click)
    pair for the same user with the click in the 30 minutes up to and
    including the purchase.  Key-bucket co-partition, one groupby,
    contiguous-slice pairing inside each bucket."""
    from ..stages.join import range_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])
    purchases = ev.map_batches(
        lambda df: df[df["event_type"] == "purchase"]
        .rename(columns={"event_id": "purchase_id"})
        [["purchase_id", "user_id", "ts"]], batch_format="pandas")
    ev2 = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                           "event_type"])
    clicks = ev2.map_batches(
        lambda df: df[df["event_type"] == "click"]
        .rename(columns={"event_id": "click_id"})
        [["user_id", "ts", "click_id"]], batch_format="pandas")
    out = range_join(purchases, clicks, key="user_id", ts="ts",
                     right_cols=["click_id"], lookback_s=1800)
    return out.select_columns(["purchase_id", "user_id", "click_id"])


def q_session_windows(sf_dir):
    """Session windows (streaming-shape operator, ray_guide streaming
    section): per user, a >12h gap starts a new session; output session
    ordinal + event count."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds() > 12 * 3600
        sid = gap.cumsum() + 1
        out = (g.groupby(sid).agg(session_start=("ts", "min"),
                                  n_events=("ts", "size"))
               .reset_index(drop=True))
        out.insert(0, "session", np.arange(1, len(out) + 1, dtype="int64"))
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


# ======================================================================
# Transform extras: json reshape, consistent anon, hmac, capped
# dynstats, token-bucket ratelimit
# ======================================================================

def q_json_transform(sf_dir):
    """mmjsontransform, both directions in one pass
    (mmjsontransform.c:63-71): nested JSON -> dotted keys (flat) and
    dotted keys -> nested, rendered canonically (sorted keys,
    compact)."""
    from ..stages.transform import (flatten_json_series,
                                    unflatten_json_series)

    ds = _read(sf_dir, "events", columns=["event_id", "props"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].map(lambda s: json.loads(s)["k"])
        nested_in = ('{"a":{"k":' + k.astype(str) + '},"b":1}')
        flat_in = ('{"a.k":' + k.astype(str) + ',"b":1}')
        return pd.DataFrame({"event_id": df["event_id"],
                             "flat": flatten_json_series(nested_in),
                             "nested": unflatten_json_series(flat_in)})

    return ds.map_batches(fx, batch_format="pandas")


def q_hmac_sd(sf_dir):
    """mmrfc5424addhmac analog: keyed digest column per record, spec'd
    as sha256(key || payload) so the DuckDB oracle is exact (core
    sha256; true RFC2104 HMAC stays available as hmac_column)."""
    from ..stages.transform import keyed_digest

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        payload = df["event_id"].astype(str) + "|" + df["event_type"]
        return pd.DataFrame({"event_id": df["event_id"],
                             "hmac": keyed_digest(payload, key="k")})

    return ds.map_batches(fx, batch_format="pandas")


def q_ratelimit_bucket(sf_dir):
    """Token-bucket ratelimit, reference semantics (interval+burst,
    runtime/ratelimit.c): <=3 events per user per 6-hour window, windows
    opening at the first event. Rows-only driver check (variable window
    boundaries are not reasonably SQL-expressible); pytest pins a
    hand-computed case."""
    from ..stages.ratelimit import ratelimit

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    kept = ratelimit(ds, "user_id", "ts", interval_s=6 * 3600, burst=3,
                     order_cols=["event_id"])
    return kept.select_columns(["event_id", "user_id"])


# ======================================================================
# Training-data operators: dedup / text analysis / similarity / media
# (first-class components per the build brief; near-dup + ANN entries
# without exact SQL equivalents are registered WITHOUT an oracle —
# the driver records a rows-only check and pytest carries the
# brute-force-oracle comparison: tests/test_dedup_text.py)
# ======================================================================

def q_dedup_wordset(sf_dir):
    """Near-dup by word SET (order/multiplicity-insensitive): one keeper
    per distinct vocabulary — the simplest content-normalizing dedup."""
    from ..stages.dedup import content_key128_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def key(df: pd.DataFrame) -> pd.DataFrame:
        # vocabulary key per row via explode + C-level dedup/sort/regroup
        # (no per-row Python lambda), then the 128-bit content key
        e = df["text"].str.split().explode().dropna()
        f = (pd.DataFrame({"i": e.index, "w": e.to_numpy()})
             .drop_duplicates().sort_values(["i", "w"]))
        k = (f.groupby("i")["w"].agg(" ".join)
             .reindex(df.index, fill_value=""))
        a, b = content_key128_frame(k)
        return pd.DataFrame({"doc_id": df["doc_id"], "kh": a, "kh2": b})

    return two_phase_agg(ds.map_batches(key, batch_format="pandas"),
                         ["kh", "kh2"], count="copies",
                         mins={"doc_id": "keeper_id"})[
        ["keeper_id", "copies"]]


def q_dedup_minhash(sf_dir):
    """MinHash(64) + LSH(16x4) near-dup pairs, exact-Jaccard verified
    (>= 0.8).  Oracle: DuckDB computes the exact 3-gram-shingle
    Jaccard over all pairs — at 16 bands a J>=0.8 pair collides with
    prob ~0.9998, and on this deterministic data every qualifying pair
    does (pytest pins engine == brute-force oracle including banding)."""
    from ..stages.dedup import minhash_lsh_pairs

    # single-file table -> few blocks; split so signature computation
    # parallelizes (at real scale the input is already many-block)
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).repartition(32)
    return minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8)


def q_dedup_clusters(sf_dir):
    """Near-dup CLUSTERS: MinHash/LSH pairs -> distributed connected
    components (alternating min-label propagation; shuffles move int
    triples only) -> each clustered doc labeled with the min doc_id
    reachable from it.  Pairs alone under-dedup transitive chains
    (a~b, b~c with no a~c edge); real pipelines keep one doc per
    component.  Oracle: DuckDB recursive CTE over the exact-Jaccard
    pair set."""
    from ..stages.dedup import connected_components, minhash_lsh_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).repartition(32)
    pairs = minhash_lsh_pairs(ds, "doc_id", "text", threshold=0.8,
                              as_dataset=True)
    comp = connected_components(pairs, npart=16)

    def out(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["node"], "cluster": df["cluster"]})

    return comp.map_batches(out, batch_format="pandas")


def q_dedup_simhash(sf_dir):
    """SimHash64 pairs with Hamming <= 3 via 4x16-bit chunk banding
    (pigeonhole-complete).  Rows-only driver check (the 64-bit
    feature-hash fold has no SQL restatement); pair completeness vs a
    brute-force Hamming scan and the planted near-dup recall are
    pinned in tests/test_dedup_text.py."""
    from ..stages.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).repartition(32)
    return simhash_pairs(ds, "doc_id", "text", max_hamming=3,
                         as_dataset=True)


def q_decontaminate(sf_dir):
    """Benchmark decontamination (GPT-3-style 13-gram overlap; the
    standard eval-leak filter in public CC pipelines): flag documents
    sharing any word 13-gram with a 'benchmark' set — here, slices of
    three corpus documents, so hits are deterministic and non-empty.
    Broadcast benchmark hash set, one corpus pass, no shuffle.
    Rows-only driver check; brute-force string oracle in pytest."""
    import pyarrow.parquet as pq

    from ..stages.text import contamination_flags

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    bench = [" ".join(t.split()[2:20])
             for t in docs["text"].iloc[[1, 7, 13]]]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)
    return contamination_flags(ds, bench, n=13)


def q_text_repetition(sf_dir):
    """Gopher-style repetition quality signals (duplicate n-gram
    occurrence fractions + top-2-gram character coverage, integer
    parts-per-10000).  Rows-only; per-row oracle in pytest."""
    from ..stages.text import repetition_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        out = repetition_frame(df["text"])
        out.insert(0, "doc_id", df["doc_id"])
        return out

    return ds.map_batches(fx, batch_format="pandas")


def q_text_quality(sf_dir):
    """Quality + token features per doc (integer-valued, oracle-
    checkable): token count, stopword count, longest token, BPE-ish
    regex token count."""
    from ..stages.text import quality_frame, token_counts_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_frame(df)
        q["bpe_tokens"] = token_counts_frame(df["text"])["bpe_tokens"]
        q.insert(0, "doc_id", df["doc_id"])
        return q

    return ds.map_batches(fx, batch_format="pandas")


def q_pii_redact(sf_dir):
    """PII scrub over documents (mmanon generalized — mmanon.c rewrites
    in place the same way): email/SSN/phone/IPv4 -> class tokens, RE2
    chain, zero-copy Arrow.  The synthetic corpus carries no PII, so
    each row is augmented with a deterministic PII suffix built from
    its own columns — construction and redaction both mirrored exactly
    in the DuckDB oracle (same RE2 engine, same rule order)."""
    import pyarrow as pa

    from ..stages.text import pii_redact_array

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)

    def red(df: pd.DataFrame) -> pd.DataFrame:
        sid = df["doc_id"].astype(str)
        aug = (df["text"] + " contact user" + sid + "@example.com or 10."
               + (df["doc_id"] % 256).astype(str)
               + ".3.7 ssn 123-45-6789 tel 555-123-4567")
        out = pii_redact_array(pa.array(aug, pa.string()))
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "red": out.to_pandas()})

    return ds.map_batches(red, batch_format="pandas")


MIX_WEIGHTS = {  # per-source sampling rates (the corpus "data mixture")
    **{f"src{i}": 1.0 for i in range(5)},
    **{f"src{i}": 0.5 for i in range(5, 10)},
}
MIX_DEFAULT = 0.2


def q_mix_sample(sf_dir):
    """Deterministic source mixing: keep each doc iff the first 32 md5
    bits of its id fall under its source's sampling weight — exact,
    coordination-free, resumable membership (no RNG state, no shuffle);
    the DuckDB oracle reproduces the md5 threshold bit-for-bit."""
    from ..stages.text import mix_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return mix_sample(ds, MIX_WEIGHTS, default=MIX_DEFAULT)


def q_stratified_sample(sf_dir):
    """Deterministic stratified sampling: a fixed per-language quota
    (the 20 docs with the smallest md5 sampling key per lang) — the
    per-group-quota half of mixture building (mix_sample is the
    per-group-rate half).  Two-phase local-head combiner; the DuckDB
    window-function oracle reproduces the md5 order bit-for-bit."""
    from ..stages.text import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(ds, group_col="lang", id_col="doc_id",
                             n=20, seed=0)


BM25_QUERIES = {  # fixed query set over the corpus vocabulary
    "q1": "fast hash join",
    "q2": "sort merge window",
    "q3": "stream batch dup slow",
}


def q_bm25_search(sf_dir):
    """BM25 full-text relevance search (stages/search.py): top-10 docs
    per query, integer micro-unit scores summed per term so the
    distributed sum is order-independent — the engine, the pure-Python
    spec (pytest) and the DuckDB oracle agree bit-for-bit."""
    from ..stages.search import bm25_search

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)
    return bm25_search(ds, "doc_id", "text", BM25_QUERIES, k=10)


def q_chunk_documents(sf_dir):
    """Retrieval-corpus chunking (stages/text.chunk_documents): split
    every document into overlapping 24-token windows (8-token overlap)
    — doc -> passage rows for embedding/indexing.  Embarrassingly
    parallel flat_map, deterministic (doc_id, chunk_seq) ids.
    Rows-only driver check; windowing spec pinned in
    tests/test_search.py."""
    from ..stages.text import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)
    return chunk_documents(ds, chunk_tokens=24, overlap=8)


def q_bm25_index(sf_dir):
    """Persisted inverted index + pruned-read BM25 (stages/search.py
    build_inverted_index / bm25_query_index): index the corpus ONCE
    into term-hash-partitioned postings parquet, then answer the same
    query set reading only the partitions the query terms land in.
    Rows-only driver check; equality to q:bm25_search (and therefore
    to its DuckDB oracle) is pinned in tests/test_search.py."""
    from ..stages.search import bm25_query_index, build_inverted_index

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], parallel=16)
    idx = _scratch("bm25_idx", sf_dir)
    build_inverted_index(ds, "doc_id", "text", idx, npart=16)
    out = bm25_query_index(idx, BM25_QUERIES, k=10)
    return out.rename(columns={"id": "doc_id"})


def q_incremental_dedup(sf_dir):
    """Cross-RUN incremental dedup (stages/dedup.incremental_dedup):
    treat src0-4 documents as the already-curated corpus (its 128-bit
    key set persisted to parquet by write_corpus_keys), then ingest the
    rest of the table plus planted copies of corpus docs — copies and
    in-batch duplicates drop via a hash-partitioned distributed
    anti-join; no driver-held key set, corpus text never re-read.
    Rows-only driver check; pure-Python spec pinned in
    tests/test_dedup_text.py."""
    import ray.data

    from ..stages.dedup import incremental_dedup, write_corpus_keys

    old_srcs = [f"src{i}" for i in range(5)]

    corpus = _read(sf_dir, "documents", columns=["source", "text"])
    corpus = corpus.map_batches(
        lambda df: df[df["source"].isin(old_srcs)][["text"]],
        batch_format="pandas")
    keys_dir = os.path.join(_scratch("incremental_dedup", sf_dir), "keys")
    write_corpus_keys(corpus, "text", keys_dir)

    def new_batch(df: pd.DataFrame) -> pd.DataFrame:
        fresh = df[~df["source"].isin(old_srcs)][["doc_id", "text"]]
        # plant exact copies of corpus docs into the new ingest
        copies = df[df["source"].isin(old_srcs) & (df["doc_id"] % 10 == 0)]
        copies = copies[["doc_id", "text"]].assign(
            doc_id=copies["doc_id"] + 1_000_000)
        return pd.concat([fresh, copies], ignore_index=True)

    new_ds = (_read(sf_dir, "documents", columns=["doc_id", "source", "text"])
              .map_batches(new_batch, batch_format="pandas"))
    out = incremental_dedup(new_ds, "doc_id", "text", keys_dir, npart=16)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q_text_langid(sf_dir):
    """Language-ID heuristic (stopword profiles) counted per predicted
    lang. Deterministic; rows-only driver check (profile scoring is not
    reasonably SQL-expressible)."""
    from ..stages.text import lang_id_frame

    ds = _read(sf_dir, "documents", columns=["text"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"pred_lang": lang_id_frame(df["text"])})

    return two_phase_agg(ds.map_batches(fx, batch_format="pandas"),
                         ["pred_lang"])


def q_text_langid_full(sf_dir):
    """Full language-ID (stages/text.lang_id_full_frame): Unicode-
    script char-class pass (9 script languages, han/kana ja-zh
    disambiguation) then 9-language Latin stopword profiles — counts
    per predicted lang.  Rows-only driver check (script ranges are
    not reasonably SQL-expressible); the 18-language planted fixture
    in t:test_dedup_text is the oracle."""
    from ..stages.text import lang_id_full_frame

    ds = _read(sf_dir, "documents", columns=["text"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"pred_lang": lang_id_full_frame(df["text"])})

    return two_phase_agg(ds.map_batches(fx, batch_format="pandas"),
                         ["pred_lang"])


def q_charset_sniff(sf_dir):
    """Charset sniff/decode (stages/text.sniff_decode_frame): each
    document's text encoded by doc_id%4 into utf-8 / utf-16(BOM-LE) /
    cp1252 / utf-8-sig payload bytes, sniffed back, counted per
    detected charset.  The corpus is ASCII, so class-2 cp1252 bytes
    legitimately sniff as utf-8 — the oracle pins that documented
    ambiguity rule.  Every decode must round-trip the text exactly
    (asserted in-stage).  DuckDB CASE oracle in SQL_TAIL."""
    from ..stages.text import sniff_decode_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        codecs = {0: "utf-8", 1: "utf-16", 2: "cp1252", 3: "utf-8-sig"}
        raw = [t.encode(codecs[int(i) % 4])
               for i, t in zip(df["doc_id"], df["text"])]
        out = sniff_decode_frame(pd.Series(raw, index=df.index))
        assert (out["text"] == df["text"]).all()
        return pd.DataFrame({"charset": out["charset"]})

    return two_phase_agg(ds.map_batches(fx, batch_format="pandas"),
                         ["charset"])


def q_text_fingerprint(sf_dir):
    """Winnowing fingerprints (rolling-hash min-per-window) per doc.
    Rows-only driver check; determinism pinned in pytest."""
    from ..stages.text import fingerprint_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        f = fingerprint_frame(df["text"])
        f.insert(0, "doc_id", df["doc_id"])
        f["min_fp"] = f["min_fp"].astype("int64")  # driver-friendly dtype
        return f

    return ds.map_batches(fx, batch_format="pandas")


def q_knn_bruteforce(sf_dir):
    """Exact top-5 cosine neighbors of the first 5 vectors (broadcast
    query matrix, per-batch GEMM + two-phase top-k with the (-sim, id)
    tie-break).  Oracle: DuckDB list_cosine_similarity cross-join with
    the same ordering; pytest additionally pins the numpy oracle."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_bruteforce

    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5).to_pandas()
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].tolist()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_bruteforce(ds, "embedding", "vec_id", queries, qids, k=5)


def q_knn_lsh(sf_dir):
    """ANN variant: hyperplane-LSH bucketed top-5 (single probe).
    Rows-only driver check; recall contract tested in pytest."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_lsh

    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5).to_pandas()
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].tolist()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_lsh(ds, "embedding", "vec_id", queries, qids, k=5, n_probes=4)


def q_pack_sequences(sf_dir):
    """Tokenize-and-pack: curated docs -> fixed-length LM training
    rows (per-shard packing, EOD separators, final-row padding) plus
    the packing efficiency stats a training job monitors.  Rows-only
    driver check (list<int64> training rows are not SQL-shaped);
    engine == pure-Python spec pinned in tests/test_text_ops.py."""
    from ..stages.text import pack_sequences

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text"]).repartition(8)
    packed = pack_sequences(ds, seq_len=128, buckets=16)
    return packed.select_columns(["n_docs", "n_pad"])


def q_lm_perplexity(sf_dir):
    """Char-trigram LM quality ranking (the CCNet/KenLM perplexity
    filter): distributed bounded-key fit, broadcast table, vectorized
    scoring; returns each doc's bits-per-char bucketed to ints.
    Rows-only driver check (iterative fit+score is not SQL-shaped);
    engine == pure-Python spec pinned in tests/test_text_ops.py."""
    from ..stages.text import lm_perplexity

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = lm_perplexity(ds)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "centibits": np.floor(df["bits_per_char"] * 100.0
                                  + 0.5).astype("int64")})

    return scored.map_batches(bucket, batch_format="pandas")


def q_line_dedup(sf_dir):
    """Cross-document line-level dedup (CCNet/C4 boilerplate removal:
    navbars/footers repeat across pages where document-level dedup
    sees nothing): keep the first corpus-wide occurrence of every
    distinct line, reassemble documents.  Explode -> 128-bit-key
    hash-partition resolve -> per-doc reassemble; rows-only driver
    check (the multi-stage shuffle shape is not SQL-shaped) — engine
    == pure-Python spec pinned in tests/test_dedup_text.py."""
    from ..stages.text import line_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).repartition(16)
    return line_dedup(ds, "doc_id", "text", mode="keep_first")


def q_url_dedup(sf_dir):
    """URL canonicalization + URL-keyed dedup (the WET/WARC dedup
    key): messy URLs derived deterministically from events (mixed
    case, www, default ports, utm_*/gclid tracking params, fragments)
    collapse to one canonical form per user page; two-phase count per
    canonical URL.  Rows-only driver check; canonicalization rules
    pinned element-wise vs the scalar spec in tests."""
    from ..functions import canonical_url
    from ..stages.aggregate import two_phase_agg

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], parallel=16)

    def messy(df: pd.DataFrame) -> pd.DataFrame:
        tld = df["user_id"].mod(3).map({0: "com", 1: "org", 2: "net"})
        port = df["user_id"].mod(2).map({0: ":443", 1: ""})
        url = ("HTTPS://WWW.U" + df["user_id"].astype(str) + ".Example."
               + tld + port + "/home?utm_campaign=c"
               + df["event_id"].astype(str) + "&gclid=g&page=1#sec"
               + df["event_id"].astype(str))
        return pd.DataFrame({"url": canonical_url(url)})

    out = two_phase_agg(ds.map_batches(messy, batch_format="pandas"),
                        ["url"], count="n_events")
    return out.sort_values("url").reset_index(drop=True)


def q_substring_dedup(sf_dir):
    """Exact-substring dedup (window-hash form of the suffix-array
    method, Lee et al. 2021): cut every repeated >=20-token span at
    its non-first occurrences.  One int row per token position
    shuffles (never text); 128-bit window keys; rows-only driver
    check — engine == pure-Python spec in tests/test_dedup_text.py."""
    from ..stages.text import substring_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"]).repartition(16)
    return substring_dedup(ds, "doc_id", "text", window=20)


def q_bpe_tokenize(sf_dir):
    """Distributed BPE (Sennrich 2016): train merges over the corpus
    (two-phase word counting; merge loop bounded by vocab, never
    corpus), broadcast ranks, encode every document with a per-batch
    distinct-word cache.  Rows-only (the iterative trainer is not
    SQL-shaped); trainer == naive-recount oracle and encoder
    round-trip pinned in tests/test_tokenizer.py."""
    import hashlib

    from ..stages.tokenizer import bpe_encode, train_bpe

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = train_bpe(ds, num_merges=200, max_words=20_000)
    enc = bpe_encode(ds, merges)

    def digest(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["n_tokens"].astype("int64"),
            "tok_md5": [hashlib.md5(" ".join(t).encode()).hexdigest()
                        for t in df["tokens"]]})

    return enc.map_batches(digest, batch_format="pandas")


def q_quality_classifier(sf_dir):
    """fasttext-shaped model-based quality filter (GPT-3 §A / CCNet):
    train a hashed-feature logistic classifier to separate the English
    slice (weak label lang == 'en') from the rest — per-iteration
    broadcast weights + O(dim) gradient partials — then score every
    document.  Rows-only (iterative training); gradient spec, holdout
    accuracy and bit-determinism pinned in tests/test_classify.py."""
    from ..stages.classify import classifier_scores, train_text_classifier

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"], parallel=16)

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(label=(df["lang"] == "en").astype("float64"))

    w, _ = train_text_classifier(ds.map_batches(lab, batch_format="pandas"),
                                 label_col="label", iters=20, lr=8.0)
    sc = classifier_scores(ds, w)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "centiprob": np.floor(df["prob"] * 100.0 + 0.5)
            .astype("int64")})

    return sc.map_batches(bucket, batch_format="pandas")


def q_kmeans_clusters(sf_dir):
    """Full-corpus embedding clustering (the cluster-then-rebalance
    curation step): distributed Lloyd — centroids broadcast once per
    iteration, each batch one O(k x dim) partial, driver reduce
    O(k x dim) — then a broadcast assignment pass.  Rows-only
    (iterative); distributed fit == single-node oracle pinned in
    tests/test_dedup_text.py."""
    from ..stages.similarity import kmeans_assign, kmeans_fit_distributed

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"], parallel=16)
    cent = kmeans_fit_distributed(ds, "embedding", id_col="vec_id",
                                  k=8, iters=5)
    return kmeans_assign(ds, cent, vec_col="embedding", id_col="vec_id")


def q_dsir_select(sf_dir):
    """DSIR importance resampling (Xie et al. 2023): fit hashed-ngram
    models of a target slice (lang == 'en') and the raw corpus (one
    streaming pass each, O(dim) driver reduce), weight every raw doc
    by log p − log q, Gumbel-top-k select (deterministic md5-seeded
    noise — reproducible, shard-resumable).  Rows-only; fit/score/
    gumbel pinned against the pure-Python spec in tests/test_dsir.py."""
    from ..stages.dsir import dsir_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"], parallel=16)
    target = ds.filter(expr="lang == 'en'")
    scored = dsir_scores(ds, target, seed=11)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "centi_log_w": np.floor(df["log_w"] * 100.0 + 0.5)
            .astype("int64")})

    return scored.map_batches(bucket, batch_format="pandas")


def q_semantic_dedup(sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    prune near-duplicate pairs WITHIN each cluster (keep = member
    least similar to its centroid).  Clustering bounds the O(m^2)
    pair scan to one cluster per worker — the documented partitioning
    assumption.  Rows-only (iterative fit); full-output equality to
    the single-node spec pinned in tests/test_dedup_text.py."""
    from ..stages.similarity import semantic_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semantic_dedup(ds, k=8, iters=4, threshold=0.95)


def q_pretrain_corpus(sf_dir):
    """FULL pretraining-corpus recipe (pipelines/pretrain.py): curation
    -> benchmark decontamination -> PII redaction + source mixing
    (fused) -> deterministic epoch shuffle -> sequence packing, every
    stage a parquet resume point.  Returns the funnel stats.  Rows-only
    driver check; planted-fixture semantics pinned in
    tests/test_pretrain.py."""
    import pyarrow.parquet as pq

    from .pretrain import run_pretrain

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["text"]).to_pandas()
    bench = [" ".join(t.split()[2:20]) for t in docs["text"].iloc[[3, 11]]]
    out = _scratch("pretrain", sf_dir)
    stats = run_pretrain(f"{sf_dir}/documents.parquet", out,
                         benchmark_texts=bench, weights=MIX_WEIGHTS,
                         default_weight=MIX_DEFAULT, seed=11, seq_len=64,
                         fused=os.environ.get("GRAFT_FUSED") == "1")
    return pd.DataFrame({"stage": list(stats),
                         "value": [float(v) for v in stats.values()]})


def q_curation(sf_dir):
    """Composed LLM-corpus curation pipeline (pipelines/curation.py:
    quality gate -> exact dedup -> MinHash near-dup removal -> curated
    parquet) over documents; returns the per-stage funnel counts.
    Rows-only driver check; planted-duplicate semantics pinned in
    tests/test_curation.py."""
    from .curation import run_curation

    out = _scratch("curation", sf_dir)
    stats = run_curation(f"{sf_dir}/documents.parquet", out,
                         fused=os.environ.get("GRAFT_FUSED") == "1")
    return pd.DataFrame({"stage": list(stats),
                         "value": [int(v) for v in stats.values()]})


def q_vendor_formats(sf_dir):
    """Shipped vendor decoders roundtrip (vendor.py: pmciscoios header
    grammar, mmleefparse, mmaudit — plugins/pmciscoios/pmciscoios.c,
    mmleefparse.c, mmaudit.c): render a deterministic Cisco-IOS line,
    a LEEF event and a Linux audit record per event row, decode each
    back through the shipped parsers, emit the recovered fields.
    Rows-only driver check; lossless recovery + the decoders' C-walk
    parity are pinned in tests/test_syslog.py."""
    import pyarrow as pa

    from ..vendor import CISCO_IOS_RULEBASE, audit_parse, leef_parse

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "value"], parallel=16)

    def roundtrip(df: pd.DataFrame) -> pd.DataFrame:
        seq = df["event_id"].astype("int64")
        host = "host" + (df["user_id"] % 50).astype(str)
        etype = df["event_type"].astype(str)
        cisco = (seq.astype(str) + ": " + host
                 + ": May 21 12:00:01.123 UTC: %EV-" + (seq % 8).astype(str)
                 + "-" + etype.str.upper() + ": value="
                 + df["value"].round(3).astype(str))
        parsed = CISCO_IOS_RULEBASE.parse_table(
            pa.array(cisco, pa.string()))
        leef = ("LEEF:1.0|raylog|events|1.0|" + etype
                + "|id=" + seq.astype(str)
                + "\tuser=" + (df["user_id"] % 50).astype(str))
        lf = leef_parse(pd.Series(leef.to_numpy(), index=df.index))
        audit = ("type=" + (1300 + seq % 10).astype(str)
                 + " audit(1700000000." + (seq % 1000).astype(str)
                 + ":" + seq.astype(str) + "): uid=" + (df["user_id"] % 50)
                 .astype(str) + " comm=\"" + etype + "\" res=success")
        au = audit_parse(pd.Series(audit.to_numpy(), index=df.index))
        return pd.DataFrame({
            "event_id": seq,
            "cisco_seq": pd.array(
                parsed["seq"].to_pandas(), dtype="Int64"),
            "cisco_origin": parsed["origin"].to_pandas().to_numpy(),
            "cisco_tag": parsed["tag"].to_pandas().to_numpy(),
            "cisco_ok": parsed["parse_ok"].to_pandas().to_numpy(),
            "leef_event": lf["eventID"],
            "leef_user": [__import__("json").loads(f)["user"]
                          for f in lf["fields"]],
            "audit_type": au["audit_type"],
            "auditid": au["auditid"],
            "audit_comm": [__import__("json").loads(d)["comm"]
                           for d in au["data"]],
        })

    return ds.map_batches(roundtrip, batch_format="pandas")


def q_snare_windows(sf_dir):
    """mmsnareparse Windows-Security decode end-to-end: deterministic
    Snare TSV events (4624/4625/4634/4672/4688 cycled per event row,
    sectioned Description text synthesized closed-form) through
    vendor.snare_win_parse — per-EventID Category/Subtype/Outcome
    tables, sectioned field extraction, typed LogonType +
    LogonTypeName.  The SQL_TAIL oracle restates the planted values
    and the knowledge tables; the engine must PARSE the text to
    recover them (the roundtrip shape of q_vendor_formats)."""
    import json as _json

    from ..vendor import snare_win_parse

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"],
               parallel=16)

    def roundtrip(df: pd.DataFrame) -> pd.DataFrame:
        seq = df["event_id"].astype("int64")
        uid = (df["user_id"].astype("int64") % 50)
        eid = seq % 5
        eid = eid.map({0: 4624, 1: 4625, 2: 4634, 3: 4672, 4: 4688})
        lt = (seq % 9).map(dict(enumerate(
            (2, 3, 4, 5, 7, 8, 9, 10, 11))))
        port = (seq % 60000).astype(str)
        desc = ("Sample event.    Subject:    Security ID:  S-1-5-18"
                "    Account Name:  user" + uid.astype(str)
                + "    Account Domain:  CONTOSO    "
                "Logon Information:    Logon Type:  " + lt.astype(str)
                + "    Network Information:    Source Port:  " + port)
        audit = np.where(eid == 4625, "Failure Audit", "Success Audit")
        lines = ("<13>Jan  5 10:00:00 host MSWinEventLog\t1\t"
                 "Security\t" + seq.astype(str)
                 + "\tFri Jan 05 10:00:00 2024\t" + eid.astype(str)
                 + "\tMicrosoft-Windows-Security-Auditing\tSYSTEM\t"
                 "N/A\t" + pd.Series(audit, index=df.index)
                 + "\tDC01\tLogon\t" + desc)
        out = snare_win_parse(lines)
        win = [_json.loads(w) for w in out["win"]]
        return pd.DataFrame({
            "event_id": seq.to_numpy(),
            "win_event_id": out["event_id"].astype("int64").to_numpy(),
            "category": [w["Event"].get("Category", "") for w in win],
            "subtype": [w["Event"].get("Subtype", "") for w in win],
            "outcome": out["outcome"].to_numpy(),
            "account": out["subject_account"].to_numpy(),
            "logon_type": out["logon_type"].astype("int64").to_numpy(),
            "logon_type_name": [
                w.get("LogonInformation", {}).get("LogonTypeName", "")
                for w in win],
            "source_port": [
                int(w.get("Network", {}).get("SourcePort", -1))
                for w in win],
        })

    res = ds.map_batches(roundtrip, batch_format="pandas").to_pandas()
    return res.sort_values("event_id").reset_index(drop=True)


def q_ngram_topk(sf_dir):
    """Wimbd-style corpus n-gram statistics (Elazar et al. 2023): the
    global top-20 3-grams by frequency, deterministic tie-break (cnt
    desc, gram asc).  Two-phase with an adaptive distributed final —
    per-batch partial counts, gram-hash-partitioned per-partition
    top-k, O(nparts × k) driver rows; normalization mirrored exactly
    by the DuckDB oracle."""
    from ..stages.text import ngram_topk

    ds = _read(sf_dir, "documents", columns=["text"], parallel=16)
    return ngram_topk(ds, n=3, k=20)


def q_heavy_hitters(sf_dir):
    """Exact top-20 corpus words via mergeable Misra-Gries summaries +
    broadcast exact recount (stages/sketch.heavy_hitters).  Nothing
    vocabulary-sized ever shuffles or reaches the driver — the
    bounded-summary alternative to ngram_topk's hash-partitioned
    final, with an exactness certificate (widens and reruns when the
    MG undercount bound could displace rank k)."""
    from ..stages.sketch import heavy_hitters

    ds = _read(sf_dir, "documents", columns=["text"], parallel=16)
    return heavy_hitters(ds, "text", k=20, tokenize=True)


def q_tfidf_topk(sf_dir):
    """Per-document top-5 keywords by tf·idf (idf = ln(N/df)) — the
    keyword-extraction staple over the documents table.  Adaptive
    final (stages/text.tfidf_topk): Heaps-bounded vocabularies reduce
    to one broadcast df table (np.searchsorted lookup per batch, zero
    shuffles); huge vocabularies switch to term-hash-partitioned
    postings so nothing vocabulary-sized touches the driver.  Full
    DuckDB oracle in SQL_TAIL; engine == pure-Python spec
    (tfidf_oracle) + path A == path B pinned in pytest."""
    from ..stages.text import tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               parallel=16)
    return tfidf_topk(ds, k=5)


def q_cross_decontaminate(sf_dir):
    """Cross-corpus decontamination at document grain: flag every
    training doc whose distinct-word-set Jaccard vs ANY benchmark doc
    reaches 4/5 (exact integer threshold — inter*5 >= 4*union, no
    floats anywhere).  The benchmark side (doc_id < 50 — a fixed
    small suite at every sf, the real-world shape) broadcasts once as
    a CSR inverted index; the train side streams with zero shuffles.
    Full DuckDB oracle in SQL_TAIL; engine == pure-Python spec
    (cross_jaccard_oracle) pinned in pytest with planted near-copies."""
    from ..stages.dedup import cross_jaccard_matches

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"],
                 parallel=16)
    ev = docs.filter(expr="doc_id < 50").to_pandas()
    train = docs.filter(expr="doc_id >= 50")
    return cross_jaccard_matches(train, ev["doc_id"].tolist(),
                                 ev["text"].tolist(), t_num=4, t_den=5)


def q_filter_cascade(sf_dir):
    """FineWeb-style fused quality-filter cascade with per-rule
    attrition accounting: an ORDERED rule chain (word-count bounds,
    integer cross-multiplied mean-word-length band, stopword presence,
    C4 brace / lorem-ipsum gates) where the FIRST failing rule
    attributes the drop.  Output is the funnel — one row per rule with
    (stage, rule, n_in, n_dropped, n_out).  One streaming pass, one
    7-bin histogram row per batch, O(n_batches) driver reduce.  Every
    rule is integer-exact; full DuckDB oracle in SQL_TAIL; engine ==
    pure-Python spec (cascade_oracle) pinned in pytest."""
    from ..stages.text import filter_cascade

    ds = _read(sf_dir, "documents", columns=["text"], parallel=16)
    return filter_cascade(ds)


def q_table_profile(sf_dir):
    """ANALYZE/SUMMARIZE-style column statistics over events (count,
    nulls, exact ndv, typed min/max rendered as DuckDB VARCHAR).  Two
    coordination-light passes: one wide typed partial row per batch
    (driver reduce O(n_batches), CLAUDE.md invariant 3) and an exact
    distinct count via per-batch-unique 128-bit keys hash-partitioned
    so the driver only sums O(columns × nparts) tiny rows — the raw
    values never shuffle.  Mirrors the reference's statsobj
    self-description surface (runtime/statsobj.c) at table grain."""
    from ..stages.profile import table_profile

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "event_type", "value"],
               parallel=16)
    return table_profile(ds, ["event_id", "event_type", "ts", "value"])


def q_gopher_rules(sf_dir):
    """Gopher quality filter (Rae et al. 2021 A.1.1): every published
    document rule as an integer column + the composite keep flag.
    Rows-only driver check; tests/test_text_ops.py pins the vectorized
    frame == the per-row spec oracle (gopher_row) on adversarial
    fixtures."""
    from ..stages.text import gopher_quality_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        out = gopher_quality_frame(df["text"])
        out.insert(0, "doc_id", df["doc_id"])
        return out

    return ds.map_batches(fx, batch_format="pandas")


def q_c4_filters(sf_dir):
    """C4 cleaning (Raffel et al. 2020 §2.2): line retention (terminal
    punctuation, >=5 words, no 'javascript') + document gates (>=3
    sentences, no 'lorem ipsum', no '{').  Rows-only driver check;
    engine == per-row spec oracle (c4_row) pinned in pytest."""
    from ..stages.text import c4_filter_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               parallel=16)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        out = c4_filter_frame(df["text"])
        out.insert(0, "doc_id", df["doc_id"])
        return out

    return ds.map_batches(fx, batch_format="pandas")


def q_window_hopping(sf_dir):
    """Event-time hopping windows (2h window, 1h hop) over events —
    the overlapping-window generalization of dynstats_bucket.
    Rows-only driver check; a pandas oracle pins the semantics in
    pytest (test_distributed_finals)."""
    from ..stages.aggregate import hopping_window_count

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    out = hopping_window_count(ds, "ts", 7200, 3600, keys=["event_type"])
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def q_approx_percentiles(sf_dir):
    """perctile_stats at unbounded scale: DDSketch-style mergeable
    quantile sketches per (batch, key) — O(bins) over the wire
    regardless of observation count.  Rows-only driver check; the
    relative-error bound vs exact quantiles is pinned in pytest."""
    from ..stages.sketch import approx_percentiles

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    out = approx_percentiles(ds, "event_type", "value", [0.5, 0.95])
    return out.sort_values("event_type").reset_index(drop=True)


def q_knn_pq(sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): codebooks from a
    bounded sample (broadcast), per-batch uint8 encode + ADC
    table-gather scoring, exact driver reduce of local top-k partials
    — m bytes per vector instead of dim floats at scale.  Rows-only
    driver check; encode/ADC spec + clustered-recall pinned in
    pytest."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_pq

    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5).to_pandas()
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].tolist()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_pq(ds, "embedding", "vec_id", queries, qids, k=5,
                  m=4, ksub=16)


def q_exact_quantiles(sf_dir):
    """EXACT global quantiles of events.value by distributed selection
    (iterative histogram refinement, stages/sketch.exact_quantiles):
    3-4 streaming passes each shipping O(batches × targets × bins)
    small ints, one final collect capped per target — never a sort,
    never the column on the driver.  Integer rank rule
    r = (pct·n + 99)//100 mirrored by the DuckDB oracle in SQL_TAIL;
    the returned value is an actual column element, so engine and
    oracle agree bit-for-bit (no float-hash flake)."""
    from ..stages.sketch import exact_quantiles

    ds = _read(sf_dir, "events", columns=["value"], parallel=16)
    return exact_quantiles(ds, "value", [25, 50, 75, 90, 99])


def q_cms_counts(sf_dir):
    """Count-Min point queries over the corpus word stream
    (stages/sketch.CountMin): one streaming pass, one depth×width
    int64 blob per batch, driver reduce O(batches) adds — the
    mergeable-frequency answer for UNBOUNDED key spaces where
    dynstats would refuse past maxCardinality
    (runtime/dynstats.c:43-45).  Probes are a fixed deterministic
    token list; rows-only driver check — pytest pins the
    est ≥ exact / est ≤ exact + εN guarantees and the merged sketch
    == one-shot sketch identity."""
    from ..stages.sketch import cms_word_counts

    probes = ["the", "a", "of", "data", "lorem", "zzz_absent_token"]
    ds = _read(sf_dir, "documents", columns=["text"], parallel=16)
    return cms_word_counts(ds, "text", probes)


def q_knn_sq(sf_dir):
    """Scalar-quantized (SQ8) ANN: per-dimension affine uint8 codes
    from a bounded broadcast sample, per-batch matmul scoring
    cos ≈ q·lo + codes@(q∘step), local top-k, exact driver reduce —
    4× smaller than float32 with near-exact recall.  Rows-only driver
    check; encode/score spec + recall-vs-bruteforce pinned in
    pytest."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_sq

    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5).to_pandas()
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].tolist()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_sq(ds, "embedding", "vec_id", queries, qids, k=5)


def q_semi_join(sf_dir):
    """Distributed semi join (SQL EXISTS, stages/join.semi_join):
    customers with at least one finished ('F') order.  The right side
    collapses to per-batch distinct keys BEFORE the one shuffle, so the
    exchange moves left rows + right distinct keys only — order payload
    columns never travel.  DuckDB EXISTS oracle in SQL_TAIL."""
    from ..stages.join import semi_join

    left = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def f_orders(df: pd.DataFrame) -> pd.DataFrame:
        return (df.loc[df["o_orderstatus"] == "F", ["o_custkey"]]
                .rename(columns={"o_custkey": "c_custkey"}))

    right = (_read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus"])
             .map_batches(f_orders, batch_format="pandas"))
    # stays a Dataset: a semi join keeps most of the left table
    return semi_join(left, right, "c_custkey")


def q_anti_join(sf_dir):
    """Distributed anti join (SQL NOT EXISTS, stages/join.anti_join):
    customers with no pending ('P') order — the TPC-H Q22 shape and
    the dedup anti-join primitive as a first-class relational
    operator.  Same distinct-keys-only exchange as q_semi_join; DuckDB
    NOT EXISTS oracle in SQL_TAIL."""
    from ..stages.join import anti_join

    left = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def pending(df: pd.DataFrame) -> pd.DataFrame:
        return (df.loc[df["o_orderstatus"] == "P", ["o_custkey"]]
                .rename(columns={"o_custkey": "c_custkey"}))

    right = (_read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderstatus"])
             .map_batches(pending, batch_format="pandas"))
    out = anti_join(left, right, "c_custkey").to_pandas()
    # an all-buckets-empty Dataset loses its column schema in to_pandas
    if not len(out.columns):
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                            "c_mktsegment": pd.Series([], dtype=object)})
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_rollup_counts(sf_dir):
    """GROUP BY ROLLUP (stages/aggregate.rollup_agg): lineitem counts +
    quantity cents by (returnflag, linestatus) plus both subtotal
    levels and the grand total, rolled-up keys as SQL NULL.  One
    distributed combiner pass; coarser levels derive from the finest
    GROUPS on the driver (additivity), never from the rows.  Cents are
    integer per row before any sum, so every level is order-exact
    against the DuckDB ROLLUP oracle in SQL_TAIL."""
    from ..stages.aggregate import rollup_agg

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["q_c"] = np.floor(df["l_quantity"].to_numpy(np.float64) * 100
                             + 0.5).astype("int64")
        return df[["l_returnflag", "l_linestatus", "q_c"]]

    ds = (_read(sf_dir, "lineitem",
                columns=["l_returnflag", "l_linestatus", "l_quantity"])
          .map_batches(cents, batch_format="pandas"))
    return rollup_agg(ds, ["l_returnflag", "l_linestatus"],
                      sums={"q_c": "sum_qty_c"})


def q_window_funcs(sf_dir):
    """SQL window functions over the event stream
    (stages/aggregate.window_over_key): row_number(), lag(value) and a
    running cents sum, PARTITION BY user_id ORDER BY (ts, event_id).
    One hash shuffle co-locates each user's rows; everything inside a
    bucket is shift/cumsum over one sort with key-change masking.
    lag copies the raw double (bit-identical), the running sum is
    integer cents per row before any addition — full DuckDB OVER()
    oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["v_c"] = np.floor(df["value"].to_numpy(np.float64) * 100
                             + 0.5).astype("int64")
        return df

    ds = (_read(sf_dir, "events",
                columns=["event_id", "user_id", "ts", "value"])
          .map_batches(cents, batch_format="pandas"))
    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "rn", "prev_value",
                   "run_sum_c"]]

    # stays a Dataset: a window result is corpus-sized — the gate
    # collects at sf0.01, the operator itself never does
    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            run_value="v_c", run_col="run_sum_c")
            .map_batches(sel, batch_format="pandas"))


def q_string_agg(sf_dir):
    """SQL string_agg per group (stages/aggregate.group_concat):
    customer names per nation, comma-joined in custkey order.  One
    hash shuffle co-locates a key's rows; the driver collect is one
    row per key.  DuckDB string_agg(... ORDER BY) oracle in
    SQL_TAIL."""
    from ..stages.aggregate import group_concat

    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_name", "c_custkey"])
    return group_concat(ds, "c_nationkey", "c_name", ["c_custkey"],
                        sep=",", out="names")


def q_pivot_counts(sf_dir):
    """Pivoted counts: events per hour-of-day × event_type, one column
    per type (the CASE-WHEN / FILTER pivot).  The distributed pass is
    the plain (hr, type) two-phase combiner; the pivot itself runs on
    the ≤ 24×|types| reduced rows — never on the stream.  DuckDB
    count(*) FILTER oracle in SQL_TAIL."""
    from ..stages.aggregate import two_phase_agg

    types = ["click", "error", "purchase", "signup", "view"]

    def hour(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"hr": df["ts"].dt.hour.astype("int64"),
                             "event_type": df["event_type"]})

    ds = (_read(sf_dir, "events", columns=["ts", "event_type"])
          .map_batches(hour, batch_format="pandas"))
    flat = two_phase_agg(ds, ["hr", "event_type"], count="cnt")
    wide = (flat.pivot(index="hr", columns="event_type", values="cnt")
            .fillna(0).astype("int64").reset_index())
    wide.columns.name = None
    for t in types:           # absent types still get a zero column
        if t not in wide.columns:
            wide[t] = np.int64(0)
    return (wide[["hr"] + types].sort_values("hr")
            .reset_index(drop=True))


def q_range_store(sf_dir):
    """Range-partitioned store round-trip (stages/rangestore): write
    events equi-depth-partitioned by value (boundaries from the exact
    distributed quantiles — never a sort), then serve
    `WHERE 100 <= value < 200` reading ONLY the overlapping range
    directories — predicate pruning at the read, the dynafile
    partition-by-value idea generalized.  DuckDB WHERE-band oracle in
    SQL_TAIL; the pruned file subset is pinned in
    tests/test_rangestore.py."""
    from ..stages.rangestore import read_range, write_range_partitioned

    ds = _read(sf_dir, "events", columns=["event_id", "value"],
               parallel=8)
    store = _scratch("range_store", sf_dir)
    write_range_partitioned(ds, "value", store, n_ranges=8)

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "value"]]

    return read_range(store, 100.0, 200.0).map_batches(
        sel, batch_format="pandas")


def q_compact_store(sf_dir):
    """Store compaction (stages/rangestore.compact_range_store): the
    events store split in two (event_id parity) — base write + one
    generation append — then compacted to ONE file per bucket with
    the crash-repaired dir swap, and served with the same pruned band
    read.  Row-identical to the uncompacted union by construction;
    the DuckDB WHERE-band oracle over ALL events in SQL_TAIL holds
    only if the append and the compaction both lost nothing.  Torn
    swaps/appends pinned in t:test_rangestore."""
    from ..stages.rangestore import (append_range_partitioned,
                                     compact_range_store, read_range,
                                     write_range_partitioned)

    ds = _read(sf_dir, "events", columns=["event_id", "value"],
               parallel=8)
    base = ds.map_batches(
        lambda df: df[df["event_id"] % 2 == 0], batch_format="pandas")
    inc = ds.map_batches(
        lambda df: df[df["event_id"] % 2 == 1], batch_format="pandas")
    store = _scratch("compact_store", sf_dir)
    write_range_partitioned(base, "value", store, n_ranges=8)
    append_range_partitioned(inc, store, gen_id="odd")
    stats = compact_range_store(store)
    assert stats["files_after"] <= stats["buckets"]

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "value"]]

    return read_range(store, 100.0, 200.0).map_batches(
        sel, batch_format="pandas")


def q_composite_join(sf_dir):
    """Composite-key hash join (stages/join.hash_join on=[k1,k2]):
    two differently-filtered lineitem projections joined on
    (orderkey, linenumber) — the chained key hash buckets the pair,
    the per-bucket merge keys on both columns — then returnflag
    rollup of integer cents.  DuckDB USING(k1,k2) oracle in
    SQL_TAIL."""
    from ..stages.join import hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount",
                        "l_returnflag"])

    def left(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_quantity"] > 25]
        return pd.DataFrame({
            "k1": df["l_orderkey"].astype("int64"),
            "k2": df["l_linenumber"].astype("int64"),
            "qty_c": np.floor(df["l_quantity"].to_numpy(np.float64)
                              * 100 + 0.5).astype("int64"),
            "rf": df["l_returnflag"]})

    def right(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_discount"] > 0.05]
        return pd.DataFrame({
            "k1": df["l_orderkey"].astype("int64"),
            "k2": df["l_linenumber"].astype("int64"),
            "price_c": np.floor(
                df["l_extendedprice"].to_numpy(np.float64) * 100
                + 0.5).astype("int64")})

    j = hash_join(li.map_batches(left, batch_format="pandas"),
                  li.map_batches(right, batch_format="pandas"),
                  on=["k1", "k2"])
    res = two_phase_agg(
        j.map_batches(lambda df: df.astype(
            {"qty_c": "int64", "price_c": "int64"}),
            batch_format="pandas"),
        ["rf"], count="n",
        sums={"qty_c": "qty_c", "price_c": "price_c"})
    res = res.rename(columns={"rf": "l_returnflag"})
    for c in ("n", "qty_c", "price_c"):
        res[c] = res[c].astype("int64")
    return res.sort_values("l_returnflag").reset_index(drop=True)


def q_window_rank(sf_dir):
    """lead() and ntile(4) over the same per-user window as
    q_window_funcs (stages/aggregate.window_over_key) — lead
    bit-copies the next value, ntile reproduces SQL's
    larger-buckets-first split exactly.  DuckDB OVER() oracle in
    SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"],
               parallel=8)

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "next_value", "tile"]]

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            lead_col="next_value", ntile_n=4)
            .map_batches(sel, batch_format="pandas"))


def q_window_dist(sf_dir):
    """percent_rank() and cume_dist() over the per-user window
    (stages/aggregate.window_over_key): with a tie-free order both
    reduce to single IEEE divisions of the same integers the SQL side
    divides — bit-identical, no rounding games.  DuckDB OVER() oracle
    in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"],
               parallel=8)

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "pct_rank", "cume_dist"]]

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            pct_rank_col="pct_rank",
                            cume_dist_col="cume_dist")
            .map_batches(sel, batch_format="pandas"))


def q_window_bounds(sf_dir):
    """first_value()/last_value() over the whole per-user partition
    (stages/aggregate.window_over_key) — bit-copies of the endpoint
    values broadcast per row.  DuckDB OVER(... ROWS BETWEEN UNBOUNDED
    PRECEDING AND UNBOUNDED FOLLOWING) oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"],
               parallel=8)

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "first_v", "last_v"]]

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            first_col="first_v", last_col="last_v")
            .map_batches(sel, batch_format="pandas"))


def q_window_frame(sf_dir):
    """SQL frame aggregate: per-user moving sum + count over
    ``ROWS BETWEEN 2 PRECEDING AND CURRENT ROW``
    (stages/aggregate.window_over_key roll_n) — the frame sum is the
    cumsum-difference of integer cents clipped at the partition start,
    so every window total is order-exact.  DuckDB frame oracle in
    SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["v_c"] = np.floor(df["value"].to_numpy(np.float64) * 100
                             + 0.5).astype("int64")
        return df

    ds = (_read(sf_dir, "events",
                columns=["event_id", "user_id", "ts", "value"],
                parallel=8)
          .map_batches(cents, batch_format="pandas"))

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "w3_sum", "w3_n"]]

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            roll_n=3, roll_value="v_c",
                            roll_sum_col="w3_sum", roll_cnt_col="w3_n")
            .map_batches(sel, batch_format="pandas"))


def q_window_ties(sf_dir):
    """Tie-aware rank()/dense_rank() per user over a 10-dollar value
    bucket (stages/aggregate.window_over_key rank_value): peers are
    consecutive equal bucket values after the one per-key sort, rank
    is the first peer's row number, dense_rank the distinct-value
    count — both pure int.  DuckDB rank()/dense_rank() oracle in
    SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        vc = np.floor(df["value"].to_numpy(np.float64) * 100
                      + 0.5).astype("int64")
        df["v_b"] = vc // 1000
        return df

    ds = (_read(sf_dir, "events",
                columns=["event_id", "user_id", "value"],
                parallel=8)
          .map_batches(bucket, batch_format="pandas"))

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "v_b", "rnk", "drnk"]]

    return (window_over_key(ds, "user_id", ["v_b", "event_id"], "v_b",
                            rank_value="v_b", rank_col="rnk",
                            dense_rank_col="drnk")
            .map_batches(sel, batch_format="pandas"))


def q_analytics_report(sf_dir):
    """Composed analytics pipeline (pipelines/analytics.run_analytics):
    funnel + retention + paths + per-type stats + hourly pivot in one
    stage-resumable run over the event stream — each stage's operator
    is individually oracle-backed elsewhere; this entry exercises the
    composition + resume.  Rows-only driver check; stage-level resume
    pinned in tests/test_analytics.py."""
    from ..pipelines.analytics import read_report, run_analytics

    out = _scratch("analytics", sf_dir)
    run_analytics(f"{sf_dir}/events.parquet", out,
                  fused=os.environ.get("GRAFT_FUSED") == "1")
    return read_report(out)


def q_stats_bykey(sf_dir):
    """n / mean / sample stddev of value cents per event_type
    (stages/aggregate.stats_by_key): int64 moment partials, one shared
    float64 expression — bit-identical vs the SQL oracle built from
    the same sums (never DuckDB's own stddev accumulator, whose
    ordering differs)."""
    from ..stages.aggregate import stats_by_key

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "xc": np.floor(df["value"].to_numpy(np.float64) * 100
                           + 0.5).astype("int64")})

    ds = (_read(sf_dir, "events", columns=["event_type", "value"],
                parallel=8)
          .map_batches(cents, batch_format="pandas"))
    return stats_by_key(ds, "event_type", "xc")


def q_argmax_bykey(sf_dir):
    """max_by per key (stages/aggregate.argmax_by_key): each user's
    highest-value event (deterministic tie-break: max value, then min
    event_id).  Two-phase associative argmax — one champion per key
    per batch, rows never shuffle.  DuckDB row_number()-window oracle
    in SQL_TAIL (arg_max's tie behavior is unspecified, the window
    form is exact)."""
    from ..stages.aggregate import argmax_by_key

    ds = _read(sf_dir, "events",
               columns=["user_id", "value", "event_id"], parallel=8)
    return argmax_by_key(ds, "user_id", "value", "event_id")


def q_corr_bykey(sf_dir):
    """Pearson correlation per event_type between value cents and
    second-of-day (stages/aggregate.corr_by_key): six int64 moment
    partials per key per batch (order-exact integer sums), then ONE
    float64 expression over the exact sums — the identical expression
    tree in the DuckDB oracle makes the float output bit-identical
    (the bm25 shared-expression trick applied to statistics)."""
    from ..stages.aggregate import corr_by_key

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "xc": np.floor(df["value"].to_numpy(np.float64) * 100
                           + 0.5).astype("int64"),
            "yc": (df["ts"].to_numpy().astype("int64") // 1_000_000
                   % 86_400),
        })

    ds = (_read(sf_dir, "events",
                columns=["event_type", "value", "ts"], parallel=8)
          .map_batches(prep, batch_format="pandas"))
    return corr_by_key(ds, "event_type", "xc", "yc")


def q_window_range(sf_dir):
    """Time-frame window: per-user trailing-1-hour cents sum + count,
    ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW``
    (stages/aggregate.window_over_key range_us) — searchsorted frame
    bounds with SQL's peer-inclusive rule, integer cumsum difference.
    DuckDB RANGE-frame oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["ts_us"] = df["ts"].to_numpy().astype("int64")
        df["v_c"] = np.floor(df["value"].to_numpy(np.float64) * 100
                             + 0.5).astype("int64")
        return df

    ds = (_read(sf_dir, "events",
                columns=["event_id", "user_id", "ts", "value"],
                parallel=8)
          .map_batches(prep, batch_format="pandas"))

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "h1_sum", "h1_n"]]

    return (window_over_key(ds, "user_id", ["ts_us", "event_id"],
                            "value", range_us=3_600_000_000,
                            range_ts="ts_us", range_value="v_c",
                            range_sum_col="h1_sum",
                            range_cnt_col="h1_n")
            .map_batches(sel, batch_format="pandas"))


def q_window_minmax(sf_dir):
    """Frame extrema: per-user rolling min/max of integer cents over
    ``ROWS BETWEEN 4 PRECEDING AND CURRENT ROW``
    (stages/aggregate.window_over_key mm_n) — pandas' C monotonic-deque
    rolling kernel keyed per bucket group, int64 round-trip exact.
    DuckDB min/max OVER frame oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["v_c"] = np.floor(df["value"].to_numpy(np.float64) * 100
                             + 0.5).astype("int64")
        return df

    ds = (_read(sf_dir, "events",
                columns=["event_id", "user_id", "ts", "value"],
                parallel=8)
          .map_batches(cents, batch_format="pandas"))

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "w5_min", "w5_max"]]

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            mm_n=5, mm_value="v_c",
                            mm_min_col="w5_min", mm_max_col="w5_max")
            .map_batches(sel, batch_format="pandas"))


def q_quantile_bykey(sf_dir):
    """EXACT per-key discrete quantiles (stages/aggregate
    .quantile_by_key): p25/p50/p90 of integer cents per event type
    with DuckDB's quantile_disc rank rule ``ceil(p·n)-1`` in integer
    arithmetic — one (key,val) shuffle, per-bucket sort + index
    selection, O(keys×pcts) to the driver.  quantile_disc oracle in
    SQL_TAIL."""
    from ..stages.aggregate import quantile_by_key

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "v_c": np.floor(df["value"].to_numpy(np.float64) * 100
                            + 0.5).astype("int64")})

    ds = (_read(sf_dir, "events", columns=["event_type", "value"],
                parallel=8)
          .map_batches(cents, batch_format="pandas"))
    return quantile_by_key(ds, "event_type", "v_c", [25, 50, 90])


def q_intersect_keys(sf_dir):
    """SQL ``INTERSECT`` on distinct user ids (stages/aggregate
    .set_op_keys): high-value purchasers ∩ high-value error-reporters
    — each side reduces to per-batch-unique keys with a presence bit
    before the one tiny-row shuffle; buckets OR the bits and keep 3.
    DuckDB INTERSECT oracle in SQL_TAIL."""
    from ..stages.aggregate import set_op_keys

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])
    a = ds.map_batches(
        lambda df: df[(df["event_type"] == "purchase")
                      & (df["value"] >= 95)][["user_id"]],
        batch_format="pandas")
    b = ds.map_batches(
        lambda df: df[(df["event_type"] == "error")
                      & (df["value"] >= 95)][["user_id"]],
        batch_format="pandas")
    return set_op_keys(a, b, "user_id", "intersect")


def q_except_keys(sf_dir):
    """SQL ``EXCEPT`` on distinct user ids (stages/aggregate
    .set_op_keys): high-value purchasers minus high-value
    error-reporters — same one-shuffle presence-bit shape, buckets
    keep bits==1.  DuckDB EXCEPT oracle in SQL_TAIL."""
    from ..stages.aggregate import set_op_keys

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])
    a = ds.map_batches(
        lambda df: df[(df["event_type"] == "purchase")
                      & (df["value"] >= 95)][["user_id"]],
        batch_format="pandas")
    b = ds.map_batches(
        lambda df: df[(df["event_type"] == "error")
                      & (df["value"] >= 95)][["user_id"]],
        batch_format="pandas")
    return set_op_keys(a, b, "user_id", "except")


def q_outer_join(sf_dir):
    """FULL OUTER JOIN (stages/join.hash_join how="outer"): rich
    customers (acctbal > 5000, as cents) against per-customer order
    counts — unmatched rows of EITHER side survive exactly once
    because each key lives in one hash bucket; NULL payloads fill with
    a -1 sentinel so both sides stay hash-exact int64 (invariant 6).
    DuckDB FULL OUTER JOIN oracle in SQL_TAIL."""
    from ..stages.aggregate import two_phase_agg
    from ..stages.join import hash_join
    import ray

    cust = (_read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
            .map_batches(lambda df: pd.DataFrame({
                "custkey": df["c_custkey"].astype("int64"),
                "acct_c": np.floor(
                    df["c_acctbal"].to_numpy(np.float64) * 100
                    + 0.5).astype("int64")})
                [lambda d: d["acct_c"] > 500_000],
                batch_format="pandas"))
    ords = two_phase_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        ["o_custkey"], count="n_ord")
    ords = ray.data.from_pandas(
        ords.rename(columns={"o_custkey": "custkey"})
        .astype({"custkey": "int64", "n_ord": "int64"})).repartition(4)

    def seal(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("acct_c", "n_ord"):
            df[c] = df[c].fillna(-1).astype("int64")
        return df[["custkey", "acct_c", "n_ord"]]

    return (hash_join(cust, ords, on="custkey", how="outer")
            .map_batches(seal, batch_format="pandas"))


def q_ndv_bykey(sf_dir):
    """EXACT ``count(DISTINCT user_id) GROUP BY event_type``
    (stages/aggregate.ndv_by_key): per-batch-unique (key, val) pairs
    hash-bucket by both columns, buckets dedupe + partial-count, the
    driver sums O(keys × nparts) ints — the exact complement of the
    HLL approx_distinct_bykey.  DuckDB COUNT(DISTINCT) oracle in
    SQL_TAIL."""
    from ..stages.aggregate import ndv_by_key

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return ndv_by_key(ds, "event_type", "user_id")


def q_upsert_merge(sf_dir):
    """CDC MERGE (stages/join.apply_changelog): customer balances as
    the snapshot, orders as a keyed changelog (op=d when status F,
    else upsert of the order total; o_orderkey = the sequence) —
    last-writer-wins per key after ONE key-hash shuffle, deletes drop
    the key, new-key upserts insert.  DuckDB FULL OUTER + row_number
    oracle in SQL_TAIL."""
    from ..stages.join import apply_changelog

    base = (_read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
            .map_batches(lambda df: pd.DataFrame({
                "k": df["c_custkey"].astype("int64"),
                "v": np.floor(df["c_acctbal"].to_numpy(np.float64) * 100
                              + 0.5).astype("int64")}),
                batch_format="pandas"))
    changes = (_read(sf_dir, "orders",
                     columns=["o_orderkey", "o_custkey",
                              "o_orderstatus", "o_totalprice"])
               .map_batches(lambda df: pd.DataFrame({
                   "k": df["o_custkey"].astype("int64"),
                   "seq": df["o_orderkey"].astype("int64"),
                   "op": np.where(df["o_orderstatus"] == "F", "d", "u"),
                   "v": np.floor(
                       df["o_totalprice"].to_numpy(np.float64) * 100
                       + 0.5).astype("int64")}),
                   batch_format="pandas"))
    import ray  # noqa: F401  (parallel shape documented at the stage)
    res = (apply_changelog(base, changes, "k", "seq", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    return res


def q_warc_roundtrip(sf_dir):
    """WARC container round-trip (sources/warc.py): every document
    wrapped as a WARC/1.0 response record (one .warc.gz per input
    block, member-per-record layout, written to scratch), read back
    with read_warc, and reduced to per-source record counts + payload
    octet totals — proving the archive framing is byte-lossless.
    DuckDB octet-length oracle in SQL_TAIL."""
    import os

    from ..sources.warc import build_warc, read_warc
    from ..stages.aggregate import two_phase_agg

    out = _scratch("warc_rt", sf_dir)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        recs = [{"headers": {
                     "WARC-Type": "response",
                     "WARC-Record-ID": f"<urn:doc:{i}>",
                     "WARC-Date": "2025-01-01T00:00:00Z",
                     "WARC-Target-URI": f"http://corpus/{s}/{i}",
                     "Content-Type":
                         "application/http; msgtype=response"},
                 "block": (b"HTTP/1.1 200 OK\r\n"
                           b"Content-Type: text/plain\r\n\r\n"
                           + t.encode("utf-8"))}
                for i, t, s in zip(df["doc_id"], df["text"],
                                   df["source"])]
        lo = int(df["doc_id"].min())
        path = os.path.join(out, f"part-{lo}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(build_warc(recs, gzip_members=True))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path], "n": [len(df)]})

    (_read(sf_dir, "documents", columns=["doc_id", "text", "source"])
     .map_batches(write_block, batch_format="pandas").materialize())

    ds = read_warc(out + "/")

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        assert (df["http_status"] == 200).all()
        assert not df["truncated"].any()
        return pd.DataFrame({
            "source": df["target_uri"].str.split("/").str[-2],
            "octets": df["payload"].map(len).astype("int64")})

    res = two_phase_agg(ds.map_batches(slim, batch_format="pandas"),
                        ["source"], count="n_docs",
                        sums={"octets": "octets"})
    res["octets"] = res["octets"].astype("int64")
    res["n_docs"] = res["n_docs"].astype("int64")
    return res.sort_values("source").reset_index(drop=True)


def q_crawl_ingest(sf_dir):
    """Composed crawl-ingestion pipeline (pipelines/crawl.py): the
    documents table deterministically archived as charset-mixed
    .warc.gz (north-rule fixture corpus), then WARC read -> charset
    sniff -> tag-strip/sanitize -> 18-language ID -> quality gate,
    with a parquet resume point per stage.  Returns the funnel as
    (kind, key, cnt) rows.  Rows-only driver check; the per-stage
    spec oracles live in t:test_crawl (and charset counts equal the
    oracle-backed q:charset_sniff by construction)."""
    import os

    from ..pipelines.crawl import documents_to_warc, run_crawl_ingest

    root = _scratch("crawl_ingest", sf_dir)
    documents_to_warc(os.path.join(sf_dir, "documents.parquet"),
                      os.path.join(root, "warc"))
    stats = run_crawl_ingest(os.path.join(root, "warc"),
                             os.path.join(root, "out"))
    rows = [("total", "records", stats["n_records"]),
            ("total", "gated", stats["n_gated"])]
    rows += [("charset", k, v) for k, v
             in sorted(stats["by_charset"].items())]
    rows += [("lang", k, v) for k, v
             in sorted(stats["gated_by_lang"].items())]
    return pd.DataFrame(rows, columns=["kind", "key", "cnt"]).astype(
        {"cnt": "int64"})


def q_link_graph(sf_dir):
    """Web link graph from raw archives (stages/parse
    .extract_links_frame): documents warcified WITH planted
    deterministic outlinks (i -> (7i+1)%n, (i+1)%n), WARC read ->
    charset decode -> href extraction + urljoin resolution -> target
    doc-id in-degree via combiner partials.  The DuckDB oracle in
    SQL_TAIL reproduces the link rule arithmetically — the whole
    archive->decode->extract chain must be lossless for the counts to
    match."""
    import os

    from ..pipelines.crawl import documents_to_warc
    from ..sources.warc import read_warc
    from ..stages.parse import extract_links_frame
    from ..stages.text import sniff_decode_row

    n = _doc_count(sf_dir)
    root = _scratch("link_graph", sf_dir)
    documents_to_warc(os.path.join(sf_dir, "documents.parquet"),
                      os.path.join(root, "warc"), links=True, n_docs=n)

    def links(df: pd.DataFrame) -> pd.DataFrame:
        html = df["payload"].map(
            lambda b: sniff_decode_row(bytes(b))[0])
        lk = extract_links_frame(html, df["target_uri"])
        return pd.DataFrame({"doc_id": lk["resolved"]
                             .str.rsplit("/", n=1).str[-1]
                             .astype("int64")})

    ds = read_warc(os.path.join(root, "warc") + "/")
    res = two_phase_agg(ds.map_batches(links, batch_format="pandas"),
                        ["doc_id"], count="indeg")
    res["indeg"] = res["indeg"].astype("int64")
    res["doc_id"] = res["doc_id"].astype("int64")
    return res.sort_values("doc_id").reset_index(drop=True)


def q_robots_filter(sf_dir):
    """Crawl-politeness filter (state/robots.py RobotsPolicy — RFC
    9309 longest-match with Allow tie-break): deterministic URL paths
    from doc_id%5 classes evaluated against a fixed policy
    (Disallow /private/ + Allow /private/pub/ + Disallow /*.gz$ for
    goodbot), counted per verdict.  The broadcast-policy +
    vectorized-match stage shape of every crawl frontier.  The DuckDB
    oracle re-expresses THIS policy's longest-match outcome
    relationally (LIKE algebra) in SQL_TAIL; the RFC semantics
    themselves are pinned in t:test_robots."""
    from ..state.robots import RobotsPolicy

    txt = ("User-agent: goodbot\n"
           "Disallow: /private/\n"
           "Allow: /private/pub/\n"
           "Disallow: /*.gz$\n"
           "User-agent: *\nDisallow: /tmp/\n")
    pol = RobotsPolicy(txt, "goodbot")

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        cls = i % 5
        sid = i.astype(str)
        path = pd.Series(
            np.select(
                [cls == 0, cls == 1, cls == 2, cls == 3],
                ["/public/doc" + sid, "/private/doc" + sid,
                 "/private/pub/doc" + sid, "/data/doc" + sid + ".gz"],
                default="/tmp/doc" + sid),
            index=df.index)
        return pd.DataFrame({"allowed": pol.allowed(path)})

    res = two_phase_agg(ds.map_batches(fx, batch_format="pandas"),
                        ["allowed"])
    return res.sort_values("allowed").reset_index(drop=True)


def q_sitemap_freq(sf_dir):
    """Sitemap discovery round-trip (sources/sitemap.py): documents
    rendered as gzipped urlset files (changefreq by doc_id%3 — the
    deterministic fixture rule), parsed back through read_sitemaps,
    counted per changefreq.  DuckDB CASE oracle in SQL_TAIL — the
    XML framing and gzip member path must be lossless for the counts
    to match."""
    import gzip as _gzip
    import os

    from ..sources.sitemap import read_sitemaps

    out = _scratch("sitemap_freq", sf_dir)
    freqs = {0: "daily", 1: "weekly", 2: "monthly"}

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        ent = "".join(
            f"<url><loc>http://corpus/doc/{i}</loc>"
            f"<lastmod>2025-01-{1 + int(i) % 28:02d}</lastmod>"
            f"<changefreq>{freqs[int(i) % 3]}</changefreq></url>"
            for i in df["doc_id"])
        xml = ('<?xml version="1.0"?><urlset>' + ent
               + "</urlset>").encode()
        lo = int(df["doc_id"].min())
        path = os.path.join(out, f"sm-{lo:08d}.xml.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(_gzip.compress(xml))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path]})

    (_read(sf_dir, "documents", columns=["doc_id"])
     .map_batches(write_block, batch_format="pandas").materialize())

    ds = read_sitemaps(out + "/")

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        assert (df["kind"] == "url").all()
        return df[["changefreq"]]

    res = two_phase_agg(ds.map_batches(slim, batch_format="pandas"),
                        ["changefreq"])
    return res.sort_values("changefreq").reset_index(drop=True)


def q_window_offsets(sf_dir):
    """Offset windows + ratio_to_report: lag(cents,3), lead(cents,2)
    and value/sum-over-partition per user (stages/aggregate
    .window_over_key lag_n/lead_n/ratio_value) — shifts are index
    arithmetic inside the one sorted bucket, the ratio is a single
    float64 division of the same integers the SQL divides
    (bit-identical).  DuckDB lag/lead offset + SUM OVER oracle in
    SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["v_c"] = np.floor(df["value"].to_numpy(np.float64) * 100
                             + 0.5).astype("int64")
        return df

    ds = (_read(sf_dir, "events",
                columns=["event_id", "user_id", "ts", "value"],
                parallel=8)
          .map_batches(cents, batch_format="pandas"))

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "user_id", "l3", "f2", "share"]].copy()
        out["l3"] = out["l3"].fillna(-1).astype("int64")
        out["f2"] = out["f2"].fillna(-1).astype("int64")
        return out

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "v_c",
                            lag_n=3, lag_n_col="l3",
                            lead_n=2, lead_n_col="f2",
                            ratio_value="v_c", ratio_col="share")
            .map_batches(sel, batch_format="pandas"))


def q_overlap_matrix(sf_dir):
    """Audience overlap (stages/aggregate.overlap_matrix): exact
    distinct-user counts for every unordered event-type pair — one
    user-hash shuffle, per-bucket set reduction, O(types²) ints to the
    driver.  DuckDB self-join COUNT(DISTINCT) oracle in SQL_TAIL."""
    from ..stages.aggregate import overlap_matrix

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return overlap_matrix(ds, "user_id", "event_type")


def _purchase_edges(sf_dir):
    """Symmetrized customer<->supplier purchase graph from
    orders |x| lineitem — the edge fixture q:pagerank / q:bfs_hops
    and their distributed variants share."""
    from ..stages.graph import symmetrize_unique_edges
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = (_read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
          .map_batches(lambda df: df.rename(
              columns={"l_orderkey": "o_orderkey"}),
              batch_format="pandas"))
    joined = hash_join(orders, li, "o_orderkey")

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["o_custkey", "l_suppkey"]].drop_duplicates()
        return pd.DataFrame({
            "c": "c" + t["o_custkey"].astype("int64").astype(str),
            "s": "s" + t["l_suppkey"].astype("int64").astype(str)})

    return symmetrize_unique_edges(
        joined.map_batches(local_pairs, batch_format="pandas"),
        "c", "s")


def q_pagerank(sf_dir):
    """Integer PageRank (stages/graph.pagerank_int) over the
    symmetrized customer<->supplier bipartite graph from
    orders |x| lineitem: 3 power iterations in pure int64 micro-units
    (rank//outdeg contributions, 85//100 damping) so the unrolled
    DuckDB oracle in SQL_TAIL matches hash-exactly.  Edges stay a
    Dataset; each iteration broadcasts the O(nodes) rank table and
    ships per-batch partial sums."""
    from ..stages.graph import pagerank_int

    return pagerank_int(_purchase_edges(sf_dir), "src", "dst",
                        iters=3)


def q_bfs_hops(sf_dir):
    """Multi-source BFS distance (stages/graph.bfs_hops) over the
    symmetrized customer<->supplier purchase graph: hops from the
    nation-0 customer cohort, capped at 3 — frontier broadcast per
    round, per-batch unique-destination partials, int distances.
    DuckDB recursive-CTE oracle in SQL_TAIL."""
    from ..stages.graph import bfs_hops

    return bfs_hops(_purchase_edges(sf_dir), "src", "dst",
                    _bfs_sources(sf_dir), max_depth=3)


def _bfs_sources(sf_dir):
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    return sorted("c" + cust.loc[cust["c_nationkey"] == 0,
                                 "c_custkey"]
                  .astype("int64").astype(str))


def q_linreg_bykey(sf_dir):
    """OLS slope/intercept of value cents on second-of-day per
    event_type (stages/aggregate.linreg_by_key — regr_slope/
    regr_intercept): five int64 moment partials per key, one shared
    float64 expression tree per output — bit-identical to the DuckDB
    oracle in SQL_TAIL (the corr_bykey pattern)."""
    from ..stages.aggregate import linreg_by_key

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "xc": (df["ts"].to_numpy().astype("int64") // 1_000_000
                   % 86_400),
            "yc": np.floor(df["value"].to_numpy(np.float64) * 100
                           + 0.5).astype("int64"),
        })

    ds = (_read(sf_dir, "events",
                columns=["event_type", "value", "ts"], parallel=8)
          .map_batches(prep, batch_format="pandas"))
    return linreg_by_key(ds, "event_type", "xc", "yc")


def q_retention(sf_dir):
    """Cohort retention triangle (stages/aggregate.retention_counts):
    users cohorted by first-event date, distinct users active at each
    day offset.  One user-hash shuffle makes the per-bucket distinct
    counts globally exact (a user lives in exactly one bucket) —
    identities never reach the driver.  DuckDB min-date +
    count(DISTINCT) oracle in SQL_TAIL."""
    from ..stages.aggregate import retention_counts

    ds = _read(sf_dir, "events", columns=["user_id", "ts"], parallel=8)
    return retention_counts(ds, "user_id", "ts")


def q_sequence_match(sf_dir):
    """MATCH_RECOGNIZE-lite (stages/aggregate.sequence_match): users
    whose ordered event stream contains a CONSECUTIVE
    view→click→purchase (regex 'vcp' over single-char type codes —
    adjacency, which the gap-tolerant funnel can't express).  One
    user-hash shuffle, one compiled-regex pass per user sequence;
    DuckDB string_agg + regexp_matches oracle in SQL_TAIL."""
    from ..stages.aggregate import sequence_match

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"],
               parallel=8)
    alpha = {"view": "v", "click": "c", "purchase": "p",
             "error": "e", "signup": "s"}
    return sequence_match(ds, "user_id", ["ts", "event_id"],
                          "event_type", "vcp", alphabet=alpha)


def q_table_diff(sf_dir):
    """Snapshot diff (stages/join.table_diff): orders vs a
    deterministically mutated second snapshot (urgent rows dropped →
    'removed', pending prices doubled → 'changed', finished rows
    re-keyed +10^9 → 'added'); identical rows never leave the
    workers — the shuffle moves (key, two 64-bit content hashes) per
    row, and the output is only the CHANGE SET.  DuckDB FULL OUTER
    JOIN oracle in SQL_TAIL builds the same snapshot B."""
    from ..stages.join import table_diff

    def snap_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": df["o_orderkey"],
            "st": df["o_orderstatus"],
            "price_c": np.floor(df["o_totalprice"].to_numpy(np.float64)
                                * 100 + 0.5).astype("int64"),
            "prio": df["o_orderpriority"]})

    def snap_b(df: pd.DataFrame) -> pd.DataFrame:
        a = snap_a(df)
        keep = a[a["prio"] != "1-URGENT"].copy()
        keep.loc[keep["st"] == "P", "price_c"] *= 2
        added = a[a["st"] == "F"].copy()
        added["k"] = added["k"] + 1_000_000_000
        return (pd.concat([keep, added], ignore_index=True)
                [["k", "st", "price_c"]])

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"]
    left = (_read(sf_dir, "orders", columns=cols)
            .map_batches(snap_a, batch_format="pandas"))
    right = (_read(sf_dir, "orders", columns=cols)
             .map_batches(snap_b, batch_format="pandas"))
    return table_diff(left, right, "k", ["st", "price_c"])


def q_event_paths(sf_dir):
    """Top-10 3-step event-type paths per user stream
    (stages/aggregate.event_paths): behavioral-sequence mining — one
    user-hash shuffle, per-bucket shifted-array path build that never
    crosses users, pre-counted before anything moves.  DuckDB
    lead()-window oracle in SQL_TAIL (deterministic rank-k
    tie-break)."""
    from ..stages.aggregate import event_paths

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"],
               parallel=8)
    return event_paths(ds, "user_id", ["ts", "event_id"], "event_type",
                       n=3, k=10)


def q_approx_distinct_bykey(sf_dir):
    """Per-key approximate distinct (stages/sketch.approx_distinct_per_key):
    distinct users per event_type via mergeable per-key HLL register
    blobs — the wire carries O(batches × keys × 2^p) bytes regardless
    of value cardinality.  Rows-only driver check; the error bound and
    merge-associativity are pinned in pytest."""
    from ..stages.sketch import approx_distinct_per_key

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"],
               parallel=8)
    return approx_distinct_per_key(ds, "event_type", "user_id")


def q_resample_counts(sf_dir):
    """Per-user time-series resampling
    (stages/aggregate.resample_counts): an hourly grid per user from
    ceil(first event) to floor(last event), each grid point carrying
    the cumulative event count — regularizing an irregular stream.
    All boundary math int64 microseconds (integer ceil), mirrored by
    an epoch_us()/integer-division DuckDB oracle in SQL_TAIL — no
    float epoch arithmetic on either side."""
    from ..stages.aggregate import resample_counts

    ds = _read(sf_dir, "events", columns=["user_id", "ts"], parallel=8)
    return resample_counts(ds, "user_id", "ts")


def q_cube_counts(sf_dir):
    """GROUP BY CUBE (stages/aggregate.cube_agg): order counts +
    total-price cents by every subset of (orderstatus, orderpriority)
    — one distributed combiner pass, all four levels derived from the
    finest groups on the driver.  DuckDB CUBE oracle in SQL_TAIL."""
    from ..stages.aggregate import cube_agg

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["p_c"] = np.floor(df["o_totalprice"].to_numpy(np.float64)
                             * 100 + 0.5).astype("int64")
        return df[["o_orderstatus", "o_orderpriority", "p_c"]]

    ds = (_read(sf_dir, "orders",
                columns=["o_orderstatus", "o_orderpriority",
                         "o_totalprice"])
          .map_batches(cents, batch_format="pandas"))
    return cube_agg(ds, ["o_orderstatus", "o_orderpriority"],
                    sums={"p_c": "sum_price_c"})


def q_asof_forward(sf_dir):
    """Forward as-of join with tolerance (stages/join.asof_join
    direction='forward'): for each purchase, the user's NEXT error
    event within 24 h — pd.merge_asof inside co-located key buckets,
    one hash shuffle.  DuckDB bounded-min subquery oracle in
    SQL_TAIL."""
    from ..stages.join import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])
    purchases = ev.map_batches(
        lambda df: df[df["event_type"] == "purchase"]
        [["event_id", "user_id", "ts"]], batch_format="pandas")
    ev2 = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    errors = ev2.map_batches(
        lambda df: df[df["event_type"] == "error"]
        .assign(next_error=lambda x: x["ts"])
        [["user_id", "ts", "next_error"]], batch_format="pandas")
    out = asof_join(purchases, errors, key="user_id", ts="ts",
                    right_cols=["next_error"], direction="forward",
                    tolerance=pd.Timedelta(days=1))
    return out.select_columns(["event_id", "user_id", "next_error"])


def q_window_nth(sf_dir):
    """nth_value(value, 3) over the whole per-user partition
    (stages/aggregate.window_over_key nth_n): the third event's value
    bit-copied to every row of the partition, NULL for users with
    fewer than three events.  DuckDB nth_value oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"],
               parallel=8)

    def sel(df: pd.DataFrame) -> pd.DataFrame:
        return df[["event_id", "user_id", "third_v"]]

    return (window_over_key(ds, "user_id", ["ts", "event_id"], "value",
                            nth_n=3, nth_col="third_v")
            .map_batches(sel, batch_format="pandas"))


def q_grouping_sets(sf_dir):
    """GROUP BY GROUPING SETS ((status), (priority), ()) —
    stages/aggregate.grouping_sets_agg, the generic form rollup/cube
    specialize: exactly the requested subsets from ONE distributed
    combiner pass, coarser sets derived from the finest groups on the
    driver.  DuckDB GROUPING SETS oracle in SQL_TAIL."""
    from ..stages.aggregate import grouping_sets_agg

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["p_c"] = np.floor(df["o_totalprice"].to_numpy(np.float64)
                             * 100 + 0.5).astype("int64")
        return df[["o_orderstatus", "o_orderpriority", "p_c"]]

    ds = (_read(sf_dir, "orders",
                columns=["o_orderstatus", "o_orderpriority",
                         "o_totalprice"])
          .map_batches(cents, batch_format="pandas"))
    return grouping_sets_agg(
        ds, ["o_orderstatus", "o_orderpriority"],
        [("o_orderstatus",), ("o_orderpriority",), ()],
        sums={"p_c": "sum_price_c"})


def q_unpivot(sf_dir):
    """UNPIVOT lineitem's three money/quantity measures into
    (measure, val_c) long rows (stages/aggregate.unpivot) — row-local
    melt in one map_batches, no shuffle, 3× the input rows streamed
    block by block.  DuckDB UNION-ALL oracle in SQL_TAIL."""
    from ..stages.aggregate import unpivot

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"l_orderkey": df["l_orderkey"],
                            "l_linenumber": df["l_linenumber"]})
        for src, dst in (("l_quantity", "qty_c"),
                         ("l_extendedprice", "price_c"),
                         ("l_discount", "disc_c")):
            out[dst] = np.floor(df[src].to_numpy(np.float64) * 100
                                + 0.5).astype("int64")
        return out

    ds = (_read(sf_dir, "lineitem",
                columns=["l_orderkey", "l_linenumber", "l_quantity",
                         "l_extendedprice", "l_discount"])
          .map_batches(cents, batch_format="pandas"))
    return unpivot(ds, ["l_orderkey", "l_linenumber"],
                   ["qty_c", "price_c", "disc_c"],
                   var_name="measure", value_name="val_c")


def q_mode_bykey(sf_dir):
    """Per-user modal event type (stages/aggregate.group_topk, k=1):
    deterministic SQL tie rule (count desc, type asc) — combiner
    partials shuffle (user, type, n) triples only.  DuckDB
    row_number-over-count oracle in SQL_TAIL."""
    from ..stages.aggregate import group_topk

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    top = group_topk(ds, "user_id", "event_type", 1, cnt="n")
    if not isinstance(top, pd.DataFrame):
        top = top.to_pandas()
    return (top[["user_id", "event_type", "n"]]
            .rename(columns={"event_type": "mode_type"})
            .sort_values("user_id").reset_index(drop=True))


def q_funnel(sf_dir):
    """Ordered funnel over the event stream
    (stages/aggregate.funnel_counts): users who did view, then click
    strictly after their first view, then purchase strictly after
    that — the product-analytics staple.  One user-hash shuffle;
    per-bucket vectorized step chain; |steps| ints per bucket reach
    the driver.  DuckDB min-timestamp-chain oracle in SQL_TAIL."""
    from ..stages.aggregate import funnel_counts

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"], parallel=8)
    return funnel_counts(ds, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"])


def q_knn_ivf(sf_dir):
    """IVF ANN variant: k-means coarse quantizer (fit on a driver-side
    sample, centroids broadcast) + probed-cluster search.  Rows-only
    driver check; recall contract and full-probe==bruteforce equality
    pinned in pytest."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_ivf

    head = pq.read_table(f"{sf_dir}/embeddings.parquet").slice(0, 5).to_pandas()
    queries = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].tolist()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_ivf(ds, "embedding", "vec_id", queries, qids, k=5,
                   n_centroids=16, n_probe=4)


def q_ann_store(sf_dir):
    """Persisted IVF vector index (stages/vecstore.py — the third
    store on the shared generation protocol): build on the embeddings
    table, append an increment of perturbed copies, query the
    originals against base + committed generations with a pruned
    probed-list read.  Rows-only driver check; exactness, torn-append
    invisibility and build+append == one-shot pinned in
    tests/test_vecstore.py."""
    import ray.data

    from ..stages.vecstore import (append_ivf_index, build_ivf_index,
                                   ivf_query_index)

    out = _scratch("annstore", sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    build_ivf_index(ds, "embedding", "vec_id", out, n_centroids=16)

    head = (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                  columns=["vec_id", "embedding"])
            .limit(8).to_pandas())
    vecs = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    inc = pd.DataFrame({
        "vec_id": (head["vec_id"].to_numpy("int64") + 5_000_000),
        "embedding": list((vecs + 0.01).astype(np.float32))})
    append_ivf_index(ray.data.from_pandas(inc), out, "inc1")

    res = ivf_query_index(out, vecs, head["vec_id"].tolist(), k=3,
                          n_probe=4)
    return res.astype({"qid": "int64", "id": "int64", "rank": "int64"})


def _synth_png_ds(sf_dir):
    """documents doc_ids -> (doc_id, png) Dataset: each row a REAL PNG
    encoded from the closed-form fixture image (stages/multimodal
    .synth_image) with cycling row filters, multi-IDAT splitting and
    Adam7 interlace every 5th doc — so decoding exercises every codec
    branch under the hash gate."""
    from ..stages.multimodal import synth_image
    from ..state.pngwire import encode_png

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        pngs = [encode_png(synth_image(int(i)), filters="cycle",
                           interlace=1 if i % 5 == 0 else 0,
                           idat_size=96)
                for i in ids]
        return pd.DataFrame({"doc_id": ids.to_numpy(), "png": pngs})

    return (_read(sf_dir, "documents", columns=["doc_id"])
            .map_batches(synth, batch_format="pandas"))


def q_media_features(sf_dir):
    """Multimodal decode with REAL pixels: deterministic PNG fixtures
    (all color types / filters / interlace modes) through the
    actor-pool decode stage (state/pngwire from-spec decoder) ->
    (width, height, channels, round-half-up mean sample).  The
    SQL_TAIL oracle recomputes the same stats CLOSED-FORM from doc_id
    in DuckDB — pixel math is hash-gated end-to-end."""
    from ..stages.multimodal import media_features

    out = media_features(_synth_png_ds(sf_dir), "png", strict=True,
                         concurrency=(1, 8), batch_size=256)
    res = (out.select_columns(["doc_id", "width", "height", "channels",
                               "pix_mean_milli"]).to_pandas())
    return (res.astype("int64").sort_values("doc_id")
            .reset_index(drop=True))


def q_media_thumbnail(sf_dir):
    """Real box-filter resize: PNG fixtures -> ThumbnailStage (decode,
    4x3 round-half-up bucket means, re-encode) -> decode the thumb
    back and sum its samples.  SQL_TAIL oracle restates the bucket
    partition (src col x -> bucket x·tw//w) and integer means in
    DuckDB."""
    from ..stages.multimodal import thumbnails
    from ..state.pngwire import decode_png

    out = thumbnails(_synth_png_ds(sf_dir), "png", tw=4, th=3,
                     strict=True, concurrency=(1, 8), batch_size=256)

    def tsum(df: pd.DataFrame) -> pd.DataFrame:
        sums = [int(decode_png(bytes(t))[0].sum(dtype=np.int64))
                for t in df["thumb"]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64").to_numpy(),
            "thumb_w": df["thumb_w"].astype("int64").to_numpy(),
            "thumb_h": df["thumb_h"].astype("int64").to_numpy(),
            "thumb_sum": np.asarray(sums, dtype=np.int64)})

    res = out.map_batches(tsum, batch_format="pandas").to_pandas()
    return (res.astype("int64").sort_values("doc_id")
            .reset_index(drop=True))


def q_media_frames(sf_dir):
    """Real video-container walk: deterministic animated PNGs (2-5
    full frames each) through FrameSampleStage — APNG fcTL/fdAT
    sequence decode, per-spec compositing, even sampling of
    min(3, total) frames, re-encode.  Output (doc_id, frame_idx,
    frame_mean_milli) matches the SQL_TAIL closed-form oracle."""
    from ..stages.multimodal import sample_frames, synth_image
    from ..state.pngwire import encode_apng

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        pngs = []
        for i in ids:
            i = int(i)
            w, h, nf = 8 + i % 5, 6 + i % 3, 2 + i % 4
            pngs.append(encode_apng(
                [synth_image(i, salt=f, w=w, h=h, nc=3)
                 for f in range(nf)], idat_size=128))
        return pd.DataFrame({"doc_id": ids.to_numpy(), "png": pngs})

    ds = (_read(sf_dir, "documents", columns=["doc_id"])
          .map_batches(synth, batch_format="pandas"))
    out = sample_frames(ds, media_col="png", id_col="doc_id",
                        n_frames=3, strict=True,
                        concurrency=(1, 8), batch_size=256)
    res = (out.select_columns(["doc_id", "frame_idx",
                               "frame_mean_milli"]).to_pandas())
    return (res.astype("int64").sort_values(["doc_id", "frame_idx"])
            .reset_index(drop=True))


def q_dedup_embed(sf_dir):
    """Embedding-cosine near-dup for an UNBLOCKED corpus: multiprobe
    hyperplane-LSH blocking → per-bucket GEMM verify → distributed
    pair dedup.  The synthetic embeddings are near-orthogonal, so
    deterministic perturbed copies are planted first (the corpus-with-
    duplicates shape); rows-only driver check, recall pinned in
    pytest (test_dedup_text)."""
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.dedup import embedding_neardup_lsh

    df = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    rng = np.random.RandomState(13)
    copies = df.iloc[::10].copy()
    copies["vec_id"] = copies["vec_id"] + 1_000_000
    copies["embedding"] = copies["embedding"].map(
        lambda v: (np.asarray(v) + rng.normal(0, 0.01, len(v)))
        .astype(np.float32))
    df = pd.concat([df, copies], ignore_index=True)
    ds = ray.data.from_pandas(df[["vec_id", "embedding"]]).repartition(16)
    return embedding_neardup_lsh(ds, "vec_id", "embedding", threshold=0.95,
                                 as_dataset=True)


def q_runs_compress(sf_dir):
    """pmlastmsg 'message repeated n times' as a stream compression:
    collapse runs of equal event_type per user into (user, island,
    event_type, n)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        st = (g["event_type"] != g["event_type"].shift()).cumsum()
        out = (g.groupby(st).agg(et=("event_type", "first"),
                                 n=("event_type", "size"))
               .reset_index(drop=True))
        out.insert(0, "island", np.arange(1, len(out) + 1, dtype="int64"))
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n"] = out["n"].astype("int64")
        return out

    return ds.groupby("user_id").map_groups(runs, batch_format="pandas")


# ======================================================================
# SQL oracles (DuckDB) — names and aliases must match the Ray outputs
# ======================================================================

# DuckDB oracles for TAIL entries (positions past the driver's 50-query
# gate window).  oracle_sql() exposes only SQL — the driver contract
# pins positions 1-50 as exactly the oracle-backed set
# (tests/test_property.py) — but tools/check_correctness.py verifies
# these too, so tail entries with SQL-expressible semantics still get
# the full rows+schema+hash comparison locally.
SQL_TAIL: dict[str, str] = {
    # q_redirect_resolve: the oracle states the chain's CLOSED FORM
    # (final = i - i%4); the engine must reach it via pointer-jumping
    # hash-join rounds.
    "redirect_resolve": """
        SELECT doc_id, CAST(doc_id - doc_id % 4 AS BIGINT) AS final_id
        FROM documents WHERE doc_id % 4 <> 0 ORDER BY doc_id
    """,
    # q_hits_scores: two unrolled HITS half-iterations over the
    # arithmetic link rule, integer micro-unit scaling by max-division
    # (invariant 6: sum() is HUGEINT -> cast).
    "hits_scores": """
        WITH nn AS (SELECT count(*) AS c FROM documents),
        e AS (
          SELECT doc_id AS src, (doc_id * 7 + 1) % nn.c AS dst
          FROM documents, nn
          UNION ALL
          SELECT doc_id AS src, (doc_id + 1) % nn.c AS dst
          FROM documents, nn
        ),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        a1 AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS a
               FROM e GROUP BY dst),
        h1 AS (SELECT e.src AS node,
                      CAST(sum(coalesce(a1.a, 0)) AS BIGINT) AS h
               FROM e LEFT JOIN a1 ON a1.node = e.dst GROUP BY e.src),
        a2 AS (SELECT e.dst AS node,
                      CAST(sum(coalesce(h1.h, 0)) AS BIGINT) AS a
               FROM e LEFT JOIN h1 ON h1.node = e.src GROUP BY e.dst)
        SELECT nodes.node,
               CAST(coalesce(a2.a, 0) * 1000000
                    // (SELECT max(a) FROM a2) AS BIGINT) AS auth_u,
               CAST(coalesce(h1.h, 0) * 1000000
                    // (SELECT max(h) FROM h1) AS BIGINT) AS hub_u
        FROM nodes LEFT JOIN a2 ON a2.node = nodes.node
                   LEFT JOIN h1 ON h1.node = nodes.node
        ORDER BY nodes.node
    """,
    # q_url_frontier: NOT EXISTS dedupe vs the seen set, then per-host
    # priority top-5 (row_number, ties broken by event_id).
    "url_frontier": """
        WITH cand AS (
          SELECT event_id, user_id % 20 AS host,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS prio
          FROM events
        ),
        fresh AS (
          SELECT * FROM cand c
          WHERE NOT EXISTS (SELECT 1 FROM cand s
                            WHERE s.event_id % 3 = 0
                              AND s.event_id = c.event_id)
        )
        SELECT CAST(host AS BIGINT) AS host, event_id, prio
        FROM (SELECT *, row_number() OVER
                (PARTITION BY host ORDER BY prio DESC, event_id) AS rn
              FROM fresh)
        WHERE rn <= 5 ORDER BY host, event_id
    """,
    # q_mix_budget: per-source greedy (largest-first) cumulative char
    # budget; the running sum is integer so every prefix is exact.
    "mix_budget": """
        SELECT doc_id, lang, CAST(cum AS BIGINT) AS cum_chars
        FROM (SELECT doc_id, lang,
                     sum(n_chars) OVER
                       (PARTITION BY lang
                        ORDER BY n_chars DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents)
        WHERE cum <= 20000 ORDER BY doc_id
    """,
    # q_anchor_text: the planted labeled-link rule re-stated
    # arithmetically; string_agg order (src, anchor) matches the
    # engine's group_concat order columns.
    "anchor_text": """
        WITH nn AS (SELECT count(*) AS c FROM documents),
        e AS (
          SELECT (doc_id * 7 + 1) % nn.c AS t, doc_id AS s,
                 'w' || CAST(doc_id AS VARCHAR) AS a
          FROM documents, nn
          UNION ALL
          SELECT (doc_id + 1) % nn.c, doc_id,
                 'x' || CAST(doc_id AS VARCHAR)
          FROM documents, nn
        )
        SELECT t AS doc_id,
               string_agg(a, ' ' ORDER BY s, a) AS anchors,
               CAST(count(*) AS BIGINT) AS n_anchors
        FROM e GROUP BY t ORDER BY t
    """,
    # q_main_content: the planted page's block outcome in string
    # algebra — document text kept iff >= 5 words (single-spaced
    # fixture: spaces >= 4), the 7-word marker block always kept,
    # nav/footer always dropped.
    "main_content": """
        SELECT doc_id,
               CASE WHEN length(text) - length(replace(text, ' ', ''))
                         >= 4
                    THEN text || chr(10) || 'end of document '
                         || CAST(doc_id AS VARCHAR)
                         || ' marker words here'
                    ELSE 'end of document '
                         || CAST(doc_id AS VARCHAR)
                         || ' marker words here'
               END AS main_text
        FROM documents ORDER BY doc_id
    """,
    # q_page_meta: the planted title / meta-description strings
    # rebuilt arithmetically.
    "page_meta": """
        SELECT doc_id,
               'doc ' || CAST(doc_id AS VARCHAR) AS title,
               'summary of document ' || CAST(doc_id AS VARCHAR)
                   || ' in ' || lang AS meta_desc
        FROM documents ORDER BY doc_id
    """,
    # q_bottomk_sample: same md5-of-id-string hash order, same
    # doc_id tiebreak.
    "bottomk_sample": """
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents ORDER BY h, doc_id LIMIT 20
    """,
    # q_triangle_count: three-way self-join over the canonical
    # undirected unique edges of the arithmetic link rule.
    "triangle_count": """
        WITH nn AS (SELECT count(*) AS c FROM documents),
        e0 AS (
          SELECT doc_id AS a, (doc_id * 7 + 1) % nn.c AS b
          FROM documents, nn
          UNION ALL
          SELECT doc_id, (doc_id + 1) % nn.c FROM documents, nn
        ),
        e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM e0 WHERE a <> b)
        SELECT CAST(count(*) AS BIGINT) AS triangles
        FROM e x JOIN e y ON y.u = x.u AND y.v > x.v
                 JOIN e z ON z.u = x.v AND z.v = y.v
    """,
    # q_wet_roundtrip: write_wet -> read_warc must be the identity on
    # (doc_id, text).
    "wet_roundtrip": """
        SELECT doc_id, text FROM documents ORDER BY doc_id
    """,
    # q_cdx_index: the CDXJ lines' SQL-derivable columns re-derived
    # from the deterministic documents_to_warc fixture rule (host
    # 'corpus' is dot-free, so its SURT is 'corpus)'; the capture date
    # is fixed).  offset/length/digest are pinned by pytest seeks.
    "cdx_index": """
        SELECT 'corpus)/' || lang || '/' || CAST(doc_id AS VARCHAR)
                   AS surt,
               '20250101000000' AS ts,
               'http://corpus/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) AS uri,
               'text/html' AS mime,
               CAST(200 AS BIGINT) AS status
        FROM documents ORDER BY surt, ts, uri
    """,
    # q_cdx_lookup: point lookups re-derived from the fixture rule;
    # the PRUNING (shards opened) is pinned by pytest, the VALUES here.
    "cdx_lookup": """
        SELECT 'http://corpus/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) AS q,
               'corpus)/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) AS surt,
               '20250101000000' AS ts,
               'http://corpus/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) AS uri,
               'text/html' AS mime,
               CAST(200 AS BIGINT) AS status
        FROM documents WHERE doc_id % 97 = 0 ORDER BY q
    """,
    # q_revisit_dedup: two utf-8 snapshots of every document ->
    # revisit kinds via a window min over the fixed-width (ts || uri)
    # composite; payload-digest classes == text classes because the
    # fixture payload IS the utf-8 text.
    "revisit_dedup": """
        WITH caps AS (
          SELECT 'http://corpus/' || lang || '/'
                     || CAST(doc_id AS VARCHAR) AS uri,
                 '20250101000000' AS ts, text FROM documents
          UNION ALL
          SELECT 'http://corpus/' || lang || '/'
                     || CAST(doc_id AS VARCHAR),
                 '20250102000000', text FROM documents
        ), w AS (
          SELECT uri, ts,
                 min(ts || uri) OVER (PARTITION BY text) AS first_cap
          FROM caps
        )
        SELECT uri, ts,
               CASE WHEN ts || uri = first_cap
                    THEN 'response' ELSE 'revisit' END AS kind,
               CASE WHEN ts || uri = first_cap
                    THEN '' ELSE substr(first_cap, 15) END AS ref_uri,
               CASE WHEN ts || uri = first_cap
                    THEN '' ELSE substr(first_cap, 1, 14) END AS ref_ts
        FROM w ORDER BY uri, ts
    """,
    # q_bottomk_bykey: same per-key md5 order, k = 3.
    "bottomk_bykey": """
        SELECT lang, doc_id, h FROM (
          SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                 row_number() OVER
                   (PARTITION BY lang ORDER BY
                    md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= 3 ORDER BY lang, h
    """,
    # q_fetch_schedule: slot = (per-host rank - 1) * host delay.
    "fetch_schedule": """
        SELECT CAST(user_id % 20 AS BIGINT) AS host, event_id,
               CAST((row_number() OVER
                       (PARTITION BY user_id % 20 ORDER BY event_id)
                     - 1) * (1 + (user_id % 20) % 3) AS BIGINT)
                   AS slot_s
        FROM events ORDER BY event_id
    """,
    # q_exact_quantiles: same integer rank rule r = (pct*n + 99)//100,
    # 1-indexed over the sorted non-null values; the engine's
    # histogram-refinement selection returns the identical element.
    "exact_quantiles": """
        WITH s AS (
          SELECT value AS v,
                 row_number() OVER (ORDER BY value) AS rn
          FROM events WHERE value IS NOT NULL
        ),
        n AS (SELECT count(*) AS c FROM s),
        qs(q_pct) AS (VALUES (25), (50), (75), (90), (99))
        SELECT CAST(qs.q_pct AS BIGINT) AS q_pct, s.v AS value
        FROM qs, n
        JOIN s ON s.rn = GREATEST(1, (qs.q_pct * n.c + 99) // 100)
        ORDER BY q_pct
    """,
    # q_semi_join / q_anti_join: SQL EXISTS / NOT EXISTS equality
    # semantics (left null keys match nothing).
    "semi_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
        ORDER BY c_custkey
    """,
    "anti_join": """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        ORDER BY c_custkey
    """,
    # q_rollup_counts: integer cents per ROW before any sum, so every
    # rollup level is order-exact; count/sum cast to BIGINT
    # (invariant 6: DuckDB sum() is HUGEINT).
    "rollup_counts": """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_c
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
    # q_window_funcs: same window — ROWS UNBOUNDED PRECEDING is the
    # row_number/lag default frame; running sum over per-row integer
    # cents so every prefix is order-exact.
    "window_funcs": """
        SELECT event_id, user_id,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               lag(value) OVER w AS prev_value,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS run_sum_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    # q_string_agg: same order key, same separator.
    "string_agg": """
        SELECT c_nationkey,
               string_agg(c_name, ',' ORDER BY c_custkey) AS names
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    # q_pivot_counts: CASE-WHEN/FILTER pivot of the (hr, type) counts.
    "pivot_counts": """
        SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                   AS click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                   AS error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
                   AS signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                   AS view
        FROM events GROUP BY 1 ORDER BY 1
    """,
    # q_compact_store: parity-split write+append then compaction must
    # serve the identical band as the plain events table.
    "compact_store": """
        SELECT event_id, value FROM events
        WHERE value >= 100.0 AND value < 200.0
        ORDER BY event_id
    """,
    # q_range_store: the store must serve exactly the band, values
    # bit-copied (right-open interval on both sides).
    "range_store": """
        SELECT event_id, value FROM events
        WHERE value >= 100.0 AND value < 200.0
        ORDER BY event_id
    """,
    # q_window_dist: tie-free order (ts, event_id) makes rank == rn,
    # so both ratios are the same integer divisions on both sides.
    "window_dist": """
        SELECT event_id, user_id,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume_dist
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    # q_window_bounds: whole-partition frame so last_value sees the
    # real end, both bit-copies.
    "window_bounds": """
        SELECT event_id, user_id,
               first_value(value) OVER w AS first_v,
               last_value(value) OVER w AS last_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
        ORDER BY event_id
    """,
    # q_stats_bykey: statistics from exact integer sums, the same
    # float64 expression tree as the engine (keep in sync with
    # aggregate.stats_by_key).
    "stats_bykey": """
        WITH b AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc
          FROM events
        ),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_i,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(xc) AS DOUBLE) AS sx,
                 CAST(sum(xc * xc) AS DOUBLE) AS sxx
          FROM b GROUP BY event_type
        )
        SELECT event_type, n_i AS n, sx / n AS mean,
               sqrt((n * sxx - sx * sx) / (n * (n - 1.0))) AS stddev
        FROM m ORDER BY event_type
    """,
    # q_argmax_bykey: the deterministic max_by — extreme value, then
    # smallest payload; value is a bit-copy.
    "argmax_bykey": """
        SELECT user_id, value, event_id FROM (
          SELECT user_id, value, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events
        ) WHERE rn = 1 ORDER BY user_id
    """,
    # q_corr_bykey: integer moment sums, then the SAME float64
    # expression tree as the engine (keep in sync with
    # aggregate.corr_by_key) — bit-identical output.
    "corr_bykey": """
        WITH b AS (
          SELECT event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS xc,
                 epoch_us(ts) // 1000000 % 86400 AS yc
          FROM events
        ),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(xc) AS DOUBLE) AS sx,
                 CAST(sum(yc) AS DOUBLE) AS sy,
                 CAST(sum(xc * xc) AS DOUBLE) AS sxx,
                 CAST(sum(xc * yc) AS DOUBLE) AS sxy,
                 CAST(sum(yc * yc) AS DOUBLE) AS syy
          FROM b GROUP BY event_type
        )
        SELECT event_type,
               (n * sxy - sx * sy)
               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                   AS corr
        FROM m ORDER BY event_type
    """,
    # q_retention: cohort rendered as a %Y-%m-%d string on both sides;
    # offsets are whole days between event date and first-event date.
    "retention": """
        WITH f AS (
          SELECT user_id, CAST(min(ts) AS DATE) AS d0
          FROM events GROUP BY user_id
        )
        SELECT strftime(f.d0, '%Y-%m-%d') AS cohort,
               CAST(datediff('day', f.d0, CAST(e.ts AS DATE))
                    AS BIGINT) AS day_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM events e JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # q_sequence_match: same single-char encoding, same regex, same
    # (ts, event_id) order.
    "sequence_match": """
        WITH s AS (
          SELECT user_id,
                 string_agg(CASE event_type
                              WHEN 'view' THEN 'v'
                              WHEN 'click' THEN 'c'
                              WHEN 'purchase' THEN 'p'
                              WHEN 'error' THEN 'e'
                              WHEN 'signup' THEN 's' END,
                            '' ORDER BY ts, event_id) AS seq
          FROM events GROUP BY user_id
        )
        SELECT user_id FROM s WHERE regexp_matches(seq, 'vcp')
        ORDER BY user_id
    """,
    # q_window_rank: lead is a bit-copy; ntile follows the standard
    # larger-buckets-first split.
    "window_rank": """
        SELECT event_id, user_id,
               lead(value) OVER w AS next_value,
               CAST(ntile(4) OVER w AS BIGINT) AS tile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    "window_frame": """
        SELECT event_id, user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    OVER w AS BIGINT) AS w3_sum,
               CAST(count(*) OVER w AS BIGINT) AS w3_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "window_ties": """
        SELECT event_id, user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000 AS v_b,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY
                     CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000)
        ORDER BY event_id
    """,
    # q_table_diff: snapshot B built identically in SQL; the diff is a
    # FULL OUTER JOIN with a value-equality CASE, change set only.
    "table_diff": """
        WITH a AS (
          SELECT o_orderkey AS k, o_orderstatus AS st,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     AS price_c,
                 o_orderpriority AS prio
          FROM orders
        ),
        b AS (
          SELECT k, st,
                 CASE WHEN st = 'P' THEN price_c * 2
                      ELSE price_c END AS price_c
          FROM a WHERE prio <> '1-URGENT'
          UNION ALL
          SELECT k + 1000000000, st, price_c FROM a WHERE st = 'F'
        )
        SELECT COALESCE(a.k, b.k) AS k,
               CASE WHEN b.k IS NULL THEN 'removed'
                    WHEN a.k IS NULL THEN 'added'
                    ELSE 'changed' END AS status
        FROM a FULL OUTER JOIN b ON a.k = b.k
        WHERE b.k IS NULL OR a.k IS NULL
           OR a.st <> b.st OR a.price_c <> b.price_c
        ORDER BY k
    """,
    # q_event_paths: lead()-window trigrams per user, strict (ts,
    # event_id) order, deterministic rank-k tie-break.
    "event_paths": """
        WITH w AS (
          SELECT event_type AS e1,
                 lead(event_type, 1) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
                 lead(event_type, 2) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS e3
          FROM events
        )
        SELECT e1 || '>' || e2 || '>' || e3 AS path,
               CAST(count(*) AS BIGINT) AS cnt
        FROM w WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10
    """,
    # q_resample_counts: integer-us grid boundaries (ceil via integer
    # division) and make_timestamp(us) grid points — bit-exact vs the
    # engine's int64 math.
    "resample_counts": """
        WITH b AS (
          SELECT user_id,
                 (epoch_us(min(ts)) + 3599999999) // 3600000000 AS lo_h,
                 epoch_us(max(ts)) // 3600000000 AS hi_h
          FROM events GROUP BY user_id
        ),
        grid AS (
          SELECT user_id,
                 unnest(generate_series(lo_h, hi_h)) AS gh
          FROM b WHERE lo_h <= hi_h
        )
        SELECT g.user_id,
               make_timestamp(g.gh * 3600000000) AS gts,
               CAST(count(e.ts) AS BIGINT) AS n_events
        FROM grid g
        JOIN events e
          ON e.user_id = g.user_id
         AND epoch_us(e.ts) <= g.gh * 3600000000
        GROUP BY g.user_id, g.gh
        ORDER BY g.user_id, gts
    """,
    # q_cube_counts: per-row integer cents before any sum (invariant 6).
    "cube_counts": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_c
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
    "window_range": """
        SELECT event_id, user_id,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    OVER w AS BIGINT) AS h1_sum,
               CAST(count(*) OVER w AS BIGINT) AS h1_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)
        ORDER BY event_id
    """,
    "composite_join": """
        WITH l1 AS (SELECT l_orderkey AS k1, l_linenumber AS k2,
                           CAST(floor(l_quantity * 100 + 0.5)
                                AS BIGINT) AS qty_c,
                           l_returnflag
                    FROM lineitem WHERE l_quantity > 25),
             l2 AS (SELECT l_orderkey AS k1, l_linenumber AS k2,
                           CAST(floor(l_extendedprice * 100 + 0.5)
                                AS BIGINT) AS price_c
                    FROM lineitem WHERE l_discount > 0.05)
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qty_c) AS BIGINT) AS qty_c,
               CAST(sum(price_c) AS BIGINT) AS price_c
        FROM l1 JOIN l2 USING (k1, k2)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "window_offsets": """
        WITH c AS (SELECT event_id, user_id, ts,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                              AS v_c
                   FROM events)
        SELECT event_id, user_id,
               lag(v_c, 3, -1) OVER w AS l3,
               lead(v_c, 2, -1) OVER w AS f2,
               v_c / sum(v_c) OVER (PARTITION BY user_id) AS share
        FROM c
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    "sitemap_freq": """
        SELECT CASE doc_id % 3 WHEN 0 THEN 'daily'
                               WHEN 1 THEN 'weekly'
                               ELSE 'monthly' END AS changefreq,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "robots_filter": """
        WITH p AS (SELECT
            CASE doc_id % 5
                WHEN 0 THEN '/public/doc' || doc_id
                WHEN 1 THEN '/private/doc' || doc_id
                WHEN 2 THEN '/private/pub/doc' || doc_id
                WHEN 3 THEN '/data/doc' || doc_id || '.gz'
                ELSE '/tmp/doc' || doc_id END AS path
            FROM documents)
        SELECT NOT ((path LIKE '/private/%'
                     AND path NOT LIKE '/private/pub/%')
                    OR path LIKE '%.gz') AS allowed,
               CAST(count(*) AS BIGINT) AS cnt
        FROM p GROUP BY 1 ORDER BY 1
    """,
    "link_graph": """
        WITH n AS (SELECT count(*) AS c FROM documents),
        t AS (SELECT (doc_id * 7 + 1) % (SELECT c FROM n) AS tgt
              FROM documents
              UNION ALL
              SELECT (doc_id + 1) % (SELECT c FROM n) FROM documents)
        SELECT tgt AS doc_id, CAST(count(*) AS BIGINT) AS indeg
        FROM t GROUP BY tgt ORDER BY tgt
    """,
    "charset_sniff": """
        SELECT CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                               WHEN 1 THEN 'utf-16-le'
                               WHEN 2 THEN 'utf-8'
                               ELSE 'utf-8-sig' END AS charset,
               CAST(count(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1 ORDER BY 1
    """,
    "warc_roundtrip": """
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT)
                   AS octets
        FROM documents GROUP BY source ORDER BY source
    """,
    "bfs_hops": """
        WITH RECURSIVE e AS (
            SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                            's' || CAST(l_suppkey AS VARCHAR) AS b
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (SELECT a AS src, b AS dst FROM e
                  UNION ALL SELECT b, a FROM e),
        src AS (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR)
                    AS node
                FROM customer WHERE c_nationkey = 0),
        walk(node, d) AS (
            SELECT node, 0 FROM src
            UNION
            SELECT g.dst, w.d + 1
            FROM walk w JOIN edges g ON g.src = w.node
            WHERE w.d < 3)
        SELECT node, CAST(min(d) AS BIGINT) AS d
        FROM walk GROUP BY node ORDER BY node
    """,
    "upsert_merge": """
        WITH last AS (
            SELECT o_custkey AS k,
                   CASE WHEN o_orderstatus = 'F' THEN 'd'
                        ELSE 'u' END AS op,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
            FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderkey DESC) = 1),
        base AS (
            SELECT c_custkey AS k,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
            FROM customer)
        SELECT k, v FROM (
            SELECT COALESCE(b.k, l.k) AS k,
                   COALESCE(l.op, 'keep') AS op,
                   CASE WHEN l.op = 'u' THEN l.v ELSE b.v END AS v
            FROM base b FULL OUTER JOIN last l ON b.k = l.k)
        WHERE op <> 'd'
        ORDER BY k
    """,
    "outer_join": """
        WITH c AS (SELECT c_custkey AS custkey,
                          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                              AS acct_c
                   FROM customer
                   WHERE floor(c_acctbal * 100 + 0.5) > 500000),
             o AS (SELECT o_custkey AS custkey,
                          CAST(count(*) AS BIGINT) AS n_ord
                   FROM orders GROUP BY 1)
        SELECT COALESCE(c.custkey, o.custkey) AS custkey,
               CAST(COALESCE(c.acct_c, -1) AS BIGINT) AS acct_c,
               CAST(COALESCE(o.n_ord, -1) AS BIGINT) AS n_ord
        FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
        ORDER BY custkey
    """,
    "ndv_bykey": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS ndv
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "window_minmax": """
        SELECT event_id, user_id,
               min(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   OVER w AS w5_min,
               max(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   OVER w AS w5_max
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "quantile_bykey": """
        SELECT event_type,
               quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT),
                             0.25) AS p25,
               quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT),
                             0.50) AS p50,
               quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT),
                             0.90) AS p90
        FROM events
        GROUP BY event_type ORDER BY event_type
    """,
    "intersect_keys": """
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value >= 95
        INTERSECT
        SELECT user_id FROM events
        WHERE event_type = 'error' AND value >= 95
        ORDER BY user_id
    """,
    "except_keys": """
        SELECT user_id FROM events
        WHERE event_type = 'purchase' AND value >= 95
        EXCEPT
        SELECT user_id FROM events
        WHERE event_type = 'error' AND value >= 95
        ORDER BY user_id
    """,
    "overlap_matrix": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS label_a, b.event_type AS label_b,
               CAST(count(*) AS BIGINT) AS n
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
        ORDER BY label_a, label_b
    """,
    "pagerank": """
        WITH pair AS (
          SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
                          's' || CAST(l_suppkey AS VARCHAR) AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        edges AS (SELECT c AS src, s AS dst FROM pair
                  UNION ALL SELECT s, c FROM pair),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
                FROM edges GROUP BY src),
        r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r
               FROM deg),
        s1 AS (SELECT e.dst AS node, sum(r0.r // dg.d) AS sm
               FROM edges e JOIN r0 ON r0.node = e.src
               JOIN deg dg ON dg.src = e.src GROUP BY e.dst),
        r1 AS (SELECT dg.src AS node,
                      150000 + (85 * COALESCE(s1.sm, 0)) // 100 AS r
               FROM deg dg LEFT JOIN s1 ON s1.node = dg.src),
        s2 AS (SELECT e.dst AS node, sum(r1.r // dg.d) AS sm
               FROM edges e JOIN r1 ON r1.node = e.src
               JOIN deg dg ON dg.src = e.src GROUP BY e.dst),
        r2 AS (SELECT dg.src AS node,
                      150000 + (85 * COALESCE(s2.sm, 0)) // 100 AS r
               FROM deg dg LEFT JOIN s2 ON s2.node = dg.src),
        s3 AS (SELECT e.dst AS node, sum(r2.r // dg.d) AS sm
               FROM edges e JOIN r2 ON r2.node = e.src
               JOIN deg dg ON dg.src = e.src GROUP BY e.dst),
        r3 AS (SELECT dg.src AS node,
                      150000 + (85 * COALESCE(s3.sm, 0)) // 100 AS r
               FROM deg dg LEFT JOIN s3 ON s3.node = dg.src)
        SELECT node, CAST(r AS BIGINT) AS rank_u FROM r3 ORDER BY node
    """,
    "linreg_bykey": """
        WITH b AS (
          SELECT event_type,
                 epoch_us(ts) // 1000000 % 86400 AS xc,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc
          FROM events
        ),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(xc) AS DOUBLE) AS sx,
                 CAST(sum(yc) AS DOUBLE) AS sy,
                 CAST(sum(xc * xc) AS DOUBLE) AS sxx,
                 CAST(sum(xc * yc) AS DOUBLE) AS sxy
          FROM b GROUP BY event_type
        )
        SELECT event_type,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy * sxx - sx * sxy) / (n * sxx - sx * sx) AS icept
        FROM m ORDER BY event_type
    """,
    "asof_forward": """
        SELECT p.event_id, p.user_id,
               (SELECT min(s.ts) FROM events s
                WHERE s.user_id = p.user_id AND s.event_type = 'error'
                  AND s.ts >= p.ts
                  AND s.ts <= p.ts + INTERVAL 1 DAY) AS next_error
        FROM events p WHERE p.event_type = 'purchase'
        ORDER BY p.event_id
    """,
    "window_nth": """
        SELECT event_id, user_id,
               nth_value(value, 3) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                  AND UNBOUNDED FOLLOWING) AS third_v
        FROM events ORDER BY event_id
    """,
    "grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_c
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
    """,
    "unpivot": """
        SELECT l_orderkey, l_linenumber, 'qty_c' AS measure,
               CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS val_c
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price_c',
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'disc_c',
               CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, measure
    """,
    "mode_bykey": """
        SELECT user_id, mode_type, n FROM (
          SELECT user_id, event_type AS mode_type,
                 CAST(count(*) AS BIGINT) AS n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC, event_type)
                   AS rn
          FROM events GROUP BY user_id, event_type)
        WHERE rn = 1 ORDER BY user_id
    """,
    # q_funnel: per-step earliest-completion chain with strict-> ts
    # ordering (step k counts users with an event of that type
    # strictly after their earliest completion of the k-1 prefix).
    "funnel": """
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts > s1.t
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts > s2.t
               GROUP BY e.user_id)
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                 CAST((SELECT count(*) FROM s1) AS BIGINT) AS users
          UNION ALL
          SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
          UNION ALL
          SELECT 3, 'purchase',
                 CAST((SELECT count(*) FROM s3) AS BIGINT)
        ) ORDER BY step
    """,
    # q_table_profile: per-column count / nulls / exact ndv / min / max,
    # min_s/max_s rendered exactly as DuckDB CAST(x AS VARCHAR) (the
    # engine renders AFTER a typed reduce — stages/profile.py).
    "table_profile": """
        WITH p AS (
          SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(count(*) - count(event_id) AS BIGINT) AS nulls,
                 CAST(count(DISTINCT event_id) AS BIGINT) AS ndv,
                 CAST(min(event_id) AS VARCHAR) AS min_s,
                 CAST(max(event_id) AS VARCHAR) AS max_s
          FROM events
          UNION ALL
          SELECT 'event_type', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(event_type) AS BIGINT),
                 CAST(count(DISTINCT event_type) AS BIGINT),
                 CAST(min(event_type) AS VARCHAR),
                 CAST(max(event_type) AS VARCHAR)
          FROM events
          UNION ALL
          SELECT 'ts', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(ts) AS BIGINT),
                 CAST(count(DISTINCT ts) AS BIGINT),
                 CAST(min(ts) AS VARCHAR), CAST(max(ts) AS VARCHAR)
          FROM events
          UNION ALL
          SELECT 'value', CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(value) AS BIGINT),
                 CAST(count(DISTINCT value) AS BIGINT),
                 CAST(min(value) AS VARCHAR), CAST(max(value) AS VARCHAR)
          FROM events
        )
        SELECT * FROM p ORDER BY col
    """,
    # q_heavy_hitters: exact top-20 words — same normalization contract
    # as ngram_topk, 1-gram grain; the ENGINE path is MG summaries +
    # recount, the oracle is the plain exact groupby.
    "heavy_hitters": """
        WITH words AS (
          SELECT unnest(list_filter(string_split(regexp_replace(
                     lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                     w -> w <> '')) AS token
          FROM documents
        )
        SELECT token, CAST(count(*) AS BIGINT) AS cnt
        FROM words GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
    # q_filter_cascade: first-fail attribution over the ordered rule
    # chain; every rule integer-exact (no float thresholds).
    "filter_cascade": """
        WITH b AS (
          SELECT len(list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '')) AS nw,
                 length(regexp_replace(text, '\\s', '', 'g')) AS nc,
                 (CAST(regexp_matches(text, '\\bthe\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bbe\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bto\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bof\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\band\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bthat\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bhave\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bwith\\b', 'i') AS INT))
                     AS sh,
                 contains(text, '{') AS braces,
                 contains(lower(text), 'lorem ipsum') AS lorem
          FROM documents
        ), ff AS (
          SELECT CASE WHEN nw < 30 THEN 1 WHEN nw > 90 THEN 2
                      WHEN 2 * nc < 9 * nw OR nc > 5 * nw THEN 3
                      WHEN sh < 1 THEN 4 WHEN braces THEN 5
                      WHEN lorem THEN 6 ELSE 0 END AS f
          FROM b
        ), d AS (SELECT f, CAST(count(*) AS BIGINT) c FROM ff GROUP BY f),
           tot AS (SELECT CAST(count(*) AS BIGINT) n FROM ff),
           st AS (SELECT * FROM (VALUES (1, 'min_words'),
                  (2, 'max_words'), (3, 'mean_wlen'), (4, 'stopwords'),
                  (5, 'braces'), (6, 'lorem')) v(stage, rule)),
           j AS (SELECT st.stage, st.rule, coalesce(d.c, 0) AS dropped
                 FROM st LEFT JOIN d ON d.f = st.stage)
        SELECT CAST(stage AS BIGINT) AS stage, rule,
               CAST(tot.n - coalesce(sum(dropped) OVER (ORDER BY stage
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS n_in,
               CAST(dropped AS BIGINT) AS n_dropped,
               CAST(tot.n - coalesce(sum(dropped) OVER (ORDER BY stage
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) - dropped AS BIGINT) AS n_out
        FROM j, tot ORDER BY stage
    """,
    # q_cross_decontaminate: integer-exact Jaccard threshold
    # (inter*5 >= 4*union, inter >= 1); eval = doc_id < 50.
    "cross_decontaminate": """
        WITH w AS (
          SELECT doc_id, list_distinct(list_filter(string_split(
                     regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                     ' '), x -> x <> '')) AS w
          FROM documents
        ), t AS (SELECT doc_id, unnest(w) AS term FROM w
                 WHERE doc_id >= 50),
           e AS (SELECT doc_id, unnest(w) AS term FROM w
                 WHERE doc_id < 50),
           i AS (SELECT t.doc_id tid, e.doc_id eid,
                        CAST(count(*) AS BIGINT) i
                 FROM t JOIN e USING (term) GROUP BY 1, 2),
           s AS (SELECT doc_id, CAST(len(w) AS BIGINT) n FROM w),
           m AS (SELECT tid, CAST(count(*) AS BIGINT) AS n_matches
                 FROM i JOIN s st ON st.doc_id = i.tid
                        JOIN s se ON se.doc_id = i.eid
                 WHERE 5 * i >= 4 * (st.n + se.n - i) GROUP BY tid)
        SELECT w.doc_id, s.n AS n_terms,
               coalesce(m.n_matches, 0) AS n_matches,
               CAST(m.tid IS NULL AS BIGINT) AS kept
        FROM w JOIN s USING (doc_id)
        LEFT JOIN m ON m.tid = w.doc_id
        WHERE w.doc_id >= 50 ORDER BY w.doc_id
    """,
    # q_tfidf_topk: same normalization as ngram_topk/heavy_hitters;
    # idf = ln(N/df) with N = total documents rows; rank tie-break
    # (score desc, tf desc, term asc) mirrored exactly.
    "tfidf_topk": """
        WITH words AS (
          SELECT doc_id, unnest(list_filter(string_split(regexp_replace(
                     lower(text), '[^a-z0-9]+', ' ', 'g'), ' '),
                     w -> w <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM words GROUP BY doc_id, term
        ), df AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM words GROUP BY term
        ), n AS (SELECT count(*) AS n FROM documents), scored AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
                 row_number() OVER (PARTITION BY t.doc_id
                     ORDER BY t.tf * ln(CAST(n.n AS DOUBLE) / d.df) DESC,
                              t.tf DESC, t.term) AS rnk
          FROM tf t JOIN df d USING (term), n
        )
        SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, tf, df
        FROM scored WHERE rnk <= 5 ORDER BY doc_id, rnk
    """,
    "ngram_topk": """
        WITH words AS (
          SELECT list_filter(string_split(regexp_replace(lower(text),
                     '[^a-z0-9]+', ' ', 'g'), ' '), w -> w <> '') AS w
          FROM documents
        ), grams AS (
          SELECT array_to_string(w[i:i+2], ' ') AS gram
          FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i FROM words)
        )
        SELECT gram, CAST(count(*) AS BIGINT) AS cnt
        FROM grams GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20
    """,
    "window_hopping": """
        WITH e AS (
          SELECT event_type,
                 (epoch_ms(ts) // 1000 // 3600) * 3600 AS last_start
          FROM events
        ), x AS (
          SELECT event_type,
                 make_timestamp((last_start - 3600 * j) * 1000000)
                     AS window_start
          FROM (SELECT event_type, last_start, unnest([0, 1]) AS j
                FROM e)
        )
        SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS cnt
        FROM x GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    "line_dedup": """
        WITH lines AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS ln,
                 unnest(range(len(string_split(text, chr(10))))) AS pos
          FROM documents
        ), winners AS (
          SELECT doc_id, ln, pos,
                 row_number() OVER (PARTITION BY ln
                                    ORDER BY doc_id, pos) AS rn
          FROM lines
        )
        SELECT d.doc_id, coalesce(w.text, '') AS text
        FROM documents d LEFT JOIN (
          SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text
          FROM winners WHERE rn = 1 GROUP BY doc_id) w USING (doc_id)
        ORDER BY doc_id
    """,
    "c4_filters": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(text, chr(10)),
                     x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)
                                  || chr(11) || chr(12))),
                   l -> (ends_with(l, '.') OR ends_with(l, '!') OR
                         ends_with(l, '?') OR ends_with(l, '"'))
                        AND len(regexp_extract_all(l, '\\S+')) >= 5
                        AND NOT contains(lower(l), 'javascript')) AS kept
          FROM documents
        ), c AS (
          SELECT doc_id,
                 coalesce(array_to_string(kept, chr(10)), '') AS clean,
                 CAST(len(kept) AS BIGINT) AS n_lines_kept
          FROM t
        )
        SELECT doc_id, clean, n_lines_kept,
               CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT)
                   AS n_sentences,
               CAST((len(regexp_extract_all(clean, '[.!?]')) >= 3
                     AND NOT contains(lower(clean), 'lorem ipsum')
                     AND NOT contains(clean, '{')) AS BIGINT) AS c4_keep
        FROM c ORDER BY doc_id
    """,
    # q_chunk_documents: 24-token windows, 8-token overlap (step 16);
    # engine keeps window s iff s == 0 or window s-1 did not reach the
    # end (start-16+24 < nw); empty docs yield one empty chunk.
    "chunk_documents": """
        WITH w AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x <> '') AS toks
          FROM documents
        ), starts AS (
          SELECT doc_id, toks, len(toks) AS nw,
                 unnest(range(0, greatest(len(toks), 1), 16)) AS start
          FROM w
        )
        SELECT doc_id, CAST(start // 16 AS BIGINT) AS chunk_seq,
               coalesce(array_to_string(toks[start + 1 : start + 24],
                                        ' '), '') AS chunk_text,
               CAST(least(start + 24, nw) - start AS BIGINT) AS n_tokens
        FROM starts
        WHERE start = 0 OR start + 8 < nw
        ORDER BY doc_id, chunk_seq
    """,
    # q_range_join: inclusive-bound interval join, purchase joined to
    # every same-user click in the 30 minutes up to it
    "range_join": """
        SELECT l.event_id AS purchase_id, l.user_id,
               r.event_id AS click_id
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND l.event_type = 'purchase' AND r.event_type = 'click'
         AND r.ts BETWEEN l.ts - INTERVAL 1800 SECOND AND l.ts
        ORDER BY purchase_id, click_id
    """,
    # q_gopher_rules: raw fractions gate the keep flag, outputs are
    # floor(x*scale+0.5) ints (the engine's exact rounding)
    "gopher_rules": """
        WITH b AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS toks,
                 list_transform(string_split(text, chr(10)),
                     x -> trim(x, ' ' || chr(9) || chr(10) || chr(13)
                                  || chr(11) || chr(12))) AS lns,
                 length(regexp_replace(text, '\\s', '', 'g')) AS n_chars,
                 (length(text) - length(replace(text, '#', '')))
                   + len(regexp_extract_all(text, '\\.\\.\\.'))
                   + (length(text) - length(replace(text, '…', '')))
                     AS n_sym,
                 (CAST(regexp_matches(text, '\\bthe\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bbe\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bto\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bof\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\band\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bthat\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bhave\\b', 'i') AS INT)
                  + CAST(regexp_matches(text, '\\bwith\\b', 'i') AS INT))
                     AS stop_hits
          FROM documents
        ), m AS (
          SELECT doc_id, len(toks) AS n_words, n_chars, n_sym, stop_hits,
                 CASE WHEN len(toks) > 0
                      THEN n_chars / CAST(len(toks) AS DOUBLE)
                      ELSE 0 END AS mean_wlen,
                 CASE WHEN len(toks) > 0
                      THEN n_sym / CAST(len(toks) AS DOUBLE)
                      ELSE 0 END AS sym_ratio,
                 len(list_filter(lns, l -> starts_with(l, '•')
                     OR starts_with(l, '‣') OR starts_with(l, '▶')
                     OR starts_with(l, '- ') OR starts_with(l, '* ')))
                   / CAST(greatest(len(lns), 1) AS DOUBLE) AS bullet_frac,
                 len(list_filter(lns, l -> ends_with(l, '...')
                     OR ends_with(l, '…')))
                   / CAST(greatest(len(lns), 1) AS DOUBLE)
                     AS ellipsis_frac,
                 CASE WHEN len(toks) > 0
                      THEN len(list_filter(toks,
                               w -> regexp_matches(w, '[A-Za-z]')))
                           / CAST(len(toks) AS DOUBLE)
                      ELSE 0 END AS alpha_frac
          FROM b
        )
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
               CAST(floor(mean_wlen * 100 + 0.5) AS BIGINT)
                   AS mean_wlen_x100,
               CAST(floor(sym_ratio * 1000 + 0.5) AS BIGINT)
                   AS sym_per_kword,
               CAST(floor(bullet_frac * 100 + 0.5) AS BIGINT)
                   AS bullet_pct,
               CAST(floor(ellipsis_frac * 100 + 0.5) AS BIGINT)
                   AS ellipsis_pct,
               CAST(floor(alpha_frac * 100 + 0.5) AS BIGINT) AS alpha_pct,
               CAST(stop_hits AS BIGINT) AS stop_hits,
               CAST((n_words BETWEEN 50 AND 100000
                     AND mean_wlen >= 3 AND mean_wlen <= 10
                     AND sym_ratio <= 0.1 AND bullet_frac <= 0.9
                     AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
                     AND stop_hits >= 2) AS BIGINT) AS gopher_keep
        FROM m ORDER BY doc_id
    """,
    # q_text_repetition: dup n-gram occurrence fractions (x10000 floor
    # div) + top-2-gram char coverage with the engine's np.unique
    # tie-break (lexicographically first among most frequent)
    "text_repetition": """
        WITH w AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ), g AS (
          SELECT doc_id, n, array_to_string(toks[i:i+n-1], ' ') AS gram
          FROM (
            SELECT doc_id, toks, n,
                   unnest(range(1, len(toks) - n + 2)) AS i
            FROM (SELECT doc_id, toks, unnest([2, 3, 4]) AS n FROM w))
        ), counts AS (
          SELECT doc_id, n, gram, count(*) AS c
          FROM g GROUP BY doc_id, n, gram
        ), dup AS (
          SELECT doc_id, n,
                 coalesce(sum(c) FILTER (c > 1), 0) * 10000
                   // sum(c) AS pm
          FROM counts GROUP BY doc_id, n
        ), top2 AS (
          SELECT doc_id, gram, c,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY c DESC, gram) AS rn
          FROM counts WHERE n = 2
        )
        SELECT w.doc_id,
               CAST(coalesce(d2.pm, 0) AS BIGINT) AS dup_2gram_pm,
               CAST(coalesce(d3.pm, 0) AS BIGINT) AS dup_3gram_pm,
               CAST(coalesce(d4.pm, 0) AS BIGINT) AS dup_4gram_pm,
               CAST(CASE WHEN t.gram IS NULL OR length(w.text) = 0
                         THEN 0
                         ELSE least(10000, length(t.gram) * t.c * 10000
                                           // length(w.text)) END
                    AS BIGINT) AS top_2gram_chars_pm
        FROM w
        LEFT JOIN (SELECT doc_id, pm FROM dup WHERE n = 2) d2
               USING (doc_id)
        LEFT JOIN (SELECT doc_id, pm FROM dup WHERE n = 3) d3
               USING (doc_id)
        LEFT JOIN (SELECT doc_id, pm FROM dup WHERE n = 4) d4
               USING (doc_id)
        LEFT JOIN (SELECT doc_id, gram, c FROM top2 WHERE rn = 1) t
               USING (doc_id)
        ORDER BY w.doc_id
    """,
    # q_text_langid: the shipped 4-language stopword profiles scored by
    # distinct-token overlap, argmax with profile-order tie-break
    # (en > de > fr > es), 'und' when every score is zero
    "text_langid": """
        WITH t AS (
          SELECT list_distinct(list_filter(
                   regexp_split_to_array(lower(text), '\\s+'),
                   x -> x <> '')) AS toks
          FROM documents
        ), s AS (
          SELECT
            len(list_intersect(toks,
                ['the','and','of','a','to','is','in'])) AS en,
            len(list_intersect(toks,
                ['der','die','das','und','ist','nicht'])) AS de,
            len(list_intersect(toks,
                ['le','la','les','et','est','une'])) AS fr,
            len(list_intersect(toks,
                ['el','los','las','es','una','y'])) AS es
          FROM t
        ), p AS (
          SELECT CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                      WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                      WHEN de >= fr AND de >= es THEN 'de'
                      WHEN fr >= es THEN 'fr'
                      ELSE 'es' END AS pred_lang
          FROM s
        )
        SELECT pred_lang, CAST(count(*) AS BIGINT) AS cnt
        FROM p GROUP BY pred_lang ORDER BY pred_lang
    """,
    # q_url_dedup: the messy construction collapses deterministically
    # under the published canonicalization rules — lowercase host,
    # https:443 default port dropped, www./utm_*/gclid/fragment
    # stripped, surviving params sorted — to exactly this form; the
    # general rules are pinned element-wise in pytest
    "url_dedup": """
        SELECT 'https://u' || CAST(user_id AS VARCHAR) || '.example.'
               || CASE user_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                                   ELSE 'net' END
               || '/home?page=1' AS url,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY url ORDER BY url
    """,
    # q_decontaminate: bench = words 3..20 (1-based) of docs 1/7/13;
    # n_hits counts doc 13-gram POSITIONS whose gram is in the bench
    # set; docs shorter than 13 words form one whole-doc gram.
    "decontaminate": """
        WITH w AS (
          SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                     x -> x <> '') AS toks
          FROM documents
        ), bw AS (
          SELECT toks[3:20] AS bt FROM w WHERE doc_id IN (1, 7, 13)
        ), bg AS (
          SELECT DISTINCT array_to_string(bt[i:i+12], ' ') AS gram
          FROM (SELECT bt, unnest(range(1, len(bt) - 11)) AS i FROM bw)
        ), dg AS (
          SELECT doc_id,
                 CASE WHEN len(toks) < 13
                      THEN array_to_string(toks, ' ')
                      ELSE array_to_string(toks[i:i+12], ' ') END AS gram
          FROM (SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 11,
                           CASE WHEN len(toks) BETWEEN 1 AND 12
                                THEN 2 ELSE 1 END))) AS i
                FROM w)
        )
        SELECT w.doc_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
               CAST(coalesce(h.n, 0) > 0 AS BIGINT) AS contaminated
        FROM w LEFT JOIN (
          SELECT doc_id, count(*) AS n FROM dg JOIN bg USING (gram)
          GROUP BY doc_id) h USING (doc_id)
        ORDER BY doc_id
    """,
}

SQL: dict[str, str] = {
    "parse_json": """
        SELECT event_type, count(*) AS cnt,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
    "fields_split": """
        SELECT split_part(text, ' ', 1) AS f1, count(*) AS cnt
        FROM documents GROUP BY f1
    """,
    "scalar_funcs": """
        SELECT c_custkey, upper(c_name) AS uname,
               CAST(length(c_name) AS BIGINT) AS name_len,
               substr(c_mktsegment, 1, 3) AS seg3,
               lower(to_hex(c_custkey)) AS hex_key,
               '"' || c_mktsegment || '"' AS wseg,
               to_base64(encode(c_name)) AS b64,
               c_name AS b64rt
        FROM customer
    """,
    "regex_extract": """
        SELECT CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) AS src_num,
               count(*) AS cnt
        FROM documents GROUP BY src_num
    """,
    "anon_modes": """
        WITH b AS (
          SELECT event_id,
                 CAST((user_id * 7919 % 4294967296) // 16777216 % 256 AS VARCHAR) || '.' ||
                 CAST((user_id * 7919 % 4294967296) // 65536 % 256 AS VARCHAR) || '.' ||
                 CAST((user_id * 7919 % 4294967296) // 256 % 256 AS VARCHAR) || '.' ||
                 CAST((user_id * 7919 % 4294967296) % 256 AS VARCHAR) AS ip,
                 CAST(user_id % 9999 AS VARCHAR) AS h2,
                 CAST(user_id * 3 % 9999 AS VARCHAR) AS h3
          FROM events)
        SELECT event_id,
               regexp_replace('src=' || ip || ' ok',
                 '\\b(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})\\.\\d{1,3}\\b', '\\1.0')
                 AS ip_anon,
               'v6=2001:' || h2 || ':' || h3 || ':4:0:0:0:0 ok' AS ip6_anon,
               'from=10.' ||
                 CAST(CAST('0x' || substr(md5(ip), 1, 2) AS INTEGER) AS VARCHAR) || '.' ||
                 CAST(CAST('0x' || substr(md5(ip), 3, 2) AS INTEGER) AS VARCHAR) || '.' ||
                 CAST(CAST('0x' || substr(md5(ip), 5, 2) AS INTEGER) AS VARCHAR) || ' ok'
                 AS ip_cons
        FROM b
    """,
    "filter_contains": """
        SELECT lang, count(*) AS cnt FROM documents
        WHERE text LIKE '%spark%' GROUP BY lang
    """,
    "filter_rules": """
        SELECT event_id,
               CASE WHEN regexp_matches(event_type, '^(purchase|signup)$')
                    THEN 'regex' ELSE 'prifilt' END AS rule
        FROM events
        WHERE regexp_matches(event_type, '^(purchase|signup)$')
           OR (event_type = 'error' AND value < 10.0)
    """,
    "route_fanout": """
        SELECT 'errors' AS sink, count(*) AS cnt FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT 'big', count(*) FROM events WHERE event_type <> 'error' AND value >= 50.0
        UNION ALL
        SELECT 'commerce', count(*) FROM events
          WHERE event_type <> 'error' AND event_type IN ('signup', 'purchase')
        UNION ALL
        SELECT 'archive', count(*) FROM events WHERE event_type <> 'error'
    """,
    "dynstats_kinds": """
        WITH c AS (SELECT 'u' || CAST(user_id AS VARCHAR) AS sender,
                          count(*) AS cnt FROM events GROUP BY sender),
             ranked AS (SELECT sender, cnt,
                               row_number() OVER (ORDER BY sender) AS rn
                        FROM c)
        SELECT 'lang' AS kind, lang AS key, count(*) AS cnt
        FROM documents GROUP BY lang
        UNION ALL
        SELECT 'hour', strftime(date_trunc('hour', ts),
                                '%Y-%m-%d %H:%M:%S'), count(*)
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'sender', sender, cnt FROM ranked WHERE rn <= 100
        UNION ALL
        SELECT 'sender', '__rejected__', CAST(sum(cnt) AS BIGINT)
        FROM ranked WHERE rn > 100 HAVING count(*) > 0
    """,
    "pii_redact": """
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            text || ' contact user' || doc_id || '@example.com or 10.'
                 || (doc_id % 256) || '.3.7 ssn 123-45-6789 tel 555-123-4567',
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
            '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g'),
            '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')
          AS red
        FROM documents
    """,
    "mix_sample": """
        SELECT doc_id, source FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          < CAST((CASE
                   WHEN source IN ('src0','src1','src2','src3','src4')
                     THEN 1.0
                   WHEN source IN ('src5','src6','src7','src8','src9')
                     THEN 0.5
                   ELSE 0.2 END) * 4294967296 AS UBIGINT)
    """,
    "sendertrack": """
        SELECT user_id, count(*) AS cnt, min(ts) AS first_seen,
               max(ts) AS last_seen
        FROM events GROUP BY user_id
    """,
    "percentiles": """
        WITH lastn AS (
          SELECT event_type, value FROM events
          QUALIFY row_number() OVER (PARTITION BY event_type
                    ORDER BY ts DESC, event_id DESC) <= 10),
        w AS (SELECT event_type,
                     round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6)
                       AS p50_last10
              FROM lastn GROUP BY event_type)
        SELECT e.event_type,
               round(CAST(quantile_cont(e.value, 0.5) AS DOUBLE), 6) AS p50,
               round(CAST(quantile_cont(e.value, 0.95) AS DOUBLE), 6) AS p95,
               min(w.p50_last10) AS p50_last10
        FROM events e JOIN w ON e.event_type = w.event_type
        GROUP BY e.event_type
    """,
    "mmcount": """
        SELECT event_type, count(*) AS msg_count FROM events GROUP BY event_type
    """,
    "ratelimit_burst": """
        SELECT event_id, user_id FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 5
    """,
    "exec_throttles": """
        SELECT 'interval_first' AS mode, event_id FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id,
                 date_trunc('hour', ts) ORDER BY ts, event_id) = 1
        UNION ALL
        SELECT 'nth' AS mode, event_id FROM events WHERE event_id % 10 = 0
    """,
    "parse_time": """
        SELECT event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ep_rfc3339,
               CAST(floor(epoch(make_timestamp(2026, 1, day(ts),
                    hour(ts), minute(ts),
                    CAST(date_part('second', ts) AS DOUBLE)))) AS BIGINT)
                    AS ep_rfc3164,
               CAST(1 AS BIGINT) AS ok_rfc3339,
               CAST(1 AS BIGINT) AS ok_rfc3164,
               CAST(0 AS BIGINT) AS ep_bad,
               CAST(0 AS BIGINT) AS ok_bad
        FROM events
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS keeper_id, count(*) AS copies
        FROM documents GROUP BY text
    """,
    "ratelimit_summary": """
        SELECT user_id, date_trunc('hour', ts) AS w,
               CAST(count(*) - 2 AS BIGINT) AS dropped
        FROM events GROUP BY user_id, w HAVING count(*) > 2
    """,
    "stratified_sample": """
        SELECT lang, doc_id, md5('0:' || doc_id) AS skey FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY md5('0:' || doc_id), doc_id) <= 20
    """,
    "bm25_search": """
        WITH toks AS (
          SELECT doc_id, t.tok AS term
          FROM documents,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)),
        dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
               FROM toks GROUP BY doc_id),
        st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                      sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        q(qid, term) AS (VALUES
          ('q1','fast'),('q1','hash'),('q1','join'),
          ('q2','merge'),('q2','sort'),('q2','window'),
          ('q3','batch'),('q3','dup'),('q3','slow'),('q3','stream')),
        tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
               FROM toks WHERE term IN (SELECT term FROM q)
               GROUP BY doc_id, term),
        df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
               FROM tf GROUP BY term),
        sc AS (SELECT q.qid, tf.doc_id,
                 CAST(sum(CAST(floor(
                   ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
                   * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro
               FROM q JOIN tf ON q.term = tf.term
                      JOIN df ON df.term = q.term
                      JOIN dl ON dl.doc_id = tf.doc_id, st
               GROUP BY q.qid, tf.doc_id)
        SELECT qid, doc_id, score_micro,
               CAST(row_number() OVER (
                 PARTITION BY qid
                 ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
        FROM sc
        WHERE score_micro > 0
        QUALIFY row_number() OVER (
          PARTITION BY qid ORDER BY score_micro DESC, doc_id) <= 10
    """,
    "topk_orders": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10
    """,
    "union_tagged": """
        SELECT event_id, event_type, 'errors' AS route FROM events
          WHERE event_type = 'error'
        UNION ALL
        SELECT event_id, event_type, 'signups' FROM events
          WHERE event_type = 'signup'
    """,
    "template_render": """
        SELECT o_orderkey,
               'order=' || CAST(o_orderkey AS VARCHAR) ||
               ' status=' || o_orderstatus ||
               ' date=' || strftime(o_orderdate, '%Y-%m-%d') ||
               ' cents=' || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
               AS line
        FROM orders
    """,
    "lineitem_agg": """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS sum_qty_cents
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "multi_join": """
        SELECT r.r_name, n.n_name, count(*) AS cnt,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    "group_topk": """
        SELECT event_type, user_id, n,
               CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY n DESC, user_id) AS BIGINT) AS rank
        FROM (SELECT event_type, user_id, count(*) AS n
              FROM events GROUP BY event_type, user_id)
        QUALIFY rank <= 2
    """,
    "explode_words": """
        SELECT w AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    """,
    "distinct_pairs": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT user_id, event_type,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                 AS distinct_cnt
        FROM d
    """,
    "epoch_shuffle": """
        SELECT doc_id, md5('7:' || doc_id) AS skey FROM documents
    """,
    "join_topk": """
        SELECT c.c_mktsegment, count(*) AS orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "hash_join": """
        SELECT o.o_custkey AS custkey, o.o_orderkey, c.c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "broadcast_join": """
        SELECT s.s_name, count(*) AS cnt,
               CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
                 AS sum_qty_cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
    """,
    "asof_join": """
        SELECT p.event_id, p.user_id,
               (SELECT max(s.ts) FROM events s
                WHERE s.user_id = p.user_id AND s.event_type = 'signup'
                  AND s.ts <= p.ts) AS last_signup
        FROM events p WHERE p.event_type = 'purchase'
    """,
    "session_windows": """
        SELECT user_id,
               CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY session_start) AS BIGINT) AS session,
               session_start, n_events
        FROM (
          SELECT user_id, min(ts) AS session_start,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM (
            SELECT user_id, ts,
                   sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS sid
            FROM (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 12 HOUR THEN 1 ELSE 0 END AS gap
              FROM events))
          GROUP BY user_id, sid)
    """,
    "json_transform": """
        SELECT event_id,
               '{"a.k":' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                                 AS VARCHAR) || ',"b":1}' AS flat,
               '{"a":{"k":' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                                    AS VARCHAR) || '},"b":1}' AS nested
        FROM events
    """,
    "hmac_sd": """
        SELECT event_id,
               sha256('k' || CAST(event_id AS VARCHAR) || '|' || event_type)
                 AS hmac
        FROM events
    """,
    "syslog_roundtrip": """
        SELECT event_id,
               CAST((event_id % 192) % 8 AS BIGINT) AS severity,
               CAST((event_id % 192) // 8 AS BIGINT) AS facility,
               'host' || CAST(user_id % 50 AS VARCHAR) AS hostname,
               'app-' || event_type AS app_name,
               ts, TRUE AS parse_ok
        FROM events
    """,
    "mmpstrucdata": """
        SELECT event_id, event_id AS sd_seq, event_type AS sd_type
        FROM events
    """,
    "lookup_kinds": """
        SELECT event_id,
               coalesce(r.r_name, '') AS region,
               CASE WHEN regexp_matches(event_type, '^purch') THEN 'buy'
                    WHEN regexp_matches(event_type, '^sign') THEN 'join'
                    WHEN regexp_matches(event_type, 'err') THEN 'bad'
                    ELSE 'other' END AS klass,
               coalesce(list_extract(['zero','one','two','three','four','five'],
                        CAST(user_id % 8 AS INTEGER) + 1), '??') AS slot,
               CASE WHEN floor(value) >= 200 THEN 'high'
                    WHEN floor(value) >= 50 THEN 'mid'
                    WHEN floor(value) >= 0 THEN 'low'
                    ELSE 'neg' END AS band
        FROM events e LEFT JOIN region r ON e.user_id % 5 = r.r_regionkey
    """,
    "net_funcs": """
        WITH n AS (SELECT event_id, user_id, event_type,
                  (user_id * 2654435761 + 167772160) % 4294967296 AS v,
                  CASE user_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                       ELSE 'net' END AS tld
                   FROM events)
        SELECT event_id,
               CAST(v // 16777216 % 256 AS VARCHAR) || '.' ||
               CAST(v // 65536 % 256 AS VARCHAR) || '.' ||
               CAST(v // 256 % 256 AS VARCHAR) || '.' ||
               CAST(v % 256 AS VARCHAR) AS ip,
               CAST(v AS BIGINT) AS ip_num,
               CAST(CASE WHEN v // 16777216 = 10 THEN 1 ELSE 0 END AS BIGINT)
                 AS in_net10,
               CAST(CASE WHEN v >= 2886729728 AND v <= 2887778303
                    THEN 1 ELSE 0 END AS BIGINT) AS in_net172,
               'https' AS u_scheme,
               'u' || CAST(user_id AS VARCHAR) AS u_sub,
               'example.' || tld AS u_domain,
               tld AS u_tld,
               '8080' AS u_port,
               '/p/' || CAST(event_id AS VARCHAR) AS u_path,
               'q=' || event_type AS u_query
        FROM n
    """,
    "property_replacer": """
        WITH b AS (SELECT doc_id, text, source,
                          source || chr(9) || 'a  b' AS cc_in
                   FROM documents)
        SELECT doc_id, substr(text, 1, 8) AS sub8, upper(source) AS up_src,
               split_part(text, ' ', 3) AS field3,
               regexp_extract(text, '\\b(\\w*ar\\w*)\\b', 1) AS re_sel,
               coalesce(list_extract(
                   regexp_extract_all(text, '\\b(\\w*ar\\w*)\\b', 1), 2), '')
                 AS re_m2,
               CASE WHEN regexp_matches(source, 'zz[0-9]+')
                    THEN regexp_extract(source, '(zz[0-9]+)', 1)
                    ELSE source END AS re_miss,
               CASE WHEN regexp_matches(source, 'qq')
                    THEN regexp_extract(source, '(qq)', 1)
                    ELSE '0' END AS re_zero,
               substr(text, length(text) - 7, 4) AS sub_end4,
               CASE WHEN length(source) >= 10 THEN source
                    ELSE rpad(source, 10, ' ') END AS fixw,
               replace(cc_in, chr(9), '') AS cc_drop,
               replace(cc_in, chr(9), ' ') AS cc_space,
               replace(cc_in, chr(9), '#009') AS cc_esc,
               regexp_replace(replace(cc_in, chr(9), ' '), ' +', ' ', 'g')
                 AS sp_comp
        FROM b
    """,
    "template_formats": r"""
        SELECT event_id,
               CAST(to_json(struct_pack(id := event_id, et := event_type))
                    AS VARCHAR) AS j,
               CAST(event_id AS VARCHAR) || ',' ||
               CASE WHEN regexp_matches(props, '[",\n]')
                    THEN '"' || replace(props, '"', '""') || '"'
                    ELSE props END AS line,
               'VALUES(''' || replace(props, '''', '''''') || ''')' AS sqlq,
               'CEF:0|raylog|engine|1.0|' ||
               replace(replace(replace(replace(replace(event_type,
                   '\', '\\'), '|', '\|'), '=', '\='), '%', '\%'),
                   '#', '\#') || '|' ||
               replace(replace(props, '\', '\\'), '|', '\|') || '|5|' ||
               'src=' || replace(replace(replace(replace(props,
                   '\', '\\'), '=', '\='), chr(10), '\n'), chr(13), '\r')
               AS cef
        FROM events
    """,
    "format_time": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS t_rfc3339,
               strftime(ts, '%Y%m%d%H%M%S') AS t_mysql,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS t_pgsql,
               strftime(ts, '%b') || ' ' ||
                 lpad(CAST(day(ts) AS VARCHAR), 2, ' ') || ' ' ||
                 strftime(ts, '%H:%M:%S') AS t_rfc3164,
               strftime(ts, '%b %d %H:%M:%S') AS t_rfc3164_buggyday,
               CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR)
                 AS t_unixtimestamp,
               strftime(ts, '%f') AS t_secfrac,
               strftime(ts, '%a') AS t_wdayname,
               CAST(dayofweek(ts) AS VARCHAR) AS t_wday,
               strftime(ts, '%Y') AS t_year,
               strftime(ts, '%m') AS t_month,
               strftime(ts, '%d') AS t_day,
               strftime(ts, '%H') AS t_hour,
               strftime(ts, '%M') AS t_minute,
               strftime(ts, '%S') AS t_second,
               strftime(ts, '%j') AS t_ordinal,
               lpad(CAST((dayofyear(ts) - 1 + 6) // 7 +
                    CASE WHEN dayofweek(ts) <
                              dayofweek(make_date(year(ts), 1, 1))
                         THEN 1 ELSE 0 END AS VARCHAR), 2, '0') AS t_week,
               lpad(CAST(weekofyear(ts) AS VARCHAR), 2, '0') AS t_isoweek,
               CAST(isoyear(ts) AS VARCHAR) AS t_isoweekyear,
               '00' AS t_tzoffshour,
               '00' AS t_tzoffsmin,
               '+' AS t_tzoffsdirection
        FROM events
    """,
    "dedup_wordset": """
        SELECT min(doc_id) AS keeper_id, count(*) AS copies
        FROM documents
        GROUP BY array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')
    """,
    "text_quality": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS BIGINT)
                 AS n_stop,
               CAST(list_max(list_transform(string_split(text, ' '),
                    x -> length(x))) AS BIGINT) AS longest_len,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]')) AS BIGINT)
                 AS bpe_tokens
        FROM documents
    """,
    "dedup_minhash": """
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(w, i, i + 2), ' ') AS s
          FROM d, unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3
          UNION
          SELECT doc_id, array_to_string(w, ' ') FROM d
          WHERE len(w) < 3 AND len(w) > 0),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY id_a, id_b),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
        SELECT id_a, id_b FROM inter p
        JOIN sizes sa ON sa.doc_id = p.id_a
        JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE p.n_inter * 1.0 / (sa.n + sb.n - p.n_inter) >= 0.8
    """,
    "dedup_clusters": """
        WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(w, i, i + 2), ' ') AS s
          FROM d, unnest(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3
          UNION
          SELECT doc_id, array_to_string(w, ' ') FROM d
          WHERE len(w) < 3 AND len(w) > 0),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY id_a, id_b),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
          SELECT id_a, id_b FROM inter p
          JOIN sizes sa ON sa.doc_id = p.id_a
          JOIN sizes sb ON sb.doc_id = p.id_b
          WHERE p.n_inter * 1.0 / (sa.n + sb.n - p.n_inter) >= 0.8),
        edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node)
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(min(r) AS BIGINT) AS cluster
        FROM reach GROUP BY node
    """,
    "knn_bruteforce": """
        WITH q AS (SELECT vec_id AS qid, embedding AS qv
                   FROM embeddings ORDER BY vec_id LIMIT 5)
        SELECT q.qid, e.vec_id AS id,
               CAST(row_number() OVER (PARTITION BY q.qid
                    ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC,
                             e.vec_id) AS BIGINT) AS rank
        FROM embeddings e, q
        QUALIFY rank <= 5
    """,
    "runs_compress": """
        SELECT user_id,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY min_ord)
                    AS BIGINT) AS island,
               et, n
        FROM (
          SELECT user_id, island_id,
                 any_value(event_type) AS et,
                 CAST(count(*) AS BIGINT) AS n,
                 min(ord) AS min_ord
          FROM (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER w AS ord,
                   sum(st) OVER w AS island_id
            FROM (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(event_type) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS st
              FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          GROUP BY user_id, island_id)
    """,
}


def q_redirect_resolve(sf_dir):
    """Redirect-chain resolution (stages/graph.resolve_chains —
    pointer jumping): deterministic 3xx rule doc i -> i-1 for
    i%4 != 0 builds chains of length <= 3 ending at the floor
    multiple of 4; two doubling rounds (covers length 4) of
    mapping-vs-itself hash joins resolve every chain.  The DuckDB
    oracle states the closed form (final = i - i%4) — the ENGINE must
    reach it through the distributed join rounds."""
    from ..stages.graph import resolve_chains

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        m = i[i % 4 != 0]
        return pd.DataFrame({"doc_id": m.to_numpy(),
                             "final_id": (m - 1).to_numpy()})

    res = resolve_chains(ds.map_batches(edges, batch_format="pandas"),
                         "doc_id", "final_id", rounds=2).to_pandas()
    res = res.astype({"doc_id": "int64", "final_id": "int64"})
    return res.sort_values("doc_id").reset_index(drop=True)


def q_hits_scores(sf_dir):
    """HITS hubs/authorities (stages/graph.hits_int) over the planted
    deterministic link rule i -> (7i+1)%n, (i+1)%n (the q:link_graph
    rule, built arithmetically here — the WARC extraction chain is
    already proven there): a1 = indegree, h1 = push(a1), a2 = push(h1),
    both scaled to integer micro-units by max-division.  The unrolled
    DuckDB oracle in SQL_TAIL repeats the two half-iterations with
    joins and matches hash-exactly."""
    from ..stages.graph import hits_int

    n = _doc_count(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    res = hits_int(ds.map_batches(lambda df: _planted_edges(df, n),
                                  batch_format="pandas"),
                   "src", "dst")
    res["node"] = res["node"].astype("int64")
    return res.sort_values("node").reset_index(drop=True)


def q_url_frontier(sf_dir):
    """Crawl URL frontier: candidate URLs anti-joined against the
    persisted SEEN set (stages/join.semi_join anti=True — hash-
    partitioned NOT EXISTS), then per-host priority top-k
    (stages/aggregate.window_over_key rank <= 5) — the discover ->
    dedupe -> politeness-budget step every crawler runs between
    link extraction and fetch.  Candidates from events (host =
    user_id%20, priority = value cents), seen = event_id%3 == 0.
    DuckDB NOT EXISTS + row_number oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key
    from ..stages.join import semi_join

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "value"], parallel=8)

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "host": (df["user_id"].astype("int64") % 20),
            "prio": np.floor(
                df["value"].to_numpy() * 100 + 0.5).astype("int64")})

    cands = ds.map_batches(cand, batch_format="pandas")

    def seen_keys(df: pd.DataFrame) -> pd.DataFrame:
        i = df["event_id"].astype("int64")
        return pd.DataFrame({"event_id": i[i % 3 == 0].to_numpy()})

    seen = ds.map_batches(seen_keys, batch_format="pandas")
    fresh = semi_join(cands, seen, "event_id", anti=True)

    def negp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["neg_prio"] = -df["prio"].to_numpy()
        return df

    ranked = window_over_key(
        fresh.map_batches(negp, batch_format="pandas"),
        "host", ["neg_prio", "event_id"], "prio")

    def top(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["rn"] <= 5][["host", "event_id", "prio"]]
        return out.astype({"host": "int64", "event_id": "int64",
                           "prio": "int64"})

    res = ranked.map_batches(top, batch_format="pandas").to_pandas()
    return (res.sort_values(["host", "event_id"])
            .reset_index(drop=True))


def q_mix_budget(sf_dir):
    """Token-budget corpus mixing: per-source greedy selection —
    biggest documents first (n_chars desc, doc_id tiebreak) while the
    per-source running total stays within budget — the char/token
    budget allocator of a pretraining data mix (the cumulative-window
    counterpart of q:mix_sample's ratio mixing).  One hash shuffle
    per key bucket; the running sum is integer so every prefix is
    order-exact.  DuckDB cumulative-window oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    budget = 20_000
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"], parallel=8)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["neg_chars"] = -df["n_chars"].to_numpy()
        return df

    ranked = window_over_key(
        ds.map_batches(keyed, batch_format="pandas"),
        "lang", ["neg_chars", "doc_id"], "n_chars",
        run_value="n_chars", run_col="cum_chars")

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["cum_chars"] <= budget]
        return out[["doc_id", "lang", "cum_chars"]].astype(
            {"doc_id": "int64", "cum_chars": "int64"})

    res = ranked.map_batches(gate, batch_format="pandas").to_pandas()
    return res.sort_values("doc_id").reset_index(drop=True)


def q_anchor_text(sf_dir):
    """Per-target anchor-text aggregation (stages/parse
    .extract_anchors_frame + stages/aggregate.group_concat): documents
    warcified with LABELED planted links (i -> (7i+1)%n anchored
    'w{i}', (i+1)%n anchored 'x{i}'), WARC read -> charset decode ->
    anchor extraction -> per-target ordered string_agg + count — the
    classic "anchors describe the target" web relevance signal.  The
    DuckDB oracle reproduces the rule arithmetically; the whole
    archive->decode->extract chain must be lossless for the
    concatenations to hash-match.  The gate collects pandas at sf0.01;
    at corpus scale the operator streams (group_concat
    as_dataset=True -> write_parquet), pinned in t:test_crawl."""
    import os

    from ..pipelines.crawl import documents_to_warc
    from ..sources.warc import read_warc
    from ..stages.aggregate import group_concat
    from ..stages.parse import extract_anchors_frame
    from ..stages.text import sniff_decode_row

    n = _doc_count(sf_dir)
    root = _scratch("anchor_text", sf_dir)
    documents_to_warc(os.path.join(sf_dir, "documents.parquet"),
                      os.path.join(root, "warc"), links=True,
                      n_docs=n, anchors=True)

    def anch(df: pd.DataFrame) -> pd.DataFrame:
        html = df["payload"].map(
            lambda b: sniff_decode_row(bytes(b))[0])
        ak = extract_anchors_frame(html, df["target_uri"])
        return pd.DataFrame({
            "doc_id": (ak["resolved"].str.rsplit("/", n=1).str[-1]
                       .astype("int64")),
            "src_id": (ak["src_uri"].str.rsplit("/", n=1).str[-1]
                       .astype("int64")),
            "anchor": ak["anchor"]})

    ds = read_warc(os.path.join(root, "warc") + "/")
    res = group_concat(ds.map_batches(anch, batch_format="pandas"),
                       "doc_id", "anchor", ["src_id", "anchor"],
                       sep=" ", out="anchors")
    res["doc_id"] = res["doc_id"].astype("int64")
    res["n_anchors"] = (res["anchors"].str.count(" ") + 1).astype(
        "int64")
    return res.sort_values("doc_id").reset_index(drop=True)


def q_main_content(sf_dir):
    """Main-content extraction / boilerplate removal (stages/parse
    .main_content_frame — the jusText/readability block classifier as
    a deterministic shared spec): each document wrapped in a page with
    a 6-link nav bar (link density 81% > 33% — dropped), the document
    text (kept iff >= 5 words), a second always-kept 7-word content
    block, and a 3-word footer (dropped).  The DuckDB oracle in
    SQL_TAIL re-states the planted page's outcome with string algebra;
    the engine must reach it through the generic split -> classify ->
    join kernels.  The general-HTML spec itself is pinned per-row in
    t:test_crawl (engine == main_content_row on nasty HTML)."""
    from ..stages.parse import main_content_frame

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               parallel=8)

    nav = ('<nav><a href="/1">one</a> <a href="/2">two</a> '
           '<a href="/3">three</a> <a href="/4">four</a> '
           '<a href="/5">five</a> <a href="/6">six</a></nav>')

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64").astype(str)
        html = ("<html><body>" + nav + "<p>" + df["text"] + "</p>"
                + "<p>end of document " + i + " marker words here</p>"
                + "<footer>(c) 2025 corpus</footer></body></html>")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "main_text": main_content_frame(html)})

    res = ds.map_batches(fx, batch_format="pandas").to_pandas()
    return res.sort_values("doc_id").reset_index(drop=True)


def q_page_meta(sf_dir):
    """Head-metadata extraction (stages/parse.extract_meta_frame):
    documents warcified with a planted deterministic
    <meta name="description"> tag, WARC read -> charset decode ->
    title + description extraction — the trafilatura-style page-parse
    half that the tag-strip text path throws away.  The DuckDB oracle
    rebuilds both strings arithmetically; the archive->decode->extract
    chain must be lossless for the strings to hash-match."""
    import os

    from ..pipelines.crawl import documents_to_warc
    from ..sources.warc import read_warc
    from ..stages.parse import extract_meta_frame
    from ..stages.text import sniff_decode_row

    root = _scratch("page_meta", sf_dir)
    documents_to_warc(os.path.join(sf_dir, "documents.parquet"),
                      os.path.join(root, "warc"), meta=True)

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        html = df["payload"].map(
            lambda b: sniff_decode_row(bytes(b))[0])
        m = extract_meta_frame(html)
        m.insert(0, "doc_id", df["target_uri"]
                 .str.rsplit("/", n=1).str[-1].astype("int64")
                 .to_numpy())
        return m

    ds = read_warc(os.path.join(root, "warc") + "/")
    res = ds.map_batches(fx, batch_format="pandas").to_pandas()
    return res.sort_values("doc_id").reset_index(drop=True)


def q_cdc_chunks(sf_dir):
    """Content-defined chunking (stages/cdc.cdc_chunks — FastCDC-style
    gear hash, vectorized closed form == the sequential recurrence):
    shift-resistant chunk boundaries over each document's utf-8 bytes,
    one (doc_id, chunk_idx, offset, length) row per chunk — the
    re-crawl / byte-stream dedup primitive.  Rows-only driver check
    (the rolling hash isn't SQL); the engine==oracle parity and
    min/max/coverage invariants are pinned in t:test_text_ops."""
    from ..stages.cdc import cdc_chunks

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               parallel=8)
    res = cdc_chunks(ds, mask_bits=5, min_size=8,
                     max_size=128).to_pandas()
    return (res.sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True))


def q_triangle_count(sf_dir):
    """Exact triangle count (stages/graph.triangle_count) over the
    planted deterministic link rule, direction ignored: canonical
    unique (u < v) edges -> per-node wedge emission in hashed buckets
    -> ONE composite-key closure join against the edge set, count/3.
    The DuckDB oracle is the classic three-way self-join over the same
    arithmetic edges."""
    from ..stages.graph import triangle_count

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    t = triangle_count(
        ds.map_batches(
            lambda df, _n=_doc_count(sf_dir): _planted_edges(df, _n),
            batch_format="pandas"),
        "src", "dst")
    return pd.DataFrame({"triangles": pd.Series([t], dtype="int64")})


def q_pagerank_dist(sf_dir):
    """The DISTRIBUTED-rank-table PageRank (stages/graph
    .pagerank_int_distributed — the hash-join escape hatch, node table
    a Dataset end-to-end) over the same purchase graph and against the
    SAME unrolled DuckDB oracle as q:pagerank: both implementations
    must land on identical integers."""
    from ..stages.graph import pagerank_int_distributed

    res = (pagerank_int_distributed(_purchase_edges(sf_dir), "src",
                                    "dst", iters=3).to_pandas())
    res["rank_u"] = res["rank_u"].astype("int64")
    return res.sort_values("node").reset_index(drop=True)


def q_hits_dist(sf_dir):
    """The DISTRIBUTED-score-table HITS (stages/graph
    .hits_int_distributed) over the planted link rule, against the
    SAME unrolled DuckDB oracle as q:hits_scores."""
    from ..stages.graph import hits_int_distributed

    n = _doc_count(sf_dir)
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    res = (hits_int_distributed(
        ds.map_batches(lambda df: _planted_edges(df, n),
                       batch_format="pandas"), "src", "dst")
        .to_pandas())
    res = res.astype({"node": "int64", "auth_u": "int64",
                      "hub_u": "int64"})
    return res.sort_values("node").reset_index(drop=True)


def q_bfs_dist(sf_dir):
    """The DISTRIBUTED-frontier BFS (stages/graph
    .bfs_hops_distributed — distance table and frontier stay
    Datasets) over the same purchase graph and sources, against the
    SAME recursive-CTE DuckDB oracle as q:bfs_hops."""
    from ..stages.graph import bfs_hops_distributed

    res = (bfs_hops_distributed(_purchase_edges(sf_dir), "src", "dst",
                                _bfs_sources(sf_dir), max_depth=3)
           .to_pandas())
    res["d"] = res["d"].astype("int64")
    return res.sort_values("node").reset_index(drop=True)


def q_wet_roundtrip(sf_dir):
    """WET sidecar round-trip (sources/warc.write_wet -> read_warc):
    every document written as a Common-Crawl-style conversion record
    (content-addressed member .warc.gz per batch, warcinfo leader)
    and read back — (doc_id, text) must be octet-identical to the
    source table, which the trivial identity oracle checks.  The
    extracted-text OUTPUT format of a crawl pipeline, as
    q:warc_roundtrip is its raw-archive INPUT format."""
    import os

    from ..sources.warc import read_warc, write_wet

    root = _scratch("wet_roundtrip", sf_dir)
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang"], parallel=8)

    def uri(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "uri": ("http://corpus/" + df["lang"].astype(str) + "/"
                    + df["doc_id"].astype("int64").astype(str)),
            "text": df["text"].to_numpy()})

    out = os.path.join(root, "wet")
    write_wet(ds.map_batches(uri, batch_format="pandas"), out)

    back = read_warc(out + "/")

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        conv = df[df["warc_type"] == "conversion"]
        return pd.DataFrame({
            "doc_id": (conv["target_uri"].str.rsplit("/", n=1)
                       .str[-1].astype("int64")),
            "text": conv["payload"].map(
                lambda b: bytes(b).decode("utf-8"))})

    res = back.map_batches(decode, batch_format="pandas").to_pandas()
    return res.sort_values("doc_id").reset_index(drop=True)


def q_chunk_dedup(sf_dir):
    """Chunk-level dedup savings (stages/cdc.cdc_dedup_stats): CDC
    chunks content-hashed to 128 bits, distinct count + byte sums via
    one (h1, h2, length)-int shuffle — what shift-resistant chunking
    recovers across a re-crawled corpus.  Rows-only driver check
    (boundaries aren't SQL); planted shared-prefix semantics pinned in
    t:test_text_ops."""
    from ..stages.cdc import cdc_dedup_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"],
               parallel=8)
    return cdc_dedup_stats(ds, mask_bits=5, min_size=8, max_size=128)


def q_bottomk_bykey(sf_dir):
    """Per-language deterministic uniform sample (stages/sketch
    .bottomk_sample_bykey): the 3 smallest md5(doc_id) WITHIN each
    lang — the stratified counterpart of q:bottomk_sample, same
    mergeable bottom-k invariance.  DuckDB row_number-over-md5 oracle
    in SQL_TAIL."""
    from ..stages.sketch import bottomk_sample_bykey

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"],
               parallel=8)
    res = bottomk_sample_bykey(ds, "lang", "doc_id", k=3)
    res["doc_id"] = res["doc_id"].astype("int64")
    return res[["lang", "doc_id", "h"]]


def q_fetch_schedule(sf_dir):
    """Per-host politeness fetch schedule: every candidate URL gets a
    time slot = (its rank within the host) x (the host's crawl delay)
    — the frontier -> fetch-queue step after q:url_frontier, one hash
    shuffle (stages/aggregate.window_over_key).  Hosts from
    user_id%20, delay = 1 + host%3 seconds.  DuckDB row_number
    arithmetic oracle in SQL_TAIL."""
    from ..stages.aggregate import window_over_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"],
               parallel=8)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "host": df["user_id"].astype("int64") % 20})

    ranked = window_over_key(
        ds.map_batches(keyed, batch_format="pandas"),
        "host", ["event_id"], "event_id")

    def slot(df: pd.DataFrame) -> pd.DataFrame:
        h = df["host"].astype("int64")
        return pd.DataFrame({
            "host": h,
            "event_id": df["event_id"].astype("int64"),
            "slot_s": ((df["rn"].astype("int64") - 1)
                       * (1 + h % 3))})

    res = ranked.map_batches(slot, batch_format="pandas").to_pandas()
    return res.sort_values("event_id").reset_index(drop=True)


def q_web_pretrain(sf_dir):
    """FULL raw-archive-to-LM-rows recipe (pipelines/crawl
    .run_web_pretrain): documents warcified (charset-mixed member
    .warc.gz), then crawl ingest (decode -> extract -> gate) -> gated
    rows adapted to the documents schema -> the complete pretrain back
    half (curation dedup -> decontaminate -> redact+mix -> epoch
    shuffle -> pack), every stage boundary a parquet resume point.
    Returns the merged funnel.  Rows-only driver check; the composed
    resume + funnel semantics are pinned in tests/test_crawl.py."""
    import os

    from ..pipelines.crawl import documents_to_warc, run_web_pretrain

    root = _scratch("web_pretrain", sf_dir)
    documents_to_warc(os.path.join(sf_dir, "documents.parquet"),
                      os.path.join(root, "warc"))
    stats = run_web_pretrain(
        os.path.join(root, "warc"), os.path.join(root, "out"),
        weights=MIX_WEIGHTS, default_weight=MIX_DEFAULT, seed=11,
        seq_len=64, fused=os.environ.get("GRAFT_FUSED") == "1")
    return pd.DataFrame({"stage": list(stats),
                         "value": [float(v) for v in stats.values()]})


def q_cdx_index(sf_dir):
    """CDX capture index over the fixture archive (sources/warc
    .build_cdx -> read_cdx): the documents table warcified
    (member-per-record .warc.gz), indexed — SURT key, 14-digit ts,
    capture coordinates — via per-archive parallel read + ONE
    (surt, ts, uri) range sort, read back from the CDXJ shards.
    The SQL oracle re-derives surt/ts/uri/mime/status from the
    deterministic fixture rule; the non-SQL coordinates
    (offset/length/digest: gzip-member spans + payload sha256) are
    pinned by t:test_warc random-access seeks."""
    import os

    from ..pipelines.crawl import documents_to_warc
    from ..sources.warc import build_cdx, read_cdx

    root = _scratch("cdx_index", sf_dir)
    warc_dir = documents_to_warc(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(root, "warc"))
    build_cdx(warc_dir, os.path.join(root, "cdx"))
    idx = read_cdx(os.path.join(root, "cdx")).to_pandas()
    idx["status"] = idx["status"].astype("int64")
    return (idx[["surt", "ts", "uri", "mime", "status"]]
            .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))


def q_revisit_dedup(sf_dir):
    """WARC revisit dedup (sources/warc.dedupe_revisit) over a
    two-snapshot fixture crawl: every document captured on two dates
    (identical payload), so snapshot 2 must come back 'revisit'
    pointing at snapshot 1 — plus any cross-document payload
    collisions the table itself carries.  Combiner-min + one digest
    hash-join; nothing corpus-sized on the driver.  The SQL oracle
    groups by text (same classes as sha256(payload) — payloads are
    plain utf-8 here) with a window min over the fixed-width (ts,uri)
    composite."""
    import os

    from ..sources.warc import build_warc, dedupe_revisit, read_warc

    root = _scratch("revisit_dedup", sf_dir)
    warc_dir = os.path.join(root, "warc2")
    marker = os.path.join(warc_dir, "_complete")
    if not os.path.exists(marker):
        os.makedirs(warc_dir, exist_ok=True)

        def write_block(df: pd.DataFrame) -> pd.DataFrame:
            recs = []
            for date in ("2025-01-01T00:00:00Z", "2025-01-02T00:00:00Z"):
                for i, t, lang in zip(df["doc_id"], df["text"],
                                      df["lang"]):
                    recs.append({
                        "headers": {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:doc:{i}:{date}>",
                            "WARC-Date": date,
                            "WARC-Target-URI":
                                f"http://corpus/{lang}/{i}",
                            "Content-Type":
                                "application/http; msgtype=response"},
                        "block": (b"HTTP/1.1 200 OK\r\n"
                                  b"Content-Type: text/plain\r\n\r\n"
                                  + str(t).encode("utf-8"))})
            lo = int(df["doc_id"].min())
            path = os.path.join(warc_dir, f"snap-{lo:08d}.warc.gz")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(build_warc(recs, gzip_members=True))
            os.replace(tmp, path)
            return pd.DataFrame({"path": [path]})

        (_read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
         .map_batches(write_block, batch_format="pandas",
                      batch_size=200).materialize())
        with open(marker, "w") as fh:
            fh.write("ok")

    res = dedupe_revisit(read_warc(warc_dir + "/")).to_pandas()
    cols = ["uri", "ts", "kind", "ref_uri", "ref_ts"]
    if res.empty:        # Ray's to_pandas drops zero-row block schema
        return pd.DataFrame({c: pd.Series([], dtype=object)
                             for c in cols})
    return res.sort_values(["uri", "ts"]).reset_index(drop=True)[cols]


def q_cdx_lookup(sf_dir):
    """Pruned point lookup against a committed CDX index (sources/warc
    .cdx_lookup): the cc-index cluster.idx read path — the driver-small
    shard range manifest selects covering shards, only those files
    open (t:test_warc pins the open count with a seam monkeypatch).
    Queries = every fixture url with doc_id % 97 == 0; the SQL oracle
    re-derives the expected captures from the deterministic fixture
    rule."""
    import os

    from ..pipelines.crawl import documents_to_warc
    from ..sources.warc import build_cdx, cdx_lookup

    root = _scratch("cdx_lookup", sf_dir)
    warc_dir = documents_to_warc(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(root, "warc"))
    cdx_dir = os.path.join(root, "cdx")
    build_cdx(warc_dir, cdx_dir)
    keys = _read(sf_dir, "documents",
                 columns=["doc_id", "lang"]).to_pandas()
    keys = keys[keys["doc_id"] % 97 == 0]
    urls = sorted("http://corpus/" + keys["lang"].astype(str) + "/"
                  + keys["doc_id"].astype("int64").astype(str))
    res = cdx_lookup(cdx_dir, urls=urls)
    res["status"] = res["status"].astype("int64")
    return (res[["q", "surt", "ts", "uri", "mime", "status"]]
            .sort_values("q").reset_index(drop=True))


def q_cdx_rolling(sf_dir):
    """Rolling CDX maintenance (sources/warc.append_cdx): the base
    index is built from the FIRST HALF of the archives, the second
    half arrives as an LSM generation increment, and the merged
    base+generation view must equal one monolithic index — which is
    exactly q:cdx_index's oracle, so the increment path answers to
    the same SQL as the full build."""
    import glob
    import os

    from ..pipelines.crawl import documents_to_warc
    from ..sources.warc import append_cdx, build_cdx, read_cdx

    root = _scratch("cdx_rolling", sf_dir)
    warc_dir = documents_to_warc(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(root, "warc"))
    files = sorted(glob.glob(os.path.join(warc_dir, "*.warc.gz")))
    half = max(1, len(files) // 2)
    cdx_dir = os.path.join(root, "cdx")
    build_cdx(files[:half], cdx_dir)
    if files[half:]:
        append_cdx(files[half:], cdx_dir, "delta")
    idx = read_cdx(cdx_dir).to_pandas()
    idx["status"] = idx["status"].astype("int64")
    return (idx[["surt", "ts", "uri", "mime", "status"]]
            .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))


def q_bottomk_sample(sf_dir):
    """Deterministic distributed uniform sample (stages/sketch
    .bottomk_sample): the 20 documents with the smallest
    md5(str(doc_id)) — a mergeable bottom-k sketch whose result is
    independent of partitioning, order and retries, unlike any seeded
    RNG sample.  DuckDB ORDER BY md5() LIMIT oracle in SQL_TAIL
    reproduces it exactly."""
    from ..stages.sketch import bottomk_sample

    ds = _read(sf_dir, "documents", columns=["doc_id"], parallel=8)
    res = bottomk_sample(ds, "doc_id", k=20)
    res["doc_id"] = res["doc_id"].astype("int64")
    return res


# Ordering contract: the driver's correctness gate checks the FIRST 50
# entries — every oracle-backed query (a key present in SQL) sits in
# positions 1-50; the rows-only entries (genuinely non-SQL-expressible:
# sketches, probabilistic banding, LSH recall, stub media kernels)
# follow at the tail.  tests/test_property.py pins this invariant.
QUERIES = {
    # parse / per-record transforms
    "parse_json": q_parse_json,
    "fields_split": q_fields_split,
    "scalar_funcs": q_scalar_funcs,
    "regex_extract": q_regex_extract,
    "anon_modes": q_anon_modes,
    # filters + router
    "filter_contains": q_filter_contains,
    "filter_rules": q_filter_rules,
    "route_fanout": q_route_fanout,
    # aggregation
    "dynstats_kinds": q_dynstats_kinds,
    "sendertrack": q_sendertrack,
    "percentiles": q_percentiles,
    "mmcount": q_mmcount,
    # throttles / sampling / runs
    "ratelimit_burst": q_ratelimit_burst,
    "exec_throttles": q_exec_throttles,
    "parse_time": q_parse_time,
    "ratelimit_summary": q_ratelimit_summary,
    "runs_compress": q_runs_compress,
    # dedup (exact + SQL-checkable near-dup)
    "dedup_exact": q_dedup_exact,
    "dedup_wordset": q_dedup_wordset,
    "dedup_minhash": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    # lookups
    "lookup_kinds": q_lookup_kinds,
    # sort / distinct / union
    "topk_orders": q_topk_orders,
    "union_tagged": q_union_tagged,
    "distinct_pairs": q_distinct_pairs,
    "epoch_shuffle": q_epoch_shuffle,
    "group_topk": q_group_topk,
    "explode_words": q_explode_words,
    # joins / windows
    "lineitem_agg": q_lineitem_agg,
    "multi_join": q_multi_join,
    "join_topk": q_join_topk,
    "hash_join": q_hash_join,
    "broadcast_join": q_broadcast_join,
    "asof_join": q_asof_join,
    "session_windows": q_session_windows,
    # templates / rendering / syslog core
    "template_render": q_template_render,
    "template_formats": q_template_formats,
    "format_time": q_format_time,
    "property_replacer": q_property_replacer,
    "syslog_roundtrip": q_syslog_roundtrip,
    "mmpstrucdata": q_mmpstrucdata,
    "net_funcs": q_net_funcs,
    # transforms
    "json_transform": q_json_transform,
    "hmac_sd": q_hmac_sd,
    # text / similarity (oracle-backed)
    "text_quality": q_text_quality,
    "pii_redact": q_pii_redact,
    "mix_sample": q_mix_sample,
    "stratified_sample": q_stratified_sample,
    "bm25_search": q_bm25_search,
    "knn_bruteforce": q_knn_bruteforce,
    # ---- rows-only tail (no SQL oracle by nature; pytest carries the
    # brute-force / statistical contracts) ----
    "approx_distinct": q_approx_distinct,
    "ratelimit_bucket": q_ratelimit_bucket,
    "dedup_simhash": q_dedup_simhash,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "knn_lsh": q_knn_lsh,
    "knn_ivf": q_knn_ivf,
    "media_features": q_media_features,
    "dedup_embed": q_dedup_embed,
    "approx_percentiles": q_approx_percentiles,
    "window_hopping": q_window_hopping,
    "decontaminate": q_decontaminate,
    "text_repetition": q_text_repetition,
    "line_dedup": q_line_dedup,
    "substring_dedup": q_substring_dedup,
    "url_dedup": q_url_dedup,
    "pack_sequences": q_pack_sequences,
    "lm_perplexity": q_lm_perplexity,
    "bpe_tokenize": q_bpe_tokenize,
    "quality_classifier": q_quality_classifier,
    "kmeans_clusters": q_kmeans_clusters,
    "semantic_dedup": q_semantic_dedup,
    "dsir_select": q_dsir_select,
    "bm25_index": q_bm25_index,
    "incremental_dedup": q_incremental_dedup,
    "chunk_documents": q_chunk_documents,
    "curation": q_curation,
    "pretrain_corpus": q_pretrain_corpus,
    "vendor_formats": q_vendor_formats,
    "snare_windows": q_snare_windows,
    "ngram_topk": q_ngram_topk,
    "gopher_rules": q_gopher_rules,
    "c4_filters": q_c4_filters,
    "range_join": q_range_join,
    "media_frames": q_media_frames,
    "media_thumbnail": q_media_thumbnail,
    "knn_pq": q_knn_pq,
    "table_profile": q_table_profile,
    "heavy_hitters": q_heavy_hitters,
    "tfidf_topk": q_tfidf_topk,
    "cross_decontaminate": q_cross_decontaminate,
    "filter_cascade": q_filter_cascade,
    "exact_quantiles": q_exact_quantiles,
    "cms_counts": q_cms_counts,
    "knn_sq": q_knn_sq,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "rollup_counts": q_rollup_counts,
    "window_funcs": q_window_funcs,
    "string_agg": q_string_agg,
    "pivot_counts": q_pivot_counts,
    "funnel": q_funnel,
    "cube_counts": q_cube_counts,
    "resample_counts": q_resample_counts,
    "event_paths": q_event_paths,
    "approx_distinct_bykey": q_approx_distinct_bykey,
    "table_diff": q_table_diff,
    "range_store": q_range_store,
    "window_rank": q_window_rank,
    "sequence_match": q_sequence_match,
    "retention": q_retention,
    "window_dist": q_window_dist,
    "corr_bykey": q_corr_bykey,
    "argmax_bykey": q_argmax_bykey,
    "window_bounds": q_window_bounds,
    "stats_bykey": q_stats_bykey,
    "analytics_report": q_analytics_report,
    "window_frame": q_window_frame,
    "window_ties": q_window_ties,
    "grouping_sets": q_grouping_sets,
    "unpivot": q_unpivot,
    "mode_bykey": q_mode_bykey,
    "asof_forward": q_asof_forward,
    "window_nth": q_window_nth,
    "ann_store": q_ann_store,
    "linreg_bykey": q_linreg_bykey,
    "pagerank": q_pagerank,
    "overlap_matrix": q_overlap_matrix,
    "window_range": q_window_range,
    "window_minmax": q_window_minmax,
    "quantile_bykey": q_quantile_bykey,
    "intersect_keys": q_intersect_keys,
    "except_keys": q_except_keys,
    "outer_join": q_outer_join,
    "ndv_bykey": q_ndv_bykey,
    "upsert_merge": q_upsert_merge,
    "bfs_hops": q_bfs_hops,
    "warc_roundtrip": q_warc_roundtrip,
    "text_langid_full": q_text_langid_full,
    "charset_sniff": q_charset_sniff,
    "crawl_ingest": q_crawl_ingest,
    "link_graph": q_link_graph,
    "robots_filter": q_robots_filter,
    "sitemap_freq": q_sitemap_freq,
    "window_offsets": q_window_offsets,
    "compact_store": q_compact_store,
    "composite_join": q_composite_join,
    "redirect_resolve": q_redirect_resolve,
    "hits_scores": q_hits_scores,
    "url_frontier": q_url_frontier,
    "mix_budget": q_mix_budget,
    "anchor_text": q_anchor_text,
    "main_content": q_main_content,
    "page_meta": q_page_meta,
    "bottomk_sample": q_bottomk_sample,
    "web_pretrain": q_web_pretrain,
    "fetch_schedule": q_fetch_schedule,
    "cdc_chunks": q_cdc_chunks,
    "chunk_dedup": q_chunk_dedup,
    "bottomk_bykey": q_bottomk_bykey,
    "wet_roundtrip": q_wet_roundtrip,
    "cdx_index": q_cdx_index,
    "revisit_dedup": q_revisit_dedup,
    "cdx_lookup": q_cdx_lookup,
    "cdx_rolling": q_cdx_rolling,
    "triangle_count": q_triangle_count,
    "pagerank_dist": q_pagerank_dist,
    "hits_dist": q_hits_dist,
    "bfs_dist": q_bfs_dist,
}

# vendor roundtrip: every output column is the planted closed form —
# the engine recovers them by DECODING the rendered Cisco/LEEF/audit
# lines through the shipped parsers (promoted from rows-only r5)
SQL_TAIL["vendor_formats"] = """
    SELECT event_id,
           CAST(event_id AS BIGINT) AS cisco_seq,
           'host' || CAST(user_id % 50 AS VARCHAR) AS cisco_origin,
           'EV-' || CAST(event_id % 8 AS VARCHAR) || '-'
               || upper(event_type) AS cisco_tag,
           true AS cisco_ok,
           event_type AS leef_event,
           CAST(user_id % 50 AS VARCHAR) AS leef_user,
           CAST(1300 + event_id % 10 AS BIGINT) AS audit_type,
           '1700000000.' || CAST(event_id % 1000 AS VARCHAR) || ':'
               || CAST(event_id AS VARCHAR) AS auditid,
           event_type AS audit_comm
    FROM events
"""

# mmsnareparse Windows decode: the oracle restates the planted values
# + the per-EventID knowledge tables (vendor.SNARE_EVENT_MAP /
# SNARE_LOGON_TYPES); the engine recovers them by PARSING the text
SQL_TAIL["snare_windows"] = """
    WITH e AS (
      SELECT event_id,
             CASE event_id % 5 WHEN 0 THEN 4624 WHEN 1 THEN 4625
                  WHEN 2 THEN 4634 WHEN 3 THEN 4672 ELSE 4688 END
                 AS win_event_id,
             user_id % 50 AS uid,
             CASE event_id % 9 WHEN 0 THEN 2 WHEN 1 THEN 3
                  WHEN 2 THEN 4 WHEN 3 THEN 5 WHEN 4 THEN 7
                  WHEN 5 THEN 8 WHEN 6 THEN 9 WHEN 7 THEN 10
                  ELSE 11 END AS lt,
             event_id % 60000 AS port
      FROM events)
    SELECT event_id, CAST(win_event_id AS BIGINT) AS win_event_id,
           CASE win_event_id WHEN 4624 THEN 'Logon'
                WHEN 4625 THEN 'Logon' WHEN 4672 THEN 'Privilege'
                WHEN 4688 THEN 'Process' ELSE '' END AS category,
           CASE win_event_id WHEN 4624 THEN 'Success'
                WHEN 4625 THEN 'Failure' WHEN 4672 THEN 'Assignment'
                WHEN 4688 THEN 'Creation' ELSE '' END AS subtype,
           CASE win_event_id WHEN 4625 THEN 'failure'
                ELSE 'success' END AS outcome,
           'user' || CAST(uid AS VARCHAR) AS account,
           CAST(lt AS BIGINT) AS logon_type,
           CASE lt WHEN 2 THEN 'Interactive' WHEN 3 THEN 'Network'
                WHEN 4 THEN 'Batch' WHEN 5 THEN 'Service'
                WHEN 7 THEN 'Unlock' WHEN 8 THEN 'NetworkCleartext'
                WHEN 9 THEN 'NewCredentials'
                WHEN 10 THEN 'RemoteInteractive'
                ELSE 'CachedInteractive' END AS logon_type_name,
           CAST(port AS BIGINT) AS source_port
    FROM e ORDER BY event_id
"""

# media pixel oracles: DuckDB restates the closed-form fixture image
# (stages/multimodal.synth_image) and the integer round-half-up mean
# spec — the engine side must DECODE real PNG/APNG bytes to match
SQL_TAIL["media_features"] = """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 13 AS w, 6 + doc_id % 7 AS h,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nc
      FROM documents),
    dy AS (SELECT doc_id, w, h, nc, unnest(range(h)) AS y FROM d),
    dyx AS (SELECT doc_id, w, h, nc, y, unnest(range(w)) AS x FROM dy),
    px AS (SELECT doc_id, w, h, nc,
                  (doc_id*7919 + y*31 + x*17 + unnest(range(nc))*131)
                  % 256 AS v
           FROM dyx)
    SELECT doc_id, CAST(any_value(w) AS BIGINT) AS width,
           CAST(any_value(h) AS BIGINT) AS height,
           CAST(any_value(nc) AS BIGINT) AS channels,
           CAST((2000*sum(v) + count(*)) // (2*count(*)) AS BIGINT)
               AS pix_mean_milli
    FROM px GROUP BY doc_id ORDER BY doc_id
"""
SQL_TAIL["media_thumbnail"] = """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 13 AS w, 6 + doc_id % 7 AS h,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nc
      FROM documents),
    dy AS (SELECT doc_id, w, h, nc, unnest(range(h)) AS y FROM d),
    dyx AS (SELECT doc_id, w, h, nc, y, unnest(range(w)) AS x FROM dy),
    px AS (SELECT doc_id, w, h, y, x, unnest(range(nc)) AS k FROM dyx),
    b AS (SELECT doc_id, (y*3) // h AS by, (x*4) // w AS bx, k,
                 (doc_id*7919 + y*31 + x*17 + k*131) % 256 AS v
          FROM px),
    tv AS (SELECT doc_id, by, bx, k,
                  (2*sum(v) + count(*)) // (2*count(*)) AS t
           FROM b GROUP BY doc_id, by, bx, k)
    SELECT doc_id, CAST(4 AS BIGINT) AS thumb_w,
           CAST(3 AS BIGINT) AS thumb_h,
           CAST(sum(t) AS BIGINT) AS thumb_sum
    FROM tv GROUP BY doc_id ORDER BY doc_id
"""
SQL_TAIL["media_frames"] = """
    WITH d AS (
      SELECT doc_id, 8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h,
             2 + doc_id % 4 AS nf FROM documents),
    sel AS (SELECT doc_id, w, h,
                   (unnest(range(least(nf, 3))) * nf) // least(nf, 3)
                       AS f
            FROM d),
    sy AS (SELECT doc_id, w, f, unnest(range(h)) AS y FROM sel),
    syx AS (SELECT doc_id, f, y, unnest(range(w)) AS x FROM sy),
    px AS (SELECT doc_id, f,
                  (doc_id*7919 + f*997 + y*31 + x*17
                   + unnest(range(3))*131) % 256 AS v
           FROM syx)
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           CAST((2000*sum(v) + count(*)) // (2*count(*)) AS BIGINT)
               AS frame_mean_milli
    FROM px GROUP BY doc_id, f ORDER BY doc_id, f
"""

# the distributed graph variants answer to the SAME oracles as their
# broadcast counterparts — one SQL definition, two implementations
SQL_TAIL["cdx_rolling"] = SQL_TAIL["cdx_index"]
SQL_TAIL["pagerank_dist"] = SQL_TAIL["pagerank"]
SQL_TAIL["hits_dist"] = SQL_TAIL["hits_scores"]
SQL_TAIL["bfs_dist"] = SQL_TAIL["bfs_hops"]
