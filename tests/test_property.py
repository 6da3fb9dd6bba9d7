"""Property-based armor (hypothesis): engine == per-row oracle on
ARBITRARY inputs, not just generator-shaped ones.

Mirrors the reference's fuzzing strategy (tools/fuzz_rsyslog_message.c)
at the spec level: random bytes through sanitize/extract, random
strings through the rule chain, random rows through the router.
"""

import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings

from rsyslog_ray.rulebase import PAGES_RULEBASE, SYSLOG_RULEBASE
from rsyslog_ray.router import Route, Router
from rsyslog_ray.sanitize import sanitize_bytes
from rsyslog_ray.stages.parse import extract_text_arrow, extract_text_row

SET = settings(max_examples=60, deadline=None,
               suppress_health_check=[HealthCheck.too_slow])


@given(st.lists(st.binary(min_size=0, max_size=400), min_size=1, max_size=40))
@SET
def test_extract_byte_identity_on_arbitrary_bytes(payloads):
    eng = extract_text_arrow(pa.array(payloads, pa.binary())).tolist()
    for raw, got in zip(payloads, eng):
        assert extract_text_row(raw) == got


@given(st.lists(st.text(min_size=0, max_size=200)
                .map(lambda s: s.replace("\x00", " ")),
                min_size=1, max_size=40))
@SET
def test_rule_chain_matches_oracle_on_arbitrary_text(lines):
    # the chain must agree with the per-row oracle on ANY input line
    out = PAGES_RULEBASE.parse_table(pa.array(lines, pa.string()))
    rules = out["rule"].to_pylist()
    ok = out["parse_ok"].to_pylist()
    cols = {g: out[g].to_pylist() for g, _ in PAGES_RULEBASE.fields}
    for i, line in enumerate(lines):
        rn, fields = PAGES_RULEBASE.parse_row(line)
        assert (rn is not None) == ok[i], repr(line)
        assert rn == rules[i] or (rn is None and rules[i] is None), repr(line)
        for g, v in fields.items():
            got = cols[g][i]
            if v is None:
                assert got is None, (repr(line), g, got)
            elif hasattr(v, "isoformat"):
                assert got == v, (repr(line), g, got, v)
            else:
                assert got == v, (repr(line), g, got, v)


@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=30))
@SET
def test_syslog_chain_never_crashes(lines):
    out = SYSLOG_RULEBASE.parse_table(pa.array(lines, pa.string()))
    assert len(out["parse_ok"]) == len(lines)


_row = st.fixed_dictionaries({
    "s": st.one_of(st.none(), st.text(max_size=30)),
    "n": st.one_of(st.none(), st.integers(min_value=-10**6, max_value=10**6),
                   st.floats(allow_nan=False, allow_infinity=False,
                             width=32)),
    "b": st.booleans(),
})

_ROUTES = [
    Route("r1", ("==", "b", True), stop=True),
    Route("r2", ("contains", "s", "x")),
    Route("r3", (">=", "n", 0)),
    Route("r4", ("or", ("isempty", "s"), ("not", ("<", "n", 100)))),
    Route("r5", ("regex", "s", r"[aeiou]{2}")),
    Route("r6", ("true",)),
]


@given(st.lists(_row, min_size=1, max_size=50))
@SET
def test_router_masks_match_row_oracle(rows):
    df = pd.DataFrame(rows)
    router = Router(_ROUTES)
    masks = router.masks(df)
    for i in range(len(df)):
        row = df.iloc[i].to_dict()
        want = set(router.route_row(row))
        got = {s for s in router.sinks if bool(masks[s].iloc[i])}
        assert got == want, (row, got, want)


@given(st.binary(min_size=0, max_size=300))
@SET
def test_sanitize_invariants(raw):
    s = sanitize_bytes(raw)
    assert "\x00" not in s
    assert not s.endswith("\n") or raw.endswith(b"\n\n")
    for ch in s:
        assert ord(ch) >= 0x20 or ch in "\t\n"


def test_catalog_ordering_contract():
    """The driver's correctness gate checks the FIRST 50 queries()
    entries: every oracle-backed entry must sit inside that window and
    every in-window entry must have an oracle (rows-only entries go to
    the tail)."""
    from rsyslog_ray.pipelines.queries import QUERIES, SQL

    names = list(QUERIES)
    head = names[:50]
    assert all(n in SQL for n in head), \
        [n for n in head if n not in SQL]
    assert set(SQL) <= set(head)          # no oracle-backed entry past 50
    assert set(SQL) == set(head)          # exactly the checked window
    # SQL_TAIL: local-only oracles for tail entries — they must stay
    # OUT of the driver window (or they'd shift the pinned set) and
    # every key must name a real queries() entry
    from rsyslog_ray.pipelines.queries import SQL_TAIL

    assert set(SQL_TAIL).isdisjoint(head)
    assert set(SQL_TAIL) <= set(names)
    assert set(SQL_TAIL).isdisjoint(SQL)


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=0x2ff),
                        max_size=80), min_size=0, max_size=30),
       st.integers(min_value=1, max_value=64))
@SET
def test_octet_framing_roundtrip_arbitrary_chunking(msgs, chunk):
    """RFC6587 parser: any frame stream cut at ANY byte boundaries
    reassembles to exactly the original messages (the per-session
    remainder invariant)."""
    from rsyslog_ray.sources.textlog import split_octet_counted

    stream = b"".join(b"%d %s" % (len(m.encode()), m.encode())
                      for m in msgs)
    out, buf = [], b""
    for i in range(0, len(stream), chunk):
        buf += stream[i:i + chunk]
        frames, buf = split_octet_counted(buf)
        out.extend(frames)
    assert out == msgs
    assert buf == b""


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20),
       st.lists(st.integers(min_value=-5, max_value=10**6),
                min_size=1, max_size=20))
@SET
def test_template_render_never_crashes(texts, nums):
    """Template rendering over arbitrary frames: stable row count, no
    exceptions, constants always present."""
    import pandas as pd

    from rsyslog_ray.template import Template

    n = min(len(texts), len(nums))
    df = pd.DataFrame({"msg": texts[:n], "val": nums[:n]})
    for ttext in ("pre %msg% mid %val% post",
                  "%msg:1:5% | %msg:::uppercase,drop-cc,compressspace%",
                  "%msg:F,44:2% %val:::csv%",
                  r"%msg:R,ere,0,0,BLANK:(\w+)--end%",
                  "%msg:::secpath-replace% 100%%"):
        out = Template(ttext).render(df)
        assert len(out) == n
        assert out.notna().all()
    jf = Template("%msg:::jsonf%%val:::jsonf%").render_jsonf(df)
    import json as _json
    for v in jf:
        rec = _json.loads(v)          # always valid JSON
        assert set(rec) == {"msg", "val"}


_TS_FRAGMENTS = st.sampled_from([
    "2024", "99999", "0", "1969", "2100", "-", ":", ".", "T", "Z", " ",
    "+02:00", "-23:59", "+24:00", "Oct", "Jan", "dec", "XYZ", "11",
    "60", "61", "31", "32", "  ", "1", "007", "22:14:15", "2009",
    "extra trailing", ".5", ".", "",
    "\u0662\u0660\u0662\u0664", "\u00b2", "\u0662",  # unicode digits
])


@given(st.lists(_TS_FRAGMENTS, min_size=1, max_size=8).map("".join))
@SET
def test_parse_time_matches_scalar_oracle_on_adversarial_strings(s):
    """The vectorized regex parse_time must agree with the per-row
    structural mirror of the C parsers on arbitrary concatenations of
    timestamp fragments (the fuzz surface where regex and hand parser
    drift apart)."""
    import pandas as pd

    from rsyslog_ray.functions import parse_time
    from rsyslog_ray.oracle import parse_time_oracle

    now = pd.Timestamp("2026-08-17 12:00:00", tz="UTC")
    got = parse_time(pd.Series([s]), now=now)[0]
    want = parse_time_oracle(s, now)
    assert got == want, (s, got, want)


@given(st.datetimes(min_value=__import__("datetime").datetime(1969, 1, 1),
                    max_value=__import__("datetime").datetime(2099, 12, 31)),
       st.sampled_from(["%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S+05:30",
                        "%Y-%m-%dT%H:%M:%S.%f-07:00", "%b %d %H:%M:%S",
                        "%b  %d %H:%M:%S", "%Y %b %d %H:%M:%S"]))
@SET
def test_parse_time_matches_oracle_on_rendered_stamps(dt, fmt):
    """Round-trip: every strftime-rendered RFC3339/3164 variant parses
    identically through the vectorized path and the scalar mirror."""
    import pandas as pd

    from rsyslog_ray.functions import parse_time
    from rsyslog_ray.oracle import parse_time_oracle

    s = dt.strftime(fmt)
    now = pd.Timestamp("2026-08-17 12:00:00", tz="UTC")
    got = parse_time(pd.Series([s]), now=now)[0]
    want = parse_time_oracle(s, now)
    assert got == want, (s, got, want)


@given(st.binary(min_size=0, max_size=600))
@SET
def test_journal_export_parser_total_on_arbitrary_bytes(data):
    """The journal export parser must be total: arbitrary bytes parse
    without raising and every returned entry is a str->str dict."""
    from rsyslog_ray.sources.journal import entry_to_row, \
        split_journal_export

    for e in split_journal_export(data):
        assert all(isinstance(k, str) and isinstance(v, str)
                   for k, v in e.items())
        row = entry_to_row(e)
        assert 0 <= row["severity"] <= 7 and 0 <= row["facility"] <= 23


@given(st.text(min_size=0, max_size=600))
@SET
def test_kmsg_parser_total_on_arbitrary_text(text):
    from rsyslog_ray.sources.kmsg import split_kmsg

    for r in split_kmsg(text):
        assert r["pri"] == r["facility"] * 8 + r["severity"]
        assert r["seq"] >= 0 and r["monotonic_us"] >= 0


@given(st.lists(st.text(alphabet="ab ", max_size=120), min_size=1,
                max_size=20),
       st.integers(min_value=2, max_value=12),
       st.integers(min_value=0, max_value=11))
@SET
def test_chunking_covers_every_token(texts, chunk, overlap):
    """chunk_documents spec: for ANY text, concatenating each chunk's
    first `step` tokens plus the last chunk's tail reconstructs the
    document exactly — no token lost or duplicated outside overlaps."""
    from rsyslog_ray.stages.text import chunk_documents_oracle

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    out = chunk_documents_oracle(range(len(texts)), texts,
                                 chunk_tokens=chunk, overlap=overlap)
    for i, t in enumerate(texts):
        ch = out[out["doc_id"] == i].sort_values("chunk_seq")
        assert len(ch) >= 1
        toks = []
        for _, r in ch.iterrows():
            toks.extend(r["chunk_text"].split()[:step])
        toks.extend(ch.iloc[-1]["chunk_text"].split()[step:])
        assert toks == t.split(), (t, chunk, overlap)


@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=60).map(lambda ix: [
                    ["fast", "hash", "join", "pad", "x", "y"][i % 6]
                    for i in ix]),
       st.integers(min_value=1, max_value=5))
@SET
def test_bm25_score_invariant_under_batch_split(words, nsplit):
    """The integer-micro per-term rounding makes the total score
    independent of how the corpus is split into batches: summing the
    per-term contributions in ANY order/grouping gives the same
    score_micro (the property the distributed path relies on)."""
    import numpy as np

    from rsyslog_ray.stages.search import bm25_contrib

    tfs = pd.Series(words).value_counts()
    n, avgdl, dl = 10.0, 20.0, float(len(words))
    micros = [int(np.floor(bm25_contrib(
        np.float64(tf), np.float64(3), dl, n, avgdl) * 1e6 + 0.5))
        for tf in tfs]
    total = sum(micros)
    rng = np.random.RandomState(nsplit)
    perm = rng.permutation(len(micros))
    splits = np.array_split(perm, nsplit)
    assert sum(int(sum(micros[i] for i in s)) for s in splits) == total
