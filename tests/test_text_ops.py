"""PII redaction, source mixing, sequence packing and char-LM scoring
vs pure-Python / hand-computed oracles."""

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pytest

from rsyslog_ray.stages import text as tx


@pytest.fixture(scope="module")
def docs(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    return t.to_pandas()


# ---------------------------------------------------------------------
# PII redaction

def test_pii_redact_classes():
    import pyarrow as pa

    got = tx.pii_redact_array(pa.array([
        "mail a.b+c@ex-am.co.uk now",
        "ssn 123-45-6789 tel 555-123-4567 and 555.123.4567",
        "ip 10.200.3.7 ver 1.2.3.4.5",
        "no pii here",
        "digits 999-99-9999x stay",  # \b fails before the trailing x
    ])).to_pylist()
    assert got == [
        "mail <EMAIL> now",
        "ssn <SSN> tel <PHONE> and <PHONE>",
        "ip <IP> ver <IP>.5",
        "no pii here",
        "digits 999-99-9999x stay",
    ]


def test_card_redaction_luhn():
    # 4111111111111111 is the canonical Luhn-valid test PAN;
    # 4111111111111112 fails the checksum and must survive
    assert tx.redact_cards_row("pay 4111111111111111 ok") == "pay <CARD> ok"
    assert tx.redact_cards_row("pay 4111 1111 1111 1111 ok") == "pay <CARD> ok"
    assert (tx.redact_cards_row("order 4111111111111112 ref")
            == "order 4111111111111112 ref")
    # too short (12 digits) is an order id, not a card
    assert tx.redact_cards_row("id 123456789012") == "id 123456789012"
    # Luhn spec cross-check against an independent implementation
    def luhn_ref(ds):
        total = 0
        for i, ch in enumerate(reversed(ds)):
            d = int(ch)
            if i % 2 == 1:
                d = d * 2 - 9 if d * 2 > 9 else d * 2
            total += d
        return total % 10 == 0
    for pan in ["4111111111111111", "5500005555555559", "378282246310005",
                "4111111111111112", "1234567890123456"]:
        assert tx._luhn_valid(pan) == luhn_ref(pan)


# ---------------------------------------------------------------------
# deterministic source mixing

def test_mix_sample_membership_is_exact_md5_threshold(ray_session, docs):
    import ray.data

    weights = {"src0": 1.0, "src1": 0.0, "src2": 0.5}
    ds = ray.data.from_pandas(docs[["doc_id", "source"]])
    got = tx.mix_sample(ds, weights, default=0.25).to_pandas()
    kept = set(got["doc_id"])

    for _, row in docs.iterrows():
        w = weights.get(row["source"], 0.25)
        u = int(hashlib.md5(str(row["doc_id"]).encode()).hexdigest()[:8], 16)
        assert (u < w * 2**32) == (row["doc_id"] in kept)
    # weight 1.0 keeps everything, weight 0.0 keeps nothing
    src0 = docs[docs["source"] == "src0"]["doc_id"]
    src1 = docs[docs["source"] == "src1"]["doc_id"]
    assert set(src0) <= kept and not (set(src1) & kept)


# ---------------------------------------------------------------------
# sequence packing

def pack_oracle(ids, texts, seq_len):
    """Pure-Python spec: docs in id order, tokens + EOD each, cut into
    seq_len rows, pad the tail."""
    flat = []
    for _, t in sorted(zip(ids, texts)):
        flat.extend(tx._token_ids(t).tolist())
        flat.append(int(tx.PACK_EOD))
    n_pad = (-len(flat)) % seq_len
    flat += [int(tx.PACK_PAD)] * n_pad
    rows = [flat[i:i + seq_len] for i in range(0, len(flat), seq_len)]
    return rows, n_pad


def test_pack_batch_matches_spec():
    df = pd.DataFrame({
        "doc_id": [3, 1, 2, 4],
        "text": ["a b c", "d e", "", "f g h i j k l m"],
    })
    t = tx.pack_batch(df, seq_len=5)
    rows = t["seq"].to_pylist()
    want_rows, want_pad = pack_oracle(df["doc_id"], df["text"], 5)
    assert rows == want_rows
    # every doc contributes exactly one EOD; n_docs sums to n docs
    assert sum(t["n_docs"].to_pylist()) == len(df)
    assert t["n_pad"].to_pylist()[-1] == want_pad
    assert all(len(r) == 5 for r in rows)


def test_pack_sequences_distributed_totals(ray_session, docs):
    import ray.data

    seq_len = 64
    ds = ray.data.from_pandas(docs[["doc_id", "text"]]).repartition(4)
    out = tx.pack_sequences(ds, seq_len=seq_len).to_pandas()
    # conservation: every doc ends exactly once, and token+EOD+pad mass
    # fills the emitted rows exactly
    assert out["n_docs"].sum() == len(docs)
    n_tokens = int(sum(len(t.split()) for t in docs["text"]))
    assert len(out) * seq_len == n_tokens + len(docs) + out["n_pad"].sum()
    # per-shard packing pads at most one row per shard (4 shards)
    assert (out["n_pad"] > 0).sum() <= 4


# ---------------------------------------------------------------------
# char-ngram LM perplexity

def lm_oracle(texts, score_texts, order=3):
    """Pure-Python add-one-smoothed char-ngram LM."""
    from collections import Counter

    def codes(t):
        return [c - 96 if 97 <= c <= 122 else 0
                for c in t.lower().encode("utf-8", "replace")]

    ctx_counts: Counter = Counter()
    tri_counts: Counter = Counter()
    for t in texts:
        c = codes(t)
        for i in range(len(c) - order + 1):
            ctx = tuple(c[i:i + order - 1])
            ctx_counts[ctx] += 1
            tri_counts[(ctx, c[i + order - 1])] += 1

    out = []
    for t in score_texts:
        c = codes(t)
        if len(c) < order:
            out.append(0.0)
            continue
        bits = 0.0
        n = 0
        for i in range(len(c) - order + 1):
            ctx = tuple(c[i:i + order - 1])
            p = (tri_counts[(ctx, c[i + order - 1])] + 1) / (
                ctx_counts[ctx] + 27)
            bits += -math.log2(p)
            n += 1
        out.append(bits / n)
    return out


def test_lm_perplexity_matches_pure_python(ray_session, docs):
    import ray.data

    sub = docs.head(120)
    ds = ray.data.from_pandas(sub[["doc_id", "text"]]).repartition(3)
    got = (tx.lm_perplexity(ds).to_pandas()
           .set_index("doc_id")["bits_per_char"])
    want = lm_oracle(sub["text"], sub["text"])
    for d, w in zip(sub["doc_id"], want):
        assert got[d] == pytest.approx(w, abs=1e-9)
    # sanity: natural text scores lower than noise under its own model
    logp = tx.fit_char_lm(ds)
    nat = tx.lm_score_frame(pd.Series([sub["text"].iloc[0]]), logp).iloc[0]
    noise = tx.lm_score_frame(pd.Series(["qzxjv wvqkz jxqzv qvxkz"]),
                              logp).iloc[0]
    assert nat < noise


# ---------------------------------------------------------------------
# deterministic epoch shuffle

def test_epoch_shuffle_keys_and_order(ray_session, docs):
    import ray.data

    sub = docs.head(100)[["doc_id"]]
    ds = ray.data.from_pandas(sub).repartition(4)
    out = tx.epoch_shuffle(ds, seed=3).to_pandas()

    # key spec: md5("{seed}:{id}") hex, bit-for-bit
    for _, r in out.head(20).iterrows():
        want = hashlib.md5(f"3:{r['doc_id']}".encode()).hexdigest()
        assert r["skey"] == want
    # globally sorted by key (the shuffle IS the sort)
    assert list(out["skey"]) == sorted(out["skey"])
    assert set(out["doc_id"]) == set(sub["doc_id"])

    # reproducible; a different seed is a different permutation
    again = tx.epoch_shuffle(ds, seed=3).to_pandas()
    assert list(again["doc_id"]) == list(out["doc_id"])
    other = tx.epoch_shuffle(ds, seed=4).to_pandas()
    assert list(other["doc_id"]) != list(out["doc_id"])


# ---------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021 A.1.1)

GOPHER_FIXTURES = [
    # passes every rule: 60 normal words with stopwords
    " ".join(["the quick brown fox jumps over and that have with be"] * 6),
    # too short
    "the and of short doc.",
    # bullets dominate (>90% of lines)
    "\n".join(["- bullet item level entry"] * 20),
    # ellipsis endings dominate
    "\n".join(["the words trail off here..."] * 10
              + ["plain line of the text"] * 10),
    # symbol-heavy (# per word > 0.1)
    "the tag #a #b #c #d #e #f #g and that have with be ok",
    # mostly non-alphabetic words
    " ".join(["123 456 789 000"] * 20) + " the and",
    # no stopwords at all
    " ".join(["zebra quokka lorax pangolin"] * 20),
    # unicode ellipsis + unicode bullet lines
    "• first…\n‣ second…\nthe plain and line that have with be",
    "",                                     # empty doc
    "\n\n\n",                               # only blank lines
]


def test_gopher_frame_matches_row_spec(docs):
    texts = pd.Series(GOPHER_FIXTURES + list(docs["text"].head(100)))
    got = tx.gopher_quality_frame(texts)
    for i, t in texts.items():
        want = tx.gopher_row(t)
        have = {c: int(got.loc[i, c]) for c in got.columns}
        assert have == want, (i, t[:60], have, want)


def test_gopher_rule_boundaries():
    # exactly 50 words with stopwords -> keep; 49 -> drop
    w49 = "the and " + " ".join(f"word{i}" for i in range(47))
    w50 = w49 + " more"
    assert tx.gopher_row(w50)["gopher_keep"] == 1
    assert tx.gopher_row(w49)["gopher_keep"] == 0
    # one stopword is not enough, two are
    base = " ".join(f"word{i}" for i in range(60))
    assert tx.gopher_row(base + " the")["gopher_keep"] == 0
    assert tx.gopher_row(base + " the and")["gopher_keep"] == 1


# ---------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2)

C4_FIXTURES = [
    # kept: 3 terminal-punct sentences of >=5 words
    "This is the first good sentence.\nHere is another good one!\n"
    "And a third question to keep?",
    # line dropped: <5 words
    "Too short line.\nThis one has five words.\n"
    "Another keeper with five words.\nAnd one more to clear three.",
    # javascript line dropped (case-insensitive)
    "Enable JavaScript to view this.\nReal content sentence number one.\n"
    "Real content sentence number two.\nReal content sentence number three.",
    # doc gate: lorem ipsum
    "Lorem ipsum dolor sit amet consectetur.\nSecond real sentence is "
    "here now.\nThird real sentence is here too.",
    # doc gate: curly brace
    "This code block has braces {x}.\nSecond real sentence is here "
    "now.\nThird real sentence is here too.",
    # doc gate: <3 sentences after cleaning
    "Only one good sentence survives here.\nno terminal punct\nshort.",
    # quoted-terminal line is kept
    'He said "this is a quote."\nShe replied with more words there.\n'
    'Then everyone nodded along quietly again.',
    "",
]


def test_c4_frame_matches_row_spec(docs):
    texts = pd.Series(C4_FIXTURES + list(docs["text"].head(100)))
    got = tx.c4_filter_frame(texts)
    for i, t in texts.items():
        want = tx.c4_row(t)
        have = {"clean": got.loc[i, "clean"],
                "n_lines_kept": int(got.loc[i, "n_lines_kept"]),
                "n_sentences": int(got.loc[i, "n_sentences"]),
                "c4_keep": int(got.loc[i, "c4_keep"])}
        assert have == want, (i, t[:60], have, want)
    # the named gates fire as designed
    keeps = list(got["c4_keep"][:len(C4_FIXTURES)])
    assert keeps == [1, 1, 1, 0, 0, 0, 1, 0]


# ---------------------------------------------------------------------
# corpus n-gram top-k (Wimbd-style)

def _ngram_spec(texts, n):
    from collections import Counter
    c = Counter()
    for t in texts:
        w = [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split()
             if x]
        for i in range(len(w) - n + 1):
            c[" ".join(w[i:i + n])] += 1
    return c


def test_ngram_topk_matches_spec(ray_session, docs):
    import ray.data

    ds = ray.data.from_pandas(docs[["text"]]).repartition(8)
    got = tx.ngram_topk(ds, n=3, k=25)
    spec = _ngram_spec(docs["text"], 3)
    want = sorted(spec.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert list(zip(got["gram"], got["cnt"])) == want
    # distributed-final path (tiny threshold forces the partitioned
    # per-gram sum + local top-k) must agree exactly
    got2 = tx.ngram_topk(ds, n=3, k=25, driver_threshold=1, nparts=8)
    assert list(zip(got2["gram"], got2["cnt"])) == want


def test_ngram_boundaries_do_not_cross_docs(ray_session):
    import ray.data

    df = pd.DataFrame({"text": ["alpha beta", "beta gamma delta"]})
    ds = ray.data.from_pandas(df)
    got = tx.ngram_topk(ds, n=2, k=10)
    grams = set(got["gram"])
    assert "alpha beta" in grams and "beta gamma" in grams
    assert "beta beta" not in grams          # would need a cross-doc gram


# ---------------------------------------------------------------------
# TF-IDF keyword extraction

def _tfidf_norm(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    return (df.sort_values(["doc_id", "rnk"]).reset_index(drop=True)
            [["doc_id", "rnk", "term", "tf", "df"]])


def test_tfidf_topk_matches_spec(ray_session, docs):
    import ray.data

    ds = ray.data.from_pandas(
        docs[["doc_id", "text"]].head(200)).repartition(8)
    got = _tfidf_norm(tx.tfidf_topk(ds, k=5))
    want = pd.DataFrame(tx.tfidf_oracle(
        docs["doc_id"].head(200).tolist(),
        docs["text"].head(200).tolist(), k=5))
    pd.testing.assert_frame_equal(got, _tfidf_norm(want))
    # distributed final (postings hash-partitioned on term — nothing
    # vocabulary-sized on the driver) must emit identical rows
    got2 = _tfidf_norm(tx.tfidf_topk(ds, k=5, driver_threshold=1,
                                     nparts=8))
    pd.testing.assert_frame_equal(got2, got)


def test_tfidf_rank_boundaries(ray_session):
    import ray.data

    # df == N class: every doc contains 'same' -> idf exactly 0.0;
    # rank falls through to tf desc then term asc; k cuts mid-tie
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["same same rare aa bb cc",
                                "same solo",
                                "same"]})
    got = _tfidf_norm(tx.tfidf_topk(ray.data.from_pandas(df), k=3))
    want = pd.DataFrame(tx.tfidf_oracle([1, 2, 3], df["text"].tolist(),
                                        k=3))
    pd.testing.assert_frame_equal(got, _tfidf_norm(want))
    d1 = got[got["doc_id"] == 1]
    # idf==0 'same' (score 0.0) loses to every df=1 term despite tf=2;
    # the four equal-score df=1 terms cut at k by term asc
    assert d1["term"].tolist() == ["aa", "bb", "cc"]
    assert got[got["doc_id"] == 3]["term"].tolist() == ["same"]


# ---------------------------------------------------------------------
# Filter cascade (first-fail attrition funnel)

def test_filter_cascade_matches_spec(ray_session, docs):
    import ray.data

    ds = ray.data.from_pandas(docs[["text"]]).repartition(8)
    got = tx.filter_cascade(ds)
    want = pd.DataFrame(tx.cascade_oracle(docs["text"].tolist()))
    pd.testing.assert_frame_equal(got, want)


def test_filter_cascade_first_fail_attribution(ray_session):
    import ray.data

    w30 = " ".join(["word"] * 40)          # 40 words, mean len 4 ok?
    # 'word' -> mean_wlen = 4.0 < 4.5 band -> rule 3; build a passing
    # base: words of length 5 ('tokka') -> mean 5.0, add 'the'
    base = " ".join(["tokka"] * 39) + " the"
    texts = [
        "tiny doc",                         # rule 1 (min_words)
        " ".join(["tokka"] * 200),          # rule 2 (max_words)
        w30,                                # rule 3 (mean_wlen 4.0)
        " ".join(["tokka"] * 40),           # rule 4 (no stopwords)
        base + " {",                        # brace... but adds a word
        base.replace("tokka", "tokka", 1) + " lorem ipsum",
        base,                               # passes all
        "a {",                              # fails 1 AND 5 -> counts in 1
    ]
    got = tx.filter_cascade(ray.data.from_pandas(
        pd.DataFrame({"text": texts})))
    want = pd.DataFrame(tx.cascade_oracle(texts))
    pd.testing.assert_frame_equal(got, want)
    by = got.set_index("rule")
    assert by.loc["min_words", "n_dropped"] == 2   # incl. the 'a {' doc
    assert by.loc["max_words", "n_dropped"] == 1
    assert by.loc["mean_wlen", "n_dropped"] == 1
    assert by.loc["stopwords", "n_dropped"] == 1
    assert got.iloc[-1]["n_out"] + got["n_dropped"].sum() == len(texts)


def test_cdc_engine_equals_sequential_oracle(ray_session):
    """Content-defined chunking: the vectorized closed-form gear hash
    == the published sequential recurrence (hypothesis-style fuzz over
    random byte buffers incl. empty / tiny / all-same), every byte
    covered exactly once, interior chunks respect [min, max], and a
    one-byte insert realigns all far-downstream boundaries (the
    shift-resistance CDC exists for — fixed-size blocks realign
    none)."""
    import numpy as np

    from rsyslog_ray.stages.cdc import (cdc_boundaries,
                                        cdc_boundaries_oracle)

    rng = np.random.default_rng(11)
    bufs = [b"", b"x", b"ab" * 3, bytes(300), b"\xff" * 700]
    bufs += [bytes(rng.integers(0, 256, int(rng.integers(0, 1500)),
                                dtype=np.uint8)) for _ in range(60)]
    for data in bufs:
        got = cdc_boundaries(data)
        assert got == cdc_boundaries_oracle(data)
        assert sum(ln for _, ln in got) == len(data)
        assert all(16 <= ln <= 256 for _, ln in got[:-1])
        if got:
            assert got[-1][1] <= 256

    base = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
    edited = base[:50] + b"Z" + base[50:]
    far_base = {o for o, _ in cdc_boundaries(base) if o > 400}
    far_edit = {o - 1 for o, _ in cdc_boundaries(edited) if o > 401}
    assert far_base and far_base <= far_edit

    # Dataset wrapper: same rows regardless of partitioning
    import ray

    from rsyslog_ray.stages.cdc import cdc_chunks
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["alpha beta gamma delta " * 9,
                                "", "short"]})
    for nparts in (1, 3):
        out = (cdc_chunks(ray.data.from_pandas(df).repartition(nparts),
                          mask_bits=4, min_size=4, max_size=32)
               .to_pandas().sort_values(["doc_id", "chunk_idx"])
               .reset_index(drop=True))
        want = []
        for i, t in zip(df["doc_id"], df["text"]):
            for ix, (o, ln) in enumerate(cdc_boundaries_oracle(
                    t.encode(), mask_bits=4, min_size=4,
                    max_size=32)):
                want.append((i, ix, o, ln))
        assert list(map(tuple, out.to_numpy())) == want


def test_cdc_dedup_stats_planted_sharing(ray_session):
    """Chunk-level dedup stats == a set-of-chunk-bytes spec on a
    corpus with a large shared prefix (A = X+Y, B = X+Z, C == A):
    identical docs dedup fully, the shared prefix dedups across
    distinct docs, totals cover every byte; partition-invariant."""
    import numpy as np
    import ray

    from rsyslog_ray.stages.cdc import cdc_boundaries, cdc_dedup_stats

    rng = np.random.default_rng(23)
    mk = lambda n: "".join(chr(97 + c) for c in
                           rng.integers(0, 26, n))
    X, Y, Z = mk(3000), mk(800), mk(900)
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [X + Y, X + Z, X + Y]})

    def spec(texts):
        seen = {}
        n_chunks = bytes_total = 0
        for t in texts:
            raw = t.encode()
            for off, ln in cdc_boundaries(raw, mask_bits=5,
                                          min_size=8, max_size=128):
                n_chunks += 1
                bytes_total += ln
                seen.setdefault(raw[off:off + ln], ln)
        return (n_chunks, len(seen), bytes_total, sum(seen.values()))

    want = spec(df["text"])
    for nparts in (1, 3):
        got = cdc_dedup_stats(
            ray.data.from_pandas(df).repartition(nparts),
            mask_bits=5, min_size=8, max_size=128)
        assert tuple(got.iloc[0]) == want
    n_chunks, n_distinct, bytes_total, bytes_distinct = want
    assert bytes_distinct < bytes_total          # sharing recovered
    assert bytes_total == sum(len(t.encode()) for t in df["text"])
    # doc 3 == doc 1: at least the whole of doc 1's bytes dedup away
    assert bytes_total - bytes_distinct >= len((X + Y).encode())


# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(st.binary(min_size=0, max_size=1200),
       st.integers(min_value=1, max_value=9),
       st.integers(min_value=1, max_value=24))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_cdc_parity_hypothesis(data, mask_bits, min_size):
    """Any bytes, any mask width, any min size: the vectorized gear
    hash == the sequential recurrence, coverage is exact, interior
    chunks respect [min, max]."""
    from rsyslog_ray.stages.cdc import (cdc_boundaries,
                                        cdc_boundaries_oracle)

    max_size = min_size * 4 + 8
    got = cdc_boundaries(data, mask_bits=mask_bits,
                         min_size=min_size, max_size=max_size)
    assert got == cdc_boundaries_oracle(
        data, mask_bits=mask_bits, min_size=min_size,
        max_size=max_size)
    assert sum(ln for _, ln in got) == len(data)
    for _, ln in got[:-1]:
        assert min_size <= ln <= max_size


_FRAGS = st.sampled_from([
    "<p>", "</p>", "<div class='x'>", "</div>", "<nav>", "</nav>",
    "<a href='/y'>", "</a>", "<b>", "</b>", "<br>", "<hr>",
    "word", "another word run", "  ", "\n", "\t", "x", "",
    "mixed <a href='/z'>link text</a> tail", "<li>", "</li>"])


@given(st.lists(_FRAGS, min_size=0, max_size=30),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=100))
@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_main_content_parity_hypothesis(frags, min_words, pct):
    """Arbitrary compositions of tags, anchors and whitespace: the
    vectorized block classifier == the per-row oracle for any
    min-words / link-density thresholds."""
    from rsyslog_ray.stages.parse import (main_content_frame,
                                          main_content_row)

    html = "".join(frags)
    got = main_content_frame(pd.Series([html]), min_words=min_words,
                             max_link_pct=pct).iloc[0]
    want = main_content_row(html, min_words=min_words,
                            max_link_pct=pct)
    assert got == want


def test_pack_sequences_deterministic_buckets(ray_session, docs):
    """buckets>0 packing is partition-invariant: the same rows at two
    different repartitionings pack to byte-identical sequence rows,
    and the non-pad token stream equals per-block packing's."""
    import ray

    seq_len = 32
    df = docs if hasattr(docs, "columns") else None
    ds = ray.data.from_pandas(df) if df is not None else None
    if ds is None:
        import pandas as pd
        ds = ray.data.from_pandas(pd.DataFrame(docs))

    def rows(d, buckets):
        out = tx.pack_sequences(d, seq_len=seq_len,
                                buckets=buckets).to_pandas()
        return sorted(tuple(s) for s in out["seq"])

    a = rows(ds.repartition(2), buckets=4)
    b = rows(ds.repartition(7), buckets=4)
    assert a == b
    # totals invariant vs per-block mode
    nonpad_det = sum(1 for s in a for v in s if v != tx.PACK_PAD)
    per_block = rows(ds.repartition(3), buckets=0)
    nonpad_blk = sum(1 for s in per_block for v in s if v != tx.PACK_PAD)
    assert nonpad_det == nonpad_blk
