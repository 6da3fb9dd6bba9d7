"""Crawl-ingestion pipeline (pipelines/crawl.py): decode matrix,
extraction spec, quality gate, per-stage parquet resume."""

import json
import os

import pandas as pd
import pytest


@pytest.fixture()
def planted_docs(tmp_path):
    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "the quick brown fox jumps over the lazy dog it is fine",
            "der hund ist nicht die katze und ein vogel auf dem dach",
            "too short",                       # n_tokens < min gate
            "the the the the the the the the the the",  # stop spam
            "Это собака а не кошка в доме на улице холодно",
            "plain words without stopwords whatsoever here today",
        ],
        "lang": ["en", "de", "en", "en", "ru", "en"],
    })
    p = tmp_path / "docs.parquet"
    df.to_parquet(p)
    return str(p)


def test_crawl_ingest_gate_and_decode(ray_session, planted_docs,
                                      tmp_path):
    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_crawl_ingest)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    stats = run_crawl_ingest(warc, out, min_tokens=5,
                             max_stop_ratio=0.5)
    assert stats["n_records"] == 6
    # doc 2 (3 tokens < 5) and doc 3 (stop ratio 1.0) gated out
    assert stats["n_gated"] == 4
    # charset matrix by doc_id%4: docs 0,4 utf-8 + ASCII doc 2's
    # cp1252 sniffing utf-8 -> 3; docs 1,5 utf-16 -> 2; doc 3 BOM
    assert stats["by_charset"] == {"utf-8": 3, "utf-16-le": 2,
                                   "utf-8-sig": 1}
    assert stats["gated_by_lang"] == {"en": 1, "de": 1,
                                      "ru": 1, "und": 1}

    # extraction spec: the gated text contains the original body and
    # no tags survive
    rec = pd.read_parquet(os.path.join(out, "gated"))
    assert rec["text"].str.contains("quick brown fox").any()
    assert not rec["text"].str.contains("<").any()


def test_crawl_ingest_stage_resume(ray_session, planted_docs,
                                   tmp_path):
    """A torn run rebuilds ONLY the missing stage: records/ survives
    untouched (same files, same mtimes), stats identical."""
    import shutil

    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_crawl_ingest)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    s1 = run_crawl_ingest(warc, out)
    rdir = os.path.join(out, "records")
    before = {f: os.path.getmtime(os.path.join(rdir, f))
              for f in os.listdir(rdir)}
    shutil.rmtree(os.path.join(out, "gated"))         # torn stage
    s2 = run_crawl_ingest(warc, out)
    after = {f: os.path.getmtime(os.path.join(rdir, f))
             for f in os.listdir(rdir)}
    assert before == after                            # not rebuilt
    assert s1 == s2
    assert json.load(open(os.path.join(out, "_crawl_stats.json"))) == s2


def test_extract_links_resolution():
    """extract_links_frame: relative/absolute/parent-path hrefs
    resolve per RFC 3986 urljoin, single+double quotes, multiple
    links per row, rows without links vanish."""
    import pandas as pd

    from rsyslog_ray.stages.parse import extract_links_frame

    h = pd.Series([
        '<a href="/a/b"></a><a href=\'c.html\'></a>',
        '<a href="../up"></a><a href="http://other/x"></a>',
        "no links here",
    ])
    b = pd.Series(["http://h/d/e.html", "http://h/d/f/g.html",
                   "http://h/"])
    lk = extract_links_frame(h, b)
    assert lk["resolved"].tolist() == [
        "http://h/a/b", "http://h/d/c.html",
        "http://h/d/up", "http://other/x"]
    assert (lk["src_uri"].tolist()
            == ["http://h/d/e.html"] * 2 + ["http://h/d/f/g.html"] * 2)


def test_extract_anchors_resolution():
    """Anchor extraction keeps the link TEXT alongside the resolved
    href; anchor-less hrefs (no </a> body match) are skipped, nested
    tags inside the body are out of spec ([^<]*)."""
    from rsyslog_ray.stages.parse import extract_anchors_frame

    html = pd.Series([
        '<a href="/about">About Us</a> <a href="x.html"></a>',
        '<p>no links at all</p>',
        "<a class='z' href='https://other.example/p'>Other</a>"
        '<a href="/skip"><b>nested</b></a>',
    ])
    base = pd.Series(["http://ex.com/a/b", "http://ex.com/",
                      "http://ex.com/q"])
    got = extract_anchors_frame(html, base)
    assert got["resolved"].tolist() == [
        "http://ex.com/about", "http://ex.com/a/x.html",
        "https://other.example/p"]
    assert got["anchor"].tolist() == ["About Us", "", "Other"]
    assert got["src_uri"].tolist() == [
        "http://ex.com/a/b", "http://ex.com/a/b", "http://ex.com/q"]


def test_main_content_engine_equals_row_oracle():
    """Vectorized main_content_frame == per-row main_content_row on
    nasty HTML: link-dense navs, short footers, nested inline tags,
    whitespace runs, block tags with attributes, empty pages, pages
    that are ALL boilerplate."""
    from rsyslog_ray.stages.parse import (main_content_frame,
                                          main_content_row)

    pages = pd.Series([
        # nav dropped by link density, body kept, footer too short
        '<div class="nav"><a href="/">home page link here now</a></div>'
        '<p>this is the real article body with many words</p>'
        '<footer>(c) corp</footer>',
        # inline tags inside a content block collapse to spaces
        '<p>alpha <b>beta</b>\n  gamma\t<i>delta</i> epsilon zeta</p>',
        # all boilerplate -> empty
        '<li><a href="/a">a</a></li><li><a href="/b">b</a></li>',
        # no block tags at all: one block, kept iff long enough
        'just a bare run of text with enough words to keep',
        '',
        # two content blocks join with newline
        '<h1>heading words are often kept when long enough</h1>'
        '<p>second paragraph also has plenty of words in it</p>',
        # link density exactly AT the threshold stays (<=)
        '<p>aa bb cc dd <a href="/x">ee</a></p>',
    ])
    got = main_content_frame(pages)
    want = pages.map(main_content_row)
    assert got.tolist() == want.tolist()
    # spot-check semantics, not just parity
    assert got[0] == "this is the real article body with many words"
    assert got[1] == "alpha beta gamma delta epsilon zeta"
    assert got[2] == "" and got[4] == ""
    assert "\n" in got[5]


def test_extract_meta_frame_variants():
    """Title/meta-description extraction: single/double quotes,
    attribute order, missing fields -> empty strings, first title
    wins."""
    from rsyslog_ray.stages.parse import extract_meta_frame

    html = pd.Series([
        '<head><title>A Page</title>'
        '<meta name="description" content="hello world"></head>',
        "<meta name='description' content='single quotes'>",
        '<meta content="wrong-order" name="description">'
        '<title lang="en">Attr Title</title>',
        '<p>nothing here</p>',
        '<title>first</title><title>second</title>',
    ])
    got = extract_meta_frame(html)
    assert got["title"].tolist() == [
        "A Page", "", "Attr Title", "", "first"]
    # attribute-order variant (content before name) is out of spec
    assert got["meta_desc"].tolist() == [
        "hello world", "single quotes", "", "", ""]


def test_web_pretrain_end_to_end(ray_session, planted_docs, tmp_path):
    """Raw archives -> packed LM rows (run_web_pretrain): the crawl
    gate funnel feeds the pretrain back half; a second invocation is a
    pure resume no-op with an identical funnel (every stage boundary
    committed)."""
    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_web_pretrain)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    stats = run_web_pretrain(
        warc, out, seq_len=16, seed=3, default_weight=1.0,
        ingest_kwargs={"min_tokens": 5, "max_stop_ratio": 0.5})

    assert stats["crawl_n_records"] == 6
    assert stats["crawl_n_gated"] == 4          # docs 2, 3 gated out
    assert stats["curation.docs_in"] == 4       # adapter is lossless
    assert stats["packed_tokens"] > 0
    # adapter schema: doc_id recovered from the URI tail, source set
    docs = pd.read_parquet(os.path.join(out, "docs"))
    assert sorted(docs["doc_id"]) == [0, 1, 4, 5]
    assert set(docs["source"]) == {"crawl"}
    assert set(docs.columns) == {"doc_id", "text", "lang", "source"}

    # re-run: every stage resumes from its committed artifact — the
    # funnel is identical (packing is deterministic, so this holds
    # whether or not packed/ is rebuilt)
    stats2 = run_web_pretrain(
        warc, out, seq_len=16, seed=3, default_weight=1.0,
        ingest_kwargs={"min_tokens": 5, "max_stop_ratio": 0.5})
    assert stats2 == stats


def test_group_concat_as_dataset_matches_pandas(ray_session):
    """group_concat(as_dataset=True) streams the identical per-key
    concatenations (the corpus-sized-key path for per-document anchor
    aggregation)."""
    import ray

    from rsyslog_ray.stages.aggregate import group_concat

    df = pd.DataFrame({"k": [1, 2, 1, 2, 1], "v": list("abcde"),
                       "o": [3, 1, 1, 2, 2]})
    ds = ray.data.from_pandas(df).repartition(3)
    want = group_concat(ds, "k", "v", ["o"], sep=" ", out="agg")
    got = (group_concat(ds, "k", "v", ["o"], sep=" ", out="agg",
                        as_dataset=True)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert want["agg"].tolist() == ["c e a", "b d"]


def test_crawl_ingest_everything_gated_out(ray_session, planted_docs,
                                           tmp_path):
    """A gate that removes EVERY record still commits readable stage
    dirs and a zero funnel (Ray's parquet sink writes nothing for
    empty blocks — the stage commit must cover that)."""
    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_crawl_ingest)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    stats = run_crawl_ingest(warc, out, min_tokens=5,
                             max_stop_ratio=0.5, langs=("xx",))
    assert stats["n_records"] == 6
    assert stats["n_gated"] == 0 and stats["gated_by_lang"] == {}
    gated = pd.read_parquet(os.path.join(out, "gated"))
    assert len(gated) == 0
    assert set(gated.columns) == {"uri", "charset", "text",
                                  "n_tokens", "n_stop", "pred_lang"}


def test_web_pretrain_everything_gated_out(ray_session, planted_docs,
                                           tmp_path):
    """The composed recipe survives a gate that removes every record:
    all stage dirs commit readable (typed zero-row files) and the
    funnel is zero end-to-end."""
    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_web_pretrain)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    stats = run_web_pretrain(
        warc, out, seq_len=16, seed=3, default_weight=1.0,
        ingest_kwargs={"langs": ("xx",)})
    assert stats["crawl_n_gated"] == 0
    assert stats["curation.docs_in"] == 0
    assert stats["packed_tokens"] == 0
    docs = pd.read_parquet(os.path.join(out, "docs"))
    assert len(docs) == 0
    assert set(docs.columns) == {"doc_id", "text", "lang", "source"}


def test_web_pretrain_stage_truncation_matrix(ray_session,
                                              planted_docs, tmp_path):
    """Stage-truncation resume matrix for the composed recipe: after a
    full run, cut the pipeline at several representative stage
    boundaries (delete that artifact and everything downstream — the
    state any torn run leaves) and re-run; the final funnel must come
    back identical every time, and stages BEFORE the cut must not be
    rebuilt (mtime-pinned)."""
    import shutil

    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_web_pretrain)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    kw = dict(seq_len=16, seed=3, default_weight=1.0,
              ingest_kwargs={"min_tokens": 5, "max_stop_ratio": 0.5})
    want = run_web_pretrain(warc, out, **kw)

    # artifact dependency order (earliest -> latest)
    order = ["ingest/records", "ingest/gated", "docs",
             "pretrain/curation/exact",
             "pretrain/curation/neardup_pairs",
             "pretrain/curation/neardup_components",
             "pretrain/curation/curated",
             "pretrain/decon", "pretrain/mixed",
             "pretrain/shuffled", "pretrain/packed"]
    for cut in ("docs", "pretrain/curation/neardup_pairs",
                "pretrain/mixed", "pretrain/packed"):
        idx = order.index(cut)
        for art in order[idx:]:
            shutil.rmtree(os.path.join(out, art), ignore_errors=True)
        kept = {a: os.path.getmtime(os.path.join(out, a))
                for a in order[:idx]}
        got = run_web_pretrain(warc, out, **kw)
        assert got == want, f"funnel diverged after cut at {cut}"
        for a, m in kept.items():
            assert os.path.getmtime(os.path.join(out, a)) == m, \
                f"stage {a} rebuilt after cut at {cut}"


def test_web_pretrain_corrupt_inprogress_debris(ray_session,
                                                planted_docs, tmp_path):
    """Corrupted-artifact repair: a SIGKILLed run leaves a stage's
    ``.inprogress`` dir holding a HALF-WRITTEN parquet (garbage bytes).
    The re-run must wipe that debris and rebuild — never read it, never
    rename it into place — and converge to the clean funnel.  Debris
    beside a COMMITTED stage must be inert (the stage is skipped, the
    torn bytes never parsed)."""
    import shutil

    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_web_pretrain)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    kw = dict(seq_len=16, seed=3, default_weight=1.0,
              ingest_kwargs={"min_tokens": 5, "max_stop_ratio": 0.5})
    want = run_web_pretrain(warc, out, **kw)

    # torn state: mixed/ (and downstream) gone, but a .inprogress dir
    # with corrupt parquet bytes left where the killed run died
    for art in ("pretrain/mixed", "pretrain/shuffled",
                "pretrain/packed"):
        shutil.rmtree(os.path.join(out, art), ignore_errors=True)
    debris = os.path.join(out, "pretrain", "mixed.inprogress")
    os.makedirs(debris, exist_ok=True)
    with open(os.path.join(debris, "part-000.parquet"), "wb") as fh:
        fh.write(b"PAR1\x00\xff half a footer")
    # inert debris beside a stage that IS committed
    inert = os.path.join(out, "pretrain", "decon.inprogress")
    os.makedirs(inert, exist_ok=True)
    with open(os.path.join(inert, "junk.parquet"), "wb") as fh:
        fh.write(b"\x00garbage")

    got = run_web_pretrain(warc, out, **kw)
    assert got == want
    assert not os.path.isdir(debris)      # wiped, then renamed away
    assert os.path.isdir(os.path.join(out, "pretrain", "mixed"))


def test_corrupt_committed_stage_rebuilds(ray_session, planted_docs,
                                          tmp_path):
    """Post-commit disk fault: a COMMITTED stage file whose parquet
    footer no longer opens (truncation/bit-rot — atomic renames rule
    out torn writes here) is detected by the skip-path validation and
    the stage rebuilds instead of crashing a downstream read.  Healthy
    committed stages still skip (mtime-pinned)."""
    import glob

    from rsyslog_ray.pipelines.crawl import (documents_to_warc,
                                             run_web_pretrain)

    warc = str(tmp_path / "warc")
    out = str(tmp_path / "out")
    documents_to_warc(planted_docs, warc)
    kw = dict(seq_len=16, seed=3, default_weight=1.0,
              ingest_kwargs={"min_tokens": 5, "max_stop_ratio": 0.5})
    want = run_web_pretrain(warc, out, **kw)

    # rot a committed mid-recipe artifact + remove downstream so it
    # will actually be re-read
    victim = glob.glob(os.path.join(out, "pretrain", "mixed", "**",
                                    "*.parquet"), recursive=True)[0]
    good = open(victim, "rb").read()
    with open(victim, "wb") as fh:
        fh.write(good[: len(good) // 2])          # footer gone
    import shutil
    for art in ("pretrain/shuffled", "pretrain/packed"):
        shutil.rmtree(os.path.join(out, art), ignore_errors=True)
    rdir = os.path.join(out, "ingest", "records")
    before = {f: os.path.getmtime(os.path.join(rdir, f))
              for f in os.listdir(rdir)}

    got = run_web_pretrain(warc, out, **kw)
    assert got == want                            # rebuilt, identical
    # the rotted file was replaced by a fresh readable one
    import pyarrow.parquet as pq
    for f in glob.glob(os.path.join(out, "pretrain", "mixed", "**",
                                    "*.parquet"), recursive=True):
        pq.ParquetFile(f).metadata
    # untouched earlier stages still skipped
    after = {f: os.path.getmtime(os.path.join(rdir, f))
             for f in os.listdir(rdir)}
    assert before == after
