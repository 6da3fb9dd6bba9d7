"""Composed curation pipeline: quality gate -> exact dedup -> near-dup
removal, verified on a corpus with planted exact and near duplicates."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq


def test_curation_pipeline(ray_session, tmp_path):
    from rsyslog_ray.pipelines.curation import run_curation

    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    df = base[["doc_id", "text", "lang", "source"]].copy()
    # plant: 10 exact copies, 10 near copies (one word appended), and
    # 5 junk docs that must fail the quality gate
    exact = df.head(10).copy()
    exact["doc_id"] = exact["doc_id"] + 100_000
    near = df.iloc[20:30].copy()
    near["doc_id"] = near["doc_id"] + 200_000
    near["text"] = near["text"] + " zzzz"
    junk = pd.DataFrame({
        "doc_id": range(300_000, 300_005),
        "text": ["a b"] * 5,                     # under min_tokens
        "lang": ["en"] * 5, "source": ["junk"] * 5,
    })
    corpus = pd.concat([df, exact, near, junk], ignore_index=True)
    src = str(tmp_path / "docs.parquet")
    corpus.to_parquet(src, index=False)

    out = str(tmp_path / "cur")
    stats = run_curation(src, out, min_tokens=3,
                         neardup_threshold=0.8)

    assert stats["docs_in"] == len(corpus)
    assert stats["after_quality_gate"] == len(corpus) - 5   # junk gone
    # exact dups collapse to the original (min doc_id kept)
    assert stats["after_exact_dedup"] == stats["after_quality_gate"] - 10
    # each planted near-pair drops its larger id
    assert stats["neardup_dropped"] >= 10
    assert stats["docs_out"] == stats["after_exact_dedup"] - stats["neardup_dropped"]

    got = pd.read_parquet(os.path.join(out, "curated"))
    assert len(got) == stats["docs_out"]
    assert not set(got["doc_id"]) & set(range(100_000, 100_010))  # exact
    assert not set(got["doc_id"]) & set(near["doc_id"])           # near
    assert set(df.head(10)["doc_id"]) <= set(got["doc_id"])       # originals
    assert "n_tokens" in got.columns and "pred_lang" in got.columns
    rec = json.load(open(os.path.join(out, "_curation_stats.json")))
    assert rec == stats


def test_curation_stage_resume(ray_session, tmp_path):
    """Stage-level resume: a re-run with completed stage dirs present
    skips those stages (exact parquet untouched byte-for-byte) and a
    re-run never duplicates rows — write_parquet into an existing dir
    would append files, so stages build in .inprogress dirs renamed
    atomically."""
    import glob
    import os

    from rsyslog_ray.pipelines.curation import run_curation

    base = pq.read_table("/root/testdata/sf0.001/documents.parquet") \
        .to_pandas()[["doc_id", "text", "lang", "source"]].head(100)
    dup = base.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    corpus = pd.concat([base, dup], ignore_index=True)
    src = str(tmp_path / "docs.parquet")
    corpus.to_parquet(src, index=False)
    out = str(tmp_path / "cur")

    stats1 = run_curation(src, out, min_tokens=3)
    exact_files = sorted(glob.glob(os.path.join(out, "exact", "*")))
    sig1 = [(f, os.path.getmtime(f), os.path.getsize(f))
            for f in exact_files]

    # partial resume: only the final stage redoes
    import shutil
    shutil.rmtree(os.path.join(out, "curated"))
    stats2 = run_curation(src, out, min_tokens=3)
    assert stats2 == stats1
    sig2 = [(f, os.path.getmtime(f), os.path.getsize(f))
            for f in sorted(glob.glob(os.path.join(out, "exact", "*")))]
    assert sig2 == sig1                      # exact stage skipped

    # full re-run: everything skipped, counts unchanged (no dup rows)
    stats3 = run_curation(src, out, min_tokens=3)
    assert stats3 == stats1
    got = pd.read_parquet(os.path.join(out, "curated"))
    assert len(got) == stats1["docs_out"]
    assert got["doc_id"].is_unique
