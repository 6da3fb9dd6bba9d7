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
    # plant a star through a HIGH-id middle doc: a~m and b~m but a!~b
    # (Jaccard(a,m)=18/22, Jaccard(m,b)=22/26 >= 0.8; Jaccard(a,b)=
    # 18/26 < 0.8).  Pair-based drop-the-larger would keep BOTH a and
    # b; cluster-correct keeps only a.
    base_words = [f"qq{i}" for i in range(20)]
    star_a = " ".join(base_words)                          # id 400_000
    star_m = " ".join(base_words + [f"mm{i}" for i in range(4)])
    star_b = " ".join(base_words + [f"mm{i}" for i in range(8)])
    star = pd.DataFrame({
        "doc_id": [400_000, 400_002, 400_001],
        "text": [star_a, star_m, star_b],
        "lang": ["en"] * 3, "source": ["star"] * 3,
    })
    corpus = pd.concat([df, exact, near, junk, star], ignore_index=True)
    src = str(tmp_path / "docs.parquet")
    corpus.to_parquet(src, index=False)

    out = str(tmp_path / "cur")
    stats = run_curation(src, out, min_tokens=3,
                         neardup_threshold=0.8)

    assert stats["docs_in"] == len(corpus)
    assert stats["after_quality_gate"] == len(corpus) - 5   # junk gone
    # exact dups collapse to the original (min doc_id kept)
    assert stats["after_exact_dedup"] == stats["after_quality_gate"] - 10
    # 10 planted near copies + 2 non-min members of the star cluster
    assert stats["neardup_dropped"] >= 12
    assert stats["docs_out"] == stats["after_exact_dedup"] - stats["neardup_dropped"]

    got = pd.read_parquet(os.path.join(out, "curated"))
    assert len(got) == stats["docs_out"]
    assert not set(got["doc_id"]) & set(range(100_000, 100_010))  # exact
    assert not set(got["doc_id"]) & set(near["doc_id"])           # near
    # the star cluster keeps exactly its min id — the pair-based rule
    # (drop the larger of each pair) would have kept 400_001 too
    assert set(got["doc_id"]) & {400_000, 400_001, 400_002} == {400_000}
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


def test_curation_fused_matches_default(ray_session, tmp_path):
    """fused=True (materialize() stage boundaries, no resume points)
    produces the identical funnel stats and survivor id set as the
    default parquet-staged run."""
    from rsyslog_ray.pipelines.curation import run_curation

    base = pq.read_table("/root/testdata/sf0.001/documents.parquet") \
        .to_pandas()[["doc_id", "text", "lang", "source"]].head(120)
    dup = base.head(6).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    near = base.iloc[10:16].copy()
    near["doc_id"] = near["doc_id"] + 200_000
    near["text"] = near["text"] + " zzzz"
    corpus = pd.concat([base, dup, near], ignore_index=True)
    src = str(tmp_path / "docs.parquet")
    corpus.to_parquet(src, index=False)

    stats_d = run_curation(src, str(tmp_path / "d"), min_tokens=3)
    stats_f, curated = run_curation(src, str(tmp_path / "f"),
                                    min_tokens=3, fused=True,
                                    _return_ds=True)
    assert stats_f == stats_d
    got_d = pd.read_parquet(os.path.join(str(tmp_path / "d"), "curated"))
    got_f = curated.to_pandas()
    assert sorted(got_f["doc_id"]) == sorted(got_d["doc_id"])
    # fused leaves NO stage dirs behind (no fake resume points)
    assert not os.path.isdir(os.path.join(str(tmp_path / "f"), "exact"))
    assert not os.path.isdir(os.path.join(str(tmp_path / "f"), "curated"))
