"""Full pretraining-corpus recipe (pipelines/pretrain.py): curation ->
decontamination -> PII + mixing -> epoch shuffle -> packing, on a
corpus with planted duplicates, a contaminated doc, PII, and a
zero-weight source; plus stage-level resume and determinism."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _fixture(tmp_path) -> tuple[str, pd.DataFrame, list]:
    base = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet").to_pandas()
    df = base[["doc_id", "text", "lang", "source"]].head(120).copy()
    exact = df.head(8).copy()                       # exact dups
    exact["doc_id"] = exact["doc_id"] + 100_000
    contaminated = pd.DataFrame({                   # shares a 13-gram
        "doc_id": [200_000],
        "text": [" ".join(df["text"].iloc[40].split()[:20]) + " tail"],
        "lang": ["en"], "source": ["src0"]})
    pii = pd.DataFrame({
        "doc_id": [200_001],
        "text": ["please mail spam bot at leak@example.com for fast "
                 "hash join table scan merge sort" ],
        "lang": ["en"], "source": ["src0"]})
    dropme = pd.DataFrame({                         # zero-weight source
        "doc_id": np.arange(200_010, 200_020),
        "text": ["unique row " + " ".join(f"u{i}w{j}" for j in range(12))
                 for i in range(10)],
        "lang": ["en"] * 10, "source": ["blocked"] * 10})
    corpus = pd.concat([df, exact, contaminated, pii, dropme],
                       ignore_index=True)
    src = str(tmp_path / "docs.parquet")
    corpus.to_parquet(src, index=False)
    bench = [" ".join(df["text"].iloc[40].split()[:16])]
    return src, corpus, bench


def _weights():
    return {f"src{i}": 1.0 for i in range(10)} | {"blocked": 0.0}


def test_pretrain_recipe(ray_session, tmp_path):
    from rsyslog_ray.pipelines.pretrain import run_pretrain

    src, corpus, bench = _fixture(tmp_path)
    out = str(tmp_path / "run1")
    stats = run_pretrain(src, out, benchmark_texts=bench,
                         weights=_weights(), default_weight=1.0,
                         seed=3, seq_len=32,
                         curation_kwargs={"min_tokens": 3})

    # funnel: exact dups dropped inside curation
    assert stats["curation.docs_in"] == len(corpus)
    curated = pd.read_parquet(os.path.join(out, "curation", "curated"))
    assert not set(curated["doc_id"]) & set(range(100_000, 100_008))

    # decontamination removed the planted doc AND its 13-gram source
    # doc (both sides of an eval leak are suspect — GPT-3 removes the
    # training doc; here both carry the gram so both drop)
    decon = pd.read_parquet(os.path.join(out, "decon"))
    assert 200_000 not in set(decon["doc_id"])
    assert stats["after_decontamination"] < len(curated)

    # PII scrubbed in the mixed output; zero-weight source gone
    mixed = pd.read_parquet(os.path.join(out, "mixed"))
    row = mixed[mixed["doc_id"] == 200_001]
    assert len(row) == 1                  # weight 1.0 always keeps
    assert "<EMAIL>" in row["text"].iloc[0]
    assert "leak@example.com" not in row["text"].iloc[0]
    assert not set(mixed["doc_id"]) & set(range(200_010, 200_020))

    # shuffle: every persisted block is internally skey-ordered (the
    # range-partitioned sort), keys unique, membership preserved
    shuf_dir = os.path.join(out, "shuffled")
    frames = [pd.read_parquet(os.path.join(shuf_dir, f))
              for f in sorted(os.listdir(shuf_dir))
              if f.endswith(".parquet")]
    for fr in frames:
        assert list(fr["skey"]) == sorted(fr["skey"])
    shuf = pd.concat(frames, ignore_index=True)
    assert shuf["skey"].is_unique
    assert set(shuf["doc_id"]) == set(mixed["doc_id"])

    # packing: counts line up, padding bounded
    assert stats["packed_rows"] > 0
    assert stats["pad_tokens"] < stats["packed_rows"] * 32
    assert 0 < stats["packing_efficiency_pct"] <= 100

    # determinism: a fresh run reproduces the funnel and the order
    out2 = str(tmp_path / "run2")
    stats2 = run_pretrain(src, out2, benchmark_texts=bench,
                          weights=_weights(), default_weight=1.0,
                          seed=3, seq_len=32,
                          curation_kwargs={"min_tokens": 3})
    # packing is DETERMINISTIC (skey hash buckets, default
    # pack_buckets=16): the whole funnel — packed_rows/pads included —
    # must reproduce across independent runs
    assert stats2 == stats
    shuf2 = pd.read_parquet(os.path.join(out2, "shuffled"))
    assert (list(shuf2.sort_values("skey")["doc_id"])
            == list(shuf.sort_values("skey")["doc_id"]))


def test_pretrain_stage_resume(ray_session, tmp_path):
    """Deleting a late stage dir re-runs ONLY that stage; completed
    earlier stages are not rebuilt (their dirs stay untouched)."""
    import shutil

    from rsyslog_ray.pipelines.pretrain import run_pretrain

    src, _, bench = _fixture(tmp_path)
    out = str(tmp_path / "run")
    kw = dict(benchmark_texts=bench, weights=_weights(),
              default_weight=1.0, seed=3, seq_len=32,
              curation_kwargs={"min_tokens": 3})
    stats = run_pretrain(src, out, **kw)

    marker = os.path.join(out, "decon", "_resume_marker")
    open(marker, "w").write("x")
    shutil.rmtree(os.path.join(out, "packed"))
    stats2 = run_pretrain(src, out, **kw)
    assert os.path.exists(marker)        # decon stage was NOT rebuilt
    assert stats2 == stats                # incl. deterministic packing


def test_pretrain_fused_matches_default(ray_session, tmp_path):
    """fused=True reproduces the default run's funnel exactly —
    packing is deterministic, so the packed stats match too."""
    from rsyslog_ray.pipelines.pretrain import run_pretrain

    src, corpus, bench = _fixture(tmp_path)
    kw = dict(benchmark_texts=bench, weights=_weights(),
              default_weight=1.0, seed=3, seq_len=64,
              curation_kwargs={"min_tokens": 3})
    stats_d = run_pretrain(src, str(tmp_path / "d"), **kw)
    stats_f = run_pretrain(src, str(tmp_path / "f"), fused=True, **kw)

    assert stats_f == stats_d
    # fused leaves no stage dirs (curation subdir may exist but empty
    # of stage artifacts)
    assert not os.path.isdir(os.path.join(str(tmp_path / "f"), "packed"))
    assert not os.path.isdir(os.path.join(str(tmp_path / "f"), "decon"))
