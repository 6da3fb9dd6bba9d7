"""Range-partitioned store: equi-depth split, pruned reads (file
subset pinned), torn-dir rebuild, and incremental_agg_update."""

import glob
import json
import os

import numpy as np
import pandas as pd


def _store(ray, tmp_path, df, n_ranges=8):
    import ray.data

    from rsyslog_ray.stages.rangestore import write_range_partitioned

    out = str(tmp_path / "store")
    rec = write_range_partitioned(
        ray.data.from_pandas(df).repartition(6), "v", out,
        n_ranges=n_ranges)
    return out, rec


def test_range_store_roundtrip_and_pruning(ray_session, tmp_path):
    import ray

    from rsyslog_ray.stages.rangestore import (pruned_range_files,
                                               read_range)

    rng = np.random.default_rng(53)
    # skewed values: equi-depth must still balance row counts
    df = pd.DataFrame({"v": np.concatenate(
        [rng.exponential(10, 30000), np.full(3000, 5.0)]),
        "id": np.arange(33000, dtype="int64")})
    out, rec = _store(ray, tmp_path, df)
    assert os.path.exists(os.path.join(out, "_ranges.json"))

    # full-range read == source rows
    got = read_range(out, -np.inf, np.inf).to_pandas()
    assert len(got) == len(df)
    assert set(got["id"]) == set(df["id"])

    # narrow predicate: correct rows AND a strict file subset
    lo, hi = 3.0, 6.0
    sel = read_range(out, lo, hi).to_pandas()
    want = df[(df["v"] >= lo) & (df["v"] < hi)]
    assert len(sel) == len(want) and set(sel["id"]) == set(want["id"])
    all_files = glob.glob(os.path.join(out, "range=*", "*.parquet"))
    used = pruned_range_files(out, lo, hi)
    assert 0 < len(used) < len(all_files)

    # equi-depth: every range dir holds rows (no empty splits under skew)
    sizes = {}
    for d in glob.glob(os.path.join(out, "range=*")):
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{d}/*.parquet"))
        sizes[d] = n
    assert min(sizes.values()) > 0

    # committed dir: re-invoke is a no-op (manifest returned verbatim)
    import ray.data
    from rsyslog_ray.stages.rangestore import write_range_partitioned
    rec2 = write_range_partitioned(
        ray.data.from_pandas(df.head(5)), "v", out)
    assert rec2 == rec

    # torn dir (marker removed) is wiped and rebuilt
    os.remove(os.path.join(out, "_ranges.json"))
    rec3 = write_range_partitioned(
        ray.data.from_pandas(df).repartition(3), "v", out, n_ranges=4)
    assert len(rec3["edges"]) == 5
    got = read_range(out, -np.inf, np.inf).to_pandas()
    assert len(got) == len(df)


def test_incremental_agg_update_equals_full_recompute(ray_session):
    import ray.data

    from rsyslog_ray.stages.aggregate import (incremental_agg_update,
                                              two_phase_agg)

    rng = np.random.default_rng(59)
    old = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 8000),
                        "v": rng.integers(0, 9, 8000).astype("int64")})
    new = pd.DataFrame({"k": rng.choice(["b", "c", "d"], 5000),
                        "v": rng.integers(0, 9, 5000).astype("int64")})

    prev = two_phase_agg(ray.data.from_pandas(old).repartition(4),
                         ["k"], count="cnt", sums={"v": "sv"})
    got = incremental_agg_update(
        prev, ray.data.from_pandas(new).repartition(4), ["k"],
        count="cnt", sums={"v": "sv"})

    full = (two_phase_agg(
        ray.data.from_pandas(pd.concat([old, new], ignore_index=True))
        .repartition(4), ["k"], count="cnt", sums={"v": "sv"})
        .sort_values(["k"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, full, check_dtype=False)
    assert "d" in set(got["k"])  # a key the old aggregate never saw


def test_range_store_generation_appends(ray_session, tmp_path):
    import ray
    import ray.data

    from rsyslog_ray.stages.rangestore import (append_range_partitioned,
                                               read_range,
                                               write_range_partitioned)

    rng = np.random.default_rng(67)
    a = pd.DataFrame({"v": rng.uniform(0, 100, 8000),
                      "id": np.arange(8000, dtype="int64")})
    # increment includes values OUTSIDE the base hull (clip into edges)
    b = pd.DataFrame({"v": np.concatenate(
        [rng.uniform(0, 100, 3000), [-50.0, 500.0]]),
        "id": np.arange(8000, 11002, dtype="int64")})

    out = str(tmp_path / "store")
    write_range_partitioned(ray.data.from_pandas(a).repartition(4),
                            "v", out, n_ranges=6)
    rec = append_range_partitioned(
        ray.data.from_pandas(b).repartition(3), out, gen_id="g1")
    assert rec["n_rows"] == len(b)

    got = read_range(out, -np.inf, np.inf).to_pandas()
    assert set(got["id"]) == set(range(11002))
    band = read_range(out, 20.0, 30.0).to_pandas()
    full = pd.concat([a, b], ignore_index=True)
    want = full[(full["v"] >= 20.0) & (full["v"] < 30.0)]
    assert set(band["id"]) == set(want["id"])

    # idempotent re-append
    n = len(read_range(out, -np.inf, np.inf).to_pandas())
    append_range_partitioned(ray.data.from_pandas(b.head(7)), out,
                             gen_id="g1")
    assert len(read_range(out, -np.inf, np.inf).to_pandas()) == n

    # torn append invisible until repaired
    os.remove(os.path.join(out, "_gen-g1.json"))
    assert (set(read_range(out, -np.inf, np.inf).to_pandas()["id"])
            == set(a["id"]))
    append_range_partitioned(ray.data.from_pandas(b).repartition(2),
                             out, gen_id="g1")
    assert len(read_range(out, -np.inf, np.inf).to_pandas()) == n


def test_range_store_compaction(ray_session, tmp_path):
    """compact_range_store: identical rows, one file per bucket,
    pruning intact, uncommitted debris dropped, torn-swap crash
    repaired in BOTH directions, appends keep working after."""
    import shutil

    import ray
    import ray.data

    from rsyslog_ray.stages.rangestore import (_bucket_repair,
                                               append_range_partitioned,
                                               compact_range_store,
                                               read_range,
                                               write_range_partitioned)

    rng = np.random.default_rng(91)
    a = pd.DataFrame({"v": rng.uniform(0, 100, 6000),
                      "id": np.arange(6000, dtype="int64")})
    b = pd.DataFrame({"v": rng.uniform(0, 100, 2000),
                      "id": np.arange(6000, 8000, dtype="int64")})
    c = pd.DataFrame({"v": rng.uniform(0, 100, 1000),
                      "id": np.arange(8000, 9000, dtype="int64")})

    out = str(tmp_path / "store")
    write_range_partitioned(ray.data.from_pandas(a).repartition(4),
                            "v", out, n_ranges=5)
    append_range_partitioned(ray.data.from_pandas(b).repartition(3),
                             out, gen_id="g1")
    # torn append: files but no marker -> compaction must DROP it
    append_range_partitioned(ray.data.from_pandas(c).repartition(2),
                             out, gen_id="g2")
    os.remove(os.path.join(out, "_gen-g2.json"))

    before = set(read_range(out, -np.inf, np.inf).to_pandas()["id"])
    assert before == set(range(8000))

    stats = compact_range_store(out)
    assert stats["files_after"] == stats["buckets"] == 5
    assert stats["files_before"] > stats["files_after"]
    assert not glob.glob(os.path.join(out, "_gen-*.json"))
    after = set(read_range(out, -np.inf, np.inf).to_pandas()["id"])
    assert after == before
    band = read_range(out, 40.0, 60.0).to_pandas()
    full = pd.concat([a, b], ignore_index=True)
    assert set(band["id"]) == set(
        full[(full["v"] >= 40.0) & (full["v"] < 60.0)]["id"])

    # torn swap, completed .compact: live bucket missing -> repair
    # finishes the swap
    d0 = sorted(glob.glob(os.path.join(out, "range=*")))[0]
    shutil.copytree(d0, d0 + ".compact")
    open(os.path.join(d0 + ".compact", "_complete"), "w").write("ok")
    os.rename(d0, d0 + ".old")
    _bucket_repair(out)
    assert os.path.isdir(d0) and not os.path.isdir(d0 + ".old")
    assert set(read_range(out, -np.inf, np.inf).to_pandas()["id"]) \
        == before

    # torn swap, INCOMPLETE .compact -> repair restores the original
    shutil.copytree(d0, d0 + ".compact")           # no _complete
    os.rename(d0, d0 + ".old")
    _bucket_repair(out)
    assert os.path.isdir(d0) and not glob.glob(
        os.path.join(out, "range=*.compact"))
    assert set(read_range(out, -np.inf, np.inf).to_pandas()["id"]) \
        == before

    # appends still work on the compacted store
    append_range_partitioned(ray.data.from_pandas(c).repartition(2),
                             out, gen_id="g3")
    assert set(read_range(out, -np.inf, np.inf).to_pandas()["id"]) \
        == set(range(9000))
