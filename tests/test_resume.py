"""Resume semantics: kill-mid-run → restart → exactly-once totals.

Analog of the reference's queue-checkpoint crash tests (tests/badqi.sh,
tests/bad_qi/, runtime/queue.c:104-160): a run that lost some
partitions' commits must, on restart, rewrite ONLY those partitions
idempotently — no lost rows, no duplicated rows.
"""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq

from rsyslog_ray import sinks as sk
from rsyslog_ray.pipelines.flagship import input_shards, run_flagship
from rsyslog_ray.router import DEFAULT_ROUTES, Router


def _sink_counts(out_dir, sinks):
    out = {}
    for s in sinks:
        files = glob.glob(os.path.join(out_dir, s, "shard=*", "*.parquet"))
        urls = []
        for f in files:
            urls.extend(pq.read_table(f, columns=["url"])["url"].to_pylist())
        out[s] = urls
    return out


def test_resume_exactly_once(ray_session, pages_small, tmp_path):
    router = Router(DEFAULT_ROUTES)
    clean_dir = str(tmp_path / "clean")
    clean_agg = run_flagship(pages_small, clean_dir)
    clean = _sink_counts(clean_dir, router.sinks)

    # --- simulate a crash: full run, then forge a manifest that lost the
    # commits of shards 1 and 3, and leave their (now "partial") files
    crash_dir = str(tmp_path / "crash")
    run_flagship(pages_small, crash_dir)
    man = os.path.join(crash_dir, sk.LINEAGE_FILE)
    recs = [json.loads(l) for l in open(man) if l.strip()]
    survived = [r for r in recs if r["partition_id"] not in (1, 3)]
    with open(man, "w") as fh:
        for r in survived:
            fh.write(json.dumps(r) + "\n")
    # duplicate one surviving-looking file into a lost shard to prove
    # partial output is wiped before rewrite
    some = glob.glob(os.path.join(crash_dir, "archive", "shard=1", "*.parquet"))[0]
    import shutil
    shutil.copy(some, some.replace(".parquet", "-zombie.parquet"))

    # --- restart: only shards 1 and 3 may be reprocessed
    files = input_shards(pages_small)
    pending, done = sk.plan_resume(files, crash_dir, router.sinks)
    assert {int(os.path.basename(f).split("-")[-1].split(".")[0]) for f in pending} == {1, 3}
    assert done == {0, 2, 4}

    resumed_agg = run_flagship(pages_small, crash_dir)

    resumed = _sink_counts(crash_dir, router.sinks)
    for s in router.sinks:
        assert sorted(resumed[s]) == sorted(clean[s]), s
        assert len(set(resumed[s])) == len(resumed[s]), f"dups in {s}"
    # manifest now complete again
    recs = [json.loads(l) for l in open(man) if l.strip()]
    assert {r["partition_id"] for r in recs} == {0, 1, 2, 3, 4}
    # the RESUMED run's final aggregates must be FULL-corpus — the
    # skipped shards' contributions come from the _agg/shard=N
    # checkpoints, not from re-reading them
    pd.testing.assert_frame_equal(
        resumed_agg.reset_index(drop=True),
        clean_agg.reset_index(drop=True))
    # and _metrics.json totals must match the clean run's
    m_clean = json.load(open(os.path.join(clean_dir, "_metrics.json")))
    m_res = json.load(open(os.path.join(crash_dir, "_metrics.json")))
    assert m_res["rows_delivered_per_sink"] == \
        m_clean["rows_delivered_per_sink"]
    assert m_res["total_delivered"] == m_clean["total_delivered"]


def test_noop_resume(ray_session, pages_small, tmp_path):
    out = str(tmp_path / "out")
    agg1 = run_flagship(pages_small, out)
    # all committed -> no rework, but the result still reports the FULL
    # corpus (from the _agg checkpoints — a crash can land between the
    # last lineage commit and the metrics write, and the re-invoke must
    # repair the metrics, not claim an empty corpus)
    agg2 = run_flagship(pages_small, out)
    pd.testing.assert_frame_equal(agg2.reset_index(drop=True),
                                  agg1.reset_index(drop=True))
    m = json.load(open(os.path.join(out, "_metrics.json")))
    assert m["total_delivered"] > 0


def test_resume_torn_lineage_line(ray_session, pages_small, tmp_path):
    """Crash mid-append leaves a HALF-WRITTEN final manifest line (the
    reference's bad-.qi fixtures, tests/bad_qi/): the torn line's shard
    must read as uncommitted, the resume must redo exactly it, and the
    converged output must equal a clean run's."""
    router = Router(DEFAULT_ROUTES)
    clean_dir = str(tmp_path / "clean")
    clean_agg = run_flagship(pages_small, clean_dir)
    clean = _sink_counts(clean_dir, router.sinks)

    crash_dir = str(tmp_path / "crash")
    run_flagship(pages_small, crash_dir)
    man = os.path.join(crash_dir, sk.LINEAGE_FILE)
    recs = [json.loads(l) for l in open(man) if l.strip()]
    keep = [r for r in recs if r["partition_id"] != 2]
    torn = json.dumps([r for r in recs if r["partition_id"] == 2][0])
    with open(man, "w") as fh:
        for r in keep:
            fh.write(json.dumps(r) + "\n")
        fh.write(torn[: len(torn) // 2])       # no newline, mid-JSON
    assert sk.committed_shards(crash_dir) == {0, 1, 3, 4}

    files = input_shards(pages_small)
    pending, done = sk.plan_resume(files, crash_dir, router.sinks)
    assert {os.path.basename(f) for f in pending} == \
        {os.path.basename(f) for f in files
         if sk.shard_id_of(f) == 2}

    resumed_agg = run_flagship(pages_small, crash_dir)
    resumed = _sink_counts(crash_dir, router.sinks)
    for s in router.sinks:
        assert sorted(resumed[s]) == sorted(clean[s]), s
        assert len(set(resumed[s])) == len(resumed[s]), f"dups in {s}"
    pd.testing.assert_frame_equal(
        resumed_agg.reset_index(drop=True),
        clean_agg.reset_index(drop=True))
    # the repaired manifest holds all shards again (torn line replaced
    # by a fresh commit)
    assert sk.committed_shards(crash_dir) == {0, 1, 2, 3, 4}


def test_resume_sharded_lineage(ray_session, pages_small, tmp_path):
    """N>1 commit-log actors (sid % N ownership, one jsonl per actor):
    commits spread across _lineage.jsonl + _lineage-<k>.jsonl, a crash
    that loses commits in TWO different log files resumes exactly
    those shards, and the converged output equals a clean run's."""
    router = Router(DEFAULT_ROUTES)
    clean_dir = str(tmp_path / "clean")
    clean_agg = run_flagship(pages_small, clean_dir)
    clean = _sink_counts(clean_dir, router.sinks)

    crash_dir = str(tmp_path / "crash")
    run_flagship(pages_small, crash_dir, lineage_shards=3)
    logs = sk.lineage_files(crash_dir)
    assert [os.path.basename(p) for p in logs] == \
        ["_lineage.jsonl", "_lineage-1.jsonl", "_lineage-2.jsonl"]
    # ownership: file k holds exactly the shards with sid % 3 == k
    per_file = {}
    for p in logs:
        recs = [json.loads(l) for l in open(p) if l.strip()]
        per_file[os.path.basename(p)] = {r["partition_id"] for r in recs}
    assert per_file["_lineage.jsonl"] == {0, 3}
    assert per_file["_lineage-1.jsonl"] == {1, 4}
    assert per_file["_lineage-2.jsonl"] == {2}
    assert sk.committed_shards(crash_dir) == {0, 1, 2, 3, 4}

    # crash: drop shard 3's commit from the base log and shard 2's from
    # its sharded log (two different files lose commits)
    for p, drop in ((logs[0], 3), (logs[2], 2)):
        recs = [json.loads(l) for l in open(p) if l.strip()]
        with open(p, "w") as fh:
            for r in recs:
                if r["partition_id"] != drop:
                    fh.write(json.dumps(r) + "\n")
    files = input_shards(pages_small)
    pending, done = sk.plan_resume(files, crash_dir, router.sinks)
    assert {sk.shard_id_of(f) for f in pending} == {2, 3}
    assert done == {0, 1, 4}

    resumed_agg = run_flagship(pages_small, crash_dir, lineage_shards=3)
    resumed = _sink_counts(crash_dir, router.sinks)
    for s in router.sinks:
        assert sorted(resumed[s]) == sorted(clean[s]), s
        assert len(set(resumed[s])) == len(resumed[s]), f"dups in {s}"
    pd.testing.assert_frame_equal(
        resumed_agg.reset_index(drop=True),
        clean_agg.reset_index(drop=True))
    assert sk.committed_shards(crash_dir) == {0, 1, 2, 3, 4}
