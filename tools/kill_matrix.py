"""SIGKILL matrix for the composed web-pretrain recipe.

The pytest truncation matrix (tests/test_crawl.py) simulates torn
states by deleting stage artifacts; this driver produces the REAL
states: it runs the full recipe in fresh subprocesses (each owning its
own ``ray.init``) and SIGKILLs the process at a randomized wall-clock
point, repeating until a run finally completes — then compares the
converged funnel AND the packed output rows against a clean
single-shot run.  The invariant under test is the `_run_stage`
atomic-rename contract end-to-end: any kill point leaves either a
committed stage dir or wipeable ``.inprogress`` debris, never a
half-state a resume would trust.

Usage:  python tools/kill_matrix.py [n_cycles] [sf]
        (defaults: 6 kill cycles, sf=0.001)

Prints one JSON line: {"kills": [...], "converged": true,
"funnel_equal": true, "packed_equal": true, "runs": N}.
"""

import glob
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVE = """
import json, sys
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from rsyslog_ray.pipelines.crawl import documents_to_warc, run_web_pretrain
docs, warc, out = sys.argv[1], sys.argv[2], sys.argv[3]
documents_to_warc(docs, warc)
stats = run_web_pretrain(warc, out, seq_len=64, seed=11,
                         default_weight=1.0)
print("FUNNEL " + json.dumps(stats, sort_keys=True), flush=True)
ray.shutdown()
"""


def _spawn(docs, warc, out):
    return subprocess.Popen(
        [sys.executable, "-c", DRIVE, docs, warc, out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env={**os.environ, "PYTHONPATH": REPO},
        start_new_session=True)  # so SIGKILL hits the whole Ray session


def _packed_rows(out):
    files = sorted(glob.glob(os.path.join(out, "pretrain", "packed",
                                          "**", "*.parquet"),
                             recursive=True))
    import pandas as pd
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files])
    df = df[sorted(df.columns)]
    # rows may hold list columns (packed token ids) — compare as a
    # sorted multiset of JSON-serialized rows
    return sorted(
        json.dumps(
            [v.tolist() if hasattr(v, "tolist") else v for v in row])
        for row in df.itertuples(index=False, name=None))


def main():
    n_cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf = sys.argv[2] if len(sys.argv) > 2 else "0.001"
    docs = f"/root/testdata/sf{sf}/documents.parquet"
    root = tempfile.mkdtemp(prefix="killmx_")
    clean_out = os.path.join(root, "clean")
    kill_out = os.path.join(root, "kill")
    warc_c = os.path.join(root, "warc_clean")
    warc_k = os.path.join(root, "warc_kill")

    # clean single-shot reference — ALSO the timing calibration for
    # the kill delays (measured start to finish, one full recipe)
    t_start = time.time()
    p = _spawn(docs, warc_c, clean_out)
    out_txt, _ = p.communicate()
    assert p.returncode == 0, "clean run failed"
    t_full = time.time() - t_start
    clean_funnel = json.loads(
        [l for l in out_txt.splitlines() if l.startswith("FUNNEL ")][0][7:])

    # kill points spread over [5%, 95%] of the measured full wall
    kills, runs, funnel = [], 0, None
    seed = 0xC0FFEE
    while True:
        runs += 1
        p = _spawn(docs, warc_k, kill_out)
        if len(kills) < n_cycles:
            # deterministic-ish spread of kill delays over the run
            seed = (seed * 6364136223846793005 + 1442695040888963407) % 2**64
            frac = 0.05 + 0.9 * ((seed >> 16) % 1000) / 1000.0
            delay = t_full * frac
            time.sleep(delay)
            if p.poll() is None:
                os.killpg(p.pid, signal.SIGKILL)
                kills.append(round(delay, 2))
                p.wait()
                continue
            # finished before the kill fired — treat as a convergence run
        out_txt, _ = p.communicate()
        if p.returncode == 0:
            funnel = json.loads(
                [l for l in out_txt.splitlines()
                 if l.startswith("FUNNEL ")][0][7:])
            if len(kills) >= n_cycles:
                break
        if runs > n_cycles * 3 + 5:
            break

    pc, pk = _packed_rows(clean_out), _packed_rows(kill_out)
    packed_equal = pc is not None and pk is not None and pc == pk
    print(json.dumps({
        "kills": kills, "runs": runs,
        "converged": funnel is not None,
        "funnel_equal": funnel == clean_funnel,
        "packed_equal": bool(packed_equal),
        "funnel": funnel}))
    assert funnel == clean_funnel and packed_equal


if __name__ == "__main__":
    main()
