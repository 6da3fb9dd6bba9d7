"""Declarative config + CLI: config-described pipeline == flagship."""

import glob
import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq

from rsyslog_ray import schema as S
from rsyslog_ray.config import load_config, run_config
from rsyslog_ray.pipelines.flagship import run_flagship
from rsyslog_ray.rulebase import PAGES_RULEBASE
from rsyslog_ray.router import DEFAULT_ROUTES
from rsyslog_ray.stages.enrich import default_lookups


def _flagship_config(pages_dir: str, out_dir: str) -> dict:
    """The flagship pipeline expressed as a config document."""
    lk = default_lookups()
    return {
        "input": {"paths": [os.path.join(pages_dir, "pages-*.parquet")]},
        "rules": [{"name": r.name, "pattern": r.pattern, "types": r.types}
                  for r in PAGES_RULEBASE.rules],
        "source_column": "text",
        "extract_column": "html",
        "lookups": {
            "lang_region": {"kind": "string", "table": lk["lang_region"]._dict,
                            "stub": S.REGION_STUB},
            "host_category": {"kind": "string",
                              "table": lk["host_category"]._dict,
                              "stub": S.CATEGORY_STUB},
        },
        "enrich": [
            {"column": "url_host", "op": "url_host", "key": "url"},
            {"column": "region", "lookup": "lang_region", "key": "lang"},
            {"column": "category", "lookup": "host_category", "key": "url_host"},
        ],
        "routes": [{"sink": r.sink, "pred": list(_l(r.pred)), "stop": r.stop}
                   for r in DEFAULT_ROUTES],
        "aggregates": [["lang", "lang"], ["host", "url_host"],
                       ["bucket", "__bucket"]],
        "ts_column": "warc_ts",
        "output": {"dir": out_dir, "full_sinks": ["archive", "deadletter"]},
    }


def _l(p):
    return [(_l(x) if isinstance(x, tuple) else x) for x in p]


def test_config_pipeline_equals_flagship(ray_session, pages_small, tmp_path):
    out_cfg = str(tmp_path / "cfg_out")
    out_flag = str(tmp_path / "flag_out")
    agg_cfg = run_config(_flagship_config(pages_small, out_cfg))
    agg_flag = run_flagship(pages_small, out_flag)
    pd.testing.assert_frame_equal(
        agg_cfg.reset_index(drop=True), agg_flag.reset_index(drop=True))
    # routed rows equal per sink (archive spot check)
    def urls(d, sink):
        fs = glob.glob(os.path.join(d, sink, "shard=*", "*.parquet"))
        out = []
        for f in fs:
            out += pq.read_table(f, columns=["url"])["url"].to_pylist()
        return sorted(out)
    for sink in ("archive", "errors", "deadletter", "spam"):
        assert urls(out_cfg, sink) == urls(out_flag, sink), sink


def test_cli_end_to_end(pages_small, tmp_path):
    cfg = _flagship_config(pages_small, str(tmp_path / "cli_out"))
    cfg_path = str(tmp_path / "pipeline.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "rsyslog_ray", "--config", cfg_path,
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["status"] == "complete"
    assert "archive" in line["sinks"]
    # resume: second run is a no-op
    r2 = subprocess.run(
        [sys.executable, "-m", "rsyslog_ray", "--config", cfg_path,
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    line2 = json.loads(r2.stdout.strip().splitlines()[-1])
    # everything already committed -> no rework, but the report still
    # covers the FULL corpus (from the _agg checkpoints)
    assert line2["aggregate_rows"] == line["aggregate_rows"]
    assert line2["total_delivered"] == line["total_delivered"]


def test_cli_query_runner(tmp_path):
    """--query runs one catalog operator from the CLI in its own Ray
    session and writes/prints the result; --list-queries enumerates."""
    import json
    import os
    import sys

    import pandas as pd

    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "-m", "rsyslog_ray", "--list-queries"],
        capture_output=True, text=True, env=env, timeout=120)
    names = r.stdout.split()
    assert r.returncode == 0 and "ngram_topk" in names and len(names) >= 80

    out = str(tmp_path / "q.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "rsyslog_ray", "--query", "text_quality",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out,
         "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    status = json.loads(r.stdout.strip().splitlines()[-1])
    assert status["rows"] == 500
    assert len(pd.read_parquet(out)) == 500

    r = subprocess.run(
        [sys.executable, "-m", "rsyslog_ray", "--query", "nope",
         "--num-cpus", "2"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 2 and "unknown query" in r.stderr
