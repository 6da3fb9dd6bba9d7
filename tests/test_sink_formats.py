"""Per-sink output formats (csv/jsonl) + shard compaction."""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq

from rsyslog_ray import sinks as sk
from rsyslog_ray.config import run_config
from rsyslog_ray.pipelines.flagship import run_flagship


def test_sink_formats_csv_jsonl(ray_session, pages_small, tmp_path):
    out = str(tmp_path / "fmt_out")
    cfg = {
        "input": {"paths": [os.path.join(pages_small, "pages-*.parquet")]},
        "routes": [
            {"sink": "csvsink", "pred": ["==", "lang", "de"]},
            {"sink": "jsonsink", "pred": ["==", "lang", "fr"]},
            {"sink": "rest", "pred": ["true"]},
        ],
        "aggregates": [["lang", "lang"]],
        "output": {"dir": out, "full_sinks": [],
                   "formats": {"csvsink": "csv", "jsonsink": "jsonl"}},
    }
    agg = run_config(cfg, lineage=False)
    de = int(agg[(agg["sink"] == "csvsink") & (agg["kind"] == "lang")]["cnt"].sum())

    csvs = glob.glob(os.path.join(out, "csvsink", "shard=*", "*.csv"))
    assert csvs and not glob.glob(os.path.join(out, "csvsink", "shard=*", "*.parquet"))
    rows = sum(len(pd.read_csv(f)) for f in csvs)
    assert rows == de

    jls = glob.glob(os.path.join(out, "jsonsink", "shard=*", "*.jsonl"))
    assert jls
    rec = json.loads(open(jls[0]).readline())
    assert rec["lang"] == "fr" and "url" in rec

    assert glob.glob(os.path.join(out, "rest", "shard=*", "*.parquet"))


def test_compaction(ray_session, pages_small, tmp_path):
    out = str(tmp_path / "cmp_out")
    run_flagship(pages_small, out)
    before = glob.glob(os.path.join(out, "archive", "shard=*", "*.parquet"))
    urls_before = sorted(sum((pq.read_table(f, columns=["url"])["url"].to_pylist()
                              for f in before), []))
    stats = sk.compact_sink(out, "archive")
    after = glob.glob(os.path.join(out, "archive", "shard=*", "*.parquet"))
    urls_after = sorted(sum((pq.read_table(f, columns=["url"])["url"].to_pylist()
                             for f in after), []))
    assert urls_before == urls_after            # lossless
    assert len(after) <= len(before)
    assert stats["files_after"] <= stats["files_before"] or stats["shards"] == 0
    # idempotent: second pass is a no-op
    stats2 = sk.compact_sink(out, "archive")
    assert stats2["shards"] == 0


def test_dynafile_partitioning(ray_session, pages_small, tmp_path):
    """omfile dynafile analog: a sink's output path computed from a
    column value (tools/omfile.c:133-192)."""
    out = str(tmp_path / "dyn_out")
    cfg = {
        "input": {"paths": [os.path.join(pages_small, "pages-*.parquet")]},
        "routes": [{"sink": "bylang", "pred": ["true"]}],
        "aggregates": [["lang", "lang"]],
        "output": {"dir": out, "full_sinks": [],
                   "partition_by": {"bylang": "lang"}},
    }
    agg = run_config(cfg, lineage=False)
    langs = set(agg[agg["kind"] == "lang"]["key"])
    import glob as g
    dirs = {os.path.basename(os.path.dirname(p)) for p in
            g.glob(os.path.join(out, "bylang", "shard=*", "lang=*", "*.parquet"))}
    assert dirs == {f"lang={l}" for l in langs}
    # each partition dir holds only its language
    one = g.glob(os.path.join(out, "bylang", "shard=0", "lang=de", "*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in one])
    assert (df["lang"] == "de").all()
    # totals preserved across the partition split
    total = sum(len(pq.read_table(f).to_pandas()) for f in
                g.glob(os.path.join(out, "bylang", "shard=*", "lang=*",
                                    "*.parquet")))
    assert total == int(agg[agg["kind"] == "lang"]["cnt"].sum())


def test_compact_size_rotation(tmp_path):
    """omfile iSizeLimit analog: compaction rolls a new file when the
    binned input bytes would exceed max_bytes."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rsyslog_ray import sinks as sk

    shard = tmp_path / "s" / "shard=0"
    shard.mkdir(parents=True)
    for i in range(6):
        t = pa.table({"x": pa.array(range(1000), pa.int64()),
                      "part": pa.array([i] * 1000, pa.int64())})
        pq.write_table(t, str(shard / f"part-{i:03d}.parquet"))
    one = (shard / "part-000.parquet").stat().st_size
    stats = sk.compact_sink(str(tmp_path), "s", max_bytes=int(one * 2.5))
    assert stats["files_before"] == 6
    assert stats["files_after"] == 3          # 2+2+2 parts per bin
    outs = sorted(shard.glob("compact-*.parquet"))
    assert len(outs) == 3
    total = sum(pq.read_table(str(p)).num_rows for p in outs)
    assert total == 6000
    # all original rows survive exactly once
    allp = pd.concat([pq.read_table(str(p)).to_pandas() for p in outs])
    assert sorted(allp["part"].unique()) == [0, 1, 2, 3, 4, 5]


def test_template_sink_zip_output(ray_session, tmp_path):
    """omfile zipLevel (tools/omfile.c:296-299, veryRobustZip): a
    template .log sink with zipLevel > 0 writes one complete gzip
    stream per file, byte-deterministic and independently
    decompressible."""
    import glob
    import gzip

    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rainerconf import parse_rainer

    src = pd.DataFrame({"host": ["h1", "h2", "h3"],
                        "msg": ["alpha", "beta", "gamma"]})
    data = tmp_path / "in"
    data.mkdir()
    src.to_parquet(data / "pages-0.parquet", index=False)
    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="DATA/pages-*.parquet")
    template(name="line" type="string" string="%host% %msg%")
    *.* action(type="omfile" file="archive" template="line" zipLevel="6")
    '''.replace("OUT", str(tmp_path / "o")).replace("DATA", str(data))
    cfg = parse_rainer(conf)
    assert cfg["output"]["formats"]["archive"]["zipLevel"] == 6
    cfg["aggregates"] = [["host", "host"]]
    run_config(cfg, resume=False, lineage=False)

    files = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.log.gz"),
                      recursive=True)
    assert files, "no gzipped line files written"
    lines = []
    for f in files:
        lines += gzip.open(f, "rt").read().splitlines()
    assert sorted(lines) == ["h1 alpha", "h2 beta", "h3 gamma"]
    # gzip mtime pinned to 0 (bytes 4-8 of the header): identical
    # content always produces identical bytes, so a lineage redo
    # rewrites a torn file byte-for-byte
    for f in files:
        assert open(f, "rb").read()[4:8] == b"\x00\x00\x00\x00"


def test_batch_stem_positional_identity(tmp_path):
    """Content alone is not a batch identity: two byte-identical batches
    (heartbeat runs) at different positions must get DISTINCT stems so
    the second never overwrites the first's part files, while a retry of
    the same (task, ordinal) slot must reproduce the SAME stem so it
    overwrites its own files (exactly-once under Ray task retry)."""
    import pyarrow as pa

    t = pa.table({"msg": pa.array(["heartbeat"] * 64),
                  "shard": pa.array([0] * 64, pa.int64())})
    # same content, same slot -> same stem (retry idempotence)
    assert sk._batch_stem(t, slot=("task-a", 0)) == \
        sk._batch_stem(t, slot=("task-a", 0))
    # same content, different ordinal within one task -> distinct
    assert sk._batch_stem(t, slot=("task-a", 0)) != \
        sk._batch_stem(t, slot=("task-a", 1))
    # same content, different task -> distinct
    assert sk._batch_stem(t, slot=("task-a", 0)) != \
        sk._batch_stem(t, slot=("task-b", 0))
    # driver-mode direct calls advance a process-local ordinal: two
    # identical batches never collide
    assert sk._batch_stem(t) != sk._batch_stem(t)

    # end-to-end: identical-content batches through FanoutWriter land as
    # SEPARATE files with all rows preserved
    import glob as g

    from rsyslog_ray.router import Route, Router

    out = str(tmp_path / "hb")
    w = sk.FanoutWriter(Router([Route("all", ("true",))]), out,
                        None, full_sinks=("all",), agg_kinds=())
    w(t)
    w(t)
    files = g.glob(os.path.join(out, "all", "shard=*", "*.parquet"))
    assert sum(pq.read_table(f).num_rows for f in files) == 128


def test_repair_metrics_preserves_legacy(tmp_path):
    """A no-pending re-invoke on an out_dir with committed lineage but
    no _agg checkpoints (legacy layout) must NOT overwrite a correct
    _metrics.json with zero counts."""
    out = str(tmp_path / "legacy")
    os.makedirs(out)
    rec = {"rows_delivered_per_sink": {"archive": 42},
           "total_delivered": 42}
    with open(os.path.join(out, "_metrics.json"), "w") as fh:
        json.dump(rec, fh)
    sk.repair_run_metrics(out, pd.DataFrame(
        columns=["sink", "kind", "key", "cnt"]), 0.0)
    kept = json.load(open(os.path.join(out, "_metrics.json")))
    assert kept["total_delivered"] == 42
    # with real aggregates the repair DOES rewrite
    agg = pd.DataFrame({"sink": ["archive"], "kind": ["lang"],
                        "key": ["de"], "cnt": [7]})
    sk.repair_run_metrics(out, agg, 0.0)
    new = json.load(open(os.path.join(out, "_metrics.json")))
    assert new["total_delivered"] == 7


def test_dynafile_sanitize_injective(ray_session, tmp_path):
    """Dynafile dir mapping is collision-free: a literal value 'a%2Fb'
    and 'a/b' must land in DIFFERENT partition dirs (secpath analog,
    template.h:157-160)."""
    import pyarrow as pa

    from rsyslog_ray.router import Route, Router

    out = str(tmp_path / "inj")
    t = pa.table({"key": pa.array(["a/b", "a%2Fb"]),
                  "msg": pa.array(["x", "y"]),
                  "shard": pa.array([0, 0], pa.int64())})
    w = sk.FanoutWriter(Router([Route("p", ("true",))]), out, None,
                        full_sinks=("p",), agg_kinds=(),
                        partition_by={"p": "key"})
    w(t)
    dirs = sorted(os.path.basename(d) for d in
                  g_glob(os.path.join(out, "p", "shard=0", "key=*")))
    assert len(dirs) == 2 and dirs[0] != dirs[1]


def g_glob(pat):
    import glob as _g
    return _g.glob(pat)
