"""statsobj line formats + dynstats TTL/resettable/persistence
(reference parity: runtime/statsobj.c, runtime/dynstats.c)."""

import json


def test_stats_line_formats():
    from rsyslog_ray.stats import CTR_RESETTABLE, StatsObject

    so = (StatsObject("imuxsock", origin="imuxsock")
          .set_ctr("submitted", 10, CTR_RESETTABLE)
          .set_ctr("ratelimit.discarded", 2))
    # legacy (statsobj.c:471): trailing space after every counter
    assert so.line_legacy() == ("imuxsock: origin=imuxsock submitted=10 "
                                "ratelimit.discarded=2 ")
    # json + cee cookie
    j = json.loads(so.line_json("json"))
    assert j == {"name": "imuxsock", "origin": "imuxsock",
                 "submitted": 10, "ratelimit.discarded": 2}
    assert so.line_json("cee").startswith("@cee: {")
    # json-es: dots -> bangs (statsobj.c:424 ES workaround)
    es = json.loads(so.line_json("json-es"))
    assert "ratelimit!discarded" in es
    # reporting_ns nests the counters
    ns = (StatsObject("x", reporting_ns="values").set_ctr("a", 1))
    assert json.loads(ns.line_json())["values"] == {"a": 1}
    # reset semantics: only RESETTABLE counters zero
    so.line_legacy(reset=True)
    assert so.line_legacy() == ("imuxsock: origin=imuxsock submitted=0 "
                                "ratelimit.discarded=2 ")


def test_prometheus_format_and_encoding():
    from rsyslog_ray.stats import StatsObject, encode_prometheus_name

    # safe names pass through; unsafe get the reversible U__ encoding
    assert encode_prometheus_name("resource_usage_total") == "resource_usage_total"
    assert encode_prometheus_name("a.b_total") == "U__a_2E_b__total"
    assert encode_prometheus_name("9lives") == "U__9lives"
    so = StatsObject("core.queue", origin="main Q").set_ctr("enqueued", 7)
    lines = so.lines_prometheus()[0].splitlines()
    metric = "U__core_2E_queue__enqueued__total"
    assert lines[0].startswith(f"# HELP {metric} rsyslog stats: "
                               'origin="main Q"')
    assert lines[1] == f"# TYPE {metric} counter"
    assert lines[2] == f"{metric} 7"


def test_dynstats_bucket_ttl_cap_persist(tmp_path):
    from rsyslog_ray.stats import DynStatsBucket

    b = DynStatsBucket("senders", max_cardinality=2,
                       unused_metric_life=10.0)
    assert b.inc("a", now=0) and b.inc("b", now=1)
    assert not b.inc("c", now=2)          # cap refusal -> overflow ctr
    assert b.inc("a", now=5)
    # TTL purge frees the slot for a new key (dynstats.c lifetimes)
    assert b.purge_unused(now=12) == 1    # 'b' untouched since t=1
    assert b.inc("c", now=12)
    snap = b.report(reset=False)
    assert snap == {"a": 2, "c": 1, "ops_overflow": 1}
    # persistence roundtrip (survive_restart analog)
    p = str(tmp_path / "dynstats.json")
    b.save(p)
    b2 = DynStatsBucket.load(p, max_cardinality=2, unused_metric_life=10.0)
    assert b2.counters == b.counters and b2.ops_overflow == 1
    # resettable report zeroes
    b2.report()
    assert all(v == 0 for v in b2.counters.values())


def test_run_metrics_emits_impstats_files(tmp_path):
    import pandas as pd

    from rsyslog_ray.sinks import write_run_metrics

    agg = pd.DataFrame({"sink": ["a", "b"], "kind": ["lang", "lang"],
                        "key": ["en", "de"], "cnt": [3, 4]})
    write_run_metrics(str(tmp_path), agg, 1.0, 2)
    legacy = (tmp_path / "_impstats.legacy").read_text()
    assert "a.delivered=3" in legacy and "b.delivered=4" in legacy
    assert (tmp_path / "_impstats.cee").read_text().startswith("@cee:")
    prom = (tmp_path / "_impstats.prometheus").read_text()
    assert "# TYPE" in prom and "input_files" in prom


def test_interval_impstats_emission(tmp_path):
    """Interval impstats (plugins/impstats/impstats.c:114-123): the
    reference emits a counter line every interval; the batch analog
    emits one rendered line per N write batches — an N-batch run with
    every_batches=1 produces exactly N interval records with running
    totals."""
    import pyarrow as pa

    from rsyslog_ray.router import Route
    from rsyslog_ray.sinks import FanoutWriter

    w = FanoutWriter([Route("archive", ("true",), False)],
                     str(tmp_path), agg_kinds=(("lang", "lang"),),
                     impstats_every=1)
    for i in range(4):
        w(pa.table({"lang": pa.array(["en"] * (i + 1), pa.string())}))
    import glob
    files = glob.glob(str(tmp_path / "_impstats.interval.*"))
    assert len(files) == 1                      # one worker, one file
    lines = open(files[0]).read().strip().split("\n")
    assert len(lines) == 4                      # one record per batch
    # running totals: 1, 3, 6, 10 delivered rows
    assert [int(ln.split("rows_delivered=")[1].split()[0])
            for ln in lines] == [1, 3, 6, 10]
    assert all("batches=" in ln for ln in lines)


def test_exporter_renders_run_dir(tmp_path):
    """Exporter file mode (sidecar/rsyslog_exporter.py analog): the
    last interval line per worker file sums across workers; lineage
    commits count; the end-of-run prometheus render is appended
    verbatim; scrapes advance as the files grow."""
    import urllib.request

    from rsyslog_ray.exporter import StatsHttpServer, render_run_metrics

    (tmp_path / "_impstats.interval.100").write_text(
        "raylog: origin=impstats rows_delivered=5 batches=1 \n"
        "raylog: origin=impstats rows_delivered=12 batches=2 \n")
    (tmp_path / "_impstats.interval.200").write_text(
        "raylog: origin=impstats rows_delivered=30 batches=3 \n")
    (tmp_path / "_lineage.jsonl").write_text(
        '{"partition_id": 0}\n{"partition_id": 1}\nGARBAGE\n')
    (tmp_path / "_impstats.prometheus").write_text(
        "# TYPE raylog_input_files_total counter\n"
        "raylog_input_files_total 7\n")

    text = render_run_metrics(str(tmp_path))
    assert "raylog_rows_delivered_total 42" in text     # 12 + 30
    assert "raylog_batches_total 5" in text             # 2 + 3
    assert "raylog_lineage_commits_total 2" in text     # torn line out
    assert "raylog_input_files_total 7" in text         # verbatim tail

    srv = StatsHttpServer(str(tmp_path))
    try:
        url = f"http://127.0.0.1:{srv.port}"
        body = urllib.request.urlopen(f"{url}/metrics").read().decode()
        assert "raylog_rows_delivered_total 42" in body
        assert "raylog_exporter_scrapes_total 1" in body
        assert urllib.request.urlopen(
            f"{url}/healthz").read() == b"ok\n"
        # the files grow -> the next scrape reflects it
        with open(tmp_path / "_impstats.interval.200", "a") as fh:
            fh.write("raylog: origin=impstats rows_delivered=58 "
                     "batches=4 \n")
        body2 = urllib.request.urlopen(f"{url}/metrics").read().decode()
        assert "raylog_rows_delivered_total 70" in body2
        assert "raylog_exporter_scrapes_total 2" in body2
    finally:
        srv.stop()


def test_exporter_scrapes_mid_flagship_run(ray_session, pages_small,
                                           tmp_path):
    """The sidecar endpoint serves ADVANCING counters while the
    flagship runs: exporter actor up first, flagship (interval
    impstats every batch) in a background thread, scrapes observed
    mid-run must increase monotonically to the final total."""
    import re
    import threading
    import time
    import urllib.request

    import ray

    from rsyslog_ray.exporter import start_exporter_actor
    from rsyslog_ray.pipelines.flagship import run_flagship

    out = str(tmp_path / "run")
    import os
    os.makedirs(out, exist_ok=True)
    h = start_exporter_actor(out)
    port = ray.get(h.port.remote())
    url = f"http://127.0.0.1:{port}/metrics"

    done = threading.Event()
    err = []

    def drive():
        try:
            run_flagship(pages_small, out, impstats_every=1,
                         parse_batch_size=512, write_batch_size=512)
        except Exception as ex:                 # surface in the test
            err.append(ex)
        finally:
            done.set()

    t = threading.Thread(target=drive)
    t.start()
    seen = []
    while not done.is_set():
        body = urllib.request.urlopen(url, timeout=5).read().decode()
        m = re.search(r"raylog_rows_delivered_total (\d+)", body)
        if m:
            seen.append(int(m.group(1)))
        time.sleep(0.1)
    t.join()
    ray.get(h.stop.remote())
    assert not err, err
    # final scrape: full totals + all lineage commits
    from rsyslog_ray.exporter import render_run_metrics
    final = render_run_metrics(out)
    m = re.search(r"raylog_rows_delivered_total (\d+)", final)
    assert m is not None
    total = int(m.group(1))
    assert total > 0
    mid = [v for v in seen if 0 < v < total]
    assert mid, f"no mid-run scrape observed (seen={seen})"
    assert seen == sorted(seen)                 # monotone counters
    assert re.search(r"raylog_lineage_commits_total 5", final)
