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
