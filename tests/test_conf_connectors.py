"""Network actions in the .conf front-end: ``action(type="omkafka"
...)`` (and the whole om* connector family) compile to real-wire
delivery sinks inside the FanoutWriter pass, with lineage/resume
semantics intact (a committed shard's deliveries are never re-sent)."""

import glob
import json
import os

import pandas as pd

from rsyslog_ray.rainerconf import parse_rainer
from tests.test_dbsinks import FakeClickHouse
from tests.test_kafka import MiniKafkaBroker


def test_conf_compiles_connector_action():
    cfg = parse_rainer('''
    input(type="imfile" file="/data/pages-*.parquet")
    if $p_sev <= 3 then action(type="omkafka" broker="127.0.0.1:19092"
                               topic="errors" key="p_host")
    *.* action(type="omfile" file="archive")
    ''')
    assert "kafka_errors" in cfg["connectors"]
    prm = cfg["connectors"]["kafka_errors"]
    assert prm["type"] == "omkafka"
    assert prm["broker"] == "127.0.0.1:19092"
    sinks = [r["sink"] for r in cfg["routes"]]
    assert sinks == ["kafka_errors", "archive"]


def test_connector_spec_registry():
    from rsyslog_ray.config import _connector_spec
    from rsyslog_ray.stages.connectors import (ClickHouseTransport,
                                               KafkaTransport,
                                               MongoTransport,
                                               MySqlTransport,
                                               PgWireTransport,
                                               TcpSyslogTransport)

    cases = [
        ({"type": "omkafka", "broker": "h:9092", "topic": "t"},
         KafkaTransport),
        ({"type": "omfwd", "target": "h", "port": "514"},
         TcpSyslogTransport),
        ({"type": "omclickhouse", "server": "h"}, ClickHouseTransport),
        ({"type": "ompgsql", "server": "h", "db": "d", "uid": "u"},
         PgWireTransport),
        ({"type": "ommysql", "server": "h", "db": "d", "uid": "u",
          "pwd": "p"}, MySqlTransport),
        ({"type": "ommongodb", "host": "h", "collection": "c"},
         MongoTransport),
    ]
    for prm, cls in cases:
        spec = _connector_spec("s", prm)
        assert isinstance(spec["factory"](), cls), prm["type"]

    # omhiredis: reference param names map onto the transport's modes
    from rsyslog_ray.stages.connectors import RedisTransport
    t = _connector_spec("s", {
        "type": "omhiredis", "server": "h", "mode": "stream",
        "key": "st", "stream.outfield": "line",
        "stream.capacitylimit": "500"})["factory"]()
    assert isinstance(t, RedisTransport)
    assert (t.mode, t.key, t.stream_out_field, t.capacity_limit) == \
        ("stream", "st", "line", 500)
    t = _connector_spec("s", {
        "type": "omhiredis", "server": "h", "mode": "set",
        "dynakey": "on", "dynakey_field": "host",
        "expiration": "30"})["factory"]()
    assert (t.mode, t.key_field, t.expiration) == ("set", "host", 30)

    # omrelp: windowsize/rebindinterval map through; 0 = librelp default
    from rsyslog_ray.stages.connectors import RelpTransport
    t = _connector_spec("s", {
        "type": "omrelp", "target": "h", "port": "2514",
        "windowsize": "0", "rebindinterval": "50"})["factory"]()
    assert isinstance(t, RelpTransport)
    assert (t.addr, t.window_size, t.rebind_interval) == \
        (("h", 2514), 128, 50)


def test_conf_kafka_delivery_with_resume(ray_session, pages_small,
                                         tmp_path):
    from rsyslog_ray.config import run_config

    broker = MiniKafkaBroker(num_partitions=2)
    try:
        conf = r'''
        global(workDirectory="OUTDIR")
        input(type="imfile" file="PAGES/pages-*.parquet")
        if $parse_ok == "off" then { action(type="omfile" file="dead") stop }
        if $p_sev <= 2 then action(type="omkafka" broker="127.0.0.1:PORT"
                                   topic="errors" key="p_sev")
        *.* action(type="omfile" file="archive")
        '''.replace("OUTDIR", str(tmp_path / "o")) \
           .replace("PAGES", pages_small) \
           .replace("PORT", str(broker.port))
        cfg = parse_rainer(conf)
        from rsyslog_ray.rulebase import PAGES_RULEBASE
        cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                         "types": r.types} for r in PAGES_RULEBASE.rules]
        cfg["source_column"] = "text"
        cfg["extract_column"] = "html"
        agg = run_config(cfg, resume=True, lineage=True)

        # the kafka sink shows up in the dynstats like any sink
        assert "kafka_errors" in set(agg["sink"])
        delivered = sum(broker.log_end.values())
        assert delivered > 0
        # every delivered record is a JSON row with p_sev <= 2
        from rsyslog_ray.state.kafkawire import decode_record_batches
        recs = []
        for batches in broker.logs.values():
            for b in batches:
                recs.extend(decode_record_batches(b))
        assert len(recs) == delivered
        assert all(json.loads(r["value"])["p_sev"] <= 2 for r in recs)
        # file sinks written alongside
        assert glob.glob(str(tmp_path / "o" / "archive" / "shard=*" /
                             "*.parquet"))
        # no kafka_errors directory materialized on disk
        assert not os.path.isdir(str(tmp_path / "o" / "kafka_errors"))

        # resume: all shards committed -> re-run delivers NOTHING new
        agg2 = run_config(cfg, resume=True, lineage=True)
        assert sum(broker.log_end.values()) == delivered
        pd.testing.assert_frame_equal(agg.reset_index(drop=True),
                                      agg2.reset_index(drop=True))
    finally:
        broker.stop()


def test_config_dict_clickhouse_delivery(ray_session, pages_small,
                                         tmp_path):
    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    srv = FakeClickHouse()
    try:
        cfg = {
            "input": {"paths": [f"{pages_small}/pages-*.parquet"]},
            "rules": [{"name": r.name, "pattern": r.pattern,
                       "types": r.types} for r in PAGES_RULEBASE.rules],
            "source_column": "text",
            "extract_column": "html",
            "routes": [
                {"sink": "ch_pages", "pred": ["==", "parse_ok", True]},
                {"sink": "archive", "pred": ["true"]}],
            "connectors": {"ch_pages": {
                "type": "omclickhouse", "server": "127.0.0.1",
                "port": srv.port, "table": "pages",
                "batch_rows": 4096}},
            "output": {"dir": str(tmp_path / "ch_out")},
        }
        run_config(cfg, resume=False, lineage=False)
        assert len(srv.rows) > 0
        assert all(s.startswith("INSERT INTO pages ")
                   for s in srv.statements)
    finally:
        srv.stop()
