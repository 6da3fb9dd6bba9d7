"""Connector-sink protocol: bulking, retry/suspend, errorfile."""

import json

import pandas as pd
import pytest

from rsyslog_ray.stages.connectors import (ConnectorSink, TransportSuspended,
                                           strict_transport)


def _events(n):
    return pd.DataFrame({"event_id": range(n), "event_type": ["e"] * n})


def test_bulking_and_accounting(tmp_path):
    calls = []

    def transport(payloads):
        calls.append(len(payloads))
        return []

    sink = ConnectorSink(transport=transport, batch_rows=100)
    out = sink(_events(250))
    assert calls == [100, 100, 50]                    # bulkmode/maxbytes
    assert out["rows_delivered"].iloc[0] == 250
    assert out["rows_rejected"].iloc[0] == 0


def test_per_item_rejects_to_errorfile(tmp_path):
    ef = str(tmp_path / "err.jsonl")

    def transport(payloads):
        # reject every 10th item
        return [(i, "mapping error") for i in range(len(payloads))
                if payloads[i]["event_id"] % 10 == 0]

    sink = ConnectorSink(transport=transport, batch_rows=100, error_file=ef)
    out = sink(_events(200))
    assert out["rows_delivered"].iloc[0] == 180
    assert out["rows_rejected"].iloc[0] == 20
    recs = [json.loads(l) for l in open(ef)]
    assert len(recs) == 20
    assert recs[0]["error"] == "mapping error"
    assert recs[0]["payload"]["event_id"] == 0


def test_transient_retry_then_suspend(monkeypatch):
    monkeypatch.setattr("time.sleep", lambda s: None)
    attempts = {"n": 0}

    def flaky(payloads):
        attempts["n"] += 1
        if attempts["n"] <= 2:
            raise ConnectionError("transient")
        return []

    sink = ConnectorSink(transport=flaky, batch_rows=1000)
    out = sink(_events(10))
    assert attempts["n"] == 3 and out["rows_delivered"].iloc[0] == 10

    def dead(payloads):
        raise ConnectionError("down")

    sink2 = ConnectorSink(transport=dead, max_retries=3)
    with pytest.raises(TransportSuspended, match="3 times"):
        sink2(_events(5))


def test_strict_transport_raises_at_call_site():
    sink = ConnectorSink()  # default strict
    with pytest.raises(NotImplementedError, match="inject one"):
        sink(_events(1))


def test_as_ray_stage(ray_session):
    import ray.data

    delivered = []

    def transport(payloads):
        delivered.append(len(payloads))
        return []

    ds = ray.data.from_pandas(_events(1000))
    out = ds.map_batches(
        ConnectorSink(transport=transport, batch_rows=200),
        batch_format="pandas", batch_size=500).to_pandas()
    assert out["rows_delivered"].sum() == 1000
