"""Cloud sinks over their real public wire protocols, against doubles
that independently re-parse (and for auth, re-derive) what arrived:

- omotel      -> OTLP/HTTP JSON logs export (plugins/omotel)
- omawslogshlc-> CloudWatch Logs HLC collector endpoint (plugins/omawslogshlc)
- omazuredce  -> Azure Monitor Logs-ingestion w/ OAuth2 client credentials
                 (plugins/omazuredce)
"""
import gzip
import http.server
import json
import threading

import pandas as pd
import pytest

from rsyslog_ray.stages.connectors import ConnectorSink, TransportSuspended


def _serve(handler_cls):
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    return httpd, httpd.server_address[1]


def _rows(n, host="web01"):
    return pd.DataFrame({
        "msg": [f"event number {i}" for i in range(n)],
        "ts": [1700000000 + i for i in range(n)],
        "hostname": [host] * n,
        "appname": ["nginx"] * n,
        "procid": [str(100 + i) for i in range(n)],
        "msgid": ["REQ"] * n,
        "facility": [23] * n,
        "severity": [i % 8 for i in range(n)],
    })


# ---------------------------------------------------------------- omotel

class _OtlpCollector:
    """OTLP/HTTP double: records every POST, optional scripted statuses."""

    def __init__(self, statuses=None):
        self.seen = []          # (path, headers-dict, body-bytes)
        self.statuses = list(statuses or [])
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                outer.seen.append((self.path, dict(self.headers), body))
                status = outer.statuses.pop(0) if outer.statuses else 200
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b"{}")

            def log_message(self, *a):
                pass

        self.httpd, self.port = _serve(H)

    def stop(self):
        self.httpd.shutdown()

    def decode(self, i=-1):
        path, headers, body = self.seen[i]
        if headers.get("Content-Encoding") == "gzip":
            body = gzip.decompress(body)
        return path, headers, json.loads(body)


def test_otlp_envelope_and_severity_mapping():
    """The OTLP JSON envelope matches the proto3 mapping: resourceLogs/
    scopeLogs/logRecords, fixed64 timestamps as strings, the omotel
    severity lookup (severity 0->24/EMERGENCY ... 7->5/DEBUG), syslog
    attributes, and single-hostname promotion to resource host.name."""
    from rsyslog_ray.stages.connectors import OTLP_SEVERITY, OtlpTransport

    srv = _OtlpCollector()
    try:
        sink = ConnectorSink(transport=OtlpTransport(
            "127.0.0.1", srv.port, ts_field="ts",
            resource_attributes={"deployment.environment": "test"}),
            batch_rows=100)
        out = sink(_rows(8))
        assert out["rows_delivered"].iloc[0] == 8

        path, headers, doc = srv.decode()
        assert path == "/v1/logs"
        assert headers["Content-Type"] == "application/json"
        rl = doc["resourceLogs"]
        assert len(rl) == 1
        res_attrs = {a["key"]: a["value"] for a in
                     rl[0]["resource"]["attributes"]}
        assert res_attrs["service.name"] == {"stringValue": "rsyslog"}
        assert res_attrs["deployment.environment"] == \
            {"stringValue": "test"}
        # all rows share hostname -> promoted (otlp_json.c:343-366)
        assert res_attrs["host.name"] == {"stringValue": "web01"}
        sl = rl[0]["scopeLogs"]
        assert sl[0]["scope"]["name"] == "rsyslog.omotel"
        recs = sl[0]["logRecords"]
        assert len(recs) == 8
        for i, r in enumerate(recs):
            num, text = OTLP_SEVERITY[i % 8]
            assert r["severityNumber"] == num
            assert r["severityText"] == text
            # proto3 JSON: fixed64 rendered as a STRING
            assert r["timeUnixNano"] == str((1700000000 + i) * 10**9)
            assert isinstance(r["timeUnixNano"], str)
            assert r["body"] == {"stringValue": f"event number {i}"}
            attrs = {a["key"]: a["value"] for a in r["attributes"]}
            assert attrs["log.syslog.appname"] == {"stringValue": "nginx"}
            assert attrs["log.syslog.procid"] == \
                {"stringValue": str(100 + i)}
            assert attrs["log.syslog.facility"] == {"intValue": 23}
            assert attrs["log.syslog.hostname"] == {"stringValue": "web01"}
    finally:
        srv.stop()


def test_otlp_mixed_hostnames_not_promoted():
    from rsyslog_ray.stages.connectors import OtlpTransport

    srv = _OtlpCollector()
    try:
        df = _rows(4)
        df.loc[2, "hostname"] = "web02"
        ConnectorSink(transport=OtlpTransport("127.0.0.1", srv.port),
                      batch_rows=100)(df)
        _, _, doc = srv.decode()
        res_attrs = {a["key"] for a in
                     doc["resourceLogs"][0]["resource"]["attributes"]}
        assert "host.name" not in res_attrs
        recs = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
        hosts = [
            {a["key"]: a["value"] for a in r["attributes"]}
            ["log.syslog.hostname"]["stringValue"] for r in recs]
        assert hosts == ["web01", "web01", "web02", "web01"]
    finally:
        srv.stop()


def test_otlp_gzip_and_attribute_map():
    from rsyslog_ray.stages.connectors import OtlpTransport

    srv = _OtlpCollector()
    try:
        ConnectorSink(transport=OtlpTransport(
            "127.0.0.1", srv.port, compression="gzip",
            attribute_map={"appname": "service.component"}),
            batch_rows=100)(_rows(3))
        _, headers, doc = srv.decode()
        assert headers["Content-Encoding"] == "gzip"
        attrs = {a["key"] for a in doc["resourceLogs"][0]["scopeLogs"][0]
                 ["logRecords"][0]["attributes"]}
        assert "service.component" in attrs
        assert "log.syslog.appname" not in attrs
    finally:
        srv.stop()


def test_otlp_retry_policy(tmp_path):
    """429 is retried (omotel_http.c:378-392); a plain 400 means the
    collector rejected the payload -> whole bulk quarantined to the
    errorfile, NOT retried (RS_RET_DISCARDMSG, omotel_http.c:498)."""
    from rsyslog_ray.stages.connectors import OtlpTransport

    srv = _OtlpCollector(statuses=[429, 200])
    try:
        out = ConnectorSink(transport=OtlpTransport("127.0.0.1", srv.port),
                            batch_rows=100, backoff_base_s=0.01)(_rows(2))
        assert out["rows_delivered"].iloc[0] == 2
        assert len(srv.seen) == 2          # the 429 attempt + the retry
    finally:
        srv.stop()

    srv = _OtlpCollector(statuses=[400])
    err = tmp_path / "otlp.err"
    try:
        out = ConnectorSink(transport=OtlpTransport("127.0.0.1", srv.port),
                            batch_rows=100, error_file=str(err),
                            backoff_base_s=0.01)(_rows(2))
        assert out["rows_rejected"].iloc[0] == 2
        assert len(srv.seen) == 1          # no retry on 4xx
        lines = [json.loads(line) for line in
                 err.read_text().strip().splitlines()]
        assert len(lines) == 2 and "otlp rejected" in lines[0]["error"]
    finally:
        srv.stop()

    srv = _OtlpCollector(statuses=[503, 503, 503])
    try:
        with pytest.raises(TransportSuspended):
            ConnectorSink(transport=OtlpTransport("127.0.0.1", srv.port),
                          batch_rows=100, max_retries=3,
                          backoff_base_s=0.01)(_rows(1))
    finally:
        srv.stop()


# ---------------------------------------------------------- omawslogshlc

class _HlcCollector:
    """CloudWatch HLC double: re-parses the concatenated-JSON body with
    a raw_decode walk (no array wrapper exists to lean on)."""

    def __init__(self, statuses=None):
        self.requests = []      # (path, auth, [event dicts])
        self.statuses = list(statuses or [])
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(
                    int(self.headers["Content-Length"])).decode()
                dec, events, pos = json.JSONDecoder(), [], 0
                while pos < len(body):
                    obj, pos = dec.raw_decode(body, pos)
                    events.append(obj)
                outer.requests.append(
                    (self.path, self.headers.get("Authorization"), events))
                status = outer.statuses.pop(0) if outer.statuses else 200
                self.send_response(status)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.httpd, self.port = _serve(H)

    def stop(self):
        self.httpd.shutdown()


def test_hlc_concatenated_events_and_batch_cap():
    """Events arrive as back-to-back JSON objects (no array), with the
    bearer token, URL-encoded group/stream query params, and the
    max_batch_size request split (omawslogshlc.c:198-210,296-305,523)."""
    from rsyslog_ray.stages.connectors import CwlHlcTransport

    srv = _HlcCollector()
    try:
        out = ConnectorSink(transport=CwlHlcTransport(
            "127.0.0.1", srv.port, bearer_token="tok123",
            log_group="/app/prod", log_stream="web 01",
            max_batch_size=3, ts_field="ts"), batch_rows=100)(_rows(7))
        assert out["rows_delivered"].iloc[0] == 7
        # 7 events / cap 3 -> 3 requests
        assert [len(ev) for _, _, ev in srv.requests] == [3, 3, 1]
        path, auth, events = srv.requests[0]
        assert auth == "Bearer tok123"
        assert path == ("/services/collector/event"
                        "?logGroup=%2Fapp%2Fprod&logStream=web%2001")
        assert events[0] == {"event": "event number 0",
                             "time": 1700000000.0, "host": "web01",
                             "source": "rsyslog"}
    finally:
        srv.stop()


def test_hlc_limits_and_status_policy(tmp_path):
    from rsyslog_ray.stages.connectors import CwlHlcTransport

    # oversized single event -> per-item reject, rest delivered
    srv = _HlcCollector()
    try:
        df = _rows(3)
        df.loc[1, "msg"] = "x" * (300 * 1024)
        err = tmp_path / "hlc.err"
        out = ConnectorSink(transport=CwlHlcTransport(
            "127.0.0.1", srv.port, bearer_token="t", log_group="g",
            log_stream="s"), batch_rows=100, error_file=str(err))(df)
        assert out["rows_delivered"].iloc[0] == 2
        assert out["rows_rejected"].iloc[0] == 1
        assert "256 KiB" in err.read_text()
    finally:
        srv.stop()

    # 403 is retryable (token rotation resumes): suspend after budget
    srv = _HlcCollector(statuses=[403, 403])
    try:
        with pytest.raises(TransportSuspended):
            ConnectorSink(transport=CwlHlcTransport(
                "127.0.0.1", srv.port, bearer_token="bad", log_group="g",
                log_stream="s"), batch_rows=100, max_retries=2,
                backoff_base_s=0.01)(_rows(1))
    finally:
        srv.stop()

    # plain 400 drops the batch -> rejects, no retry (c:385-388)
    srv = _HlcCollector(statuses=[400])
    try:
        out = ConnectorSink(transport=CwlHlcTransport(
            "127.0.0.1", srv.port, bearer_token="t", log_group="g",
            log_stream="s"), batch_rows=100, backoff_base_s=0.01)(_rows(2))
        assert out["rows_rejected"].iloc[0] == 2
        assert len(srv.requests) == 1
    finally:
        srv.stop()


# ------------------------------------------------------------ omazuredce

class _DceServer:
    """One server playing both roles: the OAuth2 token endpoint
    (validating the client-credentials form body) and the DCE ingest
    endpoint (validating the Bearer token it itself issued)."""

    def __init__(self, ingest_statuses=None):
        from urllib.parse import parse_qs

        self.tokens_issued = []
        self.ingests = []        # (path, token-ok, [records])
        self.ingest_statuses = list(ingest_statuses or [])
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                if self.path.endswith("/oauth2/v2.0/token"):
                    form = parse_qs(body.decode())
                    assert form["grant_type"] == ["client_credentials"]
                    assert form["scope"] == \
                        ["https://monitor.azure.com/.default"]
                    assert form["client_id"] == ["app-123"]
                    assert form["client_secret"] == ["s3cr=t&x"]
                    assert self.path == "/ten-9/oauth2/v2.0/token"
                    tok = f"jwt-{len(outer.tokens_issued)}"
                    outer.tokens_issued.append(tok)
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(
                        json.dumps({"access_token": tok,
                                    "expires_in": 3599}).encode())
                    return
                auth = self.headers.get("Authorization", "")
                tok_ok = (auth.startswith("Bearer ") and
                          auth[7:] in outer.tokens_issued)
                if self.headers.get("Content-Encoding") == "gzip":
                    body = gzip.decompress(body)
                outer.ingests.append((self.path, tok_ok, json.loads(body)))
                status = (outer.ingest_statuses.pop(0)
                          if outer.ingest_statuses else 204)
                self.send_response(status)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.httpd, self.port = _serve(H)

    def stop(self):
        self.httpd.shutdown()

    def make(self, **kw):
        from rsyslog_ray.stages.connectors import AzureDceTransport

        return AzureDceTransport(
            "127.0.0.1", self.port, tenant_id="ten-9",
            client_id="app-123", client_secret="s3cr=t&x",
            dcr_immutable_id="dcr-abc", stream_name="Custom-raylog", **kw)


def test_azuredce_oauth_then_ingest():
    """The transport fetches a client-credentials token (the double
    asserts the exact form fields incl. URL-escaping of the secret),
    then posts a JSON ARRAY to the versioned DCR stream path with the
    Bearer token the double itself issued."""
    srv = _DceServer()
    try:
        out = ConnectorSink(transport=srv.make(), batch_rows=100)(_rows(3))
        assert out["rows_delivered"].iloc[0] == 3
        assert len(srv.tokens_issued) == 1
        path, tok_ok, records = srv.ingests[0]
        assert path == ("/dataCollectionRules/dcr-abc/streams/"
                        "Custom-raylog?api-version=2023-01-01")
        assert tok_ok
        assert isinstance(records, list) and len(records) == 3
        assert records[1]["msg"] == "event number 1"
        assert records[1]["hostname"] == "web01"
    finally:
        srv.stop()


def test_azuredce_401_refreshes_token_then_retries():
    """A 401 ingest answer refreshes the token BEFORE the retry
    (omazuredce.c:626-634): the retry arrives bearing a new token."""
    srv = _DceServer(ingest_statuses=[401, 204])
    try:
        out = ConnectorSink(transport=srv.make(), batch_rows=100,
                            backoff_base_s=0.01)(_rows(2))
        assert out["rows_delivered"].iloc[0] == 2
        assert len(srv.tokens_issued) == 2      # initial + post-401 refresh
        assert len(srv.ingests) == 2
        assert srv.ingests[0][1] and srv.ingests[1][1]
    finally:
        srv.stop()


def test_azuredce_gzip_and_reject_policy(tmp_path):
    srv = _DceServer()
    try:
        ConnectorSink(transport=srv.make(compression="gzip"),
                      batch_rows=100)(_rows(2))
        assert len(srv.ingests[0][2]) == 2      # double gunzipped it
    finally:
        srv.stop()

    # 429 retried, then success
    srv = _DceServer(ingest_statuses=[429, 204])
    try:
        out = ConnectorSink(transport=srv.make(), batch_rows=100,
                            backoff_base_s=0.01)(_rows(1))
        assert out["rows_delivered"].iloc[0] == 1
        assert len(srv.ingests) == 2
    finally:
        srv.stop()

    # 413 (non-retryable 4xx) -> per-item rejects, single attempt
    srv = _DceServer(ingest_statuses=[413])
    err = tmp_path / "dce.err"
    try:
        out = ConnectorSink(transport=srv.make(), batch_rows=100,
                            error_file=str(err),
                            backoff_base_s=0.01)(_rows(2))
        assert out["rows_rejected"].iloc[0] == 2
        assert len(srv.ingests) == 1
        assert "HTTP 413" in err.read_text()
    finally:
        srv.stop()


# --------------------------------------------------- omtcl / omstdout

def test_omtcl_real_interpreter(tmp_path):
    """A REAL tclsh sources the user's script and applies the proc per
    message (omtcl.c:100-108): the proc writes what it got to a file;
    a TCL_ERROR from the proc becomes a per-item reject."""
    import shutil

    from rsyslog_ray.stages.connectors import TclTransport

    if shutil.which("tclsh") is None:
        pytest.skip("no tclsh in PATH")
    outfile = tmp_path / "tcl.out"
    script = tmp_path / "handler.tcl"
    script.write_text(
        'proc logmsg {msg} {\n'
        '    if {[string match *boom* $msg]} {error "refused: $msg"}\n'
        f'    set fh [open {outfile} a]\n'
        '    puts $fh $msg\n'
        '    close $fh\n'
        '}\n')
    df = pd.DataFrame({"msg": ["hello tcl", 'quote " brace } $var',
                               "boom goes", "multi\nline"]})
    err = tmp_path / "tcl.err"
    out = ConnectorSink(transport=TclTransport(
        str(script), "logmsg", render=lambda r: r["msg"]),
        batch_rows=100, error_file=str(err))(df)
    assert out["rows_delivered"].iloc[0] == 3
    assert out["rows_rejected"].iloc[0] == 1
    got = outfile.read_text()
    assert 'quote " brace } $var' in got       # Tcl quoting survived
    assert "multi\nline" in got
    assert "boom" not in got
    rej = json.loads(err.read_text().strip())
    assert rej["error"].startswith("ERR refused")

    # a script that fails to source raises (startup confirmation)
    bad = tmp_path / "bad.tcl"
    bad.write_text("this is not tcl {{{")
    with pytest.raises(TransportSuspended):
        ConnectorSink(transport=TclTransport(str(bad), "logmsg"),
                      batch_rows=10, max_retries=2,
                      backoff_base_s=0.01)(df.head(1))


def test_omstdout(capsys):
    from rsyslog_ray.stages.connectors import StdoutTransport

    out = ConnectorSink(transport=StdoutTransport(
        render=lambda r: r["msg"]), batch_rows=10)(
        pd.DataFrame({"msg": ["a", "b\n"]}))
    assert out["rows_delivered"].iloc[0] == 2
    assert capsys.readouterr().out == "a\nb\n"
