"""mmexternal analog: a REAL external program (child python) transforms
records through stdin/stdout JSON lines, one process per actor."""

import sys
import textwrap

import pandas as pd

CHILD = textwrap.dedent("""
    import json, sys
    for line in sys.stdin:
        rec = json.loads(line)
        rec["msg_up"] = rec["msg"].upper()
        rec["val2"] = rec["val"] * 2
        sys.stdout.write(json.dumps(rec) + "\\n")
        sys.stdout.flush()
""")


def _argv():
    return [sys.executable, "-u", "-c", CHILD]


def test_external_stage_direct():
    from rsyslog_ray.stages.external import ExternalTransformStage

    st = ExternalTransformStage(_argv(), ["msg", "val"])
    df = pd.DataFrame({"msg": [f"m{i}" for i in range(500)],
                       "val": range(500), "keep": ["x"] * 500})
    out = st(df)
    assert out["msg_up"].tolist() == [f"M{i}" for i in range(500)]
    assert out["val2"].tolist() == [2 * i for i in range(500)]
    assert out["keep"].tolist() == ["x"] * 500   # untouched cols survive
    # second batch reuses the SAME child process (stateful actor slot)
    pid = st._proc.pid
    out2 = st(df.head(3))
    assert st._proc.pid == pid and len(out2) == 3


def test_external_stage_respawns_dead_child():
    from rsyslog_ray.stages.external import ExternalTransformStage

    st = ExternalTransformStage(_argv(), ["msg", "val"])
    st._proc.kill()
    st._proc.wait()
    out = st(pd.DataFrame({"msg": ["a"], "val": [1]}))
    assert out["msg_up"].iloc[0] == "A"          # EPIPE-respawn policy


def test_external_transform_distributed(ray_session):
    import ray.data

    from rsyslog_ray.stages.external import external_transform

    df = pd.DataFrame({"msg": [f"row {i}" for i in range(4000)],
                       "val": range(4000)})
    ds = ray.data.from_pandas(df).repartition(4)
    out = external_transform(ds, _argv(), ["msg", "val"],
                             concurrency=(1, 2), batch_size=512).to_pandas()
    out = out.sort_values("val").reset_index(drop=True)
    assert out["msg_up"].tolist() == [f"ROW {i}" for i in range(4000)]
    assert (out["val2"] == out["val"] * 2).all()


def test_dnscache_real_and_semantics():
    """dnscache: real reverse resolution (127.0.0.1 -> localhost via
    the system resolver), TTL expiry, capacity eviction, fallback."""
    from rsyslog_ray.state.dnscache import DnsCache

    c = DnsCache(ttl_s=10)
    assert c.lookup("127.0.0.1", now=0) == "localhost"   # real resolve
    assert c.lookup("127.0.0.1", now=5) == "localhost"   # cached
    assert (c.hits, c.misses) == (1, 1)
    c.lookup("127.0.0.1", now=20)                        # TTL expired
    assert c.misses == 2
    # unresolvable -> address-form fallback (injected resolver)
    calls = []

    def fake(ip):
        calls.append(ip)
        return f"host-{ip}"

    c2 = DnsCache(ttl_s=100, max_entries=2, resolver=fake)
    s = pd.Series(["1.1.1.1", "2.2.2.2", "1.1.1.1", "1.1.1.1"])
    out = c2.lookup_series(s, now=0)
    assert out.tolist() == ["host-1.1.1.1", "host-2.2.2.2",
                            "host-1.1.1.1", "host-1.1.1.1"]
    assert calls == ["1.1.1.1", "2.2.2.2"]   # distinct-once per batch
    c2.lookup("3.3.3.3", now=1)              # capacity 2 -> evict stalest
    assert len(c2._cache) == 2 and "3.3.3.3" in c2._cache


def test_http_request_stage_real_server(ray_session):
    """fmhttp http_request over a real localhost HTTP server: per-actor
    persistent connection, distinct-url fan-in, '' on error paths."""
    import http.server
    import threading

    import ray.data

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(h):
            if h.path.startswith("/missing"):
                h.send_response(404)
                h.end_headers()
                return
            body = f"body-of:{h.path}".encode()
            h.send_response(200)
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)

        def log_message(h, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        from rsyslog_ray.stages.external import HttpRequestStage

        df = pd.DataFrame({"id": range(60),
                           "url": [f"/p/{i % 5}" if i % 20 else "/missing"
                                   for i in range(60)]})
        ds = ray.data.from_pandas(df).repartition(3)
        out = ds.map_batches(
            HttpRequestStage,
            fn_constructor_kwargs=dict(host="127.0.0.1", port=port),
            batch_format="pandas", concurrency=(1, 2),
            batch_size=32).to_pandas().sort_values("id")
        ok = out[out["url"] != "/missing"]
        assert (ok["http_body"] == "body-of:" + ok["url"]).all()
        assert (out[out["url"] == "/missing"]["http_body"] == "").all()
    finally:
        httpd.shutdown()
        httpd.server_close()
