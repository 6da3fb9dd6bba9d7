"""mmkubernetes: REAL HTTP enrichment against a live apiserver-shaped
double (contrib/mmkubernetes/mmkubernetes.c semantics: filename /
CONTAINER_NAME extraction, TTL caches, 404 negative caching, 429 busy
backoff, annotation_match + de_dot)."""

import http.server
import json
import threading

import pandas as pd

from rsyslog_ray.stages.enrich import (KubernetesEnrichStage,
                                       extract_k8s_meta)

POD_ID = "f4ca0a29-1111-2222-3333-444455556666"
NS_ID = "aaaabbbb-cccc-dddd-eeee-ffff00001111"


class FakeApiServer:
    """Serves /api/v1/namespaces/{ns} and .../pods/{pod} with
    configurable objects; counts requests; can answer 429."""

    def __init__(self):
        self.requests = []
        self.busy_mode = False
        outer = self
        self.namespaces = {
            "prod": {"metadata": {
                "uid": NS_ID, "creationTimestamp": "2026-01-01T00:00:00Z",
                "labels": {"team.name": "core"},
                "annotations": {"openshift.io/sa": "x", "other": "y"}}},
        }
        self.pods = {
            ("prod", "web-1"): {
                "metadata": {"uid": POD_ID,
                             "labels": {"app.kubernetes.io/name": "web"},
                             "annotations": {"openshift.io/scc": "restricted",
                                             "noise.key": "drop-me"}},
                "spec": {"nodeName": "node-7"}},
        }

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(h):
                outer.requests.append(h.path)
                if outer.busy_mode:
                    h.send_response(429)
                    h.end_headers()
                    return
                parts = h.path.strip("/").split("/")
                obj = None
                if len(parts) == 4 and parts[:2] == ["api", "v1"] \
                        and parts[2] == "namespaces":
                    obj = outer.namespaces.get(parts[3])
                elif len(parts) == 6 and parts[4] == "pods":
                    obj = outer.pods.get((parts[3], parts[5]))
                if obj is None:
                    h.send_response(404)
                    h.end_headers()
                    h.wfile.write(b"{}")
                    return
                body = json.dumps(obj).encode()
                h.send_response(200)
                h.send_header("Content-Type", "application/json")
                h.send_header("Content-Length", str(len(body)))
                h.end_headers()
                h.wfile.write(body)

            def log_message(h, *a):
                pass

        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        threading.Thread(target=self.srv.serve_forever,
                         daemon=True).start()

    def stop(self):
        self.srv.shutdown()
        self.srv.server_close()


FN = ("/var/log/containers/web-1_prod_app-"
      + "0123456789abcdef" * 4 + ".log")


def test_extract_from_filename_and_container_name():
    df = pd.DataFrame({
        "filename": [FN, "/var/log/messages", None],
        "CONTAINER_NAME": [None,
                           "k8s_app.ab12_web-2_stage_uid_0",
                           "notk8s"]})
    out = extract_k8s_meta(df, "filename", "CONTAINER_NAME")
    assert out.loc[0, "pod_name"] == "web-1"
    assert out.loc[0, "namespace_name"] == "prod"
    assert out.loc[0, "container_name"] == "app"
    assert out.loc[0, "container_id"] == "0123456789abcdef" * 4
    # journald CONTAINER_NAME fallback form
    assert out.loc[1, "pod_name"] == "web-2"
    assert out.loc[1, "namespace_name"] == "stage"
    assert out.loc[1, "container_name"] == "app"
    assert out.loc[1, "container_id"] == "ab12"
    assert out.loc[2, "pod_name"] is None


def test_live_enrich_with_cache_and_dedot():
    srv = FakeApiServer()
    try:
        stage = KubernetesEnrichStage(
            "127.0.0.1", srv.port,
            annotation_match=[r"^openshift\.io/"])
        df = pd.DataFrame({"filename": [FN] * 50,
                           "msg": [f"m{i}" for i in range(50)]})
        out = stage(df)
        kube = json.loads(out["kubernetes"].iloc[0])
        assert kube["pod_name"] == "web-1"
        assert kube["namespace_name"] == "prod"
        assert kube["container_name"] == "app"
        assert kube["pod_id"] == POD_ID
        assert kube["namespace_id"] == NS_ID
        assert kube["host"] == "node-7"
        assert kube["creation_timestamp"] == "2026-01-01T00:00:00Z"
        assert kube["master_url"] == f"http://127.0.0.1:{srv.port}"
        # de_dot on label keys
        assert kube["labels"] == {"app_kubernetes_io/name": "web"}
        assert kube["namespace_labels"] == {"team_name": "core"}
        # annotation_match keeps only openshift.io/*, de_dotted
        assert kube["annotations"] == {"openshift_io/scc": "restricted"}
        assert kube["namespace_annotations"] == {"openshift_io/sa": "x"}
        docker = json.loads(out["docker"].iloc[0])
        assert docker["container_id"] == "0123456789abcdef" * 4
        # 50 rows, ONE identity -> exactly 2 apiserver hits (ns + pod)
        assert len(srv.requests) == 2
        # second batch: full cache hit, zero new requests
        stage(df)
        assert len(srv.requests) == 2
    finally:
        srv.stop()


def test_404_negative_cache_still_enriches_basics():
    srv = FakeApiServer()
    try:
        stage = KubernetesEnrichStage("127.0.0.1", srv.port)
        fn = ("/var/log/containers/ghost-1_nowhere_app-"
              + "ab" * 32 + ".log")
        df = pd.DataFrame({"filename": [fn]})
        out = stage(df)
        kube = json.loads(out["kubernetes"].iloc[0])
        # basic metadata from the filename survives a 404
        assert kube["pod_name"] == "ghost-1"
        assert kube["namespace_name"] == "nowhere"
        assert "pod_id" not in kube
        n = len(srv.requests)
        # 404 is negative-CACHED: re-running queries nothing new
        stage(df)
        assert len(srv.requests) == n
    finally:
        srv.stop()


def test_429_busy_not_cached_then_recovers():
    srv = FakeApiServer()
    try:
        stage = KubernetesEnrichStage("127.0.0.1", srv.port,
                                      busy_retry_interval=0)
        srv.busy_mode = True
        df = pd.DataFrame({"filename": [FN]})
        out = stage(df)
        kube = json.loads(out["kubernetes"].iloc[0])
        assert kube["pod_name"] == "web-1"     # basic metadata only
        assert "pod_id" not in kube
        # busy responses are NOT cached: once the server recovers the
        # next batch gets the full metadata
        srv.busy_mode = False
        out = stage(df)
        kube = json.loads(out["kubernetes"].iloc[0])
        assert kube["pod_id"] == POD_ID
    finally:
        srv.stop()


def test_non_matching_rows_pass_unmodified():
    srv = FakeApiServer()
    try:
        stage = KubernetesEnrichStage("127.0.0.1", srv.port)
        df = pd.DataFrame({"filename": ["/var/log/syslog", None],
                           "msg": ["a", "b"]})
        out = stage(df)
        assert out["kubernetes"].isna().all()
        assert out["docker"].isna().all()
        assert list(out["msg"]) == ["a", "b"]
        assert srv.requests == []
    finally:
        srv.stop()


def test_as_distributed_stage(ray_session):
    import ray.data

    srv = FakeApiServer()
    try:
        ds = ray.data.from_pandas(pd.DataFrame({
            "filename": [FN] * 200,
            "msg": [f"m{i}" for i in range(200)]}))
        out = ds.map_batches(
            KubernetesEnrichStage,
            fn_constructor_args=("127.0.0.1", srv.port),
            batch_format="pandas", batch_size=64,
            concurrency=(1, 2)).to_pandas()
        assert len(out) == 200
        assert out["kubernetes"].notna().all()
        k = json.loads(out["kubernetes"].iloc[0])
        assert k["pod_id"] == POD_ID
        # distinct-key fan-in held per batch: far fewer requests than rows
        assert len(srv.requests) <= 2 * 8
    finally:
        srv.stop()
