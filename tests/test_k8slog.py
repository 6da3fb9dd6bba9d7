"""imkubernetes pod-log source (contrib/imkubernetes/imkubernetes.c):
CRI / docker-json / raw line parsing, P/F partial reassembly with the
truncation and stream-flip rules, pod-path metadata, offset/inode
tailing, and the distributed read."""

import json
import os

import pandas as pd

from rsyslog_ray.sources.k8slog import (K8sLogFileState, decode_pod_log,
                                        parse_cri_line,
                                        parse_docker_json_line,
                                        parse_pod_log_path, read_pod_logs)

POD_PATH = "/var/log/pods/prod_web-1_abc-123/app/3.log"


def test_parse_pod_log_path():
    m = parse_pod_log_path(POD_PATH)
    assert m == {"namespace_name": "prod", "pod_name": "web-1",
                 "pod_uid": "abc-123", "container_name": "app",
                 "restart_count": 3}
    # the pods dir, both underscores and the numeric stem are mandatory
    # (parsePodsPath c:420-497)
    assert parse_pod_log_path("/var/log/x/prod_web_u/app/3.log") is None
    assert parse_pod_log_path("/var/log/pods/produid/app/3.log") is None
    assert parse_pod_log_path(
        "/var/log/pods/prod_web_u/app/notnum.log") is None


def test_parse_cri_line():
    r = parse_cri_line(
        "2026-01-02T03:04:05.123456789Z stderr F panic: boom")
    assert (r["msg"], r["stream"], r["is_partial"]) == \
        ("panic: boom", "stderr", False)
    assert r["timestamp"].year == 2026 and r["timestamp"].microsecond \
        == 123456
    # P flag, stream must be exactly stdout/stderr, tag non-empty
    assert parse_cri_line("t stdout P frag")["is_partial"] is True
    assert parse_cri_line("t stdmid F x") is None
    assert parse_cri_line("t stdout  x") is None      # empty tag field
    assert parse_cri_line("no-spaces") is None
    # unparsable timestamp still yields a record, hasTime=0 (c:1179)
    assert parse_cri_line("junk stdout F x")["timestamp"] is None


def test_parse_docker_json_line():
    r = parse_docker_json_line(json.dumps(
        {"log": "hello\n", "stream": "stderr",
         "time": "2026-01-02T03:04:05Z"}))
    assert (r["msg"], r["stream"]) == ("hello", "stderr")
    assert r["timestamp"] is not None
    assert parse_docker_json_line('{"nolog": 1}') is None
    assert parse_docker_json_line("plain text") is None
    # only ONE trailing LF is stripped (c:1207-1210)
    assert parse_docker_json_line('{"log": "a\\n\\n"}')["msg"] == "a\n"


def test_decode_partial_reassembly():
    text = "\n".join([
        "t1 stdout F whole",
        "t2 stdout P part-a ",
        "t3 stdout P part-b ",
        "t4 stdout F part-c",
        "t5 stderr F after",
    ])
    recs = decode_pod_log(POD_PATH, text, escape_lf=False)
    assert [r["msg"] for r in recs] == \
        ["whole", "part-a part-b part-c", "after"]
    # the logical record keeps the FIRST fragment's stream (c:1130-1141)
    assert recs[1]["stream"] == "stdout"
    assert recs[1]["namespace_name"] == "prod"
    assert recs[1]["severity"] == 6 and recs[2]["severity"] == 3
    assert all(r["log_format"] == "cri" for r in recs)


def test_decode_stream_flip_discards_partial():
    # an open stdout partial is DISCARDED when a stderr record arrives
    # (emitPartialIfComplete c:1117-1122)
    text = "\n".join([
        "t1 stdout P lost-",
        "t2 stderr F kept",
        "t3 stdout F solo",
    ])
    recs = decode_pod_log(POD_PATH, text, escape_lf=False)
    assert [r["msg"] for r in recs] == ["kept", "solo"]


def test_decode_truncation_modes():
    frags = ["t stdout P " + "x" * 40] * 3 + ["t stdout F tail"]
    text = "\n".join(frags)
    # truncate mode: accumulator capped at max_msg_size (c:334-337)
    recs = decode_pod_log(POD_PATH, text, max_msg_size=100,
                          escape_lf=False)
    assert len(recs) == 1 and len(recs[0]["msg"]) == 100
    assert recs[0]["truncated"] is True
    # other modes: 10x hard cap -> 124 chars fit untruncated
    recs = decode_pod_log(POD_PATH, text, max_msg_size=100,
                          oversize_mode="accept", escape_lf=False)
    assert len(recs[0]["msg"]) == 124 and recs[0]["truncated"] is False
    # once capped, later fragments are consumed, never standalone
    # (the c:1096-1102 comment contract)
    big = ["t stdout P " + "y" * 90] * 5 + ["t stdout F end"]
    recs = decode_pod_log(POD_PATH, "\n".join(big), max_msg_size=100,
                          escape_lf=False)
    assert len(recs) == 1 and recs[0]["truncated"] is True


def test_decode_fallbacks_and_escape():
    text = "\n".join([
        json.dumps({"log": "docker line\n", "stream": "stderr"}),
        "completely raw line",
    ])
    recs = decode_pod_log(POD_PATH, text, escape_lf=False)
    assert recs[0]["log_format"] == "docker_json"
    assert recs[1] == {**recs[1], "log_format": "raw",
                       "parse_error": True, "stream": "stdout"}
    # escapeLf (default on, c:73,1067): LF inside a reassembled
    # docker-json message renders as #012
    recs = decode_pod_log(
        POD_PATH, json.dumps({"log": "two\nlines\n"}))
    assert recs[0]["msg"] == "two#012lines"


def test_file_state_tail_and_rotation(tmp_path):
    pod_dir = tmp_path / "pods" / "ns_pod_u1" / "c"
    pod_dir.mkdir(parents=True)
    f = pod_dir / "0.log"
    f.write_text("t1 stdout F one\n")
    st = K8sLogFileState(str(f), escape_lf=False)
    assert [r["msg"] for r in st.poll()] == ["one"]
    assert st.poll() == []                      # offset advanced
    with open(f, "a") as fh:
        fh.write("t2 stdout F two\n")
    assert [r["msg"] for r in st.poll()] == ["two"]
    # rotation: file truncated/replaced -> offset resets (c:1288-1292)
    f.write_text("t3 stdout F fresh\n")
    assert [r["msg"] for r in st.poll()] == ["fresh"]
    # freshStartTail: skip pre-existing content on first sight (c:1295)
    f2 = pod_dir / "1.log"
    f2.write_text("t stdout F old\n")
    st2 = K8sLogFileState(str(f2), fresh_start_tail=True,
                          escape_lf=False)
    assert st2.poll() == []
    with open(f2, "a") as fh:
        fh.write("t stdout F new\n")
    assert [r["msg"] for r in st2.poll()] == ["new"]


def test_read_pod_logs_distributed(ray_session, tmp_path):
    base = tmp_path / "var" / "log" / "pods"
    for ns, pod, uid, cont, n in [("prod", "web", "u1", "app", 2),
                                  ("dev", "db", "u2", "pg", 1)]:
        d = base / f"{ns}_{pod}_{uid}" / cont
        d.mkdir(parents=True)
        (d / "0.log").write_text("".join(
            f"2026-01-01T00:00:0{i}Z stdout F {ns}-{i}\n"
            for i in range(n)))
    df = (read_pod_logs(str(base) + "/**/*.log", escape_lf=False)
          .to_pandas())
    assert len(df) == 3
    assert sorted(df["namespace_name"].unique()) == ["dev", "prod"]
    got = df.sort_values("msg")
    assert got["msg"].tolist() == ["dev-0", "prod-0", "prod-1"]
    assert set(got["container_name"]) == {"app", "pg"}
    assert got["timestamp"].notna().all()
