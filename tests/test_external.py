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
