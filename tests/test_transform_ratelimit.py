"""Transform extras + token-bucket ratelimit + corrupt-manifest resume."""

import json
import os

import numpy as np
import pandas as pd

from rsyslog_ray.stages.ratelimit import token_bucket_keep
from rsyslog_ray.stages.transform import (ConsistentAnonymizer,
                                          capped_dynstats, flatten_json,
                                          hmac_column, unflatten_json)


def test_flatten_unflatten_roundtrip():
    nested = {"a": {"b": {"c": 1}, "d": "x"}, "e": [1, 2]}
    flat = flatten_json(nested)
    assert flat == {"a.b.c": 1, "a.d": "x", "e": [1, 2]}
    assert unflatten_json(flat) == nested
    # conflict: last wins (reference overwrite policy)
    assert unflatten_json({"a": 1, "a.b": 2}) == {"a": {"b": 2}}


def test_consistent_anonymizer():
    an = ConsistentAnonymizer()
    s = pd.Series(["ip=1.2.3.4 peer=5.6.7.8", "again 1.2.3.4 end"])
    out = an.anonymize(s)
    ip1 = out.iloc[0].split()[0].split("=")[1]
    ip1b = out.iloc[1].split()[1]
    assert ip1 == ip1b                      # same input -> same pseudonym
    assert ip1.startswith("10.")
    assert "1.2.3.4" not in out.iloc[0]
    # different inputs map differently
    ip2 = out.iloc[0].split()[1].split("=")[1]
    assert ip1 != ip2
    # a fresh instance (fresh worker) agrees — no shared state needed
    assert an.anonymize(s).tolist() == ConsistentAnonymizer().anonymize(s).tolist()


def test_hmac_deterministic():
    a = hmac_column(pd.Series(["x", "y"]))
    b = hmac_column(pd.Series(["x", "y"]))
    assert a.tolist() == b.tolist()
    assert a.iloc[0] != a.iloc[1]
    assert len(a.iloc[0]) == 64


def test_capped_dynstats():
    counts = pd.DataFrame({"k": [f"s{i:02d}" for i in range(10)],
                           "cnt": list(range(1, 11))})
    out = capped_dynstats(counts, "k", "cnt", max_cardinality=4)
    assert out["k"].tolist() == ["s00", "s01", "s02", "s03", "__rejected__"]
    assert out["cnt"].iloc[-1] == sum(range(5, 11))
    # under the cap: untouched
    pd.testing.assert_frame_equal(
        capped_dynstats(counts, "k", "cnt", 100), counts)


def test_token_bucket_semantics():
    ts = pd.to_datetime([
        "2026-01-01 00:00:00",  # window opens      -> keep (1/2)
        "2026-01-01 00:00:10",  #                   -> keep (2/2)
        "2026-01-01 00:00:20",  # burst exhausted   -> drop
        "2026-01-01 00:00:59",  #                   -> drop
        "2026-01-01 00:01:00",  # NOT past begin+interval (strict >,
        #                         ratelimit.c:2436) -> still dropped
        "2026-01-01 00:03:00",  # expiry -> reset   -> keep
    ])
    keep, summaries = __import__(
        "rsyslog_ray.stages.ratelimit", fromlist=["token_bucket_eval"]
    ).token_bucket_eval(pd.Series(ts), interval_s=60, burst=2)
    assert keep.tolist() == [True, True, False, False, False, True]
    # tellLostCnt record for the expired window: 3 drops
    assert len(summaries) == 1 and summaries[0]["lost"] == 3


def test_ratelimit_severity_floor_and_summaries(ray_session):
    import ray.data

    from rsyslog_ray.stages.ratelimit import (ratelimit,
                                              ratelimit_lost_records)

    ts = pd.to_datetime(["2026-01-01 00:00:%02d" % i for i in range(6)]
                        + ["2026-01-01 01:00:00"])
    df = pd.DataFrame({"k": ["a"] * 7, "ts": ts,
                       "sev": [7, 7, 2, 7, 7, 1, 7],
                       "i": range(7)})
    # severity floor 3: sev<3 rows bypass AND consume no budget
    ds = ray.data.from_pandas(df)
    kept = ratelimit(ds, "k", "ts", interval_s=60, burst=2,
                     order_cols=["i"], severity_col="sev",
                     severity_threshold=3).to_pandas()
    # subject rows (sev>=3): i=0,1 kept, i=3,4,6 -> 3 dropped? i=6 is a
    # new window (t=01:00 > 00:00+60s) -> kept; bypass rows i=2,5 kept
    assert sorted(kept["i"]) == [0, 1, 2, 5, 6]
    # lost records carry the reference message text
    ds2 = ray.data.from_pandas(df[["k", "ts", "i"]])
    lost = ratelimit_lost_records(ds2, "k", "ts", interval_s=60, burst=2,
                                  order_cols=["i"]).to_pandas()
    assert len(lost) == 1 and lost["lost"].iloc[0] == 4
    assert "messages lost due to rate-limiting (2 allowed within 60" \
        in lost["msg"].iloc[0]


def test_corrupt_manifest_resume(ray_session, pages_small, tmp_path):
    """badqi analog: torn manifest lines mean 'redo that shard', never
    a crash (reference tests/bad_qi/, tests/badqi.sh)."""
    from rsyslog_ray import sinks as sk
    from rsyslog_ray.pipelines.flagship import input_shards, run_flagship
    from rsyslog_ray.router import DEFAULT_ROUTES, Router

    out = str(tmp_path / "out")
    run_flagship(pages_small, out)
    man = os.path.join(out, sk.LINEAGE_FILE)
    lines = open(man).read().strip().splitlines()
    # corrupt one record three ways: truncation, garbage, wrong type
    rec0 = json.loads(lines[0])
    with open(man, "w") as fh:
        fh.write(lines[1] + "\n")
        fh.write(lines[2][:25] + "\n")            # torn write
        fh.write("not json at all\n")             # garbage
        fh.write(json.dumps({"partition_id": None}) + "\n")  # wrong type
        for l in lines[3:]:
            fh.write(l + "\n")
    done = sk.committed_shards(out)
    assert json.loads(lines[1])["partition_id"] in done
    assert rec0["partition_id"] not in done       # torn -> redo
    files = input_shards(pages_small)
    pending, _ = sk.plan_resume(files, out, Router(DEFAULT_ROUTES).sinks)
    redo_ids = {sk.shard_id_of(f) for f in pending}
    assert rec0["partition_id"] in redo_ids
    # and the rerun completes, restoring a full manifest
    run_flagship(pages_small, out)
    assert sk.committed_shards(out) >= {0, 1, 2, 3, 4}


def test_consistent_anonymizer_ipv6():
    an = ConsistentAnonymizer()
    s = pd.Series(["x 2001:db8:1:2:3:4:5:6 y", "2001:db8:1:2:3:4:5:6 again",
                   "other fe80:0:0:1:2:3:4:5"])
    out = an.anonymize_ipv6(s)
    a0 = out.iloc[0].split()[1]
    a1 = out.iloc[1].split()[0]
    assert a0 == a1                              # consistent pseudonym
    assert a0.startswith("2001:db8:1:2:")        # network half kept
    assert a0 != "2001:db8:1:2:3:4:5:6"          # iid replaced
    assert out.iloc[2].startswith("other fe80:0:0:1:")
    # fresh instance agrees (no shared state)
    assert an.anonymize_ipv6(s).tolist() == \
        ConsistentAnonymizer().anonymize_ipv6(s).tolist()


def test_mark_rows_heartbeat(ray_session):
    """immark analog: one '-- MARK --' row per event-time interval
    boundary inside the stream span (plugins/immark/immark.c)."""
    import ray.data

    from rsyslog_ray.stages.transform import mark_rows

    df = pd.DataFrame({"ts": [100, 150, 1799, 2401, 3000],
                       "record": [f"m{i}" for i in range(5)],
                       "host": [f"h{i}" for i in range(5)]})
    ds = ray.data.from_pandas(df)
    out = mark_rows(ds, "ts", interval_s=600).to_pandas()
    marks = out[out["record"] == "-- MARK --"]
    # boundaries inside [100, 3000]: 600,1200,1800,2400,3000
    assert sorted(marks["ts"].tolist()) == [600, 1200, 1800, 2400, 3000]
    assert marks["host"].isna().all()
    # originals untouched
    assert len(out) == 5 + 5
    assert sorted(out[out["record"] != "-- MARK --"]["ts"]) == \
        [100, 150, 1799, 2401, 3000]
