"""Generator determinism + shape (seq_check analog)."""

import numpy as np

from rsyslog_ray import gen


def test_batch_deterministic_and_shard_independent():
    a = gen.gen_batch(np.arange(0, 300))
    b = gen.gen_batch(np.arange(150, 300))
    assert a.slice(150, 150).to_pydict() == b.to_pydict()
    # re-generation identical
    c = gen.gen_batch(np.arange(0, 300))
    assert a.to_pydict() == c.to_pydict()


def test_schema_and_seq_dense():
    t = gen.gen_batch(np.arange(0, 1000))
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang", "shard"]
    seqs = sorted(int(u.split("id=")[1]) for u in t["url"].to_pylist())
    assert seqs == list(range(1000))  # no gaps, no dups


def test_malformed_and_dirty_fractions():
    t = gen.gen_batch(np.arange(0, 10000))
    import re
    pat = re.compile(r'^ts=\S+ host=\S+ app=\w+ sev=\d msg="[^"]*" status=\d+ bytes=\d+$')
    ok = sum(bool(pat.match(s)) for s in t["text"].to_pylist())
    assert 0.93 < ok / 10000 < 0.97
    dirty = sum(1 for b in t["html"].to_pylist() if b"\xff" in b)
    assert 0.01 < dirty / 10000 < 0.04
