"""omtesting action drills + imdiag control channel.

References: plugins/omtesting/omtesting.c (mode state machine, doFail
:139-155, doFailOnResume :124-136, doRandFail :171-182, echo :232-235)
and plugins/imdiag/imdiag.c (OnMsgReceived dispatch :672-695,
doInjectNumericSuffixMsg :293-304, waitMainQEmpty :394-420).
"""

import socket
import threading

import pandas as pd
import pytest

from rsyslog_ray.diag import DiagServer, numeric_suffix_msg
from rsyslog_ray.stages.connectors import (ConnectorSink, OmtestingTransport,
                                           TransportSuspended)


def _collect(hist, kind):
    return [m for k, m in hist if k == kind]


def test_omtesting_fail_mode_state_machine():
    """fail 2 2: counter starts at 1, every 2nd doAction call suspends,
    exactly 2 tryResume calls recover, the redo consumes another call
    number — so after the first message every message fails once."""
    t = OmtestingTransport(":omtesting:fail 2 2")
    msgs = [f"m{i}" for i in range(6)]
    t.deliver(msgs)
    assert t.echoed == msgs                     # all eventually delivered
    assert _collect(t.history, "suspend") == msgs[1:]   # m1..m5 fail once
    # each suspension: one failed resume (curr_retries 1 != 2) then one
    # successful resume (== 2)
    assert _collect(t.history, "resume-fail") == msgs[1:]
    assert _collect(t.history, "resumed") == msgs[1:]


def test_omtesting_sleep_and_invalid_mode():
    slept = []
    t = OmtestingTransport(":omtesting:sleep 0 250", sleep_fn=slept.append)
    t.deliver(["a", "b"])
    assert t.echoed == ["a", "b"]
    assert slept == [250 / 1e6] * 2
    # unknown mode -> createInstance defaults (sleep 1 0), c:98-100
    slept2 = []
    t2 = OmtestingTransport(":omtesting:bogus", sleep_fn=slept2.append)
    t2.deliver(["x"])
    assert slept2 == [1.0]


def test_omtesting_randfail_injected_rng():
    RAND_MAX = 0x7FFFFFFF
    seq = iter([0, RAND_MAX, 0, 0])   # ok, fail, resume-ok, redo-ok
    t = OmtestingTransport(":omtesting:randfail", rng=lambda: next(seq))
    t.deliver(["a", "b"])
    assert t.echoed == ["a", "b"]
    assert _collect(t.history, "suspend") == ["b"]
    assert _collect(t.history, "resumed") == ["b"]


def test_omtesting_always_suspend_escalates():
    t = OmtestingTransport(":omtesting:always_suspend",
                         max_resume_attempts=5)
    with pytest.raises(TransportSuspended):
        t.deliver(["never"])
    assert t.echoed == []
    # through ConnectorSink: bounded retry then stage suspension,
    # the runtime/action.c escalation ladder
    sink = ConnectorSink(
        transport=OmtestingTransport(":omtesting:always_suspend",
                                   max_resume_attempts=3),
        max_retries=2, backoff_base_s=0.001)
    with pytest.raises(TransportSuspended):
        sink(pd.DataFrame({"msg": ["x", "y"]}))


def test_omtesting_as_connector_transport():
    t = OmtestingTransport(":omtesting:fail 3 1")
    sink = ConnectorSink(transport=t, batch_rows=4)
    out = sink(pd.DataFrame({"msg": [f"r{i}" for i in range(10)]}))
    assert int(out["rows_delivered"][0]) == 10
    assert int(out["rows_rejected"][0]) == 0
    assert t.echoed == [f"r{i}" for i in range(10)]
    assert len(_collect(t.history, "suspend")) > 0


def _cmd(port: int, line: str) -> str:
    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        s.sendall(line.encode() + b"\n")
        buf = b""
        while not buf.endswith(b"\n"):
            d = s.recv(4096)
            if not d:
                break
            buf += d
        return buf.decode()


def test_imdiag_inject_and_queue_size():
    srv = DiagServer().start()
    try:
        assert _cmd(srv.port, "getmainmsgqueuesize") == "0\n"
        assert _cmd(srv.port, "injectmsg 0 25") == "25 messages injected\n"
        assert _cmd(srv.port, "getmainmsgqueuesize") == "25\n"
        msgs = srv.drain()
        assert msgs == [numeric_suffix_msg(i) for i in range(25)]
        # the reference's exact numeric-suffix shape (imdiag.c:296-301)
        assert msgs[7] == "<167>Mar  1 01:00:00 192.0.2.8 tag msgnum:00000007:"
        assert _cmd(srv.port, "injectmsg literal <165>1 - h app - - - hi") \
            == "1 messages injected\n"
        assert srv.drain() == ["<165>1 - h app - - - hi"]
        assert _cmd(srv.port, "nonsense").startswith("error")
        assert _cmd(srv.port, "injectmsg 0").startswith("error")
    finally:
        srv.close()


def test_imdiag_waitmainqueueempty_blocks_until_drain():
    srv = DiagServer().start()
    try:
        _cmd(srv.port, "injectmsg 100 10")
        drained = []
        timer = threading.Timer(0.25, lambda: drained.extend(srv.drain()))
        timer.start()
        # blocks ~250ms until the engine-side drain, then OK
        assert _cmd(srv.port, "waitmainqueueempty") == "OK\n"
        timer.join()
        assert drained == [numeric_suffix_msg(100 + i) for i in range(10)]
    finally:
        srv.close()


def test_imdiag_await_lookup_reload(ray_session):
    from rsyslog_ray.lookup import ReloadableLookup

    tbl = ('{"version": 1, "nomatch": "-", "type": "string", '
           '"table": [{"index": "a", "value": "1"}]}')
    rl = ReloadableLookup.start(tbl)
    srv = DiagServer(lookup=rl).start()
    try:
        got = []
        th = threading.Thread(
            target=lambda: got.append(_cmd(srv.port,
                                           "awaitlookuptablereload")))
        th.start()
        th.join(timeout=0.2)
        assert th.is_alive()          # still blocked: no reload yet
        rl.reload(tbl.replace('"1"', '"2"'))
        th.join(timeout=10)
        assert got == ["OK\n"]
    finally:
        srv.close()
