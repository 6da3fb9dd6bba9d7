"""imjournal analog: systemd Journal Export Format parsing + the
readjournal property mapping (plugins/imjournal/imjournal.c:595-760)."""

import pandas as pd

from rsyslog_ray.sources.journal import (entry_to_row, read_journal_export,
                                         split_journal_export)


def _export_bytes() -> bytes:
    blob = b"\xffbin\x00data"             # non-utf8 binary payload
    out = b""
    # entry 1: fully-populated text fields
    out += (b"__REALTIME_TIMESTAMP=1704067200000000\n"
            b"MESSAGE=service started\n"
            b"PRIORITY=6\n"
            b"SYSLOG_FACILITY=3\n"
            b"SYSLOG_IDENTIFIER=sshd\n"
            b"SYSLOG_PID=42\n"
            b"_HOSTNAME=web01\n\n")
    # entry 2: binary MESSAGE field (NAME\n + LE64 size + raw + \n),
    # bad PRIORITY (two digits -> default), _PID fallback
    out += b"MESSAGE\n" + len(blob).to_bytes(8, "little") + blob + b"\n"
    out += (b"PRIORITY=13\n"
            b"_PID=7\n"
            b"SYSLOG_IDENTIFIER=app\n"
            b"_HOSTNAME=web02\n\n")
    # entry 3: bare minimum -> all defaults
    out += b"MESSAGE=plain\n\n"
    return out


def test_split_and_mapping():
    entries = split_journal_export(_export_bytes())
    assert len(entries) == 3
    assert entries[0]["MESSAGE"] == "service started"
    assert entries[1]["MESSAGE"] == b"\xffbin\x00data".decode(
        "utf-8", "replace")

    r0 = entry_to_row(entries[0])
    assert r0["msg"] == "service started"
    assert (r0["facility"], r0["severity"], r0["pri"]) == (3, 6, 30)
    assert r0["tag"] == "sshd[42]:"
    assert r0["host"] == "web01"
    assert r0["ts"] == pd.Timestamp("2024-01-01 00:00:00")

    r1 = entry_to_row(entries[1])
    assert r1["severity"] == 5            # 2-digit PRIORITY -> NOTICE
    assert r1["facility"] == 1            # no SYSLOG_FACILITY -> USER
    assert r1["tag"] == "app[7]:"         # _PID fallback

    r2 = entry_to_row(entries[2])
    assert (r2["facility"], r2["severity"]) == (1, 5)
    assert r2["tag"] == "journal"
    assert pd.isna(r2["ts"])


def test_read_journal_export_dataset(ray_session, tmp_path):
    p = tmp_path / "cap.export"
    p.write_bytes(_export_bytes())
    df = (read_journal_export([str(p)]).to_pandas()
          .sort_values("msg").reset_index(drop=True))
    assert len(df) == 3
    assert set(df.columns) == {"msg", "pri", "severity", "facility",
                               "tag", "host", "ts", "json"}
    row = df[df["msg"] == "service started"].iloc[0]
    assert row["pri"] == 30 and row["host"] == "web01"
    import json
    all_fields = json.loads(row["json"])
    assert all_fields["SYSLOG_IDENTIFIER"] == "sshd"


# ---------------------------------------------------------------------
# imkmsg analog (contrib/imkmsg/kmsg.c submitSyslog:68-160)

KMSG = (
    "6,1001,123456789,-;usb 1-1: new high-speed USB device\n"
    " SUBSYSTEM=usb\n"
    " DEVICE=+usb:1-1\n"
    "30,1002,123500000,-;audit: type=1400 apparmor=\"DENIED\"\n"
    "3,1003,200000000,c;oops; semicolons; in message\n"
    "garbage line without format\n"
    "12,13\n"                              # truncated -> dropped
)


def test_kmsg_parse():
    from rsyslog_ray.sources.kmsg import split_kmsg

    recs = split_kmsg(KMSG)
    assert len(recs) == 3
    r0 = recs[0]
    assert (r0["pri"], r0["facility"], r0["severity"]) == (6, 0, 6)
    assert r0["seq"] == 1001 and r0["monotonic_us"] == 123456789
    assert r0["msg"] == "usb 1-1: new high-speed USB device"
    import json
    assert json.loads(r0["props"]) == {"SUBSYSTEM": "usb",
                                       "DEVICE": "+usb:1-1"}
    assert (recs[1]["facility"], recs[1]["severity"]) == (3, 6)
    # reference skips to the FIRST ';' — everything after is message
    assert recs[2]["msg"] == "oops; semicolons; in message"


def test_read_kmsg_dataset(ray_session, tmp_path):
    from rsyslog_ray.sources.kmsg import read_kmsg

    p = tmp_path / "kmsg.cap"
    p.write_text(KMSG)
    boot = 1704067200_000000                # 2024-01-01 epoch µs
    df = (read_kmsg([str(p)], boot_epoch_us=boot).to_pandas()
          .sort_values("seq").reset_index(drop=True))
    assert len(df) == 3
    assert df["ts"].iloc[0] == pd.Timestamp("2024-01-01 00:02:03.456789")
    assert df["pri"].tolist() == [6, 30, 3]


def test_omjournal_export_roundtrip(ray_session, tmp_path):
    """omjournal (plugins/omjournal/omjournal.c) template mode writes
    export-format entries that OUR imjournal reader maps back — the
    two halves share the published format, not code.  Binary form
    exercised with an embedded newline."""
    from rsyslog_ray.sources.journal import read_journal_export
    from rsyslog_ray.stages.connectors import (ConnectorSink,
                                               JournalTransport)

    path = tmp_path / "out.export"
    t = JournalTransport(str(path), fields=[
        "message", "priority", "syslog_facility", "syslog_identifier",
        "_hostname", "__realtime_timestamp"])
    sink = ConnectorSink(transport=t, batch_rows=100)
    out = sink(pd.DataFrame({
        "message": ["hello", "line1\nline2", "third"],
        "priority": ["3", "7", "5"],
        "syslog_facility": ["4", "1", "23"],
        "syslog_identifier": ["sshd", "app", "cron"],
        "_hostname": ["h1", "h2", "h3"],
        "__realtime_timestamp": ["1700000000000000"] * 3}))
    t.close()
    assert int(out["rows_delivered"].iloc[0]) == 3

    df = read_journal_export([str(path)]).to_pandas()
    assert len(df) == 3
    assert df["msg"].tolist() == ["hello", "line1\nline2", "third"]
    assert df["severity"].tolist() == [3, 7, 5]
    assert df["facility"].tolist() == [4, 1, 23]
    assert df["tag"].tolist() == ["sshd:", "app:", "cron:"]
    assert df["host"].tolist() == ["h1", "h2", "h3"]
    assert df["ts"].iloc[0] == pd.Timestamp("2023-11-14 22:13:20")


def test_omjournal_non_template_pri_quirk(tmp_path):
    """Non-template mode (omjournal.c:300): the reference sends
    PRIORITY as facility*8|severity — the full PRI, not the 0..7
    journald level.  Mirrored faithfully; the reader therefore falls
    back to its NOTICE default on the multi-digit value, exactly as
    imjournal would on real omjournal output."""
    from rsyslog_ray.sources.journal import (entry_to_row,
                                             split_journal_export)
    from rsyslog_ray.stages.connectors import (ConnectorSink,
                                               JournalTransport)

    path = tmp_path / "nt.export"
    t = JournalTransport(str(path))
    ConnectorSink(transport=t)(pd.DataFrame(
        {"msg": ["boot ok"], "severity": [6], "facility": [0],
         "tag": ["kernel"]}))
    t.close()
    entries = split_journal_export(path.read_bytes())
    assert entries == [{"MESSAGE": "boot ok", "PRIORITY": "6",
                        "SYSLOG_FACILITY": "0",
                        "SYSLOG_IDENTIFIER": "kernel"}]
    # facility 0: PRI == severity, so the single digit survives the
    # reader; a nonzero facility would not (documented quirk)
    row = entry_to_row(entries[0])
    assert (row["severity"], row["facility"]) == (6, 0)


def test_improg_capture(ray_session):
    """improg (contrib/improg/improg.c:380-400): child stdout lines
    become records; confirm_messages paces the child via ACK lines on
    its stdin (c:394-396) — the child below refuses to emit the next
    line until acked, so completion proves the ACKs flowed."""
    import sys

    from rsyslog_ray.sources.prog import ProgCapture

    child = (
        "import sys\n"
        "for i in range(5):\n"
        "    print(f'ev {i}', flush=True)\n"
        "    assert sys.stdin.readline() == 'ACK\\n'\n")
    cap = ProgCapture([sys.executable, "-u", "-c", child],
                      confirm_messages=True)
    df = cap.capture().to_pandas()
    assert df["record"].tolist() == [f"ev {i}" for i in range(5)]
    assert df["seq"].tolist() == list(range(5))

    # unconfirmed mode + max_records bound
    cap = ProgCapture([sys.executable, "-u", "-c",
                       "print('a'); print('b'); print('c')"])
    assert cap.capture(max_records=2).to_pandas()["record"].tolist() \
        == ["a", "b"]


def test_imfifo_capture(ray_session, tmp_path):
    import threading

    from rsyslog_ray.sources.textlog import FifoCapture

    fifo = str(tmp_path / "in.fifo")
    cap = FifoCapture(fifo)

    def writer():
        with open(fifo, "w") as fh:
            for i in range(7):
                fh.write(f"<13>fifo {i}\n")

    th = threading.Thread(target=writer)
    th.start()
    df = cap.capture().to_pandas()
    th.join(timeout=5)
    assert df["record"].tolist() == [f"<13>fifo {i}" for i in range(7)]


def test_ulog_parse_readme_cases():
    """The four README.md sample cases of imtuxedoulog, asserted
    against the documented field splits."""
    from rsyslog_ray.sources.tuxedo import parse_ulog_line

    d = pd.Timestamp("2024-03-07")
    # Case 1: precision 2
    r = parse_ulog_line(
        "105211.70.sic-in2-tmsl1!IMSproxiCSFI4EC.26607818.1.0: "
        "TSAM_CAT:305:4563628752 ; I ;TPSUCCESS service", d)
    assert r["host"] == "sic-in2-tmsl1"
    assert r["procid"] == "IMSproxiCSFI4EC.26607818.1"
    assert r["msg"].startswith("TSAM_CAT:305:4563628752")
    assert r["ts"] == pd.Timestamp("2024-03-07 10:52:11.700000")
    assert r["secfrac_precision"] == 2
    # Case 2: precision 3
    r = parse_ulog_line(
        "011458.705.sic-tst-tmsl1!LMS.5243392.772.3: TSAM_CAT:305: "
        "WARN: (23498) times logon TSAM Plus manager", d)
    assert r["host"] == "sic-tst-tmsl1"
    assert r["procid"] == "LMS.5243392.772"
    assert r["ts"] == pd.Timestamp("2024-03-07 01:14:58.705000")
    assert r["secfrac_precision"] == 3
    # Case 3: ECID
    r = parse_ulog_line(
        "105211.704.sic-in2-tmsl1!IMSproxiCSFI4EC.26607818.1.0: "
        "ECID <000003GBORvD4iopwSXBiW01xG2M00001n>: 4563628752", d)
    assert r["ecid"] == "000003GBORvD4iopwSXBiW01xG2M00001n"
    assert r["structured_data"] == \
        '[ECID="000003GBORvD4iopwSXBiW01xG2M00001n"]'
    assert r["msg"] == "4563628752"
    # Case 4: gtrid then ECID
    r = parse_ulog_line(
        "164313.151.sic-tst-tmsm1!ARTIMPP_UDB.42722.1.0: "
        "gtrid x0 x0 xa0f: ECID <000001833^5pVl3iY00f003UF^>: "
        "TRACE:at", d)
    assert r["ecid"] == "000001833^5pVl3iY00f003UF^"
    assert r["msg"] == "TRACE:at"
    assert r["procid"] == "ARTIMPP_UDB.42722.1"
    # rejects: bad time, no bang
    assert parse_ulog_line("996611.70.h!p.1: x", d) is None
    assert parse_ulog_line("105211.70.no-bang-here: x", d) is None


def test_read_ulog_dataset(ray_session, tmp_path):
    from rsyslog_ray.sources.tuxedo import read_ulog, ulog_date_from_name

    p = tmp_path / "ULOG.030724"
    p.write_text(
        "105211.70.h1!app.10.1.0: CAT:1: first\n"
        "105212.71.h1!app.10.1.0: CAT:2: second\n"
        "garbage line\n")
    assert ulog_date_from_name(str(p)) == pd.Timestamp("2024-03-07")
    df = read_ulog([str(p)]).to_pandas()
    assert len(df) == 2                   # garbage skipped
    assert df["msg"].tolist() == ["CAT:1: first", "CAT:2: second"]
    assert df["ts"].iloc[1] == pd.Timestamp("2024-03-07 10:52:12.710")
