"""utmp record parsing — the login-accounting file omusrmsg walks
(tools/omusrmsg.c:409-441 setutent/getutent loop) to find each user's
terminal.  The on-disk format is the public glibc struct utmp layout
(bits/utmp.h, x86-64: 384-byte records):

    short ut_type; pad2; pid_t ut_pid; char ut_line[32];
    char ut_id[4]; char ut_user[32]; char ut_host[256];
    struct { short e_termination, e_exit; }; int32 ut_session;
    struct { int32 tv_sec, tv_usec; }; int32 ut_addr_v6[4];
    char __glibc_reserved[20];
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

RECORD = struct.Struct("<hxxi32s4s32s256s2hi2i4i20x")
assert RECORD.size == 384

USER_PROCESS = 7  # utmp.h ut_type for an ordinary logged-in session


@dataclass
class UtmpEntry:
    ut_type: int
    ut_pid: int
    ut_line: str
    ut_id: str
    ut_user: str
    ut_host: str


def _cstr(b: bytes) -> str:
    return b.split(b"\0", 1)[0].decode("utf-8", "replace")


def parse_utmp(data: bytes) -> list[UtmpEntry]:
    """All records in a utmp file image (trailing partial ignored)."""
    out = []
    for off in range(0, len(data) - RECORD.size + 1, RECORD.size):
        f = RECORD.unpack_from(data, off)
        out.append(UtmpEntry(f[0], f[1], _cstr(f[2]), _cstr(f[3]),
                             _cstr(f[4]), _cstr(f[5])))
    return out


def pack_utmp_entry(ut_type: int, ut_pid: int, ut_line: str, ut_id: str,
                    ut_user: str, ut_host: str = "") -> bytes:
    """Build one record (test fixtures; byte-compatible with glibc)."""
    return RECORD.pack(ut_type, ut_pid, ut_line.encode()[:32],
                       ut_id.encode()[:4], ut_user.encode()[:32],
                       ut_host.encode()[:256], 0, 0, 0, 0, 0,
                       0, 0, 0, 0)
