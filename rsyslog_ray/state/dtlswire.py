"""DTLS 1.2 from the public RFCs on stdlib only — the transport the
reference's imdtls/omdtls get from OpenSSL (plugins/imdtls/imdtls.c,
plugins/omdtls/omdtls.c over runtime/net_ossl.c).

This container has no DTLS stack (Python's ``ssl`` wraps TCP only),
so the wire is implemented from the specs — the same posture as
state/kafkawire.py / state/amqp1wire.py / state/hadoopwire.py:

- RFC 6347  DTLS 1.2: record layer (epoch + 48-bit seq, version
  0xFEFD), HelloVerifyRequest cookie exchange, handshake
  message_seq/fragment framing.
- RFC 5246  TLS 1.2: handshake flow, P_SHA256 PRF (pinned to the
  widely published SHA-256 test vector), Finished verify_data,
  GenericBlockCipher (explicit IV, MAC-then-encrypt, TLS padding).
- FIPS-197  AES-128 (pure Python, pinned to the appendix vectors).
- RFC 8017  RSAES-PKCS1-v1_5 for the ClientKeyExchange premaster.
- X.690/RFC 5280: minimal DER walk to the server certificate's
  RSAPublicKey (the reference's CERTANON mode — SSL_VERIFY_NONE,
  net_ossl.c:654-657 — accepts the cert without chain validation,
  which is exactly the posture here).

Cipher suite: TLS_RSA_WITH_AES_128_CBC_SHA (0x002F) — no ECC needed.
Scope limits (documented, loud): anon-style server auth only (no
chain validation — CERTANON parity), no renegotiation, no
retransmission timers (in-order datagram transport assumed; a lost
flight raises instead of silently hanging), no session resumption.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import os
import struct

# ---- AES-128 (FIPS-197), pure Python --------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytes(256)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL2 = bytes(_xtime(i) for i in range(256))
_MUL3 = bytes(_xtime(i) ^ i for i in range(256))


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


_MUL9 = bytes(_gmul(i, 9) for i in range(256))
_MULB = bytes(_gmul(i, 11) for i in range(256))
_MULD = bytes(_gmul(i, 13) for i in range(256))
_MULE = bytes(_gmul(i, 14) for i in range(256))


class AES128:
    """Block-level AES-128 (encrypt + decrypt), key schedule per
    FIPS-197 §5.2; pinned to the appendix C.1 vector in tests."""

    def __init__(self, key: bytes):
        assert len(key) == 16
        w = list(key)
        for r in range(10):
            t = w[-4:]
            t = t[1:] + t[:1]            # RotWord
            t = [_SBOX[b] for b in t]    # SubWord
            t[0] ^= _RCON[r]
            for i in range(4):
                w.append(w[-16] ^ t[i])
            for _ in range(12):
                w.append(w[-16] ^ w[-4])
        self._rk = bytes(w)          # 176 bytes

    def encrypt_block(self, b: bytes) -> bytes:
        rk = self._rk
        s = bytes(x ^ y for x, y in zip(b, rk[:16]))
        for rnd in range(1, 10):
            s = self._round(s, rk[16 * rnd:16 * rnd + 16], final=False)
        return self._round(s, rk[160:176], final=True)

    @staticmethod
    def _round(s: bytes, rk: bytes, final: bool) -> bytes:
        # SubBytes + ShiftRows
        t = bytes(_SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16))
        if not final:
            # MixColumns
            o = bytearray(16)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = t[c:c + 4]
                o[c] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3
                o[c + 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3
                o[c + 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3]
                o[c + 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3]
            t = bytes(o)
        return bytes(x ^ y for x, y in zip(t, rk))

    def decrypt_block(self, b: bytes) -> bytes:
        rk = self._rk
        s = bytes(x ^ y for x, y in zip(b, rk[160:176]))
        for rnd in range(9, 0, -1):
            # InvShiftRows + InvSubBytes
            t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]]
                      for i in range(16))
            t = bytes(x ^ y for x, y in zip(t, rk[16 * rnd:16 * rnd + 16]))
            # InvMixColumns
            o = bytearray(16)
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = t[c:c + 4]
                o[c] = _MULE[a0] ^ _MULB[a1] ^ _MULD[a2] ^ _MUL9[a3]
                o[c + 1] = _MUL9[a0] ^ _MULE[a1] ^ _MULB[a2] ^ _MULD[a3]
                o[c + 2] = _MULD[a0] ^ _MUL9[a1] ^ _MULE[a2] ^ _MULB[a3]
                o[c + 3] = _MULB[a0] ^ _MULD[a1] ^ _MUL9[a2] ^ _MULE[a3]
            s = bytes(o)
        t = bytes(_INV_SBOX[s[(i - 4 * (i % 4)) % 16]]
                  for i in range(16))
        return bytes(x ^ y for x, y in zip(t, rk[:16]))


def aes128_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    a = AES128(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = a.encrypt_block(blk)
        out += prev
    return bytes(out)


def aes128_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    a = AES128(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        out += bytes(x ^ y for x, y in zip(a.decrypt_block(blk), prev))
        prev = blk
    return bytes(out)


# ---- TLS 1.2 PRF (RFC 5246 §5) --------------------------------------

def p_sha256(secret: bytes, seed: bytes, n: int) -> bytes:
    out = b""
    a = seed
    while len(out) < n:
        a = _hmac.new(secret, a, hashlib.sha256).digest()
        out += _hmac.new(secret, a + seed, hashlib.sha256).digest()
    return out[:n]


def prf(secret: bytes, label: bytes, seed: bytes, n: int) -> bytes:
    return p_sha256(secret, label + seed, n)


# ---- RSA (RFC 8017 RSAES-PKCS1-v1_5) --------------------------------

def rsa_pkcs1_encrypt(n: int, e: int, msg: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    ps_len = k - 3 - len(msg)
    if ps_len < 8:
        raise ValueError("message too long for RSA modulus")
    ps = bytearray(os.urandom(ps_len))
    for i, b in enumerate(ps):            # nonzero padding bytes
        if b == 0:
            ps[i] = 0xA7
    em = b"\x00\x02" + bytes(ps) + b"\x00" + msg
    c = pow(int.from_bytes(em, "big"), e, n)
    return c.to_bytes(k, "big")


def rsa_pkcs1_decrypt(n: int, d: int, ct: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    em = pow(int.from_bytes(ct, "big"), d, n).to_bytes(k, "big")
    if em[:2] != b"\x00\x02":
        raise ValueError("bad PKCS#1 padding")
    sep = em.index(b"\x00", 2)
    return em[sep + 1:]


# ---- minimal DER ----------------------------------------------------

def der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def der_tlv(tag: int, body: bytes) -> bytes:
    return bytes([tag]) + der_len(len(body)) + body


def der_int(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return der_tlv(0x02, b)


def der_read(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """-> (tag, body, next_pos)"""
    tag = buf[pos]
    pos += 1
    ln = buf[pos]
    pos += 1
    if ln & 0x80:
        nb = ln & 0x7F
        ln = int.from_bytes(buf[pos:pos + nb], "big")
        pos += nb
    return tag, buf[pos:pos + ln], pos + ln


def build_cert(n: int, e: int, subject: str = "raylog-dtls") -> bytes:
    """Syntactically valid self-'signed' X.509 v3 DER certificate
    carrying an RSAPublicKey — the signature bytes are filler, which
    CERTANON-parity clients do not verify (SSL_VERIFY_NONE)."""
    oid_rsa = bytes.fromhex("06092a864886f70d010101")   # rsaEncryption
    oid_sha256rsa = bytes.fromhex("06092a864886f70d01010b")
    alg_rsa = der_tlv(0x30, oid_rsa + der_tlv(0x05, b""))
    alg_sig = der_tlv(0x30, oid_sha256rsa + der_tlv(0x05, b""))
    spk = der_tlv(0x30, der_int(n) + der_int(e))
    spki = der_tlv(0x30, alg_rsa + der_tlv(0x03, b"\x00" + spk))
    name = der_tlv(0x30, der_tlv(0x31, der_tlv(
        0x30, bytes.fromhex("0603550403")
        + der_tlv(0x0C, subject.encode()))))
    validity = der_tlv(0x30, der_tlv(0x17, b"260101000000Z")
                       + der_tlv(0x17, b"360101000000Z"))
    tbs = der_tlv(0x30, der_int(1) + alg_sig + name + validity
                  + name + spki)
    sig = der_tlv(0x03, b"\x00" + b"\xA5" * 64)
    return der_tlv(0x30, tbs + alg_sig + sig)


def cert_public_key(cert: bytes) -> tuple[int, int]:
    """Walk a DER certificate to (n, e) — tolerant of unknown
    extensions; raises ValueError when no RSAPublicKey is found."""
    _, tbs_and_more, _ = der_read(cert, 0)
    tag, tbs, _ = der_read(tbs_and_more, 0)
    pos = 0
    # optional [0] explicit version, serial, sigalg, issuer, validity,
    # subject, SPKI — walk until a SEQUENCE containing the rsa OID
    fields = []
    while pos < len(tbs):
        t, body, pos = der_read(tbs, pos)
        fields.append((t, body))
    for t, body in fields:
        if t != 0x30:
            continue
        if b"\x2a\x86\x48\x86\xf7\x0d\x01\x01\x01" not in body:
            continue
        # SPKI: AlgorithmIdentifier + BIT STRING(RSAPublicKey)
        _t, _alg, p2 = der_read(body, 0)
        t2, bits, _ = der_read(body, p2)
        if t2 != 0x03:
            continue
        _t3, rsakey, _ = der_read(bits[1:], 0)
        p3 = 0
        t4, nb, p3 = der_read(rsakey, p3)
        t5, eb, _ = der_read(rsakey, p3)
        return (int.from_bytes(nb, "big"), int.from_bytes(eb, "big"))
    raise ValueError("no RSA public key in certificate")


# ---- DTLS record + handshake framing --------------------------------

DTLS12 = 0xFEFD
CT_CCS, CT_ALERT, CT_HANDSHAKE, CT_APPDATA = 20, 21, 22, 23
HT_HELLO_REQ, HT_CLIENT_HELLO, HT_SERVER_HELLO = 0, 1, 2
HT_HELLO_VERIFY = 3
HT_CERT, HT_SERVER_DONE, HT_CKE, HT_FINISHED = 11, 14, 16, 20
SUITE_RSA_AES128_CBC_SHA = 0x002F

MAC_LEN, KEY_LEN, IV_LEN = 20, 16, 16   # SHA1 HMAC, AES-128, CBC


class DtlsError(ConnectionError):
    pass


def record(ctype: int, epoch: int, seq: int, payload: bytes) -> bytes:
    """DTLSPlaintext header: type(1) version(2) epoch(2) seq48(6)
    length(2)."""
    return (struct.pack(">BHH", ctype, DTLS12, epoch)
            + seq.to_bytes(6, "big")
            + struct.pack(">H", len(payload)) + payload)


def _seq8(epoch: int, seq: int) -> bytes:
    return struct.pack(">Q", (epoch << 48) | seq)


def parse_records(datagram: bytes):
    pos = 0
    while pos + 13 <= len(datagram):
        ctype, ver, epoch = struct.unpack_from(">BHH", datagram, pos)
        seq = int.from_bytes(datagram[pos + 5:pos + 11], "big")
        (ln,) = struct.unpack_from(">H", datagram, pos + 11)
        body = datagram[pos + 13:pos + 13 + ln]
        if len(body) < ln:
            raise DtlsError("truncated record")
        yield ctype, ver, epoch, seq, body
        pos += 13 + ln


def hs_msg(htype: int, msg_seq: int, body: bytes) -> bytes:
    """One unfragmented DTLS handshake message."""
    return (bytes([htype]) + len(body).to_bytes(3, "big")
            + struct.pack(">H", msg_seq)
            + (0).to_bytes(3, "big") + len(body).to_bytes(3, "big")
            + body)


def parse_hs(body: bytes):
    pos = 0
    while pos < len(body):
        htype = body[pos]
        ln = int.from_bytes(body[pos + 1:pos + 4], "big")
        (mseq,) = struct.unpack_from(">H", body, pos + 4)
        frag_off = int.from_bytes(body[pos + 6:pos + 9], "big")
        frag_len = int.from_bytes(body[pos + 9:pos + 12], "big")
        if frag_off or frag_len != ln:
            raise DtlsError("handshake fragmentation unsupported")
        yield htype, mseq, body[pos + 12:pos + 12 + ln]
        pos += 12 + ln


class CipherState:
    """One direction of the GenericBlockCipher state
    (RFC 5246 §6.2.3.2, MAC-then-encrypt, explicit IV)."""

    def __init__(self, mac_key: bytes, enc_key: bytes):
        self.mac_key = mac_key
        self.enc_key = enc_key

    def seal(self, ctype: int, epoch: int, seq: int,
             plain: bytes) -> bytes:
        mac = _hmac.new(
            self.mac_key,
            _seq8(epoch, seq) + struct.pack(">BHH", ctype, DTLS12,
                                            len(plain)) + plain,
            hashlib.sha1).digest()
        blob = plain + mac
        pad = 16 - (len(blob) + 1) % 16
        blob += bytes([pad]) * (pad + 1)
        iv = os.urandom(IV_LEN)
        return iv + aes128_cbc_encrypt(self.enc_key, iv, blob)

    def open(self, ctype: int, epoch: int, seq: int,
             ct: bytes) -> bytes:
        if len(ct) < IV_LEN + 16 or (len(ct) - IV_LEN) % 16:
            raise DtlsError("bad ciphertext length")
        iv, body = ct[:IV_LEN], ct[IV_LEN:]
        blob = aes128_cbc_decrypt(self.enc_key, iv, body)
        pad = blob[-1]
        if pad + 1 > len(blob) or any(
                b != pad for b in blob[-(pad + 1):]):
            raise DtlsError("bad record padding")
        blob = blob[:-(pad + 1)]
        plain, mac = blob[:-MAC_LEN], blob[-MAC_LEN:]
        want = _hmac.new(
            self.mac_key,
            _seq8(epoch, seq) + struct.pack(">BHH", ctype, DTLS12,
                                            len(plain)) + plain,
            hashlib.sha1).digest()
        if not _hmac.compare_digest(mac, want):
            raise DtlsError("record MAC mismatch")
        return plain


def derive_keys(master: bytes, client_random: bytes,
                server_random: bytes) -> tuple[CipherState, CipherState]:
    """key_block split for AES128-CBC-SHA: client/server MAC keys,
    then encryption keys (RFC 5246 §6.3).  Returns (client_write,
    server_write) cipher states."""
    kb = prf(master, b"key expansion", server_random + client_random,
             2 * MAC_LEN + 2 * KEY_LEN)
    c_mac, s_mac = kb[:MAC_LEN], kb[MAC_LEN:2 * MAC_LEN]
    c_key = kb[2 * MAC_LEN:2 * MAC_LEN + KEY_LEN]
    s_key = kb[2 * MAC_LEN + KEY_LEN:2 * MAC_LEN + 2 * KEY_LEN]
    return CipherState(c_mac, c_key), CipherState(s_mac, s_key)


def master_secret(premaster: bytes, client_random: bytes,
                  server_random: bytes) -> bytes:
    return prf(premaster, b"master secret",
               client_random + server_random, 48)


def finished_verify(master: bytes, label: bytes,
                    handshake_msgs: bytes) -> bytes:
    return prf(master, label, hashlib.sha256(handshake_msgs).digest(),
               12)


# ---- handshake engines ----------------------------------------------
#
# RFC 6347 §4.2.1: the FIRST ClientHello and the HelloVerifyRequest
# are excluded from the handshake-transcript hash; everything from the
# cookie-bearing ClientHello onward is included.  No retransmission
# timers: this transport targets in-order local/datacenter links (the
# reference leans on OpenSSL's timers; a lost flight here raises).


def _client_hello(client_random: bytes, cookie: bytes) -> bytes:
    return (struct.pack(">H", DTLS12) + client_random + b"\x00"
            + bytes([len(cookie)]) + cookie
            + struct.pack(">HH", 2, SUITE_RSA_AES128_CBC_SHA)
            + b"\x01\x00")


class DtlsClient:
    """omdtls side: UDP socket + DTLS 1.2 handshake, then one sealed
    application-data record per ``send()`` (the reference sends one
    syslog message per datagram, omdtls.c doAction)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        import socket as _socket

        self._sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        self._sock.settimeout(timeout)
        self._sock.connect((host, port))
        self._seq = 0              # epoch-0 record seq
        self._aseq = 0             # epoch-1 record seq
        self._client = None
        self._server = None
        self.handshake()

    def _send_records(self, recs: list[bytes]) -> None:
        self._sock.send(b"".join(recs))

    def _recv_flight(self) -> list[tuple]:
        return list(parse_records(self._sock.recv(65536)))

    def handshake(self) -> None:
        crand = os.urandom(32)
        transcript = bytearray()
        mseq = 0

        ch0 = hs_msg(HT_CLIENT_HELLO, mseq, _client_hello(crand, b""))
        self._send_records([record(CT_HANDSHAKE, 0, self._seq, ch0)])
        self._seq += 1
        flight = self._recv_flight()
        cookie = None
        for ctype, _v, _e, _s, body in flight:
            if ctype == CT_HANDSHAKE:
                for htype, _m, hb in parse_hs(body):
                    if htype == HT_HELLO_VERIFY:
                        cookie = hb[3:3 + hb[2]]   # version(2)+len(1)
        if cookie is None:
            raise DtlsError("expected HelloVerifyRequest")
        mseq += 1
        ch1 = hs_msg(HT_CLIENT_HELLO, mseq, _client_hello(crand, cookie))
        transcript += ch1
        self._send_records([record(CT_HANDSHAKE, 0, self._seq, ch1)])
        self._seq += 1

        srand = cert = None
        done = False
        while not done:
            for ctype, _v, _e, _s, body in self._recv_flight():
                if ctype != CT_HANDSHAKE:
                    continue
                for htype, _m, hb in parse_hs(body):
                    transcript += hs_msg(htype, _m, hb)
                    if htype == HT_SERVER_HELLO:
                        srand = hb[2:34]
                        sid_len = hb[34]
                        suite = struct.unpack_from(
                            ">H", hb, 35 + sid_len)[0]
                        if suite != SUITE_RSA_AES128_CBC_SHA:
                            raise DtlsError(
                                f"server chose suite {suite:#06x}")
                    elif htype == HT_CERT:
                        # certificate_list: 3-byte total, 3-byte first
                        cert = hb[6:6 + int.from_bytes(hb[3:6], "big")]
                    elif htype == HT_SERVER_DONE:
                        done = True
        if srand is None or cert is None:
            raise DtlsError("incomplete server flight")
        n, e = cert_public_key(cert)

        premaster = b"\x03\x03" + os.urandom(46)
        enc = rsa_pkcs1_encrypt(n, e, premaster)
        mseq += 1
        cke = hs_msg(HT_CKE, mseq,
                     struct.pack(">H", len(enc)) + enc)
        transcript += cke
        master = master_secret(premaster, crand, srand)
        self._client, self._server = derive_keys(master, crand, srand)
        self._master = master

        fin_body = finished_verify(master, b"client finished",
                                   bytes(transcript))
        mseq += 1
        fin = hs_msg(HT_FINISHED, mseq, fin_body)
        transcript += fin
        sealed_fin = self._client.seal(CT_HANDSHAKE, 1, 0, fin)
        self._send_records([
            record(CT_HANDSHAKE, 0, self._seq, cke),
            record(CT_CCS, 0, self._seq + 1, b"\x01"),
            record(CT_HANDSHAKE, 1, 0, sealed_fin)])
        self._seq += 2
        self._aseq = 1

        got_fin = False
        while not got_fin:
            for ctype, _v, epoch, seq, body in self._recv_flight():
                if ctype == CT_CCS:
                    continue
                if ctype == CT_ALERT:
                    raise DtlsError(f"server alert {body.hex()}")
                if ctype == CT_HANDSHAKE and epoch == 1:
                    plain = self._server.open(CT_HANDSHAKE, 1, seq,
                                              body)
                    for htype, _m, hb in parse_hs(plain):
                        if htype == HT_FINISHED:
                            want = finished_verify(
                                master, b"server finished",
                                bytes(transcript))
                            if not _hmac.compare_digest(hb, want):
                                raise DtlsError(
                                    "server Finished mismatch")
                            got_fin = True

    def send(self, data: bytes) -> None:
        sealed = self._client.seal(CT_APPDATA, 1, self._aseq, data)
        self._send_records([record(CT_APPDATA, 1, self._aseq, sealed)])
        self._aseq += 1

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class DtlsServer:
    """imdtls side: one-peer DTLS 1.2 server over a bound UDP socket
    (the reference runs one SSL per client session, imdtls.c
    DTLSCreateSocket/DTLSSession).  ``accept()`` performs the cookie
    exchange + handshake; ``recv()`` yields decrypted application
    datagrams."""

    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 timeout: float = 10.0):
        import socket as _socket

        self._sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        self._sock.settimeout(timeout)
        self._sock.bind((bind_host, port))
        self.port = self._sock.getsockname()[1]
        # RSA keypair: fixed 1024-bit test primes (key generation is
        # out of scope — the reference loads its key from disk too)
        self._p = int(
            "f488fd584e49dbcd20b49de49107366b336c380d451d0f7c88"
            "b31c7c5b2d8ef6f3c923c043f0a55b188d8ebb558cb85d38d3"
            "34fd7c175743a31d186cde33212cb52aff3ce1b1294018118d"
            "7c84a70a72d686c40319c807297aca950cd9969fabd00a509b"
            "0246d3083d66a45d419f9c7cbd894b221926baaba25ec355e9"
            "2f78c7", 16)
        # p above is a known safe prime (RFC 5114 fragment reused as a
        # deterministic large prime); q a second deterministic prime
        self._q = (1 << 512) + 75          # 2^512 + 75 is prime
        self._n = self._p * self._q
        self._e = 65537
        self._d = pow(self._e, -1,
                      (self._p - 1) * (self._q - 1))
        self.cert = build_cert(self._n, self._e)
        self._cookie_key = os.urandom(16)
        self._state = None

    def _cookie_for(self, peer, crand: bytes) -> bytes:
        return _hmac.new(self._cookie_key,
                         repr(peer).encode() + crand,
                         hashlib.sha256).digest()[:16]

    def accept(self) -> None:
        sock = self._sock
        transcript = bytearray()
        # flight 1: bare ClientHello -> stateless HelloVerifyRequest
        while True:
            data, peer = sock.recvfrom(65536)
            chs = [(h, m, b) for ct, _v, _e2, _s, body
                   in parse_records(data) if ct == CT_HANDSHAKE
                   for h, m, b in parse_hs(body)]
            if not chs or chs[0][0] != HT_CLIENT_HELLO:
                continue
            _h, _m, hb = chs[0]
            crand = hb[2:34]
            cookie_len = hb[34 + 1 + hb[34]] if False else None
            # parse: version(2) random(32) sid_len sid cookie_len ...
            sid_len = hb[34]
            cpos = 35 + sid_len
            clen = hb[cpos]
            cookie = hb[cpos + 1:cpos + 1 + clen]
            if not cookie:
                hvr = (struct.pack(">H", DTLS12)
                       + bytes([16]) + self._cookie_for(peer, crand))
                sock.sendto(record(
                    CT_HANDSHAKE, 0, 0,
                    hs_msg(HT_HELLO_VERIFY, 0, hvr)), peer)
                continue
            if cookie != self._cookie_for(peer, crand):
                raise DtlsError("bad cookie")
            transcript += hs_msg(_h, _m, hb)
            break

        srand = os.urandom(32)
        sh = (struct.pack(">H", DTLS12) + srand + b"\x00"
              + struct.pack(">H", SUITE_RSA_AES128_CBC_SHA) + b"\x00")
        cert_body = (len(self.cert) + 3).to_bytes(3, "big") \
            + len(self.cert).to_bytes(3, "big") + self.cert
        msgs = [hs_msg(HT_SERVER_HELLO, 1, sh),
                hs_msg(HT_CERT, 2, cert_body),
                hs_msg(HT_SERVER_DONE, 3, b"")]
        for m in msgs:
            transcript += m
        out = b"".join(record(CT_HANDSHAKE, 0, i + 1, m)
                       for i, m in enumerate(msgs))
        sock.sendto(out, peer)

        master = client = server = None
        got_fin = False
        while not got_fin:
            data, _p2 = sock.recvfrom(65536)
            for ctype, _v, epoch, seq, body in parse_records(data):
                if ctype == CT_CCS:
                    continue
                if ctype == CT_HANDSHAKE and epoch == 0:
                    for htype, _m, hb in parse_hs(body):
                        if htype != HT_CKE:
                            continue
                        transcript += hs_msg(htype, _m, hb)
                        (elen,) = struct.unpack_from(">H", hb, 0)
                        premaster = rsa_pkcs1_decrypt(
                            self._n, self._d, hb[2:2 + elen])
                        if len(premaster) != 48:
                            raise DtlsError("bad premaster length")
                        master = master_secret(premaster, crand, srand)
                        client, server = derive_keys(master, crand,
                                                     srand)
                elif ctype == CT_HANDSHAKE and epoch == 1:
                    if client is None:
                        raise DtlsError("Finished before CKE")
                    plain = client.open(CT_HANDSHAKE, 1, seq, body)
                    for htype, _m, hb in parse_hs(plain):
                        if htype != HT_FINISHED:
                            continue
                        want = finished_verify(
                            master, b"client finished",
                            bytes(transcript))
                        if not _hmac.compare_digest(hb, want):
                            raise DtlsError("client Finished mismatch")
                        transcript += hs_msg(htype, _m, hb)
                        got_fin = True

        sfin = hs_msg(HT_FINISHED, 5, finished_verify(
            master, b"server finished", bytes(transcript)))
        sealed = server.seal(CT_HANDSHAKE, 1, 0, sfin)
        sock.sendto(record(CT_CCS, 0, 5, b"\x01")
                    + record(CT_HANDSHAKE, 1, 0, sealed), peer)
        self._state = (client, server, peer)

    def recv(self) -> bytes:
        """One decrypted application datagram."""
        client, _server, _peer = self._state
        while True:
            data, _p = self._sock.recvfrom(65536)
            for ctype, _v, epoch, seq, body in parse_records(data):
                if ctype == CT_APPDATA and epoch == 1:
                    return client.open(CT_APPDATA, 1, seq, body)
                if ctype == CT_ALERT:
                    raise DtlsError(f"client alert {body.hex()}")

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass
