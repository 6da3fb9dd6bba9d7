"""DTLS 1.2 stack (state/dtlswire.py): crypto primitives pinned to
PUBLISHED vectors (FIPS-197 AES, RFC 5246 PRF), record seal/open
semantics, then a full client↔server handshake + application data
over a real UDP socket pair."""

import threading

import pytest

from rsyslog_ray.state.dtlswire import (AES128, CipherState, DtlsClient,
                                        DtlsError, DtlsServer,
                                        aes128_cbc_decrypt,
                                        aes128_cbc_encrypt, build_cert,
                                        cert_public_key, prf,
                                        rsa_pkcs1_decrypt,
                                        rsa_pkcs1_encrypt)


def test_aes128_fips197_vectors():
    """FIPS-197 appendix C.1: the canonical AES-128 vector."""
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = AES128(key).encrypt_block(pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert AES128(key).decrypt_block(ct) == pt
    # appendix B (the worked example key/plaintext)
    key2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert AES128(key2).encrypt_block(pt2).hex() == \
        "3925841d02dc09fbdc118597196a0b32"


def test_tls12_prf_published_vector():
    """The widely published TLS 1.2 P_SHA256 test vector."""
    secret = bytes.fromhex("9bbe436ba940f017b17652849a71db35")
    seed = bytes.fromhex("a0ba9f936cda311827a6f796ffd5198c")
    out = prf(secret, b"test label", seed, 100)
    assert out.hex() == (
        "e3f229ba727be17b8d122620557cd453c2aab21d07c3d49532"
        "9b52d4e61edb5a6b301791e90d35c9c9a46b4e14baf9af0fa0"
        "22f7077def17abfd3797c0564bab4fbc91666e9def9b97fce3"
        "4f796789baa48082d122ee42c5a72e5a5110fff70187347b66")


def test_cbc_and_rsa_roundtrip():
    key, iv = bytes(16), bytes(range(16))
    data = bytes(range(256)) * 2        # multiple of 16
    assert aes128_cbc_decrypt(
        key, iv, aes128_cbc_encrypt(key, iv, data)) == data
    p = (1 << 512) + 75                 # prime
    q = (1 << 511) + 111                # prime
    n, e = p * q, 65537
    d = pow(e, -1, (p - 1) * (q - 1))
    msg = b"\x03\x03" + bytes(46)
    assert rsa_pkcs1_decrypt(n, d, rsa_pkcs1_encrypt(n, e, msg)) == msg


def test_cert_der_roundtrip():
    """build_cert emits a DER structure the minimal X.509 walk can
    recover the RSA key from."""
    n, e = 0xC0FFEE * (1 << 500) + 12345, 65537
    cert = build_cert(n, e, subject="unit-test")
    assert cert_public_key(cert) == (n, e)


def test_record_seal_open_and_tamper():
    """GenericBlockCipher: seal/open round-trip binds (type, epoch,
    seq); any tamper or replayed seq fails the MAC."""
    cs = CipherState(b"m" * 20, b"k" * 16)
    sealed = cs.seal(23, 1, 7, b"hello dtls")
    assert cs.open(23, 1, 7, sealed) == b"hello dtls"
    with pytest.raises(DtlsError):
        cs.open(23, 1, 8, sealed)            # wrong seq
    with pytest.raises(DtlsError):
        cs.open(22, 1, 7, sealed)            # wrong type
    bad = bytearray(sealed)
    bad[-1] ^= 0xFF
    with pytest.raises(DtlsError):
        cs.open(23, 1, 7, bytes(bad))        # flipped ciphertext


def test_dtls_handshake_and_datagrams():
    """Full flow over a real UDP socket pair: cookie exchange,
    RSA key exchange, Finished verification both ways, then sealed
    application datagrams decrypt server-side in order."""
    srv = DtlsServer()
    got = []
    err = []

    def run():
        try:
            srv.accept()
            for _ in range(3):
                got.append(srv.recv())
        except Exception as ex:      # surfaced by the main thread
            err.append(ex)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    cli = DtlsClient("127.0.0.1", srv.port)
    msgs = [b"<134>1 - h a p m - one", b"two \xf0\x9f\x8c\x8d utf8",
            b"x" * 900]
    for m in msgs:
        cli.send(m)
    t.join(timeout=10)
    cli.close()
    srv.close()
    assert not err, err
    assert got == msgs


def test_imdtls_omdtls_pair(ray_session):
    """The input/output pair over the in-repo stack: DtlsCapture
    (imdtls) accepts a session, DtlsTransport (omdtls) delivers one
    sealed datagram per rendered row, the capture Dataset holds the
    decrypted messages."""
    import json as _json
    import pandas as pd

    from rsyslog_ray.sources.textlog import DtlsCapture
    from rsyslog_ray.stages.connectors import ConnectorSink, DtlsTransport

    cap = DtlsCapture()
    out = {}
    err = []

    def server():
        try:
            out["ds"] = cap.capture(5)
        except Exception as ex:
            err.append(ex)

    t = threading.Thread(target=server, daemon=True)
    t.start()

    tr = DtlsTransport("127.0.0.1", cap.port)
    sink = ConnectorSink(transport=tr, batch_rows=2)
    df = pd.DataFrame({"msg": [f"event {i}" for i in range(5)],
                       "sev": list(range(5))})
    acct = sink(df)
    assert int(acct["rows_delivered"].sum()) == 5
    t.join(timeout=15)
    tr.close()
    assert not err, err
    got = out["ds"].to_pandas()
    assert len(got) == 5
    recs = [_json.loads(r) for r in got["record"]]
    assert [r["msg"] for r in recs] == [f"event {i}" for i in range(5)]
    assert (got["peer"] == "127.0.0.1").all()


def test_record_layer_fuzz_fails_closed():
    """Mutated/truncated/garbage datagrams must parse to records or
    raise DtlsError, and sealed-record mutations must fail the MAC
    with DtlsError — never IndexError/struct.error into a source."""
    import os
    import random

    from rsyslog_ray.state.dtlswire import (CT_APPDATA, parse_records,
                                            record)

    rng = random.Random(41)
    cs = CipherState(os.urandom(20), os.urandom(16))
    sealed = cs.seal(CT_APPDATA, 1, 3, b"payload under test")
    wire = record(CT_APPDATA, 1, 3, sealed)
    for trial in range(300):
        src = bytearray(wire)
        op = trial % 3
        if op == 0:
            for _ in range(rng.randint(1, 4)):
                src[rng.randrange(len(src))] ^= rng.randint(1, 255)
        elif op == 1:
            src = src[:rng.randrange(len(src))]
        else:
            src = bytearray(os.urandom(rng.randint(0, 200)))
        try:
            for ctype, _v, epoch, seq, body in parse_records(bytes(src)):
                if ctype == CT_APPDATA:
                    try:
                        cs.open(CT_APPDATA, epoch, seq, body)
                    except DtlsError:
                        pass
        except DtlsError:
            pass
    # untouched record still opens
    for ctype, _v, epoch, seq, body in parse_records(wire):
        assert cs.open(ctype, epoch, seq, body) == b"payload under test"
