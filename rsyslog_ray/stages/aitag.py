"""mmaitag + mmdarwin — external classifier/scorer enrichments, over
their REAL protocols.

mmaitag (plugins/mmaitag/mmaitag.c, ai_provider_gemini.c): classify
each message through a pluggable provider and store the label in a
message variable (default ``.aitag``).  The Gemini provider POSTs a
``generateContent`` JSON body per message and extracts
``candidates[0].content.parts[0].text``; anything missing falls back
to the label "REGULAR" (gemini_classify_batch, ai_provider_gemini.c:
137-253).  Providers here: `GeminiHttpProvider` (that exact HTTP
protocol against a configurable endpoint — no external network exists
in this environment, so tests run it against a localhost double) and
`StaticProvider` (= ai_provider_gemini_mock.c).

mmdarwin (contrib/mmdarwin/mmdarwin.c + protocol.h): send each
message's selected fields to a Darwin filter over an AF_UNIX stream
socket as ``darwin_filter_packet_t`` header + JSON body, read the
response packet and store ``certitude_list[0]`` under the configured
key (doAction, mmdarwin.c:776-818).
"""

from __future__ import annotations

import json
import struct

import pandas as pd


class StaticProvider:
    """ai_provider_gemini_mock.c — constant label, no I/O."""

    def __init__(self, tag: str = "REGULAR"):
        self.tag = tag

    def classify_batch(self, msgs: list[str]) -> list[str]:
        return [self.tag] * len(msgs)


class GeminiHttpProvider:
    """The Gemini ``generateContent`` wire shape over a persistent
    stdlib HTTP connection.  ``host``/``port`` replace the hardcoded
    googleapis endpoint (the reference builds
    ``/v1beta/models/{model}:generateContent``; same path here) so the
    protocol is testable against a local double."""

    DEFAULT_PROMPT = (
        "Task: Classify the log message that follows. "
        "Output: Exactly one label from this list: NOISE, REGULAR, "
        "IMPORTANT, CRITICAL. "
        "Restrictions: No other text, explanations, formatting, or "
        "newline characters.")

    def __init__(self, host: str, port: int, apikey: str,
                 model: str = "gemini-2.0-flash",
                 prompt: str | None = None):
        self.host, self.port = host, port
        self.apikey = apikey
        self.model = model
        self.prompt = prompt if prompt is not None else self.DEFAULT_PROMPT
        self._conn = None

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=10)
        return self._conn

    def _classify_one(self, msg: str) -> str:
        body = json.dumps({"contents": [{
            "role": "user",
            "parts": [{"text": f"{self.prompt}\n{msg}"}]}]})
        try:
            c = self._connected()
            c.request(
                "POST", f"/v1beta/models/{self.model}:generateContent",
                body=body.encode(),
                headers={"Content-Type": "application/json",
                         "x-goog-api-key": self.apikey})
            resp = c.getresponse()
            data = resp.read()
            if resp.status != 200:
                return "REGULAR"       # reference: non-200 -> REGULAR
        except OSError:
            if self._conn is not None:
                self._conn.close()
            self._conn = None
            return "REGULAR"
        try:
            parsed = json.loads(data)
            text = parsed["candidates"][0]["content"]["parts"][0]["text"]
        except (ValueError, LookupError, TypeError):
            return "REGULAR"
        return text.rstrip()           # strip_trailing_whitespace

    def classify_batch(self, msgs: list[str]) -> list[str]:
        return [self._classify_one(m) for m in msgs]


class AiTagStage:
    """Actor-pool stage: provider built once per actor, per-batch
    DISTINCT-message fan-in with a bounded per-actor memo (identical
    log lines — the overwhelmingly common case in syslog — classify
    once), label lands in the ``tag`` column (mmaitag's ``.aitag``
    message variable)."""

    def __init__(self, provider=None, provider_kwargs: dict | None = None,
                 input_col: str = "msg", tag: str = "aitag",
                 memo_cap: int = 100_000):
        if provider is None:
            self.provider = StaticProvider()
        elif isinstance(provider, type):
            self.provider = provider(**(provider_kwargs or {}))
        else:
            self.provider = provider
        self.input_col = input_col
        self.tag = tag
        self.memo_cap = memo_cap
        self._memo: dict[str, str] = {}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        msgs = df[self.input_col].fillna("").astype(str)
        todo = [m for m in dict.fromkeys(msgs) if m not in self._memo]
        if todo:
            labels = self.provider.classify_batch(todo)
            self._memo.update(zip(todo, labels))
            while len(self._memo) > self.memo_cap:
                self._memo.pop(next(iter(self._memo)))
        out = df.copy()
        out[self.tag] = [self._memo[m] for m in msgs]
        return out


# ---------------------------------------------------------------------------
# mmdarwin
# ---------------------------------------------------------------------------

# darwin_filter_packet_t (contrib/mmdarwin/protocol.h:50-60) on LP64:
#   enum type(4) + enum response(4) + long filter_code(8) +
#   size_t body_size(8) + evt_id[16] + size_t certitude_size(8) +
#   unsigned certitude_list[1](4) + 4 pad = 56 bytes
DARWIN_PACKET = struct.Struct("<iiqq16sqI4x")
DARWIN_PACKET_OTHER = 0
DARWIN_RESPONSE_SEND_BACK = 1


class DarwinStage:
    """mmdarwin as an actor-pool stage: one AF_UNIX stream connection
    per actor (openSocket, mmdarwin.c:145-175, with the reference's
    ``socket_max_use`` reconnect cadence), per row send header+body
    (``fields`` -> JSON array, getDataFromMsg semantics: ``!``/``.``
    prefixed keys resolve from columns, literals pass through), read
    the response packet, store ``certitude_list[0]`` in ``key``."""

    def __init__(self, sockpath: str, fields: list[str],
                 key: str = "certitude", filter_code: int = 0x636F6D70,
                 socket_max_use: int = 0):
        self.sockpath = sockpath
        self.fields = fields
        self.key = key
        self.filter_code = filter_code
        self.socket_max_use = socket_max_use
        self._sock = None
        self._uses = 0

    def _connected(self):
        import socket as _socket

        if self._sock is None:
            self._sock = _socket.socket(_socket.AF_UNIX,
                                        _socket.SOCK_STREAM)
            self._sock.settimeout(10)
            self._sock.connect(self.sockpath)
            self._uses = 0
        return self._sock

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def _recv_exact(self, s, n: int) -> bytes:
        out = b""
        while len(out) < n:
            c = s.recv(n - len(out))
            if not c:
                raise ConnectionError("darwin peer closed")
            out += c
        return out

    def _score_one(self, row: dict) -> int:
        body = json.dumps(
            [str(row.get(f[1:], "")) if f[:1] in "!." else f
             for f in self.fields]).encode()
        s = self._connected()
        hdr = DARWIN_PACKET.pack(DARWIN_PACKET_OTHER,
                                 DARWIN_RESPONSE_SEND_BACK,
                                 self.filter_code, len(body),
                                 b"\x00" * 16, 1, 0)
        s.sendall(hdr + body)
        resp = self._recv_exact(s, DARWIN_PACKET.size)
        certitude = DARWIN_PACKET.unpack(resp)[6]
        self._uses += 1
        if self.socket_max_use and self._uses >= self.socket_max_use:
            self.close()               # socket_max_use reconnect cadence
        return certitude

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        scores = []
        for row in df.to_dict("records"):
            try:
                scores.append(self._score_one(row))
            except OSError:
                self.close()
                raise                  # -> stage retry / suspend upstream
        out[self.key] = pd.array(scores, dtype="int64")
        return out
