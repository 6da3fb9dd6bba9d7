"""mmexternal analog — per-record transforms by an external program.

Reference: plugins/mmexternal/mmexternal.c — rsyslog spawns the
configured binary once per worker (openPipe, mmexternal.c:517-),
writes one JSON-encoded message per line to the child's stdin and, in
``output=json`` mode (mmexternal.c:332-), reads one JSON line back
whose keys update the message's ``$!`` tree.

Ray re-expression: an ACTOR-POOL stage — the child process is spawned
once per actor in ``__init__`` (the model-load slot), and each batch
streams through the pipe.  A writer thread feeds stdin while the main
thread reads stdout so a whole batch can be in flight without
pipe-buffer deadlock (the reference writes/reads per message under its
worker lock; batching the protocol is the batch-engine win).  If the
child dies mid-batch it is respawned once and the batch retried — the
reference's EPIPE-respawn policy.
"""

from __future__ import annotations

import json
import subprocess
import threading

import pandas as pd


class ExternalTransformStage:
    """``ds.map_batches(ExternalTransformStage,
    fn_constructor_kwargs=dict(argv=[...], input_cols=[...]),
    batch_format="pandas", concurrency=(1, N))``

    ``argv``        — the external program (spawned once per actor);
    ``input_cols``  — columns serialized into each JSON request line;
    returned JSON keys become/overwrite output columns."""

    def __init__(self, argv: list[str], input_cols: list[str]):
        self.argv = list(argv)
        self.input_cols = list(input_cols)
        self._proc: subprocess.Popen | None = None
        self._spawn()

    def _spawn(self) -> None:
        self._proc = subprocess.Popen(
            self.argv, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True)

    def _round_trip(self, lines: list[str]) -> list[str]:
        p = self._proc
        out: list[str] = []

        def feed():
            try:
                for ln in lines:
                    p.stdin.write(ln + "\n")
                p.stdin.flush()
            except BrokenPipeError:
                pass

        t = threading.Thread(target=feed)
        t.start()
        for _ in range(len(lines)):
            ln = p.stdout.readline()
            if not ln:
                break
            out.append(ln)
        t.join()
        return out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        reqs = [json.dumps(rec, default=str) for rec in
                df[self.input_cols].to_dict("records")]
        resp = self._round_trip(reqs)
        if len(resp) != len(reqs):          # child died mid-batch:
            self._proc.kill()               # respawn once, retry batch
            self._spawn()
            resp = self._round_trip(reqs)
            if len(resp) != len(reqs):
                raise RuntimeError(
                    f"external program {self.argv[0]!r} failed twice "
                    f"({len(resp)}/{len(reqs)} responses)")
        updates = pd.DataFrame([json.loads(r) for r in resp],
                               index=df.index)
        out = df.copy(deep=False)
        for c in updates.columns:           # returned keys overwrite $!
            out[c] = updates[c]
        return out

    def __del__(self):
        try:
            if self._proc is not None:
                self._proc.stdin.close()
                self._proc.terminate()
        except Exception:
            pass


class HttpRequestStage:
    """http_request() scalar analog (plugins/fmhttp/fmhttp.c:156-158)
    as an actor-pool enrich stage: one persistent HTTP connection per
    actor (opened lazily, re-opened on error), one GET per row against
    the url column; failures yield '' like the reference's error path.
    Only resolve distinct urls per batch — the remote is the rate
    limiter, so identical urls must not fan out N requests."""

    def __init__(self, host: str, port: int, url_col: str = "url",
                 out_col: str = "http_body"):
        self.host = host
        self.port = port
        self.url_col = url_col
        self.out_col = out_col
        self._conn = None

    def _get(self, path: str) -> str:
        import http.client

        try:
            if self._conn is None:
                self._conn = http.client.HTTPConnection(
                    self.host, self.port, timeout=10)
            self._conn.request("GET", path)
            resp = self._conn.getresponse()
            body = resp.read().decode("utf-8", "replace")
            return body if resp.status < 300 else ""
        except OSError:
            try:
                if self._conn is not None:
                    self._conn.close()
            finally:
                self._conn = None
            return ""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        uniq = {u: self._get(u) for u in df[self.url_col].unique()}
        out = df.copy(deep=False)
        out[self.out_col] = df[self.url_col].map(uniq)
        return out


def external_transform(ds, argv: list[str], input_cols: list[str],
                       concurrency=(1, 4), batch_size: int = 1024):
    """Attach the external-program stage as an autoscaling actor pool."""
    return ds.map_batches(
        ExternalTransformStage,
        fn_constructor_kwargs={"argv": argv, "input_cols": input_cols},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
