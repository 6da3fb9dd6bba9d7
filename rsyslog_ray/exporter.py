"""Live Prometheus scrape endpoint — the sidecar exporter.

The reference grew a sidecar HTTP exporter that reads impstats output
and serves it to Prometheus (``sidecar/rsyslog_exporter.py``, file
mode).  This is the Ray-native analog on stdlib only (the container
has no prometheus_client/werkzeug): a ``num_cpus=0`` actor on the
head node serves ``/metrics`` over ``http.server``, reading the RUN
DIRECTORY on every scrape —

- ``_impstats.interval.<pid>`` files (the per-worker interval
  emitter's legacy-format lines, stats.IntervalStatsEmitter): the
  LAST line of each file is that worker's running total; the scrape
  sums them across workers into ``<obj>_<ctr>_total`` counters.
- ``_impstats.prometheus`` (end-of-run render): served verbatim.
- ``_lineage*.jsonl``: committed-shard count as
  ``raylog_lineage_commits_total``.

Scrape-time file reads mean zero coupling to the pipeline hot path —
the writers keep their flush-only append contract and the exporter
needs no channel to them (exactly the sidecar's file mode).
"""

from __future__ import annotations

import glob
import json
import os
import re
import threading

from .stats import encode_prometheus_name

_LEGACY_RE = re.compile(r"^([^:]+): (.*)$")


def _parse_legacy_line(line: str) -> tuple[str, dict] | None:
    """'name: origin=o a=1 b=2 ' -> (name, {counter: int})."""
    m = _LEGACY_RE.match(line.strip())
    if not m:
        return None
    name, rest = m.group(1), m.group(2)
    ctrs: dict = {}
    for tok in rest.split():
        k, _, v = tok.partition("=")
        if not _ or k == "origin":
            continue
        try:
            ctrs[k] = int(v)
        except ValueError:
            continue
    return name, ctrs


def render_run_metrics(out_dir: str, scrapes: int = 0) -> str:
    """One Prometheus exposition snapshot of a run directory."""
    totals: dict[tuple[str, str], int] = {}
    for path in sorted(glob.glob(os.path.join(
            out_dir, "_impstats.interval.*"))):
        try:
            with open(path) as fh:
                raw = fh.read()
        except OSError:
            continue
        if not raw.endswith("\n"):
            # a concurrent writer's last line may be mid-flush — a
            # torn tail would read as a SMALLER total and make the
            # scraped counter non-monotone; only complete lines count
            raw = raw[:raw.rfind("\n") + 1]
        lines = [l for l in raw.splitlines() if l.strip()]
        if not lines:
            continue
        parsed = _parse_legacy_line(lines[-1])
        if parsed is None:
            continue
        name, ctrs = parsed
        for k, v in ctrs.items():
            key = (name, k)
            totals[key] = totals.get(key, 0) + v

    out = []
    for (name, k), v in sorted(totals.items()):
        metric = encode_prometheus_name(f"{name}_{k}_total")
        out.append(f"# HELP {metric} rsyslog stats: object=\"{name}\""
                   f", counter=\"{k}\"\n"
                   f"# TYPE {metric} counter\n{metric} {v}\n")

    commits = 0
    for path in ([os.path.join(out_dir, "_lineage.jsonl")]
                 + sorted(glob.glob(os.path.join(out_dir,
                                                 "_lineage-*.jsonl")))):
        try:
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    try:
                        json.loads(line)
                        commits += 1
                    except ValueError:
                        continue
        except OSError:
            continue
    out.append("# HELP raylog_lineage_commits_total committed "
               "partitions in the run manifest\n"
               "# TYPE raylog_lineage_commits_total counter\n"
               f"raylog_lineage_commits_total {commits}\n")
    out.append("# HELP raylog_exporter_scrapes_total scrapes served\n"
               "# TYPE raylog_exporter_scrapes_total counter\n"
               f"raylog_exporter_scrapes_total {scrapes}\n")

    final = os.path.join(out_dir, "_impstats.prometheus")
    if os.path.exists(final):
        try:
            with open(final) as fh:
                out.append(fh.read())
        except OSError:
            pass
    return "".join(out)


class StatsHttpServer:
    """stdlib HTTP server for ``/metrics`` + ``/healthz`` over a run
    dir; binds an ephemeral port with ``port=0`` (read ``.port``)."""

    def __init__(self, out_dir: str, host: str = "127.0.0.1",
                 port: int = 0):
        from http.server import (BaseHTTPRequestHandler,
                                 ThreadingHTTPServer)

        self.out_dir = out_dir
        self.scrapes = 0
        exporter = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):          # noqa: N802 (stdlib API name)
                if self.path.split("?")[0] == "/metrics":
                    exporter.scrapes += 1
                    body = render_run_metrics(
                        exporter.out_dir,
                        scrapes=exporter.scrapes).encode()
                    ctype = ("text/plain; version=0.0.4; "
                             "charset=utf-8")
                elif self.path.split("?")[0] == "/healthz":
                    body, ctype = b"ok\n", "text/plain"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silent: no per-scrape stderr
                pass

        self._srv = ThreadingHTTPServer((host, port), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()


def start_exporter_actor(out_dir: str, host: str = "127.0.0.1",
                         port: int = 0):
    """Spawn the exporter as a zero-CPU Ray actor (the sidecar
    process analog): ``h = start_exporter_actor(run_dir)``;
    ``ray.get(h.port.remote())`` gives the bound port;
    ``h.stop.remote()`` shuts it down."""
    import ray

    @ray.remote(num_cpus=0)
    class ExporterActor:
        def __init__(self, out_dir: str, host: str, port: int):
            self._srv = StatsHttpServer(out_dir, host=host, port=port)

        def port(self) -> int:
            return self._srv.port

        def stop(self) -> None:
            self._srv.stop()

    return ExporterActor.remote(out_dir, host, port)
