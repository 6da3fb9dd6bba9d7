"""statsobj / impstats output formats + dynstats runtime semantics.

Faithful re-expression of the reference's stats subsystem surface:

- ``StatsObject`` — named counter set with origin / reporting_ns and
  the four line formats (runtime/statsobj.h:67-86 statsFmt_*):
  legacy (runtime/statsobj.c:471 getStatsLine), JSON / JSON-ES / CEE
  (statsobj.c:391 getStatsLineCEE — ES mode replaces dots with bangs,
  CEE prepends the ``@cee:`` cookie), and Prometheus text exposition
  (statsobj.c:714 emitPrometheusForObject — HELP/TYPE/value triplet
  per counter, metric ``<obj>_<ctr>_total``, reversible ``U__`` name
  encoding per statsobj.c:561-662).
- ``CTR_RESETTABLE`` semantics: reading with ``reset=True`` zeroes
  resettable counters (statsobj.h CTR_FLAG_RESETTABLE).
- ``DynStatsBucket`` — dyn_inc keyed counters with maxCardinality
  refusal, ``unusedMetricLife`` TTL purge, ``resettable`` report and
  state-file persistence (runtime/dynstats.c:43-45 and the
  survive_restart/persistStateInterval machinery).

These are the per-process/per-actor incremental analogs; the
distributed batch path stays two_phase_agg (stages/aggregate.py).
"""

from __future__ import annotations

import json
import os
import re
import time

CTR_NONE = 0
CTR_RESETTABLE = 1  # statsobj.h CTR_FLAG_RESETTABLE

CEE_COOKIE = "@cee:"


def prometheus_safe_name(name: str) -> bool:
    """statsobj.c:561 prometheusLegacySafeName: [a-zA-Z_:] first char,
    [a-zA-Z0-9_:] rest, and the U__ prefix is reserved."""
    if not name:
        return False
    if not re.match(r"[A-Za-z_:]", name[0]):
        return False
    if name.startswith("U__"):
        return False
    return re.fullmatch(r"[A-Za-z_:][A-Za-z0-9_:]*", name) is not None


def encode_prometheus_name(name: str) -> str:
    """statsobj.c:612 encodePrometheusMetricName: safe names pass
    through; everything else gets the reversible U__ encoding
    (safe chars verbatim, '_' doubled, other codepoints ``_%X_``)."""
    if prometheus_safe_name(name):
        return name
    out = ["U__"]
    for ch in name:
        cp = ord(ch)
        if (("a" <= ch <= "z") or ("A" <= ch <= "Z")
                or ("0" <= ch <= "9") or ch == ":"):
            out.append(ch)
        elif ch == "_":
            out.append("__")
        else:
            out.append(f"_{cp:X}_")
    return "".join(out)


def _escape_help(s: str) -> str:
    """statsobj.c:664 escapePrometheusHelp: backslash, quote, LF."""
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


class StatsObject:
    """Ordered counter set rendering every reference stats format."""

    def __init__(self, name: str, origin: str | None = None,
                 reporting_ns: str | None = None):
        self.name = name
        self.origin = origin
        self.reporting_ns = reporting_ns
        self._ctrs: dict[str, int] = {}
        self._flags: dict[str, int] = {}

    def set_ctr(self, name: str, value: int = 0,
                flags: int = CTR_NONE) -> "StatsObject":
        self._ctrs[name] = int(value)
        self._flags[name] = flags
        return self

    def inc(self, name: str, delta: int = 1) -> None:
        self._ctrs[name] = self._ctrs.get(name, 0) + delta
        self._flags.setdefault(name, CTR_NONE)

    def _maybe_reset(self, reset: bool) -> None:
        if reset:
            for k, fl in self._flags.items():
                if fl & CTR_RESETTABLE:
                    self._ctrs[k] = 0

    def line_legacy(self, reset: bool = False) -> str:
        """getStatsLine: 'name: origin=o ctr=v ctr=v ' (the reference
        appends a space after every counter — kept byte-faithful)."""
        parts = [f"{self.name}: "]
        if self.origin is not None:
            parts.append(f"origin={self.origin} ")
        for k, v in self._ctrs.items():
            parts.append(f"{k}={v} ")
        self._maybe_reset(reset)
        return "".join(parts)

    def line_json(self, fmt: str = "json", reset: bool = False) -> str:
        """getStatsLineCEE: fmt in {'json', 'json-es', 'cee'} — ES
        replaces '.' with '!' in counter names, CEE prepends the
        cookie; counters nest under reporting_ns when set."""
        root: dict = {"name": self.name}
        if self.origin is not None:
            root["origin"] = self.origin
        values = root if self.reporting_ns is None else {}
        if self.reporting_ns is not None:
            root[self.reporting_ns] = values
        for k, v in self._ctrs.items():
            key = k.replace(".", "!") if fmt == "json-es" else k
            values[key] = v
        self._maybe_reset(reset)
        body = json.dumps(root, separators=(", ", ": "))
        return f"{CEE_COOKIE} {body}" if fmt == "cee" else body

    def lines_prometheus(self, reset: bool = False) -> list[str]:
        """emitPrometheusForObject: HELP/TYPE/value per counter, metric
        name '<obj>_<ctr>_total' through the U__ encoder."""
        out = []
        origin = self.origin or ""
        for k, v in self._ctrs.items():
            metric = encode_prometheus_name(f"{self.name}_{k}_total")
            out.append(
                f'# HELP {metric} rsyslog stats: origin="'
                f'{_escape_help(origin)}" object="'
                f'{_escape_help(self.name)}", counter="{_escape_help(k)}"\n'
                f"# TYPE {metric} counter\n"
                f"{metric} {v}\n")
        self._maybe_reset(reset)
        return out

    def render(self, fmt: str, reset: bool = False) -> str:
        if fmt == "legacy":
            return self.line_legacy(reset)
        if fmt in ("json", "json-es", "cee"):
            return self.line_json(fmt, reset)
        if fmt == "prometheus":
            return "".join(self.lines_prometheus(reset))
        raise ValueError(f"unknown stats format {fmt!r}")


class DynStatsBucket:
    """dyn_inc keyed counters with the reference's bucket options
    (runtime/dynstats.c): ``max_cardinality`` refusal (new keys past
    the cap land in ops_overflow), ``unused_metric_life`` purge of
    keys untouched for the lifetime, ``resettable`` report, and
    JSON state-file persistence (survive_restart analog).

    Time is injected (``now``) so batch engines can drive it with
    event time instead of wall clock."""

    def __init__(self, name: str, max_cardinality: int = 0,
                 unused_metric_life: float = 0.0, resettable: bool = True):
        self.name = name
        self.max_cardinality = max_cardinality
        self.unused_metric_life = unused_metric_life
        self.resettable = resettable
        self.counters: dict[str, int] = {}
        self.last_touch: dict[str, float] = {}
        self.ops_overflow = 0
        self.purged = 0

    def inc(self, key: str, now: float = 0.0, delta: int = 1) -> bool:
        """dyn_inc: returns False when the key was refused (cap)."""
        if key not in self.counters:
            if self.max_cardinality and len(self.counters) >= self.max_cardinality:
                self.ops_overflow += 1
                return False
            self.counters[key] = 0
        self.counters[key] += delta
        self.last_touch[key] = now
        return True

    def purge_unused(self, now: float) -> int:
        """unusedMetricLife sweep (dynstats.c checks lifetimes on its
        timer): drop keys untouched for longer than the lifetime —
        freeing cardinality slots, like the reference."""
        if not self.unused_metric_life:
            return 0
        dead = [k for k, t in self.last_touch.items()
                if now - t > self.unused_metric_life]
        for k in dead:
            del self.counters[k]
            del self.last_touch[k]
        self.purged += len(dead)
        return len(dead)

    def report(self, reset: bool | None = None) -> dict[str, int]:
        """Snapshot; zeroes counters afterwards when resettable (the
        reference's read-and-reset reporting mode)."""
        snap = dict(self.counters)
        if self.ops_overflow:
            snap["ops_overflow"] = self.ops_overflow
        if self.resettable if reset is None else reset:
            for k in self.counters:
                self.counters[k] = 0
            self.ops_overflow = 0
        return snap

    # -- persistence (survive_restart / persistStateInterval analog) --

    def save(self, path: str) -> None:
        rec = {"name": self.name, "counters": self.counters,
               "last_touch": self.last_touch,
               "ops_overflow": self.ops_overflow}
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, **kwargs) -> "DynStatsBucket":
        with open(path) as fh:
            rec = json.load(fh)
        b = cls(rec["name"], **kwargs)
        b.counters = {str(k): int(v) for k, v in rec["counters"].items()}
        b.last_touch = {str(k): float(v)
                        for k, v in rec["last_touch"].items()}
        b.ops_overflow = int(rec.get("ops_overflow", 0))
        return b


class IntervalStatsEmitter:
    """Interval impstats emission (plugins/impstats/impstats.c:114-123:
    a periodic timer renders every statsobj as a log line each
    ``interval`` seconds).  The deterministic batch analog emits one
    rendered line every ``every_batches`` write batches from each
    worker's local counters (the reference's impstats is per-process
    too); ``interval_s`` adds the wall-clock trigger on top.  Lines
    append flush-only (no fsync — CLAUDE.md invariant 4) to
    ``_impstats.interval.<pid>`` in the run dir, one file per worker so
    concurrent appends never interleave."""

    def __init__(self, out_dir: str, name: str = "raylog",
                 every_batches: int = 1, interval_s: float | None = None,
                 fmt: str = "legacy"):
        self.out_dir = out_dir
        self.every = max(1, int(every_batches))
        self.interval_s = interval_s
        self.fmt = fmt
        self.obj = StatsObject(name, origin="impstats")
        self._n = 0
        self._last = time.monotonic()
        self._path = os.path.join(out_dir, f"_impstats.interval.{os.getpid()}")

    def tick(self, counters: dict) -> bool:
        """Accumulate one batch's counters; emit when the batch count
        (or the wall interval) trips.  Returns True when a line was
        written."""
        for k, v in counters.items():
            self.obj.inc(k, int(v))
        self._n += 1
        due = (self._n % self.every == 0)
        if self.interval_s is not None:
            now = time.monotonic()
            if now - self._last >= self.interval_s:
                due = True
        if not due:
            return False
        self._last = time.monotonic()
        with open(self._path, "a") as fh:
            fh.write(self.obj.render(self.fmt) + "\n")
            fh.flush()
        return True
