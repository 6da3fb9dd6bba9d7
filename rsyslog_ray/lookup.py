"""Lookup tables — rsyslog `lookup_table` analog.

The reference loads a JSON file into an immutable in-memory table with
four lookup semantics (reference runtime/lookup.h:26-34,
runtime/lookup.c):

- string      — exact-match on sorted keys (bsearch, lookup.c:400-416)
- array       — dense uint index (lookup.c:418-435)
- sparseArray — greatest key <= probe, i.e. a range / as-of lookup
                (lookup.c:437-485)
- regex       — first matching regex in an ordered list (lookup.c:486-)

Misses return the configured stub value (lookup.c:396-398 STUBBED).
Hot reload via rwlock swap (lookup.c:151-162) becomes: rebuild + re-put
the broadcast object between runs.

At scale the table is broadcast once (``ray.put`` on the driver) and
fetched per actor in ``__init__`` — never shipped per batch, never
shuffled (rsyslog has no general join; see SURVEY.md §2.7).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class LookupTable:
    """Immutable lookup table with the four reference semantics."""

    def __init__(self, kind: str, mapping, stub: str = ""):
        assert kind in ("string", "array", "sparseArray", "regex")
        self.kind = kind
        self.stub = stub
        if kind == "string":
            self._dict = dict(mapping)
        elif kind == "array":
            # mapping: list[value] indexed by uint key; ``offset`` is
            # the base index (the reference uses the table's first
            # sorted index as base, lookup.c:555-575)
            self._arr = list(mapping)
            self.offset = 0
        elif kind == "sparseArray":
            # mapping: dict[int lower-bound -> value]; probe maps to the
            # greatest bound <= probe (range lookup, np.searchsorted)
            items = sorted(mapping.items())
            self._bounds = np.array([k for k, _ in items], dtype=np.int64)
            self._vals = np.array([v for _, v in items], dtype=object)
        elif kind == "regex":
            # mapping: ordered list of (pattern, value)
            self._regex = [(re.compile(p), v) for p, v in mapping]

    # -- per-row (oracle path) -----------------------------------------
    def lookup(self, key):
        if self.kind == "string":
            return self._dict.get(key, self.stub)
        if self.kind == "array":
            i = int(key) - self.offset
            return self._arr[i] if 0 <= i < len(self._arr) else self.stub
        if self.kind == "sparseArray":
            i = int(np.searchsorted(self._bounds, int(key), side="right")) - 1
            return self._vals[i] if i >= 0 else self.stub
        for cre, v in self._regex:
            if cre.search(str(key)):
                return v
        return self.stub

    # -- Arrow-vectorized (engine hot path; string tables) -------------
    def lookup_arrow(self, col):
        """Exact-match lookup on an Arrow string column via
        ``pc.index_in`` + ``take`` (the bsearch analog, fully in C++).
        Misses -> stub.  Only for kind="string"; other kinds use the
        pandas path."""
        import pyarrow as pa
        import pyarrow.compute as pc

        assert self.kind == "string"
        if not hasattr(self, "_keys_arr"):
            self._keys_arr = pa.array(list(self._dict.keys()), pa.string())
            self._vals_arr = pa.array(list(self._dict.values()), pa.string())
        idx = pc.index_in(col, value_set=self._keys_arr)
        return pc.fill_null(pc.take(self._vals_arr, idx),
                            pa.scalar(self.stub, pa.string()))

    # -- vectorized (engine path) --------------------------------------
    def lookup_series(self, keys: pd.Series) -> pd.Series:
        if self.kind == "string":
            return keys.map(self._dict).fillna(self.stub)
        if self.kind == "array":
            k = pd.to_numeric(keys, errors="coerce")
            off = self.offset
            out = k.map(lambda i: self._arr[int(i) - off]
                        if pd.notna(i) and 0 <= int(i) - off < len(self._arr)
                        else self.stub)
            return out
        if self.kind == "sparseArray":
            k = pd.to_numeric(keys, errors="coerce").fillna(
                self._bounds[0] - 1).astype(np.int64)
            idx = np.searchsorted(self._bounds, k.to_numpy(), side="right") - 1
            vals = np.where(idx >= 0, self._vals[np.maximum(idx, 0)], self.stub)
            return pd.Series(vals, index=keys.index, dtype=object)
        # regex: ordered first-match over still-unmatched rows (same
        # first-match-wins shape as the parser chain)
        out = pd.Series(self.stub, index=keys.index, dtype=object)
        unmatched = pd.Series(True, index=keys.index)
        ks = keys.astype(str)
        for cre, v in self._regex:
            if not unmatched.any():
                break
            hit = ks[unmatched].str.contains(cre)
            hit_idx = hit.index[hit.fillna(False)]
            out.loc[hit_idx] = v
            unmatched.loc[hit_idx] = False
        return out


def _copy_table_state(dst: LookupTable, src: LookupTable) -> None:
    dst.kind = src.kind
    dst.stub = src.stub
    for attr in ("_dict", "_arr", "offset", "_bounds", "_vals", "_regex",
                 "_keys_arr", "_vals_arr"):
        if hasattr(dst, attr):
            delattr(dst, attr)
        if hasattr(src, attr):
            setattr(dst, attr, getattr(src, attr))


def reload_table(table: LookupTable, path_or_text: str,
                 stub: str | None = None) -> LookupTable:
    """S_RELOAD_LOOKUP_TABLE analog (runtime/lookup.c:151-162 reloader
    thread + rwlock swap; ruleset.c:512-529): rebuild ``table`` in
    place from the file.  A driver-held table refreshes immediately;
    a BROADCAST table needs the new object re-``ray.put`` (or the
    ReloadableLookup actor below for mid-run swaps)."""
    _copy_table_state(table, load_lookup_file(path_or_text, stub=stub))
    return table


class ReloadableLookup:
    """Mid-run hot reload: a tiny named actor holds (version, table);
    worker stages cache the table and poll the version once per batch
    (one cheap RPC), swapping when it bumps — the distributed analog of
    the reference's reloader thread + rwlock swap (lookup.c:151-162:
    readers never block, the swap happens between lookups).

    Driver:  rl = ReloadableLookup.start(path); ... rl.reload(path2)
    Workers: probe = rl.probe(); probe.table() inside __call__.
    """

    def __init__(self, handle):
        self._handle = handle

    @staticmethod
    def start(path_or_text: str, stub: str | None = None,
              name: str | None = None) -> "ReloadableLookup":
        import ray

        @ray.remote(num_cpus=0)
        class _Holder:
            def __init__(self, path, stub):
                self._v = 1
                self._t = load_lookup_file(path, stub=stub)

            def reload(self, path, stub=None):
                self._t = load_lookup_file(path, stub=stub)
                self._v += 1
                return self._v

            def poll(self, have_version: int):
                if have_version == self._v:
                    return self._v, None       # unchanged: no payload
                return self._v, self._t

            def version(self):
                return self._v

        kwargs = {"name": name} if name else {}
        return ReloadableLookup(
            _Holder.options(**kwargs).remote(path_or_text, stub))

    def reload(self, path_or_text: str, stub: str | None = None) -> int:
        import ray
        return ray.get(self._handle.reload.remote(path_or_text, stub))

    def probe(self) -> "LookupProbe":
        return LookupProbe(self._handle)

    def version(self) -> int:
        """Current table version (no payload ships) — the reload
        observable imdiag's awaitlookuptablereload blocks on."""
        import ray
        return ray.get(self._handle.version.remote())


class LookupProbe:
    """Worker-side cache for ReloadableLookup: ``table()`` returns the
    current table, re-fetching only when the holder's version moved."""

    def __init__(self, handle):
        self._handle = handle
        self._version = 0
        self._table: LookupTable | None = None

    def table(self) -> LookupTable:
        import ray
        v, t = ray.get(self._handle.poll.remote(self._version))
        if t is not None:
            self._version, self._table = v, t
        return self._table


def load_lookup_file(path_or_text: str, stub: str | None = None) -> LookupTable:
    """Load the reference's lookup-table JSON file format
    (runtime/lookup.c:760-800 lookupReadFile: {"version", "nomatch",
    "type": string|array|sparseArray|regex, "table": [{"index": ...,
    "value"|"tag": ...}]}; default type = string, regex rows use
    "tag").  Array tables may start at any index — the reference uses
    the first (sorted) index as the base offset (lookup.c:555-575);
    holes resolve to the nomatch stub.

    Hot reload (reload_lookup_table(), lookup.c:151-162 rwlock swap)
    becomes: call this again and re-``ray.put`` — the next run's
    workers fetch the new broadcast object.
    """
    import json
    import os

    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            doc = json.load(fh)
    else:
        doc = json.loads(path_or_text)
    kind = doc.get("type", "string")
    nomatch = doc.get("nomatch", "") if stub is None else stub
    rows = doc.get("table", [])
    if kind == "string":
        return LookupTable("string",
                           {str(r["index"]): str(r["value"]) for r in rows},
                           stub=nomatch)
    if kind == "array":
        if not rows:
            return LookupTable("array", [], stub=nomatch)
        items = sorted((int(r["index"]), str(r["value"])) for r in rows)
        base = items[0][0]
        vals = [nomatch] * (items[-1][0] - base + 1)
        for i, v in items:
            vals[i - base] = v
        t = LookupTable("array", vals, stub=nomatch)
        t.offset = base
        return t
    if kind == "sparseArray":
        return LookupTable("sparseArray",
                           {int(r["index"]): str(r["value"]) for r in rows},
                           stub=nomatch)
    if kind == "regex":
        return LookupTable("regex",
                           [(str(r["index"]), str(r.get("tag",
                                                        r.get("value"))))
                            for r in rows], stub=nomatch)
    raise ValueError(f"unknown lookup table type {kind!r}")
