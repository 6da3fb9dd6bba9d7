"""dnscache — cached reverse resolution of peer addresses.

Reference: runtime/dnscache.c — every received message's peer IP is
reverse-resolved once and cached (hashtable keyed by sockaddr,
entries carry the fqdn/fqdnLowerCase/localName forms; cache misses do
the blocking getnameinfo, hits are lock-free reads).  The reference
also refuses to grow without bound and expires entries.

Re-expression: a per-actor TTL+capacity cache around the real
resolver (socket.gethostbyaddr), with the reference's miss-fallback
semantics — unresolvable peers keep their dotted-quad as the name
(dnscache.c falls back to the IP string form).  Time is injected so
batch engines can drive expiry deterministically."""

from __future__ import annotations

import socket

import pandas as pd


class DnsCache:
    def __init__(self, ttl_s: float = 3600.0, max_entries: int = 10_000,
                 resolver=None):
        self.ttl_s = ttl_s
        self.max_entries = max_entries
        self._resolve = resolver or self._system_resolve
        self._cache: dict[str, tuple[str, float]] = {}
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _system_resolve(ip: str) -> str:
        try:
            return socket.gethostbyaddr(ip)[0]
        except OSError:
            return ip  # reference fallback: keep the address form

    def lookup(self, ip: str, now: float = 0.0) -> str:
        ent = self._cache.get(ip)
        if ent is not None and now - ent[1] <= self.ttl_s:
            self.hits += 1
            return ent[0]
        self.misses += 1
        name = self._resolve(ip)
        if len(self._cache) >= self.max_entries and ip not in self._cache:
            # capacity: evict the stalest entry (the reference prunes
            # rather than growing without bound)
            oldest = min(self._cache, key=lambda k: self._cache[k][1])
            del self._cache[oldest]
        self._cache[ip] = (name, now)
        return name

    def lookup_series(self, ips: pd.Series, now: float = 0.0) -> pd.Series:
        """Vectorized-by-uniques: resolve each DISTINCT address once per
        batch (peer cardinality << row count, the same ratio the
        reference's cache exploits), then map."""
        uniq = {ip: self.lookup(ip, now) for ip in pd.unique(ips)}
        return ips.map(uniq)
