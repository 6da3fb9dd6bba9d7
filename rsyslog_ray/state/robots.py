"""robots.txt policy — RFC 9309 Robots Exclusion Protocol.

Broadcast-state shape (like state/mmdb.py and the lookup tables): the
policy parses ONCE per actor/driver and evaluates a whole URL-path
column per call — each rule is one C regex pass (``str.match``), the
verdict a numpy argmax over (match-length, allow-priority), no
per-row Python.

Semantics implemented (RFC 9309 §2):
- group selection: the group(s) whose ``User-agent`` token is the
  longest case-insensitive substring of the product token; ``*``
  groups apply only when no specific group matched.  Consecutive
  ``User-agent`` lines share the following rule block.
- rule match: ``Allow``/``Disallow`` path patterns match from the
  path start; ``*`` is a wildcard, ``$`` anchors the end.
- precedence: the LONGEST matching pattern (octet length) wins;
  ``Allow`` wins a length tie.  No matching rule -> allowed.
- an empty ``Disallow:`` value matches nothing (explicit allow-all).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _pat_to_regex(pat: str) -> re.Pattern:
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    parts = [re.escape(p) for p in pat.split("*")]
    rx = ".*".join(parts)
    return re.compile(rx + ("$" if anchored else ""))


class RobotsPolicy:
    """Parsed policy for one user agent.

    >>> pol = RobotsPolicy("User-agent: *\\nDisallow: /tmp/", "bot")
    >>> bool(pol.allowed(pd.Series(["/tmp/x"]))[0])
    False
    """

    def __init__(self, text: str, user_agent: str = "*"):
        ua = user_agent.lower()
        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        agents: list[str] = []
        rules: list[tuple[bool, str]] = []
        in_rules = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, value = line.split(":", 1)
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if in_rules:
                    groups.append((agents, rules))
                    agents, rules = [], []
                    in_rules = False
                agents.append(value.lower())
            elif field in ("allow", "disallow"):
                rules.append((field == "allow", value))
                in_rules = True
        if agents or rules:
            groups.append((agents, rules))

        # longest user-agent token contained in ours; '*' only as
        # fallback (RFC 9309 §2.2.1)
        best_len, chosen = -1, []
        for ags, rls in groups:
            for a in ags:
                if a != "*" and a in ua and len(a) > best_len:
                    best_len, chosen = len(a), rls
        if best_len < 0:
            for ags, rls in groups:
                if "*" in ags:
                    chosen = chosen + rls
        self.rules = [(allow, pat, _pat_to_regex(pat))
                      for allow, pat in chosen if pat != ""]

    def allowed(self, paths: pd.Series) -> np.ndarray:
        """Boolean verdict per path — vectorized: one ``str.match``
        pass per rule, then (length, allow) argmax."""
        n = len(paths)
        if not self.rules or n == 0:
            return np.ones(n, dtype=bool)
        best_len = np.full(n, -1, dtype=np.int64)
        best_allow = np.ones(n, dtype=bool)
        for allow, pat, rx in self.rules:
            hit = paths.str.match(rx).fillna(False).to_numpy(bool)
            plen = len(pat)
            upgrade = hit & ((plen > best_len)
                             | ((plen == best_len) & allow))
            best_len[upgrade] = plen
            best_allow[upgrade] = allow
        return best_allow
