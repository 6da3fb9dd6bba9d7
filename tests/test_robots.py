"""RFC 9309 robots.txt policy (state/robots.py): group selection,
longest-match precedence, Allow tie-break, wildcards/anchors."""

import numpy as np
import pandas as pd

from rsyslog_ray.state.robots import RobotsPolicy

ROBOTS = """
# crawl policy
User-agent: megabot
Disallow: /

User-agent: goodbot
User-agent: otherbot
Disallow: /private/
Allow: /private/pub/
Disallow: /*.gz$
Allow: /archive/ok

User-agent: *
Disallow: /tmp/
Disallow:
"""


def _verdicts(ua, paths):
    return RobotsPolicy(ROBOTS, ua).allowed(pd.Series(paths)).tolist()


def test_group_selection_and_rules():
    paths = ["/", "/private/x", "/private/pub/y", "/data/file.gz",
             "/data/file.gz2", "/archive/okay", "/tmp/z"]
    # goodbot group: longest-match semantics
    assert _verdicts("goodbot/1.2", paths) == [
        True,   # no rule
        False,  # /private/
        True,   # Allow /private/pub/ longer than Disallow /private/
        False,  # /*.gz$ anchored
        True,   # .gz2 does not match the $ anchor
        True,   # Allow /archive/ok
        True,   # /tmp/ is the *-group's rule, not goodbot's
    ]
    # megabot: blanket disallow
    assert _verdicts("MegaBot", ["/", "/a"]) == [False, False]
    # unknown agent falls to the * group; empty Disallow matches nothing
    assert _verdicts("nobody", ["/tmp/z", "/x"]) == [False, True]


def test_allow_wins_length_tie():
    txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\n"
    pol = RobotsPolicy(txt, "x")
    assert pol.allowed(pd.Series(["/a/b", "/a/c"])).tolist() == [
        False, True]
    tie = "User-agent: *\nDisallow: /abc\nAllow: /ab*\n"
    # '/ab*' (4 octets) vs '/abc' (4): Allow wins the tie on /abc…
    assert RobotsPolicy(tie, "x").allowed(
        pd.Series(["/abcd"])).tolist() == [True]


def test_empty_policy_allows_everything():
    pol = RobotsPolicy("", "any")
    out = pol.allowed(pd.Series(["/a", "/b"]))
    assert out.dtype == np.bool_ and out.all()
