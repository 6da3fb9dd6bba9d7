"""Rate limiting — the reference's token-bucket semantics, keyed.

reference runtime/ratelimit.c (interval+burst: a window opens at the
first message; messages beyond `burst` within `interval` seconds are
dropped; the window resets when it expires — ratelimit.h:67-69,137-178).

Batch re-expression: ``groupby(key).map_groups`` with the bucket
simulated over the group's time-ordered events.  The partitioning
assumption is the same the reference makes per-key under its mutex: ONE
key's events must be processed in time order by one worker; keys
parallelize.  (For hot single keys, pre-trim with a salted per-salt cap
>= burst, then the exact pass — burst math only needs the first
`burst` events of any window.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def token_bucket_keep(ts: pd.Series, interval_s: float, burst: int) -> np.ndarray:
    """Reference semantics over one key's time-ordered timestamps:
    returns a keep-mask. (Also the oracle — intentionally simple.)"""
    keep = np.zeros(len(ts), dtype=bool)
    begin = None
    done = 0
    for i, t in enumerate(ts):
        if begin is None or (t - begin).total_seconds() >= interval_s:
            begin = t
            done = 0
        if done < burst:
            keep[i] = True
            done += 1
    return keep


def ratelimit(ds, key: str, ts_col: str, *, interval_s: float, burst: int,
              order_cols: list[str] | None = None):
    """Keep <= burst events per key per interval window (windows open at
    the first kept event, reference-style). Returns the kept rows."""
    order = [ts_col] + (order_cols or [])

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        return g[token_bucket_keep(g[ts_col], interval_s, burst)]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
