"""Rate limiting — the reference's Linux-like semantics, keyed.

reference runtime/ratelimit.c:2403-2470 withinRatelimit ("modelled
after the linux kernel"): a window opens at the first message; beyond
``burst`` messages within ``interval`` seconds are dropped; the window
expires only when a message arrives STRICTLY past begin+interval (or
time goes backwards), and — printk-heritage quirk kept faithfully —
the expiring message itself resets the counters while the window
timer restarts at the NEXT message.  On expiry the reference emits the
"lost due to rate-limiting" summary (tellLostCnt, ratelimit.c:2389);
the severity floor (ratelimit.c:2604-2612) subjects only messages
with numeric severity >= threshold to limiting — more-severe (lower
numbered) messages bypass and consume no budget.

Batch re-expression: ``groupby(key).map_groups`` with the bucket
simulated over the group's time-ordered events.  The partitioning
assumption is the same the reference makes per-key under its mutex:
ONE key's events must be processed in time order by one worker; keys
parallelize.  (For hot single keys, pre-trim with a salted per-salt
cap >= burst, then the exact pass — burst math only needs the first
`burst` events of any window.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def token_bucket_eval(ts: pd.Series, interval_s: float, burst: int):
    """Reference semantics over one key's time-ordered timestamps:
    returns (keep_mask, summaries) where summaries lists one dict per
    window expiry that had drops — the tellLostCnt record."""
    keep = np.zeros(len(ts), dtype=bool)
    summaries = []
    begin = None
    done = 0
    missed = 0
    for i, t in enumerate(ts):
        if begin is None:
            begin = t
        elif (t - begin).total_seconds() > interval_s or t < begin:
            # expiry: counters reset NOW, window timer restarts at the
            # NEXT message (ratelimit.c:2436-2440 sets begin=0)
            if missed:
                summaries.append({"window_begin": begin, "lost": missed})
            begin = None
            done = 0
            missed = 0
        if done < burst:
            keep[i] = True
            done += 1
        else:
            missed += 1
    if missed and begin is not None:
        summaries.append({"window_begin": begin, "lost": missed})
    return keep, summaries


def token_bucket_keep(ts: pd.Series, interval_s: float, burst: int) -> np.ndarray:
    """Keep-mask only (also the oracle — intentionally simple)."""
    return token_bucket_eval(ts, interval_s, burst)[0]


def ratelimit(ds, key: str, ts_col: str, *, interval_s: float, burst: int,
              order_cols: list[str] | None = None,
              severity_col: str | None = None, severity_threshold: int = 0):
    """Keep <= burst events per key per interval window (Linux-like,
    reference-faithful). With ``severity_col``/``severity_threshold``,
    only rows with severity >= threshold are subject to limiting —
    others pass through and consume no budget (ratelimit.c:2604).
    Returns the kept rows."""
    order = [ts_col] + (order_cols or [])

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        if severity_col is not None and severity_threshold > 0:
            subject = (g[severity_col] >= severity_threshold).to_numpy()
            sub = g[subject]
            keepmask = np.ones(len(g), dtype=bool)
            keepmask[subject] = token_bucket_keep(sub[ts_col], interval_s,
                                                  burst)
            return g[keepmask]
        return g[token_bucket_keep(g[ts_col], interval_s, burst)]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def ratelimit_lost_records(ds, key: str, ts_col: str, *, interval_s: float,
                           burst: int, order_cols: list[str] | None = None):
    """The reference's 'N messages lost due to rate-limiting (B allowed
    within I seconds)' record stream (tellLostCnt): one row per (key,
    expired window with drops)."""
    order = [ts_col] + (order_cols or [])

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order)
        _, summaries = token_bucket_eval(g[ts_col], interval_s, burst)
        if not summaries:
            return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                                 "window_begin": pd.Series([], dtype=g[ts_col].dtype),
                                 "lost": pd.Series([], dtype="int64"),
                                 "msg": pd.Series([], dtype=object)})
        out = pd.DataFrame(summaries)
        out.insert(0, key, g[key].iloc[0])
        out["lost"] = out["lost"].astype("int64")
        out["msg"] = (out["lost"].astype(str)
                      + f" messages lost due to rate-limiting ({burst} "
                        f"allowed within {int(interval_s)} seconds)")
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
