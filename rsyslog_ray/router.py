"""Router — ruleset / property-filter compiler (fan-out + stop).

The reference routes each message through an ordered ruleset program:
property filters (`:prop, [!]op, "val"` — ops contains / isequal /
startswith / endswith / regex / isempty, reference
runtime/typedefs.h:170-180 FIOP_*, eval runtime/ruleset.c:424-500),
PRI filters (facility/severity bitmaps, ruleset.c:403), full boolean
expressions (grammar/rainerscript.c:3878-4110 cnfexprEval), actions
(deliver to a sink) and `stop` (discard — end of matching,
ruleset.c:552-554).  One message may match many actions (fan-out).

Ray-Data-first re-expression: ALL route predicates compile to
vectorized boolean masks evaluated in ONE pass over each Arrow/pandas
batch; `stop` becomes a running "already consumed" mask ANDed out of
later routes.  Sinks then become either filtered write branches or a
single-pass fan-out writer (see sinks.py).

Predicate AST (tuples, declarative — the RainerScript-expression
subset):

    ("==", col, val)     ("!=", col, val)
    (">=", col, val)     ("<=", col, val)  (">", ...)  ("<", ...)
    ("contains", col, s) ("startswith", col, s) ("endswith", col, s)
    ("regex", col, pattern)          # ERE, re.search semantics
    ("isempty", col)                 # "" or null
    ("in", col, [v1, v2, ...])       # sorted-array membership
    ("exists", col)                  # column present AND non-null
                                     # (rainerscript.c:3097-3110)
    ("prifilt", col, lo, hi)         # severity range mask (inclusive)
    ("and", p, q) ("or", p, q) ("not", p) ("true",)

Comparison operands may also be ARITHMETIC EXPRESSION nodes
(grammar/grammar.y:100-123 `+ - * / %`): ("arith", op, a, b) with
leaves ("col", name) / ("lit", number), e.g.
``(">=", ("arith", "+", ("arith", "*", ("col","n"), ("lit",8)),
("col","m")), 13)``.  All three evaluation paths compute in float64
with true division and floor-mod (numpy/pandas semantics — the
reference computes C int64 with truncating division; identical for
the non-negative integer configs that actually use this, divergent
only on negative modulo/division corners)."""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class Route:
    sink: str
    pred: tuple
    stop: bool = False


def _is_expr(x) -> bool:
    return isinstance(x, (tuple, list)) and x and \
        x[0] in ("arith", "col", "lit")


_ARITH_CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
}

_ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
}


def _num_pd(e, df: pd.DataFrame):
    """Numeric expression -> float64 Series/scalar (nulls stay NaN)."""
    if not _is_expr(e):
        return float(e)
    if e[0] == "col":
        return pd.to_numeric(df[e[1]], errors="coerce").astype("float64")
    if e[0] == "lit":
        return float(e[1])
    return _ARITH[e[1]](_num_pd(e[2], df), _num_pd(e[3], df))


def _num_row(e, row: dict):
    if not _is_expr(e):
        return float(e)
    if e[0] == "col":
        v = row.get(e[1])
        try:
            return float(v)
        except (TypeError, ValueError):
            return float("nan")
    if e[0] == "lit":
        return float(e[1])
    a, b = _num_row(e[2], row), _num_row(e[3], row)
    # np.float64 + errstate: div-by-zero yields inf/nan exactly like
    # the pandas and Arrow float64 paths (Python floats would raise)
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(_ARITH[e[1]](np.float64(a), np.float64(b)))


def _num_arrow(e, t):
    import pyarrow as pa
    import pyarrow.compute as pc

    if not _is_expr(e):
        return pa.scalar(float(e), pa.float64())
    if e[0] == "col":
        return pc.cast(t[e[1]], pa.float64(), safe=False)
    if e[0] == "lit":
        return pa.scalar(float(e[1]), pa.float64())
    a, b = _num_arrow(e[2], t), _num_arrow(e[3], t)
    op = e[1]
    if op == "+":
        return pc.add(a, b)
    if op == "-":
        return pc.subtract(a, b)
    if op == "*":
        return pc.multiply(a, b)
    if op == "/":
        return pc.divide(a, b)
    # floor-mod a - floor(a/b)*b — Arrow ships no modulo kernel; this
    # matches the pandas/numpy % the other two paths use
    return pc.subtract(a, pc.multiply(pc.floor(pc.divide(a, b)), b))


def _mask(pred: tuple, df: pd.DataFrame) -> pd.Series:
    op = pred[0]
    if op == "true":
        return pd.Series(True, index=df.index)
    if op == "and":
        return _mask(pred[1], df) & _mask(pred[2], df)
    if op == "or":
        return _mask(pred[1], df) | _mask(pred[2], df)
    if op == "not":
        return ~_mask(pred[1], df)
    if op == "exists":
        # exists($!x): column present in the frame AND non-null
        if pred[1] not in df.columns:
            return pd.Series(False, index=df.index)
        return df[pred[1]].notna()
    if op in ("==", "!=", ">=", "<=", ">", "<") and \
            (_is_expr(pred[1]) or _is_expr(pred[2])):
        a, b = _num_pd(pred[1], df), _num_pd(pred[2], df)
        if not isinstance(a, pd.Series):
            a = pd.Series(a, index=df.index)
        if not isinstance(b, pd.Series):
            b = pd.Series(b, index=df.index)
        # NaN on either side -> False, incl. for != (the null rule)
        return (_ARITH_CMP[op](a, b) & a.notna() & b.notna()).astype(bool)
    col = df[pred[1]]
    if op == "==":
        return (col == pred[2]).fillna(False).astype(bool)
    if op == "!=":
        # null != v is True in pandas object compare (no NaN to fill) —
        # force null->False to match _eval_row and _mask_arrow
        return ((col != pred[2]) & col.notna()).astype(bool)
    if op in (">=", "<=", ">", "<"):
        c = pd.to_numeric(col, errors="coerce")
        cmp = {">=": c.ge, "<=": c.le, ">": c.gt, "<": c.lt}[op](pred[2])
        return cmp.fillna(False).astype(bool)
    if op == "contains":
        return col.astype("string").str.contains(pred[2], regex=False).fillna(False).astype(bool)
    if op == "startswith":
        return col.astype("string").str.startswith(pred[2]).fillna(False).astype(bool)
    if op == "endswith":
        return col.astype("string").str.endswith(pred[2]).fillna(False).astype(bool)
    if op == "regex":
        return col.astype("string").str.contains(pred[2], regex=True).fillna(False).astype(bool)
    if op == "isempty":
        return (col.isna() | (col == "")).astype(bool)
    if op == "in":
        return col.isin(pred[2]).fillna(False).astype(bool)
    if op == "prifilt":
        c = pd.to_numeric(col, errors="coerce")
        return (c.ge(pred[2]) & c.le(pred[3])).fillna(False).astype(bool)
    raise ValueError(f"unknown predicate op {op!r}")


def _eval_row(pred: tuple, row: dict) -> bool:
    """Per-row reference implementation (oracle path)."""
    op = pred[0]
    if op == "true":
        return True
    if op == "and":
        return _eval_row(pred[1], row) and _eval_row(pred[2], row)
    if op == "or":
        return _eval_row(pred[1], row) or _eval_row(pred[2], row)
    if op == "not":
        return not _eval_row(pred[1], row)
    if op == "exists":
        v = row.get(pred[1])
        return not (v is None or (isinstance(v, float) and np.isnan(v))
                    or v is pd.NA or v is pd.NaT)
    if op in ("==", "!=", ">=", "<=", ">", "<") and \
            (_is_expr(pred[1]) or _is_expr(pred[2])):
        a, b = _num_row(pred[1], row), _num_row(pred[2], row)
        if np.isnan(a) or np.isnan(b):
            return False
        return bool(_ARITH_CMP[op](a, b))
    v = row.get(pred[1])
    isnull = v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA or v is pd.NaT
    if op == "==":
        return (not isnull) and v == pred[2]
    if op == "!=":
        return (not isnull) and v != pred[2]
    if op in (">=", "<=", ">", "<"):
        if isnull:
            return False
        try:
            f = float(v)
        except (TypeError, ValueError):
            return False
        return {">=": f >= pred[2], "<=": f <= pred[2],
                ">": f > pred[2], "<": f < pred[2]}[op]
    if op == "contains":
        return (not isnull) and pred[2] in str(v)
    if op == "startswith":
        return (not isnull) and str(v).startswith(pred[2])
    if op == "endswith":
        return (not isnull) and str(v).endswith(pred[2])
    if op == "regex":
        return (not isnull) and re.search(pred[2], str(v)) is not None
    if op == "isempty":
        return isnull or v == ""
    if op == "in":
        return (not isnull) and v in pred[2]
    if op == "prifilt":
        if isnull:
            return False
        return pred[2] <= float(v) <= pred[3]
    raise ValueError(f"unknown predicate op {op!r}")


def _mask_arrow(pred: tuple, t):
    """Arrow-vectorized predicate evaluation (pc kernels, null->False)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def nn(arr):  # null -> False, matching the reference comparison rules
        return pc.fill_null(arr, False)

    op = pred[0]
    if op == "true":
        return pa.array(np.ones(len(t), dtype=bool))
    if op == "and":
        return pc.and_(_mask_arrow(pred[1], t), _mask_arrow(pred[2], t))
    if op == "or":
        return pc.or_(_mask_arrow(pred[1], t), _mask_arrow(pred[2], t))
    if op == "not":
        return pc.invert(_mask_arrow(pred[1], t))
    if op == "exists":
        if pred[1] not in t.column_names:
            return pa.array(np.zeros(len(t), dtype=bool))
        return pc.is_valid(t[pred[1]].combine_chunks()
                           if isinstance(t[pred[1]], pa.ChunkedArray)
                           else t[pred[1]])
    if op in ("==", "!=", ">=", "<=", ">", "<") and \
            (_is_expr(pred[1]) or _is_expr(pred[2])):
        a, b = _num_arrow(pred[1], t), _num_arrow(pred[2], t)
        cmp = {"==": pc.equal, "!=": pc.not_equal,
               ">=": pc.greater_equal, "<=": pc.less_equal,
               ">": pc.greater, "<": pc.less}[op](a, b)
        if isinstance(cmp, pa.Scalar):    # lit-only both sides
            v = bool(nn(cmp).as_py())
            return pa.array(np.full(len(t), v, dtype=bool))
        # NaN arithmetic results compare False already; nn() covers
        # nulls from the source columns
        return nn(cmp)
    col = t[pred[1]]
    if op == "==":
        return nn(pc.equal(col, pred[2]))
    if op == "!=":
        return nn(pc.not_equal(col, pred[2]))
    if op == ">=":
        return nn(pc.greater_equal(col, pred[2]))
    if op == "<=":
        return nn(pc.less_equal(col, pred[2]))
    if op == ">":
        return nn(pc.greater(col, pred[2]))
    if op == "<":
        return nn(pc.less(col, pred[2]))
    if op == "contains":
        return nn(pc.match_substring(col, pred[2]))
    if op == "startswith":
        return nn(pc.starts_with(col, pred[2]))
    if op == "endswith":
        return nn(pc.ends_with(col, pred[2]))
    if op == "regex":
        return nn(pc.match_substring_regex(col, pred[2]))
    if op == "isempty":
        return pc.or_(col.is_null(), nn(pc.equal(col, "")))
    if op == "in":
        return nn(pc.is_in(col, value_set=pa.array(pred[2])))
    if op == "prifilt":
        return pc.and_(nn(pc.greater_equal(col, pred[2])),
                       nn(pc.less_equal(col, pred[3])))
    raise ValueError(f"unknown predicate op {op!r}")


class Router:
    """Ordered route program with fan-out + stop semantics."""

    def __init__(self, routes: list[Route]):
        self.routes = routes
        self.sinks = []
        for r in routes:
            if r.sink not in self.sinks:
                self.sinks.append(r.sink)

    def masks(self, df: pd.DataFrame) -> dict[str, pd.Series]:
        """One boolean mask per sink, stop semantics applied in order.
        A sink referenced by several routes gets the OR of its masks."""
        consumed = pd.Series(False, index=df.index)
        out = {s: pd.Series(False, index=df.index) for s in self.sinks}
        for r in self.routes:
            m = _mask(r.pred, df) & ~consumed
            out[r.sink] = out[r.sink] | m
            if r.stop:
                consumed = consumed | m
        return out

    def masks_arrow(self, t) -> dict:
        """Arrow-native masks (same semantics; pc kernels throughout)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        consumed = pa.array(np.zeros(len(t), dtype=bool))
        out = {s: pa.array(np.zeros(len(t), dtype=bool)) for s in self.sinks}
        for r in self.routes:
            m = pc.and_not(_mask_arrow(r.pred, t), consumed)
            out[r.sink] = pc.or_(out[r.sink], m)
            if r.stop:
                consumed = pc.or_(consumed, m)
        return out

    def route_row(self, row: dict) -> list[str]:
        """Oracle path: sinks this row is delivered to, in route order."""
        hit = []
        for r in self.routes:
            if _eval_row(r.pred, row):
                if r.sink not in hit:
                    hit.append(r.sink)
                if r.stop:
                    break
        return hit


# ----------------------------------------------------------------------
# Fixture route program (F5) over the parsed+enriched pages frame.
# Covers every comparison class; overlapping routes (fan-out) and stop
# routes (dead-letter first, spam swallowed).
DEFAULT_ROUTES = [
    Route("deadletter", ("==", "parse_ok", False), stop=True),
    Route("spam", ("==", "category", "spam"), stop=True),
    Route("errors", ("prifilt", "p_sev", 0, 3)),
    Route("failures", ("contains", "p_msg", "fail")),
    Route("en_news", ("and", ("==", "lang", "en"), ("==", "category", "news"))),
    Route("h0_hosts", ("startswith", "p_host", "h00")),
    Route("lucky7", ("regex", "url", r"id=\d*7$")),
    Route("netapps", ("in", "p_app", ["nginx", "sshd"])),
    Route("empties", ("isempty", "p_msg")),
    Route("bigpages", (">=", "p_bytes", 60000)),
    Route("archive", ("true",)),
]


def default_router() -> Router:
    return Router(DEFAULT_ROUTES)
