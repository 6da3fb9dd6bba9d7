"""Mergeable sketches — approximate distinct counting at scale.

The reference deliberately has no sketches (cardinality is bounded by
dynstats maxCardinality refusal, runtime/dynstats.c:43-45); a 100 TB
engine wants them.  HyperLogLog here is the canonical mergeable shape:
one sketch per batch (map_batches), byte-wise max to merge (tiny
reduce), estimate at the end — the shuffle moves 2^p bytes per batch
regardless of cardinality.

Pure numpy, deterministic (pandas stable siphash), standard HLL
estimator with the small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% typical error)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (np.zeros(self.m, dtype=np.uint8)
                          if registers is None else registers)

    def add_array(self, values) -> "HLL":
        h = pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1 (rest's top bits are the
        # remaining 64-p hash bits; the OR-mask guarantees a 1 exists)
        lz = 63 - self._log2_floor(rest)
        rank = np.clip(lz + 1, 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    @staticmethod
    def _log2_floor(x: np.ndarray) -> np.ndarray:
        out = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v >= (np.uint64(1) << np.uint64(shift))
            out[mask] += shift
            v[mask] >>= np.uint64(shift)
        return out

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-batch HLL sketches merged
    on the driver (one 4 KiB sketch per batch crosses the wire)."""
    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        h = HLL(p).add_array(df[col].to_numpy())
        return pd.DataFrame({"sketch": [h.to_bytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    acc = HLL(p)
    for b in parts["sketch"]:
        acc = acc.merge(HLL.from_bytes(b, p))
    return acc.estimate()


DRIVER_THRESHOLD = 2_000_000  # partial rows above which finals go distributed


def exact_distinct_per_key(ds, key: str, col: str, npart: int = 64,
                           driver_threshold: int = DRIVER_THRESHOLD):
    """Exact distinct-count per key via two-phase distinct: per-batch
    (key, value) dedup (the combiner), then an ADAPTIVE final — the
    combiner output is materialized (it is the post-dedup partial
    stream, not the corpus) and counted; below ``driver_threshold``
    rows the final distinct runs as one pandas pass on the driver,
    above it the (key, value) space is hash-partitioned so each
    partition dedups independently and only per-key partial counts
    reach the driver (per-key counts are bounded by key cardinality).
    Beyond exactness budgets, use approx_distinct."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, col]].drop_duplicates()

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    if partials.count() <= driver_threshold:
        parts = partials.to_pandas()
        out = (parts.drop_duplicates().groupby(key).size()
               .rename("distinct_cnt").reset_index())
        return out.astype({"distinct_cnt": "int64"})

    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[[key, col]], index=False).to_numpy()
        return df.assign(__pk=(h % np.uint64(npart)).astype("int64"))

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates([key, col])
        return (u.groupby(key).size().rename("part_cnt").reset_index())

    parts2 = (partials.map_batches(add_pk, batch_format="pandas")
              .groupby("__pk").map_groups(count_part, batch_format="pandas")
              .to_pandas())
    out = (parts2.groupby(key)["part_cnt"].sum()
           .rename("distinct_cnt").reset_index())
    return out.astype({"distinct_cnt": "int64"})


def distinct_rows(ds, cols: list[str], npart: int = 64,
                  driver_threshold: int = DRIVER_THRESHOLD):
    """Exact multi-column distinct with the same adaptive final:
    combiner dedup per batch, then driver drop_duplicates when the
    partials are small, else a hash-partitioned distributed dedup
    (equal rows land in one partition, so the dedup is exact)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    if partials.count() <= driver_threshold:
        return (partials.to_pandas().drop_duplicates()
                .reset_index(drop=True))

    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[cols], index=False).to_numpy()
        return df.assign(__pk=(h % np.uint64(npart)).astype("int64"))

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols).drop(columns="__pk")

    return (partials.map_batches(add_pk, batch_format="pandas")
            .groupby("__pk").map_groups(drop, batch_format="pandas"))


# ---------------------------------------------------------------------
# DDSketch-style quantile sketch — perctile_stats at unbounded scale

class QuantileSketch:
    """Log-binned quantile sketch with bounded RELATIVE error
    (DDSketch scheme): bin(x) = ceil(log_gamma(x)), gamma =
    (1+a)/(1-a) for accuracy ``a``; counts merge by addition, so
    per-batch sketches reduce like HLL.  The scale path for
    perctile_stats (runtime/perctile_stats.c) when a group's values no
    longer fit one worker: the sketch is O(log(range)/a) bins no
    matter how many observations.  Non-negative values (latencies,
    sizes — the reference's percentile domains); zeros tracked
    exactly."""

    def __init__(self, rel_err: float = 0.01,
                 bins: dict | None = None, zeros: int = 0):
        self.rel_err = rel_err
        self.gamma = (1 + rel_err) / (1 - rel_err)
        self._lg = np.log(self.gamma)
        self.bins: dict[int, int] = bins or {}
        self.zeros = zeros

    def add_array(self, vals) -> "QuantileSketch":
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if (v < 0).any():
            raise ValueError("QuantileSketch: negative values unsupported")
        self.zeros += int((v == 0).sum())
        pos = v[v > 0]
        if len(pos):
            idx = np.ceil(np.log(pos) / self._lg).astype(np.int64)
            uniq, cnt = np.unique(idx, return_counts=True)
            for i, c in zip(uniq, cnt):
                self.bins[int(i)] = self.bins.get(int(i), 0) + int(c)
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        assert abs(self.gamma - other.gamma) < 1e-12
        out = dict(self.bins)
        for i, c in other.bins.items():
            out[i] = out.get(i, 0) + c
        return QuantileSketch(self.rel_err, out, self.zeros + other.zeros)

    @property
    def count(self) -> int:
        return self.zeros + sum(self.bins.values())

    def quantile(self, q: float) -> float:
        n = self.count
        if n == 0:
            return float("nan")
        rank = q * (n - 1)
        if rank < self.zeros:
            return 0.0
        seen = self.zeros
        for i in sorted(self.bins):
            seen += self.bins[i]
            if seen > rank:
                # bin midpoint: gamma^i * 2/(gamma+1) has rel err <= a
                return float(self.gamma ** i * 2 / (self.gamma + 1))
        i = max(self.bins)
        return float(self.gamma ** i * 2 / (self.gamma + 1))


def approx_percentiles(ds, key: str, value: str, percentiles,
                       rel_err: float = 0.01) -> pd.DataFrame:
    """Per-key approximate percentiles via mergeable sketches: one
    sketch per (batch, key) crosses the wire (O(bins) each), merged on
    the driver — no per-group value materialization anywhere."""
    import json as _json

    def part(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"k": [], "sk": [], "z": []}
        for k, g in df.groupby(key, dropna=False, observed=True):
            s = QuantileSketch(rel_err).add_array(g[value].to_numpy())
            rows["k"].append(k)
            rows["sk"].append(_json.dumps(s.bins))
            rows["z"].append(s.zeros)
        return pd.DataFrame(rows)

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    out = {key: [], **{f"p{int(p * 100)}": [] for p in percentiles}}
    for k, g in parts.groupby("k"):
        acc = QuantileSketch(rel_err)
        for sk, z in zip(g["sk"], g["z"]):
            acc = acc.merge(QuantileSketch(
                rel_err, {int(i): c for i, c in _json.loads(sk).items()}, z))
        out[key].append(k)
        for p in percentiles:
            out[f"p{int(p * 100)}"].append(acc.quantile(p))
    return pd.DataFrame(out)


PCTL_REL_ERR = 0.01


def pctl_bin_series(s, rel_err: float = PCTL_REL_ERR):
    """DDSketch bin label per value — the compile target for
    ``percentile_observe("name", expr)`` in .conf configs
    (perctile_stats analog, runtime/perctile_stats.c): 'z' for zeros,
    'n' for null/negative (ignored at quantile time), else
    str(ceil(log_gamma(x))).  String labels so observations ride the
    existing (kind, key, cnt) aggregate-partial channel — mergeable by
    count addition, resume/idempotence for free."""
    import pandas as pd

    v = pd.to_numeric(s, errors="coerce").astype("float64").to_numpy()
    gamma = (1 + rel_err) / (1 - rel_err)
    out = np.full(len(v), "n", dtype=object)
    zero = v == 0
    pos = v > 0
    out[zero] = "z"
    if pos.any():
        with np.errstate(divide="ignore"):
            idx = np.ceil(np.log(np.where(pos, v, 1.0))
                          / np.log(gamma)).astype(np.int64)
        out[pos] = idx[pos].astype(str).astype(object)
    return pd.Series(out, index=s.index, dtype=object)


def quantiles_from_bins(keys, counts, qs,
                        rel_err: float = PCTL_REL_ERR) -> dict:
    """Rebuild the sketch from aggregated (bin-label, count) rows and
    answer quantiles — the read side of pctl_bin_series."""
    sk = QuantileSketch(rel_err)
    for k, c in zip(keys, counts):
        k = str(k)
        if k == "z":
            sk.zeros += int(c)
        elif k != "n":
            sk.bins[int(k)] = sk.bins.get(int(k), 0) + int(c)
    return {q: sk.quantile(q) for q in qs}


# ---------------------------------------------------------------------
# Heavy hitters — EXACT top-k by frequency without shuffling the
# vocabulary.  Misra-Gries summaries are mergeable (Agarwal et al.
# 2012, "Mergeable Summaries"): per-batch counters reduce to a fixed
# width w, the driver merges O(n_batches × w) tiny rows, and a second
# broadcast-candidates pass recounts only the ≤w survivors exactly.
# Where ngram_topk hash-partitions O(distinct grams) across the
# cluster, this moves nothing but bounded summaries — the right shape
# when the vocabulary itself is corpus-scale but the answer is tiny.
# The MG undercount bound makes the result PROVABLY exact: any item
# absent from the candidate set has true frequency ≤ D (the total
# decrement applied across all reduces), so if the exact k-th
# candidate count exceeds D the top-k cannot be displaced; otherwise
# the operator widens w and reruns (terminates: at w ≥ vocab, D = 0).
# rsyslog analog: dynstats maxCardinality refusal
# (runtime/dynstats.c:43-45) — the reference punts on unbounded key
# spaces; this is the bounded-memory answer.
# ---------------------------------------------------------------------

def mg_reduce(tokens: np.ndarray, counts: np.ndarray, width: int
              ) -> tuple[np.ndarray, np.ndarray, int]:
    """Reduce exact (or merged-MG) counters to at most ``width``
    survivors: subtract the (width+1)-th largest count from every
    counter, drop non-positive.  Returns (tokens, counts, dec) where
    ``dec`` bounds the additional per-item undercount introduced."""
    if len(tokens) <= width:
        return tokens, counts.astype(np.int64), 0
    order = np.argsort(counts, kind="stable")[::-1]
    dec = int(counts[order[width]])
    keep = order[:width]
    kept = counts[keep] - dec
    pos = kept > 0
    return tokens[keep][pos], kept[pos].astype(np.int64), dec


def _word_tokens(texts: pd.Series) -> pd.Series:
    """The ngram_topk normalization contract (mirrored by the DuckDB
    oracle): lower, [^a-z0-9]+ -> space, split, drop empties."""
    ex = (texts.str.lower()
          .str.replace(r"[^a-z0-9]+", " ", regex=True)
          .str.split().explode().dropna())
    return ex[ex != ""]


def heavy_hitters(ds, col: str, k: int = 20, *, width: int = 0,
                  tokenize: bool = False, max_rounds: int = 8
                  ) -> pd.DataFrame:
    """Exact global top-``k`` items of ``col`` by frequency (cnt desc,
    token asc), computed via bounded MG summaries + a broadcast exact
    recount.  ``tokenize=True`` treats the column as text and counts
    words; otherwise values count as opaque items (cast to str).
    Ray must already be initialised by the caller."""
    import ray

    w = width or max(64, 8 * k)
    for _ in range(max_rounds):
        w_cur = w

        def partial(df: pd.DataFrame, _w=w_cur) -> pd.DataFrame:
            s = _word_tokens(df[col]) if tokenize else \
                df[col].dropna().astype(str)
            toks, cnts = np.unique(s.to_numpy(dtype=object),
                                   return_counts=True)
            toks, cnts, dec = mg_reduce(toks, cnts, _w)
            n_tok = int(len(s))
            return pd.DataFrame({
                "token": np.concatenate([toks, [None]]),
                "cnt": np.concatenate([cnts, [0]]).astype("int64"),
                "dec": np.concatenate(
                    [np.zeros(len(toks), np.int64), [dec]]),
                "n_tok": np.concatenate(
                    [np.zeros(len(toks), np.int64), [n_tok]]),
            })

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        d_total = int(parts["dec"].sum())
        merged = (parts[parts["token"].notna()]
                  .groupby("token", as_index=False)["cnt"].sum())
        ct, cc, dec2 = mg_reduce(merged["token"].to_numpy(dtype=object),
                                 merged["cnt"].to_numpy(), w_cur)
        d_total += dec2
        if not len(ct):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})

        # ---- pass 2: exact recount of the ≤w candidates (broadcast)
        cand_ref = ray.put(pd.Index(ct))

        def recount(df: pd.DataFrame, _ref=cand_ref) -> pd.DataFrame:
            idx = ray.get(_ref) if not isinstance(_ref, pd.Index) else _ref
            s = _word_tokens(df[col]) if tokenize else \
                df[col].dropna().astype(str)
            toks, cnts = np.unique(s.to_numpy(dtype=object),
                                   return_counts=True)
            pos = idx.get_indexer(toks)
            hit = pos >= 0
            return pd.DataFrame({"ti": pos[hit].astype("int64"),
                                 "c": cnts[hit].astype("int64")})

        rc = ds.map_batches(recount, batch_format="pandas").to_pandas()
        exact = rc.groupby("ti")["c"].sum()
        out = (pd.DataFrame({"token": np.asarray(ct, dtype=object)[
                                 exact.index.to_numpy()],
                             "cnt": exact.to_numpy().astype("int64")})
               .sort_values(["cnt", "token"], ascending=[False, True])
               .head(k).reset_index(drop=True))
        # exactness certificate: nothing outside the candidate set can
        # reach the k-th count (missing items have true freq ≤ d_total)
        if len(out) and (len(out) < k or int(out["cnt"].iloc[-1]) > d_total):
            return out
        if d_total == 0:
            return out                      # full vocabulary counted
        w *= 4
    raise RuntimeError(
        f"heavy_hitters failed to certify exactness at width {w // 4}")


def heavy_hitters_oracle(values: pd.Series, k: int = 20, *,
                         tokenize: bool = False) -> pd.DataFrame:
    """Driver-side pandas spec oracle for pytest."""
    s = _word_tokens(values) if tokenize else values.dropna().astype(str)
    vc = s.value_counts()
    df = pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                       "cnt": vc.to_numpy().astype("int64")})
    return (df.sort_values(["cnt", "token"], ascending=[False, True])
            .head(k).reset_index(drop=True))


# ---------------------------------------------------------------------
# Exact distributed quantiles — iterative histogram refinement
# (distributed selection / "median of a distributed file", the classic
# multi-round bisection: each pass broadcasts candidate intervals,
# workers return O(bins) counts, the driver narrows every target rank
# into one bin).  EXACT order statistics without ever sorting or
# collecting the column: per pass the wire carries
# O(batches × targets × bins) small ints, and the one final collect is
# capped at ``collect_cap`` values per target.  At 100 TB this is
# 3-4 column-pruned streaming passes instead of a full-column
# range-partition sort.  The approximate path (QuantileSketch above)
# stays the default for per-key percentiles; this is the global-exact
# complement — the reference's perctile_stats keeps every observation
# per window (runtime/perctile_stats.c:33-36 "keeps all samples"),
# which is exactly what cannot scale; selection gives the same exact
# answer with bounded memory.
# ---------------------------------------------------------------------

def exact_quantiles(ds, col: str, q_pcts, *, bins: int = 512,
                    collect_cap: int = 65536, max_rounds: int = 12
                    ) -> pd.DataFrame:
    """Exact quantiles of numeric ``col`` (nulls/NaN dropped) at
    integer percents ``q_pcts``.  The rank spec (mirrored by the
    DuckDB oracle in SQL_TAIL): the r-th smallest value with
    r = (pct*n + 99) // 100, 1-indexed — integer-exact, no float
    rank arithmetic.  Returns columns (q_pct int64, value float64);
    the value is an actual element of the column, so engine and
    oracle agree bit-for-bit."""
    import ray

    def extent(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pd.DataFrame({"n": [len(v)], "lo": [v.min()], "hi": [v.max()]})

    ext = ds.map_batches(extent, batch_format="pandas").to_pandas()
    n = int(ext["n"].sum())
    if n == 0:
        return pd.DataFrame({"q_pct": pd.Series(q_pcts, dtype="int64"),
                             "value": np.full(len(q_pcts), np.nan)})
    glo, ghi = float(ext["lo"].min()), float(ext["hi"].max())

    # per-target selection state: rank (1-indexed among sorted values),
    # candidate interval [lo, hi] (inclusive), below = #values < lo,
    # cnt = #values in [lo, hi]
    tgt = []
    for pct in q_pcts:
        r = (int(pct) * n + 99) // 100
        tgt.append({"pct": int(pct), "r": max(1, min(n, r)),
                    "lo": glo, "hi": ghi, "below": 0, "cnt": n,
                    "done": glo == ghi})

    for _ in range(max_rounds):
        active = [t for t in tgt
                  if not t["done"] and t["cnt"] > collect_cap]
        if not active:
            break
        edges = [np.linspace(t["lo"], t["hi"], bins + 1) for t in active]
        eref = ray.put(edges)

        def hist_part(df: pd.DataFrame, _ref=eref) -> pd.DataFrame:
            eds = ray.get(_ref) if not isinstance(_ref, list) else _ref
            v = df[col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            rows = {"ti": [], "blob": []}
            for i, e in enumerate(eds):
                inw = v[(v >= e[0]) & (v <= e[-1])]
                # side='right' on interior edges: a value equal to an
                # edge lands in the bin STARTING at that edge, so bins
                # below b hold values strictly < edges[b]
                h = np.bincount(
                    np.searchsorted(e[1:-1], inw, side="right"),
                    minlength=len(e) - 1).astype(np.int64)
                rows["ti"].append(i)
                rows["blob"].append(h.tobytes())
            return pd.DataFrame(rows)

        parts = ds.map_batches(hist_part, batch_format="pandas").to_pandas()
        for i, t in enumerate(active):
            hs = [np.frombuffer(b, dtype=np.int64)
                  for b in parts.loc[parts["ti"] == i, "blob"]]
            h = np.sum(hs, axis=0) if hs else np.zeros(bins, np.int64)
            cum = np.cumsum(h)
            want = t["r"] - t["below"]          # rank within [lo, hi]
            b = int(np.searchsorted(cum, want, side="left"))
            e = edges[i]
            new_lo, new_hi = float(e[b]), float(e[b + 1])
            new_below = t["below"] + int(cum[b] - h[b])
            new_cnt = int(h[b])
            if new_lo >= new_hi or (new_lo == t["lo"] and
                                    new_hi == t["hi"]):
                t["done"] = True               # fp-width floor reached
            t["lo"], t["hi"] = new_lo, new_hi
            t["below"], t["cnt"] = new_below, new_cnt

    # final bounded collect: values inside each surviving interval
    ivs = [(t["lo"], t["hi"]) for t in tgt]
    iref = ray.put(ivs)

    def collect(df: pd.DataFrame, _ref=iref) -> pd.DataFrame:
        iv = ray.get(_ref) if not isinstance(_ref, list) else _ref
        v = df[col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        rows = {"ti": [], "val": []}
        for i, (lo, hi) in enumerate(iv):
            inw = v[(v >= lo) & (v <= hi)]
            rows["ti"].extend([i] * len(inw))
            rows["val"].extend(inw)
        return pd.DataFrame({"ti": pd.Series(rows["ti"], dtype="int64"),
                             "val": pd.Series(rows["val"],
                                              dtype="float64")})

    got = ds.map_batches(collect, batch_format="pandas").to_pandas()
    out_v = []
    for i, t in enumerate(tgt):
        vals = got.loc[got["ti"] == i, "val"].to_numpy()
        want = t["r"] - t["below"]
        vs = np.sort(vals)
        out_v.append(float(vs[want - 1]))
    return pd.DataFrame({"q_pct": pd.Series([t["pct"] for t in tgt],
                                            dtype="int64"),
                         "value": np.asarray(out_v, dtype=np.float64)})


def exact_quantiles_oracle(values, q_pcts) -> pd.DataFrame:
    """Driver-side spec oracle: same integer rank rule over a sort."""
    v = np.sort(np.asarray(pd.Series(values).dropna(), dtype=np.float64))
    n = len(v)
    rows = [(int(p), float(v[max(1, min(n, (int(p) * n + 99) // 100)) - 1]))
            for p in q_pcts]
    return pd.DataFrame({"q_pct": pd.Series([r[0] for r in rows],
                                            dtype="int64"),
                         "value": np.asarray([r[1] for r in rows])})


# ---------------------------------------------------------------------
# Count-Min sketch — the mergeable frequency table for UNBOUNDED key
# spaces (Cormode & Muthukrishnan 2005).  Where Misra-Gries (above)
# answers "what are the top-k", CM answers point queries
# "count(x) ≤ est(x) ≤ count(x) + εN" for ANY x, with ε = e/width and
# failure probability e^-depth — the standard choice when the probe
# set is not known while streaming (dynstats over an unbounded key
# space; runtime/dynstats.c refuses past maxCardinality, CM degrades
# gracefully instead).  Depth × width int64 cells merge by addition,
# so per-batch sketches reduce exactly like HLL partials.
# ---------------------------------------------------------------------

class CountMin:
    """Vectorized Count-Min over string/object keys.  Row i uses the
    double-hashing scheme idx_i = (h1 + (i+1)·h2) mod width with two
    independent siphash streams (pandas hash_array, second key as in
    stages/dedup.content_key128_frame) — deterministic across
    processes, C-speed, no per-row Python."""

    def __init__(self, width: int = 4096, depth: int = 4,
                 table: np.ndarray | None = None):
        self.width = width
        self.depth = depth
        self.table = (table if table is not None
                      else np.zeros((depth, width), dtype=np.int64))

    def _rows(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) int row indices for object-array ``keys``."""
        h1 = pd.util.hash_array(keys).astype(np.uint64)
        h2 = pd.util.hash_array(keys, hash_key="raylog-dedup-2nd"
                                ).astype(np.uint64)
        ks = np.arange(1, self.depth + 1, dtype=np.uint64)[:, None]
        return ((h1[None, :] + ks * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add_array(self, keys, counts=None) -> "CountMin":
        ks = np.asarray(keys, dtype=object)
        if not len(ks):
            return self
        # pre-unique: one add.at per distinct key, not per occurrence
        uk, inv = np.unique(ks, return_inverse=True)
        c = (np.bincount(inv, minlength=len(uk)).astype(np.int64)
             if counts is None else
             np.bincount(inv, weights=np.asarray(counts, np.float64),
                         minlength=len(uk)).astype(np.int64))
        idx = self._rows(uk)
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], c)
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        assert (self.width, self.depth) == (other.width, other.depth)
        return CountMin(self.width, self.depth, self.table + other.table)

    def estimate(self, keys) -> np.ndarray:
        ks = np.asarray(keys, dtype=object)
        if not len(ks):
            return np.empty(0, dtype=np.int64)
        idx = self._rows(ks)
        ests = np.stack([self.table[d, idx[d]] for d in range(self.depth)])
        return ests.min(axis=0).astype(np.int64)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, width: int, depth: int) -> "CountMin":
        t = np.frombuffer(b, dtype=np.int64).reshape(depth, width).copy()
        return cls(width, depth, t)


def cms_word_counts(ds, col: str, probes: list[str], *,
                    width: int = 4096, depth: int = 4) -> pd.DataFrame:
    """Build one merged Count-Min over the word stream of ``col``
    (heavy_hitters' tokenization contract) and answer point queries
    for ``probes``.  One streaming pass; each batch ships a
    depth×width int64 blob; the driver reduce is O(batches) adds.
    Guarantee (pinned in pytest): est ≥ exact always, and
    est ≤ exact + εN with ε = e/width per hash row."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        s = _word_tokens(df[col])
        cm = CountMin(width, depth).add_array(s.to_numpy(dtype=object))
        return pd.DataFrame({"blob": [cm.to_bytes()],
                             "n": [int(len(s))]})

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    acc = CountMin(width, depth)
    for b in parts["blob"]:
        acc = acc.merge(CountMin.from_bytes(b, width, depth))
    est = acc.estimate(np.asarray(probes, dtype=object))
    return pd.DataFrame({"token": pd.Series(probes, dtype=object),
                         "est": est,
                         "n_stream": np.int64(parts["n"].sum())})


def approx_distinct_per_key(ds, key: str, col: str, *, p: int = 10
                            ) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT col) PER KEY — the HLL two-phase:
    each batch ships one 2^p-byte register blob per key it saw
    (the combiner), the driver reduce is register-wise max per key.
    For unbounded per-key value spaces where
    :func:`exact_distinct_per_key`'s distinct-row shuffle would move
    the values themselves: the wire carries O(batches × keys × 2^p)
    bytes, independent of value cardinality.  Error ~1.04/sqrt(2^p)
    (pinned in pytest); sketches merge associatively, so any batch
    split gives the identical final registers."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"k": [], "blob": []}
        for k, grp in df.groupby(key, dropna=True):
            rows["k"].append(k)
            rows["blob"].append(HLL(p).add_array(
                grp[col].to_numpy()).to_bytes())
        return pd.DataFrame(rows)

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    out = {"dk": [], "est": []}
    for k, grp in parts.groupby("k"):
        acc = HLL(p)
        for b in grp["blob"]:
            acc = acc.merge(HLL.from_bytes(b, p))
        out["dk"].append(k)
        out["est"].append(int(np.floor(acc.estimate() + 0.5)))
    return (pd.DataFrame({key: out["dk"],
                          "approx_distinct": pd.Series(out["est"],
                                                       dtype="int64")})
            .sort_values(key).reset_index(drop=True))


def _md5_key_frame(df, id_col: str, extra_cols=()) -> "pd.DataFrame":
    """(id, h[, extras]) rows with h = md5(str(id)) hexdigest — the
    hash spec every bottom-k sampling SQL oracle pins; ONE definition
    so an edit can't break the engine/oracle parity of only one
    query."""
    import hashlib

    s = df[id_col].astype(str)
    h = np.fromiter(
        (hashlib.md5(v.encode()).hexdigest() for v in s),
        dtype=object, count=len(s))
    cols = {id_col: df[id_col].to_numpy(), "h": h}
    for c in extra_cols:
        cols[c] = df[c].to_numpy()
    return pd.DataFrame(cols)


def bottomk_sample(ds, id_col: str, k: int = 20) -> pd.DataFrame:
    """Deterministic uniform sample of ``k`` rows: keep the k items
    whose md5(str(id)) digests sort smallest — the mergeable BOTTOM-K
    sketch (a hash is a uniform draw in [0,1), so the k smallest
    hashes are a uniform-without-replacement sample; merging two
    summaries = union + re-truncate).  Unlike a seeded RNG sample the
    result is independent of partitioning, arrival order and retries,
    and a SQL oracle (ORDER BY md5(id) LIMIT k) reproduces it exactly.

    Scale shape: each batch ships at most k (id, hash) rows; the
    driver reduce is O(batches * k).  md5 is per-row C (hashlib) on
    the id string only — the sampled columns never move."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _md5_key_frame(df, id_col)
        return t.sort_values(["h", id_col]).head(k)

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas())
    return (parts.sort_values(["h", id_col]).head(k)
            .reset_index(drop=True))


def bottomk_sample_bykey(ds, key_col: str, id_col: str,
                         k: int = 3) -> pd.DataFrame:
    """Per-key deterministic uniform sample — :func:`bottomk_sample`
    stratified: the k smallest md5(str(id)) WITHIN each key.  Each
    batch ships at most k rows per key it contains, the driver merge
    is O(batches * keys * k); same partition/order/retry invariance,
    same exact SQL oracle (row_number over md5)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _md5_key_frame(df, id_col, extra_cols=(key_col,))
        t = t.sort_values(["h", id_col])
        return t.groupby(key_col, sort=False).head(k)

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas())
    out = (parts.sort_values(["h", id_col])
           .groupby(key_col, sort=True).head(k))
    return (out.sort_values([key_col, "h"])
            .reset_index(drop=True))
