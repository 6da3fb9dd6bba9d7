"""Iterative graph algorithms — the power-iteration counterpart to
stages/dedup.connected_components.

``pagerank_int`` runs PageRank in PURE int64 arithmetic so a SQL
oracle can unroll the same iterations and match hash-exactly:

    r_0(v)    = init                      (every node with an edge)
    contrib(u)= r_t(u) // outdeg(u)       (integer division)
    r_{t+1}(v)= base + (damp_num * SUM_incoming contrib) // damp_den

With the conventional damping 0.85 expressed as 85//100 and ranks in
micro-units, every operation is an exact integer op — no float
accumulation order to diverge between engine and oracle (CLAUDE.md
invariant 6 applied to an iterative algorithm).

Scale shape: the EDGES stay a Dataset and are the only corpus-sized
thing; each iteration broadcasts the O(nodes) rank/degree table
(``ray.put`` once per iteration) and ships per-batch partial
contribution sums — the same broadcast-small / combiner-partial
pattern as semi_join's broadcast final.  The documented assumption is
a rank table that fits the driver (millions of nodes); past that,
swap the broadcast for the hash-partitioned join shape
(join.hash_join) without touching the arithmetic.

Reference relationship: rsyslog has no graph ops; this is engine
extension surface (SURVEY.md §8 'beyond-reference'), included because
link-graph ranking is a standard web-corpus curation signal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank_int(edges_ds, src: str, dst: str, *, iters: int = 3,
                 init: int = 1_000_000, base: int = 150_000,
                 damp_num: int = 85, damp_den: int = 100,
                 rank_col: str = "rank_u") -> pd.DataFrame:
    """PageRank over a directed edge Dataset in integer micro-units.
    Returns (node, rank_u) for every node that has at least one
    outgoing edge (symmetrize the graph upstream if sinks matter).
    Nodes with no incoming edges hold ``base`` after one step."""
    import ray

    from .aggregate import two_phase_agg

    # Pin the edge blocks ONCE: an iterative algorithm re-reads its
    # edges every round, and a lazy upstream (a join + dedup here)
    # would re-execute per iteration — measured 217 s -> ~5 s at
    # sf0.1.  Object-store-resident blocks spill if they outgrow
    # memory; the standard iterative-engine tradeoff.
    edges_ds = edges_ds.materialize()
    deg = two_phase_agg(edges_ds.select_columns([src]), [src],
                        count="d")
    nodes = deg[src].to_numpy()
    d = deg["d"].to_numpy(np.int64)
    order = np.argsort(nodes, kind="mergesort")
    nodes, d = nodes[order], d[order]
    ranks = np.full(len(nodes), np.int64(init))

    for _ in range(iters):
        contrib = ranks // d
        ref = ray.put((nodes, contrib))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            nds, ctr = ray.get(ref)
            pos = np.searchsorted(nds, df[src].to_numpy())
            t = pd.DataFrame({"node": df[dst].to_numpy(),
                              "s": ctr[pos]})
            return t.groupby("node", as_index=False)["s"].sum()

        parts = (edges_ds.map_batches(partial, batch_format="pandas")
                 .to_pandas())
        sums = parts.groupby("node")["s"].sum()
        s = np.zeros(len(nodes), dtype=np.int64)
        snodes = sums.index.to_numpy()
        pos = np.searchsorted(nodes, snodes)
        # a dst with no outgoing edge is outside the rank table (the
        # documented contract) — mask it out instead of clobbering
        pos_c = np.minimum(pos, len(nodes) - 1)
        ok = nodes[pos_c] == snodes
        # nodes without incoming edges keep s=0 -> rank = base
        s[pos_c[ok]] = sums.to_numpy(np.int64)[ok]
        ranks = np.int64(base) + (np.int64(damp_num) * s) // np.int64(
            damp_den)

    return pd.DataFrame({"node": nodes,
                         rank_col: ranks}).reset_index(drop=True)


def bfs_hops(edges_ds, src: str, dst: str, sources: list, *,
             max_depth: int = 3, node_col: str = "node",
             dist_col: str = "d") -> pd.DataFrame:
    """Multi-source BFS hop distance over a directed edge Dataset —
    min #edges from any source, capped at ``max_depth`` (unreached
    nodes are absent).  Pure ints, so a recursive-CTE SQL oracle
    matches exactly.

    Scale shape: the edges stay a Dataset; each round broadcasts the
    CURRENT FRONTIER set (``ray.put`` once — at most O(nodes), usually
    far smaller), a map_batches pass emits each batch's unique
    frontier-adjacent destinations, and the driver folds the new nodes
    into the O(nodes) distance table.  Same broadcast-small posture
    (and the same driver-table assumption and hash-join escape hatch)
    as :func:`pagerank_int` above."""
    import ray

    # pin edge blocks once — see pagerank_int: a lazy upstream would
    # re-execute per BFS round
    edges_ds = edges_ds.materialize()
    dist: dict = {s: 0 for s in sources}
    frontier = set(sources)
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        f_ref = ray.put(frontier)

        def nxt(df: pd.DataFrame, _f=f_ref) -> pd.DataFrame:
            fr = ray.get(_f)
            hit = df[df[src].isin(fr)]
            return pd.DataFrame({"n": hit[dst].unique()})

        cand = set()
        for b in (edges_ds.map_batches(nxt, batch_format="pandas")
                  .iter_batches(batch_format="pandas",
                                batch_size=None)):
            if "n" in b.columns:
                cand.update(b["n"].tolist())
        frontier = {n for n in cand if n not in dist}
        for n in frontier:
            dist[n] = depth

    out = pd.DataFrame({node_col: list(dist),
                        dist_col: np.fromiter(dist.values(), "int64",
                                              len(dist))})
    return out.sort_values(node_col).reset_index(drop=True)


def resolve_chains(mapping_ds, src: str, dst: str, *,
                   rounds: int = 4, n_buckets: int = 32):
    """Redirect-chain resolution by POINTER JUMPING: given a mapping
    Dataset (u -> v) — e.g. HTTP 3xx redirect records from a crawl —
    return (u -> final) where ``final`` follows the chain until a node
    with no outgoing mapping.  Each round composes the mapping with
    ITSELF (m <- m . m), so ``rounds`` rounds resolve chains up to
    length 2**rounds; a cycle never terminates and simply lands on an
    arbitrary member after the doubling (documented, standard).

    Scale shape: the mapping stays a Dataset end-to-end; each round is
    one :func:`~rsyslog_ray.stages.join.hash_join` of two-int rows (a
    left join of the mapping against itself keyed on the CURRENT
    target), materialized so the next round doesn't re-execute the
    lazy upstream (the pagerank_int lesson above).  Nothing
    node-count-sized ever touches the driver — this is the
    chain-resolution counterpart of dedup.connected_components'
    contraction rounds.
    """
    from .join import hash_join

    cur = mapping_ds
    if src != "u" or dst != "t":
        cur = cur.map_batches(
            lambda df, _s=src, _d=dst: df[[_s, _d]].rename(
                columns={_s: "u", _d: "t"}),
            batch_format="pandas")
    for _ in range(max(0, int(rounds))):
        cur = cur.materialize()
        right = cur.map_batches(
            lambda df: df.rename(columns={"u": "t", "t": "nxt"}),
            batch_format="pandas")
        joined = hash_join(cur, right, "t", how="left",
                           n_buckets=n_buckets)

        def advance(df: pd.DataFrame) -> pd.DataFrame:
            nxt = df["nxt"]
            moved = nxt.notna() & (nxt != df["t"])
            t = df["t"].where(nxt.isna(), nxt)
            return pd.DataFrame({"u": df["u"].to_numpy(),
                                 "t": t.to_numpy(),
                                 "__mv": moved.to_numpy()
                                 .astype("int64")})

        cur = joined.map_batches(advance,
                                 batch_format="pandas").materialize()
        # early exit: real redirect mappings have short chains — once
        # a doubling round moves nothing, later rounds are identity
        # joins; the sum is over already-materialized int blocks
        moved_total = int(cur.sum("__mv") or 0)
        cur = cur.drop_columns(["__mv"])
        if moved_total == 0:
            break
    if src != "u" or dst != "t":
        cur = cur.map_batches(
            lambda df, _s=src, _d=dst: df.rename(
                columns={"u": _s, "t": _d}),
            batch_format="pandas")
    return cur


def hits_int(edges_ds, src: str, dst: str, *,
             scale: int = 1_000_000,
             node_col: str = "node",
             auth_col: str = "auth_u",
             hub_col: str = "hub_u") -> pd.DataFrame:
    """HITS hubs/authorities over a directed edge Dataset in pure
    int64 arithmetic (Kleinberg 1999), unrolled so a SQL oracle
    matches hash-exactly:

        a1(v) = indegree(v)                  (= sum of h0 == 1)
        h1(u) = SUM over (u,v) of a1(v)
        a2(v) = SUM over (u,v) of h1(u)

    then both vectors scale to ``scale`` micro-units by integer
    division with their max — no float normalization to diverge
    between engine and oracle.  Returns (node, auth_u, hub_u) for
    every node appearing as src or dst.

    Scale shape is :func:`pagerank_int`'s: edges stay a Dataset
    (materialized once — three passes), each half-iteration broadcasts
    the O(nodes) score table (``ray.put``) and ships per-batch partial
    sums; same driver-table assumption and hash-join escape hatch.
    """
    import ray

    from .aggregate import two_phase_agg

    edges_ds = edges_ds.materialize()
    deg = two_phase_agg(edges_ds.select_columns([dst]), [dst],
                        count="a")
    srcs = two_phase_agg(edges_ds.select_columns([src]), [src],
                         count="_o")
    nodes = np.union1d(deg[dst].to_numpy(), srcs[src].to_numpy())
    if len(nodes) == 0:       # no edges at all (link-free corpus)
        return pd.DataFrame({node_col: nodes,
                             auth_col: np.array([], dtype="int64"),
                             hub_col: np.array([], dtype="int64")})
    a = np.zeros(len(nodes), dtype=np.int64)
    pos = np.searchsorted(nodes, deg[dst].to_numpy())
    a[pos] = deg["a"].to_numpy(np.int64)

    def push(score: np.ndarray, key_in: str, key_out: str) -> np.ndarray:
        """One half-iteration: out(k_out) = SUM over edges of
        score[k_in] — broadcast score, per-batch combiner partials."""
        ref = ray.put((nodes, score))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            nds, sc = ray.get(ref)
            p = np.searchsorted(nds, df[key_in].to_numpy())
            t = pd.DataFrame({"node": df[key_out].to_numpy(),
                              "s": sc[p]})
            return t.groupby("node", as_index=False)["s"].sum()

        parts = (edges_ds.map_batches(partial, batch_format="pandas")
                 .to_pandas())
        sums = parts.groupby("node")["s"].sum()
        out = np.zeros(len(nodes), dtype=np.int64)
        p = np.searchsorted(nodes, sums.index.to_numpy())
        out[p] = sums.to_numpy(np.int64)
        return out

    h = push(a, dst, src)          # h1(u) = sum a1(dst)
    a2 = push(h, src, dst)         # a2(v) = sum h1(src)
    # int64 headroom: scores grow like edges x max-score per push —
    # numpy wraps SILENTLY on overflow, which would desync the engine
    # from the HUGEINT SQL oracle with no error.  Refuse loudly; the
    # caller's escape hatch is a smaller ``scale`` (the arithmetic
    # bound is max_score * scale < 2^63).
    lim = (1 << 63) - 1
    if int(a2.max()) > lim // max(1, int(scale)) \
            or int(h.max()) > lim // max(1, int(scale)):
        raise OverflowError(
            "hits_int scores exceed int64 headroom for this scale; "
            "pass a smaller scale=")
    s = np.int64(scale)
    auth = (a2 * s) // max(np.int64(1), a2.max())
    hub = (h * s) // max(np.int64(1), h.max())
    return pd.DataFrame({node_col: nodes, auth_col: auth,
                         hub_col: hub})


def symmetrize_unique_edges(pairs_ds, a: str, b: str, *,
                            src: str = "src", dst: str = "dst",
                            nparts: int = 32):
    """Globally-unique undirected edges -> both directed rows.
    (a, b) pairs hash-bucket by BOTH columns (one tiny-row shuffle;
    a duplicate pair lands in exactly one bucket), each bucket
    drop_duplicates VECTORIZED and emits (a->b) and (b->a).  Replaces
    the per-pair ``groupby([a, b]).map_groups`` shape, whose ~ms per
    Ray group made a 600k-pair dedup the whole pipeline's cost
    (CLAUDE.md invariant 3)."""

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        u = df[[a, b]].drop_duplicates().copy(deep=False)
        ha = pd.util.hash_array(u[a].to_numpy())
        hb = pd.util.hash_array(u[b].to_numpy())
        u["__pp"] = ((ha * np.uint64(0x9E3779B97F4A7C15) + hb)
                     % np.uint64(nparts)).astype("int64")
        return u

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g[[a, b]].drop_duplicates()
        return pd.DataFrame({
            src: np.concatenate([u[a].to_numpy(), u[b].to_numpy()]),
            dst: np.concatenate([u[b].to_numpy(), u[a].to_numpy()])})

    return (pairs_ds.map_batches(bucketed, batch_format="pandas")
            .groupby("__pp").map_groups(per_bucket,
                                        batch_format="pandas"))


def triangle_count(edges_ds, src: str, dst: str, *,
                   nparts: int = 32) -> int:
    """EXACT triangle count over a directed edge Dataset (direction
    and duplicate edges ignored; self-loops dropped) — the classic
    web-graph cohesion statistic.

    Shape: (1) edges canonicalize to unique (u < v) pairs via the
    pair-hash bucket dedup (one tiny-row shuffle); (2) WEDGES — for
    each node u, every pair (v1 < v2) of its neighbors — emit inside
    u-hashed buckets (O(sum deg^2) int rows; the known hot spot of any
    triangle algorithm, bounded per bucket not per driver); (3) each
    wedge closes iff (v1, v2) is itself an edge — ONE composite-key
    hash join (join.hash_join on [u, v]) against the canonical edge
    set, and the count is the Dataset row count.  Nothing
    graph-sized ever touches the driver.
    """
    from .join import hash_join

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy()
        b = df[dst].to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        u = np.minimum(a, b)
        v = np.maximum(a, b)
        t = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        h = (pd.util.hash_array(t["u"].to_numpy())
             ^ pd.util.hash_array(t["v"].to_numpy()))
        t["__pp"] = (h % np.uint64(nparts)).astype("int64")
        return t

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["u", "v"]].drop_duplicates()

    edges = (edges_ds.map_batches(canon, batch_format="pandas")
             .groupby("__pp").map_groups(dedup_bucket,
                                         batch_format="pandas")
             .materialize())

    def by_node(df: pd.DataFrame) -> pd.DataFrame:
        # adjacency rows keyed by EITHER endpoint: node -> neighbor
        t = pd.DataFrame({
            "n": np.concatenate([df["u"].to_numpy(),
                                 df["v"].to_numpy()]),
            "nb": np.concatenate([df["v"].to_numpy(),
                                  df["u"].to_numpy()])})
        t["__pp"] = (pd.util.hash_array(t["n"].to_numpy())
                     % np.uint64(nparts)).astype("int64")
        return t

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_v = [], []
        g = g.sort_values(["n", "nb"], kind="mergesort")
        for _, grp in g.groupby("n", sort=False):
            nb = np.unique(grp["nb"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            out_u.append(nb[i])
            out_v.append(nb[j])
        if not out_u:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        return pd.DataFrame({"u": np.concatenate(out_u),
                             "v": np.concatenate(out_v)})

    wedge_ds = (edges.map_batches(by_node, batch_format="pandas")
                .groupby("__pp").map_groups(wedges,
                                            batch_format="pandas"))
    closed = hash_join(
        wedge_ds,
        edges.map_batches(
            lambda df: df.assign(hit=np.int64(1)),
            batch_format="pandas"),
        ["u", "v"], how="inner", n_buckets=nparts)
    # every wedge (v1 < v2 around some u) meets the edge (v1, v2) at
    # most once, and each triangle {a<b<c} produces exactly 3 wedges
    # (around a, b and c) of which exactly 3 close -> count/3
    n = closed.count()
    assert n % 3 == 0, "wedge closure count must be divisible by 3"
    return n // 3
