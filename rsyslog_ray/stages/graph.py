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
:func:`pagerank_int_distributed` IS the hash-partitioned join shape —
same arithmetic bit-for-bit (pinned in t:test_join_ext), the rank
table a Dataset end-to-end.

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
    sums; past driver-table scale use :func:`hits_int_distributed`
    (bit-identical, score table a Dataset end-to-end).
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


def pagerank_int_distributed(edges_ds, src: str, dst: str, *,
                             iters: int = 3, init: int = 1_000_000,
                             base: int = 150_000, damp_num: int = 85,
                             damp_den: int = 100,
                             rank_col: str = "rank_u",
                             n_buckets: int = 64):
    """:func:`pagerank_int` with the documented hash-join escape hatch
    IMPLEMENTED: the rank/degree table is a DATASET end-to-end (no
    O(nodes) driver broadcast), for graphs whose node table outgrows
    the driver.  Bit-identical arithmetic (integer contributions,
    damping, base) — pinned equal to the broadcast variant in
    t:test_join_ext.

    Per iteration: contrib derives per-node (map), one
    :func:`~rsyslog_ray.stages.join.hash_join` ships each edge its
    src's contribution, a dst-hashed bucket pass sums partials, and a
    left join folds the sums back over the full degree table (absent
    sum = no incoming = base).  Everything that moves is 2-3 int
    columns; ranks re-materialize per round (the iterative-lineage
    rule above).  Returns a Dataset[(node, rank_u)].
    """
    from .join import hash_join

    edges = (edges_ds.map_batches(
        lambda df, _s=src, _d=dst: pd.DataFrame(
            {"node": df[_s].to_numpy(), "_dst": df[_d].to_numpy()}),
        batch_format="pandas").repartition(n_buckets).materialize())

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = (df.groupby("node", as_index=False).size()
             .rename(columns={"size": "d"}))
        t["__pp"] = (pd.util.hash_array(t["node"].to_numpy())
                     % np.uint64(n_buckets)).astype("int64")
        return t

    def count_reduce(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("node", as_index=False)["d"].sum()
        t["d"] = t["d"].astype("int64")
        t["rank"] = np.int64(init)
        return t

    # block-count pin: Ray's groupby emits as many blocks as it
    # receives and union adds both sides', so an iterative chain
    # GROWS block count geometrically (measured 128 -> 384 -> 896
    # over two iterations, per-iteration wall 14 s -> 53 s at sf0.1)
    # — every iteration-carried table is repartitioned to n_buckets
    # before materializing
    ranks = (edges.select_columns(["node"])
             .map_batches(count_partial, batch_format="pandas")
             .groupby("__pp").map_groups(count_reduce,
                                         batch_format="pandas")
             .repartition(n_buckets)
             .materialize())          # Dataset[(node, d, rank)]

    for _ in range(iters):
        contrib = ranks.map_batches(
            lambda df: pd.DataFrame({
                "node": df["node"].to_numpy(),
                "c": (df["rank"].to_numpy(np.int64)
                      // df["d"].to_numpy(np.int64))}),
            batch_format="pandas")
        # ship each edge its src's contribution (src column is "node")
        carried = hash_join(edges, contrib, "node",
                            n_buckets=n_buckets)

        def sum_partial(df: pd.DataFrame) -> pd.DataFrame:
            t = (df.groupby("_dst", as_index=False)["c"].sum()
                 .rename(columns={"_dst": "node", "c": "s"}))
            t["__pp"] = (pd.util.hash_array(t["node"].to_numpy())
                         % np.uint64(n_buckets)).astype("int64")
            return t

        def sum_reduce(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)["s"].sum()

        sums = (carried.map_batches(sum_partial,
                                    batch_format="pandas")
                .groupby("__pp").map_groups(sum_reduce,
                                            batch_format="pandas"))
        folded = hash_join(ranks.drop_columns(["rank"]), sums,
                           "node", how="left", n_buckets=n_buckets)

        def new_rank(df: pd.DataFrame) -> pd.DataFrame:
            s = df["s"].fillna(0).to_numpy(np.int64)
            return pd.DataFrame({
                "node": df["node"].to_numpy(),
                "d": df["d"].to_numpy(np.int64),
                "rank": (np.int64(base)
                         + (np.int64(damp_num) * s)
                         // np.int64(damp_den))})

        ranks = (folded.map_batches(new_rank, batch_format="pandas")
                 .repartition(n_buckets).materialize())

    return ranks.map_batches(
        lambda df: pd.DataFrame({
            "node": df["node"].to_numpy(),
            rank_col: df["rank"].to_numpy(np.int64)}),
        batch_format="pandas")


def hits_int_distributed(edges_ds, src: str, dst: str, *,
                         scale: int = 1_000_000,
                         node_col: str = "node",
                         auth_col: str = "auth_u",
                         hub_col: str = "hub_u",
                         n_buckets: int = 64):
    """:func:`hits_int` with the hash-join escape hatch implemented
    (the :func:`pagerank_int_distributed` shape): the score table is a
    Dataset end-to-end; each push is one hash join of the edges
    against the current scores plus a bucketed partial-sum pass.
    Bit-identical to the broadcast variant (pinned in
    t:test_join_ext).  The max-division scaling needs the two global
    maxima — two scalar ``Dataset.max()`` reduces, not a table
    collect.  Returns a Dataset[(node, auth_u, hub_u)]."""
    from .join import hash_join

    edges = (edges_ds.map_batches(
        lambda df, _s=src, _d=dst: pd.DataFrame(
            {"_src": df[_s].to_numpy(), "_dst": df[_d].to_numpy()}),
        batch_format="pandas").repartition(n_buckets).materialize())

    def _bucketed_sum(ds, key: str, val: str, out_key: str):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            t = (df.groupby(key, as_index=False)[val].sum()
                 .rename(columns={key: out_key}))
            t["__pp"] = (pd.util.hash_array(t[out_key].to_numpy())
                         % np.uint64(n_buckets)).astype("int64")
            return t

        def red(g: pd.DataFrame) -> pd.DataFrame:
            t = g.groupby(out_key, as_index=False)[val].sum()
            t[val] = t[val].astype("int64")
            return t

        return (ds.map_batches(part, batch_format="pandas")
                .groupby("__pp").map_groups(red,
                                            batch_format="pandas"))

    # node table = src nodes UNION dst nodes (score 0 when absent)
    def emit_nodes(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"node": np.concatenate(
            [df["_src"].to_numpy(), df["_dst"].to_numpy()])})
        t = t.drop_duplicates()
        t["__pp"] = (pd.util.hash_array(t["node"].to_numpy())
                     % np.uint64(n_buckets)).astype("int64")
        return t

    # same block-count pin as pagerank_int_distributed: every
    # iteration-carried table re-bounds to n_buckets blocks
    nodes = (edges.map_batches(emit_nodes, batch_format="pandas")
             .groupby("__pp").map_groups(
                 lambda g: g[["node"]].drop_duplicates(),
                 batch_format="pandas")
             .repartition(n_buckets).materialize())

    def push(score_ds, key_in: str, key_out: str, val: str):
        """out(k_out) = SUM over edges of score[k_in] — one hash join
        + one bucketed sum; absent nodes get 0 via a left join over
        the full node table."""
        carried = hash_join(
            edges.map_batches(
                lambda df, _k=key_in: df.rename(
                    columns={_k: "node",
                             ("_dst" if _k == "_src" else "_src"):
                             "_other"}),
                batch_format="pandas"),
            score_ds, "node", n_buckets=n_buckets)
        sums = _bucketed_sum(
            carried.map_batches(
                lambda df, _v=val: pd.DataFrame(
                    {"_other": df["_other"].to_numpy(),
                     _v: df[_v].to_numpy(np.int64)}),
                batch_format="pandas"),
            "_other", val, "node")
        folded = hash_join(nodes, sums, "node", how="left",
                           n_buckets=n_buckets)
        return (folded.map_batches(
            lambda df, _v=val: pd.DataFrame(
                {"node": df["node"].to_numpy(),
                 _v: df[_v].fillna(0).to_numpy(np.int64)}),
            batch_format="pandas")
            .repartition(n_buckets).materialize())

    # a1 = indegree: score 1 at every node, pushed along src -> dst
    ones = nodes.map_batches(
        lambda df: df.assign(a=np.int64(1)), batch_format="pandas")
    a1 = push(ones, "_src", "_dst", "a")
    h1 = push(a1.map_batches(
        lambda df: df.rename(columns={"a": "h"}),
        batch_format="pandas"), "_dst", "_src", "h")
    a2 = push(h1, "_src", "_dst", "h")

    amax = int(a2.max("h") or 0)
    hmax = int(h1.max("h") or 0)
    lim = (1 << 63) - 1
    if amax > lim // max(1, int(scale)) \
            or hmax > lim // max(1, int(scale)):
        raise OverflowError(
            "hits_int scores exceed int64 headroom for this scale; "
            "pass a smaller scale=")
    joined = hash_join(
        a2.map_batches(lambda df: df.rename(columns={"h": "_a2"}),
                       batch_format="pandas"),
        h1.map_batches(lambda df: df.rename(columns={"h": "_h1"}),
                       batch_format="pandas"),
        "node", how="left", n_buckets=n_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        a = df["_a2"].fillna(0).to_numpy(np.int64)
        h = df["_h1"].fillna(0).to_numpy(np.int64)
        s = np.int64(scale)
        return pd.DataFrame({
            node_col: df["node"].to_numpy(),
            auth_col: (a * s) // max(np.int64(1), np.int64(amax or 1)),
            hub_col: (h * s) // max(np.int64(1), np.int64(hmax or 1))})

    return joined.map_batches(finish, batch_format="pandas")


def bfs_hops_distributed(edges_ds, src: str, dst: str, sources: list,
                         *, max_depth: int = 3,
                         node_col: str = "node", dist_col: str = "d",
                         n_buckets: int = 64):
    """:func:`bfs_hops` with the hash-join escape hatch implemented:
    the distance table and the frontier are Datasets end-to-end (no
    O(nodes) driver dict).  Per round: one hash join ships the
    frontier along the edges, a bucketed dedup shrinks the candidate
    set, a hash anti-join (:func:`~rsyslog_ray.stages.join.semi_join`
    ``anti=True``) drops already-labelled nodes, and the survivors
    append to the distance table at the current depth.  Bit-identical
    to the broadcast variant (pinned in t:test_join_ext).  Returns a
    Dataset[(node, d)]."""
    import ray

    from .join import hash_join, semi_join

    edges = (edges_ds.map_batches(
        lambda df, _s=src, _d=dst: pd.DataFrame(
            {"node": df[_s].to_numpy(), "_dst": df[_d].to_numpy()}),
        batch_format="pandas").repartition(n_buckets).materialize())

    from .join import as_typed_empty

    seed = pd.DataFrame({"node": pd.Series(sorted(set(sources))),
                         dist_col: np.int64(0)})
    dist = ray.data.from_pandas(seed).materialize()
    frontier = dist.drop_columns([dist_col]).materialize()
    n_frontier = len(seed)
    n_dist = len(seed)

    for depth in range(1, max_depth + 1):
        if n_frontier == 0:
            break
        hops = hash_join(edges, frontier.map_batches(
            lambda df: df.assign(_f=np.int64(1)),
            batch_format="pandas"), "node", n_buckets=n_buckets)

        def cand(df: pd.DataFrame) -> pd.DataFrame:
            # dtype-preserving unique (a bare DataFrame({...}) of an
            # empty unique() falls back to object and trips Ray's
            # size estimator); zero-row outputs leave as arrow
            t = pd.DataFrame(
                {"node": pd.Series(df["_dst"].unique(),
                                   dtype=df["_dst"].dtype)})
            t["__pp"] = (pd.util.hash_array(t["node"].to_numpy())
                         % np.uint64(n_buckets)).astype("int64")
            return t if len(t) else as_typed_empty(t)

        new_nodes = (hops.map_batches(cand, batch_format="pandas")
                     .groupby("__pp").map_groups(
                         lambda g: g[["node"]].drop_duplicates(),
                         batch_format="pandas"))
        fresh = semi_join(new_nodes,
                          dist.select_columns(["node"]),
                          "node", anti=True,
                          n_buckets=n_buckets)
        frontier = fresh.materialize()
        n_frontier = frontier.count()
        # block-count pin, EMPTY-FREE: never repartition a table to
        # more blocks than rows — the surplus blocks are zero-row,
        # schema-less, and every operator that touches them warns
        frontier = (frontier.repartition(
            min(n_buckets, max(1, n_frontier))).materialize())
        labelled = frontier.map_batches(
            lambda df, _d=depth: df.assign(
                **{dist_col: np.int64(_d)}),
            batch_format="pandas")
        # the union would otherwise grow dist's block count every
        # round (the block-count pin, see pagerank_int_distributed)
        n_dist += n_frontier
        dist = (dist.union(labelled)
                .repartition(min(n_buckets, max(1, n_dist)))
                .materialize())

    if node_col != "node":
        dist = dist.map_batches(
            lambda df, _n=node_col: df.rename(columns={"node": _n}),
            batch_format="pandas")
    return dist
