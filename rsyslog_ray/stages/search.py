"""BM25 full-text relevance search over a document Dataset.

The reference has no ranking engine, but its broadcast-small-side /
stream-big-side lookup shape (runtime/lookup.c tables resolved per
message) is exactly how fixed-query-set retrieval over a web-scale
corpus works; this stage composes it into a ranker:

  pass 1 (corpus stats): one ``map_batches`` combiner emits per-batch
      partials — one (term, doc-frequency) row per QUERY-vocabulary
      term plus two stats rows (doc count, summed doc length).  The
      driver reduce is O(query vocabulary × n_batches), independent of
      corpus size.
  pass 2 (score + local top-k): the idf table and avgdl are broadcast;
      each batch tokenizes, keeps query-vocabulary terms only,
      computes per-term BM25 contributions, rounds EACH contribution
      to integer micro-units BEFORE summing — integer addition is
      order-independent, so the distributed score equals the
      single-node spec and the SQL oracle bit for bit — then keeps a
      local top-k per query.  The driver final reduces
      O(n_batches × n_queries × k) rows.

Partitioning assumption: none — both passes are embarrassingly
parallel combiners; nothing corpus-sized is shuffled or gathered.

BM25 (Robertson; the Lucene idf variant): for query term t in doc d,
  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  w(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
with N / avgdl over documents that have at least one token (the same
population a tokens-table-derived SQL oracle sees).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd

TOKEN_RE = r"[a-z0-9]+"
K1 = 1.2
B = 0.75


def tokenize_query(text: str) -> list[str]:
    """Distinct query terms, sorted (order never affects the score)."""
    return sorted(set(re.findall(TOKEN_RE, text.lower())))


def _token_lists(texts: pd.Series) -> pd.Series:
    # null text == empty doc (a NaN poisons lens.sum() downstream)
    return texts.fillna("").str.lower().str.findall(TOKEN_RE)


def bm25_contrib(tf, df, dl, n: float, avgdl: float):
    """Vectorized per-term contribution — the ONE arithmetic expression
    shared (shape-for-shape) by the engine, the pure-Python spec and
    the SQL oracle, so float64 evaluation order is identical."""
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25_corpus_stats(ds, text_col: str, vocab: list[str]):
    """-> (n_docs, avgdl, {term: df}) for the query vocabulary, via one
    combiner pass (per-batch partial rows, O(vocab) driver reduce)."""
    vset = sorted(set(vocab))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _token_lists(df[text_col])
        lens = toks.str.len()
        e = toks.explode().dropna()
        f = pd.DataFrame({"i": e.index.to_numpy(), "term": e.to_numpy()})
        f = f[f["term"].isin(vset)].drop_duplicates()
        dfc = f.groupby("term").size()
        return pd.concat([
            pd.DataFrame({"term": dfc.index.to_numpy(dtype=object),
                          "v": dfc.to_numpy(dtype=np.int64)}),
            # '#' cannot appear in a [a-z0-9]+ token — safe sentinels
            pd.DataFrame({"term": ["#n", "#dl"],
                          "v": np.array([int((lens > 0).sum()),
                                         int(lens.sum())], dtype=np.int64)}),
        ], ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("term")["v"].sum()
    n = int(agg.get("#n", 0))
    sum_dl = int(agg.get("#dl", 0))
    dfmap = {t: int(c) for t, c in agg.items() if not t.startswith("#")}
    avgdl = sum_dl / float(n) if n else 1.0
    return n, avgdl, dfmap


def bm25_search(ds, id_col: str, text_col: str, queries: dict[str, str],
                k: int = 10) -> pd.DataFrame:
    """Top-``k`` docs per query by BM25 — (qid, id, score_micro, rank),
    rank 1-based, ties broken by id ascending on the integer score."""
    qterms = {qid: tokenize_query(qt) for qid, qt in queries.items()}
    vocab = sorted({t for ts in qterms.values() for t in ts})
    n, avgdl, dfmap = bm25_corpus_stats(ds, text_col, vocab)
    qframe = pd.DataFrame(
        [(qid, t) for qid, ts in sorted(qterms.items()) for t in ts
         if t in dfmap],  # terms absent from the corpus contribute 0
        columns=["qid", "term"])
    nf = float(n)

    def local(dfb: pd.DataFrame) -> pd.DataFrame:
        dfb = dfb.reset_index(drop=True)
        empty = pd.DataFrame({"qid": pd.Series([], dtype=object),
                              id_col: pd.Series([], dtype="int64"),
                              "score_micro": pd.Series([], dtype="int64")})
        if not len(dfb) or not len(qframe):
            return empty
        toks = _token_lists(dfb[text_col])
        lens = toks.str.len()
        e = toks.explode().dropna()
        f = pd.DataFrame({"__i": e.index.to_numpy(), "term": e.to_numpy()})
        f = f[f["term"].isin(vocab)]
        if not len(f):
            return empty
        tf = (f.groupby(["__i", "term"], observed=True).size()
              .rename("tf").reset_index())
        m = tf.merge(qframe, on="term")
        if not len(m):
            return empty
        contrib = bm25_contrib(
            m["tf"].to_numpy(np.float64),
            m["term"].map(dfmap).to_numpy(np.float64),
            m["__i"].map(lens).to_numpy(np.float64), nf, avgdl)
        m["c"] = np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        sc = (m.groupby(["qid", "__i"], observed=True)["c"].sum()
              .rename("score_micro").reset_index())
        # a score of 0 micro-units is "no effective match" — omitted,
        # matching the pure-Python spec and the SQL oracle (at corpus
        # scale an everywhere-term's idf rounds to 0; those rows must
        # not occupy top-k slots)
        sc = sc[sc["score_micro"] > 0]
        sc[id_col] = sc["__i"].map(dfb[id_col])
        sc = sc[["qid", id_col, "score_micro"]]
        sc = sc.sort_values(["qid", "score_micro", id_col],
                            ascending=[True, False, True])
        return sc.groupby("qid").head(k)

    parts = ds.map_batches(local, batch_format="pandas").to_pandas()
    out = (parts.sort_values(["qid", "score_micro", id_col],
                             ascending=[True, False, True])
           .groupby("qid").head(k).reset_index(drop=True))
    out["rank"] = (out.groupby("qid").cumcount() + 1).astype("int64")
    return out.astype({"score_micro": "int64"})


def _term_partition(terms, npart: int) -> np.ndarray:
    """Deterministic term -> partition id (pandas siphash, fixed key —
    stable across processes, so a query run in a NEW session prunes to
    the same partitions the build wrote)."""
    arr = np.asarray(terms, dtype=object)
    return (pd.util.hash_array(arr) % np.uint64(npart)).astype("int64")


def build_inverted_index(ds, id_col: str, text_col: str, out_dir: str,
                         *, npart: int = 32) -> dict:
    """Materialize a PERSISTED term-partitioned inverted index:

      out_dir/tp=<siphash(term) % npart>/part-*.parquet
          rows (term, id, tf, dl) — postings with the doc-length norm
          denormalized in (standard impact-style layout, so scoring
          never joins back to the corpus)
      out_dir/_stats.json — {n_docs, sum_dl, npart}

    One corpus pass, NO shuffle: each batch fans its postings out to
    the term-hash partition dirs exactly like FanoutWriter fans rows to
    sinks (atomic tmp+rename per file).  Index once, query many — the
    query side reads ONLY the partitions its terms hash to.

    Resume contract: ``_stats.json`` is the COMMIT MARKER (written
    last, atomically).  If it exists the index is complete and the
    build is a no-op; if it is absent but the dir is non-empty the
    previous build died mid-write, so the debris is wiped and rebuilt
    (appending into a torn index would duplicate postings).  This is
    the lineage pattern — marker-last works on object storage too,
    where atomic directory renames don't exist."""
    import json as _j
    import shutil

    marker = os.path.join(out_dir, "_stats.json")
    if os.path.exists(marker):
        with open(marker) as fh:
            return _j.load(fh)
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        # file stem = md5 of the batch's id set, NOT a uuid: a Ray task
        # retry / lineage re-execution of the same batch then OVERWRITES
        # its own files instead of appending duplicate postings (ids are
        # globally unique, so distinct batches cannot collide — and
        # 128 bits is past the birthday bound at any batch count, where
        # a short random stem would silently clobber another batch)
        wid = hashlib.md5(
            np.ascontiguousarray(df[id_col].to_numpy(np.int64)).tobytes()
        ).hexdigest()
        toks = _token_lists(df[text_col])
        lens = toks.str.len()
        e = toks.explode().dropna()
        f = pd.DataFrame({"__i": e.index.to_numpy(), "term": e.to_numpy()})
        if len(f):
            tf = (f.groupby(["__i", "term"], observed=True).size()
                  .rename("tf").reset_index())
            tf["id"] = tf["__i"].map(df[id_col]).astype("int64")
            tf["dl"] = tf["__i"].map(lens).astype("int64")
            tf["tp"] = _term_partition(tf["term"].to_numpy(), npart)
            tf = tf[["tp", "term", "id", "tf", "dl"]]
            for tp, grp in tf.groupby("tp"):
                d = os.path.join(out_dir, f"tp={int(tp)}")
                os.makedirs(d, exist_ok=True)
                tmp = os.path.join(d, f"part-{wid}.parquet.inprogress")
                (grp.drop(columns=["tp"]).reset_index(drop=True)
                 .to_parquet(tmp))
                os.replace(tmp, os.path.join(d, f"part-{wid}.parquet"))
        return pd.DataFrame({"n": [int((lens > 0).sum())],
                             "dl": [int(lens.sum())]})

    stats = ds.map_batches(partial, batch_format="pandas").to_pandas()
    rec = {"n_docs": int(stats["n"].sum()),
           "sum_dl": int(stats["dl"].sum()), "npart": int(npart)}
    import json as _json
    tmp = os.path.join(out_dir, "_stats.json.tmp")
    with open(tmp, "w") as fh:
        _json.dump(rec, fh)
    os.replace(tmp, os.path.join(out_dir, "_stats.json"))
    return rec


def bm25_query_index(index_dir: str, queries: dict[str, str], k: int = 10
                     ) -> pd.DataFrame:
    """BM25 top-k from a PERSISTED index — reads ONLY the term-hash
    partitions the query vocabulary lands in (prune at the read: a
    3-term query over a 32-partition index of a 100 TB corpus touches
    <=3/32 of the postings).  Scores match bm25_search(corpus) exactly
    (same integer-micro contribution arithmetic)."""
    import glob as _glob
    import json as _json

    import ray.data

    st = index_stats(index_dir)
    n, npart = st["n_docs"], st["npart"]
    qterms = {qid: tokenize_query(qt) for qid, qt in queries.items()}
    vocab = sorted({t for ts in qterms.values() for t in ts})
    if not vocab or not n:
        return pd.DataFrame({"qid": [], "id": [], "score_micro": [],
                             "rank": []})
    avgdl = st["sum_dl"] / float(n)
    tps = sorted(set(_term_partition(vocab, npart).tolist()))
    # base postings + COMMITTED generations only: a torn append's
    # files must stay invisible, matching index_stats' totals
    # (shared protocol: state/genstore.py)
    from ..state import genstore
    gids = genstore.committed_gen_ids(index_dir)
    files = []
    for tp in tps:
        d = os.path.join(index_dir, f"tp={tp}")
        files += sorted(_glob.glob(os.path.join(d, "part-*.parquet")))
        for gid in gids:
            files += sorted(_glob.glob(
                os.path.join(d, f"gen-{gid}-part-*.parquet")))
    if not files:
        return pd.DataFrame({"qid": [], "id": [], "score_micro": [],
                             "rank": []})

    # pass 1 over the pruned postings: df per query term (exact — one
    # posting row per (term, doc)); column-pruned read — this pass
    # needs only `term`, not the id/tf/dl bulk
    def dfp(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df["term"].isin(vocab)]
        c = f.groupby("term", observed=True).size()
        return pd.DataFrame({"term": c.index.to_numpy(dtype=object),
                             "v": c.to_numpy(np.int64)})

    parts = (ray.data.read_parquet(files, columns=["term"])
             .map_batches(dfp, batch_format="pandas").to_pandas())
    dfmap = {t: int(v) for t, v in
             parts.groupby("term")["v"].sum().items()}
    qframe = pd.DataFrame(
        [(qid, t) for qid, ts in sorted(qterms.items()) for t in ts
         if t in dfmap], columns=["qid", "term"])
    if not len(qframe):
        return pd.DataFrame({"qid": [], "id": [], "score_micro": [],
                             "rank": []})
    nf = float(n)

    # pass 2: per-batch integer-micro partial sums per (qid, doc) —
    # exact under any batch split because integer addition commutes.
    # The final reduce is DISTRIBUTED: partials hash-partition on doc
    # id (all partials of a (qid, id) share the id, hence one group),
    # each partition sums and keeps its local top-k, and the driver
    # sees only O(n_partitions × queries × k) rows — for a query
    # containing an everywhere-term over a 100 TB index, "matched
    # docs" ≈ the corpus, so a driver-side groupby-sum would be a full
    # materialization (broadcast-small / stream-big, the
    # runtime/lookup.c relationship).
    n_red = min(int(npart), 32)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(qframe, on="term")
        if not len(m):
            return pd.DataFrame({"qid": pd.Series([], dtype=object),
                                 "id": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64"),
                                 "pp": pd.Series([], dtype="int64")})
        contrib = bm25_contrib(
            m["tf"].to_numpy(np.float64),
            m["term"].map(dfmap).to_numpy(np.float64),
            m["dl"].to_numpy(np.float64), nf, avgdl)
        m["c"] = np.floor(contrib * 1e6 + 0.5).astype(np.int64)
        part = (m.groupby(["qid", "id"], observed=True)["c"].sum()
                .reset_index())
        part["pp"] = ((part["id"].to_numpy().astype(np.uint64) * gold)
                      % np.uint64(n_red)).astype("int64")
        return part

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["qid", "id"], as_index=False)["c"].sum()
        out = out[out["c"] > 0]      # same no-match rule as the scan
        out = (out.sort_values(["qid", "c", "id"],
                               ascending=[True, False, True])
               .groupby("qid").head(k))
        return out.reset_index(drop=True)

    sc = _collect_topk(ray.data.read_parquet(files)
                       .map_batches(score, batch_format="pandas")
                       .groupby("pp").map_groups(local_topk,
                                                 batch_format="pandas"))
    out = (sc.rename(columns={"c": "score_micro"})
           .sort_values(["qid", "score_micro", "id"],
                        ascending=[True, False, True])
           .groupby("qid").head(k).reset_index(drop=True))
    out["rank"] = (out.groupby("qid").cumcount() + 1).astype("int64")
    return out.astype({"score_micro": "int64"})


def _collect_topk(ds) -> pd.DataFrame:
    """The ONE driver collect of bm25_query_index — the per-partition
    top-k rows (O(n_partitions × queries × k)).  A named seam so tests
    can pin the driver-visible row count with monkeypatch."""
    return ds.to_pandas()


def bm25_oracle(ids, texts, queries: dict[str, str], k: int = 10
                ) -> pd.DataFrame:
    """Single-node pure-pandas spec (same expression tree) for pytest."""
    toks = [re.findall(TOKEN_RE, t.lower()) for t in texts]
    dls = [len(t) for t in toks]
    n = sum(1 for d in dls if d > 0)
    avgdl = sum(dls) / float(n) if n else 1.0
    vocab = sorted({t for qt in queries.values() for t in tokenize_query(qt)})
    dfmap = {v: sum(1 for tk in toks if v in tk) for v in vocab}
    rows = []
    for qid in sorted(queries):
        terms = [t for t in tokenize_query(queries[qid]) if dfmap.get(t)]
        for i, tk in enumerate(toks):
            s = 0
            for t in terms:
                tf = tk.count(t)
                if not tf:
                    continue
                c = bm25_contrib(np.float64(tf), np.float64(dfmap[t]),
                                 np.float64(dls[i]), float(n), avgdl)
                s += int(np.floor(c * 1e6 + 0.5))
            if s:
                rows.append((qid, ids[i], s))
    out = pd.DataFrame(rows, columns=["qid", "id", "score_micro"])
    out = (out.sort_values(["qid", "score_micro", "id"],
                           ascending=[True, False, True])
           .groupby("qid").head(k).reset_index(drop=True))
    out["rank"] = (out.groupby("qid").cumcount() + 1).astype("int64")
    return out


def append_inverted_index(ds, id_col: str, text_col: str,
                          index_dir: str, gen_id: str) -> dict:
    """Append NEW documents to a committed inverted index without
    rebuilding — the operation a rolling 100 TB crawl store actually
    performs (build once, then increments).

    Same fan-out shape as the build (per-batch postings to the
    term-hash dirs, atomic files), but namespaced by ``gen_id``:

      tp=<p>/gen-<gid>-part-<stem>.parquet      increment postings
      _gen-<gid>.json                            increment COMMIT MARKER
                                                 ({n_docs, sum_dl})

    Idempotence, atomicity and the marker-last commit are the shared
    generation protocol (state/genstore.py); the query side sums the
    base ``_stats.json`` with every generation marker, so a torn
    append is invisible until its marker lands."""
    import json as _json

    from ..state import genstore

    st_path = os.path.join(index_dir, "_stats.json")
    if not os.path.exists(st_path):
        raise FileNotFoundError("append requires a committed index "
                                f"(missing {st_path})")
    npart = _json.load(open(st_path))["npart"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        wid = hashlib.md5(
            np.ascontiguousarray(df[id_col].to_numpy(np.int64)).tobytes()
        ).hexdigest()
        toks = _token_lists(df[text_col])
        lens = toks.str.len()
        e = toks.explode().dropna()
        f = pd.DataFrame({"__i": e.index.to_numpy(), "term": e.to_numpy()})
        if len(f):
            tf = (f.groupby(["__i", "term"], observed=True).size()
                  .rename("tf").reset_index())
            tf["id"] = tf["__i"].map(df[id_col]).astype("int64")
            tf["dl"] = tf["__i"].map(lens).astype("int64")
            tf["tp"] = _term_partition(tf["term"].to_numpy(), npart)
            for tp, grp in tf.groupby("tp"):
                genstore.atomic_part(
                    os.path.join(index_dir, f"tp={int(tp)}"),
                    f"gen-{gen_id}-part-{wid}.parquet",
                    grp[["term", "id", "tf", "dl"]].reset_index(drop=True))
        return pd.DataFrame({"n": [int((lens > 0).sum())],
                             "dl": [int(lens.sum())]})

    def reduce_partials(stats: pd.DataFrame) -> dict:
        return {"n_docs": int(stats["n"].sum()),
                "sum_dl": int(stats["dl"].sum())}

    return genstore.generation_append(ds, index_dir, gen_id, partial,
                                      reduce_partials, "tp=*")


def index_stats(index_dir: str) -> dict:
    """Effective corpus stats: the base build plus every COMMITTED
    generation marker (torn appends contribute nothing)."""
    import glob as _glob
    import json as _json

    st = _json.load(open(os.path.join(index_dir, "_stats.json")))
    for m in sorted(_glob.glob(os.path.join(index_dir, "_gen-*.json"))):
        g = _json.load(open(m))
        st["n_docs"] += g["n_docs"]
        st["sum_dl"] += g["sum_dl"]
    return st
