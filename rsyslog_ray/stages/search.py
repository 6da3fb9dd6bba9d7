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
    return texts.str.lower().str.findall(TOKEN_RE)


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
