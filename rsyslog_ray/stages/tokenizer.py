"""Distributed BPE tokenizer training + encoding.

The byte-pair-encoding pipeline every LM corpus run needs (Sennrich et
al. 2016 "Neural Machine Translation of Rare Words with Subword
Units" — the public algorithm; GPT-2 tokenizers are the byte-level
variant of the same loop), expressed 100-TB-shaped:

- **Word counting is the corpus-proportional part and it is fully
  distributed**: one ``map_batches`` pass emits per-batch (word, cnt)
  partials (the batch's Zipf head collapses immediately), reduced by
  the engine's two-phase aggregation.  Driver memory is O(distinct
  words) — Heaps-law sublinear in the corpus, and prunable with
  ``min_count``/``max_words`` (the standard BPE practice: merges
  learned from the frequency table head are identical because pair
  counts are freq-weighted).
- **Merge learning is O(vocab · merges), never O(corpus)**: the loop
  runs on the driver over the bounded word-frequency table, with the
  classic inverted-index incremental update (only words containing the
  merged pair are touched).  This is the same single-node step every
  public tokenizer trainer performs.
- **Encoding is distributed**: the merge ranks broadcast once
  (``ray.put``), each batch encodes its *distinct* words (Zipf ⇒ the
  per-batch cache absorbs most rows) and maps tokens back per doc.

Determinism: ties in pair frequency break toward the lexicographically
smallest pair; encoding merges the leftmost occurrence of the
lowest-rank pair.  tests/test_tokenizer.py pins the incremental
trainer against an independent naive-recount oracle and the encoder
against per-word reference segmentation (and round-trips the text).
"""

from __future__ import annotations

import pandas as pd

EOW = "</w>"  # end-of-word marker symbol (Sennrich-style)


# ---------------------------------------------------------------------
# phase 1: distributed word counting

def word_counts(ds, text_col: str = "text", *, min_count: int = 1,
                max_words: int | None = None) -> dict:
    """Whitespace-word frequency table as a driver dict (the merge
    loop's input — bounded by ``max_words`` most-frequent, ties by
    word ascending)."""
    from .aggregate import two_phase_agg

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        e = df[text_col].str.split().explode().dropna()
        return pd.DataFrame({"word": e.to_numpy(dtype=object)})

    wc = two_phase_agg(ds.map_batches(toks, batch_format="pandas"),
                       ["word"], count="cnt")
    wc = wc[wc["cnt"] >= min_count]
    wc = wc.sort_values(["cnt", "word"], ascending=[False, True])
    if max_words is not None:
        wc = wc.head(max_words)
    return dict(zip(wc["word"], wc["cnt"].astype(int)))


# ---------------------------------------------------------------------
# phase 2: merge learning (driver, O(vocab · merges))

def _merge_word(w: tuple, a: str, b: str, ab: str) -> tuple:
    """Replace non-overlapping (a,b) adjacencies left-to-right."""
    out, j, n = [], 0, len(w)
    while j < n:
        if j < n - 1 and w[j] == a and w[j + 1] == b:
            out.append(ab)
            j += 2
        else:
            out.append(w[j])
            j += 1
    return tuple(out)


def learn_bpe(word_freqs: dict, num_merges: int) -> list:
    """Learn merge operations from a word-frequency table.

    Incremental pair bookkeeping: a pair→{word index} inverted index
    restricts each merge's recount to the words actually containing
    the pair.  Overlapping adjacencies count per occurrence (zip) and
    replace left-to-right non-overlapping — the reference convention.
    """
    words = [tuple(w) + (EOW,) for w in word_freqs]
    freqs = list(word_freqs.values())
    pair_counts: dict = {}
    pair_words: dict = {}

    def _add(i: int, sign: int) -> None:
        w, f = words[i], freqs[i] * sign
        for p in zip(w, w[1:]):
            c = pair_counts.get(p, 0) + f
            if c > 0:
                pair_counts[p] = c
                if sign > 0:
                    pair_words.setdefault(p, set()).add(i)
            else:
                pair_counts.pop(p, None)
            if sign < 0:
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        pair_words.pop(p, None)

    for i in range(len(words)):
        _add(i, 1)

    merges: list = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for i in sorted(pair_words.get(best, ())):
            _add(i, -1)
            words[i] = _merge_word(words[i], a, b, ab)
            _add(i, 1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def learn_bpe_oracle(word_freqs: dict, num_merges: int) -> list:
    """Independent naive full-recount reference (test oracle)."""
    vocab = [[tuple(w) + (EOW,), f] for w, f in word_freqs.items()]
    merges: list = []
    for _ in range(num_merges):
        pairs: dict = {}
        for w, f in vocab:
            for p in zip(w, w[1:]):
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for entry in vocab:
            entry[0] = _merge_word(entry[0], best[0], best[1],
                                   best[0] + best[1])
    return merges


# ---------------------------------------------------------------------
# phase 3: distributed encoding

def encode_word(word: str, ranks: dict, cache: dict) -> list:
    """Greedy BPE segmentation: repeatedly merge the lowest-rank
    adjacent pair (leftmost on rank ties) until none applies."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_j = None, -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        a, b = syms[best_j], syms[best_j + 1]
        syms = list(_merge_word(tuple(syms), a, b, a + b))
    cache[word] = syms
    return syms


def bpe_encode(ds, merges: list, *, id_col: str = "doc_id",
               text_col: str = "text"):
    """documents → (id, tokens, n_tokens).  Ranks broadcast once via
    ``ray.put``; each batch encodes its distinct words through a local
    cache (Zipf ⇒ cache hit-rate ≈ 1 − distinct/total) — the per-word
    loop is the algorithm's own inner kernel, not row-wise overhead."""
    import ray

    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        ranks = ray.get(ranks_ref)
        cache: dict = {}
        toks, counts = [], []
        for t in df[text_col]:
            row: list = []
            for w in t.split():
                row.extend(encode_word(w, ranks, cache))
            toks.append(row)
            counts.append(len(row))
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "tokens": toks, "n_tokens": counts})

    return ds.map_batches(enc, batch_format="pandas")


def train_bpe(ds, *, text_col: str = "text", num_merges: int = 200,
              min_count: int = 1, max_words: int | None = None) -> list:
    """word_counts → learn_bpe composition (the trainer entry point)."""
    return learn_bpe(word_counts(ds, text_col, min_count=min_count,
                                 max_words=max_words), num_merges)
