"""Text-analysis operators: language-ID, quality, tokens, fingerprints.

Training-data-pipeline staples the reference lacks, expressed as
vectorized ``map_batches`` kernels over the documents/pages text
column.  Deterministic by construction (tests pin outputs; the
SQL-expressible ones also have DuckDB oracles in queries.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------
# language id — n-gram/stopword-profile heuristic

LANG_PROFILES = {
    # tiny deterministic marker sets; a real system ships trained
    # profiles — the OPERATOR shape (profile broadcast + vectorized
    # scoring) is what matters at scale
    "en": {"the", "and", "of", "a", "to", "is", "in"},
    "de": {"der", "die", "das", "und", "ist", "nicht"},
    "fr": {"le", "la", "les", "et", "est", "une"},
    "es": {"el", "los", "las", "es", "una", "y"},
}


def lang_id_frame(texts: pd.Series) -> pd.Series:
    """Predict language by stopword-profile overlap; 'und' if nothing
    matches. Ties break by profile order.  Vectorized: one explode +
    per-row distinct, then an isin/groupby count per profile and a
    single argmax over the (rows × langs) score matrix — no per-row
    Python set math."""
    idx = texts.index
    toks = texts.str.lower().str.split().explode()
    pairs = (toks.reset_index().drop_duplicates()
             .set_index("index").iloc[:, 0])  # distinct (row, token)
    langs = list(LANG_PROFILES)
    scores = np.zeros((len(idx), len(langs)), dtype=np.int64)
    pos = pd.Series(np.arange(len(idx)), index=idx)
    rows = pos.reindex(pairs.index).to_numpy()
    for j, lang in enumerate(langs):
        hit = pairs.isin(LANG_PROFILES[lang]).to_numpy()
        if hit.any():
            np.add.at(scores[:, j], rows[hit], 1)
    best = scores.argmax(axis=1)            # first max -> profile order
    pred = np.array(langs, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = "und"
    return pd.Series(pred, index=idx)


# ---------------------------------------------------------------------
# quality scoring — integer features (SQL-oracle friendly)

STOPWORDS = ("the", "a", "of", "and", "to")


def quality_frame(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Integer quality features, vectorized: one explode feeds both the
    stopword count and the longest-token length (str.len + groupby
    max), no per-row token loops."""
    texts = df[text_col]
    toks = texts.str.split()
    n_tokens = toks.str.len().fillna(0).astype("int64")
    ex = toks.explode()
    exlen = ex.str.len()
    pos = pd.Series(np.arange(len(texts)), index=texts.index)
    rows = pos.reindex(ex.index).to_numpy()
    n_stop = np.zeros(len(texts), dtype=np.int64)
    hit = ex.isin(STOPWORDS).to_numpy()
    if hit.any():
        np.add.at(n_stop, rows[hit], 1)
    longest = np.zeros(len(texts), dtype=np.int64)
    ok = exlen.notna().to_numpy()
    if ok.any():
        np.maximum.at(longest, rows[ok],
                      exlen.fillna(0).astype("int64").to_numpy()[ok])
    return pd.DataFrame({
        "n_tokens": n_tokens,
        "n_stop": n_stop,
        "longest_len": longest,
    }, index=df.index)


# ---------------------------------------------------------------------
# token counting — whitespace + BPE-ish regex

BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def token_counts_frame(texts: pd.Series) -> pd.DataFrame:
    ws = texts.str.split().str.len().fillna(0).astype("int64")
    bpe = texts.str.findall(BPE_RE).str.len().fillna(0).astype("int64")
    return pd.DataFrame({"ws_tokens": ws, "bpe_tokens": bpe},
                        index=texts.index)


# ---------------------------------------------------------------------
# document fingerprinting — winnowing (rolling hash, min per window)

FP_K = 5      # char k-grams
FP_WIN = 8    # winnow window


_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv_kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """FNV-1a of every byte k-gram: k vectorized passes over the byte
    array instead of one Python FNV call per k-gram (the round-1
    fingerprint bottleneck — per-row Python × O(len))."""
    n = len(data) - k + 1
    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFF, dtype=np.uint64)
        for j in range(k):
            h = (h ^ data[j:j + n].astype(np.uint64)) * _FNV_PRIME
    return h


def fingerprint_row(text: str, k: int = FP_K, w: int = FP_WIN) -> list[int]:
    """Winnowing fingerprint: hash every utf-8 byte k-gram, keep the
    min of each sliding window of w hashes, dedup preserving order.
    Standard document-fingerprint scheme for plagiarism/dup detection.
    (Byte k-grams == char k-grams on ASCII; the spec is bytes so the
    hash pass vectorizes.)"""
    enc = np.frombuffer(text.encode(), dtype=np.uint8)
    if len(enc) < k:
        return [int(_fnv_kgram_hashes(enc, len(enc))[0])] if len(enc) else []
    hv = _fnv_kgram_hashes(enc, k)
    if len(hv) <= w:
        return [int(hv.min())]
    from numpy.lib.stride_tricks import sliding_window_view
    mins = sliding_window_view(hv, w).min(axis=1)
    return [int(m) for m in pd.unique(mins)]  # first-occurrence order


def fingerprint_frame(texts: pd.Series) -> pd.DataFrame:
    fps = texts.map(fingerprint_row)
    return pd.DataFrame({
        "n_fp": fps.str.len().astype("int64"),
        "min_fp": fps.map(lambda f: min(f) if f else 0).astype("uint64"),
    }, index=texts.index)


# ---------------------------------------------------------------------
# benchmark decontamination — the GPT-3-style 13-gram overlap filter
# (Brown et al. 2020 appendix C; standard in public CC pipelines).
# rsyslog has no analog; this is a training-data-pipeline first-class op.

def ngram_hashes(text: str, n: int = 13) -> np.ndarray:
    """Stable uint64 hashes of word n-grams (pandas siphash — same
    kernel as the dedup shingles)."""
    w = text.split()
    if len(w) < n:
        grams = [" ".join(w)] if w else []
    else:
        grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(grams, dtype=object)).astype(
        np.uint64)


def _bench_ngram_ref(benchmark_texts, n: int):
    """Broadcast (ray.put) the benchmark set's n-gram hashes once —
    shared by the flag and the filter entry points.  For multi-GB
    benchmark sets swap the frozenset for a Bloom filter
    (dedup._bloom_build shape); the probe loops are unchanged."""
    import ray

    bench: set[int] = set()
    for t in benchmark_texts:
        bench.update(ngram_hashes(t, n).tolist())
    return ray.put(frozenset(bench))


def contamination_flags(ds, benchmark_texts, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 13):
    """Flag documents sharing any word n-gram with a benchmark set.

    The benchmark side is SMALL by nature (eval sets), so its n-gram
    hash set broadcasts once (``ray.put``) and every worker probes it
    per batch — no shuffle, one corpus pass.  Returns a Dataset of
    (id, n_hits, contaminated)."""
    import ray

    ref = _bench_ngram_ref(benchmark_texts, n)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(ref)
        hits = np.fromiter(
            (sum(int(h) in bset for h in ngram_hashes(t, n))
             for t in df[text_col].fillna("")),
            dtype=np.int64, count=len(df))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_hits": hits,
            "contaminated": (hits > 0).astype(np.int64),
        })

    return ds.map_batches(probe, batch_format="pandas")


def decontaminate(ds, benchmark_texts, text_col: str = "text",
                  n: int = 13):
    """Filter form of :func:`contamination_flags` (GPT-3 appendix-C
    shape): DROP every document sharing any word n-gram with the
    benchmark set, keep all columns.  Same broadcast probe, early-exit
    per doc (``any`` vs the flag variant's full count)."""
    import ray

    ref = _bench_ngram_ref(benchmark_texts, n)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(ref)
        if not bset:
            return df
        mask = np.fromiter(
            (not any(int(h) in bset for h in ngram_hashes(t, n))
             for t in df[text_col].fillna("")),
            dtype=bool, count=len(df))
        return df[mask]

    return ds.map_batches(keep, batch_format="pandas")


def contamination_oracle(text: str, benchmark_texts, n: int = 13) -> int:
    """Brute-force per-row oracle: count of n-grams of ``text`` present
    in any benchmark text's n-gram set (STRING comparison — catches a
    hashing bug in the engine path)."""
    def grams(t):
        w = t.split()
        if len(w) < n:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench = set()
    for b in benchmark_texts:
        bench |= grams(b)
    return sum(1 for g in
               (" ".join(text.split()[i:i + n])
                for i in range(max(1, len(text.split()) - n + 1)))
               if (g in bench))


# ---------------------------------------------------------------------
# repetition signals — the Gopher quality-filter family (Rae et al.
# 2021 table A1: duplicate n-gram fractions, top-n-gram character
# fraction), integer-scaled (parts-per-10000) for stable comparison.

def repetition_frame(texts: pd.Series, ngrams=(2, 3, 4)) -> pd.DataFrame:
    """Per-doc repetition features: dup_{n}gram_pm (fraction of n-gram
    OCCURRENCES whose n-gram appears more than once, per-mille*10) and
    top_2gram_chars_pm (fraction of characters covered by the most
    frequent 2-gram).  Vectorized per row over hashed n-grams (C-speed
    unique/counts; no Python string sets in the loop)."""
    out = {f"dup_{n}gram_pm": np.zeros(len(texts), dtype=np.int64)
           for n in ngrams}
    out["top_2gram_chars_pm"] = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = t.split()
        for n in ngrams:
            if len(w) < n:
                continue
            h = _words_ngram_hash(w, n)
            _, counts = np.unique(h, return_counts=True)
            dup_occ = int(counts[counts > 1].sum())
            out[f"dup_{n}gram_pm"][i] = dup_occ * 10000 // len(h)
        if len(w) >= 2 and len(t):
            grams = [" ".join(w[j:j + 2]) for j in range(len(w) - 1)]
            uniq, counts = np.unique(np.asarray(grams, dtype=object),
                                     return_counts=True)
            top = int(np.argmax(counts))
            covered = len(uniq[top]) * int(counts[top])
            out["top_2gram_chars_pm"][i] = min(
                10000, covered * 10000 // len(t))
    return pd.DataFrame(out, index=texts.index)


def _words_ngram_hash(w: list, n: int) -> np.ndarray:
    grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
    return pd.util.hash_array(np.asarray(grams, dtype=object))


# ---------------------------------------------------------------------
# cross-document line-level dedup (CCNet/C4-style boilerplate removal)

def line_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
               mode: str = "keep_first", min_count: int = 2,
               npart: int = 64, sep: str = "\n"):
    """Line-granularity dedup across the whole corpus — the CCNet/C4
    curation staple (navbars, cookie banners and footers repeat across
    millions of pages; document-level dedup never sees them).

    mode="keep_first": every distinct line survives exactly once, at
    its first occurrence (min (doc, position)); later copies are
    stripped.  mode="drop_common": lines occurring in >= min_count
    documents are stripped EVERYWHERE (pure boilerplate removal);
    unique lines always survive.  ``sep``: the unit boundary — the
    default "\\n" dedups lines; "\\n\\n" dedups PARAGRAPHS (the
    MassiveText/Gopher repetition-removal granularity).

    Shape at 100 TB: explode docs to (pk, key_hi, key_lo, doc, pos,
    line) — one row per line, hash-partitioned by a 128-bit line key
    (64-bit-only keys merge distinct lines at ~10^12 lines, same
    birthday bound as exact_dedup).  One groupby resolves winners per
    partition; a second groupby on doc reassembles surviving lines in
    position order.  Lines cross the wire twice, ids twice — no
    driver-side state at all.  Returns a Dataset (doc id, text) with
    the deduped text ('' when every line was stripped).
    """
    from .dedup import content_key128_frame

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[id_col].to_numpy()
        # null text == empty doc (NaN propagates 0-d arrays into the
        # concatenate below otherwise)
        split = df[text_col].fillna("").str.split(sep, regex=False)
        lens = split.str.len().to_numpy()
        lines = np.concatenate([np.asarray(x, dtype=object)
                                for x in split]) if len(df) else \
            np.empty(0, dtype=object)
        doc_rep = np.repeat(docs, lens)
        pos = np.concatenate([np.arange(n) for n in lens]) if len(df) \
            else np.empty(0, dtype="int64")
        a, b = content_key128_frame(pd.Series(lines, dtype=object))
        pk = ((a.astype(np.uint64) ^ b.astype(np.uint64))
              % np.uint64(npart)).astype("int64")
        out = pd.DataFrame({"pk": pk, "kh": a, "kl": b,
                            "doc": doc_rep, "pos": pos.astype("int64"),
                            "line": lines})
        # sentinel per doc (pos=-1, passes straight through resolve):
        # guarantees a doc whose EVERY line is stripped still yields a
        # row ('' text) instead of vanishing from the output
        marks = pd.DataFrame({
            "pk": (pd.util.hash_array(np.asarray(docs))
                   % np.uint64(npart)).astype("int64"),
            "kh": np.zeros(len(docs), dtype="int64"),
            "kl": np.zeros(len(docs), dtype="int64"),
            "doc": docs, "pos": np.full(len(docs), -1, dtype="int64"),
            "line": np.full(len(docs), "", dtype=object)})
        return pd.concat([out, marks], ignore_index=True)

    def resolve(part: pd.DataFrame) -> pd.DataFrame:
        sent = part[part["pos"] < 0][["doc", "pos", "line"]]
        part = part[part["pos"] >= 0]
        if mode == "drop_common":
            per_doc = part.drop_duplicates(["kh", "kl", "doc"])
            cnt = (per_doc.groupby(["kh", "kl"], sort=False)
                   .size().rename("nd").reset_index())
            merged = part.merge(cnt, on=["kh", "kl"], how="left")
            keep = merged[merged["nd"] < min_count][["doc", "pos", "line"]]
            return pd.concat([keep, sent], ignore_index=True)
        # keep_first: min (doc, pos) instance per distinct line
        order = part.sort_values(["kh", "kl", "doc", "pos"],
                                 kind="mergesort")
        first = ~order.duplicated(["kh", "kl"], keep="first")
        return pd.concat([order[first][["doc", "pos", "line"]], sent],
                         ignore_index=True)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc"].iloc[0]
        g = g[g["pos"] >= 0].sort_values("pos")
        return pd.DataFrame({id_col: [doc],
                             text_col: [sep.join(g["line"])]})

    return (ds.map_batches(explode, batch_format="pandas")
            .groupby("pk").map_groups(resolve, batch_format="pandas")
            .groupby("doc").map_groups(reassemble, batch_format="pandas"))


def line_dedup_oracle(ids: list, texts: list, mode: str = "keep_first",
                      min_count: int = 2, sep: str = "\n") -> dict:
    """Pure-Python spec for line_dedup (tests compare element-wise).
    Docs whose every line is stripped map to ''."""
    lines = {i: t.split(sep) for i, t in zip(ids, texts)}
    if mode == "drop_common":
        ndocs: dict[str, set] = {}
        for i in ids:
            for ln in set(lines[i]):
                ndocs.setdefault(ln, set()).add(i)
        keep = {i: [ln for ln in lines[i] if len(ndocs[ln]) < min_count]
                for i in ids}
    else:
        seen: set[str] = set()
        keep = {}
        for i in sorted(ids):
            out = []
            for ln in lines[i]:
                if ln not in seen:
                    seen.add(ln)
                    out.append(ln)
            keep[i] = out
    return {i: sep.join(keep[i]) for i in ids}


# ---------------------------------------------------------------------
# exact-substring dedup (window-hash approximation of the
# suffix-array method in "Deduplicating Training Data Makes Language
# Models Better", Lee et al. 2021 — public method, reimplemented)

def substring_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                    window: int = 20, npart: int = 64):
    """Remove every repeated >=``window``-token span from the corpus,
    keeping only its first occurrence (min (doc, position)).  The
    suffix-array method finds duplicated byte ranges exactly; the
    distributed re-homing here slides a ``window``-token hash over
    every document — any duplicated span of >= window tokens produces
    identical window keys at every alignment, so marking the
    non-first occurrences of each duplicated WINDOW and cutting the
    union of marked token intervals removes exactly the repeated
    spans (up to window-1 trailing tokens of a partial window, the
    same granularity trade the public implementations make when they
    chunk).

    Shape at 100 TB: one (pk, key_hi, key_lo, doc, pos) row per token
    position — ints only, text never shuffles; hash-partitioned
    resolve keeps min (doc,pos) per key and emits cut intervals for
    the rest; a per-doc groupby merges intervals and rebuilds the
    text from surviving tokens.  128-bit keys (two independent
    siphashes) — a 64-bit-only key would cut legitimate text on hash
    collisions at ~10^12 windows.  Docs shorter than ``window``
    tokens, and docs with no repeated span, pass through VERBATIM
    (original whitespace preserved); only docs that were actually cut
    are re-joined single-space (the token-granularity trade).
    """
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows_pk, rows_kh, rows_kl, rows_doc, rows_pos = [], [], [], [], []
        sent_doc = df[id_col].to_numpy()
        for i, t in zip(df[id_col], df[text_col].fillna("")):
            w = t.split()
            if len(w) < window:
                continue
            grams = np.asarray([" ".join(w[j:j + window])
                                for j in range(len(w) - window + 1)],
                               dtype=object)
            a = pd.util.hash_array(grams).astype("int64")
            b = pd.util.hash_array(grams, hash_key="raylog-dedup-2nd") \
                .astype("int64")
            pk = ((a.astype(np.uint64) ^ b.astype(np.uint64))
                  % np.uint64(npart)).astype("int64")
            rows_pk.append(pk)
            rows_kh.append(a)
            rows_kl.append(b)
            rows_doc.append(np.full(len(a), i))
            rows_pos.append(np.arange(len(a), dtype="int64"))
        core = pd.DataFrame({
            "pk": np.concatenate(rows_pk) if rows_pk else
            np.empty(0, "int64"),
            "kh": np.concatenate(rows_kh) if rows_kh else
            np.empty(0, "int64"),
            "kl": np.concatenate(rows_kl) if rows_kl else
            np.empty(0, "int64"),
            "doc": np.concatenate(rows_doc) if rows_doc else
            np.empty(0, "int64"),
            "pos": np.concatenate(rows_pos) if rows_pos else
            np.empty(0, "int64")})
        # sentinel per doc: routes every doc (incl. short ones) into
        # the rebuild stage exactly once
        sent = pd.DataFrame({
            "pk": (pd.util.hash_array(sent_doc)
                   % np.uint64(npart)).astype("int64"),
            "kh": np.zeros(len(sent_doc), "int64"),
            "kl": np.zeros(len(sent_doc), "int64"),
            "doc": sent_doc,
            "pos": np.full(len(sent_doc), -1, dtype="int64")})
        return pd.concat([core, sent], ignore_index=True)

    def resolve(part: pd.DataFrame) -> pd.DataFrame:
        sent = part[part["pos"] < 0][["doc", "pos"]]
        part = part[part["pos"] >= 0]
        if len(part):
            order = part.sort_values(["kh", "kl", "doc", "pos"],
                                     kind="mergesort")
            dup_key = order.duplicated(["kh", "kl"], keep=False)
            first = ~order.duplicated(["kh", "kl"], keep="first")
            cuts = order[dup_key & ~first][["doc", "pos"]]
        else:
            cuts = part[["doc", "pos"]]
        return pd.concat([cuts, sent], ignore_index=True)

    # doc texts ride to the rebuild stage keyed by doc id (ints +
    # one text row per doc — the same id-join shape as the minhash
    # verify; no driver gather)
    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc": df[id_col].to_numpy(),
                             "pos": np.full(len(df), -2, dtype="int64"),
                             "t": df[text_col].fillna("").to_numpy()})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc"].iloc[0]
        trow = g[g["pos"] == -2]
        if trow.empty:          # cut rows whose doc text is elsewhere: bug
            return pd.DataFrame({id_col: [], text_col: []})
        text = trow["t"].iloc[0]
        cuts = np.sort(g[g["pos"] >= 0]["pos"].to_numpy())
        if not len(cuts):
            # untouched docs pass through VERBATIM — rejoining would
            # silently normalize newlines/tabs corpus-wide
            return pd.DataFrame({id_col: [doc], text_col: [text]})
        w = text.split()
        drop = np.zeros(len(w), dtype=bool)
        for p in cuts:
            drop[p:p + window] = True
        return pd.DataFrame({id_col: [doc],
                             text_col: [" ".join(np.asarray(w,
                                                 dtype=object)[~drop])]})

    marked = (ds.map_batches(explode, batch_format="pandas")
              .groupby("pk").map_groups(resolve, batch_format="pandas"))
    docs_keyed = ds.map_batches(doc_rows, batch_format="pandas")

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(t=np.full(len(df), "", dtype=object))

    return (marked.map_batches(widen, batch_format="pandas")
            .union(docs_keyed)
            .groupby("doc").map_groups(rebuild, batch_format="pandas"))


def substring_dedup_oracle(ids: list, texts: list, window: int = 20) -> dict:
    """Pure-Python spec: slide a window-token hash over every doc in
    (doc, pos) order; for every window content seen before, mark its
    token interval; rebuild cut docs from unmarked tokens (re-joined
    single-space); uncut docs pass through verbatim."""
    seen: set[str] = set()
    out = {}
    for i in sorted(ids):
        t = texts[list(ids).index(i)]
        w = t.split()
        if len(w) < window:
            out[i] = t          # untouched docs pass through verbatim
            continue
        drop = np.zeros(len(w), dtype=bool)
        for j in range(len(w) - window + 1):
            g = " ".join(w[j:j + window])
            if g in seen:
                drop[j:j + window] = True
            else:
                seen.add(g)
        out[i] = t if not drop.any() else \
            " ".join(np.asarray(w, dtype=object)[~drop])
    return out


# ---------------------------------------------------------------------
# PII redaction — the privacy-scrub stage every public-web training
# pipeline runs before tokenization (mmanon generalized from IPs to the
# full PII class set; plugins/mmanon/mmanon.c anonymizes in-place the
# same way).  RE2 end-to-end: pyarrow's replace_substring_regex is the
# same regex engine DuckDB uses, so the SQL oracle is byte-identical.

PII_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact_array(arr):
    """Apply the PII rule chain IN ORDER over an Arrow string array —
    zero-copy batches, RE2 kernels, all occurrences per rule.  Rule
    order is part of the spec (the SQL oracle nests in the same
    order)."""
    import pyarrow.compute as pc

    for pat, rep in PII_RULES:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
    return arr


def _luhn_valid(digits: str) -> bool:
    s, dbl = 0, False
    for ch in reversed(digits):
        d = ord(ch) - 48
        if dbl:
            d *= 2
            if d > 9:
                d -= 9
        s += d
        dbl = not dbl
    return s % 10 == 0


_CARD_RE = re.compile(r"\b(?:\d[ -]?){12,18}\d\b")


def redact_cards_row(text: str) -> str:
    """Credit-card redaction: 13-19 digit runs (spaces/dashes allowed)
    that PASS the Luhn checksum -> <CARD>; non-Luhn digit runs are left
    alone (they are order ids, not cards).  Checksum logic cannot live
    in a regex, so this is the engine-only half of the PII stage
    (pytest-pinned); per-row C-kernel loop, not a hot-path op."""
    def sub(m: re.Match) -> str:
        digits = re.sub(r"[ -]", "", m.group(0))
        return "<CARD>" if 13 <= len(digits) <= 19 and _luhn_valid(digits) \
            else m.group(0)
    return _CARD_RE.sub(sub, text)


# ---------------------------------------------------------------------
# deterministic source mixing — per-source sampling weights, the
# "data mixture" step of LLM corpus assembly (e.g. sample CC at 0.2,
# books at 1.0).  Membership is a pure function of the row id (first
# 32 md5 bits < weight * 2^32), so the sample is reproducible across
# runs, resumable shard-by-shard, and needs NO coordination: every
# worker decides locally, no shuffle, no driver state.  DuckDB mirrors
# the hash exactly (md5 hex), so the oracle is exact, not statistical.

def mix_sample(ds, weights: dict, *, key_col: str = "source",
               id_col: str = "doc_id", default: float = 0.0):
    """Filter ``ds`` keeping each row iff
    u32(md5(str(id))) < weights.get(row[key_col], default) * 2^32."""
    import hashlib

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        w = df[key_col].map(lambda s: weights.get(s, default)).to_numpy()
        u = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
             for s in df[id_col].astype(str)),
            dtype=np.uint64, count=len(df))
        return df[u < np.minimum(w * 4294967296.0, 2**64 - 1).astype(np.uint64)]

    return ds.map_batches(keep, batch_format="pandas")


def chunk_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    chunk_tokens: int = 64, overlap: int = 16,
                    min_tokens: int = 1):
    """Split documents into overlapping fixed-token windows — the
    retrieval-corpus chunking step (doc -> passage rows for embedding /
    indexing).  Pure per-document flat_map: embarrassingly parallel,
    no shuffle, deterministic chunk ids (id, chunk_seq).  Windows start
    every ``chunk_tokens - overlap`` tokens; the last window may be
    short (kept iff >= ``min_tokens``).  The loop is per DOCUMENT (not
    per token) with C-level split/join inside — the same
    small-C-kernel-per-row shape as stages/multimodal.batch_features.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap

    def fx(df: pd.DataFrame) -> pd.DataFrame:
        ids, seqs, texts, lens = [], [], [], []
        # null text == empty doc (NaN is truthy — it would crash len())
        for i, words in zip(df[id_col],
                            df[text_col].fillna("").str.split()):
            nw = len(words) if words else 0
            for s, start in enumerate(range(0, max(nw, 1), step)):
                w = words[start:start + chunk_tokens] if words else []
                if len(w) < min_tokens and s > 0:
                    break
                ids.append(i)
                seqs.append(s)
                texts.append(" ".join(w))
                lens.append(len(w))
                if start + chunk_tokens >= nw:
                    break
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "chunk_seq": pd.Series(seqs, dtype="int64"),
            "chunk_text": pd.Series(texts, dtype=object),
            "n_tokens": pd.Series(lens, dtype="int64"),
        })

    return ds.map_batches(fx, batch_format="pandas")


def chunk_documents_oracle(ids, texts, chunk_tokens=64, overlap=16,
                           min_tokens=1) -> pd.DataFrame:
    """Single-node spec for pytest (same windowing rules)."""
    step = chunk_tokens - overlap
    rows = []
    for i, t in zip(ids, texts):
        words = t.split()
        nw = len(words)
        s = 0
        for start in range(0, max(nw, 1), step):
            w = words[start:start + chunk_tokens]
            if len(w) < min_tokens and s > 0:
                break
            rows.append((i, s, " ".join(w), len(w)))
            s += 1
            if start + chunk_tokens >= nw:
                break
    return pd.DataFrame(rows, columns=["doc_id", "chunk_seq",
                                       "chunk_text", "n_tokens"])


def stratified_sample(ds, *, group_col: str = "lang",
                      id_col: str = "doc_id", n: int = 20, seed: int = 0,
                      key_col: str = "skey") -> pd.DataFrame:
    """Deterministic per-group quota sample: the ``n`` rows with the
    smallest md5('{seed}:{id}') per group — per-language / per-source
    quotas for a training-data mixture.  Membership is a pure function
    of (seed, id): exact, coordination-free, shard-resumable, no RNG
    state (the md5 key IS the sampling order, verifiable by a SQL
    oracle).  Two-phase: each batch keeps its local n-smallest per
    group (the combiner), the driver final reduces
    O(groups × n × n_batches) partial rows — never the corpus."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, id_col]].copy()
        out[key_col] = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
                        for i in out[id_col]]
        out = out.sort_values([group_col, key_col, id_col])
        return out.groupby(group_col, observed=True).head(n)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (parts.sort_values([group_col, key_col, id_col])
            .groupby(group_col, observed=True).head(n)
            .reset_index(drop=True))


# ---------------------------------------------------------------------
# sequence packing — the tokenize-and-pack step that turns curated
# documents into fixed-length LM training rows.  Packing is PER SHARD
# by design: each worker packs the documents of its own block and pads
# only its final sequence — the way 100 TB jobs pack (a global pack
# order would serialize the corpus through one worker).  Token ids are
# 62-bit FNV word hashes here (a stand-in for a real BPE vocab — the
# vocab lookup would be the same broadcast-dict pattern).

PACK_EOD = np.int64(0)
PACK_PAD = np.int64(-1)


def _token_ids(text: str) -> np.ndarray:
    w = np.array(text.split(), dtype=object)
    if not len(w):
        return np.empty(0, dtype=np.int64)
    h = pd.util.hash_array(w)  # uint64 siphash per token
    return ((h >> np.uint64(2)) + np.uint64(1)).astype(np.int64)  # 1..2^62


def pack_batch(df: pd.DataFrame, seq_len: int, *, id_col: str = "doc_id",
               text_col: str = "text"):
    """Pack one block: docs in id order, EOD after each doc, cut into
    seq_len rows, pad the final remainder.  Returns an Arrow table
    {seq: fixed_size_list<int64>[L], n_docs, n_pad}."""
    import pyarrow as pa

    df = df.sort_values(id_col)
    parts = []
    for t in df[text_col]:
        parts.append(_token_ids(t))
        parts.append(np.array([PACK_EOD], dtype=np.int64))
    flat = (np.concatenate(parts) if parts
            else np.empty(0, dtype=np.int64))
    n_pad = (-len(flat)) % seq_len
    if n_pad:
        flat = np.concatenate([flat, np.full(n_pad, PACK_PAD)])
    mat = flat.reshape(-1, seq_len)
    n_docs = (mat == PACK_EOD).sum(axis=1).astype(np.int32)
    pads = np.zeros(len(mat), dtype=np.int32)
    if n_pad:
        pads[-1] = n_pad
    return pa.table({
        "seq": pa.FixedSizeListArray.from_arrays(
            pa.array(flat, pa.int64()), seq_len),
        "n_docs": pa.array(n_docs),
        "n_pad": pa.array(pads),
    })


def pack_sequences(ds, seq_len: int = 128, *, id_col: str = "doc_id",
                   text_col: str = "text", buckets: int = 0):
    """documents -> packed LM training sequences.

    ``buckets=0`` (legacy): per-BLOCK packing — no shuffle, but the
    output depends on Ray's block boundaries, so two runs over the
    same data can pack differently (same total tokens, different row
    grouping).

    ``buckets=B > 0``: DETERMINISTIC packing — every row is assigned
    a bucket by a pure function of its id (stable siphash, the
    `_term_partition` convention) and each bucket packs its docs in
    id order via one ``groupby().map_groups``.  Same data + same B
    ⇒ byte-identical packed rows at ANY partitioning, parallelism or
    cluster size (pinned by tools/kill_matrix.py and
    t:test_text_ops).  Cost: one hash shuffle; one pad tail per
    bucket, so size B such that a bucket holds ≫ seq_len tokens."""
    if buckets <= 0:
        return ds.map_batches(
            lambda df: pack_batch(df, seq_len, id_col=id_col,
                                  text_col=text_col),
            batch_format="pandas")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        ids = df[id_col].to_numpy()
        if ids.dtype.kind not in "iu":
            ids = np.asarray(ids, dtype=object)
        out["__pb"] = (pd.util.hash_array(ids)
                       % np.uint64(buckets)).astype("int64")
        return out

    def pack_group(g: pd.DataFrame):
        return pack_batch(g.drop(columns=["__pb"]), seq_len,
                          id_col=id_col, text_col=text_col)

    return (ds.map_batches(assign, batch_format="pandas")
            .groupby("__pb").map_groups(pack_group,
                                        batch_format="pandas"))


# ---------------------------------------------------------------------
# char-ngram LM scoring — the KenLM-style perplexity filter public
# pipelines (CCNet) use to rank web text.  Two-phase, 100-TB shaped:
# FIT = per-batch count partials over a BOUNDED key space (27^order
# contexts — alphabet-bounded, never corpus-bounded) reduced once;
# SCORE = broadcast the dense probability table and score each batch
# vectorized (sliding-window index into the table, no Python per row).

_LM_ALPHA = 27  # a-z + everything-else/space bucket


def _lm_codes(text: str) -> np.ndarray:
    b = np.frombuffer(text.lower().encode("utf-8", "replace"),
                      dtype=np.uint8).astype(np.int64)
    codes = np.where((b >= 97) & (b <= 122), b - 96, 0)  # a=1..z=26, other=0
    return codes


def fit_char_lm(ds, *, text_col: str = "text", order: int = 3) -> np.ndarray:
    """Fit add-one-smoothed P(char | previous order-1 chars) over the
    corpus.  Returns the dense log2-prob table, shape (27^(order-1),
    27).  The reduce is a driver sum of fixed-size arrays (one per
    batch) — O(table), never O(corpus)."""
    dim = _LM_ALPHA ** (order - 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros(dim * _LM_ALPHA, dtype=np.int64)
        for t in df[text_col]:
            c = _lm_codes(t)
            if len(c) < order:
                continue
            idx = np.zeros(len(c) - order + 1, dtype=np.int64)
            for j in range(order - 1):
                idx = idx * _LM_ALPHA + c[j:j + len(idx)]
            np.add.at(counts, idx * _LM_ALPHA + c[order - 1:], 1)
        return pd.DataFrame({"counts": [counts.tobytes()]})

    total = np.zeros(dim * _LM_ALPHA, dtype=np.int64)
    for b in (ds.map_batches(partial, batch_format="pandas")
              .iter_batches(batch_format="pandas", batch_size=None)):
        for buf in b["counts"]:
            total += np.frombuffer(buf, dtype=np.int64)
    counts = total.reshape(dim, _LM_ALPHA).astype(np.float64) + 1.0
    return np.log2(counts / counts.sum(axis=1, keepdims=True))


def lm_score_frame(texts: pd.Series, logp: np.ndarray,
                   order: int = 3) -> pd.Series:
    """Bits-per-char under the fitted model (lower = more natural);
    docs shorter than ``order`` score 0."""
    out = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        c = _lm_codes(t)
        if len(c) < order:
            continue
        idx = np.zeros(len(c) - order + 1, dtype=np.int64)
        for j in range(order - 1):
            idx = idx * _LM_ALPHA + c[j:j + len(idx)]
        out[i] = -logp[idx, c[order - 1:]].mean()
    return pd.Series(out, index=texts.index)


def lm_perplexity(ds, *, id_col: str = "doc_id", text_col: str = "text",
                  order: int = 3):
    """Two-phase fit + broadcast score: every doc gets bits_per_char.
    The table broadcast uses ray.put once; each scoring task reads the
    shared copy (never re-shipped per batch)."""
    import ray

    logp_ref = ray.put(fit_char_lm(ds, text_col=text_col, order=order))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        logp = ray.get(logp_ref)
        return pd.DataFrame({
            id_col: df[id_col],
            "bits_per_char": lm_score_frame(df[text_col], logp, order)})

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------
# deterministic epoch shuffle — the global training-data shuffle.
# Every LM run shuffles the corpus per epoch; at 100 TB the only sane
# form is a DETERMINISTIC keyed sort: key = md5(seed ":" id), then a
# distributed range-partitioned sort on the key.  Reproducible across
# runs/cluster sizes (no RNG state, no coordination), resumable (a
# re-run re-derives identical order), and a different seed is a fresh
# permutation.  The sort is Ray Data's shuffle-based sort — the one
# all-to-all this op IS, not an accident.

def epoch_shuffle(ds, *, id_col: str = "doc_id", seed: int = 0,
                  key_col: str = "skey"):
    """-> ds sorted by md5('{seed}:{id}') hex; the key column stays in
    the output (it IS the shuffle position — verifiable by the DuckDB
    md5 oracle and by any downstream resume)."""
    import hashlib

    def key(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[key_col] = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
                        for i in df[id_col]]
        return out

    return ds.map_batches(key, batch_format="pandas").sort(key_col)


# ---------------------------------------------------------------------
# Corpus n-gram statistics — Wimbd-style "what's in my big data" top-k
# (Elazar et al. 2023).  rsyslog has no analog; first-class
# training-data op.  Normalization contract (mirrored EXACTLY by the
# q:ngram_topk DuckDB oracle): lower, [^a-z0-9]+ -> space, split,
# drop empties; grams never cross document boundaries.
# ---------------------------------------------------------------------

def ngram_count_frame(texts: pd.Series, n: int = 3) -> pd.DataFrame:
    """Per-batch partial: (gram, cnt) counts, fully vectorized.

    Counting runs over INTEGER word codes (pd.factorize), not strings:
    the n codes of a gram pack into one int64 key (base = vocab size)
    and a single ``np.unique`` counts them; gram STRINGS are
    materialized only for the unique keys — O(distinct grams) small
    string joins instead of O(total grams) ``np.char.add`` flat-buffer
    temporaries (4x on the documents table; see CLAUDE.md env quirks).
    Falls back to a structured-dtype unique when vocab**n would
    overflow int64 (per-batch vocab beyond ~2M words for n=3)."""
    toks = (texts.str.lower()
            .str.replace(r"[^a-z0-9]+", " ", regex=True).str.split())
    ex = toks.explode().dropna()
    ex = ex[ex != ""]
    ids = ex.index.to_numpy()
    codes, vocab = pd.factorize(ex.to_numpy(dtype=object))
    m = len(codes) - n + 1
    if m <= 0:
        return pd.DataFrame({"gram": pd.Series([], dtype="object"),
                             "cnt": pd.Series([], dtype="int64")})
    ok = np.ones(m, dtype=bool)
    mat = np.empty((m, n), dtype=np.int64)
    mat[:, 0] = codes[:m]
    for j in range(1, n):
        ok &= ids[j:m + j] == ids[:m]
        mat[:, j] = codes[j:m + j]
    mat = mat[ok]
    nv = max(len(vocab), 1)
    if nv ** n < 2 ** 62:
        key = mat[:, 0].copy()
        for j in range(1, n):
            key *= nv
            key += mat[:, j]
        u, cnt = np.unique(key, return_counts=True)
        urows = np.empty((len(u), n), dtype=np.int64)
        rem = u
        for j in range(n - 1, 0, -1):
            urows[:, j] = rem % nv
            rem = rem // nv
        urows[:, 0] = rem
    else:
        c = np.ascontiguousarray(mat)
        u, cnt = np.unique(c.view([("", np.int64)] * n).ravel(),
                           return_counts=True)
        urows = u.view(np.int64).reshape(-1, n)
    va = np.asarray(vocab, dtype=object)
    gram = np.array([" ".join(row) for row in va[urows]], dtype=object)
    return pd.DataFrame({"gram": gram, "cnt": cnt.astype("int64")})


def ngram_topk(ds, *, n: int = 3, k: int = 20, text_col: str = "text",
               nparts: int = 32, driver_threshold: int = 2_000_000):
    """Global top-k n-grams by corpus frequency (cnt desc, gram asc —
    fully deterministic incl. the rank-k boundary).  Two-phase with an
    adaptive final: per-batch partial counts; small partial sets
    reduce on the driver (CLAUDE.md invariant 3), large ones
    hash-partition on the gram (a gram lives wholly in one partition,
    so per-partition sum + local top-k is exact) and the driver only
    ever sees O(nparts × k) rows."""
    from ..functions import hash64mod

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return ngram_count_frame(df[text_col], n)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["cnt", "gram"], ascending=[False, True])
                .head(k).reset_index(drop=True).astype({"cnt": "int64"}))

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    if partials.count() <= driver_threshold:
        df = partials.to_pandas().groupby("gram", as_index=False)["cnt"].sum()
        return head(df)

    def pp(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pp=hash64mod(df["gram"], nparts))

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        summed = g.groupby("gram", as_index=False)["cnt"].sum()
        return head(summed)[["gram", "cnt"]]

    cand = (partials.map_batches(pp, batch_format="pandas")
            .groupby("pp").map_groups(local_topk, batch_format="pandas")
            .to_pandas())                       # O(nparts × k) rows
    return head(cand)


# ---------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A.1.1) — the
# published document-level filter thresholds, each surfaced as its own
# column plus the composite keep flag.  Vectorized; the per-row spec
# oracle gopher_row is the ground truth (tests pin equality).
# ---------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")
_BULLETS = ("•", "‣", "▶", "- ", "* ")


def gopher_quality_frame(texts: pd.Series) -> pd.DataFrame:
    n_words = texts.str.split().str.len().fillna(0).astype("int64")
    # mean word length = non-whitespace chars / words (whitespace split
    # means every non-space char belongs to exactly one word)
    n_chars = (texts.str.replace(r"\s", "", regex=True).str.len()
               .fillna(0).astype("int64"))
    mean_wlen = np.where(n_words > 0, n_chars / n_words.replace(0, 1), 0.0)
    # symbol-to-word: '#' chars + '...'/'…' occurrences per word
    n_sym = (texts.str.count("#") + texts.str.count(r"\.\.\.")
             + texts.str.count("…")).astype("int64")
    sym_ratio = np.where(n_words > 0, n_sym / n_words.replace(0, 1), 0.0)

    lines = texts.str.split("\n")
    n_lines = lines.str.len().fillna(0).astype("int64")
    ex = lines.explode().dropna().str.strip()
    bullet = ex.str.startswith(_BULLETS).groupby(level=0).sum()
    ellip = (ex.str.endswith("...") | ex.str.endswith("…")) \
        .groupby(level=0).sum()
    bullet_frac = (bullet.reindex(texts.index, fill_value=0)
                   / n_lines.replace(0, 1)).to_numpy()
    ellipsis_frac = (ellip.reindex(texts.index, fill_value=0)
                     / n_lines.replace(0, 1)).to_numpy()

    wex = texts.str.split().explode().dropna()
    alpha = wex.str.contains("[A-Za-z]", regex=True).groupby(level=0).sum()
    alpha_frac = (alpha.reindex(texts.index, fill_value=0)
                  / n_words.replace(0, 1)).to_numpy()
    alpha_frac = np.where(n_words > 0, alpha_frac, 0.0)

    stop_hits = sum(
        texts.str.contains(rf"\b{w}\b", case=False, regex=True)
        .astype("int64") for w in GOPHER_STOPWORDS)

    keep = ((n_words >= 50) & (n_words <= 100_000)
            & (mean_wlen >= 3) & (mean_wlen <= 10)
            & (sym_ratio <= 0.1)
            & (bullet_frac <= 0.9) & (ellipsis_frac <= 0.3)
            & (alpha_frac >= 0.8) & (stop_hits >= 2))
    return pd.DataFrame({
        "n_words": n_words.to_numpy(),
        "mean_wlen_x100": np.floor(mean_wlen * 100 + 0.5).astype("int64"),
        "sym_per_kword": np.floor(sym_ratio * 1000 + 0.5).astype("int64"),
        "bullet_pct": np.floor(bullet_frac * 100 + 0.5).astype("int64"),
        "ellipsis_pct": np.floor(ellipsis_frac * 100 + 0.5).astype("int64"),
        "alpha_pct": np.floor(alpha_frac * 100 + 0.5).astype("int64"),
        "stop_hits": np.asarray(stop_hits, dtype="int64"),
        "gopher_keep": np.asarray(keep, dtype="int64"),
    }, index=texts.index)


def gopher_row(text: str) -> dict:
    """Pure-Python spec oracle for one document (ground truth)."""
    import math
    import re as _re

    words = text.split()
    n_words = len(words)
    n_chars = sum(len(w) for w in words)
    mean_wlen = n_chars / n_words if n_words else 0.0
    n_sym = text.count("#") + text.count("…") + len(
        _re.findall(r"\.\.\.", text))
    sym_ratio = n_sym / n_words if n_words else 0.0
    lines = [ln.strip() for ln in text.split("\n")]
    n_lines = len(lines)
    bullet_frac = (sum(ln.startswith(_BULLETS) for ln in lines)
                   / n_lines if n_lines else 0.0)
    ellipsis_frac = (sum(ln.endswith(("...", "…")) for ln in lines)
                     / n_lines if n_lines else 0.0)
    alpha_frac = (sum(bool(_re.search("[A-Za-z]", w)) for w in words)
                  / n_words if n_words else 0.0)
    stop_hits = sum(
        bool(_re.search(rf"\b{w}\b", text, _re.I)) for w in GOPHER_STOPWORDS)
    keep = (50 <= n_words <= 100_000 and 3 <= mean_wlen <= 10
            and sym_ratio <= 0.1 and bullet_frac <= 0.9
            and ellipsis_frac <= 0.3 and alpha_frac >= 0.8
            and stop_hits >= 2)
    return {"n_words": n_words,
            "mean_wlen_x100": math.floor(mean_wlen * 100 + 0.5),
            "sym_per_kword": math.floor(sym_ratio * 1000 + 0.5),
            "bullet_pct": math.floor(bullet_frac * 100 + 0.5),
            "ellipsis_pct": math.floor(ellipsis_frac * 100 + 0.5),
            "alpha_pct": math.floor(alpha_frac * 100 + 0.5),
            "stop_hits": stop_hits, "gopher_keep": int(keep)}


# ---------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020, §2.2) — line-level retention
# (terminal punctuation, >=5 words, no "javascript") and the document
# gates (>=3 sentences after cleaning, no "lorem ipsum", no '{').
# Vectorized explode/regroup; c4_row is the per-row spec oracle.
# ---------------------------------------------------------------------

_C4_TERMINALS = (".", "!", "?", '"')


def c4_filter_frame(texts: pd.Series) -> pd.DataFrame:
    lines = texts.str.split("\n")
    ex = lines.explode().dropna().str.strip()
    keep_line = (ex.str.endswith(_C4_TERMINALS)
                 & (ex.str.split().str.len().fillna(0) >= 5)
                 & ~ex.str.contains("javascript", case=False, regex=False))
    kept = ex[keep_line]
    clean = (kept.groupby(level=0).agg("\n".join)
             .reindex(texts.index, fill_value=""))
    n_kept = (keep_line.groupby(level=0).sum()
              .reindex(texts.index, fill_value=0).astype("int64"))
    n_sent = clean.str.count(r"[.!?]").astype("int64")
    keep_doc = ((n_sent >= 3)
                & ~clean.str.contains("lorem ipsum", case=False,
                                      regex=False)
                & ~clean.str.contains("{", regex=False))
    return pd.DataFrame({"clean": clean.to_numpy(),
                         "n_lines_kept": n_kept.to_numpy(),
                         "n_sentences": n_sent.to_numpy(),
                         "c4_keep": np.asarray(keep_doc, dtype="int64")},
                        index=texts.index)


def c4_row(text: str) -> dict:
    """Pure-Python spec oracle for one document (ground truth)."""
    import re as _re

    kept = []
    for ln in text.split("\n"):
        ln = ln.strip()
        if (ln.endswith(_C4_TERMINALS) and len(ln.split()) >= 5
                and "javascript" not in ln.lower()):
            kept.append(ln)
    clean = "\n".join(kept)
    n_sent = len(_re.findall(r"[.!?]", clean))
    keep = (n_sent >= 3 and "lorem ipsum" not in clean.lower()
            and "{" not in clean)
    return {"clean": clean, "n_lines_kept": len(kept),
            "n_sentences": n_sent, "c4_keep": int(keep)}


# ---------------------------------------------------------------------
# TF-IDF keyword extraction — per-document top-k terms by tf·idf.
# Training-data analog of rsyslog's dynstats keyed counting
# (runtime/dynstats.c) lifted to two corpus-level statistics: term
# frequency within the document and document frequency across the
# corpus.  Normalization contract (mirrored EXACTLY by the
# q:tfidf_topk DuckDB oracle): lower, [^a-z0-9]+ -> space, split,
# drop empties.  idf = ln(N / df), score = tf * idf; ranking
# tie-break (score desc, tf desc, term asc) is fully deterministic —
# exact score ties only arise from identical (tf, df) pairs or the
# df == N class (idf exactly 0.0 in both IEEE implementations).
# ---------------------------------------------------------------------

def doc_term_frame(df: pd.DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> pd.DataFrame:
    """Per-batch (doc, term, tf) rows.  Exact per document — a doc
    lives wholly in one input row, so its tf never splits across
    batches."""
    toks = (df[text_col].str.lower()
            .str.replace(r"[^a-z0-9]+", " ", regex=True).str.split())
    ex = toks.explode().dropna()
    ex = ex[ex != ""]
    if not len(ex):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "term": pd.Series([], dtype="object"),
                             "tf": pd.Series([], dtype="int64")})
    pairs = pd.DataFrame({id_col: df[id_col].reindex(ex.index).to_numpy(),
                          "term": ex.to_numpy(dtype=object)})
    out = (pairs.groupby([id_col, "term"], observed=True, sort=False)
           .size().rename("tf").reset_index())
    return out.astype({id_col: "int64", "tf": "int64"})


def _tfidf_rank(dt: pd.DataFrame, n_docs: int, k: int,
                id_col: str) -> pd.DataFrame:
    """Rank one frame of (doc, term, tf, df) rows -> per-doc top-k."""
    score = dt["tf"].to_numpy(np.float64) * np.log(
        float(n_docs) / dt["df"].to_numpy(np.float64))
    dt = dt.assign(__s=score)
    dt = dt.sort_values([id_col, "__s", "tf", "term"],
                        ascending=[True, False, False, True],
                        kind="mergesort")
    top = dt.groupby(id_col, sort=False).head(k).reset_index(drop=True)
    rnk = top.groupby(id_col, sort=False).cumcount() + 1
    return pd.DataFrame({id_col: top[id_col].to_numpy("int64"),
                         "rnk": rnk.to_numpy("int64"),
                         "term": top["term"].to_numpy(object),
                         "tf": top["tf"].to_numpy("int64"),
                         "df": top["df"].to_numpy("int64")})


def tfidf_topk(ds, *, id_col: str = "doc_id", text_col: str = "text",
               k: int = 5, nparts: int = 32,
               driver_threshold: int = 2_000_000):
    """Per-document top-k keywords by tf·idf, as a Dataset.

    Adaptive two-path final (same shape as ``ngram_topk``):

    - small df-partial sets (Heaps-bounded vocabulary under
      ``driver_threshold`` partial rows) reduce to a driver df table
      (CLAUDE.md invariant 3) broadcast once via ``ray.put`` as a
      sorted term array + count array — per-batch scoring is one
      ``np.searchsorted`` lookup, embarrassingly parallel, zero
      shuffles;
    - above the threshold nothing vocabulary-sized touches the driver:
      (doc, term, tf) postings hash-partition on term (a term's
      postings colocate, so per-partition df is the global df), then
      re-partition by doc for the per-doc top-k — two int/string-row
      shuffles, no broadcast.

    Both paths emit identical rows: (doc_id, rnk, term, tf, df).
    """
    import ray

    from ..functions import hash64mod

    n_docs = ds.count()

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = (df[text_col].str.lower()
                .str.replace(r"[^a-z0-9]+", " ", regex=True).str.split())
        ex = toks.explode().dropna()
        ex = ex[ex != ""]
        if not len(ex):
            return pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "dfc": pd.Series([], dtype="int64")})
        uniq = pd.DataFrame({"i": ex.index, "term": ex.to_numpy(object)}
                            ).drop_duplicates()
        out = (uniq.groupby("term", observed=True, sort=False)
               .size().rename("dfc").reset_index())
        return out.astype({"dfc": "int64"})

    dfp = ds.map_batches(df_partial, batch_format="pandas").materialize()

    if dfp.count() <= driver_threshold:
        tab = (dfp.to_pandas().groupby("term")["dfc"].sum().sort_index())
        ref = ray.put((tab.index.to_numpy(object),
                       tab.to_numpy("int64")))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            dt = doc_term_frame(df, id_col, text_col)
            terms, counts = ray.get(ref)
            pos = np.searchsorted(terms, dt["term"].to_numpy(object))
            dt["df"] = counts[pos]
            return _tfidf_rank(dt, n_docs, k, id_col)

        return ds.map_batches(score, batch_format="pandas")

    post = ds.map_batches(
        lambda df: doc_term_frame(df, id_col, text_col),
        batch_format="pandas")

    def pp(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(pp=hash64mod(df["term"], nparts))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # (doc, term) rows are globally unique (a doc lives in one
        # batch), so df within this term partition IS the global df
        return g.assign(df=g.groupby("term", observed=True)["term"]
                        .transform("size").astype("int64")).drop(columns="pp")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return _tfidf_rank(g, n_docs, k, id_col)

    return (post.map_batches(pp, batch_format="pandas")
            .groupby("pp").map_groups(attach_df, batch_format="pandas")
            .groupby(id_col).map_groups(topk, batch_format="pandas"))


def tfidf_oracle(ids: list, texts: list, k: int = 5) -> list[dict]:
    """Pure-Python spec oracle (ground truth for pytest)."""
    import math
    import re as _re
    from collections import Counter

    docs = {}
    for i, t in zip(ids, texts):
        w = [x for x in _re.sub(r"[^a-z0-9]+", " ", t.lower()).split()
             if x]
        docs[i] = Counter(w)
    n = len(ids)
    dfc: Counter = Counter()
    for c in docs.values():
        dfc.update(c.keys())
    rows = []
    for i in sorted(docs):
        scored = sorted(
            ((tf * math.log(n / dfc[t]), tf, t) for t, tf in
             docs[i].items()),
            key=lambda x: (-x[0], -x[1], x[2]))
        for r, (s, tf, t) in enumerate(scored[:k], 1):
            rows.append({"doc_id": i, "rnk": r, "term": t, "tf": tf,
                         "df": dfc[t]})
    return rows


# ---------------------------------------------------------------------
# Fused filter cascade with per-rule attrition funnel — the
# FineWeb-style "why was each doc dropped" accounting over an ORDERED
# rule chain (first failing rule attributes the drop).  Production
# curation runs live and die by this funnel; it is the batch analog of
# rsyslog's per-action discarded/processed counters
# (runtime/statsobj.c).  Every rule is INTEGER-exact (word-count
# bounds, cross-multiplied mean-word-length band, stopword presence
# hits, substring gates) so the q:filter_cascade DuckDB oracle never
# compares floats.  One streaming pass: each batch emits a single
# 7-bin first-fail histogram row (the combiner), the driver reduces
# O(n_batches) tiny rows (CLAUDE.md invariant 3).
# ---------------------------------------------------------------------

FILTER_CASCADE_RULES = ("min_words", "max_words", "mean_wlen",
                        "stopwords", "braces", "lorem")


def cascade_first_fail(texts: pd.Series, *, min_words: int = 30,
                       max_words: int = 90) -> np.ndarray:
    """0 = passes every rule, else the 1-based index of the FIRST
    failing rule in FILTER_CASCADE_RULES.  mean-word-length band is
    [4.5, 5.0] tested as 2*n_chars >= 9*n_words AND n_chars <=
    5*n_words — exact integer arithmetic, no division."""
    n_words = texts.str.split().str.len().fillna(0).astype("int64")
    n_chars = (texts.str.replace(r"\s", "", regex=True).str.len()
               .fillna(0).astype("int64")).to_numpy()
    nw = n_words.to_numpy()
    stop_hits = sum(
        texts.str.contains(rf"\b{w}\b", case=False, regex=True)
        .astype("int64") for w in GOPHER_STOPWORDS).to_numpy()
    braces = texts.str.contains("{", regex=False).to_numpy()
    lorem = texts.str.lower().str.contains("lorem ipsum",
                                           regex=False).to_numpy()
    return np.select(
        [nw < min_words,
         nw > max_words,
         (2 * n_chars < 9 * nw) | (n_chars > 5 * nw),
         stop_hits < 1,
         braces,
         lorem],
        [1, 2, 3, 4, 5, 6], default=0).astype(np.int64)


def filter_cascade(ds, *, text_col: str = "text", min_words: int = 30,
                   max_words: int = 90) -> pd.DataFrame:
    """Attrition funnel over the ordered rule chain: one row per rule
    with (stage, rule, n_in, n_dropped, n_out); the last row's n_out
    is the survivor count.  Single pass, one histogram row per batch,
    O(n_batches × 7) driver reduce — streams at any corpus size."""
    nr = len(FILTER_CASCADE_RULES)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ff = cascade_first_fail(df[text_col], min_words=min_words,
                                max_words=max_words)
        h = np.bincount(ff, minlength=nr + 1)
        return pd.DataFrame([{f"f{i}": int(h[i]) for i in range(nr + 1)}])

    parts = (ds.map_batches(partial, batch_format="pandas")
             .to_pandas().sum(axis=0))
    total = int(parts.sum())
    rows = []
    n_in = total
    for i, rule in enumerate(FILTER_CASCADE_RULES, start=1):
        dropped = int(parts[f"f{i}"])
        rows.append({"stage": i, "rule": rule, "n_in": n_in,
                     "n_dropped": dropped, "n_out": n_in - dropped})
        n_in -= dropped
    return pd.DataFrame(rows).astype({"stage": "int64", "n_in": "int64",
                                      "n_dropped": "int64",
                                      "n_out": "int64"})


def cascade_oracle(texts: list, *, min_words: int = 30,
                   max_words: int = 90) -> list[dict]:
    """Pure-Python spec oracle (ground truth for pytest)."""
    import re as _re

    drops = [0] * (len(FILTER_CASCADE_RULES) + 1)
    for t in texts:
        nw = len(t.split())
        nc = len(_re.sub(r"\s", "", t))
        sh = sum(bool(_re.search(rf"\b{w}\b", t, _re.I))
                 for w in GOPHER_STOPWORDS)
        if nw < min_words:
            f = 1
        elif nw > max_words:
            f = 2
        elif 2 * nc < 9 * nw or nc > 5 * nw:
            f = 3
        elif sh < 1:
            f = 4
        elif "{" in t:
            f = 5
        elif "lorem ipsum" in t.lower():
            f = 6
        else:
            f = 0
        drops[f] += 1
    rows, n_in = [], len(texts)
    for i, rule in enumerate(FILTER_CASCADE_RULES, start=1):
        rows.append({"stage": i, "rule": rule, "n_in": n_in,
                     "n_dropped": drops[i], "n_out": n_in - drops[i]})
        n_in -= drops[i]
    return rows


# ---------------------------------------------------------------------
# full language-ID: Unicode-script detection + extended Latin profiles

# char-class counts run as C-level regex passes over the whole column
# (one per script), not per-row Python
_SCRIPT_RES = {
    "han": r"[一-鿿]",
    "kana": r"[぀-ヿ]",
    "hangul": r"[가-힯ᄀ-ᇿ]",
    "cyrillic": r"[Ѐ-ӿ]",
    "arabic": r"[؀-ۿ]",
    "devanagari": r"[ऀ-ॿ]",
    "greek": r"[Ͱ-Ͽ]",
    "hebrew": r"[֐-׿]",
    "thai": r"[฀-๿]",
}
_SCRIPT_LANG = {"han": "zh", "kana": "ja", "hangul": "ko",
                "cyrillic": "ru", "arabic": "ar", "devanagari": "hi",
                "greek": "el", "hebrew": "he", "thai": "th"}
_LATIN_RE = r"[A-Za-zÀ-ɏ]"

# common-stopword profiles (public knowledge); overlapping words are
# fine — scoring is distinct-type overlap argmax with the tie broken
# by this dict's order
LANG_PROFILES_FULL = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it",
           "with", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "eine", "auf"},
    "fr": {"le", "les", "et", "est", "une", "dans", "que", "pour",
           "des", "du"},
    "es": {"el", "los", "las", "es", "una", "y", "para", "con",
           "por", "como"},
    "it": {"il", "che", "di", "non", "per", "del", "gli", "sono",
           "anche", "più"},
    "pt": {"o", "os", "as", "um", "uma", "não", "com", "são",
           "mais", "dos"},
    "nl": {"de", "het", "een", "van", "en", "niet", "met", "voor",
           "zijn", "op"},
    "sv": {"och", "att", "det", "som", "en", "är", "på", "för",
           "av", "till"},
    "pl": {"nie", "się", "jest", "na", "do", "to", "że", "z", "w",
           "po"},
}


def lang_id_full_frame(texts: pd.Series, *,
                       script_frac: float = 0.3) -> pd.Series:
    """Two-stage language ID, the production-shaped upgrade of
    :func:`lang_id_frame`'s 4-language demo (which stays as-is — its
    SQL oracle mirrors those profiles exactly):

    1. SCRIPT: count letters per Unicode script with one C regex pass
       per script over the whole column.  A non-Latin script holding
       >= ``script_frac`` of a row's letters decides directly —
       han -> zh (ja if any kana), kana -> ja, hangul -> ko,
       cyrillic -> ru, arabic -> ar, devanagari -> hi, greek -> el,
       hebrew -> he, thai -> th.  Coarse by design (all-Cyrillic ->
       ru, not uk/bg) and documented as such.
    2. LATIN: distinct-stopword-type overlap argmax over the
       9-language profiles above, 'und' when nothing matches —
       the same vectorized explode/isin shape as lang_id_frame.
    """
    idx = texts.index
    t = texts.fillna("")
    script_names = list(_SCRIPT_RES)
    sc = np.stack([t.str.count(rx).to_numpy(np.int64)
                   for rx in _SCRIPT_RES.values()], axis=1)
    latin = t.str.count(_LATIN_RE).to_numpy(np.int64)
    total = sc.sum(axis=1) + latin

    pred = np.full(len(t), "und", dtype=object)
    best_s = sc.argmax(axis=1)
    best_c = sc.max(axis=1) if len(t) else np.zeros(0, np.int64)
    with np.errstate(invalid="ignore"):
        scripty = (total > 0) & (best_c >= np.maximum(
            3, script_frac * total))
    for j, name in enumerate(script_names):
        m = scripty & (best_s == j)
        if m.any():
            pred[m] = _SCRIPT_LANG[name]
    # han rows containing any kana are Japanese
    kana_j = script_names.index("kana")
    han_j = script_names.index("han")
    ja = scripty & (best_s == han_j) & (sc[:, kana_j] > 0)
    pred[ja] = "ja"

    rest = ~scripty
    if rest.any():
        sub = t[rest]
        toks = sub.str.lower().str.split().explode()
        pairs = (toks.reset_index().drop_duplicates()
                 .set_index("index").iloc[:, 0])
        langs = list(LANG_PROFILES_FULL)
        scores = np.zeros((int(rest.sum()), len(langs)), dtype=np.int64)
        pos = pd.Series(np.arange(int(rest.sum())), index=sub.index)
        rows = pos.reindex(pairs.index).to_numpy()
        for j, lang in enumerate(langs):
            hit = pairs.isin(LANG_PROFILES_FULL[lang]).to_numpy()
            if hit.any():
                np.add.at(scores[:, j], rows[hit], 1)
        lbest = scores.argmax(axis=1)
        lpred = np.array(langs, dtype=object)[lbest]
        lpred[scores.max(axis=1) == 0] = "und"
        pred[rest] = lpred
    return pd.Series(pred, index=idx)


# ---------------------------------------------------------------------
# charset sniff + decode — raw crawl payload bytes -> text

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I)
_KNOWN_CHARSETS = {"utf-8": "utf-8", "utf8": "utf-8",
                   "iso-8859-1": "latin-1", "latin-1": "latin-1",
                   "windows-1252": "cp1252", "cp1252": "cp1252",
                   "ascii": "ascii", "us-ascii": "ascii",
                   "utf-16": "utf-16", "shift_jis": "shift_jis",
                   "euc-jp": "euc_jp", "gb2312": "gb18030",
                   "gbk": "gb18030", "gb18030": "gb18030",
                   "big5": "big5", "euc-kr": "euc_kr",
                   "koi8-r": "koi8_r", "iso-8859-2": "iso8859_2"}


def sniff_decode_row(raw: bytes) -> tuple[str, str]:
    """(text, charset) for one payload, by precedence:

    1. BOM — utf-8-sig / utf-16-le / utf-16-be (authoritative).
    2. strict UTF-8 decode of the whole payload.
    3. HTML ``<meta charset=...>`` in the first 1024 bytes, when the
       name maps to a codec we ship (decode with replacement — the
       page SAID so; mojibake is the page's bug, not ours).
    4. cp1252 fallback (the de-facto web default; superset of
       latin-1, never fails).

    ASCII-only payloads are inherently ambiguous and sniff as utf-8 —
    the documented, standard resolution.  One small C decode call per
    row (bytes.decode), no Python char loops."""
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace"), "utf-8-sig"
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace"), "utf-16-be"
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        name = m.group(1).decode("ascii", "replace").lower()
        codec = _KNOWN_CHARSETS.get(name)
        if codec and codec not in ("utf-8", "ascii"):
            return raw.decode(codec, "replace"), codec
    return raw.decode("cp1252", "replace"), "cp1252"


def sniff_decode_frame(payloads: pd.Series) -> pd.DataFrame:
    """Vectorized wrapper: (text, charset) columns from a binary
    payload column (the WARC ``payload`` convention)."""
    pairs = payloads.map(lambda b: sniff_decode_row(bytes(b)))
    return pd.DataFrame({"text": pairs.str[0], "charset": pairs.str[1]},
                        index=payloads.index)
