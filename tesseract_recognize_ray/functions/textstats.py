"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All vectorized (pandas string kernels / numpy)
inside map_batches; the language model is a stateful actor-pool class
(profiles built once per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

_TOKEN_RE = r"\S+"
# a BPE-ish subword splitter: runs of letters, runs of digits, single other
_BPEISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PUNCT_RE = r"[.,;:!?'\"()\[\]-]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "auf", "sich"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "que", "pour", "sur", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "con", "del"},
}


def token_count(ds: Dataset, text_col: str, out_col: str = "n_tokens") -> Dataset:
    """Whitespace token count per row (0 for blank text)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = batch[text_col].fillna("").str.count(_TOKEN_RE).astype("int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def bpeish_token_count(ds: Dataset, text_col: str, out_col: str = "n_subtokens") -> Dataset:
    """Subword-ish token count (letters / digit runs / single punct)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = batch[text_col].fillna("").str.count(_BPEISH_RE).astype("int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def quality_stats(ds: Dataset, text_col: str) -> Dataset:
    """Per-row quality signals: n_chars, n_tokens, mean token length,
    punctuation ratio, digit ratio, uppercase ratio. Vectorized pandas."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        n_chars = t.str.len().astype("int64")
        n_tokens = t.str.count(_TOKEN_RE).astype("int64")
        denom = n_chars.where(n_chars > 0, 1)
        batch["n_chars_q"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["mean_token_len"] = ((n_chars - n_tokens + 1).clip(lower=0) / n_tokens.where(n_tokens > 0, 1)).round(4)
        batch["punct_ratio"] = (t.str.count(_PUNCT_RE) / denom).round(4)
        batch["digit_ratio"] = (t.str.count(r"[0-9]") / denom).round(4)
        batch["upper_ratio"] = (t.str.count(r"[A-Z]") / denom).round(4)
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def quality_counts(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """Exact integer quality signals (no float ratios — deterministic under
    any execution order, SQL-oracle-friendly): n_chars, n_tokens, n_punct,
    n_digits, n_upper per row."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[text_col].fillna("")
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_chars": t.str.len().astype("int64"),
                "n_tokens": t.str.count(_TOKEN_RE).astype("int64"),
                "n_punct": t.str.count(_PUNCT_RE).astype("int64"),
                "n_digits": t.str.count(r"[0-9]").astype("int64"),
                "n_upper": t.str.count(r"[A-Z]").astype("int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def _ws_token_lists(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Whitespace-tokenize a string column into ONE contiguous ListArray
    (offset 0, no chunk seams). Arrow's split_whitespace collapses interior
    runs but emits EMPTY tokens at list edges (leading/trailing whitespace,
    empty/null input) — callers must drop ''."""
    ls = pc.utf8_split_whitespace(pc.fill_null(col, ""))
    if isinstance(ls, pa.ChunkedArray):
        ls = ls.combine_chunks()
    return ls


def flat_ngrams(col: pa.ChunkedArray | pa.Array, n: int) -> tuple[pa.Array, np.ndarray]:
    """Word n-grams for every row of a string column via pure Arrow/numpy
    kernels: tokenize once, join flat[i..i+n-1] element-wise, mask out
    windows that cross a row boundary or touch an edge empty token. Returns
    (ngram string array, source-row index per ngram) — zero Python per
    token. Shared by bigram_counts and ngram decontamination."""
    lists = _ws_token_lists(col)
    flat = lists.flatten()
    ln = len(flat)
    empty = (pa.array([], pa.string()), np.empty(0, dtype=np.int64))
    if ln < n:
        return empty
    m = ln - n + 1
    off = np.asarray(lists.offsets)
    off = off - off[0]  # rebase: flatten() re-bases values to offset 0
    valid = np.ones(m, dtype=bool)
    bounds = off[1:-1]
    for j in range(1, n):  # window starting at b-j spans the boundary at b
        idx = bounds - j
        idx = idx[(idx >= 0) & (idx < m)]
        valid[idx] = False
    ne = np.asarray(pc.not_equal(flat, ""))
    for j in range(n):
        valid &= ne[j : j + m]
    if not valid.any():
        return empty
    mask = pa.array(valid)
    parts = [flat.slice(j, m).filter(mask) for j in range(n)]
    ngrams = pc.binary_join_element_wise(*parts, " ")
    row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off))[:m][valid]
    return ngrams, row_idx


def term_counts(ds: Dataset, text_col: str) -> Dataset:
    """Global term frequency (the web-scale wordcount): per-batch partial
    counts via pure Arrow kernels (split_whitespace → flatten →
    value_counts — the map-side combiner, zero Python per token), then ONE
    groupby(token) sum so the shuffle moves one row per distinct token per
    block, never one row per occurrence."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = _ws_token_lists(batch.column(text_col)).flatten()
        vc = pc.value_counts(flat.filter(pc.not_equal(flat, "")))
        return pa.table(
            {"token": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from .relational import grouped_agg

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], [("n", "sum", "n")]
    )


def bigram_counts(ds: Dataset, text_col: str) -> Dataset:
    """Global bigram frequency over whitespace tokens: per-batch partial
    counts via pure Arrow/numpy kernels — tokenize once, pair flat[i] with
    flat[i+1], mask out pairs that cross a document boundary (list offsets)
    or touch an edge empty token, join with one binary_join_element_wise,
    value_counts. Then ONE groupby(bigram) sum: the shuffle moves one row
    per distinct bigram per block, never one row per occurrence."""
    from ray.data.aggregate import Sum

    empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        big, _ = flat_ngrams(batch.column(text_col), 2)
        if len(big) == 0:
            return empty
        vc = pc.value_counts(big)
        return pa.table(
            {"bigram": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from .relational import grouped_agg

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"), ["bigram"], [("n", "sum", "n")]
    )


def regex_redact(
    ds: Dataset,
    col: str,
    pattern: str,
    replacement: str,
    *,
    out_col: str = "redacted",
    count_col: str = "n_hits",
) -> Dataset:
    """PII-style redaction: replace every regex match in `col` with
    `replacement` and count the matches. Fully vectorized (pyarrow RE2
    kernels — same regex engine family as DuckDB's regexp_replace, so
    semantics match the SQL oracle); zero shuffle."""

    def fn(b: pa.Table) -> pa.Table:
        s = b.column(col)
        b = b.append_column(out_col, pc.replace_substring_regex(s, pattern=pattern, replacement=replacement))
        return b.append_column(count_col, pc.cast(pc.count_substring_regex(s, pattern=pattern), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def repetition_stats(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """Gopher-style repetition signals per document: total whitespace
    tokens, distinct tokens, the top token's occurrence count, and the
    duplicate-token fraction 1 − distinct/total. One vectorized
    explode+groupby per batch (each row is a whole document, so the stats
    never cross batch boundaries); zero shuffle. Input columns are
    preserved, so the stats compose into downstream filters/dedup."""

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b.reset_index(drop=True)
        ex = b[text_col].fillna("").str.split().explode().dropna()
        ex = ex[ex != ""]
        cnt = ex.groupby([ex.index, ex]).size()
        agg = cnt.groupby(level=0).agg(["sum", "count", "max"])
        out = b.copy()
        out = out.join(agg)
        out[["sum", "count", "max"]] = out[["sum", "count", "max"]].fillna(0).astype("int64")
        out = out.rename(columns={"sum": "n_words", "count": "n_distinct", "max": "top_word_n"})
        n_w = out["n_words"].to_numpy(dtype=np.float64)
        n_d = out["n_distinct"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = 1.0 - n_d / n_w
        out["dup_frac"] = np.where(n_w > 0, frac, 0.0)
        return out

    return ds.map_batches(fn, batch_format="pandas")


class LangId:
    """Stopword + character-profile language scorer (n-gram heuristic).
    Profiles compiled once per actor (__init__), applied per batch."""

    def __init__(self):
        self.word = re.compile(r"[a-zäöüéèêàáíóúñç]+")
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.accents = {
            "de": set("äöüß"),
            "fr": set("éèêàçùâîôû"),
            "es": set("ñáéíóúü"),
            "en": set(),
        }

    def _score_text(self, text: str) -> str:
        """Reference formula (kept for unit parity with the vectorized
        batch path below): stopword hits 1.0, accent-char presence 0.5."""
        toks = self.word.findall(text.lower())
        if not toks:
            return "unknown"
        scores = {}
        tokset = toks[:200]
        for lang, stops in self.stop.items():
            s = sum(1.0 for w in tokset if w in stops)
            s += sum(0.5 for w in tokset for ch in self.accents[lang] if ch in w)
            scores[lang] = s
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else "unknown"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        """Vectorized scorer: one findall pass, explode to a token series
        (first 200 per doc), then pandas isin/contains kernels per language —
        identical outputs to _score_text, no per-token Python."""
        n = len(batch)
        toks = (
            batch["text"].reset_index(drop=True).fillna("").str.lower().str.findall(self.word).explode()
        )
        toks = toks.dropna()
        if len(toks):
            pos = toks.groupby(level=0).cumcount()
            toks = toks[pos.to_numpy() < 200]
        langs = sorted(self.stop)
        scores = np.zeros((n, len(langs)), dtype=np.float64)
        if len(toks):
            idx = toks.index.to_numpy()
            for j, lang in enumerate(langs):
                s = toks.isin(self.stop[lang]).to_numpy().astype(np.float64)
                for ch in self.accents[lang]:
                    s = s + 0.5 * toks.str.contains(ch, regex=False).to_numpy()
                scores[:, j] += np.bincount(idx, weights=s, minlength=n)[:n]
        best_j = scores.argmax(axis=1)  # ties -> lowest index = sorted-first
        best = np.array(langs, dtype=object)[best_j]
        best[scores.max(axis=1) <= 0] = "unknown"
        batch["lang_pred"] = best
        return batch


def lang_id(ds: Dataset, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=concurrency, num_cpus=1)


def json_extract_int(ds: Dataset, json_col: str, key: str, out_col: str) -> Dataset:
    """Vectorized JSON field extraction (int) from a string column — the
    web-scale 'parse the props blob' staple. json.loads per row inside
    map_batches (C-accelerated; a regex fast-path would be fragile against
    re-ordered keys)."""
    import json

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        def get(s):
            if not s:
                return None
            try:
                v = json.loads(s).get(key)
                return int(v) if v is not None else None
            except (ValueError, TypeError):
                return None

        vals = [get(s) for s in batch[json_col]]
        if any(v is None for v in vals):
            batch[out_col] = pd.array(vals, dtype="Int64")  # nullable path
        else:
            batch[out_col] = np.asarray(vals, dtype=np.int64)
        return batch.drop(columns=[json_col])

    return ds.map_batches(fn, batch_format="pandas")


def fingerprint(
    ds: Dataset,
    text_col: str,
    out_col: str = "fingerprint",
    window: int = 8,
    *,
    hash_fn: str = "blake2b",
) -> Dataset:
    """Winnowed rolling-hash document fingerprint (Rabin-Karp over tokens,
    min-hash per window — the standard winnowing scheme). Hex string.

    Vectorized: ONE pd.factorize over the batch's tokens, blake2b only for
    the batch-unique vocabulary, window minima via a vectorized sliding
    window. Stateless task map (no actor-pool spawn latency); output
    byte-identical to hashing every token occurrence.

    ``hash_fn="md5"`` makes the whole computation VALUE-replayable by an
    ANSI-SQL oracle: token hash = first 8 big-endian bytes of md5 (the one
    64-bit hash SQL engines expose) and the per-doc digest is the XOR of
    the DISTINCT window minima (winnowing's selected-fingerprint SET,
    folded with SQL's bit_xor aggregate) instead of a blake2b digest over
    the minima sequence. Default blake2b output is unchanged."""
    if hash_fn not in ("blake2b", "md5"):
        raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'blake2b' or 'md5')")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from numpy.lib.stride_tricks import sliding_window_view

        tok_lists = [t.split() for t in batch[text_col].fillna("").tolist()]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
        total = int(counts.sum())
        out = ["0" * 16] * len(tok_lists)
        if total:
            import itertools

            all_toks = np.fromiter(
                itertools.chain.from_iterable(tok_lists), dtype=object, count=total
            )
            codes, uniques = pd.factorize(all_toks)
            if hash_fn == "md5":
                huniq = np.fromiter(
                    (int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in uniques),
                    dtype=np.uint64,
                    count=len(uniques),
                )
            else:
                huniq = np.fromiter(
                    (
                        int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                        for t in uniques
                    ),
                    dtype=np.uint64,
                    count=len(uniques),
                )
            hs_all = huniq[codes]
            offsets = np.concatenate(([0], np.cumsum(counts)))
            for i, n in enumerate(counts):
                if not n:
                    continue
                hs = hs_all[offsets[i] : offsets[i + 1]]
                if n >= window:
                    mins = np.ascontiguousarray(sliding_window_view(hs, window).min(axis=1))
                else:
                    mins = hs
                if hash_fn == "md5":
                    acc = np.uint64(0)
                    for v in np.unique(mins):
                        acc ^= v
                    out[i] = f"{int(acc):016x}"
                else:
                    out[i] = hashlib.blake2b(mins.tobytes(), digest_size=8).hexdigest()
        batch[out_col] = out
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def flat_token_chunks(
    col: pa.ChunkedArray | pa.Array, n_tokens: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Split every row of a string column into fixed-size token chunks
    ("pseudo-paragraphs" of n_tokens whitespace tokens, last chunk ragged)
    with pure Arrow/numpy kernels: tokenize once, drop empty edge tokens,
    rebuild a ListArray whose offsets sit at chunk boundaries, and join each
    chunk with ONE binary_join call — zero Python per token. Returns
    (chunk strings, source-row index per chunk, within-row chunk index)."""
    lists = _ws_token_lists(col)
    flat = lists.flatten()
    off = np.asarray(lists.offsets, dtype=np.int64)
    off = off - off[0]
    empty = (
        pa.array([], pa.string()),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if len(flat) == 0:
        return empty
    ne = np.asarray(pc.not_equal(flat, ""))
    clean = flat.filter(pa.array(ne))
    # non-empty token count per row -> clean offsets
    csum = np.concatenate([[0], np.cumsum(ne)])
    lens = csum[off[1:]] - csum[off[:-1]]
    clean_off = np.concatenate([[0], np.cumsum(lens)])
    n_chunks = -(-lens // n_tokens)  # ceil; 0 for empty rows
    total = int(n_chunks.sum())
    if total == 0:
        return empty
    row_of_chunk = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(n_chunks)])[:-1], n_chunks
    )
    starts = clean_off[row_of_chunk] + chunk_idx * n_tokens
    offsets = np.concatenate([starts, [clean_off[-1]]]).astype(np.int32)
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), clean), " "
    )
    return chunks, row_of_chunk, chunk_idx


def grouped_term_counts(ds: Dataset, group_col: str, text_col: str) -> Dataset:
    """Term frequency PER GROUP (e.g. per language): the per-batch combiner
    tokenizes with Arrow kernels, attaches the group of each token via one
    np.repeat over the list offsets, and pre-counts (group, token) pairs with
    a vectorized pyarrow group_by — the shuffle moves one row per distinct
    (group, token) per block, never one row per occurrence."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lists = _ws_token_lists(batch.column(text_col))
        flat = lists.flatten()
        off = np.asarray(lists.offsets, dtype=np.int64)
        off = off - off[0]
        row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off))
        mask = pc.not_equal(flat, "")
        t = pa.table(
            {
                group_col: pc.take(batch.column(group_col).combine_chunks(), pa.array(row_idx)),
                "token": flat,
            }
        ).filter(mask)
        return (
            t.group_by([group_col, "token"])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, "token", "n"])
        )

    from .relational import grouped_agg

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        [group_col, "token"],
        [("n", "sum", "n")],
    )


def bm25_top_docs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> Dataset:
    """BM25 relevance ranking for a fixed query-term set (Robertson/Lucene
    idf = ln(1 + (N-df+0.5)/(df+0.5))): top-k docs by score. Scale shape:
    pass 1 reduces every doc to one compact stats row (dl + one tf per term,
    all ints — vectorized is_in over the flat token array, never per-row
    Python) and MATERIALIZES it (m+2 ints per doc, not the text); the corpus
    constants (N, avgdl, df) come from ONE driver-side aggregate over it;
    pass 2 re-reads the cached stats rows, scores each doc in numpy with the
    broadcast constants, and prunes to k rows per block before the final
    top-k. Scores are deterministic: integer inputs + shared float64
    constants, summed in fixed term order."""
    from .relational import topk

    m = len(terms)
    term_arr = pa.array(terms, pa.string())

    def per_doc(batch: pa.Table) -> pa.Table:
        lists = _ws_token_lists(batch.column(text_col))
        flat = lists.flatten()
        off = np.asarray(lists.offsets, dtype=np.int64)
        off = off - off[0]
        row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off))
        ne = np.asarray(pc.not_equal(flat, ""))
        n_rows = len(lists)
        dl = np.bincount(row_idx[ne], minlength=n_rows).astype(np.int64)
        cols = {id_col: batch.column(id_col), "dl": pa.array(dl)}
        code = np.asarray(pc.index_in(flat, value_set=term_arr).fill_null(m))
        for i in range(m):
            hit = ne & (code == i)
            cols[f"tf_{i}"] = pa.array(
                np.bincount(row_idx[hit], minlength=n_rows).astype(np.int64)
            )
        return pa.table(cols)

    stats = ds.map_batches(per_doc, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Count, Sum

    def nz(batch: pa.Table) -> pa.Table:
        cols = {"dl": batch.column("dl")}
        for i in range(m):
            cols[f"nz_{i}"] = pc.cast(
                pc.greater(batch.column(f"tf_{i}"), 0), pa.int64()
            )
        return pa.table(cols)

    agg = stats.map_batches(nz, batch_format="pyarrow").aggregate(
        Count(alias_name="n_docs"),
        Sum("dl", alias_name="sum_dl"),
        *[Sum(f"nz_{i}", alias_name=f"df_{i}") for i in range(m)],
    )
    n_docs = float(agg["n_docs"])
    avgdl = float(agg["sum_dl"]) / n_docs
    idf = np.array(
        [np.log1p((n_docs - agg[f"df_{i}"] + 0.5) / (agg[f"df_{i}"] + 0.5)) for i in range(m)]
    )

    def score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(dl))
        for i in range(m):
            tf = batch.column(f"tf_{i}").to_numpy(zero_copy_only=False).astype(np.float64)
            s += idf[i] * (tf * (k1 + 1.0)) / (tf + norm)
        t = pa.table({id_col: batch.column(id_col), "bm25": pa.array(s)})
        return t.filter(pc.greater(t.column("bm25"), 0.0))

    out = topk(
        stats.map_batches(score, batch_format="pyarrow"),
        "bm25",
        k,
        descending=True,
        tiebreak=[id_col],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bm25": pc.round(batch.column("bm25"), ndigits=round_digits),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def sliding_token_chunks(
    ds: Dataset,
    id_col: str,
    text_col: str,
    window: int,
    stride: int,
) -> Dataset:
    """OVERLAPPING fixed-size token windows — the LLM-training chunker
    (context-window packing with stride overlap). Every row with L > 0
    non-empty whitespace tokens yields ceil(max(L - window, 0) / stride) + 1
    chunks; chunk i covers tokens [i*stride, i*stride + window) clipped to L
    (the final chunk is ragged, and every token is covered).

    Fully vectorized flat-map: one Arrow tokenize per batch, one numpy
    gather-index build (overlap = replicated take indices, never Python
    loops), one ListArray + binary_join to rebuild chunk strings. Each
    output row is (id, chunk_idx, chunk); rows stay independent, so the
    stage streams — no shuffle, no state."""
    if stride <= 0 or window <= 0:
        raise ValueError("sliding_token_chunks: window and stride must be positive")

    def fn(batch: pa.Table) -> pa.Table:
        lists = _ws_token_lists(batch.column(text_col))
        flat = lists.flatten()
        off = np.asarray(lists.offsets, dtype=np.int64)
        off = off - off[0]
        empty = pa.table(
            {
                id_col: batch.column(id_col).slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
        if len(flat) == 0:
            return empty
        ne = np.asarray(pc.not_equal(flat, ""))
        clean = flat.filter(pa.array(ne))
        csum = np.concatenate([[0], np.cumsum(ne)])
        lens = csum[off[1:]] - csum[off[:-1]]
        clean_off = np.concatenate([[0], np.cumsum(lens)])
        n_chunks = np.where(lens > 0, -(-np.maximum(lens - window, 0) // stride) + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return empty
        row_of_chunk = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_chunks)])[:-1], n_chunks
        )
        starts = chunk_idx * stride  # within-row token start
        w = np.minimum(starts + window, lens[row_of_chunk]) - starts  # ragged tail
        gstart = clean_off[row_of_chunk] + starts  # global token start
        tot_tok = int(w.sum())
        # replicated gather indices: arange minus per-chunk rebase
        w_off = np.concatenate([[0], np.cumsum(w)])
        ar = np.arange(tot_tok, dtype=np.int64) - np.repeat(w_off[:-1], w)
        take_idx = np.repeat(gstart, w) + ar
        toks = clean.take(pa.array(take_idx))
        chunks = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(w_off, pa.int64()).cast(pa.int32()), toks), " "
        )
        return pa.table(
            {
                id_col: pc.take(batch.column(id_col).combine_chunks(), pa.array(row_of_chunk)),
                "chunk_idx": pa.array(chunk_idx, pa.int64()),
                "chunk": chunks,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def unigram_logprob(
    ds: Dataset,
    id_col: str,
    text_col: str,
    vocab_size: int = 5000,
    floor_count: float = 0.5,
) -> Dataset:
    """CCNet-style unigram language-model quality score, integer-exact so a
    SQL oracle reproduces it bit-for-bit: per document,

        lp_micro = sum over whitespace tokens of
                   CAST(ROUND(log10(p(token)) * 1e6) AS BIGINT)

    where p(token) = corpus_count/total for the ``vocab_size`` most frequent
    tokens (ties broken by token asc — same order as the topk contract) and
    p(OOV) = floor_count/total. Per-token quantization to integer micro-nats
    BEFORE the per-doc sum makes the distributed reduce order-independent
    (int64 adds commute exactly; float sums don't). Output:
    (id_col, n_tokens, lp_micro) with one row per input document — empty /
    whitespace-only docs score (0, 0).

    Scale shape: pass 1 = term_counts (map-side combiner, one row per
    distinct token per block through the shuffle), materialized once —
    the vocabulary is the corpus's distinct-token set, bounded and tiny
    relative to the corpus (web corpora: ~10^8 rows from 10^12 docs);
    top-V + total then reduce it to a broadcast table shipped once via
    ray.put, and pass 2 streams documents through one vectorized
    map_batches (Arrow tokenize -> pc.index_in against the broadcast
    vocab -> np.add.at per-doc int sums). No per-token Python."""
    import ray

    from .relational import topk

    counts = term_counts(ds, text_col).materialize()
    total = int(counts.sum("n"))
    top = topk(counts, "n", vocab_size, descending=True, tiebreak=["token"]).to_pandas()
    lp = np.round(np.log10(top["n"].to_numpy(np.float64) / total) * 1e6).astype(np.int64)
    floor_lp = np.int64(np.round(np.log10(floor_count / total) * 1e6))
    vocab_ref = ray.put((pa.array(top["token"], pa.string()), lp))

    def fn(batch: pa.Table) -> pa.Table:
        vocab_arr, lp_arr = ray.get(vocab_ref)
        lists = _ws_token_lists(batch.column(text_col))
        flat = lists.flatten()
        off = np.asarray(lists.offsets)
        off = off - off[0]  # flatten() re-bases values to offset 0
        docidx = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off))
        ne = np.asarray(pc.not_equal(flat, ""))
        docidx = docidx[ne]
        idx = pc.index_in(flat.filter(pa.array(ne)), value_set=vocab_arr)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        idx_np = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_lp = np.where(valid, lp_arr[idx_np], floor_lp)
        n = len(lists)
        sums = np.zeros(n, dtype=np.int64)
        np.add.at(sums, docidx, tok_lp)
        ntok = np.bincount(docidx, minlength=n).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(ntok),
                "lp_micro": pa.array(sums),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(
    ds: Dataset,
    id_col: str,
    text_col: str,
    seq_len: int,
    num_buckets: int = 32,
    sample_per_block: int = 32,
) -> Dataset:
    """Concat-and-chunk sequence packing (GPT-style training prep): lay every
    document's whitespace tokens end-to-end in id order as ONE global token
    stream, cut the stream into fixed ``seq_len`` windows, and emit one row
    per (window, doc) overlap: (window_id, id, tok_start, tok_end) — the
    doc-local half-open token span that lands in that window. A training
    loader can materialize window w by gathering those spans in id order.

    Distributed shape (the text itself never moves):
      1. one vectorized count pass (doc -> non-empty token count; docs with
         0 tokens drop out, matching the SQL oracle);
      2. sampled range partitioning on id (same primitive as
         global_row_number) so equal-id rows co-locate and bucket order is
         total — the shuffle payload is (id, count) pairs, ~16 bytes/doc;
      3. per-bucket token sums -> driver prefix sum -> broadcast base
         offsets (num_buckets int64s, never data rows);
      4. one vectorized per-bucket emission (repeat/arange window algebra,
         no Python loops).
    Skew note: window assignment is pure arithmetic on offsets, so a hot
    bucket only ever holds its share of (id,count) pairs, never text."""
    if seq_len <= 0:
        raise ValueError("pack_sequences: seq_len must be positive")

    def count_fn(b: pa.Table) -> pa.Table:
        lists = _ws_token_lists(b.column(text_col))
        flat = lists.flatten()
        off = np.asarray(lists.offsets, dtype=np.int64)
        off = off - off[0]
        if len(flat) == 0:
            n = np.zeros(max(len(off) - 1, 0), dtype=np.int64)
        else:
            ne = np.asarray(pc.not_equal(flat, ""))
            csum = np.concatenate([[0], np.cumsum(ne)])
            n = (csum[off[1:]] - csum[off[:-1]]).astype(np.int64)
        keep = n > 0
        return pa.table(
            {
                id_col: b.column(id_col).filter(pa.array(keep)),
                "__n": pa.array(n[keep]),
            }
        )

    # materialize: the (id, count) stream has THREE consumers (split sample,
    # per-bucket sums, final emit) and Ray has no lineage cache — without
    # this the full-corpus tokenize pass runs three times. Pinned payload is
    # ~16 bytes/doc, never text.
    counts = ds.map_batches(count_fn, batch_format="pyarrow").materialize()

    # sampled range splits on id (bounded driver pull: blocks x samples ids)
    def sample(t: pa.Table) -> pa.Table:
        idx = np.unique(
            np.linspace(0, max(len(t) - 1, 0), num=min(sample_per_block, len(t))).astype(np.int64)
        )
        return pa.table({id_col: t.column(id_col).take(pa.array(idx))})

    parts = [
        b[id_col].to_numpy()
        for b in counts.map_batches(sample, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pandas"
        )
    ]
    samples = np.sort(np.concatenate(parts)) if parts else np.array([])
    if len(samples) == 0:
        splits = np.array([])
    else:
        qs = np.linspace(0, len(samples) - 1, num=num_buckets + 1).astype(np.int64)[1:-1]
        splits = np.unique(samples[qs])

    def add_bucket(b: pa.Table) -> pa.Table:
        v = b.column(id_col).to_numpy(zero_copy_only=False)
        bk = np.searchsorted(splits, v, side="right").astype(np.int32)
        return b.append_column("__rb", pa.array(bk, pa.int32()))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow")

    from tesseract_recognize_ray.functions.relational import grouped_agg

    sums = grouped_agg(bucketed, ["__rb"], [("__n", "sum", "tok")]).to_pandas()
    sums = sums.sort_values("__rb")
    base = dict(
        zip(
            sums["__rb"].to_numpy(),
            np.concatenate([[0], np.cumsum(sums["tok"].to_numpy(np.int64))[:-1]]),
        )
    )
    L = np.int64(seq_len)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["__rb"].iloc[0])
        g = g.sort_values(id_col, kind="mergesort")
        n = g["__n"].to_numpy(np.int64)
        s = np.cumsum(n) - n + np.int64(base[bk])
        w0 = s // L
        reps = (s + n - 1) // L - w0 + 1
        doc_idx = np.repeat(np.arange(len(g), dtype=np.int64), reps)
        win = (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(reps)])[:-1], reps)
            + w0[doc_idx]
        )
        return pd.DataFrame(
            {
                "window_id": win,
                id_col: g[id_col].to_numpy()[doc_idx],
                "tok_start": np.maximum(win * L - s[doc_idx], 0),
                "tok_end": np.minimum((win + 1) * L - s[doc_idx], n[doc_idx]),
            }
        )

    return bucketed.groupby("__rb").map_groups(emit, batch_format="pandas")


def flat_ngrams_pos(
    col: pa.ChunkedArray | pa.Array, n: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Like :func:`flat_ngrams` but also returns each n-gram's 0-based token
    position within its row, counted over NON-EMPTY tokens only (the position
    model of ``regexp_extract_all(text, '\\S+')``): empty edge tokens from
    split_whitespace are removed BEFORE windowing, so positions line up with
    a SQL tokenizer's and windows never contain ''. Returns
    (ngram strings, source-row index, token position), all window-aligned."""
    empty = (
        pa.array([], pa.string()),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    lists = _ws_token_lists(col)
    flat = lists.flatten()
    off = np.asarray(lists.offsets, dtype=np.int64)
    off = off - off[0]
    ne = np.asarray(pc.not_equal(pc.fill_null(flat, ""), ""))
    csum = np.concatenate([[0], np.cumsum(ne)]).astype(np.int64)
    off2 = csum[off]  # per-row boundaries in the empties-removed flat array
    flat2 = flat.filter(pa.array(ne))
    ln = len(flat2)
    if ln < n:
        return empty
    m = ln - n + 1
    valid = np.ones(m, dtype=bool)
    bounds = off2[1:-1]
    for j in range(1, n):  # window starting at b-j spans the boundary at b
        idx = bounds - j
        idx = idx[(idx >= 0) & (idx < m)]
        valid[idx] = False
    if not valid.any():
        return empty
    mask = pa.array(valid)
    parts = [flat2.slice(j, m).filter(mask) for j in range(n)]
    ngrams = pc.binary_join_element_wise(*parts, " ")
    row_idx_full = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off2))[:m]
    pos_full = np.arange(m, dtype=np.int64) - off2[row_idx_full]
    return ngrams, row_idx_full[valid], pos_full[valid]


class _BPEEncoder:
    """Stateful BPE applier for map_batches actor pools: merge-rank table
    built once per actor from the broadcast merges, plus a word -> tokens
    cache that persists across batches (Zipf: most occurrences hit it).

    Encoding merges the lowest-rank adjacent pair present, all occurrences
    at once, until none applies — provably identical to replaying the
    trainer's merges in rank order (a merge's output symbol can only feed
    pairs learned LATER, so no earlier-rank pair ever reappears); the
    equivalence is pytest-checked against the sequential replay."""

    def __init__(self, merges_ref, text_col: str, out_col: str):
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self.text_col = text_col
        self.out_col = out_col
        self.cache: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        toks = self.cache.get(w)
        if toks is not None:
            return toks
        sym = list(w)
        ranks = self.ranks
        while len(sym) > 1:
            best = None
            bi = 0
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            left, right = sym[bi], sym[bi + 1]
            merged = left + right
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        self.cache[w] = sym
        return sym

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        enc = self._encode_word
        toks_out, counts = [], []
        for t in batch[self.text_col].fillna("").tolist():
            toks: list[str] = []
            for w in t.split():
                toks.extend(enc(w))
            toks_out.append(toks)
            counts.append(len(toks))
        batch = batch.drop(columns=[self.text_col])
        batch[self.out_col] = toks_out
        batch["n_bpe_tokens"] = np.asarray(counts, dtype=np.int64)
        return batch


def bpe_encode(
    ds: Dataset,
    text_col: str,
    merges: pd.DataFrame,
    *,
    out_col: str = "bpe_tokens",
    concurrency=(1, 4),
) -> Dataset:
    """Apply learned BPE merges (bpe_train_merges output, or any
    (left, right) list in rank order) to a text column — the encode half of
    the tokenizer story (train -> encode -> pack_sequences). Emits
    `out_col` (list<str> subword tokens, whitespace-word boundaries
    preserved) and `n_bpe_tokens`.

    Scale shape: the merge table is tiny and ships ONCE via ray.put; the
    encoder is an actor pool whose per-word cache persists across batches,
    so per-occurrence cost is a dict lookup and only DISTINCT words pay the
    merge loop. Not SQL-expressible (iterative); dual-path pytest parity
    with the trainer's own vocabulary evolution."""
    if isinstance(merges, pd.DataFrame):
        pairs = list(zip(merges["left"].tolist(), merges["right"].tolist()))
    else:
        pairs = [(l, r) for l, r in merges]
    ref = ray.put(pairs)
    return ds.map_batches(
        _BPEEncoder,
        fn_constructor_kwargs={"merges_ref": ref, "text_col": text_col, "out_col": out_col},
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )


def bpe_train_merges(
    ds: Dataset,
    text_col: str,
    num_merges: int,
    *,
    driver_vocab_gate: int = 2_000_000,
) -> pd.DataFrame:
    """Distributed BPE merge learning (Sennrich et al. 2016 — public
    literature): learn `num_merges` byte-pair merges over the corpus.
    Pair statistics are a pure function of the (word, count) VOCABULARY, so
    the corpus collapses to one distributed term-count aggregate (the only
    full-data pass — text never crosses an exchange after it); symbols are
    the word's characters (no end-of-word marker). Ties in pair frequency
    break to the lexicographically smallest pair — deterministic across
    partitionings on both paths.

    Below `driver_vocab_gate` distinct words the merge loop folds on the
    driver (the broadcast-gate pattern the graph family uses — each of the
    k iterations is a dict pass over the vocab). Above it, each iteration
    re-applies the learned merges over the vocab-table Dataset and
    re-counts weighted pairs through a grouped aggregate (O(k) exchanges of
    (pair, count) partials; merges-so-far broadcast per iteration).
    Returns a DataFrame (rank, left, right, pair_count)."""
    vocab_ds = term_counts(ds, text_col).materialize()
    n_vocab = vocab_ds.count()

    def _best(pairs: dict) -> tuple:
        best_n = max(pairs.values())
        return min(p for p, n in pairs.items() if n == best_n), best_n

    merges: list[tuple[str, str, int]] = []
    if n_vocab <= driver_vocab_gate:
        vocab: dict[tuple, int] = {}
        for b in vocab_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for w, n in zip(b.column("token").to_pylist(), b.column("n").to_pylist()):
                vocab[tuple(w)] = vocab.get(tuple(w), 0) + int(n)
        for _ in range(num_merges):
            pairs: dict = {}
            for sym, n in vocab.items():
                for a, bch in zip(sym, sym[1:]):
                    pairs[(a, bch)] = pairs.get((a, bch), 0) + n
            if not pairs:
                break
            (pa_, pb_), n_best = _best(pairs)
            merges.append((pa_, pb_, n_best))
            merged = pa_ + pb_
            new_vocab: dict = {}
            for sym, n in vocab.items():
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == pa_ and sym[i + 1] == pb_:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                t = tuple(out)
                new_vocab[t] = new_vocab.get(t, 0) + n
            vocab = new_vocab
    else:
        from .relational import grouped_agg, topk

        for _ in range(num_merges):
            done = list(merges)

            def count_pairs(b: pd.DataFrame) -> pd.DataFrame:
                pairs: dict = {}
                for w, n in zip(b["token"], b["n"]):
                    sym = list(w)
                    for ma, mb, _n in done:
                        out, i, merged = [], 0, ma + mb
                        while i < len(sym):
                            if i + 1 < len(sym) and sym[i] == ma and sym[i + 1] == mb:
                                out.append(merged)
                                i += 2
                            else:
                                out.append(sym[i])
                                i += 1
                        sym = out
                    for a, bch in zip(sym, sym[1:]):
                        pairs[(a, bch)] = pairs.get((a, bch), 0) + int(n)
                if not pairs:
                    return pd.DataFrame(
                        {"a": pd.Series(dtype="object"), "b": pd.Series(dtype="object"),
                         "n": pd.Series(dtype="int64")}
                    )
                ks = list(pairs)
                return pd.DataFrame(
                    {"a": [k[0] for k in ks], "b": [k[1] for k in ks],
                     "n": np.fromiter(pairs.values(), dtype=np.int64, count=len(ks))}
                )

            totals = grouped_agg(
                vocab_ds.map_batches(count_pairs, batch_format="pandas"),
                ["a", "b"],
                [("n", "sum", "n")],
                reduce_blocks=16,
            )
            top = topk(totals, "n", 1, descending=True, tiebreak=["a", "b"]).to_pandas()
            if not len(top):
                break
            merges.append((top["a"][0], top["b"][0], int(top["n"][0])))

    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "pair_count": np.array([m[2] for m in merges], dtype=np.int64),
        }
    )


def doc_ngram_novelty(ds, id_col: str, text_col: str, n: int = 3):
    """Per-document n-gram NOVELTY — the share of a doc's distinct word
    n-grams whose global first occurrence (smallest id among docs that
    contain the n-gram) is this document. The classic burstiness/boilerplate
    curation signal: near-1 for fresh content, near-0 for template text.
    Integer-exact everywhere (novelty_e6 = floor(1e6 * n_first / n_ngrams)),
    so a SQL oracle replays it verbatim. Docs with no n-gram (< n tokens)
    emit no row (inner-join semantics, like the SQL twin).

    Scale shape: distinct (id, ngram) pairs per block (vectorized explode +
    per-batch dedupe), ONE grouped min(id) combiner reduce, and ONE bucketed
    co-shuffle joining pairs back to their first-doc — the exact_dedup
    exchange pattern; raw text never moves."""
    from .relational import bucket_join, grouped_agg

    def explode(b: pa.Table) -> pa.Table:
        ng, ridx = flat_ngrams(b.column(text_col), n)
        t = pa.table(
            {
                id_col: b.column(id_col).take(pa.array(ridx)),
                "__ng": ng,
            }
        )
        # per-batch distinct: a doc's repeated n-gram must count once
        return t.group_by([id_col, "__ng"]).aggregate([])

    pairs = ds.map_batches(explode, batch_format="pyarrow").materialize()
    id_type = pairs.schema().base_schema.field(id_col).type
    firsts = grouped_agg(pairs, ["__ng"], [(id_col, "min", "__first")])
    joined = bucket_join(pairs, firsts, ("__ng",))

    def fold(b: pa.Table) -> pa.Table:
        # bucket_join's shared-schema null padding upcasts an int id to
        # float64 inside the pandas merge — cast back to the source type
        ids = pc.cast(b.column(id_col), id_type)
        t = pa.table(
            {
                id_col: ids,
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "first": pc.cast(
                    pc.equal(ids, pc.cast(b.column("__first"), id_type)), pa.int64()
                ),
            }
        )
        return t.group_by([id_col]).aggregate([("one", "sum"), ("first", "sum")])

    partials = joined.map_batches(fold, batch_format="pyarrow")
    totals = grouped_agg(
        partials.map_batches(
            lambda b: b.rename_columns([id_col, "n_ngrams", "n_first"]),
            batch_format="pyarrow",
        ),
        [id_col],
        [("n_ngrams", "sum", "n_ngrams"), ("n_first", "sum", "n_first")],
    )

    def fin(b: pa.Table) -> pa.Table:
        # pyarrow end-to-end: an empty pandas block would upcast the id
        # column to float64 and poison downstream schema unification
        ng = pc.cast(b.column("n_ngrams"), pa.int64())
        nf = pc.cast(b.column("n_first"), pa.int64())
        nov = pc.divide(pc.multiply(nf, pa.scalar(1_000_000, pa.int64())), ng)
        return pa.table(
            {id_col: b.column(id_col), "n_ngrams": ng, "n_first": nf, "novelty_e6": nov}
        )

    return totals.map_batches(fin, batch_format="pyarrow")


def phrase_match(
    ds: Dataset,
    id_col: str,
    text_col: str,
    phrase: str,
    out_col: str = "n_phrase",
) -> Dataset:
    """Token-boundary phrase search: per document, the number of occurrences
    of ``phrase`` as consecutive lowercased alpha tokens ("Hash-JOIN!"
    matches the phrase "hash join"; the substring "hashjoin" does not).
    Documents with zero occurrences are dropped.

    Scale shape: pure map — each document's text lives in one row, so phrase
    counting shuffles NOTHING at any corpus size; the positional-postings
    alternative (explode (token, pos), self-join on pos+1 — see
    ``inverted_index`` in relational.py) only pays when single documents are
    split across rows. Vectorized: one regex normalize + one
    ``flat_ngrams(n=len(phrase))`` window pass + one bincount per batch.
    """
    want_toks = [t for t in re.split(r"[^a-z]+", phrase.lower()) if t]
    if not want_toks:
        raise ValueError("phrase_match: phrase has no alpha tokens")
    want = " ".join(want_toks)
    n = len(want_toks)

    def fn(b: pa.Table) -> pd.DataFrame:
        ids = b.column(id_col).to_pandas()
        if b.num_rows == 0:
            return pd.DataFrame(
                {id_col: ids, out_col: pd.Series([], dtype="int64")}
            )
        norm = pc.replace_substring_regex(
            pc.utf8_lower(b.column(text_col)), "[^a-z]+", " "
        )
        ng, ridx = flat_ngrams(norm, n)
        cnt = np.zeros(b.num_rows, dtype=np.int64)
        if len(ng):
            # ng is never null: _ws_token_lists fill_nulls the text upstream
            hit = np.asarray(pc.equal(ng, want)).astype(bool)
            if hit.any():
                cnt = np.bincount(ridx[hit], minlength=b.num_rows).astype(np.int64)
        keep = cnt > 0
        return pd.DataFrame({id_col: ids[keep].to_numpy(), out_col: cnt[keep]})

    return ds.map_batches(fn, batch_format="pyarrow")


def backoff_bigram_logprob(
    score_ds: Dataset,
    train_ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    alpha: float = 0.4,
) -> Dataset:
    """Stupid-backoff bigram LM score (Brants et al. 2007, "Large Language
    Models in Machine Translation") in integer micro-nats, so the
    distributed per-doc sum is order-independent and a SQL oracle replays
    it bit-for-bit (the unigram_logprob quantization trick):

        q(w)   = CAST(ROUND(ln(S) * 1e6) AS BIGINT)
        S(w|p) = c2(p w) / c1(p)       if the bigram occurs in train
               = alpha * S(w)          otherwise (backoff)
        S(w)   = c1(w) / T             if w occurs in train
               = alpha / T             otherwise (OOV floor)

    and lm_micro(doc) = q(first token) + sum of q(token | prev) — a doc's
    first token always takes the unigram path. Float compositions are kept
    IDENTICAL on both sides (alpha * (c/T), never (alpha*c)/T): same
    float64 ops in the same order give the same bits before rounding.

    Scale shape: the two count exchanges run over the TRAIN corpus only
    (term_counts / bigram_counts — map-side combined, one row per distinct
    token/bigram per block); the model ships once via ray.put (pandas hash
    Indexes + count arrays, bounded by the train vocabulary — the same
    fits-one-heap broadcast contract as unigram_logprob; hash n-grams into
    buckets for unbounded vocabularies); scoring is map-only, one vocab
    probe + one bigram probe per batch."""
    counts1 = term_counts(train_ds, text_col).to_pandas()
    counts2 = bigram_counts(train_ds, text_col).to_pandas()
    T = float(counts1["n"].sum())
    model = (
        pd.Index(counts1["token"]),
        counts1["n"].to_numpy(np.float64),
        pd.Index(counts2["bigram"]),
        counts2["n"].to_numpy(np.float64),
        T,
    )
    mref = ray.put(model)

    def fn(batch: pa.Table) -> pa.Table:
        uni_idx, uni_n, bi_idx, bi_n, tot = ray.get(mref)
        toks, ridx = flat_ngrams(batch.column(text_col), 1)
        n = batch.num_rows
        sums = np.zeros(n, dtype=np.int64)
        ntok = np.zeros(n, dtype=np.int64)
        if len(toks):
            ntok = np.bincount(ridx, minlength=n).astype(np.int64)
            ta = toks.to_pandas()
            ui = uni_idx.get_indexer(ta)
            seen = ui >= 0
            uni_p = np.where(seen, uni_n[np.where(seen, ui, 0)] / tot, alpha / tot)
            first = np.empty(len(ridx), dtype=bool)
            first[0] = True
            np.not_equal(ridx[1:], ridx[:-1], out=first[1:])
            # default: unigram path for firsts, backoff for the rest
            q = np.round(
                np.log(np.where(first, uni_p, alpha * uni_p)) * 1e6
            ).astype(np.int64)
            later = np.flatnonzero(~first)
            if len(later):
                ta_np = ta.to_numpy()
                prev = ta_np[later - 1]  # same row: later is never position 0
                keys = pd.Series(prev, dtype=object) + " " + pd.Series(
                    ta_np[later], dtype=object
                )
                bi = bi_idx.get_indexer(keys)
                known = bi >= 0
                if known.any():
                    c2 = bi_n[np.where(known, bi, 0)]
                    upi = uni_idx.get_indexer(pd.Index(prev))
                    # a train bigram implies its prefix token is in train
                    c1p = uni_n[np.where(upi >= 0, upi, 0)]
                    q_bi = np.round(np.log(c2 / c1p) * 1e6).astype(np.int64)
                    q[later[known]] = q_bi[known]
            np.add.at(sums, ridx, q)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(ntok),
                "lm_micro": pa.array(sums),
            }
        )

    return score_ds.map_batches(fn, batch_format="pyarrow")


def multi_phrase_match(
    ds: Dataset,
    id_col: str,
    text_col: str,
    phrases: list[str],
    out_col: str = "n_hits",
) -> Dataset:
    """Policy/banned-phrase scanning: per document, occurrence counts for
    EVERY phrase in a list (token-boundary, lowercased alpha tokens — the
    safety-filter stage of a training-data pipeline). Output one
    (id, phrase, n_hits) row per document x matched phrase.

    Scale shape: still a pure map (one row per doc), and vectorized across
    the whole list — phrases group by token count, each length costs ONE
    flat_ngrams window pass + ONE hash probe (pc.index_in) per batch, so a
    1000-phrase blocklist costs a handful of Arrow kernel calls, not 1000
    scans. The phrase table ships inside the task closure (tiny); for
    million-pattern lists build an Aho-Corasick actor pool instead."""
    norm_phrases: dict[int, list[str]] = {}
    canon: list[tuple[str, str]] = []  # (normalized, original)
    for ph in phrases:
        toks = [t for t in re.split(r"[^a-z]+", ph.lower()) if t]
        if not toks:
            raise ValueError(f"multi_phrase_match: phrase {ph!r} has no alpha tokens")
        normed = " ".join(toks)
        if any(normed == c for c, _ in canon):
            raise ValueError(
                f"multi_phrase_match: {ph!r} normalizes to {normed!r}, which "
                "another phrase in the list already covers"
            )
        norm_phrases.setdefault(len(toks), []).append(normed)
        canon.append((normed, ph))
    by_len = {
        n: (pa.array(ps, pa.string()), {p: i for i, p in enumerate(ps)})
        for n, ps in norm_phrases.items()
    }
    back = dict(canon)  # normalized -> original spelling for the output

    def fn(b: pa.Table) -> pd.DataFrame:
        ids = b.column(id_col).to_pandas()
        out_ids, out_ph, out_n = [], [], []
        if b.num_rows:
            norm = pc.replace_substring_regex(
                pc.utf8_lower(b.column(text_col)), "[^a-z]+", " "
            )
            for n, (parr, _idx) in by_len.items():
                ng, ridx = flat_ngrams(norm, n)
                if not len(ng):
                    continue
                hit_idx = pc.index_in(ng, value_set=parr)
                valid = hit_idx.is_valid().to_numpy(zero_copy_only=False)
                if not valid.any():
                    continue
                pi = hit_idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)[valid]
                di = ridx[valid]
                # count per (doc, phrase) with one bincount over a fused key
                key = di * len(parr) + pi
                cnt = np.bincount(key)
                nz = np.flatnonzero(cnt)
                for k in nz:
                    out_ids.append(ids.iloc[int(k) // len(parr)])
                    out_ph.append(back[parr[int(k) % len(parr)].as_py()])
                    out_n.append(int(cnt[k]))
        return pd.DataFrame(
            {
                id_col: pd.Series(out_ids, dtype=ids.dtype),
                "phrase": pd.Series(out_ph, dtype="object"),
                out_col: pd.Series(out_n, dtype="int64"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def bool_search(
    ds: Dataset,
    id_col: str,
    text_col: str,
    must: list[str],
    must_not: list[str] = (),
) -> Dataset:
    """Boolean retrieval over lowercased alpha tokens: keep documents that
    contain EVERY `must` term and NO `must_not` term (the AND/NOT filter a
    corpus curation pass runs before ranking). Pure map — per batch, one
    tokenize + one pc.is_in probe per term set, then per-row containment
    via bincount over matched (row, term) pairs. No shuffle at any scale."""
    def _norm_term(term: str, which: str) -> str:
        # run each query term through the SAME tokenizer the documents get,
        # so a term like "hash-join" fails loudly instead of silently never
        # matching any [^a-z]+-split token
        toks = [t for t in re.split(r"[^a-z]+", term.lower()) if t]
        if len(toks) != 1:
            raise ValueError(
                f"bool_search: {which} term {term!r} normalizes to "
                f"{len(toks)} alpha tokens ({toks!r}); terms must be single "
                "alpha words — use phrase_match for multi-token queries"
            )
        return toks[0]

    must_n = [_norm_term(t, "must") for t in must]
    if not must_n:
        raise ValueError("bool_search: empty must list")
    must_arr = pa.array(sorted(set(must_n)), pa.string())
    not_arr = pa.array(
        sorted({_norm_term(t, "must_not") for t in must_not}), pa.string()
    )

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.select([id_col])
        norm = pc.replace_substring_regex(
            pc.utf8_lower(b.column(text_col)), "[^a-z]+", " "
        )
        toks, ridx = flat_ngrams(norm, 1)
        n = b.num_rows
        ok = np.zeros(n, dtype=bool)
        if len(toks):
            mi = pc.index_in(toks, value_set=must_arr)
            valid = mi.is_valid().to_numpy(zero_copy_only=False)
            # distinct (row, term) pairs -> a row qualifies when it holds
            # ALL len(must_arr) distinct terms
            if valid.any():
                key = ridx[valid] * len(must_arr) + mi.fill_null(0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)[valid]
                pairs = np.unique(key)
                per_row = np.bincount(pairs // len(must_arr), minlength=n)
                ok = per_row == len(must_arr)
            if len(not_arr):
                banned = pc.is_in(toks, value_set=not_arr).to_numpy(
                    zero_copy_only=False
                )
                if banned.any():
                    ok[np.unique(ridx[banned])] = False
        return b.select([id_col]).filter(pa.array(ok))

    return ds.map_batches(fn, batch_format="pyarrow")
