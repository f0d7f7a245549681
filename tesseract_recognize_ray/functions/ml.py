"""Distributed classical-ML training primitives, Ray-Data-first.

The shapes here are the textbook data-parallel ones (public literature —
Bottou 2010 on batch gradient descent; the same Gram/gradient-partial
layout as functions/similarity.py's PCA): each block contributes one
fixed-size partial (a gradient, a Gram matrix), the fold and the parameter
step run on the driver, and the new parameters broadcast for the next
pass. Iterations = passes; callers materialize the feature projection
once (Ray has no lineage cache)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_train(
    ds: Dataset,
    feature_cols: list[str],
    label_col: str,
    *,
    iters: int = 50,
    lr: float = 0.5,
    l2: float = 1e-3,
    standardize: bool = True,
    round_digits: int | None = None,
) -> dict:
    """Full-batch logistic regression via distributed gradient partials:
    every iteration is ONE pass where each block ships (d+1 floats of
    X^T(p - y) plus its loss term) — parameter vector broadcast per pass,
    nothing else moves. With `standardize`, a first moments pass (same
    per-block layout) computes mean/std so the fixed learning rate is
    well-conditioned; the returned coefficients are in STANDARDIZED space
    alongside the (mean, std) needed to apply them to raw features.
    Deterministic given the data partitioning-independent partial sums
    (float64 adds commute across blocks up to ulps; coefficients are
    reported rounded by callers). Returns {"coef", "intercept", "mean",
    "std", "loss_curve", "n"}."""
    d = len(feature_cols)

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # empty blocks drop schema in Ray 2.49 — emit nothing
            return pd.DataFrame({"n": pd.Series([], dtype="int64"), "s": [], "sq": []})
        x = b[feature_cols].to_numpy(np.float64)
        return pd.DataFrame(
            {"n": [np.int64(len(x))], "s": [x.sum(0)], "sq": [(x * x).sum(0)]}
        )

    mean = np.zeros(d)
    std = np.ones(d)
    n_total = 0
    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    n_total = int(parts["n"].sum())
    if n_total == 0:
        raise ValueError("logreg_train: empty dataset")
    if standardize:
        s = np.stack(parts["s"].to_numpy()).sum(0)
        sq = np.stack(parts["sq"].to_numpy()).sum(0)
        mean = s / n_total
        if round_digits is not None:
            # SQL-replay contract (the kmeans_lloyd idiom): round the model
            # state so the ~1e-13 distributed-sum wobble can't leak into the
            # standardized features or compound across GD iterations
            mean = np.round(mean, round_digits)
        var = np.maximum(sq / n_total - mean**2, 1e-12)
        std = np.sqrt(var)
        if round_digits is not None:
            std = np.round(std, round_digits)

    w = np.zeros(d + 1)  # [coef..., intercept]
    losses = []
    for _ in range(iters):
        wref = ray.put((w, mean, std))

        def grad(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):  # empty-block schema-loss guard (Ray 2.49)
                return pd.DataFrame({"g": [], "loss": pd.Series([], dtype="float64")})
            wv, mu, sd = ray.get(wref)
            x = (b[feature_cols].to_numpy(np.float64) - mu) / sd
            y = b[label_col].to_numpy(np.float64)
            z = x @ wv[:d] + wv[d]
            p = _sigmoid(z)
            g = x.T @ (p - y)
            gb = (p - y).sum()
            # numerically-stable log-loss: log(1+e^z) - y*z
            ll = float(np.sum(np.logaddexp(0.0, z) - y * z))
            return pd.DataFrame({"g": [np.append(g, gb)], "loss": [ll]})

        parts = ds.map_batches(grad, batch_format="pandas").to_pandas()
        g = np.stack(parts["g"].to_numpy()).sum(0) / n_total
        g[:d] += l2 * w[:d]
        loss = float(parts["loss"].sum()) / n_total + 0.5 * l2 * float(w[:d] @ w[:d])
        losses.append(loss)
        w = w - lr * g
        if round_digits is not None:
            w = np.round(w, round_digits)

    return {
        "coef": w[:d],
        "intercept": float(w[d]),
        "mean": mean,
        "std": std,
        "loss_curve": losses,
        "n": n_total,
    }


def logreg_predict(
    ds: Dataset, feature_cols: list[str], model: dict, out_col: str = "p"
) -> Dataset:
    """Broadcast the trained model once; one vectorized sigmoid per batch."""
    d = len(feature_cols)
    mref = ray.put((np.asarray(model["coef"]), float(model["intercept"]),
                    np.asarray(model["mean"]), np.asarray(model["std"])))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        coef, b0, mu, sd = ray.get(mref)
        x = (b[feature_cols].to_numpy(np.float64) - mu) / sd
        b = b.copy()
        b[out_col] = _sigmoid(x @ coef + b0)
        return b

    return ds.map_batches(score, batch_format="pandas")


# ------------------------------------------------------------------- DSIR
# Data Selection via Importance Resampling (Xie et al. 2023, public paper):
# score every raw document by how much more likely its hashed n-gram bag is
# under a target-domain distribution than under the raw distribution, then
# Gumbel-top-k sample proportionally to that importance weight.


def _hashed_ngram_partials(ds: "Dataset", text_col: str, n_buckets: int, ngram_ns=(1, 2)):
    """One n_buckets-float histogram partial per block (the logreg-partials
    idiom): hashed word uni+bigram counts, vectorized end-to-end (Arrow
    tokenize -> flat_ngrams -> pandas string hash -> bincount)."""
    from ..hashing import stable_bucket
    from .textstats import flat_ngrams

    def partial(b: pa.Table) -> pd.DataFrame:
        if b.num_rows == 0:  # empty-block schema-loss guard (Ray 2.49)
            return pd.DataFrame({"c": []})
        vec = np.zeros(n_buckets, dtype=np.float64)
        col = b.column(text_col)
        for n in ngram_ns:
            ng, _ridx = flat_ngrams(col, n)
            if len(ng):
                bk = stable_bucket(ng, n_buckets)
                vec += np.bincount(bk, minlength=n_buckets)
        return pd.DataFrame({"c": [vec]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return np.zeros(n_buckets, dtype=np.float64)
    return np.stack(parts["c"].to_numpy()).sum(0)


def dsir_weights(
    raw: "Dataset",
    target: "Dataset",
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    ngram_ns=(1, 2),
) -> "Dataset":
    """Per-document DSIR importance log-weight: sum over the doc's hashed
    n-grams of log p_target(bucket) - log p_raw(bucket) (Laplace-smoothed).
    Scale shape: two histogram passes ship n_buckets floats per block; the
    2 x n_buckets log-ratio vector broadcasts once; scoring is map-only.
    Deterministic: histograms are integer counts (exact in float64), each
    row's features are row-local, so weights are partitioning-independent."""
    from ..hashing import stable_bucket
    from .textstats import flat_ngrams

    c_raw = _hashed_ngram_partials(raw, text_col, n_buckets, ngram_ns)
    c_tgt = _hashed_ngram_partials(target, text_col, n_buckets, ngram_ns)
    p_raw = (c_raw + smoothing) / (c_raw.sum() + smoothing * n_buckets)
    p_tgt = (c_tgt + smoothing) / (c_tgt.sum() + smoothing * n_buckets)
    rref = ray.put(np.log(p_tgt) - np.log(p_raw))

    def score(b: pa.Table) -> pd.DataFrame:
        if b.num_rows == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="object"), "log_weight": pd.Series([], dtype="float64")}
            )
        lr = ray.get(rref)
        col = b.column(text_col)
        w = np.zeros(b.num_rows, dtype=np.float64)
        for n in ngram_ns:
            ng, ridx = flat_ngrams(col, n)
            if len(ng):
                bk = stable_bucket(ng, n_buckets)
                np.add.at(w, ridx, lr[bk])
        return pd.DataFrame({id_col: b.column(id_col).to_pandas(), "log_weight": w})

    return raw.map_batches(score, batch_format="pyarrow")


def dsir_select(
    raw: "Dataset",
    target: "Dataset",
    id_col: str,
    text_col: str,
    k: int,
    *,
    seed: int = 0,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> "Dataset":
    """Select k raw documents ~ importance weight WITHOUT replacement via
    the Gumbel-top-k trick: key_i = log_weight_i + Gumbel(u_i) where u_i is
    a process-stable per-(id, seed) uniform (blake2-free: pandas string
    hash of 'id|seed' -> (h + 0.5) / 2^64). Deterministic, single top-k
    exchange of k rows per block."""
    from .relational import topk

    weights = dsir_weights(
        raw, target, id_col, text_col, n_buckets=n_buckets, smoothing=smoothing
    )

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b.assign(sample_key=pd.Series([], dtype="float64"))
        tagged = b[id_col].astype(str) + f"|{seed}"
        h = pd.util.hash_pandas_object(tagged, index=False).to_numpy()
        u = (h.astype(np.float64) + 0.5) / np.float64(2**64)
        b = b.copy()
        b["sample_key"] = b["log_weight"].to_numpy() - np.log(-np.log(u))
        return b

    keyed = weights.map_batches(add_key, batch_format="pandas")
    return topk(keyed, "sample_key", k, descending=True, tiebreak=[id_col])


# Whitespace the ENGINE tokenizers split on but DuckDB's RE2 '\s' (ASCII
# [\t\n\f\r ]) does not: VT, FS..US, NEL, NBSP and the Unicode Zs/line
# separators. Exact-contract operators normalize these to ' ' on BOTH
# sides first, making Arrow utf8_split_whitespace / Python str.split()
# provably equal to SQL string_split_regex('\s+') on any input — not just
# the ASCII testdata.
_WS_EXOTIC = (
    [0x0B, 0x1C, 0x1D, 0x1E, 0x1F, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
WS_NORM_RE2 = "[" + "".join(f"\\x{{{c:X}}}" for c in _WS_EXOTIC) + "]"  # Arrow/DuckDB
WS_NORM_PY = "[" + "".join(chr(c) for c in _WS_EXOTIC) + "]"  # Python re / pandas


def _md5_bucket(strs: np.ndarray, n_buckets: int) -> np.ndarray:
    """md5-derived bucket per string — the one hash ANSI SQL also exposes:
    ``('0x'||substr(md5(s),1,16))::UBIGINT % n_buckets`` in DuckDB. Hashes
    UNIQUE strings only (vocab << token count), then scatters back."""
    import hashlib

    uniq, inv = np.unique(strs, return_inverse=True)
    hu = np.fromiter(
        (int(hashlib.md5(u.encode()).hexdigest()[:16], 16) % n_buckets for u in uniq),
        dtype=np.int64,
        count=len(uniq),
    )
    return hu[inv]


def _md5_ngram_hist(ds: "Dataset", text_col: str, n_buckets: int, ngram_ns=(1, 2)) -> np.ndarray:
    """Like _hashed_ngram_partials but with md5 buckets (SQL-replayable);
    integer counts returned as int64."""
    from .textstats import flat_ngrams

    def partial(b: pa.Table) -> pd.DataFrame:
        if b.num_rows == 0:
            return pd.DataFrame({"c": []})
        vec = np.zeros(n_buckets, dtype=np.int64)
        col = pc.replace_substring_regex(b.column(text_col), WS_NORM_RE2, " ")
        for n in ngram_ns:
            ng, _ridx = flat_ngrams(col, n)
            if len(ng):
                bk = _md5_bucket(np.asarray(ng), n_buckets)
                vec += np.bincount(bk, minlength=n_buckets)
        return pd.DataFrame({"c": [vec]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return np.zeros(n_buckets, dtype=np.int64)
    return np.stack(parts["c"].to_numpy()).sum(0)


def dsir_topk(
    raw: "Dataset",
    target: "Dataset",
    id_col: str,
    text_col: str,
    *,
    k: int = 100,
    n_buckets: int = 4096,
) -> "Dataset":
    """DSIR hard top-k selection with an ANSI-SQL-replayable contract — the
    deterministic twin of dsir_select (which keeps Gumbel sampling as the
    statistically-correct scale path):

      * exotic whitespace (WS_NORM_RE2) normalizes to ' ' first, making
        the Arrow tokenizer provably equal to SQL '\\s+' on ANY input;
      * features = whitespace uni+bigrams, bucketed by md5 % n_buckets;
      * per-bucket weight = ROUND(1e6 * (ln(tc+1) - ln(T+B) - ln(rc+1)
        + ln(R+B))) as int64 (Laplace smoothing 1, e6-quantized so the
        cross-engine float risk collapses to a ~1e-9 rounding-boundary
        sliver per bucket);
      * doc score_e6 = exact integer sum of its features' weights
        (multiplicity counted);
      * selection = top-k by (score_e6 DESC, id ASC).

    Scale shape: two n_buckets-int histogram passes, one broadcast weight
    vector, map-only scoring, a k-row top-k exchange. Returns a k-row
    Dataset of (id, score_e6)."""
    from .relational import topk
    from .textstats import flat_ngrams

    c_raw = _md5_ngram_hist(raw, text_col, n_buckets)
    c_tgt = _md5_ngram_hist(target, text_col, n_buckets)
    big_t = float(c_tgt.sum()) + n_buckets
    big_r = float(c_raw.sum()) + n_buckets
    w = np.round(
        (
            np.log(c_tgt + 1.0)
            - np.log(big_t)
            - np.log(c_raw + 1.0)
            + np.log(big_r)
        )
        * 1e6
    ).astype(np.int64)
    wref = ray.put(w)

    def score(b: pa.Table) -> pd.DataFrame:
        if b.num_rows == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"), "score_e6": pd.Series([], dtype="int64")}
            )
        wv = ray.get(wref)
        s = np.zeros(b.num_rows, dtype=np.int64)
        col = pc.replace_substring_regex(b.column(text_col), WS_NORM_RE2, " ")
        for n in (1, 2):
            ng, ridx = flat_ngrams(col, n)
            if len(ng):
                bk = _md5_bucket(np.asarray(ng), n_buckets)
                np.add.at(s, ridx, wv[bk])
        return pd.DataFrame({id_col: b.column(id_col).to_pandas(), "score_e6": s})

    scored = raw.map_batches(score, batch_format="pyarrow")
    out = topk(scored, "score_e6", k, descending=True, tiebreak=[id_col])
    return out


def nb_train(
    ds: "Dataset",
    label_col: str,
    text_col: str,
    *,
    alpha: float = 1.0,
) -> dict:
    """Distributed multinomial Naive Bayes trainer (add-alpha smoothing)
    over lowercased alpha tokens ([^a-z]+ is a separator — the exact
    tokenization the SQL oracle replays with string_split_regex).

    Scale shape: the ONLY exchange is the (label, token) count reduce — each
    block pre-aggregates its own explode with a pyarrow group_by before the
    bucketed shuffle (grouped_agg combine path), so the wire carries at most
    |labels| x |block vocab| rows per block, never per-token rows. The model
    (V x L log-prob matrix) is driver-held and must fit one worker's heap —
    the same broadcast contract as every small-side lookup here; for
    unbounded vocabularies hash tokens into 2^20 buckets first (the
    dsir_weights layout in this module) and train on bucket ids.

    Returns a plain dict: sorted labels, a pandas vocab Index, logp (V, L),
    unseen (L,), log_prior (L,) — pass to nb_predict."""
    from .relational import grouped_agg
    from .textstats import flat_ngrams

    def explode(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        norm = pc.replace_substring_regex(
            pc.utf8_lower(b.column(text_col)), "[^a-z]+", " "
        )
        toks, ridx = flat_ngrams(norm, 1)
        labels = b.column(label_col).take(pa.array(ridx))
        return pa.table(
            {
                "label": labels,
                "tok": toks,
                "n": pa.array(np.ones(len(toks), dtype=np.int64)),
            }
        )

    pairs = ds.map_batches(explode, batch_format="pyarrow")
    # combiner output is |labels| x |vocab| per block — reducer-sized
    counts = grouped_agg(
        pairs, ["label", "tok"], [("n", "sum", "n")], reduce_blocks=8
    ).to_pandas()
    prior = grouped_agg(
        ds, [label_col], [(label_col, "count", "n_docs")]
    ).to_pandas()

    labels = sorted(prior[label_col].astype(str))
    lab_idx = {l: i for i, l in enumerate(labels)}
    n_docs = np.zeros(len(labels), dtype=np.float64)
    for l, c in zip(prior[label_col].astype(str), prior["n_docs"]):
        n_docs[lab_idx[l]] = float(c)
    vocab = pd.Index(np.sort(counts["tok"].unique()))
    cnt = np.zeros((len(vocab), len(labels)), dtype=np.float64)
    if len(vocab):
        vi = vocab.get_indexer(counts["tok"])
        li = counts["label"].astype(str).map(lab_idx).to_numpy()
        cnt[vi, li] = counts["n"].to_numpy(dtype=np.float64)
    tot = cnt.sum(axis=0)
    denom = tot + alpha * len(vocab)
    return {
        "labels": labels,
        "vocab": vocab,
        "logp": np.log((cnt + alpha) / denom),
        "unseen": np.log(np.full(len(labels), alpha) / denom),
        "log_prior": np.log(n_docs / n_docs.sum()),
    }


def nb_predict(
    ds: "Dataset",
    id_col: str,
    text_col: str,
    model: dict,
    *,
    out_col: str = "pred_label",
    keep_cols: tuple = (),
) -> "Dataset":
    """Score every document against an nb_train model and emit the argmax
    label (ties — structurally only possible for token-free docs under
    equal priors — break to the lexicographically first label, matching a
    SQL ``ORDER BY score DESC, label ASC`` window). Map-only: the model
    ships once via ray.put (zero-copy numpy views per worker), scoring is
    one vocab hash-probe + one bincount per label per batch — no shuffle."""
    from .textstats import flat_ngrams

    mref = ray.put(model)

    def score(b: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        m = ray.get(mref)
        nrows = b.num_rows
        out = {id_col: b.column(id_col).to_pandas()}
        for c in keep_cols:
            out[c] = b.column(c).to_pandas()
        if nrows == 0:
            out[out_col] = pd.Series([], dtype="object")
            return pd.DataFrame(out)
        scores = np.tile(m["log_prior"], (nrows, 1))
        norm = pc.replace_substring_regex(
            pc.utf8_lower(b.column(text_col)), "[^a-z]+", " "
        )
        toks, ridx = flat_ngrams(norm, 1)
        if len(toks) and len(m["vocab"]):
            ta = toks.to_pandas()
            vi = m["vocab"].get_indexer(ta)
            hit = vi >= 0
            vi_safe = np.where(hit, vi, 0)
            for li in range(len(m["labels"])):
                w = np.where(hit, m["logp"][vi_safe, li], m["unseen"][li])
                scores[:, li] += np.bincount(ridx, weights=w, minlength=nrows)
        # labels are sorted, argmax takes the FIRST max -> lexicographic ties
        pred = np.asarray(m["labels"], dtype=object)[np.argmax(scores, axis=1)]
        out[out_col] = pred
        return pd.DataFrame(out)

    return ds.map_batches(score, batch_format="pyarrow")


def loo_target_encoding(
    ds: "Dataset",
    cat_col: str,
    target_cents_col: str,
    *,
    scale: float = 100.0,
    out_col: str = "loo_enc",
    keep_cols: tuple = (),
) -> "Dataset":
    """Leave-one-out target encoding (the CatBoost-family categorical
    feature): each row's category is replaced by the mean target of all
    OTHER rows in that category, enc_i = (sum_cat - x_i) / (n_cat - 1) —
    leave-one-out removes the self-leakage a plain mean encoding has.
    Singleton categories are dropped (no peers to average).

    Bit-stable by construction: the target must be pre-quantized to int64
    (e.g. cents for 2-decimal monetary doubles; ``scale`` converts back —
    100.0 for cents), so the category sums are EXACT in any execution order
    and both numerator and denominator reach the one float division as
    identical integers on the Ray and SQL sides.

    Scale shape: one grouped_agg (sum, count) per category — map-side
    combined, |categories| rows total — broadcast once via ray.put; the
    encode pass is map-only."""
    from .relational import grouped_agg

    agg = grouped_agg(
        ds,
        [cat_col],
        [(target_cents_col, "sum", "__s"), (target_cents_col, "count", "__n")],
    ).to_pandas()
    sums = dict(zip(agg[cat_col], agg["__s"].astype(np.int64)))
    ns = dict(zip(agg[cat_col], agg["__n"].astype(np.int64)))
    mref = ray.put((sums, ns))

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        sums, ns = ray.get(mref)
        cats = b[cat_col]
        n = cats.map(ns).to_numpy(dtype=np.float64)
        s = cats.map(sums).to_numpy(dtype=np.int64)
        cents = b[target_cents_col].to_numpy(dtype=np.int64)
        keep = n > 1
        out = {cat_col: cats[keep].to_numpy()}
        for c in keep_cols:
            out[c] = b[c][keep].to_numpy()
        out[out_col] = (s[keep] - cents[keep]).astype(np.float64) / (
            scale * (n[keep] - 1.0)
        )
        return pd.DataFrame(out)

    return ds.map_batches(encode, batch_format="pandas")
