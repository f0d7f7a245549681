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
        var = np.maximum(sq / n_total - mean**2, 1e-12)
        std = np.sqrt(var)

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
