"""Sketch operators: HLL approximate distinct (error-bounded vs exact) and
the frequent-items (Misra-Gries-style) top-k."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from tesseract_recognize_ray.functions import sketches as F_sk


def test_hll_error_bound(ray_session):
    rng = np.random.default_rng(11)
    # ~50k distinct int64 ids with duplicates, across many blocks
    vals = rng.integers(0, 50_000, size=200_000)
    exact = len(np.unique(vals))
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    est = F_sk.hll_approx_distinct(ds, "v", p=14)
    assert abs(est - exact) / exact < 0.03  # p=14 → ~0.8% stderr; 3% is >3 sigma


def test_hll_small_range_linear_counting(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"v": list(range(100)) * 5}))
    est = F_sk.hll_approx_distinct(ds, "v", p=14)
    assert abs(est - 100) <= 2


def test_hll_deterministic(ray_session):
    df = pd.DataFrame({"v": np.arange(10_000) % 3333})
    a = F_sk.hll_approx_distinct(rd.from_pandas(df), "v")
    b = F_sk.hll_approx_distinct(rd.from_pandas(df).repartition(7), "v")
    assert a == b  # fixed-key hash + max-merge: partitioning-invariant


def test_histogram_quantile_sketch_error_bound(ray_session):
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(50, 10, 20000), rng.exponential(5, 5000)])
    df = pd.DataFrame({"v": vals})
    nbins = 1024
    est = F_sk.histogram_quantile_sketch(rd.from_pandas(df), "v", [0.1, 0.5, 0.9, 0.99], nbins=nbins)
    width = (vals.max() - vals.min()) / nbins
    for q, e in est.items():
        exact = np.quantile(vals, q)
        assert abs(e - exact) <= width + 1e-9, (q, e, exact, width)


def test_histogram_quantile_sketch_constant_column(ray_session):
    df = pd.DataFrame({"v": np.full(100, 7.5)})
    est = F_sk.histogram_quantile_sketch(rd.from_pandas(df), "v", [0.5])
    assert est[0.5] == 7.5


def test_frequent_terms_exact_when_vocab_fits(ray_session):
    docs = pd.DataFrame({"text": ["a a a b b c"] * 10 + ["d e"] * 3})
    out = F_sk.frequent_terms(rd.from_pandas(docs), "text", k=3, m=100).to_pandas()
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["n_min"].tolist() == [30, 20, 10]


def test_frequent_terms_undercount_bound(ray_session):
    # heavy hitter 'hh' (freq 400) among 50 noise tokens, m=8 forces decrements
    rng = np.random.default_rng(5)
    rows = []
    for _ in range(100):
        toks = ["hh"] * 4 + [f"n{rng.integers(50)}" for _ in range(8)]
        rows.append(" ".join(toks))
    ds = rd.from_pandas(pd.DataFrame({"text": rows})).repartition(4)
    out = F_sk.frequent_terms(ds, "text", k=5, m=8).to_pandas().set_index("token")
    assert "hh" in out.index  # any item with freq > N/(m+1) must survive
    n_total = 100 * 12
    assert 400 - n_total / 9 <= out.loc["hh", "n_min"] <= 400


def test_exact_quantile_2pass_matches_numpy_order_statistic(ray_session):
    """The 2-pass selection returns the EXACT k-th smallest (k=ceil(q*N)),
    including duplicate-heavy distributions where bins collapse."""
    import numpy as np
    import pandas as pd
    import ray

    from tesseract_recognize_ray.functions.sketches import exact_quantile_2pass

    rng = np.random.default_rng(6)
    # heavy duplicates + outliers: many values collapse into few bins
    v = np.concatenate(
        [
            np.round(rng.normal(100, 5, 20_000), 1),
            np.full(5_000, 42.0),
            rng.uniform(0, 10_000, 50),
        ]
    )
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(7)
    got = exact_quantile_2pass(ds, "value", [0.01, 0.5, 0.9, 0.999])
    sv = np.sort(v)
    for q, val in got.items():
        k = max(1, int(np.ceil(q * len(v))))
        assert val == sv[k - 1], (q, val, sv[k - 1])


def test_exact_quantile_2pass_constant_column(ray_session):
    import pandas as pd
    import ray

    from tesseract_recognize_ray.functions.sketches import exact_quantile_2pass

    ds = ray.data.from_pandas(pd.DataFrame({"value": [7.0] * 100}))
    assert exact_quantile_2pass(ds, "value", [0.5]) == {0.5: 7.0}


def test_grouped_exact_quantile_matches_per_key_order_statistics(ray_session):
    """Exact per-key k-th order statistics under heavy key skew (one key
    holds half the rows) and duplicate-laden values."""
    import numpy as np
    import pandas as pd
    import ray

    from tesseract_recognize_ray.functions.sketches import grouped_exact_quantile

    rng = np.random.default_rng(14)
    keys = np.concatenate([np.zeros(10_000, dtype=np.int64), rng.integers(1, 40, 10_000)])
    vals = np.round(rng.normal(50, 20, 20_000), 1)
    df = pd.DataFrame({"k": keys, "v": vals})
    qs = [0.25, 0.5, 0.99]
    got = (
        grouped_exact_quantile(
            ray.data.from_pandas(df).repartition(6), "k", "v", qs, nbins=128
        )
        .to_pandas()
        .set_index(["k", "q"])["value"]
        .sort_index()
    )
    for k_, g in df.groupby("k"):
        sv = np.sort(g["v"].to_numpy())
        for q in qs:
            kk = max(1, int(np.ceil(q * len(sv))))
            assert got.loc[(k_, q)] == sv[kk - 1], (k_, q)
    assert len(got) == df["k"].nunique() * len(qs)
