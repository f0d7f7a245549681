"""Round-3 additions: distributed PCA family (Gram-partial moments,
driver eigensolve, broadcast projection)."""

import numpy as np
import pandas as pd
import pytest
import ray

from tesseract_recognize_ray.functions import similarity as F_sim


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    rng = np.random.default_rng(11)
    # anisotropic cloud so the components are well-separated
    base = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    mix = rng.normal(size=(6, 6))
    mat = base @ mix + rng.normal(size=6) * 2.0
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64), "embedding": list(mat.astype(np.float32))})
    return ray.data.from_pandas(df).repartition(7), mat.astype(np.float32).astype(np.float64)


def test_moments_and_covariance_exact(vec_ds):
    ds, mat = vec_ds
    n, s, sq = F_sim.embedding_moments(ds, "embedding")
    assert n == 400
    np.testing.assert_allclose(s, mat.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(sq, mat.T @ mat, rtol=1e-12)
    cov = F_sim.embedding_covariance(ds, "embedding")
    want = np.cov(mat, rowvar=False, bias=True)
    np.testing.assert_allclose(cov, want, rtol=1e-9, atol=1e-12)
    # dims restriction = leading principal submatrix
    cov3 = F_sim.embedding_covariance(ds, "embedding", dims=3)
    np.testing.assert_allclose(cov3, want[:3, :3], rtol=1e-9, atol=1e-12)


def test_pca_matches_exact_numpy(vec_ds):
    ds, mat = vec_ds
    w, comp, mean = F_sim.pca_components(ds, "embedding", k=4)
    cov = np.cov(mat, rowvar=False, bias=True)
    we, ve = np.linalg.eigh(cov)
    we = we[::-1][:4]
    np.testing.assert_allclose(w, we, rtol=1e-8)
    # each component spans the same axis as the exact eigenvector
    ve = ve[:, ::-1][:, :4]
    for i in range(4):
        cosang = abs(float(comp[i] @ ve[:, i]))
        assert cosang > 1 - 1e-8
    # deterministic sign convention: max-|coord| entry positive
    for row in comp:
        assert row[np.abs(row).argmax()] > 0


def test_pca_project_variances_are_eigenvalues(vec_ds):
    ds, mat = vec_ds
    w, comp, mean = F_sim.pca_components(ds, "embedding", k=3)
    out = F_sim.pca_project(ds, "vec_id", "embedding", comp, mean).to_pandas()
    assert sorted(out.columns) == ["pc0", "pc1", "pc2", "vec_id"]
    assert len(out) == 400
    for i in range(3):
        v = out[f"pc{i}"].to_numpy()
        np.testing.assert_allclose(v.var(), w[i], rtol=1e-8)
        assert abs(v.mean()) < 1e-9  # centered
    # projections are uncorrelated across components
    c = np.corrcoef(out[["pc0", "pc1", "pc2"]].to_numpy(), rowvar=False)
    assert np.abs(c - np.eye(3)).max() < 1e-6


def test_moments_empty_raises(ray_session):
    df = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"), "embedding": []})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="empty"):
        F_sim.embedding_moments(ds, "embedding")


# ------------------------------------------------- window_cum_distinct
def test_window_cum_distinct_matches_pandas(ray_session):
    from tesseract_recognize_ray.functions import relational as F

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "o": rng.permutation(n),
            "v": rng.integers(0, 6, n).astype(str),
        }
    )
    ds = ray.data.from_pandas(df.copy()).repartition(9)
    out = (
        F.window_cum_distinct(ds, "k", ["o"], "v", out_col="cd")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["k", "o"]).reset_index(drop=True)
    exp = (
        want.groupby("k", sort=False)["v"]
        .apply(lambda s: (~s.duplicated()).cumsum())
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["cd"].to_numpy(), exp.to_numpy())


# ------------------------------------------- prefix_filter_jaccard_pairs
def _wshingles(t, w=3):
    toks = t.split()
    return {" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)}


def test_prefix_filter_lossless_vs_brute_force(ray_session):
    """Prefix blocking must find EXACTLY the brute-force all-pairs result
    at the threshold (losslessness is the operator's core guarantee)."""
    from tesseract_recognize_ray.functions import dedup as F_dedup

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
    docs = list(base)
    for i in range(10):  # planted near-dups: perturb one word
        toks = base[i].split()
        toks[5] = "zz"
        docs.append(" ".join(toks))
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    t = 0.6
    ds = ray.data.from_pandas(df.copy()).repartition(5)
    got = (
        F_dedup.prefix_filter_jaccard_pairs(ds, "doc_id", "text", threshold=t, shingle_w=3)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # brute force over all pairs
    sets = {int(r.doc_id): _wshingles(r.text) for r in df.itertuples()}
    exp = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = len(sets[a] | sets[b])
            j = round(len(sets[a] & sets[b]) / u, 6) if u else 1.0
            if j >= t:
                exp.append((a, b, j))
    exp_df = pd.DataFrame(exp, columns=["id_a", "id_b", "jac"])
    assert len(got) == len(exp_df) and len(got) >= 10
    pd.testing.assert_frame_equal(
        got.astype({"id_a": "int64", "id_b": "int64"}), exp_df, check_dtype=False
    )


def test_prefix_filter_short_docs_excluded(ray_session):
    from tesseract_recognize_ray.functions import dedup as F_dedup

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["a b", "a b", "x y z q", "x y z q"]})
    out = F_dedup.prefix_filter_jaccard_pairs(
        ray.data.from_pandas(df), "doc_id", "text", threshold=0.5, shingle_w=3
    ).to_pandas()
    # docs 1/2 have no 3-shingles -> excluded; 3/4 identical -> jac 1.0
    assert out[["id_a", "id_b"]].values.tolist() == [[3, 4]]
    assert out["jac"].iloc[0] == 1.0


# --------------------------------------------- co-partitioned bucket join
def test_copartitioned_join_matches_pandas(ray_session, tmp_path):
    from tesseract_recognize_ray.functions import relational as F

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 200, 500), "a": rng.integers(0, 9, 500)})
    right = pd.DataFrame({"k": rng.integers(50, 260, 800), "b": rng.integers(0, 9, 800)})
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    F.write_bucketed(ray.data.from_pandas(left.copy()).repartition(4), dl, ["k"], num_buckets=8)
    F.write_bucketed(ray.data.from_pandas(right.copy()).repartition(4), dr, ["k"], num_buckets=8)
    got = (
        F.copartitioned_join(dl, dr, ["k"], num_buckets=8,
                             columns_left=["k", "a"], columns_right=["k", "b"])
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_copartitioned_join_fold_combines_in_task(ray_session, tmp_path):
    from tesseract_recognize_ray.functions import relational as F

    left = pd.DataFrame({"k": [1, 2, 3, 4], "g": ["x", "x", "y", "y"]})
    right = pd.DataFrame({"k": [1, 2, 3, 9], "v": [10, 20, 30, 99]})
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    F.write_bucketed(ray.data.from_pandas(left), dl, ["k"], num_buckets=4)
    F.write_bucketed(ray.data.from_pandas(right), dr, ["k"], num_buckets=4)

    def fold(df):
        return df.groupby("g", sort=False)["v"].sum().reset_index()

    parts = F.copartitioned_join(
        dl, dr, ["k"], num_buckets=4, fold=fold
    ).to_pandas()
    total = parts.groupby("g")["v"].sum().sort_index()
    assert total.to_dict() == {"x": 30, "y": 30}


# ------------------------------------------------------- skew_split_join
def test_skew_split_join_matches_pandas_inner_and_left(ray_session):
    from tesseract_recognize_ray.functions import relational as F

    rng = np.random.default_rng(13)
    # zipf-skewed probe keys: key 0 is ~40% of rows
    keys = rng.zipf(1.3, 4000) % 50
    big = pd.DataFrame({"k": keys.astype(np.int64), "a": rng.integers(0, 100, 4000)})
    small = pd.DataFrame({"kk": np.arange(0, 40, dtype=np.int64), "pay": np.arange(40) * 10})
    bds = ray.data.from_pandas(big.copy()).repartition(8)
    sds = ray.data.from_pandas(small.copy()).repartition(3)
    got = (
        F.skew_split_join(bds, sds, "k", "kk", hot_keys=4, num_buckets=8)
        .to_pandas()
        .sort_values(["k", "a", "pay"])
        .reset_index(drop=True)
    )
    want = (
        big.merge(small.rename(columns={"kk": "k"}), on="k")
        .sort_values(["k", "a", "pay"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # left join keeps unmatched probe rows (keys 40-49)
    got_l = F.skew_split_join(bds, sds, "k", "kk", how="left", hot_keys=4, num_buckets=8).to_pandas()
    assert len(got_l) == len(big.merge(small.rename(columns={"kk": "k"}), on="k", how="left"))
    assert got_l["pay"].isna().sum() == int((big["k"] >= 40).sum())


def test_skew_split_join_null_keys_never_match(ray_session):
    from tesseract_recognize_ray.functions import relational as F

    big = pd.DataFrame({"k": pd.array([1, 1, None, 2], dtype="Int64"), "a": [1, 2, 3, 4]})
    small = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"), "p": [7, 9]})
    out = F.skew_split_join(
        ray.data.from_pandas(big), ray.data.from_pandas(small), "k", hot_keys=2, num_buckets=4
    ).to_pandas()
    assert sorted(out["a"].tolist()) == [1, 2]
    assert set(out["p"].astype(int)) == {7}


# ------------------------------------------------------- BPE merge training
def _naive_bpe(texts, k):
    vocab = {}
    for t in texts:
        for w in t.split():
            key = tuple(w)
            vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for _ in range(k):
        pairs = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best_n = max(pairs.values())
        a, b = min(p for p, n in pairs.items() if n == best_n)
        merges.append((a, b, best_n))
        nv = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(sym[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


def test_bpe_train_both_paths_match_reference(ray_session):
    from tesseract_recognize_ray.functions import textstats as F_text

    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(60)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    want = _naive_bpe(texts, 12)
    got_driver = F_text.bpe_train_merges(ds, "text", 12)
    got_dist = F_text.bpe_train_merges(ds, "text", 12, driver_vocab_gate=0)
    for got, label in ((got_driver, "driver"), (got_dist, "distributed")):
        assert len(got) == len(want), label
        assert list(zip(got["left"], got["right"], got["pair_count"])) == want, label


def test_bpe_encode_matches_trainer_vocab(ray_session):
    """bpe_encode's lowest-rank-first merging must equal replaying the
    trainer's merges sequentially in rank order (the trainer's own apply
    loop) — the classic BPE equivalence, checked word for word."""
    from tesseract_recognize_ray.functions import textstats as F_text

    rng = np.random.default_rng(31)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "lowest", "lower", "low", "a1-b2"]
    texts = [" ".join(rng.choice(vocab, 25)) for _ in range(50)] + ["", "x"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    merges = F_text.bpe_train_merges(ds, "text", 15)
    pairs = list(zip(merges["left"], merges["right"]))

    def seq_encode(w):
        sym = list(w)
        for a, b in pairs:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    got = F_text.bpe_encode(ds, "text", merges).to_pandas().set_index("doc_id")
    assert len(got) == len(texts)
    for doc_id, text in zip(df["doc_id"], df["text"]):
        want = [t for w in text.split() for t in seq_encode(w)]
        assert list(got.loc[doc_id, "bpe_tokens"]) == want, doc_id
        assert int(got.loc[doc_id, "n_bpe_tokens"]) == len(want)
    # the learned merges really do compress: some multi-char token exists
    assert any(len(t) > 1 for toks in got["bpe_tokens"] for t in toks)


# ---------------------------------------------------- hamming_near_dups
def test_hamming_near_dups_lossless_vs_brute_force(ray_session):
    from tesseract_recognize_ray.functions import dedup as F_dedup

    rng = np.random.default_rng(31)
    base = rng.integers(0, 2**63 - 1, 40, dtype=np.int64)
    # planted near-dups: flip 1-4 random bits of the first 12 hashes
    extra = []
    for i in range(12):
        h = np.uint64(base[i].view(np.uint64) if hasattr(base[i], "view") else np.uint64(base[i]))
        h = np.uint64(base[i])
        for b in rng.choice(64, rng.integers(1, 5), replace=False):
            h = h ^ np.uint64(1 << int(b))
        extra.append(np.int64(h.view(np.int64) if hasattr(h, "view") else h))
    hashes = np.concatenate([base, np.array(extra, dtype=np.int64)])
    df = pd.DataFrame({"img": np.arange(len(hashes), dtype=np.int64), "h": hashes})
    got = (
        F_dedup.hamming_near_dups(
            ray.data.from_pandas(df.copy()).repartition(5), "img", "h", max_hamming=4
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # brute force
    exp = []
    hv = hashes.view(np.uint64)
    for i in range(len(hv)):
        for j in range(i + 1, len(hv)):
            d = int(bin(int(hv[i] ^ hv[j])).count("1"))
            if d <= 4:
                exp.append((i, j, d))
    assert len(exp) >= 12
    assert [tuple(r) for r in got[["id_a", "id_b", "hamming"]].astype(int).values] == exp


# ------------------------------------------------- product quantization
def test_pq_roundtrip_recall_and_determinism(ray_session):
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(41)
    # clustered cloud: PQ should retrieve same-cluster neighbours
    centers = rng.normal(size=(10, 32)) * 4.0
    mat = np.repeat(centers, 50, axis=0) + rng.normal(size=(500, 32)) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(500, dtype=np.int64), "embedding": list(mat.astype(np.float32))})
    ds = ray.data.from_pandas(df.copy()).repartition(6)
    books = F_sim.train_pq_codebooks(ds, "embedding", m=8, ksub=16)
    assert books.shape == (8, 16, 4)
    codes = F_sim.pq_encode(ds, "vec_id", "embedding", books).materialize()
    row = codes.take(1)[0]
    assert len(row["code"]) == 8
    q = mat[:5].astype(np.float64)
    approx = F_sim.pq_topk(codes, "vec_id", books, q, k=10)
    exact = F_sim.brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    rec = F_sim.ivf_recall(
        approx.rename(columns={"adist": "cosine"}), exact, k=10
    )
    assert rec >= 0.6, rec
    # determinism: re-encode + re-query reproduces exactly
    approx2 = F_sim.pq_topk(codes, "vec_id", books, q, k=10)
    pd.testing.assert_frame_equal(
        approx.reset_index(drop=True), approx2.reset_index(drop=True)
    )


def test_pq_rerank_recovers_exact_topk(ray_session):
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(43)
    mat = rng.normal(size=(400, 32))
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64), "embedding": list(mat.astype(np.float32))})
    ds = ray.data.from_pandas(df.copy()).repartition(6).materialize()
    books = F_sim.train_pq_codebooks(ds, "embedding", m=8, ksub=64)
    codes = F_sim.pq_encode(ds, "vec_id", "embedding", books).materialize()
    q = mat[:4].astype(np.float64)
    exact = F_sim.brute_force_topk(ds, "vec_id", "embedding", q, k=5)
    rr = F_sim.pq_topk_rerank(ds, codes, "vec_id", "embedding", books, q, k=5, shortlist=80)
    # on random data the 80-shortlist nearly always contains the true top-5;
    # recall must be >= the raw-ADC path and typically 1.0
    rec = F_sim.ivf_recall(rr, exact, 5)
    assert rec >= 0.9, rec


# ------------------------------------------------- distributed logreg
def test_logreg_matches_single_process_reference(ray_session):
    from tesseract_recognize_ray.functions import ml as F_ml

    rng = np.random.default_rng(53)
    n, d = 2000, 3
    x = rng.normal(size=(n, d))
    true_w = np.array([2.0, -1.0, 0.5])
    p = 1 / (1 + np.exp(-(x @ true_w + 0.3)))
    y = (rng.random(n) < p).astype(np.int64)
    df = pd.DataFrame({f"f{i}": x[:, i] for i in range(d)})
    df["y"] = y
    ds = ray.data.from_pandas(df.copy()).repartition(7)
    model = F_ml.logreg_train(ds, [f"f{i}" for i in range(d)], "y", iters=40, lr=0.5, l2=1e-3)

    # single-process reference: identical algorithm, identical op count
    mu, sd = x.mean(0), x.std(0)
    xs = (x - mu) / sd
    w = np.zeros(d + 1)
    for _ in range(40):
        z = xs @ w[:d] + w[d]
        pp = 1 / (1 + np.exp(-z))
        g = np.append(xs.T @ (pp - y), (pp - y).sum()) / n
        g[:d] += 1e-3 * w[:d]
        w = w - 0.5 * g
    np.testing.assert_allclose(model["coef"], w[:d], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model["intercept"], w[d], rtol=1e-8, atol=1e-10)
    assert model["loss_curve"][-1] < model["loss_curve"][0]
    # trained model separates: AUC-ish sanity via accuracy
    scored = F_ml.logreg_predict(ds, [f"f{i}" for i in range(d)], model).to_pandas()
    acc = ((scored["p"] > 0.5).astype(int) == scored["y"]).mean()
    assert acc > 0.8, acc


def test_copartitioned_join_left_with_missing_right_buckets(ray_session, tmp_path):
    from tesseract_recognize_ray.functions import relational as F

    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64), "a": np.arange(20)})
    right = pd.DataFrame({"k": np.array([0, 1], dtype=np.int64), "b": [5, 6]})
    dl, dr = str(tmp_path / "l"), str(tmp_path / "r")
    F.write_bucketed(ray.data.from_pandas(left), dl, ["k"], num_buckets=8)
    F.write_bucketed(ray.data.from_pandas(right), dr, ["k"], num_buckets=8)  # most buckets empty
    out = F.copartitioned_join(
        dl, dr, ["k"], num_buckets=8, how="left",
        columns_left=["k", "a"], columns_right=["k", "b"],
    ).to_pandas()
    assert len(out) == 20
    assert out["b"].notna().sum() == 2


# ------------------------------------------------------- global_cummax
def test_global_cummax_matches_pandas_incl_big_ints(ray_session):
    from tesseract_recognize_ray.functions import relational as F

    rng = np.random.default_rng(61)
    n = 5000
    big = (1 << 60)
    df = pd.DataFrame(
        {
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(big, big + 10**6, n, dtype=np.int64),  # > 2^53: float64 would round
        }
    )
    ds = ray.data.from_pandas(df.copy()).repartition(9)
    out = (
        F.global_cummax(ds, ["o"], "v", out_col="wm", num_buckets=8)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    want = df.sort_values("o").reset_index(drop=True)["v"].cummax().to_numpy()
    np.testing.assert_array_equal(out["wm"].to_numpy(), want)
    assert out["wm"].dtype == np.int64


def test_global_cumsum_matches_pandas(ray_session):
    from tesseract_recognize_ray.functions import relational as F

    rng = np.random.default_rng(67)
    n = 4000
    df = pd.DataFrame({"o": rng.permutation(n).astype(np.int64), "v": rng.integers(-100, 100, n).astype(np.int64)})
    out = (
        F.global_cumsum(ray.data.from_pandas(df.copy()).repartition(7), ["o"], "v", num_buckets=8)
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    want = df.sort_values("o").reset_index(drop=True)["v"].cumsum().to_numpy()
    np.testing.assert_array_equal(out["running_total"].to_numpy(), want)


# ------------------------------------------- grouped histogram quantile
def test_grouped_hist_quantile_within_bin_width(ray_session):
    from tesseract_recognize_ray.functions import sketches as F_sk

    rng = np.random.default_rng(71)
    n = 20000
    df = pd.DataFrame({"k": rng.integers(0, 25, n), "v": rng.normal(100, 30, n)})
    ds = ray.data.from_pandas(df.copy()).repartition(8)
    out = F_sk.grouped_histogram_quantile(ds, "k", "v", [0.5, 0.9], nbins=512).to_pandas()
    assert len(out) == 25 * 2
    w = (df["v"].max() - df["v"].min()) / 512
    for (k, q), grp in out.groupby(["k", "q"]):
        approx = grp["value"].iloc[0]
        exact = df.loc[df["k"] == k, "v"].quantile(q)
        assert abs(approx - exact) <= w + 1e-9, (k, q, approx, exact)


def test_grouped_hist_quantile_constant_column(ray_session):
    from tesseract_recognize_ray.functions import sketches as F_sk

    df = pd.DataFrame({"k": [1, 1, 2], "v": [7.0, 7.0, 7.0]})
    out = F_sk.grouped_histogram_quantile(ray.data.from_pandas(df), "k", "v", [0.5]).to_pandas()
    assert sorted(out["value"]) == [7.0, 7.0]


def test_skew_split_left_hot_key_missing_from_small(ray_session):
    """Hot probe key absent from the small side, how='left', int64 payload:
    hot-path blocks and cold-path blocks must carry the SAME Arrow type
    (int64 with nulls), or the union crashes downstream consumers."""
    from tesseract_recognize_ray.functions import relational as F

    big = pd.DataFrame({"k": np.array([0] * 500 + [1, 2, 3] * 20, dtype=np.int64)})
    big["a"] = np.arange(len(big), dtype=np.int64)
    small = pd.DataFrame({"kk": np.array([1, 2], dtype=np.int64), "pay": np.array([10, 20], dtype=np.int64)})
    out = F.skew_split_join(
        ray.data.from_pandas(big).repartition(4),
        ray.data.from_pandas(small),
        "k", "kk", how="left", hot_keys=1, num_buckets=4,
    )
    # a pyarrow-format consumer after the union is the crash surface
    agg = F.grouped_agg(out, ["k"], [("pay", "sum", "s")]).to_pandas().sort_values("k")
    df = out.to_pandas()
    assert len(df) == len(big)
    assert df.loc[df["k"] == 0, "pay"].isna().all()
    assert int(df.loc[df["k"] == 1, "pay"].iloc[0]) == 10


def test_ivf_pq_recall_on_clustered_data(ray_session):
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(83)
    centers = rng.normal(size=(8, 32)) * 4.0
    mat = np.repeat(centers, 60, axis=0) + rng.normal(size=(480, 32)) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(480, dtype=np.int64), "embedding": list(mat.astype(np.float32))})
    ds = ray.data.from_pandas(df.copy()).repartition(6).materialize()
    q = mat[:4].astype(np.float64)
    exact = F_sim.brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    approx = F_sim.ivf_pq_topk(
        ds, "vec_id", "embedding", q, k=10,
        n_centroids=8, nprobe=3, m=8, ksub=32, shortlist=60,
    )
    rec = F_sim.ivf_recall(approx, exact, 10)
    assert rec >= 0.8, rec


# ----------------------------------------------------------- z-ordering
def _rg_touched(path, col, lo, hi):
    """Row groups whose [min,max] stats overlap [lo,hi]."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import glob, os
    total = touched = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                touched += 1
    return touched, total


def test_zorder_write_prunes_both_dimensions(ray_session, tmp_path):
    from tesseract_recognize_ray.functions import relational as F

    rng = np.random.default_rng(91)
    n = 60000
    df = pd.DataFrame(
        {
            "a": rng.integers(0, 1 << 15, n).astype(np.int64),
            "b": rng.integers(0, 1 << 15, n).astype(np.int64),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )
    dz, da = str(tmp_path / "z"), str(tmp_path / "plain")
    ds = ray.data.from_pandas(df.copy()).repartition(8)
    F.write_zordered(ds, dz, ["a", "b"], num_files=16)
    ray.data.from_pandas(df.copy()).repartition(16).write_parquet(da)
    # correctness: same rows
    back = pd.read_parquet(dz).sort_values(["a", "b", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df.sort_values(["a", "b", "v"]).reset_index(drop=True))
    # pruning: a selective range on EITHER column touches fewer row groups
    lo, hi = 1000, 3000
    for col in ("a", "b"):
        tz, nz = _rg_touched(dz, col, lo, hi)
        tp, np_ = _rg_touched(da, col, lo, hi)
        assert tz / nz < tp / np_, (col, tz, nz, tp, np_)
        assert tp == np_  # random layout: stats never prune


# ------------------------------------------------------------ compaction
def test_compact_parquet_preserves_rows(ray_session, tmp_path):
    from tesseract_recognize_ray.sources.io import compact_parquet
    import glob

    df = pd.DataFrame({"a": np.arange(5000, dtype=np.int64), "b": np.arange(5000) % 7})
    src, dst = str(tmp_path / "many"), str(tmp_path / "few")
    ray.data.from_pandas(df.copy()).repartition(40).write_parquet(src)  # 40 small files
    assert len(glob.glob(f"{src}/*.parquet")) >= 20
    n = compact_parquet(src, dst, target_rows=2500)
    assert n == 5000
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) <= 4
    back = pd.read_parquet(dst).sort_values(["a"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)
