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
