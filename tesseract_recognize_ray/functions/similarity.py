"""Similarity search over an embedding column (list<float>), Ray-Data-first.

  brute_force_topk — baseline: the query matrix is broadcast once via
    ray.put; every batch does one numpy matmul against it and locally prunes
    to k candidates, so the final global step only sorts n_blocks*k rows.
  ivf_topk — scale path: seeded sampled centroids (a cheap k-means-free IVF),
    vectors assigned to nearest centroid in one map_batches pass; a query
    probes only the nprobe nearest centroid partitions. Documented trade-off:
    recall < 1.0 when the true neighbor lives in an unprobed cell.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    k: int = 10,
    exclude_ids: set | None = None,
) -> pd.DataFrame:
    """Exact cosine top-k per query row. Returns a small pandas frame
    (query_idx, vec_id, cosine) of k rows per query, sorted by
    (query_idx, -cosine, vec_id)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)
    excl = exclude_ids or set()
    eref = ray.put(excl)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        ex = ray.get(eref)
        ids = batch[id_col].to_numpy()
        if len(ex):
            keep = ~pd.Series(ids).isin(ex).to_numpy()
            batch = batch[keep]
            ids = ids[keep]
        if not len(ids):
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = v @ qm.T  # (n, Q)
        rows = []
        kk = min(k, sims.shape[0])
        for qi in range(qm.shape[0]):
            # deterministic prune: exact-cosine ties break by vec_id ASC (the
            # global sort's tiebreak) — bare argpartition keeps an arbitrary
            # subset of tied rows and can drop the globally-kept one
            idx = np.lexsort((ids, -sims[:, qi]))[:kk]
            rows.append(
                pd.DataFrame({"query_idx": qi, "vec_id": ids[idx], "cosine": sims[idx, qi].astype(float)})
            )
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(prune, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "cosine", "vec_id"], ascending=[True, False, True], kind="mergesort")
    return cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)


def embedding_centroids(
    ds: Dataset, key_col: str, vec_col: str, *, num_buckets: int = 16
) -> Dataset:
    """Per-key mean embedding (class prototype / cluster centroid): each
    batch emits ONE partial (key, sum-vector, n) row per key (segmented
    np.add.at — the shuffle moves key-count x dim doubles per block, never
    raw vectors), then a bucketed merge divides. Output: (key, centroid
    float64 list, n)."""
    from ..hashing import stable_bucket

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        codes, uniq = pd.factorize(b[key_col].to_numpy())
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        n = np.bincount(codes, minlength=len(uniq))
        return pd.DataFrame({key_col: uniq, "__sum": list(sums), "__n": n.astype("int64")})

    parts = ds.map_batches(partial, batch_format="pandas")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = stable_bucket(b[key_col], num_buckets)
        return b

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(df[key_col].to_numpy())
        mat = np.stack(df["__sum"].to_numpy())
        sums = np.zeros((len(uniq), mat.shape[1]))
        np.add.at(sums, codes, mat)
        n = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n, codes, df["__n"].to_numpy())
        return pd.DataFrame(
            {key_col: uniq, "centroid": list(sums / n[:, None]), "n": n}
        )

    return (
        parts.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda d: merge(d.drop(columns="__bucket")), batch_format="pandas")
    )


def build_ivf_centroids(
    ds: Dataset, vec_col: str, n_centroids: int = 64, seed: int = 42, lloyd_iters: int = 10
) -> np.ndarray:
    """Seeded spherical k-means on a bounded sample: sample ~16x n
    candidates (driver-held — thousands of vectors, not the corpus), init
    from the first n, then a few vectorized Lloyd iterations maximizing
    cosine. Deterministic; the sample bound keeps this O(sample x n x d)
    regardless of corpus size."""
    frac = min(1.0, (n_centroids * 16) / max(1, ds.count()))
    sample = ds.random_sample(frac, seed=seed).take_all()
    # driver-boundedness is the invariant this function sells: the sample
    # is Binomial(N, frac) with mean 16*n — enforce, don't just comment
    assert len(sample) <= 64 * n_centroids + 1024, (
        f"ivf seeding sample blew its driver bound: {len(sample)} rows"
    )
    vecs = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample]))
    cents = vecs[:n_centroids].copy()
    for _ in range(lloyd_iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cents[c] = vecs[m].mean(axis=0)
        cents = _normalize(cents)
    return cents


def build_ivf_index(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    out_dir: str,
    n_centroids: int = 64,
    seed: int = 42,
    replicas: int = 1,
) -> np.ndarray:
    """Persist the IVF index: assign every vector to its `replicas` nearest
    centroids ONCE and write (id, cell, normalized vector) as parquet
    PARTITIONED BY CELL, plus the centroid matrix. Queries then read only
    their probed cells' partitions — the index is computed once per corpus,
    not per query run, and the read prunes at the directory level.
    replicas>1 = multi-assignment (index grows x replicas, recall rises;
    readers must dedupe by id since a vector appears in several cells)."""
    import os

    centroids = build_ivf_centroids(ds, vec_col, n_centroids, seed)
    cref = ray.put(centroids)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cref)
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        scores = v @ cents.T
        if replicas == 1:
            cellsR = np.argmax(scores, axis=1).astype(np.int32)[:, None]
        else:
            cellsR = np.argsort(-scores, axis=1)[:, :replicas].astype(np.int32)
        n, r = cellsR.shape
        flat_cells = cellsR.ravel()
        rep_idx = np.repeat(np.arange(n), r)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[rep_idx],
                # cell twice: partition col (moved into the dir name by the
                # writer) + data col (survives a direct leaf-dir read)
                "cell": flat_cells,
                "cell_id": flat_cells,
                "nvec": [v[i] for i in rep_idx],
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    return centroids


def ivf_topk_indexed(
    index_dir: str,
    id_col: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
) -> pd.DataFrame:
    """Approximate cosine top-k against a persisted IVF index: only the
    nprobe probed cells' parquet partitions are read (directory-level
    pruning); within them, per-batch matmul + deterministic local prune."""
    import os

    import ray.data as rd

    import glob

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_set = sorted(set(probed.ravel().tolist()))
    paths = [
        f
        for c in probe_set
        for f in sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]
    if not paths:
        return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
    ds = rd.read_parquet(paths)
    qref = ray.put((q, probed))

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        qm, probed_cells = ray.get(qref)
        ids = batch[id_col].to_numpy()
        cell = batch["cell_id"].to_numpy().astype(np.int64)
        v = np.stack(batch["nvec"].to_numpy())
        sims = v @ qm.T
        rows = []
        for qi in range(qm.shape[0]):
            in_cells = np.isin(cell, probed_cells[qi])
            if not in_cells.any():
                continue
            s = sims[in_cells, qi]
            idx = np.lexsort((ids[in_cells], -s))[: min(k, len(s))]
            rows.append(
                pd.DataFrame({"query_idx": qi, "vec_id": ids[in_cells][idx], "cosine": s[idx].astype(float)})
            )
        if not rows:
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(prune, batch_format="pandas").to_pandas()
    # a multi-assigned (replicas>1) vector can reach the driver once per
    # probed cell it lives in — keep one candidate per (query, vector)
    cand = cand.drop_duplicates(["query_idx", "vec_id"])
    cand = cand.sort_values(["query_idx", "cosine", "vec_id"], ascending=[True, False, True], kind="mergesort")
    return cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)


def ivf_recall(approx: pd.DataFrame, exact: pd.DataFrame, k: int) -> float:
    """Fraction of exact top-k neighbors the approximate result recovered
    (macro-averaged over queries)."""
    got = approx.groupby("query_idx")["vec_id"].apply(set).to_dict()
    want = exact.groupby("query_idx")["vec_id"].apply(set).to_dict()
    if not want:
        return 1.0
    return float(
        np.mean([len(got.get(qi, set()) & w) / max(1, len(w)) for qi, w in want.items()])
    )


def ivf_topk(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    k: int = 10,
    centroids: np.ndarray | None = None,
    n_centroids: int = 64,
    nprobe: int = 8,
    seed: int = 42,
    replicas: int = 1,
) -> pd.DataFrame:
    """Approximate cosine top-k: assign vectors to centroid cells once,
    search only the nprobe cells nearest each query. replicas>1 enables
    multi-assignment (each vector lives in its `replicas` nearest cells) —
    the standard recall lever when neighbors straddle cell borders
    (isotropic embeddings are the worst case); search cost per probe is
    unchanged, candidate lists grow ~x(replicas x nprobe/n_centroids)."""
    if centroids is None:
        centroids = build_ivf_centroids(ds, vec_col, n_centroids, seed)
    cref = ray.put(centroids)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_set = set(probed.ravel().tolist())
    pref = ray.put(probe_set)
    qref = ray.put((q, probed))

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(cref)
        probe = ray.get(pref)
        qm, probed_cells = ray.get(qref)
        ids = batch[id_col].to_numpy()
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        scores = v @ cents.T
        if replicas == 1:
            cellsR = np.argmax(scores, axis=1)[:, None]
        else:
            cellsR = np.argsort(-scores, axis=1)[:, :replicas]  # (N, R)
        keep = np.isin(cellsR, list(probe)).any(axis=1)
        ids, v, cellsR = ids[keep], v[keep], cellsR[keep]
        if not len(ids):
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
        sims = v @ qm.T
        rows = []
        for qi in range(qm.shape[0]):
            in_cells = np.isin(cellsR, probed_cells[qi]).any(axis=1)
            if not in_cells.any():
                continue
            s = sims[in_cells, qi]
            # tie-break by vec_id ASC like the global sort (see brute force)
            idx = np.lexsort((ids[in_cells], -s))[: min(k, len(s))]
            rows.append(
                pd.DataFrame({"query_idx": qi, "vec_id": ids[in_cells][idx], "cosine": s[idx].astype(float)})
            )
        if not rows:
            return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(prune, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "cosine", "vec_id"], ascending=[True, False, True], kind="mergesort")
    return cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)


def kmeans_lloyd(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    round_digits: int = 6,
) -> Dataset:
    """Distributed Lloyd's k-means with a deterministic, SQL-reproducible
    contract (an unrolled-CTE oracle can replay it exactly):

      * seeds = the vectors of the k smallest id_col values, cid 0..k-1;
      * assignment = smallest direct squared-L2 distance, ties to the
        smallest cid (same order DuckDB's list_distance + cid sort yields);
      * each iteration's new centroid = coordinate mean ROUNDED to
        round_digits — rounding makes the distributed float64 sum bit-stable
        against any serial re-computation (error ~1e-13 << 5e-7 quantum);
      * an empty cluster keeps its previous centroid.

    Scale shape per iteration: centroids broadcast once via ray.put; ONE
    map_batches pass emits <=k (cid, partial_sum, n) rows per block
    (k x dim doubles, never raw vectors); the driver folds the tiny
    k x blocks partials. iters+1 streaming passes over the input total —
    the input lineage should be a cheap scan. Output: (id_col, cluster)."""
    import ray

    cents = _kmeans_centroids(ds, id_col, vec_col, k, iters, round_digits)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        asg = _assign(x, c)
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "cluster": asg.astype(np.int64)})

    c_ref = ray.put(cents)
    return ds.map_batches(fn, batch_format="pandas")


def _assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Nearest centroid by direct (x - c)^2 squared-L2 — elementwise-identical
    arithmetic to DuckDB's list_distance, so near-tie flips can't diverge;
    argmin's first-min rule = smallest cid on exact ties."""
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def _kmeans_centroids(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    round_digits: int = 6,
) -> np.ndarray:
    """The Lloyd iteration loop of kmeans_lloyd (see its contract docstring);
    returns the final k x dim float64 centroid matrix."""
    import ray

    seed_rows = (
        ds.sort(id_col).limit(k).to_pandas()
    )  # k rows only; Ray's sort+limit prunes per-block before the merge
    cents = np.stack(seed_rows.sort_values(id_col)[vec_col].to_numpy()).astype(np.float64)

    def partials_of(c_ref):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(c_ref)
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            asg = _assign(x, c)
            sums = np.zeros_like(c)
            np.add.at(sums, asg, x)
            n = np.bincount(asg, minlength=len(c))
            keep = n > 0
            return pd.DataFrame(
                {
                    "cid": np.arange(len(c))[keep],
                    "s": list(sums[keep]),
                    "n": n[keep].astype("int64"),
                }
            )

        return fn

    for _ in range(iters):
        c_ref = ray.put(cents)
        sums = np.zeros_like(cents)
        n = np.zeros(len(cents), dtype=np.int64)
        for b in ds.map_batches(partials_of(c_ref), batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"
        ):
            cid = b["cid"].to_numpy()
            np.add.at(sums, cid, np.stack(b["s"].to_numpy()))
            np.add.at(n, cid, b["n"].to_numpy())
        nz = n > 0
        new = cents.copy()
        new[nz] = np.round(sums[nz] / n[nz, None], round_digits)
        cents = new

    return cents


def semantic_dedup(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    k: int | None = None,
    iters: int = 3,
    threshold: float = 0.9,
    round_digits: int = 6,
    max_cluster_size: int | None = None,
) -> Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    embeddings with k-means, then inside each cluster flag every vector that
    has an EARLIER (smaller id_col) cluster-mate with e6-rounded cosine
    similarity >= threshold. The earlier-neighbor rule (rather than
    greedy-kept chains) keeps the semantics order-free and exactly
    SQL-expressible: a self-join on cluster + vec_id inequality replays it.
    Output: (id_col, cluster, is_dup) — one row per input vector; the kept
    set is ``is_dup == False``.

    Scale shape: centroids from the same broadcast-partials Lloyd loop as
    kmeans_lloyd; ONE map_batches assigns clusters (vectors stay in their
    blocks); the only shuffle moves each vector ONCE keyed by cluster id.
    Pairwise work is confined within clusters — at web scale SemDeDup runs
    with k ~ sqrt(N) (10^5+ clusters), so per-cluster O(n^2/k^2) stays
    bounded and the groupby has high key cardinality; the per-cluster
    matmul walks column chunks so peak memory is O(n x 1024), not O(n^2).
    k defaults to max(8, ceil(sqrt(N))) — the SemDeDup operating point — via
    one count() pass (pass k explicitly to skip it, and ALWAYS pass it when
    an external oracle must replay the same clustering).

    max_cluster_size: straggler guard for skewed corpora. A mega-cluster
    (one hot semantic mode) makes the per-cluster pair scan O(n_c^2) even
    though memory stays chunk-bounded; with a cap C the candidate
    "earlier-mate" set is restricted to the cluster's C earliest rows, so
    work is O(n_c * C) — linear — at the cost of missing dup pairs whose
    BOTH members rank past C. Rows of capped clusters carry
    truncated=True (the hot-bucket-flag convention of minhash_lsh_pairs)
    so downstream can count what the cap skipped; the capped semantics
    stay exactly SQL-replayable (rank filter on the join's earlier side).
    None (default) = exact."""
    import ray

    if k is None:
        k = max(8, int(np.ceil(np.sqrt(max(ds.count(), 1)))))
    cents = _kmeans_centroids(ds, id_col, vec_col, k, iters, round_digits)
    c_ref = ray.put(cents)

    def assign_keep(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(c_ref)
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        asg = _assign(x, c)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "cluster": asg.astype(np.int64),
                vec_col: list(x),
            }
        )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col).reset_index(drop=True)
        x = np.stack(df[vec_col].to_numpy())
        nrm = np.linalg.norm(x, axis=1)
        nrm[nrm == 0] = 1.0  # zero vectors: cos := 0 (oracle-side NaN never >= t)
        xn = x / nrm[:, None]
        n = len(df)
        cap = n if max_cluster_size is None else min(n, max_cluster_size)
        dup = np.zeros(n, dtype=bool)
        step = 1024
        for s in range(1, n, step):
            e = min(s + step, n)
            lim = min(e, cap)  # earlier-mate candidates: first `cap` rows
            if lim <= 0:
                continue
            sims = np.round(xn[:lim] @ xn[s:e].T, round_digits)
            jj = np.arange(lim)[:, None]
            ii = np.arange(s, e)[None, :]
            sims[jj >= ii] = -2.0  # only strictly-earlier rows count
            dup[s:e] = (sims >= threshold).any(axis=0)
        out = {id_col: df[id_col], "cluster": df["cluster"], "is_dup": dup}
        if max_cluster_size is not None:
            out["truncated"] = np.full(n, n > max_cluster_size)
        return pd.DataFrame(out)

    return (
        ds.map_batches(assign_keep, batch_format="pandas")
        .groupby("cluster")
        .map_groups(mark, batch_format="pandas")
    )


# --------------------------------------------------------------- PCA family
def embedding_moments(
    ds: Dataset, vec_col: str, dims: int | None = None
) -> tuple[int, np.ndarray, np.ndarray]:
    """Streaming first+second moments of an embedding column: each block
    contributes ONE (n, sum_x, X^T X) partial — d + d^2 float64s regardless
    of row count — and the d x d fold happens on the driver (d is model
    dimension, 10^2..10^4: tiny next to the corpus, and the partial count is
    the block count, not the row count). Returns (n, sum (d,), sumsq (d,d)).

    dims: restrict to the first `dims` coordinates (cheap marginal moments)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # empty blocks drop schema in Ray 2.49; emit nothing
            return pd.DataFrame({"__n": pd.Series([], dtype="int64"), "__sum": [], "__sq": []})
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        if dims is not None:
            mat = mat[:, :dims]
        return pd.DataFrame(
            {
                "__n": [np.int64(mat.shape[0])],
                "__sum": [mat.sum(axis=0)],
                "__sq": [(mat.T @ mat).reshape(-1)],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts) or "__n" not in parts.columns:
        raise ValueError("embedding_moments: empty dataset")
    n = int(parts["__n"].sum())
    if n == 0:
        raise ValueError("embedding_moments: empty dataset")
    s = np.stack(parts["__sum"].to_numpy()).sum(axis=0)
    d = s.shape[0]
    sq = np.stack(parts["__sq"].to_numpy()).sum(axis=0).reshape(d, d)
    return n, s, sq


def embedding_covariance(ds: Dataset, vec_col: str, dims: int | None = None) -> np.ndarray:
    """Population covariance matrix of the embedding column (one streaming
    pass, driver fold of per-block Gram partials)."""
    n, s, sq = embedding_moments(ds, vec_col, dims)
    mean = s / n
    return sq / n - np.outer(mean, mean)


def pca_components(
    ds: Dataset, vec_col: str, k: int, dims: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed PCA: one moments pass (see embedding_moments), then a
    d x d eigendecomposition ON THE DRIVER — the classic tall-skinny layout
    where n >> d makes X^T X the only thing worth shipping. Returns
    (eigvals desc (k,), components (k, d) rows = eigvectors, mean (d,)).

    Deterministic sign convention: each component is flipped so its
    largest-|coordinate| entry is positive (np.linalg.eigh sign is
    otherwise arbitrary and platform-dependent)."""
    n, s, sq = embedding_moments(ds, vec_col, dims)
    return pca_from_moments(n, s, sq, k)


def pca_from_moments(
    n: int, s: np.ndarray, sq: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pure driver-side tail of pca_components (exposed so callers that
    already hold the moments never re-scan the corpus)."""
    mean = s / n
    cov = sq / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    w = w[order]
    comp = v[:, order].T
    flip = np.sign(comp[np.arange(len(comp)), np.abs(comp).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return w, comp * flip[:, None], mean


def _iround(num: int, den: int) -> int:
    """round-half-away-from-zero of num/den on EXACT integers (den > 0).
    Mirrors the HUGEINT expression the DuckDB oracle unrolls — both sides
    share this one formula so the replay is bit-identical, never float."""
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((2 * (-num) + den) // (2 * den))


def embedding_int_moments(
    ds: Dataset, vec_col: str, scale: int = 10**6
) -> tuple[int, list[int], list[list[int]]]:
    """EXACT integer first+second moments of an embedding column: each
    coordinate is quantized to the 1/scale grid via floor(x*scale + 0.5)
    (the identical IEEE expression the SQL oracle uses, so both sides see
    the same integers), then per-block Gram partials accumulate in int64
    chunks sized so no product sum can overflow, and the driver folds them
    in arbitrary-precision Python ints. Same tall-skinny shape as
    embedding_moments (d + d^2 numbers per BLOCK cross the wire), but the
    fold is order-independent by construction — exact ints commute, so the
    result is bit-identical under any partitioning. Returns
    (n, sum (d,), sum-of-outer-products (d, d)) as Python ints."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # empty blocks drop schema in Ray 2.49; emit nothing
            return pd.DataFrame({"__n": pd.Series([], dtype="int64"), "__sum": [], "__sq": []})
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        q = np.floor(mat * scale + 0.5)
        mx = float(np.abs(q).max())
        if mx >= 2**31:
            raise ValueError("embedding_int_moments: coordinate overflows the quantization grid")
        qi = q.astype(np.int64)
        step = max(1, int((2**62) / max(1.0, mx * mx)))  # per-chunk Gram sum stays < 2^62
        acc = np.zeros((qi.shape[1], qi.shape[1]), dtype=object)
        for i0 in range(0, qi.shape[0], step):
            ch = qi[i0 : i0 + step]
            acc = acc + (ch.T @ ch).astype(object)
        return pd.DataFrame(
            {
                "__n": [np.int64(qi.shape[0])],
                "__sum": [qi.sum(axis=0).astype(object)],
                "__sq": [acc.reshape(-1)],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts) or "__n" not in parts.columns:
        raise ValueError("embedding_int_moments: empty dataset")
    n = int(parts["__n"].sum())
    if n == 0:
        raise ValueError("embedding_int_moments: empty dataset")
    s = [int(x) for x in np.stack(parts["__sum"].to_numpy()).sum(axis=0)]
    d = len(s)
    sq_flat = np.stack(parts["__sq"].to_numpy()).sum(axis=0)
    sq = [[int(sq_flat[i * d + j]) for j in range(d)] for i in range(d)]
    return n, s, sq


def pca_power_from_int_moments(
    n: int, s: list[int], sq: list[list[int]], k: int = 8, iters: int = 12, scale: int = 10**6
) -> list[tuple[int, int]]:
    """Deterministic PCA eigenvalues by INTEGER-EXACT power iteration with
    Hotelling deflation — every operation is exact integer arithmetic on the
    micro-quantized covariance (entries rounded to 1e-6 via _iround), the
    all-ones start vector, max-abs normalization to the 1e9 grid, Rayleigh
    quotients, and rank-1 deflation. A DuckDB oracle unrolls the identical
    recurrence in HUGEINT CTEs, so engine and SQL agree bit-for-bit
    regardless of convergence; closeness to np.linalg.eigh is a separate
    pytest with analytic tolerance. Returns [(micro_eigenvalue,
    micro_trace)] per component (divide by 1e6 for real units)."""
    d = len(s)
    den_c = n * n * scale * scale
    C = [
        [_iround((n * sq[i][j] - s[i] * s[j]) * 10**6, den_c) for j in range(d)] for i in range(d)
    ]
    trace = sum(C[i][i] for i in range(d))
    out: list[tuple[int, int]] = []
    for _ in range(k):
        v = [10**9] * d
        for _t in range(iters):
            w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
            m = max(abs(x) for x in w)
            if m == 0:
                raise ValueError("pca_power_from_int_moments: zero matvec (rank < k?)")
            v = [_iround(x * 10**9, m) for x in w]
        den = sum(x * x for x in v)
        num = sum(v[i] * C[i][j] * v[j] for i in range(d) for j in range(d))
        lam = _iround(num, den)
        out.append((lam, trace))
        C = [[C[i][j] - _iround(lam * v[i] * v[j], den) for j in range(d)] for i in range(d)]
    return out


def pca_project(
    ds: Dataset, id_col: str, vec_col: str, components: np.ndarray, mean: np.ndarray
) -> Dataset:
    """Project every embedding onto fixed PCA components: components+mean are
    broadcast once via ray.put, each batch is one centered matmul. Output
    (id, pc0..pc{k-1}) — k scalar columns, not a list, so downstream scans
    can prune individual components."""
    cref = ray.put((np.asarray(components, dtype=np.float64), np.asarray(mean, dtype=np.float64)))
    d = int(np.asarray(mean).shape[0])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        comp, mu = ray.get(cref)
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)[:, :d]
        proj = (mat - mu) @ comp.T
        out = {id_col: b[id_col].to_numpy()}
        for i in range(comp.shape[0]):
            out[f"pc{i}"] = proj[:, i]
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")


# ------------------------------------------------- product quantization
def train_pq_codebooks(
    ds: Dataset, vec_col: str, *, m: int = 8, ksub: int = 32, seed: int = 42, iters: int = 12
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al. 2011 — public
    literature): split the (L2-normalized) vector into m subspaces and run
    a seeded Lloyd k-means with ksub centroids in each, over a BOUNDED
    deterministic sample (64 x ksub vectors held on the driver — training
    cost is independent of corpus size). Returns (m, ksub, d/m) float64."""
    n_sample = ksub * 64
    frac = min(1.0, n_sample / max(1, ds.count()))
    sample = ds.random_sample(frac, seed=seed).take_all()
    # same driver-boundedness invariant as build_ivf_centroids: mean
    # sample size is 64*ksub — enforce the bound instead of trusting it
    assert len(sample) <= 4 * n_sample + 1024, (
        f"pq training sample blew its driver bound: {len(sample)} rows"
    )
    vecs = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample]))
    if vecs.shape[0] < ksub:
        # corpus (or an improbable sample shortfall at the 64x margin)
        # smaller than the codebook — x[:ksub] would mis-broadcast below
        raise ValueError(
            f"train_pq_codebooks: sample has {vecs.shape[0]} vectors < ksub={ksub}; "
            "lower ksub or provide more data"
        )
    d = vecs.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        x = vecs[:, s * dsub : (s + 1) * dsub]
        c = x[:ksub].copy()
        for _ in range(iters):
            a = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1)
            for j in range(ksub):
                mj = a == j
                if mj.any():
                    c[j] = x[mj].mean(0)
        books[s] = c
    return books


def pq_encode(ds: Dataset, id_col: str, vec_col: str, codebooks: np.ndarray) -> Dataset:
    """Encode every vector to m uint8 code bytes (nearest sub-centroid per
    subspace, codebooks broadcast once): the corpus compresses 4·d/m : 1 —
    a 64-dim float32 vector becomes 8 bytes — and ONLY the (id, code)
    table is ever scanned at query time. Vectorized: one (n, ksub)
    distance matrix per subspace per batch."""
    m, ksub, dsub = codebooks.shape
    if ksub > 256:
        raise ValueError("ksub must fit uint8")
    cref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        books = ray.get(cref)
        v = _normalize(np.stack(b[vec_col].to_numpy()).astype(np.float64))
        codes = np.zeros((len(v), m), dtype=np.uint8)
        for s in range(m):
            x = v[:, s * dsub : (s + 1) * dsub]
            d2 = (x**2).sum(1)[:, None] - 2.0 * (x @ books[s].T) + (books[s] ** 2).sum(1)[None, :]
            codes[:, s] = d2.argmin(1).astype(np.uint8)
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "code": [c.tobytes() for c in codes]})

    return ds.map_batches(encode, batch_format="pandas")


def pq_topk(
    codes: Dataset, id_col: str, codebooks: np.ndarray, queries: np.ndarray, k: int = 10
) -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k over a pq_encode'd corpus: each
    query precomputes an (m, ksub) subspace distance table ONCE (broadcast),
    every batch scores its rows with pure table-lookup sums over the m code
    bytes — no float vectors are read at query time — and prunes to k before
    the driver merge. Approximate by construction; ranking ties break by id.
    Returns (query_idx, vec_id, adist) sorted by (query_idx, adist, id)."""
    m, ksub, dsub = codebooks.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))
    tables = np.zeros((q.shape[0], m, ksub))
    for s in range(m):
        xq = q[:, s * dsub : (s + 1) * dsub]
        tables[:, s, :] = (
            (xq**2).sum(1)[:, None] - 2.0 * (xq @ codebooks[s].T) + (codebooks[s] ** 2).sum(1)[None, :]
        )
    tref = ray.put(tables)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        tabs = ray.get(tref)
        ids = b[id_col].to_numpy()
        cm = np.frombuffer(b"".join(b["code"]), dtype=np.uint8).reshape(len(ids), m)
        rows = []
        kk = min(k, len(ids))
        for qi in range(tabs.shape[0]):
            ad = tabs[qi, np.arange(m)[None, :], cm].sum(1)
            idx = np.lexsort((ids, ad))[:kk]
            rows.append(pd.DataFrame({"query_idx": qi, "vec_id": ids[idx], "adist": ad[idx]}))
        return pd.concat(rows, ignore_index=True)

    cand = codes.map_batches(score, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "adist", "vec_id"], kind="mergesort")
    return cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)


def pq_topk_rerank(
    ds: Dataset,
    codes: Dataset,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
) -> pd.DataFrame:
    """PQ with exact re-ranking (the production ANN shape): the ADC code
    scan selects a `shortlist` per query (compressed table only), then ONE
    participant-pruned pass over the float table re-scores the union
    shortlist exactly — at most |queries| x shortlist vectors are ever read
    at full precision, independent of corpus size. Output contract matches
    brute_force_topk (query_idx, vec_id, cosine)."""
    import pyarrow as pa

    from .relational import _key_filter

    short = pq_topk(codes, id_col, codebooks, queries, k=shortlist)
    ids = pa.array(pd.unique(short["vec_id"]))
    pruned = _key_filter(ds, id_col, ray.put(ids), keep_matches=True)
    return brute_force_topk(pruned, id_col, vec_col, queries, k=k)


def build_ivf_pq_index(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    out_dir: str,
    *,
    n_centroids: int = 32,
    m: int = 16,
    ksub: int = 256,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Persist an IVF-PQ index — the canonical billion-scale ANN layout
    (Jégou et al. 2011): ONE encode pass assigns each vector its nearest
    coarse cell (seeded sampled centroids) and an m-byte PQ code, and writes
    (id, cell, code) as parquet PARTITIONED BY CELL, plus the centroid and
    codebook arrays. Queries (ivf_pq_topk_indexed) then read ONLY their
    probed cells' partitions — directory-level pruning, so the unprobed
    ~ (1 - nprobe/n_centroids) of the codes table is never scanned. The
    index is m bytes + id per vector (16:1 vs float32x64 at defaults) and
    is computed once per corpus, not per query run."""
    import os

    cents = build_ivf_centroids(ds, vec_col, n_centroids, seed)
    books = train_pq_codebooks(ds, vec_col, m=m, ksub=ksub, seed=seed)
    cref = ray.put(cents)
    bref = ray.put(books)
    dsub = books.shape[2]

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        cs, bk = ray.get(cref), ray.get(bref)
        v = _normalize(np.stack(b[vec_col].to_numpy()).astype(np.float64))
        cell = np.argmax(v @ cs.T, axis=1).astype(np.int32)
        codes = np.zeros((len(v), m), dtype=np.uint8)
        for s in range(m):
            x = v[:, s * dsub : (s + 1) * dsub]
            d2 = (x**2).sum(1)[:, None] - 2.0 * (x @ bk[s].T) + (bk[s] ** 2).sum(1)[None, :]
            codes[:, s] = d2.argmin(1).astype(np.uint8)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                # cell twice: partition col (consumed by the writer's dir
                # layout) + data col (survives a direct leaf-dir read)
                "cell": cell,
                "cell_id": cell,
                "code": [c.tobytes() for c in codes],
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(encode, batch_format="pandas").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    np.save(os.path.join(out_dir, "codebooks.npy"), books)
    return cents, books


def ivf_pq_index_paths(index_dir: str, probe_set) -> list[str]:
    """Resolve the parquet files of the probed cells only (directory-level
    pruning — split out so tests can assert exactly which partitions a
    probe set touches)."""
    import glob
    import os

    return [
        f
        for c in sorted(set(int(c) for c in probe_set))
        for f in sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]


def ivf_pq_topk_indexed(
    index_dir: str,
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    nprobe: int = 8,
    shortlist: int = 100,
) -> pd.DataFrame:
    """IVF-PQ query against a persisted build_ivf_pq_index: each query
    probes its nprobe nearest cells, ONLY those cells' parquet partitions
    are read (directory pruning — unprobed codes never leave storage), the
    ADC table-lookup scan prunes each batch to a per-query shortlist, and
    one participant-pruned exact pass over the float table re-ranks the
    union shortlist — at most |queries| x shortlist full-precision vectors
    are ever read. `ds` is the raw vector table used only for the re-rank.
    Returns (query_idx, vec_id, cosine) like brute_force_topk."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from .relational import _key_filter

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    m, ksub, dsub = books.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe].astype(np.int32)
    paths = ivf_pq_index_paths(index_dir, probes.ravel().tolist())
    if not paths:
        return pd.DataFrame({"query_idx": [], "vec_id": [], "cosine": []})

    tables = np.zeros((q.shape[0], m, ksub))
    for s in range(m):
        xq = q[:, s * dsub : (s + 1) * dsub]
        tables[:, s, :] = (
            (xq**2).sum(1)[:, None] - 2.0 * (xq @ books[s].T) + (books[s] ** 2).sum(1)[None, :]
        )
    tref = ray.put((tables, probes))

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        tabs, prb = ray.get(tref)
        ids = b[id_col].to_numpy()
        cells = b["cell_id"].to_numpy().astype(np.int64)
        cm = np.frombuffer(b"".join(b["code"]), dtype=np.uint8).reshape(len(ids), m)
        rows = []
        for qi in range(tabs.shape[0]):
            # a batch can mix several probed cells (different queries'
            # probe sets) — mask to THIS query's cells
            mask = np.isin(cells, prb[qi])
            if not mask.any():
                continue
            ad = tabs[qi, np.arange(m)[None, :], cm[mask]].sum(1)
            sids = ids[mask]
            kk = min(shortlist, len(sids))
            idx = np.lexsort((sids, ad))[:kk]
            rows.append(pd.DataFrame({"query_idx": qi, "vec_id": sids[idx], "adist": ad[idx]}))
        if not rows:
            return pd.DataFrame(
                {"query_idx": pd.Series(dtype="int64"), "vec_id": pd.Series(dtype="object"),
                 "adist": pd.Series(dtype="float64")}
            )
        return pd.concat(rows, ignore_index=True)

    cand = rd.read_parquet(paths).map_batches(scan, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "adist", "vec_id"], kind="mergesort")
    short = cand.groupby("query_idx", as_index=False).head(shortlist)
    ids = pa.array(pd.unique(short["vec_id"]))
    pruned = _key_filter(ds, id_col, ray.put(ids), keep_matches=True)
    return brute_force_topk(pruned, id_col, vec_col, queries, k=k)


def ivf_pq_topk(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_centroids: int = 32,
    nprobe: int = 8,
    m: int = 16,
    ksub: int = 256,
    shortlist: int = 100,
    seed: int = 42,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """One-shot IVF-PQ convenience: builds the cell-partitioned index
    (build_ivf_pq_index) into `index_dir` (a fresh /tmp dir by default) and
    queries it via ivf_pq_topk_indexed — so even the ad-hoc form never
    full-scans the codes table; only probed cells' partitions are read.
    Production callers should persist the index once and call the indexed
    pair directly."""
    import tempfile

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="trr_ivfpq_")
    ds = ds.materialize()  # consumed by centroid sample, PQ train, encode, re-rank
    build_ivf_pq_index(
        ds, id_col, vec_col, index_dir, n_centroids=n_centroids, m=m, ksub=ksub, seed=seed
    )
    return ivf_pq_topk_indexed(
        index_dir, ds, id_col, vec_col, queries, k=k, nprobe=nprobe, shortlist=shortlist
    )


def grouped_embedding_variance(
    ds: Dataset, key_col: str, vec_col: str, *, num_buckets: int = 16
) -> Dataset:
    """Per-key total intra-class variance of an embedding column: trace of
    the per-key covariance = Σ_d var_d — the compactness half of cluster
    quality scores. Same partial layout as embedding_centroids but with the
    per-dimension SQUARE sums added: each block ships one (key, n, Σx, Σx²)
    row per key (2·d + 1 doubles — never vectors), a bucketed merge folds
    them, and the variance is computed from exact float64 moments. Output:
    (key, n, tr_var)."""
    from ..hashing import stable_bucket

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        codes, uniq = pd.factorize(b[key_col].to_numpy())
        d = mat.shape[1]
        sums = np.zeros((len(uniq), d))
        sq = np.zeros((len(uniq), d))
        np.add.at(sums, codes, mat)
        np.add.at(sq, codes, mat * mat)
        n = np.bincount(codes, minlength=len(uniq))
        return pd.DataFrame(
            {key_col: uniq, "__sum": list(sums), "__sq": list(sq), "__n": n.astype("int64")}
        )

    parts = ds.map_batches(partial, batch_format="pandas")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = stable_bucket(b[key_col], num_buckets)
        return b

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniq = pd.factorize(df[key_col].to_numpy())
        d = len(df["__sum"].iloc[0])
        sums = np.zeros((len(uniq), d))
        sq = np.zeros((len(uniq), d))
        n = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, codes, np.stack(df["__sum"].to_numpy()))
        np.add.at(sq, codes, np.stack(df["__sq"].to_numpy()))
        np.add.at(n, codes, df["__n"].to_numpy())
        mean = sums / n[:, None]
        tr = (sq / n[:, None] - mean * mean).sum(axis=1)
        return pd.DataFrame({key_col: uniq, "n": n, "tr_var": tr})

    return (
        parts.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda d: merge(d.drop(columns="__bucket")), batch_format="pandas")
    )


# ------------------------------------------------ SQL-replayable ANN twins
def ivf_flat_topk(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 16,
    iters: int = 2,
    nprobe: int = 4,
) -> pd.DataFrame:
    """IVF-Flat L2 top-k under the kmeans_lloyd determinism contract, so an
    unrolled-CTE oracle replays it end-to-end: the coarse quantizer is
    _kmeans_centroids (first-k-by-id seeds, e6-rounded means, argmin ties to
    the smallest cid); a query probes its nprobe nearest cells (same metric,
    same tie rule); candidates rank by (squared L2 distance ROUNDED to e6,
    id ASC). Output (query_idx, vec_id, rank) — integer ranks only, float
    distances never reach the comparator. Scale shape: centroids broadcast
    once; one map pass assigns + scores; only n_blocks*k*Q candidate rows
    reach the driver."""
    cents = _kmeans_centroids(ds, id_col, vec_col, n_centroids, iters)
    q = np.asarray(queries, dtype=np.float64)
    d2q = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probed = np.argsort(d2q, axis=1, kind="stable")[:, :nprobe]  # ties -> smaller cid
    cref = ray.put(cents)
    qref = ray.put((q, probed))

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        qm, pr = ray.get(qref)
        ids = batch[id_col].to_numpy()
        x = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        cells = _assign(x, c)
        rows = []
        for qi in range(qm.shape[0]):
            m = np.isin(cells, pr[qi])
            if not m.any():
                continue
            d2r = np.round(((x[m] - qm[qi]) ** 2).sum(axis=1), 6)
            idx = np.lexsort((ids[m], d2r))[: min(k, int(m.sum()))]
            rows.append(
                pd.DataFrame({"query_idx": qi, "vec_id": ids[m][idx], "d2r": d2r[idx]})
            )
        if not rows:
            return pd.DataFrame(
                {"query_idx": pd.Series(dtype="int64"), "vec_id": pd.Series(dtype="int64"), "d2r": pd.Series(dtype="float64")}
            )
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(prune, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "d2r", "vec_id"], kind="mergesort")
    out = cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_idx").cumcount() + 1
    return out[["query_idx", "vec_id", "rank"]].astype("int64")


def _pq_codebooks_exact(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    *,
    m: int,
    ksub: int,
    iters: int,
    round_digits: int = 6,
) -> np.ndarray:
    """Product-quantization codebooks with the kmeans_lloyd determinism
    contract, trained over the FULL corpus (not a sample): subspace s's
    seeds are the first ksub rows by id sliced to dims [s*dsub, (s+1)*dsub);
    per iteration ONE fused map pass emits (subspace, cid, partial sum, n)
    rows for ALL subspaces — m*ksub*dsub doubles per block — and the driver
    folds + e6-rounds. Returns (m, ksub, dsub) float64."""
    seed_rows = ds.sort(id_col).limit(ksub).to_pandas()
    full = np.stack(seed_rows.sort_values(id_col)[vec_col].to_numpy()).astype(np.float64)
    d = full.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.stack([full[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)])

    def partials_of(bref):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            bk = ray.get(bref)
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            sub, cid, sums, ns = [], [], [], []
            for s in range(m):
                xs = x[:, s * dsub : (s + 1) * dsub]
                a = _assign(xs, bk[s])
                ssum = np.zeros((ksub, dsub))
                np.add.at(ssum, a, xs)
                n = np.bincount(a, minlength=ksub)
                keep = n > 0
                sub.append(np.full(int(keep.sum()), s, dtype=np.int64))
                cid.append(np.arange(ksub)[keep])
                sums.extend(list(ssum[keep]))
                ns.append(n[keep].astype("int64"))
            return pd.DataFrame(
                {
                    "s": np.concatenate(sub),
                    "cid": np.concatenate(cid),
                    "sum": sums,
                    "n": np.concatenate(ns),
                }
            )

        return fn

    for _ in range(iters):
        bref = ray.put(books)
        sums = np.zeros((m, ksub, dsub))
        n = np.zeros((m, ksub), dtype=np.int64)
        for b in ds.map_batches(partials_of(bref), batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"
        ):
            si = b["s"].to_numpy()
            ci = b["cid"].to_numpy()
            np.add.at(sums, (si, ci), np.stack(b["sum"].to_numpy()))
            np.add.at(n, (si, ci), b["n"].to_numpy())
        nz = n > 0
        new = books.copy()
        new[nz] = np.round(sums[nz] / n[nz][:, None], round_digits)
        books = new
    return books


def pq_adc_topk_exact(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
) -> pd.DataFrame:
    """PQ asymmetric-distance (ADC) top-k, SQL-replayable end-to-end: the
    codebooks come from _pq_codebooks_exact; every vector's code is its
    nearest sub-centroid per subspace (argmin ties to the smallest code);
    the ADC distance is the s=0..m-1 ordered sum of per-subspace query→
    centroid squared L2, ROUNDED to e6 before ranking (ties by id). Encode
    and score are fused in one pass — raw vectors are read once and never
    shuffled. Output (query_idx, vec_id, rank)."""
    books = _pq_codebooks_exact(ds, id_col, vec_col, m=m, ksub=ksub, iters=iters)
    dsub = books.shape[2]
    q = np.asarray(queries, dtype=np.float64)
    # LUT[qi, s, c] = squared L2 between q's subvector and codeword c
    tables = np.stack(
        [
            ((q[:, s * dsub : (s + 1) * dsub][:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
            for s in range(m)
        ],
        axis=1,
    )
    bref = ray.put(books)
    tref = ray.put(tables)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        bk = ray.get(bref)
        lut = ray.get(tref)
        ids = b[id_col].to_numpy()
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        codes = np.stack(
            [_assign(x[:, s * dsub : (s + 1) * dsub], bk[s]) for s in range(m)], axis=1
        )  # (n, m)
        rows = []
        for qi in range(lut.shape[0]):
            # ordered s=0..m-1 sum — the same left-to-right addition the
            # oracle's d2_0 + d2_1 + ... expression performs
            adc = np.zeros(len(ids))
            for s in range(m):
                adc += lut[qi, s, codes[:, s]]
            adcr = np.round(adc, 6)
            idx = np.lexsort((ids, adcr))[: min(k, len(ids))]
            rows.append(pd.DataFrame({"query_idx": qi, "vec_id": ids[idx], "adcr": adcr[idx]}))
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "adcr", "vec_id"], kind="mergesort")
    out = cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_idx").cumcount() + 1
    return out[["query_idx", "vec_id", "rank"]].astype("int64")


def ivf_pq_topk_exact(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    queries: np.ndarray,
    *,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 3,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
) -> pd.DataFrame:
    """IVF-PQ ANN, SQL-replayable end-to-end: the coarse quantizer is
    _kmeans_centroids and the codebooks are _pq_codebooks_exact (both under
    the kmeans_lloyd determinism contract); codebooks are trained on the
    FULL corpus, not per-cell residuals — the simpler classic layout whose
    every step a CTE oracle can replay. A query probes its nprobe nearest
    cells, candidates score by the ordered per-subspace ADC sum ROUNDED to
    e6, ties break on id. Output (query_idx, vec_id, rank). One scoring
    pass: cell assignment, PQ encoding and LUT scoring are fused, raw
    vectors are read once and never shuffled."""
    cents = _kmeans_centroids(ds, id_col, vec_col, n_centroids, iters)
    books = _pq_codebooks_exact(ds, id_col, vec_col, m=m, ksub=ksub, iters=iters)
    dsub = books.shape[2]
    q = np.asarray(queries, dtype=np.float64)
    d2q = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probed = np.argsort(d2q, axis=1, kind="stable")[:, :nprobe]
    tables = np.stack(
        [
            ((q[:, s * dsub : (s + 1) * dsub][:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
            for s in range(m)
        ],
        axis=1,
    )
    cref = ray.put(cents)
    bref = ray.put(books)
    tref = ray.put((tables, probed))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        bk = ray.get(bref)
        lut, pr = ray.get(tref)
        ids = b[id_col].to_numpy()
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        cells = _assign(x, c)
        codes = np.stack(
            [_assign(x[:, s * dsub : (s + 1) * dsub], bk[s]) for s in range(m)], axis=1
        )
        rows = []
        for qi in range(lut.shape[0]):
            msk = np.isin(cells, pr[qi])
            if not msk.any():
                continue
            adc = np.zeros(int(msk.sum()))
            for s in range(m):
                adc += lut[qi, s, codes[msk, s]]
            adcr = np.round(adc, 6)
            idx = np.lexsort((ids[msk], adcr))[: min(k, len(adcr))]
            rows.append(pd.DataFrame({"query_idx": qi, "vec_id": ids[msk][idx], "adcr": adcr[idx]}))
        if not rows:
            return pd.DataFrame(
                {"query_idx": pd.Series(dtype="int64"), "vec_id": pd.Series(dtype="int64"), "adcr": pd.Series(dtype="float64")}
            )
        return pd.concat(rows, ignore_index=True)

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["query_idx", "adcr", "vec_id"], kind="mergesort")
    out = cand.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_idx").cumcount() + 1
    return out[["query_idx", "vec_id", "rank"]].astype("int64")


def mmr_select_exact(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    *,
    lambda_num: int = 7,
    lambda_den: int = 10,
    n_candidates: int = 200,
) -> pd.DataFrame:
    """MMR diverse top-k with an SQL-replayable integer contract — the
    quantized twin of :func:`mmr_select`. Every cosine is rounded to e6
    integer units the moment it is computed; from then on the greedy
    recurrence is exact integer arithmetic, so an unrolled-CTE oracle
    replays each step's argmax bit-for-bit:

      * rel_e6(d) = ROUND(1e6 * cos(query, d)) as int64;
      * shortlist = n_candidates best by (rel_e6 DESC, id ASC);
      * step score (scaled by lambda_den to stay integral):
        score = lambda_num * rel_e6 - (lambda_den - lambda_num) *
        max_{s in selected} ROUND(1e6 * cos(d, s))   [0 when none selected];
      * argmax ties break on id ASC.

    Same two-phase scale shape as mmr_select: distributed relevance prune,
    driver-side greedy over the bounded shortlist. Returns
    (rank, id, score10_e6)."""
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    qref = ray.put(q)
    mu = lambda_den - lambda_num

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        ids = batch[id_col].to_numpy()
        if not len(ids):
            return pd.DataFrame({id_col: [], "__rel": [], vec_col: []})
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        rel = np.round(v @ qv * 1e6).astype(np.int64)
        idx = np.lexsort((ids, -rel))[: min(n_candidates, len(ids))]
        return pd.DataFrame({id_col: ids[idx], "__rel": rel[idx], vec_col: list(v[idx])})

    cand = ds.map_batches(prune, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["__rel", id_col], ascending=[False, True], kind="mergesort"
    ).head(n_candidates)
    if not len(cand):
        return pd.DataFrame(
            {"rank": pd.Series(dtype="int64"), id_col: pd.Series(dtype="int64"), "score10_e6": pd.Series(dtype="int64")}
        )

    ids = cand[id_col].to_numpy()
    rel = cand["__rel"].to_numpy()
    mat = np.stack(cand[vec_col].to_numpy())
    kk = min(k, len(ids))
    sel, sel_scores = [], []
    max_div = None  # true (possibly NEGATIVE) max over selected — a
    # zero-init + np.maximum would clamp the penalty at 0 and diverge from
    # the oracle's unclamped GREATEST when every selected cosine is negative
    taken = np.zeros(len(ids), dtype=bool)
    for step in range(kk):
        score = lambda_num * rel - (mu * max_div if step else 0)
        # mask rather than sentinel: negating int64-min in the lexsort key
        # would overflow back to the minimum and re-select taken rows
        avail = np.nonzero(~taken)[0]
        best = avail[np.lexsort((ids[avail], -score[avail]))[0]]
        sel.append(best)
        sel_scores.append(int(score[best]))
        taken[best] = True
        div = np.round(mat @ mat[best] * 1e6).astype(np.int64)
        max_div = div if max_div is None else np.maximum(max_div, div)
    si = np.asarray(sel)
    return pd.DataFrame(
        {
            "rank": np.arange(1, kk + 1, dtype=np.int64),
            id_col: ids[si],
            "score10_e6": np.asarray(sel_scores, dtype=np.int64),
        }
    )


def mmr_select(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    *,
    lambda_: float = 0.7,
    n_candidates: int = 1024,
) -> pd.DataFrame:
    """Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    1998): greedily pick argmax over remaining candidates of

        lambda * cos(query, d) - (1 - lambda) * max_{s in selected} cos(d, s)

    — the retrieval re-ranker that trades relevance against redundancy
    (lambda=1 degenerates to plain top-k).

    Scale shape: the greedy loop is inherently sequential, so the operator
    splits relevance from diversity — stage 1 is DISTRIBUTED (cosine to the
    broadcast query per block, deterministic local prune, one
    n_candidates-row exchange: the same shape as brute_force_topk), stage 2
    runs the k greedy steps on the DRIVER over only the C = n_candidates
    shortlisted rows (C x dim floats, bounded and small — the standard
    two-phase re-rank layout). Deterministic: all float64, score ties break
    on id ASC at both stages. Returns (rank 1..k, id, mmr_score)."""
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))[0]
    qref = ray.put(q)

    def prune(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(qref)
        ids = batch[id_col].to_numpy()
        if not len(ids):
            return pd.DataFrame({id_col: [], "__sim": [], vec_col: []})
        v = _normalize(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = v @ qv
        idx = np.lexsort((ids, -sims))[: min(n_candidates, len(ids))]
        return pd.DataFrame(
            {
                id_col: ids[idx],
                "__sim": sims[idx],
                vec_col: list(v[idx]),  # ship normalized vectors, pruned
            }
        )

    cand = ds.map_batches(prune, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["__sim", id_col], ascending=[False, True], kind="mergesort"
    ).head(n_candidates)
    if not len(cand):
        return pd.DataFrame({"rank": [], id_col: [], "mmr_score": []})

    ids = cand[id_col].to_numpy()
    rel = cand["__sim"].to_numpy()
    mat = np.stack(cand[vec_col].to_numpy())  # already normalized
    kk = min(k, len(ids))
    selected: list[int] = []
    sel_scores: list[float] = []
    max_div = np.zeros(len(ids))  # no selected yet -> zero diversity penalty
    taken = np.zeros(len(ids), dtype=bool)
    for step in range(kk):
        score = lambda_ * rel - (1.0 - lambda_) * (max_div if step else 0.0)
        score[taken] = -np.inf
        # argmax with id-ASC tie-break (scores mix rel and div, so the
        # candidate frame's (sim, id) order does not imply score order)
        best = np.lexsort((ids, -score))[0]
        selected.append(best)
        sel_scores.append(float(score[best]))
        taken[best] = True
        np.maximum(max_div, mat @ mat[best], out=max_div)
    sel = np.asarray(selected)
    return pd.DataFrame(
        {
            "rank": np.arange(1, kk + 1, dtype=np.int64),
            id_col: ids[sel],
            "mmr_score": np.asarray(sel_scores),
        }
    )
