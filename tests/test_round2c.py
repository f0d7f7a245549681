"""Round-2 continuation operators: interval gaps-and-islands, grouped bool
aggregates, distributed global row numbering, order-independent polynomial
checksum, weighted deterministic sampling — edge-case semantics vs
pandas/numpy ground truth (the driver contract value-matches each vs DuckDB
at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from tesseract_recognize_ray.functions import relational as F
from tesseract_recognize_ray.functions.streams import interval_merge


def test_interval_merge_long_interval_absorbs(ray_session):
    # key 1: [0,100] absorbs [10,20] AND [90,150] (running cummax, not
    # prev-row end); [200,210] starts a new island. touching ([150,150+0])
    # merges: next.start <= cummax. key 2 independent.
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2],
            "s": [0, 10, 90, 200, 5],
            "e": [100, 20, 150, 210, 6],
        }
    )
    out = (
        interval_merge(rd.from_pandas(df).repartition(3), "k", "s", "e")
        .to_pandas()
        .sort_values(["k", "island"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "island": [1, 2, 1],
            "island_start": [0, 200, 5],
            "island_end": [150, 210, 6],
            "n_rows": [3, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(out, want.astype({c: "int64" for c in want.columns}))


def test_interval_merge_touching_and_epoch_us_precision(ray_session):
    # epoch-us magnitudes (>2^53): a 1-us gap must NOT merge while an exact
    # touch must — fails if the cummax shift round-trips through float64.
    base = 1_700_000_000_000_000  # ~2023 in us
    df = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "s": [base, base + 10, base + 21],  # [b,b+10] touch [b+10,b+20]; gap of 1 to [b+21]
            "e": [base + 10, base + 20, base + 30],
        }
    )
    out = (
        interval_merge(rd.from_pandas(df), "k", "s", "e")
        .to_pandas()
        .sort_values("island")
        .reset_index(drop=True)
    )
    assert list(out["island"]) == [1, 2]
    assert list(out["island_end"]) == [base + 20, base + 30]


def test_grouped_bool_any_all(ray_session):
    df = pd.DataFrame(
        {"k": [1, 1, 2, 2, 3], "b": [True, False, True, True, False]}
    )
    out = (
        F.grouped_agg(
            rd.from_pandas(df).repartition(4),
            ["k"],
            [("b", "any", "any_b"), ("b", "all", "all_b")],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["any_b"]) == [True, True, False]
    assert list(out["all_b"]) == [False, True, False]


def test_global_row_number_matches_argsort_with_skew(ray_session):
    # skewed first key (many duplicates of one value) + tiebreak column;
    # ordinals must equal ROW_NUMBER() OVER (ORDER BY v, id) exactly.
    rng = np.random.RandomState(7)
    v = np.where(rng.rand(500) < 0.4, 42, rng.randint(0, 100, 500))
    df = pd.DataFrame({"id": np.arange(500)[::-1], "v": v})
    out = F.global_row_number(
        rd.from_pandas(df).repartition(8), ["v", "id"], num_buckets=4
    ).to_pandas()
    want = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    want["ordinal"] = np.arange(1, len(want) + 1)
    got = out.sort_values("ordinal").reset_index(drop=True)[["id", "v", "ordinal"]]
    pd.testing.assert_frame_equal(got, want[["id", "v", "ordinal"]])


def test_polynomial_checksum_order_and_partition_invariant(ray_session):
    df = pd.DataFrame({"a": [1, 2, 3, 4, 5], "b": [9, 8, 7, 6, 5]})
    c1 = F.polynomial_checksum(rd.from_pandas(df), ["a", "b"])
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    c2 = F.polynomial_checksum(rd.from_pandas(shuffled).repartition(5), ["a", "b"])
    assert c1 == c2
    # sensitivity: a single changed value moves the checksum
    df2 = df.copy()
    df2.loc[0, "b"] = 10
    assert F.polynomial_checksum(rd.from_pandas(df2), ["a", "b"]) != c1


def test_weighted_sample_prefers_heavy_docs(ray_session):
    # Efraimidis-Spirakis: P(selected) scales with weight — with a handful
    # of huge weights among tiny ones, the huge ones must dominate the top-k.
    n = 400
    w = np.full(n, 1.0)
    heavy = [5, 50, 123, 300]
    w[heavy] = 1e6
    d = np.arange(n, dtype=np.int64)
    u = ((d * 2654435761) % 4294967296 + 0.5) / 4294967296.0
    k = u ** (1.0 / w)
    top10 = set(np.argsort(-k)[:10])
    assert set(heavy) <= top10


def test_sliding_chunks_overlap_and_ragged_tail(ray_session):
    from tesseract_recognize_ray.functions.textstats import sliding_token_chunks

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f g", "x y", "   "],  # L=7; L=2; L=0 (no chunks)
        }
    )
    out = (
        sliding_token_chunks(rd.from_pandas(df), "doc_id", "text", window=4, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    # doc 1: ceil((7-4)/2)+1 = 3 chunks; final ragged (1 token)
    assert list(out[out.doc_id == 1]["chunk"]) == ["a b c d", "c d e f", "e f g"]
    # doc 2: L < window -> exactly one (whole-doc) chunk
    assert list(out[out.doc_id == 2]["chunk"]) == ["x y"]
    # doc 3: whitespace-only -> zero chunks
    assert (out.doc_id == 3).sum() == 0


def test_kmeans_recovers_planted_clusters(ray_session):
    from tesseract_recognize_ray.functions.similarity import kmeans_lloyd

    # three tight, far-apart planted clusters; ids interleaved so the
    # id-ordered seeds start in mixed positions and Lloyd must converge
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    lab = np.arange(90) % 3
    pts = centers[lab] + rng.normal(0, 0.5, size=(90, 2))
    df = pd.DataFrame(
        {"vec_id": np.arange(90, dtype=np.int64), "embedding": list(pts)}
    )
    out = (
        kmeans_lloyd(rd.from_pandas(df).repartition(4), "vec_id", "embedding", k=3, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 90
    # every planted cluster maps to exactly one output label, all distinct
    got = [set(out["cluster"][lab == g]) for g in range(3)]
    assert all(len(s) == 1 for s in got)
    assert len(set().union(*got)) == 3


def test_kmeans_deterministic_and_partition_invariant(ray_session):
    from tesseract_recognize_ray.functions.similarity import kmeans_lloyd

    rng = np.random.default_rng(11)
    pts = rng.normal(0, 1, size=(60, 4))
    df = pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64), "embedding": list(pts)}
    )
    runs = [
        kmeans_lloyd(rd.from_pandas(df).repartition(p), "vec_id", "embedding", k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
        for p in (1, 5)
    ]
    # e6 centroid rounding makes the distributed reduce bit-stable: the
    # assignment must not depend on block layout
    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_unigram_logprob_exact_values(ray_session):
    from tesseract_recognize_ray.functions.textstats import unigram_logprob

    # corpus: a x3, b x1, c x1 (total 5); vocab_size=2 -> {a, b} (tie b<c);
    # hand-computed integer micro-log10-probs, incl. OOV floor + empty doc
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a a b", "  ", "c a"]})
    out = (
        unigram_logprob(rd.from_pandas(df), "doc_id", "text", vocab_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp_a = round(np.log10(3 / 5) * 1e6)  # -221849
    lp_b = round(np.log10(1 / 5) * 1e6)  # -698970
    flp = round(np.log10(0.5 / 5) * 1e6)  # -1000000 exactly
    assert list(out["n_tokens"]) == [3, 0, 2]
    assert list(out["lp_micro"]) == [2 * lp_a + lp_b, 0, flp + lp_a]


def test_semantic_dedup_flags_planted_near_dups(ray_session):
    from tesseract_recognize_ray.functions.similarity import semantic_dedup

    # random 16-dim gaussians: pairwise cosine concentrates near 0, far from
    # the 0.999 threshold; planted near-copies 10->11 and 16->29 are the only
    # near-dup pairs and land in the same k-means cluster by construction
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, size=(30, 16))
    base[11] = base[10] + 1e-4
    base[29] = base[16] * (1 + 1e-6)
    df = pd.DataFrame(
        {"vec_id": np.arange(30, dtype=np.int64), "embedding": list(base)}
    )
    out = (
        semantic_dedup(
            rd.from_pandas(df).repartition(3), "vec_id", "embedding",
            k=2, iters=4, threshold=0.999,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == 30
    dup_ids = set(out[out["is_dup"]]["vec_id"])
    # the LATER member of each planted pair is flagged, everything else kept
    assert dup_ids == {11, 29}
    cl = out.set_index("vec_id")["cluster"]
    assert cl[10] == cl[11] and cl[16] == cl[29]


def test_balanced_sample_equalizes_domains(ray_session):
    # 3 sources with wildly skewed shares (400/80/20): a 60-doc A-ES draw
    # with w=1/|group| must land each source near 20, not near its share
    import ray.data as rd

    from tesseract_recognize_ray.functions import relational as F

    n = 500
    src = np.array(["big"] * 400 + ["mid"] * 80 + ["small"] * 20)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "source": src})
    counts = df.groupby("source").size()
    cmap = counts.to_dict()
    d = df["doc_id"].to_numpy()
    u = ((d * 2654435761) % 4294967296 + 0.5) / 4294967296.0
    k = df["source"].map(cmap).to_numpy(np.float64) * np.log10(u)
    picked = df.iloc[np.argsort(-k, kind="stable")[:60]]
    got = picked.groupby("source").size()
    # every domain within [10, 30] of the equal-share 20
    assert all(10 <= got.get(s, 0) <= 30 for s in ["big", "mid", "small"]), got.to_dict()
