"""Round-4 additions: persisted cell-partitioned IVF-PQ index (VERDICT r03
"do this" #1) and related scale fixes."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import ray


def _clustered_corpus(n_clusters=8, per=60, dim=32, seed=83):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 4.0
    mat = np.repeat(centers, per, axis=0) + rng.normal(size=(n_clusters * per, dim)) * 0.3
    df = pd.DataFrame(
        {"vec_id": np.arange(len(mat), dtype=np.int64), "embedding": list(mat.astype(np.float32))}
    )
    return df, mat


def test_ivf_pq_index_partition_pruning(ray_session, tmp_path):
    """The persisted index is hive-partitioned by cell and a query's file
    list contains ONLY probed cells' partitions — the round-3 full-code-scan
    is gone."""
    from tesseract_recognize_ray.functions import similarity as F_sim

    df, mat = _clustered_corpus()
    ds = ray.data.from_pandas(df.copy()).repartition(6).materialize()
    idx = str(tmp_path / "ivfpq")
    F_sim.build_ivf_pq_index(ds, "vec_id", "embedding", idx, n_centroids=8, m=8, ksub=32)

    cell_dirs = sorted(glob.glob(os.path.join(idx, "cell=*")))
    assert len(cell_dirs) >= 4  # clustered data occupies several cells
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    assert os.path.exists(os.path.join(idx, "codebooks.npy"))

    # probing 2 cells must touch exactly those partitions, no others
    probe = [int(os.path.basename(d).split("=")[1]) for d in cell_dirs[:2]]
    paths = F_sim.ivf_pq_index_paths(idx, probe)
    assert paths, "probed partitions resolve to files"
    touched_cells = {p.split("cell=")[1].split(os.sep)[0] for p in paths}
    assert touched_cells == {str(c) for c in probe}
    # and the index row count matches the corpus (single assignment)
    total = sum(
        len(pd.read_parquet(f)) for f in glob.glob(os.path.join(idx, "cell=*", "*.parquet"))
    )
    assert total == len(df)


def test_ivf_pq_indexed_recall_and_determinism(ray_session, tmp_path):
    """Indexed query ≥0.9 recall vs brute force on clustered data, and two
    runs against the same persisted index are identical."""
    from tesseract_recognize_ray.functions import similarity as F_sim

    df, mat = _clustered_corpus()
    ds = ray.data.from_pandas(df.copy()).repartition(6).materialize()
    idx = str(tmp_path / "ivfpq")
    F_sim.build_ivf_pq_index(ds, "vec_id", "embedding", idx, n_centroids=8, m=8, ksub=32)
    q = mat[:4].astype(np.float64)
    exact = F_sim.brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    a1 = F_sim.ivf_pq_topk_indexed(idx, ds, "vec_id", "embedding", q, k=10, nprobe=3, shortlist=60)
    a2 = F_sim.ivf_pq_topk_indexed(idx, ds, "vec_id", "embedding", q, k=10, nprobe=3, shortlist=60)
    pd.testing.assert_frame_equal(a1, a2)
    assert F_sim.ivf_recall(a1, exact, 10) >= 0.9
    # probing every cell + shortlist >= corpus must reproduce exact top-k
    full = F_sim.ivf_pq_topk_indexed(
        idx, ds, "vec_id", "embedding", q, k=10, nprobe=8, shortlist=len(df)
    )
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True)
    )


def test_auto_assemble_coalesce_rule():
    """Auto-derived reassembly coalesce: 16 blocks for small span streams,
    ~256 MB/block growth, disabled for unknown or huge estimates."""
    from tesseract_recognize_ray.pipelines.extract import auto_assemble_coalesce

    MB, GB = 1 << 20, 1 << 30
    assert auto_assemble_coalesce(7 * MB) == 16  # bench-sized stream
    assert auto_assemble_coalesce(4 * GB) == 16  # ceil(4G/256M)=16
    assert auto_assemble_coalesce(8 * GB) == 32  # grows with bytes
    assert auto_assemble_coalesce(64 * GB) == 256  # cap boundary included
    assert auto_assemble_coalesce(64 * GB + 1) is None  # huge: never force
    assert auto_assemble_coalesce(0) is None  # unknown: scale-safe off
    assert auto_assemble_coalesce(-5) is None


def test_quarantine_rejected_encoding_error_row(ray_session, tmp_path):
    """VERDICT r03 #6: an encoding the codecs legitimately reject
    (arithmetic-coded SOF9 JPEG) must surface as ONE kind='error' span row
    under quarantine=True — a clean per-blob error, never a job abort."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.fixtures import encode_raster, render_page
    from tesseract_recognize_ray.jpegcodec import encode_jpeg_gray
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    rng = np.random.default_rng(7)
    good = encode_raster(render_page(rng, n_regions=1).img)
    bad = bytearray(encode_jpeg_gray(np.full((16, 16), 128, dtype=np.uint8)))
    bad[bad.index(b"\xff\xc0") + 1] = 0xC9  # SOF0 -> SOF9 (arithmetic)
    media = pa.table(
        {
            "media_ref": pa.array(["m-good", "m-arith"], pa.string()),
            "bytes": pa.array([good, bytes(bad)], pa.large_binary()),
            "kind": pa.array(["page", "page"], pa.string()),
            "n_pages": pa.array([1, 1], pa.int32()),
        }
    )
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    docs = pa.table(
        {
            "doc_id": pa.array(["d0"], pa.string()),
            "spans": pa.array(
                [
                    [
                        {"kind": "media", "text": None, "media_ref": "m-arith", "offset": 0},
                        {"kind": "media", "text": None, "media_ref": "m-good", "offset": 1},
                    ]
                ],
                pa.list_(span_t),
            ),
        }
    )
    mp, dp = str(tmp_path / "media.parquet"), str(tmp_path / "docs.parquet")
    pq.write_table(media, mp)
    pq.write_table(docs, dp)
    out = extract_spans(dp, mp, PipelineConfig(quarantine=True)).to_pandas()
    errs = out[out["kind"] == "error"]
    assert len(errs) == 1
    assert errs["media_ref"].iloc[0] == "m-arith"
    assert "SOF9" in errs["text"].iloc[0]  # the reject reason travels with the row
    # the good media's spans still extracted
    assert (out["kind"] != "error").any()


def test_near_dup_dedup_no_candidates_passthrough(ray_session):
    """Regression (ocr_to_training_corpus): a corpus with ZERO LSH candidate
    pairs must pass through near_dup_dedup untouched — an empty Ray 2.49
    dataset loses its schema and the verify join used to crash on the
    missing key column."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.dedup import near_dup_dedup

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha bravo charlie delta echo foxtrot golf hotel",
                "completely different words about rivers and mountains here",
                "third document discussing astronomy telescopes and galaxies",
            ],
        }
    )
    out = near_dup_dedup(rd.from_pandas(df), "doc_id", "text", threshold=0.8).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def test_dsir_weights_match_naive_reference(ray_session):
    """DSIR importance log-weights must be bit-exact vs a naive
    single-process reference computing the same smoothed hashed-n-gram
    log-ratio (histograms are integer counts -> exact in float64; each
    row's features are row-local, so partitioning cannot change them)."""
    import pyarrow as pa
    import ray.data as rd

    from tesseract_recognize_ray.functions.ml import dsir_weights
    from tesseract_recognize_ray.functions.textstats import flat_ngrams
    from tesseract_recognize_ray.hashing import stable_bucket

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)] + ["alpha", "beta", "gamma"]
    docs = [" ".join(rng.choice(vocab, rng.integers(4, 30))) for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": docs})
    tgt = df[df["doc_id"] % 5 == 0]

    NB = 256
    out = (
        dsir_weights(
            rd.from_pandas(df).repartition(7),
            rd.from_pandas(tgt).repartition(3),
            "doc_id",
            "text",
            n_buckets=NB,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def hist(frame):
        vec = np.zeros(NB)
        col = pa.array(frame["text"], pa.string())
        for n in (1, 2):
            ng, _ = flat_ngrams(col, n)
            if len(ng):
                vec += np.bincount(stable_bucket(ng, NB), minlength=NB)
        return vec

    c_raw, c_tgt = hist(df), hist(tgt)
    p_raw = (c_raw + 1.0) / (c_raw.sum() + NB)
    p_tgt = (c_tgt + 1.0) / (c_tgt.sum() + NB)
    lr = np.log(p_tgt) - np.log(p_raw)
    col = pa.array(df["text"], pa.string())
    w = np.zeros(len(df))
    for n in (1, 2):
        ng, ridx = flat_ngrams(col, n)
        np.add.at(w, ridx, lr[stable_bucket(ng, NB)])
    assert np.array_equal(out["log_weight"].to_numpy(), w)
    # target-domain docs must score higher on average than the rest
    sel = out["doc_id"] % 5 == 0
    assert out.loc[sel, "log_weight"].mean() > out.loc[~sel, "log_weight"].mean()


def test_dsir_select_is_deterministic_and_weight_biased(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.ml import dsir_select

    rng = np.random.default_rng(4)
    # two sub-languages: target-ish docs reuse a small vocab, others don't
    a_vocab = ["data", "pipeline", "shuffle", "arrow", "ray"]
    b_vocab = [f"junk{i}" for i in range(200)]
    docs, kinds = [], []
    for i in range(200):
        if i % 2 == 0:
            docs.append(" ".join(rng.choice(a_vocab, 12)))
            kinds.append("a")
        else:
            docs.append(" ".join(rng.choice(b_vocab, 12)))
            kinds.append("b")
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": docs, "kind": kinds})
    raw = rd.from_pandas(df).repartition(5)
    target = rd.from_pandas(df[df["kind"] == "a"].head(30)).repartition(2)
    s1 = dsir_select(raw, target, "doc_id", "text", k=40, seed=9).to_pandas()
    s2 = dsir_select(raw, target, "doc_id", "text", k=40, seed=9).to_pandas()
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])
    picked = df.set_index("doc_id").loc[s1["doc_id"], "kind"]
    assert (picked == "a").mean() > 0.8  # selection follows the weights


def test_quarantine_corrupt_blobs_end_to_end(ray_session, tmp_path):
    """Poison-blob sweep at the PIPELINE level: bit-flipped payloads of
    several encodings flow through extract_spans(quarantine=True) as one
    error row each while the healthy media extract normally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray import legacycodecs as lcod
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.imagecodecs import encode_png_gray, encode_tiff_gray
    from tesseract_recognize_ray.fixtures import render_page
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    rng = np.random.default_rng(13)
    page = render_page(rng, n_regions=1).img
    healthy = {
        "m-png": encode_png_gray(page),
        "m-tiff": encode_tiff_gray([page]),
        "m-gif": lcod.encode_gif_gray(page),
    }
    corrupt = {}
    for name, p in healthy.items():
        c = bytearray(p)
        for i in rng.integers(16, len(c), 25):  # keep magic bytes intact
            c[i] ^= 0xFF
        corrupt[name + "-bad"] = bytes(c)
    media_rows = {**healthy, **corrupt}
    media = pa.table(
        {
            "media_ref": pa.array(list(media_rows), pa.string()),
            "bytes": pa.array(list(media_rows.values()), pa.large_binary()),
            "kind": pa.array(["page"] * len(media_rows), pa.string()),
            "n_pages": pa.array([1] * len(media_rows), pa.int32()),
        }
    )
    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    docs = pa.table(
        {
            "doc_id": pa.array(["d0"], pa.string()),
            "spans": pa.array(
                [[{"kind": "media", "text": None, "media_ref": r, "offset": i}
                  for i, r in enumerate(media_rows)]],
                pa.list_(span_t),
            ),
        }
    )
    mp, dp = str(tmp_path / "media.parquet"), str(tmp_path / "docs.parquet")
    pq.write_table(media, mp)
    pq.write_table(docs, dp)
    out = extract_spans(dp, mp, PipelineConfig(quarantine=True)).to_pandas()
    errs = out[out["kind"] == "error"]
    # corrupted blobs MAY still decode to garbage pixels (bit flips in pixel
    # data are legal rasters) — but every error row must come from a -bad
    # ref, and every healthy ref must produce real text spans
    assert set(errs["media_ref"]) <= set(corrupt)
    ok_text = out[(out["kind"] != "error") & out["text"].notna()]
    for ref in healthy:
        assert (ok_text["media_ref"] == ref).any(), ref
