"""Round-5 fixes: compactor crash-mid-delete recovery, schema-stable
multi_phrase_match, bool_search term normalization, degenerate-input
guards for the 2-pass exact quantiles."""

import os

import numpy as np
import pandas as pd
import pytest
import ray


# ------------------------------------------------------- compact recovery
def test_compact_plan_finishes_pending_deletes(ray_session, tmp_path):
    """Crash AFTER os.replace but mid-delete: compact-X exists, some
    members survive. A re-run of compact_parquet_dir must delete the
    survivors via compact-X's manifest, NOT regroup them into a new bin
    (which would duplicate their rows in a second compact file)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.state.compact import (
        compact_parquet_dir,
        plan_compaction,
    )

    d = str(tmp_path / "state" / "k=0")
    os.makedirs(d)
    rng = np.random.default_rng(5)
    tables = []
    for i in range(6):
        t = pa.table({"a": rng.integers(0, 100, 25), "b": rng.normal(size=25)})
        pq.write_table(t, os.path.join(d, f"part-{i:04d}.parquet"))
        tables.append(t)
    want = pa.concat_tables(tables).to_pandas().sort_values(["a", "b"])

    compact_parquet_dir(str(tmp_path / "state"), target_bytes=1 << 30)
    (compact_file,) = os.listdir(d)
    assert compact_file.startswith("compact-")

    # simulate the crash: members 1 and 3 come back from the dead
    for i in (1, 3):
        pq.write_table(tables[i], os.path.join(d, f"part-{i:04d}.parquet"))

    # re-running planning must sweep them (manifest-driven) and plan NOTHING
    assert plan_compaction(str(tmp_path / "state")) == []
    assert sorted(os.listdir(d)) == [compact_file]

    got = (
        pq.read_table(os.path.join(d, compact_file))
        .to_pandas()
        .sort_values(["a", "b"])
    )
    pd.testing.assert_frame_equal(
        want.reset_index(drop=True), got.reset_index(drop=True)
    )


def test_compact_manifest_stamped(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.state.compact import (
        _MANIFEST_KEY,
        compact_parquet_dir,
    )

    d = str(tmp_path / "s" / "leaf")
    os.makedirs(d)
    for i in range(3):
        pq.write_table(pa.table({"x": [i]}), os.path.join(d, f"p{i}.parquet"))
    compact_parquet_dir(str(tmp_path / "s"))
    (f,) = os.listdir(d)
    meta = pq.read_schema(os.path.join(d, f)).metadata
    assert meta[_MANIFEST_KEY].decode().split("\n") == [
        "p0.parquet",
        "p1.parquet",
        "p2.parquet",
    ]


# ------------------------------------- multi_phrase_match schema stability
def test_multi_phrase_match_string_ids_zero_hit_batches(ray_session):
    """A batch with zero hits must emit the id column in the id's REAL
    dtype (string here), not a hardcoded int64 — otherwise Arrow schema
    unification across blocks fails downstream."""
    from tesseract_recognize_ray.functions.textstats import multi_phrase_match

    df = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "text": ["nothing here"] * 7 + ["hash join wins"],
        }
    )
    out = multi_phrase_match(
        ray.data.from_pandas(df).repartition(4),
        "doc_id",
        "text",
        ["hash join"],
    ).to_pandas()
    assert out["doc_id"].tolist() == ["d7"]
    assert out["n_hits"].tolist() == [1]


# ---------------------------------------------- bool_search normalization
def test_bool_search_rejects_non_alpha_terms(ray_session):
    from tesseract_recognize_ray.functions.textstats import bool_search

    df = pd.DataFrame({"doc_id": [1], "text": ["hash join"]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="must term"):
        bool_search(ds, "doc_id", "text", must=["hash-join"])
    with pytest.raises(ValueError, match="must_not term"):
        bool_search(ds, "doc_id", "text", must=["hash"], must_not=["don't"])


def test_bool_search_case_normalizes_terms(ray_session):
    from tesseract_recognize_ray.functions.textstats import bool_search

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["Hash wins", "loses"]})
    out = bool_search(
        ray.data.from_pandas(df), "doc_id", "text", must=["HASH"]
    ).to_pandas()
    assert out["doc_id"].tolist() == [1]


# ------------------------------------------- quantile degenerate guards
def test_exact_quantile_2pass_rejects_all_nan(ray_session):
    from tesseract_recognize_ray.functions.sketches import exact_quantile_2pass

    ds = ray.data.from_pandas(pd.DataFrame({"v": [np.nan, np.nan, np.nan]}))
    with pytest.raises(ValueError, match="no non-NaN"):
        exact_quantile_2pass(ds, "v", [0.5])


def test_grouped_exact_quantile_rejects_all_nan(ray_session):
    from tesseract_recognize_ray.functions.sketches import grouped_exact_quantile

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": [1, 2], "v": [np.nan, np.nan]})
    )
    with pytest.raises(ValueError, match="no non-NaN"):
        grouped_exact_quantile(ds, "k", "v", [0.5])


# ------------------------------------------- semantic_dedup straggler cap
def test_semantic_dedup_cap_linear_and_flagged(ray_session):
    """max_cluster_size: (a) cap >= cluster size == exact semantics with
    truncated=False; (b) under a small cap, a dup whose earlier mate ranks
    within the cap is still caught, a pair landing entirely PAST the cap is
    skipped, and the cluster's rows carry truncated=True."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.similarity import semantic_dedup

    rng = np.random.default_rng(55)
    rows = []
    # ids sort lexicographically: v00..v29. v01 duplicates v00 (early pair);
    # v28 duplicates v27 (both past cap 10). All other rows are independent
    # 64-dim gaussians — pairwise near-orthogonal, cosine << 0.9.
    for i in range(30):
        v = rng.normal(size=64)
        rows.append({"vec_id": f"v{i:02d}", "embedding": v.tolist()})
    rows[1]["embedding"] = rows[0]["embedding"]
    rows[28]["embedding"] = rows[27]["embedding"]
    ds = rd.from_items(rows)

    exact = (
        semantic_dedup(ds, "vec_id", "embedding", k=1, iters=1, max_cluster_size=100)
        .to_pandas()
        .set_index("vec_id")
    )
    assert not exact["truncated"].any()
    assert bool(exact.loc["v01", "is_dup"]) and bool(exact.loc["v28", "is_dup"])

    capped = (
        semantic_dedup(ds, "vec_id", "embedding", k=1, iters=1, max_cluster_size=10)
        .to_pandas()
        .set_index("vec_id")
    )
    assert capped["truncated"].all(), "over-cap cluster flags every row"
    assert bool(capped.loc["v01", "is_dup"]), "early pair still caught"
    assert not bool(capped.loc["v28", "is_dup"]), "both-past-cap pair skipped"
    # cap=None keeps the legacy schema (no truncated column)
    legacy = semantic_dedup(ds, "vec_id", "embedding", k=1, iters=1).to_pandas()
    assert "truncated" not in legacy.columns


# --------------------------------------------------------- lance gate
def test_lance_gate_behavior(ray_session, tmp_path):
    """The Lance import gate (BASELINE.json input_hint names Lance; this
    sandbox has no lance package): a .lance path must raise the scoped
    ImportError naming the fallback — never a silent parquet misread — and
    write_spans must fall back to parquet for non-.lance dirs. If a lance
    package IS present (future env), the read path is exercised instead."""
    import importlib.util

    import pyarrow.parquet as pq
    import ray.data as rd

    from tesseract_recognize_ray.sources.io import _read, write_spans

    have_lance = importlib.util.find_spec("lance") is not None
    if have_lance:
        ds = rd.from_items([{"doc_id": "a", "n": 1}])
        out = str(tmp_path / "t.lance")
        ds.write_lance(out)
        got = _read(out, columns=["doc_id"]).take_all()
        assert got == [{"doc_id": "a"}]
    else:
        with pytest.raises(ImportError, match="use parquet"):
            _read(str(tmp_path / "t.lance"))
    # parquet fallback of the sink is gate-independent
    ds = rd.from_items([{"doc_id": "b", "n": 2}])
    out_dir = str(tmp_path / "spans_out")
    write_spans(ds, out_dir)
    assert pq.read_table(out_dir).num_rows == 1


# --------------------------------------------------- integer-exact PCA
def test_pca_power_matches_eigh_on_gapped_spectrum(ray_session):
    """Planted anisotropy: one direction with 10x the variance. The
    integer-exact power iteration's first component must converge to the
    eigh top eigenvalue (rtol covers the 1e-6 quantization grid), and the
    remaining components must stay inside the residual spectrum range."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.similarity import (
        embedding_int_moments,
        pca_power_from_int_moments,
    )

    rng = np.random.default_rng(7)
    d, n = 16, 4000
    mat = rng.normal(size=(n, d)) * 0.1
    mat[:, 3] += rng.normal(size=n) * 1.0  # the gap
    ds = rd.from_pandas(pd.DataFrame({"embedding": list(mat)})).repartition(5)
    cnt, s, sq = embedding_int_moments(ds, "embedding")
    assert cnt == n
    comps = pca_power_from_int_moments(cnt, s, sq, k=4, iters=12)

    cov = np.cov(mat, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(cov)
    lam0 = comps[0][0] / 1e6
    assert abs(lam0 - w[-1]) / w[-1] < 1e-3
    lo, hi = w.min() - 1e-5, w.max() + 1e-5
    for lam, tr in comps:
        assert lo <= lam / 1e6 <= hi
        assert abs(tr / 1e6 - np.trace(cov)) < 1e-3


def test_pca_int_moments_partition_invariant(ray_session):
    """Exact ints commute: the fold must be bit-identical under any
    partitioning (the float-moment path is only approximately so)."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.similarity import embedding_int_moments

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"embedding": list(rng.normal(size=(500, 8)))})
    a = embedding_int_moments(rd.from_pandas(df).repartition(1), "embedding")
    b = embedding_int_moments(rd.from_pandas(df).repartition(13), "embedding")
    assert a == b


def test_iround_matches_duckdb_expression():
    """similarity._iround and the SQL twin (_ir_sql) must agree on signs and
    half-boundaries — the whole PCA replay leans on this one formula."""
    import duckdb

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions.similarity import _iround

    cases = [(7, 2), (-7, 2), (5, 2), (-5, 2), (1, 3), (-1, 3), (0, 5), (10**20 + 1, 3)]
    con = duckdb.connect()
    for num, den in cases:
        sql = entrymod._ir_sql(f"CAST('{num}' AS HUGEINT)", f"CAST('{den}' AS HUGEINT)")
        got = con.sql(f"SELECT {sql} AS r").fetchone()[0]
        assert int(got) == _iround(num, den), (num, den)


# ---------------------------------------------- integer-exact embedding LSH
def _rand_emb_df(n=48, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs[9] = vecs[2] * np.float32(1.7)  # exactly parallel: same LSH bucket
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)})


def test_embedding_near_dup_exact_matches_duckdb(ray_session):
    """The whole point of the exact variant: engine and oracle agree
    bit-for-bit on FRESH random data, not just the blessed testdata."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions import dedup as F_dedup

    df = _rand_emb_df()
    out = (
        F_dedup.embedding_near_dup_pairs_exact(
            rd.from_pandas(df), "vec_id", "embedding", dim=16, n_planes=5
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(df["vec_id"].to_numpy()),
            "embedding": pa.array(
                [list(map(float, v)) for v in df["embedding"]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    gold = (
        con.sql(entrymod._embedding_near_dup_oracle_sql(n_planes=5, dim=16))
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(out) == len(gold) and len(out) >= 1  # the planted pair at least
    pd.testing.assert_frame_equal(
        out.astype("int64"), gold.astype("int64"), check_dtype=False
    )
    planted = out[(out.id_a == 2) & (out.id_b == 9)]
    assert len(planted) == 1 and planted.cos_sq_e12.iloc[0] > 999_999_000_000


def test_embedding_near_dup_exact_partition_invariant(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions import dedup as F_dedup

    df = _rand_emb_df(seed=11)
    def run(parts):
        return (
            F_dedup.embedding_near_dup_pairs_exact(
                rd.from_pandas(df).repartition(parts), "vec_id", "embedding",
                dim=16, n_planes=4,
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(13))


def test_embedding_near_dup_exact_boundary_rational():
    """Pairs exactly ON the cosine^2 = num/den boundary are kept (>=), and
    the float prescreen routes them through the exact Python-int path:
    dot=1, |a|^2=2, |b|^2=1 with num/den = 1/2 is equality."""
    from tesseract_recognize_ray.functions.dedup import _md5_planes

    assert _md5_planes(2, 3).shape == (3, 2)
    # exercise the borderline branch via the module's own arithmetic
    d, na, nb, num, den = 1, 2, 1, 1, 2
    lhs = den * float(d) ** 2
    rhs = num * float(na) * float(nb)
    assert not (lhs >= rhs * (1 + 1e-9))  # prescreen cannot decide
    assert lhs >= rhs * (1 - 1e-9)  # ...so it lands in the border sliver
    assert den * d * d >= num * na * nb  # exact path keeps equality


# ------------------------------------------------ SQL-replayable ANN twins
def _emb_tbl(df):
    import pyarrow as pa

    return pa.table(
        {
            "vec_id": pa.array(df["vec_id"].to_numpy()),
            "embedding": pa.array(
                [list(map(float, v)) for v in df["embedding"]],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_ivf_flat_topk_matches_duckdb_fresh_data(ray_session):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(120, dtype=np.int64),
            "embedding": list(rng.standard_normal((120, 32)).astype(np.float32)),
        }
    )
    q = np.stack(df[df.vec_id < 5]["embedding"].to_numpy()).astype(np.float64)
    out = F_sim.ivf_flat_topk(
        rd.from_pandas(df), "vec_id", "embedding", q, k=10,
        n_centroids=16, iters=2, nprobe=4,
    )
    out = out.rename(columns={"query_idx": "query_id"})  # qids are 0..4 here
    con = duckdb.connect()
    con.register("embeddings", _emb_tbl(df))
    gold = con.sql(entrymod._ann_ivf_flat_oracle_sql()).df().astype("int64")
    key = ["query_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        out[key].sort_values(key).reset_index(drop=True),
        gold[key].sort_values(key).reset_index(drop=True),
    )


def test_pq_adc_topk_matches_duckdb_fresh_data(ray_session):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(100, dtype=np.int64),
            "embedding": list(rng.standard_normal((100, 32)).astype(np.float32)),
        }
    )
    q = np.stack(df[df.vec_id < 5]["embedding"].to_numpy()).astype(np.float64)
    out = F_sim.pq_adc_topk_exact(
        rd.from_pandas(df), "vec_id", "embedding", q, k=10, m=4, ksub=16, iters=2
    ).rename(columns={"query_idx": "query_id"})
    con = duckdb.connect()
    con.register("embeddings", _emb_tbl(df))
    gold = con.sql(entrymod._ann_pq_adc_oracle_sql(dim=32)).df().astype("int64")
    key = ["query_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        out[key].sort_values(key).reset_index(drop=True),
        gold[key].sort_values(key).reset_index(drop=True),
    )


def test_pq_codebooks_exact_partition_invariant(ray_session):
    """Fused multi-subspace training folds exact partials: codebooks must be
    bit-identical under any partitioning."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.similarity import _pq_codebooks_exact

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(90, dtype=np.int64),
            "embedding": list(rng.standard_normal((90, 16))),
        }
    )
    a = _pq_codebooks_exact(
        rd.from_pandas(df).repartition(1), "vec_id", "embedding", m=2, ksub=8, iters=2
    )
    b = _pq_codebooks_exact(
        rd.from_pandas(df).repartition(11), "vec_id", "embedding", m=2, ksub=8, iters=2
    )
    assert np.array_equal(a, b)


# -------------------------------------------------------- DSIR hard top-k
def test_dsir_topk_partition_invariant_and_ranked(ray_session):
    """Integer scores commute: selection must be identical under any
    partitioning, descending by score with id tiebreak."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import ml as F_ml

    rng = np.random.default_rng(8)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 20))) for _ in range(120)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "text": docs,
            "source": ["src0" if i % 3 == 0 else "src5" for i in range(120)],
        }
    )

    def run(parts):
        raw = rd.from_pandas(df).repartition(parts)
        tgt = raw.filter(expr="source == 'src0'")
        return (
            F_ml.dsir_topk(raw, tgt, "doc_id", "text", k=25)
            .to_pandas()
            .reset_index(drop=True)
        )

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(
        a.sort_values(["doc_id"]).reset_index(drop=True),
        b.sort_values(["doc_id"]).reset_index(drop=True),
    )
    assert a["score_e6"].dtype == np.int64
    # selection correctness (not just invariance): the 25 kept docs must be
    # exactly the top-25 of a local recompute of the same integer rule
    import hashlib

    tgt = df[df.source == "src0"]["text"]
    def hist(texts):
        h = np.zeros(4096, dtype=np.int64)
        for t in texts:
            toks = t.split()
            for f in toks + [" ".join(p) for p in zip(toks, toks[1:])]:
                h[int(hashlib.md5(f.encode()).hexdigest()[:16], 16) % 4096] += 1
        return h
    ct, cr = hist(tgt), hist(df["text"])
    w = np.round(
        (np.log(ct + 1.0) - np.log(float(ct.sum()) + 4096)
         - np.log(cr + 1.0) + np.log(float(cr.sum()) + 4096)) * 1e6
    ).astype(np.int64)
    scores = []
    for t in df["text"]:
        toks = t.split()
        s = sum(int(w[int(hashlib.md5(f.encode()).hexdigest()[:16], 16) % 4096])
                for f in toks + [" ".join(p) for p in zip(toks, toks[1:])])
        scores.append(s)
    ref = (
        pd.DataFrame({"doc_id": df["doc_id"], "score_e6": scores})
        .sort_values(["score_e6", "doc_id"], ascending=[False, True])
        .head(25)
    )
    got = a.sort_values(["score_e6", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref.reset_index(drop=True), check_dtype=False)


def test_dsir_topk_unicode_whitespace_matches_oracle(ray_session):
    """The WS_NORM contract: a document with NBSP / EM-space / NEL must
    tokenize identically in the engine (Arrow split_whitespace) and the
    oracle (RE2 '\\s+') — the normalization map closes the gap."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions import ml as F_ml

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "plain ascii words here",
                "nbsp separated tokens",
                "em space and line sep",
                "nel\x85and fs\x1cseparators",
                "tabs\tand\nnewlines stay",
                "target domain words words",
            ],
            "source": ["src0", "src5", "src5", "src5", "src5", "src0"],
        }
    )
    raw = rd.from_pandas(df)
    tgt = raw.filter(expr="source == 'src0'")
    got = (
        F_ml.dsir_topk(raw, tgt, "doc_id", "text", k=6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.register("documents", pa.Table.from_pandas(df))
    gold = (
        con.sql(entrymod._dsir_topk_oracle_sql(k=6))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, gold[got.columns.tolist()])


def test_md5_bucket_matches_duckdb():
    import duckdb

    from tesseract_recognize_ray.functions.ml import _md5_bucket

    strs = np.array(["hello", "hello world", "a", "", "ZETA zeta"], dtype=object)
    got = _md5_bucket(strs, 4096)
    con = duckdb.connect()
    for s, g in zip(strs, got):
        want = con.sql(
            f"SELECT CAST(('0x' || substr(md5('{s}'), 1, 16))::UBIGINT % 4096 AS BIGINT)"
        ).fetchone()[0]
        assert int(want) == int(g), s


# ----------------------------------------------------- integer-exact MMR
def test_mmr_exact_matches_duckdb_fresh_data(ray_session):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(80, dtype=np.int64),
            "embedding": list(rng.standard_normal((80, 24)).astype(np.float32)),
        }
    )
    q = np.asarray(df.loc[df.vec_id == 0, "embedding"].iloc[0], dtype=np.float64)
    out = F_sim.mmr_select_exact(
        rd.from_pandas(df), "vec_id", "embedding", q, k=8, n_candidates=40
    ).astype("int64")
    con = duckdb.connect()
    con.register("embeddings", _emb_tbl(df))
    gold = con.sql(entrymod._mmr_exact_oracle_sql(k=8, n_cand=40)).df().astype("int64")
    pd.testing.assert_frame_equal(
        out.sort_values("rank").reset_index(drop=True),
        gold.sort_values("rank").reset_index(drop=True)[out.columns.tolist()],
    )


def test_mmr_exact_partition_invariant_and_diverse(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(10)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    base[5] = base[3]  # exact duplicate of a relevant doc
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64), "embedding": list(base)})
    q = np.asarray(base[3], dtype=np.float64)

    def run(parts):
        # lambda=0.3: diversity-heavy, so an exact duplicate of the rank-1
        # pick scores 3e6 - 7e6 < 0 and cannot be rank 2 (at 0.7 the dup's
        # 7e6 - 3e6 = 4e6 would legitimately beat every other candidate)
        return F_sim.mmr_select_exact(
            rd.from_pandas(df).repartition(parts), "vec_id", "embedding", q,
            k=6, n_candidates=30, lambda_num=3, lambda_den=10,
        ).astype("int64")

    a, b = run(1), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert a.iloc[0]["vec_id"] == 3  # ties at rel=1e6 break to smaller id
    assert a.iloc[1]["vec_id"] != 5


def test_ivf_pq_exact_matches_duckdb_fresh_data(ray_session):
    import duckdb
    import ray.data as rd

    import __ray_entry__ as entrymod
    from tesseract_recognize_ray.functions import similarity as F_sim

    rng = np.random.default_rng(12)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(110, dtype=np.int64),
            "embedding": list(rng.standard_normal((110, 32)).astype(np.float32)),
        }
    )
    q = np.stack(df[df.vec_id < 5]["embedding"].to_numpy()).astype(np.float64)
    out = F_sim.ivf_pq_topk_exact(
        rd.from_pandas(df), "vec_id", "embedding", q, k=10,
        n_centroids=8, nprobe=3, m=4, ksub=16, iters=2,
    ).rename(columns={"query_idx": "query_id"})
    con = duckdb.connect()
    con.register("embeddings", _emb_tbl(df))
    gold = con.sql(entrymod._ann_ivf_pq_exact_oracle_sql(dim=32)).df().astype("int64")
    key = ["query_id", "vec_id", "rank"]
    pd.testing.assert_frame_equal(
        out[key].sort_values(key).reset_index(drop=True),
        gold[key].sort_values(key).reset_index(drop=True),
    )


# ------------------------------------------- SQL-replayable logreg training
def test_logreg_exact_matches_duckdb_fresh_data(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    import __ray_entry__ as entrymod

    rng = np.random.default_rng(13)
    n = 300
    langs = rng.choice(["en", "de", "fr"], size=n, p=[0.5, 0.25, 0.25])
    texts = []
    for la in langs:
        # plant real signal: en docs are longer and digit-free
        k = rng.integers(20, 40) if la == "en" else rng.integers(3, 15)
        toks = [("word" if la == "en" else "w0rd9") for _ in range(k)]
        texts.append(" ".join(toks))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": langs,
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    got = (
        entrymod._q_doc_quality_logreg_exact_from_df(rd.from_pandas(df).repartition(6))
        .sort_values("feature")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pa.Table.from_pandas(df))
    gold = (
        con.sql(entrymod._logreg_exact_oracle_sql())
        .df()
        .sort_values("feature")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, gold[got.columns.tolist()])
    # the planted signal must be learned: longer docs => en
    coef = dict(zip(got["feature"], got["coef_e6"]))
    assert coef["f_tokens"] > 0 or coef["f_len"] > 0


def test_mmr_exact_negative_cosine_penalty_not_clamped(ray_session):
    """Regression (round-5 review): the diversity penalty is the TRUE max
    over selected cosines, which can be negative — a candidate anti-similar
    to the selected set gets a BONUS (7*rel - 3*negative), exactly as the
    oracle's unclamped GREATEST computes. A zero-clamped max_div would pick
    the other candidate."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import similarity as F_sim

    vecs = np.array(
        [
            [0.6, 0.8, 0.0],     # id 0: rank 1 (highest rel to q)
            [0.58, -0.8146, 0.0],  # id 1: cos to id0 ~ -0.30 -> big bonus
            [0.599, -0.4368, 0.6711],  # id 2: cos to id0 ~ +0.01
        ],
        dtype=np.float64,
    )
    df = pd.DataFrame({"vec_id": np.arange(3, dtype=np.int64), "embedding": list(vecs)})
    out = F_sim.mmr_select_exact(
        rd.from_pandas(df), "vec_id", "embedding", np.array([1.0, 0.0, 0.0]), k=2
    )
    assert list(out["vec_id"]) == [0, 1], out
    # and the emitted score carries the unclamped (negative-penalty) value:
    # 7*rel(id1) - 3*cos(id1,id0) with cos negative => score > 7*rel
    rel1 = int(np.round(1e6 * vecs[1][0] / np.linalg.norm(vecs[1])))
    assert int(out.loc[out.vec_id == 1, "score10_e6"].iloc[0]) > 7 * rel1


# --------------------------------------------- substring dedup APPLIED
def test_remove_duplicate_spans_planted(ray_session):
    """A 6-token passage pasted into two docs must be cut from BOTH (the
    5-gram windows merge into one maximal span), unique text survives, and
    the output is partition-invariant."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import dedup as F_dedup

    boiler = "all rights reserved by the publisher"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                f"alpha beta {boiler} gamma delta",
                f"unrelated words here {boiler} tail tokens",
                "totally unique document three",
                "another unique document four",
            ],
        }
    )

    def run(parts):
        return (
            F_dedup.remove_duplicate_spans(
                rd.from_pandas(df).repartition(parts), "doc_id", "text", k=5
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a = run(1)
    pd.testing.assert_frame_equal(a, run(3))
    assert a.loc[0, "n_removed"] == 6 and a.loc[1, "n_removed"] == 6
    for i in (0, 1):
        assert boiler not in a.loc[i, "clean_text"]
    assert a.loc[0, "clean_text"] == "alpha beta gamma delta"
    assert a.loc[2, "n_removed"] == 0
    assert a.loc[2, "clean_text"] == "totally unique document three"


def test_doc_ngram_novelty_planted(ray_session):
    """Doc 0 owns its trigrams (novelty 1.0); doc 2 repeats doc 0 verbatim
    (novelty 0.0); doc 1 is half boilerplate. Partition-invariant."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import textstats as F_text

    base = "the quick brown fox jumps over the lazy dog"
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [base, f"{base} with fresh novel unique closing words", base],
        }
    )

    def run(parts):
        return (
            F_text.doc_ngram_novelty(
                rd.from_pandas(df).repartition(parts), "doc_id", "text", n=3
            )
            .to_pandas()
            .sort_values("doc_id")
            .set_index("doc_id")
        )

    a = run(1)
    pd.testing.assert_frame_equal(a, run(4))
    assert a.loc[0, "novelty_e6"] == 1_000_000  # every trigram first here
    assert a.loc[2, "novelty_e6"] == 0  # verbatim copy of doc 0
    assert 0 < a.loc[1, "novelty_e6"] < 1_000_000  # half boilerplate
    assert a.loc[1, "n_first"] == a.loc[1, "n_ngrams"] - a.loc[0, "n_ngrams"]


def test_near_dup_dedup_longest_keeps_most_complete(ray_session):
    """Planted near-dup cluster where the LONGEST member has the LARGEST
    id: keep='longest' must keep it (default min_id keeps the smallest),
    and unique docs always survive."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import dedup as F_dedup

    base = (
        "the common boilerplate passage that appears in every mirror copy "
        "of this particular web page with only trivial variations present"
    )
    rng = np.random.default_rng(77)
    uniq = [
        " ".join(rng.choice(list("abcdefghijklmnop"), size=30)) + f" tail{i}"
        for i in range(5)
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                base,                                  # id 0: short copy
                base + " extra",                       # id 1: slightly longer
                base + " extra trailing tokens kept",  # id 2: the longest
            ]
            + uniq,
        }
    )

    def run(keep):
        # multi-block on a tiny corpus: regression for the acero-join
        # empty-partition crash verify_jaccard_pairs_joined used to hit
        return set(
            F_dedup.near_dup_dedup(
                rd.from_pandas(df).repartition(3), "doc_id", "text",
                threshold=0.8, keep=keep,
            )
            .to_pandas()["doc_id"]
            .tolist()
        )

    assert run("min_id") == {0, 3, 4, 5, 6, 7}
    assert run("longest") == {2, 3, 4, 5, 6, 7}
    with pytest.raises(ValueError, match="keep rule"):
        run("best_vibes")
