"""Round-2 late operator additions: latest-row-per-key compaction, cohort
retention, grouped linear regression — each vs a pandas/numpy ground truth
on small in-memory data (the driver contract value-matches them vs DuckDB
at sf0.01; these pin the library semantics on edge cases)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from tesseract_recognize_ray.functions import relational as F
from tesseract_recognize_ray.functions.streams import cohort_retention


def test_keep_latest_ties_and_multiblock(ray_session):
    # user 1: tie on ts -> higher id wins; user 2: single row; rows spread
    # over many blocks so the map-side prune + bucketed reduce both engage.
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 3, 3],
            "ts": pd.to_datetime(["2024-01-02", "2024-01-02", "2024-01-01", "2024-01-05", "2024-03-01", "2024-02-01"]),
            "event_id": [10, 11, 12, 20, 30, 31],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = F.keep_latest(ds, "user_id", ["ts", "event_id"]).to_pandas()
    got = out.sort_values("user_id")[["user_id", "event_id"]].reset_index(drop=True)
    want = pd.DataFrame({"user_id": [1, 2, 3], "event_id": [11, 20, 30]})
    pd.testing.assert_frame_equal(got, want)


def test_cohort_retention_pre_epoch_days(ray_session):
    # one user straddling the epoch: pre-1970 timestamps must floor into the
    # previous day, not truncate toward zero (ADVICE r1 tumbling bug class).
    df = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 8],
            "ts": pd.to_datetime(
                ["1969-12-31 23:00:00", "1970-01-01 01:00:00", "1970-01-03 12:00:00", "1970-01-01 00:00:00"]
            ),
        }
    )
    ds = rd.from_pandas(df).repartition(2)
    out = cohort_retention(ds, "user_id", "ts").to_pandas()
    out = out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
    want = pd.DataFrame(
        {"cohort_day": [-1, -1, -1, 0], "day_offset": [0, 1, 3, 0], "users": [1, 1, 1, 1]}
    )
    pd.testing.assert_frame_equal(out, want.astype({"cohort_day": "int64", "day_offset": "int64", "users": "int64"}))


def test_grouped_regr_matches_numpy(ray_session):
    rng = np.random.default_rng(3)
    x = rng.integers(1, 50, 400)
    y = (x * 37 + rng.integers(-100, 100, 400)).astype("int64")
    g = np.where(x % 2 == 0, "a", "b")
    ds = rd.from_pandas(pd.DataFrame({"g": g, "x": x, "y": y})).repartition(5)
    out = F.grouped_regr(ds, ["g"], "x", "y", round_digits=None).to_pandas().set_index("g")
    for key in ("a", "b"):
        m = g == key
        slope, intercept = np.polyfit(x[m].astype(float), y[m].astype(float), 1)
        assert abs(out.loc[key, "slope"] - slope) < 1e-6
        assert abs(out.loc[key, "intercept"] - intercept) < 1e-6
        assert out.loc[key, "n_rows"] == m.sum()


def test_flat_token_chunks_edges(ray_session):
    import pyarrow as pa

    from tesseract_recognize_ray.functions.textstats import flat_token_chunks

    col = pa.array(["a b c d e", "", "  x  ", None, "p q r"])
    chunks, row_idx, chunk_idx = flat_token_chunks(col, 2)
    assert chunks.to_pylist() == ["a b", "c d", "e", "x", "p q", "r"]
    assert list(row_idx) == [0, 0, 0, 2, 4, 4]
    assert list(chunk_idx) == [0, 1, 2, 0, 0, 1]


def test_chunk_dedup_keeps_first(ray_session):
    from tesseract_recognize_ray.functions.dedup import chunk_dedup

    df = pd.DataFrame(
        {
            "doc_id": [3, 1, 2],
            "text": ["w x y z", "a b c d", "a b c d w x y z"],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = chunk_dedup(ds, "doc_id", "text", n_tokens=4).to_pandas()
    got = set(map(tuple, out[["doc_id", "chunk_idx", "para"]].itertuples(index=False)))
    # 'a b c d' first seen in doc 1; 'w x y z' in doc 2 chunk 1 (doc 2 < doc 3)
    assert got == {(1, 0, "a b c d"), (2, 1, "w x y z")}


def test_bm25_matches_reference_formula(ray_session):
    import math

    from tesseract_recognize_ray.functions.textstats import bm25_top_docs

    docs = {1: "cat dog cat", 2: "dog dog mouse", 3: "bird bird bird bird"}
    ds = rd.from_pandas(pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
    out = bm25_top_docs(ds, "doc_id", "text", ["cat", "dog"], k=3, round_digits=9).to_pandas()
    n, avgdl = 3.0, 10 / 3
    def idf(df):
        return math.log1p((n - df + 0.5) / (df + 0.5))
    def s(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    want = {
        1: idf(1) * s(2, 3) + idf(2) * s(1, 3),
        2: idf(2) * s(2, 3),
    }
    got = dict(zip(out["doc_id"], out["bm25"]))
    assert set(got) == set(want)
    for k_ in want:
        assert abs(got[k_] - want[k_]) < 1e-8


def test_neighbor_jaccard_square_graph(ray_session):
    from tesseract_recognize_ray.functions.graph import neighbor_jaccard

    # square 1-2-3-4-1: opposite corners share BOTH neighbors (jaccard 1.0),
    # adjacent corners share none -> only the two diagonals appear.
    edges = pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 4, 4]})
    out = neighbor_jaccard(rd.from_pandas(edges)).to_pandas()
    got = sorted(map(tuple, out[["src", "dst", "common", "jaccard"]].itertuples(index=False)))
    assert got == [(1, 3, 2, 1.0), (2, 4, 2, 1.0)]


def test_grouped_skew_kurt_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"g": np.repeat(["a", "b"], 300), "v": rng.integers(0, 10_000, 600)}
    )
    out = (
        F.grouped_skew_kurt(rd.from_pandas(df).repartition(4), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    gold = duckdb.sql(
        "SELECT g, CAST(COUNT(*) AS BIGINT) n_rows, ROUND(skewness(v),6) skew,"
        " ROUND(kurtosis(v),6) kurt FROM df GROUP BY g ORDER BY g"
    ).df()
    pd.testing.assert_frame_equal(out, gold)
