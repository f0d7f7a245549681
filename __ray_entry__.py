"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline (SURVEY.md §3.1 target
shape) over the deterministic synthetic interleaved corpus (fixtures.py —
BASELINE.json:input_hint shape); ``queries()`` exposes one callable per
implemented operator family from SURVEY.md §2 plus the large-scale
training-data operators (dedup / similarity / text analysis), and
``oracle_sql()`` the DuckDB-equivalent SQL for every SQL-expressible one.

Determinism notes (the driver hashes values order-insensitively, so float
results must be bit-stable across execution orders):
  * monetary doubles in the testdata carry exactly 2 decimals -> sums are
    computed as integer cents (exact in int64/double, associative);
  * counts / mins / maxes are order-independent by construction;
  * ANN ranks are computed in float64 on both sides (numpy vs DuckDB
    ``list_cosine_similarity`` on DOUBLE[]), and only integer ranks are
    emitted, never raw cosines.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from tesseract_recognize_ray.functions import dedup as F_dedup
from tesseract_recognize_ray.functions import relational as F
from tesseract_recognize_ray.functions import similarity as F_sim
from tesseract_recognize_ray.functions import textstats as F_text

# ----------------------------------------------------------------- flagship

_CORPUS_DIR = "/tmp/trr_entry_corpus"
_CORPUS_DOCS = 120


def _corpus() -> dict[str, str]:
    from tesseract_recognize_ray.fixtures import corpus_cached

    return corpus_cached(_CORPUS_DIR, _CORPUS_DOCS)


def _pagexml_cached() -> str:
    """Synthesized (doc_id, xml) PAGE XML table over the entry corpus,
    extracted ONCE and cached — three queries (`rerecognize_xml`,
    `pagexml_orientation_pass`, `rerecognize_inplace`) take PAGE XML as
    their INPUT; re-running the full OCR extract per query was ~60% of
    each entry's wall (breakdown in BASELINE.md round-4 notes). Cache is
    keyed by the corpus dir contract (deterministic fixtures); `rm -rf
    /tmp/trr_*` invalidates both together."""
    import os

    import pyarrow.parquet as pq

    from tesseract_recognize_ray.pagexml import extract_pagexml

    paths = _corpus()
    out = os.path.join(_CORPUS_DIR, "pagexml.parquet")
    if not os.path.exists(out):
        xml = extract_pagexml(paths["docs"], paths["media"]).to_pandas()
        pq.write_table(pa.Table.from_pandas(xml, preserve_index=False), out)
    return out


def entry() -> Any:
    """Flagship pipeline: interleaved docs+media -> ordered span rows
    (decode -> segment -> recognize actor pool -> groupby(doc_id) assemble).
    Driver smoke-checks rows>=0 and a stable schema."""
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = _corpus()
    return extract_spans(paths["docs"], paths["media"], PipelineConfig())


# ------------------------------------------------------------------ queries


def _q_filter_project(sf_dir: str):
    """M-family: predicate filter + column projection, pruned at the read."""
    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])

    def fn(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("l_quantity"), 30.0))
        cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "l_quantity": b.column("l_quantity"),
                "price_cents": cents,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_groupby_pricing(sf_dir: str):
    """G-family: TPC-H-Q1-style grouped aggregation with map-side combine.
    Sums are exact: quantities are integral doubles, prices become int cents."""
    ds = F.load(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "l_quantity": b.column("l_quantity"),
                "price_cents": pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()),
                "disc_cents": pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64()),
            }
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    out = F.grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("l_quantity", "sum", "sum_qty"),
            ("price_cents", "sum", "sum_price_cents"),
            ("disc_cents", "sum", "sum_disc_cents"),
            ("l_quantity", "count", "n_rows"),
        ],
    )
    return out


def _q_topk_orders(sf_dir: str):
    """O-family: global top-k with per-batch local prune (shuffle sees <= k
    rows per block)."""
    ds = F.load(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return F.topk(ds, "o_totalprice", 20, descending=True, tiebreak=["o_orderkey"])


def _q_distinct_flags(sf_dir: str):
    """D-family: multi-column distinct."""
    ds = F.load(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return F.distinct_on(ds, ["l_returnflag", "l_linestatus"])


def _q_semi_join_customers(sf_dir: str):
    """J-family: broadcast semi join (reference J2 pattern) — customers with
    at least one order; order-key set shipped once via ray.put."""
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = F.load(sf_dir, "orders", columns=["o_custkey"])
    return F.broadcast_semi_join(cust, orders, "c_custkey", "o_custkey")


def _q_anti_join_customers(sf_dir: str):
    """J-family: broadcast anti join — customers without any high-value
    (totalprice > 300k) order; the filtered key set is broadcast once."""
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_name"])
    big = F.load(
        sf_dir, "orders", columns=["o_custkey"], filter=pc.field("o_totalprice") > 300000
    )
    return F.broadcast_anti_join(cust, big, "c_custkey", "o_custkey")


def _q_revenue_by_nation(sf_dir: str):
    """J+G: pre-aggregated join + broadcast dim lookup + re-aggregate.
    Revenue and order count fold to one row per custkey BEFORE the join
    (map-side combiner), so the customer join moves |customers| rows, not
    |orders|; a bucket_join co-shuffle co-locates the two aggregates and
    nation names broadcast."""
    orders = F.load(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "price_cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    # reduce_blocks=16 is sized for the BENCH scales (per-custkey partials
    # are a few MB; A/B same-host: 3.0s vs 6.0s without). At a true 100 TB
    # customer domain this knob must grow with |customers| (target ~128 MB
    # of partials per block) or be dropped — see grouped_agg's sizing rule.
    per_cust = F.grouped_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        [("price_cents", "sum", "sum_c"), ("price_cents", "count", "n_c")],
        reduce_blocks=16,
    )
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = F.bucket_join(
        per_cust,
        cust,
        on=("o_custkey",),
        right_on=("c_custkey",),
        left_schema=pa.schema(
            {"o_custkey": pa.int64(), "sum_c": pa.int64(), "n_c": pa.int64()}
        ),
        reduce_blocks=16,
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    joined = F.broadcast_lookup_join(joined, nation, "c_nationkey", "n_nationkey")
    return F.grouped_agg(
        joined,
        ["n_name"],
        [("sum_c", "sum", "revenue_cents"), ("n_c", "sum", "n_orders")],
    )


def _q_window_lag_events(sf_dir: str):
    """J3-style window: per-user lag(value) ordered by (ts, event_id) via
    groupby(user_id).map_groups."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = F.window_lag(ds, "user_id", ["ts", "event_id"], "value", out_col="prev_value")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "value", "prev_value"]]

    return out.map_batches(project, batch_format="pandas")


def _q_event_lead_gap(sf_dir: str):
    """LEAD window (the lag machinery with shift=-1): per-event exact int64
    microseconds until the same user's NEXT event — inter-arrival times, the
    session/traffic-modeling primitive. Each user's last event (no next) is
    dropped so the column stays exact int64 end-to-end."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = F.window_lag(
        ds, "user_id", ["ts", "event_id"], "ts", out_col="next_ts", shift=-1
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        valid = b["next_ts"].notna().to_numpy()
        b = b[valid]
        cur = b["ts"].to_numpy("datetime64[us]").astype("int64")
        nxt = b["next_ts"].to_numpy("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "user_id": b["user_id"].to_numpy(),
                "gap_us": nxt - cur,
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_events_by_type(sf_dir: str):
    """G-family over the event stream: count / exact-cents sum / min / max."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "value": b.column("value"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    return F.grouped_agg(
        ds,
        ["event_type"],
        [
            ("value_cents", "sum", "sum_value_cents"),
            ("value", "min", "min_value"),
            ("value", "max", "max_value"),
            ("value", "count", "n_events"),
        ],
    )


def _q_token_count(sf_dir: str):
    """Text analysis: whitespace token count per document."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_text.token_count(ds, "text")

    def project(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "n_tokens"])

    return out.map_batches(project, batch_format="pyarrow")


def _q_quality_counts(sf_dir: str):
    """Text analysis: exact integer quality signals per document."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    return F_text.quality_counts(ds, "doc_id", "text")


def _q_exact_dedup(sf_dir: str):
    """Dedup: exact content-hash dedup — smallest doc_id per distinct text;
    only (hash, id) pairs cross the shuffle."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    return F_dedup.exact_dedup(ds, "doc_id", "text")


_ANN_K = 10
_ANN_NQ = 5


def _q_ann_brute_force(sf_dir: str):
    """Similarity search: exact cosine top-k (numpy float64 matmul per batch
    against a broadcast query matrix, local prune to k). Emits integer ranks
    only — float cosines never reach the comparator."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    res = F_sim.brute_force_topk(ds, "vec_id", "embedding", queries, k=_ANN_K)
    res["query_id"] = qids[res["query_idx"].to_numpy()]
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_id", "vec_id", "rank"]].astype({"query_id": "int64", "vec_id": "int64", "rank": "int64"})


def _q_ann_ivf(sf_dir: str):
    """Similarity search, scale path: IVF-bucketed approximate top-k (probes
    nprobe nearest centroid cells only). No SQL oracle — approximate by
    design; rows-only check."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    res = F_sim.ivf_topk(ds, "vec_id", "embedding", queries, k=_ANN_K, n_centroids=32, nprobe=16, replicas=2)
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_idx", "vec_id", "rank"]].astype({"query_idx": "int64", "vec_id": "int64", "rank": "int64"})


def _q_ann_ivf_indexed(sf_dir: str):
    """Similarity search against the PERSISTED IVF index: cell assignments
    are computed once per corpus and written as parquet partitioned by cell
    (+ saved centroids); a query reads only its probed cells' partitions.
    No SQL oracle — approximate by design; rows-only check."""
    import os

    from tesseract_recognize_ray.functions.similarity import build_ivf_index, ivf_topk_indexed

    # cache key includes the source file's size+mtime: a regenerated corpus
    # under the same path must NOT silently reuse the old cell assignments
    st = os.stat(f"{sf_dir}/embeddings.parquet")
    idx_dir = (
        f"/tmp/trr_ivf_index_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{st.st_size}_{int(st.st_mtime)}_r2"
    )
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    if not os.path.exists(os.path.join(idx_dir, "centroids.npy")):
        build_ivf_index(ds, "vec_id", "embedding", idx_dir, n_centroids=32, replicas=2)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    res = ivf_topk_indexed(idx_dir, "vec_id", queries, k=_ANN_K, nprobe=16)
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_idx", "vec_id", "rank"]].astype({"query_idx": "int64", "vec_id": "int64", "rank": "int64"})


def _ann_queries(sf_dir: str):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    return np.stack(qdf["embedding"].to_numpy()).astype(np.float64), qdf["vec_id"].to_numpy()


def _q_ann_ivf_flat(sf_dir: str):
    """Similarity search: IVF-Flat L2 top-k whose coarse quantizer follows
    the kmeans_lloyd determinism contract (first-k-by-id seeds, e6-rounded
    means), so the DuckDB oracle replays quantizer training, cell probing
    AND candidate ranking — a VALUE-matched approximate-NN entry. The
    sampled-seed cosine variants (ann_ivf*) remain the recall-tuned scale
    path; this entry pins the reproducible contract."""
    queries, qids = _ann_queries(sf_dir)
    # materialize once: quantizer iterations + scoring re-read the input
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16).materialize()
    res = F_sim.ivf_flat_topk(
        ds, "vec_id", "embedding", queries, k=_ANN_K, n_centroids=16, iters=2, nprobe=4
    )
    res["query_id"] = qids[res["query_idx"].to_numpy()]
    return res[["query_id", "vec_id", "rank"]].astype("int64")


def _ann_ivf_flat_oracle_sql(k: int = 16, iters: int = 2, nprobe: int = 4) -> str:
    return (
        "WITH " + ",\n".join(_kmeans_ctes(k, iters))
        + f""",
qs AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < {_ANN_NQ}),
probe AS (
  SELECT qs.query_id, c.cid FROM qs CROSS JOIN c{iters} c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY qs.query_id
          ORDER BY list_distance(qs.v, c.v), c.cid) <= {nprobe}),
scored AS (
  SELECT p.query_id, a.vec_id,
         ROUND(POWER(list_distance(a.v, qs.v), 2), 6) AS d2r
  FROM probe p JOIN af a ON a.cid = p.cid JOIN qs ON qs.query_id = p.query_id),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2r, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {_ANN_K}"""
    )


def _q_ann_pq_adc(sf_dir: str):
    """Similarity search: product-quantization ADC top-k, SQL-replayable
    end-to-end — per-subspace codebooks trained with the kmeans_lloyd
    determinism contract on the FULL corpus, codes = nearest sub-centroid,
    ADC = ordered per-subspace squared-L2 sum rounded to e6 before ranking.
    The sampled-seed pq variants (ann_pq, ann_ivf_pq*) remain the
    recall-tuned scale path; this entry pins the reproducible contract."""
    queries, qids = _ann_queries(sf_dir)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16).materialize()
    res = F_sim.pq_adc_topk_exact(
        ds, "vec_id", "embedding", queries, k=_ANN_K, m=4, ksub=16, iters=2
    )
    res["query_id"] = qids[res["query_idx"].to_numpy()]
    return res[["query_id", "vec_id", "rank"]].astype("int64")


def _pq_subspace_ctes(s: int, lo: int, hi: int, ksub: int, iters: int) -> list[str]:
    """One subspace's unrolled PQ-codebook training (the _kmeans_ctes idiom
    with a dim slice and _s-suffixed names); ends in af_{s} = (vec_id, v,
    cid) final code assignments and c{iters}_{s} = the final codebook."""
    assign = (
        f"SELECT e.vec_id, e.v, c.cid FROM e{s} e CROSS JOIN {{c}} c "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id "
        "ORDER BY list_distance(e.v, c.v), c.cid) = 1"
    )
    parts = [
        f"e{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e)",
        f"c0_{s} AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v"
        f" FROM e{s} ORDER BY vec_id LIMIT {ksub})",
    ]
    for i in range(iters):
        parts.append(f"a{i}_{s} AS ({assign.format(c=f'c{i}_{s}')})")
        parts.append(
            f"m{i}_{s} AS (SELECT cid, list(val ORDER BY dim) AS v FROM ("
            f"SELECT cid, dim, ROUND(AVG(val), 6) AS val FROM ("
            f"SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a{i}_{s})"
            f" GROUP BY cid, dim) GROUP BY cid)"
        )
        parts.append(
            f"c{i+1}_{s} AS (SELECT c{i}_{s}.cid, COALESCE(m{i}_{s}.v, c{i}_{s}.v) AS v"
            f" FROM c{i}_{s} LEFT JOIN m{i}_{s} ON c{i}_{s}.cid = m{i}_{s}.cid)"
        )
    parts.append(f"af_{s} AS ({assign.format(c=f'c{iters}_{s}')})")
    return parts


def _ann_pq_adc_oracle_sql(m: int = 4, ksub: int = 16, iters: int = 2, dim: int = 64) -> str:
    dsub = dim // m
    parts = ["e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"]
    for s in range(m):
        parts += _pq_subspace_ctes(s, s * dsub + 1, (s + 1) * dsub, ksub, iters)
    parts.append(f"qs AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < {_ANN_NQ})")
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(
            f"dist_{s} AS (SELECT q.query_id, a.vec_id,"
            f" POWER(list_distance(q.v[{lo}:{hi}], c.v), 2) AS d2"
            f" FROM qs q CROSS JOIN af_{s} a JOIN c{iters}_{s} c ON c.cid = a.cid)"
        )
    joins = " ".join(
        f"JOIN dist_{s} d{s} ON d{s}.query_id = d0.query_id AND d{s}.vec_id = d0.vec_id"
        for s in range(1, m)
    )
    total = " + ".join(f"d{s}.d2" for s in range(m))
    return (
        "WITH " + ",\n".join(parts)
        + f""",
adc AS (SELECT d0.query_id, d0.vec_id, ROUND({total}, 6) AS adcr FROM dist_0 d0 {joins}),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adcr, vec_id) AS rank
  FROM adc)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {_ANN_K}"""
    )


def _q_ann_ivf_pq_exact(sf_dir: str):
    """Similarity search: the FULL IVF-PQ path value-matched — deterministic
    coarse quantizer (k=8) + full-corpus PQ codebooks (m=4, ksub=16), probe
    3 cells, ADC-rank candidates; the oracle replays coarse training, PQ
    training, probing, encoding and ranking in one CTE pyramid."""
    queries, qids = _ann_queries(sf_dir)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16).materialize()
    res = F_sim.ivf_pq_topk_exact(
        ds, "vec_id", "embedding", queries, k=_ANN_K,
        n_centroids=8, nprobe=3, m=4, ksub=16, iters=2,
    )
    res["query_id"] = qids[res["query_idx"].to_numpy()]
    return res[["query_id", "vec_id", "rank"]].astype("int64")


def _ann_ivf_pq_exact_oracle_sql(
    n_centroids: int = 8, nprobe: int = 3, m: int = 4, ksub: int = 16,
    iters: int = 2, dim: int = 64,
) -> str:
    dsub = dim // m
    parts = list(_kmeans_ctes(n_centroids, iters))  # e, c0..c{iters}, af
    for s in range(m):
        parts += _pq_subspace_ctes(s, s * dsub + 1, (s + 1) * dsub, ksub, iters)
    parts.append(f"qs AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < {_ANN_NQ})")
    parts.append(
        f"probe AS (SELECT qs.query_id, c.cid FROM qs CROSS JOIN c{iters} c"
        f" QUALIFY ROW_NUMBER() OVER (PARTITION BY qs.query_id"
        f" ORDER BY list_distance(qs.v, c.v), c.cid) <= {nprobe})"
    )
    parts.append(
        "cand AS (SELECT p.query_id, a.vec_id FROM probe p JOIN af a ON a.cid = p.cid)"
    )
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        parts.append(
            f"dist_{s} AS (SELECT cd.query_id, cd.vec_id,"
            f" POWER(list_distance(q.v[{lo}:{hi}], c.v), 2) AS d2"
            f" FROM cand cd JOIN qs q ON q.query_id = cd.query_id"
            f" JOIN af_{s} a ON a.vec_id = cd.vec_id"
            f" JOIN c{iters}_{s} c ON c.cid = a.cid)"
        )
    joins = " ".join(
        f"JOIN dist_{s} d{s} ON d{s}.query_id = d0.query_id AND d{s}.vec_id = d0.vec_id"
        for s in range(1, m)
    )
    total = " + ".join(f"d{s}.d2" for s in range(m))
    return (
        "WITH " + ",\n".join(parts)
        + f""",
adc AS (SELECT d0.query_id, d0.vec_id, ROUND({total}, 6) AS adcr FROM dist_0 d0 {joins}),
r AS (
  SELECT query_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adcr, vec_id) AS rank
  FROM adc)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {_ANN_K}"""
    )


def _q_minhash_pairs(sf_dir: str):
    """Dedup: MinHash-LSH candidate near-duplicate pairs (signatures shuffle,
    never the text). The whole chain is seed-deterministic — char-5-gram FNV
    rolling hash (mod 2^64), 64 universal-hash permutations mod 2^61-1, FNV
    band hashes, bucket pairs, est >= 0.5 — so the DuckDB oracle VALUE-replays
    it end-to-end from the same embedded coefficients (ASCII corpus: SQL
    ascii()/substr() walk the same bytes Python's .encode() hashes).
    bucket_truncated is an operational flag (no bucket exceeds max_bucket at
    driver SF; the exhaustive oracle would expose truncation as missing rows)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    pairs = F_dedup.minhash_lsh_pairs(
        ds, "doc_id", "text", num_perm=64, bands=16, shingle_k=5, min_est=0.5
    )
    df = pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pd.DataFrame(
        {
            "id_a": df["id_a"].astype("int64"),
            "id_b": df["id_b"].astype("int64"),
            "est_jaccard": df["est_jaccard"].astype("float64"),
        }
    )


def _q_near_dup_dedup(sf_dir: str):
    """Dedup composition (the web-corpus chain): MinHash-LSH candidates ->
    exact-Jaccard verify via two hash joins -> connected components ->
    drop every non-canonical cluster member. Seed-deterministic end to end,
    so the DuckDB oracle VALUE-replays the whole chain (minhash CTEs +
    shingle-Jaccard verify + recursive min-label closure); planted-dup
    structure additionally pytest-gated
    (tests/test_graph.py::test_near_dup_dedup_planted_clusters)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    kept = F_dedup.near_dup_dedup(ds, "doc_id", "text", threshold=0.8)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
            }
        )

    return kept.map_batches(project, batch_format="pyarrow")


def _q_near_dup_dedup_longest(sf_dir: str):
    """near_dup_dedup under the curation-grade keep rule: the LONGEST
    cluster member (whitespace tokens DESC, id ASC) survives — preserves
    the most complete copy instead of the arbitrary smallest id. Adds one
    bucketed components-x-token-counts co-shuffle + a per-component window
    rank; the oracle swaps only the final keep CTE."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    kept = F_dedup.near_dup_dedup(ds, "doc_id", "text", threshold=0.8, keep="longest")

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
            }
        )

    return kept.map_batches(project, batch_format="pyarrow")


def _q_simhash(sf_dir: str):
    """Dedup: 64-bit simhash fingerprint per document (hex), md5 token
    hashing so the ENTIRE fingerprint computation (tokenize -> per-token
    64-bit hash -> ±1 bit votes -> sign -> hex) is VALUE-replayed by the
    DuckDB oracle."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    return F_dedup.simhash64(ds, "doc_id", "text", hash_fn="md5")


def _q_fingerprint(sf_dir: str):
    """Text analysis: winnowed rolling-hash document fingerprint (hex),
    md5 token hashing + distinct-set XOR digest so the whole winnowing
    scheme (token hash -> sliding-window minima -> selected-fingerprint
    set -> fold) is VALUE-replayed by the DuckDB oracle."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_text.fingerprint(ds, "text", hash_fn="md5")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["doc_id", "fingerprint"]]

    return out.map_batches(project, batch_format="pandas")


def _q_lang_id(sf_dir: str):
    """Text analysis: stopword/char-profile language ID (stateful actor pool,
    profiles compiled once per actor). Deterministic scoring formula —
    stopword hit 1.0, accent-char presence 0.5, argmax with name-order ties —
    VALUE-replayed by the DuckDB oracle from the same embedded profiles."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_text.lang_id(ds)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["doc_id", "lang_pred"]]

    return out.map_batches(project, batch_format="pandas")


def _q_embedding_near_dup(sf_dir: str):
    """Dedup: embedding-cosine near-duplicate pairs via hyperplane LSH —
    the INTEGER-EXACT variant (md5-derived hyperplanes, fixed-point
    vectors, rational cosine^2 >= 49/400 test), so the DuckDB oracle
    replays bucketization AND verification bit-for-bit. The gaussian-plane
    float twin (embedding_near_dup_pairs) stays the library default; this
    entry pins the reproducible contract."""
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    dim = len(pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"]).iloc[0, 0])
    out = F_dedup.embedding_near_dup_pairs_exact(
        ds, "vec_id", "embedding", dim=dim, n_planes=6,
        threshold_num=49, threshold_den=400,
    )
    df = out.to_pandas()
    if df.empty:  # keep a stable schema even when no pair clears the bar
        df = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "cos_sq_e12": pd.Series(dtype="int64")})
    return df


def _embedding_near_dup_oracle_sql(
    n_planes: int = 6, dim: int = 64, quant: int = 10_000,
    num: int = 49, den: int = 400, cap: int = 256,
) -> str:
    """Bit-exact replay of embedding_near_dup_pairs_exact: every integer in
    the engine (quantized components, md5 planes, dots, squared norms) is
    recomputed here; list_inner_product over values < 2^53 is exact in
    float64, and the overflow-prone dot^2 comparison is done in HUGEINT."""
    return f"""
WITH e AS (
  SELECT vec_id,
         list(CAST(FLOOR(CAST(x AS DOUBLE) * {quant} + 0.5) AS BIGINT) ORDER BY d) AS v
  FROM (
    SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS d
    FROM embeddings) GROUP BY vec_id),
p AS (
  SELECT j, list(w ORDER BY d) AS w FROM (
    SELECT j.j AS j, d.d AS d,
           CAST(('0x' || substr(md5('p' || j.j || ':' || d.d), 1, 16))::UBIGINT % 255 AS BIGINT) - 127 AS w
    FROM range({n_planes}) j(j) CROSS JOIN range({dim}) d(d)) GROUP BY j),
sig AS (
  SELECT vec_id,
         SUM(CASE WHEN list_inner_product(e.v, p.w) > 0 THEN (1::BIGINT << p.j) ELSE 0 END) AS bucket
  FROM e CROSS JOIN p GROUP BY vec_id),
capped AS (
  SELECT s.vec_id, s.bucket, e.v,
         CAST(list_inner_product(e.v, e.v) AS HUGEINT) AS nn
  FROM sig s JOIN e USING (vec_id)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.bucket ORDER BY s.vec_id) <= {cap}),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_inner_product(a.v, b.v) AS HUGEINT) AS dot,
         a.nn AS na, b.nn AS nb
  FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b,
       CAST((dot * dot * 1000000000000) // (na * nb) AS BIGINT) AS cos_sq_e12
FROM pairs WHERE dot > 0 AND {den} * dot * dot >= {num} * na * nb"""


def _q_training_shards(sf_dir: str):
    """Deterministic hash-shuffle shard assignment — the training-data last
    mile: decorrelate document order and fix resumable shard boundaries.
    shard = last md5 hex digit of the doc id (16 shards); pos = rank of the
    full hash within the shard. md5 is used (not the engine's blake2-based
    stable_bucket) because DuckDB exposes the same function, making a hash
    shuffle VALUE-matchable end-to-end; the per-row hashlib loop is the
    documented price of that oracle. Scale shape: hash+shard are map-only;
    in-shard ranks come from the bucketed window exchange."""
    import hashlib

    ds = F.load(sf_dir, "documents", columns=["doc_id"])

    def h(b: pd.DataFrame) -> pd.DataFrame:
        hx = [hashlib.md5(str(int(v)).encode()).hexdigest() for v in b["doc_id"]]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "h": hx,
                "shard": np.array([int(x[-1], 16) for x in hx], dtype=np.int64),
            }
        )

    hashed = ds.map_batches(h, batch_format="pandas")
    out = F.window_row_number(hashed, "shard", ["h", "doc_id"], out_col="pos")
    return out.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "shard": b["shard"].astype("int64"),
                "pos": b["pos"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def _q_source_mix_interleave(sf_dir: str):
    """Deterministic weighted source interleave — training-mixture
    construction: src0/src1 weight 5, src2/src3 weight 3, the rest 1. Each
    doc's mix key is rn x (15 // w) (15 = lcm of the weights, so keys stay
    integers and ties are exact): the merged stream emits 5 src0 docs per 3
    src2 docs per 1 src19 doc, reproducibly. Scale shape: per-source rn via
    the bucketed window exchange; the global mix position via the
    range-partitioned distributed ordinal (no single-node sort)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "source"])
    rn = F.window_row_number(ds, "source", ["doc_id"], out_col="rn")

    def key(b: pd.DataFrame) -> pd.DataFrame:
        w = np.where(
            b["source"].isin(("src0", "src1")), 5, np.where(b["source"].isin(("src2", "src3")), 3, 1)
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "source": b["source"],
                "mix_key": (b["rn"].to_numpy(np.int64) * (15 // w)).astype(np.int64),
            }
        )

    keyed = rn.map_batches(key, batch_format="pandas")
    out = F.global_row_number(keyed, ["mix_key", "source", "doc_id"], out_col="mix_pos")
    return out.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "source": b["source"],
                "mix_pos": b["mix_pos"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )


def _q_dsir_selected_docs(sf_dir: str):
    """DSIR importance resampling (Xie et al. 2023): select 100 raw docs
    whose hashed uni+bigram bags look most like the curated target domain
    (sources src0/src1), via Gumbel-top-k over per-doc importance
    log-weights. Two n_buckets-float histogram passes + a broadcast
    log-ratio vector + one k-row top-k exchange. Hash-based (pandas string
    hash) -> no SQL oracle; weights are pytest-gated bit-exact against a
    naive single-process reference (tests/test_round4.py)."""
    from tesseract_recognize_ray.functions import ml as F_ml

    raw = F.load(sf_dir, "documents", columns=["doc_id", "text", "source"], num_blocks=8)
    target = raw.filter(expr="source == 'src0' or source == 'src1'")
    out = F_ml.dsir_select(raw, target, "doc_id", "text", k=100, seed=7)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "log_weight": np.round(b["log_weight"].to_numpy(np.float64), 6),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


def _q_dsir_topk_docs(sf_dir: str):
    """DSIR hard top-k (deterministic twin of dsir_selected_docs): md5
    feature buckets + e6-quantized integer log-ratio weights + exact integer
    doc scores, so the DuckDB oracle replays histogramming, weighting,
    scoring and selection end-to-end. Target domain = sources src0/src1."""
    from tesseract_recognize_ray.functions import ml as F_ml

    raw = F.load(sf_dir, "documents", columns=["doc_id", "text", "source"], num_blocks=8)
    target = raw.filter(expr="source == 'src0' or source == 'src1'")
    out = F_ml.dsir_topk(raw, target, "doc_id", "text", k=100)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "score_e6": b["score_e6"].astype("int64"),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


def _dsir_topk_oracle_sql(k: int = 100, n_buckets: int = 4096) -> str:
    """Replays dsir_topk verbatim: exotic whitespace normalized to ' '
    first (WS_NORM_RE2 — the shared contract that makes Arrow
    split_whitespace provably equal to RE2 '\\s+' on any input, not just
    ASCII testdata), then the same md5 buckets, the same left-associative
    LN expression e6-rounded, exact integer sums."""
    from tesseract_recognize_ray.functions.ml import WS_NORM_RE2

    return f"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(
             regexp_replace(text, '{WS_NORM_RE2}', ' ', 'g'), '\\s+'), x -> x <> '') AS tl
  FROM documents),
feats AS (
  SELECT doc_id, source, unnest(tl) AS f FROM toks
  UNION ALL
  SELECT doc_id, source, tl[i] || ' ' || tl[i + 1] AS f FROM (
    SELECT doc_id, source, tl, unnest(generate_series(1, len(tl) - 1)) AS i
    FROM toks WHERE len(tl) >= 2)),
bucketed AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(f), 1, 16))::UBIGINT % {n_buckets} AS BIGINT) AS b
  FROM feats),
hist AS (
  SELECT b.b,
         COALESCE(SUM(CASE WHEN x.source IN ('src0', 'src1') THEN 1 ELSE 0 END), 0) AS tc,
         COALESCE(COUNT(x.b), 0) AS rc
  FROM range({n_buckets}) b(b) LEFT JOIN bucketed x ON x.b = b.b
  GROUP BY b.b),
tot AS (SELECT SUM(tc) + {n_buckets} AS bt, SUM(rc) + {n_buckets} AS br FROM hist),
w AS (
  SELECT h.b,
         CAST(ROUND((LN(CAST(h.tc + 1 AS DOUBLE)) - LN(CAST(t.bt AS DOUBLE))
                     - LN(CAST(h.rc + 1 AS DOUBLE)) + LN(CAST(t.br AS DOUBLE))) * 1e6)
              AS BIGINT) AS w
  FROM hist h CROSS JOIN tot t),
scores AS (
  SELECT d.doc_id, COALESCE(SUM(w.w), 0) AS score_e6
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN bucketed x ON x.doc_id = d.doc_id
  LEFT JOIN w ON w.b = x.b
  GROUP BY d.doc_id)
SELECT doc_id, CAST(score_e6 AS BIGINT) AS score_e6
FROM scores ORDER BY score_e6 DESC, doc_id LIMIT {k}"""


def _q_ocr_to_training_corpus(sf_dir: str):
    """END-TO-END integration — scanned media to packed training windows in
    one composition, the full LLM-data path this engine exists for:
      1. flagship extraction (decode -> segment -> recognize actor pool ->
         bucketed per-doc reassembly) over the seeded interleaved corpus;
      2. per-doc text assembly INSIDE the same bucketed exchange shape
         (ordered span concat, text spans + recognized lines);
      3. quality gate (>= 4 whitespace tokens — drop empty/degenerate docs);
      4. MinHash-LSH near-dup removal chain (verify -> components ->
         canonical keep); the assembled text table is materialized once
         (reducer-sized: one row per doc) because the chain consumes it
         three times and Ray has no lineage cache;
      5. concat-and-chunk packing into fixed 64-token training windows.
    Rows-only (OCR + probabilistic dedup upstream); span fidelity, dedup
    structure and packing semantics each have their own gates."""
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.hashing import stable_bucket
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = _corpus()
    spans = extract_spans(paths["docs"], paths["media"], PipelineConfig())

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = stable_bucket(b["doc_id"], 64)
        return b

    def to_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "seq"], kind="mergesort")
        txt = g.groupby("doc_id", sort=True)["text"].apply(
            lambda s: " ".join(x for x in s if isinstance(x, str) and x)
        )
        return txt.rename("text").reset_index()

    docs_txt = (
        spans.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(to_doc, batch_format="pandas")
    )

    def quality_gate(b: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern_regex(b.column("text"), r"\s+"))
        return b.filter(pc.greater_equal(n_tok, 4))

    docs_txt = docs_txt.map_batches(quality_gate, batch_format="pyarrow").materialize()
    kept = F_dedup.near_dup_dedup(docs_txt, "doc_id", "text", threshold=0.8)
    return F_text.pack_sequences(kept, "doc_id", "text", seq_len=64)


def _q_flagship_extract(sf_dir: str):
    """The flagship interleaved-document extraction pipeline on the seeded
    synthetic corpus (testdata has no media payloads; input_hint shape is
    synthesised deterministically — fixtures.py). Rows-only check; full
    span-sequence equality vs the golden oracle is enforced in tests/."""
    paths = _corpus()
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    return extract_spans(paths["docs"], paths["media"], PipelineConfig())


def _q_suppliers_per_region(sf_dir: str):
    """J+G over the remaining dimension tables: supplier ⋈ nation ⋈ region
    (both dims broadcast) -> supplier count + exact acctbal cents per region."""
    supp = F.load(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bal_cents", pc.cast(pc.round(pc.multiply(b.column("s_acctbal"), 100.0)), pa.int64())
        )

    supp = supp.map_batches(to_cents, batch_format="pyarrow")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    joined = F.broadcast_lookup_join(supp, nation, "s_nationkey", "n_nationkey")
    joined = F.broadcast_lookup_join(joined, region, "n_regionkey", "r_regionkey")
    return F.grouped_agg(
        joined,
        ["r_name"],
        [("bal_cents", "sum", "sum_bal_cents"), ("bal_cents", "count", "n_suppliers")],
    )


def _q_parts_by_brand(sf_dir: str):
    """G-family over the part table: count + exact-cents price sum + max size
    per brand."""
    ds = F.load(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "price_cents", pc.cast(pc.round(pc.multiply(b.column("p_retailprice"), 100.0)), pa.int64())
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    return F.grouped_agg(
        ds,
        ["p_brand"],
        [
            ("price_cents", "sum", "sum_price_cents"),
            ("p_size", "max", "max_size"),
            ("p_size", "count", "n_parts"),
        ],
    )


def _q_bpeish_tokens(sf_dir: str):
    """Text analysis: subword-ish token count (letter runs / digit runs /
    single punctuation) per document."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_text.bpeish_token_count(ds, "text")

    def project(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "n_subtokens"])

    return out.map_batches(project, batch_format="pyarrow")


def _q_json_extract_events(sf_dir: str):
    """Scalar op: JSON field extraction from the events props column."""
    ds = F.load(sf_dir, "events", columns=["event_id", "props"])
    return F_text.json_extract_int(ds, "props", "k", "k")


def _q_union_customers(sf_dir: str):
    """Set op: UNION (dedup) of two filtered customer sets — high balance
    union BUILDING segment."""
    rich = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).filter(
        expr="c_acctbal > 7500"
    )
    seg = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    u = rich.select_columns(["c_custkey", "c_name"]).union(seg.select_columns(["c_custkey", "c_name"]))
    return F.distinct_on(u, ["c_custkey", "c_name"])


def _q_user_event_ranks(sf_dir: str):
    """Ranking window family: ROW_NUMBER() per user ordered by (ts,
    event_id) — bucketed cumcount, no per-key dispatch."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = F.window_row_number(ds, "user_id", ["ts", "event_id"], out_col="rn")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "rn": b["rn"].astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_p90_value_by_type(sf_dir: str):
    """Exact discrete p90 per event type (order statistic on exact cents —
    always an actual data value, so the comparison is integer-exact)."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_quantile_disc(
        ds.map_batches(to_cents, batch_format="pyarrow"), "event_type", "value_cents", 0.9, out_col="p90_cents"
    )


def _q_except_customers(sf_dir: str):
    """Set-op family: EXCEPT — BUILDING-segment customers who have no
    order above 300k (distinct left minus right, null-probe anti join)."""
    seg = F.load(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    ).select_columns(["c_custkey"])
    big = F.load(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 300000"
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b.column("o_custkey")})

    return F.except_rows(seg, big.map_batches(rename, batch_format="pyarrow"), ["c_custkey"])


def _q_doc_word_positions(sf_dir: str):
    """flat_map-with-ordinal family (the span-explode shape): one row per
    (doc, word position). Fully vectorized arrow explode — list_flatten for
    the values, list_parent_indices for the doc, and a cumulative-offset
    subtraction for the 1-based position; no per-row Python."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column("text"), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        # position = global index - first global index of the parent list
        offs = np.asarray(toks.offsets)
        pos = np.arange(len(flat), dtype=np.int64) - offs[np.asarray(parent)] + 1
        t = pa.table(
            {
                "doc_id": pc.take(b.column("doc_id"), parent),
                "pos": pa.array(pos),
                "word": flat,
            }
        )
        # whitespace-split of a padded text yields empty edge tokens that a
        # regex word-extractor never produces — drop them to match SQL
        return t.filter(pc.not_equal(t.column("word"), ""))

    return ds.map_batches(explode, batch_format="pyarrow")


def _q_distinct_users_by_type(sf_dir: str):
    """Grouped COUNT(DISTINCT): two-level shape — distinct_on the pair
    (dedupe shuffle moves one row per distinct pair), then a tiny grouped
    count. Never a per-group set on one node."""
    ds = F.load(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = F.distinct_on(ds, ["event_type", "user_id"])
    return F.grouped_agg(pairs, ["event_type"], [("user_id", "count", "n_users")])


def _q_part_name_scalars(sf_dir: str):
    """String scalar family: vectorized upper/substr/length/concat over the
    part names (pyarrow utf8 kernels)."""
    ds = F.load(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])

    def fn(b: pa.Table) -> pa.Table:
        name = b.column("p_name")
        return pa.table(
            {
                "p_partkey": b.column("p_partkey"),
                "name_upper": pc.utf8_upper(name),
                "name_head": pc.utf8_slice_codeunits(name, 0, 8),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "brand_name": pc.binary_join_element_wise(b.column("p_brand"), name, ":"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_events_time_parts(sf_dir: str):
    """Temporal scalar family: vectorized year/month/day/hour extraction
    (pyarrow temporal kernels) from the event timestamps."""
    ds = F.load(sf_dir, "events", columns=["event_id", "ts"])

    def fn(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "y": pc.cast(pc.year(ts), pa.int64()),
                "m": pc.cast(pc.month(ts), pa.int64()),
                "d": pc.cast(pc.day(ts), pa.int64()),
                "h": pc.cast(pc.hour(ts), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_user_event_pivot(sf_dir: str):
    """Pivot / conditional aggregation: per-user event counts spread across
    one column per event type (SUM(CASE WHEN ...)). Combiner-friendly: each
    batch pre-pivots with pandas crosstab, then ONE groupby(user) sums the
    partial counts — the shuffle moves one row per user per block."""
    ds = F.load(sf_dir, "events", columns=["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(b["user_id"], b["event_type"])
        for t in types:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[types].reset_index()
        ct.columns = ["user_id"] + [f"n_{t}" for t in types]
        return ct

    partials = ds.map_batches(partial, batch_format="pandas")
    return F.grouped_agg(
        partials,
        ["user_id"],
        [(f"n_{t}", "sum", f"n_{t}") for t in types],
        combine=False,
    )


def _q_customer_order_counts(sf_dir: str):
    """J-family, LEFT OUTER shape: every customer with their order count and
    exact-cents total — customers with no orders kept at 0. Scale shape:
    pre-aggregate orders per custkey (combiner groupby — one row per key
    reaches the join), then a hash LEFT join against the customer table."""
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = F.load(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "price_cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    per_cust = F.grouped_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        [("price_cents", "sum", "total_cents"), ("price_cents", "count", "n_orders")],
    )
    joined = cust.join(
        per_cust, join_type="left_outer", num_partitions=8, on=("c_custkey",), right_on=("o_custkey",)
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "c_name": b["c_name"],
                "n_orders": pd.to_numeric(b["n_orders"]).fillna(0).astype("int64"),
                "total_cents": pd.to_numeric(b["total_cents"]).fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(project, batch_format="pandas")


def _q_asof_click_value(sf_dir: str):
    """Custom operator: AS-OF join — each event picks the user's most recent
    (ts'<=ts, inclusive) click's exact-cents value; -1 when no prior click.
    Hash-bucketed by user, one vectorized merge_asof per bucket."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])

    def clicks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "click"))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    right = ds.map_batches(clicks, batch_format="pyarrow")
    left = ds.select_columns(["event_id", "user_id", "ts"])
    out = F.asof_join(
        left,
        right,
        "user_id",
        "ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["user_id", "ts", "value_cents"],
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "user_id": b["user_id"].astype("int64"),
                "last_click_cents": pd.to_numeric(b["value_cents"]).fillna(-1).astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


_ROLL_W = 3


def _q_rolling_sum_events(sf_dir: str):
    """Windowed aggregate: per-user rolling sum of the last 3 event values
    (exact cents), ordered by (ts, event_id) — grouped cumsum minus its
    shifted self, fully vectorized per bucket."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_rolling_sum(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "value_cents",
        _ROLL_W,
        out_col="roll_cents",
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "roll_cents"]].astype("int64")

    return out.map_batches(project, batch_format="pandas")


def _q_top_terms(sf_dir: str):
    """Wordcount at scale: global term frequency with a per-batch combiner,
    top 50 by (count desc, token asc)."""
    ds = F.load(sf_dir, "documents", columns=["text"], num_blocks=16)
    counts = F_text.term_counts(ds, "text")
    return F.topk(counts, "n", 50, descending=True, tiebreak=["token"]).select_columns(["token", "n"])


def _q_top_bigrams(sf_dir: str):
    """Bigram wordcount: adjacent whitespace-token pairs per document with a
    per-batch combiner (explode + grouped shift, no per-row loop), top 40 by
    (count desc, bigram asc)."""
    ds = F.load(sf_dir, "documents", columns=["text"], num_blocks=16)
    counts = F_text.bigram_counts(ds, "text")
    return F.topk(counts, "n", 40, descending=True, tiebreak=["bigram"]).select_columns(
        ["bigram", "n"]
    )


def _q_bigram_pmi(sf_dir: str):
    """Collocation mining: pointwise mutual information for every bigram
    with count >= 5 — PMI = ln(n_ab * N_uni^2 / (N_bi * n_a * n_b)) from
    EXACT integer counts (the bigram/unigram wordcount combiners plus two
    driver scalars), rounded to 1e-6. The unigram attach is
    participant-pruned: only the tokens of the surviving hot bigrams are
    pulled (bounded by the min-count filter regardless of vocabulary
    size)."""
    import ray

    from tesseract_recognize_ray.functions.relational import _key_filter

    ds = F.load(sf_dir, "documents", columns=["text"], num_blocks=16)
    big = F_text.bigram_counts(ds, "text").materialize()  # filter + total
    uni = F_text.term_counts(ds, "text").materialize()  # total + pruned attach
    hot = big.filter(expr="n >= 5").to_pandas()
    n_uni = int(uni.sum("n"))
    n_bi = int(big.sum("n"))
    if not len(hot):
        return pd.DataFrame(
            {
                "bigram": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
                "pmi": pd.Series(dtype="float64"),
            }
        )
    parts = hot["bigram"].str.split(" ")
    toks = sorted({t for ab in parts for t in ab})
    flt = _key_filter(uni, "token", ray.put(pa.array(toks)), keep_matches=True).to_pandas()
    cnt = dict(zip(flt["token"], flt["n"]))
    na = parts.str[0].map(cnt).to_numpy(dtype=np.int64)
    nb = parts.str[1].map(cnt).to_numpy(dtype=np.int64)
    num = hot["n"].to_numpy(dtype=np.int64) * n_uni * n_uni
    den = n_bi * na * nb
    pmi = np.round(np.log(num.astype(np.float64) / den.astype(np.float64)), 6)
    return pd.DataFrame(
        {"bigram": hot["bigram"], "n": hot["n"].astype("int64"), "pmi": pmi}
    ).sort_values("bigram").reset_index(drop=True)


def _q_cumsum_user_value(sf_dir: str):
    """Running total window: per-user cumulative sum of exact-cents values
    ordered by (ts, event_id) — SUM OVER (... ROWS UNBOUNDED PRECEDING)."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_cumsum(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "value_cents",
        out_col="cum_cents",
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "cum_cents"]].astype("int64")

    return out.map_batches(project, batch_format="pandas")


_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1998-01-01"


def _q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shaped composition: filter each side at the read, semi-join
    orders against the qualifying customer keys (small side broadcast),
    pre-aggregate lineitem revenue by orderkey BEFORE the join (map-side
    combiner — the join never sees one row per lineitem), hash-join the two
    aggregates, global top-10 with per-batch prune. Revenue is exact:
    cents x (100 - discount_pct) in int64."""
    # every predicate pushed INTO the scans (row-group pruning + pre-
    # materialization filtering; see F.load) — no post-read filter stage
    cutoff = pa.scalar(np.datetime64(_Q3_CUTOFF, "us"), pa.timestamp("us"))
    cust = F.load(
        sf_dir,
        "customer",
        columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == _Q3_SEGMENT,
    )
    orders = F.load(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cutoff,
    )
    orders = F.broadcast_semi_join(orders, cust, "o_custkey", small_key="c_custkey")
    li = F.load(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > cutoff,
    )

    def revenue(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev})

    li_agg = F.grouped_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["l_orderkey"],
        [("rev", "sum", "revenue_u")],
        reduce_blocks=16,
    )
    joined = F.bucket_join(
        li_agg,
        orders.select_columns(["o_orderkey", "o_orderdate"]),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema({"l_orderkey": pa.int64(), "revenue_u": pa.int64()}),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderdate": pa.timestamp("us")}),
        reduce_blocks=16,
    )
    top = F.topk(joined, "revenue_u", 10, descending=True, tiebreak=["l_orderkey"])
    return top.select_columns(["l_orderkey", "revenue_u", "o_orderdate"])


def _q_top3_events_per_user(sf_dir: str):
    """Per-group top-k (QUALIFY row_number <= 3): map-side combiner prunes
    each batch to <= 3 rows per user BEFORE the shuffle, bucketed finish."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.grouped_topk(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id",
        "value_cents",
        3,
        descending=True,
        tiebreak=["event_id"],
    )
    return out.select_columns(["event_id", "user_id", "value_cents"])


_FULL_BAL = 5000.0


def _q_customer_order_full(sf_dir: str):
    """FULL OUTER join: high-balance customers x per-customer order
    aggregates (pre-aggregated build side — the join never sees one row per
    order). Left-only rows (rich customers without orders) and right-only
    rows (order groups whose customer misses the balance filter) both
    survive with COALESCEd fill values."""
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).filter(
        expr=f"c_acctbal > {_FULL_BAL}"
    ).select_columns(["c_custkey", "c_name"])

    orders = F.load(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    agg = F.grouped_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        [("cents", "sum", "total_cents"), ("cents", "count", "n_orders")],
    )
    joined = F.hash_join(
        cust, agg, on=("c_custkey",), right_on=("o_custkey",),
        join_type="full_outer", num_partitions=8,
    )

    def project(b: pa.Table) -> pa.Table:
        # Ray's Dataset.join coalesces the join key into the LEFT column name
        # (right key column is dropped), so c_custkey is non-null on both
        # left-only and right-only rows.
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "custkey": b.column("c_custkey"),
                "c_name": pc.coalesce(b.column("c_name"), pa.scalar("", pa.string())),
                "n_orders": pc.coalesce(pc.cast(b.column("n_orders"), pa.int64()), zero),
                "total_cents": pc.coalesce(pc.cast(b.column("total_cents"), pa.int64()), zero),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def _q_decontaminate_docs(sf_dir: str):
    """Training-data decontamination: flag training docs sharing word
    3-grams with a 'benchmark' split (docs where doc_id % 10 == 7). The
    benchmark 3-gram set is collected once (small side — eval suites are
    MBs at any corpus scale), broadcast via ray.put, and checked per batch
    with one vectorized is_in; no shuffle, text never leaves its task."""
    docs = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)

    def split(keep_bench: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = np.asarray(b.column("doc_id")) % 10 == 7
            return b.filter(pa.array(m if keep_bench else ~m))

        return fn

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    bench_set = F_dedup.collect_ngram_set(bench, "text", n=3)
    return F_dedup.ngram_contamination(train, "doc_id", "text", bench_set, n=3)


def _q_event_deviation(sf_dir: str):
    """Multi-column-key hash join: each event joined back to its
    (user_id, event_type) group aggregate; deviation = n*value - sum stays
    in exact int64 (no float mean)."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    agg = F.grouped_agg(
        cents,
        ["user_id", "event_type"],
        [("value_cents", "sum", "grp_sum"), ("value_cents", "count", "grp_n")],
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["g_user_id", "g_event_type", "grp_sum", "grp_n"])

    joined = F.hash_join(
        cents,
        agg.map_batches(rename, batch_format="pyarrow"),
        on=("user_id", "event_type"),
        right_on=("g_user_id", "g_event_type"),
        num_partitions=8,
    )

    def project(b: pa.Table) -> pa.Table:
        dev = pc.subtract(
            pc.multiply(b.column("grp_n"), b.column("value_cents")), b.column("grp_sum")
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
                "dev_n_cents": pc.cast(dev, pa.int64()),
            }
        )

    return joined.map_batches(project, batch_format="pyarrow")


def _q_user_cooccurrence_clusters(sf_dir: str):
    """Distributed connected components (hash-to-min, functions/graph.py):
    users sharing an exact (event_type, value-cents, day) observation are
    connected; returns every connected user with its cluster id (= min
    user id of the component) and the cluster size. The edge build emits
    star edges per key group (same components as the clique, O(k) edges);
    the oracle recomputes components with a DuckDB recursive CTE."""
    from tesseract_recognize_ray.functions.graph import (
        connected_components,
        group_star_edges,
    )

    ds = F.load(sf_dir, "events", columns=["user_id", "event_type", "value", "ts"])

    def keys(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()), 86_400_000_000)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
                "cents": cents,
                "day": pc.cast(day, pa.int64()),
            }
        )

    keyed = ds.map_batches(keys, batch_format="pyarrow")
    edges = group_star_edges(keyed, ["event_type", "cents", "day"], "user_id")
    comp = connected_components(edges, "src", "dst")
    sizes = F.grouped_agg(comp, ["component"], [("node", "count", "cluster_size")])
    out = F.broadcast_lookup_join(comp, sizes.to_pandas(), "component")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["node"].astype("int64"),
                "cluster_id": b["component"].astype("int64"),
                "cluster_size": b["cluster_size"].astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_shingle_dup_clusters(sf_dir: str):
    """Shingle-based duplicate clustering: documents sharing ANY exact word
    5-gram are edges; connected components (hash-to-min, functions/graph.py)
    give the duplicate clusters. Star edges per gram group keep a hot
    shingle (k docs) at O(k) edges. Grams travel as strings here so the
    DuckDB oracle (positional self-join n-grams + recursive CTE) is exact;
    the 100 TB variant ships hash64(gram) through the shuffle instead."""
    from tesseract_recognize_ray.functions.graph import (
        connected_components,
        group_star_edges,
    )
    from tesseract_recognize_ray.functions.textstats import flat_ngrams

    docs = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def grams(b: pa.Table) -> pa.Table:
        ngrams, row_idx = flat_ngrams(b.column("text"), 5)
        doc = pc.take(b.column("doc_id"), pa.array(row_idx, pa.int64()))
        return pa.table({"doc_id": doc, "gram": ngrams})

    keyed = docs.map_batches(grams, batch_format="pyarrow")
    edges = group_star_edges(keyed, ["gram"], "doc_id")
    comp = connected_components(edges, "src", "dst")
    sizes = F.grouped_agg(comp, ["component"], [("node", "count", "cluster_size")])
    out = F.broadcast_lookup_join(comp, sizes.to_pandas(), "component")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["node"].astype("int64"),
                "cluster_id": b["component"].astype("int64"),
                "cluster_size": b["cluster_size"].astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_pagerank_supplier_parts(sf_dir: str):
    """PageRank (functions/graph.py ``pagerank``: per-iteration edges x
    ranks hash join + combiner groupby(dst) sum; dangling mass folded into
    the scalar base) over the bipartite supplier->part shipment graph: each
    lineitem row is one directed edge l_suppkey -> 1_000_000 + l_partkey
    (parallel edges weight by multiplicity; every part node is dangling,
    exercising the uniform-redistribution path). 5 iterations, damping
    0.85. Ranks are rounded to 8 decimals on BOTH sides so summation-order
    float noise (~1e-15) cannot cross the driver's 9-digit value hash."""
    from tesseract_recognize_ray.functions.graph import pagerank

    ds = F.load(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def edge(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(b.column("l_suppkey"), pa.int64()),
                "dst": pc.add(
                    pa.scalar(1_000_000, pa.int64()),
                    pc.cast(b.column("l_partkey"), pa.int64()),
                ),
            }
        )

    pr = pagerank(ds.map_batches(edge, batch_format="pyarrow"), iters=5)

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b.column("node"),
                "rank": pc.round(b.column("rank"), ndigits=8),
            }
        )

    return pr.map_batches(project, batch_format="pyarrow")


def _pagerank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled power-iteration SQL mirroring ``pagerank`` step for step
    (same association order: base = (1-d)/n + d*dang/n, then + d*in_mass),
    so Ray and DuckDB agree to well within the 8-decimal rounding."""
    parts = [
        """
        WITH edges AS (
          SELECT CAST(l_suppkey AS BIGINT) AS src,
                 CAST(1000000 + l_partkey AS BIGINT) AS dst
          FROM lineitem
        ),
        nodes AS (
          SELECT node, CAST(SUM(deg) AS BIGINT) AS outdeg FROM (
            SELECT src AS node, 1 AS deg FROM edges
            UNION ALL
            SELECT dst AS node, 0 AS deg FROM edges
          ) GROUP BY node
        ),
        p AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        r0 AS (SELECT node, outdeg, 1.0 / (SELECT n FROM p) AS rank FROM nodes)
        """
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
        r{i} AS (
          SELECT nd.node, nd.outdeg,
                 (1 - {damping}) / (SELECT n FROM p)
                 + {damping} * (SELECT COALESCE(SUM(rank) FILTER (WHERE outdeg = 0), 0)
                                FROM r{i - 1}) / (SELECT n FROM p)
                 + {damping} * COALESCE(m.in_mass, 0) AS rank
          FROM nodes nd
          LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank / r.outdeg) AS in_mass
            FROM edges e JOIN r{i - 1} r ON e.src = r.node
            GROUP BY e.dst
          ) m USING (node)
        )"""
        )
    parts.append(f"\nSELECT node, ROUND(rank, 8) AS rank FROM r{iters}")
    return "".join(parts)


def _q_edit_distance_pairs(sf_dir: str):
    """Pairwise edit-distance verify over SQL-expressible candidates: all
    distinct doc pairs sharing a word 5-gram (clique pairs, max_group
    guard), each scored with unit-cost levenshtein (numpy row-DP; exact
    match vs DuckDB's levenshtein())."""
    from tesseract_recognize_ray.functions.graph import group_clique_pairs
    from tesseract_recognize_ray.functions.textstats import flat_ngrams

    docs = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def grams(b: pa.Table) -> pa.Table:
        ngrams, row_idx = flat_ngrams(b.column("text"), 5)
        doc = pc.take(b.column("doc_id"), pa.array(row_idx, pa.int64()))
        return pa.table({"doc_id": doc, "gram": ngrams})

    keyed = docs.map_batches(grams, batch_format="pyarrow")
    pairs = group_clique_pairs(keyed, ["gram"], "doc_id")
    return F_dedup.edit_distance_pairs(pairs, docs, "doc_id", "text")


def _q_trailing_hour_events(sf_dir: str):
    """Time-RANGE window frame (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW): per-user trailing-hour sum + count, exact cents. One
    searchsorted pair per bucket via per-group time rebasing — no per-key
    dispatch (functions/relational.window_range_sum)."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    out = F.window_range_sum(
        cents, "user_id", "ts", "value_cents", 3_600_000_000, "trail_sum_cents", "trail_n"
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "trail_sum_cents", "trail_n"]]

    return out.map_batches(project, batch_format="pandas")


def _q_salted_type_join(sf_dir: str):
    """Skew-resistant salted join (functions/relational.salted_join): events
    (hot key: only a handful of event_type values) joined to the per-type
    sum — the key is salted into 4 sub-keys so one hot type spreads over 4
    shuffle partitions. Output row-identical to the plain SQL join."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    agg = F.grouped_agg(cents, ["event_type"], [("value_cents", "sum", "type_sum_cents")])

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["g_event_type", "type_sum_cents"])

    j = F.salted_join(
        cents.drop_columns(["value_cents"]),
        agg.map_batches(rename, batch_format="pyarrow"),
        on="event_type",
        right_on="g_event_type",
        salt=4,
        # few (type, salt) keys -> keep partitions ≤ key count (an all-empty
        # hash partition arrives schema-less and trips the acero join)
        num_partitions=4,
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "type_sum_cents": b.column("type_sum_cents"),
            }
        )

    return j.map_batches(project, batch_format="pyarrow")


def _q_returned_revenue_by_customer(sf_dir: str):
    """TPC-H-Q10-shaped 4-way composition: returned lineitems (filter at the
    read) -> map-side revenue combiner per orderkey -> hash join orders ->
    re-aggregate per custkey -> hash join customer -> broadcast nation ->
    global top-20. Revenue exact in int64 cent-percent units."""
    li = F.load(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    )

    def revenue(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        rev = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev})

    li_agg = F.grouped_agg(
        li.map_batches(revenue, batch_format="pyarrow"),
        ["l_orderkey"],
        [("rev", "sum", "rev_u")],
    )
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    # Dataset.join here, not bucket_join: with TWO joins chained the acero
    # exchange pipelines across stages and measured best-of-3 5.1s vs 5.8s
    # (bucketed) / 12.6s (bucketed, uncoalesced) at sf0.1
    j1 = F.hash_join(li_agg, orders, on=("l_orderkey",), right_on=("o_orderkey",), num_partitions=8)
    per_cust = F.grouped_agg(j1, ["o_custkey"], [("rev_u", "sum", "revenue_u")])
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    j2 = F.hash_join(per_cust, cust, on=("o_custkey",), right_on=("c_custkey",), num_partitions=8)
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j3 = F.broadcast_lookup_join(j2, nation, "c_nationkey", "n_nationkey")
    # Dataset.join keeps only the LEFT key column -> customer key lives on
    # as o_custkey; rename at the final projection
    top = F.topk(j3, "revenue_u", 20, descending=True, tiebreak=["o_custkey"])

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("o_custkey"),
                "c_name": b.column("c_name"),
                "n_name": b.column("n_name"),
                "revenue_u": b.column("revenue_u"),
            }
        )

    return top.map_batches(project, batch_format="pyarrow")


def _q_regex_extract_docs(sf_dir: str):
    """Vectorized regex extraction: first 'qu[a-z]+' match per document via
    Arrow's RE2 extract_regex kernel (same engine family as DuckDB's
    regexp_extract; no-match maps to '' to mirror DuckDB)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b.column("text"), r"(?P<m>qu[a-z]+)")
        m = pc.fill_null(pc.struct_field(ex, "m"), "")
        return pa.table({"doc_id": b.column("doc_id"), "first_qu": m})

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_events_in_type_windows(sf_dir: str):
    """Big x big interval join (functions/relational.grid_range_join): every
    event matched against every (event_type, day) active window
    [min ts, max ts] containing it — no broadcast; intervals replicate to
    6-hour grid cells, points hash-join on their cell, exact bound filter
    finishes."""
    ev = F.load(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "ts_us": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64()),
                "event_type": b.column("event_type"),
            }
        )

    us = ev.map_batches(to_us, batch_format="pyarrow")

    def with_day(b: pa.Table) -> pa.Table:
        return b.append_column(
            "d", pc.cast(pc.divide(b.column("ts_us"), 86_400_000_000), pa.int64())
        )

    iv = F.grouped_agg(
        us.map_batches(with_day, batch_format="pyarrow"),
        ["event_type", "d"],
        [("ts_us", "min", "lo"), ("ts_us", "max", "hi")],
        reduce_blocks=16,  # (type, day) partials: enum x days, reducer-sized
    )

    def rename_iv(b: pa.Table) -> pa.Table:
        return pa.table(
            {"itype": b.column("event_type"), "d": b.column("d"), "lo": b.column("lo"), "hi": b.column("hi")}
        )

    points = us.drop_columns(["event_type"])
    j = F.grid_range_join(
        points,
        iv.map_batches(rename_iv, batch_format="pyarrow"),
        "ts_us",
        "lo",
        "hi",
        cell=21_600_000_000,
        point_schema=pa.schema({"event_id": pa.int64(), "ts_us": pa.int64()}),
        interval_schema=pa.schema(
            {"itype": pa.string(), "d": pa.int64(), "lo": pa.int64(), "hi": pa.int64()}
        ),
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b.column("event_id"), "itype": b.column("itype"), "d": b.column("d")})

    return j.map_batches(project, batch_format="pyarrow")


def _q_approx_value_quantiles(sf_dir: str):
    """Mergeable histogram quantile sketch (functions/sketches.py): p50/p90/
    p99 of event value within one bin width of exact, moving only bin
    summaries through the shuffle (vs a full sort for exact). The sketch is
    fully DETERMINISTIC — exact extremes, exact integer bin counts (integer
    sums in float64 are exact and order-free), one fixed interpolation —
    so the oracle replays the whole chain in SQL (same float op order:
    w=(hi-lo)/nbins, bin=min(floor((v-lo)/w), nbins-1), first bin with
    cum >= q*total, est = lo + (bin + min(frac,1))*w) and value-matches;
    the error bound stays pytest-gated."""
    from tesseract_recognize_ray.functions.sketches import histogram_quantile_sketch

    ds = F.load(sf_dir, "events", columns=["value"])
    est = histogram_quantile_sketch(ds, "value", [0.5, 0.9, 0.99], nbins=4096)
    return pd.DataFrame({"q": list(est.keys()), "est": list(est.values())})


def _q_normalize_docs(sf_dir: str):
    """Text normalization for training corpora: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace runs, trim — all
    Arrow/RE2 kernels, zero Python per row."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        t = pc.utf8_lower(b.column("text"))
        t = pc.replace_substring_regex(t, r"[^a-z0-9]+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": b.column("doc_id"), "norm_text": t})

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_profile_lineitem(sf_dir: str):
    """One-pass column profiler (the warehouse 'ANALYZE' shape): per numeric
    column min / max / null count / row count via a single combiner
    aggregate — one summary row per column, no per-column rescans."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = F.load(sf_dir, "lineitem", columns=cols)

    def partial(b: pa.Table) -> pa.Table:
        names, mins, maxs, nulls, rows = [], [], [], [], []
        for c in cols:
            col = b.column(c)
            names.append(c)
            mins.append(pc.min(col).as_py())
            maxs.append(pc.max(col).as_py())
            nulls.append(col.null_count)
            rows.append(len(col))
        return pa.table(
            {
                "column": pa.array(names),
                "vmin": pa.array(mins, pa.float64()),
                "vmax": pa.array(maxs, pa.float64()),
                "n_null": pa.array(nulls, pa.int64()),
                "n_rows": pa.array(rows, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return F.grouped_agg(
        partials,
        ["column"],
        [
            ("vmin", "min", "vmin"),
            ("vmax", "max", "vmax"),
            ("n_null", "sum", "n_null"),
            ("n_rows", "sum", "n_rows"),
        ],
        combine=False,
    )


def _q_label_centroids(sf_dir: str):
    """Per-label embedding centroid (functions/similarity.embedding_centroids
    — one partial sum row per key per block), exploded to (label, dim,
    mean*1e6 int) so the float mean compares bit-stably against DuckDB's
    unnest-with-ordinality AVG."""
    ds = F.load(sf_dir, "embeddings", columns=["label", "embedding"])
    cent = F_sim.embedding_centroids(ds, "label", "embedding")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b["centroid"].to_numpy())
        k, dim = mat.shape
        return pd.DataFrame(
            {
                "label": np.repeat(b["label"].to_numpy().astype("int64"), dim),
                "d": np.tile(np.arange(1, dim + 1, dtype="int64"), k),
                "mean_e6": np.round(mat.reshape(-1) * 1e6).astype("int64"),
            }
        )

    return cent.map_batches(explode, batch_format="pandas")


def _q_html_main_content(sf_dir: str):
    """North-rule extraction flavor: HTML boilerplate strip via DOM-walk
    block scoring (functions/html.py — link density, block length,
    class/id + structural-tag hints; boilerpipe/readability model). Each
    document is deterministically wrapped in a synthetic page (nav link
    farms, ads, related-links insets, comments, footer) and the actor-pool
    extractor must recover EXACTLY the planted main content — the oracle is
    the original text column, so the whole parse+classify path is
    value-gated, not rows-only."""
    from tesseract_recognize_ray.functions.html import strip_boilerplate, wrap_in_boilerplate

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def to_html(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "html": [wrap_in_boilerplate(d, t) for d, t in zip(b["doc_id"], b["text"])],
            }
        )

    pages = ds.map_batches(to_html, batch_format="pandas")
    return strip_boilerplate(pages, "html", "main_text", concurrency=(1, 4))


def _q_events_day_ranges(sf_dir: str):
    """Range (interval) join: events against a broadcast daily calendar —
    each event attaches the day bucket whose [start, start+1d) contains its
    ts. The calendar is the canonical small interval side."""
    ds = F.load(sf_dir, "events", columns=["event_id", "ts"])
    days = pd.date_range("2024-01-01", "2024-12-31", freq="D")
    cal = pd.DataFrame(
        {
            "day_start": days,
            "day_end": days + pd.Timedelta(days=1),
            "ymd": (days.year * 10000 + days.month * 100 + days.day).astype("int64"),
        }
    )
    out = F.broadcast_range_join(ds, cal, "ts", "day_start", "day_end")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "ymd"]]

    return out.map_batches(project, batch_format="pandas")


def _q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT: three lineitem measures melted to (key, measure, cents)
    rows — zero-copy id reuse per measure."""
    ds = F.load(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        out = {"l_orderkey": b.column("l_orderkey"), "l_linenumber": b.column("l_linenumber")}
        for c in ("l_quantity", "l_extendedprice", "l_tax"):
            out[c] = pc.cast(pc.round(pc.multiply(b.column(c), 100.0)), pa.int64())
        return pa.table(out)

    return F.unpivot(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_tax"],
        name_col="measure",
        value_col="cents",
    )


def _q_cube_order_stats(sf_dir: str):
    """GROUP BY CUBE over (status, priority): one base scan, 2^k-1 subset
    re-aggregations of the materialized leaf."""
    ds = F.load(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": b.column("o_orderstatus"),
                "o_orderpriority": b.column("o_orderpriority"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    return F.cube_agg(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        [("cents", "sum", "total_cents"), ("cents", "count", "n_orders")],
    )


def _q_region_nation_pairs(sf_dir: str):
    """CROSS JOIN with a broadcast small side (every region x every
    nation)."""
    nation = F.load(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    pairs = F.broadcast_cross_join(nation, region[["r_name"]])
    return pairs.select_columns(["r_name", "n_name"])


def _q_first_last_event_value(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over the whole partition per user, ordered
    by (ts, event_id), exact cents."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_first_last(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "value_cents",
        first_col="first_cents",
        last_col="last_cents",
    )
    return out.select_columns(["event_id", "user_id", "first_cents", "last_cents"])


def _q_event_percent_rank(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per type over exact-cents values (ties
    real: cents collide across events) — exact rational floats."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_percent_rank(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "event_type",
        ["value_cents"],
    )
    return out.select_columns(["event_id", "event_type", "pr", "cd"])


def _q_monthly_revenue(sf_dir: str):
    """Temporal roll-up: exact-cents revenue by calendar month — the group
    key is derived at the read (year*100+month, int64) so the shuffle key
    domain is tiny and pre-aggregation collapses each block to <= n_months
    rows before the groupby."""
    ds = F.load(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def derive(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.timestamp("us"))
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(ts), pa.int64()), pa.scalar(100, pa.int64())),
            pc.cast(pc.month(ts), pa.int64()),
        )
        cents = pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64())
        return pa.table({"ym": ym, "cents": cents})

    return F.grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow"),
        ["ym"],
        [("cents", "sum", "revenue_cents"), ("cents", "count", "n_orders")],
    )


def _q_token_postings(sf_dir: str):
    """Inverted-index build: distinct (token, doc) combiner, bucketed token
    shuffle, ordered posting lists + document frequency."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    return F.inverted_index(ds, "doc_id", "text", min_df=2)


_STRAT_K = 50
_STRAT_A = 48271  # MINSTD multiplier — small enough that id*A fits int64 on both engines
_STRAT_M = 1000000007


def _q_stratified_event_sample(sf_dir: str):
    """Stratified deterministic sampling: exactly min(k, group size) events
    per type, chosen by an arithmetic hash order (reproducible on any
    engine, no RNG state) — per-group top-k machinery with its combiner
    prune, ascending."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type"])

    def add_hash(b: pa.Table) -> pa.Table:
        h = (np.asarray(b.column("event_id")) * _STRAT_A) % _STRAT_M
        return b.append_column("__h", pa.array(h, pa.int64()))

    out = F.grouped_topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        "event_type",
        "__h",
        _STRAT_K,
        descending=False,
        tiebreak=["event_id"],
    )
    return out.select_columns(["event_id", "event_type"])


def _q_corr_qty_discount(sf_dir: str):
    """Per-group Pearson correlation from EXACT int64 moments (combiner
    shuffles six moment values per key per block; bit-stable final float)."""
    ds = F.load(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"])

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "qty": pc.cast(b.column("l_quantity"), pa.int64()),
                "disc_pct": pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_corr(
        ds.map_batches(to_int, batch_format="pyarrow"),
        ["l_returnflag"],
        "qty",
        "disc_pct",
        corr_col="corr_qd",
        covar_col="covar_qd",
    ).select_columns(["l_returnflag", "n_rows", "corr_qd", "covar_qd"])


def _q_mode_priority_by_status(sf_dir: str):
    """Per-group mode with deterministic ties (smallest value among the most
    frequent): grouped count combiner, then per-group top-1 by (n desc,
    value asc) — composition of two existing scale-safe operators."""
    ds = F.load(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    counts = F.grouped_agg(
        ds, ["o_orderstatus", "o_orderpriority"], [("o_orderpriority", "count", "n")]
    )
    top = F.grouped_topk(
        counts, "o_orderstatus", "n", 1, descending=True, tiebreak=["o_orderpriority"]
    )
    return top.select_columns(["o_orderstatus", "o_orderpriority", "n"])


def _q_event_value_quartiles(sf_dir: str):
    """NTILE(4) window: per-type quartile assignment over a totally-ordered
    (value_cents, event_id) sort — numpy tile arithmetic per bucket."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_ntile(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "event_type",
        ["value_cents", "event_id"],
        4,
        out_col="quartile",
    )
    return out.select_columns(["event_id", "event_type", "quartile"])


def _q_median_value_by_type(sf_dir: str):
    """Exact per-group median (bounded key domain — the documented
    partitioning assumption) over exact-cents values."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_median(
        ds.map_batches(to_cents, batch_format="pyarrow"), "event_type", "value_cents", out_col="median_cents"
    )


_SESSION_GAP_S = 3600


def _q_sessionize_events(sf_dir: str):
    """Stream op: per-user gap-based sessionization (new session when the
    gap to the previous event exceeds 1h). Matches SQL's windowed
    lag+cumsum formulation exactly (deterministic integer ids)."""
    from tesseract_recognize_ray.functions import streams as F_st

    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = F_st.sessionize(ds, "user_id", "ts", _SESSION_GAP_S, order_cols=["event_id"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "session_id"]]

    return out.map_batches(project, batch_format="pandas")


def _q_session_stats(sf_dir: str):
    """Composed streaming op: sessionize then aggregate per (user, session)
    — event count and exact-cents value sum per session. One bucketed
    window shuffle + one combiner groupby."""
    from tesseract_recognize_ray.functions import streams as F_st

    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "value_cents", pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())
        ).drop_columns(["value"])

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    sess = F_st.sessionize(ds, "user_id", "ts", _SESSION_GAP_S, order_cols=["event_id"])
    return F.grouped_agg(
        sess,
        ["user_id", "session_id"],
        [("value_cents", "sum", "sum_value_cents"), ("value_cents", "count", "n_events")],
    )


_WINDOW_S = 86400


def _q_tumbling_events(sf_dir: str):
    """Stream op: daily tumbling-window aggregate per event_type (count +
    exact cents sum + min/max — all order-independent)."""
    from tesseract_recognize_ray.functions import streams as F_st

    ds = F.load(sf_dir, "events", columns=["ts", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "value_cents", pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())
        )

    ds = ds.map_batches(to_cents, batch_format="pyarrow")
    out = F_st.tumbling_agg(
        ds,
        "ts",
        _WINDOW_S,
        ["event_type"],
        [
            ("value_cents", "sum", "sum_value_cents"),
            ("value", "min", "min_value"),
            ("value", "count", "n_events"),
        ],
        window_col="window_epoch_s",  # int64 epoch seconds by construction
    )
    return out


def _q_pagexml_extract(sf_dir: str):
    """K1 fidelity sink: one PAGE-2013-07-15 XML document per doc covering
    its media pages (reference's native output format). Rows-only check;
    structural round-trip is tested in tests/test_pagexml.py."""
    from tesseract_recognize_ray.pagexml import extract_pagexml

    paths = _corpus()
    return extract_pagexml(paths["docs"], paths["media"])


def _q_rerecognize_xml(sf_dir: str):
    """§3.2 entry point: PAGE XML input -> region crops -> re-recognition
    (S5 crop + H2 attach, crop-prefixed ids). Rows-only; golden-text
    round-trip is enforced in tests/test_rerecognize.py."""
    import ray.data as rd

    from tesseract_recognize_ray.pipelines.rerecognize import rerecognize_pagexml

    paths = _corpus()
    return rerecognize_pagexml(rd.read_parquet(_pagexml_cached()), paths["media"])


def _q_pagexml_orientation_pass(sf_dir: str):
    """G1 global pass over the extracted PAGE XML: drop the applied
    apply-image-orientation Properties and re-rotate any page whose dominant
    baseline angle buckets to {-90, 90, 180} (reference
    tesseract-recognize.cc:793-814). Rows-only; formula-level assertions in
    tests/test_pagexml.py."""
    import ray.data as rd

    from tesseract_recognize_ray.pagexml import xml_orientation_pass

    return xml_orientation_pass(rd.read_parquet(_pagexml_cached()))


def _q_rerecognize_inplace(sf_dir: str):
    """H2 write-back (--inplace): PAGE XML in -> updated PAGE XML out, with
    re-recognition results attached below each selected TextRegion and all
    untouched elements preserved. Rows-only; the parse-equality round trip
    is enforced in tests/test_rerecognize.py."""
    import ray.data as rd

    from tesseract_recognize_ray.pipelines.rerecognize import rerecognize_inplace

    paths = _corpus()
    return rerecognize_inplace(rd.read_parquet(_pagexml_cached()), paths["media"])


def _q_image_features(sf_dir: str):
    """Multimodal: per-image feature vectors (histogram + ink-profile
    moments) over the synthetic media table, actor-pool stage. Rows-only."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import multimodal as F_mm

    paths = _corpus()
    ds = rd.read_parquet(paths["media"], columns=["media_ref", "bytes", "n_pages"])
    out = F_mm.image_features(ds.filter(expr="n_pages == 1"))

    def project(b):
        import pyarrow.compute as pc_

        n = pc_.list_value_length(b.column("features"))
        return b.select(["media_ref"]).append_column("feat_dim", n)

    return out.map_batches(project, batch_format="pyarrow")


def _q_frame_sample_resize(sf_dir: str):
    """Multimodal: multi-page frame sampling -> nearest-neighbor resize
    (decode plumbing over opaque binary columns). Rows-only."""
    import ray.data as rd

    from tesseract_recognize_ray.functions import multimodal as F_mm

    paths = _corpus()
    ds = rd.read_parquet(paths["media"], columns=["media_ref", "bytes"])
    frames = F_mm.frame_sample(ds, stride=2)

    def rename(b):
        return b.rename_columns(["media_ref", "frame", "bytes"])

    resized = F_mm.image_resize(frames.map_batches(rename, batch_format="pyarrow"), out_h=32, out_w=32)
    return resized.select_columns(["media_ref", "frame", "width", "height"])


def _q_stddev_value_by_type(sf_dir: str):
    """Statistical aggregate family: per-group sample variance/stddev from
    EXACT int64 moments (n, Σx, Σx²) — the combiner shuffles one moment row
    per key per block and the final float64 expression is evaluated once per
    group, so results are bit-identical to the SQL oracle evaluating the
    same expression over the same integers (no float-sum order sensitivity)."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_variance(
        ds.map_batches(to_cents, batch_format="pyarrow"), ["event_type"], "value_cents"
    )


def _q_rollup_suppliers(sf_dir: str):
    """GROUP BY ROLLUP(region, nation): supplier count + exact-cents balance
    at (region, nation), (region), and grand-total levels. The base table is
    scanned once (leaf aggregate); coarser levels re-aggregate the tiny leaf.
    Dimension keys attach via broadcast lookups — no dim-table shuffle."""
    sup = F.load(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bal_cents", pc.cast(pc.round(pc.multiply(b.column("s_acctbal"), 100.0)), pa.int64())
        )

    ds = sup.map_batches(to_cents, batch_format="pyarrow")
    ds = F.broadcast_lookup_join(ds, nation, "s_nationkey", "n_nationkey")
    ds = F.broadcast_lookup_join(ds, region, "n_regionkey", "r_regionkey")
    return F.rollup_agg(
        ds.select_columns(["r_name", "n_name", "bal_cents"]),
        ["r_name", "n_name"],
        [("bal_cents", "sum", "sum_bal_cents"), ("bal_cents", "count", "n_suppliers")],
    )


def _q_intersect_customers(sf_dir: str):
    """Set-op family: INTERSECT — customers both rich (acctbal > 7500) AND
    in the BUILDING segment, on (c_custkey, c_name). Complements the UNION
    and EXCEPT entries; null-safe key equality, deduped-keys-only shuffle."""
    rich = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]).filter(
        expr="c_acctbal > 7500"
    )
    seg = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    return F.intersect_rows(
        rich.select_columns(["c_custkey", "c_name"]),
        seg.select_columns(["c_custkey", "c_name"]),
        ["c_custkey", "c_name"],
    )


_SAMPLE_MULT_OK = 2654435761  # Knuth multiplicative constant
_SAMPLE_MULT_LN = 40503
_SAMPLE_MOD = 1000
_SAMPLE_KEEP = 125  # 12.5% deterministic sample


def _q_sampled_lineitem(sf_dir: str):
    """Deterministic sampling: keep lineitems where
    (l_orderkey·2654435761 + l_linenumber·40503) mod 1000 < 125 — the exact
    predicate the SQL oracle evaluates, so the sample is reproducible across
    engines and partitionings (a seeded-sampling primitive random_sample
    can't give). Zero shuffle."""
    ds = F.load(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    )
    out = F.hash_sample(
        ds,
        [("l_orderkey", _SAMPLE_MULT_OK), ("l_linenumber", _SAMPLE_MULT_LN)],
        _SAMPLE_MOD,
        _SAMPLE_KEEP,
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_linenumber": b.column("l_linenumber"),
                "l_quantity": b.column("l_quantity"),
                "price_cents": pc.cast(
                    pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()
                ),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def _q_redact_customer_names(sf_dir: str):
    """PII-redaction family: mask every digit run in customer names with
    <ID> and count the matches — vectorized RE2 replace/count kernels
    (pyarrow), matching DuckDB's regexp_replace(..., 'g') semantics."""
    ds = F.load(sf_dir, "customer", columns=["c_custkey", "c_name"])
    out = F_text.regex_redact(ds, "c_name", r"[0-9]+", "<ID>", out_col="redacted", count_col="n_ids")
    return out.select_columns(["c_custkey", "redacted", "n_ids"])


_HIST_BIN_W = 5


def _q_quantity_histogram(sf_dir: str):
    """Histogram / binning family: fixed-width bins over l_quantity
    (width 5), count + exact-cents revenue per bin — a computed-key combiner
    groupby, the distributed histogram shape."""
    ds = F.load(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])

    def binify(b: pa.Table) -> pa.Table:
        lo = pc.multiply(
            pc.floor(pc.divide(b.column("l_quantity"), float(_HIST_BIN_W))), float(_HIST_BIN_W)
        )
        return pa.table(
            {
                "bin_lo": pc.cast(lo, pa.int64()),
                "price_cents": pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_agg(
        ds.map_batches(binify, batch_format="pyarrow"),
        ["bin_lo"],
        [("price_cents", "count", "n_items"), ("price_cents", "sum", "sum_price_cents")],
    )


def _q_nations_per_region_agg(sf_dir: str):
    """Ordered string_agg (collect-list family): the comma-joined sorted
    nation names per region. Bounded-group co-location assumption
    (dimension-table shape), documented on the operator."""
    nation = F.load(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    region = pd.read_parquet(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    ds = F.broadcast_lookup_join(nation, region, "n_regionkey", "r_regionkey")
    return F.grouped_string_agg(
        ds.select_columns(["r_name", "n_name"]), "r_name", "n_name", out_col="nations"
    )


def _q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document: token totals,
    distinct tokens, top-token count, duplicate-token fraction — one
    vectorized explode+groupby per batch, zero shuffle."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_text.repetition_stats(ds, "doc_id", "text")
    return out.select_columns(["doc_id", "n_words", "n_distinct", "top_word_n", "dup_frac"])


def _q_p50_cont_value_by_type(sf_dir: str):
    """Interpolated (continuous) per-group median — SQL quantile_cont /
    percentile_cont: the interpolation expression is evaluated in float64
    from exact integer order statistics, bit-matching the oracle."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_quantile_cont(
        ds.map_batches(to_cents, batch_format="pyarrow"), "event_type", "value_cents", 0.5,
        out_col="p50_cents",
    )


def _q_event_value_ranks(sf_dir: str):
    """RANK + DENSE_RANK per event_type ordered by value_cents DESC — gap
    and dense tie-aware ranks in one bucketed window pass (ties are real:
    cents collide within a type)."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_rank(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "event_type",
        ["value_cents"],
        descending=True,
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "event_type": b["event_type"],
                "rnk": b["rnk"].astype("int64"),
                "drnk": b["drnk"].astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


_HOP_WINDOW_S = 7200
_HOP_S = 3600


def _q_hopping_events(sf_dir: str):
    """Hopping-window aggregate (stream family): 2h windows hopping every
    1h — each event lands in 2 overlapping windows via vectorized per-batch
    replication, then one combiner groupby on (window, event_type)."""
    from tesseract_recognize_ray.functions import streams as F_st

    ds = F.load(sf_dir, "events", columns=["ts", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "value_cents", pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())
        )

    return F_st.hopping_agg(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "ts",
        _HOP_WINDOW_S,
        _HOP_S,
        ["event_type"],
        [("value_cents", "sum", "sum_value_cents"), ("value_cents", "count", "n_events")],
        window_col="window_epoch_s",
    )


def _q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id) (p=14, ~0.8% standard
    error): register partials per batch, registers-only shuffle, driver
    folds ≤16384 rows. hash_fn='md5' makes the SKETCH ITSELF the oracle
    target: SQL recomputes registers from md5 prefixes (exact bit-length
    ranks via bin()), replays the estimator arithmetic, and value-matches
    the estimate; tests/test_sketches.py still bounds the error vs the
    exact count."""
    from tesseract_recognize_ray.functions import sketches as F_sk

    ds = F.load(sf_dir, "events", columns=["user_id"])
    n = F_sk.hll_approx_distinct(ds, "user_id", hash_fn="md5")
    return pd.DataFrame({"approx_distinct_users": [n]})


def _q_heavy_hitter_terms(sf_dir: str):
    """Frequent-items sketch (SpaceSaving/Misra-Gries shape): top-20 tokens
    with per-batch top-m counters, m=4096. On this corpus the vocabulary is
    far below m, so no decrement fires and the sketch is EXACT — the oracle
    is the plain wordcount SQL; the error bound (undercount ≤ N/(m+1))
    applies on adversarial vocabularies."""
    from tesseract_recognize_ray.functions import sketches as F_sk

    ds = F.load(sf_dir, "documents", columns=["text"], num_blocks=16)
    return F_sk.frequent_terms(ds, "text", k=20, m=4096)


def _q_clean_corpus(sf_dir: str):
    """Composed cleaning pipeline (the LLM-data shape end-to-end): quality
    gate (≥30 tokens, duplicate-token fraction ≤0.6) → exact dedup keeping
    the smallest doc_id per identical text → surviving (doc_id, n_words).
    One stats pass (zero shuffle) + the dedup's (hash, id) shuffle + a
    broadcast semi-join of the tiny survivor set."""
    from tesseract_recognize_ray.functions import dedup as F_dd

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    stats = F_text.repetition_stats(ds, "doc_id", "text")

    def quality_gate(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("n_words"), 30),
            pc.less_equal(b.column("dup_frac"), 0.6),
        )
        return b.filter(keep)

    kept = stats.map_batches(quality_gate, batch_format="pyarrow")
    survivors = F_dd.exact_dedup(kept, "doc_id", "text")
    out = F.broadcast_semi_join(
        kept.select_columns(["doc_id", "n_words"]), survivors, "doc_id"
    )
    return out


def _q_curated_corpus(sf_dir: str):
    """The full LLM-data curation chain in one pipeline: train split
    (benchmark docs excluded) → quality gate (≥30 tokens, duplicate-token
    fraction ≤0.6) → exact dedup keeping the smallest doc_id → benchmark
    3-gram decontamination (drop any doc sharing a 3-gram with the bench
    split). Stage shuffles: one (hash, id) dedup shuffle; everything else
    is zero-shuffle map_batches with broadcast small sides."""
    from tesseract_recognize_ray.functions import dedup as F_dd

    docs = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)

    def split(keep_bench: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = np.asarray(b.column("doc_id")) % 10 == 7
            return b.filter(pa.array(m if keep_bench else ~m))

        return fn

    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")

    stats = F_text.repetition_stats(train, "doc_id", "text")

    def quality_gate(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("n_words"), 30),
            pc.less_equal(b.column("dup_frac"), 0.6),
        )
        return b.filter(keep)

    kept = stats.map_batches(quality_gate, batch_format="pyarrow")
    dedup_ids = F_dd.exact_dedup(kept, "doc_id", "text")
    survivors = F.broadcast_semi_join(
        kept.select_columns(["doc_id", "n_words", "text"]), dedup_ids, "doc_id"
    )
    bench_set = F_dd.collect_ngram_set(bench, "text", n=5)
    contaminated = F_dd.ngram_contamination(survivors, "doc_id", "text", bench_set, n=5)
    out = F.broadcast_anti_join(
        survivors.select_columns(["doc_id", "n_words"]), contaminated, "doc_id"
    )
    return out


def _q_event_type_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution (nats,
    e6-rounded): counts per (user, type) via ONE combiner groupby, then the
    per-user reduction sums c and c*ln(c) in a second combiner groupby —
    entropy = ln(total) - sum(c ln c)/total, no per-group Python. The
    feature is the standard behavioral-diversity signal for user-quality
    filtering in training-data curation."""
    ds = F.load(sf_dir, "events", columns=["user_id", "event_type"])
    c = F.grouped_agg(ds, ["user_id", "event_type"], [("event_type", "count", "c")])

    def parts(b: pa.Table) -> pa.Table:
        cf = pc.cast(b.column("c"), pa.float64())
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "c": b.column("c"),
                "clnc": pc.multiply(cf, pc.ln(cf)),
            }
        )

    agg = F.grouped_agg(
        c.map_batches(parts, batch_format="pyarrow"),
        ["user_id"],
        [("c", "sum", "tot"), ("clnc", "sum", "slc")],
    )

    def fin(b: pa.Table) -> pa.Table:
        tot = pc.cast(b.column("tot"), pa.float64())
        ent = pc.subtract(pc.ln(tot), pc.divide(b.column("slc"), tot))
        e6 = pc.cast(pc.round(pc.multiply(ent, 1e6)), pa.int64())
        return pa.table({"user_id": b.column("user_id"), "entropy_e6": e6})

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_tfidf_top_terms(sf_dir: str):
    """Per-document TF-IDF top-3 terms. Each document is one row, so term
    frequencies are EXACT per batch (one vectorized pyarrow group_by, no
    shuffle); document frequency is one combiner groupby over the
    (doc, token) rows; N comes from parquet metadata. Scores attach via a
    token-bucketed merge and per-doc top-3 uses the grouped_topk map-side
    prune (<= 3 rows per doc per block enter the shuffle). Ranking uses the
    e6-rounded score on BOTH sides so ln() noise cannot flip a rank."""
    from tesseract_recognize_ray.functions.textstats import _ws_token_lists

    docs = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    n_docs = float(docs.count())

    def tf_partial(b: pa.Table) -> pa.Table:
        lists = _ws_token_lists(b.column("text"))
        flat = lists.flatten()
        off = np.asarray(lists.offsets)
        off = off - off[0]
        row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), np.diff(off))
        tbl = pa.table(
            {
                "doc_id": pc.take(b.column("doc_id"), pa.array(row_idx)),
                "token": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        g = tbl.group_by(["doc_id", "token"]).aggregate([("token", "count")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "token": g.column("token"),
                "tf": pc.cast(g.column("token_count"), pa.int64()),
            }
        )

    tf = docs.map_batches(tf_partial, batch_format="pyarrow").materialize()
    dfreq = F.grouped_agg(tf, ["token"], [("token", "count", "df")])

    # token vocabulary is tiny relative to the corpus (Heaps' law) — attach
    # df by broadcast lookup; a 10^9-token vocabulary would swap this for a
    # token-bucketed merge
    scored = F.broadcast_lookup_join(tf, dfreq.to_pandas(), "token")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        lg = np.log(n_docs / b["df"].to_numpy().astype(np.float64))
        e6 = np.round(b["tf"].to_numpy().astype(np.float64) * lg * 1e6)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "token": b["token"],
                "tfidf_e6": e6.astype("int64"),
            }
        )

    sc = scored.map_batches(score, batch_format="pandas")
    return F.grouped_topk(sc, "doc_id", "tfidf_e6", 3, descending=True, tiebreak=["token"])


def _q_copurchase_triangles(sf_dir: str):
    """Triangle count of the part co-purchase graph (parts are connected
    when some order contains both): edges via per-order clique pairs
    (group_clique_pairs), triangles via degree-oriented wedge matching
    (functions/graph.enumerate_triangles — O(m^1.5) wedge volume, no
    hot-node blowup). The oracle recounts with a 3-way SQL self-join."""
    from tesseract_recognize_ray.functions.graph import (
        enumerate_triangles,
        group_clique_pairs,
    )

    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = group_clique_pairs(ds, ["l_orderkey"], "l_partkey", reduce_blocks=16)
    # clique pairs are already canonical (src < dst) and globally distinct
    n = enumerate_triangles(edges, "src", "dst", assume_simple=True).count()
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


def _q_part_bfs_hops(sf_dir: str):
    """Multi-source BFS hop distance over the thresholded co-purchase graph
    (parts sharing >= 2 orders; seeds = every part with id % 500 == 0 that
    appears on the src side). Level-synchronous frontier expansion
    (functions/graph.bfs_hops): one broadcast-filtered edge scan + one
    combiner groupby(node) min per round, convergence from an O(1) driver
    scalar. The oracle replays it with a DuckDB recursive CTE."""
    from tesseract_recognize_ray.functions.graph import bfs_hops, group_clique_pairs

    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = group_clique_pairs(ds, ["l_orderkey"], "l_partkey", min_count=2, reduce_blocks=16).materialize()

    def seed_filter(b: pa.Table) -> pa.Table:
        # src % 500 == 0 (integer ids are non-negative, so trunc-div is floor)
        keep = pc.equal(
            pc.subtract(b.column("src"), pc.multiply(pc.divide(b.column("src"), 500), 500)), 0
        )
        return b.select(["src"]).filter(keep)

    seeds = F.distinct_on(edges.map_batches(seed_filter, batch_format="pyarrow"), ["src"])
    return bfs_hops(edges, seeds, "src", "dst", max_depth=12)


def _q_funnel_click_purchase(sf_dir: str):
    """Two-step windowed funnel (click -> purchase within 1h, strictly
    later): per user, how many clicks converted and the fastest conversion
    latency. One pre-filtered bucket shuffle + a single searchsorted over
    per-key-rebased times (functions/streams.funnel_conversions) — the SQL
    oracle needs a time-range self-join to say the same thing."""
    from tesseract_recognize_ray.functions.streams import funnel_conversions

    ds = F.load(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_conversions(
        ds, "user_id", "ts", "event_type", "click", "purchase", 3600.0
    )


def _q_event_value_outliers(sf_dir: str):
    """Robust z-score outlier flagging: per event type, median and MAD of
    exact-cents values (two grouped-median passes + broadcast lookups — the
    dimension is one row per type), keep events with
    |v - median| > 3 * MAD. Cents are small exact integers, and medians /
    MADs are exact binary fractions (k/4), so the float comparison is
    deterministic on both sides."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    v = ds.map_batches(to_cents, batch_format="pyarrow").materialize()
    med = F.grouped_median(v, "event_type", "value_cents", out_col="med").to_pandas()
    withmed = F.broadcast_lookup_join(v, med, "event_type")

    def absdev(b: pd.DataFrame) -> pd.DataFrame:
        b["adev"] = (b["value_cents"] - b["med"]).abs()
        return b

    wd = withmed.map_batches(absdev, batch_format="pandas")
    mad = F.grouped_median(
        wd.select_columns(["event_type", "adev"]), "event_type", "adev", out_col="mad"
    ).to_pandas()
    scored = F.broadcast_lookup_join(wd, mad, "event_type")

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["adev"] > 3.0 * b["mad"]
        out = b.loc[keep, ["event_id", "event_type", "value_cents"]]
        out["event_id"] = out["event_id"].astype("int64")
        out["value_cents"] = out["value_cents"].astype("int64")
        return out

    return scored.map_batches(flag, batch_format="pandas")


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_user_type_pivot(sf_dir: str):
    """PIVOT (wide reshape, the inverse of lineitem_unpivot): per user one
    exact-cents column per event type plus the row count. The type taxonomy
    is a fixed known list (a discovery pass would collect distinct types
    first); the reshape itself is ONE conditional-sum combiner groupby —
    no per-type scans, no shuffle per column."""
    ds = F.load(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def widen(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())
        cols = {"user_id": b.column("user_id")}
        for t in _PIVOT_TYPES:
            m = pc.equal(b.column("event_type"), t)
            cols[f"{t}_cents"] = pc.if_else(m, cents, pa.scalar(0, pa.int64()))
        cols["n_events"] = pa.array(np.ones(b.num_rows, dtype=np.int64))
        return pa.table(cols)

    specs = [(f"{t}_cents", "sum", f"{t}_cents") for t in _PIVOT_TYPES]
    specs.append(("n_events", "sum", "n_events"))
    return F.grouped_agg(ds.map_batches(widen, batch_format="pyarrow"), ["user_id"], specs)


_KCORE_K = 90
_KCORE_ROUNDS = 4


def _q_part_kcore(sf_dir: str):
    """Fixed-round k-core peeling (k=90, 4 rounds) of the part co-purchase
    graph: per round one degree groupby + a broadcast-gated edge filter
    (functions/graph.kcore_peel). Mid-cascade by design — the oracle unrolls
    the same four peels as MATERIALIZED CTEs, so both sides must agree on
    the exact intermediate state, not just the fixpoint."""
    from tesseract_recognize_ray.functions.graph import group_clique_pairs, kcore_peel

    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges = group_clique_pairs(ds, ["l_orderkey"], "l_partkey", reduce_blocks=16)
    return kcore_peel(
        edges, "src", "dst", k=_KCORE_K, rounds=_KCORE_ROUNDS, assume_simple=True
    )


_LPA_ROUNDS = 3


def _q_supplier_communities(sf_dir: str):
    """Label-propagation community detection (Raghavan et al. 2007, made
    deterministic: neighbor-label mode, ties to the smallest label) on the
    supplier co-occurrence graph (suppliers sharing an order), 3 synchronous
    rounds. Driver-held label vector below the 4M-edge broadcast gate — one
    shuffle-free Ray job per round; tag-union bucketed merges above it. The
    oracle unrolls the same rounds as MATERIALIZED CTEs."""
    from tesseract_recognize_ray.functions.graph import (
        group_clique_pairs,
        label_propagation,
    )

    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    edges = group_clique_pairs(ds, ["l_orderkey"], "l_suppkey", reduce_blocks=16)
    return label_propagation(edges, "src", "dst", rounds=_LPA_ROUNDS, assume_simple=True)


def _lpa_oracle() -> str:
    parts = [
        """
            WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
            e AS MATERIALIZED (
                SELECT a.l_suppkey AS u, b.l_suppkey AS v
                FROM op a JOIN op b USING (l_orderkey)
                WHERE a.l_suppkey < b.l_suppkey GROUP BY 1, 2
            ),
            und AS MATERIALIZED (
                SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e
            ),
            l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und)"""
    ]
    for r in range(1, _LPA_ROUNDS + 1):
        parts.append(
            f""",
            l{r} AS MATERIALIZED (
                SELECT node, label FROM (
                    SELECT und.a AS node, l.label, COUNT(*) AS c
                    FROM und JOIN l{r - 1} l ON und.b = l.node GROUP BY 1, 2
                ) QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY c DESC, label ASC) = 1
            )"""
        )
    parts.append(f"\n            SELECT node, label AS community FROM l{_LPA_ROUNDS}")
    return "".join(parts)


def _kcore_oracle() -> str:
    parts = [
        """
            WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e0 AS MATERIALIZED (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM op a JOIN op b USING (l_orderkey)
                WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
            )"""
    ]
    for r in range(_KCORE_ROUNDS):
        parts.append(
            f""",
            d{r} AS MATERIALIZED (
                SELECT node, COUNT(*) AS c FROM (
                    SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}
                ) GROUP BY node
            ),
            good{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE c >= {_KCORE_K}),
            e{r + 1} AS MATERIALIZED (
                SELECT e{r}.u, e{r}.v FROM e{r}
                JOIN good{r} gu ON e{r}.u = gu.node
                JOIN good{r} gv ON e{r}.v = gv.node
            )"""
        )
    parts.append(
        f"""
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT u AS node FROM e{_KCORE_ROUNDS}
                UNION ALL SELECT v FROM e{_KCORE_ROUNDS}
            ) GROUP BY node
        """
    )
    return "".join(parts)


def _q_user_hourly_fill(sf_dir: str):
    """Gap-filled per-user hourly resample: one row per user per hour
    between the user's first and last event, exact-cents sum + count with
    zeros in empty hours (functions/streams.time_fill — combiner groupby to
    sparse (user, hour) rows, then vectorized dense-range generation inside
    one key-bucket shuffle). SQL needs generate_series + LEFT JOIN."""
    from tesseract_recognize_ray.functions.streams import time_fill

    ds = F.load(sf_dir, "events", columns=["user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = time_fill(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id",
        "ts",
        "value_cents",
        3600.0,
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        # Dataset.rename_columns breaks on pandas-format blocks (Ray 2.49)
        return b.rename(columns={"val_sum": "cents", "win": "hour_win"})

    return out.map_batches(project, batch_format="pandas")


def _q_latest_event_per_user(sf_dir: str):
    """Latest-row-per-key compaction: the current state of every user from
    the event log — ROW_NUMBER() = 1 by (ts, event_id) desc, with a map-side
    one-row-per-key-per-block prune before the bucketed shuffle."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    out = F.keep_latest(ds, "user_id", ["ts", "event_id"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["user_id", "event_id", "ts", "event_type", "value"]]

    return out.map_batches(project, batch_format="pandas")


def _q_cohort_retention(sf_dir: str):
    """Cohort retention matrix: users bucketed by first active day, counted
    at each day offset they return on (distinct-activity combiner -> per-user
    min -> hash join back -> tiny counting groupby)."""
    from tesseract_recognize_ray.functions.streams import cohort_retention

    ds = F.load(sf_dir, "events", columns=["user_id", "ts"])
    return cohort_retention(ds, "user_id", "ts")


def _q_regr_price_by_qty(sf_dir: str):
    """Per-group simple linear regression (regr_slope / regr_intercept) of
    exact price cents against quantity, from exact int64 moments."""
    ds = F.load(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "qty": pc.cast(b.column("l_quantity"), pa.int64()),
                "price_cents": pc.cast(
                    pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()
                ),
            }
        )

    return F.grouped_regr(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag"],
        "qty",
        "price_cents",
    )


def _q_paragraph_dedup(sf_dir: str):
    """Paragraph-level exact dedup over 20-token chunks: first occurrence of
    each distinct chunk corpus-wide survives (packed-position Min after a
    per-block distinct-chunk combiner)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    return F_dedup.chunk_dedup(ds, "doc_id", "text", n_tokens=20)


def _q_top_terms_by_lang(sf_dir: str):
    """Per-language top-5 terms: grouped wordcount with a vectorized
    (group, token) pair combiner, then per-group top-k with the map-side
    k-row prune."""
    ds = F.load(sf_dir, "documents", columns=["lang", "text"], num_blocks=16)
    counts = F_text.grouped_term_counts(ds, "lang", "text")
    return F.grouped_topk(counts, "lang", "n", 5, descending=True, tiebreak=["token"])


_BM25_TERMS = ["query", "table", "spark", "window"]


def _q_bm25_top_docs(sf_dir: str):
    """BM25 relevance top-20 for a fixed query-term set: compact per-doc
    stats pass (materialized — ints only, never the text), one driver
    aggregate for N/avgdl/df, numpy scoring pass with per-block top-k prune."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    return F_text.bm25_top_docs(ds, "doc_id", "text", _BM25_TERMS, k=20)


def _q_part_neighbor_jaccard(sf_dir: str):
    """Link prediction on the thresholded co-purchase graph (parts sharing
    >= 2 orders): common-neighbor counts via wedge-center clique pairs,
    Jaccard overlap from broadcast degrees, top 100."""
    from tesseract_recognize_ray.functions.graph import group_clique_pairs, neighbor_jaccard

    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    # reduce_blocks=16: the post-combiner pair stream of a >=2-thresholded
    # order-basket graph is MBs, and Ray's sort exchange is ~5x faster on
    # 16 coalesced blocks than on the read's 64 (see grouped_agg docstring)
    edges = group_clique_pairs(ds, ["l_orderkey"], "l_partkey", min_count=2, reduce_blocks=16)
    sim = neighbor_jaccard(edges, reduce_blocks=16)
    return F.topk(sim, "jaccard", 100, descending=True, tiebreak=["src", "dst"])


def _q_skew_value_by_type(sf_dir: str):
    """Per-group sample skewness + excess kurtosis of exact cents (two-pass:
    exact int means, centered float64 moments)."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_skew_kurt(
        ds.map_batches(to_cents, batch_format="pyarrow"), "event_type", "cents"
    )


def _q_image_phash_dups(sf_dir: str):
    """Multimodal: perceptual-duplicate image groups (64-bit aHash equality)
    over the synthetic media table — only (id, phash) pairs shuffle, pixels
    stay inside the hashing actors. Rows-only."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.multimodal import phash_dups

    paths = _corpus()
    ds = rd.read_parquet(paths["media"], columns=["media_ref", "bytes", "n_pages"]).filter(
        expr="n_pages == 1"
    )
    out = phash_dups(ds, "media_ref")
    return out.to_pandas().sort_values(["phash", "media_ref"]).reset_index(drop=True)


def _q_order_flags_by_customer(sf_dir: str):
    """Grouped boolean aggregates (SQL bool_or / bool_and) — any/all are
    their own mergeable partials in grouped_agg's combiner path."""
    ds = F.load(sf_dir, "orders", columns=["o_custkey", "o_orderstatus", "o_totalprice"])

    def flags(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "is_f": pc.equal(b.column("o_orderstatus"), "F"),
                "big": pc.greater(b.column("o_totalprice"), 1000.0),
            }
        )

    return F.grouped_agg(
        ds.map_batches(flags, batch_format="pyarrow"),
        ["o_custkey"],
        [("is_f", "any", "any_f"), ("big", "all", "all_big"), ("is_f", "count", "n_orders")],
    )


def _q_user_activity_islands(sf_dir: str):
    """Gaps-and-islands over variable-length intervals: each event spans
    [ts, ts + value seconds]; overlapping/touching intervals per user merge
    into islands (running-cummax semantics — a long interval absorbs later
    short ones, which constant-gap sessionize cannot express)."""
    from tesseract_recognize_ray.functions.streams import interval_merge

    ds = F.load(sf_dir, "events", columns=["user_id", "ts", "value"])

    def to_iv(b: pa.Table) -> pa.Table:
        s = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        dur = pc.cast(pc.round(pc.multiply(b.column("value"), 1_000_000.0)), pa.int64())
        return pa.table({"user_id": b.column("user_id"), "s": s, "e": pc.add(s, dur)})

    out = interval_merge(ds.map_batches(to_iv, batch_format="pyarrow"), "user_id", "s", "e")
    return out


def _q_weighted_doc_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): u from a fixed integer hash of doc_id, key = u^(1/w)
    with w = n_chars, global top-100 by key — the quality/length-weighted
    corpus sampling primitive, reproducible run-to-run and in SQL."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def add_key(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
        u = ((d * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        k = u ** (1.0 / w)
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_chars": b.column("n_chars"), "k": pa.array(k)}
        )

    out = F.topk(
        ds.map_batches(add_key, batch_format="pyarrow"), "k", 100, descending=True, tiebreak=["doc_id"]
    )
    return out.drop_columns(["k"])


def _q_event_transitions(sf_dir: str):
    """Markov transition matrix of per-user event sequences (the sequence-
    modeling prep step): count (from_type, to_type) over consecutive events
    per user ordered by (ts, event_id) — one bucketed lag shuffle + one
    combiner groupby; the first event of each user has no predecessor."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    lag = F.window_lag(ds, "user_id", ["ts", "event_id"], "event_type", out_col="from_type")

    def project(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["from_type"].notna()]
        return pd.DataFrame({"from_type": b["from_type"], "to_type": b["event_type"]})

    return F.grouped_agg(
        lag.map_batches(project, batch_format="pandas"),
        ["from_type", "to_type"],
        [("to_type", "count", "n")],
    )


def _q_balanced_doc_sample(sf_dir: str):
    """Domain-rebalancing sampler (DoReMi-lite): deterministic A-ES draw of
    200 docs with per-doc weight 1/|source group|, so every `source` domain
    gets equal expected representation regardless of its corpus share. The
    A-ES key is compared in log-space — k = n_source * log10(u) with u from
    the fixed integer hash of doc_id — a monotone transform of u^(1/w) that
    cannot underflow for huge groups. Group sizes are a tiny groupby
    broadcast to every task; SQL replays via a join + the same expression."""
    import ray

    ds = F.load(sf_dir, "documents", columns=["doc_id", "source"])
    counts = F.grouped_agg(ds, ["source"], [("doc_id", "count", "n")]).to_pandas()
    cmap_ref = ray.put(dict(zip(counts["source"], counts["n"].astype(np.int64))))

    def add_key(b: pa.Table) -> pa.Table:
        cmap = ray.get(cmap_ref)
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = pd.Series(b.column("source").to_pandas()).map(cmap).to_numpy(np.float64)
        u = ((d * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        k = n * np.log10(u)
        return pa.table(
            {"doc_id": b.column("doc_id"), "source": b.column("source"), "k": pa.array(k)}
        )

    out = F.topk(
        ds.map_batches(add_key, batch_format="pyarrow"), "k", 200, descending=True, tiebreak=["doc_id"]
    )
    return out.drop_columns(["k"])


def _q_event_global_ordinals(sf_dir: str):
    """Distributed zipWithIndex: the 1-based global ordinal of every event
    under ORDER BY (ts, event_id) via sampled range partitioning + broadcast
    prefix offsets — no single-node sort, no driver data materialization."""
    ds = F.load(sf_dir, "events", columns=["event_id", "ts"])
    out = F.global_row_number(ds, ["ts", "event_id"], out_col="ordinal")
    return out.drop_columns(["ts"])


def _q_event_value_deciles(sf_dir: str):
    """GLOBAL NTILE(10) (equal-frequency binning over the whole table, the
    feature-binning prep step): exact SQL NTILE semantics — first n%10
    buckets one row larger — computed from the distributed global ordinal
    (sampled range partitioning + broadcast prefix offsets; no single-node
    sort) and the O(1) total count."""
    ds = F.load(sf_dir, "events", columns=["event_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    # materialize the narrow projection ONCE: count() + global_row_number's
    # three passes (sample, bucket counts, numbering) would otherwise
    # re-execute the scan lineage four times
    cents = ds.map_batches(to_cents, batch_format="pyarrow").materialize()
    n = cents.count()
    ordered = F.global_row_number(cents, ["cents", "event_id"], out_col="__ord")
    k = 10
    small, big = n // k, n % k  # first `big` buckets hold small+1 rows

    def ntile(b: pa.Table) -> pa.Table:
        r = pc.subtract(b.column("__ord"), pa.scalar(1, pa.int64())).to_numpy(
            zero_copy_only=False
        )  # 0-based rank
        cut = big * (small + 1)
        d = np.where(r < cut, r // (small + 1), big + (r - cut) // max(small, 1))
        return pa.table(
            {"event_id": b.column("event_id"), "decile": pa.array(d + 1, pa.int64())}
        )

    return ordered.map_batches(ntile, batch_format="pyarrow")


def _q_event_value_mad(sf_dir: str):
    """Robust per-group dispersion: median absolute deviation of exact cents
    per event_type (relational.grouped_mad — both medians inside one
    bucketed group pass; np.median interpolation == DuckDB's mad())."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_mad(
        ds.map_batches(to_cents, batch_format="pyarrow"), "event_type", "cents", out_col="mad_cents"
    )


def _q_event_type_share(sf_dir: str):
    """Partition-less window (SUM() OVER ()): each event type's exact-cents
    total and its e9-rounded share of the GLOBAL total — one combiner
    aggregate, grand total folded on the driver (a scalar), shares attached
    in a stateless map."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    per_type = F.grouped_agg(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        ["event_type"],
        [("cents", "sum", "total_cents")],
    ).materialize()  # two consumers: the scalar fold and the share map
    total = sum(
        int(b.column("total_cents").to_numpy(zero_copy_only=False).sum())
        for b in per_type.iter_batches(batch_size=None, batch_format="pyarrow")
    )

    def share(b: pa.Table) -> pa.Table:
        s = pc.round(
            pc.divide(pc.cast(b.column("total_cents"), pa.float64()), float(total)), ndigits=9
        )
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "total_cents": b.column("total_cents"),
                "share": s,
            }
        )

    return per_type.map_batches(share, batch_format="pyarrow")


def _q_approx_users_by_type(sf_dir: str):
    """Grouped HyperLogLog (sketches.hll_grouped_distinct, p=12 -> ~1.6%
    std error): approximate distinct users per event type — register
    partials, never raw user ids, cross the shuffle. hash_fn='md5' lets the
    oracle replay the per-key registers and estimator in SQL and
    value-match the estimates; the estimate-vs-exact bound stays
    pytest-gated."""
    from tesseract_recognize_ray.functions.sketches import hll_grouped_distinct

    ds = F.load(sf_dir, "events", columns=["event_type", "user_id"])
    return hll_grouped_distinct(ds, "event_type", "user_id", p=12, hash_fn="md5")


def _q_first_event_per_user_day(sf_dir: str):
    """Windowed first-per-key compaction (keep_latest ascending, composite
    (user, day) key): each user's FIRST event of every UTC day — QUALIFY
    ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts, event_id)=1.
    The shuffle moves at most one candidate row per (user, day) per block."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def with_day(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts_us": us,
                "d": pc.cast(pc.divide(us, 86_400_000_000), pa.int64()),
            }
        )

    out = F.keep_latest(
        ds.map_batches(with_day, batch_format="pyarrow"),
        ["user_id", "d"],
        ["ts_us", "event_id"],
        ascending=True,
    )
    return out.select_columns(["user_id", "d", "event_id"])


def _q_lineitem_checksum(sf_dir: str):
    """Order-independent table checksum (the 100 TB source-vs-sink audit
    primitive): per-row Horner polynomial hash of the 4 line-identity keys
    mod a 31-bit prime, summed mod the prime. One streaming scan, one int64
    per batch to the driver."""
    v = F.polynomial_checksum(
        F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]),
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    )
    return pd.DataFrame({"checksum": pd.Series([v], dtype="int64")})


def _q_doc_sliding_chunks(sf_dir: str):
    """LLM-training chunker: overlapping 32-token windows with stride 16 per
    document (vectorized flat-map, no shuffle; every token covered, ragged
    final window)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_text.sliding_token_chunks(ds, "doc_id", "text", window=32, stride=16)


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means (k=8, 3 update iterations, deterministic
    seeds + e6-rounded centroids) — assignment of every embedding to its
    final cluster, replayed exactly by an unrolled-CTE DuckDB oracle."""
    from tesseract_recognize_ray.functions.similarity import kmeans_lloyd

    # materialize once: iters+2 passes over the same parquet otherwise
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    return kmeans_lloyd(ds, "vec_id", "embedding", k=8, iters=3)


def _kmeans_ctes(k: int = 8, iters: int = 3) -> list[str]:
    """Unrolled Lloyd's iterations as chained CTEs (same idiom as the
    pagerank / k-core oracles): a_i = nearest-centroid assignment,
    m_i = e6-rounded coordinate means, c_{i+1} keeps empty clusters.
    The chain ends in ``af`` = final assignment (vec_id, v, cid)."""
    assign = (
        "SELECT e.vec_id, e.v, c.cid FROM e CROSS JOIN {c} c "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY e.vec_id "
        "ORDER BY list_distance(e.v, c.v), c.cid) = 1"
    )
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v"
        f" FROM e ORDER BY vec_id LIMIT {k})",
    ]
    for i in range(iters):
        parts.append(f"a{i} AS ({assign.format(c=f'c{i}')})")
        parts.append(
            f"m{i} AS (SELECT cid, list(val ORDER BY dim) AS v FROM ("
            f"SELECT cid, dim, ROUND(AVG(val), 6) AS val FROM ("
            f"SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a{i})"
            f" GROUP BY cid, dim) GROUP BY cid)"
        )
        parts.append(
            f"c{i+1} AS (SELECT c{i}.cid, COALESCE(m{i}.v, c{i}.v) AS v"
            f" FROM c{i} LEFT JOIN m{i} ON c{i}.cid = m{i}.cid)"
        )
    parts.append(f"af AS ({assign.format(c=f'c{iters}')})")
    return parts


def _kmeans_oracle_sql(k: int = 8, iters: int = 3) -> str:
    return (
        "WITH " + ",\n".join(_kmeans_ctes(k, iters))
        + "\nSELECT vec_id, cid AS cluster FROM af"
    )


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup: k-means clusters (k=8, 3 iterations),
    then flag vectors with an earlier cluster-mate at e6-rounded cosine
    >= 0.9 — the whole chain replayed by the k-means CTEs + one self-join."""
    from tesseract_recognize_ray.functions.similarity import semantic_dedup

    # materialize once: the Lloyd loop + assignment make iters+2 passes and
    # each would otherwise re-decode the parquet (measured 5.4s -> 3.4s)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    return semantic_dedup(ds, "vec_id", "embedding", k=8, iters=3, threshold=0.9)


def _semantic_dedup_oracle_sql(k: int = 8, iters: int = 3, t: float = 0.9) -> str:
    return (
        "WITH " + ",\n".join(_kmeans_ctes(k, iters))
        + f"""
SELECT x.vec_id, x.cid AS cluster,
       COALESCE(bool_or(ROUND(list_cosine_similarity(x.v, y.v), 6) >= {t}), FALSE) AS is_dup
FROM af x LEFT JOIN af y ON x.cid = y.cid AND y.vec_id < x.vec_id
GROUP BY x.vec_id, x.cid"""
    )


def _q_semantic_dedup_capped(sf_dir: str):
    """semantic_dedup under the mega-cluster straggler guard
    (max_cluster_size=40): earlier-mate candidates restricted to each
    cluster's 40 earliest vec_ids — O(n_c * 40) instead of O(n_c^2) — with
    rows of over-cap clusters carrying truncated=TRUE. The oracle replays
    the capped semantics exactly via a rank filter on the join's earlier
    side, so the approximation itself is value-checked, not hand-waved."""
    from tesseract_recognize_ray.functions.similarity import semantic_dedup

    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    return semantic_dedup(
        ds, "vec_id", "embedding", k=8, iters=3, threshold=0.9, max_cluster_size=40
    )


def _semantic_dedup_capped_oracle_sql(
    k: int = 8, iters: int = 3, t: float = 0.9, cap: int = 40
) -> str:
    return (
        "WITH " + ",\n".join(_kmeans_ctes(k, iters))
        + f""",
ranked AS MATERIALIZED (
    SELECT af.*, ROW_NUMBER() OVER (PARTITION BY cid ORDER BY vec_id) AS rk,
           COUNT(*) OVER (PARTITION BY cid) AS csz
    FROM af
)
SELECT x.vec_id, x.cid AS cluster,
       COALESCE(bool_or(ROUND(list_cosine_similarity(x.v, y.v), 6) >= {t}), FALSE) AS is_dup,
       MAX(x.csz) > {cap} AS truncated
FROM ranked x LEFT JOIN ranked y
     ON x.cid = y.cid AND y.vec_id < x.vec_id AND y.rk <= {cap}
GROUP BY x.vec_id, x.cid"""
    )


def _q_doc_lm_score(sf_dir: str):
    """CCNet-style unigram LM quality score: corpus term counts -> top-20
    vocabulary broadcast once -> per-doc integer micro-log10-prob sums
    (OOV floored at count 0.5). Integer-exact, so fully SQL-oracled."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_text.unigram_logprob(ds, "doc_id", "text", vocab_size=20)


def _q_grouping_sets_lineitem(sf_dir: str):
    """GROUP BY GROUPING SETS with NON-hierarchical sets — (returnflag,
    linestatus), (linenumber), grand total — sharing ONE base combiner scan
    over the union-key leaf; each set re-aggregates the tiny leaf (rollup
    and cube are wrappers over the same core)."""
    ds = F.load(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_linenumber", "l_quantity"],
    )

    def prep(b: pa.Table) -> pa.Table:
        qc = pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100.0)), pa.int64())
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "l_linenumber": b.column("l_linenumber"),
                "qc": qc,
            }
        )

    return F.grouping_sets_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        [["l_returnflag", "l_linestatus"], ["l_linenumber"], []],
        [("qc", "count", "n"), ("qc", "sum", "qty_cents")],
        keys=["l_returnflag", "l_linestatus", "l_linenumber"],
    )


def _q_canonical_prefix_docs(sf_dir: str):
    """Shared MUTABLE index on raw Ray actors (the documented Dataset-API
    escape hatch, state/shard_index.py): keep the min-doc_id document per
    3-token text prefix via sharded offer-min/probe — no shuffle touches
    the doc rows; only per-batch (key, min-id) partials travel as actor
    messages, and update order can't change the fixpoint."""
    from tesseract_recognize_ray.functions.textstats import _ws_token_lists
    from tesseract_recognize_ray.state.shard_index import canonical_min_keep

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def prefix3(b: pa.Table) -> pa.Table:
        lists = _ws_token_lists(b.column("text"))
        flat = lists.flatten()
        off = np.asarray(lists.offsets, dtype=np.int64)
        off = off - off[0]
        ne = np.asarray(pc.not_equal(pc.fill_null(flat, ""), ""))
        csum = np.concatenate([[0], np.cumsum(ne)]).astype(np.int64)
        off2 = csum[off]
        flat2 = flat.filter(pa.array(ne))
        k = np.minimum(np.diff(off2), 3)
        base = np.concatenate([[0], np.cumsum(k)])
        idx = np.repeat(off2[:-1], k) + (
            np.arange(int(k.sum()), dtype=np.int64) - np.repeat(base[:-1], k)
        )
        toks = flat2.take(pa.array(idx))
        la = pa.ListArray.from_arrays(pa.array(base, pa.int32()), toks)
        return pa.table(
            {"doc_id": b.column("doc_id"), "pfx": pc.binary_join(la, " ")}
        )

    keyed = ds.map_batches(prefix3, batch_format="pyarrow")
    kept, _ = canonical_min_keep(keyed, "pfx", "doc_id")
    return kept.select_columns(["doc_id"])


def _q_supplier_part_mincost(sf_dir: str):
    """Bounded multi-source weighted shortest paths (graph.sssp_rounds, 3
    Bellman-Ford relaxation rounds — ONE driver-folded Ray job per round
    below the broadcast gate): cheapest int64-cent path cost from the
    nation-0 supplier set over the undirected supplier<->part graph whose
    edge weight is the MIN lineitem extendedprice of that (supplier, part)
    lane. Oracle = 3 chained relax CTEs, exact int64 on both sides."""
    from tesseract_recognize_ray.functions.graph import sssp_rounds

    li = F.load(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey", "l_extendedprice"])

    def edge(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(b.column("l_suppkey"), pa.int64()),
                "dst": pc.add(
                    pa.scalar(1_000_000, pa.int64()), pc.cast(b.column("l_partkey"), pa.int64())
                ),
                "cents": pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64()),
            }
        )

    edges = F.grouped_agg(
        li.map_batches(edge, batch_format="pyarrow"),
        ["src", "dst"],
        [("cents", "min", "w")],
        reduce_blocks=16,
    )
    seeds = F.load(sf_dir, "supplier", columns=["s_suppkey"], filter=pc.field("s_nationkey") == 0)
    return sssp_rounds(edges, seeds, rounds=3)


def _q_pareto_parts(sf_dir: str):
    """Distributed Pareto frontier / SQL skyline (relational.skyline):
    parts for which no other part is both cheaper-or-equal AND
    larger-or-equal with one strict — minimize retail price, maximize
    size. Frontier-of-frontiers merge: per-block local frontier inside
    map_batches, then one frontier pass over the tiny union; only
    frontier-sized rows ever leave the scan tasks."""
    ds = F.load(sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b.column("p_partkey"),
                "price_c": pc.cast(pc.round(pc.multiply(b.column("p_retailprice"), 100.0)), pa.int64()),
                "p_size": b.column("p_size"),
            }
        )

    return F.skyline(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["price_c", "p_size"],
        ["min", "max"],
    )


def _q_nation_customer_names(sf_dir: str):
    """Ordered group concatenation (relational.grouped_string_agg, SQL
    string_agg ... ORDER BY): per nation, '|'-joined customer names in
    custkey order. One bucketed shuffle of the narrow (key, name) pair;
    nation names attach via broadcast lookup."""
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    agg = F.grouped_string_agg(
        cust, "c_nationkey", "c_name", sep="|", order_cols=["c_custkey"], out_col="names"
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = F.broadcast_lookup_join(agg, nation, "c_nationkey", "n_nationkey")

    def project(b: pa.Table) -> pa.Table:
        return pa.table({"n_name": b.column("n_name"), "names": b.column("names")})

    return j.map_batches(project, batch_format="pyarrow")


def _q_dup_token_spans(sf_dir: str):
    """Exact duplicate-substring spans (Lee et al. 2022 substring-level
    dedup): maximal merged spans of 5-token windows that occur more than
    once anywhere in the corpus. Grouped n-gram count (combiner reduce) ->
    broadcast dup-set filter in place -> per-doc interval-island merge; the
    only occurrence-level shuffle carries (doc_id, pos) for duplicated
    windows."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_dedup.duplicate_token_spans(ds, "doc_id", "text", k=5)


def _q_dedup_cleaned_docs(sf_dir: str):
    """Lee-et-al. substring dedup APPLIED (the curation step the span
    detector exists for): cut every maximal duplicated 5-token span out of
    each document and re-emit single-space-normalized cleaned text plus the
    removed-token count. Spans broadcast once (gated); the cleaning pass is
    map-only — the oracle replays detection, the anti-join cut and the
    string_agg reconstruction end-to-end."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_dedup.remove_duplicate_spans(ds, "doc_id", "text", k=5)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "clean_text": b["clean_text"].astype(str),
                "n_removed": b["n_removed"].astype("int64"),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


_DEDUP_CLEAN_ORACLE = """
WITH t AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
), g AS (
    SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+4], ' ') AS ng
    FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(i)
), d AS (
    SELECT ng FROM g GROUP BY ng HAVING COUNT(*) > 1
), o AS (
    SELECT g.doc_id, g.pos FROM g JOIN d USING (ng)
), b AS (
    SELECT doc_id, pos,
           CASE WHEN pos - LAG(pos) OVER (
                    PARTITION BY doc_id ORDER BY pos) <= 5
                THEN 0 ELSE 1 END AS brk
    FROM o
), grp AS (
    SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS gid
    FROM b
), spans AS (
    SELECT doc_id, MIN(pos) AS s, MAX(pos) + 5 AS e FROM grp GROUP BY doc_id, gid
), cut AS (
    SELECT doc_id, unnest(generate_series(s, e - 1)) AS pos FROM spans
), tp AS (
    SELECT doc_id, u.i - 1 AS pos, toks[u.i] AS tok
    FROM t, unnest(generate_series(1, len(toks))) AS u(i)
), kept AS (
    SELECT tp.doc_id, tp.pos, tp.tok
    FROM tp LEFT JOIN cut ON cut.doc_id = tp.doc_id AND cut.pos = tp.pos
    WHERE cut.pos IS NULL
), agg AS (
    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt, COUNT(*) AS n
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(a.txt, '') AS clean_text,
       CAST(len(t.toks) - COALESCE(a.n, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN agg a USING (doc_id)
"""


def _q_doc_novelty_scores(sf_dir: str):
    """Per-doc 3-gram novelty: the share of a document's distinct word
    trigrams whose global first occurrence (min doc_id) is this document —
    integer-exact (floor e6 ratio), one combiner reduce + one bucketed
    join; text never shuffles."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    out = F_text.doc_ngram_novelty(ds, "doc_id", "text", n=3)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_ngrams": b["n_ngrams"].astype("int64"),
                "n_first": b["n_first"].astype("int64"),
                "novelty_e6": b["novelty_e6"].astype("int64"),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


_DOC_NOVELTY_ORACLE = """
WITH t AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
), g AS (
    SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS ng
    FROM t, unnest(generate_series(1, len(toks) - 2)) AS u(i)
), m AS (
    SELECT ng, MIN(doc_id) AS fd FROM g GROUP BY ng
)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN m.fd = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       CAST(SUM(CASE WHEN m.fd = g.doc_id THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS novelty_e6
FROM g JOIN m USING (ng) GROUP BY g.doc_id
"""


def _q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing (GPT-style pretraining prep): all
    documents' whitespace tokens laid end-to-end in doc_id order, cut into
    fixed 64-token training windows; one row per (window, doc) overlap with
    the doc-local token span. Only (doc_id, token_count) pairs shuffle —
    text never moves."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_text.pack_sequences(ds, "doc_id", "text", seq_len=64)


def _q_bloom_semi_join_lineitem(sf_dir: str):
    """Bloom-pruned semi-join: per-returnflag count + quantity sum of
    lineitems whose order has o_totalprice > 150000. The probe side is
    pruned by a broadcast Bloom filter (block-partial bitmap OR-reduce,
    ~0.4% FP) BEFORE the exact join removes false positives — the 100 TB
    shape for big-probe/small-build semi-joins: most non-matching rows die
    in place instead of entering the exchange."""
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    build = orders.map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 150000.0)),
        batch_format="pyarrow",
    ).select_columns(["o_orderkey"])
    bloom_ref = F.bloom_build(build, "o_orderkey")
    li = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_quantity"])
    pruned = F.bloom_prune(li, "l_orderkey", bloom_ref)
    exact = F.broadcast_semi_join(pruned, build, "l_orderkey", "o_orderkey")

    def to_cents(b: pa.Table) -> pa.Table:
        q = pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100.0)), pa.int64())
        return pa.table({"l_returnflag": b.column("l_returnflag"), "qc": q})

    agg = F.grouped_agg(
        exact.map_batches(to_cents, batch_format="pyarrow"),
        ["l_returnflag"],
        [("qc", "count", "n"), ("qc", "sum", "qc_sum")],
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "n": b.column("n"),
                "sum_qty": pc.divide(pc.cast(b.column("qc_sum"), pa.float64()), 100.0),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_doc_split_counts(sf_dir: str):
    """Deterministic train/val/test split (the reproducible-split primitive
    every training pipeline needs): bucket = Knuth multiplicative hash of
    doc_id mod 100 -> train(<80) / val(<90) / test; pure row-local
    arithmetic replayed exactly by SQL. Returns per-(source, split) doc
    counts so the result stays tiny at any corpus size."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "source"])

    def fn(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = (d * 2654435761) % 4294967296 % 100
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table(
            {"source": b.column("source"), "split": pa.array(split, pa.string())}
        )

    t = ds.map_batches(fn, batch_format="pyarrow")
    return F.grouped_agg(t, ["source", "split"], [("split", "count", "n")])


def _events_roundtrip_agg(back) -> Any:
    return F.grouped_agg(
        back,
        ["event_type"],
        [("event_id", "count", "n"), ("event_id", "sum", "sum_event_id"), ("user_id", "sum", "sum_user_id")],
    )


def _q_approx_user_counts(sf_dir: str):
    """Count-Min sketch frequency estimates (mergeable fixed-size partials;
    the raw column never leaves the map stage): per-user event-count
    estimates for a fixed probe set. Estimates are >= the true counts by
    construction (error bound pytest-gated); hash_fn='md5' makes sketch AND
    probes SQL-replayable — the oracle rebuilds the counter matrix from md5
    prefixes and the split-multiply mod-2^64 remix and value-matches."""
    from tesseract_recognize_ray.functions.sketches import (
        count_min_query,
        count_min_sketch,
    )

    ds = F.load(sf_dir, "events", columns=["user_id"])
    sk = count_min_sketch(ds, "user_id", depth=4, width=4096, hash_fn="md5")
    probe = pd.Series(np.arange(20, dtype="int64"))
    return pd.DataFrame(
        {"user_id": probe, "est_events": count_min_query(sk, probe, hash_fn="md5")}
    )


def _q_partition_pruned_events(sf_dir: str):
    """Storage-layout-aware scan pruning (the 'prune at the read' 100 TB
    shape): events written once as hive-partitioned parquet
    (event_type=<v>/ directories), then read back with a PATH partition
    filter so non-matching partitions are never opened — the pruned
    partitions' bytes never leave storage, unlike a post-read filter.
    Aggregate over the two selected types value-matches the oracle's WHERE."""
    import shutil

    import ray
    from ray.data.datasource.partitioning import PathPartitionFilter

    out = "/tmp/trr_part_events"
    shutil.rmtree(out, ignore_errors=True)
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ds.write_parquet(out, partition_cols=["event_type"])

    keep = {"click", "purchase"}
    pf = PathPartitionFilter.of(lambda d: d.get("event_type") in keep, style="hive")
    back = ray.data.read_parquet(out, partition_filter=pf)

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": pc.cast(b.column("event_type"), pa.string()),
                "vc": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    return F.grouped_agg(
        back.map_batches(to_cents, batch_format="pyarrow"),
        ["event_type"],
        [("vc", "count", "n"), ("vc", "sum", "value_cents")],
    )


def _q_rowgroup_pruned_lineitem(sf_dir: str):
    """Zone-map (row-group statistics) scan pruning, the sort-then-filter
    sibling of partition_pruned_events: lineitem is written back SORTED by
    l_orderkey (each output file covers a narrow key range, so parquet
    min/max stats become a zone map), then re-read with a pushed-down range
    filter — pyarrow skips whole files/row groups whose stats exclude the
    range, so the pruned bytes never leave storage. Aggregate value-matches
    the oracle's WHERE."""
    import shutil

    import pyarrow.dataset as pds
    import ray

    out = "/tmp/trr_sorted_lineitem"
    shutil.rmtree(out, ignore_errors=True)
    ds = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    ds.sort("l_orderkey").write_parquet(out)

    lo, hi = 1000, 5000
    back = ray.data.read_parquet(
        out,
        columns=["l_orderkey", "l_quantity"],
        filter=(pds.field("l_orderkey") >= lo) & (pds.field("l_orderkey") <= hi),
    )

    def to_cents(b: pa.Table) -> pa.Table:
        qc = pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100.0)), pa.int64())
        return pa.table({"g": pa.nulls(b.num_rows, pa.int8()), "qc": qc})

    agg = F.grouped_agg(
        back.map_batches(to_cents, batch_format="pyarrow"),
        ["g"],
        [("qc", "count", "n"), ("qc", "sum", "qty_cents")],
    )
    return agg.drop_columns(["g"])


def _q_events_jsonl_roundtrip(sf_dir: str):
    """Source/sink format coverage: events -> partitioned JSONL files under
    /tmp (one file per block — the resumable-sink contract) ->
    ray.data.read_json -> grouped aggregate. Integer/string columns only,
    which JSON text round-trips exactly; the oracle aggregates the original
    parquet, so the match proves the writer+reader are lossless."""
    import shutil

    import ray

    out = "/tmp/trr_roundtrip_jsonl"
    shutil.rmtree(out, ignore_errors=True)
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    ds.write_json(out)
    return _events_roundtrip_agg(ray.data.read_json(out))


def _q_events_csv_roundtrip(sf_dir: str):
    """Same round-trip contract as events_jsonl_roundtrip through the CSV
    writer/reader (type inference must restore int64/string exactly)."""
    import shutil

    import ray

    out = "/tmp/trr_roundtrip_csv"
    shutil.rmtree(out, ignore_errors=True)
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    ds.write_csv(out)
    return _events_roundtrip_agg(ray.data.read_csv(out))


def _q_rolling_min_events(sf_dir: str):
    """Sliding-extremum window: per-user rolling MIN of the last 3 event
    values (exact cents), ordered by (ts, event_id) — unlike the rolling sum
    an extremum has no inverse, so the per-bucket kernel is the grouped
    monotonic-deque rolling min (functions/relational.py
    window_rolling_extremum); same single hash(user) bucket exchange."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value_cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    out = F.window_rolling_extremum(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id",
        ["ts", "event_id"],
        "value_cents",
        _ROLL_W,
        kind="min",
        out_col="roll_min_cents",
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "roll_min_cents"]].astype("int64")

    return out.map_batches(project, batch_format="pandas")


def _q_scaled_event_values(sf_dir: str):
    """Per-group min-max feature scaling (ML preprocessing): scaled =
    (v - min) / (max - min) within each event_type, NULL for a constant
    group. Group extrema reduce to 5 rows via grouped_agg, broadcast once;
    one vectorized map scales every row — no second shuffle."""
    import ray

    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    ext = F.grouped_agg(
        cents, ["event_type"], [("cents", "min", "mn"), ("cents", "max", "mx")]
    ).to_pandas()
    ref = ray.put(
        {
            t: (int(mn), int(mx))
            for t, mn, mx in zip(ext["event_type"], ext["mn"], ext["mx"])
        }
    )

    def scale(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        # Series.map(dict) is the vectorized (C-level) lookup; a lambda
        # would call back into Python per row
        mn = b["event_type"].map({t: v[0] for t, v in m.items()}).to_numpy(np.float64)
        mx = b["event_type"].map({t: v[1] for t, v in m.items()}).to_numpy(np.float64)
        v = b["cents"].to_numpy(np.float64)
        rng_ = mx - mn
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = np.round((v - mn) / rng_, 6)
        scaled = np.where(rng_ == 0, np.nan, scaled)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "event_type": b["event_type"],
                "scaled": scaled,
            }
        )

    return cents.map_batches(scale, batch_format="pandas")


def _q_ts_inversions_by_user(sf_dir: str):
    """Data-quality assertion: per user, how many events arrive with a
    timestamp EARLIER than the previous event in event_id order (late /
    out-of-order arrivals). One window_lag bucket exchange + a grouped sum;
    users with zero inversions are kept (COUNT semantics, not EXISTS)."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    lagged = F.window_lag(ds, "user_id", ["event_id"], "ts", out_col="__prev")

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        inv = (b["ts"] < b["__prev"]).fillna(False).astype("int64")
        return pd.DataFrame({"user_id": b["user_id"].astype("int64"), "inv": inv})

    flags = lagged.map_batches(flag, batch_format="pandas")
    return F.grouped_agg(flags, ["user_id"], [("inv", "sum", "n_inversions")])


def _q_snm_dup_pairs(sf_dir: str):
    """Sorted-neighborhood dedup (Hernandez & Stolfo merge/purge): order docs
    by (text, doc_id), compare each with its next 2 neighbors, keep pairs
    with character-set jaccard >= 0.5 (byte-level sets = DuckDB jaccard()).
    A third candidate-generation family next to MinHash-LSH banding and
    embedding-LSH: zero hash collisions, one global order instead of b band
    shuffles (functions/dedup.py snm_dup_pairs)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=8)
    return F_dedup.snm_dup_pairs(ds, "doc_id", "text", window=3, threshold=0.5)


def _q_q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape (international shipping volume): supplier-nation x
    customer-nation x ship-year revenue over two ship years, all distinct
    nation pairs. Scale shape: the shipdate filter is pushed into the scan;
    supplier/customer/nation dimensions broadcast (at a true 100 TB customer
    domain swap the customer attach for a hash join — same gate rule as
    broadcast_lookup_join everywhere else); lineitem folds to one partial
    per (orderkey, year) BEFORE the single big co-shuffle with orders."""
    import pyarrow.dataset as pds_

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"n_name": "supp_nation"})
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ].rename(columns={"n_name": "cust_nation"})

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pds_.field("l_shipdate") >= pd.Timestamp("1995-01-01"))
        & (pds_.field("l_shipdate") <= pd.Timestamp("1996-12-31 23:59:59")),
    )
    line = F.broadcast_lookup_join(line, supp, "l_suppkey", "s_suppkey")

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "supp_nation": b["supp_nation"],
                "l_year": pd.DatetimeIndex(b["l_shipdate"]).year.astype("int64"),
                "rev_u": price_c * (100 - disc_c),
            }
        )

    partial = F.grouped_agg(
        line.map_batches(rev, batch_format="pandas"),
        ["l_orderkey", "supp_nation", "l_year"],
        [("rev_u", "sum", "rev_u")],
        reduce_blocks=16,
    )
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders_n = F.broadcast_lookup_join(orders, cust, "o_custkey", "c_custkey").select_columns(
        ["o_orderkey", "cust_nation"]
    )
    joined = F.bucket_join(
        partial,
        orders_n,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema(
            {
                "l_orderkey": pa.int64(),
                "supp_nation": pa.string(),
                "l_year": pa.int64(),
                "rev_u": pa.int64(),
            }
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "cust_nation": pa.string()}),
        reduce_blocks=16,
    )
    joined = joined.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b.column("supp_nation"), b.column("cust_nation")))),
        batch_format="pyarrow",
    )
    return F.grouped_agg(
        joined, ["supp_nation", "cust_nation", "l_year"], [("rev_u", "sum", "revenue_u")]
    )


def _q_q5_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape (local supplier volume): revenue from orders whose
    customer and supplier share a nation inside one region, grouped by
    nation. Scale shape: the region/nation dims collapse to a nationkey set
    on the driver; supplier -> nation broadcasts (supplier is the small
    side); the orderdate predicate pushes into the orders scan and customer
    nation attaches via broadcast_lookup_join (same 100 TB gate note as
    q7_volume_shipping: swap for a hash join at a true customer domain);
    lineitem folds to one revenue partial per orderkey BEFORE the single
    co-shuffle with the filtered orders."""
    import pyarrow.dataset as pds_

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"][["n_nationkey", "n_name"]]
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.merge(asia, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"n_name": "supp_nation"})
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust = cust.merge(asia, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ].rename(columns={"n_name": "cust_nation"})

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    line = F.broadcast_lookup_join(line, supp, "l_suppkey", "s_suppkey")

    def rev(b: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "supp_nation": b["supp_nation"],
                "rev_u": price_c * (100 - disc_c),
            }
        )

    partial = F.grouped_agg(
        line.map_batches(rev, batch_format="pandas"),
        ["l_orderkey", "supp_nation"],
        [("rev_u", "sum", "rev_u")],
        reduce_blocks=16,
    )
    orders = F.load(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey"],
        filter=(pds_.field("o_orderdate") >= pd.Timestamp("1996-01-01"))
        & (pds_.field("o_orderdate") < pd.Timestamp("1997-01-01")),
    )
    orders_n = F.broadcast_lookup_join(orders, cust, "o_custkey", "c_custkey").select_columns(
        ["o_orderkey", "cust_nation"]
    )
    joined = F.bucket_join(
        partial,
        orders_n,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema(
            {"l_orderkey": pa.int64(), "supp_nation": pa.string(), "rev_u": pa.int64()}
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "cust_nation": pa.string()}),
        reduce_blocks=16,
    )
    joined = joined.map_batches(
        lambda b: b.filter(pc.equal(b.column("supp_nation"), b.column("cust_nation"))),
        batch_format="pyarrow",
    )
    out = F.grouped_agg(joined, ["supp_nation"], [("rev_u", "sum", "revenue_u")])
    return out.map_batches(
        lambda b: b.rename_columns(["n_name", "revenue_u"]), batch_format="pyarrow"
    )


def _q_q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape (product-type profit by nation and year), adapted to
    this schema: the testdata carries no partsupp table, so profit =
    extendedprice x (1 - discount) over parts whose name contains 'widget'
    (the reference Q9 subtracts ps_supplycost x quantity; the join/group
    topology — part filter, supplier nation, order year — is what this
    exercises). Scale shape: the part filter collapses to a broadcast
    partkey set; supplier -> nation broadcasts; lineitem folds to one
    partial per (orderkey, nation) before the single co-shuffle with
    orders for the year attach. Gate note (the q16 lesson): the name-filtered
    partkey set is ~15% of `part` and therefore corpus-proportional — at a
    true 100 TB part domain swap the broadcast semi-filter for a
    `bucket_join` on partkey exactly as q16_supplier_variety does; at bench
    scales the one-shot `ray.put` of an int64 array is the cheaper shape."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"n_name": "nation"})
    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    import ray

    keys = part.loc[part["p_name"].str.contains("widget"), "p_partkey"].to_numpy(np.int64)
    key_arr = ray.put(pa.array(np.unique(keys), pa.int64()))

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def widget_only(b: pa.Table) -> pa.Table:
        import ray

        ks = ray.get(key_arr)
        return b.filter(pc.is_in(pc.cast(b.column("l_partkey"), pa.int64()), value_set=ks))

    line = line.map_batches(widget_only, batch_format="pyarrow")
    line = F.broadcast_lookup_join(line, supp, "l_suppkey", "s_suppkey")

    def profit(b: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "nation": b["nation"],
                "profit_u": price_c * (100 - disc_c),
            }
        )

    partial = F.grouped_agg(
        line.map_batches(profit, batch_format="pandas"),
        ["l_orderkey", "nation"],
        [("profit_u", "sum", "profit_u")],
        reduce_blocks=16,
    )
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def to_year(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_year": pd.DatetimeIndex(b["o_orderdate"]).year.astype("int64"),
            }
        )

    joined = F.bucket_join(
        partial,
        orders.map_batches(to_year, batch_format="pandas"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema(
            {"l_orderkey": pa.int64(), "nation": pa.string(), "profit_u": pa.int64()}
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_year": pa.int64()}),
        reduce_blocks=16,
    )
    return F.grouped_agg(joined, ["nation", "o_year"], [("profit_u", "sum", "profit_u")])


def _q_q19_discount_revenue(sf_dir: str):
    """TPC-H Q19 shape (disjunctive brand/size/quantity predicate): revenue
    over an OR-of-ANDs join predicate. Scale shape: the part side collapses
    to a broadcast partkey -> (qty_lo, qty_hi) interval map (only parts
    passing their branch's brand+size conjunct enter it), the lineitem scan
    pushes the quantity ENVELOPE [1, 40] into the parquet reader, and each
    batch resolves the disjunction vectorized — the exchange ships one
    int64 partial per batch."""
    import pyarrow.dataset as pds_
    import ray

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"])
    branches = [("Brand#1", 1, 10, 1, 20), ("Brand#2", 1, 20, 10, 30), ("Brand#3", 1, 30, 20, 40)]
    lo = {}
    hi = {}
    for brand, smn, smx, qmn, qmx in branches:
        sel = part[(part["p_brand"] == brand) & part["p_size"].between(smn, smx)]
        for k in sel["p_partkey"]:
            lo[int(k)] = qmn
            hi[int(k)] = qmx
    ref = ray.put((pd.Series(lo, dtype="float64"), pd.Series(hi, dtype="float64")))

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pds_.field("l_quantity") >= 1) & (pds_.field("l_quantity") <= 40),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        lo_s, hi_s = ray.get(ref)
        pk = b["l_partkey"]
        qlo = pk.map(lo_s).to_numpy(np.float64)
        qhi = pk.map(hi_s).to_numpy(np.float64)
        q = b["l_quantity"].to_numpy(np.float64)
        mask = ~np.isnan(qlo) & (q >= qlo) & (q <= qhi)
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        rev = int((price_c[mask] * (100 - disc_c[mask])).sum())
        return pd.DataFrame({"rev_u": pd.Series([rev], dtype="int64")})

    parts = line.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame({"revenue_u": pd.Series([int(parts["rev_u"].sum())], dtype="int64")})


def _q_q8_market_share(sf_dir: str):
    """TPC-H Q8 shape (national market share): of all 'PROMO'-part revenue
    ordered by ASIA-region customers in 1995-96, the share supplied by
    NATION_7, per order year. Scale shape: part filter -> broadcast partkey
    set; supplier nation attach broadcast; lineitem folds to one partial per
    (orderkey, is_target) before the single co-shuffle with the date-pruned
    orders side (customer/nation/region dims broadcast — at a true 100 TB
    customer domain swap that attach for a hash join). Exact integer cents
    end-to-end; the share divides two exact int64 sums."""
    import pyarrow.dataset as pds_
    import ray

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    pk_ref = ray.put(set(part.loc[part["p_type"] == "PROMO", "p_partkey"].astype(int)))
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    supp = supp.merge(nation, left_on="s_nationkey", right_on="n_nationkey")[
        ["s_suppkey", "n_name"]
    ].rename(columns={"n_name": "supp_nation"})

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        pks = ray.get(pk_ref)
        b = b[b["l_partkey"].isin(pks)]
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "l_suppkey": b["l_suppkey"].astype("int64"),
                "rev_u": price_c * (100 - disc_c),
            }
        )

    folded = F.broadcast_lookup_join(
        line.map_batches(fold, batch_format="pandas"), supp, "l_suppkey", "s_suppkey"
    )

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "is_target": (b["supp_nation"] == "NATION_7").astype("int64"),
                "rev_u": b["rev_u"].astype("int64"),
            }
        )

    partial = F.grouped_agg(
        folded.map_batches(flag, batch_format="pandas"),
        ["l_orderkey", "is_target"],
        [("rev_u", "sum", "rev_u")],
        reduce_blocks=16,
    )

    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia_keys = set(asia.loc[asia["r_name"] == "ASIA", "n_nationkey"].astype(int))
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust = cust[cust["c_nationkey"].isin(asia_keys)][["c_custkey"]]
    orders = F.load(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pds_.field("o_orderdate") >= pd.Timestamp("1995-01-01"))
        & (pds_.field("o_orderdate") <= pd.Timestamp("1996-12-31 23:59:59")),
    )
    orders_n = F.broadcast_lookup_join(orders, cust, "o_custkey", "c_custkey")

    def oyear(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_year": pd.DatetimeIndex(b["o_orderdate"]).year.astype("int64"),
            }
        )

    joined = F.bucket_join(
        partial,
        orders_n.map_batches(oyear, batch_format="pandas"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema(
            {"l_orderkey": pa.int64(), "is_target": pa.int64(), "rev_u": pa.int64()}
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_year": pa.int64()}),
        reduce_blocks=16,
    )

    def split(b: pa.Table) -> pa.Table:
        tgt = pc.if_else(pc.equal(b.column("is_target"), 1), b.column("rev_u"), pa.scalar(0, pa.int64()))
        return pa.table({"o_year": b.column("o_year"), "num_u": tgt, "den_u": b.column("rev_u")})

    sums = F.grouped_agg(
        joined.map_batches(split, batch_format="pyarrow"),
        ["o_year"],
        [("num_u", "sum", "num_u"), ("den_u", "sum", "den_u")],
    ).to_pandas()
    sums = sums.sort_values("o_year").reset_index(drop=True)
    return pd.DataFrame(
        {
            "o_year": sums["o_year"].astype("int64"),
            "mkt_share": np.round(
                sums["num_u"].to_numpy(np.float64) / sums["den_u"].to_numpy(np.float64), 6
            ),
        }
    )


_COV_DIMS = 8


def _q_embedding_covariance(sf_dir: str):
    """Distributed covariance (PCA building block): one streaming pass of
    per-block (n, sum, X^T X) Gram partials — d + d^2 floats per BLOCK, the
    d x d fold on the driver — emitted as the upper triangle over the first
    8 coordinates. The oracle replays it with DuckDB covar_pop over a dim
    pair lattice (functions/similarity.py embedding_moments)."""
    ds = F.load(sf_dir, "embeddings", columns=["embedding"])
    cov = F_sim.embedding_covariance(ds, "embedding", dims=_COV_DIMS)
    iu = np.triu_indices(_COV_DIMS)
    return pd.DataFrame(
        {
            "i": iu[0].astype("int64"),
            "j": iu[1].astype("int64"),
            "cov": cov[iu].astype(np.float64),
        }
    )


_PCA_K, _PCA_ITERS = 8, 12


def _q_embedding_pca(sf_dir: str):
    """Distributed PCA over the full 64-dim embedding table (tall-skinny
    layout: the corpus never moves, only block-level integer Gram partials;
    the 64 x 64 solve runs on the driver). DuckDB has no eigensolver, so
    the solve is INTEGER-EXACT power iteration + Hotelling deflation over
    the micro-quantized covariance (similarity.pca_power_from_int_moments)
    — a recurrence the oracle unrolls verbatim in HUGEINT CTEs, making the
    8-component eigenvalue + explained-variance output value-matchable with
    no float drift anywhere. `component` is EXTRACTION order: on a spectrum
    with a clear gap that is descending-eigenvalue order (pytest-checked vs
    np.linalg.eigh on a planted direction); on near-degenerate spectra like
    the synthetic table's, any fixed-iteration method (including the
    reference eigensolver's own float noise floor) returns the same
    near-equal values in data-dependent order."""
    ds = F.load(sf_dir, "embeddings", columns=["embedding"])
    n, s, sq = F_sim.embedding_int_moments(ds, "embedding")
    comps = F_sim.pca_power_from_int_moments(n, s, sq, k=_PCA_K, iters=_PCA_ITERS)
    return pd.DataFrame(
        {
            "component": np.arange(len(comps), dtype=np.int64),
            "eigenvalue": [lam / 1e6 for lam, _tr in comps],
            "explained": [lam / tr for lam, tr in comps],
        }
    )


def _ir_sql(num: str, den: str) -> str:
    """HUGEINT round-half-away-from-zero of num/den (den > 0) — the SQL
    twin of similarity._iround."""
    return (
        f"CASE WHEN ({num}) >= 0 THEN (2*({num}) + ({den}))//(2*({den}))"
        f" ELSE -((2*(-({num})) + ({den}))//(2*({den}))) END"
    )


def _pca_power_oracle_sql(k: int = _PCA_K, iters: int = _PCA_ITERS) -> str:
    """Unrolled integer-exact power-iteration PCA (same recurrence as
    pca_power_from_int_moments, HUGEINT throughout): quantize coordinates
    with the identical floor(x*1e6 + 0.5) expression, build the exact
    micro-covariance, then per component run `iters` matvec+normalize steps
    from the all-ones vector, take the Rayleigh quotient, and deflate."""
    parts = [
        "nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings)",
        "ex AS MATERIALIZED (SELECT ROW_NUMBER() OVER () AS r, embedding AS v FROM embeddings)",
        "e AS MATERIALIZED (SELECT r, generate_subscripts(v, 1) - 1 AS dim,"
        " CAST(FLOOR(CAST(unnest(v) AS DOUBLE) * 1000000 + 0.5) AS HUGEINT) AS x FROM ex)",
        "sx AS MATERIALIZED (SELECT dim, SUM(x) AS s FROM e GROUP BY dim)",
        "sq AS MATERIALIZED (SELECT a.dim AS i, b.dim AS j, SUM(a.x * b.x) AS s"
        " FROM e a JOIN e b ON a.r = b.r GROUP BY a.dim, b.dim)",
        "c0 AS MATERIALIZED (SELECT sq.i, sq.j, "
        + _ir_sql(
            "(nn.n * sq.s - si.s * sj.s) * 1000000",
            "nn.n * nn.n * CAST(1000000000000 AS HUGEINT)",
        )
        + " AS cm FROM sq JOIN sx si ON sq.i = si.dim JOIN sx sj ON sq.j = sj.dim CROSS JOIN nn)",
        "tr AS MATERIALIZED (SELECT SUM(cm) AS t FROM c0 WHERE i = j)",
    ]
    sel = []
    for c in range(k):
        parts.append(
            f"v{c}_0 AS MATERIALIZED (SELECT dim, CAST(1000000000 AS HUGEINT) AS val FROM sx)"
        )
        for t in range(1, iters + 1):
            parts.append(
                f"w{c}_{t} AS MATERIALIZED (SELECT c.i AS dim, SUM(c.cm * v.val) AS wv"
                f" FROM c{c} c JOIN v{c}_{t-1} v ON c.j = v.dim GROUP BY c.i)"
            )
            parts.append(
                f"m{c}_{t} AS MATERIALIZED (SELECT MAX(ABS(wv)) AS m FROM w{c}_{t})"
            )
            parts.append(
                f"v{c}_{t} AS MATERIALIZED (SELECT dim, "
                + _ir_sql("w.wv * 1000000000", "m.m")
                + f" AS val FROM w{c}_{t} w CROSS JOIN m{c}_{t} m)"
            )
        vf = f"v{c}_{iters}"
        parts.append(
            f"dn{c} AS MATERIALIZED (SELECT SUM(val * val) AS den FROM {vf})"
        )
        parts.append(
            f"rz{c} AS MATERIALIZED (SELECT SUM(v1.val * c.cm * v2.val) AS num"
            f" FROM c{c} c JOIN {vf} v1 ON c.i = v1.dim JOIN {vf} v2 ON c.j = v2.dim)"
        )
        parts.append(
            f"l{c} AS MATERIALIZED (SELECT "
            + _ir_sql("rz.num", "dn.den")
            + f" AS lam FROM rz{c} rz CROSS JOIN dn{c} dn)"
        )
        if c + 1 < k:
            parts.append(
                f"c{c+1} AS MATERIALIZED (SELECT c.i, c.j, c.cm - "
                + _ir_sql("l.lam * v1.val * v2.val", "dn.den")
                + f" AS cm FROM c{c} c JOIN {vf} v1 ON c.i = v1.dim"
                f" JOIN {vf} v2 ON c.j = v2.dim CROSS JOIN l{c} l CROSS JOIN dn{c} dn)"
            )
        sel.append(
            f"SELECT CAST({c} AS BIGINT) AS component,"
            f" CAST(lam AS DOUBLE) / 1000000.0 AS eigenvalue,"
            f" CAST(lam AS DOUBLE) / CAST(t AS DOUBLE) AS explained FROM l{c} CROSS JOIN tr"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def _q_q13_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape (customer order-count distribution, zero-order
    customers included): per-customer order counts fold map-side, the
    distribution groupby runs over the customer-sized aggregate, and the
    zero bucket is closed-form (|customer| - |customers with orders|) — no
    outer join ever touches row-level data."""
    orders = F.load(sf_dir, "orders", columns=["o_custkey"])
    per_cust = F.grouped_agg(orders, ["o_custkey"], [("o_custkey", "count", "n_orders")])
    dist = (
        F.grouped_agg(per_cust, ["n_orders"], [("n_orders", "count", "n_customers")])
        .to_pandas()
        .astype("int64")
    )
    total_cust = F.load(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = total_cust - int(dist["n_customers"].sum())
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"n_orders": [0], "n_customers": [zero]})], ignore_index=True
        )
    return dist.sort_values("n_orders").reset_index(drop=True).astype("int64")


def _q_q14_promo_share(sf_dir: str):
    """TPC-H Q14 shape (promotion revenue share per ship-month): the part
    type collapses to ONE broadcast promo-partkey set, lineitem folds to a
    (ym, promo_u, total_u) partial per batch — the only exchange is the
    months-sized grouped_agg. Exact integer cents; the share divides two
    exact int64 sums."""
    import ray

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    promo_ref = ray.put(
        np.sort(part.loc[part["p_type"] == "PROMO", "p_partkey"].to_numpy(np.int64))
    )
    line = F.load(
        sf_dir, "lineitem", columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        promo = ray.get(promo_ref)
        d = pd.DatetimeIndex(b["l_shipdate"])
        ym = (d.year * 100 + d.month).to_numpy(np.int64)
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        rev = price_c * (100 - disc_c)
        is_promo = np.isin(b["l_partkey"].to_numpy(np.int64), promo)
        return pd.DataFrame(
            {"ym": ym, "promo_u": np.where(is_promo, rev, 0), "total_u": rev}
        )

    sums = F.grouped_agg(
        line.map_batches(fold, batch_format="pandas"),
        ["ym"],
        [("promo_u", "sum", "promo_u"), ("total_u", "sum", "total_u")],
    ).to_pandas()
    sums = sums.sort_values("ym").reset_index(drop=True)
    return pd.DataFrame(
        {
            "ym": sums["ym"].astype("int64"),
            "promo_share": np.round(
                100.0 * sums["promo_u"].to_numpy(np.float64) / sums["total_u"].to_numpy(np.float64),
                6,
            ),
        }
    )


_Q15_Q_START = "1996-01-01"
_Q15_Q_END = "1996-04-01"


def _q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (top supplier by quarterly revenue, ties kept): the
    revenue view folds map-side to one partial per (suppkey, batch), the
    grouped_agg output is supplier-sized, and the MAX + equality filter +
    name attach all run on that tiny aggregate — the classic
    aggregate-then-argmax two-pass, never a window over row-level data."""
    import pyarrow.dataset as pds_

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pds_.field("l_shipdate") >= pd.Timestamp(_Q15_Q_START))
        & (pds_.field("l_shipdate") < pd.Timestamp(_Q15_Q_END)),
    )

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        disc_c = np.round(b["l_discount"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame(
            {"l_suppkey": b["l_suppkey"].astype("int64"), "rev_u": price_c * (100 - disc_c)}
        )

    per_supp = F.grouped_agg(
        line.map_batches(fold, batch_format="pandas"), ["l_suppkey"], [("rev_u", "sum", "rev_u")]
    ).to_pandas()
    top = per_supp[per_supp["rev_u"] == per_supp["rev_u"].max()]
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    out = top.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    return pd.DataFrame(
        {
            "s_suppkey": out["s_suppkey"].astype("int64"),
            "s_name": out["s_name"],
            "total_revenue_u": out["rev_u"].astype("int64"),
        }
    ).sort_values("s_suppkey").reset_index(drop=True)


_Q18_QTY_THRESHOLD = 200


def _q_q18_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): per-order quantity folds
    map-side (the HAVING filter runs on the aggregate, which is
    orders-sized, BEFORE any join), the surviving keys broadcast-prune the
    orders scan, and the customer name attaches from a broadcast lookup.
    Quantity sums are exact int64 (testdata quantities are integral)."""
    line = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "qty": pc.cast(pc.round(b.column("l_quantity")), pa.int64()),
            }
        )

    per_order = F.grouped_agg(
        line.map_batches(to_int, batch_format="pyarrow"), ["l_orderkey"], [("qty", "sum", "total_qty")]
    )

    def keep_big(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("total_qty"), _Q18_QTY_THRESHOLD))

    # consumed twice (semi-join key set + the final attach join) and Ray has
    # no lineage cache — materialize the HAVING survivors once (keys+qty
    # only, a small fraction of the orders-sized aggregate)
    big = per_order.map_batches(keep_big, batch_format="pyarrow").materialize()
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    hits = F.broadcast_semi_join(orders, big, "o_orderkey", "l_orderkey")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    named = F.broadcast_lookup_join(hits, cust, "o_custkey", "c_custkey")
    joined = F.bucket_join(
        named,
        big,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        left_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "o_custkey": pa.int64(),
                "o_orderdate": pa.timestamp("us"),
                "o_totalprice": pa.float64(),
                "c_name": pa.string(),
            }
        ),
        right_schema=pa.schema({"l_orderkey": pa.int64(), "total_qty": pa.int64()}),
        # both sides are HAVING-survivor-sized (the qty filter keeps ~6% of
        # orders) — coalesce the exchange input; at 100 TB this knob scales
        # with the survivor count, not the corpus (grouped_agg docstring rule)
        reduce_blocks=16,
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_name": b["c_name"],
                "o_custkey": b["o_custkey"].astype("int64"),
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "o_orderdate": b["o_orderdate"],
                "totalprice_cents": np.round(
                    b["o_totalprice"].to_numpy(np.float64) * 100.0
                ).astype(np.int64),
                "total_qty": b["total_qty"].astype("int64"),
            }
        )

    return joined.map_batches(project, batch_format="pandas")


def _q_monthly_revenue_growth(sf_dir: str):
    """Month-over-month growth: the distributed part is ONE months-sized
    grouped_agg (map-side cents fold); the LAG + pct-change window runs on
    the driver over the ~tens-of-rows aggregate — the right altitude for a
    window over an aggregate whose domain is bounded by the calendar. First
    month (no predecessor) is excluded, keeping the result NULL-free."""
    orders = F.load(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(b["o_orderdate"])
        return pd.DataFrame(
            {
                "ym": (d.year * 100 + d.month).to_numpy(np.int64),
                "cents": np.round(b["o_totalprice"].to_numpy(np.float64) * 100.0).astype(np.int64),
            }
        )

    rev = (
        F.grouped_agg(
            orders.map_batches(fold, batch_format="pandas"), ["ym"], [("cents", "sum", "revenue_cents")]
        )
        .to_pandas()
        .sort_values("ym")
        .reset_index(drop=True)
    )
    prev = rev["revenue_cents"].shift(1)
    out = pd.DataFrame(
        {
            "ym": rev["ym"].astype("int64"),
            "revenue_cents": rev["revenue_cents"].astype("int64"),
            "growth_pct": np.round(
                100.0 * (rev["revenue_cents"] - prev) / prev, 6
            ),
        }
    )
    return out[prev.notna().to_numpy()].reset_index(drop=True)


def _q_user_cum_distinct_types(sf_dir: str):
    """Windowed cumulative DISTINCT count (no direct SQL form — rewritten
    as first-occurrence flag + running sum): per user, how many distinct
    event types seen up to and including each event, ordered by
    (ts, event_id). One bucketed exchange co-locates each user; both the
    flag and the cumsum are vectorized per bucket."""
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    out = F.window_cum_distinct(
        ds, "user_id", ["ts", "event_id"], "event_type", out_col="cum_types"
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["event_id", "user_id", "cum_types"]].astype("int64")

    return out.map_batches(project, batch_format="pandas")


def _q_distinctive_terms_by_lang(sf_dir: str):
    """Per-language distinctive vocabulary: log-likelihood ratio (Dunning
    1993 G²) of each (lang, token) 2x2 contingency vs the rest of the
    corpus, top-5 per language. Scale shape: (lang, token) counts from the
    vectorized grouped term-count combiner; token totals are a second
    token-domain aggregate joined back on the token (hash join — the token
    domain is corpus-vocabulary-sized, never broadcast); language totals
    (|langs| rows) broadcast; G² is computed vectorized per batch and only
    (lang, token, g2) reaches the per-group top-k prune."""
    ds = F.load(sf_dir, "documents", columns=["lang", "text"], num_blocks=16)
    counts = F_text.grouped_term_counts(ds, "lang", "text").materialize()
    tok_tot = F.grouped_agg(counts, ["token"], [("n", "sum", "n_tok")])
    lang_tot = (
        F.grouped_agg(counts, ["lang"], [("n", "sum", "n_lang")]).to_pandas()
    )
    grand = int(lang_tot["n_lang"].sum())
    lang_map = dict(zip(lang_tot["lang"], lang_tot["n_lang"].astype(int)))
    joined = F.bucket_join(
        counts,
        tok_tot,
        on=("token",),
        right_on=("token",),
        left_schema=pa.schema({"lang": pa.string(), "token": pa.string(), "n": pa.int64()}),
        right_schema=pa.schema({"token": pa.string(), "n_tok": pa.int64()}),
    )

    def g2(b: pd.DataFrame) -> pd.DataFrame:
        a = b["n"].to_numpy(np.float64)
        row = np.array([lang_map[x] for x in b["lang"]], dtype=np.float64)
        col = b["n_tok"].to_numpy(np.float64)
        n = float(grand)
        bb = row - a
        c = col - a
        d = n - row - col + a

        def term(x, e):
            return np.where(x > 0, x * np.log(np.where(x > 0, x, 1.0) / e), 0.0)

        g = 2.0 * (
            term(a, row * col / n)
            + term(bb, row * (n - col) / n)
            + term(c, (n - row) * col / n)
            + term(d, (n - row) * (n - col) / n)
        )
        # distinctive = OVER-represented in the language (a > expected)
        g = np.where(a * n > row * col, g, 0.0)
        return pd.DataFrame({"lang": b["lang"], "token": b["token"], "g2": np.round(g, 6)})

    scored = joined.map_batches(g2, batch_format="pandas")
    return F.grouped_topk(scored, "lang", "g2", 5, descending=True, tiebreak=["token"])


def _q_ppjoin_dup_pairs(sf_dir: str):
    """Prefix-filtered set-similarity self-join (SSJoin/PPJoin family) over
    3-word shingle sets at Jaccard >= 0.6 — lossless blocking (pigeonhole
    prefix bound), exact verification via two-sided hash join
    (functions/dedup.py prefix_filter_jaccard_pairs)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    pairs = F_dedup.prefix_filter_jaccard_pairs(
        ds, "doc_id", "text", threshold=0.6, shingle_w=3,
        # candidate set is ~0.04% of all pairs at bench scale — reducer-sized
        verify_reduce_blocks=16,
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id_a": b["id_a"].astype("int64"),
                "id_b": b["id_b"].astype("int64"),
                "jac": b["jac"].astype("float64"),
            }
        )

    return pairs.map_batches(project, batch_format="pandas")


_RRF_K = 60


def _q_rrf_doc_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval lists:
    BM25 top-20 for the fixed term set and the unigram-LM fluency top-20
    (avg micro-logprob per token). Each ranker runs in its own distributed
    pass (compact per-doc stats, never the text); the fusion itself is a
    driver-side fold over 20+20 rows. fused = Σ 1/(K + rank), missing-list
    docs contribute 0; top-10 by (fused desc, doc_id)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    bm = F_text.bm25_top_docs(ds, "doc_id", "text", _BM25_TERMS, k=20).to_pandas()
    bm = bm.sort_values(["bm25", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    bm["r"] = np.arange(1, len(bm) + 1)

    lm = F_text.unigram_logprob(ds, "doc_id", "text", vocab_size=20)

    def avg_lp(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("n_tokens"), 0))
        avg = pc.divide(
            pc.cast(b.column("lp_micro"), pa.float64()), pc.cast(b.column("n_tokens"), pa.float64())
        )
        return pa.table({"doc_id": b.column("doc_id"), "avg_lp": avg})

    fl = F.topk(
        lm.map_batches(avg_lp, batch_format="pyarrow"), "avg_lp", 20, descending=True, tiebreak=["doc_id"]
    ).to_pandas()
    fl = fl.sort_values(["avg_lp", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    fl["r"] = np.arange(1, len(fl) + 1)

    fused: dict[int, float] = {}
    for df in (bm, fl):
        for doc, r in zip(df["doc_id"].astype(int), df["r"]):
            fused[doc] = fused.get(doc, 0.0) + 1.0 / (_RRF_K + int(r))
    out = pd.DataFrame(
        {"doc_id": list(fused.keys()), "rrf": np.round(list(fused.values()), 6)}
    ).sort_values(["rrf", "doc_id"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


def _q_winsorized_event_values(sf_dir: str):
    """Per-group winsorization (feature-engineering clip at p05/p95): the
    exact per-type interpolated quantiles come from the bounded-group
    quantile pass (|types| rows), broadcast as plain floats; the clip is one
    vectorized pass. DuckDB's quantile_cont interpolator is replicated
    bit-for-bit (grouped_quantile_cont docstring)."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow").materialize()
    lo = F.grouped_quantile_cont(cents, "event_type", "cents", 0.05, out_col="lo").to_pandas()
    hi = F.grouped_quantile_cont(cents, "event_type", "cents", 0.95, out_col="hi").to_pandas()
    bounds = {
        t: (l, h)
        for t, l, h in zip(lo["event_type"], lo["lo"], hi.set_index("event_type").loc[lo["event_type"], "hi"])
    }

    def clip(b: pd.DataFrame) -> pd.DataFrame:
        lo_a = np.array([bounds[t][0] for t in b["event_type"]])
        hi_a = np.array([bounds[t][1] for t in b["event_type"]])
        w = np.minimum(np.maximum(b["cents"].to_numpy(np.float64), lo_a), hi_a)
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "event_type": b["event_type"],
                "w_cents": np.round(w, 6),
            }
        )

    return cents.map_batches(clip, batch_format="pandas")


def _q_event_type_daily_drift(sf_dir: str):
    """Distribution-drift monitor: Jensen-Shannon divergence between the
    event-type distributions of consecutive days. The distributed part is
    ONE (day, type) count aggregate (map-side combiner, days x |types|
    rows); the JSD fold runs on the driver over that tiny table — the right
    altitude for a calendar-bounded result. Natural log, round 6."""
    ds = F.load(sf_dir, "events", columns=["ts", "event_type"])

    def day_type(b: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(b.column("ts"), pa.int64()), 86400000000)
        return pa.table({"d": d, "event_type": b.column("event_type")})

    counts = (
        F.grouped_agg(
            ds.map_batches(day_type, batch_format="pyarrow"),
            ["d", "event_type"],
            [("event_type", "count", "n")],
        )
        .to_pandas()
        .astype({"d": "int64", "n": "int64"})
    )
    piv = counts.pivot_table(index="d", columns="event_type", values="n", fill_value=0, aggfunc="sum")
    piv = piv.sort_index()
    tot = piv.sum(axis=1).to_numpy(np.float64)
    probs = piv.to_numpy(np.float64) / tot[:, None]
    days = piv.index.to_numpy()
    rows = []
    for i in range(len(days) - 1):
        if days[i + 1] != days[i] + 1:
            continue
        p, q = probs[i], probs[i + 1]
        m = 0.5 * (p + q)
        pt = np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0) / m), 0.0)
        qt = np.where(q > 0, q * np.log(np.where(q > 0, q, 1.0) / m), 0.0)
        rows.append((int(days[i]), int(days[i + 1]), round(0.5 * pt.sum() + 0.5 * qt.sum(), 6)))
    return pd.DataFrame(rows, columns=["day_a", "day_b", "jsd"]).astype(
        {"day_a": "int64", "day_b": "int64", "jsd": "float64"}
    )


def _q_source_precedence_dedup(sf_dir: str):
    """Multi-source coalesce: among byte-identical documents arriving from
    several sources, keep the row from the highest-precedence (lexically
    smallest) source, doc_id tiebreak — the curated-over-crawl rule of
    LLM corpus assembly. Scale shape: exact_dedup's hash trick + the
    keep_latest map-side one-row-per-key-per-block prune; the shuffle moves
    (hash, source, doc_id) triples, never the text."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = F_dedup._text_hash64(batch.column("text").to_pylist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "__h": pa.array(h.astype(np.int64)),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    kept = F.keep_latest(hashed, "__h", ["source", "doc_id"], ascending=True)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "source": b["source"]})

    return kept.map_batches(project, batch_format="pandas")


def _q_copartitioned_revenue_join(sf_dir: str):
    """Zero-shuffle co-partitioned join (Hive/Spark bucketing re-expressed
    as hive-partitioned parquet): orders and lineitem are bucket-written
    ONCE by the same stable hash of the order key (cached — the 100 TB
    deal is pay-at-ingest, join-for-free), then revenue per order priority
    is computed by per-bucket local merges with NO exchange; each bucket
    task folds its join output to |priorities| partial rows before
    anything leaves the task."""
    import os

    import ray

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/trr_copart_{sf_name}"
    marker = f"{base}/_SUCCESS"
    if not os.path.isfile(marker):
        # a partial prior write (crash between the two write_bucketed calls)
        # must not survive: Ray's write_parquet APPENDS uniquely-named files
        # into an existing dir, so re-running over leftovers would silently
        # double-count — wipe and rebuild, then mark success atomically
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        F.write_bucketed(
            F.load(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]),
            f"{base}/orders",
            ["o_orderkey"],
            num_buckets=16,
        )
        line = F.load(
            sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
        )

        def to_cents(b: pa.Table) -> pa.Table:
            price_c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
            disc_c = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
            return pa.table(
                {
                    "o_orderkey": b.column("l_orderkey"),
                    "rev_u": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)),
                }
            )

        F.write_bucketed(
            line.map_batches(to_cents, batch_format="pyarrow"),
            f"{base}/lineitem",
            ["o_orderkey"],
            num_buckets=16,
        )
        with open(marker, "w") as fh:
            fh.write("ok")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", sort=False)["rev_u"].sum().reset_index()
        return g.rename(columns={"rev_u": "revenue_u"})

    joined = F.copartitioned_join(
        f"{base}/orders",
        f"{base}/lineitem",
        ["o_orderkey"],
        num_buckets=16,
        columns_left=["o_orderkey", "o_orderpriority"],
        columns_right=["o_orderkey", "rev_u"],
        fold=fold,
    )
    out = F.grouped_agg(joined, ["o_orderpriority"], [("revenue_u", "sum", "revenue_u")]).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True).astype(
        {"revenue_u": "int64"}
    )


def _q_skew_split_brand_revenue(sf_dir: str):
    """Skew-splitting hybrid join (functions/relational.py skew_split_join):
    revenue per part brand — lineitem folds to (partkey, rev_u) map-side,
    the probe's hottest partkeys (per-block count partials, never rows)
    take a broadcast map-side merge while the cold remainder takes the
    bucketed exchange; output identical to a plain join, so the split is
    pure execution strategy and the SQL oracle is the plain join."""
    line = F.load(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def fold(b: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "rev_u": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c)),
            }
        )

    part = F.load(sf_dir, "part", columns=["p_partkey", "p_brand"])
    # skew_split_join consumes the probe THREE times (hot-key counts, hot
    # split, cold split) and Ray has no lineage cache: materialize the
    # folded projection once — two int64 columns, 16 B/row, spill-safe
    folded = line.map_batches(fold, batch_format="pyarrow").materialize()
    joined = F.skew_split_join(
        folded,
        part,
        "l_partkey",
        "p_partkey",
        hot_keys=16,
        big_schema=pa.schema({"l_partkey": pa.int64(), "rev_u": pa.int64()}),
        small_schema=pa.schema({"p_partkey": pa.int64(), "p_brand": pa.string()}),
    )
    out = F.grouped_agg(joined, ["p_brand"], [("rev_u", "sum", "revenue_u")]).to_pandas()
    return out.sort_values("p_brand").reset_index(drop=True).astype({"revenue_u": "int64"})


def _q_q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape (forecast revenue change): pure filter + global sum —
    every predicate pushed into the parquet scan (row-group pruning), one
    int64 micro-unit partial per batch crosses to the driver. The canonical
    'is the scan path lean' probe."""
    import pyarrow.dataset as pds_

    line = F.load(
        sf_dir,
        "lineitem",
        columns=["l_extendedprice", "l_discount"],
        filter=(pds_.field("l_shipdate") >= pd.Timestamp("1996-01-01"))
        & (pds_.field("l_shipdate") < pd.Timestamp("1997-01-01"))
        & (pds_.field("l_discount") >= 0.05)
        & (pds_.field("l_discount") <= 0.07)
        & (pds_.field("l_quantity") < 24),
    )

    def partial(b: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        s = pc.sum(pc.multiply(price_c, disc_c)).as_py() or 0
        return pa.table({"rev_u": pa.array([s], pa.int64())})

    parts = line.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue_u": pd.Series([int(parts["rev_u"].sum())], dtype="int64")})


def _q_q16_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape (supplier variety per part group, with supplier
    exclusion): only the exclusion list (negative account balance — the
    'complaints' proxy, a small FILTERED subset) is broadcast; the
    partkey -> (brand, size) attach — `part` scales with the corpus, so a
    broadcast map would ship GBs per worker at 100x — runs as a bucketed
    co-shuffle join against the DISTINCT (partkey, suppkey) pairs (per-block
    distinct combiner shrinks lineitem ~7x before the exchange), then a
    second distinct collapses to (brand, size, suppkey) triples and a tiny
    grouped count finishes."""
    import ray

    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"])
    excl = supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy(np.int64)
    excl_ref = ray.put(np.sort(excl))
    line = F.load(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def drop_excluded(b: pa.Table) -> pa.Table:
        keep = ~np.isin(b.column("l_suppkey").to_numpy(), ray.get(excl_ref))
        return b.filter(pa.array(keep))

    # reduce_blocks=16: the per-block distinct combiner already shrinks the
    # stream to <= |distinct pairs| rows per block, so the coalesce is
    # reducer-sized at bench scales; at a true 100 TB part domain the knob
    # must grow with |part| or be dropped (grouped_agg's sizing rule)
    pairs = F.distinct_on(
        line.map_batches(drop_excluded, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"],
        reduce_blocks=16,
    )
    part = F.load(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    # explicit schemas: pairs' plan contains the distinct shuffle — letting
    # bucket_join call .schema() would execute that upstream twice
    joined = F.bucket_join(
        pairs,
        part,
        on=("l_partkey",),
        right_on=("p_partkey",),
        left_schema=pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
        right_schema=pa.schema(
            [("p_partkey", pa.int64()), ("p_brand", pa.string()), ("p_size", pa.int32())]
        ),
        reduce_blocks=16,  # both sides are distinct-pair / part-table sized
    )
    triples = F.distinct_on(
        joined.select_columns(["p_brand", "p_size", "l_suppkey"]),
        ["p_brand", "p_size", "l_suppkey"],
        reduce_blocks=16,
    )
    out = F.grouped_agg(
        triples, ["p_brand", "p_size"], [("l_suppkey", "count", "supplier_cnt")]
    ).to_pandas()
    return out.sort_values(["p_brand", "p_size"]).reset_index(drop=True).astype(
        {"p_size": "int64", "supplier_cnt": "int64"}
    )


_Q17_BRAND = "Brand#1"


def _q_q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue — the correlated
    subquery rewritten as aggregate + re-join): pass 1 folds per-partkey
    (sum_qty, n) for the brand's parts (combiner -> parts-sized aggregate,
    pulled and broadcast as 0.2*avg thresholds); pass 2 re-scans the
    brand's lineitems and sums the price of rows under their part's
    threshold. Two scans — inherent to the self-referential predicate —
    but the exchange moves only the parts-sized aggregate."""
    import ray

    part = pd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    brand_keys = np.sort(part.loc[part["p_brand"] == _Q17_BRAND, "p_partkey"].to_numpy(np.int64))
    keys_ref = ray.put(brand_keys)
    line = F.load(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def fold_qty(b: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        b = b[np.isin(b["l_partkey"].to_numpy(np.int64), keys)]
        return pd.DataFrame(
            {
                "l_partkey": b["l_partkey"].astype("int64"),
                "qty": np.round(b["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )

    folded = line.map_batches(fold_qty, batch_format="pandas")
    agg = F.grouped_agg(
        folded, ["l_partkey"], [("qty", "sum", "sum_qty"), ("n", "sum", "n")], reduce_blocks=16
    ).to_pandas()
    thr = pd.Series(
        0.2 * (agg["sum_qty"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64)),
        index=agg["l_partkey"].astype(int),
    )
    thr_ref = ray.put(thr)

    def small_rev(b: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        lim = b["l_partkey"].map(t).to_numpy(np.float64)
        q = b["l_quantity"].to_numpy(np.float64)
        mask = ~np.isnan(lim) & (q < lim)
        price_c = np.round(b["l_extendedprice"].to_numpy(np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame({"c": pd.Series([int(price_c[mask].sum())], dtype="int64")})

    parts = line.map_batches(small_rev, batch_format="pandas").to_pandas()
    total_c = int(parts["c"].sum())
    return pd.DataFrame(
        {"avg_yearly": pd.Series([round(total_c / 7.0, 6)], dtype="float64")}
    )


_BPE_MERGES = 30


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE merge learning (tokenizer training prep): one
    corpus pass collapses to the (word, count) vocabulary, 30 merges learned
    with deterministic lex tie-breaks (functions/textstats.py
    bpe_train_merges; both the driver-fold and distributed-iteration paths
    are pytest-verified against a naive reference). The DuckDB oracle
    replays the trainer outright: 30 unrolled CTE iterations of
    weighted-pair counting, (count DESC, pair ASC) argmax, and greedy
    left-to-right application via run-parity selection — value-matched,
    not rows-only."""
    ds = F.load(sf_dir, "documents", columns=["text"], num_blocks=16)
    return F_text.bpe_train_merges(ds, "text", _BPE_MERGES)


def _bpe_ctes(n_merges: int = _BPE_MERGES) -> list[str]:
    """Unrolled BPE-training replay (shared by the bpe_merges and
    bpe_encoded_docs oracles). Chain state v{i} = (word, symbol list,
    corpus count); each iteration counts adjacent pairs weighted by count,
    picks max-count/lex-smallest, and applies it greedily left-to-right.
    Greedy selection is exact via run parity: within every maximal run of
    consecutive match positions, positions at even offset from the run
    start merge, the rest are consumed (for left != right, matches are
    never adjacent and the rule degenerates to 'all match')."""
    parts = [
        "v0 AS MATERIALIZED (SELECT w, regexp_extract_all(w, '.') AS syms,"
        " CAST(COUNT(*) AS BIGINT) AS n FROM"
        " (SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents) GROUP BY w)",
    ]
    for i in range(n_merges):
        parts.append(
            f"x{i} AS MATERIALIZED (SELECT w, n, generate_subscripts(syms, 1) AS k,"
            f" unnest(syms) AS s FROM v{i})"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT a, b, SUM(n) AS cnt FROM"
            f" (SELECT n, s AS a, LEAD(s) OVER (PARTITION BY w ORDER BY k) AS b FROM x{i})"
            f" WHERE b IS NOT NULL GROUP BY a, b)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT a, b, cnt FROM p{i}"
            f" ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT w, n, k, s, COALESCE("
            f"s = (SELECT a FROM m{i}) AND"
            f" LEAD(s) OVER (PARTITION BY w ORDER BY k) = (SELECT b FROM m{i}), FALSE) AS hit"
            f" FROM x{i})"
        )
        parts.append(
            f"t{i} AS MATERIALIZED (SELECT w, k FROM (SELECT w, k,"
            f" (k - MIN(k) OVER (PARTITION BY w, grp)) % 2 AS par FROM"
            f" (SELECT w, k, k - ROW_NUMBER() OVER (PARTITION BY w ORDER BY k) AS grp"
            f" FROM h{i} WHERE hit)) WHERE par = 0)"
        )
        parts.append(
            f"v{i+1} AS MATERIALIZED (SELECT x.w,"
            f" list(CASE WHEN tk.k IS NOT NULL THEN x.s || (SELECT b FROM m{i})"
            f" ELSE x.s END ORDER BY x.k) AS syms, ANY_VALUE(x.n) AS n"
            f" FROM h{i} x"
            f" LEFT JOIN t{i} tk ON x.w = tk.w AND x.k = tk.k"
            f" LEFT JOIN t{i} dp ON x.w = dp.w AND x.k = dp.k + 1"
            f" WHERE dp.k IS NULL GROUP BY x.w)"
        )
    return parts


def _bpe_merges_oracle_sql(n_merges: int = _BPE_MERGES) -> str:
    sel = [
        f'SELECT CAST({i} AS BIGINT) AS rank, a AS "left", b AS "right",'
        f" CAST(cnt AS BIGINT) AS pair_count FROM m{i}"
        for i in range(n_merges)
    ]
    return "WITH " + ",\n".join(_bpe_ctes(n_merges)) + "\n" + "\nUNION ALL\n".join(sel)


def _bpe_encoded_oracle_sql(n_merges: int = _BPE_MERGES) -> str:
    """Encode half: the final vocabulary state maps every distinct word to
    its subword count (the encoder's lowest-rank-first loop is pytest-proved
    identical to the trainer's sequential replay), so per-doc token counts
    are one occurrence join + sum."""
    parts = _bpe_ctes(n_merges)
    parts.append(f"wl AS MATERIALIZED (SELECT w, len(syms) AS nt FROM v{n_merges})")
    parts.append(
        "dt AS MATERIALIZED (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w"
        " FROM documents)"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT d.doc_id, CAST(COALESCE(SUM(j.nt), 0) AS BIGINT) AS n_bpe_tokens\n"
        "FROM documents d LEFT JOIN"
        " (SELECT dt.doc_id, wl.nt FROM dt JOIN wl USING (w)) j\n"
        "ON d.doc_id = j.doc_id GROUP BY d.doc_id"
    )


def _q_event_value_collision_pairs(sf_dir: str):
    """General THETA join (no equality component): cross-USER pairs of
    high-value events whose amounts collide within 2 cents — the
    1-Bucket-Theta grid (functions/relational.theta_join, Okcan & Riedewald
    2011): both sides hash to grid blocks and replicate along their row /
    column, each cell scans its chunked local cross product; no
    broadcastable side, skew-immune by construction. Value filter pushed
    into the parquet scan."""
    from tesseract_recognize_ray.functions.relational import theta_join

    ds = F.load(
        sf_dir,
        "events",
        columns=["event_id", "user_id", "value"],
        filter=pc.field("value") > 150.0,
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "c": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
            }
        )

    e = ds.map_batches(cents, batch_format="pyarrow").materialize()  # both theta sides

    def pred(m: pd.DataFrame) -> np.ndarray:
        return (m["user_id"].to_numpy() < m["user_id_r"].to_numpy()) & (
            np.abs(m["c"].to_numpy() - m["c_r"].to_numpy()) <= 2
        )

    out = theta_join(e, e, pred, grid=(8, 8)).to_pandas()
    return pd.DataFrame(
        {
            "id_a": out["event_id"].astype("int64"),
            "id_b": out["event_id_r"].astype("int64"),
            "diff_cents": (out["c"] - out["c_r"]).abs().astype("int64"),
        }
    )


def _q_cross_corpus_near_dups(sf_dir: str):
    """Cross-RUN near-dup detection: docs with doc_id >= 100 play the
    accumulated corpus (persisted MinHash-LSH index: band rows partitioned
    by the composite band-group, signatures by stable id hash), docs < 100
    play the new crawl shard — query_lsh_index reads ONLY the band-group
    partitions the shard's hashes probe and the sig partitions of paired
    ids. Seed-deterministic, so the DuckDB oracle replays the joint banding
    chain and keeps the old x new pairs (value-match proves the persisted
    index finds EXACTLY what in-job joint banding finds)."""
    import os

    from tesseract_recognize_ray.functions.dedup import build_lsh_index, query_lsh_index

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    new = ds.filter(expr="doc_id < 100")
    # the index persists BY DESIGN (that is the operator's point: the
    # accumulated corpus is hashed once, every later shard queries it);
    # cache per sf_dir like _pagexml_cached — rm -rf /tmp/trr_* invalidates
    idx = f"/tmp/trr_lshidx_{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.exists(os.path.join(idx, "meta.json")):
        old = ds.filter(expr="doc_id >= 100")
        build_lsh_index(old, "doc_id", "text", idx)
    out = query_lsh_index(new, "doc_id", "text", idx, min_est=0.5)
    return pd.DataFrame(
        {
            "id_old": out["id_old"].astype("int64"),
            "id_new": out["id_new"].astype("int64"),
            "est_jaccard": out["est_jaccard"].astype("float64"),
        }
    )


def _q_bpe_encoded_docs(sf_dir: str):
    """Tokenizer ENCODE half (train -> encode -> pack): the 30 merges
    learned by bpe_merges applied back over the corpus on an actor pool
    with a persistent word->tokens cache (merges ray.put once). The oracle
    replays training to the final vocabulary state in unrolled CTEs and
    joins word -> subword count per occurrence — sound because the
    encoder's lowest-rank-first loop is provably identical to the trainer's
    sequential replay (pytest-gated:
    tests/test_round3.py::test_bpe_encode_matches_trainer_vocab)."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    merges = F_text.bpe_train_merges(ds, "text", _BPE_MERGES)
    out = F_text.bpe_encode(ds, "text", merges)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "n_bpe_tokens": b["n_bpe_tokens"].astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_image_phash_near_dups(sf_dir: str):
    """Multimodal near-duplicate image pairs: 64-bit aHash on the actor
    pool, then pigeonhole hamming banding (max_hamming+1 bands — any pair
    within distance 4 must agree exactly on one band), participant-pruned
    verification. Rows-only (images are not SQL-expressible); the banding
    operator is pytest-verified lossless vs brute force."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.multimodal import phash_near_dups

    paths = _corpus()
    ds = rd.read_parquet(paths["media"], columns=["media_ref", "bytes", "n_pages"]).filter(
        expr="n_pages == 1"
    )
    out = phash_near_dups(ds, "media_ref", max_hamming=4)
    return out.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _q_simhash_near_dups(sf_dir: str):
    """SimHash near-duplicate pairs at hamming <= 3 (Charikar 2002 + the
    pigeonhole band blocking): 64-bit sign-sum fingerprints per doc, 4-band
    exact-agreement candidates, popcount verification. md5 token hashing
    makes the fingerprints SQL-replayable, so the DuckDB oracle brute-forces
    all pairs with bit_count(xor(...)) <= 3 — value-checking BOTH the
    fingerprint math and the losslessness of the banding."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)
    hashed = F_dedup.simhash64(ds, "doc_id", "text", hash_fn="md5")

    def to_int(b: pd.DataFrame) -> pd.DataFrame:
        # simhash64 emits hex (uint64-portable); banding wants int64 bits
        h = np.array([int(s, 16) for s in b["simhash"]], dtype=np.uint64).view(np.int64)
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "sh": h})

    out = F_dedup.hamming_near_dups(
        hashed.map_batches(to_int, batch_format="pandas"), "doc_id", "sh", max_hamming=3
    )
    df = out.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # bucket_truncated is an operational flag SQL cannot replay; the oracle
    # brute-force is exhaustive, so a truncated bucket would surface as a
    # row-count mismatch anyway.
    return df[["id_a", "id_b", "hamming"]].astype("int64")


def _q_ann_pq(sf_dir: str):
    """Similarity search, compressed path: product-quantization ANN
    (Jégou et al. 2011) — seeded per-subspace codebooks from a bounded
    sample, the corpus encoded ONCE to 8 uint8 bytes/vector (16:1 vs
    float32x64; only the code table is scanned at query time), ADC
    table-lookup scoring with per-block prune. Approximate by design —
    rows-only; recall + determinism pytest-gated."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries_m = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    ds = ds.materialize()  # consumed by train-sample, encode, and re-rank
    books = F_sim.train_pq_codebooks(ds, "embedding", m=16, ksub=256)
    codes = F_sim.pq_encode(ds, "vec_id", "embedding", books)
    res = F_sim.pq_topk_rerank(ds, codes, "vec_id", "embedding", books, queries_m, k=_ANN_K, shortlist=10 * _ANN_K)
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_idx", "vec_id", "rank"]].astype("int64")


_LOGREG_FEATURES = ["f_len", "f_tokens", "f_avg_tok", "f_digit"]


def _q_doc_quality_logreg(sf_dir: str):
    """Distributed quality-classifier training (functions/ml.py): full-batch
    logistic regression predicting lang=='en' from four cheap text features
    — each of the 40 passes ships ONE (d+1)-float gradient partial per
    block, parameters broadcast per pass; features materialized once.
    Rows-only (iterative — not SQL); the trainer is pytest-verified
    bit-close against a single-process reference of the same algorithm.
    (On this synthetic corpus the text stats carry ~no language signal, so
    the learned coefficients honestly land near zero with the intercept at
    the class-prior logit — the separability pytest is the learning
    check.)"""
    from tesseract_recognize_ray.functions import ml as F_ml

    ds = F.load(sf_dir, "documents", columns=["lang", "text", "n_chars"], num_blocks=16)

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        return _logreg_feats_batch(b, r"\d", ws_normalize=False)

    fds = ds.map_batches(feats, batch_format="pandas").materialize()
    model = F_ml.logreg_train(fds, _LOGREG_FEATURES, "y", iters=40, lr=0.5, l2=1e-3)
    return pd.DataFrame(
        {
            "feature": _LOGREG_FEATURES + ["__intercept__"],
            "coef": np.round(np.append(model["coef"], model["intercept"]), 6),
        }
    )


_LOGREG_X_ITERS = 20


def _q_doc_quality_logreg_exact(sf_dir: str):
    """Quality-classifier training under the SQL-replay contract: the same
    full-batch logistic regression as doc_quality_logreg but with mean/std
    and the weight vector ROUNDED to e6 after every GD step (round_digits=6
    — the kmeans_lloyd idiom), so an unrolled 20-iteration CTE oracle
    replays the whole training trajectory. Coefficients emit as exact e6
    integers. The float variant stays as the unconstrained path."""
    from tesseract_recognize_ray.functions import ml as F_ml

    ds = F.load(sf_dir, "documents", columns=["lang", "text", "n_chars"], num_blocks=16)
    return _q_doc_quality_logreg_exact_from_df(ds)


def _logreg_feats_batch(b: pd.DataFrame, digit_pattern: str, ws_normalize: bool) -> pd.DataFrame:
    """Shared feature extraction for both logreg variants. The exact-SQL
    twin passes digit_pattern='[0-9]' (the ASCII class DuckDB's RE2 also
    means) and ws_normalize=True (exotic whitespace -> ' ' per
    ml.WS_NORM_PY, so pandas str.split() == SQL '\\s+' on any input); the
    float variant keeps Python's \\d / native split semantics."""
    if not len(b):  # empty-block schema-loss guard (Ray 2.49)
        return pd.DataFrame(
            {c: pd.Series([], dtype="float64") for c in _LOGREG_FEATURES}
            | {"y": pd.Series([], dtype="int64")}
        )
    texts = b["text"].fillna("")
    if ws_normalize:
        from tesseract_recognize_ray.functions.ml import WS_NORM_PY

        texts = texts.str.replace(WS_NORM_PY, " ", regex=True)
    n_tok = texts.str.split().str.len().to_numpy(np.float64)
    n_chr = b["n_chars"].to_numpy(np.float64)
    digits = texts.str.count(digit_pattern).to_numpy(np.float64)
    return pd.DataFrame(
        {
            "f_len": n_chr,
            "f_tokens": n_tok,
            "f_avg_tok": n_chr / np.maximum(n_tok, 1.0),
            "f_digit": digits / np.maximum(n_chr, 1.0),
            "y": (b["lang"] == "en").astype("int64"),
        }
    )


def _q_doc_quality_logreg_exact_from_df(ds):
    from tesseract_recognize_ray.functions import ml as F_ml

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        return _logreg_feats_batch(b, r"[0-9]", ws_normalize=True)

    fds = ds.map_batches(feats, batch_format="pandas").materialize()
    model = F_ml.logreg_train(
        fds, _LOGREG_FEATURES, "y", iters=_LOGREG_X_ITERS, lr=0.5, l2=1e-3, round_digits=6
    )
    coefs = np.append(model["coef"], model["intercept"])
    return pd.DataFrame(
        {
            "feature": _LOGREG_FEATURES + ["__intercept__"],
            "coef_e6": np.round(coefs * 1e6).astype(np.int64),
        }
    )


def _logreg_exact_oracle_sql(iters: int = _LOGREG_X_ITERS, lr: float = 0.5, l2: float = 1e-3) -> str:
    """Unrolled GD: w{i+1} = ROUND(w{i} - lr*(grad/n + l2*w{i}), 6). The
    standardized features are bit-identical across engines (same rounded
    mean/std, same IEEE divides); sigmoid/sum wobble (~1e-13) is crushed by
    the per-step e6 rounding — the kmeans-oracle error argument."""
    names = ["f_len", "f_tokens", "f_avg_tok", "f_digit"]
    from tesseract_recognize_ray.functions.ml import WS_NORM_RE2

    ntext = f"regexp_replace(COALESCE(text, ''), '{WS_NORM_RE2}', ' ', 'g')"
    ntoks = f"CAST(len(list_filter(string_split_regex({ntext}, '\\s+'), t -> t <> '')) AS DOUBLE)"
    parts = [
        f"""f AS MATERIALIZED (
  SELECT CAST(n_chars AS DOUBLE) AS x1r,
         {ntoks} AS x2r,
         CAST(n_chars AS DOUBLE) / GREATEST({ntoks}, 1.0) AS x3r,
         CAST(length(regexp_replace(COALESCE(text, ''), '[^0-9]', '', 'g')) AS DOUBLE)
             / GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS x4r,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents)""",
        "st AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n,"
        + ", ".join(
            f"ROUND(AVG(x{i}r), 6) AS m{i},"
            f" ROUND(SQRT(GREATEST(SUM(x{i}r * x{i}r) / COUNT(*) - ROUND(AVG(x{i}r), 6) ^ 2, 1e-12)), 6) AS s{i}"
            for i in range(1, 5)
        )
        + " FROM f)",
        "x AS MATERIALIZED (SELECT "
        + ", ".join(f"(f.x{i}r - st.m{i}) / st.s{i} AS x{i}" for i in range(1, 5))
        + ", f.y FROM f CROSS JOIN st)",
        "w0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4, 0.0 AS b)",
    ]
    # every per-iteration CTE is MATERIALIZED: each is referenced 5+ times
    # downstream and un-materialized inlining re-evaluates the whole chain
    # per reference — a 5^iters blowup
    for i in range(iters):
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT "
            + ", ".join(f"SUM(x{j} * d) AS g{j}" for j in range(1, 5))
            + ", SUM(d) AS gb FROM ("
            "SELECT x.*, (1.0 / (1.0 + EXP(-(x.x1 * w.w1 + x.x2 * w.w2 + x.x3 * w.w3"
            f" + x.x4 * w.w4 + w.b))) - x.y) AS d FROM x CROSS JOIN w{i} w))"
        )
        parts.append(
            f"w{i+1} AS MATERIALIZED (SELECT "
            + ", ".join(
                f"ROUND(w.w{j} - {lr} * (g.g{j} / st.n + {l2} * w.w{j}), 6) AS w{j}"
                for j in range(1, 5)
            )
            + f", ROUND(w.b - {lr} * (g.gb / st.n), 6) AS b"
            f" FROM w{i} w CROSS JOIN g{i} g CROSS JOIN st)"
        )
    finals = " UNION ALL ".join(
        f"SELECT '{names[j-1]}' AS feature, CAST(ROUND(w{j} * 1e6) AS BIGINT) AS coef_e6 FROM w{iters}"
        for j in range(1, 5)
    )
    finals += (
        f" UNION ALL SELECT '__intercept__' AS feature,"
        f" CAST(ROUND(b * 1e6) AS BIGINT) AS coef_e6 FROM w{iters}"
    )
    return "WITH " + ",\n".join(parts) + "\n" + finals


_ANN_FILTER_LABEL = 2


def _q_ann_filtered(sf_dir: str):
    """Filtered vector search (the predicate + top-k idiom every vector
    store exposes): exact cosine top-k among rows with label == 2 — the
    label predicate is pushed INTO the parquet scan (row-group pruning +
    never decoding non-matching vectors), then the standard broadcast-query
    brute-force prune. Integer ranks only, fully SQL-oracled."""
    import pyarrow.dataset as pds_

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries_m = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    ds = F.load(
        sf_dir,
        "embeddings",
        columns=["vec_id", "embedding"],
        filter=pds_.field("label") == _ANN_FILTER_LABEL,
    )
    res = F_sim.brute_force_topk(ds, "vec_id", "embedding", queries_m, k=_ANN_K)
    res["query_id"] = qids[res["query_idx"].to_numpy()]
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_id", "vec_id", "rank"]].astype("int64")


_LATE_US = 1_800_000_000  # 30 min allowed lateness


def _q_late_event_flags(sf_dir: str):
    """Streaming watermark simulation over the batch table: the watermark
    is the running MAX event-time in ARRIVAL order (event_id) — a
    distributed global prefix scan (relational.global_cummax: sampled
    range partitioning, per-range max fold, broadcast prefix seed) — and
    an event is late when it trails the watermark by more than the allowed
    lateness. Exact int64 epoch-µs end-to-end."""
    ds = F.load(sf_dir, "events", columns=["event_id", "ts"])

    def to_us(b: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": b.column("event_id"), "ts_us": pc.cast(b.column("ts"), pa.int64())}
        )

    wm = F.global_cummax(ds.map_batches(to_us, batch_format="pyarrow"), ["event_id"], "ts_us", out_col="wm_us")

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "wm_us": b["wm_us"].astype("int64"),
                "late": (b["wm_us"] - b["ts_us"] > _LATE_US).astype("int64"),
            }
        )

    return wm.map_batches(flag, batch_format="pandas")


def _q_running_revenue_total(sf_dir: str):
    """Global running revenue total in (orderdate, orderkey) order — the
    distributed prefix-sum scan (relational.global_cumsum: range-partition
    on the order column, exact int64 prefix offsets, per-range local
    cumsum). The classic 'cumulative bookings' report, exact cents."""
    ds = F.load(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "d_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    out = F.global_cumsum(
        ds.map_batches(prep, batch_format="pyarrow"), ["d_us", "o_orderkey"], "cents", out_col="run_cents"
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return b[["o_orderkey", "run_cents"]].astype("int64")

    return out.map_batches(project, batch_format="pandas")


def _q_user_value_p90_approx(sf_dir: str):
    """Per-USER approximate p50/p90 of event value — the unbounded-key-
    domain quantile path (sketches.grouped_histogram_quantile): per-key
    state is <= nbins bin counts REGARDLESS of group size, so a hot user
    never has to fit one worker (the exact grouped_quantile family's
    documented bound). Error <= one bin width and DETERMINISTIC (exact
    global extremes, exact integer per-(key, bin) counts, fixed
    interpolation) — so the oracle replays the whole sketch per key in SQL
    with identical float op order and value-matches; the bin-width error
    bound stays pytest-gated."""
    from tesseract_recognize_ray.functions import sketches as F_sk

    ds = F.load(sf_dir, "events", columns=["user_id", "value"])
    out = F_sk.grouped_histogram_quantile(ds, "user_id", "value", [0.5, 0.9], nbins=1024)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "q": b["q"].astype("float64"),
                "value": b["value"].to_numpy(np.float64),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_event_last_order_asof(sf_dir: str):
    """CROSS-TABLE as-of join (DuckDB's native ASOF JOIN as oracle): each
    event picks the same user's most recent order at or before the event
    time. The order side is first compacted to one row per (user, date)
    with keep_latest (ties would make ASOF nondeterministic on both
    engines), then the bucketed merge_asof runs one vectorized pass per
    co-located key bucket; unmatched events drop (inner ASOF)."""
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("o_custkey"),
                "ts": b.column("o_orderdate"),
                "ok": b.column("o_orderkey"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    right = F.keep_latest(
        orders.map_batches(o_prep, batch_format="pyarrow"), ["user_id", "ts"], ["ok"]
    )
    events = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = F.asof_join(
        events,
        right,
        "user_id",
        "ts",
        left_cols=["event_id", "user_id", "ts"],
        right_cols=["user_id", "ts", "ok", "cents"],
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["ok"].notna()]
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "ok": pd.to_numeric(b["ok"]).astype("int64"),
                "cents": pd.to_numeric(b["cents"]).astype("int64"),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_ann_ivf_pq(sf_dir: str):
    """IVF-PQ similarity search (coarse cells + 16-byte ADC codes + exact
    shortlist re-rank — the canonical billion-scale ANN layout; see
    similarity.ivf_pq_topk): the one-shot form now ALSO goes through the
    cell-partitioned parquet index, so only probed cells' partitions are
    read even here; at most |queries| x shortlist float vectors re-read.
    Approximate by design — rows-only; recall pytest-gated."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries_m = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16).materialize()
    res = F_sim.ivf_pq_topk(
        ds, "vec_id", "embedding", queries_m, k=_ANN_K,
        n_centroids=32, nprobe=16, m=16, ksub=256, shortlist=10 * _ANN_K,
    )
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_idx", "vec_id", "rank"]].astype("int64")


def _q_ann_ivf_pq_indexed(sf_dir: str):
    """IVF-PQ against the PERSISTED cell-partitioned index (round-4 scale
    fix): build_ivf_pq_index writes (id, cell, 16-byte code) parquet
    hive-partitioned by cell once per corpus; the query reads ONLY its
    probed cells' partitions (directory pruning — the unprobed codes never
    leave storage) and exact-re-ranks the shortlist from one
    participant-pruned float pass. No SQL oracle — approximate by design;
    recall + pruning pytest-gated."""
    import os

    from tesseract_recognize_ray.functions.similarity import (
        build_ivf_pq_index,
        ivf_pq_topk_indexed,
    )

    # cache key includes the source file's size+mtime: a regenerated corpus
    # under the same path must NOT silently reuse the old index
    st = os.stat(f"{sf_dir}/embeddings.parquet")
    idx_dir = (
        f"/tmp/trr_ivfpq_index_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{st.st_size}_{int(st.st_mtime)}"
    )
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    if not os.path.exists(os.path.join(idx_dir, "codebooks.npy")):
        build_ivf_pq_index(
            ds.materialize(), "vec_id", "embedding", idx_dir, n_centroids=32, m=16, ksub=256
        )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < _ANN_NQ].sort_values("vec_id")
    queries_m = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    res = ivf_pq_topk_indexed(
        idx_dir, ds, "vec_id", "embedding", queries_m, k=_ANN_K, nprobe=16, shortlist=10 * _ANN_K
    )
    res["rank"] = res.groupby("query_idx").cumcount() + 1
    return res[["query_idx", "vec_id", "rank"]].astype("int64")


def _q_zorder_pruned_events(sf_dir: str):
    """Z-order (Morton) clustered layout: events are written ONCE sorted by
    the interleaved-bit key of (user_id, ts) — row-group stats then prune
    selective filters on EITHER column, where a plain sort would prune only
    its leading column (relational.write_zordered; the both-dims pruning
    property is pytest-asserted against a random layout). This query scans
    the clustered copy with a user_id range pushed into the read and
    aggregates exact cents; the oracle is the same filter on the logical
    table — Z-ordering is purely physical."""
    import os

    import pyarrow.dataset as pds_

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/trr_zorder_{sf_name}"
    marker = f"{base}/_SUCCESS"
    if not os.path.isfile(marker):
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        ev = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_id": b.column("event_id"),
                    "user_id": b.column("user_id"),
                    "ts_us": pc.cast(b.column("ts"), pa.int64()),
                    "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64()),
                }
            )

        F.write_zordered(ev.map_batches(prep, batch_format="pyarrow"), base, ["user_id", "ts_us"])
        with open(marker, "w") as fh:
            fh.write("ok")

    import ray.data as rd

    ds = rd.read_parquet(
        base, columns=["user_id", "cents"],
        filter=(pds_.field("user_id") >= 100) & (pds_.field("user_id") < 120),
    )
    out = F.grouped_agg(
        ds, ["user_id"], [("cents", "sum", "total_cents"), ("cents", "count", "n_events")]
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True).astype("int64")


def _q_label_intra_variance(sf_dir: str):
    """Cluster-compactness analysis: per-label total intra-class variance
    (trace of the per-label covariance) from (n, Σx, Σx²) moment partials —
    2·64+1 doubles per (block, label), never vectors
    (similarity.grouped_embedding_variance). The oracle replays it as a
    per-dimension var_pop lattice summed per label."""
    ds = F.load(sf_dir, "embeddings", columns=["label", "embedding"])
    out = F_sim.grouped_embedding_variance(ds, "label", "embedding").to_pandas()
    return pd.DataFrame(
        {
            "label": out["label"].astype("int64"),
            "n": out["n"].astype("int64"),
            "tr_var": np.round(out["tr_var"].to_numpy(np.float64), 6),
        }
    ).sort_values("label").reset_index(drop=True)


def _q_label_between_variance(sf_dir: str):
    """The other half of the Fisher decomposition: per-label between-class
    scatter n_k·||μ_k − μ||² from the centroid aggregate (labels × dim
    doubles on the driver — label domain is bounded; the corpus ships only
    the embedding_centroids moment partials). Together with
    label_intra_variance this gives the class-separability diagnostic."""
    ds = F.load(sf_dir, "embeddings", columns=["label", "embedding"])
    cents = F_sim.embedding_centroids(ds, "label", "embedding").to_pandas()
    mu_k = np.stack(cents["centroid"].to_numpy())
    n_k = cents["n"].to_numpy(np.float64)
    grand = (mu_k * n_k[:, None]).sum(0) / n_k.sum()
    between = n_k * ((mu_k - grand) ** 2).sum(1)
    return pd.DataFrame(
        {
            "label": cents["label"].astype("int64"),
            "n": cents["n"].astype("int64"),
            "between": np.round(between, 6),
        }
    ).sort_values("label").reset_index(drop=True)


# ------------------------------------------------- round-4 oracled additions


def _q_sliding_distinct_users(sf_dir: str):
    """Sliding-window COUNT(DISTINCT): per event day, distinct users active
    in the trailing 7 days (day + 6 before). SQL has no COUNT(DISTINCT)
    OVER RANGE, so the distributed rewrite is expand-join: collapse to
    distinct (day, user) pairs FIRST (combiner groupby — the x7 expansion
    then works on |users x active-days| rows, not |events|), replicate each
    pair to the <=7 window days it can serve (np.repeat map-side, pruned
    against the tiny broadcast day set), then dedupe + count with two more
    combiner groupbys. Only (int64, int64) pairs ever shuffle; window width
    bounds the expansion factor independent of data size."""
    import ray

    ds = F.load(sf_dir, "events", columns=["user_id", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(b.column("ts"), pa.int64()), 86_400_000_000)
        return pa.table({"day_no": day, "user_id": b.column("user_id")})

    du = F.grouped_agg(
        ds.map_batches(to_day, batch_format="pyarrow"),
        ["day_no", "user_id"],
        [("user_id", "count", "__c")],
    ).select_columns(["day_no", "user_id"]).materialize()

    days = (
        F.grouped_agg(du, ["day_no"], [("day_no", "count", "__c")])
        .to_pandas()["day_no"]
        .to_numpy(np.int64)
    )
    days_ref = ray.put(np.sort(days))

    def expand(b: pa.Table) -> pa.Table:
        dayset = ray.get(days_ref)
        d = b.column("day_no").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        tgt = (d[:, None] + np.arange(7, dtype=np.int64)[None, :]).ravel()
        uu = np.repeat(u, 7)
        keep = np.isin(tgt, dayset)
        return pa.table(
            {"day_no": pa.array(tgt[keep], pa.int64()), "user_id": pa.array(uu[keep], pa.int64())}
        )

    dedup = F.grouped_agg(
        du.map_batches(expand, batch_format="pyarrow"),
        ["day_no", "user_id"],
        [("user_id", "count", "__c")],
    )
    return F.grouped_agg(dedup, ["day_no"], [("user_id", "count", "n_users")])


def _q_type_audience_overlap(sf_dir: str):
    """Audience-overlap (bitmap-intersection) matrix: for every unordered
    pair of event types, how many distinct users did both, plus the union
    size. The classic segment-overlap computation: collapse to the distinct
    (user, type) bitmap rows with one combiner groupby, self-join on user
    via the bucketed exchange (each user's <=|types| rows co-locate once),
    count pairs, and attach per-type totals from a tiny driver map —
    union = |A| + |B| - inter, no second shuffle."""
    ds = F.load(sf_dir, "events", columns=["user_id", "event_type"])
    du_schema = pa.schema({"user_id": pa.int64(), "event_type": pa.string()})
    du = (
        F.grouped_agg(ds, ["user_id", "event_type"], [("user_id", "count", "__c")])
        .select_columns(["user_id", "event_type"])
        .materialize()
    )
    joined = F.bucket_join(
        du, du, on=("user_id",), left_schema=du_schema, right_schema=du_schema,
        reduce_blocks=16,
    )

    def ordered(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("event_type"), b.column("event_type_r"))
        f = b.filter(m)
        return pa.table({"type_a": f.column("event_type"), "type_b": f.column("event_type_r")})

    pairs = F.grouped_agg(
        joined.map_batches(ordered, batch_format="pyarrow"),
        ["type_a", "type_b"],
        [("type_a", "count", "inter_users")],
        reduce_blocks=8,
    )
    tot = F.grouped_agg(du, ["event_type"], [("user_id", "count", "n")]).to_pandas()
    sizes = dict(zip(tot["event_type"], tot["n"].astype("int64")))

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        na = b["type_a"].map(sizes).astype("int64")
        nb = b["type_b"].map(sizes).astype("int64")
        b["union_users"] = na + nb - b["inter_users"].astype("int64")
        return b

    return pairs.map_batches(attach, batch_format="pandas")


_Q4_LO, _Q4_HI = "1997-07-01", "1997-10-01"


def _q_q4_order_priority(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS rewrite: orders in a quarter that have at
    least one lineitem shipped after the order date, counted by priority.
    EXISTS(l_shipdate > o_orderdate) folds to MAX(l_shipdate) per order
    (combiner groupby over lineitem — one row per orderkey enters the
    join), bucketed join against the scan-pruned quarter of orders, then a
    5-row count. No row-level semi-join traffic."""
    lo = pa.scalar(np.datetime64(_Q4_LO, "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(_Q4_HI, "us"), pa.timestamp("us"))
    orders = F.load(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    )
    li = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    mx = F.grouped_agg(li, ["l_orderkey"], [("l_shipdate", "max", "max_ship")])
    joined = F.bucket_join(
        orders,
        mx,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
        left_schema=pa.schema(
            {
                "o_orderkey": pa.int64(),
                "o_orderdate": pa.timestamp("us"),
                "o_orderpriority": pa.string(),
            }
        ),
        right_schema=pa.schema({"l_orderkey": pa.int64(), "max_ship": pa.timestamp("us")}),
    )

    def late(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b.column("max_ship"), b.column("o_orderdate")))

    return F.grouped_agg(
        joined.map_batches(late, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("o_orderkey", "count", "order_count")],
        reduce_blocks=4,
    )


_Q21_LATE_US = 60 * 86_400_000_000  # ship > orderdate + 60 days = "late"


def _q_q21_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped blame assignment (adapted to this schema: "late" =
    shipped >60 days after the order date, status-F orders): suppliers who
    were the ONLY late supplier on a multi-supplier order. No per-group
    Python anywhere: lineitem collapses map-side to (order, supp,
    MAX(shipdate)) BEFORE the orders join (any-late == max-ship late), then
    per order count/late-count plus SUM(suppkey*late) — when exactly one
    supplier is late that sum IS its key, so the single-late filter and the
    blame attach need no extra join — then count per supplier, name attach
    via a reducer-sized bucketed join, top 20."""
    orders = F.load(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_orderdate"],
        filter=pc.field("o_orderstatus") == "F",
    )
    li = F.load(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    # any(ship > od + 60d) == max(ship) > od + 60d: collapse lineitem to ONE
    # row per (order, supplier) with the map-side combiner BEFORE the orders
    # join, so the join exchange ships the collapsed stream (~7x fewer rows)
    # instead of full lineitem, and the post-join per-(order, supp) groupby
    # disappears entirely
    per_pair = F.grouped_agg(
        li,
        ["l_orderkey", "l_suppkey"],
        [("l_shipdate", "max", "max_ship")],
        reduce_blocks=16,  # combined partials are distinct-(order,supp) sized
    )
    joined = F.bucket_join(
        per_pair,
        orders,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema(
            {"l_orderkey": pa.int64(), "l_suppkey": pa.int64(), "max_ship": pa.timestamp("us")}
        ),
        right_schema=pa.schema({"o_orderkey": pa.int64(), "o_orderdate": pa.timestamp("us")}),
        reduce_blocks=16,
    )

    def flag(b: pa.Table) -> pa.Table:
        ship = pc.cast(b.column("max_ship"), pa.int64())
        od = pc.cast(b.column("o_orderdate"), pa.int64())
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "late": pc.greater(ship, pc.add(od, _Q21_LATE_US)),
            }
        )

    per_supp = joined.map_batches(flag, batch_format="pyarrow")

    def widen(b: pa.Table) -> pa.Table:
        li_ = pc.cast(b.column("late"), pa.int64())
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "late_i": li_,
                "supp_late": pc.multiply(b.column("l_suppkey"), li_),
            }
        )

    per_order = F.grouped_agg(
        per_supp.map_batches(widen, batch_format="pyarrow"),
        ["o_orderkey"],
        [("late_i", "count", "n_supp"), ("late_i", "sum", "n_late"), ("supp_late", "sum", "supp_late")],
        reduce_blocks=16,  # order-domain sized after the map-side combine
    )

    def blame(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("n_supp"), 2), pc.equal(b.column("n_late"), 1))
        return pa.table({"s_suppkey": b.filter(m).column("supp_late")})

    counts = F.grouped_agg(
        per_order.map_batches(blame, batch_format="pyarrow"),
        ["s_suppkey"],
        [("s_suppkey", "count", "numwait")],
        reduce_blocks=8,
    )
    named = F.bucket_join(
        counts,
        F.load(sf_dir, "supplier", columns=["s_suppkey", "s_name"]),
        on=("s_suppkey",),
        left_schema=pa.schema({"s_suppkey": pa.int64(), "numwait": pa.int64()}),
        right_schema=pa.schema({"s_suppkey": pa.int64(), "s_name": pa.string()}),
        reduce_blocks=8,
    )
    return F.topk(named, "numwait", 20, descending=True, tiebreak=["s_name"]).select_columns(
        ["s_name", "numwait"]
    )


_Q22_CUTOFF = "2000-01-01"


def _q_q22_idle_customers(sf_dir: str):
    """TPC-H-Q22-shaped global-scalar + anti-join: per nation, count and
    total balance of above-average-balance customers with NO order since
    the cutoff. The global average is compared EXACTLY as integers
    (cents * n > sum_cents — no float threshold can flip a boundary row),
    the recent-buyer key set folds to one row per custkey map-side before
    the bucketed LEFT join, and the null-marker filter is the anti-join."""
    cust = F.load(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cents_partial(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b.column("c_acctbal"), 100.0)), pa.int64())
        pos = pc.filter(c, pc.greater(c, 0))
        s = pc.sum(pos).as_py() or 0
        return pa.table({"n": pa.array([len(pos)], pa.int64()), "s": pa.array([s], pa.int64())})

    scal = cust.map_batches(cents_partial, batch_format="pyarrow").to_pandas()
    n_pos, sum_pos = int(scal["n"].sum()), int(scal["s"].sum())

    cutoff = pa.scalar(np.datetime64(_Q22_CUTOFF, "us"), pa.timestamp("us"))
    recent = F.grouped_agg(
        F.load(sf_dir, "orders", columns=["o_custkey"], filter=pc.field("o_orderdate") >= cutoff),
        ["o_custkey"],
        [("o_custkey", "count", "__has")],
    )

    def rich(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b.column("c_acctbal"), 100.0)), pa.int64())
        m = pc.greater(pc.multiply(c, n_pos), sum_pos)
        f = b.filter(m)
        cf = pc.filter(c, m)
        return pa.table(
            {
                "c_custkey": f.column("c_custkey"),
                "c_nationkey": pc.cast(f.column("c_nationkey"), pa.int64()),
                "cents": cf,
            }
        )

    joined = F.bucket_join(
        cust.map_batches(rich, batch_format="pyarrow"),
        recent,
        on=("c_custkey",),
        right_on=("o_custkey",),
        how="left",
        left_schema=pa.schema(
            {"c_custkey": pa.int64(), "c_nationkey": pa.int64(), "cents": pa.int64()}
        ),
        right_schema=pa.schema({"o_custkey": pa.int64(), "__has": pa.int64()}),
    )

    def anti(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column("__has")))

    agg = F.grouped_agg(
        joined.map_batches(anti, batch_format="pyarrow"),
        ["c_nationkey"],
        [("c_custkey", "count", "numcust"), ("cents", "sum", "totacctbal_cents")],
        reduce_blocks=4,
    )
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nation["n_nationkey"] = nation["n_nationkey"].astype("int64")
    out = F.broadcast_lookup_join(agg, nation, "c_nationkey", "n_nationkey")
    return out.select_columns(["n_name", "numcust", "totacctbal_cents"])


def _q_user_type_bitmask(sf_dir: str):
    """Per-user event-type bitmask (SQL bit_or rewrite): types get dense
    bit positions by lexicographic rank (tiny driver-collected enum), each
    event maps to its power-of-two mask, and because distinct powers of two
    OR to their sum, bit_or folds to dedupe-then-SUM — two combiner
    groupbys, no bit_or kernel needed anywhere in the reduce."""
    ds = F.load(sf_dir, "events", columns=["user_id", "event_type"])
    types = sorted(
        F.grouped_agg(ds, ["event_type"], [("event_type", "count", "__c")])
        .to_pandas()["event_type"]
        .tolist()
    )
    masks = {t: 1 << i for i, t in enumerate(types)}

    def to_mask(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": b["user_id"], "mask": b["event_type"].map(masks).astype("int64")}
        )

    dm = F.grouped_agg(
        ds.map_batches(to_mask, batch_format="pandas"),
        ["user_id", "mask"],
        [("mask", "count", "__c")],
    )
    return F.grouped_agg(dm, ["user_id"], [("mask", "sum", "type_mask")])


def _q_geomean_value_by_type(sf_dir: str):
    """Per-type geometric mean (e6-rounded): the multiplicative aggregate
    SQL writes as EXP(SUM(LN(x))/COUNT(*)) — the product itself would
    under/overflow, the log-sum is an ordinary mergeable partial. One
    combiner groupby ships (sum_ln, count) per type; values are strictly
    positive in this schema (min 0.01)."""
    ds = F.load(sf_dir, "events", columns=["event_type", "value"])

    def lns(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"), "lnv": pc.ln(b.column("value"))})

    agg = F.grouped_agg(
        ds.map_batches(lns, batch_format="pyarrow"),
        ["event_type"],
        [("lnv", "sum", "s"), ("lnv", "count", "n")],
        reduce_blocks=4,
    )

    def fin(b: pa.Table) -> pa.Table:
        g = pc.exp(pc.divide(b.column("s"), pc.cast(b.column("n"), pa.float64())))
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "geomean_e6": pc.cast(pc.round(pc.multiply(g, 1e6)), pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def _q_user_path_string(sf_dir: str):
    """Per-user behavioral path: event types concatenated in (ts, event_id)
    order — SQL string_agg(... ORDER BY ...). The sequence-assembly shape
    of session modeling / trajectory mining: one bucketed shuffle
    co-locates each user whole, one mergesort per bucket orders every group
    at once. Only (user_id, type, ts, event_id) rows move."""
    ds = F.load(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    out = F.grouped_string_agg(
        ds, "user_id", "event_type", sep=">", order_cols=["ts", "event_id"], out_col="path"
    )
    return out.select_columns(["user_id", "path"])


def _q_doc_ttr(sf_dir: str):
    """Per-document type-token ratio (lexical diversity — the standard
    cheap quality signal next to doc_repetition): distinct whitespace
    tokens / total tokens, e6-FLOOR so both engines compare integers
    (floor division is exact; ROUND of a float ratio could straddle .5).
    Each document is one row, so the whole computation is per-batch
    pyarrow group_bys — zero shuffle at any scale."""
    from tesseract_recognize_ray.functions.textstats import _ws_token_lists

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"], num_blocks=16)

    def fn(b: pa.Table) -> pa.Table:
        lists = _ws_token_lists(b.column("text"))
        off = np.asarray(lists.offsets, dtype=np.int64)
        off = off - off[0]
        n_tok = np.diff(off)
        row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), n_tok)
        pairs = pa.table({"r": pa.array(row_idx), "tok": lists.flatten()}).group_by(
            ["r", "tok"]
        ).aggregate([])
        dcnt = pairs.group_by("r").aggregate([("tok", "count")])
        nd = np.zeros(len(lists), np.int64)
        nd[dcnt.column("r").to_numpy()] = dcnt.column("tok_count").to_numpy()
        keep = n_tok > 0
        mask = pa.array(keep)
        return pa.table(
            {
                "doc_id": b.column("doc_id").filter(mask),
                "n_distinct": pa.array(nd[keep], pa.int64()),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "ttr_e6": pa.array(nd[keep] * 1_000_000 // n_tok[keep], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _q_wavg_discount_by_brand(sf_dir: str):
    """Weighted average discount per brand (weight = extended price), as
    exact integer arithmetic end-to-end: lineitem folds to
    (sum cents*disc_pct, sum cents) per PARTKEY map-side — the join then
    moves one row per part, not per lineitem — bucketed join to part for
    the brand, second combiner groupby, e6 floor division. (At extreme
    per-brand volumes the e6 scale-up would need a float or split fold;
    int64 holds through ~1e14 cents per brand.)"""
    li = F.load(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def fold(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "num": pc.multiply(cents, disc),
                "den": cents,
            }
        )

    per_part = F.grouped_agg(
        li.map_batches(fold, batch_format="pyarrow"),
        ["l_partkey"],
        [("num", "sum", "num"), ("den", "sum", "den")],
    )
    joined = F.bucket_join(
        per_part,
        F.load(sf_dir, "part", columns=["p_partkey", "p_brand"]),
        on=("l_partkey",),
        right_on=("p_partkey",),
        left_schema=pa.schema({"l_partkey": pa.int64(), "num": pa.int64(), "den": pa.int64()}),
        right_schema=pa.schema({"p_partkey": pa.int64(), "p_brand": pa.string()}),
    )
    agg = F.grouped_agg(
        joined, ["p_brand"], [("num", "sum", "num"), ("den", "sum", "den")], reduce_blocks=4
    )

    def fin(b: pa.Table) -> pa.Table:
        # floor division on int64: exact on both engines, no float ratio
        w = pc.divide(pc.multiply(b.column("num"), 10_000), b.column("den"))
        return pa.table({"p_brand": b.column("p_brand"), "wavg_disc_e6": w})

    return agg.map_batches(fin, batch_format="pyarrow")


_NEVER_DISC = 0.08


def _q_parts_never_discounted(sf_dir: str):
    """Anti-join where the build side is DATA-sized (unlike the broadcast
    anti of anti_join_customers): parts that never sold at a deep discount.
    The deep-discount partkeys fold to one row per key map-side (combiner
    distinct), the bucketed LEFT join co-locates each key once, and the
    null marker is the NOT EXISTS."""
    part = F.load(sf_dir, "part", columns=["p_partkey", "p_name"])
    disc = F.grouped_agg(
        F.load(
            sf_dir,
            "lineitem",
            columns=["l_partkey"],
            filter=pc.field("l_discount") > _NEVER_DISC,
        ),
        ["l_partkey"],
        [("l_partkey", "count", "__has")],
    )
    joined = F.bucket_join(
        part,
        disc,
        on=("p_partkey",),
        right_on=("l_partkey",),
        how="left",
        left_schema=pa.schema({"p_partkey": pa.int64(), "p_name": pa.string()}),
        right_schema=pa.schema({"l_partkey": pa.int64(), "__has": pa.int64()}),
    )

    def anti(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_null(b.column("__has")))
        return pa.table({"p_partkey": f.column("p_partkey"), "p_name": f.column("p_name")})

    return joined.map_batches(anti, batch_format="pyarrow")


def _q_order_share_of_customer(sf_dir: str):
    """Ratio-to-group-total window (share_e6 = order / customer total,
    e6 floor): the per-row window SQL writes as SUM() OVER (PARTITION BY)
    rewrites to a combiner groupby producing one total per customer plus a
    bucketed join back — the totals side is |customers|, not |orders|, and
    integer floor division keeps both engines bit-identical."""
    orders = F.load(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "cents": pc.cast(pc.round(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()),
            }
        )

    oc = orders.map_batches(cents, batch_format="pyarrow")
    tot = F.grouped_agg(oc, ["o_custkey"], [("cents", "sum", "tot")])
    joined = F.bucket_join(
        oc,
        tot,
        on=("o_custkey",),
        left_schema=pa.schema(
            {"o_orderkey": pa.int64(), "o_custkey": pa.int64(), "cents": pa.int64()}
        ),
        right_schema=pa.schema({"o_custkey": pa.int64(), "tot": pa.int64()}),
    )

    def fin(b: pa.Table) -> pa.Table:
        share = pc.divide(pc.multiply(b.column("cents"), 1_000_000), b.column("tot"))
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "share_e6": share,
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow")


def _q_phrase_match_docs(sf_dir: str):
    """Token-boundary phrase search ("hash join" as consecutive alpha
    tokens, not a substring): a pure map over the corpus — each document is
    one row, so the operator shuffles NOTHING at any scale. Oracle replays
    the tokenization with string_split_regex + generate_subscripts."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_text.phrase_match(ds, "doc_id", "text", "hash join")


def _q_scd2_user_type_history(sf_dir: str):
    """SCD Type-2 compaction of the event change-log: per user (ordered by
    ts, event_id) consecutive runs of one event_type collapse to a single
    validity interval [valid_from, valid_to) with the run length; the open
    run closes at the 2100-01-01 sentinel (SCD-2 convention — also dodges
    NaT/int64 casts in the hash compare). One bucketed co-location shuffle,
    one mergesort + numpy run-length pass per bucket."""
    ds = F.load(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return F.scd2_compact(
        ds, "user_id", ["ts", "event_id"], "event_type", "ts", open_end="2100-01-01"
    )


def _q_nb_lang_predict(sf_dir: str):
    """Distributed multinomial Naive Bayes, trained AND scored over the
    corpus in one job: per-block (label, token) combiner -> bucketed count
    reduce -> driver-held V x L log-prob model broadcast once via ray.put ->
    map-only argmax scoring. The oracle replays the exact chain in SQL
    (same [^a-z]+ tokenizer, add-1 smoothing, log priors); ties break to
    the lexicographically first label on both sides. Emitting only the
    argmax label keeps the compare float-safe: the corpus' minimum top-2
    score margin is ~3e-4 vs ~1e-12 summation-order noise."""
    from tesseract_recognize_ray.functions import ml as F_ml

    ds = F.load(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    model = F_ml.nb_train(ds, "lang", "text")
    return F_ml.nb_predict(
        ds, "doc_id", "text", model, out_col="pred_lang", keep_cols=("lang",)
    )


def _q_incremental_agg_refresh(sf_dir: str):
    """Materialized-view maintenance: per-user (count, sum) partials of the
    even-event_id half persist as parquet state (built once per sf_dir, like
    the LSH index cache), then the odd half arrives as a delta and merges in
    O(delta + |keys|) WITHOUT rescanning the base — the refreshed aggregate
    must equal a from-scratch GROUP BY over the full table, which is exactly
    what the oracle computes."""
    import os

    from tesseract_recognize_ray.state.agg_state import (
        agg_state_build,
        agg_state_refresh,
    )

    specs = [("event_id", "count", "n_events"), ("value", "sum", "sum_value")]
    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def half(even: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), 0 if even else 1)
            return b.filter(m)

        return ds.map_batches(fn, batch_format="pyarrow")

    path = f"/tmp/trr_aggstate_{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.exists(path):
        agg_state_build(half(True), ["user_id"], specs, path)
    # user_id domain is 1.5k keys at sf0.1 — reducer-sized, so coalescing
    # the two partial exchanges is safe here (grouped_agg docstring rule)
    return agg_state_refresh(half(False), ["user_id"], specs, path, reduce_blocks=8)


def _q_doc_backoff_lm_score(sf_dir: str):
    """Stupid-backoff bigram LM scoring (Brants et al. 2007): the LM trains
    on the even-doc_id half and scores EVERY document, so held-out docs
    exercise the backoff and OOV-floor paths. Integer micro-nat
    quantization per token (the doc_lm_score trick) makes the per-doc sum
    order-independent, so the oracle's SQL replay is bit-exact; float
    compositions (alpha * (c/T)) are kept in the same op order on both
    sides."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])

    def even(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), 0))

    train = ds.map_batches(even, batch_format="pyarrow")
    return F_text.backoff_bigram_logprob(ds, train, "doc_id", "text")


def _q_mmr_diverse_topk(sf_dir: str):
    """Maximal-marginal-relevance diverse retrieval (Carbonell & Goldstein
    1998): relevance scan distributed (broadcast query, deterministic local
    prune, one n_candidates-row exchange), the k sequential greedy steps on
    the driver over the bounded shortlist. Rows-only: the greedy recurrence
    is not SQL-expressible; exact equality vs a sequential reference and
    partitioning invariance are pytest-gated (tests/test_round4b.py)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(emb.loc[emb["vec_id"] == 0, "embedding"].iloc[0], dtype=np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    out = F_sim.mmr_select(ds, "vec_id", "embedding", q, k=10, lambda_=0.7, n_candidates=200)
    return out[["rank", "vec_id"]].astype({"rank": "int64", "vec_id": "int64"})


def _q_mmr_diverse_topk_exact(sf_dir: str):
    """MMR diverse retrieval, integer-exact twin: cosines quantize to e6
    ints at the moment of computation, the greedy recurrence
    (7*rel - 3*max_div, ties id ASC) is then exact integer arithmetic, and
    an unrolled 10-step CTE oracle replays every argmax. The float variant
    (mmr_diverse_topk) stays as the literature-faithful path."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(emb.loc[emb["vec_id"] == 0, "embedding"].iloc[0], dtype=np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"], num_blocks=16)
    out = F_sim.mmr_select_exact(
        ds, "vec_id", "embedding", q, k=10, lambda_num=7, lambda_den=10, n_candidates=200
    )
    return out[["rank", "vec_id", "score10_e6"]].astype("int64")


def _mmr_exact_oracle_sql(k: int = 10, n_cand: int = 200, lnum: int = 7, lden: int = 10) -> str:
    """Unrolled greedy MMR: step i's CTE cross-joins the i-1 single-row
    selection CTEs, takes GREATEST of the e6-quantized diversity cosines,
    and argmaxes the integer score with an id tiebreak — replaying
    mmr_select_exact's recurrence verbatim."""
    mu = lden - lnum
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "q AS (SELECT v FROM e WHERE vec_id = 0)",
        f"cand AS (SELECT e.vec_id, e.v,"
        f" CAST(ROUND(1e6 * list_cosine_similarity(e.v, q.v)) AS BIGINT) AS rel"
        f" FROM e CROSS JOIN q ORDER BY rel DESC, e.vec_id LIMIT {n_cand})",
        f"s1 AS (SELECT vec_id, v, {lnum} * rel AS sc FROM cand ORDER BY sc DESC, vec_id LIMIT 1)",
    ]
    for i in range(2, k + 1):
        prev = [f"s{j}" for j in range(1, i)]
        joins = " ".join(f"CROSS JOIN {p}" for p in prev)
        divs = ", ".join(
            f"CAST(ROUND(1e6 * list_cosine_similarity(c.v, {p}.v)) AS BIGINT)" for p in prev
        )
        notin = ", ".join(f"{p}.vec_id" for p in prev)
        parts.append(
            f"s{i} AS (SELECT c.vec_id, c.v, {lnum} * c.rel - {mu} * GREATEST({divs}) AS sc"
            f" FROM cand c {joins} WHERE c.vec_id NOT IN ({notin})"
            f" ORDER BY sc DESC, c.vec_id LIMIT 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, sc FROM s{i}" for i in range(1, k + 1)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(rank AS BIGINT) AS rank, vec_id,"
        f" CAST(sc AS BIGINT) AS score10_e6 FROM ({union})"
    )


def _q_events_snapshot_diff(sf_dir: str):
    """CDC snapshot compare: two deterministic views of the events table
    play yesterday's and today's snapshot — event_id % 4 == 1 rows exist
    only in new (added), % 4 == 2 only in base (removed), % 8 == 0 rows
    have value bumped in new (changed) — and the diff ships only the churn:
    one side-tagged union, one bucketed co-location exchange, one
    vectorized merge+compare per bucket. Oracle is the FULL OUTER JOIN /
    IS DISTINCT FROM replay."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def mk(side: str):
        def fn(b: pa.Table) -> pa.Table:
            eid = b.column("event_id")
            m4 = pc.bit_wise_and(eid, 3)
            if side == "base":
                t = b.filter(pc.not_equal(m4, 1))
            else:
                t = b.filter(pc.not_equal(m4, 2))
                bump = pc.equal(pc.bit_wise_and(t.column("event_id"), 7), 0)
                val = pc.if_else(bump, pc.add(t.column("value"), 1.0), t.column("value"))
                t = t.set_column(t.schema.get_field_index("value"), "value", val)
            return t

        return ds.map_batches(fn, batch_format="pyarrow")

    return F.snapshot_diff(
        mk("base"), mk("new"), ["event_id"], ["event_type", "value"]
    )


def _q_events_quality_audit(sf_dir: str):
    """Declarative data-quality gate (the Deequ shape): five constraints
    evaluated in one streaming pass — row-local checks fold |checks| int64
    partials per block through a tiny reduce; the uniqueness checks add the
    one key-count exchange a uniqueness proof fundamentally needs. Output
    is one (check_name, n_violations) row per constraint."""
    ds = F.load(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value", "props"]
    )
    return F.constraint_audit(
        ds,
        [
            ("value_le_100", "max_value", {"col": "value", "hi": 100.0}),
            (
                "event_type_core",
                "in_set",
                {"col": "event_type", "values": ["click", "view", "purchase"]},
            ),
            ("props_not_null", "not_null", {"col": "props"}),
            ("event_id_unique", "unique", {"cols": ["event_id"]}),
            ("user_id_unique", "unique", {"cols": ["user_id"]}),
        ],
    )


def _q_loo_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of event_type by value (the
    CatBoost-family categorical feature, minus self-leakage): category
    (sum, count) fold once map-side, broadcast, then a map-only encode.
    Bit-stable floats via the integer-cents trick — numerator and
    denominator are exact int64 on both sides before the one division."""
    ds = F.load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(b.column("value"), 100.0)), pa.int64())
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "cents": c,
            }
        )

    from tesseract_recognize_ray.functions import ml as F_ml

    return F_ml.loo_target_encoding(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_type",
        "cents",
        keep_cols=("event_id",),
    )


def _q_pdf_text_layer_extract(sf_dir: str):
    """Born-digital PDF text-layer extraction (S3's vector-PDF half, the
    path the reference can only rasterize+OCR): stage 1 wraps each
    document's first 48 tokens into a real multi-page vector PDF (Helvetica
    Tj lines, FlateDecode content streams — pdfcodec.encode_pdf_text);
    stage 2 PARSES the binary back — object table, page tree, content
    stream tokenizer, text operators, (-y, x) reading order. The oracle
    recomputes the deterministic 8-token line wrap in SQL, so a value-match
    proves the whole encode -> parse -> extract -> order chain."""
    from tesseract_recognize_ray.pdfcodec import encode_pdf_text, iter_pdf_page_text

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr="doc_id < 40"
    )

    def wrap(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            toks = str(text).split()
            lines = [
                " ".join(toks[i : i + 8]) for i in range(0, min(len(toks), 48), 8)
            ]
            if not lines:
                continue
            pages = [lines[i : i + 3] for i in range(0, len(lines), 3)]
            rows.append((int(doc_id), encode_pdf_text(pages)))
        return pd.DataFrame(rows, columns=["doc_id", "pdf"])

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, pdf in zip(b["doc_id"], b["pdf"]):
            for page, spans in enumerate(iter_pdf_page_text(pdf)):
                for idx, s in enumerate(spans):
                    out.append((int(doc_id), page, idx, s["text"]))
        return pd.DataFrame(out, columns=["doc_id", "page", "span_idx", "text"])

    return ds.map_batches(wrap, batch_format="pandas").map_batches(
        extract, batch_format="pandas"
    )


def _q_pdf_text_type0_extract(sf_dir: str):
    """Composite-font born-digital extraction (the real-world subset-font
    norm the round-4 simple-font route could not read): same deterministic
    8-token/3-line wrap as pdf_text_layer_extract, but the PDF is written
    with ONE /Type0 /Identity-H font whose CIDs are sorted-codepoint ranks
    (pdfcodec.encode_pdf_text_type0) — latin-1'ing the bytes yields
    garbage, so a value-match proves the /ToUnicode CMap parse (bfchar +
    bfrange) and 2-byte CID framing recover the exact text. Oracle = the
    same SQL line-wrap replay."""
    from tesseract_recognize_ray.pdfcodec import (
        encode_pdf_text_type0,
        iter_pdf_page_text,
    )

    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"]).filter(
        expr="doc_id < 40"
    )

    def wrap(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(b["doc_id"], b["text"]):
            toks = str(text).split()
            lines = [
                " ".join(toks[i : i + 8]) for i in range(0, min(len(toks), 48), 8)
            ]
            if not lines:
                continue
            pages = [lines[i : i + 3] for i in range(0, len(lines), 3)]
            rows.append((int(doc_id), encode_pdf_text_type0(pages)))
        return pd.DataFrame(rows, columns=["doc_id", "pdf"])

    def extract(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, pdf in zip(b["doc_id"], b["pdf"]):
            for page, spans in enumerate(iter_pdf_page_text(pdf)):
                for idx, s in enumerate(spans):
                    out.append((int(doc_id), page, idx, s["text"]))
        return pd.DataFrame(out, columns=["doc_id", "page", "span_idx", "text"])

    return ds.map_batches(wrap, batch_format="pandas").map_batches(
        extract, batch_format="pandas"
    )


def _q_pdf_vector_extract(sf_dir: str):
    """S3's third class end-to-end: DRAWN PDFs (ink as filled paths — no
    raster stream, no text layer, the class the reference can only
    ghostscript-render at --density) through the fused source's
    rasterize-at-density route (pdfcodec.rasterize_pdf_pages) into the
    normal segment+OCR path, at density=144 (a 2x render, so the route's
    scaling is exercised, not just the identity 72 dpi). Rows-only: OCR is
    not SQL-expressible; golden span equality at BOTH densities is the
    pytest gate (tests/test_pdfcodec.py::test_e2e_span_equality_on_vector_pdf_corpus)."""
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached(
        _CORPUS_DIR + "_pdfvec", 48, media_encoding="pdf_vector"
    )
    return extract_spans(paths["docs"], paths["media"], PipelineConfig(density=144))


def _q_media_metadata_profile(sf_dir: str):
    """Header-only media profiling over the interleaved entry corpus: per
    blob (format, width, height, bit_depth, n_pages) WITHOUT decoding a
    pixel — the pre-decode planning pass (exact pixel-cost estimates for
    cost-balanced splits, format-mix dashboards). Rows-only (binary headers
    are not SQL-parseable); header-only behavior — corrupt PIXEL data with
    a valid header still profiles — is pytest-proven."""
    import ray.data as rd

    from tesseract_recognize_ray.functions.multimodal import media_metadata

    paths = _corpus()
    ds = rd.read_parquet(paths["media"], columns=["media_ref", "bytes"])
    return media_metadata(ds)


def _q_decayed_user_activity(sf_dir: str):
    """Recency-weighted activity score per user (24h half-life, anchored at
    the table's max ts): each event contributes 2^(-age/half_life),
    quantized to integer 1e-9 units BEFORE the sum so the bucketed reduce
    is exact in any order and the SQL replay matches bit-for-bit."""
    ds = F.load(sf_dir, "events", columns=["user_id", "ts"])
    return F.decayed_count(ds, "user_id", "ts", half_life_s=86400.0)


def _q_banned_phrase_scan(sf_dir: str):
    """Safety-filter stage: scan the corpus against a blocklist of phrases
    of MIXED token lengths in one vectorized map (one flat_ngrams pass +
    one hash probe per distinct length per batch — a 1000-phrase list costs
    a handful of Arrow kernels). Oracle replays each length's position
    windows in SQL and joins the phrase list as VALUES."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_text.multi_phrase_match(
        ds, "doc_id", "text", ["vector", "table scan", "sort merge join"]
    )


def _q_incremental_stream_sim(sf_dir: str):
    """Micro-batch ingest simulation (the agg-state swap path under load):
    events split into four chronological windows; window 1 builds the
    persisted per-user state, windows 2-4 each arrive as a delta and
    refresh WITH update=True (write-new / swap per batch — three swaps),
    never rescanning history. The final state must equal a from-scratch
    GROUP BY over the whole table, which is what the oracle computes.
    State is rebuilt per call (a re-refresh of already-folded deltas would
    double-count — exactly the property the sim demonstrates)."""
    import shutil

    from tesseract_recognize_ray.state.agg_state import (
        agg_state_build,
        agg_state_refresh,
    )

    from ray.data.aggregate import Max as _RayMax
    from ray.data.aggregate import Min as _RayMin

    ds = F.load(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    lohi = ds.aggregate(_RayMin("ts"), _RayMax("ts"))
    lo = np.datetime64(lohi["min(ts)"], "us").astype("int64")
    hi = np.datetime64(lohi["max(ts)"], "us").astype("int64") + 1
    edges = [lo + (hi - lo) * k // 4 for k in range(5)]

    def window(k: int):
        def fn(b: pa.Table) -> pa.Table:
            ts = pc.cast(b.column("ts"), pa.int64())
            m = pc.and_(
                pc.greater_equal(ts, edges[k]), pc.less(ts, edges[k + 1])
            )
            return b.filter(m).drop_columns(["ts"])

        return ds.map_batches(fn, batch_format="pyarrow")

    specs = [("event_id", "count", "n_events"), ("value", "sum", "sum_value")]
    import os

    path = f"/tmp/trr_streamsim_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(path, ignore_errors=True)
    agg_state_build(window(0), ["user_id"], specs, path)
    out = None
    for k in (1, 2, 3):
        out = agg_state_refresh(
            window(k), ["user_id"], specs, path, update=True, reduce_blocks=8
        )
    return out


def _q_exact_value_quantiles(sf_dir: str):
    """EXACT p50/p90/p99 of event value via distributed 2-pass selection
    (sketches.exact_quantile_2pass): pass 1's bin summaries locate the
    k-th order statistic's bin, pass 2 materializes only that bin's values
    (~N/4096 rows) — no all-to-all sort ever runs. Values are exact source
    doubles, so the ORDER BY row_number oracle matches bit-for-bit."""
    from tesseract_recognize_ray.functions.sketches import exact_quantile_2pass

    ds = F.load(sf_dir, "events", columns=["value"])
    est = exact_quantile_2pass(ds, "value", [0.5, 0.9, 0.99])
    return pd.DataFrame({"q": list(est.keys()), "exact_q": list(est.values())})


def _q_bool_search_docs(sf_dir: str):
    """Boolean retrieval (AND of must-terms, NOT of banned terms) as a
    zero-shuffle map: one tokenize + one hash probe per term set per batch,
    per-row containment by distinct (row, term) pair counting. The oracle
    is the list_contains conjunction."""
    ds = F.load(sf_dir, "documents", columns=["doc_id", "text"])
    return F_text.bool_search(ds, "doc_id", "text", must=["hash", "join"], must_not=["slow"])


def _q_user_value_quantiles_exact(sf_dir: str):
    """EXACT per-user p50/p90 via grouped 2-pass selection — the
    unbounded-key upgrade of the exact grouped_quantile family (those
    co-locate each key's FULL history; here only candidate-bin values move,
    ~N*|qs|/nbins rows). Oracle is the per-key k-th order statistic."""
    from tesseract_recognize_ray.functions.sketches import grouped_exact_quantile

    ds = F.load(sf_dir, "events", columns=["user_id", "value"])
    return grouped_exact_quantile(ds, "user_id", "value", [0.5, 0.9])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "rolling_min_events": _q_rolling_min_events,
        "scaled_event_values": _q_scaled_event_values,
        "ts_inversions_by_user": _q_ts_inversions_by_user,
        "snm_dup_pairs": _q_snm_dup_pairs,
        "q5_local_supplier_volume": _q_q5_local_supplier_volume,
        "training_shards": _q_training_shards,
        "source_mix_interleave": _q_source_mix_interleave,
        "q7_volume_shipping": _q_q7_volume_shipping,
        "q9_product_profit": _q_q9_product_profit,
        "q19_discount_revenue": _q_q19_discount_revenue,
        "q8_market_share": _q_q8_market_share,
        "embedding_covariance": _q_embedding_covariance,
        "embedding_pca": _q_embedding_pca,
        "q13_order_count_distribution": _q_q13_order_count_distribution,
        "q14_promo_share": _q_q14_promo_share,
        "q15_top_supplier": _q_q15_top_supplier,
        "q18_large_volume_customers": _q_q18_large_volume_customers,
        "monthly_revenue_growth": _q_monthly_revenue_growth,
        "user_cum_distinct_types": _q_user_cum_distinct_types,
        "distinctive_terms_by_lang": _q_distinctive_terms_by_lang,
        "ppjoin_dup_pairs": _q_ppjoin_dup_pairs,
        "rrf_doc_fusion": _q_rrf_doc_fusion,
        "winsorized_event_values": _q_winsorized_event_values,
        "event_type_daily_drift": _q_event_type_daily_drift,
        "source_precedence_dedup": _q_source_precedence_dedup,
        "copartitioned_revenue_join": _q_copartitioned_revenue_join,
        "skew_split_brand_revenue": _q_skew_split_brand_revenue,
        "q6_forecast_revenue": _q_q6_forecast_revenue,
        "q16_supplier_variety": _q_q16_supplier_variety,
        "q17_small_quantity_revenue": _q_q17_small_quantity_revenue,
        "bpe_merges": _q_bpe_merges,
        "bpe_encoded_docs": _q_bpe_encoded_docs,
        "cross_corpus_near_dups": _q_cross_corpus_near_dups,
        "event_value_collision_pairs": _q_event_value_collision_pairs,
        "image_phash_near_dups": _q_image_phash_near_dups,
        "simhash_near_dups": _q_simhash_near_dups,
        "ann_pq": _q_ann_pq,
        "doc_quality_logreg": _q_doc_quality_logreg,
        "doc_quality_logreg_exact": _q_doc_quality_logreg_exact,
        "ann_filtered": _q_ann_filtered,
        "late_event_flags": _q_late_event_flags,
        "running_revenue_total": _q_running_revenue_total,
        "user_value_p90_approx": _q_user_value_p90_approx,
        "event_last_order_asof": _q_event_last_order_asof,
        "ann_ivf_pq": _q_ann_ivf_pq,
        "ann_ivf_pq_indexed": _q_ann_ivf_pq_indexed,
        "zorder_pruned_events": _q_zorder_pruned_events,
        "label_intra_variance": _q_label_intra_variance,
        "label_between_variance": _q_label_between_variance,
        "canonical_prefix_docs": _q_canonical_prefix_docs,
        "pareto_parts": _q_pareto_parts,
        "supplier_part_mincost": _q_supplier_part_mincost,
        "event_value_deciles": _q_event_value_deciles,
        "event_value_mad": _q_event_value_mad,
        "approx_users_by_type": _q_approx_users_by_type,
        "first_event_per_user_day": _q_first_event_per_user_day,
        "event_type_share": _q_event_type_share,
        "nation_customer_names": _q_nation_customer_names,
        "grouping_sets_lineitem": _q_grouping_sets_lineitem,
        "dup_token_spans": _q_dup_token_spans,
        "dedup_cleaned_docs": _q_dedup_cleaned_docs,
        "doc_novelty_scores": _q_doc_novelty_scores,
        "pack_sequences": _q_pack_sequences,
        "bloom_semi_join_lineitem": _q_bloom_semi_join_lineitem,
        "doc_split_counts": _q_doc_split_counts,
        "approx_user_counts": _q_approx_user_counts,
        "partition_pruned_events": _q_partition_pruned_events,
        "rowgroup_pruned_lineitem": _q_rowgroup_pruned_lineitem,
        "events_jsonl_roundtrip": _q_events_jsonl_roundtrip,
        "events_csv_roundtrip": _q_events_csv_roundtrip,
        "filter_project": _q_filter_project,
        "groupby_pricing": _q_groupby_pricing,
        "topk_orders": _q_topk_orders,
        "distinct_flags": _q_distinct_flags,
        "semi_join_customers": _q_semi_join_customers,
        "anti_join_customers": _q_anti_join_customers,
        "revenue_by_nation": _q_revenue_by_nation,
        "window_lag_events": _q_window_lag_events,
        "event_lead_gap": _q_event_lead_gap,
        "latest_event_per_user": _q_latest_event_per_user,
        "cohort_retention": _q_cohort_retention,
        "regr_price_by_qty": _q_regr_price_by_qty,
        "paragraph_dedup": _q_paragraph_dedup,
        "top_terms_by_lang": _q_top_terms_by_lang,
        "bm25_top_docs": _q_bm25_top_docs,
        "part_neighbor_jaccard": _q_part_neighbor_jaccard,
        "skew_value_by_type": _q_skew_value_by_type,
        "image_phash_dups": _q_image_phash_dups,
        "order_flags_by_customer": _q_order_flags_by_customer,
        "user_activity_islands": _q_user_activity_islands,
        "weighted_doc_sample": _q_weighted_doc_sample,
        "event_global_ordinals": _q_event_global_ordinals,
        "lineitem_checksum": _q_lineitem_checksum,
        "doc_sliding_chunks": _q_doc_sliding_chunks,
        "kmeans_clusters": _q_kmeans_clusters,
        "semantic_dedup": _q_semantic_dedup,
        "semantic_dedup_capped": _q_semantic_dedup_capped,
        "doc_lm_score": _q_doc_lm_score,
        "event_transitions": _q_event_transitions,
        "balanced_doc_sample": _q_balanced_doc_sample,
        "events_by_type": _q_events_by_type,
        "suppliers_per_region": _q_suppliers_per_region,
        "parts_by_brand": _q_parts_by_brand,
        "bpeish_tokens": _q_bpeish_tokens,
        "json_extract_events": _q_json_extract_events,
        "union_customers": _q_union_customers,
        "user_event_ranks": _q_user_event_ranks,
        "p90_value_by_type": _q_p90_value_by_type,
        "except_customers": _q_except_customers,
        "doc_word_positions": _q_doc_word_positions,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "part_name_scalars": _q_part_name_scalars,
        "events_time_parts": _q_events_time_parts,
        "user_event_pivot": _q_user_event_pivot,
        "stddev_value_by_type": _q_stddev_value_by_type,
        "rollup_suppliers": _q_rollup_suppliers,
        "intersect_customers": _q_intersect_customers,
        "sampled_lineitem": _q_sampled_lineitem,
        "redact_customer_names": _q_redact_customer_names,
        "quantity_histogram": _q_quantity_histogram,
        "nations_per_region_agg": _q_nations_per_region_agg,
        "doc_repetition": _q_doc_repetition,
        "p50_cont_value_by_type": _q_p50_cont_value_by_type,
        "event_value_ranks": _q_event_value_ranks,
        "hopping_events": _q_hopping_events,
        "approx_distinct_users": _q_approx_distinct_users,
        "heavy_hitter_terms": _q_heavy_hitter_terms,
        "clean_corpus": _q_clean_corpus,
        "curated_corpus": _q_curated_corpus,
        "customer_order_counts": _q_customer_order_counts,
        "asof_click_value": _q_asof_click_value,
        "rolling_sum_events": _q_rolling_sum_events,
        "cumsum_user_value": _q_cumsum_user_value,
        "top_terms": _q_top_terms,
        "top_bigrams": _q_top_bigrams,
        "bigram_pmi": _q_bigram_pmi,
        "shipping_priority": _q_shipping_priority,
        "top3_events_per_user": _q_top3_events_per_user,
        "customer_order_full": _q_customer_order_full,
        "decontaminate_docs": _q_decontaminate_docs,
        "event_percent_rank": _q_event_percent_rank,
        "event_deviation": _q_event_deviation,
        "user_cooccurrence_clusters": _q_user_cooccurrence_clusters,
        "shingle_dup_clusters": _q_shingle_dup_clusters,
        "pagerank_supplier_parts": _q_pagerank_supplier_parts,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "trailing_hour_events": _q_trailing_hour_events,
        "salted_type_join": _q_salted_type_join,
        "returned_revenue_by_customer": _q_returned_revenue_by_customer,
        "regex_extract_docs": _q_regex_extract_docs,
        "events_in_type_windows": _q_events_in_type_windows,
        "approx_value_quantiles": _q_approx_value_quantiles,
        "normalize_docs": _q_normalize_docs,
        "profile_lineitem": _q_profile_lineitem,
        "label_centroids": _q_label_centroids,
        "html_main_content": _q_html_main_content,
        "events_day_ranges": _q_events_day_ranges,
        "lineitem_unpivot": _q_lineitem_unpivot,
        "cube_order_stats": _q_cube_order_stats,
        "region_nation_pairs": _q_region_nation_pairs,
        "first_last_event_value": _q_first_last_event_value,
        "monthly_revenue": _q_monthly_revenue,
        "token_postings": _q_token_postings,
        "stratified_event_sample": _q_stratified_event_sample,
        "corr_qty_discount": _q_corr_qty_discount,
        "mode_priority_by_status": _q_mode_priority_by_status,
        "event_value_quartiles": _q_event_value_quartiles,
        "median_value_by_type": _q_median_value_by_type,
        "sessionize_events": _q_sessionize_events,
        "session_stats": _q_session_stats,
        "tumbling_events": _q_tumbling_events,
        "token_count": _q_token_count,
        "quality_counts": _q_quality_counts,
        "exact_dedup": _q_exact_dedup,
        "ann_brute_force": _q_ann_brute_force,
        "ann_ivf": _q_ann_ivf,
        "ann_ivf_indexed": _q_ann_ivf_indexed,
        "ann_ivf_flat": _q_ann_ivf_flat,
        "ann_pq_adc": _q_ann_pq_adc,
        "ann_ivf_pq_exact": _q_ann_ivf_pq_exact,
        "minhash_pairs": _q_minhash_pairs,
        "near_dup_dedup": _q_near_dup_dedup,
        "near_dup_dedup_longest": _q_near_dup_dedup_longest,
        "simhash": _q_simhash,
        "fingerprint": _q_fingerprint,
        "lang_id": _q_lang_id,
        "embedding_near_dup": _q_embedding_near_dup,
        "flagship_extract": _q_flagship_extract,
        "ocr_to_training_corpus": _q_ocr_to_training_corpus,
        "dsir_selected_docs": _q_dsir_selected_docs,
        "dsir_topk_docs": _q_dsir_topk_docs,
        "pagexml_extract": _q_pagexml_extract,
        "rerecognize_xml": _q_rerecognize_xml,
        "rerecognize_inplace": _q_rerecognize_inplace,
        "pagexml_orientation_pass": _q_pagexml_orientation_pass,
        "image_features": _q_image_features,
        "frame_sample_resize": _q_frame_sample_resize,
        "event_type_entropy": _q_event_type_entropy,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "copurchase_triangles": _q_copurchase_triangles,
        "part_bfs_hops": _q_part_bfs_hops,
        "funnel_click_purchase": _q_funnel_click_purchase,
        "event_value_outliers": _q_event_value_outliers,
        "user_type_pivot": _q_user_type_pivot,
        "part_kcore": _q_part_kcore,
        "supplier_communities": _q_supplier_communities,
        "user_hourly_fill": _q_user_hourly_fill,
        "sliding_distinct_users": _q_sliding_distinct_users,
        "type_audience_overlap": _q_type_audience_overlap,
        "q4_order_priority": _q_q4_order_priority,
        "q21_waiting_suppliers": _q_q21_waiting_suppliers,
        "q22_idle_customers": _q_q22_idle_customers,
        "user_type_bitmask": _q_user_type_bitmask,
        "geomean_value_by_type": _q_geomean_value_by_type,
        "user_path_string": _q_user_path_string,
        "doc_ttr": _q_doc_ttr,
        "wavg_discount_by_brand": _q_wavg_discount_by_brand,
        "parts_never_discounted": _q_parts_never_discounted,
        "order_share_of_customer": _q_order_share_of_customer,
        "phrase_match_docs": _q_phrase_match_docs,
        "scd2_user_type_history": _q_scd2_user_type_history,
        "nb_lang_predict": _q_nb_lang_predict,
        "incremental_agg_refresh": _q_incremental_agg_refresh,
        "doc_backoff_lm_score": _q_doc_backoff_lm_score,
        "mmr_diverse_topk": _q_mmr_diverse_topk,
        "mmr_diverse_topk_exact": _q_mmr_diverse_topk_exact,
        "events_snapshot_diff": _q_events_snapshot_diff,
        "events_quality_audit": _q_events_quality_audit,
        "loo_target_encoding": _q_loo_target_encoding,
        "pdf_text_layer_extract": _q_pdf_text_layer_extract,
        "pdf_text_type0_extract": _q_pdf_text_type0_extract,
        "pdf_vector_extract": _q_pdf_vector_extract,
        "media_metadata_profile": _q_media_metadata_profile,
        "decayed_user_activity": _q_decayed_user_activity,
        "banned_phrase_scan": _q_banned_phrase_scan,
        "incremental_stream_sim": _q_incremental_stream_sim,
        "exact_value_quantiles": _q_exact_value_quantiles,
        "bool_search_docs": _q_bool_search_docs,
        "user_value_quantiles_exact": _q_user_value_quantiles_exact,
    }


def oracle_sql() -> dict[str, str]:
    # MinHash-LSH full value-replay: the permutation coefficients come from
    # the SAME seeded generator the engine uses (_MinHasher, seed 42), the
    # rolling/band hashes reproduce numpy's uint64 wraparound via
    # HUGEINT % 2**64, and the universal hash reduces mod 2**61-1 exactly
    # as the engine's (a*h + b) % _MERSENNE does AFTER the uint64 wrap.
    _mh = F_dedup._MinHasher(num_perm=64, shingle_k=5)
    _perm_rows = ",\n                ".join(
        f"({p}, {int(_mh.a[p])}::HUGEINT, {int(_mh.b[p])}::HUGEINT)" for p in range(64)
    )
    _T = 1 << 64  # numpy uint64 wraparound modulus
    # CTE body shared by the minhash_pairs and near_dup_dedup oracles.
    # `mh` is MATERIALIZED: DuckDB re-inlines plain CTEs per reference, and
    # the downstream est/verify stages reference the chain several times —
    # un-materialized this replay was ~100x slower (366 s vs 3.7 s measured).
    _minhash_chain = f"""
            perms(p, pa, pb) AS (VALUES {_perm_rows}),
            chars AS (
                SELECT doc_id, i, ascii(substr(t, CAST(i AS INT), 1))::HUGEINT AS c,
                       length(t) AS n
                FROM (
                    SELECT doc_id,
                           CASE WHEN length(text) >= 5 THEN text
                                ELSE rpad(text, 5, ' ') END AS t,
                           unnest(range(1, length(CASE WHEN length(text) >= 5 THEN text
                                                       ELSE rpad(text, 5, ' ') END) + 1)) AS i
                    FROM documents
                )
            ),
            grams AS (
                SELECT doc_id, i, n, c AS c0,
                       lead(c, 1) OVER w AS c1, lead(c, 2) OVER w AS c2,
                       lead(c, 3) OVER w AS c3, lead(c, 4) OVER w AS c4
                FROM chars
                WINDOW w AS (PARTITION BY doc_id ORDER BY i)
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       ((((((((c0 * 1099511628211 + c1) % {_T}) * 1099511628211 + c2) % {_T})
                           * 1099511628211 + c3) % {_T}) * 1099511628211 + c4) % {_T}) AS h
                FROM grams WHERE i <= n - 4
            ),
            mh AS MATERIALIZED (
                SELECT doc_id, p,
                       MIN((((pa * h) % {_T} + pb) % {_T}) % 2305843009213693951) AS m
                FROM sh, perms GROUP BY doc_id, p
            ),
            bands AS (
                SELECT doc_id, p // 4 AS band,
                       MAX(CASE WHEN p % 4 = 0 THEN m END) AS m0,
                       MAX(CASE WHEN p % 4 = 1 THEN m END) AS m1,
                       MAX(CASE WHEN p % 4 = 2 THEN m END) AS m2,
                       MAX(CASE WHEN p % 4 = 3 THEN m END) AS m3
                FROM mh GROUP BY doc_id, p // 4
            ),
            bhash AS (
                SELECT doc_id, band,
                       ((((((m0 * 1099511628211 + m1) % {_T}) * 1099511628211 + m2) % {_T})
                         * 1099511628211 + m3) % {_T}) AS bh
                FROM bands
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bhash a
                JOIN bhash b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
            ),
            est AS (
                SELECT c.id_a, c.id_b,
                       SUM(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) / 64.0 AS est_jaccard
                FROM cand c
                JOIN mh x ON x.doc_id = c.id_a
                JOIN mh y ON y.doc_id = c.id_b AND y.p = x.p
                GROUP BY c.id_a, c.id_b
            )
    """
    _minhash_pairs_sql = (
        "WITH " + _minhash_chain
        + "\n            SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5"
    )
    # near_dup_dedup replay: the SAME chain continued through the exact
    # char-5-shingle Jaccard verify (>= 0.8), connected components as a
    # recursive min-label closure, and the canonical-keep filter — the whole
    # RefinedWeb-style removal chain value-matched in one SQL statement.
    _near_dup_sql = (
        "WITH RECURSIVE " + _minhash_chain + f""",
            cpairs AS MATERIALIZED (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
            participants AS (SELECT id_a AS doc_id FROM cpairs
                             UNION SELECT id_b FROM cpairs),
            psh AS MATERIALIZED (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS g
                FROM (
                    SELECT doc_id, text,
                           unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
                    FROM documents JOIN participants USING (doc_id)
                )
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM psh GROUP BY doc_id),
            inter AS (
                SELECT p.id_a, p.id_b, COUNT(*) AS ic
                FROM cpairs p
                JOIN psh x ON x.doc_id = p.id_a
                JOIN psh y ON y.doc_id = p.id_b AND y.g = x.g
                GROUP BY p.id_a, p.id_b
            ),
            verified AS MATERIALIZED (
                SELECT p.id_a, p.id_b
                FROM cpairs p
                JOIN sizes na ON na.doc_id = p.id_a
                JOIN sizes nb ON nb.doc_id = p.id_b
                LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
                WHERE CASE WHEN na.n + nb.n - COALESCE(i.ic, 0) = 0 THEN 1.0
                           ELSE COALESCE(i.ic, 0)::DOUBLE
                                / (na.n + nb.n - COALESCE(i.ic, 0)) END >= 0.8
            ),
            vnodes AS (SELECT id_a AS node FROM verified
                       UNION SELECT id_b FROM verified),
            vedges AS (SELECT id_a AS a, id_b AS b FROM verified
                       UNION SELECT id_b, id_a FROM verified),
            reach(node, r) AS (
                SELECT node, node FROM vnodes
                UNION
                SELECT e.a, reach.r FROM vedges e JOIN reach ON reach.node = e.b
            ),
            comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
            drops AS (SELECT node FROM comp WHERE node <> component)
            SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
            WHERE doc_id NOT IN (SELECT node FROM drops)
    """
    )
    # same chain, curation-grade keep rule: the LONGEST doc per component
    # (whitespace tokens DESC, id ASC) survives instead of the smallest id
    _near_dup_longest_sql = (
        _near_dup_sql[: _near_dup_sql.index("drops AS (")]
        + """drops AS (
                SELECT node FROM (
                    SELECT c.node,
                           ROW_NUMBER() OVER (
                               PARTITION BY c.component
                               ORDER BY len(regexp_extract_all(d.text, '\\S+')) DESC,
                                        c.node) AS rk
                    FROM comp c JOIN documents d ON d.doc_id = c.node
                ) WHERE rk <> 1)
            SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
            WHERE doc_id NOT IN (SELECT node FROM drops)
    """
    )
    # Language-ID replay: profiles embedded from the SAME module constants
    # the LangId actor compiles (textstats._STOPWORDS / accent sets).
    _sw_rows = ",".join(
        f"('{l}','{w}')" for l, ws in sorted(F_text._STOPWORDS.items()) for w in sorted(ws)
    )
    _accents = {"de": "äöüß", "fr": "éèêàçùâîôû", "es": "ñáéíóúü"}
    _ac_rows = ",".join(f"('{l}','{c}')" for l, cs in sorted(_accents.items()) for c in cs)
    _lang_rows = ",".join(f"('{l}')" for l in sorted(F_text._STOPWORDS))
    _lang_id_sql = f"""
            WITH sw(lang, w) AS (VALUES {_sw_rows}),
            ac(lang, ch) AS (VALUES {_ac_rows}),
            langs(lang) AS (VALUES {_lang_rows}),
            toks AS (
                SELECT doc_id, unnest(l[1:200]) AS tok
                FROM (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-zäöüéèêàáíóúñç]+') AS l
                      FROM documents)
            ),
            s1 AS (
                SELECT t.doc_id, s.lang, COUNT(*)::DOUBLE AS sc
                FROM toks t JOIN sw s ON t.tok = s.w GROUP BY t.doc_id, s.lang
            ),
            s2 AS (
                SELECT t.doc_id, a.lang, 0.5 * COUNT(*) AS sc
                FROM toks t JOIN ac a ON contains(t.tok, a.ch) GROUP BY t.doc_id, a.lang
            ),
            scores AS (
                SELECT d.doc_id, langs.lang,
                       COALESCE(s1.sc, 0) + COALESCE(s2.sc, 0) AS sc
                FROM (SELECT doc_id FROM documents) d
                CROSS JOIN langs
                LEFT JOIN s1 ON s1.doc_id = d.doc_id AND s1.lang = langs.lang
                LEFT JOIN s2 ON s2.doc_id = d.doc_id AND s2.lang = langs.lang
            ),
            best AS (
                SELECT doc_id, lang, sc,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY sc DESC, lang ASC) AS rn
                FROM scores
            )
            SELECT doc_id, CASE WHEN sc > 0 THEN lang ELSE 'unknown' END AS lang_pred
            FROM best WHERE rn = 1
    """
    # Shared simhash-fingerprint CTE: tokenize like Python str.split()
    # (\\s+ runs, empties dropped), md5 -> uint64 token hash, ±1 bit votes
    # over all occurrences, bit b set iff its vote sum > 0.
    _simhash_fp_sql = """
            WITH th AS (
                SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
                FROM (
                    SELECT doc_id, unnest(
                        list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                                    x -> x <> '')) AS tok
                    FROM documents
                )
            ),
            votes AS (
                SELECT doc_id, b,
                       SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
                FROM th, (SELECT unnest(range(0, 64)) AS b) bits
                GROUP BY doc_id, b
            ),
            fp AS (
                SELECT doc_id,
                       bit_or(CASE WHEN v > 0 THEN (1::HUGEINT << b)::UBIGINT
                              ELSE 0::UBIGINT END) AS f
                FROM votes GROUP BY doc_id
            )
    """
    _events_roundtrip_sql = """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
                   CAST(SUM(user_id) AS BIGINT) AS sum_user_id
            FROM events GROUP BY event_type
        """
    return {
        "rolling_min_events": """
            SELECT event_id, user_id,
                   MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                   ) AS roll_min_cents
            FROM events
        """,
        "scaled_event_values": """
            SELECT event_id, event_type,
                   ROUND(CAST(CAST(ROUND(value * 100) AS BIGINT) - mn AS DOUBLE)
                         / CAST(NULLIF(mx - mn, 0) AS DOUBLE), 6) AS scaled
            FROM (
                SELECT event_id, event_type, value,
                       MIN(CAST(ROUND(value * 100) AS BIGINT))
                           OVER (PARTITION BY event_type) AS mn,
                       MAX(CAST(ROUND(value * 100) AS BIGINT))
                           OVER (PARTITION BY event_type) AS mx
                FROM events
            )
        """,
        "ts_inversions_by_user": """
            SELECT user_id,
                   CAST(COALESCE(SUM(CASE WHEN ts < prev_ts THEN 1 END), 0) AS BIGINT)
                       AS n_inversions
            FROM (
                SELECT user_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
                FROM events
            )
            GROUP BY user_id
        """,
        "snm_dup_pairs": """
            WITH s AS (
                SELECT doc_id, text,
                       ROW_NUMBER() OVER (ORDER BY text, doc_id) AS r
                FROM documents WHERE length(text) >= 1
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(jaccard(a.text, b.text), 6) AS jac
            FROM s a JOIN s b ON b.r - a.r BETWEEN 1 AND 2
            WHERE ROUND(jaccard(a.text, b.text), 6) >= 0.5
        """,
        "training_shards": """
            WITH h AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents
            )
            SELECT doc_id,
                   CAST(strpos('0123456789abcdef', substr(h, 32, 1)) - 1 AS BIGINT) AS shard,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY strpos('0123456789abcdef', substr(h, 32, 1)) - 1
                       ORDER BY h, doc_id) AS BIGINT) AS pos
            FROM h
        """,
        "source_mix_interleave": """
            WITH rn AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                       ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
                FROM documents
            ), k AS (
                SELECT doc_id, source,
                       rn * (15 // CASE WHEN source IN ('src0', 'src1') THEN 5
                                        WHEN source IN ('src2', 'src3') THEN 3
                                        ELSE 1 END) AS mix_key
                FROM rn
            )
            SELECT doc_id, source,
                   CAST(ROW_NUMBER() OVER (ORDER BY mix_key, source, doc_id) AS BIGINT) AS mix_pos
            FROM k
        """,
        "q5_local_supplier_volume": """
            SELECT n.n_name,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_u
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "q9_product_profit": """
            SELECT n.n_name AS nation,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS profit_u
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_u
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE n1.n_name <> n2.n_name
              AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                                   AND TIMESTAMP '1996-12-31 23:59:59'
            GROUP BY 1, 2, 3
        """,
        "q19_discount_revenue": """
            SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_u
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 30)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
                   AND l_quantity BETWEEN 20 AND 40)
        """,
        "q8_market_share": """
            WITH l AS (
                SELECT l_orderkey,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_u,
                       n_name AS supp_nation
                FROM lineitem
                JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                WHERE p_type = 'PROMO'
            ), o AS (
                SELECT o_orderkey, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year
                FROM orders
                JOIN customer ON c_custkey = o_custkey
                JOIN nation ON n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name = 'ASIA'
                  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                      AND TIMESTAMP '1996-12-31 23:59:59'
            )
            SELECT o_year,
                   ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7'
                                       THEN rev_u ELSE 0 END) AS DOUBLE)
                         / CAST(SUM(rev_u) AS DOUBLE), 6) AS mkt_share
            FROM l JOIN o ON o.o_orderkey = l.l_orderkey
            GROUP BY o_year
        """,
        "q13_order_count_distribution": """
            SELECT CAST(n_orders AS BIGINT) AS n_orders,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
                  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
                  GROUP BY c_custkey)
            GROUP BY 1
        """,
        "q14_promo_share": """
            SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
                   ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS DOUBLE)
                         / CAST(SUM(rev_u) AS DOUBLE), 6) AS promo_share
            FROM (SELECT l_partkey, l_shipdate,
                         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_u
                  FROM lineitem) l
            JOIN part ON p_partkey = l_partkey
            GROUP BY ym
        """,
        "q15_top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
                       AS total_revenue_u
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue_u
            FROM r JOIN supplier ON s_suppkey = l_suppkey
            WHERE total_revenue_u = (SELECT MAX(total_revenue_u) FROM r)
        """,
        "q18_large_volume_customers": """
            WITH big AS (
                SELECT l_orderkey,
                       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 200
            )
            SELECT c_name, CAST(o_custkey AS BIGINT) AS o_custkey, o_orderkey,
                   o_orderdate,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
                   total_qty
            FROM big
            JOIN orders ON o_orderkey = big.l_orderkey
            JOIN customer ON c_custkey = o_custkey
        """,
        "monthly_revenue_growth": """
            WITH m AS (
                SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
                       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
                FROM orders GROUP BY ym
            )
            SELECT ym, revenue_cents,
                   ROUND(100.0 * (revenue_cents - prev) / prev, 6) AS growth_pct
            FROM (SELECT ym, revenue_cents,
                         LAG(revenue_cents) OVER (ORDER BY ym) AS prev FROM m)
            WHERE prev IS NOT NULL
        """,
        "user_cum_distinct_types": """
            SELECT event_id, user_id,
                   CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
            FROM (SELECT event_id, user_id, ts,
                         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                                      ORDER BY ts, event_id) = 1
                              THEN 1 ELSE 0 END AS is_first
                  FROM events)
        """,
        "distinctive_terms_by_lang": """
            WITH c AS (
                SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
                FROM (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS token
                      FROM documents)
                GROUP BY lang, token
            ), tok AS (
                SELECT token, CAST(SUM(n) AS BIGINT) AS n_tok FROM c GROUP BY token
            ), lng AS (
                SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang FROM c GROUP BY lang
            ), tot AS (
                SELECT CAST(SUM(n) AS DOUBLE) AS n FROM c
            ), scored AS (
                SELECT c.lang, c.token,
                       ROUND(CASE WHEN CAST(c.n AS DOUBLE) * tot.n
                                       > CAST(lng.n_lang AS DOUBLE) * tok.n_tok
                             THEN 2.0 * (
                                  CASE WHEN c.n > 0 THEN c.n * ln(c.n /
                                       (CAST(lng.n_lang AS DOUBLE) * tok.n_tok / tot.n))
                                       ELSE 0.0 END
                                + CASE WHEN lng.n_lang - c.n > 0
                                       THEN (lng.n_lang - c.n) * ln((lng.n_lang - c.n) /
                                            (CAST(lng.n_lang AS DOUBLE) * (tot.n - tok.n_tok) / tot.n))
                                       ELSE 0.0 END
                                + CASE WHEN tok.n_tok - c.n > 0
                                       THEN (tok.n_tok - c.n) * ln((tok.n_tok - c.n) /
                                            ((tot.n - lng.n_lang) * CAST(tok.n_tok AS DOUBLE) / tot.n))
                                       ELSE 0.0 END
                                + CASE WHEN tot.n - lng.n_lang - tok.n_tok + c.n > 0
                                       THEN (tot.n - lng.n_lang - tok.n_tok + c.n)
                                            * ln((tot.n - lng.n_lang - tok.n_tok + c.n) /
                                                 ((tot.n - lng.n_lang) * (tot.n - tok.n_tok) / tot.n))
                                       ELSE 0.0 END)
                             ELSE 0.0 END, 6) AS g2
                FROM c JOIN tok USING (token) JOIN lng USING (lang) CROSS JOIN tot
            )
            SELECT lang, token, g2 FROM scored
            QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY g2 DESC, token) <= 5
        """,
        "ppjoin_dup_pairs": """
            WITH tok AS (
                SELECT doc_id, w, i FROM (
                    SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w,
                           generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS i
                    FROM documents)
            ), sh AS (
                SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS s
                FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
                QUALIFY lead(w, 2) OVER win IS NOT NULL
            ), sets AS (
                SELECT doc_id, list_sort(list(DISTINCT s)) AS ts FROM sh GROUP BY doc_id
            ), sized AS (
                SELECT doc_id, ts, len(ts) AS n FROM sets WHERE len(ts) > 0
            ), pref AS (
                SELECT doc_id, unnest(ts[1 : n - CAST(CEIL(0.6 * n) AS BIGINT) + 1]) AS tok
                FROM sized
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
            ), verif AS (
                SELECT c.id_a, c.id_b,
                       ROUND(CAST(len(list_intersect(x.ts, y.ts)) AS DOUBLE)
                             / (x.n + y.n - len(list_intersect(x.ts, y.ts))), 6) AS jac
                FROM cand c
                JOIN sized x ON x.doc_id = c.id_a
                JOIN sized y ON y.doc_id = c.id_b
            )
            SELECT id_a, id_b, jac FROM verif WHERE jac >= 0.6
        """,
        "rrf_doc_fusion": """
            WITH tok AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
                FROM documents
            ),
            dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
            stats AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                       SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
                FROM dl
            ),
            tf AS (
                SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                FROM tok WHERE token IN ('query', 'table', 'spark', 'window')
                GROUP BY doc_id, token
            ),
            df AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token),
            scored AS (
                SELECT tf.doc_id,
                       SUM(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                       ) AS score
                FROM tf
                JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
                GROUP BY tf.doc_id
            ),
            bm AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC, doc_id) AS r
                FROM (SELECT doc_id, score FROM scored WHERE score > 0
                      ORDER BY score DESC, doc_id ASC LIMIT 20)
            ),
            counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
            tot AS (SELECT SUM(n) AS t FROM counts),
            vocab AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 20),
            lp AS (SELECT v.token,
                          CAST(ROUND(LOG10(v.n / tot.t) * 1e6) AS BIGINT) AS lp
                   FROM vocab v, tot),
            flr AS (SELECT CAST(ROUND(LOG10(0.5 / t) * 1e6) AS BIGINT) AS flp FROM tot),
            per_doc AS (
                SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                       CAST(SUM(COALESCE(lp.lp, flr.flp)) AS BIGINT) AS lp_micro
                FROM tok tk LEFT JOIN lp USING (token) CROSS JOIN flr
                GROUP BY tk.doc_id
            ),
            fl AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY CAST(lp_micro AS DOUBLE) / n_tokens DESC,
                                          doc_id) AS r
                FROM per_doc WHERE n_tokens > 0
                QUALIFY ROW_NUMBER() OVER (ORDER BY CAST(lp_micro AS DOUBLE) / n_tokens DESC,
                                           doc_id) <= 20
            )
            SELECT doc_id, ROUND(SUM(1.0 / (60 + r)), 6) AS rrf
            FROM (SELECT * FROM bm UNION ALL SELECT * FROM fl)
            GROUP BY doc_id
            ORDER BY rrf DESC, doc_id ASC LIMIT 10
        """,
        "winsorized_event_values": """
            WITH e AS (
                SELECT event_id, event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS cents
                FROM events
            ), b AS (
                SELECT event_type,
                       quantile_cont(cents, 0.05) AS lo,
                       quantile_cont(cents, 0.95) AS hi
                FROM e GROUP BY event_type
            )
            SELECT event_id, e.event_type,
                   ROUND(LEAST(GREATEST(CAST(cents AS DOUBLE), lo), hi), 6) AS w_cents
            FROM e JOIN b USING (event_type)
        """,
        "event_type_daily_drift": """
            WITH c AS (
                SELECT epoch_us(ts) // 86400000000 AS d, event_type,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2
            ), tot AS (
                SELECT d, SUM(n) AS nd FROM c GROUP BY d
            ), p AS (
                SELECT c.d, c.event_type, CAST(n AS DOUBLE) / nd AS p
                FROM c JOIN tot USING (d)
            ), days AS (
                SELECT d FROM tot a
                WHERE EXISTS (SELECT 1 FROM tot b WHERE b.d = a.d + 1)
            ), types AS (SELECT DISTINCT event_type FROM c),
            grid AS (SELECT days.d, types.event_type FROM days CROSS JOIN types),
            j AS (
                SELECT g.d, COALESCE(pa.p, 0) AS p, COALESCE(pb.p, 0) AS q
                FROM grid g
                LEFT JOIN p pa ON pa.d = g.d AND pa.event_type = g.event_type
                LEFT JOIN p pb ON pb.d = g.d + 1 AND pb.event_type = g.event_type
            )
            SELECT CAST(d AS BIGINT) AS day_a, CAST(d + 1 AS BIGINT) AS day_b,
                   ROUND(0.5 * SUM(CASE WHEN p > 0
                                        THEN p * ln(p / (0.5 * (p + q))) ELSE 0 END)
                         + 0.5 * SUM(CASE WHEN q > 0
                                          THEN q * ln(q / (0.5 * (p + q))) ELSE 0 END),
                         6) AS jsd
            FROM j GROUP BY d
        """,
        "label_between_variance": """
            WITH d AS (SELECT CAST(i AS BIGINT) AS i FROM range(64) t(i)),
                 x AS (SELECT CAST(label AS BIGINT) AS label, d.i,
                              CAST(list_extract(embedding, d.i + 1) AS DOUBLE) AS v
                       FROM embeddings CROSS JOIN d),
                 lm AS (SELECT label, i, AVG(v) AS mu, COUNT(*) AS n
                        FROM x GROUP BY label, i),
                 gm AS (SELECT i, AVG(v) AS gmu FROM x GROUP BY i)
            SELECT lm.label, CAST(MAX(lm.n) AS BIGINT) AS n,
                   ROUND(SUM(lm.n * (lm.mu - gm.gmu) * (lm.mu - gm.gmu)), 6) AS between
            FROM lm JOIN gm USING (i)
            GROUP BY lm.label
        """,
        "label_intra_variance": """
            WITH d AS (SELECT CAST(i AS BIGINT) AS i FROM range(64) t(i)),
                 x AS (SELECT CAST(label AS BIGINT) AS label, d.i,
                              CAST(list_extract(embedding, d.i + 1) AS DOUBLE) AS v
                       FROM embeddings CROSS JOIN d),
                 pv AS (SELECT label, i, var_pop(v) AS vp, COUNT(*) AS n
                        FROM x GROUP BY label, i)
            SELECT label, CAST(MAX(n) AS BIGINT) AS n, ROUND(SUM(vp), 6) AS tr_var
            FROM pv GROUP BY label
        """,
        "zorder_pruned_events": """
            SELECT user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            WHERE user_id >= 100 AND user_id < 120
            GROUP BY user_id
        """,
        "event_last_order_asof": """
            WITH o AS (
                SELECT o_custkey AS user_id, o_orderdate AS ots, o_orderkey AS ok,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders
                QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                           ORDER BY o_orderkey DESC) = 1
            )
            SELECT e.event_id, o.ok, o.cents
            FROM events e ASOF JOIN o
              ON e.user_id = o.user_id AND o.ots <= e.ts
        """,
        "running_revenue_total": """
            SELECT o_orderkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        OVER (ORDER BY epoch_us(o_orderdate), o_orderkey
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
            FROM orders
        """,
        "late_event_flags": """
            SELECT event_id,
                   MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                           ROWS UNBOUNDED PRECEDING) AS wm_us,
                   CAST(MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                                ROWS UNBOUNDED PRECEDING)
                        - epoch_us(ts) > 1800000000 AS BIGINT) AS late
            FROM events
        """,
        "ann_filtered": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 5
            ),
            s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS cosine
                FROM q CROSS JOIN embeddings e
                WHERE e.label = 2
            ),
            r AS (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
                FROM s
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
        """,
        "q6_forecast_revenue": """
            SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_u
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q16_supplier_variety": """
            SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_size
        """,
        "q17_small_quantity_revenue": """
            WITH l AS (
                SELECT l_partkey, l_quantity,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#1'
            ), a AS (
                SELECT l_partkey,
                       0.2 * (CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
                              / COUNT(*)) AS thr
                FROM l GROUP BY l_partkey
            )
            SELECT ROUND(CAST(SUM(price_c) AS DOUBLE) / 7.0, 6) AS avg_yearly
            FROM l JOIN a USING (l_partkey)
            WHERE l_quantity < thr
        """,
        "skew_split_brand_revenue": """
            SELECT p_brand,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_u
            FROM lineitem JOIN part ON p_partkey = l_partkey
            GROUP BY p_brand
        """,
        "copartitioned_revenue_join": """
            SELECT o_orderpriority,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS revenue_u
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "source_precedence_dedup": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       ROW_NUMBER() OVER (PARTITION BY text ORDER BY source, doc_id) AS rn
                FROM documents)
            WHERE rn = 1
        """,
        "embedding_covariance": """
            WITH d AS (SELECT CAST(i AS BIGINT) AS i FROM range(8) t(i)),
                 p AS (SELECT a.i AS i, b.i AS j FROM d a JOIN d b ON a.i <= b.i)
            SELECT p.i AS i, p.j AS j,
                   covar_pop(CAST(list_extract(e.embedding, p.i + 1) AS DOUBLE),
                             CAST(list_extract(e.embedding, p.j + 1) AS DOUBLE)) AS cov
            FROM embeddings e CROSS JOIN p
            GROUP BY p.i, p.j
        """,
        "first_event_per_user_day": """
            SELECT user_id,
                   epoch_us(ts) // 86400000000 AS d,
                   event_id
            FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id, epoch_us(ts) // 86400000000
                ORDER BY ts, event_id
            ) = 1
        """,
        "event_value_mad": """
            SELECT event_type,
                   mad(CAST(ROUND(value * 100) AS BIGINT)) AS mad_cents
            FROM events GROUP BY event_type
        """,
        "event_type_share": """
            WITH t AS (
                SELECT event_type,
                       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS total_cents
                FROM events GROUP BY event_type
            )
            SELECT event_type, CAST(total_cents AS BIGINT) AS total_cents,
                   ROUND(CAST(total_cents AS DOUBLE)
                         / CAST(SUM(total_cents) OVER () AS DOUBLE), 9) AS share
            FROM t
        """,
        "event_value_deciles": """
            SELECT event_id,
                   NTILE(10) OVER (
                       ORDER BY CAST(ROUND(value * 100) AS BIGINT), event_id
                   ) AS decile
            FROM events
        """,
        "supplier_part_mincost": """
            WITH base AS (
                SELECT CAST(l_suppkey AS BIGINT) AS u,
                       CAST(1000000 + l_partkey AS BIGINT) AS v,
                       MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS w
                FROM lineitem GROUP BY 1, 2
            ),
            e AS (
                SELECT u, v, w FROM base
                UNION ALL
                SELECT v AS u, u AS v, w FROM base
            ),
            d0 AS (
                SELECT CAST(s_suppkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
                FROM supplier WHERE s_nationkey = 0
            ),
            d1 AS (
                SELECT node, MIN(dist) AS dist FROM (
                    SELECT node, dist FROM d0
                    UNION ALL
                    SELECT e.v AS node, d0.dist + e.w AS dist FROM d0 JOIN e ON e.u = d0.node
                ) GROUP BY node
            ),
            d2 AS (
                SELECT node, MIN(dist) AS dist FROM (
                    SELECT node, dist FROM d1
                    UNION ALL
                    SELECT e.v AS node, d1.dist + e.w AS dist FROM d1 JOIN e ON e.u = d1.node
                ) GROUP BY node
            ),
            d3 AS (
                SELECT node, MIN(dist) AS dist FROM (
                    SELECT node, dist FROM d2
                    UNION ALL
                    SELECT e.v AS node, d2.dist + e.w AS dist FROM d2 JOIN e ON e.u = d2.node
                ) GROUP BY node
            )
            SELECT node, dist FROM d3
        """,
        "pareto_parts": """
            WITH p AS (
                SELECT p_partkey,
                       CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
                       p_size
                FROM part
            )
            SELECT p_partkey, price_c, p_size FROM p t
            WHERE NOT EXISTS (
                SELECT 1 FROM p q
                WHERE q.price_c <= t.price_c AND q.p_size >= t.p_size
                  AND (q.price_c < t.price_c OR q.p_size > t.p_size)
            )
        """,
        "nation_customer_names": """
            SELECT n_name,
                   string_agg(c_name, '|' ORDER BY c_custkey) AS names
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "canonical_prefix_docs": """
            SELECT doc_id FROM (
                SELECT doc_id,
                       array_to_string(
                           (regexp_extract_all(text, '\\S+'))[1:3], ' ') AS pfx
                FROM documents
            ) QUALIFY ROW_NUMBER() OVER (PARTITION BY pfx ORDER BY doc_id) = 1
        """,
        "grouping_sets_lineitem": """
            SELECT l_returnflag, l_linestatus, l_linenumber,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS qty_cents
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_linenumber), ())
        """,
        "dup_token_spans": """
            WITH t AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id, i - 1 AS pos,
                       array_to_string(toks[i:i+4], ' ') AS ng
                FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(i)
            ), d AS (
                SELECT ng FROM g GROUP BY ng HAVING COUNT(*) > 1
            ), o AS (
                SELECT g.doc_id, g.pos FROM g JOIN d USING (ng)
            ), b AS (
                SELECT doc_id, pos,
                       CASE WHEN pos - LAG(pos) OVER (
                                PARTITION BY doc_id ORDER BY pos) <= 5
                            THEN 0 ELSE 1 END AS brk
                FROM o
            ), grp AS (
                SELECT doc_id, pos,
                       SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS gid
                FROM b
            )
            SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 5 AS span_end,
                   COUNT(*) AS n_dup_ngrams
            FROM grp GROUP BY doc_id, gid
        """,
        "pack_sequences": """
            WITH t AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n
                FROM documents
            ), c AS (
                SELECT doc_id, n,
                       CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
                            AS BIGINT) AS s
                FROM t WHERE n > 0
            ), w AS (
                SELECT doc_id, n, s,
                       unnest(generate_series(s // 64, (s + n - 1) // 64)) AS window_id
                FROM c
            )
            SELECT window_id, doc_id,
                   GREATEST(window_id * 64 - s, 0) AS tok_start,
                   LEAST((window_id + 1) * 64 - s, n) AS tok_end
            FROM w
        """,
        "bloom_semi_join_lineitem": """
            SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN (
                SELECT o_orderkey FROM orders WHERE o_totalprice > 150000
            )
            GROUP BY l_returnflag
        """,
        "doc_split_counts": """
            SELECT source,
                   CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
                        WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*) AS n
            FROM documents GROUP BY 1, 2
        """,
        "partition_pruned_events": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY event_type
        """,
        "rowgroup_pruned_lineitem": """
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                       AS qty_cents
            FROM lineitem
            WHERE l_orderkey BETWEEN 1000 AND 5000
        """,
        "events_jsonl_roundtrip": _events_roundtrip_sql,
        "events_csv_roundtrip": _events_roundtrip_sql,
        "filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
            FROM lineitem WHERE l_quantity > 30
        """,
        "groupby_pricing": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "distinct_flags": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "semi_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        """,
        "revenue_by_nation": """
            SELECT n.n_name AS n_name,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "window_lag_events": """
            SELECT event_id, user_id, value,
                   LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
            FROM events
        """,
        "event_lead_gap": """
            SELECT event_id, user_id,
                   epoch_us(LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id))
                     - epoch_us(ts) AS gap_us
            FROM events
            QUALIFY gap_us IS NOT NULL
        """,
        "latest_event_per_user": """
            SELECT user_id, event_id, ts, event_type, value
            FROM events
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cohort_retention": """
            WITH act AS (
                SELECT DISTINCT user_id,
                       datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
                FROM events
            ),
            f AS (SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id)
            SELECT f.cohort_day, act.d - f.cohort_day AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS users
            FROM act JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "regr_price_by_qty": """
            SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   ROUND(regr_slope(CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                                    CAST(l_quantity AS BIGINT)), 4) AS slope,
                   ROUND(regr_intercept(CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                                        CAST(l_quantity AS BIGINT)), 4) AS intercept
            FROM lineitem GROUP BY l_returnflag
        """,
        "paragraph_dedup": """
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
            ),
            chunks0 AS (
                SELECT doc_id, t,
                       unnest(range(0, CAST(ceil(len(t) / 20.0) AS BIGINT))) AS chunk_idx
                FROM toks
            ),
            chunks AS (
                SELECT doc_id, chunk_idx,
                       array_to_string(t[(chunk_idx*20+1):((chunk_idx+1)*20)], ' ') AS para
                FROM chunks0
            )
            SELECT doc_id, chunk_idx, para FROM chunks
            QUALIFY ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, chunk_idx) = 1
        """,
        "bm25_top_docs": """
            WITH tok AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
                FROM documents
            ),
            dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
            stats AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                       SUM(dl) / CAST(COUNT(*) AS DOUBLE) AS avgdl
                FROM dl
            ),
            tf AS (
                SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                FROM tok WHERE token IN ('query', 'table', 'spark', 'window')
                GROUP BY doc_id, token
            ),
            df AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token),
            scored AS (
                SELECT tf.doc_id,
                       SUM(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                           * (tf.tf * 2.2)
                           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                       ) AS score
                FROM tf
                JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
                GROUP BY tf.doc_id
            )
            SELECT doc_id, ROUND(score, 6) AS bm25
            FROM scored WHERE score > 0
            ORDER BY score DESC, doc_id ASC LIMIT 20
        """,
        "part_neighbor_jaccard": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM op a JOIN op b USING (l_orderkey)
                WHERE a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            adj AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY node),
            cmn AS (
                SELECT a.node AS src, b.node AS dst, CAST(COUNT(*) AS BIGINT) AS common
                FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
                GROUP BY 1, 2
            )
            SELECT src, dst, common,
                   ROUND(CAST(common AS DOUBLE) / (da.d + db.d - common), 6) AS jaccard
            FROM cmn JOIN deg da ON da.node = src JOIN deg db ON db.node = dst
            ORDER BY jaccard DESC, src ASC, dst ASC LIMIT 100
        """,
        "order_flags_by_customer": """
            SELECT o_custkey,
                   bool_or(o_orderstatus = 'F') AS any_f,
                   bool_and(o_totalprice > 1000) AS all_big,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey
        """,
        "user_activity_islands": """
            WITH iv AS (
                SELECT user_id, epoch_us(ts) AS s,
                       epoch_us(ts) + CAST(ROUND(value * 1000000) AS BIGINT) AS e
                FROM events
            ), b AS (
                SELECT user_id, s, e,
                       CASE WHEN s <= max(e) OVER (
                                PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                            THEN 0 ELSE 1 END AS brk
                FROM iv
            ), g AS (
                SELECT user_id, s, e,
                       CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
                FROM b
            )
            SELECT user_id, island, MIN(s) AS island_start, MAX(e) AS island_end,
                   COUNT(*) AS n_rows
            FROM g GROUP BY user_id, island
        """,
        "weighted_doc_sample": """
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       pow(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0,
                           1.0 / GREATEST(n_chars, 1)) AS k
                FROM documents)
            ORDER BY k DESC, doc_id LIMIT 100
        """,
        "event_global_ordinals": """
            SELECT event_id,
                   ROW_NUMBER() OVER (ORDER BY ts, event_id) AS ordinal
            FROM events
        """,
        "doc_sliding_chunks": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tl
                FROM documents
            ), sized AS (
                SELECT doc_id, tl, len(tl) AS L FROM toks WHERE len(tl) > 0
            ), idx AS (
                SELECT doc_id, tl, L,
                       unnest(generate_series(0,
                           CAST(CEIL(GREATEST(L - 32, 0) / 16.0) AS BIGINT))) AS chunk_idx
                FROM sized
            )
            SELECT doc_id, chunk_idx,
                   array_to_string(tl[chunk_idx*16 + 1 : chunk_idx*16 + 32], ' ') AS chunk
            FROM idx
        """,
        "event_transitions": """
            WITH s AS (
                SELECT user_id, event_type,
                       LAG(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS from_type
                FROM events
            )
            SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM s WHERE from_type IS NOT NULL
            GROUP BY from_type, event_type
        """,
        "balanced_doc_sample": """
            WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
            SELECT doc_id, source FROM (
                SELECT d.doc_id, d.source,
                       c.n * LOG10(((d.doc_id * 2654435761) % 4294967296 + 0.5)
                                   / 4294967296.0) AS k
                FROM documents d JOIN c USING (source)
            ) ORDER BY k DESC, doc_id LIMIT 200
        """,
        "embedding_pca": _pca_power_oracle_sql(),
        "bpe_merges": _bpe_merges_oracle_sql(),
        "bpe_encoded_docs": _bpe_encoded_oracle_sql(),
        "kmeans_clusters": _kmeans_oracle_sql(),
        "semantic_dedup": _semantic_dedup_oracle_sql(),
        "embedding_near_dup": _embedding_near_dup_oracle_sql(),
        "ann_ivf_flat": _ann_ivf_flat_oracle_sql(),
        "ann_pq_adc": _ann_pq_adc_oracle_sql(),
        "dsir_topk_docs": _dsir_topk_oracle_sql(),
        "mmr_diverse_topk_exact": _mmr_exact_oracle_sql(),
        "ann_ivf_pq_exact": _ann_ivf_pq_exact_oracle_sql(),
        "doc_quality_logreg_exact": _logreg_exact_oracle_sql(),
        "dedup_cleaned_docs": _DEDUP_CLEAN_ORACLE,
        "doc_novelty_scores": _DOC_NOVELTY_ORACLE,
        "semantic_dedup_capped": _semantic_dedup_capped_oracle_sql(),
        "doc_lm_score": """
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
                FROM documents
            ),
            counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
            tot AS (SELECT SUM(n) AS t FROM counts),
            vocab AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 20),
            lp AS (SELECT v.token,
                          CAST(ROUND(LOG10(v.n / tot.t) * 1e6) AS BIGINT) AS lp
                   FROM vocab v, tot),
            flr AS (SELECT CAST(ROUND(LOG10(0.5 / t) * 1e6) AS BIGINT) AS flp FROM tot)
            SELECT d.doc_id,
                   CAST(COUNT(tk.token) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(SUM(CASE WHEN tk.token IS NULL THEN 0
                                          ELSE COALESCE(lp.lp, flr.flp) END), 0)
                        AS BIGINT) AS lp_micro
            FROM documents d
            LEFT JOIN toks tk ON tk.doc_id = d.doc_id
            LEFT JOIN lp ON lp.token = tk.token
            CROSS JOIN flr
            GROUP BY d.doc_id
        """,
        "lineitem_checksum": """
            SELECT CAST(SUM(
                (((((l_orderkey % 2147483647) * 1000003 + l_partkey) % 2147483647)
                   * 1000003 + l_suppkey) % 2147483647 * 1000003 + l_linenumber)
                % 2147483647
            ) % 2147483647 AS BIGINT) AS checksum FROM lineitem
        """,
        "skew_value_by_type": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   ROUND(skewness(CAST(ROUND(value * 100) AS BIGINT)), 6) AS skew,
                   ROUND(kurtosis(CAST(ROUND(value * 100) AS BIGINT)), 6) AS kurt
            FROM events GROUP BY event_type
        """,
        "top_terms_by_lang": """
            WITH c AS (
                SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
                FROM (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS token
                      FROM documents)
                GROUP BY lang, token
            )
            SELECT lang, token, n FROM c
            QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) <= 5
        """,
        "suppliers_per_region": """
            SELECT r.r_name AS r_name,
                   CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
                   COUNT(*) AS n_suppliers
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "parts_by_brand": """
            SELECT p_brand,
                   CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   MAX(p_size) AS max_size,
                   COUNT(*) AS n_parts
            FROM part GROUP BY p_brand
        """,
        "bpeish_tokens": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]')) AS BIGINT)
                       AS n_subtokens
            FROM documents
        """,
        "json_extract_events": """
            SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "union_customers": """
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 7500
            UNION
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "user_event_ranks": """
            SELECT event_id, user_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
            FROM events
        """,
        "p90_value_by_type": """
            SELECT event_type,
                   CAST(quantile_disc(CAST(ROUND(value * 100) AS BIGINT), 0.9) AS BIGINT) AS p90_cents
            FROM events GROUP BY event_type
        """,
        "except_customers": """
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
        """,
        "doc_word_positions": """
            SELECT * FROM (
                SELECT doc_id,
                       CAST(generate_subscripts(arr, 1) AS BIGINT) AS pos,
                       unnest(arr) AS word
                FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS arr FROM documents)
            ) WHERE word <> ''
        """,
        "distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "part_name_scalars": """
            SELECT p_partkey,
                   UPPER(p_name) AS name_upper,
                   SUBSTR(p_name, 1, 8) AS name_head,
                   CAST(LENGTH(p_name) AS BIGINT) AS name_len,
                   p_brand || ':' || p_name AS brand_name
            FROM part
        """,
        "events_time_parts": """
            SELECT event_id,
                   CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
                   CAST(EXTRACT(month FROM ts) AS BIGINT) AS m,
                   CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h
            FROM events
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "stddev_value_by_type": """
            WITH m AS (
                SELECT event_type,
                       COUNT(*) AS n_rows,
                       SUM(vc) AS sx,
                       SUM(vc * vc) AS sxx
                FROM (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS vc FROM events)
                GROUP BY event_type
            )
            SELECT event_type, n_rows,
                   (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0)) AS var_samp,
                   SQRT((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0))) AS stddev_samp
            FROM m
        """,
        "rollup_suppliers": """
            SELECT r.r_name AS r_name, n.n_name AS n_name,
                   CAST(SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents,
                   COUNT(*) AS n_suppliers
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP (r.r_name, n.n_name)
        """,
        "intersect_customers": """
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 7500
            INTERSECT
            SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "sampled_lineitem": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents
            FROM lineitem
            WHERE (l_orderkey * 2654435761 + l_linenumber * 40503) % 1000 < 125
        """,
        "redact_customer_names": """
            SELECT c_custkey,
                   regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS redacted,
                   CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_ids
            FROM customer
        """,
        "quantity_histogram": """
            SELECT CAST(FLOOR(l_quantity / 5) * 5 AS BIGINT) AS bin_lo,
                   COUNT(*) AS n_items,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
            FROM lineitem GROUP BY 1
        """,
        "nations_per_region_agg": """
            SELECT r.r_name AS r_name,
                   string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "doc_repetition": """
            WITH w AS (
                SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word FROM documents
            ), c AS (
                SELECT doc_id, word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY doc_id, word
            )
            SELECT doc_id,
                   CAST(SUM(n) AS BIGINT) AS n_words,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(MAX(n) AS BIGINT) AS top_word_n,
                   1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac
            FROM c GROUP BY doc_id
        """,
        "p50_cont_value_by_type": """
            SELECT event_type,
                   quantile_cont(CAST(CAST(ROUND(value * 100) AS BIGINT) AS DOUBLE), 0.5)
                       AS p50_cents
            FROM events GROUP BY event_type
        """,
        "event_value_ranks": """
            SELECT event_id, event_type,
                   CAST(RANK() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC) AS BIGINT) AS rnk,
                   CAST(DENSE_RANK() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC) AS BIGINT) AS drnk
            FROM events
        """,
        "hopping_events": f"""
            WITH h AS (
                SELECT (epoch_us(ts) // (CAST({_HOP_S} AS BIGINT) * 1000000)) * {_HOP_S} AS base_s,
                       event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS vc
                FROM events
            ), w AS (
                SELECT base_s AS window_epoch_s, event_type, vc FROM h
                UNION ALL
                SELECT base_s - {_HOP_S} AS window_epoch_s, event_type, vc FROM h
            )
            SELECT window_epoch_s, event_type,
                   CAST(SUM(vc) AS BIGINT) AS sum_value_cents,
                   COUNT(*) AS n_events
            FROM w GROUP BY 1, 2
        """,
        "heavy_hitter_terms": """
            SELECT token, COUNT(*) AS n_min
            FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents)
            WHERE token <> ''
            GROUP BY token ORDER BY n_min DESC, token ASC LIMIT 20
        """,
        "clean_corpus": """
            WITH w AS (
                SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word FROM documents
            ), c AS (
                SELECT doc_id, word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY doc_id, word
            ), s AS (
                SELECT doc_id,
                       CAST(SUM(n) AS BIGINT) AS n_words,
                       1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac
                FROM c GROUP BY doc_id
            ), kept AS (
                SELECT d.doc_id, d.text, s.n_words
                FROM documents d JOIN s USING (doc_id)
                WHERE s.n_words >= 30 AND s.dup_frac <= 0.6
            )
            SELECT doc_id, n_words FROM kept
            WHERE doc_id IN (SELECT MIN(doc_id) FROM kept GROUP BY text)
        """,
        "curated_corpus": """
            WITH train AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7
            ), w AS (
                SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word FROM train
            ), c AS (
                SELECT doc_id, word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY doc_id, word
            ), s AS (
                SELECT doc_id,
                       CAST(SUM(n) AS BIGINT) AS n_words,
                       1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac
                FROM c GROUP BY doc_id
            ), kept AS (
                SELECT t.doc_id, t.text, s.n_words
                FROM train t JOIN s USING (doc_id)
                WHERE s.n_words >= 30 AND s.dup_frac <= 0.6
            ), survivors AS (
                SELECT doc_id, n_words FROM kept
                WHERE doc_id IN (SELECT MIN(doc_id) FROM kept GROUP BY text)
            ), toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS tok,
                       generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS pos
                FROM documents
            ), tri AS (
                SELECT t0.doc_id,
                       t0.tok || ' ' || t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok AS tg
                FROM toks t0
                JOIN toks t1 ON t0.doc_id = t1.doc_id AND t1.pos = t0.pos + 1
                JOIN toks t2 ON t0.doc_id = t2.doc_id AND t2.pos = t0.pos + 2
                JOIN toks t3 ON t0.doc_id = t3.doc_id AND t3.pos = t0.pos + 3
                JOIN toks t4 ON t0.doc_id = t4.doc_id AND t4.pos = t0.pos + 4
            ), bench AS (
                SELECT DISTINCT tg FROM tri WHERE doc_id % 10 = 7
            ), contaminated AS (
                SELECT DISTINCT t.doc_id FROM tri t JOIN bench USING (tg)
            )
            SELECT doc_id, n_words FROM survivors
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        """,
        "customer_order_counts": """
            SELECT c.c_custkey, c.c_name,
                   CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
                   CAST(COALESCE(o.total_cents, 0) AS BIGINT) AS total_cents
            FROM customer c LEFT JOIN (
                SELECT o_custkey,
                       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents,
                       COUNT(*) AS n_orders
                FROM orders GROUP BY o_custkey
            ) o ON c.c_custkey = o.o_custkey
        """,
        "asof_click_value": """
            SELECT e.event_id, e.user_id,
                   CAST(COALESCE(c.value_cents, -1) AS BIGINT) AS last_click_cents
            FROM events e ASOF LEFT JOIN (
                SELECT user_id, ts, CAST(ROUND(value * 100) AS BIGINT) AS value_cents
                FROM events WHERE event_type = 'click'
            ) c ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
        "rolling_sum_events": f"""
            SELECT event_id, user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS roll_cents
            FROM events
        """,
        "top_terms": """
            SELECT token, COUNT(*) AS n
            FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS token FROM documents)
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 50
        """,
        "cumsum_user_value": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS cum_cents
            FROM events
        """,
        "top_bigrams": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS tok,
                       generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS pos
                FROM documents
            )
            SELECT a.tok || ' ' || b.tok AS bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 40
        """,
        "event_deviation": """
            SELECT e.event_id, e.user_id, e.event_type,
                   CAST(g.grp_n * CAST(ROUND(e.value * 100) AS BIGINT) - g.grp_sum AS BIGINT)
                       AS dev_n_cents
            FROM events e
            JOIN (SELECT user_id, event_type,
                         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS grp_sum,
                         COUNT(*) AS grp_n
                  FROM events GROUP BY user_id, event_type) g
            ON e.user_id = g.user_id AND e.event_type = g.event_type
        """,
        "user_cooccurrence_clusters": """
            WITH RECURSIVE du AS (
                SELECT DISTINCT user_id, event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS cents,
                       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
                FROM events
            ),
            e0 AS (
                SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
                FROM du a JOIN du b
                  ON a.event_type = b.event_type AND a.cents = b.cents
                 AND a.day = b.day AND a.user_id < b.user_id
            ),
            edges AS (SELECT ua, ub FROM e0 UNION SELECT ub, ua FROM e0),
            nodes AS (SELECT DISTINCT ua AS n FROM edges),
            reach(src, dst) AS (
                SELECT n, n FROM nodes
                UNION
                SELECT r.src, e.ub FROM reach r JOIN edges e ON r.dst = e.ua
            ),
            comp AS (
                SELECT src AS user_id, MIN(dst) AS cluster_id
                FROM reach GROUP BY src
            )
            SELECT c.user_id, c.cluster_id, s.cluster_size
            FROM comp c
            JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                  FROM comp GROUP BY cluster_id) s USING (cluster_id)
        """,
        "pagerank_supplier_parts": _pagerank_oracle_sql(iters=5, damping=0.85),
        "shingle_dup_clusters": """
            WITH RECURSIVE toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT a.doc_id,
                       a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok
                             || ' ' || e.tok AS gram
                FROM toks a
                JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
                JOIN toks d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
                JOIN toks e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4
                WHERE a.tok <> '' AND b.tok <> '' AND c.tok <> ''
                  AND d.tok <> '' AND e.tok <> ''
            ),
            e0 AS (
                SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
                FROM grams a JOIN grams b USING (gram)
                WHERE a.doc_id < b.doc_id
            ),
            edges AS (SELECT ua, ub FROM e0 UNION SELECT ub, ua FROM e0),
            nodes AS (SELECT DISTINCT ua AS n FROM edges),
            reach(src, dst) AS (
                SELECT n, n FROM nodes
                UNION
                SELECT r.src, e.ub FROM reach r JOIN edges e ON r.dst = e.ua
            ),
            comp AS (
                SELECT src AS doc_id, MIN(dst) AS cluster_id
                FROM reach GROUP BY src
            )
            SELECT c.doc_id, c.cluster_id, s.cluster_size
            FROM comp c
            JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                  FROM comp GROUP BY cluster_id) s USING (cluster_id)
        """,
        "html_main_content": """
            SELECT doc_id, text AS main_text FROM documents
        """,
        "label_centroids": """
            SELECT CAST(label AS BIGINT) AS label, CAST(d AS BIGINT) AS d,
                   CAST(ROUND(AVG(CAST(v AS DOUBLE)) * 1000000) AS BIGINT)
                       AS mean_e6
            FROM (SELECT label, unnest(embedding) AS v,
                         generate_subscripts(embedding, 1) AS d
                  FROM embeddings)
            GROUP BY label, d
        """,
        "normalize_docs": """
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
                       AS norm_text
            FROM documents
        """,
        "profile_lineitem": """
            SELECT 'l_quantity' AS "column", CAST(MIN(l_quantity) AS DOUBLE) AS vmin,
                   CAST(MAX(l_quantity) AS DOUBLE) AS vmax,
                   CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_null,
                   CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', CAST(MIN(l_extendedprice) AS DOUBLE),
                   CAST(MAX(l_extendedprice) AS DOUBLE),
                   CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM lineitem
            UNION ALL
            SELECT 'l_discount', CAST(MIN(l_discount) AS DOUBLE),
                   CAST(MAX(l_discount) AS DOUBLE),
                   CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM lineitem
            UNION ALL
            SELECT 'l_tax', CAST(MIN(l_tax) AS DOUBLE),
                   CAST(MAX(l_tax) AS DOUBLE),
                   CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT) FROM lineitem
        """,
        "events_in_type_windows": """
            WITH iv AS (
                SELECT event_type AS itype,
                       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
                       MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
                FROM events GROUP BY 1, 2
            )
            SELECT e.event_id, i.itype, i.d
            FROM events e JOIN iv i
              ON epoch_us(e.ts) >= i.lo AND epoch_us(e.ts) <= i.hi
        """,
        "regex_extract_docs": """
            SELECT doc_id, regexp_extract(text, '(qu[a-z]+)') AS first_qu
            FROM documents
        """,
        "returned_revenue_by_customer": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                       AS revenue_u
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, n.n_name
            ORDER BY revenue_u DESC, c.c_custkey ASC
            LIMIT 20
        """,
        "salted_type_join": """
            SELECT e.event_id, e.event_type, g.type_sum_cents
            FROM events e
            JOIN (SELECT event_type,
                         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS type_sum_cents
                  FROM events GROUP BY event_type) g
            ON e.event_type = g.event_type
        """,
        "trailing_hour_events": """
            SELECT event_id, user_id,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS trail_sum_cents,
                   CAST(COUNT(*) OVER w AS BIGINT) AS trail_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """,
        "edit_distance_pairs": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents
            ),
            grams AS (
                SELECT DISTINCT a.doc_id,
                       a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok
                             || ' ' || e.tok AS gram
                FROM toks a
                JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
                JOIN toks d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
                JOIN toks e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4
                WHERE a.tok <> '' AND b.tok <> '' AND c.tok <> ''
                  AND d.tok <> '' AND e.tok <> ''
            ),
            e0 AS (
                SELECT DISTINCT a.doc_id AS ua, b.doc_id AS ub
                FROM grams a JOIN grams b USING (gram)
                WHERE a.doc_id < b.doc_id
            )
            SELECT e.ua AS id_a, e.ub AS id_b,
                   CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
            FROM e0 e
            JOIN documents da ON da.doc_id = e.ua
            JOIN documents db ON db.doc_id = e.ub
        """,
        "events_day_ranges": """
            WITH cal AS (
                SELECT d AS day_start, d + INTERVAL 1 DAY AS day_end,
                       CAST(year(d) * 10000 + month(d) * 100 + day(d) AS BIGINT) AS ymd
                FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                                    TIMESTAMP '2024-12-31',
                                                    INTERVAL 1 DAY)) AS d)
            )
            SELECT e.event_id, c.ymd
            FROM events e JOIN cal c ON e.ts >= c.day_start AND e.ts < c.day_end
        """,
        "lineitem_unpivot": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   CAST(ROUND(l_quantity * 100) AS BIGINT) AS cents FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(ROUND(l_tax * 100) AS BIGINT) FROM lineitem
        """,
        "cube_order_stats": """
            SELECT o_orderstatus, o_orderpriority,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "region_nation_pairs": """
            SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
        """,
        "first_last_event_value": """
            SELECT event_id, user_id,
                   FIRST_VALUE(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS first_cents,
                   LAST_VALUE(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS last_cents
            FROM events
        """,
        "event_percent_rank": """
            SELECT event_id, event_type,
                   percent_rank() OVER (
                        PARTITION BY event_type
                        ORDER BY CAST(ROUND(value * 100) AS BIGINT)
                   ) AS pr,
                   cume_dist() OVER (
                        PARTITION BY event_type
                        ORDER BY CAST(ROUND(value * 100) AS BIGINT)
                   ) AS cd
            FROM events
        """,
        "monthly_revenue": """
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY ym
        """,
        "token_postings": """
            SELECT token,
                   string_agg(doc_id, ',' ORDER BY doc_id) AS postings,
                   CAST(COUNT(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT doc_id, token
                  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
                        FROM documents))
            GROUP BY token HAVING COUNT(*) >= 2
        """,
        "stratified_event_sample": f"""
            SELECT event_id, event_type
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY event_type
                ORDER BY (event_id * {_STRAT_A}) % {_STRAT_M}, event_id
            ) <= {_STRAT_K}
        """,
        "decontaminate_docs": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '\\S+')) AS tok,
                       generate_subscripts(regexp_extract_all(text, '\\S+'), 1) AS pos
                FROM documents
            ), tri AS (
                SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS tg
                FROM toks a
                JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
            ), bench AS (
                SELECT DISTINCT tg FROM tri WHERE doc_id % 10 = 7
            )
            SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM tri t JOIN bench USING (tg)
            WHERE t.doc_id % 10 <> 7
            GROUP BY t.doc_id
        """,
        "corr_qty_discount": """
            WITH m AS (
                SELECT l_returnflag,
                       COUNT(*) AS n_rows,
                       SUM(qty) AS sx, SUM(dp) AS sy,
                       SUM(qty * qty) AS sxx, SUM(dp * dp) AS syy,
                       SUM(qty * dp) AS sxy
                FROM (SELECT l_returnflag,
                             CAST(l_quantity AS BIGINT) AS qty,
                             CAST(ROUND(l_discount * 100) AS BIGINT) AS dp
                      FROM lineitem)
                GROUP BY l_returnflag
            )
            SELECT l_returnflag, n_rows,
                   (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (SQRT(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * SQRT(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_qd,
                   (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0)) AS covar_qd
            FROM m
        """,
        "mode_priority_by_status": """
            SELECT o_orderstatus, o_orderpriority, CAST(n AS BIGINT) AS n
            FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
                  FROM orders GROUP BY o_orderstatus, o_orderpriority)
            QUALIFY row_number() OVER (
                PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority ASC
            ) = 1
        """,
        "event_value_quartiles": """
            SELECT event_id, event_type,
                   CAST(NTILE(4) OVER (
                        PARTITION BY event_type
                        ORDER BY CAST(ROUND(value * 100) AS BIGINT), event_id
                   ) AS BIGINT) AS quartile
            FROM events
        """,
        "top3_events_per_user": """
            SELECT event_id, user_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_cents
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id
                ORDER BY CAST(ROUND(value * 100) AS BIGINT) DESC, event_id ASC
            ) <= 3
        """,
        "customer_order_full": f"""
            SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
                   COALESCE(c.c_name, '') AS c_name,
                   CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
                   CAST(COALESCE(o.total_cents, 0) AS BIGINT) AS total_cents
            FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > {_FULL_BAL}) c
            FULL OUTER JOIN (
                SELECT o_custkey,
                       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS total_cents,
                       COUNT(*) AS n_orders
                FROM orders GROUP BY o_custkey
            ) o ON c.c_custkey = o.o_custkey
        """,
        "shipping_priority": f"""
            SELECT l.l_orderkey,
                   SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS revenue_u,
                   o.o_orderdate
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
              AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
              AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY revenue_u DESC, l.l_orderkey ASC LIMIT 10
        """,
        "median_value_by_type": """
            SELECT event_type,
                   CAST(median(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS median_cents
            FROM events GROUP BY event_type
        """,
        "sessionize_events": f"""
            SELECT event_id, user_id,
                   CAST(SUM(CASE WHEN gap_us > CAST({_SESSION_GAP_S} AS BIGINT) * 1000000 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM (
                SELECT event_id, user_id, ts,
                       COALESCE(date_diff('microsecond',
                                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                ts), 0) AS gap_us
                FROM events
            )
        """,
        "session_stats": f"""
            WITH s AS (
                SELECT user_id,
                       CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
                       CAST(SUM(CASE WHEN gap_us > CAST({_SESSION_GAP_S} AS BIGINT) * 1000000 THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM (
                    SELECT event_id, user_id, ts, value,
                           COALESCE(date_diff('microsecond',
                                    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                    ts), 0) AS gap_us
                    FROM events
                )
            )
            SELECT user_id, session_id,
                   CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "tumbling_events": f"""
            SELECT (epoch_us(ts) // (CAST({_WINDOW_S} AS BIGINT) * 1000000)) * {_WINDOW_S} AS window_epoch_s,
                   event_type,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   MIN(value) AS min_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_by_type": """
            SELECT event_type,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "token_count": """
            SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_counts": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]-]')) AS BIGINT) AS n_punct,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
                   CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper
            FROM documents
        """,
        "exact_dedup": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "ann_brute_force": f"""
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < {_ANN_NQ}
            ),
            s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS cosine
                FROM q CROSS JOIN embeddings e
            ),
            r AS (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rank
                FROM s
            )
            SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {_ANN_K}
        """,
        "event_type_entropy": """
            WITH c AS (
                SELECT user_id, event_type, COUNT(*) AS c
                FROM events GROUP BY user_id, event_type
            ),
            t AS (
                SELECT user_id, SUM(c) AS tot,
                       SUM(c * ln(CAST(c AS DOUBLE))) AS slc
                FROM c GROUP BY user_id
            )
            SELECT user_id,
                   CAST(ROUND((ln(CAST(tot AS DOUBLE)) - slc / tot) * 1e6) AS BIGINT) AS entropy_e6
            FROM t
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
                FROM documents
            ),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.token,
                       CAST(ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 1e6) AS BIGINT) AS tfidf_e6
                FROM tf JOIN df USING (token) CROSS JOIN n
            )
            SELECT doc_id, token, tfidf_e6 FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY tfidf_e6 DESC, token ASC
                ) AS rn
                FROM scored
            ) WHERE rn <= 3
        """,
        "copurchase_triangles": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM op a JOIN op b USING (l_orderkey)
                WHERE a.l_partkey < b.l_partkey
                GROUP BY 1, 2
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        "part_bfs_hops": """
            WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT a.l_partkey AS u, b.l_partkey AS v
                FROM op a JOIN op b USING (l_orderkey)
                WHERE a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
            seeds AS (SELECT DISTINCT u AS node FROM e WHERE u % 500 = 0)
            SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
                WITH RECURSIVE d AS (
                    SELECT node, 0 AS dist FROM seeds
                    UNION
                    SELECT s.v, d.dist + 1 FROM d JOIN sym s ON s.u = d.node
                    WHERE d.dist < 12
                ) SELECT node, dist FROM d
            ) GROUP BY node
        """,
        "funnel_click_purchase": """
            WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
            p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
            m AS (
                SELECT c.user_id, c.ts, MIN(p.ts) AS fp
                FROM c JOIN p ON p.user_id = c.user_id
                             AND p.ts > c.ts
                             AND p.ts <= c.ts + INTERVAL 1 HOUR
                GROUP BY c.user_id, c.ts
            )
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS conversions,
                   CAST(MIN(epoch_us(fp) - epoch_us(ts)) AS BIGINT) AS min_latency_us
            FROM m GROUP BY user_id
        """,
        "event_value_outliers": """
            WITH v AS (
                SELECT event_id, event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS value_cents
                FROM events
            ),
            s AS (
                SELECT event_type, median(value_cents) AS med, mad(value_cents) AS mad
                FROM v GROUP BY event_type
            )
            SELECT v.event_id, v.event_type, v.value_cents
            FROM v JOIN s USING (event_type)
            WHERE ABS(v.value_cents - s.med) > 3 * s.mad
        """,
        "user_type_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_cents,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS error_cents,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup_cents,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        """,
        "part_kcore": _kcore_oracle(),
        "supplier_communities": _lpa_oracle(),
        "user_hourly_fill": """
            WITH w AS (
                SELECT user_id, epoch_us(ts) // 3600000000 AS hour_win,
                       COUNT(*) AS n,
                       SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
                FROM events GROUP BY 1, 2
            ),
            b AS (SELECT user_id, MIN(hour_win) AS wmin, MAX(hour_win) AS wmax FROM w GROUP BY user_id),
            g AS (SELECT user_id, unnest(generate_series(wmin, wmax)) AS hour_win FROM b)
            SELECT g.user_id, CAST(g.hour_win AS BIGINT) AS hour_win,
                   CAST(COALESCE(w.c, 0) AS BIGINT) AS cents,
                   CAST(COALESCE(w.n, 0) AS BIGINT) AS n_events
            FROM g LEFT JOIN w USING (user_id, hour_win)
        """,
        "sliding_distinct_users": """
            WITH du AS (
                SELECT DISTINCT epoch_us(ts) // 86400000000 AS day_no, user_id FROM events
            )
            SELECT d.day_no, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users
            FROM (SELECT DISTINCT day_no FROM du) d
            JOIN du u ON u.day_no BETWEEN d.day_no - 6 AND d.day_no
            GROUP BY d.day_no
        """,
        "type_audience_overlap": """
            WITH du AS (SELECT DISTINCT user_id, event_type FROM events),
            pairs AS (
                SELECT a.event_type AS type_a, b.event_type AS type_b,
                       COUNT(*) AS inter_users
                FROM du a JOIN du b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
                GROUP BY 1, 2
            ),
            tot AS (SELECT event_type, COUNT(*) AS n FROM du GROUP BY event_type)
            SELECT type_a, type_b, CAST(inter_users AS BIGINT) AS inter_users,
                   CAST(ta.n + tb.n - inter_users AS BIGINT) AS union_users
            FROM pairs
            JOIN tot ta ON ta.event_type = type_a
            JOIN tot tb ON tb.event_type = type_b
        """,
        "q4_order_priority": f"""
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}'
              AND o_orderdate <  TIMESTAMP '{_Q4_HI}'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate)
            GROUP BY o_orderpriority
        """,
        "q21_waiting_suppliers": f"""
            WITH lf AS (
                SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ),
            ps AS (
                SELECT l_orderkey AS okey, l_suppkey AS skey,
                       MAX(CASE WHEN epoch_us(l_shipdate)
                                   > epoch_us(o_orderdate) + {_Q21_LATE_US}
                                THEN 1 ELSE 0 END) AS late
                FROM lf GROUP BY 1, 2
            ),
            po AS (
                SELECT okey, COUNT(*) AS n_supp, SUM(late) AS n_late,
                       SUM(skey * late) AS supp_late
                FROM ps GROUP BY okey
            )
            SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM po JOIN supplier ON s_suppkey = supp_late
            WHERE n_supp >= 2 AND n_late = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name ASC LIMIT 20
        """,
        "q22_idle_customers": f"""
            WITH s AS (
                SELECT COUNT(*) AS n, SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sc
                FROM customer WHERE c_acctbal > 0
            )
            SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
                   CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                       AS totacctbal_cents
            FROM customer, nation, s
            WHERE c_nationkey = n_nationkey
              AND CAST(ROUND(c_acctbal * 100) AS BIGINT) * s.n > s.sc
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}')
            GROUP BY n_name
        """,
        "user_type_bitmask": """
            WITH t AS (
                SELECT event_type,
                       row_number() OVER (ORDER BY event_type) - 1 AS idx
                FROM (SELECT DISTINCT event_type FROM events)
            ),
            dm AS (
                SELECT DISTINCT user_id, (CAST(1 AS BIGINT) << idx) AS mask
                FROM events JOIN t USING (event_type)
            )
            SELECT user_id, CAST(SUM(mask) AS BIGINT) AS type_mask
            FROM dm GROUP BY user_id
        """,
        "geomean_value_by_type": """
            SELECT event_type,
                   CAST(ROUND(EXP(SUM(LN(value)) / COUNT(*)) * 1e6) AS BIGINT) AS geomean_e6
            FROM events GROUP BY event_type
        """,
        "user_path_string": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM events GROUP BY user_id
        """,
        "doc_ttr": """
            WITH toks AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
                FROM documents
            )
            SELECT doc_id,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(COUNT(DISTINCT tok) * 1000000 // COUNT(*) AS BIGINT) AS ttr_e6
            FROM toks GROUP BY doc_id
        """,
        "wavg_discount_by_brand": """
            WITH pre AS (
                SELECT l_partkey,
                       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                           * CAST(ROUND(l_discount * 100) AS BIGINT)) AS num,
                       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS den
                FROM lineitem GROUP BY l_partkey
            )
            SELECT p_brand, CAST(SUM(num) * 10000 // SUM(den) AS BIGINT) AS wavg_disc_e6
            FROM pre JOIN part ON p_partkey = l_partkey
            GROUP BY p_brand
        """,
        "parts_never_discounted": f"""
            SELECT p_partkey, p_name
            FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey
                                AND l_discount > {_NEVER_DISC})
        """,
        "order_share_of_customer": """
            SELECT o_orderkey, o_custkey,
                   CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 1000000
                        // SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                           OVER (PARTITION BY o_custkey) AS BIGINT) AS share_e6
            FROM orders
        """,
        "minhash_pairs": _minhash_pairs_sql,
        "near_dup_dedup": _near_dup_sql,
        "near_dup_dedup_longest": _near_dup_longest_sql,
        "event_value_collision_pairs": """
            WITH e AS (
                SELECT event_id, user_id, CAST(ROUND(value * 100) AS BIGINT) AS c
                FROM events WHERE value > 150.0
            )
            SELECT a.event_id AS id_a, b.event_id AS id_b,
                   abs(a.c - b.c) AS diff_cents
            FROM e a JOIN e b
              ON a.user_id < b.user_id AND abs(a.c - b.c) <= 2
        """,
        "bigram_pmi": """
            WITH toks AS (
                SELECT doc_id, unnest(l) AS tok, unnest(range(1, len(l) + 1)) AS pos
                FROM (
                    SELECT doc_id,
                           list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x <> '') AS l
                    FROM documents
                )
            ),
            uni AS MATERIALIZED (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
            pairs AS (
                SELECT tok AS a, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
                FROM toks
            ),
            bigc AS MATERIALIZED (
                SELECT a, b, COUNT(*) AS n FROM pairs WHERE b IS NOT NULL GROUP BY a, b
            )
            SELECT bigc.a || ' ' || bigc.b AS bigram,
                   CAST(bigc.n AS BIGINT) AS n,
                   ROUND(ln((bigc.n * (SELECT SUM(n) FROM uni) * (SELECT SUM(n) FROM uni))::DOUBLE
                            / ((SELECT SUM(n) FROM bigc) * ua.n * ub.n)::DOUBLE), 6) AS pmi
            FROM bigc
            JOIN uni ua ON ua.tok = bigc.a
            JOIN uni ub ON ub.tok = bigc.b
            WHERE bigc.n >= 5
        """,
        # joint banding restricted to old x new — what the persisted-index
        # query must reproduce exactly (cand keeps id_a < id_b, and the new
        # shard is doc_id < 100, so id_a is the new side)
        "cross_corpus_near_dups": "WITH " + _minhash_chain + """
            SELECT id_b AS id_old, id_a AS id_new, est_jaccard
            FROM est
            WHERE est_jaccard >= 0.5 AND id_a < 100 AND id_b >= 100
    """,
        "lang_id": _lang_id_sql,
        # Full value-replay of the md5-token simhash (Charikar 2002): token
        # hash = first 8 big-endian md5 bytes, ±1 vote per bit per token
        # OCCURRENCE, bit set iff the vote sum is strictly positive.
        "simhash": _simhash_fp_sql + """
            SELECT d.doc_id,
                   COALESCE(lower(lpad(hex(fp.f), 16, '0')),
                            '0000000000000000') AS simhash
            FROM documents d LEFT JOIN fp USING (doc_id)
        """,
        # Exhaustive popcount(xor) brute force over the replayed
        # fingerprints — also proves the Ray side's pigeonhole banding
        # (hamming_near_dups) lost no pair.
        "simhash_near_dups": _simhash_fp_sql + """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 3
        """,
        # Winnowing replay (Schleimer et al. 2003 shape): md5 token hashes,
        # trailing-window minima at complete window starts (all hashes when
        # the doc is shorter than one window), DISTINCT selected set folded
        # with bit_xor.
        "fingerprint": """
            WITH th AS (
                SELECT doc_id, pos,
                       ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h,
                       COUNT(*) OVER (PARTITION BY doc_id) AS n
                FROM (
                    SELECT doc_id, unnest(l) AS tok,
                           unnest(range(1, len(l) + 1)) AS pos
                    FROM (
                        SELECT doc_id,
                               list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                                           x -> x <> '') AS l
                        FROM documents
                    )
                )
            ),
            spans AS (
                SELECT doc_id, n, h,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mh,
                       COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wn
                FROM th
            ),
            sel AS (
                SELECT DISTINCT doc_id,
                       CASE WHEN n < 8 THEN h ELSE mh END AS v
                FROM spans WHERE n < 8 OR wn = 8
            )
            SELECT doc_id, lower(lpad(hex(bit_xor(v)), 16, '0')) AS fingerprint
            FROM sel GROUP BY doc_id
        """,
        "phrase_match_docs": """
            WITH t AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                   x -> x <> '') AS ts
                FROM documents
            ),
            pos AS MATERIALIZED (
                SELECT doc_id, ts, generate_subscripts(ts, 1) AS p,
                       unnest(ts) AS tok
                FROM t
            )
            SELECT doc_id, count(*)::BIGINT AS n_phrase
            FROM pos
            WHERE p < len(ts) AND tok = 'hash' AND ts[p+1] = 'join'
            GROUP BY doc_id
        """,
        "scd2_user_type_history": """
            WITH e AS MATERIALIZED (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(event_type) OVER w
                            IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            g AS MATERIALIZED (
                SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS grp
                FROM e
            ),
            runs AS MATERIALIZED (
                SELECT user_id, grp, min(ts) AS valid_from,
                       min(event_type) AS event_type, count(*)::BIGINT AS n_events
                FROM g GROUP BY 1, 2
            )
            SELECT user_id, event_type, valid_from,
                   coalesce(lead(valid_from) OVER (PARTITION BY user_id
                                                   ORDER BY valid_from),
                            TIMESTAMP '2100-01-01') AS valid_to,
                   n_events
            FROM runs
        """,
        "nb_lang_predict": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, lang,
                       unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                          x -> x <> '')) AS tok
                FROM documents
            ),
            counts AS MATERIALIZED (
                SELECT lang, tok, count(*)::DOUBLE AS c FROM toks GROUP BY 1, 2
            ),
            totals AS MATERIALIZED (SELECT lang, sum(c) AS tot FROM counts GROUP BY 1),
            vocab AS MATERIALIZED (SELECT count(DISTINCT tok)::DOUBLE AS v FROM toks),
            priors AS MATERIALIZED (
                SELECT lang,
                       ln(count(*)::DOUBLE / (SELECT count(*) FROM documents)) AS lp
                FROM documents GROUP BY 1
            ),
            scored AS MATERIALIZED (
                SELECT dt.doc_id, l.lang AS cand,
                       sum(ln((coalesce(c.c, 0) + 1.0)
                              / (t.tot + (SELECT v FROM vocab)))) AS s
                FROM toks dt
                CROSS JOIN (SELECT lang FROM priors) l
                LEFT JOIN counts c ON c.lang = l.lang AND c.tok = dt.tok
                JOIN totals t ON t.lang = l.lang
                GROUP BY 1, 2
            ),
            final AS MATERIALIZED (
                SELECT d.doc_id, d.lang, p.lang AS cand,
                       coalesce(s.s, 0) + p.lp AS score
                FROM documents d
                CROSS JOIN priors p
                LEFT JOIN scored s ON s.doc_id = d.doc_id AND s.cand = p.lang
            )
            SELECT doc_id, lang, cand AS pred_lang
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                               ORDER BY score DESC, cand ASC) AS rn
                  FROM final)
            WHERE rn = 1
        """,
        "incremental_agg_refresh": """
            SELECT user_id, count(*)::BIGINT AS n_events, sum(value) AS sum_value
            FROM events GROUP BY user_id
        """,
        # float compositions mirror the engine exactly: seen unigram c/T,
        # OOV floor 0.4/T, backoff 0.4 * (that unigram value) — alpha times
        # the already-divided prob, never (alpha*c)/T, so both sides round
        # identical float64 bits into micro-nats.
        "doc_backoff_lm_score": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts FROM documents
            ),
            pos AS MATERIALIZED (
                SELECT doc_id, ts, generate_subscripts(ts, 1) AS p,
                       unnest(ts) AS tok
                FROM toks
            ),
            t1 AS MATERIALIZED (
                SELECT tok, count(*)::DOUBLE AS c FROM pos
                WHERE doc_id % 2 = 0 GROUP BY 1
            ),
            tt AS MATERIALIZED (SELECT sum(c) AS T FROM t1),
            t2 AS MATERIALIZED (
                SELECT ts[p-1] || ' ' || tok AS big, count(*)::DOUBLE AS c
                FROM pos WHERE doc_id % 2 = 0 AND p > 1 GROUP BY 1
            ),
            contrib AS MATERIALIZED (
                SELECT pos.doc_id,
                       CASE
                           WHEN p = 1 THEN
                               CAST(ROUND(ln(coalesce(u.c, 0.4) / tt.T) * 1e6) AS BIGINT)
                           WHEN b.c IS NOT NULL THEN
                               CAST(ROUND(ln(b.c / up.c) * 1e6) AS BIGINT)
                           ELSE
                               CAST(ROUND(ln(0.4 * (coalesce(u.c, 0.4) / tt.T)) * 1e6) AS BIGINT)
                       END AS q
                FROM pos
                CROSS JOIN tt
                LEFT JOIN t1 u ON u.tok = pos.tok
                LEFT JOIN t1 up ON p > 1 AND up.tok = pos.ts[p-1]
                LEFT JOIN t2 b ON p > 1 AND b.big = pos.ts[p-1] || ' ' || pos.tok
            )
            SELECT d.doc_id, count(c.q)::BIGINT AS n_tokens,
                   coalesce(sum(c.q), 0)::BIGINT AS lm_micro
            FROM documents d
            LEFT JOIN contrib c ON c.doc_id = d.doc_id
            GROUP BY d.doc_id
        """,
        "events_snapshot_diff": """
            WITH base AS MATERIALIZED (
                SELECT event_id, event_type, value FROM events WHERE event_id % 4 != 1
            ),
            curr AS MATERIALIZED (
                SELECT event_id, event_type,
                       CASE WHEN event_id % 8 = 0 THEN value + 1.0 ELSE value END AS value
                FROM events WHERE event_id % 4 != 2
            )
            SELECT coalesce(b.event_id, n.event_id) AS event_id,
                   CASE WHEN b.event_id IS NULL THEN 'added'
                        WHEN n.event_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM base b FULL OUTER JOIN curr n ON b.event_id = n.event_id
            WHERE b.event_id IS NULL OR n.event_id IS NULL
               OR b.value IS DISTINCT FROM n.value
               OR b.event_type IS DISTINCT FROM n.event_type
        """,
        "approx_value_quantiles": """
            WITH ext AS MATERIALIZED (SELECT min(value) AS lo, max(value) AS hi FROM events),
            params AS MATERIALIZED (SELECT lo, hi, (hi - lo) / 4096 AS w FROM ext),
            bins AS MATERIALIZED (
                SELECT least(CAST(floor((value - p.lo) / p.w) AS BIGINT), 4095) AS bin,
                       count(*)::DOUBLE AS n
                FROM events, params p GROUP BY 1
            ),
            cum AS MATERIALIZED (
                SELECT bin, n,
                       sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS c
                FROM bins
            ),
            tot AS MATERIALIZED (SELECT max(c) AS total FROM cum),
            qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
            pick AS MATERIALIZED (
                SELECT q, bin, n, c - n AS prev,
                       row_number() OVER (PARTITION BY q ORDER BY bin) AS rn
                FROM qs, cum, tot
                WHERE c >= q * total
            )
            SELECT pk.q,
                   p.lo + (pk.bin + least((pk.q * t.total - pk.prev) / pk.n, 1.0)) * p.w AS est
            FROM pick pk, params p, tot t
            WHERE pk.rn = 1
        """,
        "events_quality_audit": """
            SELECT 'value_le_100' AS check_name,
                   count(*) FILTER (WHERE value > 100)::BIGINT AS n_violations
            FROM events
            UNION ALL
            SELECT 'event_type_core',
                   count(*) FILTER (
                       WHERE event_type NOT IN ('click', 'view', 'purchase')
                   )::BIGINT
            FROM events
            UNION ALL
            SELECT 'props_not_null',
                   count(*) FILTER (WHERE props IS NULL)::BIGINT
            FROM events
            UNION ALL
            SELECT 'event_id_unique',
                   (count(*) - count(DISTINCT event_id))::BIGINT
            FROM events
            UNION ALL
            SELECT 'user_id_unique',
                   (count(*) - count(DISTINCT user_id))::BIGINT
            FROM events
        """,
        # the per-key replay of the grouped histogram sketch: shared global
        # bin edges, per-(key, bin) exact counts, per-key cumsum over the
        # NONZERO bins (searchsorted over g rows in the fold), first bin
        # with cum >= q*total, value = lo + (bin + least(frac, 1)) * w
        "user_value_p90_approx": """
            WITH ext AS MATERIALIZED (SELECT min(value) AS lo, max(value) AS hi FROM events),
            params AS MATERIALIZED (SELECT lo, hi, (hi - lo) / 1024 AS w FROM ext),
            bins AS MATERIALIZED (
                SELECT user_id,
                       least(CAST(floor((value - p.lo) / p.w) AS BIGINT), 1023) AS bin,
                       count(*)::DOUBLE AS n
                FROM events, params p GROUP BY 1, 2
            ),
            cum AS MATERIALIZED (
                SELECT user_id, bin, n,
                       sum(n) OVER (PARTITION BY user_id ORDER BY bin
                                    ROWS UNBOUNDED PRECEDING) AS c
                FROM bins
            ),
            tot AS MATERIALIZED (SELECT user_id, max(c) AS total FROM cum GROUP BY 1),
            qs AS (SELECT unnest([0.5, 0.9]) AS q),
            pick AS MATERIALIZED (
                SELECT cum.user_id, q, bin, n, c - n AS prev,
                       row_number() OVER (PARTITION BY cum.user_id, q
                                          ORDER BY bin) AS rn
                FROM qs, cum JOIN tot ON tot.user_id = cum.user_id
                WHERE c >= q * total
            )
            SELECT pk.user_id, pk.q,
                   p.lo + (pk.bin + least((pk.q * t.total - pk.prev) / pk.n, 1.0)) * p.w
                       AS value
            FROM pick pk
            JOIN tot t ON t.user_id = pk.user_id, params p
            WHERE pk.rn = 1
        """,
        # HyperLogLog full replay (hash_fn='md5'): registers from md5
        # prefixes, exact bit-length ranks via length(bin(tail)), the same
        # estimator arithmetic (alpha*m^2 / sum(2^-rank) with the linear-
        # counting small-range correction). Hashing all rows == hashing
        # DISTINCT values (same hash per value under register max).
        "approx_distinct_users": """
            WITH h AS MATERIALIZED (
                SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS h
                FROM events WHERE user_id IS NOT NULL
            ),
            rr AS MATERIALIZED (
                SELECT (h >> 50)::BIGINT AS reg,
                       max(CASE WHEN (h & ((1::UBIGINT << 50) - 1)) = 0 THEN 51
                                ELSE 50 - length(bin(h & ((1::UBIGINT << 50) - 1))) + 1
                           END)::BIGINT AS rank
                FROM h GROUP BY 1
            ),
            agg AS (SELECT count(*) AS nz, sum(pow(2.0, -rank)) AS snz FROM rr)
            SELECT CASE WHEN raw_est <= 2.5 * 16384.0 AND zeros > 0
                        THEN CAST(ROUND(16384.0 * ln(16384.0 / zeros)) AS BIGINT)
                        ELSE CAST(ROUND(raw_est) AS BIGINT)
                   END AS approx_distinct_users
            FROM (SELECT 0.7213 / (1.0 + 1.079 / 16384.0) * 16384.0 * 16384.0
                             / (snz + (16384 - nz) * 1.0) AS raw_est,
                         16384 - nz AS zeros
                  FROM agg)
        """,
        "approx_users_by_type": """
            WITH h AS MATERIALIZED (
                SELECT DISTINCT event_type,
                       ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS h
                FROM events WHERE user_id IS NOT NULL
            ),
            rr AS MATERIALIZED (
                SELECT event_type, (h >> 52)::BIGINT AS reg,
                       max(CASE WHEN (h & ((1::UBIGINT << 52) - 1)) = 0 THEN 53
                                ELSE 52 - length(bin(h & ((1::UBIGINT << 52) - 1))) + 1
                           END)::BIGINT AS rank
                FROM h GROUP BY 1, 2
            ),
            agg AS (SELECT event_type, count(*) AS nz, sum(pow(2.0, -rank)) AS snz
                    FROM rr GROUP BY 1)
            SELECT event_type,
                   CASE WHEN raw_est <= 2.5 * 4096.0 AND zeros > 0
                        THEN CAST(ROUND(4096.0 * ln(4096.0 / zeros)) AS BIGINT)
                        ELSE CAST(ROUND(raw_est) AS BIGINT)
                   END AS approx_distinct
            FROM (SELECT event_type,
                         0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
                             / (snz + (4096 - nz) * 1.0) AS raw_est,
                         4096 - nz AS zeros
                  FROM agg)
        """,
        # Count-Min full replay (hash_fn='md5'): per-depth splitmix remix as
        # mod-2^64 arithmetic — the 64x64 product is split into 32-bit
        # halves because a full product overflows INT128:
        # (x*C) % 2^64 = (lo*C) % 2^64 + ((hi*(C % 2^32)) % 2^32)*2^32.
        "approx_user_counts": """
            -- salts are (d+1)*0x9E3779B97F4A7C15 mod 2^64, computed rather
            -- than written as literals so they cannot drift from the engine
            WITH depths AS (
                SELECT d,
                       (((d + 1)::HUGEINT * 11400714819323198485::HUGEINT)
                        % 18446744073709551616::HUGEINT)::UBIGINT AS salt
                FROM range(0, 4) t(d)),
            base AS MATERIALIZED (
                SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 16))::UBIGINT AS h
                FROM events
            ),
            mix AS MATERIALIZED (
                SELECT d, xor(hp, hp >> 31) AS hd
                FROM (SELECT d,
                             ((((xor(h, salt) % 4294967296)::HUGEINT
                                * 13787848793156543929::HUGEINT)
                               % 18446744073709551616::HUGEINT
                               + ((((xor(h, salt) >> 32) * 485285305) % 4294967296)::HUGEINT
                                  * 4294967296::HUGEINT))
                              % 18446744073709551616::HUGEINT)::UBIGINT AS hp
                      FROM base, depths)
            ),
            sk AS MATERIALIZED (
                SELECT d, (hd % 4096)::BIGINT AS cell, count(*)::BIGINT AS n
                FROM mix GROUP BY 1, 2
            ),
            probes AS (
                SELECT r AS user_id,
                       ('0x' || substr(md5(r::VARCHAR), 1, 16))::UBIGINT AS h
                FROM range(0, 20) t(r)
            ),
            pmix AS (
                SELECT user_id, d, xor(hp, hp >> 31) AS hd
                FROM (SELECT user_id, d,
                             ((((xor(h, salt) % 4294967296)::HUGEINT
                                * 13787848793156543929::HUGEINT)
                               % 18446744073709551616::HUGEINT
                               + ((((xor(h, salt) >> 32) * 485285305) % 4294967296)::HUGEINT
                                  * 4294967296::HUGEINT))
                              % 18446744073709551616::HUGEINT)::UBIGINT AS hp
                      FROM probes, depths)
            )
            SELECT user_id, min(coalesce(sk.n, 0))::BIGINT AS est_events
            FROM (SELECT user_id, d, (hd % 4096)::BIGINT AS cell FROM pmix) pc
            LEFT JOIN sk USING (d, cell)
            GROUP BY user_id
        """,
        "pdf_text_layer_extract": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
                FROM documents WHERE doc_id < 40
            ),
            pos AS MATERIALIZED (
                SELECT doc_id, generate_subscripts(ts, 1) AS p, unnest(ts) AS tok
                FROM toks
            )
            SELECT doc_id,
                   ((p - 1) // 8 // 3)::BIGINT AS page,
                   ((p - 1) // 8 % 3)::BIGINT AS span_idx,
                   string_agg(tok, ' ' ORDER BY p) AS text
            FROM pos
            WHERE p <= 48
            GROUP BY doc_id, (p - 1) // 8
        """,
        "pdf_text_type0_extract": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
                FROM documents WHERE doc_id < 40
            ),
            pos AS MATERIALIZED (
                SELECT doc_id, generate_subscripts(ts, 1) AS p, unnest(ts) AS tok
                FROM toks
            )
            SELECT doc_id,
                   ((p - 1) // 8 // 3)::BIGINT AS page,
                   ((p - 1) // 8 % 3)::BIGINT AS span_idx,
                   string_agg(tok, ' ' ORDER BY p) AS text
            FROM pos
            WHERE p <= 48
            GROUP BY doc_id, (p - 1) // 8
        """,
        "banned_phrase_scan": """
            WITH t AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                   x -> x <> '') AS ts
                FROM documents
            ),
            pos AS MATERIALIZED (
                SELECT doc_id, ts, generate_subscripts(ts, 1) AS p,
                       unnest(ts) AS tok
                FROM t
            ),
            grams AS MATERIALIZED (
                SELECT doc_id, tok AS g FROM pos
                UNION ALL
                SELECT doc_id, tok || ' ' || ts[p+1] FROM pos WHERE p < len(ts)
                UNION ALL
                SELECT doc_id, tok || ' ' || ts[p+1] || ' ' || ts[p+2]
                FROM pos WHERE p + 1 < len(ts)
            ),
            blocklist(phrase) AS (VALUES ('vector'), ('table scan'), ('sort merge join'))
            SELECT g.doc_id, b.phrase, count(*)::BIGINT AS n_hits
            FROM grams g JOIN blocklist b ON g.g = b.phrase
            GROUP BY 1, 2
        """,
        "incremental_stream_sim": """
            SELECT user_id, count(*)::BIGINT AS n_events, sum(value) AS sum_value
            FROM events GROUP BY user_id
        """,
        "user_value_quantiles_exact": """
            WITH qs(q) AS (VALUES (0.5), (0.9)),
            r AS MATERIALIZED (
                SELECT user_id, value,
                       row_number() OVER (PARTITION BY user_id ORDER BY value) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events
            )
            SELECT user_id, q, value
            FROM qs JOIN r
              ON r.rn = greatest(1, least(CAST(ceil(q * r.n) AS BIGINT), r.n))
        """,
        "bool_search_docs": """
            WITH toks AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                   x -> x <> '') AS ts
                FROM documents
            )
            SELECT doc_id FROM toks
            WHERE list_contains(ts, 'hash') AND list_contains(ts, 'join')
              AND NOT list_contains(ts, 'slow')
        """,
        "exact_value_quantiles": """
            WITH qs(q) AS (VALUES (0.5), (0.9), (0.99)),
            r AS MATERIALIZED (
                SELECT value, row_number() OVER (ORDER BY value) AS rn,
                       count(*) OVER () AS n
                FROM events
            )
            SELECT q, value AS exact_q
            FROM qs JOIN r
              ON r.rn = greatest(1, least(CAST(ceil(q * r.n) AS BIGINT), r.n))
        """,
        "decayed_user_activity": """
            WITH anchor AS MATERIALIZED (SELECT max(ts) AS t FROM events)
            SELECT user_id,
                   sum(CAST(ROUND(exp(-(ln(2.0) / 86400.0)
                                      * (date_diff('microsecond', ts, a.t)
                                         / 1000000.0)) * 1e9) AS BIGINT))
                       AS decay_e9
            FROM events, anchor a
            GROUP BY user_id
        """,
        "loo_target_encoding": """
            WITH c AS MATERIALIZED (
                SELECT event_id, event_type,
                       CAST(ROUND(value * 100) AS BIGINT) AS cents
                FROM events
            ),
            agg AS MATERIALIZED (
                SELECT event_type, sum(cents) AS s, count(*)::BIGINT AS n
                FROM c GROUP BY 1
            )
            SELECT c.event_id, c.event_type,
                   CAST(agg.s - c.cents AS DOUBLE)
                       / (100.0 * (agg.n - 1)) AS loo_enc
            FROM c JOIN agg USING (event_type)
            WHERE agg.n > 1
        """,
    }
