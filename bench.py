"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default: runs the flagship extraction pipeline (docs/sec headline, matching
BASELINE.json:metric) over a seeded synthetic interleaved corpus sized to the
scale factor (generated in parallel via Ray, cached under /tmp), plus a
representative set of relational / dedup / text / ANN queries over
$GRAFT_SF_DIR (default /root/testdata/sf0.1), and prints ONE JSON line:

    {"metric": ..., "value": <flagship sec>, "unit": "sec",
     "queries": {...: sec}, "sf": ..., "num_cpus": N,
     "flagship": {"docs": N, "rows": N, "sec": s, "docs_per_sec": r}}

--scaling: runs the flagship in FRESH subprocesses at num_cpus=4 and 16
(N and 4N — both inside this host's measured parallel-efficiency envelope,
see BASELINE.md) on the same corpus, warmup + best-of-2 each, and reports
both throughputs plus efficiency = thr(4N) / (4 * thr(N)).

Tuning facts this encodes (measured, BASELINE.md):
  * actor pool sized to min(cpus-2, 16): the pool must leave CPUs for the
    assembly shuffle (pool==cpus deadlocks the pipeline), and this host's
    vector/memory envelope saturates near 15 parallel workers;
  * RAY_worker_niceness=0: default niced workers starve behind driver-side
    processes during cold-start storms;
  * corpus is pre-generated and cached — generation is excluded from timing.

Owns its Ray session (the driver does NOT pre-init for bench runs).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("RAY_worker_niceness", "0")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# flagship corpus size by sf (deterministic, cached under /tmp)
_N_DOCS = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 6000}
_BENCH_QUERIES = [
    "filter_project",
    "groupby_pricing",
    "topk_orders",
    "revenue_by_nation",
    "window_lag_events",
    "token_count",
    "exact_dedup",
    "minhash_pairs",
    "simhash",
    "ann_brute_force",
    "asof_click_value",
    "rolling_sum_events",
    "top_terms",
    "event_value_ranks",
    "hopping_events",
    "training_shards",
    "source_mix_interleave",
    "clean_corpus",
    "shipping_priority",
    "top_bigrams",
    "decontaminate_docs",
    "curated_corpus",
    "user_cooccurrence_clusters",
    "shingle_dup_clusters",
    "near_dup_dedup",
    "trailing_hour_events",
    "events_in_type_windows",
    "returned_revenue_by_customer",
    "pagerank_supplier_parts",
    "event_type_entropy",
    "tfidf_top_terms",
    "copurchase_triangles",
    "part_bfs_hops",
    "funnel_click_purchase",
    "event_value_outliers",
    "user_type_pivot",
    "part_kcore",
    "user_hourly_fill",
    "latest_event_per_user",
    "cohort_retention",
    "regr_price_by_qty",
    "paragraph_dedup",
    "top_terms_by_lang",
    "bm25_top_docs",
    "part_neighbor_jaccard",
    "skew_value_by_type",
    "user_activity_islands",
    "event_global_ordinals",
    "lineitem_checksum",
    "weighted_doc_sample",
    "kmeans_clusters",
    "semantic_dedup",
    "doc_lm_score",
    "event_transitions",
    "balanced_doc_sample",
    "dup_token_spans",
    "pack_sequences",
    "bloom_semi_join_lineitem",
    "doc_split_counts",
    "canonical_prefix_docs",
    "pareto_parts",
    "nation_customer_names",
    "supplier_part_mincost",
    "event_value_deciles",
    "event_value_mad",
    "event_type_share",
    "approx_users_by_type",
    "first_event_per_user_day",
    "rolling_min_events",
    "scaled_event_values",
    "ts_inversions_by_user",
    "snm_dup_pairs",
    "q7_volume_shipping",
    "q19_discount_revenue",
    "q8_market_share",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "monthly_revenue_growth",
    "user_cum_distinct_types",
    "distinctive_terms_by_lang",
    "ppjoin_dup_pairs",
    "embedding_covariance",
    "embedding_pca",
    "rrf_doc_fusion",
    "winsorized_event_values",
    "event_type_daily_drift",
    "source_precedence_dedup",
    "copartitioned_revenue_join",
    "skew_split_brand_revenue",
    "q6_forecast_revenue",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "bpe_merges",
    "simhash_near_dups",
    "ann_pq",
    "doc_quality_logreg",
    "ann_filtered",
    "late_event_flags",
    "running_revenue_total",
    "user_value_p90_approx",
    "event_last_order_asof",
    "ann_ivf_pq",
    "zorder_pruned_events",
    "label_intra_variance",
    "label_between_variance",
    "bpe_encoded_docs",
    "cross_corpus_near_dups",
    "event_value_collision_pairs",
    "nb_lang_predict",
    "doc_backoff_lm_score",
    "scd2_user_type_history",
    "incremental_agg_refresh",
    "mmr_diverse_topk",
    "phrase_match_docs",
    "events_snapshot_diff",
    "events_quality_audit",
    "loo_target_encoding",
    "pdf_text_layer_extract",
    "pdf_text_type0_extract",
    "pdf_vector_extract",
    "semantic_dedup_capped",
    "media_metadata_profile",
    # round-5 SQL-replayable exact twins
    "embedding_near_dup",
    "ann_ivf_flat",
    "ann_pq_adc",
    "dsir_topk_docs",
    "mmr_diverse_topk_exact",
]


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _pool(cpus: int) -> int:
    return max(2, min(cpus - 2, 16))


def _consume(res) -> int:
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return len(res)
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.num_rows
    except ImportError:
        pass
    return res.count()


def corpus_for(sf_dir: str, n_docs: int | None = None) -> tuple[dict[str, str], int]:
    """Sharded synthetic corpus sized to sf; generated in parallel once,
    cached. Requires an initialized Ray session."""
    from tesseract_recognize_ray.fixtures import corpus_sharded_cached

    n = n_docs or _N_DOCS.get(_sf_name(sf_dir), 1000)
    return corpus_sharded_cached(f"/tmp/trr_bench_shard_{n}", n, shard_docs=125), n


def _scaling_docs(sf_dir: str) -> int:
    """Scaling runs use a 4x corpus: per-run fixed latency (~5-6s actor
    spawn + shuffle barriers, identical at both levels) must stay small vs
    compute at the 4N level, or the sandbox proxy measures launch latency
    instead of throughput. Round 2's vectorization roughly doubled engine
    throughput, so the round-1 2x corpus left the 16-CPU level ~35% fixed
    latency (12k docs / ~906 docs/s = 13s wall, ~5s fixed) — 24k docs
    restores a compute-dominated measurement."""
    return 4 * _N_DOCS.get(_sf_name(sf_dir), 1000)


def _cfg(cpus: int):
    from tesseract_recognize_ray.config import PipelineConfig

    # assemble_coalesce stays at the None default: the auto rule
    # (pipelines.extract.auto_assemble_coalesce) derives 16 from the ~7 MB
    # bench span stream — the bench now exercises the same path a user's
    # default config takes (same-host A/B of 16 vs off: 8.0-9.6s vs
    # 13.8-14.1s at 6k docs / 32 CPUs)
    return PipelineConfig(recognize_concurrency=_pool(cpus), decode_batch_size=16)


def run_flagship(sf_dir: str, num_cpus: int, repeats: int = 1, n_docs: int | None = None) -> dict:
    """Timed flagship runs (corpus generation + warmup excluded)."""
    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths, n_docs = corpus_for(sf_dir, n_docs)
    cfg = _cfg(num_cpus)
    wp = corpus_cached("/tmp/trr_warmup_corpus", 120)
    extract_spans(wp["docs"], wp["media"], cfg).count()  # warm workers/actors
    times, rows = [], 0
    for _ in range(repeats):
        t0 = time.time()
        rows = extract_spans(paths["docs"], paths["media"], cfg).count()
        times.append(time.time() - t0)
    sec = min(times)
    return {
        "docs": n_docs,
        "rows": rows,
        "sec": round(sec, 3),
        "docs_per_sec": round(n_docs / sec, 3),
        "times": [round(t, 3) for t in times],
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in _BENCH_QUERIES:
        t0 = time.time()
        _consume(qs[name](sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def ivf_recall_for(sf_dir: str) -> float:
    """Recall of the IVF path vs exact brute force on the bench queries
    (n_centroids=32, nprobe=16, replicas=2 — the ann_ivf query's operating point:
    nprobe 12->16 lifted sf0.1 recall 0.90-0.94 -> 0.98 for ~1/3 more cell reads)."""
    import numpy as np
    import pandas as pd

    from tesseract_recognize_ray.functions import relational as F
    from tesseract_recognize_ray.functions import similarity as F_sim

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < 5].sort_values("vec_id")
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = F_sim.brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    approx = F_sim.ivf_topk(ds, "vec_id", "embedding", q, k=10, n_centroids=32, nprobe=16, replicas=2)
    return round(F_sim.ivf_recall(approx, exact, 10), 4)


def pq_recall_for(sf_dir: str) -> float:
    """Recall of the product-quantization + exact-rerank path (m=16,
    ksub=256, shortlist=10k — the ann_pq query's operating point) vs exact
    brute force on the same queries."""
    import numpy as np
    import pandas as pd

    from tesseract_recognize_ray.functions import relational as F
    from tesseract_recognize_ray.functions import similarity as F_sim

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qdf = emb[emb["vec_id"] < 5].sort_values("vec_id")
    q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    ds = F.load(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = F_sim.brute_force_topk(ds, "vec_id", "embedding", q, k=10)
    ds = ds.materialize()
    books = F_sim.train_pq_codebooks(ds, "embedding", m=16, ksub=256)
    codes = F_sim.pq_encode(ds, "vec_id", "embedding", books)
    approx = F_sim.pq_topk_rerank(ds, codes, "vec_id", "embedding", books, q, k=10, shortlist=100)
    return round(F_sim.ivf_recall(approx, exact, 10), 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="fresh runs at num_cpus=4 and 16 + efficiency")
    ap.add_argument("--rounds", type=int, default=2, help="scaling: interleaved (N, 4N) rounds; median efficiency")
    ap.add_argument("--flagship-only", action="store_true", help="internal: timed flagship runs, emit JSON")
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--n-docs", type=int, default=None)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    if args.scaling:
        # pre-generate the corpus so neither timed subprocess pays it
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False)
        n_docs = args.n_docs or _scaling_docs(SF_DIR)
        corpus_for(SF_DIR, n_docs)
        ray.shutdown()

        def one(cpus: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only",
                 "--num-cpus", str(cpus), "--repeats", "2", "--n-docs", str(n_docs)],
                capture_output=True, text=True, env=env, check=True,
            )
            return json.loads(proc.stdout.strip().splitlines()[-1])

        # interleave the two levels in time: host load drifts between
        # sessions (multi-tenant box), and levels measured minutes apart get
        # incomparable conditions — per-round ratios + median cancels that
        rounds = []
        for _ in range(max(1, args.rounds)):
            r4, r16 = one(4), one(16)
            rounds.append({
                "cpus4": r4["docs_per_sec"], "cpus16": r16["docs_per_sec"],
                "efficiency": round(r16["docs_per_sec"] / (4 * r4["docs_per_sec"]), 4),
                "detail": {"4": r4, "16": r16},
            })
        effs = sorted(r["efficiency"] for r in rounds)
        med = effs[len(effs) // 2] if len(effs) % 2 else round((effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 4)
        best4 = max(r["cpus4"] for r in rounds)
        best16 = max(r["cpus16"] for r in rounds)
        print(json.dumps({
            "metric": "flagship scaling efficiency (num_cpus N=4 -> 4N=16, fresh processes, same input; "
                      "median of interleaved rounds)",
            "value": med, "unit": "efficiency", "sf": _sf_name(SF_DIR),
            "throughput_docs_per_sec": {"cpus4": best4, "cpus16": best16},
            "rounds": rounds,
        }))
        return

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False, ignore_reinit_error=True)

    if args.flagship_only:
        flagship = run_flagship(SF_DIR, args.num_cpus, repeats=args.repeats, n_docs=args.n_docs)
        flagship["num_cpus"] = args.num_cpus
        print(json.dumps(flagship))
        ray.shutdown()
        return

    flagship = run_flagship(SF_DIR, args.num_cpus, repeats=2)  # best-of-2: host has tenancy noise
    queries = run_queries(SF_DIR)
    recall = ivf_recall_for(SF_DIR)
    pq_recall = pq_recall_for(SF_DIR)
    print(json.dumps({
        "metric": "documents/sec end-to-end (decode->segment->recognize->span-assemble), span-sequence-exact",
        "value": flagship["sec"], "unit": "sec",
        "queries": queries, "sf": _sf_name(SF_DIR), "num_cpus": args.num_cpus,
        "ann_ivf_recall": recall,
        "ann_pq_recall": pq_recall,
        "flagship": flagship,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
