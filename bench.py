"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default: runs the flagship extraction pipeline (docs/sec headline, matching
BASELINE.json:metric) over a seeded synthetic interleaved corpus sized to the
scale factor, plus a representative set of relational / dedup / text / ANN
queries over $GRAFT_SF_DIR (default /root/testdata/sf0.1), and prints ONE
JSON line:

    {"metric": ..., "value": <flagship sec>, "unit": "sec",
     "queries": {...: sec}, "sf": ..., "num_cpus": N,
     "flagship": {"docs": N, "rows": N, "sec": s, "docs_per_sec": r}}

--scaling: runs the flagship twice in FRESH subprocesses (num_cpus=8 then 32)
on the same corpus and reports both throughputs + efficiency
(thr32 / (4 * thr8)) — the sandbox proxy for the N vs 4N cluster criterion.

Owns its Ray session (the driver does NOT pre-init for bench runs).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# flagship corpus size by sf (deterministic, cached under /tmp)
_N_DOCS = {"sf0.001": 120, "sf0.01": 300, "sf0.1": 900}
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
]


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _consume(res) -> int:
    """Materialize a query result enough to count rows (Datasets stream)."""
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


def corpus_for(sf_dir: str) -> tuple[dict[str, str], int]:
    from tesseract_recognize_ray.fixtures import corpus_cached

    n = _N_DOCS.get(_sf_name(sf_dir), 300)
    return corpus_cached(f"/tmp/trr_bench_corpus_{n}", n), n


def run_flagship(sf_dir: str, num_cpus: int) -> dict:
    """Timed flagship run (corpus generation excluded — cached beforehand)."""
    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths, n_docs = corpus_for(sf_dir)
    cfg = PipelineConfig(recognize_concurrency=(2, max(8, num_cpus)))
    t0 = time.time()
    ds = extract_spans(paths["docs"], paths["media"], cfg)
    rows = ds.count()
    sec = time.time() - t0
    return {"docs": n_docs, "rows": rows, "sec": round(sec, 3), "docs_per_sec": round(n_docs / sec, 3)}


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in _BENCH_QUERIES:
        t0 = time.time()
        _consume(qs[name](sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="two fresh runs at 8 and 32 cpus + efficiency")
    ap.add_argument("--flagship-only", action="store_true", help="internal: one timed flagship run, emit JSON")
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if args.scaling:
        corpus_for(SF_DIR)  # pre-generate so neither timed subprocess pays it
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only", "--num-cpus", str(cpus)],
                capture_output=True, text=True, env=env, check=True,
            )
            results[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
        thr8, thr32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
        eff = thr32 / (4 * thr8)
        print(json.dumps({
            "metric": "flagship scaling efficiency (num_cpus 8 -> 32, fresh processes, same input)",
            "value": round(eff, 4), "unit": "efficiency", "sf": _sf_name(SF_DIR),
            "throughput_docs_per_sec": {"cpus8": thr8, "cpus32": thr32},
            "detail": results,
        }))
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False, ignore_reinit_error=True)

    if args.flagship_only:
        flagship = run_flagship(SF_DIR, args.num_cpus)
        flagship["num_cpus"] = args.num_cpus
        print(json.dumps(flagship))
        ray.shutdown()
        return

    flagship = run_flagship(SF_DIR, args.num_cpus)
    queries = run_queries(SF_DIR)
    print(json.dumps({
        "metric": "documents/sec end-to-end (decode->segment->recognize->span-assemble), span-sequence-exact",
        "value": flagship["sec"], "unit": "sec",
        "queries": queries, "sf": _sf_name(SF_DIR), "num_cpus": args.num_cpus,
        "flagship": flagship,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
