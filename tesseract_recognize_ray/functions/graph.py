"""Distributed graph primitives over ray.data.Dataset.

connected_components implements hash-to-min connected components (Rastogi,
Machanavajjhala, Chitnis, Das Sarma — "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013): each round, every node u
broadcasts the minimum id m it has seen to all of its current neighbors and
collapses its own adjacency onto m. The iteration is join-free — one
bucketed groupby shuffle per round, vectorized pandas inside each bucket —
and converges in O(log) rounds on typical web-duplicate graphs (shallow,
star-like components), the shape this engine's near-dup candidate pairs
(minhash / embedding LSH buckets) produce at 10^12-document scale.

Scale notes:
  * pairs are hash-partitioned on stable_bucket(u) — the per-group Python
    overhead of groupby(node).map_groups is amortized over every node in a
    bucket (same idiom as stages/assemble.py G3).
  * each round moves only (u, v) int64 pairs through the shuffle; payloads
    (doc text, signatures) never enter the iteration.
  * convergence is detected from three O(1) driver-side scalars (pair count
    + column sums) on the materialized per-round result; labels decrease
    monotonically, so an unchanged signature is a fixpoint.
  * components are labeled by their minimum node id — deterministic, no
    coordination needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count as AggCount, Sum as AggSum

from tesseract_recognize_ray.hashing import stable_bucket


def _init_pairs(src: str, dst: str):
    """edges batch -> symmetric pairs + self loops (u, v) int64."""

    def fn(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64()).combine_chunks()
        b = batch.column(dst).cast(pa.int64()).combine_chunks()
        u = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in (a, b, a, b)])
        v = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in (b, a, a, b)])
        return pa.table({"u": u, "v": v})

    return fn


def _add_bucket(num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        bk = stable_bucket(batch.column("u"), num_buckets)
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    return fn


def _round_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One hash-to-min round over one bucket (ALL groups of the bucket at
    once, vectorized): for each node u with current neighborhood C(u) and
    m = min(C(u) ∪ {u}), emit (m, x) and (x, m) for every x ∈ C(u).
    Self loops (u, u) are part of C(u), so (m, u) / (u, m) are included."""
    df = df.drop_duplicates(["u", "v"])
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    # per-row group min; self loops guarantee min(C(u) ∪ {u}) == groupmin(v)
    lab = np.minimum(df.groupby("u", sort=False)["v"].transform("min").to_numpy(), u)
    out = pd.DataFrame(
        {
            "u": np.concatenate([lab, v]),
            "v": np.concatenate([v, lab]),
        }
    )
    # local dedup only — (lab, x) rows may collide with another bucket's
    # emissions; next round's entry drop_duplicates (same-bucket by key u)
    # completes the global dedup.
    return out.drop_duplicates()


def connected_components(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 64,
    max_rounds: int = 30,
) -> Dataset:
    """Connected components of an undirected graph given as an edge Dataset
    (each edge once, either orientation; int-castable node ids).

    Returns Dataset[node: int64, component: int64] covering every node that
    appears in `edges`, with component = min node id of its component.
    """
    pairs = edges.map_batches(_init_pairs(src, dst), batch_format="pyarrow")
    prev_sig = None
    for _ in range(max_rounds):
        pairs = (
            pairs.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda d: _round_bucket(d.drop(columns="__bucket")),
                batch_format="pandas",
            )
        ).materialize()
        stats = pairs.aggregate(AggCount(), AggSum("u"), AggSum("v"))
        sig = (stats["count()"], stats["sum(u)"], stats["sum(v)"])
        if sig[0] == 0 or sig == prev_sig:
            break
        prev_sig = sig
    # final labels: component = min over C(u) ∪ {u} (self loops retained)
    from tesseract_recognize_ray.functions.relational import grouped_agg

    labels = grouped_agg(pairs, ["u"], [("v", "min", "component")])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("u"), "component": batch.column("component")})

    return labels.map_batches(rename, batch_format="pyarrow")


def group_clique_pairs(
    ds: Dataset,
    key_cols: list[str],
    node_col: str,
    *,
    num_buckets: int = 64,
    max_group: int = 256,
) -> Dataset:
    """ALL distinct in-group pairs (src < dst) of nodes sharing a key tuple
    — the candidate-pair shape for pairwise verify stages (edit distance,
    exact Jaccard), where star edges would under-report pairs. Groups larger
    than max_group are dropped (a shingle shared by 10^6 docs would emit
    5·10^11 pairs); pairs seen under several keys are deduped by a
    (src, dst) groupby."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = pd.util.hash_pandas_object(
            batch.select(key_cols).to_pandas(), index=False
        ).to_numpy()
        bk = (key % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    def cliques(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(key_cols + [node_col])
        outs = []
        for _, g in df.groupby(key_cols, sort=False):
            nodes = np.sort(g[node_col].to_numpy())
            k = len(nodes)
            if k < 2 or k > max_group:
                continue
            iu = np.triu_indices(k, 1)
            outs.append(pd.DataFrame({"src": nodes[iu[0]], "dst": nodes[iu[1]]}))
        if not outs:
            return pd.DataFrame({"src": pd.Series([], dtype="int64"), "dst": pd.Series([], dtype="int64")})
        return pd.concat(outs).drop_duplicates()

    pairs = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda d: cliques(d.drop(columns="__bucket")), batch_format="pandas")
    )
    # global distinct — the same pair can arise under different keys
    from tesseract_recognize_ray.functions.relational import grouped_agg

    dd = grouped_agg(pairs, ["src", "dst"], [("src", "count", "__n")])
    return dd.map_batches(
        lambda b: b.select(["src", "dst"]), batch_format="pyarrow"
    )


def group_star_edges(
    ds: Dataset,
    key_cols: list[str],
    node_col: str,
    *,
    num_buckets: int = 64,
) -> Dataset:
    """Co-occurrence edges: nodes sharing any key tuple are connected.

    Emits STAR edges per key group — (min member, member) — instead of the
    full clique: identical connected components with O(k) instead of O(k²)
    edges per group, which is what keeps skewed buckets (a million docs
    sharing one shingle) from exploding the shuffle.

    Returns Dataset[src: int64, dst: int64], deduplicated per bucket.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = pd.util.hash_pandas_object(
            batch.select(key_cols).to_pandas(), index=False
        ).to_numpy()
        bk = (key % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    def stars(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(key_cols + [node_col])
        g = df.groupby(key_cols, sort=False)[node_col]
        mins = g.transform("min").to_numpy()
        nodes = df[node_col].to_numpy()
        keep = nodes != mins
        out = pd.DataFrame({"src": mins[keep], "dst": nodes[keep]})
        return out.drop_duplicates()

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda d: stars(d.drop(columns="__bucket")), batch_format="pandas")
    )
