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
import pyarrow.compute as pc
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


def _min_label_prop(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label propagation with pointer jumping over one
    in-memory edge list: returns (sorted unique node ids, component label =
    min node id of each node's component). O((E+V) log D) numpy work."""
    ids = np.unique(np.concatenate([u, v]))
    iu = np.searchsorted(ids, u)
    iv = np.searchsorted(ids, v)
    lab = np.arange(len(ids))
    while True:
        l2 = lab.copy()
        np.minimum.at(l2, iu, lab[iv])
        np.minimum.at(l2, iv, lab[iu])
        l2 = np.minimum(l2, l2[l2])  # pointer jump: label of my label
        if np.array_equal(l2, lab):
            break
        lab = l2
    return ids, ids[lab]


def _cc_broadcast(edges: Dataset, src: str, dst: str) -> Dataset:
    """Broadcast-gate fast path for connected_components: each block runs
    local min-label propagation and emits ONE (node, local-component) star
    row per distinct node — a per-block spanning contraction, never raw
    edges — and the driver folds the contracted stars with the same numpy
    kernel. ONE Ray job total; pulled rows are bounded by blocks x
    nodes-per-block, not by |E|."""

    def forest(b: pa.Table) -> pa.Table:
        u = b.column(src).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b.column(dst).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids, comp = _min_label_prop(u, v)
        return pa.table({"node": pa.array(ids), "comp": pa.array(comp)})

    parts = [
        b
        for b in edges.map_batches(forest, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pandas"
        )
        if len(b)
    ]
    if not parts:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    allp = pd.concat(parts)
    ids, comp = _min_label_prop(allp["node"].to_numpy(), allp["comp"].to_numpy())
    return rd.from_arrow(pa.table({"node": pa.array(ids), "component": pa.array(comp)}))


def connected_components(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 64,
    max_rounds: int = 30,
    broadcast_max_edges: int = 4_000_000,
) -> Dataset:
    """Connected components of an undirected graph given as an edge Dataset
    (each edge once, either orientation; int-castable node ids).

    Returns Dataset[node: int64, component: int64] covering every node that
    appears in `edges`, with component = min node id of its component.

    Below `broadcast_max_edges` the per-block-contraction fast path runs
    (see _cc_broadcast: one Ray job, node-bounded driver pull); above it,
    the hash-to-min shuffle iteration handles graphs of any size."""
    edges = edges.materialize()  # both paths re-scan; rounds must not re-run lineage
    if edges.count() <= broadcast_max_edges:
        return _cc_broadcast(edges, src, dst)
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


def _pagerank_broadcast(
    e: Dataset, nodes: Dataset, n: int, damping: float, iters: int
) -> Dataset:
    """Small-node-count PageRank path: the rank vector (O(nodes) floats)
    lives on the driver and is re-broadcast via ray.put each iteration;
    edges stay distributed and are scanned by a stateless map_batches that
    looks ranks up with a searchsorted against the broadcast id vector.
    Per iteration: ONE Ray job — an edge scan whose blocks each emit a
    SPARSE per-node contribution partial (unique in-block dst + bincount
    sum, bounded by min(nodes, block rows)) folded on the driver — no
    shuffle and no join operator, the same driver-fold shape as
    _kcore/_cc_broadcast. The caller gates on broadcast_max_nodes; above
    it the hash-join path runs instead."""
    import ray

    nd = nodes.to_pandas()  # gated: at most broadcast_max_nodes rows
    order = np.argsort(nd["node"].to_numpy(), kind="stable")
    ids = nd["node"].to_numpy()[order]
    outdeg = nd["outdeg"].to_numpy()[order]
    dang_mask = outdeg == 0
    inv_deg = np.where(dang_mask, 0.0, 1.0 / np.maximum(outdeg, 1))
    r = np.full(n, 1.0 / n)
    ids_ref = ray.put(ids)
    w_ref = ray.put(inv_deg)

    for _ in range(iters):
        dang = float(r[dang_mask].sum())
        base = (1.0 - damping) / n + damping * dang / n
        r_ref = ray.put(r)

        def contrib(b: pa.Table, r_ref=r_ref) -> pa.Table:
            ids_l = ray.get(ids_ref)
            si = np.searchsorted(ids_l, b.column("src").to_numpy(zero_copy_only=False))
            c = ray.get(r_ref)[si] * ray.get(w_ref)[si]
            di = np.searchsorted(ids_l, b.column("dst").to_numpy(zero_copy_only=False))
            uniq, inv = np.unique(di, return_inverse=True)
            return pa.table(
                {"di": pa.array(uniq, pa.int64()), "c": pa.array(np.bincount(inv, weights=c))}
            )

        in_mass = np.zeros(n)
        for part in e.map_batches(contrib, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            np.add.at(
                in_mass,
                part.column("di").to_numpy(zero_copy_only=False),
                part.column("c").to_numpy(zero_copy_only=False),
            )
        r = base + damping * in_mass

    return rd.from_arrow(pa.table({"node": pa.array(ids, pa.int64()), "rank": pa.array(r)}))


def pagerank(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    damping: float = 0.85,
    iters: int = 10,
    num_partitions: int = 8,
    broadcast_max_nodes: int = 2_000_000,
) -> Dataset:
    """PageRank over a directed edge Dataset (duplicate edges count as
    parallel edges), fixed iteration count. Returns (node, rank) for every
    node appearing as src or dst; ranks sum to 1.

    Broadcast-or-hash, the same gate as the J1 spans<->media join
    (pipelines/extract.py): the rank vector is O(nodes) while edges are the
    big side, so when the graph has <= broadcast_max_nodes nodes the rank
    vector lives on the driver and each iteration is ONE Ray job — a
    map_batches over the (static, materialized) weighted edges against the
    ray.put-broadcast rank vector, then a combiner groupby(dst) sum whose
    node-count-sized result updates the vector. Above the threshold
    (billions of nodes at 100 TB) the hash path runs instead: ONE hash join
    (weighted edges x ranks on src) + ONE combiner groupby(node) per
    iteration; rank vectors never leave the cluster and the driver sees
    only the dangling-mass scalar. In both paths edge weights (1/outdeg)
    are joined in ONCE before the loop, and in the hash path nodes that
    receive no contributions are covered by unioning a static
    zero-contribution row per node into the groupby instead of a second
    (left outer) join per iteration. Dangling nodes (outdeg 0) redistribute
    uniformly, the standard power-iteration treatment.

    Ray 2.49's Dataset.join crashes on a shuffle partition that received no
    shards on one side (the ArrowBlockBuilder yields a zero-COLUMN table and
    pyarrow's join then can't find the key field — join.py:118). Two
    mitigations here: `_typed` rebuilds every block against an explicit
    schema (so zero-column empties never enter a join), and the effective
    num_partitions is capped at ~n/32 so every partition of a small graph is
    statistically guaranteed shards on both sides."""
    from tesseract_recognize_ray.functions.relational import grouped_agg

    def _typed(schema: dict[str, pa.DataType]):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({k: pa.array([], t) for k, t in schema.items()})
            return pa.table({k: b.column(k).cast(t) for k, t in schema.items()})

        return fn

    def pairs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b.column(src).cast(pa.int64()),
                "dst": b.column(dst).cast(pa.int64()),
            }
        )

    e = edges.map_batches(pairs, batch_format="pyarrow").materialize()

    # node inventory + out-degree in ONE combiner aggregate, no join: each
    # edge contributes (src, deg=1) and (dst, deg=0) rows.
    def deg_rows(b: pa.Table) -> pa.Table:
        s = b.column("src").combine_chunks()
        d = b.column("dst").combine_chunks()
        node = pa.chunked_array([s, d]).combine_chunks()
        deg = pa.array(
            np.concatenate(
                [np.ones(len(s), dtype=np.int64), np.zeros(len(d), dtype=np.int64)]
            )
        )
        return pa.table({"node": node, "deg": deg})

    nodes = (
        grouped_agg(
            e.map_batches(deg_rows, batch_format="pyarrow"),
            ["node"],
            [("deg", "sum", "outdeg")],
        )
        .map_batches(
            _typed({"node": pa.int64(), "outdeg": pa.int64()}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n = nodes.count()
    num_partitions = max(1, min(num_partitions, n // 32))
    if n == 0:
        return nodes.map_batches(
            lambda b: pa.table({"node": b.column("node"), "rank": pc.cast(b.column("outdeg"), pa.float64())}),
            batch_format="pyarrow",
        )

    if n <= broadcast_max_nodes:
        return _pagerank_broadcast(e, nodes, n, damping, iters)

    # weighted edges, joined ONCE: (src, dst, w = 1/outdeg(src))
    we = (
        e.join(
            nodes.map_batches(
                lambda b: pa.table(
                    {
                        "w_node": b.column("node"),
                        "w": pc.divide(
                            pa.scalar(1.0), pc.cast(b.column("outdeg"), pa.float64())
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("w_node",),
        )
        .map_batches(
            _typed({"src": pa.int64(), "dst": pa.int64(), "w": pa.float64()}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    ranks = nodes.map_batches(
        lambda b: b.append_column("rank", pa.array(np.full(b.num_rows, 1.0 / n))),
        batch_format="pyarrow",
    ).materialize()
    # static zero-contribution row per node: guarantees every node (incl.
    # ones with no in-edges) survives the groupby, carrying its outdeg —
    # replaces a per-iteration left-outer join against `nodes`.
    zeros = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b.column("node"),
                "c": pa.array(np.zeros(b.num_rows)),
                "outdeg": b.column("outdeg"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        dang = ranks.map_batches(
            lambda b: b.filter(pc.equal(b.column("outdeg"), 0)), batch_format="pyarrow"
        ).sum("rank") or 0.0
        contribs = we.join(
            ranks.map_batches(
                lambda b: pa.table(
                    {"r_node": b.column("node"), "rank": b.column("rank")}
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("r_node",),
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("dst"),
                    "c": pc.multiply(b.column("w"), b.column("rank")),
                    "outdeg": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        base = (1.0 - damping) / n + damping * dang / n

        def apply(b: pa.Table, base=base) -> pa.Table:
            mass = pc.fill_null(b.column("in_mass"), 0.0)
            rank = pc.add(pa.scalar(base), pc.multiply(pa.scalar(damping), mass))
            return pa.table(
                {
                    "node": b.column("node"),
                    "outdeg": b.column("outdeg"),
                    "rank": rank,
                }
            )

        ranks = (
            grouped_agg(
                contribs.union(zeros),
                ["node"],
                [("c", "sum", "in_mass"), ("outdeg", "max", "outdeg")],
            )
            .map_batches(
                _typed(
                    {
                        "node": pa.int64(),
                        "in_mass": pa.float64(),
                        "outdeg": pa.int64(),
                    }
                ),
                batch_format="pyarrow",
            )
            .map_batches(apply, batch_format="pyarrow")
            .materialize()
        )

    return ranks.drop_columns(["outdeg"])


def _pair_indices(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Global row indices (left, right) of ALL ordered within-group pairs
    (left row strictly before right row) over groups laid out contiguously
    with the given sizes — pure numpy, O(total pairs), no per-group Python.
    Two stacked grouped-aranges: one enumerates each group's left slots
    i = 0..k-2, the second expands slot i into its k-1-i right partners."""
    k = counts.astype(np.int64)
    starts = np.cumsum(k) - k  # exclusive cumsum, same shape as k (incl. empty)
    m = np.maximum(k - 1, 0)  # left slots per group
    gi_off = np.cumsum(m) - m
    r = np.arange(m.sum(), dtype=np.int64) - np.repeat(gi_off, m)  # local i
    rep = np.repeat(k, m) - 1 - r  # rights per left slot
    left_slot = np.repeat(starts, m) + r
    left = np.repeat(left_slot, rep)
    p_off = np.cumsum(rep) - rep
    rr = np.arange(rep.sum(), dtype=np.int64) - np.repeat(p_off, rep)
    return left, left + 1 + rr


def group_clique_pairs(
    ds: Dataset,
    key_cols: list[str],
    node_col: str,
    *,
    num_buckets: int = 64,
    max_group: int = 256,
    min_count: int = 1,
    count_col: str | None = None,
    reduce_blocks: int | None = None,
) -> Dataset:
    """ALL distinct in-group pairs (src < dst) of nodes sharing a key tuple
    — the candidate-pair shape for pairwise verify stages (edit distance,
    exact Jaccard), where star edges would under-report pairs. Groups larger
    than max_group are dropped (a shingle shared by 10^6 docs would emit
    5·10^11 pairs); pairs seen under several keys are deduped by a
    (src, dst) groupby. min_count > 1 keeps only pairs co-occurring under at
    least that many distinct key tuples (SQL HAVING COUNT(*) >= c over the
    distinct (key, node) projection) — the same (src, dst) groupby then
    counts per-key emissions instead of deduping early, so the sparsifying
    threshold costs no extra shuffle."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        from tesseract_recognize_ray.hashing import stable_bucket_table

        bk = stable_bucket_table(batch, key_cols, num_buckets)
        return batch.append_column("__bucket", pa.array(bk, pa.int32()))

    def cliques(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized: sort rows (group, node), take within-group pair
        # indices from _pair_indices — node sort order makes src < dst free
        df = df.drop_duplicates(key_cols + [node_col]).sort_values(
            key_cols + [node_col], kind="mergesort"
        )
        sizes = df.groupby(key_cols, sort=False).size().to_numpy()
        keep = (sizes >= 2) & (sizes <= max_group)
        vals = df[node_col].to_numpy()[np.repeat(keep, sizes)]
        li, ri = _pair_indices(sizes[keep])
        out = pd.DataFrame(
            {"src": vals[li].astype(np.int64), "dst": vals[ri].astype(np.int64)}
        )
        # min_count / count_col need one row per (key, pair) emission for the
        # count; plain dedup mode collapses early to shrink the shuffle
        return out if (min_count > 1 or count_col) else out.drop_duplicates()

    pairs = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda d: cliques(d.drop(columns="__bucket")), batch_format="pandas")
    )
    # global distinct — the same pair can arise under different keys
    from tesseract_recognize_ray.functions.relational import grouped_agg

    dd = grouped_agg(
        pairs,
        ["src", "dst"],
        [("src", "count", count_col or "__n")],
        reduce_blocks=reduce_blocks,
    )
    if min_count > 1:
        dd = dd.filter(expr=f"{count_col or '__n'} >= {min_count}")
    if count_col:
        return dd.map_batches(
            lambda b: b.select(["src", "dst", count_col]), batch_format="pyarrow"
        )
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
        from tesseract_recognize_ray.hashing import stable_bucket_table

        bk = stable_bucket_table(batch, key_cols, num_buckets)
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


def enumerate_triangles(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 64,
    broadcast_max_nodes: int = 4_000_000,
    broadcast_max_edges: int = 50_000_000,
    assume_simple: bool = False,
) -> Dataset:
    """Every triangle of an undirected simple graph, exactly once, as rows
    (a, b, c) — the MapReduce node-iterator with DEGREE orientation (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
    WWW 2011). Each edge is oriented from its lower to its higher endpoint
    in the total order (degree, id); a triangle x-y-z is then found exactly
    once, as the wedge (b, c) emitted at its order-minimal vertex a matched
    against the oriented edge b->c.

    Scale shape: degree orientation bounds every out-degree by O(sqrt(2m)),
    so total wedge volume is O(m^1.5) instead of sum(deg^2) — the hot-node
    (celebrity vertex) blowup cannot happen. Degrees (one int per node)
    attach via a ray.put broadcast + searchsorted below broadcast_max_nodes
    (~60 MB of arrays at the default gate), else via a bucketed merge; the
    closing wedge-edge match is a tag-union bucketed merge on stable_bucket
    of the (b, c) pair — never Ray's JoinOperator, whose empty hash
    partitions cannot be joined. Payloads are int64 triples throughout."""
    import ray

    from tesseract_recognize_ray.functions.relational import grouped_agg

    # canonical distinct undirected edges (u < v by id), self-loops dropped;
    # assume_simple skips the dedup groupby when the caller guarantees that
    # form already (e.g. group_clique_pairs output) — it was the single most
    # expensive stage of the whole enumeration
    def canon(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column(src), pa.int64())
        v = pc.cast(b.column(dst), pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.less(t.column("u"), t.column("v")))

    if assume_simple:
        e = edges.map_batches(
            lambda b: pa.table(
                {"u": pc.cast(b.column(src), pa.int64()), "v": pc.cast(b.column(dst), pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        e = grouped_agg(
            edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"], [("u", "count", "__n")]
        ).drop_columns(["__n"]).materialize()

    # undirected degree of every node: one combiner groupby over both endpoints
    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays([b.column("u").combine_chunks(), b.column("v").combine_chunks()])}
        )

    # Degrees: below the edge broadcast gate they fold on the driver in ONE
    # pass (per-block value_counts partials — the same shape as the kcore
    # fast path; re-using a deg *Dataset* here cost three full re-executions
    # of the groupby lineage: count, to_pandas and the id-bounds aggregate).
    n_edges = e.count()
    ids = dgs = None
    deg = None
    if n_edges <= broadcast_max_edges:
        def endpoint_counts(b: pa.Table) -> pa.Table:
            vc = pc.value_counts(
                pa.concat_arrays(
                    [b.column("u").combine_chunks(), b.column("v").combine_chunks()]
                )
            )
            return pa.table(
                {"node": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
            )

        parts = [
            b
            for b in e.map_batches(endpoint_counts, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pandas"
            )
            if len(b)
        ]
        if parts:
            s = pd.concat(parts).groupby("node", sort=True)["cnt"].sum()
            ids = s.index.to_numpy().astype(np.int64)
            dgs = s.to_numpy().astype(np.int64)
        else:
            ids = np.empty(0, np.int64)
            dgs = np.empty(0, np.int64)
        n_nodes = len(ids)
    if ids is None or n_nodes > broadcast_max_nodes:
        ids = dgs = None
        deg = grouped_agg(
            e.map_batches(endpoints, batch_format="pyarrow"), ["node"], [("node", "count", "deg")]
        ).materialize()
        n_nodes = deg.count()

    def orient_arrays(u, v, du, dv):
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), pa.int64()),
                "b": pa.array(np.where(u_first, v, u), pa.int64()),
                "db": pa.array(np.where(u_first, dv, du), pa.int64()),
            }
        )

    if ids is not None:
        ids_ref = ray.put(ids)  # driver-folded: already sorted by node id
        deg_ref = ray.put(dgs)

        def orient(b: pa.Table) -> pa.Table:
            sids = ray.get(ids_ref)
            dg = ray.get(deg_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            return orient_arrays(u, v, dg[np.searchsorted(sids, u)], dg[np.searchsorted(sids, v)])

        oriented = e.map_batches(orient, batch_format="pyarrow")
    else:
        # bucketed merge: edge rows ride to the bucket of each endpoint in
        # turn, degree rows (tag 1) ride along; one stable_bucket shuffle per
        # endpoint, vectorized pandas merge inside each bucket
        def attach(edge_ds: Dataset, key: str, out: str) -> Dataset:
            # both tag streams MUST emit the same column ORDER — Dataset.union
            # aligns blocks positionally, so a (__tag, __deg) vs (__deg, __tag)
            # mismatch silently transposes the two columns
            names = list(edge_ds.schema().names)

            def tag_edges(b: pa.Table) -> pa.Table:
                t = b.append_column("__node", b.column(key))
                t = t.append_column("__tag", pa.array(np.zeros(b.num_rows, dtype=np.int8)))
                return t.append_column("__deg", pa.nulls(b.num_rows, pa.int64()))

            def tag_deg(b: pa.Table) -> pa.Table:
                cols = {n: pa.nulls(b.num_rows, pa.int64()) for n in names}
                cols["__node"] = b.column("node")
                cols["__tag"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
                cols["__deg"] = b.column("deg")
                return pa.table(cols)

            both = edge_ds.map_batches(tag_edges, batch_format="pyarrow").union(
                deg.map_batches(tag_deg, batch_format="pyarrow")
            )

            def bucket(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "__bucket", pa.array(stable_bucket(b.column("__node"), num_buckets), pa.int32())
                )

            def merge(df: pd.DataFrame) -> pd.DataFrame:
                dd = df[df["__tag"] == 1][["__node", "__deg"]]
                ee = df[df["__tag"] == 0].drop(columns=["__deg", "__bucket", "__tag"])
                m = ee.merge(dd, on="__node", how="inner")
                m = m.drop(columns="__node").rename(columns={"__deg": out})
                # tag-1 rows' null ints float the dtypes through the group
                # concat; the surviving rows are all tag-0 ints
                return m.astype({c: "int64" for c in m.columns})

            return (
                both.map_batches(bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(merge, batch_format="pandas")
            )

        ed = attach(attach(e, "u", "__du"), "v", "__dv")

        def orient(b: pa.Table) -> pa.Table:
            return orient_arrays(
                b.column("u").to_numpy(zero_copy_only=False),
                b.column("v").to_numpy(zero_copy_only=False),
                b.column("__du").to_numpy(zero_copy_only=False),
                b.column("__dv").to_numpy(zero_copy_only=False),
            )

        oriented = ed.map_batches(orient, batch_format="pyarrow")

    # materialized on purpose: the oriented edge list is consumed by BOTH
    # downstream branches (wedge emission and the closing-edge match)
    oriented = oriented.materialize()

    # wedges at each pivot a: all out-neighbor pairs (b, c), b before c in
    # the same (degree, id) order the edges were oriented by; tag 0 rows.
    # Oriented edges re-enter as tag-1 rows keyed by their own (b, c) pair,
    # so one stable_bucket shuffle co-locates every wedge with the edge
    # that would close it.
    def add_bucket(b: pa.Table) -> pa.Table:
        bk = stable_bucket(b.column("a"), num_buckets)
        return b.append_column("__bucket", pa.array(bk, pa.int32()))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized across every pivot in the bucket: sort by (a, db, b)
        # so within-pivot pair order follows the orientation total order,
        # then one _pair_indices call emits all wedges at once
        df = df.sort_values(["a", "db", "b"], kind="mergesort")
        sizes = df.groupby("a", sort=False).size().to_numpy()
        a_vals = df["a"].to_numpy()
        b_vals = df["b"].to_numpy()
        li, ri = _pair_indices(sizes)
        out = pd.DataFrame(
            {
                "wa": a_vals[li].astype(np.int64),
                "kb": b_vals[li].astype(np.int64),
                "kc": b_vals[ri].astype(np.int64),
            }
        )
        out["__tag"] = np.zeros(len(out), dtype=np.int8)
        return out

    # Closing match. Wedge volume is O(m^1.5) while the edge list is only
    # O(m), so the cheap path broadcasts the packed edge set ((b<<32)|c,
    # sorted uint64 — 8 bytes/edge) and FUSES the close filter into the
    # wedge-emission map_groups: wedges are born, filtered against the
    # broadcast set, and die inside one task — the O(m^1.5) wedge stream
    # never touches the object store, only actual triangles do. Falls back
    # to a tag-union bucketed merge when the edge list is too big to
    # broadcast or ids exceed 32 bits (never Ray's JoinOperator, whose
    # empty hash partitions cannot be joined).
    if n_nodes == 0:
        ids_fit_u32 = True
    elif ids is not None:
        ids_fit_u32 = bool(ids[0] >= 0 and ids[-1] < 2**32)
    else:
        from ray.data.aggregate import Max as AggMax, Min as AggMin

        bounds = deg.aggregate(AggMin("node"), AggMax("node"))
        ids_fit_u32 = bounds["min(node)"] >= 0 and bounds["max(node)"] < 2**32

    if n_edges <= broadcast_max_edges and ids_fit_u32:
        packed = oriented.map_batches(
            lambda b: pa.table(
                {
                    "k": pa.array(
                        (b.column("a").to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(32))
                        | b.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
                    )
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()["k"].to_numpy()  # gated: at most broadcast_max_edges rows
        edge_ref = ray.put(np.sort(packed))

        def wedges_close(df: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray

            arr = _ray.get(edge_ref)
            df = df.sort_values(["a", "db", "b"], kind="mergesort")
            sizes = df.groupby("a", sort=False).size().to_numpy()
            a_vals = df["a"].to_numpy()
            b_vals = df["b"].to_numpy()
            li, ri = _pair_indices(sizes)
            key = (b_vals[li].astype(np.uint64) << np.uint64(32)) | b_vals[ri].astype(np.uint64)
            if len(arr):
                idx = np.minimum(np.searchsorted(arr, key), len(arr) - 1)
                hit = arr[idx] == key
            else:
                hit = np.zeros(len(key), bool)
            return pd.DataFrame(
                {
                    "a": a_vals[li[hit]].astype(np.int64),
                    "b": b_vals[li[hit]].astype(np.int64),
                    "c": b_vals[ri[hit]].astype(np.int64),
                }
            )

        return (
            oriented.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda d: wedges_close(d.drop(columns="__bucket")), batch_format="pandas"
            )
        )

    w = (
        oriented.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda d: wedges(d.drop(columns="__bucket")), batch_format="pandas")
    )

    def edge_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "wa": pa.nulls(b.num_rows, pa.int64()),
                "kb": b.column("a"),
                "kc": b.column("b"),
                "__tag": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            }
        )

    both = w.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def pair_bucket(b: pa.Table) -> pa.Table:
        key = pc.add(
            pc.multiply(b.column("kb"), pa.scalar(1_000_003, pa.int64())), b.column("kc")
        )
        return b.append_column(
            "__bucket", pa.array(stable_bucket(key, num_buckets), pa.int32())
        )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        ee = df[df["__tag"] == 1][["kb", "kc"]]
        ww = df[df["__tag"] == 0][["wa", "kb", "kc"]]
        m = ww.merge(ee, on=["kb", "kc"], how="inner")
        return pd.DataFrame(
            {
                "a": m["wa"].astype("int64"),
                "b": m["kb"].astype("int64"),
                "c": m["kc"].astype("int64"),
            }
        )

    return (
        both.map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda d: close(d.drop(columns="__bucket")), batch_format="pandas")
    )


def bfs_hops(
    edges: Dataset,
    seeds: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    max_depth: int = 12,
    num_partitions: int = 16,
    broadcast_max_frontier: int = 2_000_000,
) -> Dataset:
    """Multi-source BFS shortest hop distance over an undirected graph:
    rows (node, dist) for every node reachable from the seed set within
    max_depth hops. Level-synchronous frontier expansion — per round the
    current frontier joins the (symmetrized, distributed) edge list, newly
    produced (neighbor, d+1) rows union into the distance table and ONE
    combiner groupby(node) min keeps first-visit distances; convergence is
    an O(1) driver scalar (count of nodes first reached this round).

    Broadcast-or-hash gate, same design as ``pagerank``: while the VISITED
    id set fits broadcast_max_frontier, the driver coordinates a classic
    frontier BFS — ONE Ray job per round (edge scan with a vectorized is_in
    filter against the ray.put frontier + per-block distinct combiner), no
    shuffle, no join; the driver holds O(visited) int64 ids, the same order
    as the broadcast ceiling it is gated by. The moment the frontier
    outgrows the gate, the accumulated distances spill into a distributed
    (node, dist) Dataset and the loop continues with frontier x edges hash
    joins + a combiner groupby(node) min per round — distances and edges
    stay distributed, the driver only sees per-round scalars."""
    import ray

    from tesseract_recognize_ray.functions.relational import grouped_agg, hash_join

    def sym(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column(src), pa.int64()).combine_chunks()
        v = pc.cast(b.column(dst), pa.int64()).combine_chunks()
        return pa.table({"eu": pa.concat_arrays([u, v]), "ev": pa.concat_arrays([v, u])})

    e = edges.map_batches(sym, batch_format="pyarrow").materialize()

    seed_ids = np.unique(seeds.to_pandas().iloc[:, 0].to_numpy().astype(np.int64))
    visited = seed_ids
    chunks: list[tuple[np.ndarray, int]] = [(seed_ids, 0)]
    frontier = seed_ids
    dist: Dataset | None = None  # set once spilled to the distributed path

    d = 0
    while d < max_depth and len(frontier) > 0:
        if dist is None and len(frontier) <= broadcast_max_frontier:
            ids_ref = ray.put(pa.array(frontier, pa.int64()))

            def expand(b: pa.Table, ids_ref=ids_ref) -> pa.Table:
                hit = b.filter(pc.is_in(b.column("eu"), value_set=ray.get(ids_ref)))
                return pa.table({"node": pc.unique(hit.column("ev"))})

            cand = (
                e.map_batches(expand, batch_format="pyarrow")
                .to_pandas()["node"]
                .to_numpy()
            )
            new = np.setdiff1d(np.unique(cand), visited, assume_unique=True)
            d += 1
            if len(new):
                chunks.append((new, d))
                visited = np.union1d(visited, new)
            frontier = new
            continue
        if dist is None:
            # spill the driver-accumulated distances and switch modes
            dist = rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array(np.concatenate([c for c, _ in chunks]), pa.int64()),
                        "dist": pa.array(
                            np.concatenate(
                                [np.full(len(c), dd, dtype=np.int64) for c, dd in chunks]
                            )
                        ),
                    }
                )
            ).materialize()
        # bucketed frontier SEMI join, no Dataset.join: frontier rows and
        # edge rows co-locate by hash(eu); inside each bucket a vectorized
        # isin filter emits the expansion. (Ray 2.49's acero-backed join
        # rejects the zero-column empty partitions a sparse frontier
        # produces, and BFS only needs semi-join semantics anyway.)
        def tag_frontier(b: pa.Table, dd=d) -> pa.Table:
            keep = b.filter(pc.equal(b.column("dist"), dd))
            k = pc.cast(keep.column("node"), pa.int64())
            return pa.table(
                {
                    "k": k,
                    "ev": pa.array(np.full(len(k), -1, dtype=np.int64)),
                    "s": pa.array(np.ones(len(k), dtype=np.int8)),
                }
            )

        def tag_edges(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": b.column("eu"),
                    "ev": b.column("ev"),
                    "s": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                }
            )

        tagged = dist.map_batches(tag_frontier, batch_format="pyarrow").union(
            e.map_batches(tag_edges, batch_format="pyarrow")
        )

        def add_bucket(b: pa.Table) -> pa.Table:
            bk = stable_bucket(b.column("k"), num_partitions)
            return b.append_column("__bucket", pa.array(bk, pa.int32()))

        def expand_bucket(g: pd.DataFrame, nd=d + 1) -> pd.DataFrame:
            fset = g.loc[g["s"] == 1, "k"].to_numpy()
            hits = g.loc[(g["s"] == 0) & g["k"].isin(fset), "ev"]
            return pd.DataFrame(
                {"node": hits.to_numpy(), "dist": np.full(len(hits), nd, dtype=np.int64)}
            )

        cand_ds = (
            tagged.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda g: expand_bucket(g.drop(columns="__bucket")), batch_format="pandas"
            )
        )
        dist = grouped_agg(dist.union(cand_ds), ["node"], [("dist", "min", "dist")]).materialize()
        d += 1
        # loop condition only needs emptiness, not the ids
        n_new = dist.filter(expr=f"dist == {d}").count()
        frontier = np.empty(min(n_new, 1), dtype=np.int64)

    if dist is not None:
        return dist
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(np.concatenate([c for c, _ in chunks]), pa.int64()),
                "dist": pa.array(
                    np.concatenate([np.full(len(c), dd, dtype=np.int64) for c, dd in chunks])
                ),
            }
        )
    )


def _kcore_broadcast(e: Dataset, *, k: int, rounds: int) -> Dataset:
    """Driver-coordinated k-core peel below the broadcast gate: ONE Ray job
    per round. The alive-id set (sorted int64) ships via ray.put; each block
    filters its edges to both-endpoints-alive and emits value_counts degree
    partials (distinct endpoints per block, never raw edges); the driver
    folds them and updates the alive set. Matches kcore_peel's fixed-round
    mid-cascade contract exactly (converged round short-circuits; output =
    degrees over the final surviving edge set, so isolated-but-alive nodes
    don't appear — same as the groupby path)."""
    import ray

    def partials_of(alive_ref):
        def fn(b: pa.Table) -> pa.Table:
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            alive = ray.get(alive_ref)
            if alive is not None:
                def member(x):
                    i = np.minimum(np.searchsorted(alive, x), len(alive) - 1)
                    return alive[i] == x

                m = member(u) & member(v)
                u, v = u[m], v[m]
            vc = pc.value_counts(pa.array(np.concatenate([u, v])))
            return pa.table(
                {
                    "node": vc.field("values"),
                    "cnt": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

        return fn

    def fold_degrees(alive_ref):
        parts = [
            b
            for b in e.map_batches(partials_of(alive_ref), batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pandas"  # whole blocks: default 256 re-chops
            )
        ]
        if not parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        s = pd.concat(parts).groupby("node", sort=True)["cnt"].sum()
        return s.index.to_numpy().astype(np.int64), s.to_numpy().astype(np.int64)

    def result(nodes, degs):
        return rd.from_arrow(pa.table({"node": pa.array(nodes), "deg": pa.array(degs)}))

    alive_ref = ray.put(None)
    for _ in range(rounds):
        nodes, degs = fold_degrees(alive_ref)
        good = nodes[degs >= k]
        if len(good) == len(nodes):  # converged: further rounds are no-ops
            return result(nodes, degs)
        if len(good) == 0:
            return result(np.empty(0, np.int64), np.empty(0, np.int64))
        alive_ref = ray.put(good)  # sorted: groupby(sort=True) index order
    return result(*fold_degrees(alive_ref))


def kcore_peel(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    k: int,
    rounds: int,
    num_buckets: int = 64,
    broadcast_max_nodes: int = 4_000_000,
    assume_simple: bool = False,
) -> Dataset:
    """Fixed-round k-core peeling over an undirected simple graph: each of
    `rounds` iterations recomputes node degrees (one combiner groupby over
    both endpoints) and removes every node with degree < k together with
    its incident edges. Returns (node, deg) for nodes surviving all rounds,
    with degrees over the final surviving edge set — EXACTLY the state after
    `rounds` peels (possibly mid-cascade), which is what the unrolled SQL
    oracle computes; a converged round (nothing removed) short-circuits,
    since further rounds are no-ops.

    Broadcast-or-merge gate, same design as bfs_hops: when the edge list is
    small enough that the driver can hold per-node state (|E| <=
    broadcast_max_nodes, so |V| <= 2x that), the whole peel runs as ONE Ray
    job per round — alive ids ship via ray.put, each block emits its
    value_counts degree partials over alive-edge endpoints, the driver folds
    them — no shuffle, no per-round edge materialization (the original edge
    set is scanned each round; for fixed small `rounds` that beats writing
    shrunken copies). Above the gate, each round recomputes degrees with a
    combiner groupby and filters edges with two tag-union bucketed
    semi-merges (one per endpoint) without any driver pull."""
    import ray

    from tesseract_recognize_ray.functions.relational import grouped_agg

    def canon(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column(src), pa.int64())
        v = pc.cast(b.column(dst), pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.less(t.column("u"), t.column("v")))

    if assume_simple:
        e = edges.map_batches(
            lambda b: pa.table(
                {"u": pc.cast(b.column(src), pa.int64()), "v": pc.cast(b.column(dst), pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        e = grouped_agg(
            edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"], [("u", "count", "__n")]
        ).drop_columns(["__n"]).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays([b.column("u").combine_chunks(), b.column("v").combine_chunks()])}
        )

    def degrees(edge_ds: Dataset) -> Dataset:
        return grouped_agg(
            edge_ds.map_batches(endpoints, batch_format="pyarrow"),
            ["node"],
            [("node", "count", "deg")],
        )

    if e.count() <= broadcast_max_nodes:
        return _kcore_broadcast(e, k=k, rounds=rounds)

    for _ in range(rounds):
        deg = degrees(e).materialize()
        n_nodes = deg.count()
        good = deg.filter(expr=f"deg >= {k}")
        n_good = good.count()
        if n_good == n_nodes:  # converged: further rounds are no-ops
            break
        if n_good == 0:
            return rd.from_arrow(
                pa.table({"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())})
            )
        # two semi-merges: good-node rows (tag 1) ride to each endpoint's
        # bucket in turn; an edge survives a pass iff its endpoint matched
        def semi(edge_ds: Dataset, col: str) -> Dataset:
            def tag_edges(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "u": b.column("u"),
                        "v": b.column("v"),
                        "__node": b.column(col),
                        "__tag": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                    }
                )

            def tag_good(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "u": pa.nulls(b.num_rows, pa.int64()),
                        "v": pa.nulls(b.num_rows, pa.int64()),
                        "__node": b.column("node"),
                        "__tag": pa.array(np.ones(b.num_rows, dtype=np.int8)),
                    }
                )

            both = edge_ds.map_batches(tag_edges, batch_format="pyarrow").union(
                good.map_batches(tag_good, batch_format="pyarrow")
            )

            def bucket(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "__bucket",
                    pa.array(stable_bucket(b.column("__node"), num_buckets), pa.int32()),
                )

            def merge(df: pd.DataFrame) -> pd.DataFrame:
                ok = set(df.loc[df["__tag"] == 1, "__node"].to_numpy())
                ee = df[df["__tag"] == 0]
                keep = ee["__node"].isin(ok)
                return ee.loc[keep, ["u", "v"]].astype("int64")

            return (
                both.map_batches(bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(lambda d: merge(d.drop(columns="__bucket")), batch_format="pandas")
            )

        e = semi(semi(e, "u"), "v").materialize()


    return degrees(e)


def neighbor_jaccard(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    num_buckets: int = 64,
    max_degree: int = 256,
    min_common: int = 1,
    round_digits: int = 6,
    reduce_blocks: int | None = None,
) -> Dataset:
    """Link-prediction node similarity over an undirected simple edge list
    (src < dst, globally distinct): for every node pair sharing >= min_common
    neighbors, the common-neighbor count and Jaccard overlap
    |N(a)∩N(b)| / |N(a)∪N(b)|. Scale shape: symmetrize to (node, nbr) rows,
    reuse group_clique_pairs keyed by the SHARED NEIGHBOR — each wedge center
    w emits its adjacent pairs vectorized, a (src, dst) groupby counts wedges
    = common neighbors (O(Σ deg(w)²) emission, bounded by max_degree — a
    hub star would otherwise emit deg² rows); degrees ride along as a
    broadcast lookup (node->degree map; swap for a hash join when the node
    catalog outgrows a broadcast). Jaccard is ONE float64 division of exact
    ints — bit-identical across engines."""
    from tesseract_recognize_ray.functions.relational import (
        broadcast_lookup_join,
        grouped_agg,
    )

    def symmetrize(b: pa.Table) -> pa.Table:
        fwd = pa.table({"node": b.column(src), "nbr": b.column(dst)})
        rev = pa.table({"node": b.column(dst), "nbr": b.column(src)})
        return pa.concat_tables([fwd, rev])

    # two consumers (wedge pairs + degree fold) read the adjacency; without
    # a checkpoint the whole upstream edge-building lineage executes twice.
    # The edge list is the contracted, already-thresholded graph — orders of
    # magnitude smaller than the raw input — so materializing it is the
    # 100 TB-safe choice too (and the natural resume point).
    edges = edges.materialize()
    adj = edges.map_batches(symmetrize, batch_format="pyarrow")
    common = group_clique_pairs(
        adj,
        ["nbr"],
        "node",
        num_buckets=num_buckets,
        max_group=max_degree,
        min_count=min_common,
        count_col="common",
        reduce_blocks=reduce_blocks,
    )
    deg = grouped_agg(adj, ["node"], [("nbr", "count", "d")]).to_pandas()
    joined = broadcast_lookup_join(
        broadcast_lookup_join(
            common, deg.rename(columns={"node": "src", "d": "__da"}), "src"
        ),
        deg.rename(columns={"node": "dst", "d": "__db"}),
        "dst",
    )

    def finish(b: pa.Table) -> pa.Table:
        c = pc.cast(b.column("common"), pa.float64())
        union = pc.subtract(
            pc.cast(pc.add(b.column("__da"), b.column("__db")), pa.float64()), c
        )
        jac = pc.divide(c, union)
        if round_digits is not None:
            jac = pc.round(jac, ndigits=round_digits)
        return pa.table(
            {
                src: b.column("src"),
                dst: b.column("dst"),
                "common": b.column("common"),
                "jaccard": jac,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _lpa_broadcast(e: Dataset, rounds: int) -> Dataset:
    """Driver-coordinated synchronous LPA below the edge gate: labels live
    on the driver as (sorted node ids, label vector), re-broadcast via
    ray.put each round; every block emits combined (node, neighbor-label)
    pair counts (bounded by 2x its edge count), the driver folds partials
    and takes the deterministic mode. ONE Ray job per round, no shuffle —
    the same shape as _cc_broadcast / _kcore_broadcast."""
    import ray

    # node id universe: per-block unique endpoints, driver np.unique merge
    ids_parts = []
    for b in e.map_batches(
        lambda t: pa.table(
            {
                "node": pa.array(
                    np.unique(
                        np.concatenate(
                            [
                                t.column("u").to_numpy(zero_copy_only=False),
                                t.column("v").to_numpy(zero_copy_only=False),
                            ]
                        )
                    )
                )
            }
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_size=None, batch_format="pandas"):
        ids_parts.append(b["node"].to_numpy())
    ids = np.unique(np.concatenate(ids_parts)) if ids_parts else np.array([], np.int64)
    labels = ids.copy()
    if len(ids) == 0:
        # empty edge set (e.g. a threshold filtered every pair away): return
        # an empty typed result instead of letting the per-round
        # np.concatenate([]) raise — mirrors sssp_rounds' empty-seed guard
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "community": pa.array([], pa.int64())}
            )
        )

    def _pair_counts(a: np.ndarray, lab: np.ndarray):
        order = np.lexsort((lab, a))
        a_s, l_s = a[order], lab[order]
        new = np.empty(len(a_s), dtype=bool)
        if len(a_s):
            new[0] = True
            new[1:] = (a_s[1:] != a_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a_s)))
        return a_s[starts], l_s[starts], cnt.astype(np.int64)

    for _ in range(rounds):
        ref = ray.put((ids, labels))

        def partial(b: pa.Table, ref=ref) -> pa.Table:
            ids_, lab_ = ray.get(ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            a = np.concatenate([u, v])
            nb = np.concatenate([v, u])
            nb_lab = lab_[np.searchsorted(ids_, nb)]
            n, l, c = _pair_counts(a, nb_lab)
            return pa.table({"n": n, "l": l, "c": c})

        ns, ls, cs = [], [], []
        for b in e.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pandas"
        ):
            ns.append(b["n"].to_numpy())
            ls.append(b["l"].to_numpy())
            cs.append(b["c"].to_numpy())
        n = np.concatenate(ns)
        l = np.concatenate(ls)
        c = np.concatenate(cs)
        # merge cross-block duplicates of the same (node, label) pair
        order = np.lexsort((l, n))
        n, l, c = n[order], l[order], c[order]
        new = np.empty(len(n), dtype=bool)
        new[0] = True
        new[1:] = (n[1:] != n[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(new)
        seg = np.append(starts, len(n))
        csum = np.concatenate([[0], np.cumsum(c)])
        cm = csum[seg[1:]] - csum[seg[:-1]]
        n, l = n[starts], l[starts]
        # deterministic mode per node: (count desc, label asc), first per node
        order = np.lexsort((l, -cm, n))
        n, l = n[order], l[order]
        first = np.empty(len(n), dtype=bool)
        first[0] = True
        first[1:] = n[1:] != n[:-1]
        upd_nodes, upd_labels = n[first], l[first]
        new_labels = labels.copy()
        new_labels[np.searchsorted(ids, upd_nodes)] = upd_labels
        if np.array_equal(new_labels, labels):  # fixpoint: further rounds no-op
            break
        labels = new_labels

    return rd.from_arrow(pa.table({"node": pa.array(ids), "community": pa.array(labels)}))


def label_propagation(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    *,
    rounds: int,
    num_buckets: int = 64,
    broadcast_max_edges: int = 4_000_000,
    assume_simple: bool = False,
) -> Dataset:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) over an undirected simple graph, made fully deterministic: every
    node starts labeled with its own id; each of `rounds` synchronous
    iterations relabels every node with the MODE of its neighbors' previous
    labels, ties broken by the smallest label. Returns (node, community)
    after exactly `rounds` iterations (mid-oscillation state included — the
    unrolled SQL oracle replays the same rounds), short-circuiting on a
    fixpoint.

    Broadcast-or-merge gate, same design as kcore_peel/bfs_hops: below
    `broadcast_max_edges` the driver holds the label vector and each round
    is ONE shuffle-free Ray job over the (materialized) edge blocks
    (_lpa_broadcast). Above it, each round is a tag-union bucketed merge
    (labels ride to each directed edge's head by stable_bucket(dst) — never
    Ray's JoinOperator), a combiner (node, label) count, and a per-node
    deterministic top-1 — three bounded shuffles per round, labels and int64
    pairs only."""
    from tesseract_recognize_ray.functions.relational import grouped_agg

    def canon(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column(src), pa.int64())
        v = pc.cast(b.column(dst), pa.int64())
        lo = pc.min_element_wise(u, v)
        hi = pc.max_element_wise(u, v)
        t = pa.table({"u": lo, "v": hi})
        return t.filter(pc.less(t.column("u"), t.column("v")))

    if assume_simple:
        e = edges.map_batches(
            lambda b: pa.table(
                {"u": pc.cast(b.column(src), pa.int64()), "v": pc.cast(b.column(dst), pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        e = (
            grouped_agg(
                edges.map_batches(canon, batch_format="pyarrow"),
                ["u", "v"],
                [("u", "count", "__n")],
            )
            .drop_columns(["__n"])
            .materialize()
        )

    if e.count() <= broadcast_max_edges:
        return _lpa_broadcast(e, rounds)

    def und(b: pa.Table) -> pa.Table:
        u = b.column("u").combine_chunks()
        v = b.column("v").combine_chunks()
        return pa.table(
            {"head": pa.concat_arrays([u, v]), "tail": pa.concat_arrays([v, u])}
        )

    directed = e.map_batches(und, batch_format="pyarrow").materialize()
    lbl = directed.map_batches(
        lambda b: pa.table({"node": b.column("head"), "label": b.column("head")}),
        batch_format="pyarrow",
    )
    lbl = grouped_agg(lbl, ["node", "label"], [("node", "count", "__n")]).drop_columns(["__n"])

    for _ in range(rounds):
        # ride labels to every directed edge keyed by its TAIL (the neighbor)
        tagged_e = directed.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("tail"),
                    "a": b.column("head"),
                    "label": pa.nulls(b.num_rows, pa.int64()),
                    "__tag": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        tagged_l = lbl.map_batches(
            lambda b: pa.table(
                {
                    "key": b.column("node"),
                    "a": pa.nulls(b.num_rows, pa.int64()),
                    "label": b.column("label"),
                    "__tag": pa.array(np.ones(b.num_rows, dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )

        def add_bucket(b: pa.Table) -> pa.Table:
            return b.append_column("__bucket", pa.array(stable_bucket(b.column("key"), num_buckets)))

        def attach(g: pd.DataFrame) -> pd.DataFrame:
            # nullable int64 -> float64 happens at the arrow->pandas seam;
            # restore exact int64 so every round's schema is identical
            m = g[g["__tag"] == 1].set_index("key")["label"]
            ed = g[g["__tag"] == 0]
            return pd.DataFrame(
                {
                    "node": ed["a"].to_numpy().astype(np.int64),
                    "label": ed["key"].map(m).to_numpy().astype(np.int64),
                }
            )

        pairs = (
            tagged_e.union(tagged_l)
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(attach, batch_format="pandas")
        )
        cnt = grouped_agg(pairs, ["node", "label"], [("node", "count", "c")])

        def mode(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["node", "c", "label"], ascending=[True, False, True], kind="mergesort")
            g = g.drop_duplicates("node")
            return g[["node", "label"]].astype({"node": "int64", "label": "int64"})

        lbl = (
            cnt.map_batches(
                lambda b: b.append_column(
                    "__bucket", pa.array(stable_bucket(b.column("node"), num_buckets))
                ),
                batch_format="pyarrow",
            )
            .groupby("__bucket")
            .map_groups(mode, batch_format="pandas")
            .materialize()
        )

    return lbl.map_batches(
        lambda b: pa.table({"node": b.column("node"), "community": b.column("label")}),
        batch_format="pyarrow",
    )


def sssp_rounds(
    edges: Dataset,
    seeds: Dataset,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    *,
    rounds: int = 4,
    broadcast_max_nodes: int = 2_000_000,
) -> Dataset:
    """Bounded multi-source weighted shortest paths — `rounds` synchronous
    Bellman-Ford relaxations over an undirected graph with non-negative
    int64 edge weights. Returns (node, dist) for every node reached within
    `rounds` edges of the seed set; after r rounds dist is exact for all
    min-cost paths of <= r edges (the SQL-unrollable contract the DuckDB
    oracle mirrors as r chained relax CTEs — exact int64 arithmetic on
    both sides, so results value-match bit-for-bit).

    Broadcast-or-distributed gate, same design as ``pagerank``/``bfs_hops``:
    while the reached set fits broadcast_max_nodes the driver owns the
    (sorted ids, dist) vectors and each round is ONE Ray job — every edge
    block emits a SPARSE per-target min partial (searchsorted lookup +
    np.minimum.at, bounded by min(reached, block rows)) that the driver
    folds; no shuffle, no join. Past the gate the distance table spills to
    a distributed Dataset and each round is a bucket_join(dist, edges) +
    candidate union + combiner groupby(node) min — distances and edges
    stay distributed and the driver sees only per-round row counts."""
    import ray

    from tesseract_recognize_ray.functions.relational import bucket_join, grouped_agg

    def sym(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column(src), pa.int64()).combine_chunks()
        v = pc.cast(b.column(dst), pa.int64()).combine_chunks()
        w = pc.cast(b.column(weight), pa.int64()).combine_chunks()
        return pa.table(
            {
                "eu": pa.concat_arrays([u, v]),
                "ev": pa.concat_arrays([v, u]),
                "w": pa.concat_arrays([w, w]),
            }
        )

    e = edges.map_batches(sym, batch_format="pyarrow").materialize()
    sdf = seeds.to_pandas()  # an all-empty Ray dataset is also SCHEMALESS
    ids = (
        np.unique(sdf.iloc[:, 0].to_numpy().astype(np.int64))
        if len(sdf.columns) and len(sdf)
        else np.empty(0, dtype=np.int64)
    )
    if len(ids) == 0:  # empty seed set: empty typed result, no relax jobs
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())})
        )
    dist = np.zeros(len(ids), dtype=np.int64)
    dist_ds: Dataset | None = None

    for _ in range(rounds):
        if dist_ds is None and len(ids) <= broadcast_max_nodes:
            ids_ref = ray.put(ids)
            dist_ref = ray.put(dist)

            def relax(b: pa.Table, ids_ref=ids_ref, dist_ref=dist_ref) -> pa.Table:
                ids_l, dist_l = ray.get(ids_ref), ray.get(dist_ref)
                eu = b.column("eu").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(ids_l, eu)
                ok = (pos < len(ids_l)) & (ids_l[np.minimum(pos, len(ids_l) - 1)] == eu)
                nd = dist_l[pos[ok]] + b.column("w").to_numpy(zero_copy_only=False)[ok]
                tgt = b.column("ev").to_numpy(zero_copy_only=False)[ok]
                uniq, inv = np.unique(tgt, return_inverse=True)
                m = np.full(len(uniq), np.iinfo(np.int64).max)
                np.minimum.at(m, inv, nd)
                return pa.table({"node": pa.array(uniq, pa.int64()), "nd": pa.array(m, pa.int64())})

            pn, pd_ = [], []
            for part in e.map_batches(relax, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            ):
                pn.append(part.column("node").to_numpy(zero_copy_only=False))
                pd_.append(part.column("nd").to_numpy(zero_copy_only=False))
            alln = np.concatenate(pn) if pn else np.empty(0, dtype=np.int64)
            if len(alln):
                bn, inv = np.unique(alln, return_inverse=True)
                bd = np.full(len(bn), np.iinfo(np.int64).max)
                np.minimum.at(bd, inv, np.concatenate(pd_))
                all_ids = np.union1d(ids, bn)
                all_dist = np.full(len(all_ids), np.iinfo(np.int64).max)
                all_dist[np.searchsorted(all_ids, ids)] = dist
                pos = np.searchsorted(all_ids, bn)
                np.minimum.at(all_dist, pos, bd)
                ids, dist = all_ids, all_dist
            if len(ids) > broadcast_max_nodes:
                dist_ds = rd.from_arrow(
                    pa.table({"node": pa.array(ids, pa.int64()), "dist": pa.array(dist, pa.int64())})
                ).materialize()
            continue
        if dist_ds is None:
            dist_ds = rd.from_arrow(
                pa.table({"node": pa.array(ids, pa.int64()), "dist": pa.array(dist, pa.int64())})
            ).materialize()
        j = bucket_join(
            dist_ds,
            e,
            on=("node",),
            right_on=("eu",),
            left_schema=pa.schema({"node": pa.int64(), "dist": pa.int64()}),
            right_schema=pa.schema({"eu": pa.int64(), "ev": pa.int64(), "w": pa.int64()}),
        )

        def cand(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column("ev"),
                    "dist": pc.add(b.column("dist"), b.column("w")),
                }
            )

        merged = dist_ds.union(j.map_batches(cand, batch_format="pyarrow"))
        dist_ds = grouped_agg(merged, ["node"], [("dist", "min", "dist")]).materialize()

    if dist_ds is not None:
        return dist_ds
    return rd.from_arrow(
        pa.table({"node": pa.array(ids, pa.int64()), "dist": pa.array(dist, pa.int64())})
    )
