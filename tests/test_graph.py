"""functions/graph.py — hash-to-min connected components.

Oracle: a plain in-process union-find (path compression + min-id roots),
so every assertion is against exact component structure, not just counts.
"""

import numpy as np
import pandas as pd
import pytest


def _union_find_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _cc(edges_df, **kw):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import connected_components

    out = connected_components(rd.from_pandas(edges_df), "src", "dst", **kw).to_pandas()
    return dict(zip(out["node"], out["component"]))


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(7)
    edges = [tuple(map(int, rng.integers(0, 200, 2))) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = pd.DataFrame(edges, columns=["src", "dst"]).drop_duplicates()
    want = _union_find_components(df.itertuples(index=False))
    # both paths must agree with union-find: the per-block-contraction
    # broadcast path (default gate) and the hash-to-min shuffle path
    assert _cc(df, num_buckets=8) == want
    assert _cc(df, num_buckets=8, broadcast_max_edges=0) == want


def test_cc_star_with_high_hub(ray_session):
    # the hub has the HIGHEST id: leaves only learn the global min through
    # the hub's re-broadcast — the case plain neighbor-min propagation
    # without the (x, m) emission gets wrong.
    edges = [(999, leaf) for leaf in (3, 7, 11, 15)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = _cc(df, num_buckets=4)
    assert got == {999: 3, 3: 3, 7: 3, 11: 3, 15: 3}


def test_cc_long_path_converges(ray_session):
    # diameter 40 path: exercises multi-round convergence + the fixpoint
    # signature stop (labels monotone; unchanged signature == done).
    edges = [(i, i + 1) for i in range(300, 340)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = _cc(df, num_buckets=4, broadcast_max_edges=0)  # force shuffle path
    assert set(got.values()) == {300}
    assert len(got) == 41


def test_cc_two_components_and_self_loop(ray_session):
    df = pd.DataFrame([(1, 2), (2, 3), (10, 11), (20, 20)], columns=["src", "dst"])
    got = _cc(df, num_buckets=4)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_cc_empty_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import connected_components

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    out = connected_components(empty, "src", "dst").to_pandas()
    assert len(out) == 0


def test_near_dup_dedup_planted_clusters(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions import dedup as F_dedup

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away into the "
        "green hills where many red birds sing songs at dawn while old ships sail"
    )
    texts = {
        0: base,
        1: base.replace("red birds", "blue birds"),  # near-dup of 0
        2: base + " extra tail words",  # near-dup of 0 -> same cluster
        3: "completely different content about database query engines and shuffles",
        4: "another unrelated document mentioning parquet blocks and arrow batches",
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    kept = (
        F_dedup.near_dup_dedup(rd.from_pandas(df), "doc_id", "text", threshold=0.7)
        .to_pandas()["doc_id"]
        .tolist()
    )
    # cluster {0,1,2} collapses to its min id; singletons survive
    assert sorted(kept) == [0, 3, 4]


def test_levenshtein_matches_duckdb():
    import duckdb

    from tesseract_recognize_ray.functions.dedup import levenshtein

    con = duckdb.connect()
    cases = [
        ("kitten", "sitting"),
        ("", "abc"),
        ("abc", ""),
        ("same", "same"),
        ("a b c d", "a x c d e"),
        ("über", "uber"),  # byte-level, like DuckDB
    ]
    for a, b in cases:
        assert levenshtein(a, b) == con.execute("select levenshtein(?,?)", [a, b]).fetchone()[0]


def test_group_clique_pairs_dedup_and_guard(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import group_clique_pairs

    df = pd.DataFrame(
        {
            # key 'a' -> {1,2,3}; key 'b' -> {2,3} (duplicate pair); 'big' -> dropped
            "k": ["a", "a", "a", "b", "b"] + ["big"] * 5,
            "node": [1, 2, 3, 2, 3, 10, 11, 12, 13, 14],
        }
    )
    pairs = group_clique_pairs(
        rd.from_pandas(df), ["k"], "node", num_buckets=2, max_group=4
    ).to_pandas()
    got = set(map(tuple, pairs[["src", "dst"]].to_numpy()))
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_group_star_edges_same_components_as_clique(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import group_star_edges

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b", "c"],
            "node": [5, 9, 2, 9, 30, 7],
        }
    )
    stars = group_star_edges(rd.from_pandas(df), ["k"], "node", num_buckets=2).to_pandas()
    got = set(map(tuple, stars[["src", "dst"]].to_numpy()))
    # group a -> star around 2; group b -> star around 9; c is a singleton
    assert got == {(2, 5), (2, 9), (9, 30)}


def _pagerank_numpy(edges, n_nodes, damping=0.85, iters=10):
    """Dense power iteration with parallel-edge weights and uniform
    dangling redistribution — the textbook definition pagerank() targets."""
    M = np.zeros((n_nodes, n_nodes))
    for s, d in edges:
        M[d, s] += 1
    outdeg = M.sum(axis=0)
    for j in range(n_nodes):
        if outdeg[j] > 0:
            M[:, j] /= outdeg[j]
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        dang = r[outdeg == 0].sum()
        r = (1 - damping) / n_nodes + damping * (M @ r) + damping * dang / n_nodes
    return r


def test_pagerank_matches_power_iteration(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import pagerank

    rng = np.random.default_rng(11)
    n = 60
    edges = [tuple(map(int, rng.integers(0, n, 2))) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]  # parallel edges kept
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = (
        pagerank(rd.from_pandas(df), iters=10)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    present = sorted(set(df["src"]) | set(df["dst"]))
    # nodes absent from the edge list are absent from the output, so the
    # dense reference is computed over the present nodes only.
    remap = {v: i for i, v in enumerate(present)}
    redges = [(remap[a], remap[b]) for a, b in edges]
    ref = _pagerank_numpy(redges, len(present))
    assert list(out["node"]) == present
    np.testing.assert_allclose(out["rank"].to_numpy(), ref, atol=1e-12)
    assert abs(out["rank"].sum() - 1.0) < 1e-9


def test_pagerank_dangling_and_duplicate_edges(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (1, 2)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = (
        pagerank(rd.from_pandas(df), iters=10)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    ref = _pagerank_numpy(edges, 4)
    np.testing.assert_allclose(out["rank"].to_numpy(), ref, atol=1e-12)
    # duplicate (1,2) edge makes node 2 receive 2/3 of node 1's mass
    assert out.loc[2, "rank"] > out.loc[0, "rank"]


def test_pagerank_hash_path_matches_broadcast(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import pagerank

    rng = np.random.default_rng(7)
    n = 80
    edges = [tuple(map(int, rng.integers(0, n, 2))) for _ in range(400)]
    edges = [(a, b) for a, b in edges if a != b]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    # broadcast_max_nodes=0 forces the distributed hash-join path; both
    # paths must agree with the dense reference to float precision.
    out = (
        pagerank(rd.from_pandas(df), iters=6, broadcast_max_nodes=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    present = sorted(set(df["src"]) | set(df["dst"]))
    remap = {v: i for i, v in enumerate(present)}
    redges = [(remap[a], remap[b]) for a, b in edges]
    ref = _pagerank_numpy(redges, len(present), iters=6)
    assert list(out["node"]) == present
    np.testing.assert_allclose(out["rank"].to_numpy(), ref, atol=1e-9)
    assert abs(out["rank"].sum() - 1.0) < 1e-9


# ------------------------------------------------------- triangles and BFS
def _brute_triangles(edges_df):
    adj = {}
    for a, b in edges_df.itertuples(index=False):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tris = set()
    for u in adj:
        for v in adj[u]:
            for w in adj[u] & adj[v]:
                tris.add(tuple(sorted((u, v, w))))
    return tris


def _brute_bfs(edges_df, seeds, max_depth=12):
    adj = {}
    for a, b in edges_df.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    d = 0
    while frontier and d < max_depth:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def test_triangles_k4_plus_tail(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import enumerate_triangles

    # K4 (4 triangles) + a path and an isolated edge (0 triangles)
    df = pd.DataFrame(
        {"src": [1, 1, 1, 2, 2, 3, 4, 5, 7], "dst": [2, 3, 4, 3, 4, 4, 5, 6, 8]}
    )
    tri = enumerate_triangles(rd.from_pandas(df)).to_pandas()
    got = {tuple(sorted(t)) for t in tri[["a", "b", "c"]].itertuples(index=False)}
    assert got == _brute_triangles(df)
    assert len(tri) == 4  # each triangle exactly once (no double counting)


def test_triangles_random_graph_and_duplicate_edges(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import enumerate_triangles

    rng = np.random.default_rng(11)
    raw = pd.DataFrame(rng.integers(0, 40, size=(300, 2)), columns=["src", "dst"])
    raw = raw[raw.src != raw.dst]
    # duplicate + reversed edges must not inflate the count
    noisy = pd.concat([raw, raw, raw.rename(columns={"src": "dst", "dst": "src"})])
    tri = enumerate_triangles(rd.from_pandas(noisy), num_buckets=8).to_pandas()
    got = {tuple(sorted(t)) for t in tri[["a", "b", "c"]].itertuples(index=False)}
    assert got == _brute_triangles(raw)
    assert len(tri) == len(got)


def test_bfs_hops_matches_brute_force(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import bfs_hops

    rng = np.random.default_rng(5)
    df = pd.DataFrame(rng.integers(0, 60, size=(80, 2)), columns=["src", "dst"])
    df = df[df.src != df.dst]
    seeds = [0, 30]
    out = bfs_hops(
        rd.from_pandas(df),
        rd.from_pandas(pd.DataFrame({"node": seeds})),
    ).to_pandas()
    assert dict(zip(out["node"], out["dist"])) == _brute_bfs(df, seeds)


def test_bfs_hops_max_depth_truncates(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import bfs_hops

    # path graph 0-1-2-3-4-5
    df = pd.DataFrame({"src": [0, 1, 2, 3, 4], "dst": [1, 2, 3, 4, 5]})
    out = bfs_hops(
        rd.from_pandas(df),
        rd.from_pandas(pd.DataFrame({"node": [0]})),
        max_depth=3,
    ).to_pandas()
    assert dict(zip(out["node"], out["dist"])) == {0: 0, 1: 1, 2: 2, 3: 3}


def test_clique_pairs_min_count(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import group_clique_pairs

    # pair (1,2) under keys 10 and 20; pair (1,3) only under key 10
    df = pd.DataFrame(
        {"k": [10, 10, 10, 20, 20], "node": [1, 2, 3, 1, 2]}
    )
    all_pairs = group_clique_pairs(rd.from_pandas(df), ["k"], "node").to_pandas()
    assert {tuple(t) for t in all_pairs.itertuples(index=False)} == {(1, 2), (1, 3), (2, 3)}
    repeated = group_clique_pairs(
        rd.from_pandas(df), ["k"], "node", min_count=2
    ).to_pandas()
    assert {tuple(t) for t in repeated.itertuples(index=False)} == {(1, 2)}


def test_triangles_assume_simple_and_merge_fallback_parity(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import enumerate_triangles

    rng = np.random.default_rng(3)
    raw = pd.DataFrame(rng.integers(0, 30, size=(150, 2)), columns=["src", "dst"])
    raw = raw[raw.src != raw.dst]
    canon = pd.DataFrame(
        {"src": raw.min(axis=1), "dst": raw.max(axis=1)}
    ).drop_duplicates()
    expected = _brute_triangles(canon)

    simple = enumerate_triangles(
        rd.from_pandas(canon), assume_simple=True, num_buckets=8
    ).to_pandas()
    assert {tuple(sorted(t)) for t in simple[["a", "b", "c"]].itertuples(index=False)} == expected

    # force the bucketed-merge closing path (broadcast gate at 0)
    merged = enumerate_triangles(
        rd.from_pandas(canon), assume_simple=True, num_buckets=8, broadcast_max_edges=0
    ).to_pandas()
    assert {tuple(sorted(t)) for t in merged[["a", "b", "c"]].itertuples(index=False)} == expected


def _brute_kcore(edges_df, k, rounds):
    e = {tuple(sorted(t)) for t in edges_df.itertuples(index=False) if t[0] != t[1]}
    for _ in range(rounds):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {n for n, d in deg.items() if d < k}
        if not bad:
            break
        e = {(a, b) for a, b in e if a not in bad and b not in bad}
    deg = {}
    for a, b in e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def test_kcore_peel_matches_brute_force(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import kcore_peel

    rng = np.random.default_rng(17)
    df = pd.DataFrame(rng.integers(0, 40, size=(260, 2)), columns=["src", "dst"])
    df = df[df.src != df.dst]
    for k, rounds in ((3, 2), (5, 4), (8, 6)):
        out = kcore_peel(rd.from_pandas(df), k=k, rounds=rounds).to_pandas()
        assert dict(zip(out["node"], out["deg"])) == _brute_kcore(df, k, rounds)


def test_kcore_peel_collapse_and_merge_path(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import kcore_peel

    # triangle + pendant: 2-core after 1 round = the triangle; k=3 collapses
    df = pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 4]})
    out = kcore_peel(rd.from_pandas(df), k=2, rounds=3).to_pandas()
    assert dict(zip(out["node"], out["deg"])) == {1: 2, 2: 2, 3: 2}
    gone = kcore_peel(rd.from_pandas(df), k=3, rounds=3).to_pandas()
    assert len(gone) == 0
    # force the bucketed semi-merge path (broadcast gate at 0)
    merged = kcore_peel(
        rd.from_pandas(df), k=2, rounds=3, broadcast_max_nodes=0, num_buckets=4
    ).to_pandas()
    assert dict(zip(merged["node"], merged["deg"])) == {1: 2, 2: 2, 3: 2}


def test_bfs_hops_hash_join_spill_path(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.graph import bfs_hops

    # broadcast_max_frontier=1 forces the spill to the distributed
    # hash-join path on the first multi-node frontier; result must be
    # identical to the brute-force distances.
    rng = np.random.default_rng(9)
    df = pd.DataFrame(rng.integers(0, 40, size=(60, 2)), columns=["src", "dst"])
    df = df[df.src != df.dst]
    seeds = [0]
    out = bfs_hops(
        rd.from_pandas(df),
        rd.from_pandas(pd.DataFrame({"node": seeds})),
        broadcast_max_frontier=1,
    ).to_pandas()
    assert dict(zip(out["node"], out["dist"])) == _brute_bfs(df, seeds)
