"""Round-2 late operators: concat-and-chunk sequence packing, Bloom-filter
join pruning, deterministic split assignment — edge semantics vs numpy
ground truth (the driver contract value-matches each vs DuckDB at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from tesseract_recognize_ray.functions import relational as F
from tesseract_recognize_ray.functions.textstats import pack_sequences


def _pack_naive(docs: list[tuple[int, str]], L: int) -> pd.DataFrame:
    rows = []
    off = 0
    for did, text in sorted(docs):
        n = len(text.split())
        if n == 0:
            continue
        for w in range(off // L, (off + n - 1) // L + 1):
            rows.append(
                {
                    "window_id": w,
                    "doc_id": did,
                    "tok_start": max(w * L - off, 0),
                    "tok_end": min((w + 1) * L - off, n),
                }
            )
        off += n
    return pd.DataFrame(rows)


def test_pack_sequences_matches_naive_and_invariants(ray_session):
    rng = np.random.default_rng(7)
    docs = [
        (int(i), " ".join(f"t{j}" for j in range(rng.integers(0, 23))))
        for i in range(60)
    ]
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"])).repartition(5)
    out = (
        pack_sequences(ds, "doc_id", "text", seq_len=10)
        .to_pandas()
        .sort_values(["window_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = (
        _pack_naive(docs, 10).sort_values(["window_id", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype("int64"), want.astype("int64"), check_like=True
    )
    # invariants: every window except the last holds exactly seq_len tokens,
    # spans are non-empty, and the doc-spans tile each doc exactly once
    span = out["tok_end"] - out["tok_start"]
    assert (span > 0).all()
    per_win = out.groupby("window_id")[["tok_start"]].size()
    tok_per_win = out.groupby("window_id").apply(
        lambda g: int((g["tok_end"] - g["tok_start"]).sum()), include_groups=False
    )
    assert (tok_per_win.iloc[:-1] == 10).all()
    total_tokens = sum(len(t.split()) for _, t in docs)
    assert int(tok_per_win.sum()) == total_tokens
    assert per_win.index.max() == (total_tokens - 1) // 10


def test_pack_sequences_doc_spanning_many_windows(ray_session):
    # one huge doc must split across ceil(n/L) windows, flanked by small docs
    docs = [(1, "a b c"), (2, " ".join(["x"] * 25)), (3, "p q")]
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    out = pack_sequences(ds, "doc_id", "text", seq_len=10).to_pandas()
    want = _pack_naive(docs, 10)
    pd.testing.assert_frame_equal(
        out.sort_values(["window_id", "doc_id"]).reset_index(drop=True).astype("int64"),
        want.sort_values(["window_id", "doc_id"]).reset_index(drop=True).astype("int64"),
        check_like=True,
    )
    d2 = out[out["doc_id"] == 2].sort_values("window_id")
    # 25 tokens starting at global offset 3 span windows 0..2 with spans
    # 0-7 / 7-17 / 17-25 — the doc tiles exactly once across its windows
    assert len(d2) == 3
    assert d2["tok_start"].tolist() == [0, 7, 17]
    assert d2["tok_end"].tolist() == [7, 17, 25]


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    keys = np.arange(0, 20_000, 2, dtype=np.int64)  # evens present
    build = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(4)
    ref = F.bloom_build(build, "k", m_bits=1 << 18, k=5)
    probe_keys = np.arange(20_000, dtype=np.int64)  # evens + odds
    probe = rd.from_pandas(pd.DataFrame({"k": probe_keys})).repartition(3)
    kept = F.bloom_prune(probe, "k", ref, m_bits=1 << 18, k=5).to_pandas()["k"].to_numpy()
    present = set(keys.tolist())
    # zero false negatives: every build key that was probed survives
    assert present.issubset(set(kept.tolist()))
    # false-positive rate among absent keys stays well under 5%
    fp = len([x for x in kept if x % 2 == 1])
    assert fp / 10_000 < 0.05


def test_bloom_prune_then_exact_join_equals_plain_semi_join(ray_session):
    rng = np.random.default_rng(3)
    build_keys = rng.choice(5_000, size=800, replace=False).astype(np.int64)
    probe = pd.DataFrame(
        {"k": rng.integers(0, 5_000, size=30_000).astype(np.int64)}
    )
    build = rd.from_pandas(pd.DataFrame({"k": build_keys}))
    ref = F.bloom_build(build, "k", m_bits=1 << 16, k=5)
    pruned = F.bloom_prune(rd.from_pandas(probe).repartition(4), "k", ref, m_bits=1 << 16, k=5)
    out = F.broadcast_semi_join(pruned, build, "k", "k").to_pandas()["k"].to_numpy()
    want = probe[probe["k"].isin(build_keys)]["k"].to_numpy()
    assert sorted(out.tolist()) == sorted(want.tolist())


def test_split_assign_deterministic_and_complete(ray_session):
    import __ray_entry__ as entrymod

    d = np.arange(1, 5_000, dtype=np.int64)
    h = (d * 2654435761) % 4294967296 % 100
    frac_train = (h < 80).mean()
    # the multiplicative hash spreads ids near-uniformly
    assert 0.75 < frac_train < 0.85


def test_duplicate_token_spans_planted(ray_session):
    from tesseract_recognize_ray.functions.dedup import duplicate_token_spans

    # unique filler everywhere except a planted 7-token phrase shared by
    # docs 1 and 3, and a doc-internal repeat in doc 5
    phrase = "the quick brown fox jumps over dogs"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 5],
            "text": [
                f"u1a u1b u1c {phrase} u1d u1e",
                "v2a v2b v2c v2d v2e v2f v2g v2h",
                f"{phrase} w3a w3b w3c",
                f"x5a {phrase} x5b x5c {phrase}",
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    out = (
        duplicate_token_spans(ds, "doc_id", "text", k=5)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    # doc 2 has no duplicated window at all
    assert 2 not in set(out["doc_id"])
    # doc 1: phrase occupies tokens 3..10 -> windows 3,4,5 -> span [3, 10)
    d1 = out[out["doc_id"] == 1]
    assert d1[["span_start", "span_end", "n_dup_ngrams"]].values.tolist() == [[3, 10, 3]]
    # doc 3: phrase at 0..7 -> span [0, 7)
    d3 = out[out["doc_id"] == 3]
    assert d3[["span_start", "span_end", "n_dup_ngrams"]].values.tolist() == [[0, 7, 3]]
    # doc 5: phrase at 1..8 and 10..17; both occurrences duplicated (each
    # 5-gram occurs >=3 times corpus-wide); gap of 2 tokens does NOT merge
    d5 = out[out["doc_id"] == 5]
    assert d5[["span_start", "span_end"]].values.tolist() == [[1, 8], [10, 17]]


def test_duplicate_token_spans_adjacent_windows_merge(ray_session):
    from tesseract_recognize_ray.functions.dedup import duplicate_token_spans

    # two distinct duplicated 3-grams that ABUT in doc 1 (positions 0 and 3,
    # k=3: intervals [0,3] and [3,6] touch) must merge into one span [0,6)
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e f",
                "a b c q2x q2y",
                "q3x d e f q3y",
            ],
        }
    )
    ds = rd.from_pandas(docs)
    out = (
        duplicate_token_spans(ds, "doc_id", "text", k=3)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    assert d1[["span_start", "span_end", "n_dup_ngrams"]].values.tolist() == [[0, 6, 2]]


def test_grouping_sets_non_hierarchical(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], 200),
            "b": rng.integers(0, 3, 200),
            "c": rng.choice(["p", "q", "r"], 200),
            "v": rng.integers(0, 100, 200).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = F.grouping_sets_agg(
        ds, [["a", "b"], ["c"], []], [("v", "sum", "sv"), ("v", "count", "n")]
    ).to_pandas()
    parts = []
    for keys in ([["a", "b"], ["c"]]):
        g = df.groupby(keys, as_index=False).agg(sv=("v", "sum"), n=("v", "count"))
        parts.append(g)
    total = pd.DataFrame({"sv": [df["v"].sum()], "n": [len(df)]})
    want = pd.concat(parts + [total], ignore_index=True)
    for col in ["a", "b", "c"]:
        if col not in want:
            want[col] = None
    want = want.reindex(columns=["a", "b", "c", "sv", "n"])

    def norm(d):
        d = d.copy()
        for col in ["a", "c"]:
            d[col] = d[col].astype(object).where(d[col].notna(), "~null~").astype(str)
        d["b"] = d["b"].astype("float64").fillna(-1.0)
        return (
            d.sort_values(["a", "b", "c"]).reset_index(drop=True)[
                ["a", "b", "c", "sv", "n"]
            ].astype({"sv": "int64", "n": "int64"})
        )

    pd.testing.assert_frame_equal(norm(out), norm(want))


def test_count_min_sketch_never_undercounts_and_bounds_error(ray_session):
    from tesseract_recognize_ray.functions.sketches import (
        count_min_query,
        count_min_sketch,
    )

    rng = np.random.default_rng(5)
    # zipf-ish: a few heavy hitters + a long tail
    vals = np.concatenate(
        [np.repeat(np.arange(10), 500), rng.integers(100, 5_000, size=15_000)]
    )
    rng.shuffle(vals)
    df = pd.DataFrame({"k": vals.astype("int64")})
    ds = rd.from_pandas(df).repartition(6)
    sk = count_min_sketch(ds, "k", depth=4, width=2048)
    assert sk.shape == (4, 2048)
    assert int(sk[0].sum()) == len(df)  # every row lands once per depth row
    probe = pd.Series(np.arange(10, dtype="int64"))
    est = count_min_query(sk, probe)
    true = df["k"].value_counts()
    for v, e in zip(probe, est):
        t = int(true.get(v, 0))
        assert e >= t  # CM never undercounts
        assert e - t <= 2 * len(df) // 2048 + 50  # loose e*N/width-style bound


def _lpa_naive(pairs, rounds):
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in pairs:
        if u != v:
            a, b = min(u, v), max(u, v)
            adj[a].add(b)
            adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = Counter(labels[x] for x in adj[n])
            new[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        if new == labels:
            break
        labels = new
    return labels


def test_label_propagation_matches_naive_both_paths(ray_session):
    from tesseract_recognize_ray.functions.graph import label_propagation

    rng = np.random.default_rng(9)
    # two planted communities + random cross edges + dup/reversed edges
    pairs = []
    for base in (0, 50):
        for _ in range(220):
            u, v = rng.integers(base, base + 30, size=2)
            pairs.append((int(u), int(v)))
    for _ in range(6):
        pairs.append((int(rng.integers(0, 30)), int(rng.integers(50, 80))))
    pairs += [(v, u) for u, v in pairs[:20]]  # reversed dups
    df = pd.DataFrame(pairs, columns=["src", "dst"])
    df = df[df["src"] != df["dst"]]
    want = _lpa_naive(list(df.itertuples(index=False)), rounds=3)

    for gate in (4_000_000, 0):  # broadcast path, then forced spill path
        out = (
            label_propagation(
                rd.from_pandas(df).repartition(4),
                rounds=3,
                broadcast_max_edges=gate,
            )
            .to_pandas()
            .set_index("node")["community"]
            .to_dict()
        )
        assert out == want, f"gate={gate}"


def test_label_propagation_empty_edges_returns_empty_typed(ray_session):
    """An edge set that filters down to nothing (e.g. a min_count threshold
    killing every pair) must return an empty (node, community) result, not
    crash on np.concatenate([]) (ADVICE r02)."""
    from tesseract_recognize_ray.functions.graph import label_propagation

    empty = pd.DataFrame({"src": pd.Series([], dtype="int64"), "dst": pd.Series([], dtype="int64")})
    out = label_propagation(rd.from_pandas(empty), rounds=3)
    # Ray 2.49 to_pandas() drops columns on 0-row datasets; schema() keeps them
    assert out.count() == 0
    assert out.schema().names == ["node", "community"]


def test_sharded_min_index_canonical_keep_and_cross_filter(ray_session):
    from tesseract_recognize_ray.state.shard_index import (
        canonical_min_keep,
        filter_members,
    )

    rng = np.random.default_rng(13)
    # 40 keys, several rows each, ids shuffled across 6 partitions so the
    # min for a key is usually NOT in the block that offers first
    rows = []
    for k in range(40):
        for i in rng.permutation(rng.integers(1, 6)):
            rows.append((f"key{k}", int(k * 100 + i)))
    rng.shuffle(rows)
    df = pd.DataFrame(rows, columns=["k", "id"])
    ds = rd.from_pandas(df).repartition(6)
    kept, index = canonical_min_keep(ds, "k", "id", num_shards=4)
    got = kept.to_pandas().sort_values("k").reset_index(drop=True)
    want = (
        df.sort_values(["k", "id"]).drop_duplicates("k").sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert index.total() == 40

    # cross-pipeline reuse: filter a SECOND dataset against the built index
    probe = pd.DataFrame({"k": [f"key{i}" for i in range(35, 45)], "x": range(10)})
    pds2 = rd.from_pandas(probe).repartition(2)
    inside = filter_members(pds2, "k", index, keep_matches=True).to_pandas()
    outside = filter_members(pds2, "k", index, keep_matches=False).to_pandas()
    assert sorted(inside["k"]) == [f"key{i}" for i in range(35, 40)]
    assert sorted(outside["k"]) == [f"key{i}" for i in range(40, 45)]
    # dump() round-trips the whole map
    d = index.dump().to_pandas().sort_values("key").reset_index(drop=True)
    assert len(d) == 40 and (d["value"].to_numpy() % 100 == want.sort_values("k")["id"].to_numpy() % 100).all()


def test_sharded_min_index_nullable_int_keys_across_batches(ray_session):
    """A nullable Int64 key column whose nulls are concentrated in SOME
    batches must still route each key to ONE shard: the pandas seam coerces
    null-carrying batches to float64 (key 5 -> 5.0) while null-free batches
    stay int64, so a dtype-sensitive hash would split the same key across
    shards and elect two 'canonical' winners (ADVICE r02, shard_index)."""
    from tesseract_recognize_ray.state.shard_index import (
        ShardedMinIndex,
        canonical_min_keep,
        filter_members,
    )

    # batch 1 carries the nulls (float64 after a pandas seam), batch 2 is
    # null-free (int64); keys 5 and 7 appear in BOTH
    t1 = pa.table(
        {"k": pa.array([5, None, 7, None], pa.int64()), "id": pa.array([50, 90, 71, 91], pa.int64())}
    )
    t2 = pa.table({"k": pa.array([5, 7, 9], pa.int64()), "id": pa.array([51, 70, 92], pa.int64())})
    ds = rd.from_arrow([t1, t2])
    kept, index = canonical_min_keep(ds, "k", "id", num_shards=4)
    got = kept.to_pandas().sort_values("id").reset_index(drop=True)
    # one winner per key incl. the NULL group: 5->50, 7->70, 9->92, NULL->90
    assert got["id"].tolist() == [50, 70, 90, 92]
    assert index.total() == 4

    # probing with a float-coerced pandas series (5.0/7.0/NaN) must hit the
    # same shards the int offers landed on
    probe = pd.Series([5, 7, None, 11], dtype="float64")
    assert index.contains(probe).tolist() == [True, True, True, False]
    assert index.get_min(pd.Series([5.0, 7.0])).tolist() == [50, 70]

    # and a second dataset with a NULL-free int column filters correctly
    pds2 = rd.from_arrow(pa.table({"k": pa.array([5, 11], pa.int64())}))
    inside = filter_members(pds2, "k", index, keep_matches=True).to_pandas()
    assert inside["k"].tolist() == [5]

    # persistence round-trip keeps int key identity (no str()/float drift)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "idx.parquet")
        index.save(p)
        idx2 = ShardedMinIndex.load(p, num_shards=3)
        assert idx2.get_min(pd.Series([5, 7], dtype="Int64")).tolist() == [50, 70]
        assert idx2.contains(pd.Series([None], dtype="Int64")).tolist() == [True]


def _dominates(q, p) -> bool:
    return all(a <= b for a, b in zip(q, p)) and any(a < b for a, b in zip(q, p))


def _frontier_naive(vals: np.ndarray) -> np.ndarray:
    return np.array(
        [not any(_dominates(q, p) for q in vals if q is not p) for p in vals]
    )


def test_frontier_mask_matches_brute_force():
    from tesseract_recognize_ray.functions.relational import _frontier_mask

    rng = np.random.default_rng(7)
    for k in (2, 3, 4):
        for n in (1, 2, 17, 200):
            # small integer grid forces ties, duplicates and equal-x groups
            vals = rng.integers(0, 6, size=(n, k)).astype(np.float64)
            got = _frontier_mask(vals)
            want = np.array(
                [
                    not any(
                        _dominates(vals[j], vals[i]) for j in range(n) if j != i
                    )
                    for i in range(n)
                ]
            )
            assert (got == want).all(), (k, n, np.flatnonzero(got != want))


def test_frontier_mask_k2_int64_exact_beyond_2pow53():
    """The k==2 sweep's prefix-min staging must stay int64: two distinct
    b values beyond 2^53 that collide in float64 must not cause a false
    drop on the b dimension (ADVICE r02 — the prior test only exercised
    dimension a)."""
    from tesseract_recognize_ray.functions.relational import _frontier_mask

    big = 2**53
    # group a=0 has b=big (frontier); group a=1 has b=big+1 — in float64
    # big and big+1 are EQUAL, so a float `before` would see before==sb and
    # keep the dominated-free row, but big+2/big+3 style collisions flip
    # the other way; cover both directions explicitly
    vals = np.array(
        [
            [0, big + 1],  # frontier (smallest a)
            [1, big],  # frontier: b strictly smaller than group 0's min
            [2, big],  # dominated by row 1 (a larger, b equal)
            [3, big + 1],  # dominated by rows 0/1
        ],
        dtype=np.int64,
    )
    got = _frontier_mask(vals)
    assert got.tolist() == [True, True, False, False]
    # and the float64-collision direction: before=big+1 vs sb=big must
    # still register as strictly greater (it wouldn't in float64)
    vals2 = np.array([[0, big + 1], [1, big]], dtype=np.int64)
    assert _frontier_mask(vals2).tolist() == [True, True]
    # brute-force cross-check on a random >2^53 grid
    rng = np.random.default_rng(5)
    v = rng.integers(0, 4, size=(60, 2)).astype(np.int64) + big
    assert (_frontier_mask(v) == _frontier_naive(v)).all()


def test_skyline_distributed_matches_naive_and_keeps_duplicates(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(500),
            "a": rng.integers(0, 40, 500),
            "b": rng.integers(0, 40, 500),
        }
    )
    # plant an exact duplicate of a guaranteed-frontier point: both copies
    # must survive (equal points never dominate each other)
    df.loc[498, ["a", "b"]] = [0, 39]
    df.loc[499, ["a", "b"]] = [0, 39]
    ds = rd.from_pandas(df).repartition(7)
    got = (
        F.skyline(ds, ["a", "b"], ["min", "max"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    vals = np.column_stack([df["a"], -df["b"]]).astype(np.float64)
    want = df[_frontier_naive(vals)].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert {498, 499} <= set(got["id"])


def test_grouped_string_agg_ordered(ray_session):
    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n),
            "v": [f"w{i}" for i in range(n)],
            "o": rng.permutation(n),
        }
    )
    ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(5)
    got = (
        F.grouped_string_agg(ds, "k", "v", sep=",", order_cols=["o"], out_col="s")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["k", "o"])
        .groupby("k")["v"]
        .agg(",".join)
        .rename("s")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_inner_and_left_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 400),
            "k2": rng.integers(0, 3, 400),
            "lv": np.arange(400, dtype=np.int64) + 2**53,  # beyond float53 mantissa
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 60, 300),
            "rk2": rng.integers(0, 3, 300),
            "lv": rng.integers(0, 9, 300),  # collides with a left name -> suffixed
            "name": [f"n{i}" for i in range(300)],
        }
    )
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    for how in ("inner", "left"):
        got = (
            F.bucket_join(lds, rds, on=("k", "k2"), right_on=("rk", "rk2"), how=how)
            .to_pandas()
            .sort_values(["k", "k2", "lv", "lv_r", "name"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(
                right.rename(columns={"rk": "k", "rk2": "k2", "lv": "lv_r"}),
                on=["k", "k2"],
                how=how,
            )
            .sort_values(["k", "k2", "lv", "lv_r", "name"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # int64 payload survives exactly (no float round-trip)
        assert got["lv"].dtype == np.int64 and (got["lv"] >= 2**53).all()


def _sssp_naive(edges: list[tuple[int, int, int]], seeds: list[int], rounds: int) -> dict:
    INF = float("inf")
    sym = edges + [(v, u, w) for u, v, w in edges]
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in sym:
            if u in dist and dist[u] + w < nxt.get(v, INF):
                nxt[v] = dist[u] + w
        dist = nxt
    return dist


def test_sssp_rounds_matches_naive_both_paths(ray_session):
    from tesseract_recognize_ray.functions.graph import sssp_rounds

    rng = np.random.default_rng(21)
    n = 60
    edges = [
        (int(u), int(v), int(w))
        for u, v, w in zip(
            rng.integers(0, n, 150), rng.integers(0, n, 150), rng.integers(1, 50, 150)
        )
        if u != v
    ]
    eds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst", "w"])).repartition(4)
    seeds = [0, 7, 13]
    sds = rd.from_pandas(pd.DataFrame({"s": seeds}))
    want = _sssp_naive(edges, seeds, rounds=3)
    for gate in (2_000_000, 1):  # broadcast path, then forced distributed spill
        got = (
            sssp_rounds(eds, sds, rounds=3, broadcast_max_nodes=gate)
            .to_pandas()
            .set_index("node")["dist"]
            .to_dict()
        )
        assert got == want, f"gate={gate}"


def test_load_scan_filter_matches_post_filter(ray_session):
    import pyarrow.compute as pc

    sf = "/root/testdata/sf0.001"
    pushed = F.load(sf, "orders", columns=["o_orderkey"], filter=pc.field("o_totalprice") > 100000)
    plain = F.load(sf, "orders", columns=["o_orderkey", "o_totalprice"]).filter(
        expr="o_totalprice > 100000"
    )
    a = sorted(pushed.to_pandas()["o_orderkey"])
    b = sorted(plain.to_pandas()["o_orderkey"])
    assert a == b and len(a) > 0


def test_bucket_join_null_keys_route_consistently_and_never_match(ray_session):
    # one left block carries a null key (int64 -> float64 pandas coercion
    # trap): the non-null key must still meet its right row, and null keys
    # must match NOTHING (SQL equi-join), not each other
    left = pd.DataFrame({"k": pd.array([5, None, 9], dtype="Int64"), "lv": [1, 2, 3]})
    right = pd.DataFrame({"rk": pd.array([5, None], dtype="Int64"), "w": [10, 20]})
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(2)
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    inner = (
        F.bucket_join(lds, rds, on=("k",), right_on=("rk",), how="inner")
        .to_pandas()
        .sort_values("lv")
    )
    assert inner["lv"].tolist() == [1] and inner["w"].tolist() == [10]
    left_j = (
        F.bucket_join(lds, rds, on=("k",), right_on=("rk",), how="left")
        .to_pandas()
        .sort_values("lv")
    )
    assert left_j["lv"].tolist() == [1, 2, 3]
    assert left_j["w"].fillna(-1).tolist() == [10, -1, -1]


def test_grouped_string_agg_null_semantics(ray_session):
    df = pd.DataFrame(
        {"k": ["a", "a", "b", None], "v": ["x", None, None, "z"]}
    )
    out = (
        F.grouped_string_agg(rd.from_pandas(df).repartition(2), "k", "v", out_col="s")
        .to_pandas()
    )
    got = {k: v for k, v in zip(out["k"], out["s"])}
    # group a: null value skipped; group b survives with NULL; null key kept
    assert got["a"] == "x"
    assert pd.isna(got["b"])
    nullkey = out[out["k"].isna()]["s"].tolist()
    assert nullkey == ["z"]


def test_skyline_exact_beyond_float53(ray_session):
    base = 2**53
    df = pd.DataFrame(
        {
            "id": [0, 1],
            # row 1 is strictly dominated, but the two a-values collide in
            # float64 — int64 path must still see the difference
            "a": np.array([base, base + 1], dtype=np.int64),
            "b": np.array([5, 5], dtype=np.int64),
        }
    )
    out = F.skyline(rd.from_pandas(df), ["a", "b"]).to_pandas()
    assert out["id"].tolist() == [0]


def test_sssp_empty_seed_set(ray_session):
    from tesseract_recognize_ray.functions.graph import sssp_rounds

    eds = rd.from_pandas(pd.DataFrame({"src": [1, 2], "dst": [2, 3], "w": [1, 1]}))
    seeds = rd.from_pandas(pd.DataFrame({"s": pd.Series([], dtype="int64")}))
    out = sssp_rounds(eds, seeds, rounds=2).to_pandas()
    # Ray 2.49 drops the schema of any all-empty dataset (known pitfall),
    # so only emptiness — not column names — is assertable here
    assert len(out) == 0


def test_shard_index_save_load_roundtrip(ray_session, tmp_path):
    from tesseract_recognize_ray.state.shard_index import (
        ShardedMinIndex,
        canonical_min_keep,
        filter_members,
    )

    df = pd.DataFrame({"k": ["a", "a", "b", "c"], "id": [5, 3, 7, 1]})
    _, index = canonical_min_keep(rd.from_pandas(df), "k", "id", num_shards=3)
    p = str(tmp_path / "idx.parquet")
    assert index.save(p) == 3
    # restore into a DIFFERENT shard count: routing must still resolve
    idx2 = ShardedMinIndex.load(p, num_shards=5)
    assert idx2.total() == 3
    probe = rd.from_pandas(pd.DataFrame({"k": ["a", "b", "x"]}))
    inside = filter_members(probe, "k", idx2, keep_matches=True).to_pandas()
    assert sorted(inside["k"]) == ["a", "b"]
    assert idx2.get_min(pd.Series(["a", "b", "c"])).tolist() == [3, 7, 1]


def test_grouped_mad_matches_numpy_and_ignores_nulls(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {"k": rng.integers(0, 5, 200), "v": rng.integers(-50, 50, 200).astype(float)}
    )
    df.loc[::7, "v"] = np.nan  # SQL aggregates ignore NULLs
    got = (
        F.grouped_mad(rd.from_pandas(df).repartition(4), "k", "v", out_col="m")
        .to_pandas()
        .set_index("k")["m"]
        .to_dict()
    )
    for k, sub in df.groupby("k"):
        v = sub["v"].dropna().to_numpy()
        assert got[k] == float(np.median(np.abs(v - np.median(v)))), k


def test_shard_index_int_keys_save_load(ray_session, tmp_path):
    from tesseract_recognize_ray.state.shard_index import (
        ShardedMinIndex,
        canonical_min_keep,
    )

    df = pd.DataFrame({"k": [10, 10, 20], "id": [4, 2, 9]})
    _, index = canonical_min_keep(rd.from_pandas(df), "k", "id", num_shards=4)
    p = str(tmp_path / "int_idx.parquet")
    assert index.save(p) == 2  # integer key domain persists without a crash
    idx2 = ShardedMinIndex.load(p, num_shards=2)
    assert idx2.get_min(pd.Series([10, 20])).tolist() == [2, 9]


def test_hll_grouped_distinct_error_bound_and_partition_invariance(ray_session):
    from tesseract_recognize_ray.functions.sketches import hll_grouped_distinct

    rng = np.random.default_rng(17)
    frames = []
    truth = {}
    for g, n in (("a", 5000), ("b", 700), ("c", 37)):
        vals = rng.choice(10**9, size=n, replace=False)
        truth[g] = n
        frames.append(pd.DataFrame({"g": g, "v": np.repeat(vals, 2)}))  # dups too
    df = pd.concat(frames).sample(frac=1, random_state=0).reset_index(drop=True)
    ests = {}
    for parts in (3, 11):  # estimate must not depend on partitioning
        out = (
            hll_grouped_distinct(rd.from_pandas(df).repartition(parts), "g", "v", p=12)
            .to_pandas()
            .set_index("g")["approx_distinct"]
            .to_dict()
        )
        for g, n in truth.items():
            assert abs(out[g] - n) / n < 0.08, (g, out[g], n)  # ~5 sigma at p=12
        ests[parts] = out
    assert ests[3] == ests[11]


def test_keep_latest_composite_key_ascending(ray_session):
    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 10, 300),
            "d": rng.integers(0, 4, 300),
            "t": rng.permutation(300),
            "id": np.arange(300),
        }
    )
    got = (
        F.keep_latest(rd.from_pandas(df).repartition(5), ["u", "d"], ["t", "id"], ascending=True)
        .to_pandas()
        .sort_values(["u", "d"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["t", "id"])
        .drop_duplicates(["u", "d"], keep="first")
        .sort_values(["u", "d"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_keep_latest_nullable_int_key_no_duplicate_winners(ray_session):
    """Nullable-int key split across null-carrying and null-free blocks must
    elect exactly ONE winner per key (the pandas seam used to float64-coerce
    the key in null-carrying blocks and split it across buckets — ADVICE r02)."""
    t1 = pa.table(
        {
            "k": pa.array([5, None, 5], pa.int64()),
            "t": pa.array([10, 20, 30], pa.int64()),
            "v": pa.array(["a", "b", None], pa.string()),
        }
    )
    t2 = pa.table(
        {
            "k": pa.array([5, 7], pa.int64()),
            "t": pa.array([40, 50], pa.int64()),
            "v": pa.array(["d", "e"], pa.string()),
        }
    )
    out = (
        F.keep_latest(rd.from_arrow([t1, t2]), "k", ["t"])
        .to_pandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    # winners: NULL->t=20, 5->t=40 (ONE row, not one per dtype), 7->t=50
    assert out["t"].tolist() == [20, 40, 50]
    # a winning row with a NULL value column must be kept as-is, not skipped
    out2 = F.keep_latest(rd.from_arrow([t1]), "k", ["t"]).to_pandas()
    assert out2.loc[out2["t"] == 30, "v"].isna().all()


def test_window_rolling_extremum_matches_pandas(ray_session):
    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, 400),
            "t": rng.permutation(400),
            "id": np.arange(400),
            "v": rng.integers(-50, 50, 400).astype("int64"),
        }
    )
    for kind in ("min", "max"):
        got = (
            F.window_rolling_extremum(
                rd.from_pandas(df).repartition(5), "k", ["t", "id"], "v", 3, kind=kind, out_col="rm"
            )
            .to_pandas()
            .sort_values(["k", "t", "id"])
            .reset_index(drop=True)
        )
        s = df.sort_values(["k", "t", "id"])
        r = s.groupby("k", sort=False)["v"].rolling(3, min_periods=1)
        want = (r.min() if kind == "min" else r.max()).to_numpy().astype("int64")
        want_df = s.reset_index(drop=True).assign(rm=want).sort_values(["k", "t", "id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want_df, check_dtype=False)


def test_snm_dup_pairs_planted_neighbors(ray_session):
    """Sorted-neighborhood candidates: two near-identical texts are adjacent
    in sort order and must pair with byte-set jaccard; distant texts must
    not pair with anything above threshold."""
    from tesseract_recognize_ray.functions.dedup import snm_dup_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(6)],
            "text": [
                "the quick brown fox jumps",
                "the quick brown fox jumped",  # near-dup of row 0, sorts adjacent
                "zzzz 000",  # disjoint charset tail
                "mnopq rstuv",
                "",  # dropped (DuckDB jaccard errors on empty)
                "the quick brown fox jumps!",  # also near row 0/1
            ],
        }
    )
    out = (
        snm_dup_pairs(rd.from_pandas(docs).repartition(3), "doc_id", "text", window=3, threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert ("d0", "d1") in pairs or ("d1", "d0") in pairs
    assert not any("d4" in p for pair in pairs for p in pair)
    # jaccard value matches the byte-set definition for a known pair
    def bjac(a, b):
        sa, sb = set(a.encode()), set(b.encode())
        return round(len(sa & sb) / len(sa | sb), 6)

    for _, row in out.iterrows():
        ta = docs.set_index("doc_id")["text"][row["id_a"]]
        tb = docs.set_index("doc_id")["text"][row["id_b"]]
        assert abs(row["jac"] - bjac(ta, tb)) < 1e-9
        assert row["jac"] >= 0.5
    # id_a must be the EARLIER row in (text, id) sort order
    order = docs[docs["text"] != ""].sort_values(["text", "doc_id"])["doc_id"].tolist()
    pos = {d: i for i, d in enumerate(order)}
    assert all(pos[a] < pos[b] and pos[b] - pos[a] <= 2 for a, b in pairs)
