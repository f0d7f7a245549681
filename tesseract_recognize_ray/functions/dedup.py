"""Deduplication operators over a documents table (id + text), Ray-Data-first.

Scale shapes (ray_guide 'Aggregation at scale' / MinHash-LSH pattern;
Broder 1997 resemblance sketches, Charikar 2002 simhash — public literature):

  exact_dedup     — content hash in a vectorized map_batches, then ONE
                    groupby(hash) keeping the min id; the shuffle moves
                    (hash, id) pairs only, never the text.
  minhash_lsh     — shingle -> minhash signature per batch (numpy universal
                    hashing), explode to (band, band_hash, id) rows, groupby
                    the bucket, emit candidate pairs per bucket, dedupe pairs,
                    optionally verify true Jaccard. Only signatures shuffle.
  simhash         — 64-bit sign-sum fingerprint per doc; near-dups = equal
                    fingerprints (or banded prefixes for hamming<=k).
  embedding_near_dup — random-hyperplane LSH buckets over an embedding
                    column, brute-force cosine inside buckets only.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _text_hash64(texts: list[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in texts],
        dtype=np.uint64,
    )


def _bucket_pairs_fn(group_cols, max_bucket: int, id_col: str = "__id"):
    """Shared bucket->candidate-pair emitter for the blocking family
    (MinHash bands, prefix-filter shingles, hamming bands): per bucket,
    sorted ids -> id_a < id_b upper-triangle pairs, buckets beyond
    max_bucket truncated with an explicit flag (no-silent-caps rule)."""

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _key, grp in g.groupby(group_cols, sort=False):
            if len(grp) < 2:
                continue
            truncated = len(grp) > max_bucket
            ids = np.sort(grp[id_col].to_numpy(), kind="mergesort")[:max_bucket]
            ii, jj = np.triu_indices(len(ids), k=1)
            frames.append(
                pd.DataFrame(
                    {"id_a": ids[ii], "id_b": ids[jj],
                     "bucket_truncated": np.full(len(ii), truncated)}
                )
            )
        if not frames:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="object"), "id_b": pd.Series(dtype="object"),
                 "bucket_truncated": pd.Series(dtype="bool")}
            )
        return pd.concat(frames, ignore_index=True)

    return group_pairs


def _pair_participant_ids(pairs: Dataset) -> set:
    """All ids appearing in a (id_a, id_b) pair Dataset — the bounded set a
    verify stage prunes its lookups to (the pairs ARE the operator output)."""
    ids: set = set()
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids.update(b.column("id_a").to_pylist())
        ids.update(b.column("id_b").to_pylist())
    return ids


def exact_dedup(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """Keep the smallest id per distinct text. Returns a Dataset with the
    surviving ids (column name = id_col). Equivalent SQL:
    SELECT min(id) FROM t GROUP BY text."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = _text_hash64(texts)
        return pa.table({id_col: batch.column(id_col), "__h": pa.array(h.astype(np.int64))})

    from .relational import grouped_agg

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    kept = grouped_agg(hashed, ["__h"], [(id_col, "min", id_col)])
    return kept.drop_columns(["__h"])


class _MinHasher:
    """Stateful shingler+hasher for map_batches actor pools: permutation
    coefficients generated once per actor (seeded — deterministic across the
    pool), reused for every batch."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, char_level: bool = True, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.char_level = char_level

    def shingle_hashes(self, text: str) -> np.ndarray:
        if self.char_level:
            # vectorized k-gram polynomial rolling hash over the utf-8 bytes
            # (mod 2^64 wraparound): no per-shingle python loop
            t = text if len(text) >= self.k else text + " " * (self.k - len(text))
            b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
            n = len(b) - self.k + 1
            if n <= 0:
                b = np.pad(b, (0, self.k - len(b)), constant_values=32)
                n = 1
            B = np.uint64(1099511628211)  # FNV prime as the base
            h = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(self.k):
                    h = h * B + b[j : j + n]
            return np.unique(h)
        toks = text.split()
        if len(toks) < self.k:
            sh = {" ".join(toks)} if toks else {""}
        else:
            sh = {" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)}
        return np.fromiter((zlib.crc32(s.encode()) for s in sh), dtype=np.uint64, count=len(sh))

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        if h.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (P, S) universal hash, min over shingles
        v = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["__text"].tolist()])
        out = pd.DataFrame({"__id": batch["__id"].to_numpy()})
        out["__sig"] = list(sigs.astype(np.int64))
        return out


def minhash_signatures(
    ds: Dataset, id_col: str, text_col: str, *, num_perm: int = 64, shingle_k: int = 5, concurrency=None
) -> Dataset:
    """(id, minhash signature) per doc. The permutation coefficients are
    tiny and seed-deterministic, so by default the hasher instance ships in
    the task closure (stateless task map — no actor-pool spawn latency);
    pass concurrency=(min,max) to host it on an actor pool instead when a
    long-running corpus-scale job amortizes the spawn."""
    renamed = ds.map_batches(
        lambda b: pa.table({"__id": b.column(id_col), "__text": b.column(text_col)}),
        batch_format="pyarrow",
    )
    if concurrency is not None:
        return renamed.map_batches(
            _MinHasher,
            fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
            batch_format="pandas",
            concurrency=concurrency,
            num_cpus=1,
        )
    return renamed.map_batches(
        _MinHasher(num_perm=num_perm, shingle_k=shingle_k), batch_format="pandas"
    )


def _explode_band_rows(sigs: Dataset, *, num_perm: int, bands: int, lsh_groups: int) -> Dataset:
    """(id, sig) rows -> (id, band, bh, group) — one row per (id, band).
    Band hashes are a vectorized polynomial hash over the band's
    components (equal chunks hash equal; a collision only adds a false
    candidate, which the est_jaccard filter removes). The group key is the
    composite hash(band, bh) % lsh_groups so no group ever splits an LSH
    bucket and none holds 1/bands of the corpus."""
    if num_perm % bands:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows_per_band = num_perm // bands
    _FNV = np.uint64(1099511628211)

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {
                    "__id": pd.Series(dtype="object"),
                    "band": pd.Series(dtype="int32"),
                    "bh": pd.Series(dtype="int64"),
                    "__g": pd.Series(dtype="int32"),
                }
            )
        ids = batch["__id"].to_numpy()
        sig = np.stack([np.asarray(s, dtype=np.int64) for s in batch["__sig"].tolist()]).view(np.uint64)
        cube = sig.reshape(n, bands, rows_per_band)
        bh = np.zeros((n, bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(rows_per_band):
                bh = bh * _FNV + cube[:, :, j]
            band_ids = np.tile(np.arange(bands, dtype=np.uint64), n)
            grp = (band_ids * np.uint64(0x9E3779B97F4A7C15) + bh.reshape(-1)) % np.uint64(lsh_groups)
        return pd.DataFrame(
            {
                "__id": np.repeat(ids, bands),
                "band": band_ids.astype(np.int32),
                "bh": bh.reshape(-1).view(np.int64),
                "__g": grp.astype(np.int32),
            }
        )

    return sigs.map_batches(explode_bands, batch_format="pandas")


def minhash_lsh_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket: int = 64,
    min_est: float = 0.0,
    lsh_groups: int = 256,
    concurrency=None,
) -> Dataset:
    """Candidate near-duplicate pairs (id_a < id_b, est_jaccard,
    bucket_truncated) via banded MinHash-LSH. est_jaccard = fraction of
    agreeing signature components. Buckets larger than max_bucket are
    truncated and every surviving pair from such a bucket carries
    bucket_truncated=True — never silently (hot-bucket skew guard; the
    brief's no-silent-caps rule). min_est drops candidates whose signature
    agreement is below the LSH operating point BEFORE the pair dedupe
    shuffle — on near-duplicate-rich corpora the raw candidate set is
    ~bands x larger than the unique pairs, and weak candidates are false
    positives by the banding scheme's own tuning.

    Scale shape: the shuffle key is hash(band, band_hash) % lsh_groups, NOT
    the band id — grouping on the band alone puts 1/bands of ALL signatures
    in one group (unbounded at corpus scale); with the composite key each of
    the lsh_groups groups holds ~1/lsh_groups of the banded rows, and a
    group never splits an LSH bucket (same (band, bh) -> same group). The
    band exchange ships (id, band, bh, group) ONLY — ~24 bytes/row, never
    the signature (which would multiply the payload x bands; VERDICT r02
    #4): est_jaccard is a pure function of the two full signatures, so it is
    attached AFTER pair dedupe from a signature lookup pruned to pair
    participants (driver memory is O(|candidate pairs|), which the caller
    materializes as output anyway)."""
    if num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}); the "
            "banding scheme uses every signature component exactly once"
        )
    # materialize: consumed by the banding pass AND the est-attach lookup
    # (no lineage cache in Ray); pinned payload is (id, 8*num_perm bytes)
    sigs = minhash_signatures(
        ds, id_col, text_col, num_perm=num_perm, shingle_k=shingle_k, concurrency=concurrency
    ).materialize()
    banded = _explode_band_rows(sigs, num_perm=num_perm, bands=bands, lsh_groups=lsh_groups)

    group_pairs = _bucket_pairs_fn(["band", "bh"], max_bucket)

    raw_pairs = banded.groupby("__g").map_groups(group_pairs, batch_format="pandas")
    # a pair can surface from several bands -> dedupe; the truncation flag
    # survives if ANY contributing bucket was truncated
    from .relational import _key_filter, grouped_agg

    pairs = grouped_agg(
        raw_pairs,
        ["id_a", "id_b"],
        [("bucket_truncated", "max", "bucket_truncated")],
    ).materialize()

    # est attach: prune the signature table to pair participants (one is_in
    # scan, no shuffle), pull the pruned lookup to the driver, broadcast it
    # once. est_jaccard is deterministic per (sig_a, sig_b) regardless of
    # which bucket surfaced the pair, so post-dedupe attach is exactly
    # equivalent to the old per-bucket computation.
    part_ids = _pair_participant_ids(pairs)
    sig_map: dict = {}
    if part_ids:
        flt = _key_filter(sigs, "__id", ray.put(pa.array(list(part_ids))), keep_matches=True)
        for b in flt.iter_batches(batch_size=65536, batch_format="pandas"):
            for i, s in zip(b["__id"].tolist(), b["__sig"].tolist()):
                sig_map[i] = np.asarray(s, dtype=np.int64).tobytes()
    map_ref = ray.put(sig_map)

    def attach_est(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch = batch.copy()
            batch["est_jaccard"] = pd.Series(dtype="float64")
            return batch[["id_a", "id_b", "est_jaccard", "bucket_truncated"]]
        m = ray.get(map_ref)
        sa = np.stack([np.frombuffer(m[i], dtype=np.int64) for i in batch["id_a"].tolist()])
        sb = np.stack([np.frombuffer(m[i], dtype=np.int64) for i in batch["id_b"].tolist()])
        est = (sa == sb).mean(axis=1)
        out = batch.copy()
        out["est_jaccard"] = est
        if min_est > 0.0:
            out = out[out["est_jaccard"].to_numpy() >= min_est]
        return out[["id_a", "id_b", "est_jaccard", "bucket_truncated"]]

    return pairs.map_batches(attach_est, batch_format="pandas")


def verify_jaccard_pairs(
    pairs: Dataset, ds: Dataset, id_col: str, text_col: str, *, shingle_k: int = 5, threshold: float = 0.0
) -> Dataset:
    """Exact n-gram Jaccard for candidate pairs; texts broadcast once
    (valid per-shard where the doc subset is bounded; at full scale use two
    hash_joins against the docs table instead)."""
    texts: dict = {}
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        texts.update(zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()))
    ref = ray.put(texts)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(ref)

        def jac(a, b):
            sa = {a[i : i + shingle_k] for i in range(max(1, len(a) - shingle_k + 1))}
            sb = {b[i : i + shingle_k] for i in range(max(1, len(b) - shingle_k + 1))}
            u = len(sa | sb)
            return len(sa & sb) / u if u else 1.0

        batch = batch.copy()
        batch["jaccard"] = [
            jac(t.get(x, ""), t.get(y, "")) for x, y in zip(batch["id_a"], batch["id_b"])
        ]
        return batch[batch["jaccard"] >= threshold]

    return pairs.map_batches(fn, batch_format="pandas")


def _pa_type_of(t) -> pa.DataType:
    """Arrow type from a Ray schema entry (Arrow type or numpy dtype)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return pa.string()


def verify_jaccard_pairs_joined(
    pairs: Dataset,
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int = 5,
    threshold: float = 0.0,
    num_partitions: int = 8,
) -> Dataset:
    """Scale path of verify_jaccard_pairs: candidate pairs are hash-joined
    against the docs table twice (id_a side, id_b side) so NO text set is
    ever materialized on one node — the right shape when the doc corpus is
    unbounded. Same output contract: (id_a, id_b, jaccard >= threshold).
    Joins run through relational.bucket_join, not Ray's acero Dataset.join:
    the sparse pairs side used to hit join.py:118's zero-column
    empty-partition crash on small multi-block corpora."""
    from .relational import bucket_join

    def rename(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({f"__{side}_id": b.column(id_col), f"__{side}_text": b.column(text_col)})

        return fn

    a_side = ds.map_batches(rename("a"), batch_format="pyarrow")
    b_side = ds.map_batches(rename("b"), batch_format="pyarrow")
    # explicit schemas: the chained first-join output is lazy, and letting
    # bucket_join infer a schema from it yields null types on an
    # empty-first-block plan (cast int64 -> null crash in pad_right)
    dsch = ds.schema()
    id_type = _pa_type_of(dict(zip(dsch.names, dsch.types))[id_col])
    psch = pairs.schema()
    pairs_sch = pa.schema(
        [pa.field(n, _pa_type_of(t)) for n, t in zip(psch.names, psch.types)]
    )
    a_sch = pa.schema([pa.field("__a_id", id_type), pa.field("__a_text", pa.string())])
    b_sch = pa.schema([pa.field("__b_id", id_type), pa.field("__b_text", pa.string())])
    j = bucket_join(
        pairs, a_side, ("id_a",), ("__a_id",), left_schema=pairs_sch, right_schema=a_sch
    )
    j_sch = pa.schema(list(pairs_sch) + [pa.field("__a_text", pa.string())])
    j = bucket_join(j, b_side, ("id_b",), ("__b_id",), left_schema=j_sch, right_schema=b_sch)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        def jac(a, b):
            sa = {a[i : i + shingle_k] for i in range(max(1, len(a) - shingle_k + 1))}
            sb = {b[i : i + shingle_k] for i in range(max(1, len(b) - shingle_k + 1))}
            u = len(sa | sb)
            return len(sa & sb) / u if u else 1.0

        batch = batch.copy()
        batch["jaccard"] = [jac(x, y) for x, y in zip(batch["__a_text"], batch["__b_text"])]
        batch = batch[batch["jaccard"] >= threshold]
        return batch.drop(columns=[c for c in batch.columns if c.startswith("__")])

    return j.map_batches(score, batch_format="pandas")


def levenshtein(a: str, b: str) -> int:
    """Unit-cost edit distance, numpy row-DP: the sequential insert cascade
    cur[j] = min(m[j-1], cur[j-1]+1) is closed-form as a prefix-min of
    (candidate - j) plus j, so each DP row is O(1) numpy kernels instead of
    a per-cell Python loop. Computed over UTF-8 BYTES (not codepoints) to
    match DuckDB's levenshtein() bit-exactly."""
    if a == b:
        return 0
    A = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    B = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(A) == 0:
        return len(B)
    if len(B) == 0:
        return len(A)
    lb = len(B)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(A, 1):
        sub = prev[:-1] + (B != ca)
        m = np.minimum(prev[1:] + 1, sub)
        h = np.concatenate(([i], m)) - idx
        prev = np.minimum.accumulate(h) + idx
    return int(prev[-1])


def edit_distance_pairs(
    pairs: Dataset,
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 8,
) -> Dataset:
    """Pairwise edit-distance verify: candidate (src, dst) pairs hash-joined
    against the docs table twice (no text broadcast), then unit-cost
    levenshtein per pair (numpy row-DP). Returns (id_a, id_b, edit_dist)."""

    def rename(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {f"__{side}_id": b.column(id_col), f"__{side}_text": b.column(text_col)}
            )

        return fn

    a_side = ds.map_batches(rename("a"), batch_format="pyarrow")
    b_side = ds.map_batches(rename("b"), batch_format="pyarrow")
    j = pairs.join(
        a_side, join_type="inner", num_partitions=num_partitions, on=(src,), right_on=("__a_id",)
    )
    j = j.join(
        b_side, join_type="inner", num_partitions=num_partitions, on=(dst,), right_on=("__b_id",)
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        d = [levenshtein(x, y) for x, y in zip(batch["__a_text"], batch["__b_text"])]
        return pd.DataFrame(
            {
                "id_a": batch[src].astype("int64").to_numpy(),
                "id_b": batch[dst].astype("int64").to_numpy(),
                "edit_dist": pd.Series(d, dtype="int64").to_numpy(),
            }
        )

    return j.map_batches(score, batch_format="pandas")


def near_dup_dedup(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    min_est: float = 0.5,
    keep: str = "min_id",
) -> Dataset:
    """End-to-end near-duplicate REMOVAL (the RefinedWeb/CCNet chain):
    MinHash-LSH candidates -> exact char-shingle Jaccard verify (two hash
    joins, no text broadcast) -> connected components over verified pairs
    (hash-to-min, functions/graph.py) -> keep ONE doc per duplicate
    cluster. keep="min_id" (default) keeps the smallest id; keep="longest"
    keeps the doc with the most whitespace tokens (ties to the smallest
    id) — the curation-grade rule that preserves the most complete copy.
    Returns the surviving rows of `ds` (all columns); docs in no cluster
    pass through untouched.

    Scale notes: only signatures and (id, id) pairs move through shuffles;
    the drop set is |duplicates| ids — broadcast here, swap in a hash
    left-anti join when clusters approach corpus size. The "longest" rule
    adds one bucketed co-shuffle (components x token counts) plus a
    per-component window rank — both |duplicates|-sized on the component
    side."""
    from .graph import connected_components
    from .relational import broadcast_anti_join

    pairs = minhash_lsh_pairs(
        ds,
        id_col,
        text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        min_est=min_est,
    )
    # candidate pairs are |near-dups|-sized — tiny by design — and consumed
    # twice below; materialize once. A corpus with NO candidates must short
    # -circuit: an empty Ray 2.49 dataset drops its schema and the verify
    # join dies on the missing key column (ray-data pitfall).
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ds
    verified = verify_jaccard_pairs_joined(
        pairs, ds, id_col, text_col, shingle_k=shingle_k, threshold=threshold
    )
    comp = connected_components(verified, "id_a", "id_b")

    if keep == "longest":
        from .relational import bucket_join, window_row_number
        from .textstats import token_count

        comp = comp.materialize()
        node_t = comp.schema().base_schema.field("node").type
        int_ids = pa.types.is_integer(node_t)
        tok = token_count(ds, text_col).map_batches(
            lambda b: b[[id_col, "n_tokens"]], batch_format="pandas"
        )
        joined = bucket_join(comp, tok, ("node",), right_on=(id_col,))

        def keyed(b: pd.DataFrame) -> pd.DataFrame:
            # bucket_join's null padding upcasts int keys to float64 — pin
            # them back before ranking (ties break on node ASC)
            return pd.DataFrame(
                {
                    "node": b["node"].astype("int64") if int_ids else b["node"],
                    "component": b["component"].astype("int64") if int_ids else b["component"],
                    "__neg": -pd.to_numeric(b["n_tokens"]).astype("int64"),
                }
            )

        ranked = window_row_number(
            joined.map_batches(keyed, batch_format="pandas"),
            "component",
            ["__neg", "node"],
            out_col="__rk",
        )

        def non_canonical_ranked(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"__drop_id": b.loc[b["__rk"] != 1, "node"]})

        drops = ranked.map_batches(non_canonical_ranked, batch_format="pandas")
        return broadcast_anti_join(ds, drops, id_col, "__drop_id")
    if keep != "min_id":
        raise ValueError(f"near_dup_dedup: unknown keep rule {keep!r}")

    def non_canonical(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b.column("node"), b.column("component")))
        return pa.table({"__drop_id": t.column("node")})

    drops = comp.map_batches(non_canonical, batch_format="pyarrow")
    return broadcast_anti_join(ds, drops, id_col, "__drop_id")


def build_lsh_index(
    ds: Dataset,
    id_col: str,
    text_col: str,
    out_dir: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    lsh_groups: int = 64,
    sig_groups: int = 64,
) -> dict:
    """Persist a MinHash-LSH index for CROSS-RUN near-dup detection: dedupe
    tomorrow's crawl shard against today's 100 TB corpus WITHOUT recomputing
    the corpus's signatures. Two parquet trees under `out_dir`:

      bands/g=<G>/   (id, band, bh)  — band rows partitioned by the same
                     composite hash(band, bh) % lsh_groups group key the
                     in-job LSH shuffle uses, so a query shard reads ONLY
                     the band-groups its own band hashes land in;
      sigs/sg=<S>/   (id, sig)       — full signatures partitioned by a
                     stable id hash, read only for the ids that actually
                     appear in a candidate pair (est_jaccard attach);
      meta.json      — the signature parameters (a query MUST hash with the
                     same seed/num_perm/shingle_k or candidates are noise).

    Index build is one signature pass + two shuffle-free partitioned
    writes — no pairwise work at build time."""
    import json
    import os

    from ..hashing import stable_bucket

    sigs = minhash_signatures(
        ds, id_col, text_col, num_perm=num_perm, shingle_k=shingle_k
    ).materialize()
    banded = _explode_band_rows(sigs, num_perm=num_perm, bands=bands, lsh_groups=lsh_groups)

    def prep_band(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"id": b["__id"], "band": b["band"], "bh": b["bh"], "g": b["__g"]}
        )

    def prep_sig(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": b["__id"],
                "sig": b["__sig"],
                "sg": stable_bucket(b["__id"], sig_groups),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    banded.map_batches(prep_band, batch_format="pandas").write_parquet(
        os.path.join(out_dir, "bands"), partition_cols=["g"]
    )
    sigs.map_batches(prep_sig, batch_format="pandas").write_parquet(
        os.path.join(out_dir, "sigs"), partition_cols=["sg"]
    )
    meta = {
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "lsh_groups": lsh_groups,
        "sig_groups": sig_groups,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def append_lsh_index(ds_new: Dataset, id_col: str, text_col: str, index_dir: str) -> None:
    """Fold a new document shard INTO an existing `build_lsh_index` corpus —
    the maintenance half of the cross-run dedup loop (query the shard
    against the index, drop its dups, then append the survivors). Hashes
    with the index's OWN meta parameters and writes additional parquet
    files into the same band-group / sig-group partition directories
    (parquet partitions are directories; appending is new files, no
    rewrite of existing data). After append, queries see old + new."""
    import json
    import os

    from ..hashing import stable_bucket

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    sigs = minhash_signatures(
        ds_new, id_col, text_col, num_perm=meta["num_perm"], shingle_k=meta["shingle_k"]
    ).materialize()
    banded = _explode_band_rows(
        sigs, num_perm=meta["num_perm"], bands=meta["bands"], lsh_groups=meta["lsh_groups"]
    )

    def prep_band(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"id": b["__id"], "band": b["band"], "bh": b["bh"], "g": b["__g"]}
        )

    def prep_sig(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": b["__id"],
                "sig": b["__sig"],
                "sg": stable_bucket(b["__id"], meta["sig_groups"]),
            }
        )

    banded.map_batches(prep_band, batch_format="pandas").write_parquet(
        os.path.join(index_dir, "bands"), partition_cols=["g"]
    )
    sigs.map_batches(prep_sig, batch_format="pandas").write_parquet(
        os.path.join(index_dir, "sigs"), partition_cols=["sg"]
    )


def query_lsh_index(
    ds_new: Dataset,
    id_col: str,
    text_col: str,
    index_dir: str,
    *,
    min_est: float = 0.5,
) -> pd.DataFrame:
    """Candidate near-duplicate pairs between a NEW document shard and a
    persisted `build_lsh_index` corpus: (id_old, id_new, est_jaccard).

    Scale shape: the new shard is the small side by design (one crawl
    increment vs the accumulated corpus). Its band hashes are computed with
    the index's own parameters, pulled to the driver (|new| x bands rows of
    ~20 B) and broadcast ONCE via ray.put; only the band-group partitions
    those hashes land in are read from the index (directory-level pruning,
    same layout trick as the IVF index), and each index batch probes the
    broadcast dict vectorized — no shuffle touches the corpus side.
    est_jaccard then reads ONLY the sig partitions holding a paired old id.
    Returns a DataFrame (the pair set is the operator's output and is
    candidate-bounded, like the in-job LSH path)."""
    import glob
    import json
    import os

    import ray.data as rd

    from ..hashing import stable_bucket

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    sigs_new = minhash_signatures(
        ds_new, id_col, text_col, num_perm=meta["num_perm"], shingle_k=meta["shingle_k"]
    ).materialize()
    banded_new = _explode_band_rows(
        sigs_new, num_perm=meta["num_perm"], bands=meta["bands"], lsh_groups=meta["lsh_groups"]
    ).to_pandas()

    empty = pd.DataFrame(
        {
            "id_old": pd.Series(dtype="object"),
            "id_new": pd.Series(dtype="object"),
            "est_jaccard": pd.Series(dtype="float64"),
        }
    )
    if not len(banded_new):
        return empty
    probed = sorted(set(banded_new["__g"].tolist()))
    band_paths = [
        f
        for g in probed
        for f in sorted(glob.glob(os.path.join(index_dir, "bands", f"g={g}", "*.parquet")))
    ]
    if not band_paths:
        return empty
    # (band, bh) -> [new ids]; bands are int<=64 and bh int64 — pack the key
    lookup: dict = {}
    for band, bh, nid in zip(banded_new["band"], banded_new["bh"], banded_new["__id"]):
        lookup.setdefault((int(band), int(bh)), []).append(nid)
    lref = ray.put(lookup)

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lref)
        olds, news = [], []
        for oid, band, bh in zip(b["id"], b["band"], b["bh"]):
            hit = lk.get((int(band), int(bh)))
            if hit:
                for nid in hit:
                    olds.append(oid)
                    news.append(nid)
        return pd.DataFrame({"id_old": olds, "id_new": news})

    pairs = (
        rd.read_parquet(band_paths, columns=["id", "band", "bh"])
        .map_batches(probe, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if not len(pairs):
        return empty
    # est attach: old sigs from ONLY the partitions holding a paired id
    old_ids = pd.unique(pairs["id_old"])
    sgs = sorted(set(stable_bucket(old_ids, meta["sig_groups"]).tolist()))
    sig_paths = [
        f
        for sg in sgs
        for f in sorted(glob.glob(os.path.join(index_dir, "sigs", f"sg={sg}", "*.parquet")))
    ]
    old_set = set(old_ids.tolist())
    sig_map: dict = {}
    for b in rd.read_parquet(sig_paths, columns=["id", "sig"]).iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        for i, s in zip(b["id"].tolist(), b["sig"].tolist()):
            if i in old_set:
                sig_map[i] = np.asarray(s, dtype=np.int64)
    for b in sigs_new.iter_batches(batch_size=65536, batch_format="pandas"):
        for i, s in zip(b["__id"].tolist(), b["__sig"].tolist()):
            sig_map[i] = np.asarray(s, dtype=np.int64)
    sa = np.stack([sig_map[i] for i in pairs["id_old"]])
    sb = np.stack([sig_map[i] for i in pairs["id_new"]])
    pairs = pairs.copy()
    pairs["est_jaccard"] = (sa == sb).mean(axis=1)
    pairs = pairs[pairs["est_jaccard"] >= min_est]
    return pairs.sort_values(["id_old", "id_new"]).reset_index(drop=True)


def simhash64(
    ds: Dataset, id_col: str, text_col: str, *, hash_fn: str = "blake2b"
) -> Dataset:
    """64-bit simhash fingerprint per doc (token-level, blake2b token hashes).
    Returns (id_col, simhash: hex string) — hex keeps uint64 portable.

    Vectorized: ONE pd.factorize over the batch's tokens, blake2b only for
    the batch-unique vocabulary (Zipf: a small fraction of occurrences), ±1
    bit-rows gathered and summed per doc with np.add.reduceat. Stateless
    task map (no actor pool): the per-batch vocabulary dedupe captures
    nearly all the cache win without paying actor spawn latency on small
    inputs. Output byte-identical to hashing every occurrence.

    ``hash_fn="md5"`` hashes each token as the first 8 big-endian bytes of
    md5 — the one 64-bit hash ANSI SQL engines also expose
    (``('0x'||substr(md5(tok),1,16))::UBIGINT`` in DuckDB), making the
    whole fingerprint VALUE-replayable by a SQL oracle. blake2b stays the
    default (keyed/faster; not SQL-expressible)."""
    if hash_fn == "md5":
        def tok_hash(tok: str) -> int:
            return int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
    elif hash_fn == "blake2b":
        def tok_hash(tok: str) -> int:
            return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'blake2b' or 'md5')")
    shifts = np.arange(64, dtype=np.uint64)
    pows = np.uint64(1) << shifts

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [t.split() for t in batch[text_col].tolist()]
        counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
        out = np.full(len(tok_lists), "0" * 16, dtype=object)
        total = int(counts.sum())
        if total:
            import itertools

            all_toks = np.fromiter(
                itertools.chain.from_iterable(tok_lists), dtype=object, count=total
            )
            codes, uniques = pd.factorize(all_toks)
            mat = np.empty((len(uniques), 64), dtype=np.int8)
            for i, tok in enumerate(uniques):
                h = np.uint64(tok_hash(tok))
                mat[i] = np.where(((h >> shifts) & np.uint64(1)).astype(bool), 1, -1)
            rows = mat[codes].astype(np.int32)
            offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
            nonempty = counts > 0
            acc = np.add.reduceat(rows, offsets[nonempty], axis=0)
            fps = ((acc > 0).astype(np.uint64) * pows).sum(axis=1)
            out[nonempty] = [f"{v:016x}" for v in fps]
        return pd.DataFrame({id_col: batch[id_col].to_numpy(), "simhash": out})

    return ds.map_batches(fn, batch_format="pandas")


def embedding_near_dup_pairs(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    n_planes: int = 12,
    threshold: float = 0.95,
    max_bucket: int = 256,
    seed: int = 42,
) -> Dataset:
    """Near-duplicate (cosine >= threshold) pairs via random-hyperplane LSH:
    bucket by sign signature, brute-force cosine within buckets only. Misses
    across-bucket pairs by design (scale path); raise n_planes for precision,
    lower for recall."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    ref = ray.put(planes)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(ref)
        vecs = np.stack(batch[vec_col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vn = vecs / norms
        sig = (vn @ pl) > 0
        keys = (sig * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.DataFrame(
            {"__id": batch[id_col].to_numpy(), "bucket": keys.astype(np.int64), "__v": list(vn)}
        )

    buckets = ds.map_batches(bucketize, batch_format="pandas")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__id", kind="mergesort").head(max_bucket)
        ids = g["__id"].to_numpy()
        v = np.stack(g["__v"].to_numpy())
        sims = v @ v.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]], "cosine": sims[ii, jj][keep].astype(float)}
        )

    out = buckets.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
    from .relational import grouped_agg

    return grouped_agg(out, ["id_a", "id_b"], [("cosine", "max", "cosine")])


def remove_duplicate_spans(
    ds: Dataset,
    id_col: str,
    text_col: str,
    k: int = 5,
    *,
    max_span_rows: int = 2_000_000,
) -> Dataset:
    """APPLY the Lee-et-al. substring dedup: cut every maximal duplicated
    k-token span (from :func:`duplicate_token_spans`) out of each document
    and re-emit the cleaned text. Output (id, clean_text, n_removed) where
    clean_text = surviving tokens joined by ' ' (single-space normalized —
    the deterministic reconstruction a SQL oracle replays with
    string_agg(tok, ' ' ORDER BY pos)) and n_removed = tokens cut.

    Scale shape: spans are the SMALL side (one row per maximal duplicated
    span, not per token) — they broadcast once via ray.put into a per-doc
    interval dict; the cleaning pass is map-only over the docs. The
    max_span_rows assert is the broadcast gate: above it, swap the
    broadcast for a bucketed hash join of (id, pos) cut rows against the
    exploded token stream (the relational.bucket_join shape)."""
    from .textstats import flat_ngrams_pos

    spans = duplicate_token_spans(ds, id_col, text_col, k).to_pandas()
    assert len(spans) <= max_span_rows, (
        f"remove_duplicate_spans: {len(spans)} span rows exceed the broadcast "
        "gate — use a bucketed (id, pos) join instead (docstring)"
    )
    by_doc: dict = {}
    for r in spans.itertuples(index=False):
        by_doc.setdefault(getattr(r, id_col), []).append(
            (int(r.span_start), int(r.span_end))
        )
    sref = ray.put(by_doc)

    def clean(b: pa.Table) -> pa.Table:
        cuts = ray.get(sref)
        toks, ridx, pos = flat_ngrams_pos(b.column(text_col), 1)
        ids = b.column(id_col).to_pylist()
        n = b.num_rows
        toks_np = np.asarray(toks.to_pylist(), dtype=object)
        # row-grained work (one string join per doc) — token-level masking
        # stays numpy interval arithmetic, never a per-token Python test
        starts = np.searchsorted(ridx, np.arange(n))
        ends = np.searchsorted(ridx, np.arange(n), side="right")
        removed = np.zeros(n, dtype=np.int64)
        out_texts = []
        for ri in range(n):
            seg = toks_np[starts[ri] : ends[ri]]
            iv = cuts.get(ids[ri])
            if not iv:
                out_texts.append(" ".join(seg))
                continue
            p = pos[starts[ri] : ends[ri]]
            m = np.zeros(len(seg), dtype=bool)
            for s, e in iv:
                m |= (p >= s) & (p < e)
            removed[ri] = int(m.sum())
            out_texts.append(" ".join(seg[~m]))
        return pa.table(
            {
                id_col: b.column(id_col),
                "clean_text": pa.array(out_texts, pa.string()),
                "n_removed": pa.array(removed),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def _md5_planes(n_planes: int, dim: int) -> np.ndarray:
    """Integer hyperplanes an ANSI SQL engine can regenerate verbatim:
    component (j, d) = (first 16 hex digits of md5('p{j}:{d}') as uint64)
    % 255 - 127, i.e. a deterministic value in [-127, 127]. DuckDB replay:
    ``('0x' || substr(md5('p'||j||':'||d), 1, 16))::UBIGINT % 255 - 127``.
    Returns a (dim, n_planes) int64 matrix."""
    w = np.empty((dim, n_planes), dtype=np.int64)
    for j in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"p{j}:{d}".encode()).hexdigest()[:16], 16)
            w[d, j] = h % 255 - 127
    return w


def embedding_near_dup_pairs_exact(
    ds: Dataset,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    n_planes: int = 6,
    threshold_num: int = 49,
    threshold_den: int = 400,
    max_bucket: int = 256,
    quant: int = 10_000,
) -> Dataset:
    """Integer-exact hyperplane-LSH near-duplicate pairs: the fixed-point
    twin of :func:`embedding_near_dup_pairs` whose every arithmetic step is
    integer, so a SQL oracle replays it bit-for-bit (no float is ever
    compared across engines).

      * vectors quantize to ``floor(x * quant + 0.5)`` int64 components;
      * hyperplanes come from :func:`_md5_planes` (md5-derived integers);
      * bucket = sign-bit pack of the exact integer dot products;
      * within a bucket (earliest ``max_bucket`` ids, like the gaussian
        variant) a pair is kept iff ``dot > 0 AND
        threshold_den * dot^2 >= threshold_num * |a|^2 * |b|^2`` — i.e.
        cosine^2 >= num/den on the quantized vectors, decided in exact
        rational arithmetic (num/den = 49/400 is cosine >= 0.35);
      * output ``cos_sq_e12 = floor(1e12 * dot^2 / (|a|^2 |b|^2))``.

    Scale shape is unchanged: one map pass emits (id, bucket, int vector),
    one groupby(bucket) exchange, pair scan inside each bucket only. The
    dot^2 comparison overflows int64, so a vectorized float64 prescreen
    (relative margin 1e-9, vs ~1e-16 actual error) decides all but the
    borderline sliver, which falls back to exact Python-int arithmetic."""
    planes = _md5_planes(n_planes, dim)
    pref = ray.put(planes)
    shifts = (1 << np.arange(n_planes, dtype=np.int64))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(pref)
        v64 = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        vi = np.floor(v64 * quant + 0.5).astype(np.int64)
        sig = (vi @ pl) > 0
        return pd.DataFrame(
            {
                "__id": batch[id_col].to_numpy(),
                "bucket": (sig * shifts).sum(axis=1),
                "__v": list(vi),
            }
        )

    buckets = ds.map_batches(bucketize, batch_format="pandas")
    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cos_sq_e12": pd.Series(dtype="int64"),
        }
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__id", kind="mergesort").head(max_bucket)
        if len(g) < 2:
            return empty
        ids = g["__id"].to_numpy()
        v = np.stack(g["__v"].to_numpy())  # int64, exact
        dot = v @ v.T
        n2 = np.einsum("ij,ij->i", v, v)
        ii, jj = np.triu_indices(len(ids), k=1)
        d, na, nb = dot[ii, jj], n2[ii], n2[jj]
        # float64 prescreen: lhs/rhs carry ~1e-16 relative error, so a 1e-9
        # relative margin is decisive; only the sliver between the margins
        # needs exact (unbounded) Python-int arithmetic.
        lhs = threshold_den * d.astype(np.float64) ** 2
        rhs = threshold_num * na.astype(np.float64) * nb.astype(np.float64)
        pos = d > 0
        keep = pos & (lhs >= rhs * (1 + 1e-9))
        border = pos & ~keep & (lhs >= rhs * (1 - 1e-9))
        for t in np.nonzero(border)[0]:
            di, ai, bi = int(d[t]), int(na[t]), int(nb[t])
            keep[t] = threshold_den * di * di >= threshold_num * ai * bi
        if not keep.any():
            return empty
        ki, kj = ii[keep], jj[keep]
        cos12 = [
            int(x) * int(x) * 10**12 // (int(a) * int(b))
            for x, a, b in zip(dot[ki, kj], n2[ki], n2[kj])
        ]
        return pd.DataFrame(
            {
                "id_a": ids[ki].astype("int64"),
                "id_b": ids[kj].astype("int64"),
                "cos_sq_e12": np.asarray(cos12, dtype=np.int64),
            }
        )

    return buckets.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")


# -------------------------------------------------------- decontamination
def collect_ngram_set(bench: Dataset, text_col: str, n: int = 3) -> list[str]:
    """Distinct word-n-gram set of a SMALL benchmark dataset, collected to
    the driver. Small-side-only by design: eval/benchmark suites are MBs
    even when the training corpus is 100 TB. For a large right side, skip
    this and hash-join exploded n-grams instead (verify_jaccard_pairs_joined
    shows the shape)."""
    import pyarrow.compute as pc

    from .textstats import flat_ngrams

    def partial(b: pa.Table) -> pa.Table:
        ngrams, _ = flat_ngrams(b.column(text_col), n)
        return pa.table({"ng": pc.unique(ngrams)})

    return bench.map_batches(partial, batch_format="pyarrow").unique("ng")


def ngram_contamination(
    ds: Dataset,
    id_col: str,
    text_col: str,
    bench_ngrams: list[str],
    n: int = 3,
    out_col: str = "n_hits",
    concurrency=(1, 4),
) -> Dataset:
    """Training-data decontamination (the GPT-3/Gopher n-gram collision
    check, from the public papers): count, per document, how many word
    n-gram OCCURRENCES also appear in a benchmark n-gram set; emit
    (id, n_hits) for contaminated documents only.

    Scale shape: the benchmark set is ray.put ONCE and materialized per
    ACTOR (__init__), never per batch; documents are single rows, so
    per-batch hit counts are already final — no groupby, no shuffle, the
    text never leaves its task."""
    ref = ray.put(pa.array(bench_ngrams, pa.string()))

    class Counter:
        def __init__(self):
            import pyarrow.compute as _pc

            self._pc = _pc
            self.bench = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            from .textstats import flat_ngrams

            pc_ = self._pc
            ngrams, row_idx = flat_ngrams(b.column(text_col), n)
            ids_all = b.column(id_col).combine_chunks()
            if len(ngrams) == 0:
                return pa.table(
                    {id_col: ids_all.slice(0, 0), out_col: pa.array([], pa.int64())}
                )
            hit = np.asarray(pc_.is_in(ngrams, value_set=self.bench))
            if not hit.any():
                return pa.table(
                    {id_col: ids_all.slice(0, 0), out_col: pa.array([], pa.int64())}
                )
            vc = pd.Series(row_idx[hit]).value_counts()
            return pa.table(
                {
                    id_col: ids_all.take(pa.array(vc.index.to_numpy())),
                    out_col: pa.array(vc.to_numpy(), pa.int64()),
                }
            )

    return ds.map_batches(Counter, batch_format="pyarrow", concurrency=concurrency, num_cpus=1)


def chunk_dedup(ds: Dataset, id_col: str, text_col: str, n_tokens: int = 20) -> Dataset:
    """Paragraph-level exact dedup (the C4/RefinedWeb within-corpus repeated-
    span remover), over fixed-size token chunks since the synthetic corpus
    has no paragraph breaks: explode every doc into n_tokens-token chunks
    (pure Arrow kernels — textstats.flat_token_chunks), then keep the FIRST
    occurrence of each distinct chunk corpus-wide, first = lexicographic min
    (doc id, chunk index). One groupby(chunk) shuffle moves (chunk, packed
    position) pairs; the winner position is a single int64 Min because the
    pair is packed as id * 2^20 + chunk_idx (requires chunk_idx < 2^20 and
    non-negative ids — asserted)."""
    from ray.data.aggregate import Min

    from .textstats import flat_token_chunks

    _SHIFT = 20

    def explode(batch: pa.Table) -> pa.Table:
        chunks, row_idx, chunk_idx = flat_token_chunks(batch.column(text_col), n_tokens)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[row_idx]
        assert (ids >= 0).all() and (chunk_idx < (1 << _SHIFT)).all()
        packed = (ids.astype(np.int64) << _SHIFT) | chunk_idx
        t = pa.table({"para": chunks, "__pos": pa.array(packed, pa.int64())})
        # map-side combiner: one row per distinct chunk per block
        t = t.group_by("para").aggregate([("__pos", "min")])
        return t.rename_columns(["para", "__pos"])

    kept = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("para")
        .aggregate(Min("__pos", alias_name="__pos"))
    )

    def unpack(b: pa.Table) -> pa.Table:
        pos = b.column("__pos").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(pos >> _SHIFT, pa.int64()),
                "chunk_idx": pa.array(pos & ((1 << _SHIFT) - 1), pa.int64()),
                "para": b.column("para"),
            }
        )

    return kept.map_batches(unpack, batch_format="pyarrow")


def duplicate_token_spans(
    ds: Dataset, id_col: str, text_col: str, k: int = 5
) -> Dataset:
    """Exact duplicate-SUBSTRING detection (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — substring level, the level
    doc/paragraph dedup can't see): a k-token window is duplicated when the
    identical token sequence occurs anywhere else in the corpus (another doc
    OR another offset of the same doc); overlapping/adjacent duplicated
    windows merge into maximal spans. Returns one row per maximal span:
    (id, span_start, span_end, n_dup_ngrams) with 0-based half-open token
    positions — the spans a curation pipeline would cut out of each doc.

    Distributed shape (the reference point is a single-node suffix array;
    this is the shuffle-light streaming equivalent for sharded corpora):
      1. vectorized n-gram+position explode (pure Arrow windowing);
      2. grouped COUNT per n-gram via the bucketed combiner reduce — the
         exchange carries one (ngram, partial_count) row per distinct
         n-gram per block, never per occurrence;
      3. n-grams with count > 1 broadcast back as a key set (`ray.put`
         once); the occurrence stream re-derives positions locally and
         filters in place — no occurrence-level shuffle. At corpus scales
         where the duplicated-ngram set outgrows a broadcast, swap step 3
         for the bucketed union semi-merge used by `graph.bfs_hops`'s spill
         path (same keys, same output);
      4. per-doc maximal-span merge via `streams.interval_merge` (intervals
         [pos, pos+k], running-cummax islands) — one hash(id) shuffle of
         (id, pos) pairs for duplicated windows only.
    """
    from .relational import broadcast_semi_join, grouped_agg
    from .streams import interval_merge
    from .textstats import flat_ngrams_pos

    def explode(b: pa.Table) -> pa.Table:
        ng, ridx, pos = flat_ngrams_pos(b.column(text_col), k)
        return pa.table(
            {
                "__ng": ng,
                id_col: pc.take(b.column(id_col), pa.array(ridx)),
                "pos": pa.array(pos),
            }
        )

    # materialize: occ feeds BOTH the count reduce and the dup-filter scan;
    # unmaterialized, Ray re-executes the full-corpus explode twice (no
    # lineage cache). occ carries (ngram, id, pos) only — never doc text —
    # so the pinned size is ~k tokens/occurrence; at corpus scales where
    # that outgrows the object store, drop this materialize and pay the
    # second explode pass instead (compute-vs-store tradeoff).
    occ = ds.map_batches(explode, batch_format="pyarrow").materialize()
    counts = grouped_agg(occ, ["__ng"], [("__ng", "count", "n")])
    dup = counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 1)), batch_format="pyarrow"
    )
    occ_dup = broadcast_semi_join(occ, dup, "__ng", "__ng")

    def to_iv(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b.column(id_col),
                "s": b.column("pos"),
                "e": pc.add(b.column("pos"), k),
            }
        )

    merged = interval_merge(
        occ_dup.map_batches(to_iv, batch_format="pyarrow"), id_col, "s", "e"
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b.column(id_col),
                "span_start": b.column("island_start"),
                "span_end": b.column("island_end"),
                "n_dup_ngrams": b.column("n_rows"),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def snm_dup_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    window: int = 3,
    threshold: float = 0.5,
    num_buckets: int = 64,
    round_digits: int = 6,
) -> Dataset:
    """Sorted-neighborhood near-duplicate pairs (Hernandez & Stolfo 1995's
    merge/purge method — the classic alternative to LSH banding): rows are
    globally ordered by (text, id) and each row is compared with its next
    ``window - 1`` neighbors in that order; similarity is character-SET
    jaccard (exactly DuckDB's ``jaccard()``), so the whole operator is
    SQL-replayable. Returns (id_a, id_b, jac) with id_a the earlier row in
    sort order and jac rounded to round_digits, filtered to >= threshold.
    Empty texts are dropped (DuckDB's jaccard errors on them).

    Scale shape: global order via sampled range partitioning
    (global_row_number — no single-node sort); the neighbor exchange ships
    (ordinal, id, charset) x window where charset is the row's UTF-8 byte
    set packed into a 256-bit mask (four int64 columns — fixed 32 B/row,
    never the text), so pair similarity is two popcounts; each pair forms
    exactly once, in its anchor ordinal's group."""
    from .relational import global_row_number

    def project(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.utf8_length(pc.coalesce(b.column(text_col), "")), 1)
        b = b.filter(keep)
        return pa.table({id_col: b.column(id_col), text_col: b.column(text_col)})

    numbered = global_row_number(
        ds.map_batches(project, batch_format="pyarrow"), [text_col, id_col], out_col="__r"
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        cs_cols = [f"__c{i}" for i in range(4)]
        if n == 0:
            return pd.DataFrame(
                {
                    "__t": pd.Series(dtype="int64"),
                    "__r": pd.Series(dtype="int64"),
                    id_col: pd.Series(dtype="object"),
                    **{c: pd.Series(dtype="int64") for c in cs_cols},
                }
            )
        # UTF-8 BYTE sets, not codepoints: DuckDB's jaccard() compares byte
        # sets ('aé' vs 'aéz' -> 0.75), so multibyte text must match it.
        # Each row's byte set is a packed 256-bit mask (4 int64 columns —
        # fixed 32 B/row in the exchange, and jaccard becomes popcounts):
        # built vectorized straight off the Arrow string buffer.
        arr = pa.Array.from_pandas(b[text_col]).cast(pa.string())
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        rix = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        pres = np.zeros((n, 256), dtype=bool)
        pres[rix, data] = True
        packed = np.packbits(pres, axis=1, bitorder="little").view(np.int64)  # (n, 4)
        r = b["__r"].to_numpy(np.int64)
        ids = b[id_col].to_numpy()
        ts, rs, outid = [], [], []
        outcs: list[list[np.ndarray]] = [[] for _ in range(4)]
        for i in range(window):
            t = r - i  # row r participates in anchor groups r-(window-1)..r
            m = t >= 1
            ts.append(t[m])
            rs.append(r[m])
            outid.append(ids[m])
            for j in range(4):
                outcs[j].append(packed[m, j])
        return pd.DataFrame(
            {
                "__t": np.concatenate(ts),
                "__r": np.concatenate(rs),
                id_col: np.concatenate(outid),
                **{c: np.concatenate(outcs[j]) for j, c in enumerate(cs_cols)},
            }
        )

    from ..hashing import stable_bucket

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["__bucket"] = stable_bucket(b["__t"], num_buckets)
        return b

    _POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        cs_cols = [f"__c{i}" for i in range(4)]
        anchors = g[g["__r"] == g["__t"]][["__t", id_col, *cs_cols]].rename(
            columns={id_col: "id_a", **{c: c + "_a" for c in cs_cols}}
        )
        followers = g[g["__r"] != g["__t"]][["__t", "__r", id_col, *cs_cols]].rename(
            columns={id_col: "id_b", **{c: c + "_b" for c in cs_cols}}
        )
        m = followers.merge(anchors, on="__t", how="inner").sort_values(
            ["__t", "__r"], kind="mergesort"
        )
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype="object"),
                    "id_b": pd.Series(dtype="object"),
                    "jac": pd.Series(dtype="float64"),
                }
            )
        # charset jaccard = popcount(a&b) / popcount(a|b) on the packed masks
        a = np.column_stack([m[c + "_a"].to_numpy(np.int64) for c in cs_cols]).view(np.uint8)
        b_ = np.column_stack([m[c + "_b"].to_numpy(np.int64) for c in cs_cols]).view(np.uint8)
        inter = _POP[a & b_].sum(axis=1)
        union = _POP[a | b_].sum(axis=1)
        jac = np.round(inter / union, round_digits)
        keep = jac >= threshold
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy()[keep], "id_b": m["id_b"].to_numpy()[keep], "jac": jac[keep]}
        )

    return (
        numbered.map_batches(explode, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def prefix_filter_jaccard_pairs(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.6,
    shingle_w: int = 3,
    max_bucket: int = 256,
    num_groups: int = 256,
    round_digits: int = 6,
    verify_reduce_blocks: int | None = None,
) -> Dataset:
    """All-pairs set-similarity self-join via PREFIX FILTERING (Chaudhuri
    et al. 2006 SSJoin / Bayardo et al. 2007 all-pairs / Xiao et al. 2008
    PPJoin — public literature): each document's set is its DISTINCT
    ``shingle_w``-word shingles under a global total order; a document of
    set size n emits only its first ``n - ceil(t*n) + 1`` shingles, and by
    the pigeonhole bound any pair with Jaccard >= t MUST collide on at
    least one emitted shingle, so same-shingle grouping is a LOSSLESS
    blocking scheme (false candidates are removed by exact verification,
    true pairs can never be missed). Word shingles (not raw tokens) keep
    the blocking discriminative even on small vocabularies where every
    document shares most single words. Returns (id_a, id_b, jac >= t),
    id_a < id_b, jac = exact distinct-shingle-set Jaccard rounded to
    round_digits. Documents with fewer than shingle_w tokens have an empty
    shingle set and are excluded (matching SQL's empty-set drop).

    Scale shape: the candidate exchange ships (shingle_hash:int64, id)
    ONLY — prefix shingles, never suffixes, never text; pair generation
    groups on hash(shingle) % num_groups (many whole shingle-buckets per
    group, same composite-key shape as minhash_lsh_pairs), hot shingles
    are truncated at max_bucket with an explicit bucket_truncated flag
    (no-silent-caps rule); verification hash-joins the deduped pairs back
    to the docs table twice, so no text set is ever broadcast. Hash
    collisions between distinct shingles only ADD candidates (verification
    removes them)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")

    def prefix_rows(batch: pd.DataFrame) -> pd.DataFrame:
        """(id, text) -> (shingle_hash, id, group) for PREFIX shingles only.

        Vectorized: one flat_ngrams pass shingles the whole batch in Arrow,
        the per-doc distinct + lexical sort + prefix cut run as ONE
        np.unique over (row, shingle-rank) composite keys (rank = position
        in the batch-wide lexically sorted dictionary — the same total
        order sorted() gave the per-doc loop), and blake2b runs once per
        DISTINCT selected shingle (prefix shingles repeat across docs —
        that is what blocking exploits), not once per (doc, shingle)."""
        from .textstats import flat_ngrams

        empty = pd.DataFrame(
            {
                "sh": pd.Series(dtype="int64"),
                "__id": pd.Series(dtype=batch[id_col].dtype),
                "__g": pd.Series(dtype="int32"),
            }
        )
        if len(batch) == 0:
            return empty
        ngrams, row_idx = flat_ngrams(pa.array(batch[text_col], pa.string()), shingle_w)
        if len(ngrams) == 0:
            return empty
        denc = ngrams.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        uniq = denc.dictionary.to_numpy(zero_copy_only=False)
        order = np.argsort(uniq)  # lexical str order == sorted() in the old loop
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[order] = np.arange(len(uniq), dtype=np.int64)
        key = np.unique(row_idx * np.int64(len(uniq)) + rank[codes])  # distinct, (row, rank)-sorted
        rows = key // len(uniq)
        rks = key % len(uniq)
        grp_rows, counts = np.unique(rows, return_counts=True)
        p = counts - np.ceil(threshold * counts).astype(np.int64) + 1
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        keep = (np.arange(len(key)) - np.repeat(starts, counts)) < np.repeat(p, counts)
        sel_rows, sel_rks = rows[keep], rks[keep]
        hit_rks, inv = np.unique(sel_rks, return_inverse=True)
        h = _text_hash64(list(uniq[order][hit_rks]))[inv]
        return pd.DataFrame(
            {
                "sh": h.view(np.int64),
                "__id": batch[id_col].to_numpy()[sel_rows],
                "__g": (h % np.uint64(num_groups)).astype(np.int32),
            }
        )

    exploded = ds.map_batches(prefix_rows, batch_format="pandas")

    group_pairs = _bucket_pairs_fn("sh", max_bucket)

    from .relational import bucket_join, grouped_agg

    pairs = grouped_agg(
        exploded.groupby("__g").map_groups(group_pairs, batch_format="pandas"),
        ["id_a", "id_b"],
        [("bucket_truncated", "max", "bucket_truncated")],
    )

    # exact verification: two-sided hash join against the docs table (the
    # verify_jaccard_pairs_joined shape) with WORD-shingle sets. bucket_join
    # (not Dataset.join): a sparse candidate set with fewer keys than hash
    # partitions crashes Ray 2.49's acero join on zero-column empty
    # partitions, and the bucketed exchange has no such seam.
    from .relational import _ray_schema_to_arrow

    _sch = _ray_schema_to_arrow(ds.schema())
    idt, txt = _sch.field(id_col).type, _sch.field(text_col).type

    # prune BOTH text sides to pair PARTICIPANTS before any exchange: the
    # candidate set is materialized output anyway (bounded), so the ids pull
    # to the driver and broadcast as one Arrow array; the verify joins then
    # ship |participants| texts instead of |corpus| texts — at corpus scale
    # the candidate fraction is what makes the verify affordable
    pairs = pairs.materialize()
    part_ids: set = set()
    for pb in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        part_ids.update(pb.column("id_a").to_pylist())
        part_ids.update(pb.column("id_b").to_pylist())
    ids_ref = ray.put(pa.array(list(part_ids), idt))

    def rename(side: str):
        def fn(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_in(b.column(id_col), value_set=ray.get(ids_ref)))
            return pa.table({f"__{side}_id": b.column(id_col), f"__{side}_text": b.column(text_col)})

        return fn

    a_side = ds.map_batches(rename("a"), batch_format="pyarrow")
    b_side = ds.map_batches(rename("b"), batch_format="pyarrow")
    j = bucket_join(
        pairs,
        a_side,
        on=("id_a",),
        right_on=("__a_id",),
        left_schema=pa.schema({"id_a": idt, "id_b": idt, "bucket_truncated": pa.bool_()}),
        right_schema=pa.schema({"__a_id": idt, "__a_text": txt}),
        # both join sides are participant-pruned (candidate-sized): callers
        # that know the candidate set is reducer-sized pass
        # verify_reduce_blocks to coalesce the two exchanges
        reduce_blocks=verify_reduce_blocks,
    )
    j = bucket_join(
        j,
        b_side,
        on=("id_b",),
        right_on=("__b_id",),
        left_schema=pa.schema(
            {"id_a": idt, "id_b": idt, "bucket_truncated": pa.bool_(), "__a_text": txt}
        ),
        right_schema=pa.schema({"__b_id": idt, "__b_text": txt}),
        reduce_blocks=verify_reduce_blocks,
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        def wset(t: str) -> set:
            toks = (t or "").split()
            return {" ".join(toks[j : j + shingle_w]) for j in range(len(toks) - shingle_w + 1)}

        jac = []
        for x, y in zip(batch["__a_text"], batch["__b_text"]):
            sa, sb = wset(x), wset(y)
            u = len(sa | sb)
            jac.append(round(len(sa & sb) / u, round_digits) if u else 1.0)
        batch = batch.copy()
        batch["jac"] = jac
        batch = batch[batch["jac"] >= threshold]
        return batch[["id_a", "id_b", "jac"]]

    return j.map_batches(score, batch_format="pandas")


def hamming_near_dups(
    hashed: Dataset,
    id_col: str,
    hash_col: str,
    *,
    max_hamming: int = 4,
    num_groups: int = 256,
    max_bucket: int = 256,
) -> Dataset:
    """Near-duplicate pairs under HAMMING distance over a 64-bit hash
    column (simhash / perceptual-hash outputs): split the 64 bits into
    ``max_hamming + 1`` bands — by pigeonhole, any pair within distance
    max_hamming agrees EXACTLY on at least one band — group on
    (band, band_bits), emit candidate pairs per bucket, dedupe, verify
    popcount(xor) <= max_hamming. Lossless blocking, same shape as MinHash
    banding. Returns (id_a, id_b, hamming, bucket_truncated).

    Scale shape: the band exchange ships (id, band, bits, group) only —
    ~28 B/row; hot buckets (e.g. the all-black-image hash) truncate at
    max_bucket with an explicit flag; verification pulls ONLY pair
    participants' hashes (bounded by the candidate set, which is the
    operator's output anyway)."""
    bands = max_hamming + 1
    if bands > 64:
        raise ValueError("max_hamming must be < 64")
    hashed = hashed.materialize()  # banding pass + participant lookup
    widths = [64 // bands + (1 if i < 64 % bands else 0) for i in range(bands)]
    shifts = np.cumsum([0] + widths[:-1]).astype(np.uint64)
    masks = np.array([(1 << w) - 1 for w in widths], dtype=np.uint64)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {"__id": pd.Series(dtype="object"), "band": pd.Series(dtype="int32"),
                 "bits": pd.Series(dtype="int64"), "__g": pd.Series(dtype="int32")}
            )
        h = batch[hash_col].to_numpy(np.int64).view(np.uint64)
        bits = (h[:, None] >> shifts[None, :]) & masks[None, :]
        band_ids = np.tile(np.arange(bands, dtype=np.uint64), n)
        with np.errstate(over="ignore"):
            grp = (band_ids * np.uint64(0x9E3779B97F4A7C15) + bits.reshape(-1)) % np.uint64(num_groups)
        return pd.DataFrame(
            {
                "__id": np.repeat(batch[id_col].to_numpy(), bands),
                "band": band_ids.astype(np.int32),
                "bits": bits.reshape(-1).view(np.int64),
                "__g": grp.astype(np.int32),
            }
        )

    group_pairs = _bucket_pairs_fn(["band", "bits"], max_bucket)

    from .relational import _key_filter, grouped_agg

    banded = hashed.map_batches(explode, batch_format="pandas")
    pairs = grouped_agg(
        banded.groupby("__g").map_groups(group_pairs, batch_format="pandas"),
        ["id_a", "id_b"],
        [("bucket_truncated", "max", "bucket_truncated")],
    ).materialize()

    part_ids = _pair_participant_ids(pairs)
    hash_map: dict = {}
    if part_ids:
        flt = _key_filter(hashed, id_col, ray.put(pa.array(list(part_ids))), keep_matches=True)
        for b in flt.iter_batches(batch_size=65536, batch_format="pandas"):
            hash_map.update(zip(b[id_col].tolist(), b[hash_col].astype("int64").tolist()))
    map_ref = ray.put(hash_map)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            batch = batch.copy()
            batch["hamming"] = pd.Series(dtype="int64")
            return batch[["id_a", "id_b", "hamming", "bucket_truncated"]]
        m = ray.get(map_ref)
        ha = np.array([m[i] for i in batch["id_a"]], dtype=np.int64).view(np.uint64)
        hb = np.array([m[i] for i in batch["id_b"]], dtype=np.int64).view(np.uint64)
        x = ha ^ hb
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        out = batch.copy()
        out["hamming"] = ham
        out = out[out["hamming"] <= max_hamming]
        return out[["id_a", "id_b", "hamming", "bucket_truncated"]]

    return pairs.map_batches(verify, batch_format="pandas")
