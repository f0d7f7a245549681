"""Multimodal column operators: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages (brief: decode /
feature-extract / resize / frame-sample as first-class large-scale ops).

Image ops are REAL for the engine's raster format (8-byte w/h header + u8
rows, FIXTURES.md): nearest-neighbor resize, feature extraction, multi-page
frame sampling — all numpy, zero-copy views in, bytes out. Audio/video
decode are STUBS: the container ships no codec libraries (no PIL/cv2/
soundfile/av — verified), so the Ray-side plumbing (schema, actor signature,
batch sizing, output layout) is real and tested, while the codec call either
raises NotImplementedError or, with deterministic_fake=True, synthesizes a
seeded payload-derived signal so pipelines can be exercised end-to-end.

Scale notes: payload columns are large_binary; batches must be small (pixel
budget, not row count — SURVEY.md §4 'Memory pressure'); every op is a
callable class so per-actor state (resampling kernels, plane matrices,
window tables) is built once in __init__, not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..stages.decode import decode_page_pixels, _iter_page_blobs


def _encode(img: np.ndarray) -> bytes:
    h, w = img.shape
    return np.uint32(w).tobytes() + np.uint32(h).tobytes() + np.ascontiguousarray(img).tobytes()


class ImageResize:
    """Nearest-neighbor resize of single-page raster blobs to (out_h, out_w).
    Index maps are cached per (h, w) in the actor — built once per distinct
    source geometry, reused across batches."""

    def __init__(self, out_h: int = 64, out_w: int = 64, bytes_col: str = "bytes"):
        self.out_h, self.out_w = out_h, out_w
        self.bytes_col = bytes_col
        self._maps: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _map_for(self, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        key = (h, w)
        m = self._maps.get(key)
        if m is None:
            ys = (np.arange(self.out_h) * h // self.out_h).astype(np.intp)
            xs = (np.arange(self.out_w) * w // self.out_w).astype(np.intp)
            m = self._maps[key] = (ys, xs)
        return m

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.bytes_col)
        out_blobs, ws, hs = [], [], []
        for i in range(batch.num_rows):
            img = decode_page_pixels(memoryview(col[i].as_buffer()))
            ys, xs = self._map_for(*img.shape)
            out_blobs.append(_encode(img[ys][:, xs]))
            hs.append(self.out_h)
            ws.append(self.out_w)
        keep = [n for n in batch.schema.names if n != self.bytes_col]
        t = batch.select(keep)
        return (
            t.append_column("resized", pa.array(out_blobs, pa.large_binary()))
            .append_column("width", pa.array(ws, pa.int32()))
            .append_column("height", pa.array(hs, pa.int32()))
        )


class ImageFeatures:
    """Per-image feature vector (list<float32>): 16-bin intensity histogram
    (normalized) + ink fraction + row/col ink-profile moments. Real compute;
    the downstream shape (embedding column) feeds the similarity/near-dup
    operators directly."""

    def __init__(self, bytes_col: str = "bytes", bins: int = 16):
        self.bytes_col = bytes_col
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.bytes_col)
        feats = []
        for i in range(batch.num_rows):
            img = decode_page_pixels(memoryview(col[i].as_buffer()))
            hist = np.histogram(img, bins=self.edges)[0].astype(np.float64)
            hist /= max(1.0, hist.sum())
            ink = img < 128
            frac = float(ink.mean())
            rp = ink.mean(axis=1)
            cp = ink.mean(axis=0)
            mom = [float(rp.mean()), float(rp.std()), float(cp.mean()), float(cp.std())]
            feats.append(np.concatenate([hist, [frac], mom]).astype(np.float32))
        keep = [n for n in batch.schema.names if n != self.bytes_col]
        return batch.select(keep).append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class FrameSample:
    """Frame/page sampling for multi-page (video-like) payloads: keep every
    ``stride``-th page, emit one row per kept frame (flat_map shape)."""

    def __init__(self, stride: int = 2, bytes_col: str = "bytes", ref_col: str = "media_ref"):
        self.stride = stride
        self.bytes_col = bytes_col
        self.ref_col = ref_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.bytes_col)
        refs = batch.column(self.ref_col).to_pylist()
        o_ref, o_frame, o_blob = [], [], []
        for i in range(batch.num_rows):
            buf = memoryview(col[i].as_buffer())
            for p, blob, _w, _h in _iter_page_blobs(buf):
                if p % self.stride == 0:
                    o_ref.append(refs[i])
                    o_frame.append(p)
                    o_blob.append(bytes(blob))
        return pa.table(
            {
                self.ref_col: pa.array(o_ref, pa.string()),
                "frame": pa.array(o_frame, pa.int32()),
                "frame_bytes": pa.array(o_blob, pa.large_binary()),
            }
        )


class AudioDecode:
    """STUB: audio bytes -> mono float32 waveform + sample_rate.

    No audio codec library exists in this container (no soundfile/librosa/
    av). With deterministic_fake=True the actor emits a seeded sine mixture
    derived from the payload hash — schema-stable, reproducible, good enough
    to test the Ray plumbing; otherwise NotImplementedError names the
    missing dependency."""

    def __init__(self, bytes_col: str = "bytes", deterministic_fake: bool = False, n_samples: int = 4096):
        self.bytes_col = bytes_col
        self.fake = deterministic_fake
        self.n = n_samples
        try:
            import soundfile  # noqa: F401

            self._codec = "soundfile"
        except ImportError:
            self._codec = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._codec is None and not self.fake:
            raise NotImplementedError(
                "audio decode requires the 'soundfile' (or equivalent) codec "
                "library, which is not installed in this environment; pass "
                "deterministic_fake=True to exercise the pipeline shape"
            )
        col = batch.column(self.bytes_col)
        waves, rates = [], []
        for i in range(batch.num_rows):
            payload = col[i].as_py()
            seed = int.from_bytes(hashlib.blake2b(payload, digest_size=4).digest(), "little")
            t = np.arange(self.n, dtype=np.float32)
            f = 0.002 + (seed % 997) / 99700.0
            waves.append((0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32).tolist())
            rates.append(16000)
        keep = [n for n in batch.schema.names if n != self.bytes_col]
        return (
            batch.select(keep)
            .append_column("waveform", pa.array(waves, pa.list_(pa.float32())))
            .append_column("sample_rate", pa.array(rates, pa.int32()))
        )


def image_resize(ds: Dataset, out_h: int = 64, out_w: int = 64, concurrency=(1, 8), batch_size: int = 8) -> Dataset:
    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_features(ds: Dataset, concurrency=(1, 8), batch_size: int = 8) -> Dataset:
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample(ds: Dataset, stride: int = 2, concurrency=(1, 8), batch_size: int = 8) -> Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_decode(ds: Dataset, deterministic_fake: bool = True, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    return ds.map_batches(
        AudioDecode,
        fn_constructor_kwargs={"deterministic_fake": deterministic_fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImagePHash:
    """64-bit average-hash (aHash) perceptual fingerprint per single-page
    raster blob: downsample to an 8x8 mean grid (block means via one
    reduceat pass per axis — exact, geometry-independent), threshold at the
    grid mean, pack the bits into one int64. Identical renders hash equal;
    small global brightness shifts flip few bits. Downsample index maps are
    cached per source geometry in the actor, same as ImageResize. Exact
    scale invariance holds when both dimensions are divisible by the grid
    (aligned block boundaries); ragged geometries still hash stably, they
    just aren't bit-identical to their resampled variants."""

    def __init__(self, bytes_col: str = "bytes", grid: int = 8):
        self.bytes_col = bytes_col
        self.g = grid
        self._weights = np.left_shift(
            np.uint64(1), np.arange(grid * grid, dtype=np.uint64)
        )
        self._cuts: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _cuts_for(self, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        key = (h, w)
        m = self._cuts.get(key)
        if m is None:
            ys = (np.arange(self.g) * h // self.g).astype(np.intp)
            xs = (np.arange(self.g) * w // self.g).astype(np.intp)
            m = self._cuts[key] = (ys, xs)
        return m

    def _hash_one(self, img: np.ndarray) -> int:
        h, w = img.shape
        ys, xs = self._cuts_for(h, w)
        rows = np.add.reduceat(img.astype(np.float64), ys, axis=0)
        cells = np.add.reduceat(rows, xs, axis=1)
        ny = np.diff(np.append(ys, h)).astype(np.float64)
        nx = np.diff(np.append(xs, w)).astype(np.float64)
        means = cells / np.outer(ny, nx)
        bits = (means.ravel() > means.mean()).astype(np.uint64)
        return int((bits * self._weights).sum() & np.uint64(0x7FFFFFFFFFFFFFFF))

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.bytes_col)
        hashes = [
            self._hash_one(decode_page_pixels(memoryview(col[i].as_buffer())))
            for i in range(batch.num_rows)
        ]
        keep = [n for n in batch.schema.names if n != self.bytes_col]
        return batch.select(keep).append_column("phash", pa.array(hashes, pa.int64()))


def image_phash(ds: Dataset, concurrency=(1, 8), batch_size: int = 8) -> Dataset:
    return ds.map_batches(
        ImagePHash,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def phash_dups(
    ds: Dataset, id_col: str, *, concurrency=(1, 8), num_buckets: int = 64
) -> Dataset:
    """Perceptual-duplicate groups: images with EQUAL aHash fingerprints.
    (id, canonical, phash) for every member of a multi-image hash group,
    canonical = min id. Scale shape: only (id, phash) pairs shuffle — one
    bucketed groupby(phash), pixels never leave the hashing actors."""
    import pandas as pd

    from ..hashing import stable_bucket

    hashed = image_phash(ds, concurrency=concurrency)

    def add_bucket(b: pa.Table) -> pa.Table:
        t = pa.table({id_col: b.column(id_col), "phash": b.column("phash")})
        bk = stable_bucket(t.column("phash"), num_buckets)
        return t.append_column("__bucket", pa.array(bk, pa.int32()))

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        canon = g.groupby("phash", sort=False)[id_col].transform("min")
        size = g.groupby("phash", sort=False)[id_col].transform("size")
        out = g[size >= 2].copy()
        out["canonical"] = canon[size >= 2].to_numpy()
        return out[[id_col, "canonical", "phash"]]

    return (
        hashed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(groups, batch_format="pandas")
    )


def phash_near_dups(
    ds: Dataset,
    id_col: str,
    *,
    max_hamming: int = 4,
    concurrency=(1, 8),
) -> Dataset:
    """Perceptual NEAR-duplicate image pairs (hamming distance <=
    max_hamming over the 64-bit aHash): hash on the actor pool (pixels
    never leave it), then the generic hamming-band blocking
    (dedup.hamming_near_dups — pigeonhole over max_hamming+1 bands,
    lossless, participant-pruned verification)."""
    from .dedup import hamming_near_dups

    hashed = image_phash(ds, concurrency=concurrency)
    return hamming_near_dups(hashed, id_col, "phash", max_hamming=max_hamming)


def media_metadata(
    ds: Dataset, ref_col: str = "media_ref", bytes_col: str = "bytes"
) -> Dataset:
    """HEADER-ONLY media profiling (imagecodecs.sniff_metadata): per blob,
    (format, width, height, bit_depth, n_pages) without decoding a pixel —
    no inflate, no entropy decode, no strip reads. The pre-decode planning
    pass a 100 TB ingest runs first: exact pixel-cost estimates for
    cost-balanced splits, page-count and format-mix histograms, oversized-
    media quarantine — all at a small fraction of decode cost. Unparseable
    headers become format='error' rows (metadata passes must never abort
    on one corrupt blob). Map-only; per-row parse is inherent to binary
    headers and bounded by header size, not payload size."""
    from ..imagecodecs import sniff_metadata

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        out = {ref_col: [], "format": [], "width": [], "height": [], "bit_depth": [], "n_pages": []}
        for ref, blob in zip(b[ref_col], b[bytes_col]):
            try:
                m = sniff_metadata(blob)
            except Exception:  # noqa: BLE001 — quarantine, never abort
                m = {"format": "error", "width": -1, "height": -1, "bit_depth": -1, "n_pages": -1}
            out[ref_col].append(ref)
            for k in ("format", "width", "height", "bit_depth", "n_pages"):
                out[k].append(m[k])
        return pd.DataFrame(out).astype(
            {"width": "int64", "height": "int64", "bit_depth": "int64", "n_pages": "int64"}
        )

    return ds.map_batches(fn, batch_format="pandas")
