"""Property-based tests (hypothesis) over the pure-function core — no Ray
session needed. These guard the invariants the distributed pipelines rely
on: stable hashing co-location, page-set parsing, geometry round trips,
sentinel filling, and the windowing arithmetic."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tesseract_recognize_ray.geometry import (
    UP,
    clip_baseline,
    invert_rot90_bbox,
    invert_rot90_point,
    polystripe,
    polystripe_coords,
    quad_from_bbox,
)
from tesseract_recognize_ray.hashing import stable_bucket
from tesseract_recognize_ray.idscheme import parse_pages_set

ids = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=24)


@settings(max_examples=200, deadline=None)
@given(st.lists(ids, min_size=1, max_size=50), st.integers(min_value=1, max_value=128))
def test_stable_bucket_deterministic_and_colocating(keys, p):
    """Same key -> same bucket, always in range, independent of the batch it
    arrives in (the co-location contract every bucketed shuffle relies on)."""
    a = stable_bucket(pd.Series(keys), p)
    assert ((a >= 0) & (a < p)).all()
    # single-element batches give identical assignments
    for k, b in zip(keys, a):
        assert stable_bucket(pd.Series([k]), p)[0] == b


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12, unique=True))
def test_parse_pages_set_roundtrip(pages):
    """Any page set survives spec rendering: singletons + maximal runs."""
    pages = sorted(pages)
    parts, i = [], 0
    while i < len(pages):
        j = i
        while j + 1 < len(pages) and pages[j + 1] == pages[j] + 1:
            j += 1
        parts.append(str(pages[i]) if i == j else f"{pages[i]}-{pages[j]}")
        i = j + 1
    assert parse_pages_set(",".join(parts)) == pages  # sorted, deduped list


_boxes = st.tuples(
    st.integers(0, 500), st.integers(0, 500), st.integers(1, 500), st.integers(1, 500)
).map(lambda t: (min(t[0], t[0] + t[2]), min(t[1], t[1] + t[3]), t[0] + t[2], t[1] + t[3]))


@settings(max_examples=200, deadline=None)
@given(_boxes, st.integers(0, 3))
def test_quad_orientation_same_point_set(box, orient):
    """Vertex order rotation (M7) permutes the SAME four corners."""
    x0, y0, x1, y1 = box
    q_up = quad_from_bbox(x0, y0, x1, y1, UP)
    q_o = quad_from_bbox(x0, y0, x1, y1, orient)
    assert sorted(q_up) == sorted(q_o)
    # and the order is a rotation of the UP order
    k = q_o.index(q_up[0])
    assert [q_o[(k + i) % 4] for i in range(4)] == q_up


@settings(max_examples=200, deadline=None)
@given(_boxes, st.integers(0, 3), st.integers(1, 4000), st.integers(1, 4000))
def test_invert_rot90_roundtrip(box, k, w_h, h_h):
    """invert(forward) identity: original-space bbox mapped back to upright
    equals the input (checked via the inverse-of-inverse)."""
    x0, y0, x1, y1 = box
    up_w, up_h = max(x1, w_h), max(y1, h_h)
    ox0, oy0, ox1, oy1 = invert_rot90_bbox(x0, y0, x1, y1, k, up_w, up_h)
    # invert again with the complementary rotation and swapped dims
    k_inv = (4 - k) % 4
    ow, oh = (up_h, up_w) if k % 2 else (up_w, up_h)
    rx0, ry0, rx1, ry1 = invert_rot90_bbox(ox0, oy0, ox1, oy1, k_inv, ow, oh)
    assert (rx0, ry0, rx1, ry1) == (x0, y0, x1, y1)
    # point version agrees with the bbox corners
    pts = {invert_rot90_point(x0, y0, k, up_w, up_h), invert_rot90_point(x1, y1, k, up_w, up_h)}
    assert {(ox0, oy0), (ox1, oy1)} == {
        (min(p[0] for p in pts), min(p[1] for p in pts)),
        (max(p[0] for p in pts), max(p[1] for p in pts)),
    }


@settings(max_examples=200, deadline=None)
@given(_boxes, st.integers(0, 100))
def test_polystripe_reproduces_axis_aligned_quad(box, dy):
    """For an axis-aligned line with a horizontal baseline inside the box,
    the polystripe polygon equals the bbox quad (M8 emission invariant)."""
    x0, y0, x1, y1 = box
    by = min(y1, y0 + dy)
    quad = quad_from_bbox(x0, y0, x1, y1, UP)
    base = clip_baseline(((float(x0), float(by)), (float(x1), float(by))), quad)
    h, o = polystripe(base, quad)
    assert abs(h - (y1 - y0)) < 1e-9
    pts = polystripe_coords(base, quad)
    got = [(round(x), round(y)) for x, y in pts]
    assert got == [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.booleans(), min_size=1, max_size=8),
    st.integers(0, 200),
)
def test_fill_sentinel_words_no_sentinels_remain(sentinel_mask, seed):
    """After the G4 filler, no word keeps the all-zero sentinel, real words
    are untouched, and filled flags mark exactly the sentinel inputs."""
    from tesseract_recognize_ray.stages.assemble import fill_sentinel_words

    rng = np.random.default_rng(seed)
    n = len(sentinel_mask)
    x0 = np.sort(rng.integers(1, 500, n))
    w = pd.DataFrame(
        {
            "x0": x0,
            "y0": np.full(n, 10),
            "x1": x0 + rng.integers(1, 30, n),
            "y1": np.full(n, 30),
        }
    )
    for i, s in enumerate(sentinel_mask):
        if s:
            w.loc[i, ["x0", "y0", "x1", "y1"]] = 0
    out = fill_sentinel_words(w, (0, 10, 600, 30))
    assert list(out["coords_filled"]) == sentinel_mask
    assert not ((out[["x0", "y0", "x1", "y1"]] == 0).all(axis=1)).any()
    for i, s in enumerate(sentinel_mask):
        if not s:
            assert tuple(out.loc[i, ["x0", "y0", "x1", "y1"]]) == tuple(w.loc[i, ["x0", "y0", "x1", "y1"]])


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=2, max_value=5).flatmap(
        lambda k: st.lists(
            st.tuples(*[st.integers(min_value=0, max_value=7)] * k),
            min_size=1,
            max_size=80,
        )
    )
)
def test_frontier_mask_is_exact_dominance_complement(rows):
    """skyline's per-block kernel: kept set == rows not strictly dominated
    (NOT-EXISTS semantics: duplicates never dominate each other), for any
    dimensionality — the same invariant the DuckDB oracle checks at sf0.01."""
    from tesseract_recognize_ray.functions.relational import _frontier_mask

    vals = np.array(rows, dtype=np.float64)
    got = _frontier_mask(vals)
    for i in range(len(vals)):
        dominated = any(
            (vals[j] <= vals[i]).all() and (vals[j] < vals[i]).any()
            for j in range(len(vals))
            if j != i
        )
        assert got[i] == (not dominated), (i, vals[i])


# ------------------------------------------------------------- image codecs


@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    enc=st.sampled_from(
        ["png", "png_adam7", "tiff1", "tiff5", "tiff8", "tiff32773", "tiff5p2", "gif", "gif_i", "bmp", "bmp_td", "p5", "p4"]
    ),
)
@settings(max_examples=120, deadline=None)
def test_lossless_codecs_roundtrip_through_dispatch(h, w, seed, enc):
    """Every lossless encoder's output must decode back byte-identical via
    the SAME magic-byte dispatch the flagship actor uses."""
    from tesseract_recognize_ray import legacycodecs as lc
    from tesseract_recognize_ray.imagecodecs import (
        encode_png_gray,
        encode_tiff_gray,
        iter_page_images,
    )

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    if enc == "p4":
        img = np.where(img < 128, 0, 255).astype(np.uint8)
    payload = {
        "png": lambda: encode_png_gray(img),
        "png_adam7": lambda: encode_png_gray(img, interlace=True),
        "tiff1": lambda: encode_tiff_gray([img]),
        "tiff5": lambda: encode_tiff_gray([img], compression=5, rows_per_strip=7),
        "tiff8": lambda: encode_tiff_gray([img], compression=8),
        "tiff32773": lambda: encode_tiff_gray([img], compression=32773, rows_per_strip=3),
        "tiff5p2": lambda: encode_tiff_gray([img], compression=5, predictor=2),
        "gif": lambda: lc.encode_gif_gray(img),
        "gif_i": lambda: lc.encode_gif_gray(img, interlace=True),
        "bmp": lambda: lc.encode_bmp_gray(img),
        "bmp_td": lambda: lc.encode_bmp_gray(img, top_down=True),
        "p5": lambda: lc.encode_pnm_gray(img),
        "p4": lambda: lc.encode_pnm_gray(img, bilevel=True),
    }[enc]()
    pages = list(iter_page_images(payload))
    assert len(pages) == 1 and pages[0][0] == 0
    assert np.array_equal(pages[0][1], img)


@settings(max_examples=40, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=" abcdefgh\t\n", min_size=0, max_size=60), min_size=1, max_size=8
    )
)
def test_simhash_md5_vectorized_equals_naive(texts):
    """The factorize/reduceat simhash path (md5 mode) must equal the naive
    per-token-occurrence definition — including duplicate tokens (vote
    weighting), empty docs, and mixed whitespace."""
    import hashlib

    import pandas as pd

    from tesseract_recognize_ray.functions import dedup as F_dedup

    got = None

    # capture the per-batch fn via a stub dataset and run it in-process
    # (no Ray session needed for a property test)
    class _StubDS:
        def map_batches(self, fn, batch_format=None):
            nonlocal got
            got = fn(pd.DataFrame({"id": range(len(texts)), "t": texts}))
            return None

    F_dedup.simhash64(_StubDS(), "id", "t", hash_fn="md5")
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            want = "0" * 16
        else:
            acc = [0] * 64
            for w in toks:
                h = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
                for b in range(64):
                    acc[b] += 1 if (h >> b) & 1 else -1
            v = sum(1 << b for b in range(64) if acc[b] > 0)
            want = f"{v:016x}"
        assert got["simhash"].iloc[i] == want, (i, t)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=90),
    h=st.integers(min_value=1, max_value=70),
    fmt=st.sampled_from(["png", "tiff", "jpeg", "gif", "bmp", "pnm", "pdf", "webp"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_sniff_metadata_agrees_with_encoder_input(w, h, fmt, seed):
    """Property: for every encoder and any dims, header-only metadata
    reports exactly the encoded dimensions and page count."""
    import numpy as np

    from tesseract_recognize_ray import legacycodecs as lcod
    from tesseract_recognize_ray.imagecodecs import (
        encode_png_gray,
        encode_tiff_gray,
        sniff_metadata,
    )
    from tesseract_recognize_ray.jpegcodec import encode_jpeg_gray
    from tesseract_recognize_ray.pdfcodec import encode_pdf_scanned

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    if fmt == "png":
        blob, pages = encode_png_gray(img), 1
    elif fmt == "tiff":
        blob, pages = encode_tiff_gray([img, img]), 2
    elif fmt == "jpeg":
        blob, pages = encode_jpeg_gray(img, quality=95, mode="gray"), 1
    elif fmt == "gif":
        blob, pages = lcod.encode_gif_gray(img), 1
    elif fmt == "bmp":
        blob, pages = lcod.encode_bmp_gray(img), 1
    elif fmt == "pnm":
        blob, pages = lcod.encode_pnm_gray(img), 1
    elif fmt == "webp":
        from tesseract_recognize_ray.webpcodec import encode_webp_gray

        blob, pages = encode_webp_gray(img), 1
    else:
        blob, pages = encode_pdf_scanned([img]), 1
    m = sniff_metadata(blob)
    assert (m["format"], m["width"], m["height"], m["n_pages"]) == (fmt, w, h, pages)


# ------------------------------------------ WS_NORM cross-engine contract
def test_ws_norm_tokenizer_equivalence_hypothesis():
    """The exact-twin contract (ml.WS_NORM_*): after normalization, Arrow
    utf8_split_whitespace, Python str.split() and DuckDB's RE2 '\\s+' must
    produce IDENTICAL token lists for ARBITRARY unicode text — this is the
    invariant dsir_topk_docs and doc_quality_logreg_exact replay through.
    Any whitespace-ish codepoint missing from the map shows up here as a
    counterexample."""
    import re

    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc
    from hypothesis import find
    from hypothesis import strategies as st

    from tesseract_recognize_ray.functions.ml import WS_NORM_PY, WS_NORM_RE2

    con = duckdb.connect()
    py_norm = re.compile(WS_NORM_PY)

    def mismatch(text: str) -> bool:
        arrow_norm = pc.replace_substring_regex(pa.array([text]), WS_NORM_RE2, " ")
        arrow_toks = [t for t in pc.utf8_split_whitespace(arrow_norm)[0].as_py() if t]
        py_toks = py_norm.sub(" ", text).split()
        sql_toks = con.execute(
            "SELECT list_filter(string_split_regex("
            f"regexp_replace(?, '{WS_NORM_RE2}', ' ', 'g'), '\\s+'), x -> x <> '')",
            [text],
        ).fetchone()[0]
        return not (arrow_toks == py_toks == list(sql_toks))

    # hypothesis.find raises NoSuchExample when NO counterexample exists —
    # that's the pass condition; a found example prints the offending text
    import pytest
    from hypothesis.errors import NoSuchExample

    with pytest.raises(NoSuchExample):
        find(
            st.text(max_size=40),
            mismatch,
            settings=__import__("hypothesis").settings(
                max_examples=500, deadline=None
            ),
        )

    # and the documented exotic characters are definitely normalized
    for ch in "\x0b\x1c\x1d\x1e\x1f\x85\xa0        　":
        assert not mismatch(f"a{ch}b"), hex(ord(ch))
