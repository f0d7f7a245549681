"""WEBP (lossless VP8L) codec — final S1 widening toward the reference's
pixRead format set (tesseract-recognize.cc:514-531; leptonica decodes WEBP
where compiled in). From-scratch decode per the public WebP Lossless
Bitstream Specification; the fixture encoder drives every decoder branch.
Lossy VP8 quarantines (scoped error) but still header-profiles."""

import struct
import time

import numpy as np
import pandas as pd
import pytest

import tesseract_recognize_ray.webpcodec as wc
from tesseract_recognize_ray.imagecodecs import iter_page_images, sniff_format, sniff_metadata

rng = np.random.default_rng(11)


def _rt(img, **kw):
    enc = wc.encode_webp_gray(img, **kw)
    dec = wc.decode_webp(enc)
    assert dec.shape == img.shape
    assert np.array_equal(dec, img), kw
    return enc


def test_plain_and_lz77_paths():
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    txt = np.full((30, 50), 255, np.uint8)
    txt[8:20, 10:30] = 0
    _rt(img)
    _rt(img, use_lz77=False)
    _rt(txt, mapped_dist=False)  # linear (non-mapped) distance codes
    _rt(np.array([[77]], np.uint8))
    _rt(rng.integers(0, 256, (100, 3), dtype=np.uint8))


@pytest.mark.parametrize("bits", [1, 4, 8, 11])
def test_color_cache(bits):
    # repeated values force cache hits at every tested hash width
    img = (rng.integers(0, 6, (20, 30)) * 40).astype(np.uint8)
    _rt(img, cache_bits=bits)


@pytest.mark.parametrize("mode", range(14))
def test_all_predictor_modes(mode):
    grad = (np.arange(24)[:, None] * 5 + np.arange(40)[None, :]).astype(np.uint8)
    _rt(grad, predictor_mode=mode)
    _rt(rng.integers(0, 256, (17, 19), dtype=np.uint8), predictor_mode=mode)


def test_subtract_green_and_color_transform():
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    _rt(img, subtract_green=True)
    _rt(img, color_transform=(3, 251, 7))
    _rt(img, subtract_green=True, predictor_mode=11, cache_bits=3)


@pytest.mark.parametrize("ncolors", [2, 4, 13, 16, 200])
def test_palette_every_bundling_width(ncolors):
    # ncolors spans all four pixel-bundling widths (8/4/2/1 px per byte)
    vals = np.linspace(0, 255, ncolors).astype(np.uint8)
    img = vals[rng.integers(0, ncolors, (24, 37))]
    _rt(img, palette=True)
    _rt(img, palette=True, cache_bits=2)


def test_meta_prefix_groups_and_vp8x():
    txt = np.full((30, 50), 255, np.uint8)
    txt[8:20, 10:30] = 0
    _rt(txt, meta_groups=2)
    enc = _rt(rng.integers(0, 256, (12, 18), dtype=np.uint8), vp8x=True)
    assert enc[12:16] == b"VP8X"


def test_dispatch_and_header_only_metadata():
    img = rng.integers(0, 256, (23, 41), dtype=np.uint8)
    for kw in ({}, {"vp8x": True}):
        payload = wc.encode_webp_gray(img, **kw)
        assert sniff_format(payload) == "webp"
        pages = list(iter_page_images(payload))
        assert len(pages) == 1 and pages[0][0] == 0
        assert np.array_equal(pages[0][1], img)
        meta = sniff_metadata(payload)
        assert meta == {"format": "webp", "width": 41, "height": 23, "bit_depth": 8, "n_pages": 1}


def test_alpha_composites_over_white():
    """Non-opaque pixels follow the GIF/BMP composite rule (over white)."""
    img = np.full((4, 4), 0, np.uint8)
    enc = bytearray(wc.encode_webp_gray(img, use_lz77=False))
    # rebuild the stream with alpha 128 on every pixel via the raw encoder
    pix = [(128 << 24) | 0] * 16
    bw = wc._BitWriter()
    bw.write(3, 14)
    bw.write(3, 14)
    bw.write(1, 1)  # alpha hint
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    wc._emit_image_stream(bw, pix, 4, 4, level0=True)
    payload = b"\x2f" + bw.done()
    enc = b"RIFF" + struct.pack("<I", 12 + len(payload) + (len(payload) & 1)) + b"WEBP"
    enc += b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        enc += b"\x00"
    dec = wc.decode_webp(enc)
    # 0 luma at alpha 128 over white: (0*128 + 255*127 + 127)//255 = 127
    assert np.all(dec == 127)


def test_lossy_vp8_quarantines_but_profiles():
    """A lossy VP8 payload raises the scoped error (quarantine row) while
    webp_metadata still serves dims from the keyframe header."""
    # minimal VP8 keyframe header: 3-byte frame tag, sync code, 14-bit dims
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert sniff_format(payload) == "webp"
    with pytest.raises(ValueError, match="lossy VP8"):
        wc.decode_webp(payload)
    assert sniff_metadata(payload) == {
        "format": "webp", "width": 320, "height": 240, "bit_depth": 8, "n_pages": 1,
    }


def test_corrupt_webp_fails_fast_never_hangs():
    img = rng.integers(0, 256, (24, 36), dtype=np.uint8)
    payloads = [
        wc.encode_webp_gray(img),
        wc.encode_webp_gray(img, predictor_mode=9, cache_bits=4),
        wc.encode_webp_gray((img // 64 * 64), palette=True),
        wc.encode_webp_gray(img, meta_groups=2),
    ]
    for p in payloads:
        cases = [p[: int(len(p) * f)] for f in (0.25, 0.5, 0.75, 0.95)]
        for _ in range(15):
            c = bytearray(p)
            for i in rng.integers(0, len(c), 20):
                c[i] ^= 0xFF
            cases.append(bytes(c))
        for t in cases:
            t0 = time.time()
            try:
                list(iter_page_images(t))
            except Exception:
                pass  # clean errors are the contract; hangs are the bug
            assert time.time() - t0 < 5.0


GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[GOLD_COLS].sort_values(["doc_id", "seq"], kind="mergesort").reset_index(drop=True).fillna("<NULL>")
    )


def test_e2e_span_equality_on_webp_corpus(ray_session):
    """Golden-span gate over VP8L media drawn across the transform paths
    (multi-page media stays TIFF — WebP is single-frame without ANIM)."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_webp", 48, media_encoding="webp")
    media = pq.read_table(paths["media"])
    kinds = {sniff_format(bytes(b)) for b in media.column("bytes").to_pylist()}
    assert "webp" in kinds, kinds
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))
