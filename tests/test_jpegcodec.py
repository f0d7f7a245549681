"""From-scratch baseline JPEG codec (S1 real-format front end, reference
pixRead tesseract-recognize.cc:514-531) + golden e2e over a JPEG corpus.

The spec-vector test hand-assembles an 8x8 DC-only JPEG whose entropy bits
are computed by hand from T.81's canonical-code rule, so the decoder is
checked against the published standard, not just against our own encoder."""

import struct

import numpy as np
import pandas as pd
import pytest

from tesseract_recognize_ray import imagecodecs as ic
from tesseract_recognize_ray import jpegcodec as jc

rng = np.random.default_rng(7)


def test_uniform_image_exact_roundtrip():
    img = np.full((24, 40), 128, dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=90))
    assert out.shape == img.shape
    assert (out == img).all()


def test_gradient_near_lossless_and_deterministic():
    x = np.linspace(0, 255, 64)[None, :] * np.ones((48, 1))
    img = np.clip(x, 0, 255).astype(np.uint8)
    enc = jc.encode_jpeg_gray(img, quality=95)
    assert jc.encode_jpeg_gray(img, quality=95) == enc  # fixture determinism
    out = jc.decode_jpeg(enc)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def _bilevel_page():
    img = np.full((100, 141), 255, dtype=np.uint8)  # non-multiple-of-8 dims
    img[20:30, 10:120] = 0
    img[50:80, 40:48] = 0
    img[88:96, 100:130] = 0
    return img


@pytest.mark.parametrize("mode", ["gray", "ycbcr444", "ycbcr420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_bilevel_binarization_invariant_all_modes(mode, ri):
    """Every decode path (1-comp, interleaved 4:4:4, subsampled 4:2:0, with
    and without restart markers) preserves the BIN_THRESHOLD=128 mask — the
    invariant the OCR golden-span gate rests on."""
    img = _bilevel_page()
    out = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=95, mode=mode, restart_interval=ri))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8
    assert ((out < 128) == (img < 128)).all()


def _hand_jpeg(dqt_16bit=False):
    """8x8 grayscale, quant all-ones, single DC coefficient 80.

    Entropy bits derived by hand from Annex K tables + the canonical code
    construction: DC category 7 -> code 11110, magnitude 80 -> 1010000,
    EOB (AC symbol 0x00, 4th value, first len-4 code) -> 1010.
    Total 16 bits = 0xF5 0x0A. Expected pixels: 80/8 + 128 = 138.
    """
    ones = b"\x01" * 64
    if dqt_16bit:
        dqt = bytes([0x10]) + b"\x00\x01" * 64
    else:
        dqt = bytes([0x00]) + ones
    out = bytearray(b"\xff\xd8")
    out += jc._seg(0xDB, dqt)
    out += jc._seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += jc._seg(0xC4, jc._dht_body(0, 0, jc.HUFF_DC_LUMA) + jc._dht_body(1, 0, jc.HUFF_AC_LUMA))
    out += jc._seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes([0xF5, 0x0A])
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dqt_16bit", [False, True])
def test_hand_assembled_spec_vector(dqt_16bit):
    out = jc.decode_jpeg(_hand_jpeg(dqt_16bit))
    assert out.shape == (8, 8)
    assert (out == 138).all()


def test_rejects_arithmetic_and_bad_soi():
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(jc.encode_jpeg_gray(img))
    pos = enc.find(b"\xff\xc0")
    enc[pos + 1] = 0xC9  # SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(ValueError, match="SOF9"):
        jc.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"nonsense")


@pytest.mark.parametrize("mode", ["gray", "ycbcr444", "ycbcr420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_progressive_decode_matches_baseline(mode, ri):
    """A progressive (SOF2) file carries the SAME quantized coefficients as
    the baseline file of the same image/quality, split across spectral-
    selection + successive-approximation scans — so decode must be
    pixel-identical. Exercises DC first/refine (interleaved and not), AC
    first/refine with EOB runs, ZRL-in-refinement, chroma-scan skipping,
    and per-scan restart markers."""
    img = rng.integers(0, 256, (52, 77), dtype=np.uint8)
    base = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=92, mode=mode))
    prog = jc.decode_jpeg(
        jc.encode_jpeg_gray(img, quality=92, mode=mode, progressive=True, restart_interval=ri)
    )
    assert (base == prog).all()


def test_progressive_sparse_and_flat_blocks():
    """Degenerate coefficient patterns: all-flat (pure EOB-run scans) and a
    single hot block (long zero runs -> ZRL paths in first AND refine scans)."""
    flat = np.full((40, 48), 200, dtype=np.uint8)
    assert (jc.decode_jpeg(jc.encode_jpeg_gray(flat, progressive=True)) == flat).all()
    img = np.full((40, 48), 255, dtype=np.uint8)
    img[16:24, 16:24] = np.arange(64, dtype=np.uint8).reshape(8, 8)
    base = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=98))
    prog = jc.decode_jpeg(jc.encode_jpeg_gray(img, quality=98, progressive=True))
    assert (base == prog).all()


def test_sniff_and_page_dispatch():
    img = rng.integers(0, 256, (16, 17), dtype=np.uint8)
    enc = jc.encode_jpeg_gray(img, quality=98)
    assert ic.sniff_format(enc) == "jpeg"
    ((p, got),) = list(ic.iter_page_images(enc))
    assert p == 0
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 16


GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[GOLD_COLS].sort_values(["doc_id", "seq"], kind="mergesort").reset_index(drop=True).fillna("<NULL>")
    )


def test_e2e_span_equality_on_jpeg_corpus(ray_session):
    """North-star gate over lossy-encoded media: a JPEG-q95 corpus must
    reproduce byte-identical golden spans (bilevel glyph pages binarize
    identically after the round trip)."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_jpeg", 48, media_encoding="jpeg")
    media = pq.read_table(paths["media"])
    heads = [bytes(b)[:3] for b in media.column("bytes").to_pylist()]
    assert any(h == b"\xff\xd8\xff" for h in heads), "corpus should contain JPEG media"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


def test_e2e_span_equality_on_progressive_jpeg_corpus(ray_session):
    """Same golden-span gate over SOF2 progressive media (drawn scan modes +
    restart intervals) — the real-world encoding the round-3 verdict called
    the top codec gap."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_jprog", 48, media_encoding="jpeg_progressive")
    media = pq.read_table(paths["media"])
    assert any(
        bytes(b)[:3] == b"\xff\xd8\xff" and b"\xff\xc2" in bytes(b)
        for b in media.column("bytes").to_pylist()
    ), "corpus should contain SOF2 progressive media"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))
