"""GIF / BMP / PNM codecs (S1 widening toward the reference's pixRead
format set, tesseract-recognize.cc:514-531) + golden e2e over a corpus
mixing all three."""

import struct

import numpy as np
import pandas as pd
import pytest

import tesseract_recognize_ray.legacycodecs as lc
from tesseract_recognize_ray.imagecodecs import iter_page_images, sniff_format

rng = np.random.default_rng(7)


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_gray_roundtrip(interlace):
    for shape in [(1, 1), (7, 5), (37, 53), (64, 64)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        frames = list(lc.iter_gif_frames(lc.encode_gif_gray(img, interlace=interlace)))
        assert len(frames) == 1
        assert np.array_equal(frames[0], img)


def test_gif_lzw_widths_and_clear():
    # long random stream: exercises 9->12 bit growth and a table-full Clear
    d = rng.integers(0, 256, 400_000, dtype=np.uint8).tobytes()
    assert lc._gif_lzw_decode(lc._gif_lzw_encode(d, 8), 8) == d
    # tiny min_code (bilevel): width starts at 3
    d2 = rng.integers(0, 2, 20_000, dtype=np.uint8).tobytes()
    assert lc._gif_lzw_decode(lc._gif_lzw_encode(d2, 2), 2) == d2


def test_gif_transparency_composites_over_prior_frame():
    """Frame 2 carries a transparent index: transparent pixels must keep
    frame 1's pixels (our white-canvas composite rule)."""
    base = np.full((4, 4), 10, dtype=np.uint8)
    g = bytearray(lc.encode_gif_gray(base))
    trailer = g[-2:]
    assert trailer == b"\x00\x3b"
    del g[-1]  # drop the trailer, keep frame 1's 0x00 terminator
    # GCE: transparency on, index 255
    g += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 255, 0])
    # frame 2: 2x2 at (1,1), indices [[200, 255], [255, 201]]
    g += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
    g.append(8)
    data = lc._gif_lzw_encode(bytes([200, 255, 255, 201]), 8)
    g += bytes([len(data)]) + data + b"\x00\x3b"
    frames = list(lc.iter_gif_frames(bytes(g)))
    assert len(frames) == 2
    f2 = frames[1]
    assert f2[1, 1] == 200 and f2[2, 2] == 201
    assert f2[1, 2] == 10 and f2[2, 1] == 10  # transparent -> prior pixel


def test_gif_local_color_table_inverts():
    img = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    g = bytearray(lc.encode_gif_gray(img))
    # rewrite the image descriptor to carry an INVERTED local table
    desc = 13 + 768  # header + GCT; the descriptor's structural offset
    assert g[desc] == 0x2C
    g[desc + 9] |= 0x87  # LCT flag + size 256
    inv = np.repeat(np.arange(255, -1, -1, dtype=np.uint8), 3)
    g[desc + 10 : desc + 10] = inv.tobytes()
    (frame,) = lc.iter_gif_frames(bytes(g))
    assert np.array_equal(frame, 255 - img)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        list(lc.iter_gif_frames(b"GIF0xnope"))
    with pytest.raises(ValueError, match="no image"):
        # header + GCT + immediate trailer: structurally valid, zero frames
        list(lc.iter_gif_frames(lc.encode_gif_gray(np.zeros((2, 2), np.uint8))[: 13 + 768] + b"\x3b"))


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_pal8_roundtrip(top_down):
    for shape in [(1, 1), (5, 7), (37, 53)]:  # odd widths exercise padding
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(lc.decode_bmp(lc.encode_bmp_gray(img, top_down=top_down)), img)


def test_bmp_24_and_32bpp():
    h, w = 6, 5
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    from tesseract_recognize_ray.imagecodecs import _luma

    lum = _luma(rgb)

    def bmp(bpp: int, px_rows: bytes) -> bytes:
        stride = ((w * bpp + 31) // 32) * 4
        hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + stride * h, 0, 0, 14 + 40)
        hdr += struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, stride * h, 0, 0, 0, 0)
        return hdr + px_rows

    row_pad24 = (((w * 3 + 3) // 4) * 4) - w * 3
    rows24 = b"".join(rgb[y, :, ::-1].tobytes() + b"\x00" * row_pad24 for y in range(h - 1, -1, -1))
    assert np.array_equal(lc.decode_bmp(bmp(24, rows24)), lum)

    bgra = np.concatenate([rgb[:, :, ::-1], np.full((h, w, 1), 255, np.uint8)], axis=2)
    rows32 = b"".join(bgra[y].tobytes() for y in range(h - 1, -1, -1))
    assert np.array_equal(lc.decode_bmp(bmp(32, rows32)), lum)


def test_bmp_rejects_compressed():
    buf = bytearray(lc.encode_bmp_gray(np.zeros((2, 2), np.uint8)))
    struct.pack_into("<I", buf, 30, 2)  # BI_RLE4: still unsupported
    with pytest.raises(ValueError, match="compression 2"):
        lc.decode_bmp(bytes(buf))
    # comp=1 stamped on a raw (non-RLE) payload is now parsed as RLE and
    # must die scoped (the zero padding never reaches end-of-bitmap)
    struct.pack_into("<I", buf, 30, 1)
    with pytest.raises(ValueError, match="RLE8"):
        lc.decode_bmp(bytes(buf))


def test_pnm_variants():
    img = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    assert np.array_equal(lc.decode_pnm(lc.encode_pnm_gray(img)), img)
    bw = np.where(img < 128, 0, 255).astype(np.uint8)
    assert np.array_equal(lc.decode_pnm(lc.encode_pnm_gray(bw, bilevel=True)), bw)
    # header comments + non-255 maxval scaling
    half = b"P5 # comment\n# another\n23 19\n127\n" + (img // 2).tobytes()
    got = lc.decode_pnm(half)
    exp = (((img // 2).astype(np.uint16) * 255 + 63) // 127).astype(np.uint8)
    assert np.array_equal(got, exp)
    # P6 color -> luma
    rgb = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    p6 = b"P6\n6 4\n255\n" + rgb.tobytes()
    from tesseract_recognize_ray.imagecodecs import _luma

    lum = _luma(rgb)
    assert np.array_equal(lc.decode_pnm(p6), lum)
    # 16-bit P5 scales down
    wide = rng.integers(0, 1001, (3, 4)).astype(">u2")
    p5w = b"P5\n4 3\n1000\n" + wide.tobytes()
    exp16 = ((wide.astype(np.uint32) * 255 + 500) // 1000).astype(np.uint8)
    assert np.array_equal(lc.decode_pnm(p5w), exp16)


def test_gif_decodes_from_signed_memoryview():
    """Regression: the flagship actor hands decoders a memoryview over a
    pyarrow Buffer, whose item reads are SIGNED ('b' format) — a sub-block
    length >127 must not walk the parser backwards (infinite loop)."""
    import pyarrow as pa

    img = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    g = lc.encode_gif_gray(img)
    # guarantee the payload actually contains sub-block length 255 (>127)
    assert b"\xff" in g
    scalar = pa.array([g], pa.large_binary())[0]
    buf = memoryview(scalar.as_buffer())
    assert buf.format == "b"  # the trap this test pins down
    (frame,) = lc.iter_gif_frames(buf)
    assert np.array_equal(frame, img)


def test_dispatch_and_sniff():
    img = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    for payload, fmt in (
        (lc.encode_gif_gray(img), "gif"),
        (lc.encode_bmp_gray(img), "bmp"),
        (lc.encode_pnm_gray(img), "pnm"),
        (lc.encode_pnm_gray(np.where(img < 128, 0, 255).astype(np.uint8), bilevel=True), "pnm"),
    ):
        assert sniff_format(payload) == fmt
        pages = list(iter_page_images(payload))
        assert len(pages) == 1 and pages[0][0] == 0


GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[GOLD_COLS].sort_values(["doc_id", "seq"], kind="mergesort").reset_index(drop=True).fillna("<NULL>")
    )


def test_e2e_span_equality_on_legacy_corpus(ray_session):
    """Golden-span gate over GIF/BMP/PNM media (multi-page media stays
    TIFF — none of the three has a page chain the reference expands)."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_legacy", 48, media_encoding="legacy")
    media = pq.read_table(paths["media"])
    kinds = {sniff_format(bytes(b)) for b in media.column("bytes").to_pylist()}
    assert {"gif", "bmp", "pnm"} <= kinds, kinds
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


# ----------------------------------------------------------- BMP BI_RLE8
def test_bmp_rle8_roundtrip():
    from tesseract_recognize_ray.legacycodecs import decode_bmp, encode_bmp_gray

    rng = np.random.default_rng(3)
    img = (rng.integers(0, 8, (37, 61)) * 32).astype(np.uint8)  # worst case
    got = decode_bmp(encode_bmp_gray(img, rle=True))
    assert np.array_equal(got, img)
    # genuine runs (document-like bilevel stripes) actually compress
    stripes = np.repeat(rng.integers(0, 2, (37, 8)) * 255, 8, axis=1).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp_gray(stripes, rle=True)), stripes)
    assert len(encode_bmp_gray(stripes, rle=True)) < len(encode_bmp_gray(stripes))
    with pytest.raises(ValueError, match="bottom-up"):
        encode_bmp_gray(img, rle=True, top_down=True)


def test_bmp_rle8_absolute_delta_and_poison():
    """Hand-crafted stream exercising the escapes the fixture encoder never
    emits: absolute mode (word-padded literals), delta (skipped pixels stay
    index 0), and the missing-EOB poison."""
    import struct

    from tesseract_recognize_ray.legacycodecs import decode_bmp

    body = bytes(
        [0, 5, 1, 2, 3, 4, 5, 0,  # absolute mode: 5 literals + pad
         1, 9, 0, 0,              # run 1 of 9, EOL (-> bitmap y=1)
         0, 2, 2, 2,              # delta +2,+2 (-> x=2, bitmap y=3)
         3, 7, 0, 0, 0, 0, 0, 1]  # run 3 of 7, EOL, EOL... EOB
    )
    pal = np.zeros((256, 4), np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    data_off = 14 + 40 + 1024
    hdr = bytearray(b"BM")
    hdr += struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, 6, 4, 1, 8, 1, len(body), 2835, 2835, 256, 0)
    hdr += pal.tobytes() + body
    got = decode_bmp(bytes(hdr))
    want = np.zeros((4, 6), np.uint8)
    want[3, :5] = [1, 2, 3, 4, 5]  # bitmap row 0 = bottom image row
    want[3, 5] = 9
    want[0, 2:5] = 7  # bitmap row 3 (delta target) = top image row
    assert np.array_equal(got, want), got.tolist()
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(bytes(hdr[:-2]))
