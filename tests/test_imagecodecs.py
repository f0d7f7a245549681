"""From-scratch PNG / uncompressed-TIFF codecs (S1 real-format front end,
reference pixRead tesseract-recognize.cc:514-531) + golden e2e over a
PNG/TIFF-encoded corpus."""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from tesseract_recognize_ray import imagecodecs as ic

rng = np.random.default_rng(1)


def _png(ihdr_fields, scanlines, plte=None):
    ihdr = struct.pack(">IIBBBBB", *ihdr_fields)
    out = ic.PNG_SIG + ic._chunk(b"IHDR", ihdr)
    if plte is not None:
        out += ic._chunk(b"PLTE", plte.tobytes())
    return out + ic._chunk(b"IDAT", zlib.compress(scanlines)) + ic._chunk(b"IEND", b"")


def _luma(rgb):
    r, g, b = (rgb[..., i].astype(np.uint32) for i in range(3))
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


def test_png_gray_roundtrip_and_sniff():
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    png = ic.encode_png_gray(img)
    assert ic.sniff_format(png) == "png"
    assert (ic.decode_png(png) == img).all()
    # stable bytes for stable input (fixture determinism contract)
    assert ic.encode_png_gray(img) == png


def test_png_all_filter_types_decode():
    img = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    h, w = img.shape
    # Sub (1): delta vs left
    d = img.copy()
    d[:, 1:] = img[:, 1:] - img[:, :-1]
    body = b"".join(b"\x01" + d[y].tobytes() for y in range(h))
    assert (ic.decode_png(_png((w, h, 8, 0, 0, 0, 0), body)) == img).all()
    # Up (2): delta vs previous row
    d = img.copy()
    d[1:] = img[1:] - img[:-1]
    body = b"".join(b"\x02" + d[y].tobytes() for y in range(h))
    assert (ic.decode_png(_png((w, h, 8, 0, 0, 0, 0), body)) == img).all()
    # Average (3) and Paeth (4): encode with the reference recurrences
    for ftype in (3, 4):
        parts = []
        prev = np.zeros(w, dtype=int)
        for y in range(h):
            cur = img[y].astype(int)
            enc = np.empty(w, dtype=np.uint8)
            line = np.empty(w, dtype=int)
            for i in range(w):
                a = line[i - 1] if i >= 1 else 0
                b_, c = int(prev[i]), (int(prev[i - 1]) if i >= 1 else 0)
                if ftype == 3:
                    pred = (a + b_) >> 1
                else:
                    p = a + b_ - c
                    pred = (
                        a
                        if (abs(p - a) <= abs(p - b_) and abs(p - a) <= abs(p - c))
                        else (b_ if abs(p - b_) <= abs(p - c) else c)
                    )
                line[i] = cur[i]
                enc[i] = (cur[i] - pred) & 0xFF
            parts.append(bytes([ftype]) + enc.tobytes())
            prev = cur
        assert (ic.decode_png(_png((w, h, 8, 0, 0, 0, 0), b"".join(parts))) == img).all(), ftype


def test_png_color_types_to_grayscale():
    rgb = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    body = b"".join(b"\x00" + rgb[y].tobytes() for y in range(11))
    assert (ic.decode_png(_png((13, 11, 8, 2, 0, 0, 0), body)) == _luma(rgb)).all()
    # palette
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (7, 9), dtype=np.uint8)
    body = b"".join(b"\x00" + idx[y].tobytes() for y in range(7))
    assert (ic.decode_png(_png((9, 7, 8, 3, 0, 0, 0), body, plte=pal)) == _luma(pal[idx])).all()
    # RGBA over white
    rgba = rng.integers(0, 256, (5, 6, 4), dtype=np.uint8)
    body = b"".join(b"\x00" + rgba[y].tobytes() for y in range(5))
    a = rgba[..., 3].astype(np.uint32)
    want = ((_luma(rgba[..., :3]).astype(np.uint32) * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    assert (ic.decode_png(_png((6, 5, 8, 6, 0, 0, 0), body)) == want).all()
    # gray+alpha
    ga = rng.integers(0, 256, (5, 6, 2), dtype=np.uint8)
    body = b"".join(b"\x00" + ga[y].tobytes() for y in range(5))
    v, a = ga[..., 0].astype(np.uint32), ga[..., 1].astype(np.uint32)
    want = ((v * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    assert (ic.decode_png(_png((6, 5, 8, 4, 0, 0, 0), body)) == want).all()
    # 1-bit bilevel
    bil = rng.integers(0, 2, (9, 21), dtype=np.uint8)
    packed = np.packbits(bil, axis=1)
    body = b"".join(b"\x00" + packed[y].tobytes() for y in range(9))
    assert (ic.decode_png(_png((21, 9, 1, 0, 0, 0, 0), body)) == bil * 255).all()


def test_png_rejects_unknown_interlace_and_bad_sig():
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    body = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    with pytest.raises(ValueError, match="interlace method"):
        ic.decode_png(_png((4, 4, 8, 0, 0, 0, 2), body))
    with pytest.raises(ValueError, match="signature"):
        ic.decode_png(b"nonsense")


@pytest.mark.parametrize(
    "shape", [(1, 1), (3, 5), (7, 7), (8, 8), (9, 17), (100, 141)]
)
def test_png_adam7_gray_roundtrip(shape):
    """Adam7 deinterlace is exact for every pass-lattice edge case: images
    smaller than one 8x8 tile leave whole passes empty (zero bytes, not
    even filter bytes)."""
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    enc = ic.encode_png_gray(img, interlace=True)
    assert ic.sniff_format(enc) == "png"
    assert (ic.decode_png(enc) == img).all()
    # interlaced and sequential encodings of the same pixels decode equal
    assert (ic.decode_png(ic.encode_png_gray(img)) == img).all()


def test_png_adam7_color_types():
    """Adam7 applies per color type: each pass row is filtered and (for
    sub-byte depths) bit-packed independently."""
    rgb = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    body = ic._interlace_adam7_bytes(rgb)
    assert (ic.decode_png(_png((31, 23, 8, 2, 0, 0, 1), body)) == _luma(rgb)).all()
    rgba = rng.integers(0, 256, (13, 9, 4), dtype=np.uint8)
    body = ic._interlace_adam7_bytes(rgba)
    a = rgba[..., 3].astype(np.uint32)
    want = ((_luma(rgba[..., :3]).astype(np.uint32) * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
    assert (ic.decode_png(_png((9, 13, 8, 6, 0, 0, 1), body)) == want).all()
    bil = rng.integers(0, 2, (37, 53), dtype=np.uint8) * np.uint8(255)
    body = ic._interlace_adam7_bytes(bil[:, :, None], depth=1)
    assert (ic.decode_png(_png((53, 37, 1, 0, 0, 0, 1), body)) == bil).all()


def test_tiff_multipage_roundtrip():
    imgs = [
        rng.integers(0, 256, (37, 53), dtype=np.uint8),
        rng.integers(0, 256, (20, 31), dtype=np.uint8),
        rng.integers(0, 256, (8, 8), dtype=np.uint8),
    ]
    tif = ic.encode_tiff_gray(imgs)
    assert ic.sniff_format(tif) == "tiff"
    pages = list(ic.iter_tiff_pages(tif))
    assert len(pages) == 3
    for got, want in zip(pages, imgs):
        assert (got == want).all()


def _be_tiff(img, photometric=1, rows_per_strip=8):
    """Hand-built BIG-endian multi-strip gray TIFF (inline SHORTs are
    left-justified per spec)."""
    h, w = img.shape
    strips = [img[y : y + rows_per_strip].tobytes() for y in range(0, h, rows_per_strip)]
    out = bytearray(b"MM\x00*") + struct.pack(">I", 0)
    offs = []
    for s in strips:
        offs.append(len(out))
        out += s
    if len(out) % 2:
        out += b"\x00"
    off_pos = len(out)
    for o in offs:
        out += struct.pack(">I", o)
    cnt_pos = len(out)
    for s in strips:
        out += struct.pack(">I", len(s))
    struct.pack_into(">I", out, 4, len(out))
    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, 1),
        (262, 3, 1, photometric),
        (273, 4, len(offs), off_pos if len(offs) > 1 else offs[0]),
        (277, 3, 1, 1),
        (278, 4, 1, rows_per_strip),
        (279, 4, len(strips), cnt_pos if len(strips) > 1 else len(strips[0])),
    ]
    out += struct.pack(">H", len(entries))
    for tag, typ, n, v in entries:
        vv = (v << 16) if (typ == 3 and n == 1) else v
        out += struct.pack(">HHII", tag, typ, n, vv)
    out += struct.pack(">I", 0)
    return bytes(out)


def test_tiff_big_endian_multistrip_and_whiteiszero():
    img = rng.integers(0, 256, (16, 10), dtype=np.uint8)
    (pg,) = ic.iter_tiff_pages(_be_tiff(img))
    assert (pg == img).all()
    (pg0,) = ic.iter_tiff_pages(_be_tiff(img, photometric=0))
    assert (pg0 == 255 - img).all()


def test_tiff_rejects_unsupported_compression():
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    tif = bytearray(ic.encode_tiff_gray([img]))
    # patch the Compression tag value to 4 (CCITT G4 fax — out of scope)
    pos = tif.find(struct.pack("<HH", 259, 3))
    struct.pack_into("<I", tif, pos + 8, 4)
    with pytest.raises(ValueError, match="compression 4"):
        list(ic.iter_tiff_pages(bytes(tif)))


@pytest.mark.parametrize("comp", [5, 8, 32773])
@pytest.mark.parametrize("rps", [None, 10])
def test_tiff_compressed_multipage_roundtrip(comp, rps):
    pages = [
        rng.integers(0, 256, (37, 53), dtype=np.uint8),
        np.full((64, 64), 200, dtype=np.uint8),
        (np.arange(40 * 40, dtype=np.uint32) % 256).astype(np.uint8).reshape(40, 40),
    ]
    buf = ic.encode_tiff_gray(pages, compression=comp, rows_per_strip=rps)
    assert len(buf) < len(ic.encode_tiff_gray(pages)) or comp == 32773
    dec = list(ic.iter_tiff_pages(buf))
    assert len(dec) == 3
    for a, b in zip(pages, dec):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("comp", [5, 8])
def test_tiff_predictor2_roundtrip(comp):
    # a smooth gradient is where predictor 2 actually helps AND where a
    # wrong cumsum/diff would corrupt every pixel after the first column
    img = (np.add.outer(np.arange(50), np.arange(90)) % 256).astype(np.uint8)
    buf = ic.encode_tiff_gray([img], compression=comp, predictor=2, rows_per_strip=13)
    (dec,) = ic.iter_tiff_pages(buf)
    assert np.array_equal(dec, img)
    plain = ic.encode_tiff_gray([img], compression=comp)
    assert len(buf) < len(plain)  # differencing must pay on gradients
    with pytest.raises(ValueError, match="predictor 2"):
        ic.encode_tiff_gray([img], compression=1, predictor=2)


def test_tiff_lzw_bitstream_properties():
    """LZW early-change + clear-code behavior on a stream long enough to
    exercise 10/11/12-bit widths and a table-full Clear."""
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    enc = ic._lzw_encode(data)
    assert ic._lzw_decode(enc) == data
    assert len(enc) > len(data)  # random bytes are incompressible under LZW
    run = b"ab" * 50_000
    enc_run = ic._lzw_encode(run)
    assert ic._lzw_decode(enc_run) == run
    assert len(enc_run) < len(run) // 10


def test_tiff_packbits_edge_cases():
    for d in (b"", b"x", b"x" * 129, bytes(range(256)) * 3, b"aab" * 100):
        assert ic._packbits_decode(ic._packbits_encode(d)) == d


def test_iter_page_images_dispatch():
    img = rng.integers(0, 256, (6, 7), dtype=np.uint8)
    raw = np.uint32(7).tobytes() + np.uint32(6).tobytes() + img.tobytes()
    for payload, npages in ((raw + raw, 2), (ic.encode_png_gray(img), 1), (ic.encode_tiff_gray([img, img]), 2)):
        got = list(ic.iter_page_images(payload))
        assert [p for p, _ in got] == list(range(npages))
        assert all((im == img).all() for _, im in got)


GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[GOLD_COLS].sort_values(["doc_id", "seq"], kind="mergesort").reset_index(drop=True).fillna("<NULL>")
    )


def test_e2e_span_equality_on_encoded_corpus(ray_session):
    """The north-star gate over REAL encoded media: the same seeded corpus
    with PNG/TIFF/raw payloads chosen per media (mixed) must reproduce
    byte-identical golden spans — decode dispatch is on magic bytes, so
    the pipeline result is encoding-independent."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_mixed", 64, media_encoding="mixed")
    media = pq.read_table(paths["media"])
    heads = {bytes(b)[:4][:2] for b in media.column("bytes").to_pylist()}
    assert len(heads) >= 2, "mixed corpus should actually mix encodings"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


def test_e2e_span_equality_on_adam7_corpus(ray_session):
    """Golden-span gate over Adam7-interlaced PNG media."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_adam7", 48, media_encoding="png_adam7")
    media = pq.read_table(paths["media"])
    ihdr_interlaced = 0
    for b in media.column("bytes").to_pylist():
        raw = bytes(b)[:34]
        if raw[:8] == ic.PNG_SIG and raw[28] == 1:  # IHDR interlace byte
            ihdr_interlaced += 1
    assert ihdr_interlaced > 0, "corpus should contain Adam7 PNGs"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


def test_e2e_span_equality_on_compressed_tiff_corpus(ray_session):
    """Golden-span gate over LZW/Deflate/PackBits TIFF media (drawn
    predictor-2 and multi-strip layouts)."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_tlzw", 48, media_encoding="tiff_lzw")
    media = pq.read_table(paths["media"])
    comps = set()
    for b in media.column("bytes").to_pylist():
        raw = bytes(b)
        if raw[:4] == b"II*\x00":
            pos = raw.find(struct.pack("<HH", 259, 3))
            comps.add(struct.unpack_from("<I", raw, pos + 8)[0])
    assert comps - {1}, "corpus should contain compressed TIFFs"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_low_depth_gray_roundtrip(depth):
    step = 255 // ((1 << depth) - 1)
    img = (rng.integers(0, 1 << depth, (23, 37), dtype=np.uint8) * step).astype(np.uint8)
    assert np.array_equal(ic.decode_png(ic.encode_png_gray(img, depth=depth)), img)


def test_png_16bit_gray_and_rgb():
    import zlib

    img16 = rng.integers(0, 65536, (19, 29), dtype=np.uint16)
    out = ic.decode_png(ic.encode_png_gray(img16, depth=16))
    assert np.array_equal(out, (img16 >> 8).astype(np.uint8))  # spec truncation
    h, w = 5, 7
    rgb16 = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    rows = rgb16.astype(">u2").view(np.uint8).reshape(h, w * 6)
    body = np.concatenate([np.zeros((h, 1), np.uint8), rows], axis=1).tobytes()
    png = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + ic._chunk(b"IDAT", zlib.compress(body))
        + ic._chunk(b"IEND", b"")
    )
    assert np.array_equal(ic.decode_png(png), ic._luma((rgb16 >> 8).astype(np.uint8)))


def test_png_low_depth_palette():
    import zlib

    idx = rng.integers(0, 16, (9, 11), dtype=np.uint8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    bits = ((idx[:, :, None] >> np.arange(3, -1, -1)) & 1).astype(np.uint8)
    packed = np.packbits(bits.reshape(9, 11 * 4), axis=1)
    body = np.concatenate([np.zeros((9, 1), np.uint8), packed], axis=1).tobytes()
    png = (
        ic.PNG_SIG
        + ic._chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 9, 4, 3, 0, 0, 0))
        + ic._chunk(b"PLTE", pal.tobytes())
        + ic._chunk(b"IDAT", zlib.compress(body))
        + ic._chunk(b"IEND", b"")
    )
    assert np.array_equal(ic.decode_png(png), ic._luma(pal[idx]))


def test_png_rejects_illegal_depth_combo():
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    png = bytearray(ic.encode_png_gray(img))
    png[8 + 8 + 9] = 2  # IHDR color type gray -> RGB with depth 8 stays legal
    png[8 + 8 + 8] = 4  # ...but depth 4 + RGB is illegal
    with pytest.raises(ValueError, match="illegal bit depth"):
        ic.decode_png(bytes(png))


def test_tiff_16bit_gray_both_byte_orders():
    """16-bit gray strips decode to the HIGH byte (PNG-style sample-depth
    truncation), honoring II vs MM sample endianness."""
    img16 = rng.integers(0, 65536, (13, 21), dtype=np.uint16)
    for bo, tag in (("<", b"II*\x00"), (">", b"MM\x00*")):
        out = bytearray(tag) + struct.pack(bo + "I", 0)
        data_off = len(out)
        out += img16.astype(bo + "u2").tobytes()
        if len(out) % 2:
            out += b"\x00"
        ifd = len(out)
        struct.pack_into(bo + "I", out, 4, ifd)
        entries = [(256, 4, 21), (257, 4, 13), (258, 3, 16), (259, 3, 1), (262, 3, 1),
                   (273, 4, data_off), (277, 3, 1), (278, 4, 13), (279, 4, 21 * 13 * 2)]
        out += struct.pack(bo + "H", len(entries))
        for t, ty, v in entries:
            out += struct.pack(bo + "HHI", t, ty, 1)
            out += struct.pack(bo + "I", v) if ty == 4 else struct.pack(bo + "HH", v, 0)
        out += struct.pack(bo + "I", 0)
        (pg,) = ic.iter_tiff_pages(bytes(out))
        assert np.array_equal(pg, (img16 >> 8).astype(np.uint8)), bo


def test_corrupt_payloads_fail_fast_never_hang():
    """Quarantine prerequisite: truncated or bit-flipped payloads of EVERY
    supported encoding must raise promptly (clean per-blob error rows), not
    hang or grind — regression for the corrupt-TIFF IFD cycle / implausible
    entry-count / giant-value-array paths."""
    import time

    from tesseract_recognize_ray import legacycodecs as lc
    from tesseract_recognize_ray import pdfcodec as pcodec
    from tesseract_recognize_ray.jpegcodec import encode_jpeg_gray

    img = rng.integers(0, 256, (24, 36), dtype=np.uint8)
    payloads = [
        ic.encode_png_gray(img),
        ic.encode_png_gray(img, interlace=True),
        ic.encode_tiff_gray([img, img]),
        ic.encode_tiff_gray([img], compression=5),
        ic.encode_tiff_gray([img], compression=7, rows_per_strip=8),
        ic.encode_tiff_gray([img], compression=7, jpeg_tables=True),
        encode_jpeg_gray(img),
        encode_jpeg_gray(img, progressive=True),
        lc.encode_gif_gray(img),
        lc.encode_bmp_gray(img),
        lc.encode_bmp_gray(img, rle=True),
        lc.encode_pnm_gray(img),
        pcodec.encode_pdf_scanned([img]),
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
                list(ic.iter_page_images(t))
            except Exception:
                pass  # clean errors are the contract; hangs are the bug
            assert time.time() - t0 < 5.0


# ------------------------------------------------ JPEG-in-TIFF (comp 7)
def test_tiff_jpeg_roundtrip_matches_plain_jpeg():
    """Compression-7 strips must decode exactly like the same content as a
    standalone JPEG (single strip) / vstack of per-strip JPEGs."""
    from tesseract_recognize_ray.imagecodecs import encode_tiff_gray, iter_tiff_pages
    from tesseract_recognize_ray.jpegcodec import decode_jpeg, encode_jpeg_gray

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (70, 53)).astype(np.uint8)
    (got,) = iter_tiff_pages(encode_tiff_gray([img], compression=7))
    assert np.array_equal(got, decode_jpeg(encode_jpeg_gray(img)))

    (gots,) = iter_tiff_pages(
        encode_tiff_gray([img], compression=7, rows_per_strip=24)
    )
    ref = np.vstack(
        [decode_jpeg(encode_jpeg_gray(img[y : y + 24])) for y in range(0, 70, 24)]
    )
    assert np.array_equal(gots, ref)


def test_tiff_jpeg_tables_factoring_identical_and_smaller():
    """jpeg_tables=True moves shared DQT/DHT into tag 347 (abbreviated
    strips): same pixels, smaller file; the decoder splices them back."""
    from tesseract_recognize_ray.imagecodecs import encode_tiff_gray, iter_tiff_pages

    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (64, 40)).astype(np.uint8)
    plain = encode_tiff_gray([img], compression=7, rows_per_strip=16)
    shared = encode_tiff_gray([img], compression=7, rows_per_strip=16, jpeg_tables=True)
    (a,) = iter_tiff_pages(plain)
    (b,) = iter_tiff_pages(shared)
    assert np.array_equal(a, b)
    assert len(shared) < len(plain)
    assert b"\xff\xd8" in shared  # abbreviated strips still carry SOI


def test_tiff_jpeg_multipage_and_malformed_tables():
    from tesseract_recognize_ray.imagecodecs import encode_tiff_gray, iter_tiff_pages

    rng = np.random.default_rng(23)
    pages = [rng.integers(0, 256, (30, 30)).astype(np.uint8) for _ in range(3)]
    t = encode_tiff_gray(pages, compression=7, jpeg_tables=True)
    assert len(list(iter_tiff_pages(t))) == 3
    # corrupt the JPEGTables framing: scoped ValueError, not garbage pixels
    bad = bytearray(t)
    soi = bad.find(b"\xff\xd8")
    bad[soi] = 0x00
    with pytest.raises(ValueError):
        list(iter_tiff_pages(bytes(bad)))


def test_e2e_span_equality_on_tiff_jpeg_corpus(ray_session):
    """Golden-span gate over JPEG-in-TIFF media (drawn strip layout and
    JPEGTables factoring): q95 is lossless for binarization on the bilevel
    glyph pages, so spans must match byte-exactly."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_tjpg", 48, media_encoding="tiff_jpeg")
    media = pq.read_table(paths["media"])
    comps = set()
    for b in media.column("bytes").to_pylist():
        raw = bytes(b)
        if raw[:4] == b"II*\x00":
            pos = raw.find(struct.pack("<HH", 259, 3))
            comps.add(struct.unpack_from("<I", raw, pos + 8)[0])
    assert comps == {7}, f"corpus should be all comp-7 TIFFs, got {comps}"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))
