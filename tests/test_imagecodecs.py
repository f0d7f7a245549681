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


def test_png_rejects_interlace_and_bad_sig():
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    body = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    with pytest.raises(ValueError, match="interlace"):
        ic.decode_png(_png((4, 4, 8, 0, 0, 0, 1), body))
    with pytest.raises(ValueError, match="signature"):
        ic.decode_png(b"nonsense")


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


def test_tiff_rejects_compressed():
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    tif = bytearray(ic.encode_tiff_gray([img]))
    # patch the Compression tag value to 5 (LZW)
    pos = tif.find(struct.pack("<HH", 259, 3))
    struct.pack_into("<I", tif, pos + 8, 5)
    with pytest.raises(ValueError, match="compression 5"):
        list(ic.iter_tiff_pages(bytes(tif)))


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
