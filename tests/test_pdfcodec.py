"""Image-wrapped PDF rasterizer (S3 — replaces the reference's Ghostscript
render, tesseract-recognize.cc:490-511, for the scanned-document class) +
golden e2e over a PDF corpus."""

import re

import numpy as np
import pandas as pd
import pytest

import tesseract_recognize_ray.pdfcodec as pc
from tesseract_recognize_ray.imagecodecs import iter_page_images, sniff_format

rng = np.random.default_rng(11)


def test_flate_multipage_exact_roundtrip():
    pages = [
        rng.integers(0, 256, (37, 53), dtype=np.uint8),
        np.full((20, 30), 200, dtype=np.uint8),
        (np.add.outer(np.arange(41), np.arange(29)) % 256).astype(np.uint8),
    ]
    pdf = pc.encode_pdf_scanned(pages)
    assert sniff_format(pdf) == "pdf"
    got = list(pc.iter_pdf_page_images(pdf))
    assert len(got) == 3
    for a, b in zip(pages, got):
        assert np.array_equal(a, b)


def test_dct_pages_decode_via_repo_jpeg_codec():
    pages = [np.full((24, 40), v, dtype=np.uint8) for v in (0, 128, 255)]
    got = list(pc.iter_pdf_page_images(pc.encode_pdf_scanned(pages, image_filter="dct")))
    assert [g.shape for g in got] == [(24, 40)] * 3
    for a, b in zip(pages, got):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 4  # q95 on flats


def test_trailerless_pdf_falls_back_to_catalog_scan():
    img = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    pdf = pc.encode_pdf_scanned([img])
    cut = pdf[: pdf.rfind(b"xref")]  # strip xref + trailer entirely
    (got,) = pc.iter_pdf_page_images(cut)
    assert np.array_equal(got, img)


def test_bilevel_and_rgb_image_xobjects():
    # hand-build a 1-bit DeviceGray page with /Decode [1 0]
    img = np.where(rng.integers(0, 2, (10, 19), dtype=np.uint8) > 0, 255, 0).astype(np.uint8)
    bits = (img > 0).astype(np.uint8)
    packed = np.packbits(1 - bits, axis=1)  # Decode [1 0] flips it back
    pdf = bytearray(pc.encode_pdf_scanned([np.zeros((10, 19), np.uint8)]))
    # rewrite the XObject dict: 1-bit + Decode array + raw (no filter) data
    xm = re.search(rb"<< /Type /XObject.*?stream\n", pdf, re.S)
    body = packed.tobytes()
    repl = (
        b"<< /Type /XObject /Subtype /Image /Width 19 /Height 10 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Decode [1 0] "
        b"/Length %d >>\nstream\n" % len(body)
    )
    end = pdf.find(b"endstream", xm.start())
    pdf[xm.start() : end] = repl + body + b"\n"
    pdf = pdf[: pdf.rfind(b"xref")]  # offsets shifted; rely on object scan
    (got,) = pc.iter_pdf_page_images(bytes(pdf))
    assert np.array_equal(got, img)

    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    from tesseract_recognize_ray.imagecodecs import _luma

    pdf2 = bytearray(pc.encode_pdf_scanned([np.zeros((7, 5), np.uint8)]))
    xm = re.search(rb"<< /Type /XObject.*?stream\n", pdf2, re.S)
    body = rgb.tobytes()
    repl = (
        b"<< /Type /XObject /Subtype /Image /Width 5 /Height 7 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Length %d >>\nstream\n" % len(body)
    )
    end = pdf2.find(b"endstream", xm.start())
    pdf2[xm.start() : end] = repl + body + b"\n"
    (got2,) = pc.iter_pdf_page_images(bytes(pdf2[: pdf2.rfind(b"xref")]))
    assert np.array_equal(got2, _luma(rgb))


def test_rejections_are_clean_valueerrors():
    img = np.zeros((4, 4), np.uint8)
    pdf = pc.encode_pdf_scanned([img])
    with pytest.raises(ValueError, match="bad magic"):
        list(pc.iter_pdf_page_images(b"not a pdf"))
    bad = pdf.replace(b"/FlateDecode", b"/JPXDecode \x20")
    with pytest.raises(ValueError, match="JPXDecode"):
        list(pc.iter_pdf_page_images(bad))
    # a page with zero images (vector-content PDF) names the scoped class
    no_img = pdf.replace(b"/Subtype /Image", b"/Subtype /Form ")
    with pytest.raises(ValueError, match="scanned-document class"):
        list(pc.iter_pdf_page_images(no_img))


def test_streams_with_pdf_keyword_bytes_inside():
    """Binary stream payloads may contain 'endobj'/'N G obj'/'endstream'
    byte patterns; direct /Length skipping must not let them corrupt the
    object scan."""
    evil = np.frombuffer((b"endstream endobj 5 0 obj " * 40)[: 25 * 40], dtype=np.uint8)
    evil = evil.reshape(25, 40).astype(np.uint8)
    (got,) = pc.iter_pdf_page_images(pc.encode_pdf_scanned([evil]))
    assert np.array_equal(got, evil)


def test_dispatch_from_arrow_buffer():
    import pyarrow as pa

    pages = [rng.integers(0, 256, (8, 9), dtype=np.uint8)] * 2
    pdf = pc.encode_pdf_scanned(pages)
    buf = memoryview(pa.array([pdf], pa.large_binary())[0].as_buffer())
    got = list(iter_page_images(buf))
    assert [p for p, _ in got] == [0, 1]
    assert all(np.array_equal(im, pages[0]) for _, im in got)


GOLD_COLS = ["doc_id", "seq", "kind", "text", "media_ref", "order", "region_id", "line_id"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[GOLD_COLS].sort_values(["doc_id", "seq"], kind="mergesort").reset_index(drop=True).fillna("<NULL>")
    )


def test_e2e_span_equality_on_pdf_corpus(ray_session):
    """Golden-span gate over image-wrapped PDF media — including native
    multi-page PDFs via the /Kids tree (S2 page semantics + S3 source)."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached("/tmp/trr_test_corpus_tiny_pdf", 48, media_encoding="pdf")
    media = pq.read_table(paths["media"])
    n_pdf = sum(bytes(b)[:4] == b"%PDF" for b in media.column("bytes").to_pylist())
    assert n_pdf == media.num_rows, "every media must be a PDF"
    multi = sum(np >= 2 for np in media.column("n_pages").to_pylist())
    assert multi > 0, "corpus should contain multi-page PDFs"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


# ------------------------------------------------------- text-layer extract
def _minimal_text_pdf(content: bytes) -> bytes:
    """Uncompressed single-page text PDF around a raw content stream."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n"
    )


def test_pdf_text_roundtrip_escapes_and_pages():
    from tesseract_recognize_ray.pdfcodec import encode_pdf_text, iter_pdf_page_text

    pages_in = [
        ["Hello world", "Second (with parens)", "back\\slash and \ttab"],
        ["Page two"],
    ]
    pages = list(iter_pdf_page_text(encode_pdf_text(pages_in)))
    assert [[s["text"] for s in p] for p in pages] == pages_in
    # lines carry descending y at 14pt leading from 720
    ys = [s["y"] for s in pages[0]]
    assert ys == [720.0, 706.0, 692.0]


def test_pdf_text_tj_arrays_hex_strings_tm():
    from tesseract_recognize_ray.pdfcodec import iter_pdf_page_text

    content = (
        b"BT /F1 10 Tf 1 0 0 1 100 500 Tm "
        b"[(A)(B) -120 (C)] TJ "  # kerning numbers are ignored
        b"0 -20 Td <4445> Tj ET"  # hex string 'DE'
    )
    spans = list(iter_pdf_page_text(_minimal_text_pdf(content)))[0]
    assert [(s["text"], s["x"], s["y"]) for s in spans] == [
        ("ABC", 100.0, 500.0),
        ("DE", 100.0, 480.0),
    ]


def test_pdf_text_reading_order_sorts_stream_disorder():
    from tesseract_recognize_ray.pdfcodec import iter_pdf_page_text

    # stream emits bottom line FIRST; reading order must flip them
    content = (
        b"BT /F1 12 Tf 1 0 0 1 72 100 Tm (bottom) Tj "
        b"1 0 0 1 72 700 Tm (top) Tj ET"
    )
    spans = list(iter_pdf_page_text(_minimal_text_pdf(content)))[0]
    assert [s["text"] for s in spans] == ["top", "bottom"]
    raw = list(iter_pdf_page_text(_minimal_text_pdf(content), reading_order=False))[0]
    assert [s["text"] for s in raw] == ["bottom", "top"]


def test_pdf_text_octal_escape_and_tstar():
    from tesseract_recognize_ray.pdfcodec import iter_pdf_page_text

    content = b"BT /F1 12 Tf 20 TL 72 700 Td (\\101\\102) Tj T* (next) Tj ET"
    spans = list(iter_pdf_page_text(_minimal_text_pdf(content)))[0]
    assert [(s["text"], s["y"]) for s in spans] == [("AB", 700.0), ("next", 680.0)]


def test_pdf_text_rejects_composite_fonts():
    from tesseract_recognize_ray.pdfcodec import encode_pdf_text, iter_pdf_page_text

    t0 = encode_pdf_text([["x"]]).replace(b"/Subtype /Type1", b"/Subtype /Type0")
    with pytest.raises(ValueError, match="Type0"):
        list(iter_pdf_page_text(t0))


def test_pdf_text_layer_vs_scanned_dispatch():
    """A scanned PDF still rasterizes; a text PDF raises in the rasterizer
    and extracts through the text path — the two classes stay separable."""
    import numpy as np

    from tesseract_recognize_ray.pdfcodec import (
        encode_pdf_scanned,
        encode_pdf_text,
        iter_pdf_page_images,
        iter_pdf_page_text,
    )

    img = (np.arange(400, dtype=np.uint8).reshape(20, 20) % 251).astype(np.uint8)
    scanned = encode_pdf_scanned([img])
    assert next(iter_pdf_page_images(scanned)).shape == (20, 20)
    text_pdf = encode_pdf_text([["only text"]])
    with pytest.raises(ValueError, match="image XObjects"):
        list(iter_pdf_page_images(text_pdf))
    assert [s["text"] for s in next(iter_pdf_page_text(text_pdf))] == ["only text"]


def test_media_path_routes_text_pdfs_to_text_layer(ray_session, tmp_path):
    """A mixed media table — one scanned PDF, one born-digital PDF — flows
    through the fused MediaPathReader: the scanned one OCRs, the text one
    emits its embedded layer as exact 'line' rows (conf 100), and nothing
    becomes an error row."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.fixtures import render_page
    from tesseract_recognize_ray.pdfcodec import encode_pdf_scanned, encode_pdf_text
    from tesseract_recognize_ray.stages.media_source import recognized_lines_from_files

    pg = render_page(np.random.default_rng(3), rotate=False)
    scanned = encode_pdf_scanned([pg.img])
    born = encode_pdf_text([["alpha beta", "gamma"], ["delta"]])
    media = pa.table(
        {
            "media_ref": ["m_scan", "m_text"],
            "bytes": [scanned, born],
            "kind": ["pdf", "pdf"],
            "n_pages": pa.array([1, 2], pa.int32()),
        }
    )
    f = str(tmp_path / "media.parquet")
    pq.write_table(media, f)
    out = (
        recognized_lines_from_files([f], PipelineConfig(quarantine=True))
        .to_pandas()
        .sort_values(["media_ref", "page", "line"])
    )
    assert not (out["level"] == "error").any()
    scan_rows = out[out["media_ref"] == "m_scan"]
    # the scanned page still OCRs: every rendered line recognized verbatim
    assert scan_rows["text"].tolist() == [ln.text for ln in pg.lines]
    text_rows = out[out["media_ref"] == "m_text"]
    assert text_rows["text"].tolist() == ["alpha beta", "gamma", "delta"]
    assert text_rows["page"].tolist() == [0, 0, 1]
    assert (text_rows["conf"] == 100.0).all()
    # reading order: second line of page 0 sits lower (larger y1)
    assert text_rows.iloc[1]["y1"] > text_rows.iloc[0]["y1"]


def test_media_path_text_pdf_page_set_contract(ray_session, tmp_path):
    """--pages selection applies to the text-layer path with the same
    out-of-range error contract as the OCR path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.pdfcodec import encode_pdf_text
    from tesseract_recognize_ray.stages.media_source import recognized_lines_from_files

    born = encode_pdf_text([["one"], ["two"]])
    media = pa.table(
        {
            "media_ref": ["m"],
            "bytes": [born],
            "kind": ["pdf"],
            "n_pages": pa.array([2], pa.int32()),
        }
    )
    f = str(tmp_path / "media.parquet")
    pq.write_table(media, f)
    only_p1 = recognized_lines_from_files(
        [f], PipelineConfig(page_set="1")
    ).to_pandas()
    assert only_p1["text"].tolist() == ["two"] and only_p1["page"].tolist() == [1]
    bad = recognized_lines_from_files([f], PipelineConfig(page_set="5", quarantine=True)).to_pandas()
    assert (bad["level"] == "error").all() and "out of range" in bad["text"].iloc[0]


def test_e2e_span_equality_on_born_digital_corpus(ray_session):
    """Golden-span gate over a BORN-DIGITAL corpus: every media is a text
    PDF, so the whole flagship — source routing, text-layer extraction,
    reading order, span assembly — must reproduce the generated lines
    exactly, with the same region/line id scheme as the OCR path."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached(
        "/tmp/trr_test_corpus_tiny_pdftext", 48, media_encoding="pdf_text"
    )
    media = pq.read_table(paths["media"])
    n_pdf = sum(bytes(b)[:4] == b"%PDF" for b in media.column("bytes").to_pylist())
    assert n_pdf == media.num_rows, "every media must be a text PDF"
    multi = sum(np >= 2 for np in media.column("n_pages").to_pylist())
    assert multi > 0, "corpus should contain multi-page text PDFs"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


# ------------------------------------------------- Type0 / CID text layer
def test_pdf_text_type0_roundtrip_all_forms():
    """Composite /Type0 /Identity-H fonts with subset-style CIDs decode
    through the embedded /ToUnicode CMap — string-destination bfrange,
    array-of-destinations bfrange, compressed and raw CMap streams, and
    astral (non-BMP) code points via bfchar."""
    from tesseract_recognize_ray.pdfcodec import (
        encode_pdf_text_type0,
        iter_pdf_page_text,
    )

    pages = [["Hello World 123", "zebra ångström — em"], ["second page line"]]
    for kw in ({}, {"compress": False}, {"bfrange_array": True}):
        buf = encode_pdf_text_type0(pages, **kw)
        got = [[s["text"] for s in spans] for spans in iter_pdf_page_text(buf)]
        assert got == pages, kw
    astral = [["emoji \U0001F600 end"]]
    got = [[s["text"] for s in spans] for spans in iter_pdf_page_text(encode_pdf_text_type0(astral))]
    assert got == astral


def test_pdf_text_type0_cids_are_not_codepoints():
    """The fixture's CIDs are sorted-codepoint ranks, NOT the code points —
    a decoder that skips the CMap and latin-1s the bytes must produce
    garbage, proving the ToUnicode walk is load-bearing."""
    from tesseract_recognize_ray.pdfcodec import (
        _page_content,
        _parse_objects,
        encode_pdf_text_type0,
    )

    buf = encode_pdf_text_type0([["cab"]], compress=False)
    objs = _parse_objects(buf)
    pages = [d for d, _ in objs.values() if isinstance(d, dict) and d.get("Type") == "/Page"]
    content = _page_content(objs, pages[0])
    # charset sorted = [a,b,c] -> CIDs a=1 b=2 c=3, so "cab" shows <000300010002>
    assert b"<000300010002>" in content.replace(b" ", b"")


def test_pdf_text_type0_reject_paths():
    from tesseract_recognize_ray.pdfcodec import (
        encode_pdf_text_type0,
        iter_pdf_page_text,
    )

    no_map = encode_pdf_text_type0([["x y"]], omit_tounicode=True)
    with pytest.raises(ValueError, match="ToUnicode"):
        list(iter_pdf_page_text(no_map))
    # a non-Identity encoding CMap name keeps the scoped rejection
    kanji = encode_pdf_text_type0([["x y"]], compress=False).replace(
        b"/Encoding /Identity-H", b"/Encoding /90ms-RKSJ-H"
    )
    with pytest.raises(ValueError, match="non-Identity"):
        list(iter_pdf_page_text(kanji))


def test_pdf_text_type0_unmapped_cid_and_odd_byte():
    """A CID the subset CMap omits loses exactly that glyph (U+FFFD), and
    an odd trailing byte is zero-padded per ISO 32000-1 — neither shifts
    the 2-byte framing of following CIDs."""
    from tesseract_recognize_ray.pdfcodec import encode_pdf_text_type0, iter_pdf_page_text

    buf = encode_pdf_text_type0([["abc"]], compress=False)
    # charset [a,b,c] -> a=1 b=2 c=3; show <0001 0063 0002> where 0x63 is unmapped
    buf = buf.replace(b"<000100020003>", b"<000100630002>")
    spans = list(iter_pdf_page_text(buf))[0]
    assert [s["text"] for s in spans] == ["a�b"]
    # odd trailing byte: <000200> is 3 bytes -> CID 0002 then trailing
    # 0x00 zero-padded to CID 0x0000 (unmapped -> U+FFFD)
    buf2 = encode_pdf_text_type0([["abc"]], compress=False).replace(
        b"<000100020003>", b"<000200>"
    )
    spans2 = list(iter_pdf_page_text(buf2))[0]
    assert [s["text"] for s in spans2] == ["b�"]


def test_pdf_text_mixed_simple_and_type0_fonts():
    """Tf switches the active decoder mid-page: a simple font's bytes stay
    latin-1 while the Type0 font's bytes go through its CMap."""
    from tesseract_recognize_ray.pdfcodec import _tounicode_cmap, iter_pdf_page_text

    cmap = _tounicode_cmap(["X", "Y"])  # CID 1 -> X, CID 2 -> Y
    content = (
        b"BT /F1 12 Tf 14 TL 72 720 Td (plain) Tj T* "
        b"/F2 12 Tf <00010002> Tj T* /F1 12 Tf (back) Tj ET"
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> "
        b"/Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"6 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /S+Sub "
        b"/Encoding /Identity-H /DescendantFonts [8 0 R] /ToUnicode 7 0 R >>\nendobj\n"
        b"7 0 obj\n<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
        b"8 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /S+Sub >>\nendobj\n"
        b"trailer\n<< /Size 9 /Root 1 0 R >>\n"
    )
    spans = list(iter_pdf_page_text(pdf))[0]
    assert [s["text"] for s in spans] == ["plain", "XY", "back"]


def test_e2e_span_equality_on_type0_corpus(ray_session):
    """Golden-span gate over a composite-font born-digital corpus: every
    media is a /Type0 /Identity-H text PDF (the real-world subset-font
    norm), so routing + CID decode + reading order + assembly must
    reproduce the generated lines exactly."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached(
        "/tmp/trr_test_corpus_tiny_pdft0", 48, media_encoding="pdf_text_type0"
    )
    media = pq.read_table(paths["media"])
    payloads = [bytes(b) for b in media.column("bytes").to_pylist()]
    assert all(b[:4] == b"%PDF" for b in payloads)
    assert all(b"/Identity-H" in b for b in payloads), "every media must be Type0"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


# --------------------------------------------- vector-content rasterizer
def _vec_pdf(content: bytes, *, w: int = 60, h: int = 60, extra_objs: bytes = b"", res: bytes = b"") -> bytes:
    """Minimal uncompressed one-page PDF around a raw content stream."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        + b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] %s"
        b"/Contents 4 0 R >>\nendobj\n" % (w, h, res)
        + b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
        + extra_objs
        + b"trailer\n<< /Size 9 /Root 1 0 R >>\n"
    )


def test_pdf_vector_fixture_roundtrip_bit_exact():
    """encode_pdf_vector -> rasterize_pdf_pages is BIT-exact at 72 dpi and
    reproduces the n-fold block upscale at 72*n (the --density semantics):
    integer rect edges stay integral under integer scaling."""
    from tesseract_recognize_ray.fixtures import render_page
    from tesseract_recognize_ray.pdfcodec import encode_pdf_vector, rasterize_pdf_pages

    rng = np.random.default_rng(7)
    imgs = [render_page(rng, rotate=False).img, render_page(rng, rotate=True).img]
    buf = encode_pdf_vector(imgs, seed=3)
    out72 = rasterize_pdf_pages(buf, dpi=72)
    assert len(out72) == 2
    for got, want in zip(out72, imgs):
        assert got.shape == want.shape and (got == want).all()
    out144 = rasterize_pdf_pages(buf, dpi=144)
    for got, want in zip(out144, imgs):
        up = np.kron(want, np.ones((2, 2), dtype=np.uint8))
        assert got.shape == up.shape and (got == up).all()


def test_pdf_vector_winding_rules():
    """Nested same-direction squares: nonzero (f) fills the hole, even-odd
    (f*) leaves it."""
    from tesseract_recognize_ray.pdfcodec import rasterize_pdf_pages

    ring = b"10 10 m 50 10 l 50 50 l 10 50 l h 20 20 m 40 20 l 40 40 l 20 40 l h "
    nz = rasterize_pdf_pages(_vec_pdf(ring + b"f"), dpi=72)[0]
    eo = rasterize_pdf_pages(_vec_pdf(ring + b"f*"), dpi=72)[0]
    # device y = 60 - user y: user (30,30) -> device row 30 either way here
    assert nz[30, 30] == 0, "nonzero fills the nested square"
    assert eo[30, 30] == 255, "even-odd leaves the nested square white"
    assert nz[45, 15] == 0 and eo[45, 15] == 0, "both fill the ring body"
    assert nz[5, 5] == 255 and eo[5, 5] == 255


def test_pdf_vector_bezier_circle_area():
    """Four-cubic unit-circle approximation fills ~pi*r^2 pixels."""
    from tesseract_recognize_ray.pdfcodec import rasterize_pdf_pages

    # four cubics around (30,30), r=20, kappa*r = 11.046
    content = (
        b"50 30 m "
        b"50 41.046 41.046 50 30 50 c "
        b"18.954 50 10 41.046 10 30 c "
        b"10 18.954 18.954 10 30 10 c "
        b"41.046 10 50 18.954 50 30 c h f"
    )
    img = rasterize_pdf_pages(_vec_pdf(content), dpi=72)[0]
    area = int((img == 0).sum())
    import math

    assert abs(area - math.pi * 400) < 0.05 * math.pi * 400, area


def test_pdf_vector_clip_and_stroke():
    from tesseract_recognize_ray.pdfcodec import rasterize_pdf_pages

    # clip to [20,40)^2 then fill the whole page: only the clip survives
    content = b"20 20 20 20 re W n 0 0 60 60 re f"
    img = rasterize_pdf_pages(_vec_pdf(content), dpi=72)[0]
    ys, xs = np.nonzero(img == 0)
    assert ys.min() >= 20 and ys.max() < 40 and xs.min() >= 20 and xs.max() < 40
    assert (img == 0).sum() == 400
    # stroke: a horizontal 1px line at lw 1
    simg = rasterize_pdf_pages(_vec_pdf(b"1 w 10 30 m 50 30 l S"), dpi=72)[0]
    assert (simg[:, 15:45] == 0).any()
    rows = np.nonzero((simg == 0).any(axis=1))[0]
    assert len(rows) <= 2, "1pt stroke stays ~1 device px tall at 72 dpi"


def test_pdf_vector_form_and_image_xobjects():
    from tesseract_recognize_ray.pdfcodec import rasterize_pdf_pages

    # Form XObject: a 10x10 rect at origin, placed twice via /Matrix + cm
    form = b"0 0 10 10 re f"
    extra = (
        b"5 0 obj\n<< /Type /XObject /Subtype /Form /BBox [0 0 10 10] "
        b"/Matrix [1 0 0 1 5 5] /Length %d >>\nstream\n" % len(form)
        + form
        + b"\nendstream\nendobj\n"
    )
    res = b"/Resources << /XObject << /Fm0 5 0 R >> >> "
    content = b"/Fm0 Do q 1 0 0 1 30 30 cm /Fm0 Do Q"
    img = rasterize_pdf_pages(_vec_pdf(content, extra_objs=extra, res=res), dpi=72)[0]
    # form draws [5,15)^2 user = rows 45..55 device; translated copy [35,45)
    assert (img[45:55, 5:15] == 0).all()
    assert (img[15:25, 35:45] == 0).all()
    assert int((img == 0).sum()) == 200
    # Image XObject via the scanned-PDF encoder: dpi=72 reproduces pixels
    from tesseract_recognize_ray.pdfcodec import encode_pdf_scanned

    grad = (np.arange(1200, dtype=np.uint8).reshape(30, 40) % 251)
    out = rasterize_pdf_pages(encode_pdf_scanned([grad]), dpi=72)[0]
    assert out.shape == grad.shape and (out == grad).all()


def test_pdf_vector_blank_and_garbage_raise():
    from tesseract_recognize_ray.pdfcodec import (
        encode_pdf_text_type0,
        rasterize_pdf_pages,
    )

    with pytest.raises(ValueError, match="no paintable vector content"):
        rasterize_pdf_pages(_vec_pdf(b"0 0 60 60 re n"), dpi=72)
    # a text-only PDF (no paths) renders blank -> same scoped error
    with pytest.raises(ValueError, match="no paintable"):
        rasterize_pdf_pages(encode_pdf_text_type0([["xy"]], omit_tounicode=True), dpi=72)
    with pytest.raises(ValueError, match="inline images"):
        rasterize_pdf_pages(_vec_pdf(b"BI /W 1 /H 1 ID x EI"), dpi=72)


def test_e2e_span_equality_on_vector_pdf_corpus(ray_session):
    """Golden-span gate over DRAWN PDFs (no raster stream, no text layer):
    the fused source must route them through rasterize-at-density + OCR —
    the reference's Ghostscript semantics — and reproduce the generated
    lines exactly at density 72 AND at density 144 (2x render)."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached(
        "/tmp/trr_test_corpus_tiny_pdfvec", 36, media_encoding="pdf_vector"
    )
    media = pq.read_table(paths["media"])
    payloads = [bytes(b) for b in media.column("bytes").to_pylist()]
    assert all(b[:4] == b"%PDF" for b in payloads)
    # object dicts are uncompressed: no image XObjects, no fonts anywhere
    assert not any(b"/XObject" in b or b"/Font" in b for b in payloads), "drawn-only corpus"
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    for density in (72, 144):
        out = extract_spans(
            paths["docs"], paths["media"], PipelineConfig(density=density)
        ).to_pandas()
        pd.testing.assert_frame_equal(_norm(out), _norm(golden))


# --------------------------------------------- PDF 1.5 compressed layout
def test_objstm_repack_every_class_decodes_identically():
    """repack_pdf_objstm moves all non-stream objects into a /Type /ObjStm
    and replaces the trailer with an xref STREAM; each reader class must
    decode the 1.5 layout exactly as the classic one."""
    from tesseract_recognize_ray import pdfcodec as pc

    pages = [["HELLO WORLD", "LINE TWO"], ["PAGE 2"]]
    for enc in (pc.encode_pdf_text, pc.encode_pdf_text_type0):
        p15 = pc.repack_pdf_objstm(enc(pages))
        assert b"trailer" not in p15 and b"/ObjStm" in p15 and b"/XRef" in p15
        got = [[s["text"] for s in sp] for sp in pc.iter_pdf_page_text(p15)]
        assert got == pages
    img = (np.arange(1200, dtype=np.uint8).reshape(30, 40) % 251)
    (got_img,) = pc.iter_pdf_page_images(pc.repack_pdf_objstm(pc.encode_pdf_scanned([img])))
    assert (got_img == img).all()
    from tesseract_recognize_ray.fixtures import render_page

    pg = render_page(np.random.default_rng(1), rotate=False).img
    (got_vec,) = pc.rasterize_pdf_pages(
        pc.repack_pdf_objstm(pc.encode_pdf_vector([pg])), dpi=72
    )
    assert (got_vec == pg).all()


def test_xref_stream_self_describes_with_predictor():
    """Decode the repacked file's OWN xref stream through _stream_data:
    the PNG-Up predictor reversal must yield rows whose type-1 offsets
    point at real `N 0 obj` headers and whose type-2 rows name the ObjStm
    — predictor correctness proven against a live artifact."""
    from tesseract_recognize_ray import pdfcodec as pc

    p15 = pc.repack_pdf_objstm(pc.encode_pdf_text([["SELF CHECK"]]))
    objs = pc._parse_objects(p15)
    xref_dicts = [
        (d, s) for d, s in objs.values()
        if isinstance(d, dict) and d.get("Type") == "/XRef" and s is not None
    ]
    assert len(xref_dicts) == 1
    xd, xs = xref_dicts[0]
    rows = np.frombuffer(pc._stream_data(objs, xd, xs), np.uint8).reshape(-1, 4)
    assert rows.shape[0] == int(xd["Size"])
    objstm_nums = {
        n for n, (d, s) in objs.items()
        if isinstance(d, dict) and d.get("Type") == "/ObjStm"
    }
    seen_1 = seen_2 = 0
    for num, (t, hi, lo, f3) in enumerate(rows):
        if t == 1:
            off = (int(hi) << 8) | int(lo)
            assert p15[off:].startswith(b"%d 0 obj" % num)
            seen_1 += 1
        elif t == 2:
            assert ((int(hi) << 8) | int(lo)) in objstm_nums
            seen_2 += 1
    assert seen_1 >= 2 and seen_2 >= 3


def test_flate_predictor2_image_xobject():
    """A Flate image XObject with TIFF Predictor 2 (/DecodeParms) decodes:
    horizontal differencing reversed by cumsum."""
    from tesseract_recognize_ray import pdfcodec as pc

    img = (np.add.outer(np.arange(12) * 7, np.arange(20) * 3) % 256).astype(np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:] = (img[:, 1:].astype(np.int16) - img[:, :-1].astype(np.int16)) % 256
    payload = __import__("zlib").compress(diff.astype(np.uint8).tobytes())
    pdf = bytearray(pc.encode_pdf_scanned([np.zeros((12, 20), np.uint8)]))
    xm = re.search(rb"<< /Type /XObject.*?stream\n", pdf, re.S)
    repl = (
        b"<< /Type /XObject /Subtype /Image /Width 20 /Height 12 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 2 /Columns 20 >> "
        b"/Length %d >>\nstream\n" % len(payload)
    )
    end = pdf.find(b"endstream", xm.start())
    pdf[xm.start() : end] = repl + payload + b"\n"
    (got,) = pc.iter_pdf_page_images(bytes(pdf[: pdf.rfind(b"xref")]))
    assert (got == img).all()


def test_e2e_span_equality_on_objstm_corpus(ray_session):
    """Golden-span gate over the PDF 1.5 compressed layout: scanned PDFs
    whose page tree / fonts / catalog live inside object streams, located
    through the xref STREAM's /Root."""
    import pyarrow.parquet as pq

    from tesseract_recognize_ray.fixtures import corpus_cached
    from tesseract_recognize_ray.pipelines.extract import extract_spans

    paths = corpus_cached(
        "/tmp/trr_test_corpus_tiny_pdf15", 48, media_encoding="pdf_objstm"
    )
    media = pq.read_table(paths["media"])
    payloads = [bytes(b) for b in media.column("bytes").to_pylist()]
    assert all(b[:8] == b"%PDF-1.5" for b in payloads)
    assert all(b"/ObjStm" in b and b"trailer" not in b for b in payloads)
    golden = pq.read_table(paths["golden_spans"]).to_pandas()
    out = extract_spans(paths["docs"], paths["media"]).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(golden))


def test_incremental_update_later_revision_wins():
    """Append-only incremental update: the SAME object number re-emitted at
    the file tail (plus a new trailer) must shadow the original — both the
    object map (file-order overwrite) and the trailer choice (last wins)."""
    from tesseract_recognize_ray.pdfcodec import encode_pdf_text, iter_pdf_page_text

    base = encode_pdf_text([["OLD TEXT"]], compress=False)
    # object 5 0 is the page's content stream in encode_pdf_text's layout
    new_content = b"BT /F1 12 Tf 14 TL 72 720 Td (NEW TEXT) Tj ET"
    update = (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 7 /Root 1 0 R /Prev 0 >>\n"
    )
    spans = list(iter_pdf_page_text(base + update))[0]
    assert [s["text"] for s in spans] == ["NEW TEXT"]


def test_encrypted_pdf_rejected_scoped():
    from tesseract_recognize_ray.pdfcodec import (
        encode_pdf_scanned,
        encode_pdf_text,
        iter_pdf_page_images,
        iter_pdf_page_text,
        repack_pdf_objstm,
    )

    enc_txt = encode_pdf_text([["secret"]]).replace(
        b"trailer\n<< /Size", b"trailer\n<< /Encrypt 9 0 R /Size"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        list(iter_pdf_page_text(enc_txt))
    img = np.zeros((4, 4), np.uint8)
    enc_img = encode_pdf_scanned([img]).replace(
        b"trailer\n<< /Size", b"trailer\n<< /Encrypt 9 0 R /Size"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        list(iter_pdf_page_images(enc_img))
    # 1.5 layout: /Encrypt sits in the xref STREAM's dict
    enc_15 = repack_pdf_objstm(encode_pdf_text([["secret"]])).replace(
        b"/Type /XRef /Size", b"/Type /XRef /Encrypt 99 0 R /Size"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        list(iter_pdf_page_text(enc_15))
