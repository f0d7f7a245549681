"""From-scratch rasterizer for IMAGE-WRAPPED (scanned-document) PDFs.

The reference renders PDF pages through Ghostscript at `--density` dpi
(`/root/reference/tesseract-recognize.cc:490-511`) — an external-process
dependency this environment lacks, and one the reference itself marks
broken (`CMakeLists.txt:22`). Scanned-document PDFs, however, are almost
always a thin wrapper: one full-page image XObject per page, compressed
with FlateDecode or DCTDecode. That class needs no renderer — only a PDF
object parser plus the image codecs this repo already has — so S3 is real
here for exactly the corpus class the reference pipeline targets.

Scope (public ISO 32000-1 subset, everything else raises ValueError):
  * classic cross-reference TABLES located by scanning for `N G obj`
    spans (xref-stream/object-stream PDFs are rejected — post-1.5
    compressed layouts);
  * page tree walked from trailer /Root -> /Pages -> /Kids (recursive),
    falling back to the lone /Type /Catalog object when the trailer is
    unparseable;
  * each page must reference exactly ONE image XObject; its stream is
    decoded via /Filter: FlateDecode (zlib; /DecodeParms predictors
    rejected), DCTDecode (repo `jpegcodec`), or none;
  * pixel layout: /DeviceGray 8-bit and 1-bit (with /Decode [1 0]
    inversion), /DeviceRGB 8-bit (BT.601 luma via `imagecodecs._luma`).

The encoder writes the same class — Catalog / Pages / per-page Page +
Contents (`cm` + `Do` operators) + image XObject, a classic xref table and
trailer — so fixtures round-trip real multi-page PDF files byte-for-byte
through the dispatch path (`imagecodecs.iter_page_images`).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

from .imagecodecs import _luma

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_NAME_RE = re.compile(rb"/([A-Za-z0-9.#_+-]+)")
_NUM_RE = re.compile(rb"[+-]?\d+(?:\.\d+)?|[+-]?\.\d+")
_WS = b"\x00\t\n\x0c\r "


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Ref({self.num})"


def _parse_value(buf: bytes, pos: int):
    """Parse one PDF object value at pos -> (value, next_pos). Values:
    dict, array, name, number, ref, boolean/null, (string), <hexstring>."""
    n = len(buf)
    while pos < n and buf[pos] in _WS:
        pos += 1
    if pos >= n:
        raise ValueError("PDF: unexpected end of data")
    c = buf[pos : pos + 1]
    if buf[pos : pos + 2] == b"<<":
        pos += 2
        d: dict[str, object] = {}
        while True:
            while pos < n and buf[pos] in _WS:
                pos += 1
            if buf[pos : pos + 2] == b">>":
                return d, pos + 2
            m = _NAME_RE.match(buf, pos)
            if not m:
                raise ValueError("PDF: dict key is not a name")
            key = m.group(1).decode("latin-1")
            val, pos = _parse_value(buf, m.end())
            d[key] = val
    if c == b"[":
        pos += 1
        arr: list[object] = []
        while True:
            while pos < n and buf[pos] in _WS:
                pos += 1
            if buf[pos : pos + 1] == b"]":
                return arr, pos + 1
            val, pos = _parse_value(buf, pos)
            arr.append(val)
    if c == b"/":
        m = _NAME_RE.match(buf, pos)
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == b"(":
        depth, p = 1, pos + 1
        while p < n and depth:
            if buf[p : p + 1] == b"\\":
                p += 1
            elif buf[p : p + 1] == b"(":
                depth += 1
            elif buf[p : p + 1] == b")":
                depth -= 1
            p += 1
        return b"<string>", p
    if c == b"<":
        end = buf.index(b">", pos)
        return b"<hex>", end + 1
    for kw, v in ((b"true", True), (b"false", False), (b"null", None)):
        if buf[pos : pos + len(kw)] == kw:
            return v, pos + len(kw)
    # number or reference `N G R`
    m = _NUM_RE.match(buf, pos)
    if not m:
        raise ValueError(f"PDF: cannot parse value at {pos}: {buf[pos:pos+20]!r}")
    ref = re.compile(rb"(\d+)\s+(\d+)\s+R\b").match(buf, pos)
    if ref:
        return _Ref(int(ref.group(1))), ref.end()
    txt = m.group(0)
    return (float(txt) if b"." in txt else int(txt)), m.end()


def _parse_objects(buf: bytes) -> dict[int, tuple[dict, bytes | None]]:
    """num -> (dict, raw stream bytes or None), by scanning `N G obj` spans
    (xref-independent — the classic robust-reader technique)."""
    objs: dict[int, tuple[dict, bytes | None]] = {}
    last_end = 0
    stream_kw = re.compile(rb"[\x00\t\n\x0c\r ]*stream(\r\n|\n|\r)")
    for m in _OBJ_RE.finditer(buf):
        if m.start() < last_end:  # `N G obj` bytes INSIDE a binary stream
            continue
        start = m.end()
        try:
            val, vpos = _parse_value(buf, start)
        except (ValueError, IndexError):
            continue
        if not isinstance(val, dict):
            objs[int(m.group(1))] = ({}, None)
            last_end = vpos
            continue
        stream = None
        sm = stream_kw.match(buf, vpos)
        if sm:
            length = val.get("Length")
            if isinstance(length, (int, float)):
                # direct /Length: skip the stream EXACTLY — binary payloads
                # may contain 'endstream'/'endobj' bytes
                s0 = sm.end()
                stream = buf[s0 : s0 + int(length)]
                last_end = s0 + int(length)
            else:  # indirect /Length: fall back to the delimiter scan
                e = buf.find(b"endstream", sm.end())
                if e < 0:
                    continue
                stream = buf[sm.end() : e]
                last_end = e
        else:
            last_end = vpos
        objs[int(m.group(1))] = (val, stream)
    if not objs:
        raise ValueError("PDF: no objects found")
    return objs


def _deref(objs, v):
    """Resolve refs to plain VALUES (dicts / numbers / arrays)."""
    while isinstance(v, _Ref):
        v = objs[v.num][0]
    return v


def _decode_image(objs, xdict: dict, raw: bytes) -> np.ndarray:
    filters = _deref(objs, xdict.get("Filter"))
    if filters is None:
        filters = []
    elif not isinstance(filters, list):
        filters = [filters]
    parms = _deref(objs, xdict.get("DecodeParms"))
    if parms:
        parms_list = parms if isinstance(parms, list) else [parms]
        for p in parms_list:
            p = _deref(objs, p)
            if isinstance(p, dict) and _deref(objs, p.get("Predictor", 1)) not in (None, 1):
                raise ValueError("PDF: DecodeParms predictors not supported")
    data = raw
    for f in filters:
        if f == "/FlateDecode":
            data = zlib.decompress(data)
        elif f == "/DCTDecode":
            from .jpegcodec import decode_jpeg

            return _finish_gray(objs, xdict, decode_jpeg(data))
        else:
            raise ValueError(f"PDF: image filter {f} not supported")
    w = int(_deref(objs, xdict["Width"]))
    h = int(_deref(objs, xdict["Height"]))
    bpc = int(_deref(objs, xdict.get("BitsPerComponent", 8)))
    cs = _deref(objs, xdict.get("ColorSpace", "/DeviceGray"))
    if cs == "/DeviceGray" and bpc == 8:
        img = np.frombuffer(data, np.uint8, count=w * h).reshape(h, w).copy()
    elif cs == "/DeviceGray" and bpc == 1:
        stride = (w + 7) // 8
        packed = np.frombuffer(data, np.uint8, count=h * stride).reshape(h, stride)
        bits = np.unpackbits(packed, axis=1)[:, :w]
        dec = _deref(objs, xdict.get("Decode"))
        if dec == [1, 0]:
            bits = 1 - bits
        img = (bits * np.uint8(255)).astype(np.uint8)
    elif cs == "/DeviceRGB" and bpc == 8:
        img = _luma(np.frombuffer(data, np.uint8, count=w * h * 3).reshape(h, w, 3))
    else:
        raise ValueError(f"PDF: ColorSpace {cs} / {bpc}-bit not supported")
    return img


def _finish_gray(objs, xdict, img: np.ndarray) -> np.ndarray:
    w = int(_deref(objs, xdict["Width"]))
    h = int(_deref(objs, xdict["Height"]))
    if img.shape != (h, w):
        raise ValueError("PDF: DCT image dims disagree with /Width /Height")
    return img


def _page_kids(objs, node: dict, out: list[dict], depth: int = 0):
    if depth > 64:  # corrupt/cyclic /Kids must not recurse unboundedly
        raise ValueError("PDF: page tree deeper than 64 levels")
    t = _deref(objs, node.get("Type"))
    if t == "/Page":
        out.append(node)
        return
    for kid in _deref(objs, node.get("Kids", [])):
        _page_kids(objs, _deref(objs, kid), out, depth + 1)


def iter_pdf_page_images(buf):
    """Yield (h, w) uint8 grayscale per page of an image-wrapped PDF."""
    data = bytes(memoryview(buf))
    if not data.startswith(b"%PDF"):
        raise ValueError("PDF: bad magic")
    objs = _parse_objects(data)
    # root: trailer /Root -> Catalog -> /Pages; fallback: lone Catalog
    pages_node = None
    trailers = list(re.finditer(rb"trailer", data))
    if trailers:  # incremental-update files append trailers; LAST wins
        try:
            tdict, _ = _parse_value(data, trailers[-1].end())
            cat = _deref(objs, tdict["Root"])
            pages_node = _deref(objs, cat["Pages"])
        except (KeyError, ValueError, IndexError):
            pages_node = None
    if pages_node is None:
        cats = [d for d, _s in objs.values() if isinstance(d, dict) and _deref(objs, d.get("Type")) == "/Catalog"]
        if len(cats) != 1:
            raise ValueError("PDF: cannot locate the page tree")
        pages_node = _deref(objs, cats[0]["Pages"])
    pages: list[dict] = []
    _page_kids(objs, pages_node, pages)
    if not pages:
        raise ValueError("PDF: page tree has no pages")
    for page in pages:
        res = _deref(objs, page.get("Resources", {}))
        xobjs = _deref(objs, res.get("XObject", {}))
        imgs = []
        for _name, ref in xobjs.items():
            if not isinstance(ref, _Ref):
                continue
            xdict, stream = objs[ref.num]
            if _deref(objs, xdict.get("Subtype")) == "/Image" and stream is not None:
                imgs.append((xdict, stream))
        if len(imgs) != 1:
            raise ValueError(
                f"PDF: page references {len(imgs)} image XObjects; this "
                "rasterizer handles the scanned-document class (exactly one "
                "full-page image; no vector content render)"
            )
        xdict, stream = imgs[0]
        length = _deref(objs, xdict.get("Length"))
        raw = stream[: int(length)] if isinstance(length, (int, float)) else stream
        yield _decode_image(objs, xdict, raw)


def encode_pdf_scanned(pages: "list[np.ndarray]", *, image_filter: str = "flate") -> bytes:
    """Pages of (h, w) uint8 -> a classic scanned-document PDF: one
    FlateDecode (or DCTDecode baseline-JPEG) DeviceGray image XObject per
    page, full xref table + trailer."""
    if image_filter not in ("flate", "dct"):
        raise ValueError("image_filter must be 'flate' or 'dct'")
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def put(num: int, body: bytes):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    n = len(pages)
    kids = b" ".join(b"%d 0 R" % (3 + 3 * i) for i in range(n))
    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n))
    for i, img in enumerate(pages):
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape
        pnum, cnum, xnum = 3 + 3 * i, 4 + 3 * i, 5 + 3 * i
        put(
            pnum,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /XObject << /Im0 %d 0 R >> >> /Contents %d 0 R >>"
            % (w, h, xnum, cnum),
        )
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        put(cnum, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream")
        if image_filter == "flate":
            data, filt = zlib.compress(img.tobytes(), 6), b"/FlateDecode"
        else:
            from .jpegcodec import encode_jpeg_gray

            data, filt = encode_jpeg_gray(img, quality=95, mode="gray"), b"/DCTDecode"
        put(
            xnum,
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter %s "
            b"/Length %d >>\nstream\n" % (w, h, filt, len(data))
            + data
            + b"\nendstream",
        )
    xref_at = len(out)
    nobj = 2 + 3 * n
    out.extend(b"xref\n0 %d\n" % (nobj + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, nobj + 1):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (nobj + 1, xref_at))
    return bytes(out)


# ------------------------------------------------------- text-layer extract
# Vector (born-digital) PDFs carry their text as content-stream operators —
# no OCR needed. The reference pipeline rasterizes+OCRs everything
# (tesseract-recognize.cc:490-511); extracting the embedded text layer
# directly is the beyond-reference fast path for the born-digital half of a
# mixed crawl. Scope (simple-font subset of ISO 32000-1 §9):
#   * BT/ET text blocks with Tf, Td, TD, TL, T*, Tm, Tj, ', TJ operators;
#   * literal strings with escapes + octal, and hex strings;
#   * simple fonts assumed byte == Latin-1 code point (covers the
#     standard-14 / WinAnsi ASCII range);
#   * composite /Type0 fonts with /Encoding /Identity-H|-V and an embedded
#     /ToUnicode CMap (the real-world subset-font norm): 2-byte CIDs
#     decoded through the parsed bfchar/bfrange map — exact text, where
#     the reference can only rasterize+OCR; a Type0 font with NO
#     /ToUnicode (or a non-Identity encoding CMap) still raises the
#     scoped ValueError — honest rejection, not mojibake.

_STR_ESC = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\x0c", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _content_tokens(buf: bytes):
    """Tokenize a content stream: yields ('num', f), ('str', bytes),
    ('name', str), ('arr', list), ('op', bytes)."""
    pos, n = 0, len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS:
            pos += 1
            continue
        if c == ord("%"):  # comment to EOL
            e = buf.find(b"\n", pos)
            pos = n if e < 0 else e + 1
            continue
        if c == ord("("):
            out, depth, pos = bytearray(), 1, pos + 1
            while pos < n and depth:
                b = buf[pos]
                if b == ord("\\") and pos + 1 < n:
                    nxt = buf[pos + 1]
                    if nxt in _STR_ESC:
                        out += _STR_ESC[nxt]
                        pos += 2
                    elif ord("0") <= nxt <= ord("7"):  # octal, 1-3 digits
                        j = pos + 1
                        while j < min(pos + 4, n) and ord("0") <= buf[j] <= ord("7"):
                            j += 1
                        out.append(int(buf[pos + 1 : j], 8) & 0xFF)
                        pos = j
                    else:  # line continuation / unknown escape: literal
                        out.append(nxt)
                        pos += 2
                    continue
                if b == ord("("):
                    depth += 1
                elif b == ord(")"):
                    depth -= 1
                    if depth == 0:
                        pos += 1
                        break
                out.append(b)
                pos += 1
            yield ("str", bytes(out))
            continue
        if buf[pos : pos + 2] == b"<<" or buf[pos : pos + 2] == b">>":
            # dict marks appear in CMap streams (/CIDSystemInfo << ... >>)
            # and BDC property lists; the text interpreter ignores them as
            # unknown operators, the CMap parser skips their spans.
            yield ("op", buf[pos : pos + 2])
            pos += 2
            continue
        if c == ord("<"):
            e = buf.find(b">", pos)
            if e < 0:
                raise ValueError("PDF text: unterminated hex string")
            hx = re.sub(rb"\s", b"", buf[pos + 1 : e])
            if len(hx) % 2:
                hx += b"0"
            yield ("str", bytes.fromhex(hx.decode("ascii")))
            pos = e + 1
            continue
        if c == ord("/"):
            m = _NAME_RE.match(buf, pos)
            yield ("name", m.group(1).decode("latin-1"))
            pos = m.end()
            continue
        if c in b"[]":
            yield ("mark", chr(c))
            pos += 1
            continue
        m = _NUM_RE.match(buf, pos)
        if m and m.start() == pos:
            yield ("num", float(m.group(0)))
            pos = m.end()
            continue
        # operator: run of non-delimiter bytes
        j = pos
        while j < n and buf[j] not in _WS and buf[j] not in b"()<>[]/%":
            j += 1
        if j == pos:
            raise ValueError(f"PDF text: cannot tokenize at {pos}: {buf[pos:pos+10]!r}")
        yield ("op", buf[pos:j])
        pos = j


def _page_content(objs, page: dict) -> bytes:
    """Concatenate a page's /Contents stream(s), inflating FlateDecode."""
    cont = _deref(objs, page.get("Contents"))
    refs = cont if isinstance(cont, list) else [page.get("Contents")]
    parts = []
    for r in refs:
        r = r if isinstance(r, _Ref) else None
        if r is None:
            raise ValueError("PDF text: /Contents is not a stream ref")
        cdict, stream = objs[r.num]
        length = _deref(objs, cdict.get("Length"))
        raw = stream[: int(length)] if isinstance(length, (int, float)) else stream
        filt = _deref(objs, cdict.get("Filter"))
        if filt == "/FlateDecode":
            raw = zlib.decompress(raw)
        elif filt is not None:
            raise ValueError(f"PDF text: content filter {filt} not supported")
        parts.append(raw)
    return b"\n".join(parts)


def _stream_bytes(objs, ref) -> bytes:
    """Raw bytes of a stream object, /Length-clamped, FlateDecode inflated."""
    if not isinstance(ref, _Ref):
        raise ValueError("PDF text: expected a stream reference")
    sdict, stream = objs[ref.num]
    if stream is None:
        raise ValueError("PDF text: referenced object carries no stream")
    length = _deref(objs, sdict.get("Length"))
    raw = stream[: int(length)] if isinstance(length, (int, float)) else stream
    filt = _deref(objs, sdict.get("Filter"))
    if filt == "/FlateDecode":
        raw = zlib.decompress(raw)
    elif filt is not None:
        raise ValueError(f"PDF text: stream filter {filt} not supported")
    return raw


def _bf_increment(dst: bytes, offset: int) -> str:
    """bfrange destination for (start + offset): the UTF-16BE dst string
    incremented as a big-endian integer (ISO 32000-1 9.10.3 increments the
    last byte and legal ranges never carry past it; full-integer increment
    is the equivalent common-reader behavior)."""
    width = len(dst)
    val = int.from_bytes(dst, "big") + offset
    return val.to_bytes(width, "big").decode("utf-16-be", errors="replace")


def _parse_tounicode(data: bytes) -> dict[bytes, str]:
    """Parse a /ToUnicode CMap stream (ISO 32000-1 §9.10.3) into a
    code-bytes -> unicode-string map. Handles begincodespacerange (skipped —
    Identity-H fixes the code width at 2), beginbfchar <src> <dst> pairs and
    beginbfrange triples in both the string-destination and
    array-of-destinations forms. All other CMap boilerplate (findresource /
    begincmap / CIDSystemInfo dicts / defineresource) is ignored."""
    cmap: dict[bytes, str] = {}
    toks = list(_content_tokens(data))
    i, n = 0, len(toks)
    while i < n:
        kind, val = toks[i]
        if kind != "op":
            i += 1
            continue
        if val == b"beginbfchar":
            i += 1
            while i < n and toks[i] != ("op", b"endbfchar"):
                if i + 1 < n and toks[i][0] == "str" and toks[i + 1][0] == "str":
                    src, dst = toks[i][1], toks[i + 1][1]
                    cmap[src] = dst.decode("utf-16-be", errors="replace")
                    i += 2
                else:
                    raise ValueError("PDF text: malformed bfchar entry")
        elif val == b"beginbfrange":
            i += 1
            while i < n and toks[i] != ("op", b"endbfrange"):
                if i + 1 >= n or toks[i][0] != "str" or toks[i + 1][0] != "str":
                    raise ValueError("PDF text: malformed bfrange entry")
                lo, hi = toks[i][1], toks[i + 1][1]
                width = len(lo)
                lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
                if hi_i < lo_i or hi_i - lo_i > 0xFFFF:
                    raise ValueError("PDF text: bfrange bounds out of order")
                i += 2
                if i < n and toks[i] == ("mark", "["):
                    # array form: one explicit dst string per code
                    i += 1
                    for off in range(hi_i - lo_i + 1):
                        if i >= n or toks[i][0] != "str":
                            raise ValueError("PDF text: bfrange array too short")
                        code = (lo_i + off).to_bytes(width, "big")
                        cmap[code] = toks[i][1].decode("utf-16-be", errors="replace")
                        i += 1
                    if i >= n or toks[i] != ("mark", "]"):
                        raise ValueError("PDF text: unterminated bfrange array")
                    i += 1
                elif i < n and toks[i][0] == "str":
                    dst = toks[i][1]
                    i += 1
                    for off in range(hi_i - lo_i + 1):
                        cmap[(lo_i + off).to_bytes(width, "big")] = _bf_increment(dst, off)
                else:
                    raise ValueError("PDF text: bfrange destination missing")
        i += 1
    return cmap


def _page_fonts(objs, page: dict) -> dict[str, "dict[bytes, str] | None"]:
    """Resource-name -> decoder table for a page's /Font dict. Simple fonts
    (Type1 / TrueType / Type3) map to None (byte == Latin-1 code point, the
    standard-14 / WinAnsi ASCII assumption documented above). Composite
    /Type0 fonts require /Encoding /Identity-H|-V (2-byte code == CID) and
    a /ToUnicode CMap — the embedded exact mapping real-world subset fonts
    carry; a Type0 font WITHOUT /ToUnicode keeps the scoped rejection
    (there is no text to extract without the map — rasterize+OCR instead,
    which is all the reference ever does: tesseract-recognize.cc:490-511)."""
    res = _deref(objs, page.get("Resources", {}))
    fonts = _deref(objs, res.get("Font", {}))
    out: dict[str, dict[bytes, str] | None] = {}
    for name, ref in (fonts or {}).items():
        fdict = _deref(objs, ref)
        if not isinstance(fdict, dict):
            continue
        if _deref(objs, fdict.get("Subtype")) != "/Type0":
            out[name] = None
            continue
        enc = _deref(objs, fdict.get("Encoding"))
        if enc not in ("/Identity-H", "/Identity-V"):
            raise ValueError(
                f"PDF text: /Type0 font with non-Identity encoding {enc!r} "
                "not supported — rasterize+OCR this document instead"
            )
        tu = fdict.get("ToUnicode")
        if tu is None:
            raise ValueError(
                "PDF text: /Type0 font without /ToUnicode CMap carries no "
                "recoverable text layer — rasterize+OCR this document instead"
            )
        out[name] = _parse_tounicode(_stream_bytes(objs, tu))
    return out


def _decode_shown(raw: bytes, cmap: "dict[bytes, str] | None") -> str:
    """String-show bytes -> text under the CURRENT font: Latin-1 for simple
    fonts; for Type0/Identity-H, consecutive 2-byte big-endian CIDs through
    the ToUnicode map (unmapped CIDs become U+FFFD — a subset font that
    omits a glyph's mapping loses exactly that glyph, never the line)."""
    if cmap is None:
        return raw.decode("latin-1")
    parts = []
    for k in range(0, len(raw) - 1, 2):
        parts.append(cmap.get(raw[k : k + 2], "�"))
    if len(raw) % 2:  # odd trailing byte: pad per spec, then map
        parts.append(cmap.get(raw[-1:] + b"\x00", "�"))
    return "".join(parts)


def iter_pdf_page_text(buf, *, reading_order: bool = True, with_boxes: bool = False):
    """Yield a list of text spans per page of a born-digital PDF:
    dicts {text, x, y, size} with PDF user-space coordinates (origin
    bottom-left). With reading_order=True spans are sorted top-to-bottom,
    left-to-right (-y, x) — the XY order a single-column page reads in;
    stream order otherwise. With with_boxes=True yields
    (spans, (width, height)) from the page's /MediaBox (US-Letter default
    when absent)."""
    data = bytes(memoryview(buf))
    if not data.startswith(b"%PDF"):
        raise ValueError("PDF: bad magic")
    objs = _parse_objects(data)
    pages_node = None
    trailers = list(re.finditer(rb"trailer", data))
    if trailers:
        try:
            tdict, _ = _parse_value(data, trailers[-1].end())
            pages_node = _deref(objs, _deref(objs, tdict["Root"])["Pages"])
        except (KeyError, ValueError, IndexError):
            pages_node = None
    if pages_node is None:
        cats = [d for d, _s in objs.values() if isinstance(d, dict) and _deref(objs, d.get("Type")) == "/Catalog"]
        if len(cats) != 1:
            raise ValueError("PDF: cannot locate the page tree")
        pages_node = _deref(objs, cats[0]["Pages"])
    pages: list[dict] = []
    _page_kids(objs, pages_node, pages)
    if not pages:
        raise ValueError("PDF: page tree has no pages")
    for page in pages:
        fonts = _page_fonts(objs, page)
        cur_cmap: dict[bytes, str] | None = None
        spans = []
        x = y = 0.0
        size = leading = 0.0
        in_text = False
        stack: list = []

        def show(raw: bytes):
            txt = _decode_shown(raw, cur_cmap)
            if txt:
                spans.append({"text": txt, "x": x, "y": y, "size": size})

        for kind, val in _content_tokens(_page_content(objs, page)):
            if kind == "mark":  # assemble [ ... ] into one ('arr', items)
                if val == "[":
                    stack.append(("mark", "["))
                else:
                    items = []
                    while stack and stack[-1] != ("mark", "["):
                        items.append(stack.pop())
                    if not stack:
                        raise ValueError("PDF text: ']' without '['")
                    stack.pop()
                    items.reverse()
                    stack.append(("arr", items))
                continue
            if kind != "op":
                stack.append((kind, val))
                continue
            op = val
            try:
                if op == b"BT":
                    in_text, x, y = True, 0.0, 0.0
                elif op == b"ET":
                    in_text = False
                elif op == b"Tf" and len(stack) >= 2:
                    size = float(stack[-1][1])
                    if stack[-2][0] == "name":
                        cur_cmap = fonts.get(stack[-2][1])
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    x += float(stack[-2][1])
                    y += float(stack[-1][1])
                    if op == b"TD":
                        leading = -float(stack[-1][1])
                elif op == b"TL":
                    leading = float(stack[-1][1])
                elif op == b"Tm" and len(stack) >= 6:
                    x, y = float(stack[-2][1]), float(stack[-1][1])
                elif op == b"T*":
                    y -= leading
                elif op == b"Tj" and in_text and stack and stack[-1][0] == "str":
                    show(stack[-1][1])
                elif op == b"'" and in_text and stack and stack[-1][0] == "str":
                    y -= leading
                    show(stack[-1][1])
                elif op == b"TJ" and in_text and stack and stack[-1][0] == "arr":
                    # decode per element: an odd-length element must not
                    # shift the 2-byte CID framing of its successors
                    txt = "".join(
                        _decode_shown(v, cur_cmap)
                        for k, v in stack[-1][1]
                        if k == "str"
                    )
                    if txt:
                        spans.append({"text": txt, "x": x, "y": y, "size": size})
            finally:
                stack.clear()
        if reading_order:
            spans.sort(key=lambda s: (-s["y"], s["x"]))
        if with_boxes:
            mb = _deref(objs, page.get("MediaBox", [0, 0, 612, 792]))
            mb = [float(_deref(objs, v)) for v in mb]
            yield spans, (mb[2] - mb[0], mb[3] - mb[1])
        else:
            yield spans


def encode_pdf_text(pages: "list[list[str]]", *, compress: bool = True) -> bytes:
    """Fixture writer for the born-digital class: per page, each string
    becomes one Helvetica 12pt line (72 720 Td start, 14pt leading, Tj),
    content stream FlateDecode-compressed by default. Round-trips through
    iter_pdf_page_text for golden tests."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def put(num: int, body: bytes):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    def esc(s: str) -> bytes:
        return (
            s.encode("latin-1")
            .replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(")
            .replace(b")", b"\\)")
        )

    n = len(pages)
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n))
    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n))
    put(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, lines in enumerate(pages):
        pnum, cnum = 4 + 2 * i, 5 + 2 * i
        put(
            pnum,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % cnum,
        )
        body = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td ")
        for j, line in enumerate(lines):
            if j:
                body.extend(b"T* ")
            body.extend(b"(%s) Tj " % esc(line))
        body.extend(b"ET")
        if compress:
            data = zlib.compress(bytes(body), 6)
            put(cnum, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data) + data + b"\nendstream")
        else:
            put(cnum, b"<< /Length %d >>\nstream\n" % len(body) + bytes(body) + b"\nendstream")
    xref_at = len(out)
    nobj = 3 + 2 * n
    out.extend(b"xref\n0 %d\n" % (nobj + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, nobj + 1):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (nobj + 1, xref_at))
    return bytes(out)


def _tounicode_cmap(charset: "list[str]", *, bfrange_array: bool = False) -> bytes:
    """ToUnicode CMap stream for a subset font whose CIDs are
    1 + sorted-codepoint rank. Maximal consecutive-codepoint runs (BMP
    only) become bfrange entries — string-destination form by default,
    array-of-destinations form with bfrange_array — singletons and astral
    chars become bfchar; sections chunked at the spec's 100-entry limit."""
    cids = [(i + 1, ch) for i, ch in enumerate(charset)]
    ranges: list[tuple[int, int, list[str]]] = []  # (lo_cid, hi_cid, chars)
    chars: list[tuple[int, str]] = []
    k = 0
    while k < len(cids):
        j = k
        while (
            j + 1 < len(cids)
            and ord(cids[j + 1][1]) == ord(cids[j][1]) + 1
            and len(cids[j][1].encode("utf-16-be")) == 2
            and len(cids[j + 1][1].encode("utf-16-be")) == 2
        ):
            j += 1
        if j > k:
            ranges.append((cids[k][0], cids[j][0], [c for _, c in cids[k : j + 1]]))
        else:
            chars.append(cids[k])
        k = j + 1
    body = bytearray(
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    )
    for s in range(0, len(chars), 100):
        chunk = chars[s : s + 100]
        body.extend(b"%d beginbfchar\n" % len(chunk))
        for cid, ch in chunk:
            body.extend(b"<%04X> <%s>\n" % (cid, ch.encode("utf-16-be").hex().upper().encode()))
        body.extend(b"endbfchar\n")
    for s in range(0, len(ranges), 100):
        chunk = ranges[s : s + 100]
        body.extend(b"%d beginbfrange\n" % len(chunk))
        for lo, hi, run in chunk:
            if bfrange_array:
                dsts = b" ".join(
                    b"<%s>" % c.encode("utf-16-be").hex().upper().encode() for c in run
                )
                body.extend(b"<%04X> <%04X> [%s]\n" % (lo, hi, dsts))
            else:
                body.extend(
                    b"<%04X> <%04X> <%s>\n"
                    % (lo, hi, run[0].encode("utf-16-be").hex().upper().encode())
                )
        body.extend(b"endbfrange\n")
    body.extend(b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    return bytes(body)


def encode_pdf_text_type0(
    pages: "list[list[str]]",
    *,
    compress: bool = True,
    bfrange_array: bool = False,
    omit_tounicode: bool = False,
) -> bytes:
    """Fixture writer for the composite-font born-digital class: one
    /Type0 /Identity-H font whose CIDs are subset-font-style (1 +
    sorted-codepoint rank across the document — NOT the code points
    themselves, so a decoder that latin-1s the bytes produces garbage and
    only a real ToUnicode walk recovers the text), strings written as
    2-byte-CID hex, same page geometry as `encode_pdf_text` (12pt, 14pt
    leading, 72 720 Td start). `omit_tounicode` writes the reject-path
    fixture: a Type0 font with no /ToUnicode — no recoverable text layer,
    `iter_pdf_page_text` must raise its scoped error."""
    charset = sorted({ch for lines in pages for line in lines for ch in line})
    cid_of = {ch: i + 1 for i, ch in enumerate(charset)}
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def put(num: int, body: bytes):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    n = len(pages)
    first_page = 6
    kids = b" ".join(b"%d 0 R" % (first_page + 2 * i) for i in range(n))
    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n))
    font = bytearray(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+TRRSubset "
        b"/Encoding /Identity-H /DescendantFonts [4 0 R]"
    )
    if not omit_tounicode:
        font.extend(b" /ToUnicode 5 0 R")
    font.extend(b" >>")
    put(3, bytes(font))
    put(
        4,
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /AAAAAA+TRRSubset "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /CIDToGIDMap /Identity >>",
    )
    cmap = _tounicode_cmap(charset, bfrange_array=bfrange_array)
    if compress:
        cdata = zlib.compress(cmap, 6)
        put(5, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(cdata) + cdata + b"\nendstream")
    else:
        put(5, b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream")
    for i, lines in enumerate(pages):
        pnum, cnum = first_page + 2 * i, first_page + 2 * i + 1
        put(
            pnum,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % cnum,
        )
        body = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td ")
        for j, line in enumerate(lines):
            if j:
                body.extend(b"T* ")
            hx = b"".join(b"%04X" % cid_of[ch] for ch in line)
            body.extend(b"<%s> Tj " % hx)
        body.extend(b"ET")
        if compress:
            data = zlib.compress(bytes(body), 6)
            put(cnum, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data) + data + b"\nendstream")
        else:
            put(cnum, b"<< /Length %d >>\nstream\n" % len(body) + bytes(body) + b"\nendstream")
    xref_at = len(out)
    nobj = 5 + 2 * n
    out.extend(b"xref\n0 %d\n" % (nobj + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, nobj + 1):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (nobj + 1, xref_at))
    return bytes(out)
