"""From-scratch PDF support: all three content classes of S3.

The reference renders PDF pages through Ghostscript at `--density` dpi
(`/root/reference/tesseract-recognize.cc:490-511`) — an external-process
dependency this environment lacks, and one the reference itself marks
broken (`CMakeLists.txt:22`). This module replaces it per content class:

  1. IMAGE-WRAPPED (scanned) PDFs — one image XObject per page — are
     unwrapped losslessly at native resolution (`iter_pdf_page_images`);
  2. BORN-DIGITAL text PDFs — simple fonts or /Type0+/ToUnicode — have
     their exact text layer extracted, skipping OCR entirely
     (`iter_pdf_page_text`), a class the reference can only render+OCR;
  3. VECTOR-DRAWN PDFs — filled/stroked paths, outlined text, form
     XObjects, no extractable layer — are rendered by a scanline
     rasterizer at `--density` dpi (`rasterize_pdf_pages`) and OCR'd,
     the reference's semantics for everything.

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
    # PDF 1.5+ compressed layout: objects hidden inside /Type /ObjStm
    # streams are invisible to the byte scan — inflate each object stream
    # (with predictor reversal) and parse its members. Header = /N pairs of
    # "objnum offset" in the first /First bytes. Values are stored as-is
    # (ObjStm members are never streams, ISO 32000-1 7.5.7); a member
    # whose number the top-level scan already found is NOT overwritten
    # (the visible revision wins, matching incremental-update semantics).
    for d, stream in list(objs.values()):
        if not isinstance(d, dict) or _deref(objs, d.get("Type")) != "/ObjStm" or stream is None:
            continue
        data = _stream_data(objs, d, stream)
        first = int(_deref(objs, d["First"]))
        n = int(_deref(objs, d["N"]))
        hdr = data[:first].split()
        if len(hdr) < 2 * n:
            raise ValueError("PDF: object stream header shorter than /N pairs")
        for i in range(n):
            onum = int(hdr[2 * i])
            if onum in objs:
                continue
            val, _pos = _parse_value(data, first + int(hdr[2 * i + 1]))
            objs[onum] = (val, None)
    return objs


def _deref(objs, v):
    """Resolve refs to plain VALUES (dicts / numbers / arrays)."""
    while isinstance(v, _Ref):
        v = objs[v.num][0]
    return v


def _unpredict(data: bytes, parms: dict, objs) -> bytes:
    """Reverse a FlateDecode /DecodeParms predictor: 2 = TIFF horizontal
    differencing; 10-15 = the PNG row filters (ISO 32000-1 7.4.4.4 points
    at the PNG spec), reversed by the SAME engine the PNG codec uses
    (imagecodecs._unfilter). 8-bit components only — the layouts xref
    streams and Flate-predicted images actually use."""
    pred = int(_deref(objs, parms.get("Predictor", 1)) or 1)
    if pred == 1:
        return data
    columns = int(_deref(objs, parms.get("Columns", 1)) or 1)
    colors = int(_deref(objs, parms.get("Colors", 1)) or 1)
    bpc = int(_deref(objs, parms.get("BitsPerComponent", 8)) or 8)
    if bpc != 8:
        raise ValueError(f"PDF: predictor with {bpc}-bit components not supported")
    if pred == 2:  # TIFF horizontal differencing
        stride = columns * colors
        h = len(data) // stride
        rows = np.frombuffer(data[: h * stride], np.uint8).reshape(h, columns, colors)
        return rows.astype(np.int64).cumsum(axis=1).astype(np.uint8).tobytes()
    if 10 <= pred <= 15:
        from .imagecodecs import _unfilter

        stride = columns * colors
        h = len(data) // (1 + stride)
        raw = np.frombuffer(data[: h * (1 + stride)], np.uint8)
        return _unfilter(raw, h, stride, colors).tobytes()
    raise ValueError(f"PDF: predictor {pred} not supported")


def _stream_data(objs, sdict: dict, stream: bytes) -> bytes:
    """Decoded bytes of a stream: /Length-clamped, /Filter applied
    (FlateDecode, with /DecodeParms predictor reversal), none passthrough."""
    length = _deref(objs, sdict.get("Length"))
    raw = stream[: int(length)] if isinstance(length, (int, float)) else stream
    filt = _deref(objs, sdict.get("Filter"))
    if filt is None:
        return raw
    if filt == "/FlateDecode":
        out = zlib.decompress(raw)
        parms = _deref(objs, sdict.get("DecodeParms") or sdict.get("DP"))
        if isinstance(parms, dict):
            out = _unpredict(out, parms, objs)
        return out
    raise ValueError(f"PDF: stream filter {filt} not supported")


def _decode_image(objs, xdict: dict, raw: bytes) -> np.ndarray:
    filters = _deref(objs, xdict.get("Filter"))
    if filters is None:
        filters = []
    elif not isinstance(filters, list):
        filters = [filters]
    parms = _deref(objs, xdict.get("DecodeParms"))
    parms_list = [
        _deref(objs, p) for p in (parms if isinstance(parms, list) else [parms])
    ]
    data = raw
    for i, f in enumerate(filters):
        if f == "/FlateDecode":
            data = zlib.decompress(data)
            p = parms_list[i] if i < len(parms_list) else None
            if isinstance(p, dict):
                data = _unpredict(data, p, objs)
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


def _locate_pages(objs, data: bytes) -> "list[dict]":
    """Page dicts in document order. Root discovery, in priority order:
    classic trailer dict (LAST trailer wins — incremental updates append),
    the /Type /XRef cross-reference STREAM's trailer fields (PDF 1.5+
    files have no `trailer` keyword), then the lone-/Type /Catalog scan.
    Encrypted documents (an /Encrypt entry in any trailer dict) raise a
    SCOPED error up front — their stream bytes are RC4/AES ciphertext and
    would otherwise die deep inside a codec with a misleading message."""
    pages_node = None
    trailers = list(re.finditer(rb"trailer", data))

    def _reject_encrypted(d: dict):
        if isinstance(d, dict) and d.get("Encrypt") is not None:
            raise ValueError(
                "PDF: encrypted document (/Encrypt) — decryption is not "
                "supported; decrypt upstream before ingestion"
            )

    if trailers:
        try:
            tdict, _ = _parse_value(data, trailers[-1].end())
        except (ValueError, IndexError):
            tdict = None
        if isinstance(tdict, dict):
            _reject_encrypted(tdict)
            try:
                pages_node = _deref(objs, _deref(objs, tdict["Root"])["Pages"])
            except (KeyError, ValueError, IndexError):
                pages_node = None
    for d, _s in objs.values():
        if isinstance(d, dict) and _deref(objs, d.get("Type")) == "/XRef":
            _reject_encrypted(d)
    if pages_node is None:
        xrefs = [
            d for d, _s in objs.values()
            if isinstance(d, dict) and _deref(objs, d.get("Type")) == "/XRef"
        ]
        for xd in xrefs:
            try:
                pages_node = _deref(objs, _deref(objs, xd["Root"])["Pages"])
                break
            except (KeyError, ValueError, IndexError):
                continue
    if pages_node is None:
        cats = [
            d for d, _s in objs.values()
            if isinstance(d, dict) and _deref(objs, d.get("Type")) == "/Catalog"
        ]
        if len(cats) != 1:
            raise ValueError("PDF: cannot locate the page tree")
        pages_node = _deref(objs, cats[0]["Pages"])
    pages: list[dict] = []
    _page_kids(objs, pages_node, pages)
    if not pages:
        raise ValueError("PDF: page tree has no pages")
    return pages


def iter_pdf_page_images(buf):
    """Yield (h, w) uint8 grayscale per page of an image-wrapped PDF."""
    data = bytes(memoryview(buf))
    if not data.startswith(b"%PDF"):
        raise ValueError("PDF: bad magic")
    objs = _parse_objects(data)
    for page in _locate_pages(objs, data):
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
    """Decoded bytes of a referenced stream object (delegates to
    _stream_data: /Length clamp, FlateDecode, predictor reversal)."""
    if not isinstance(ref, _Ref):
        raise ValueError("PDF text: expected a stream reference")
    sdict, stream = objs[ref.num]
    if stream is None:
        raise ValueError("PDF text: referenced object carries no stream")
    return _stream_data(objs, sdict, stream)


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
    for page in _locate_pages(objs, data):
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


# ---------------------------------------------------------------------------
# Vector-content rasterizer (S3's third class: drawn pages)
#
# The reference renders EVERY PDF through Ghostscript at --density dpi and
# OCRs the pixels (tesseract-recognize.cc:45,108,132,490-511). The two
# routes above cover image-wrapped and text-layer PDFs exactly; this section
# covers the remainder — pages whose content is DRAWN (filled paths,
# outlined text, form XObjects) — with a from-scratch scanline rasterizer
# over the public ISO 32000-1 graphics subset:
#   * graphics state: q/Q stack, cm concatenation, fill/stroke gray from
#     g/G, rg/RG (BT.601 luma), k/K (naive CMYK), sc/scn/SC/SCN by operand
#     count; w line width; W/W* clipping (rasterized mask intersection);
#   * paths: m l c v y h re; painting f F f* B B* b b* S s n, nonzero and
#     even-odd winding via pixel-center scanline crossings; Beziers
#     flattened at fixed 16 subdivisions;
#   * XObjects via Do: /Image (decoded by the codecs above, axis-aligned
#     placement, nearest-neighbor) and /Form (recursive interpretation
#     under the concatenated /Matrix, depth-capped);
#   * text operators are IGNORED (glyph programs need embedded font
#     rasterization; extractable text is already routed to
#     iter_pdf_page_text before this runs) and inline images (BI) raise.
#
# Device mapping is the reference's: `density` dpi over a 72-dpi user
# space, y flipped (PDF origin bottom-left, raster origin top-left). A PDF
# that paints nothing anywhere raises ValueError so the caller can
# quarantine instead of OCRing blank pages.

_BEZIER_T = np.linspace(0.0, 1.0, 17)[1:]  # 16 segments per curve


def _mat(a, b, c, d, e, f) -> np.ndarray:
    """PDF matrix [a b c d e f] as a 2x3 row-transform: (x,y) ->
    (a*x + c*y + e, b*x + d*y + f)."""
    return np.array([[a, c, e], [b, d, f]], dtype=np.float64)


def _mat_mul(m2: np.ndarray, m1: np.ndarray) -> np.ndarray:
    """Compose: apply m1 first, then m2."""
    out = np.empty((2, 3), dtype=np.float64)
    out[:, :2] = m2[:, :2] @ m1[:, :2]
    out[:, 2] = m2[:, :2] @ m1[:, 2] + m2[:, 2]
    return out


def _xform(ctm: np.ndarray, x: float, y: float) -> tuple[float, float]:
    return (
        ctm[0, 0] * x + ctm[0, 1] * y + ctm[0, 2],
        ctm[1, 0] * x + ctm[1, 1] * y + ctm[1, 2],
    )


def _span(a: float, b: float) -> tuple[int, int]:
    """Pixel-center coverage of the half-open interval [a, b): pixels whose
    center a <= i+0.5 < b. Keeps the rect fast path and the scanline path
    bit-identical on integer boundaries."""
    return int(np.ceil(a - 0.5)), int(np.ceil(b - 0.5))


def _poly_rows(subpaths: "list[list[tuple[float, float]]]", y0: int, y1: int, evenodd: bool):
    """Yield (row, [(xa, xb), ...]) filled spans per scanline in [y0, y1),
    sampling at pixel centers (y + 0.5) with the given winding rule."""
    ex0, ey0, ex1, ey1 = [], [], [], []
    for sp in subpaths:
        if len(sp) < 3:
            continue
        pts = sp if sp[0] == sp[-1] else sp + [sp[0]]
        for (xa, ya), (xb, yb) in zip(pts, pts[1:]):
            if ya != yb:
                ex0.append(xa)
                ey0.append(ya)
                ex1.append(xb)
                ey1.append(yb)
    if not ex0:
        return
    ex0 = np.array(ex0)
    ey0 = np.array(ey0)
    ex1 = np.array(ex1)
    ey1 = np.array(ey1)
    slope = (ex1 - ex0) / (ey1 - ey0)
    for row in range(y0, y1):
        yc = row + 0.5
        hit = ((ey0 <= yc) & (yc < ey1)) | ((ey1 <= yc) & (yc < ey0))
        if not hit.any():
            continue
        xs = ex0[hit] + (yc - ey0[hit]) * slope[hit]
        if evenodd:
            xs.sort()
            spans = [(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)]
        else:
            wind = np.where(ey1[hit] > ey0[hit], 1, -1)
            order = np.argsort(xs, kind="stable")
            xs, wind = xs[order], wind[order]
            spans, acc, start = [], 0, 0.0
            for xv, wv in zip(xs, wind):
                if acc == 0:
                    start = xv
                acc += int(wv)
                if acc == 0:
                    spans.append((start, xv))
        yield row, spans


def _fill_mask(subpaths, H: int, W: int, evenodd: bool) -> "np.ndarray":
    """Boolean coverage mask of the path on an HxW grid (used for W/W* clip
    rasterization)."""
    mask = np.zeros((H, W), dtype=bool)
    ys = [p[1] for sp in subpaths for p in sp]
    if not ys:
        return mask
    y0 = max(0, int(np.floor(min(ys))))
    y1 = min(H, int(np.ceil(max(ys))) + 1)
    for row, spans in _poly_rows(subpaths, y0, y1, evenodd):
        for xa, xb in spans:
            c0, c1 = _span(max(xa, 0.0), min(xb, W))
            if c1 > c0:
                mask[row, c0:c1] = True
    return mask


def _boxes_disjoint(rects) -> bool:
    """True when no two (x0, y0, x1, y1) boxes overlap (open intervals)."""
    n = len(rects)
    if n <= 1:
        return True
    a = np.asarray(rects, dtype=np.float64)
    ox = (a[:, None, 0] < a[None, :, 2]) & (a[None, :, 0] < a[:, None, 2])
    oy = (a[:, None, 1] < a[None, :, 3]) & (a[None, :, 1] < a[:, None, 3])
    both = ox & oy
    both[np.arange(n), np.arange(n)] = False
    return not both.any()


def _axis_rect(sp: "list[tuple[float, float]]"):
    """(x0, y0, x1, y1) when the closed subpath is an axis-aligned
    rectangle, else None — the fast path for `re`-heavy content."""
    pts = sp[:-1] if len(sp) in (5, 6) and sp[0] == sp[-1] else sp
    if len(pts) != 4:
        return None
    xs = sorted({p[0] for p in pts})
    ys = sorted({p[1] for p in pts})
    if len(xs) != 2 or len(ys) != 2:
        return None
    corners = {(x, y) for x in xs for y in ys}
    if set(pts) != corners:
        return None
    return xs[0], ys[0], xs[1], ys[1]


class _PdfGState:
    __slots__ = ("ctm", "fill", "stroke", "lw", "clip")

    def __init__(self, ctm, fill=0, stroke=0, lw=1.0, clip=None):
        self.ctm = ctm
        self.fill = fill
        self.stroke = stroke
        self.lw = lw
        self.clip = clip  # bool HxW mask or None (= unclipped)

    def copy(self):
        return _PdfGState(self.ctm.copy(), self.fill, self.stroke, self.lw, self.clip)


def _luma_ops(vals: "list[float]") -> int:
    """Color operands -> 0..255 gray: 1 = gray, 3 = RGB (BT.601), 4 = naive
    CMYK; anything else (pattern names) paints black."""
    if len(vals) == 1:
        g = vals[0]
    elif len(vals) == 3:
        g = 0.299 * vals[0] + 0.587 * vals[1] + 0.114 * vals[2]
    elif len(vals) == 4:
        c, m, y, k = vals
        g = (1 - min(1.0, c + k)) * 0.299 + (1 - min(1.0, m + k)) * 0.587 + (1 - min(1.0, y + k)) * 0.114
    else:
        g = 0.0
    return int(round(max(0.0, min(1.0, g)) * 255))


class _VectorPage:
    """One page's raster + interpreter state."""

    def __init__(self, objs, page: dict, dpi: int):
        mb = _deref(objs, page.get("MediaBox", [0, 0, 612, 792]))
        mb = [float(_deref(objs, v)) for v in mb]
        self.uw, self.uh = mb[2] - mb[0], mb[3] - mb[1]
        k = dpi / 72.0
        self.W = max(1, int(round(self.uw * k)))
        self.H = max(1, int(round(self.uh * k)))
        self.canvas = np.full((self.H, self.W), 255, dtype=np.uint8)
        # base CTM: user space -> device pixels, y flipped, MediaBox origin
        base = _mat(k, 0.0, 0.0, -k, -mb[0] * k, self.H + mb[1] * k)
        self.gs = _PdfGState(base)
        self.stack: list[_PdfGState] = []
        self.objs = objs
        self.page = page
        self.painted = False

    # -- painting helpers ---------------------------------------------------
    def _paint_spans(self, subpaths, evenodd: bool, gray: int):
        """Fill the path. The axis-rect fast path (direct slice assignment)
        is only sound when winding interactions between subpaths are
        impossible — every subpath an axis rect AND all boxes pairwise
        disjoint; any overlap (nested even-odd holes, opposite-orientation
        nonzero cancellation) must go through the joint scanline."""
        clip = self.gs.clip
        rects = [_axis_rect(sp) for sp in subpaths]
        if all(r is not None for r in rects) and _boxes_disjoint(rects):
            for x0, y0, x1, y1 in rects:
                c0, c1 = _span(max(x0, 0.0), min(x1, self.W))
                r0, r1 = _span(max(y0, 0.0), min(y1, self.H))
                if c1 > c0 and r1 > r0:
                    if clip is None:
                        self.canvas[r0:r1, c0:c1] = gray
                    else:
                        region = clip[r0:r1, c0:c1]
                        self.canvas[r0:r1, c0:c1][region] = gray
                    self.painted = True
            return
        ys = [p[1] for sp in subpaths for p in sp]
        if not ys:
            return
        y0 = max(0, int(np.floor(min(ys))))
        y1 = min(self.H, int(np.ceil(max(ys))) + 1)
        for row, spans in _poly_rows(subpaths, y0, y1, evenodd):
            for xa, xb in spans:
                c0, c1 = _span(max(xa, 0.0), min(xb, self.W))
                if c1 > c0:
                    if clip is None:
                        self.canvas[row, c0:c1] = gray
                    else:
                        seg = clip[row, c0:c1]
                        self.canvas[row, c0:c1][seg] = gray
                    self.painted = True

    def _stroke(self, subpaths, gray: int):
        """Stroke as stamped squares along each segment — width from the
        CTM-scaled line width, floored at one device pixel."""
        scale = float(np.sqrt(abs(np.linalg.det(self.gs.ctm[:, :2]))))
        t = max(1, int(round(self.gs.lw * scale)))
        half = t / 2.0
        clip = self.gs.clip
        for sp in subpaths:
            for (xa, ya), (xb, yb) in zip(sp, sp[1:]):
                seg = max(abs(xb - xa), abs(yb - ya))
                steps = max(1, int(np.ceil(seg / 0.5)))
                for i in range(steps + 1):
                    u = i / steps
                    cx, cy = xa + u * (xb - xa), ya + u * (yb - ya)
                    c0, c1 = _span(max(cx - half, 0.0), min(cx + half, self.W))
                    r0, r1 = _span(max(cy - half, 0.0), min(cy + half, self.H))
                    c1, r1 = max(c1, c0 + 1), max(r1, r0 + 1)
                    if 0 <= r0 < self.H and 0 <= c0 < self.W:
                        if clip is None:
                            self.canvas[r0:r1, c0:c1] = gray
                        else:
                            region = clip[r0:r1, c0:c1]
                            self.canvas[r0:r1, c0:c1][region] = gray
                        self.painted = True

    def _draw_image(self, xdict: dict, raw: bytes):
        """Place a decoded image XObject: the unit square maps through the
        CTM; placement must be axis-aligned (rotation/skew of raster content
        is out of scope — raise, don't resample silently)."""
        ctm = self.gs.ctm
        if abs(ctm[0, 1]) > 1e-9 or abs(ctm[1, 0]) > 1e-9:
            raise ValueError("PDF raster: rotated/skewed image placement not supported")
        img = _finish_gray(self.objs, xdict, _decode_image(self.objs, xdict, raw))
        x0, y0 = _xform(ctm, 0.0, 0.0)
        x1, y1 = _xform(ctm, 1.0, 1.0)
        (xa, xb), (ya, yb) = sorted((x0, x1)), sorted((y0, y1))
        c0, c1 = _span(max(xa, 0.0), min(xb, self.W))
        r0, r1 = _span(max(ya, 0.0), min(yb, self.H))
        if c1 <= c0 or r1 <= r0:
            return
        ih, iw = img.shape
        # nearest-neighbor: device pixel center -> source pixel. Image row 0
        # sits at the unit square's TOP edge (y=1, ISO 32000-1 8.9.5.2); with
        # the usual y-flipping CTM that edge has the SMALLER device y, so
        # device rows read the image top-down directly. Only when the net
        # transform leaves y un-flipped (y1 below y0 in device space) is the
        # placed image upside down relative to device row order.
        upside_down = y1 > y0
        cols = np.clip(((np.arange(c0, c1) + 0.5 - xa) / max(xb - xa, 1e-12) * iw), 0, iw - 1e-9).astype(np.int64)
        rows_f = (np.arange(r0, r1) + 0.5 - ya) / max(yb - ya, 1e-12) * ih
        rows = np.clip(rows_f, 0, ih - 1e-9).astype(np.int64)
        if upside_down:
            rows = ih - 1 - rows
        tile = img[np.ix_(rows, cols)]
        clip = self.gs.clip
        if clip is None:
            self.canvas[r0:r1, c0:c1] = tile
        else:
            region = clip[r0:r1, c0:c1]
            sub = self.canvas[r0:r1, c0:c1]
            sub[region] = tile[region]
        self.painted = True

    # -- interpreter ---------------------------------------------------------
    def run(self, content: bytes, resources: dict, depth: int = 0):
        if depth > 8:
            raise ValueError("PDF raster: form XObject nesting too deep")
        objs = self.objs
        xobjects = _deref(objs, _deref(objs, resources.get("XObject")) or {})
        path: list[list[tuple[float, float]]] = []
        cur: list[tuple[float, float]] = []
        start: tuple[float, float] | None = None
        pending_clip: str | None = None
        stack: list = []

        def flush_path():
            nonlocal path, cur, start, pending_clip
            if cur:
                path.append(cur)
            if pending_clip is not None:
                m = _fill_mask(path, self.H, self.W, pending_clip == "W*")
                self.gs.clip = m if self.gs.clip is None else (self.gs.clip & m)
                pending_clip = None
            path, cur, start = [], [], None

        def moveto(x, y):
            nonlocal cur, start
            if cur:
                path.append(cur)
            p = _xform(self.gs.ctm, x, y)
            cur = [p]
            start = p

        def closep():
            nonlocal cur
            if cur and start is not None and cur[-1] != start:
                cur.append(start)

        def subpaths_closed():
            out = [sp for sp in path if len(sp) >= 2]
            if cur and len(cur) >= 2:
                out.append(cur)
            return out

        def curve(p1, p2, p3):
            """Flatten a cubic from the current point (device space ctrl pts)."""
            nonlocal cur
            if not cur:
                return
            p0 = np.array(cur[-1])
            p1, p2, p3 = np.array(p1), np.array(p2), np.array(p3)
            for t in _BEZIER_T:
                q = (
                    (1 - t) ** 3 * p0
                    + 3 * (1 - t) ** 2 * t * p1
                    + 3 * (1 - t) * t**2 * p2
                    + t**3 * p3
                )
                cur.append((float(q[0]), float(q[1])))

        for kind, val in _content_tokens(content):
            if kind == "mark":  # arrays only appear in ignored text ops
                stack.append((kind, val))
                continue
            if kind != "op":
                stack.append((kind, val))
                continue
            op = bytes(val)
            try:
                nums = [v for k2, v in stack if k2 == "num"]
                if op == b"q":
                    self.stack.append(self.gs.copy())
                elif op == b"Q":
                    if self.stack:
                        self.gs = self.stack.pop()
                elif op == b"cm" and len(nums) >= 6:
                    self.gs.ctm = _mat_mul(self.gs.ctm, _mat(*nums[-6:]))
                elif op == b"w" and nums:
                    self.gs.lw = nums[-1]
                elif op == b"m" and len(nums) >= 2:
                    moveto(nums[-2], nums[-1])
                elif op == b"l" and len(nums) >= 2 and cur:
                    cur.append(_xform(self.gs.ctm, nums[-2], nums[-1]))
                elif op == b"c" and len(nums) >= 6 and cur:
                    curve(
                        _xform(self.gs.ctm, nums[-6], nums[-5]),
                        _xform(self.gs.ctm, nums[-4], nums[-3]),
                        _xform(self.gs.ctm, nums[-2], nums[-1]),
                    )
                elif op == b"v" and len(nums) >= 4 and cur:
                    p3 = _xform(self.gs.ctm, nums[-2], nums[-1])
                    curve(cur[-1], _xform(self.gs.ctm, nums[-4], nums[-3]), p3)
                elif op == b"y" and len(nums) >= 4 and cur:
                    p3 = _xform(self.gs.ctm, nums[-2], nums[-1])
                    curve(_xform(self.gs.ctm, nums[-4], nums[-3]), p3, p3)
                elif op == b"h":
                    closep()
                elif op == b"re" and len(nums) >= 4:
                    x, y, w, h = nums[-4:]
                    if cur:
                        path.append(cur)
                        cur = []
                    quad = [
                        _xform(self.gs.ctm, x, y),
                        _xform(self.gs.ctm, x + w, y),
                        _xform(self.gs.ctm, x + w, y + h),
                        _xform(self.gs.ctm, x, y + h),
                    ]
                    quad.append(quad[0])
                    path.append(quad)
                elif op in (b"f", b"F", b"f*", b"b", b"b*", b"B", b"B*"):
                    if op in (b"b", b"b*"):
                        closep()
                    sps = subpaths_closed()
                    self._paint_spans(sps, op.endswith(b"*"), self.gs.fill)
                    if op[:1] in (b"b", b"B"):
                        self._stroke(sps, self.gs.stroke)
                    flush_path()
                elif op in (b"S", b"s"):
                    if op == b"s":
                        closep()
                    self._stroke(subpaths_closed(), self.gs.stroke)
                    flush_path()
                elif op == b"n":
                    flush_path()
                elif op in (b"W", b"W*"):
                    pending_clip = op.decode()
                elif op == b"g" and nums:
                    self.gs.fill = _luma_ops(nums[-1:])
                elif op == b"G" and nums:
                    self.gs.stroke = _luma_ops(nums[-1:])
                elif op == b"rg" and len(nums) >= 3:
                    self.gs.fill = _luma_ops(nums[-3:])
                elif op == b"RG" and len(nums) >= 3:
                    self.gs.stroke = _luma_ops(nums[-3:])
                elif op == b"k" and len(nums) >= 4:
                    self.gs.fill = _luma_ops(nums[-4:])
                elif op == b"K" and len(nums) >= 4:
                    self.gs.stroke = _luma_ops(nums[-4:])
                elif op in (b"sc", b"scn") and nums:
                    self.gs.fill = _luma_ops(nums)
                elif op in (b"SC", b"SCN") and nums:
                    self.gs.stroke = _luma_ops(nums)
                elif op == b"BI":
                    raise ValueError("PDF raster: inline images (BI/ID/EI) not supported")
                elif op == b"Do":
                    names = [v for k2, v in stack if k2 == "name"]
                    if not names:
                        raise ValueError("PDF raster: Do without a name operand")
                    ref = (xobjects or {}).get(names[-1])
                    if ref is None:
                        raise ValueError(f"PDF raster: unknown XObject /{names[-1]}")
                    xdict, xstream = objs[ref.num]
                    sub = _deref(objs, xdict.get("Subtype"))
                    if sub == "/Image":
                        length = _deref(objs, xdict.get("Length"))
                        raw = xstream[: int(length)] if isinstance(length, (int, float)) else xstream
                        self._draw_image(xdict, raw)
                    elif sub == "/Form":
                        self.stack.append(self.gs.copy())
                        mtx = _deref(objs, xdict.get("Matrix"))
                        if mtx is not None:
                            self.gs.ctm = _mat_mul(self.gs.ctm, _mat(*[float(_deref(objs, v)) for v in mtx]))
                        fres = _deref(objs, xdict.get("Resources")) or resources
                        self.run(_stream_bytes(objs, ref), fres, depth + 1)
                        self.gs = self.stack.pop()
                    else:
                        raise ValueError(f"PDF raster: XObject subtype {sub} not supported")
                # text/state ops (BT..ET, Tf, gs, d, j, J, M, ri, i, cs, CS,
                # BMC/BDC/EMC, MP/DP) are intentionally ignored: extractable
                # text is routed to iter_pdf_page_text before rasterizing
            finally:
                stack.clear()


def rasterize_pdf_pages(buf, *, dpi: int = 300) -> "list[np.ndarray]":
    """Render a vector-content PDF to one uint8 grayscale array per page at
    `dpi` (the reference's --density semantics, tesseract-recognize.cc:45).
    Raises ValueError when no page paints any ink — a blank render means
    this route cannot represent the document (e.g. text-only with
    unextractable fonts) and the caller must quarantine, not OCR blanks."""
    data = bytes(memoryview(buf))
    if not data.startswith(b"%PDF"):
        raise ValueError("PDF: bad magic")
    objs = _parse_objects(data)
    out, painted = [], False
    for page in _locate_pages(objs, data):
        vp = _VectorPage(objs, page, dpi)
        res = _deref(objs, page.get("Resources", {})) or {}
        vp.run(_page_content(objs, page), res)
        painted = painted or vp.painted
        out.append(vp.canvas)
    if not painted:
        raise ValueError(
            "PDF raster: no paintable vector content on any page — "
            "nothing this route can OCR"
        )
    return out


def _ink_run_rects(img: np.ndarray) -> "list[tuple[int, int, int, int]]":
    """Maximal (x, y, w, h) ink rectangles of a bilevel page: consecutive
    identical rows merge vertically, per-row runs come from the binarized
    diff — the exact geometry, no approximation (top-down pixel coords)."""
    ink = img < 128
    rects: list[tuple[int, int, int, int]] = []
    h, w = ink.shape
    r = 0
    while r < h:
        r2 = r + 1
        while r2 < h and np.array_equal(ink[r2], ink[r]):
            r2 += 1
        row = ink[r]
        if row.any():
            d = np.diff(np.concatenate(([False], row, [False])).astype(np.int8))
            starts = np.flatnonzero(d == 1)
            ends = np.flatnonzero(d == -1)
            for c0, c1 in zip(starts, ends):
                rects.append((int(c0), r, int(c1 - c0), r2 - r))
        r = r2
    return rects


def encode_pdf_vector(
    pages: "list[np.ndarray]", *, compress: bool = True, poly_frac: float = 0.3, seed: int = 0
) -> bytes:
    """Fixture writer for the VECTOR-CONTENT PDF class: each bilevel page's
    ink is DRAWN — no raster stream, no text layer — as filled paths in a
    72-dpi user space where 1 unit = 1 source pixel, so
    `rasterize_pdf_pages(..., dpi=72)` reproduces the page bit-for-bit (and
    dpi = 72*n reproduces the n-fold block upscale: integer rect edges stay
    integral under integer scaling). A deterministic `poly_frac` share of
    the rects is written as explicit m/l/h polygons (plus q/cm translation
    for a sub-share) instead of `re`, exercising the scanline fill and the
    state stack, not just the axis-aligned fast path; rects batch 24
    subpaths per fill op."""
    rng = np.random.default_rng(seed)
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def put(num: int, body: bytes):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nendobj\n")

    n = len(pages)
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n))
    put(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    put(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n))
    for i, img in enumerate(pages):
        ph, pw = img.shape
        pnum, cnum = 3 + 2 * i, 3 + 2 * i + 1
        put(
            pnum,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] /Contents %d 0 R >>"
            % (pw, ph, cnum),
        )
        body = bytearray(b"0 g\n")
        batch = 0
        for x, y, w, hh in _ink_run_rects(img):
            yp = ph - y - hh  # top-down pixel row -> bottom-up user y
            draw = rng.random()
            if draw < poly_frac / 2:
                body.extend(
                    b"%d %d m %d %d l %d %d l %d %d l h\n"
                    % (x, yp, x + w, yp, x + w, yp + hh, x, yp + hh)
                )
            elif draw < poly_frac:
                # same polygon under a q/cm translation (state-stack path)
                body.extend(
                    b"q 1 0 0 1 %d %d cm 0 0 m %d 0 l %d %d l 0 %d l h f Q\n"
                    % (x, yp, w, w, hh, hh)
                )
                continue  # painted inside the q/Q pair
            else:
                body.extend(b"%d %d %d %d re\n" % (x, yp, w, hh))
            batch += 1
            if batch >= 24:
                body.extend(b"f\n")
                batch = 0
        if batch:
            body.extend(b"f\n")
        if compress:
            data = zlib.compress(bytes(body), 6)
            put(cnum, b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data) + data + b"\nendstream")
        else:
            put(cnum, b"<< /Length %d >>\nstream\n" % len(body) + bytes(body) + b"\nendstream")
    xref_at = len(out)
    nobj = 2 + 2 * n
    out.extend(b"xref\n0 %d\n" % (nobj + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, nobj + 1):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (nobj + 1, xref_at))
    return bytes(out)


def _png_up_encode(rows: np.ndarray) -> bytes:
    """Forward PNG Up filter (type 2) over (h, stride) uint8 rows — the
    standard encoding for predictor-12 xref streams."""
    prev = np.zeros(rows.shape[1], dtype=np.uint8)
    out = bytearray()
    for r in rows:
        out.append(2)
        out.extend(((r - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = r
    return bytes(out)


def repack_pdf_objstm(buf, *, xref_predictor: int = 12) -> bytes:
    """Rewrite a classic-layout PDF into the PDF 1.5+ COMPRESSED layout the
    post-2005 world actually ships: every non-stream object moves into one
    FlateDecode /Type /ObjStm object stream, the cross-reference table and
    `trailer` keyword are replaced by a /Type /XRef cross-reference STREAM
    (W [1 2 1], PNG Up predictor by default), and stream-bearing objects
    stay top-level (the spec forbids streams inside object streams,
    ISO 32000-1 7.5.7). Fixture transformer: feeding each corpus class
    through this proves the reader's ObjStm expansion + XRef-root discovery
    end-to-end. Raw object bodies are carried as BYTES (never re-serialized
    from parsed values), so the transform is content-exact."""
    data = bytes(memoryview(buf))
    if not data.startswith(b"%PDF"):
        raise ValueError("PDF: bad magic")
    stream_kw = re.compile(rb"[\x00\t\n\x0c\r ]*stream(\r\n|\n|\r)")
    members: list[tuple[int, bytes]] = []  # (num, raw value bytes)
    keeps: list[tuple[int, bytes, bytes]] = []  # (num, dict bytes, stream bytes)
    root_num = None
    last_end = 0
    for m in _OBJ_RE.finditer(data):
        if m.start() < last_end:
            continue
        try:
            val, vpos = _parse_value(data, m.end())
        except (ValueError, IndexError):
            continue
        num = int(m.group(1))
        body = data[m.end() : vpos].strip()
        if isinstance(val, dict) and val.get("Type") == "/Catalog":
            root_num = num
        sm = stream_kw.match(data, vpos) if isinstance(val, dict) else None
        if sm:
            length = val.get("Length")
            if isinstance(length, (int, float)):
                s0 = sm.end()
                stream = data[s0 : s0 + int(length)]
                last_end = s0 + int(length)
            else:
                e = data.find(b"endstream", sm.end())
                if e < 0:
                    continue
                stream = data[sm.end() : e]
                last_end = e
            keeps.append((num, body, stream))
        else:
            last_end = vpos
            members.append((num, body))
    if root_num is None:
        raise ValueError("PDF: no /Type /Catalog object to repack around")
    max_num = max([n for n, *_ in members] + [n for n, _b, _s in keeps])
    objstm_num, xref_num = max_num + 1, max_num + 2

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, body, stream in keeps:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        out.extend(b"\nstream\n")
        out.extend(stream)
        out.extend(b"\nendstream\nendobj\n")
    # object stream: header pairs, then member bodies
    hdr = bytearray()
    payload = bytearray()
    for num, body in members:
        hdr.extend(b"%d %d " % (num, len(payload)))
        payload.extend(body)
        payload.extend(b"\n")
    stm = bytes(hdr) + bytes(payload)
    z = zlib.compress(stm, 6)
    offsets[objstm_num] = len(out)
    out.extend(
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (objstm_num, len(members), len(hdr), len(z))
    )
    out.extend(z)
    out.extend(b"\nendstream\nendobj\n")
    # cross-reference stream: W [1 2 1]; type 0 free / 1 offset / 2 in-stream
    size = xref_num + 1
    rows = np.zeros((size, 4), dtype=np.uint8)

    def put_row(num: int, t: int, f2: int, f3: int):
        rows[num] = (t, (f2 >> 8) & 0xFF, f2 & 0xFF, f3)

    for idx, (num, _b) in enumerate(members):
        put_row(num, 2, objstm_num, idx)
    xref_at = None
    for num in offsets:
        put_row(num, 1, offsets[num], 0)
    xref_at = len(out)
    put_row(xref_num, 1, xref_at, 0)
    if xref_predictor == 12:
        body = _png_up_encode(rows)
        parms = b" /DecodeParms << /Predictor 12 /Columns 4 >>"
    elif xref_predictor in (0, 1):
        body = rows.tobytes()
        parms = b""
    else:
        raise ValueError("xref_predictor must be 1 or 12")
    zb = zlib.compress(body, 6)
    out.extend(
        b"%d 0 obj\n<< /Type /XRef /Size %d /Root %d 0 R /W [1 2 1] "
        b"/Filter /FlateDecode%s /Length %d >>\nstream\n"
        % (xref_num, size, root_num, parms, len(zb))
    )
    out.extend(zb)
    out.extend(b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
    return bytes(out)
