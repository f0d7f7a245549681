"""From-scratch GIF / BMP / PNM codecs (pure numpy + stdlib).

The reference front end accepts any format leptonica's pixRead sniffs
(`/root/reference/tesseract-recognize.cc:514-531`), which beyond
PNG/JPEG/TIFF includes the legacy raster formats scanned archives still
carry. This module implements the three with public specs and no external
deps; `imagecodecs.sniff_format` / `iter_page_images` dispatch here on
magic bytes.

* **GIF** (GIF87a/GIF89a spec): logical screen descriptor, global/local
  color tables, interlaced row ordering (4-pass), GCE transparency
  (composited over white paper), and the GIF flavor of LZW — LSB-first bit
  packing, per-image minimum code size, width growth WITHOUT the TIFF
  early-change quirk, deferred-clear tolerated. Multi-image files are
  composited frame-by-frame onto the logical screen and each frame is
  yielded as a page (disposal methods are ignored — document scans are
  single-frame; the composite rule is stated, not silent).
* **BMP** (Windows BITMAPINFOHEADER): bottom-up and top-down rows, 4-byte
  row padding, bpp 8 (palette -> gray/luma), 24 and 32 (BGR(A) -> luma),
  BI_RGB (uncompressed) only.
* **PNM** (Netpbm): raw P4 (1-bit, MSB-first, 0=white per PBM convention),
  raw P5 (gray, maxval <= 255 native; 16-bit scaled down), raw P6 (RGB ->
  luma), with `#` comments in the header.

Encoders (gray GIF / BMP-8 / P5, plus a bilevel P4) exist so fixtures and
tests can round-trip real encoded media deterministically.

RGB->gray uses the same BT.601 integer luma as `imagecodecs._luma`; alpha
composites over white (paper), matching the document-pipeline convention.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodecs import _luma, _over_white

# ---------------------------------------------------------------------- GIF

_GIF_MAX_TABLE = 4096


def _gif_lzw_decode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW: LSB-first codes, width grows at table size 2^width
    (no early change), table capped at 4096 with deferred clear allowed."""
    clear = 1 << min_code
    eoi = clear + 1

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < _GIF_MAX_TABLE:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < _GIF_MAX_TABLE:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF: LZW code out of range")
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _gif_lzw_encode(data: bytes, min_code: int) -> bytes:
    """GIF-variant LZW encoder (matched to `_gif_lzw_decode`; emits a Clear
    when the table fills, like the classic compress-derived writers)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = min_code + 1

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        # width check runs on the PRE-assignment count (compress ordering):
        # the bump lands one emit after the table crossed 2^width, which is
        # exactly when the decoder (whose table lags ours by one) crosses it
        if nxt >= (1 << width) and width < 12:
            width += 1
        if nxt < _GIF_MAX_TABLE:
            table[wc] = nxt
            nxt += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code + 1
        w = bytes([ch])
    if w:
        emit(table[w])
        if nxt >= (1 << width) and width < 12:
            width += 1
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _gif_deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows arrive in pass order (0::8, 4::8, 2::4,
    1::2); scatter them back."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)])
    out[order] = rows
    return out


def iter_gif_frames(buf):
    """Yield (h, w) uint8 grayscale per image block, each composited onto
    the logical-screen canvas (white-initialized; disposal ignored)."""
    # normalize to bytes: a memoryview over a pyarrow Buffer has format 'b'
    # (SIGNED), so item reads like a sub-block length of 0xC8 come back as
    # -56 and the skip loops walk backwards — bytes indexing is unsigned
    mv = bytes(memoryview(buf))
    if bytes(mv[:4]) != b"GIF8" or bytes(mv[4:6]) not in (b"7a", b"9a"):
        raise ValueError("GIF: bad magic")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", mv, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(mv, dtype=np.uint8, offset=pos, count=3 * n).reshape(n, 3)
        pos += 3 * n
    canvas = np.full((sh, sw), 255, dtype=np.uint8)
    transparent: int | None = None
    yielded = False
    while pos < len(mv):
        block = mv[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = mv[pos]
            pos += 1
            if label == 0xF9:  # graphic control: transparency index
                size = mv[pos]
                flags = mv[pos + 1]
                tidx = mv[pos + 4]
                transparent = tidx if flags & 0x01 else None
                pos += 1 + size
            while mv[pos]:  # skip (remaining) sub-blocks
                pos += 1 + mv[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", mv, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(mv, dtype=np.uint8, offset=pos, count=3 * n).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF: image has no color table")
        min_code = mv[pos]
        pos += 1
        chunks = []
        while mv[pos]:
            ln = mv[pos]
            chunks.append(bytes(mv[pos + 1 : pos + 1 + ln]))
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(_gif_lzw_decode(b"".join(chunks), min_code), dtype=np.uint8, count=w * h).reshape(
            h, w
        )
        if ipacked & 0x40:
            idx = _gif_deinterlace(idx)
        gray = _luma(ct[idx])
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = gray[opaque]
        else:
            region[:, :] = gray
        transparent = None  # GCE applies to one following image only
        yield canvas.copy()
        yielded = True
    if not yielded:
        raise ValueError("GIF: no image blocks")


def encode_gif_gray(img: np.ndarray, *, interlace: bool = False) -> bytes:
    """(h, w) uint8 -> single-frame GIF89a with a 256-entry gray palette."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    rows = img
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        rows = img[order]
    out.append(8)  # minimum LZW code size
    data = _gif_lzw_encode(rows.tobytes(), 8)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------- BMP


def decode_bmp(buf) -> np.ndarray:
    """BMP (BITMAPINFOHEADER, BI_RGB) -> (h, w) uint8 grayscale."""
    mv = memoryview(buf)
    if bytes(mv[:2]) != b"BM":
        raise ValueError("BMP: bad magic")
    (data_off,) = struct.unpack_from("<I", mv, 10)
    (hdr_size,) = struct.unpack_from("<I", mv, 14)
    w, h_signed = struct.unpack_from("<ii", mv, 18)
    if hdr_size < 40:
        raise ValueError("BMP: pre-BITMAPINFOHEADER headers not supported")
    _planes, bpp, comp = struct.unpack_from("<HHI", mv, 26)
    if comp not in (0, 1):
        raise ValueError(f"BMP: compression {comp} not supported (BI_RGB/BI_RLE8 only)")
    h = abs(h_signed)
    if comp == 1:  # BI_RLE8: runs + escapes (EOL/EOB/delta/absolute mode)
        if bpp != 8:
            raise ValueError("BMP: BI_RLE8 requires 8 bpp")
        if h_signed < 0:
            raise ValueError("BMP: BI_RLE8 bitmaps must be bottom-up")
        idx = np.zeros((h, w), dtype=np.uint8)
        data = bytes(mv[data_off:])
        x = y = i = 0
        ended = False
        while i + 2 <= len(data):
            cnt, val = data[i], data[i + 1]
            i += 2
            if cnt:  # encoded run
                if y >= h:
                    raise ValueError("BMP: RLE8 run below last row")
                idx[y, x : min(x + cnt, w)] = val
                x = min(x + cnt, w)
            elif val == 0:  # end of line
                x, y = 0, y + 1
            elif val == 1:  # end of bitmap
                ended = True
                break
            elif val == 2:  # delta: skipped pixels stay palette index 0
                if i + 2 > len(data):
                    raise ValueError("BMP: RLE8 truncated delta")
                x, y = x + data[i], y + data[i + 1]
                i += 2
            else:  # absolute mode: val literal bytes, word-aligned
                if y >= h:
                    raise ValueError("BMP: RLE8 literals below last row")
                if i + val > len(data):
                    raise ValueError("BMP: RLE8 truncated literals")
                lit = np.frombuffer(data, np.uint8, count=val, offset=i)
                take = min(x + val, w) - x
                idx[y, x : x + take] = lit[:take]
                x += take
                i += val + (val & 1)
        if not ended:
            raise ValueError("BMP: RLE8 stream missing end-of-bitmap")
        raw = idx[::-1]  # bottom-up, like BI_RGB
    else:
        stride = ((w * bpp + 31) // 32) * 4
        raw = np.frombuffer(mv, dtype=np.uint8, offset=data_off, count=stride * h).reshape(h, stride)
        if h_signed > 0:  # bottom-up storage
            raw = raw[::-1]
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", mv, 46)
        n = n_colors or 256
        pal = np.frombuffer(mv, dtype=np.uint8, offset=14 + hdr_size, count=4 * n).reshape(n, 4)
        lut = _luma(pal[:, [2, 1, 0]])  # stored BGRX
        return lut[raw[:, :w]].copy()
    if bpp == 24:
        px = raw[:, : w * 3].reshape(h, w, 3)
        return _luma(px[:, :, ::-1])  # BGR -> RGB
    if bpp == 32:
        px = raw[:, : w * 4].reshape(h, w, 4)
        v = _luma(px[:, :, [2, 1, 0]])
        return _over_white(v, px[:, :, 3])
    raise ValueError(f"BMP: unsupported bpp {bpp}")


def encode_bmp_gray(img: np.ndarray, *, top_down: bool = False, rle: bool = False) -> bytes:
    """(h, w) uint8 -> 8-bit palettized BMP (BI_RGB, or BI_RLE8 run-length
    with rle=True; RLE bitmaps are bottom-up by spec so rle excludes
    top_down)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if rle and top_down:
        raise ValueError("BMP: BI_RLE8 bitmaps must be bottom-up")
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = pal[:, 1] = pal[:, 2] = np.arange(256)
    if rle:
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up row order
            row = img[y]
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                body += bytes((run, int(row[x])))
                x += run
            body += b"\x00\x00" if y else b"\x00\x01"  # EOL; EOB on last
        data, comp, size_img = bytes(body), 1, len(body)
    else:
        stride = ((w + 3) // 4) * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img if top_down else img[::-1]
        data, comp, size_img = rows.tobytes(), 0, stride * h
    data_off = 14 + 40 + 1024
    out = bytearray(b"BM")
    out += struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, 8, comp, size_img, 2835, 2835, 256, 0,
    )
    out += pal.tobytes()
    out += data
    return bytes(out)


# ---------------------------------------------------------------------- PNM


def decode_pnm(buf) -> np.ndarray:
    """Raw PNM (P4/P5/P6) -> (h, w) uint8 grayscale."""
    mv = bytes(memoryview(buf))
    if mv[:1] != b"P" or mv[1:2] not in b"456":
        raise ValueError("PNM: only raw P4/P5/P6 supported")
    kind = mv[1:2]
    pos = 2
    fields = []
    need = 2 if kind == b"4" else 3

    def skip_ws(p: int) -> int:
        while p < len(mv):
            if mv[p : p + 1].isspace():
                p += 1
            elif mv[p : p + 1] == b"#":
                while p < len(mv) and mv[p : p + 1] != b"\n":
                    p += 1
            else:
                break
        return p

    while len(fields) < need:
        pos = skip_ws(pos)
        start = pos
        while pos < len(mv) and not mv[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(mv[start:pos]))
    pos += 1  # single whitespace after the last header field
    w, h = fields[0], fields[1]
    if kind == b"4":
        stride = (w + 7) // 8
        packed = np.frombuffer(mv, dtype=np.uint8, offset=pos, count=h * stride).reshape(h, stride)
        bits = np.unpackbits(packed, axis=1)[:, :w]
        return ((1 - bits) * np.uint8(255)).astype(np.uint8)  # PBM: 1 = black
    maxval = fields[2]
    ch = 1 if kind == b"5" else 3
    if maxval < 256:
        px = np.frombuffer(mv, dtype=np.uint8, offset=pos, count=w * h * ch)
        if maxval != 255:
            px = ((px.astype(np.uint16) * 255 + maxval // 2) // maxval).astype(np.uint8)
    else:
        wide = np.frombuffer(mv, dtype=">u2", offset=pos, count=w * h * ch)
        px = ((wide.astype(np.uint32) * 255 + maxval // 2) // maxval).astype(np.uint8)
    px = px.reshape(h, w, ch)
    return px[:, :, 0].copy() if ch == 1 else _luma(px)


def encode_pnm_gray(img: np.ndarray, *, bilevel: bool = False) -> bytes:
    """(h, w) uint8 -> raw P5 (or raw P4 thresholded at 128 with
    ``bilevel=True``)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if bilevel:
        bits = (img < 128).astype(np.uint8)  # PBM: 1 = black
        packed = np.packbits(bits, axis=1)
        return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
