"""From-scratch PNG and TIFF codecs (stdlib zlib + numpy) + format dispatch.

The reference front end decodes real image formats via leptonica's pixRead
(`/root/reference/tesseract-recognize.cc:514-531`); this environment has no
PIL/cv2, so the engine previously read only its own raw fixture blobs
(FIXTURES.md §2). This module closes that gap with pure-public-knowledge
implementations of the formats a scanned-document corpus actually uses
(JPEG lives in `jpegcodec`, GIF/BMP/PNM in `legacycodecs`; `sniff_format`
/ `iter_page_images` here dispatch all of them on magic bytes):

* **PNG** (RFC 2083 / W3C PNG spec): chunk parse -> zlib inflate -> per-row
  unfilter -> grayscale luma. Supported: every legal (color type, depth)
  pair — gray 1/2/4/8/16 (low depths scaled by the exact 255/(2^d - 1)
  steps, 16-bit truncated to the high byte per the spec's sample-depth
  rescale), RGB/gray+alpha/RGBA 8/16, palette 1/2/4/8 — in both
  sequential and Adam7-interlaced layouts
  (spec §8.2: seven sub-images, each filtered independently, scattered
  back on the 8x8 pass lattice). Filters 0/1/2 are fully vectorized
  (None/Up are single numpy adds; Sub is a per-channel cumsum); filters
  3/4 (Average/Paeth) carry a true sequential dependency and fall back to
  a per-pixel row loop — correct, documented as the slow path.
* **JPEG** baseline sequential (ITU-T T.81) lives in the sibling
  `jpegcodec` module and is dispatched from `sniff_format`/
  `iter_page_images` here.
* **TIFF** (TIFF 6.0): II/MM byte orders, the multi-page IFD chain
  (reference S2 multi-page semantics, `tesseract-recognize.cc:455-487`),
  8-bit gray, 8-bit RGB (luma-converted) and 1-bit bilevel,
  PhotometricInterpretation 0/1 (WhiteIsZero inverted). Compressions:
  1 (none), 5 (LZW, spec §13: MSB-first codes, early-change width bumps,
  per-strip streams), 8/32946 (Deflate), 32773 (PackBits, spec §9), with
  Predictor 2 (horizontal differencing, §14) undone by a uint8 row cumsum.
  Strips decompress independently (multi-strip files supported).

Encoders (gray-8 PNG, single+multi-page gray-8 TIFF) exist so fixtures and
tests can round-trip real encoded media deterministically: PNG uses filter 0
rows and one zlib stream (zlib output is deterministic per level), TIFF
writes gray-8 strips under any supported compression/predictor combination.

Alpha is composited over WHITE (paper background), matching how a document
pipeline rasterizes transparency. RGB->gray uses the ITU-R BT.601 integer
luma ((299R + 587G + 114B + 500) // 1000), the same weights leptonica's
pixConvertRGBToGrayFast approximates.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CT_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(buf) -> str:
    """'png' | 'tiff' | 'jpeg' | 'gif' | 'bmp' | 'pnm' | 'webp' | 'raw' by
    magic bytes (raw = the 8-byte-header fixture format, FIXTURES.md §2)."""
    head = bytes(memoryview(buf)[:12])
    if head[:8] == PNG_SIG:
        return "png"
    if head[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if head[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if head[:4] == b"GIF8":
        return "gif"
    if head[:2] == b"BM":
        return "bmp"
    if head[:1] == b"P" and head[1:2] in b"456" and head[2:3].isspace():
        return "pnm"
    if head[:4] == b"%PDF":
        return "pdf"
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return "webp"
    return "raw"


# --------------------------------------------------------------------- PNG
def _luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


def _over_white(v: np.ndarray, a: np.ndarray) -> np.ndarray:
    v32 = v.astype(np.uint32)
    a32 = a.astype(np.uint32)
    return ((v32 * a32 + 255 * (255 - a32) + 127) // 255).astype(np.uint8)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. raw is h x (1+stride) filter-prefixed
    rows; returns (h, stride) uint8. Filters 0/1/2 vectorized; 3/4 looped."""
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        cur = data[y]
        if f == 0:
            line = cur.copy()
        elif f == 1:  # Sub: per-byte-position cumsum over pixel groups
            line = cur.astype(np.int64).reshape(-1, bpp).cumsum(axis=0) % 256
            line = line.astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            line = cur + prev  # uint8 wraparound is the spec's mod 256
        elif f == 3:  # Average — sequential in the left operand
            line = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in the left operand
            line = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                line[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        out[y] = line
        prev = line
    return out


# Adam7 pass lattice (PNG spec §8.2): (xstart, ystart, xstep, ystep).
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _rows_to_px(unf: np.ndarray, pw: int, depth: int, *, scale: bool = True) -> np.ndarray:
    """(ph, stride) unfiltered bytes -> (ph, pw) uint8 samples. depth 8
    passes through (pw counts pixels x channels), 16 keeps the high byte
    (PNG samples are big-endian; 16 -> 8 is the spec's sample-depth
    rescale truncation), 1/2/4 unpack MSB-first bit groups — scaled to the
    full 0..255 range for gray (255/(2^d - 1) is integral for all three),
    raw index values for palette (scale=False)."""
    if depth == 8:
        return unf
    if depth == 16:
        return unf.reshape(unf.shape[0], -1, 2)[:, :pw, 0]
    bits = np.unpackbits(unf, axis=1)
    m = (bits.shape[1] // depth) * depth
    vals = np.zeros((unf.shape[0], m // depth), dtype=np.uint8)
    for j in range(depth):
        vals = (vals << 1) | bits[:, j:m:depth]
    vals = vals[:, :pw]
    if scale:
        vals = vals * np.uint8(255 // ((1 << depth) - 1))
    return vals


def _deinterlace_adam7(
    raw: np.ndarray, w: int, h: int, depth: int, ch: int, *, scale: bool = True
) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images scattered onto the
    (xstart + i*xstep, ystart + j*ystep) lattice. Empty passes (sub-image
    with zero width or height) contribute no bytes, not even filter bytes."""
    bpp = max(1, (depth * ch) // 8)
    out = np.zeros((h, w, ch), dtype=np.uint8)
    off = 0
    for xs, ys, xstep, ystep in _ADAM7:
        pw = (w - xs + xstep - 1) // xstep if w > xs else 0
        ph = (h - ys + ystep - 1) // ystep if h > ys else 0
        if pw == 0 or ph == 0:
            continue
        stride = (pw * depth * ch + 7) // 8
        nbytes = ph * (1 + stride)
        unf = _unfilter(raw[off : off + nbytes], ph, stride, bpp)
        off += nbytes
        px = _rows_to_px(unf, pw if depth < 8 else pw * ch, depth, scale=scale)
        out[ys::ystep, xs::xstep] = px.reshape(ph, pw, ch)
    if off != len(raw):
        raise ValueError("PNG: interlaced data length mismatch")
    return out


def decode_png(buf) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 grayscale (alpha over white, RGB luma)."""
    mv = memoryview(buf)
    if bytes(mv[:8]) != PNG_SIG:
        raise ValueError("PNG: bad signature")
    pos = 8
    ihdr = None
    plte = None
    idat = []
    n = len(mv)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", mv[pos : pos + 4])
        ctype = bytes(mv[pos + 4 : pos + 8])
        body = mv[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC (integrity is the transport's job here)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(bytes(body))
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, ct, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    if ct not in _CT_CHANNELS:
        raise ValueError(f"PNG: unsupported color type {ct}")
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if depth not in legal[ct]:
        raise ValueError(f"PNG: illegal bit depth {depth} for color type {ct}")
    ch = _CT_CHANNELS[ct]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if interlace:
        px = _deinterlace_adam7(raw, w, h, depth, ch, scale=ct == 0)
    elif depth == 8:
        stride = w * ch
        px = _unfilter(raw, h, stride, ch).reshape(h, w, ch)
    elif depth == 16:
        stride = w * ch * 2
        unf = _unfilter(raw, h, stride, ch * 2)
        px = _rows_to_px(unf, w * ch, 16).reshape(h, w, ch)
    else:  # depth 1/2/4: gray (scaled) or palette indices (raw)
        stride = (w * depth + 7) // 8
        packed = _unfilter(raw, h, stride, 1)
        px = _rows_to_px(packed, w, depth, scale=ct == 0).reshape(h, w, 1)
    if ct == 0:
        return px[:, :, 0]
    if ct == 2:
        return _luma(px)
    if ct == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        return _luma(plte[px[:, :, 0]])
    if ct == 4:
        return _over_white(px[:, :, 0], px[:, :, 1])
    return _over_white(_luma(px[:, :, :3]), px[:, :, 3])  # ct == 6


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _interlace_adam7_bytes(px: np.ndarray, depth: int = 8) -> bytes:
    """(h, w, ch) uint8 samples -> concatenated filter-0 Adam7 pass streams
    (each pass row byte-packed independently, per spec §8.2). Test/fixture
    helper shared by encode_png_gray and the codec tests' color-type cases."""
    out = bytearray()
    for xs, ys, xstep, ystep in _ADAM7:
        sub = px[ys::ystep, xs::xstep]
        ph, pw = sub.shape[:2]
        if pw == 0 or ph == 0:
            continue
        if depth == 8:
            rows = np.ascontiguousarray(sub).reshape(ph, pw * sub.shape[2])
        else:
            rows = np.packbits(sub[:, :, 0] > 127, axis=1)
        for r in rows:
            out += b"\x00" + r.tobytes()
    return bytes(out)


def encode_png_gray(
    img: np.ndarray, *, level: int = 6, interlace: bool = False, depth: int = 8
) -> bytes:
    """(h, w) uint8 -> grayscale PNG (filter 0 rows, one IDAT); depth may
    be 1/2/4 (values quantized by the exact 255/(2^d - 1) gray steps),
    8, or 16 (uint16 input, big-endian samples). ``interlace=True`` writes
    the Adam7 layout (depth 1/8 only)."""
    if depth == 16:
        img16 = np.ascontiguousarray(img, dtype=np.uint16)
        h, w = img16.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
        rows = img16.astype(">u2").view(np.uint8).reshape(h, w * 2)
        body = np.concatenate([np.zeros((h, 1), dtype=np.uint8), rows], axis=1).tobytes()
        return (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(body, level))
            + _chunk(b"IEND", b"")
        )
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 1 if interlace else 0)
    if interlace:
        if depth not in (1, 8):
            raise ValueError("PNG encode: interlace supported for depth 1/8 only")
        body = _interlace_adam7_bytes(img[:, :, None], depth=depth)
    elif depth == 8:
        body = np.concatenate([np.zeros((h, 1), dtype=np.uint8), img], axis=1).tobytes()
    elif depth in (1, 2, 4):
        vals = img // np.uint8(255 // ((1 << depth) - 1))
        bits = ((vals[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).astype(np.uint8)
        packed = np.packbits(bits.reshape(h, w * depth), axis=1)
        body = np.concatenate([np.zeros((h, 1), dtype=np.uint8), packed], axis=1).tobytes()
    else:
        raise ValueError(f"PNG encode: unsupported depth {depth}")
    idat = zlib.compress(bytes(body), level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# -------------------------------------------------------------------- TIFF
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1}


def _packbits_decode(data: bytes) -> bytes:
    """TIFF 6.0 §9 PackBits: n<128 copy n+1 literals, n>128 repeat next byte
    257-n times, n==128 no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            out += data[i : i + 1] * (257 - b)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (runs >=3 become repeats; literals chunked to 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # measure the run starting at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal stretch: until a >=3 run starts or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: 8-bit symbols, ClearCode 256, EOI 257, MSB-first
    bit packing, early-change width bumps at table sizes 511/1023/2047."""
    out = bytearray()
    table: list[bytes] = []
    width = 9

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            bitbuf &= (1 << nbits) - 1
            if code == _LZW_CLEAR:
                reset()
                prev = None
                continue
            if code == _LZW_EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF LZW: code out of range")
            out += entry
            prev = entry
            # early change (spec §13): the encoder's table runs one entry
            # ahead of ours, so widen one entry before our own table fills
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (early change), matching `_lzw_decode`."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    emit(_LZW_CLEAR)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt == 4094:  # table nearly full: clear (early-change 12-bit cap)
            emit(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(_LZW_EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _read_ifd(mv: memoryview, off: int, bo: str):
    (count,) = struct.unpack_from(bo + "H", mv, off)
    if count > 4096:  # corrupt count: real IFDs carry dozens of entries
        raise ValueError(f"TIFF: implausible IFD entry count {count}")
    tags = {}
    for i in range(count):
        tag, typ, n = struct.unpack_from(bo + "HHI", mv, off + 2 + 12 * i)
        vpos = off + 2 + 12 * i + 8
        size = _TYPE_SIZE.get(typ, 1) * n
        if size > 4:
            (vpos,) = struct.unpack_from(bo + "I", mv, vpos)
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}.get(typ)  # 7 = UNDEFINED bytes
        if fmt is not None:
            if vpos + size > len(mv):  # corrupt count: array exceeds the file
                raise ValueError(f"TIFF: tag {tag} value array exceeds file size")
            tags[tag] = list(struct.unpack_from(bo + fmt * n, mv, vpos))
    (nxt,) = struct.unpack_from(bo + "I", mv, off + 2 + 12 * count)
    return tags, nxt


def iter_tiff_pages(buf):
    """Yield (h, w) uint8 grayscale per IFD page of an uncompressed TIFF."""
    mv = memoryview(buf)
    head = bytes(mv[:4])
    if head == b"II*\x00":
        bo = "<"
    elif head == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("TIFF: bad magic")
    (off,) = struct.unpack_from(bo + "I", mv, 4)
    seen_offsets = set()
    while off:
        if off in seen_offsets:  # corrupt next-IFD pointer forming a cycle
            raise ValueError("TIFF: cyclic IFD chain")
        if len(seen_offsets) >= 65536:  # corrupt chain: bound the walk
            raise ValueError("TIFF: IFD chain longer than 65536 pages")
        seen_offsets.add(off)
        tags, off = _read_ifd(mv, off, bo)
        w = tags[256][0]
        h = tags[257][0]
        comp = tags.get(259, [1])[0]
        pred = tags.get(317, [1])[0]
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bits = tags.get(258, [1])[0]
        offsets = tags[273]
        counts = tags.get(279, [((w * bits + 7) // 8) * h * spp])
        strips = [bytes(mv[o : o + c]) for o, c in zip(offsets, counts)]
        if comp == 7:  # JPEG-in-TIFF (TIFF6 TechNote 2): strips are JPEG streams
            from .jpegcodec import decode_jpeg

            jt = tags.get(347)  # shared JPEGTables: SOI + DQT/DHT segs + EOI
            if jt is not None:
                tb = bytes(jt)
                if tb[:2] != b"\xff\xd8" or tb[-2:] != b"\xff\xd9":
                    raise ValueError("TIFF: malformed JPEGTables framing")
                tables = tb[2:-2]
            else:
                tables = b""  # strips are standalone JPEGs
            parts = []
            for s in strips:
                if s[:2] != b"\xff\xd8":
                    raise ValueError("TIFF: JPEG strip missing SOI")
                # splice the shared tables right after the strip's SOI — the
                # strip's own tables (if any) simply override them later
                parts.append(decode_jpeg(b"\xff\xd8" + tables + s[2:]))
            img = parts[0] if len(parts) == 1 else np.vstack(parts)
            img = np.ascontiguousarray(img[:h, :w])
            if photo == 0:  # WhiteIsZero
                img = np.uint8(255) - img
            yield img
            continue
        if comp == 1:
            data = b"".join(strips)
        elif comp == 5:
            data = b"".join(_lzw_decode(s) for s in strips)
        elif comp in (8, 32946):  # Deflate / AdobeDeflate
            data = b"".join(zlib.decompress(s) for s in strips)
        elif comp == 32773:
            data = b"".join(_packbits_decode(s) for s in strips)
        else:
            raise ValueError(f"TIFF: compression {comp} not supported (1/5/8/32773 only)")
        if pred == 2:
            if bits != 8:
                raise ValueError("TIFF: predictor 2 requires 8-bit samples")
            arr = np.frombuffer(data, dtype=np.uint8, count=w * h * spp).reshape(h, w, spp)
            data = np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()
        elif pred != 1:
            raise ValueError(f"TIFF: predictor {pred} not supported")
        if bits == 8 and spp == 1:
            img = np.frombuffer(data, dtype=np.uint8, count=w * h).reshape(h, w).copy()
        elif bits == 16 and spp == 1:  # high byte, like PNG's 16->8 rescale
            wide = np.frombuffer(data, dtype=bo + "u2", count=w * h).reshape(h, w)
            img = (wide >> 8).astype(np.uint8)
        elif bits == 8 and spp >= 3:
            px = np.frombuffer(data, dtype=np.uint8, count=w * h * spp).reshape(h, w, spp)
            img = _luma(px[:, :, :3])
        elif bits == 1 and spp == 1:
            stride = (w + 7) // 8
            packed = np.frombuffer(data, dtype=np.uint8, count=h * stride).reshape(h, stride)
            img = (np.unpackbits(packed, axis=1)[:, :w] * np.uint8(255)).copy()
        else:
            raise ValueError(f"TIFF: unsupported bits={bits} samples={spp}")
        if photo == 0:  # WhiteIsZero
            img = np.uint8(255) - img
        yield img


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a standalone JPEG into (tables, abbreviated stream) per TIFF6
    TechNote 2: DQT (0xDB) / DHT (0xC4) segments move into the JPEGTables
    blob (framed SOI...EOI); everything else — APPn, SOF, DRI, SOS and the
    entropy data through EOI — stays in the strip stream."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad SOI")
    pos = 2
    tables = bytearray(b"\xff\xd8")
    keep = bytearray(b"\xff\xd8")
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: entropy data (incl. EOI) is kept verbatim
            keep += stream[pos:]
            break
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + seglen]
        (tables if marker in (0xDB, 0xC4) else keep).extend(seg)
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(keep)


def encode_tiff_gray(
    pages: "list[np.ndarray]",
    *,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    jpeg_quality: int = 92,
    jpeg_tables: bool = False,
) -> bytes:
    """Gray-8 TIFF, little-endian, with the multi-page IFD chain the
    reference expands (tesseract-recognize.cc:455-487). compression: 1
    (none), 5 (LZW), 7 (JPEG per TIFF6 TechNote 2), 8 (Deflate) or 32773
    (PackBits); predictor 2 applies horizontal differencing (LZW/Deflate
    only per spec §14); rows_per_strip splits each page into independently
    compressed strips. With compression=7, jpeg_tables=True factors the
    shared DQT/DHT segments into a JPEGTables tag (347) and writes
    abbreviated per-strip streams — the layout libtiff produces."""
    if not pages:
        raise ValueError("TIFF: need at least one page")
    if compression not in (1, 5, 7, 8, 32773):
        raise ValueError(f"TIFF encode: unsupported compression {compression}")
    if predictor == 2 and compression in (1, 7, 32773):
        raise ValueError("TIFF encode: predictor 2 is defined for LZW/Deflate only")
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 0)  # patched to first IFD offset below
    ifd_ptr_pos = 4
    for img in pages:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape
        rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
        src = img
        if predictor == 2:
            src = np.empty_like(img)
            src[:, 0] = img[:, 0]
            src[:, 1:] = img[:, 1:] - img[:, :-1]  # uint8 wraparound diff
        strip_offs: list[int] = []
        strip_cnts: list[int] = []
        tblob: bytes | None = None
        for y0 in range(0, h, rps):
            if compression == 7:
                from .jpegcodec import encode_jpeg_gray

                raw = encode_jpeg_gray(img[y0 : y0 + rps], quality=jpeg_quality)
                if jpeg_tables:
                    tb, raw = _split_jpeg_tables(raw)
                    if tblob is None:
                        tblob = tb
                    elif tblob != tb:  # same quality => same tables, always
                        raise ValueError("TIFF: JPEGTables differ across strips")
            else:
                raw = src[y0 : y0 + rps].tobytes()
                if compression == 5:
                    raw = _lzw_encode(raw)
                elif compression == 8:
                    raw = zlib.compress(raw, 6)
                elif compression == 32773:
                    raw = _packbits_encode(raw)
            strip_offs.append(len(out))
            strip_cnts.append(len(raw))
            out += raw
        nstrips = len(strip_offs)
        if len(out) % 2:
            out += b"\x00"  # IFDs must be word-aligned
        jt_pos = 0
        if tblob is not None:
            jt_pos = len(out)
            out += tblob
            if len(out) % 2:
                out += b"\x00"
        if nstrips > 1:  # LONG arrays don't fit the 4-byte inline slot
            offs_pos = len(out)
            out += struct.pack(f"<{nstrips}I", *strip_offs)
            cnts_pos = len(out)
            out += struct.pack(f"<{nstrips}I", *strip_cnts)
        else:
            offs_pos, cnts_pos = strip_offs[0], strip_cnts[0]
        ifd_off = len(out)
        struct.pack_into("<I", out, ifd_ptr_pos, ifd_off)
        entries = [
            (256, 4, 1, w),  # ImageWidth
            (257, 4, 1, h),  # ImageLength
            (258, 3, 1, 8),  # BitsPerSample
            (259, 3, 1, compression),
            (262, 3, 1, 1),  # Photometric: BlackIsZero
            (273, 4, nstrips, offs_pos),  # StripOffsets (inline iff 1 strip)
            (277, 3, 1, 1),  # SamplesPerPixel
            (278, 4, 1, rps),  # RowsPerStrip
            (279, 4, nstrips, cnts_pos),  # StripByteCounts
        ]
        if predictor != 1:
            entries.append((317, 3, 1, predictor))
        if tblob is not None:
            entries.append((347, 7, len(tblob), jt_pos))  # JPEGTables
        entries.sort()  # IFD entries must be tag-ordered
        out += struct.pack("<H", len(entries))
        for tag, typ, n, v in entries:
            out += struct.pack("<HHII", tag, typ, n, v)
        ifd_ptr_pos = len(out)
        out += struct.pack("<I", 0)  # next-IFD pointer (patched by next page)
    return bytes(out)


# ------------------------------------------------------------ unified entry
def iter_page_images(buf):
    """Yield (page_index, (h, w) uint8 image) from ANY supported payload:
    PNG (single page), baseline JPEG (single page), uncompressed TIFF (IFD
    chain = pages), or the raw 8-byte-header fixture format (concatenated
    blobs = pages). This is the M1 input-type dispatch
    (tesseract-recognize.cc:362-368) performed on magic bytes instead of
    file extensions — a Lance/parquet binary column has no filename."""
    fmt = sniff_format(buf)
    if fmt == "png":
        yield 0, decode_png(buf)
        return
    if fmt == "jpeg":
        from tesseract_recognize_ray.jpegcodec import decode_jpeg

        yield 0, decode_jpeg(buf)
        return
    if fmt == "tiff":
        for p, img in enumerate(iter_tiff_pages(buf)):
            yield p, img
        return
    if fmt == "gif":
        from tesseract_recognize_ray.legacycodecs import iter_gif_frames

        for p, img in enumerate(iter_gif_frames(buf)):
            yield p, img
        return
    if fmt == "bmp":
        from tesseract_recognize_ray.legacycodecs import decode_bmp

        yield 0, decode_bmp(buf)
        return
    if fmt == "pnm":
        from tesseract_recognize_ray.legacycodecs import decode_pnm

        yield 0, decode_pnm(buf)
        return
    if fmt == "pdf":
        from tesseract_recognize_ray.pdfcodec import iter_pdf_page_images

        for p, img in enumerate(iter_pdf_page_images(buf)):
            yield p, img
        return
    if fmt == "webp":
        from tesseract_recognize_ray.webpcodec import decode_webp

        yield 0, decode_webp(buf)
        return
    mv = memoryview(buf)
    off, p, n = 0, 0, len(mv)
    while off < n:
        w = int.from_bytes(mv[off : off + 4], "little")
        h = int.from_bytes(mv[off + 4 : off + 8], "little")
        yield p, np.frombuffer(mv, dtype=np.uint8, offset=off + 8, count=w * h).reshape(h, w)
        off += 8 + w * h
        p += 1


def sniff_metadata(buf) -> dict:
    """HEADER-ONLY media profile: {format, width, height, bit_depth,
    n_pages} for the first page WITHOUT decoding a single pixel — no
    inflate, no entropy decode, no strip reads. The crawl-ops primitive a
    100 TB ingest runs BEFORE the expensive decode pass: size/page-count
    histograms, cost-balanced split planning (media_splits_by_cost uses
    byte size as the proxy; this gives exact pixel counts), and
    format-mix dashboards, all at metadata cost.

    Per format: PNG reads IHDR; JPEG walks marker segments to the first
    SOF (skips by declared lengths, never entropy data); TIFF walks the
    IFD chain (tag tables only — the same bounded walk as
    iter_tiff_pages, strips untouched); GIF skips sub-block chains (count
    of image separators = frame count); BMP/PNM read their fixed headers;
    PDF parses the object table and page tree but inflates NO streams
    (dims from /MediaBox in points); raw walks the 8-byte page headers."""
    data = bytes(memoryview(buf))
    fmt = sniff_format(data)
    if fmt == "png":
        if len(data) < 26 or data[12:16] != b"IHDR":
            raise ValueError("PNG: truncated IHDR")
        w, h = struct.unpack_from(">II", data, 16)
        depth = data[24]
        return {"format": fmt, "width": w, "height": h, "bit_depth": depth, "n_pages": 1}
    if fmt == "jpeg":
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError("JPEG: marker desync in header walk")
            marker = data[pos + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # baseline/ext/progressive SOF
                prec = data[pos + 4]
                h, w = struct.unpack_from(">HH", data, pos + 5)
                return {"format": fmt, "width": w, "height": h, "bit_depth": prec, "n_pages": 1}
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            pos += 2 + seglen
        raise ValueError("JPEG: no SOF marker before end of header walk")
    if fmt == "tiff":
        mv = memoryview(data)
        bo = "<" if data[:2] == b"II" else ">"
        (off,) = struct.unpack_from(bo + "I", mv, 4)
        n_pages, first = 0, None
        seen = set()
        while off:
            if off in seen or len(seen) >= 65536:
                raise ValueError("TIFF: corrupt IFD chain")
            seen.add(off)
            tags, off = _read_ifd(mv, off, bo)
            if first is None:
                first = (
                    tags.get(256, [0])[0],
                    tags.get(257, [0])[0],
                    tags.get(258, [8])[0],
                )
            n_pages += 1
        if first is None:
            raise ValueError("TIFF: no IFDs")
        return {"format": fmt, "width": first[0], "height": first[1], "bit_depth": first[2], "n_pages": n_pages}
    if fmt == "gif":
        w, h = struct.unpack_from("<HH", data, 6)
        flags = data[10]
        pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
        frames = 0
        while pos < len(data):
            b = data[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(data) and data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                frames += 1
                lflags = data[pos + 9]
                pos += 10 + (3 * (2 << (lflags & 7)) if lflags & 0x80 else 0)
                pos += 1  # LZW min code size
                while pos < len(data) and data[pos] != 0:
                    pos += 1 + data[pos]
                pos += 1
            else:
                raise ValueError(f"GIF: unknown block 0x{b:02x} in header walk")
        return {"format": fmt, "width": w, "height": h, "bit_depth": 8, "n_pages": max(frames, 1)}
    if fmt == "bmp":
        w, h = struct.unpack_from("<ii", data, 18)
        (bpp,) = struct.unpack_from("<H", data, 28)
        return {"format": fmt, "width": w, "height": abs(h), "bit_depth": bpp, "n_pages": 1}
    if fmt == "pnm":
        toks, pos = [], 2
        while len(toks) < 3 and pos < len(data):
            if data[pos : pos + 1].isspace():
                pos += 1
            elif data[pos] == ord("#"):
                pos = data.find(b"\n", pos) + 1 or len(data)
            else:
                j = pos
                while j < len(data) and not data[j : j + 1].isspace():
                    j += 1
                toks.append(int(data[pos:j]))
                pos = j
            if data[1:2] == b"4" and len(toks) == 2:
                break
        w, h = toks[0], toks[1]
        depth = 1 if data[1:2] == b"4" else (8 if len(toks) < 3 or toks[2] < 256 else 16)
        return {"format": fmt, "width": w, "height": h, "bit_depth": depth, "n_pages": 1}
    if fmt == "pdf":
        from tesseract_recognize_ray.pdfcodec import _deref, _page_kids, _parse_objects, _parse_value
        import re as _re

        objs = _parse_objects(data)
        pages_node = None
        trailers = list(_re.finditer(rb"trailer", data))
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
        mb = _deref(objs, pages[0].get("MediaBox", [0, 0, 612, 792]))
        mb = [float(_deref(objs, v)) for v in mb]
        return {
            "format": fmt,
            "width": int(round(mb[2] - mb[0])),
            "height": int(round(mb[3] - mb[1])),
            "bit_depth": 8,
            "n_pages": len(pages),
        }
    if fmt == "webp":
        from tesseract_recognize_ray.webpcodec import webp_metadata

        return webp_metadata(data)
    # raw fixture blobs: 8-byte (w, h) LE headers per page
    off, n_pages, first = 0, 0, None
    while off + 8 <= len(data):
        w = int.from_bytes(data[off : off + 4], "little")
        h = int.from_bytes(data[off + 4 : off + 8], "little")
        if first is None:
            first = (w, h)
        n_pages += 1
        off += 8 + w * h
    if first is None or off != len(data):
        raise ValueError("raw: truncated page chain")
    return {"format": "raw", "width": first[0], "height": first[1], "bit_depth": 8, "n_pages": n_pages}
