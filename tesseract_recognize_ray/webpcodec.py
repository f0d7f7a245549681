"""WebP codec — from-scratch VP8L (lossless) decode/encode, no external
libraries.

Reference parity target: leptonica's pixRead decodes WEBP where compiled in
(`tesseract-recognize.cc:514-531`); this module closes that codec gap for
the lossless class. Everything here derives from the PUBLIC "WebP Lossless
Bitstream Specification" and the RIFF container docs (developers.google.com
/speed/webp): LSB-first bit packing, canonical prefix codes (DEFLATE-style
construction, MSB-first code reading), the code-length code with 16/17/18
repeats, the LZ77 length/distance prefix-value coding, the 120-entry 2D
distance map, the 0x1e35a7bd color-cache hash, the four transforms
(predictor, color, subtract-green, color-indexing with pixel bundling) and
the meta-prefix (entropy image) machinery.

Lossy VP8 payloads raise a scoped ValueError (the quarantine path — the
sandbox ships no VP8 DSP and a wrong-pixels decode would be worse than an
error row); `webp_metadata` still serves width/height for them from the
keyframe header, so header-only profiling covers both classes.

The encoder exists to make the decoder testable end-to-end (same role as
encode_png_gray / encode_jpeg_gray): it emits legal streams exercising
every decode path — simple and normal prefix codes, zero-run and
repeat-previous code-length RLE, LZ77 runs through both the mapped and the
linear distance coding, color cache hits, subtract-green, all 14 predictor
modes, the color transform, palette bundling, and 2-group meta prefix
splits.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ bits


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    __slots__ = ("d", "n", "pos")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data) * 8
        self.pos = 0

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("WEBP: bitstream overrun")
        self.pos = p + 1
        return (self.d[p >> 3] >> (p & 7)) & 1

    def bits(self, k: int) -> int:
        v = 0
        for i in range(k):
            v |= self.bit() << i
        return v


class _BitWriter:
    __slots__ = ("buf", "acc", "nb")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nb = 0

    def write(self, value: int, k: int) -> None:
        self.acc |= (value & ((1 << k) - 1)) << self.nb
        self.nb += k
        while self.nb >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nb -= 8

    def done(self) -> bytes:
        if self.nb:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.nb = 0, 0
        return bytes(self.buf)


# -------------------------------------------------------- canonical codes


class _Prefix:
    """Canonical prefix code (DEFLATE construction): codes assigned in
    (length, symbol) order; read MSB-first one bit at a time. A
    single-symbol code costs 0 bits to read (the VP8L 'simple, 1 symbol'
    degenerate form)."""

    __slots__ = ("single", "map", "_codes")

    def __init__(self, lengths: list[int]):
        used = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("WEBP: empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.map: dict[tuple[int, int], int] = {}
            self._codes: dict[int, tuple[int, int]] = {self.single: (0, 0)}
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        if max_len > 15:
            raise ValueError("WEBP: prefix code length > 15")
        bl_count = [0] * (max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        if (code + bl_count[max_len]) > (1 << max_len):
            raise ValueError("WEBP: over-subscribed prefix code")
        m: dict[tuple[int, int], int] = {}
        codes: dict[int, tuple[int, int]] = {}
        for s, ln in enumerate(lengths):
            if ln > 0:
                m[(ln, next_code[ln])] = s
                codes[s] = (ln, next_code[ln])
                next_code[ln] += 1
        self.map = m
        self._codes = codes  # encoder reuse

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        m = self.map
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            s = m.get((ln, code))
            if s is not None:
                return s
            if ln > 15:
                raise ValueError("WEBP: invalid prefix code")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code) for the encoder."""
    p = _Prefix(lengths)
    if p.single is not None:
        return {p.single: (0, 0)}
    return p._codes


def _limited_huffman(counts: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Length-limited prefix-code lengths by package-merge (exact optimal
    under the cap). counts: symbol -> freq (>0). Returns symbol -> length;
    a single symbol gets length 0 (the 0-bit degenerate code)."""
    syms = sorted(counts)
    if len(syms) == 1:
        return {syms[0]: 0}
    items = sorted((counts[s], s) for s in syms)
    # package-merge over levels 1..max_len
    level: list[tuple[int, tuple]] = [(c, (s,)) for c, s in items]
    for _ in range(max_len - 1):
        packages = []
        for i in range(0, len(level) - 1, 2):
            a, b = level[i], level[i + 1]
            packages.append((a[0] + b[0], a[1] + b[1]))
        level = sorted([(c, (s,)) for c, s in items] + packages)
    need = 2 * len(syms) - 2
    depth: dict[int, int] = {s: 0 for s in syms}
    for c, group in level[:need]:
        for s in group:
            depth[s] += 1
    return depth


# ----------------------------------------------------------- VP8L tables

_CLCL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D distance map, spec order: (dx, dy), codes 1..120; dist = dy*xsize + dx
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _map_distance(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    if dist_code < 1:
        raise ValueError("WEBP: distance code 0")
    dx, dy = _DIST_MAP[dist_code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def _lz77_read_value(br: _BitReader, sym: int) -> int:
    """Prefix-value decoding shared by lengths and distance codes."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.bits(extra) + 1


def _lz77_split_value(v: int) -> tuple[int, int, int]:
    """value -> (prefix symbol, extra bit count, extra bits)."""
    if v <= 4:
        return v - 1, 0, 0
    u = v - 1
    hi = u.bit_length() - 1
    extra = hi - 1
    sym = 2 * hi + ((u >> extra) & 1)
    return sym, extra, u & ((1 << extra) - 1)


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# -------------------------------------------------------------- decoding


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Prefix:
    if br.bit():  # simple form
        n_sym = br.bit() + 1
        s0 = br.bits(8) if br.bit() else br.bits(1)
        lengths = [0] * alphabet
        if s0 >= alphabet:
            raise ValueError("WEBP: simple-code symbol out of range")
        if n_sym == 1:
            lengths[s0] = 1
        else:
            s1 = br.bits(8)
            if s1 >= alphabet or s1 == s0:
                raise ValueError("WEBP: bad simple code pair")
            lengths[s0] = lengths[s1] = 1
        return _Prefix(lengths)
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLCL_ORDER[i]] = br.bits(3)
    cl = _Prefix(cl_lengths)
    if br.bit():
        len_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(len_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            if i + rep > alphabet:
                raise ValueError("WEBP: code-length repeat overrun")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.bits(3)
        else:
            i += 11 + br.bits(7)
        if i > alphabet:
            raise ValueError("WEBP: code-length zero-run overrun")
    return _Prefix(lengths)


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(br: _BitReader, w: int, h: int, is_level0: bool):
    """DecodeImageStream: [transforms if level0] -> color-cache ->
    [meta prefix if level0] -> prefix groups -> LZ77 pixel loop.
    Returns (argb list, final xsize, transforms list)."""
    transforms = []
    xsize = w
    if is_level0:
        seen = set()
        while br.bit():
            t = br.bits(2)
            if t in seen:
                raise ValueError("WEBP: duplicate transform")
            seen.add(t)
            if t in (0, 1):  # predictor / color
                bits = br.bits(3) + 2
                sw, sh = _sub_size(xsize, bits), _sub_size(h, bits)
                data, _, _ = _decode_image_stream(br, sw, sh, False)
                transforms.append((t, bits, data, xsize))
            elif t == 2:  # subtract green
                transforms.append((2, 0, None, xsize))
            else:  # color indexing
                psize = br.bits(8) + 1
                praw, _, _ = _decode_image_stream(br, psize, 1, False)
                pal = []
                prev = 0
                for px in praw:  # component-wise delta from previous entry
                    cur = (
                        (((prev >> 24) + (px >> 24)) & 0xFF) << 24
                        | ((((prev >> 16) + (px >> 16)) & 0xFF) << 16)
                        | ((((prev >> 8) + (px >> 8)) & 0xFF) << 8)
                        | ((prev + px) & 0xFF)
                    )
                    pal.append(cur)
                    prev = cur
                wb = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
                transforms.append((3, wb, pal, xsize))
                xsize = _sub_size(xsize, wb)

    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("WEBP: bad color-cache bits")

    entropy = None
    hbits = 0
    n_groups = 1
    if is_level0 and br.bit():
        hbits = br.bits(3) + 2
        ew, eh = _sub_size(xsize, hbits), _sub_size(h, hbits)
        entropy, _, _ = _decode_image_stream(br, ew, eh, False)
        n_groups = max((px >> 8) & 0xFFFF for px in entropy) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [[_read_prefix_code(br, a) for a in alphabets] for _ in range(n_groups)]

    n = xsize * h
    buf = [0] * n
    cache = [0] * cache_size
    pos = 0
    ew = _sub_size(xsize, hbits) if entropy is not None else 0
    while pos < n:
        if entropy is not None:
            x, y = pos % xsize, pos // xsize
            gi = (entropy[(y >> hbits) * ew + (x >> hbits)] >> 8) & 0xFFFF
            g = groups[gi]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            buf[pos] = px
            pos += 1
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
        elif s < 280:
            length = _lz77_read_value(br, s - 256)
            dcode = _lz77_read_value(br, g[4].read(br))
            dist = _map_distance(dcode, xsize)
            if dist > pos or length > n - pos:
                raise ValueError("WEBP: backward reference out of range")
            for _ in range(length):
                px = buf[pos - dist]
                buf[pos] = px
                pos += 1
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
        else:
            if not cache_size:
                raise ValueError("WEBP: cache symbol without cache")
            buf[pos] = cache[s - 280]
            pos += 1
    return buf, xsize, transforms


# -------------------------------------------------- transform inversion


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _add_px(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _select(a: int, t: int, left: int, tl: int) -> int:  # noqa: ARG001
    """Predictor 11: Select(top, left, topleft) per the spec."""
    p = 0
    for sh in (24, 16, 8, 0):
        ca = (t >> sh) & 0xFF
        cb = (left >> sh) & 0xFF
        cc = (tl >> sh) & 0xFF
        p += abs(cb - cc) - abs(ca - cc)
    return t if p <= 0 else left


def _clamp_full(left: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((left >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        v = 0 if v < 0 else 255 if v > 255 else v
        out |= v << sh
    return out


def _clamp_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        v = a + (d // 2 if d >= 0 else -((-d) // 2))  # C truncating division
        v = 0 if v < 0 else 255 if v > 255 else v
        out |= v << sh
    return out


def _predict(mode: int, buf: list[int], pos: int, w: int) -> int:
    left = buf[pos - 1]
    t = buf[pos - w]
    tl = buf[pos - w - 1]
    tr = buf[pos - w + 1]  # at x == w-1 this is the current row's first pixel
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), t)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(t, tr))
    if mode == 11:
        return _select(None, t, left, tl)
    if mode == 12:
        return _clamp_full(left, t, tl)
    if mode == 13:
        return _clamp_half(_avg2(left, t), tl)
    raise ValueError("WEBP: bad predictor mode")


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(pred: int, color: int) -> int:
    return (_s8(pred) * _s8(color)) >> 5


def _apply_inverse_transforms(buf: list[int], transforms: list, h: int) -> tuple[list[int], int]:
    """Inverse-apply in reverse read order; returns (argb, xsize)."""
    xsize = transforms[-1][3] if False else None  # width tracked per transform
    w = None
    for t, bits, data, orig_w in reversed(transforms):
        if t == 3:  # color indexing: unbundle then palette-lookup
            wb, pal = bits, data
            packed_w = _sub_size(orig_w, wb)
            out = [0] * (orig_w * h)
            mask = (1 << (8 >> wb)) - 1 if wb else 0xFF
            per = 1 << wb
            bpp = 8 >> wb
            for y in range(h):
                for x in range(orig_w):
                    g = (buf[y * packed_w + (x >> wb)] >> 8) & 0xFF
                    idx = (g >> ((x % per) * bpp)) & mask if wb else g
                    if idx >= len(pal):
                        raise ValueError("WEBP: palette index out of range")
                    out[y * orig_w + x] = pal[idx]
            buf = out
            w = orig_w
        elif t == 2:  # add green to red/blue
            w = orig_w
            for i, px in enumerate(buf):
                g = (px >> 8) & 0xFF
                r = ((px >> 16) + g) & 0xFF
                b = (px + g) & 0xFF
                buf[i] = (px & 0xFF00FF00) | (r << 16) | b
        elif t == 0:  # predictor
            w = orig_w
            tw = _sub_size(w, bits)
            for pos in range(len(buf)):
                x, y = pos % w, pos // w
                if pos == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = buf[pos - 1]
                elif x == 0:
                    pred = buf[pos - w]
                else:
                    mode = (data[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                    pred = _predict(mode, buf, pos, w)
                buf[pos] = _add_px(buf[pos], pred)
        else:  # color transform
            w = orig_w
            tw = _sub_size(w, bits)
            for pos, px in enumerate(buf):
                x, y = pos % w, pos // w
                cte = data[(y >> bits) * tw + (x >> bits)]
                g2r = cte & 0xFF
                g2b = (cte >> 8) & 0xFF
                r2b = (cte >> 16) & 0xFF
                g = (px >> 8) & 0xFF
                r = ((px >> 16) & 0xFF) + _ct_delta(g2r, g) & 0xFF
                b = (px & 0xFF) + _ct_delta(g2b, g)
                b = (b + _ct_delta(r2b, r)) & 0xFF
                buf[pos] = (px & 0xFF00FF00) | (r << 16) | b
    return buf, w


# ------------------------------------------------------------- container


def _find_chunk(data: bytes) -> tuple[str, bytes]:
    """RIFF walk: returns ('VP8L'|'VP8 ', payload) of the first image chunk
    (looks through VP8X extended containers)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("WEBP: not a RIFF WEBP container")
    off = 12
    n = len(data)
    while off + 8 <= n:
        tag = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        body = data[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("WEBP: truncated chunk")
        if tag in (b"VP8L", b"VP8 "):
            return tag.decode("ascii"), body
        off += 8 + size + (size & 1)
    raise ValueError("WEBP: no image chunk found")


def decode_webp_argb(buf) -> tuple[np.ndarray, int, int]:
    """Decode a lossless WebP to (argb uint32 array (h*w,), w, h)."""
    data = bytes(memoryview(buf))
    tag, body = _find_chunk(data)
    if tag == "VP8 ":
        raise ValueError("WEBP: lossy VP8 payload not supported (quarantine)")
    if not body or body[0] != 0x2F:
        raise ValueError("WEBP: bad VP8L signature")
    br = _BitReader(body[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("WEBP: unknown VP8L version")
    if w * h > 1 << 26:
        raise ValueError("WEBP: image too large")
    pix, xsize, transforms = _decode_image_stream(br, w, h, True)
    if transforms:
        pix, xsize = _apply_inverse_transforms(pix, transforms, h)
    if xsize != w or len(pix) != w * h:
        raise ValueError("WEBP: decoded size mismatch")
    return np.array(pix, dtype=np.uint32), w, h


def decode_webp(buf) -> np.ndarray:
    """(h, w) uint8 grayscale — luma composited over white like the other
    color codecs (GIF/BMP)."""
    from tesseract_recognize_ray.imagecodecs import _luma, _over_white

    argb, w, h = decode_webp_argb(buf)
    a = (argb >> 24).astype(np.uint8)
    rgb = np.stack(
        [(argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF], axis=-1
    ).astype(np.uint8)
    v = _luma(rgb.reshape(h, w, 3))
    if not np.all(a == 255):
        v = _over_white(v, a.reshape(h, w))
    return v


def webp_metadata(buf) -> dict:
    """Header-only dims: VP8L from the 28-bit size header; lossy VP8 from
    the keyframe header (3-byte frame tag + 0x9d012a + two 14-bit dims)."""
    data = bytes(memoryview(buf))
    tag, body = _find_chunk(data)
    if tag == "VP8L":
        if not body or body[0] != 0x2F:
            raise ValueError("WEBP: bad VP8L signature")
        br = _BitReader(body[1:])
        w = br.bits(14) + 1
        h = br.bits(14) + 1
        return {"format": "webp", "width": w, "height": h, "bit_depth": 8, "n_pages": 1}
    if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
        raise ValueError("WEBP: bad VP8 keyframe header")
    w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
    h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
    return {"format": "webp", "width": w, "height": h, "bit_depth": 8, "n_pages": 1}


# -------------------------------------------------------------- encoding


def _emit_code_lengths(bw: _BitWriter, lengths: list[int]) -> None:
    """Normal-form prefix code header: code-length code + RLE'd lengths
    (16 = repeat previous, 17/18 = zero runs) — the decoder's full path."""
    seq: list[tuple[int, int, int]] = []  # (symbol, extra_bits, extra_val)
    i, n = 0, len(lengths)
    prev = 8
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 11:
                take = min(left, 138)
                seq.append((18, 7, take - 11))
                left -= take
            while left >= 3:
                take = min(left, 10)
                seq.append((17, 3, take - 3))
                left -= take
            for _ in range(left):
                seq.append((0, 0, 0))
        else:
            seq.append((ln, 0, 0))
            prev = ln
            left = run - 1
            while left >= 3:
                take = min(left, 6)
                seq.append((16, 2, take - 3))
                left -= take
            for _ in range(left):
                seq.append((ln, 0, 0))
        i += run
    counts: dict[int, int] = {}
    for s, _, _ in seq:
        counts[s] = counts.get(s, 0) + 1
    cl_lengths_map = _limited_huffman(counts, 7)
    if len(cl_lengths_map) == 1:
        # degenerate: give the lone symbol length 1 (legal, reads 1 bit)...
        # a single-length cl code cannot be length 0 in the wire format, so
        # pad with an unused second symbol of equal length
        (only,) = cl_lengths_map
        other = 0 if only != 0 else 1
        cl_lengths_map = {only: 1, other: 1}
    cl_lengths = [0] * 19
    for s, ln in cl_lengths_map.items():
        cl_lengths[s] = ln
    # num_code_lengths: shortest prefix of the order covering all used
    used_max = max(idx for idx, o in enumerate(_CLCL_ORDER) if cl_lengths[o] > 0)
    num_cl = max(4, used_max + 1)
    bw.write(0, 1)  # normal (not simple)
    bw.write(num_cl - 4, 4)
    for o in _CLCL_ORDER[:num_cl]:
        bw.write(cl_lengths[o], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _canonical_codes(cl_lengths)
    for s, eb, ev in seq:
        ln, code = codes[s]
        for k in range(ln - 1, -1, -1):  # MSB-first
            bw.write((code >> k) & 1, 1)
        if eb:
            bw.write(ev, eb)


def _emit_prefix_code(bw: _BitWriter, counts: dict[int, int], alphabet: int):
    """Emit one prefix code; returns symbol -> (len, code). Uses the simple
    form when <= 2 symbols all < 256, else the normal form."""
    if not counts:
        counts = {0: 1}
    syms = sorted(counts)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] <= 1 and len(syms) == 1:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        else:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (1, 0), syms[1]: (1, 1)}
    depth = _limited_huffman(counts, 15)
    lengths = [0] * alphabet
    for s, ln in depth.items():
        lengths[s] = max(ln, 1)
    _emit_code_lengths(bw, lengths)
    return _canonical_codes(lengths)


def _emit_symbol(bw: _BitWriter, codes: dict, s: int) -> None:
    ln, code = codes[s]
    for k in range(ln - 1, -1, -1):
        bw.write((code >> k) & 1, 1)


def _tokenize(
    pix: list[int], xsize: int, *, cache_bits: int, use_lz77: bool, mapped_dist: bool
) -> list[tuple]:
    """Greedy symbol stream: ('lit', argb) | ('cache', idx) |
    ('copy', length, dist_code)."""
    toks: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(pix)
    i = 0
    while i < n:
        if use_lz77 and i > 0 and pix[i] == pix[i - 1]:
            run = 1
            while i + run < n and pix[i + run] == pix[i + run - 1] and run < 4096:
                run += 1
            dcode = 2 if mapped_dist else 121  # (1,0) mapped, or linear 1+120
            toks.append(("copy", run, dcode))
            if cache is not None:
                for j in range(i, i + run):
                    cache[_cache_key(pix[j], cache_bits)] = pix[j]
            i += run
            continue
        px = pix[i]
        if cache is not None:
            k = _cache_key(px, cache_bits)
            if cache[k] == px:
                toks.append(("cache", k))
                i += 1
                continue
            cache[k] = px
        toks.append(("lit", px))
        i += 1
    return toks


def _emit_image_stream(
    bw: _BitWriter,
    pix: list[int],
    xsize: int,
    ysize: int,
    *,
    cache_bits: int = 0,
    use_lz77: bool = True,
    mapped_dist: bool = True,
    meta_groups: int = 1,
    level0: bool = False,
) -> None:
    """Entropy-coded image body (no transforms here): cache flag, optional
    meta prefix image (LEVEL-0 ONLY — the decoder reads no meta bit for
    sub-images), prefix groups, symbol stream."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    hbits = 0
    group_of: list[int] | None = None
    if meta_groups > 1 and not level0:
        raise ValueError("encode: meta prefix groups are level-0 only")
    if meta_groups > 1:
        hbits = 2
        ew, eh = _sub_size(xsize, hbits), _sub_size(ysize, hbits)
        # split tiles left/right: group 1 for tiles in the right half
        epix = [(1 << 8) if (tx >= ew // 2) else 0 for _ty in range(eh) for tx in range(ew)]
        bw.write(1, 1)
        bw.write(hbits - 2, 3)
        _emit_image_stream(bw, epix, ew, eh, use_lz77=False)  # sub-image
        group_of = [
            (epix[((i // xsize) >> hbits) * ew + ((i % xsize) >> hbits)] >> 8) & 0xFFFF
            for i in range(len(pix))
        ]
    elif level0:
        bw.write(0, 1)

    toks = _tokenize(pix, xsize, cache_bits=cache_bits, use_lz77=use_lz77, mapped_dist=mapped_dist)
    n_groups = meta_groups
    counts = [[{}, {}, {}, {}, {}] for _ in range(n_groups)]
    pos = 0
    for tk in toks:
        gi = group_of[pos] if group_of is not None else 0
        c = counts[gi]
        if tk[0] == "lit":
            px = tk[1]
            for ci, v in (
                (0, (px >> 8) & 0xFF),
                (1, (px >> 16) & 0xFF),
                (2, px & 0xFF),
                (3, (px >> 24) & 0xFF),
            ):
                c[ci][v] = c[ci].get(v, 0) + 1
            pos += 1
        elif tk[0] == "cache":
            s = 280 + tk[1]
            c[0][s] = c[0].get(s, 0) + 1
            pos += 1
        else:
            lsym, _, _ = _lz77_split_value(tk[1])
            dsym, _, _ = _lz77_split_value(tk[2])
            c[0][256 + lsym] = c[0].get(256 + lsym, 0) + 1
            c[4][dsym] = c[4].get(dsym, 0) + 1
            pos += tk[1]

    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    group_codes = []
    for gi in range(n_groups):
        group_codes.append(
            [_emit_prefix_code(bw, counts[gi][ci], alphabets[ci]) for ci in range(5)]
        )

    pos = 0
    for tk in toks:
        gi = group_of[pos] if group_of is not None else 0
        codes = group_codes[gi]
        if tk[0] == "lit":
            px = tk[1]
            _emit_symbol(bw, codes[0], (px >> 8) & 0xFF)
            _emit_symbol(bw, codes[1], (px >> 16) & 0xFF)
            _emit_symbol(bw, codes[2], px & 0xFF)
            _emit_symbol(bw, codes[3], (px >> 24) & 0xFF)
            pos += 1
        elif tk[0] == "cache":
            _emit_symbol(bw, codes[0], 280 + tk[1])
            pos += 1
        else:
            lsym, leb, lev = _lz77_split_value(tk[1])
            _emit_symbol(bw, codes[0], 256 + lsym)
            if leb:
                bw.write(lev, leb)
            dsym, deb, dev = _lz77_split_value(tk[2])
            _emit_symbol(bw, codes[4], dsym)
            if deb:
                bw.write(dev, deb)
            pos += tk[1]


def encode_webp_gray(
    img: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = True,
    mapped_dist: bool = True,
    meta_groups: int = 1,
    vp8x: bool = False,
) -> bytes:
    """Legal VP8L stream from an (h, w) uint8 gray image. The options each
    force one decoder path (see module docstring); defaults produce the
    plain literal/LZ77 stream."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    pix = [
        (0xFF << 24) | (int(v) << 16) | (int(v) << 8) | int(v) for v in img.reshape(-1)
    ]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    xsize = w
    # transforms are written in read order; the decoder inverse-applies in
    # reverse, so the forward application order here must match read order
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)
        bits = 4
        bw.write(bits - 2, 3)
        tw, th = _sub_size(xsize, bits), _sub_size(h, bits)
        tile = [(0xFF << 24) | (predictor_mode << 8)] * (tw * th)
        _emit_image_stream(bw, tile, tw, th, use_lz77=False)
        res = [0] * (w * h)
        # forward predictor: residual = pixel - pred, computed against the
        # ORIGINAL pixels (decoder rebuilds them incrementally)
        for pos in range(w * h):
            x, y = pos % w, pos // w
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[pos - 1]
            elif x == 0:
                pred = pix[pos - w]
            else:
                pred = _predict(predictor_mode, pix, pos, w)
            res[pos] = (
                ((((pix[pos] >> 24) - (pred >> 24)) & 0xFF) << 24)
                | ((((pix[pos] >> 16) - (pred >> 16)) & 0xFF) << 16)
                | ((((pix[pos] >> 8) - (pred >> 8)) & 0xFF) << 8)
                | (((pix[pos] & 0xFF) - (pred & 0xFF)) & 0xFF)
            )
        pix = res
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)
        bits = 4
        bw.write(bits - 2, 3)
        tw, th = _sub_size(xsize, bits), _sub_size(h, bits)
        cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _emit_image_stream(bw, [cte] * (tw * th), tw, th, use_lz77=False)
        out = []
        for px in pix:
            g = (px >> 8) & 0xFF
            r = (px >> 16) & 0xFF
            b = px & 0xFF
            nr = (r - _ct_delta(g2r, g)) & 0xFF
            nb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            out.append((px & 0xFF00FF00) | (nr << 16) | nb)
        pix = out
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        out = []
        for px in pix:
            g = (px >> 8) & 0xFF
            r = ((px >> 16) - g) & 0xFF
            b = ((px & 0xFF) - g) & 0xFF
            out.append((px & 0xFF00FF00) | (r << 16) | b)
        pix = out
    if palette:
        vals = sorted({px for px in pix})
        if len(vals) > 256:
            raise ValueError("encode_webp_gray: too many colors for palette")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(vals) - 1, 8)
        deltas = []
        prev = 0
        for v in vals:  # component-wise delta chain
            deltas.append(
                ((((v >> 24) - (prev >> 24)) & 0xFF) << 24)
                | ((((v >> 16) - (prev >> 16)) & 0xFF) << 16)
                | ((((v >> 8) - (prev >> 8)) & 0xFF) << 8)
                | (((v & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = v
        _emit_image_stream(bw, deltas, len(vals), 1, use_lz77=False)
        idx = {v: i for i, v in enumerate(vals)}
        psize = len(vals)
        wb = 3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
        per, bpp = 1 << wb, 8 >> wb
        packed_w = _sub_size(w, wb)
        packed = [0] * (packed_w * h)
        for y in range(h):
            for x in range(w):
                g = idx[pix[y * w + x]]
                packed[y * packed_w + (x >> wb)] |= g << ((x % per) * bpp)
        pix = [(0xFF << 24) | (v << 8) for v in packed]
        xsize = packed_w
    bw.write(0, 1)  # no more transforms

    _emit_image_stream(
        bw,
        pix,
        xsize,
        h,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        mapped_dist=mapped_dist,
        meta_groups=meta_groups,
        level0=True,
    )
    payload = b"\x2f" + bw.done()
    chunks = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    if vp8x:
        flags = struct.pack("<I", 0)
        dims = struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        vx = b"VP8X" + struct.pack("<I", 10) + flags + dims
        chunks = vx + chunks
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
