"""From-scratch baseline JPEG codec (ITU-T T.81, public spec; numpy only).

The reference front end decodes JPEG via leptonica's pixRead
(`/root/reference/tesseract-recognize.cc:514-531`); this environment has no
PIL/cv2/libjpeg, so — like the PNG/TIFF codecs in `imagecodecs.py` — the
decoder here is implemented purely from the published standard:

* **Decoder**: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2,
  T.81 Annex G: spectral selection + successive approximation, DC/AC
  first and refinement scans, EOB runs), 8-bit samples, 1- or 3-component
  frames (grayscale, or JFIF YCbCr where only the full-resolution Y plane
  is inverse-transformed — the pipeline's output is grayscale luma, and
  JFIF Y *is* BT.601 luma; in baseline scans chroma blocks are
  entropy-decoded to keep the bitstream in sync, then dropped; in
  progressive files chroma AC scans are whole independent bitstreams and
  are skipped without decoding). Supports multi-segment DQT/DHT markers,
  tables redefined between scans, 16-bit quant tables, 4:4:4 / 4:2:2 /
  4:2:0 sampling, and DRI/RSTn restart intervals in every scan type.
  Arithmetic coding, hierarchical/lossless SOFs and 12-bit precision are
  rejected explicitly.
* **Encoder** (fixtures/tests): baseline grayscale or gray-as-YCbCr (constant
  chroma) with Annex-K quant tables scaled by the familiar libjpeg quality
  formula and the Annex-K "typical" Huffman tables; optional 4:2:0 sampling
  and restart intervals so tests can drive every decoder code path. With
  ``progressive=True`` it emits an SOF2 file with the conventional 6-scan
  script (DC Al=1 -> AC bands -> AC refine -> DC refine -> AC refine to
  Al=0), exercising every progressive decode path against the same pixels.

Entropy decode hot path: a 16-bit-lookahead LUT per Huffman table (canonical
code expansion, built once and cached per (bits, values) key) over a
numpy-precomputed 32-bit sliding-window word array, so each symbol costs two
array indexings instead of a per-bit loop. The IDCT is one batched
``A.T @ F @ A`` matmul over every block of the plane at once.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# Zigzag scan order: ZIGZAG[k] = row-major index of the k-th zigzag coefficient
# (T.81 Figure 5).
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 quantization tables.
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 "typical" Huffman tables: (BITS[1..16], HUFFVAL).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: forward F = A f A^T, inverse f = A^T F A."""
    x = np.arange(8)
    a = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * 0.5
    a[0, :] = 1.0 / np.sqrt(8.0)
    return a


_DCT_A = _dct_matrix()

# ------------------------------------------------------------------ huffman
_LUT_CACHE: dict = {}


def _canonical_codes(bits, vals):
    """(code, length, symbol) triples per T.81 Annex C code assignment."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, vals[i]))
            code += 1
            i += 1
        code <<= 1
    return out


def _build_lut(bits, vals):
    """16-bit-lookahead decode tables: sym[peek16], len[peek16]."""
    key = (tuple(bits), tuple(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = np.zeros(1 << 16, dtype=np.uint8)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for code, length, value in _canonical_codes(bits, vals):
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = value
        ln[lo:hi] = length
    _LUT_CACHE[key] = (sym, ln)
    return sym, ln


class _BitReader:
    """MSB-first bit cursor over a destuffed entropy segment; peeks via a
    precomputed per-byte 32-bit sliding window (2 array indexings/symbol)."""

    __slots__ = ("words", "pos", "nbits")

    def __init__(self, data: bytes):
        # 8 pad bytes: the final block's padding bits may lookahead past the
        # segment end without indexing off the word table.
        b = np.frombuffer(data + b"\x00" * 8, dtype=np.uint8).astype(np.uint32)
        self.words = (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
        self.pos = 0
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        i, r = divmod(self.pos, 8)
        return int(self.words[i] >> (16 - r)) & 0xFFFF

    def receive(self, n: int) -> int:
        i, r = divmod(self.pos, 8)
        self.pos += n
        return (int(self.words[i]) >> (32 - r - n)) & ((1 << n) - 1)


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------------ decoder
_SCAN_END = re.compile(rb"\xff(?![\x00\xd0-\xd7])")
_RST_SPLIT = re.compile(rb"\xff[\xd0-\xd7]")


def decode_jpeg(buf) -> np.ndarray:
    """Baseline or progressive JPEG bytes -> (h, w) uint8 grayscale (Y)."""
    data = bytes(buf)
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict = {}  # (class, id) -> (sym_lut, len_lut)
    frame = None
    progressive = False
    restart_interval = 0
    scans: list = []  # (scomps, Ss, Se, Ah, Al, raw, restart_interval)
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 15
                o += 1
                if pq:
                    vals = np.frombuffer(body, dtype=">u2", count=64, offset=o).astype(np.int64)
                    o += 128
                else:
                    vals = np.frombuffer(body, dtype=np.uint8, count=64, offset=o).astype(np.int64)
                    o += 64
                qtabs[tq] = vals
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 15
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                htabs[(tc, th)] = _build_lut(bits, vals)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"JPEG: {prec}-bit precision not supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: SOF{marker - 0xC0} (arithmetic/hierarchical/lossless) not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            # snapshot (component, LUT) refs NOW: progressive encoders may
            # redefine DHT slots between scans
            scomps = []
            cid_to_idx = {c["id"]: i for i, c in enumerate(frame[2])}
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scomps.append(
                    (cid_to_idx[cs], htabs.get((0, tdta >> 4)), htabs.get((1, tdta & 15)))
                )
            ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            m = _SCAN_END.search(data, pos)
            end = m.start() if m else n
            scans.append((scomps, ss, se, ahl >> 4, ahl & 15, data[pos:end], restart_interval))
            pos = end
            if not progressive:
                break  # baseline: single scan carries everything
        # APPn/COM/DNL/etc: skipped
    if frame is None or not scans:
        raise ValueError("JPEG: missing SOF/SOS")
    h, w, comps = frame
    if progressive:
        return _decode_progressive(h, w, comps, scans, qtabs)
    scomps, _ss, _se, _ah, _al, raw, restart_interval = scans[0]
    stabs = {comps[ci]["id"]: (dlut, alut) for ci, dlut, alut in scomps}
    if comps[0]["h"] != max(c["h"] for c in comps) or comps[0]["v"] != max(
        c["v"] for c in comps
    ):
        raise ValueError("JPEG: first component must carry max sampling (JFIF Y)")
    hmax = comps[0]["h"]
    vmax = comps[0]["v"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # Per-component scan-order table refs and block shapes.
    plan = []
    for c in comps:
        dlut, alut = stabs[c["id"]]
        plan.append((c["h"] * c["v"], dlut, alut))
    y_blocks_per_mcu = plan[0][0]
    ycoef = np.zeros((n_mcu * y_blocks_per_mcu, 64), dtype=np.int32)
    scratch = np.zeros(64, dtype=np.int32)

    segments = _RST_SPLIT.split(raw) if restart_interval else [raw]
    mcu_done = 0
    zz = ZIGZAG  # local alias
    for seg in segments:
        if mcu_done >= n_mcu:
            break
        rd = _BitReader(seg.replace(b"\xff\x00", b"\xff"))
        preds = [0] * len(comps)
        seg_mcus = min(restart_interval or n_mcu, n_mcu - mcu_done)
        for _ in range(seg_mcus):
            for ci, (nblk, (dsym, dlen), (asym, alen)) in enumerate(plan):
                keep = ci == 0
                for b in range(nblk):
                    if keep:
                        coef = ycoef[mcu_done * y_blocks_per_mcu + b]
                    else:
                        coef = scratch
                        coef[:] = 0
                    p16 = rd.peek16()
                    t = int(dsym[p16])
                    length = int(dlen[p16])
                    if length == 0:
                        raise ValueError("JPEG: invalid DC code")
                    rd.pos += length
                    diff = _extend(rd.receive(t), t) if t else 0
                    preds[ci] += diff
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        p16 = rd.peek16()
                        rs = int(asym[p16])
                        length = int(alen[p16])
                        if length == 0:
                            raise ValueError("JPEG: invalid AC code")
                        rd.pos += length
                        s = rs & 15
                        r = rs >> 4
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        coef[k] = _extend(rd.receive(s), s)
                        k += 1
            mcu_done += 1
    if mcu_done != n_mcu:
        raise ValueError(f"JPEG: decoded {mcu_done}/{n_mcu} MCUs")

    q = qtabs[comps[0]["tq"]]
    nat = np.zeros((len(ycoef), 64), dtype=np.float64)
    nat[:, zz] = ycoef * q
    blocks = nat.reshape(-1, 8, 8)
    px = _DCT_A.T @ blocks @ _DCT_A  # batched IDCT
    px = np.clip(np.rint(px + 128.0), 0, 255).astype(np.uint8)
    plane = (
        px.reshape(mcuy, mcux, vmax, hmax, 8, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(mcuy * vmax * 8, mcux * hmax * 8)
    )
    return plane[:h, :w].copy()


# --------------------------------------------------------- progressive decode
def _decode_progressive(h: int, w: int, comps, scans, qtabs) -> np.ndarray:
    """T.81 Annex G progressive decode of the Y plane: accumulate zigzag
    coefficients across DC/AC first+refinement scans, then one batched IDCT.

    Chroma is dropped from the output (module docstring), and unlike the
    baseline interleaved scan, progressive AC scans are single-component
    independent bitstreams — chroma AC scans are skipped WITHOUT entropy
    decoding. Interleaved DC scans still consume chroma DC bits to stay in
    sync within the scan."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if comps[0]["h"] != hmax or comps[0]["v"] != vmax:
        raise ValueError("JPEG: first component must carry max sampling (JFIF Y)")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component non-interleaved block grid (T.81 A.1.1: comp dims are
    # ceil(x*h_i/hmax) x ceil(y*v_i/vmax), then ceil/8 blocks)
    grids = []
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)
        ch_ = -(-(h * c["v"]) // vmax)
        grids.append((-(-ch_ // 8), -(-cw // 8)))
    bh, bw = mcuy * vmax, mcux * hmax  # Y padded (interleaved) grid
    ycoef = np.zeros((bh, bw, 64), dtype=np.int32)

    for scomps, ss, se, ah, al, raw, ri in scans:
        if ss == 0:
            _prog_dc_scan(ycoef, comps, grids, scomps, ah, al, raw, ri, mcux, mcuy)
        else:
            ci, _dlut, alut = scomps[0]
            if ci != 0:
                continue  # chroma AC scan: independent bitstream, dropped
            if alut is None:
                raise ValueError("JPEG: AC scan without a defined AC table")
            if ah == 0:
                _prog_ac_first(ycoef, grids[0], ss, se, al, raw, ri, alut)
            else:
                _prog_ac_refine(ycoef, grids[0], ss, se, al, raw, ri, alut)

    q = qtabs[comps[0]["tq"]]
    nat = np.zeros((bh * bw, 64), dtype=np.float64)
    nat[:, ZIGZAG] = ycoef.reshape(-1, 64) * q
    px = _DCT_A.T @ nat.reshape(-1, 8, 8) @ _DCT_A
    px = np.clip(np.rint(px + 128.0), 0, 255).astype(np.uint8)
    plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return plane[:h, :w].copy()


def _entropy_segments(raw: bytes, ri: int, n_units: int):
    """Yield (BitReader, unit_count) per restart segment of a scan."""
    segments = _RST_SPLIT.split(raw) if ri else [raw]
    done = 0
    for seg in segments:
        if done >= n_units:
            break
        cnt = min(ri or n_units, n_units - done)
        yield _BitReader(seg.replace(b"\xff\x00", b"\xff")), done, cnt
        done += cnt
    if done != n_units:
        raise ValueError(f"JPEG: scan covered {done}/{n_units} data units")


def _prog_dc_scan(ycoef, comps, grids, scomps, ah, al, raw, ri, mcux, mcuy):
    """DC scan (Ss=0): interleaved by MCU when ns>1, else raster over the
    single component's own block grid. Ah=0 -> Huffman diffs (shifted left
    by Al); Ah>0 -> one raw refinement bit per block ORed into bit Al."""
    interleaved = len(scomps) > 1
    if interleaved:
        n_units = mcux * mcuy
    else:
        ci0 = scomps[0][0]
        gh, gw = grids[ci0]
        n_units = gh * gw
    for rd, start, cnt in _entropy_segments(raw, ri, n_units):
        preds = [0] * len(comps)
        for u in range(start, start + cnt):
            if interleaved:
                my, mx = divmod(u, mcux)
                for ci, dlut, _alut in scomps:
                    c = comps[ci]
                    for iv in range(c["v"]):
                        for iu in range(c["h"]):
                            bit = _dc_unit(rd, dlut, preds, ci, ah)
                            if ci == 0:
                                by, bx = my * c["v"] + iv, mx * c["h"] + iu
                                _dc_store(ycoef, by, bx, preds[0], bit, ah, al)
            else:
                ci, dlut, _alut = scomps[0]
                by, bx = divmod(u, grids[ci][1])
                bit = _dc_unit(rd, dlut, preds, ci, ah)
                if ci == 0:
                    _dc_store(ycoef, by, bx, preds[0], bit, ah, al)


def _dc_unit(rd: _BitReader, dlut, preds, ci: int, ah: int) -> int:
    """Consume one block's DC bits; returns the refinement bit (Ah>0) or 0."""
    if ah:
        return rd.receive(1)
    if dlut is None:
        raise ValueError("JPEG: DC scan without a defined DC table")
    dsym, dlen = dlut
    p16 = rd.peek16()
    t = int(dsym[p16])
    length = int(dlen[p16])
    if length == 0:
        raise ValueError("JPEG: invalid DC code")
    rd.pos += length
    preds[ci] += _extend(rd.receive(t), t) if t else 0
    return 0


def _dc_store(ycoef, by, bx, pred, bit, ah, al):
    if ah:
        if bit:
            ycoef[by, bx, 0] |= 1 << al
    else:
        ycoef[by, bx, 0] = pred << al


def _prog_ac_first(ycoef, grid, ss, se, al, raw, ri, alut):
    """AC first scan (Ah=0) over band Ss..Se with EOB-run codes (T.81 G.1.2.2):
    EOBn symbol rs=(n<<4) ends the block and skips the next 2^n-1+ext blocks."""
    gh, gw = grid
    asym, alen = alut
    for rd, start, cnt in _entropy_segments(raw, ri, gh * gw):
        eobrun = 0
        for u in range(start, start + cnt):
            if eobrun:
                eobrun -= 1
                continue
            coef = ycoef[divmod(u, gw)]
            k = ss
            while k <= se:
                p16 = rd.peek16()
                rs = int(asym[p16])
                length = int(alen[p16])
                if length == 0:
                    raise ValueError("JPEG: invalid AC code")
                rd.pos += length
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd.receive(r)
                        eobrun -= 1  # this block is the first of the run
                        break
                    k += 16  # ZRL
                else:
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC run past band end")
                    coef[k] = _extend(rd.receive(s), s) << al
                    k += 1


def _prog_ac_refine(ycoef, grid, ss, se, al, raw, ri, alut):
    """AC refinement scan (Ah=Al+1): one correction bit per already-nonzero
    coefficient passed, ±1<<Al inserts at zero-history positions (T.81
    G.1.2.3 / figure G.7; run lengths count zero-history positions only)."""
    gh, gw = grid
    asym, alen = alut
    p1, m1 = 1 << al, -1 << al
    for rd, start, cnt in _entropy_segments(raw, ri, gh * gw):
        eobrun = 0
        for u in range(start, start + cnt):
            coef = ycoef[divmod(u, gw)]
            k = ss
            if eobrun == 0:
                while k <= se:
                    p16 = rd.peek16()
                    rs = int(asym[p16])
                    length = int(alen[p16])
                    if length == 0:
                        raise ValueError("JPEG: invalid AC code")
                    rd.pos += length
                    r, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rd.receive(r)
                            break  # rest of block handled by the EOB tail
                        # ZRL: skip 16 zero-history positions, no insert
                    else:
                        val = p1 if rd.receive(1) else m1
                    while k <= se:
                        cur = int(coef[k])
                        if cur != 0:
                            if rd.receive(1) and (cur & p1) == 0:
                                coef[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val and k <= se:
                        coef[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:  # correction bits for the rest of the band
                    cur = int(coef[k])
                    if cur != 0:
                        if rd.receive(1) and (cur & p1) == 0:
                            coef[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1


# ------------------------------------------------------------------ encoder
class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def align(self):
        if self.nacc:
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # pad with 1s


# Progressive AC Huffman table for the fixture encoder: the Annex-K baseline
# tables define no EOBn (n>=1) symbols, so progressive scans need their own
# table. A uniform 8-bit canonical table over every symbol a progressive AC
# scan can emit (EOB0..EOB14, ZRL, (r<<4)|s for s 1..10) is always valid
# (176 codes <= 2^8) — suboptimal compression, irrelevant for fixtures.
HUFF_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted({n << 4 for n in range(15)} | {0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}),
)

# Conventional 6-scan grayscale script (DC first with Al=1, split AC bands,
# then successive-approximation refinements down to Al=0).
_PROG_SCRIPT_GRAY = [
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (0, 0, 1, 0),
    (1, 63, 1, 0),
]


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _enc_codes(bits, vals):
    codes = {}
    for code, length, value in _canonical_codes(bits, vals):
        codes[value] = (code, length)
    return codes


def _encode_plane_blocks(img: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h8, w8) uint8 (multiple of 8) -> (n_blocks, 64) int32 zigzag quantized
    coefficients, block order row-major over the plane."""
    h, w = img.shape
    f = img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    f = f.reshape(-1, 8, 8)
    coef = _DCT_A @ f @ _DCT_A.T
    zzc = coef.reshape(-1, 64)[:, ZIGZAG]
    return np.rint(zzc / q).astype(np.int32)


def _emit_block(bw: _BitWriter, coef, pred: int, dc_codes, ac_codes) -> int:
    dc = int(coef[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, length = dc_codes[t]
    bw.put(code, length)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    nz = np.nonzero(coef[1:])[0]
    k = 0
    for idx in nz:
        run = int(idx) - k
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.put(code, length)
            run -= 16
        v = int(coef[1 + idx])
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        bw.put(code, length)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        k = int(idx) + 1
    if k < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.put(code, length)
    return dc


# ------------------------------------------------------- progressive encoder
def _rst_break(bw: _BitWriter, rst: int) -> int:
    bw.align()
    bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
    return rst + 1


def _enc_prog_dc_first(units, al: int, dc_codes, ri: int) -> bytes:
    """DC first scan: units = per-MCU lists of (comp_idx, dc) in scan order.
    Values sent are dc >> Al (arithmetic shift; the refinement scan restores
    the low bits), diff-coded per component."""
    bw = _BitWriter()
    preds: dict[int, int] = {}
    rst = 0
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0:
            rst = _rst_break(bw, rst)
            preds = {}
        for ci, dc in unit:
            v = int(dc) >> al
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            t = abs(diff).bit_length()
            code, length = dc_codes[t]
            bw.put(code, length)
            if t:
                bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.align()
    return bytes(bw.out)


def _enc_prog_dc_refine(units, al: int, ri: int) -> bytes:
    """DC refinement scan: one raw bit (bit Al of the DC value) per block."""
    bw = _BitWriter()
    rst = 0
    for i, unit in enumerate(units):
        if ri and i and i % ri == 0:
            rst = _rst_break(bw, rst)
        for _ci, dc in unit:
            bw.put((int(dc) >> al) & 1, 1)
    bw.align()
    return bytes(bw.out)


def _enc_prog_ac_first(blocks, ss: int, se: int, al: int, ac_codes, ri: int) -> bytes:
    """AC first scan over band Ss..Se (single component, raster block order)
    with EOB-run coding: trailing-zero blocks accumulate into one EOBn symbol."""
    bw = _BitWriter()
    eobrun = 0
    rst = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            bw.put(code, length)
            if nbits:
                bw.put(eobrun - (1 << nbits), nbits)
            eobrun = 0

    for i in range(len(blocks)):
        if ri and i and i % ri == 0:
            flush_eob()
            rst = _rst_break(bw, rst)
        coef = blocks[i]
        r = 0
        for k in range(ss, se + 1):
            v = int(coef[k])
            t = (v >> al) if v >= 0 else -((-v) >> al)  # sign-preserving shift
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                code, length = ac_codes[0xF0]
                bw.put(code, length)
                r -= 16
            s = abs(t).bit_length()
            code, length = ac_codes[(r << 4) | s]
            bw.put(code, length)
            bw.put(t if t >= 0 else t + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    bw.align()
    return bytes(bw.out)


def _enc_prog_ac_refine(blocks, ss: int, se: int, al: int, ac_codes, ri: int) -> bytes:
    """AC refinement scan (T.81 figure G.7 flow): newly-nonzero coefficients
    (shifted magnitude 1) are run-length coded counting zero-history positions
    only; already-nonzero coefficients contribute one correction bit each,
    buffered and emitted immediately after the next symbol they precede."""
    bw = _BitWriter()
    eobrun = 0
    pend: list[int] = []  # correction bits owed after the next EOBn
    rst = 0

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, length = ac_codes[nbits << 4]
            bw.put(code, length)
            if nbits:
                bw.put(eobrun - (1 << nbits), nbits)
            eobrun = 0
            for b in pend:
                bw.put(b, 1)
            pend = []

    for i in range(len(blocks)):
        if ri and i and i % ri == 0:
            flush_eob()
            rst = _rst_break(bw, rst)
        coef = blocks[i]
        absval = [0] * (se + 1)
        eob = ss - 1  # position of the last newly-nonzero coefficient
        for k in range(ss, se + 1):
            t = abs(int(coef[k])) >> al
            absval[k] = t
            if t == 1:
                eob = k
        r = 0  # run of zero-history positions
        br: list[int] = []  # correction bits since the last emitted symbol
        for k in range(ss, se + 1):
            t = absval[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:  # ZRLs not foldable into the EOB
                flush_eob()
                code, length = ac_codes[0xF0]
                bw.put(code, length)
                r -= 16
                for b in br:
                    bw.put(b, 1)
                br = []
            if t > 1:  # history-nonzero: correction bit only, not in runs
                br.append(t & 1)
                continue
            flush_eob()
            code, length = ac_codes[(r << 4) | 1]
            bw.put(code, length)
            bw.put(1 if int(coef[k]) >= 0 else 0, 1)
            for b in br:
                bw.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 937:  # libjpeg's MAX_CORR_BITS bound
                flush_eob()
    flush_eob()
    bw.align()
    return bytes(bw.out)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_body(tc: int, th: int, table) -> bytes:
    bits, vals = table
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def encode_jpeg_gray(
    img: np.ndarray,
    *,
    quality: int = 92,
    mode: str = "gray",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w) uint8 -> baseline JPEG (or SOF2 progressive with
    ``progressive=True``). mode: 'gray' (1 component), 'ycbcr444' or
    'ycbcr420' (3 components, chroma constant 128 — gray content carried in
    Y; exercises the decoder's interleaved-MCU and subsampling paths)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if mode not in ("gray", "ycbcr444", "ycbcr420"):
        raise ValueError(f"JPEG: unknown encode mode {mode}")
    sub = 2 if mode == "ycbcr420" else 1
    qy = _quality_scale(QT_LUMA[ZIGZAG], quality)
    qc = _quality_scale(QT_CHROMA[ZIGZAG], quality)

    mcu_h = 8 * sub
    hp = -(-h // mcu_h) * mcu_h
    wp = -(-w // mcu_h) * mcu_h
    ypad = np.full((hp, wp), 255, dtype=np.uint8)  # pad with paper white
    ypad[:h, :w] = img
    ypad[h:, :w] = img[h - 1 : h, :]  # edge-replicate to soften block seams
    ypad[:, w:] = ypad[:, w - 1 : w]
    yblocks = _encode_plane_blocks(ypad, qy)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qy.astype(np.uint8)))
    dc_y = _enc_codes(*HUFF_DC_LUMA)
    ac_y = _enc_codes(*HUFF_AC_LUMA)
    dht = _dht_body(0, 0, HUFF_DC_LUMA) + _dht_body(1, 0, HUFF_AC_LUMA)

    if mode == "gray" and progressive:
        out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        out += _seg(0xC4, _dht_body(0, 0, HUFF_DC_LUMA) + _dht_body(1, 0, HUFF_AC_PROG))
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        ac_p = _enc_codes(*HUFF_AC_PROG)
        units = [[(0, int(b[0]))] for b in yblocks]
        for ss, se, ah, al in _PROG_SCRIPT_GRAY:
            out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
            if ss == 0:
                if ah == 0:
                    out += _enc_prog_dc_first(units, al, dc_y, restart_interval)
                else:
                    out += _enc_prog_dc_refine(units, al, restart_interval)
            elif ah == 0:
                out += _enc_prog_ac_first(yblocks, ss, se, al, ac_p, restart_interval)
            else:
                out += _enc_prog_ac_refine(yblocks, ss, se, al, ac_p, restart_interval)
        out += b"\xff\xd9"
        return bytes(out)

    if mode == "gray":
        out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
        out += _seg(0xC4, dht)
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        bw = _BitWriter()
        pred = 0
        rst = 0
        for i in range(len(yblocks)):
            if restart_interval and i and i % restart_interval == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = 0
            pred = _emit_block(bw, yblocks[i], pred, dc_y, ac_y)
        bw.align()
        out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    # 3-component: Y at (sub,sub) sampling, Cb/Cr at (1,1), constant 128.
    out += _seg(0xDB, bytes([1]) + bytes(qc.astype(np.uint8)))
    hv_y = (sub << 4) | sub
    if progressive:
        out += _seg(
            0xC2,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        # one DC table (chroma diffs are all 0 — the luma table codes t=0)
        # and the universal progressive AC table for every AC scan
        out += _seg(0xC4, _dht_body(0, 0, HUFF_DC_LUMA) + _dht_body(1, 0, HUFF_AC_PROG))
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        ac_p = _enc_codes(*HUFF_AC_PROG)
        mcux = wp // mcu_h
        mcuy = hp // mcu_h
        ygrid = yblocks.reshape(mcuy, sub, mcux, sub, 64).transpose(0, 2, 1, 3, 4)
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                u = [(0, int(ygrid[my, mx, v, uu, 0])) for v in range(sub) for uu in range(sub)]
                units.append(u + [(1, 0), (2, 0)])
        # non-interleaved AC block grids (T.81 A.1.1: NOT padded to MCUs)
        ybr = yblocks.reshape(hp // 8, wp // 8, 64)[: -(-h // 8), : -(-w // 8)].reshape(-1, 64)
        n_cblk = (-(-(-(-h // sub)) // 8)) * (-(-(-(-w // sub)) // 8))
        czero = np.zeros((n_cblk, 64), dtype=np.int32)
        sos3 = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00])
        ri = restart_interval
        out += _seg(0xDA, sos3 + bytes([0, 0, 0x01]))  # DC first, Al=1
        out += _enc_prog_dc_first(units, 1, dc_y, ri)
        out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))  # AC Y first, Al=1
        out += _enc_prog_ac_first(ybr, 1, 63, 1, ac_p, ri)
        out += _seg(0xDA, bytes([1, 2, 0x00, 1, 63, 0x00]))  # AC Cb (all-zero)
        out += _enc_prog_ac_first(czero, 1, 63, 0, ac_p, ri)
        out += _seg(0xDA, bytes([1, 3, 0x00, 1, 63, 0x00]))  # AC Cr (all-zero)
        out += _enc_prog_ac_first(czero, 1, 63, 0, ac_p, ri)
        out += _seg(0xDA, sos3 + bytes([0, 0, 0x10]))  # DC refine, Ah=1 Al=0
        out += _enc_prog_dc_refine(units, 0, ri)
        out += _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))  # AC Y refine
        out += _enc_prog_ac_refine(ybr, 1, 63, 0, ac_p, ri)
        out += b"\xff\xd9"
        return bytes(out)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, hv_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    dc_c = _enc_codes(*HUFF_DC_CHROMA)
    ac_c = _enc_codes(*HUFF_AC_CHROMA)
    out += _seg(
        0xC4,
        dht + _dht_body(0, 1, HUFF_DC_CHROMA) + _dht_body(1, 1, HUFF_AC_CHROMA),
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    mcux = wp // mcu_h
    mcuy = hp // mcu_h
    ygrid = yblocks.reshape(mcuy, sub, mcux, sub, 64).transpose(0, 2, 1, 3, 4)
    zero = np.zeros(64, dtype=np.int32)  # chroma 128 - 128 = 0 everywhere
    bw = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0, 0, 0]
            for v in range(sub):
                for u in range(sub):
                    preds[0] = _emit_block(bw, ygrid[my, mx, v, u], preds[0], dc_y, ac_y)
            preds[1] = _emit_block(bw, zero, preds[1], dc_c, ac_c)
            preds[2] = _emit_block(bw, zero, preds[2], dc_c, ac_c)
            mcu_i += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
