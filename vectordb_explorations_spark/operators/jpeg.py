"""Pure-NumPy JPEG codec — baseline sequential AND progressive
Huffman DCT (r13 verdict item 3; progressive added r14).

A real multimodal corpus is mostly JPEG, and this container carries no
codec library — so the perceptual dedup family could not ingest the
dominant real-world format here (the capability seam routed JPEG to
PIL, absent). This module implements the Huffman DCT processes of the
public JPEG standard (ITU-T T.81 / ISO 10918-1):

- ``decode_jpeg`` (alias ``decode_baseline_jpeg``): marker parse
  (DQT/SOF0/SOF1/SOF2/DHT/DRI/SOS), canonical Huffman entropy decode
  with byte-unstuffing and restart intervals, MULTI-SCAN coefficient
  accumulation for the progressive process (spectral selection bands,
  successive approximation — DC/AC first and refinement scans, EOB
  runs, interleaved and single-component scans), dequantize,
  vectorized 8x8 IDCT (one einsum over all blocks — the per-symbol
  loop is the only Python-rate part), nearest chroma upsample for
  arbitrary sampling factors (4:4:4 / 4:2:0 / 4:2:2), JFIF
  YCbCr -> RGB. Grayscale (1 component) -> (h, w); color
  (3 components) -> (h, w, 3) uint8 — the same shape contract as the
  netpbm/BMP native paths in operators/multimodal.py.
- ``encode_baseline_jpeg``: deterministic single-scan encoder
  (Annex K quantization and Huffman tables, IJG quality scaling,
  4:4:4 / 4:2:2 / 4:2:0) so tests and pipelines can SYNTHESIZE
  deterministic JPEG payloads in-process — the P6 -> BMP re-encode
  precedent (operators/perceptual.py) extended to the compressed
  format.
- ``encode_progressive_jpeg``: the SOF2 half — the libjpeg-shaped
  scan script (interleaved DC first + refinement, per-component AC
  spectral-selection first scans, AC refinement scans with EOB-run
  accumulation and pending correction bits). Both encoders quantize
  identically, so a progressive decode is asserted BIT-EQUAL to the
  baseline decode of the same source.

12-bit precision decodes in the sequential and progressive Huffman
processes (samples fold to the top 8 bits — the uint8 output
contract); only the arithmetic-coded and hierarchical processes raise
NotImplementedError — decode_image's seam then falls through to PIL
where the runtime probe found it, exactly like the other compressed
formats.

Everything here derives from the published standard; both halves are
deterministic (fixed tables, explicit rounding), so planted-recall
tests can hash their outputs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- ITU-T T.81 Annex K reference tables --------------------------------

# K.1 luminance / K.2 chrominance quantization tables (zigzag order
# follows in DQT segments; these are raster 8x8).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# zigzag position -> raster index (the standard scan sequence)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# K.3 typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# Progressive AC scans need EOB-run symbols (r<<4 for r in 1..14)
# that the Annex K sequential AC tables do not carry. The encoder's
# progressive scans use one flat custom table instead: all 176
# symbols it may emit — (run<<4)|size for size 1..10, the 15 EOB-run
# codes 0x00..0xE0, and ZRL 0xF0 — as length-8 canonical codes
# (codes 0..175; the reserved all-ones code is never assigned).
# Deterministic and trivially valid; compression is not the point of
# the synthesis half.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = sorted([(r << 4) | s for r in range(16)
                       for s in range(1, 11)]
                      + [r << 4 for r in range(15)] + [0xF0])

# 12-bit (extended sequential) tables: DC categories reach 15 and AC
# magnitudes 14 bits, past the Annex K tables' reach — flat custom
# codes, same construction as the progressive table.
EXT12_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
EXT12_DC_VALS = list(range(16))
EXT12_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 226, 0, 0, 0, 0, 0, 0, 0, 0]
EXT12_AC_VALS = sorted([(r << 4) | s for r in range(16)
                        for s in range(1, 15)] + [0x00, 0xF0])

# orthonormal 8-point DCT-II basis: forward F = T f T', inverse f = T' F T
_T = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.5) if _k == 0 else 1.0
    for _n in range(8):
        _T[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table, clamped to
    [1, 255] (baseline requires 8-bit quantizer precision)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]):
    """Canonical Huffman assignment (T.81 C.2): codes of each length in
    symbol order, left-aligned increments. Returns
    {symbol: (code, length)} for the encoder and
    {(length, code): symbol} for the decoder."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            enc[sym] = (code, length)
            dec[(length, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


# ---- decoder -------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: operates over pre-unstuffed byte
    segments (split at RSTn), MSB first. ``restart`` advances to the
    next segment (the decoder resets DC predictions)."""

    def __init__(self, segments: list[bytes]):
        self.segments = segments
        self.si = 0
        self.data = segments[0] if segments else b""
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # past the segment end: T.81 F.2.2.5 pads with 1-bits
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        self.si += 1
        if self.si >= len(self.segments):
            raise ValueError("JPEG: restart interval past entropy data")
        self.data = self.segments[self.si]
        self.pos = 0
        self.bit = 0


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code in entropy stream")


def _split_entropy(buf: bytes, start: int):
    """Walk the entropy-coded data from ``start``: unstuff 0xFF00,
    split at RSTn, stop at any other marker. Returns (segments,
    position of the terminating marker's 0xFF)."""
    segments, cur = [], bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segments.append(bytes(cur))
    return segments, i


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _used_blocks(frame, c, hmax, vmax):
    """Block grid a NON-interleaved scan iterates: the component's own
    sampled dimensions (T.81 A.2.2), NOT the MCU-padded grid."""
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Huffman DCT decode -> uint8 (h, w) grayscale or (h, w, 3) RGB.
    Covers the baseline/extended sequential (SOF0/SOF1) AND
    progressive (SOF2) processes — multi-scan spectral selection and
    successive approximation with EOB runs, interleaved and
    single-component scans, restart intervals in every scan type.
    8- and 12-bit precision both decode (12-bit folds to the top 8
    bits). Raises ValueError for malformed streams and
    NotImplementedError for the non-Huffman processes (arithmetic
    coding, hierarchical) so the capability seam can route to PIL."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    quant: dict[int, np.ndarray] = {}   # id -> raster-order table
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    planes: dict[int, np.ndarray] = {}  # comp id -> (nblocks, 64) zigzag
    restart_interval = 0
    got_scan = False
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG: expected marker")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip to the marker id byte
        j = i + 1
        while j < n and payload[j] == 0xFF:
            j += 1
        if j >= n:
            break
        marker = payload[j]
        i = j + 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i:i + 2])
        seg = payload[i + 2:i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p:p + 128],
                                         dtype=">u2")
                    p += 128
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals.astype(np.int32)
                quant[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec = seg[0]
            if prec == 12 and marker == 0xC0:
                raise ValueError("JPEG: baseline SOF0 requires 8-bit "
                                 "precision")
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG: {prec}-bit precision is not supported "
                    f"natively — PIL handles it where installed")
            h_img, w_img = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h_img, "w": w_img, "comps": comps,
                     "prec": prec,
                     "progressive": marker == 0xC2}
            _, _, mcux, mcuy = _frame_geometry(frame)
            planes = {c["id"]: np.zeros(
                (mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int32)
                for c in comps}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF marker 0x{marker:02X} is not a Huffman "
                f"DCT process this codec covers (arithmetic/"
                f"lossless/hierarchical) — PIL handles these where "
                f"installed")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                _, dec = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(cc for cc in frame["comps"]
                            if cc["id"] == cs)
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 15})
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            segments, end = _split_entropy(payload, i + seglen)
            _decode_scan_entropy(frame, scan, huff_dc, huff_ac,
                                 restart_interval, segments, planes,
                                 ss, se, ahal >> 4, ahal & 15)
            got_scan = True
            i = end
            continue
        i += seglen
    if not got_scan:
        raise ValueError("JPEG: no SOS marker found")
    return _reconstruct(frame, planes, quant)


# the original public name (the codec began baseline-only); kept as
# an alias so callers and tests name the process they rely on
decode_baseline_jpeg = decode_jpeg


def _decode_scan_entropy(frame, scan, huff_dc, huff_ac,
                         restart_interval, segments, planes,
                         ss, se, ah, al) -> None:
    """One entropy-coded scan -> accumulate into coefficient planes
    (zigzag order). Sequential frames decode whole blocks; progressive
    frames dispatch on (Ss, Ah) into DC/AC first/refinement passes."""
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    progressive = frame["progressive"]
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("JPEG: progressive DC scan with Se != 0")
        if ss > 0 and len(scan) != 1:
            raise ValueError(
                "JPEG: progressive AC scans carry one component")
        if ss > se or se > 63:
            raise ValueError("JPEG: bad spectral selection band")
    reader = _BitReader(segments)
    state = {"eobrun": 0}
    preds = {c["id"]: 0 for c in scan}

    if len(scan) > 1:                          # interleaved (MCU order)
        units = mcux * mcuy

        def unit_blocks(u):
            my, mx = divmod(u, mcux)
            for c in scan:
                bw = mcux * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yield c, ((my * c["v"] + by) * bw
                                  + (mx * c["h"] + bx))
    else:                                      # single component
        c0 = scan[0]
        bw_full = mcux * c0["h"]
        bw_used, bh_used = _used_blocks(frame, c0, hmax, vmax)
        units = bw_used * bh_used

        def unit_blocks(u):
            by, bx = divmod(u, bw_used)
            yield c0, by * bw_full + bx

    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            reader.restart()
            preds = {c["id"]: 0 for c in scan}
            state["eobrun"] = 0
        for c, bi in unit_blocks(u):
            block = planes[c["id"]][bi]
            if not progressive:
                _block_sequential(reader, block, huff_dc[c["dc"]],
                                  huff_ac[c["ac"]], c["id"], preds)
            elif ss == 0:
                if ah == 0:                    # DC first
                    t = _decode_huff(reader, huff_dc[c["dc"]])
                    diff = _extend(reader.read_bits(t), t)
                    preds[c["id"]] += diff
                    block[0] = preds[c["id"]] << al
                else:                          # DC refinement
                    block[0] |= reader.read_bit() << al
            elif ah == 0:
                _block_ac_first(reader, block, huff_ac[c["ac"]],
                                ss, se, al, state)
            else:
                _block_ac_refine(reader, block, huff_ac[c["ac"]],
                                 ss, se, al, state)


def _block_sequential(reader, block, dct, act, cid, preds) -> None:
    """Baseline whole-block decode (DC diff + AC runs) into zigzag
    order."""
    t = _decode_huff(reader, dct)
    diff = _extend(reader.read_bits(t), t)
    preds[cid] += diff
    block[0] = preds[cid]
    k = 1
    while k < 64:
        rs = _decode_huff(reader, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG: AC run past block end")
        block[k] = _extend(reader.read_bits(s), s)
        k += 1


def _block_ac_first(reader, block, act, ss, se, al, state) -> None:
    """Progressive AC first pass (T.81 G.1.2.2): values enter at
    precision Al; an EOB symbol opens a run covering this and the next
    (1<<r)+bits-1 blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(reader, act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG: AC run past band end")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _block_ac_refine(reader, block, act, ss, se, al, state) -> None:
    """Progressive AC refinement (T.81 G.1.2.3): already-nonzero
    coefficients receive a correction bit; newly significant ones
    arrive as +-1 at precision Al; EOB runs carry the correction bits
    of the blocks they cover."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(reader, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.read_bits(r)
                    break                      # sweep handles the rest
                val = 0                        # ZRL: 16 zero-history
            elif s == 1:
                val = p1 if reader.read_bit() else m1
            else:
                raise ValueError(
                    "JPEG: refinement magnitude must be 1")
            while k <= se:
                if block[k] != 0:
                    if reader.read_bit() and not (block[k] & p1):
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                block[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:                         # correction-bit sweep
            if block[k] != 0:
                if reader.read_bit() and not (block[k] & p1):
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, planes, quant) -> np.ndarray:
    """Dequantize + batch IDCT per component, assemble, upsample,
    color-convert — shared by the sequential and progressive paths.
    12-bit frames level-shift by 2048, clamp to 0..4095, and FOLD to
    the top 8 bits (the module-wide uint8 output contract — the same
    I;16 -> L discipline as the PNG/netpbm high-byte folds)."""
    h_img, w_img = frame["h"], frame["w"]
    prec = frame.get("prec", 8)
    mid = float(1 << (prec - 1))
    maxv = float((1 << prec) - 1)
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    out_planes = []
    for c in frame["comps"]:
        if c["tq"] not in quant:
            raise ValueError("JPEG: missing quantization table")
        q = quant[c["tq"]]
        raster = np.zeros_like(planes[c["id"]])
        raster[:, ZIGZAG] = planes[c["id"]]
        blocks = (raster.astype(np.float64) * q).reshape(-1, 8, 8)
        spatial = np.einsum("kj,njl,lm->nkm", _T.T, blocks, _T)
        spatial = np.clip(np.round(spatial + mid), 0, maxv)
        if prec > 8:
            spatial = np.floor(spatial / (1 << (prec - 8)))
        bw, bh = mcux * c["h"], mcuy * c["v"]
        plane = (spatial.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        plane = plane.repeat(vmax // c["v"], axis=0) \
                     .repeat(hmax // c["h"], axis=1)
        out_planes.append(plane[:h_img, :w_img])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    if len(out_planes) != 3:
        raise NotImplementedError(
            f"JPEG: {len(out_planes)}-component frames not supported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---- encoder -------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bit padding per spec

    def marker(self, byte: int) -> None:
        """Byte-align and emit a raw marker (RSTn) — markers are not
        entropy data, so no stuffing."""
        self.align()
        self.out += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(writer: _BitWriter, coefs: np.ndarray, pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    """One quantized block (raster order) -> entropy stream. Returns
    the new DC prediction."""
    dc = int(coefs[0])
    diff = dc - pred
    t = _csize(diff)
    code, length = dc_enc[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    zz = coefs[ZIGZAG]
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_enc[0x00]  # EOB
                writer.write(code, length)
                break
            run += 1
            continue
        while run > 15:
            code, length = ac_enc[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _csize(v)
        code, length = ac_enc[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _dqt_segment(tid: int, tbl: np.ndarray) -> bytes:
    zz = tbl.reshape(64)[ZIGZAG].astype(np.uint8)
    return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
            + zz.tobytes())


def _dht_segment(tc: int, th: int, bits: list[int],
                 vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate ``plane`` to (ph, pw) — the conventional block
    padding (keeps boundary DCT energy low)."""
    h, w = plane.shape
    padded = np.empty((ph, pw))
    padded[:h, :w] = plane
    if ph > h:
        padded[h:, :w] = plane[-1:, :]
    if pw > w:
        padded[:, w:] = padded[:, w - 1:w]
    return padded


def _prepare_quantized(arr: np.ndarray, quality: int,
                       subsampling: str, scale: int = 1):
    """Shared encoder front half: color transform, chroma
    downsample, forward DCT, quantization. Returns (gray, h, w, samp,
    mcux, mcuy, ql, qc, quantized) with ``quantized[ci]`` the
    component's (nblocks, 64) RASTER-order int32 coefficients in the
    MCU-padded grid — both encoders quantize identically, so their
    decodes are bit-comparable. ``scale`` lifts samples into a wider
    precision domain (16 for 12-bit extended sequential)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("JPEG encoders expect uint8 (h,w[,3])")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    if gray:
        planes = [a.astype(np.float64) - 128.0]
    else:
        rf = a[..., 0].astype(np.float64)
        gf = a[..., 1].astype(np.float64)
        bf = a[..., 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    sub = subsampling != "444" and not gray
    if sub:
        # box-mean chroma downsample by (fh, fw) (pad to multiple first)
        fh, fw = (2, 2) if subsampling == "420" else (1, 2)

        def down(p):
            ph = -(-p.shape[0] // fh) * fh
            pw = -(-p.shape[1] // fw) * fw
            p = _pad_edge(p, ph, pw)
            return (p.reshape(ph // fh, fh, pw // fw, fw)
                    .mean(axis=(1, 3)))
        planes = [planes[0], down(planes[1]), down(planes[2])]
        samp = [(fw, fh), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    quantized = []
    for ci, plane in enumerate(planes):
        hs, vs = samp[ci]
        bw, bh = mcux * hs, mcuy * vs
        q = (ql if ci == 0 else qc).reshape(8, 8).astype(np.float64)
        padded = _pad_edge(plane, bh * 8, bw * 8) * float(scale)
        blocks = (padded.reshape(bh, 8, bw, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        freq = np.einsum("kj,njl,lm->nkm", _T, blocks, _T.T)
        # round half away from zero — the conventional quantizer
        qz = np.sign(freq) * np.floor(np.abs(freq) / q + 0.5)
        quantized.append(qz.reshape(-1, 64).astype(np.int32))
    return gray, h, w, samp, mcux, mcuy, ql, qc, quantized


def encode_baseline_jpeg(arr: np.ndarray, quality: int = 90,
                         subsampling: str = "444",
                         restart_interval: int = 0,
                         precision: int = 8) -> bytes:
    """Deterministic single-scan JPEG encode of a uint8 (h, w)
    grayscale or (h, w, 3) RGB array: Annex K tables under IJG
    quality scaling, 4:4:4 / 4:2:2 / 4:2:0 chroma (``subsampling``),
    no restart markers by default. ``precision=12`` emits the
    EXTENDED SEQUENTIAL process instead (SOF1, samples lifted x16
    into the 12-bit domain, flat custom Huffman tables carrying the
    wider DC/AC categories Annex K lacks — the decoder folds back to
    the uint8 contract). The test-synthesis half of the codec pair —
    fixed tables + explicit rounding means byte-identical output for
    identical input, so planted-dup tests can build JPEG payloads
    in-pipeline; the subsampled modes exist mainly so tests drive the
    decoder's real-world interleaved-MCU paths."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    gray, h, w, samp, mcux, mcuy, ql, qc, quantized = \
        _prepare_quantized(arr, quality, subsampling,
                           scale=1 << (precision - 8))
    if precision == 12:
        dc_l_enc, _ = _canonical_codes(EXT12_DC_BITS, EXT12_DC_VALS)
        ac_l_enc, _ = _canonical_codes(EXT12_AC_BITS, EXT12_AC_VALS)
        dc_c_enc, ac_c_enc = dc_l_enc, ac_l_enc
    else:
        dc_l_enc, _ = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l_enc, _ = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        dc_c_enc, _ = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c_enc, _ = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0] * len(quantized)
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.marker(0xD0 + (rst % 8))
                rst += 1
                preds = [0] * len(quantized)
            mcu += 1
            for ci in range(len(quantized)):
                hs, vs = samp[ci]
                bw = mcux * hs
                dc_enc = dc_l_enc if ci == 0 else dc_c_enc
                ac_enc = ac_l_enc if ci == 0 else ac_c_enc
                for by in range(vs):
                    for bx in range(hs):
                        bi = (my * vs + by) * bw + (mx * hs + bx)
                        preds[ci] = _encode_block(
                            writer, quantized[ci][bi], preds[ci],
                            dc_enc, ac_enc)
    entropy = writer.flush()

    out = bytearray(b"\xff\xd8")                           # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                               # APP0
    out += _dqt_segment(0, ql)
    ncomp = 1 if gray else 3
    y_samp = (samp[0][0] << 4) | samp[0][1]
    sof = bytes([precision]) + struct.pack(">HH", h, w) \
        + bytes([ncomp])
    sof += bytes([1, y_samp, 0])
    if not gray:
        out += _dqt_segment(1, qc)
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    sof_marker = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if precision == 12:
        out += _dht_segment(0, 0, EXT12_DC_BITS, EXT12_DC_VALS)
        out += _dht_segment(1, 0, EXT12_AC_BITS, EXT12_AC_VALS)
        if not gray:
            out += _dht_segment(0, 1, EXT12_DC_BITS, EXT12_DC_VALS)
            out += _dht_segment(1, 1, EXT12_AC_BITS, EXT12_AC_VALS)
    else:
        out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        if not gray:
            out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
            out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += entropy
    out += b"\xff\xd9"                                     # EOI
    return bytes(out)


# ---- progressive encoder -------------------------------------------------


def _sign_trunc(v: int, al: int) -> int:
    """The AC point transform (T.81 G.1.2.1): v / 2^Al truncated
    toward zero (the DC transform is the arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


def _flush_eobrun(writer: _BitWriter, state: dict, ac_enc: dict) -> None:
    """Emit a pending EOB run (symbol r<<4 + r offset bits), then any
    pending refinement correction bits — the decoder reads the covered
    blocks' corrections immediately after the run length."""
    e = state["eobrun"]
    if e:
        r = e.bit_length() - 1
        code, ln = ac_enc[r << 4]
        writer.write(code, ln)
        if r:
            writer.write(e - (1 << r), r)
        state["eobrun"] = 0
    for b in state["pending"]:
        writer.write(b, 1)
    state["pending"] = []


def _enc_ac_first(writer, state, blockzz, ss, se, al, ac_enc) -> None:
    vals = [_sign_trunc(int(blockzz[k]), al) for k in range(ss, se + 1)]
    if not any(vals):
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(writer, state, ac_enc)
        return
    _flush_eobrun(writer, state, ac_enc)
    last = max(i for i, v in enumerate(vals) if v)
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac_enc[0xF0]
            writer.write(code, ln)
            r -= 16
        s = _csize(v)
        code, ln = ac_enc[(r << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if last < se - ss:
        state["eobrun"] += 1


def _enc_ac_refine(writer, state, blockzz, ss, se, ah, al,
                   ac_enc) -> None:
    """T.81 G.1.2.3 encoder: newly significant coefficients (zero
    history, magnitude 1 at this precision) code as runs of
    still-zero ZERO-HISTORY positions; already-nonzero positions
    contribute correction bits carried behind the next emitted symbol
    (or behind the EOB run when the block ends without new
    significants)."""
    band = [int(blockzz[k]) for k in range(ss, se + 1)]
    tnow = [abs(v) >> al for v in band]
    hist = [abs(v) >> ah for v in band]
    newly = [i for i in range(len(band))
             if hist[i] == 0 and tnow[i] == 1]
    if not newly:
        state["eobrun"] += 1
        state["pending"].extend(tnow[i] & 1 for i in range(len(band))
                                if hist[i])
        if state["eobrun"] == 0x7FFF:
            _flush_eobrun(writer, state, ac_enc)
        return
    _flush_eobrun(writer, state, ac_enc)
    last = newly[-1]
    r = 0
    pending: list[int] = []

    def flush_zrl_runs():
        # Emit pending ZRLs BEFORE buffering a history coefficient's
        # correction bit (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine
        # ordering): the decoder consumes, inline with each ZRL's
        # 16-zero-history advance, exactly the correction bits of
        # history positions it passes — a bit buffered before the ZRL
        # for a position AFTER the span desyncs the stream.
        nonlocal r, pending
        while r > 15:
            code, ln = ac_enc[0xF0]
            writer.write(code, ln)
            for b in pending:
                writer.write(b, 1)
            pending = []
            r -= 16

    for i in range(last + 1):
        if hist[i]:
            flush_zrl_runs()
            pending.append(tnow[i] & 1)
            continue
        if tnow[i] == 0:
            r += 1
            continue
        flush_zrl_runs()
        code, ln = ac_enc[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(1 if band[i] > 0 else 0, 1)
        for b in pending:
            writer.write(b, 1)
        pending = []
        r = 0
    if last < len(band) - 1:
        state["eobrun"] += 1
        state["pending"].extend(
            pending + [tnow[i] & 1 for i in range(last + 1, len(band))
                       if hist[i]])


def _default_scan_script(gray: bool):
    """The libjpeg-shaped progressive script: interleaved DC first at
    Al=1, spectral-selection AC first scans per component at Al=1
    (luma split into a 1-5 band and a 6-63 band), then the Al=0
    refinements (DC interleaved, AC per component). Entries are
    (component indices, Ss, Se, Ah, Al)."""
    if gray:
        return [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 1),
                ([0], 6, 63, 0, 1), ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 1), ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1), ([0], 6, 63, 0, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0)]


def _encode_progressive_scan(zzq, comps, samp, mcux, mcuy, h, w,
                             ss, se, ah, al, restart_interval,
                             dc_encs, ac_enc) -> bytes:
    """Entropy bytes for one progressive scan — the encoder mirror of
    _decode_scan_entropy's unit walk (interleaved MCUs for multi-
    component DC scans, the component's own used-block grid
    otherwise)."""
    writer = _BitWriter()
    state = {"eobrun": 0, "pending": []}
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if len(comps) > 1:
        units = mcux * mcuy

        def unit_blocks(u):
            my, mx = divmod(u, mcux)
            for ci in comps:
                hs, vs = samp[ci]
                bw = mcux * hs
                for by in range(vs):
                    for bx in range(hs):
                        yield ci, (my * vs + by) * bw + (mx * hs + bx)
    else:
        ci0 = comps[0]
        hs, vs = samp[ci0]
        bw_full = mcux * hs
        # the decoder's grid rule, via the same helper — the two
        # walks must never drift
        bw_used, bh_used = _used_blocks(
            {"w": w, "h": h}, {"h": hs, "v": vs}, hmax, vmax)
        units = bw_used * bh_used

        def unit_blocks(u):
            by, bx = divmod(u, bw_used)
            yield ci0, by * bw_full + bx

    preds = {ci: 0 for ci in comps}
    rst = 0
    for u in range(units):
        if restart_interval and u and u % restart_interval == 0:
            _flush_eobrun(writer, state, ac_enc)
            writer.marker(0xD0 + (rst % 8))
            rst += 1
            preds = {ci: 0 for ci in comps}
        for ci, bi in unit_blocks(u):
            block = zzq[ci][bi]
            if ss == 0:
                if ah == 0:                    # DC first (Al shift)
                    v = int(block[0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = _csize(diff)
                    code, ln = dc_encs[ci][t]
                    writer.write(code, ln)
                    if t:
                        writer.write(
                            diff if diff >= 0 else
                            diff + (1 << t) - 1, t)
                else:                          # DC refinement: raw bit
                    writer.write((int(block[0]) >> al) & 1, 1)
            elif ah == 0:
                _enc_ac_first(writer, state, block, ss, se, al, ac_enc)
            else:
                _enc_ac_refine(writer, state, block, ss, se, ah, al,
                               ac_enc)
    _flush_eobrun(writer, state, ac_enc)
    return writer.flush()


def encode_progressive_jpeg(arr: np.ndarray, quality: int = 90,
                            subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """Deterministic PROGRESSIVE (SOF2) JPEG encode — same
    quantization front half as encode_baseline_jpeg, so the decoded
    images of the two encodings of one source are bit-identical; the
    entropy layer exercises every progressive decode path: interleaved
    DC first + refinement, per-component spectral-selection AC first
    scans, AC refinement with EOB-run accumulation and pending
    correction bits, optional restart markers in every scan."""
    gray, h, w, samp, mcux, mcuy, ql, qc, quantized = \
        _prepare_quantized(arr, quality, subsampling)
    zzq = [qz[:, ZIGZAG] for qz in quantized]
    dc_l_enc, _ = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c_enc, _ = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_enc, _ = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)
    dc_encs = {ci: (dc_l_enc if ci == 0 else dc_c_enc)
               for ci in range(len(quantized))}

    out = bytearray(b"\xff\xd8")                           # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
            + bytes([0, 0]))                               # APP0
    out += _dqt_segment(0, ql)
    ncomp = 1 if gray else 3
    y_samp = (samp[0][0] << 4) | samp[0][1]
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sof += bytes([1, y_samp, 0])
    if not gray:
        out += _dqt_segment(1, qc)
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(1, 0, PROG_AC_BITS, PROG_AC_VALS)

    for comps, ss, se, ah, al in _default_scan_script(gray):
        sos = bytes([len(comps)])
        for ci in comps:
            td = 0 if (ss > 0 or ah > 0) else (0 if ci == 0 else 1)
            sos += bytes([ci + 1, (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += _encode_progressive_scan(
            zzq, comps, samp, mcux, mcuy, h, w, ss, se, ah, al,
            restart_interval, dc_encs, ac_enc)
    out += b"\xff\xd9"                                     # EOI
    return bytes(out)
