"""Pure-Python/NumPy WebP LOSSLESS (VP8L) codec (r14 continuation —
the last static image format in the capability seam).

WebP carries two encodings: lossy VP8 (a video intra frame —
boolean arithmetic coding, loop filters) and LOSSLESS VP8L. VP8L is
an LZ77 + canonical-prefix-code format with four reversible spatial
transforms — structurally DEFLATE's family, so a native decoder
needs only bit arithmetic. This module implements the full VP8L
decode path from the public container/bitstream specs (RFC 9649):

- RIFF/WEBP container walk to the ``VP8L`` chunk;
- LSB-first bit reader; canonical prefix codes read either as
  "simple" (1-2 symbols) or via the DEFLATE-style code-length code
  (order table, 16/17/18 repeat semantics, optional max_symbol);
- the five-code groups (green+length+cache, red, blue, alpha,
  distance), optional META prefix image selecting per-tile groups;
- LZ77 backward references with the 120-entry two-dimensional
  distance neighborhood map and prefix-coded lengths/distances;
- the color cache (0x1e35a7bd multiplicative hash, 1-11 bits);
- all four transforms, inverted in reverse order: PREDICTOR (14
  modes incl. Select and ClampAddSubtract, per-tile modes from a
  subresolution image), COLOR (3.5-bit signed cross-channel deltas),
  SUBTRACT_GREEN, and COLOR_INDEXING (palette with sub-byte pixel
  bundling for palettes <= 16);
- returns (h, w, 3) uint8 RGB (alpha dropped — the module-wide
  ``convert("RGB")`` contract).

Lossy VP8 still raises NotImplementedError toward the PIL seam.

``encode_vp8l`` is the deterministic test-synthesis half (the
JPEG/PNG/FLAC precedent): literal pixels under NORMAL code-length-
coded prefix codes (exercising the repeat codes), optional
subtract-green transform, optional color cache, and run-length LZ77
references — enough surface to drive every decoder path from
in-process payloads; hand-built streams in the tests cover the
remaining transforms. Round trips are exact (the format is
lossless); encoded bytes are deterministic, so tests pin sha256 both
directions.
"""

from __future__ import annotations

import struct

import numpy as np

# DEFLATE-style order in which code-length-code lengths are stored
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15)

# the 2D distance map: codes 1..120 address nearby pixels as (dx, dy)
# offsets (spec "distance mapping"); code > 120 is a linear distance
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
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))


class _LsbReader:
    """LSB-first bit reader (DEFLATE bit order)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.buf):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.buf[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


def _canonical(lengths: list[int]) -> dict:
    """RFC1951-style canonical codes from lengths -> {(len, code):
    symbol}; codes are walked MSB-first while the stream is LSB-first
    (the DEFLATE convention VP8L shares)."""
    dec: dict = {}
    max_len = max(lengths, default=0)
    code = 0
    for ln in range(1, max_len + 1):
        for sym, sl in enumerate(lengths):
            if sl == ln:
                dec[(ln, code)] = sym
                code += 1
        code <<= 1
    return dec


def _decode_sym(br: _LsbReader, table) -> int:
    """One symbol: single-symbol codes read no bits (table is the
    bare symbol); otherwise walk bit by bit."""
    if isinstance(table, int):
        return table
    code = 0
    for length in range(1, 16):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("VP8L: invalid prefix code in stream")


def _read_code_lengths(br: _LsbReader, clc: dict, n: int) -> list[int]:
    """Symbol code lengths via the code-length code with 16/17/18
    repeats and the optional max_symbol cap."""
    lengths = [0] * n
    if br.read(1):                            # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = n
    prev = 8
    i = 0
    while i < n:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = _decode_sym(br, clc)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            lengths[i:i + rep] = [prev] * min(rep, n - i)
            i += rep
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    return lengths


def _read_prefix_code(br: _LsbReader, alphabet: int):
    """One prefix code: 'simple' (1-2 symbols) or code-length coded.
    Returns a decode table, or a bare int for a zero-bit code."""
    if br.read(1):                            # simple
        nsym = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if nsym == 1:
            return s0                         # zero-bit code
        s1 = br.read(8)
        return {(1, 0): s0, (1, 1): s1}
    ncl = 4 + br.read(4)
    clc_lengths = [0] * 19
    for k in range(ncl):
        clc_lengths[_CLC_ORDER[k]] = br.read(3)
    clc = _canonical(clc_lengths)
    lengths = _read_code_lengths(br, clc, alphabet)
    nz = [s for s, ln in enumerate(lengths) if ln]
    if len(nz) == 1:
        return nz[0]
    return _canonical(lengths)


def _prefix_value(br: _LsbReader, code: int) -> int:
    """Length/distance prefix decoding: 24/40 slots with extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_groups(br: _LsbReader, cache_size: int, n_groups: int):
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, 256 + 24 + cache_size)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    return groups


def _decode_image_stream(br: _LsbReader, w: int, h: int,
                         is_level0: bool):
    """Entropy-coded ARGB image -> (h, w) uint32 array, plus the list
    of transforms (level 0 only) to invert afterwards."""
    transforms = []
    xsize = w
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("VP8L: duplicate transform")
            if ttype == 0 or ttype == 1:      # PREDICTOR / COLOR
                size_bits = br.read(3) + 2
                tw = (xsize + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                sub = _decode_image_stream(br, tw, th, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:                  # SUBTRACT_GREEN
                transforms.append((2, None, None))
            else:                             # COLOR_INDEXING
                psize = br.read(8) + 1
                pal = _decode_image_stream(br, psize, 1, False)
                # palette entries are delta-coded component-wise
                pal = pal.astype(np.uint32)
                for i in range(1, psize):
                    pal[0, i] = _add_pixels(int(pal[0, i]),
                                            int(pal[0, i - 1]))
                if psize <= 2:
                    xbits = 3
                elif psize <= 4:
                    xbits = 2
                elif psize <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append((3, (psize, xbits), pal))
                xsize = (xsize + (1 << xbits) - 1) >> xbits

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("VP8L: invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):              # meta prefix image
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_image_stream(br, mw, mh, False)
        # group index packed in red<<8 | green
        meta = (((meta >> 8) & 0xFFFF)).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = _read_groups(br, cache_size, n_groups)

    out = np.zeros(xsize * h, dtype=np.uint32)
    npix = xsize * h
    i = 0
    while i < npix:
        if meta is not None:
            y, x = divmod(i, xsize)
            gidx = int(meta[y >> meta_bits, x >> meta_bits])
            g_t, r_t, b_t, a_t, d_t = groups[gidx]
        else:
            g_t, r_t, b_t, a_t, d_t = groups[0]
        s = _decode_sym(br, g_t)
        if s < 256:                           # literal
            red = _decode_sym(br, r_t)
            blue = _decode_sym(br, b_t)
            alpha = _decode_sym(br, a_t)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
            i += 1
        elif s < 256 + 24:                    # backward reference
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, _decode_sym(br, d_t))
            if dcode <= 120:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist > i or i + length > npix:
                raise ValueError("VP8L: backward reference out of "
                                 "range")
            for _ in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache_size:
                    cache[_cache_key(px, cache_bits)] = px
                i += 1
        else:                                 # color cache
            if not cache_size or s - 280 >= cache_size:
                raise ValueError("VP8L: cache reference without "
                                 "cache")
            px = cache[s - 280]
            out[i] = px
            i += 1
    img = out.reshape(h, xsize)
    if is_level0:
        for ttype, arg, data in reversed(transforms):
            img = _inverse_transform(img, ttype, arg, data, w, h)
    return img


def _add_pixels(a: int, b: int) -> int:
    """Per-channel modular byte addition of two ARGB words."""
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) | \
           (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)


def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _select(left: int, top: int, tl: int) -> int:
    """Spec Select: the row above moved TL -> TOP; if LEFT sits close
    to TL the same move is expected here, so predict TOP (ties -> TOP,
    the libwebp pa_minus_pb <= 0 branch); otherwise predict LEFT."""
    top_dist = abs(((top >> 24) & 255) - ((tl >> 24) & 255)) + \
        abs(((top >> 16) & 255) - ((tl >> 16) & 255)) + \
        abs(((top >> 8) & 255) - ((tl >> 8) & 255)) + \
        abs((top & 255) - (tl & 255))
    left_dist = abs(((left >> 24) & 255) - ((tl >> 24) & 255)) + \
        abs(((left >> 16) & 255) - ((tl >> 16) & 255)) + \
        abs(((left >> 8) & 255) - ((tl >> 8) & 255)) + \
        abs((left & 255) - (tl & 255))
    return top if left_dist <= top_dist else left


def _clamp_add_sub_full(a: int, b: int, c: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((a >> sh) & 255) + ((b >> sh) & 255) - ((c >> sh) & 255)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(a: int, b: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        av = (a >> sh) & 255
        bv = (b >> sh) & 255
        half = (av + bv) // 2
        v = half + (half - bv) // 2
        out |= max(0, min(255, v)) << sh
    return out


def _predict(mode: int, img, x: int, y: int, w: int) -> int:
    left = int(img[y, x - 1]) if x > 0 else \
        (int(img[y - 1, 0]) if y > 0 else 0xFF000000)
    if y == 0:
        top = tl = tr = left if x > 0 else 0xFF000000
    else:
        top = int(img[y - 1, x])
        tl = int(img[y - 1, x - 1]) if x > 0 else top
        # at the right edge TR wraps to the linear successor of the
        # top row's last pixel — the CURRENT row's first pixel
        # (already reconstructed in scan order)
        tr = int(img[y - 1, x + 1]) if x + 1 < w else int(img[y, 0])
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        return _select(left, top, tl)
    if mode == 12:
        return _clamp_add_sub_full(left, top, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), tl)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _inverse_transform(img, ttype, arg, data, w, h):
    if ttype == 2:                            # add green back
        g = (img >> 8) & 0xFF
        red = (((img >> 16) & 0xFF) + g) & 0xFF
        blue = ((img & 0xFF) + g) & 0xFF
        return (img & 0xFF00FF00) | (red << 16) | blue
    if ttype == 0:                            # predictor
        size_bits = arg
        modes = ((data >> 8) & 0xFF).astype(np.int64)
        out = img.astype(np.uint32).copy()
        # the image may still be PACKED (color-indexing with bundling
        # read earlier in the stream inverts later): loop the CURRENT
        # width, which is also what the tile map was sized to at parse
        cw = img.shape[1]
        for y in range(h):
            for x in range(cw):
                if x == 0 and y == 0:
                    mode = 0
                elif y == 0:
                    mode = 1
                elif x == 0:
                    mode = 2
                else:
                    mode = int(modes[y >> size_bits, x >> size_bits])
                pred = _predict(mode, out, x, y, cw)
                out[y, x] = _add_pixels(int(img[y, x]), pred)
        return out
    if ttype == 1:                            # color transform
        size_bits = arg
        out = img.astype(np.int64)
        # ColorCodeToMultipliers packing: green_to_red rides the
        # BLUE byte, green_to_blue the GREEN byte, red_to_blue the
        # RED byte of the tile pixel
        g2r = _to_signed(data & 0xFF)
        g2b = _to_signed((data >> 8) & 0xFF)
        r2b = _to_signed((data >> 16) & 0xFF)
        cw = img.shape[1]                     # see predictor note
        for y in range(h):
            ty = y >> size_bits
            for x in range(cw):
                tx = x >> size_bits
                px = int(out[y, x])
                green = (px >> 8) & 0xFF
                red = (px >> 16) & 0xFF
                blue = px & 0xFF
                red = (red + _delta(int(g2r[ty, tx]), green)) & 0xFF
                blue = (blue + _delta(int(g2b[ty, tx]), green)) & 0xFF
                blue = (blue + _delta(int(r2b[ty, tx]), red)) & 0xFF
                out[y, x] = (px & ~0xFF00FF) | (red << 16) | blue
        return out.astype(np.uint32)
    if ttype == 3:                            # color indexing
        psize, xbits = arg
        pal = data
        if xbits == 0:
            idx = (img >> 8) & 0xFF
            if int(idx.max(initial=0)) >= psize:
                raise ValueError("VP8L: palette index out of range")
            return pal[0, idx.astype(np.int64)]
        per = 1 << xbits
        bits = 8 >> xbits
        out = np.zeros((h, w), dtype=np.uint32)
        packed = ((img >> 8) & 0xFF).astype(np.int64)
        mask = (1 << bits) - 1
        for x in range(w):
            sx = x >> xbits
            shift = (x & (per - 1)) * bits
            idx = (packed[:, sx] >> shift) & mask
            if int(idx.max(initial=0)) >= psize:
                raise ValueError("VP8L: palette index out of range")
            out[:, x] = pal[0, idx]
        return out
    raise ValueError(f"VP8L: unknown transform {ttype}")


def _to_signed(arr):
    a = arr.astype(np.int64)
    return np.where(a >= 128, a - 256, a)


def _delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed 3.5 fixed-point multiply."""
    c_signed = c - 256 if c >= 128 else c
    return (t * c_signed) >> 5


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP decode -> (h, w, 3) uint8 RGB. Lossless (VP8L) decodes
    natively (full transform/LZ77/cache/meta grammar); lossy VP8 and
    animation raise NotImplementedError toward the PIL seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc in (b"VP8 ", b"VP8X", b"ANIM", b"ANMF"):
            raise NotImplementedError(
                "only LOSSLESS WebP (VP8L) decodes natively; lossy "
                "VP8 / extended / animated WebP route to PIL where "
                "installed")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no image chunk found")


def _decode_vp8l(body: bytes) -> np.ndarray:
    if not body or body[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _LsbReader(body)
    br.read(8)                                # signature
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)                                # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb = _decode_image_stream(br, w, h, True)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    out[..., 0] = (argb >> 16) & 0xFF
    out[..., 1] = (argb >> 8) & 0xFF
    out[..., 2] = argb & 0xFF
    return out


# --------------------------- encoder ---------------------------------


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, ln: int) -> None:
        """Huffman code bits go MSB-first into the LSB-first stream
        (the DEFLATE convention — raw fields and extra bits stay
        LSB-first via write())."""
        for i in range(ln - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _enc_table(lengths: list[int]) -> dict:
    """symbol -> (code, len) for the canonical assignment."""
    dec = _canonical(lengths)
    return {sym: (code, ln) for (ln, code), sym in dec.items()}


def _write_flat_code(bw: _LsbWriter, lengths: list[int]) -> None:
    """Emit a NORMAL (code-length-coded) prefix code whose symbols
    all share one length L, exercising the 16/17/18 repeat path: the
    code-length code carries {L: len 1, 16: len 2, 17/18 as needed}.
    For simplicity we emit the length symbol then rely on repeats."""
    used = sorted({ln for ln in lengths if ln})
    assert len(used) == 1, "flat writer handles one length"
    L = used[0]
    # code-length code: symbols L and 16 get lengths 1 and 2? A
    # 2-symbol canonical code needs lengths {1,1}; include 17 for
    # leading zero runs when the alphabet has gaps at the tail.
    clc_lengths = [0] * 19
    clc_lengths[L] = 1
    clc_lengths[16] = 2
    clc_lengths[17] = 2
    order = list(_CLC_ORDER)
    ncl = max(order.index(s) for s in (L, 16, 17)) + 1
    bw.write(0, 1)                            # not simple
    bw.write(ncl - 4, 4)
    for k in range(ncl):
        bw.write(clc_lengths[order[k]], 3)
    enc = _enc_table(clc_lengths)
    bw.write(0, 1)                            # no max_symbol
    n = len(lengths)
    i = 0
    while i < n:
        if lengths[i] == L:
            code, ln = enc[L]
            bw.write_code(code, ln)
            i += 1
            # follow with repeat-16 runs while more L's pend
            run = 0
            while i + run < n and lengths[i + run] == L:
                run += 1
            while run >= 3:
                take = min(run, 6)
                code, ln = enc[16]
                bw.write_code(code, ln)
                bw.write(take - 3, 2)
                i += take
                run -= take
        else:
            run = 0
            while i + run < n and lengths[i + run] == 0:
                run += 1
            if run >= 3:
                take = min(run, 10)
                code, ln = enc[17]
                bw.write_code(code, ln)
                bw.write(take - 3, 3)
                i += take
            else:
                raise ValueError("flat writer: isolated zero length")
    # (n reached exactly — VP8L stops at n symbols)


def _emit_prefix_value(bw: _LsbWriter, enc: dict, base_sym: int,
                       value: int) -> None:
    """Inverse of _prefix_value: emit prefix symbol + extra bits."""
    if value <= 4:
        code = value - 1
        extra_bits = 0
        extra = 0
    else:
        v = value - 1
        extra_bits = v.bit_length() - 2
        top = v >> extra_bits                 # 2 or 3
        code = 2 * extra_bits + 2 + (top & 1)
        extra = v & ((1 << extra_bits) - 1)
    c, ln = enc[base_sym + code]
    bw.write_code(c, ln)
    if extra_bits:
        bw.write(extra, extra_bits)


def encode_vp8l(arr: np.ndarray, subtract_green: bool = False,
                cache_bits: int = 0, rle: bool = False) -> bytes:
    """Deterministic VP8L encode of uint8 (h, w) gray or (h, w, 3)
    RGB — the test-synthesis half; decode_webp(encode_vp8l(x))
    reproduces x exactly. All prefix codes are flat 9-bit (green
    channel) / 8-bit (r/b/a) / 6-bit (distance) NORMAL codes written
    through the code-length code (so the repeat-16/17 paths decode),
    optionally behind the SUBTRACT_GREEN transform, a color cache,
    and run-length LZ77 references (dist 1 — the 2D map's first
    entry)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("encode_vp8l expects uint8 (h,w[,3])")
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    h, w = a.shape[:2]
    red = a[..., 0].astype(np.int64)
    green = a[..., 1].astype(np.int64)
    blue = a[..., 2].astype(np.int64)
    if subtract_green:
        red = (red - green) & 0xFF
        blue = (blue - green) & 0xFF
    argb = ((0xFF << 24) | (red << 16) | (green << 8)
            | blue).reshape(-1).astype(np.uint32)

    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)                            # no alpha hint
    bw.write(0, 3)                            # version
    if subtract_green:
        bw.write(1, 1)                        # a transform follows
        bw.write(2, 2)                        # SUBTRACT_GREEN
    bw.write(0, 1)                            # no more transforms
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)                            # no meta prefix image

    g_alpha = 256 + 24 + cache_size
    g_lengths = [9] * g_alpha + [0] * 0
    # pad the flat code to a power-of-two-friendly size: 9-bit flat
    # canonical over g_alpha symbols is valid for g_alpha <= 512
    assert g_alpha <= 512
    byte_lengths = [8] * 256
    d_lengths = [6] * 40
    _write_flat_code(bw, g_lengths)
    for _ in range(3):                        # red, blue, alpha
        _write_flat_code(bw, byte_lengths)
    _write_flat_code(bw, d_lengths)
    g_enc = _enc_table(g_lengths)
    b_enc = _enc_table(byte_lengths)
    d_enc = _enc_table(d_lengths)

    cache = [0] * cache_size
    npix = h * w
    i = 0
    while i < npix:
        px = int(argb[i])
        if rle and i > 0 and px == int(argb[i - 1]):
            run = 1
            while i + run < npix and int(argb[i + run]) == px \
                    and run < 4096:
                run += 1
            # length via the green code's 24 length slots, then
            # linear distance 1 (dcode 121 — past the 2D map)
            _emit_prefix_value(bw, g_enc, 256, run)
            _emit_prefix_value(bw, d_enc, 0, 121)
            if cache_size:
                cache[_cache_key(px, cache_bits)] = px
            i += run
            continue
        if cache_size:
            key = _cache_key(px, cache_bits)
            if cache[key] == px and i > 0:
                c, ln = g_enc[280 + key]
                bw.write_code(c, ln)
                i += 1
                continue
        c, ln = g_enc[(px >> 8) & 0xFF]       # green
        bw.write_code(c, ln)
        c, ln = b_enc[(px >> 16) & 0xFF]      # red
        bw.write_code(c, ln)
        c, ln = b_enc[px & 0xFF]              # blue
        bw.write_code(c, ln)
        c, ln = b_enc[(px >> 24) & 0xFF]      # alpha
        bw.write_code(c, ln)
        if cache_size:
            cache[_cache_key(px, cache_bits)] = px
        i += 1

    body = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
