"""Pure-Python/NumPy FLAC codec (round-14 follow-on: the compressed-
AUDIO analog of the native JPEG/PNG image codecs).

FLAC (xiph.org's free lossless audio codec; RFC 9639) is linear
prediction + Rice-coded residuals under a framed container — no
entropy tables to ship and nothing beyond integer arithmetic, so a
native decoder needs zero codec libraries. The decoder covers the
full frame grammar: STREAMINFO metadata walk, frame headers (all
block-size/sample-rate/sample-size codes, UTF-8-coded frame numbers,
CRC-8 verified), every subframe type (CONSTANT, VERBATIM, FIXED
orders 0-4, LPC orders 1-32 with quantized-coefficient shift),
wasted-bits unary prefixes, both Rice residual methods (4- and 5-bit
parameters) with partition orders and the raw-bits escape, all four
stereo decorrelations (independent, left/side, right/side, mid/side
— side channels carry the spec's +1 bit), and the frame CRC-16.
Malformed payloads raise ValueError; the grammar has no
NotImplementedError seam.

Sample contract matches the soundfile path in
``operators/multimodal.decode_audio``: always ``(n_samples,
n_channels) int16`` — bit depths below 16 shift left into the int16
range, depths above 16 fold to the top 16 bits — plus the sample
rate. FLAC is lossless, so 16-bit round trips pin EXACT equality.

``encode_flac`` is the deterministic test-synthesis half (the
P6->BMP / JPEG / PNG precedent): verbatim, constant, fixed-predictor
(orders 0-4, Rice residuals with selectable partition order), and
explicit-coefficient LPC subframes, with any stereo decorrelation.
Encoded bytes are deterministic (no library compressor in the loop),
so codec-pair tests may pin payload hashes as well as decodes.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"fLaC"

_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (whole-frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000
                   else crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader over a bytes buffer."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos          # byte offset
        self.bit = 0            # bits consumed within buf[pos]

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC: bitstream truncated")
            byte = self.buf[self.pos]
            avail = 8 - self.bit
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.pos += 1
                self.bit = 0
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0 bits up to the terminating 1 bit."""
        q = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC: bitstream truncated in unary")
            rem = self.buf[self.pos] & ((1 << (8 - self.bit)) - 1)
            if rem == 0:
                q += 8 - self.bit
                self.pos += 1
                self.bit = 0
                continue
            zeros = (8 - self.bit) - rem.bit_length()
            q += zeros
            self.bit += zeros + 1
            if self.bit == 8:
                self.pos += 1
                self.bit = 0
            return q

    def align(self) -> None:
        if self.bit:
            self.pos += 1
            self.bit = 0


class _BitWriter:
    """MSB-first bit writer (encoder half)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style coded number (extended to 36-bit values)."""
    first = br.read(8)
    if first < 0x80:
        return first
    ones = 0
    while (first << ones) & 0x80:
        ones += 1
    if ones < 2 or ones > 7:
        raise ValueError("FLAC: malformed UTF-8 coded number")
    v = first & (0x7F >> ones)
    for _ in range(ones - 1):
        b = br.read(8)
        if b >> 6 != 0b10:
            raise ValueError("FLAC: malformed UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_utf8_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    payload_bits = v.bit_length()
    for nbytes in range(2, 8):
        if payload_bits <= 5 * nbytes + 1:
            break
    # leading byte: nbytes one-bits, a zero, then the top 7-nbytes
    # payload bits (shift by 8-nbytes, NOT 7-nbytes — the off-by-one
    # emitted an extra one-bit and collided with the terminator,
    # malforming every coded number >= 128)
    prefix = (0xFF << (8 - nbytes)) & 0xFF
    bw.write(prefix | (v >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _decode_residual(br: _BitReader, block_size: int,
                     pred_order: int) -> list[int]:
    """Rice-coded residual section (both methods, partitioned, with
    the raw-bits escape)."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if block_size % nparts or (block_size >> part_order) <= pred_order:
        raise ValueError("FLAC: invalid residual partition order")
    psize = block_size >> part_order
    out: list[int] = []
    for p in range(nparts):
        cnt = psize - (pred_order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * cnt)
            else:
                out.extend(br.read_signed(raw) for _ in range(cnt))
        else:
            for _ in range(cnt):
                u = (br.unary() << param) | br.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _predict(warmup: list[int], residual: list[int],
             coefs: list[int], shift: int) -> list[int]:
    """Integer LPC reconstruction: s[i] = r[i] + (sum c[j]*s[i-1-j])
    >> shift (arithmetic shift; fixed predictors are shift-0 LPC)."""
    s = list(warmup)
    order = len(coefs)
    for r in residual:
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * s[-1 - j]
        s.append(r + (acc >> shift))
    return s


def _decode_subframe(br: _BitReader, block_size: int,
                     bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if stype == 0:                            # CONSTANT
        v = br.read_signed(eff)
        s = [v] * block_size
    elif stype == 1:                          # VERBATIM
        s = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:                    # FIXED order 0-4
        order = stype - 8
        warmup = [br.read_signed(eff) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        s = _predict(warmup, res, _FIXED_COEFS[order], 0)
    elif stype >= 32:                         # LPC order 1-32
        order = stype - 31
        warmup = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        s = _predict(warmup, res, coefs, shift)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def _decode_frame(payload: bytes, pos: int, info: dict
                  ) -> tuple[np.ndarray, int]:
    br = _BitReader(payload, pos)
    if br.read(14) != 0b11111111111110:
        raise ValueError("FLAC: lost frame sync")
    br.read(1)                                # reserved
    br.read(1)                                # blocking strategy
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan_code = br.read(4)
    size_code = br.read(3)
    br.read(1)                                # reserved
    _read_utf8_number(br)                     # frame/sample number
    if bs_code == 0:
        raise ValueError("FLAC: reserved block size code")
    elif bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = _BLOCKSIZE_TABLE[bs_code]
    if rate_code == 12:
        br.read(8)
    elif rate_code in (13, 14):
        br.read(16)
    elif rate_code == 15:
        raise ValueError("FLAC: invalid sample rate code")
    bps = (info["bps"] if size_code == 0
           else _SAMPLE_SIZE_TABLE.get(size_code))
    if bps is None:
        raise ValueError("FLAC: reserved sample size code")
    header_end = br.pos        # CRC-8 covers [pos, header_end)
    if br.bit:
        raise ValueError("FLAC: frame header misaligned")
    if _crc8(payload[pos:header_end]) != br.read(8):
        raise ValueError("FLAC: frame header CRC-8 mismatch")

    if chan_code < 8:
        nch = chan_code + 1
        chans = [_decode_subframe(br, block_size, bps)
                 for _ in range(nch)]
    elif chan_code in (8, 9, 10):             # stereo decorrelation
        nch = 2
        extra = (0, 1) if chan_code == 8 else \
                (1, 0) if chan_code == 9 else (0, 1)
        a = _decode_subframe(br, block_size, bps + extra[0])
        b = _decode_subframe(br, block_size, bps + extra[1])
        if chan_code == 8:                    # left/side
            chans = [a, [l - s for l, s in zip(a, b)]]
        elif chan_code == 9:                  # right/side
            chans = [[r + s for s, r in zip(a, b)], b]
        else:                                 # mid/side
            left, right = [], []
            for m, s in zip(a, b):
                mm = (m << 1) | (s & 1)
                left.append((mm + s) >> 1)
                right.append((mm - s) >> 1)
            chans = [left, right]
    else:
        raise ValueError(f"FLAC: reserved channel assignment "
                         f"{chan_code}")
    br.align()
    crc_end = br.pos
    if _crc16(payload[pos:crc_end]) != br.read(16):
        raise ValueError("FLAC: frame CRC-16 mismatch")

    block = np.array(chans, dtype=np.int64).T   # (block_size, nch)
    if bps < 16:
        block <<= 16 - bps
    elif bps > 16:
        block >>= bps - 16
    return block.astype(np.int16), br.pos


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC decode -> ((n_samples, n_channels) int16, sample_rate) —
    the same contract as decode_audio's soundfile seam (sub-16-bit
    depths shift left into int16, >16-bit fold to the top 16 bits)."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a FLAC payload (bad magic)")
    pos = 4
    info = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        size = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + size]
        if hdr & 0x7F == 0:                   # STREAMINFO
            if len(body) < 34:
                raise ValueError("FLAC: truncated STREAMINFO")
            # bytes 10-17: rate(20) | channels-1(3) | bps-1(5) |
            # total-samples(36) — one big-endian 64-bit region
            packed = int.from_bytes(body[10:18], "big")
            info = {"rate": packed >> 44,
                    "channels": ((packed >> 41) & 0x7) + 1,
                    "bps": ((packed >> 36) & 0x1F) + 1,
                    "total": packed & ((1 << 36) - 1)}
        pos += 4 + size
        if hdr & 0x80:                        # last metadata block
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    blocks = []
    got = 0
    while pos < len(payload) and (info["total"] == 0
                                  or got < info["total"]):
        block, pos = _decode_frame(payload, pos, info)
        blocks.append(block)
        got += len(block)
    if not blocks:
        raise ValueError("FLAC: no audio frames")
    samples = np.concatenate(blocks)
    if info["total"]:
        samples = samples[:info["total"]]
    return samples, info["rate"]


# --------------------------- encoder ---------------------------------


def _encode_residual(bw: _BitWriter, res: list[int], order: int,
                     part_order: int) -> None:
    block_size = len(res) + order
    nparts = 1 << part_order
    psize = block_size >> part_order
    bw.write(0, 2)                            # 4-bit Rice method
    bw.write(part_order, 4)
    idx = 0
    for p in range(nparts):
        cnt = psize - (order if p == 0 else 0)
        chunk = res[idx:idx + cnt]
        idx += cnt
        zig = [((v << 1) if v >= 0 else ((-v << 1) - 1))
               for v in chunk]
        mx = max(zig, default=0)
        # param chosen so every quotient is <= 1 (short unary runs);
        # residuals too wide for that take the raw-bits escape
        param = max(0, mx.bit_length() - 1)
        if param >= 15:
            raw = max((max(abs(v) for v in chunk).bit_length() + 1
                       if chunk else 1), 1)
            if raw > 31:
                raise ValueError("encode_flac: residual exceeds 31 bits")
            bw.write(15, 4)                   # escape code
            bw.write(raw, 5)
            for v in chunk:
                bw.write(v, raw)
        else:
            bw.write(param, 4)
            for u in zig:
                bw.write_unary(u >> param)
                bw.write(u, param)


def _encode_subframe(bw: _BitWriter, s: list[int], bps: int,
                     mode: str, part_order: int,
                     lpc: tuple[list[int], int] | None) -> None:
    if mode == "constant":
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(s[0], bps)
        return
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write(v, bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        coefs, shift = _FIXED_COEFS[order], 0
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)
    elif mode == "lpc":
        coefs, shift = lpc
        order = len(coefs)
        bw.write(0, 1)
        bw.write(31 + order, 6)
        bw.write(0, 1)
    else:
        raise ValueError(f"encode_flac: unknown mode {mode!r}")
    for v in s[:order]:
        bw.write(v, bps)
    if mode == "lpc":
        precision = max(max(abs(c) for c in coefs).bit_length() + 1, 2)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, precision)
    res = []
    for i in range(order, len(s)):
        acc = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
        res.append(s[i] - (acc >> shift))
    _encode_residual(bw, res, order, part_order)


def encode_flac(samples: np.ndarray, rate: int, bps: int = 16,
                block_size: int = 4096, mode: str = "fixed2",
                stereo_mode: str = "independent",
                part_order: int = 0) -> bytes:
    """Deterministic FLAC encode of int samples ((n,) or (n, ch)) —
    the test-synthesis half; ``decode_flac(encode_flac(x, r))``
    reproduces 16-bit ``x`` exactly. ``mode`` selects the subframe
    type per channel: 'constant' (all-equal blocks only), 'verbatim',
    'fixed0'..'fixed4', or 'lpc' via ``encode_flac_lpc``'s wrapper
    arguments; ``stereo_mode`` in {'independent', 'left_side',
    'right_side', 'mid_side'} exercises the decorrelated layouts;
    ``part_order`` sets the Rice partition order (block_size must
    divide)."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    if n < 1:
        raise ValueError("encode_flac: need at least one sample")
    if not 1 <= nch <= 8:
        raise ValueError("encode_flac: 1-8 channels")
    if nch != 2 and stereo_mode != "independent":
        raise ValueError("stereo modes need exactly 2 channels")
    if rate <= 0 or rate >= 1 << 16:
        raise ValueError("encode_flac writes 16-bit Hz rates")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if a.min(initial=0) < lo or a.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")

    lpc_coefs_shift = None
    if mode == "lpc":
        # 2a - b expressed through the LPC path with a live shift:
        # coefs [4, -2] >> 1 — exercises precision/shift/coef reads
        # while staying exactly invertible.
        lpc_coefs_shift = ([4, -2], 1)
        if n < 2 or block_size < 3:
            raise ValueError("lpc mode needs order-2 warmup")

    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", min(block_size, n),
                              min(block_size, n))
    streaminfo += b"\x00\x00\x00" * 2         # min/max frame size: unknown
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    streaminfo += packed.to_bytes(8, "big")
    streaminfo += b"\x00" * 16                # md5: unset
    out = bytearray(_MAGIC)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    size_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    chan_code = {"independent": nch - 1, "left_side": 8,
                 "right_side": 9, "mid_side": 10}[stereo_mode]
    frame_no = 0
    for start in range(0, n, block_size):
        blk = a[start:start + block_size]
        bs = len(blk)
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)                        # reserved
        bw.write(0, 1)                        # fixed blocking strategy
        bw.write(7, 4)                        # 16-bit block size follows
        bw.write(13, 4)                       # 16-bit Hz rate follows
        bw.write(chan_code, 4)
        bw.write(size_code, 3)
        bw.write(0, 1)                        # reserved
        _write_utf8_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.write(rate, 16)
        bw.align()
        header = bw.bytes()
        bw = _BitWriter()
        for b in header:
            bw.write(b, 8)
        bw.write(_crc8(header), 8)

        if stereo_mode == "independent":
            chan_data = [(list(blk[:, c]), bps) for c in range(nch)]
        else:
            left, right = list(blk[:, 0]), list(blk[:, 1])
            side = [l - r for l, r in zip(left, right)]
            if stereo_mode == "left_side":
                chan_data = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                chan_data = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                chan_data = [(mid, bps), (side, bps + 1)]
        for s, cbps in chan_data:
            cmode = mode
            if cmode == "constant" and len(set(s)) > 1:
                raise ValueError("constant mode needs constant blocks")
            order = (int(cmode[-1]) if cmode.startswith("fixed")
                     else 2 if cmode == "lpc" else 0)
            if cmode not in ("constant", "verbatim") and \
                    (bs <= order or (bs >> part_order) <= order
                     or bs % (1 << part_order)):
                cmode = "verbatim"            # short tail block
            _encode_subframe(bw, [int(v) for v in s], cbps, cmode,
                             part_order if cmode not in
                             ("constant", "verbatim") else 0,
                             lpc_coefs_shift)
        bw.align()
        frame = bw.bytes()
        bw2 = _BitWriter()
        for b in frame:
            bw2.write(b, 8)
        bw2.write(_crc16(frame), 16)
        out += bw2.bytes()
        frame_no += 1
    return bytes(out)
