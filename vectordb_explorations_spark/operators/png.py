"""Pure-NumPy + stdlib-zlib PNG codec (round-14 follow-on to the
baseline JPEG codec — r13 verdict "What's missing" item 2).

PNG is DEFLATE (RFC 1951) under a chunked container (RFC 2083 / the
W3C PNG spec); CPython ships DEFLATE as ``zlib``, so a native decoder
needs no codec library at all: chunk walk (IHDR/PLTE/IDAT/IEND), one
``zlib.decompress``, and the five scanline filters (none/sub/up/
average/Paeth) unfiltered row by row. Coverage is the full static
spec: bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA), and BOTH interlace methods
(null and Adam7 — seven filtered sub-images sharing one zlib stream).
Alpha is dropped (the PIL path's ``convert("RGB")`` contract); palette
resolves through PLTE; 16-bit samples fold to their high byte (the
``I;16 -> L`` contract); sub-8-bit gray scales by 255/(2^d - 1) so
white is white at every depth. Nothing in the PNG grammar raises
NotImplementedError anymore — malformed payloads raise ValueError.

``encode_png`` writes gray/RGB at depth 8 or 16 (uint16 input selects
16-bit), sub-8-bit grayscale via ``depth=``, and Adam7 via
``interlace=True`` — PNG is lossless, so round-trip tests assert EXACT
equality (decode(encode(x)) == x), a sharper pin than the JPEG codec's
error bounds. Decoded arrays are deterministic; encoded bytes depend
on the zlib version's compressor choices, so tests pin the decode
side, not the payload bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# legal bit depths per color type (PNG spec table 11.1)
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
           4: (8, 16), 6: (8, 16)}

# Adam7 pass grid: (x0, y0, dx, dy) per pass, spec order
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _unfilter(raw: bytes, pos: int, h: int, stride: int,
              bpp: int) -> tuple[np.ndarray, int]:
    """Reverse the per-scanline filters for one (sub-)image of ``h``
    rows of ``stride`` bytes starting at ``raw[pos]`` -> ((h, stride)
    recon bytes, next offset). ``bpp`` is the filter's left-neighbor
    distance in bytes (max(1, channels*depth/8)). Sub/average/Paeth
    recursions are sequential by definition; rows are numpy everywhere
    the spec allows (none/up wholesale, sub via per-channel cumsum)."""
    if len(raw) - pos < h * (stride + 1):
        raise ValueError("PNG: IDAT shorter than the scanline grid")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:                       # None
            recon = line
        elif ftype == 1:                     # Sub
            recon = (np.cumsum(line.reshape(-1, bpp).astype(np.int64),
                               axis=0)
                     % 256).astype(np.uint8).reshape(stride)
        elif ftype == 2:                     # Up
            recon = line + prev
        elif ftype == 3:                     # Average
            recon = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(recon[i - bpp]) if i >= bpp else 0
                recon[i] = (int(line[i])
                            + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:                     # Paeth
            recon = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                recon[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = recon
        prev = recon
    return out, pos


def _extract_samples(recon: np.ndarray, pw: int, channels: int,
                     depth: int) -> np.ndarray:
    """Recon bytes (h, stride) -> raw sample values (h, pw, channels):
    uint16 at depth 16 (big-endian pairs), uint8 otherwise (sub-byte
    depths unpack MSB-first per spec; trailing pad bits dropped)."""
    h = recon.shape[0]
    if depth == 16:
        u = recon.reshape(h, pw * channels, 2).astype(np.uint16)
        return ((u[..., 0] << 8) | u[..., 1]).reshape(h, pw, channels)
    if depth == 8:
        return recon.reshape(h, pw, channels)
    bits = np.unpackbits(recon, axis=1)
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (vals * weights).sum(axis=2).astype(np.uint8)
    return samples[:, :pw * channels].reshape(h, pw, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG decode -> uint8 (h, w) grayscale or (h, w, 3) RGB — the
    same shape contract as the other native image paths. Full static
    coverage: depths 1/2/4/8/16, all five color types, null and Adam7
    interlacing."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length                   # skip CRC
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if comp != 0 or filt != 0:
                raise ValueError("PNG: unknown compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"PNG: unknown interlace method "
                                 f"{interlace}")
            if color not in _CHANNELS:
                raise ValueError(f"PNG: invalid color type {color}")
            if depth not in _DEPTHS[color]:
                raise ValueError(f"PNG: bit depth {depth} is illegal "
                                 f"for color type {color}")
            ihdr = (w, h, depth, color, interlace)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    if not idat:
        raise ValueError("PNG: missing IDAT")
    w, h, depth, color, interlace = ihdr
    channels = _CHANNELS[color]
    bpp = max(1, channels * depth // 8)
    raw = zlib.decompress(bytes(idat))

    grid = _ADAM7 if interlace == 1 else ((0, 0, 1, 1),)
    img = np.zeros((h, w, channels),
                   dtype=np.uint16 if depth == 16 else np.uint8)
    off = 0
    for x0, y0, dx, dy in grid:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:               # empty pass: no scanlines
            continue
        stride = (pw * channels * depth + 7) // 8
        recon, off = _unfilter(raw, off, ph, stride, bpp)
        img[y0::dy, x0::dx] = _extract_samples(recon, pw, channels,
                                               depth)

    if depth == 16:                          # high byte (I;16 -> L)
        px = (img >> 8).astype(np.uint8)
    elif depth < 8 and color == 0:           # scale so white is white
        px = (img * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        px = img.astype(np.uint8)
    if color == 0:
        return px.reshape(h, w).copy()
    if color == 2:
        return px.copy()
    if color == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = px.reshape(h, w)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG: palette index out of range")
        return plte[idx]
    if color == 4:                           # gray + alpha -> gray
        return px[..., 0].copy()
    return px[..., :3].copy()                # RGBA -> RGB


def _pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """Sample grid (h, w*channels) -> filter-0 scanlines at ``depth``
    (big-endian 16-bit pairs; MSB-first sub-byte packing)."""
    h = samples.shape[0]
    raw = bytearray()
    for y in range(h):
        raw.append(0)                        # filter type None
        row = samples[y]
        if depth == 16:
            raw += row.astype(">u2").tobytes()
        elif depth == 8:
            raw += row.astype(np.uint8).tobytes()
        else:
            bits = ((row.astype(np.uint8)[:, None]
                     >> np.arange(depth - 1, -1, -1)) & 1)
            raw += np.packbits(bits.reshape(-1)).tobytes()
    return bytes(raw)


def encode_png(arr: np.ndarray, interlace: bool = False,
               depth: int | None = None) -> bytes:
    """Lossless PNG encode of (h, w) grayscale or (h, w, 3) RGB
    (filter 0 scanlines, one zlib stream) — the test-synthesis half;
    ``decode_png(encode_png(x))`` reproduces ``x`` exactly. uint8
    input writes depth 8, uint16 writes depth 16 (decode folds to the
    high byte); ``depth`` of 1/2/4 packs grayscale sample values
    (< 2^depth — decode scales them by 255/(2^depth - 1));
    ``interlace=True`` writes the seven Adam7 passes."""
    a = np.asarray(arr)
    if a.dtype not in (np.uint8, np.uint16) or a.ndim not in (2, 3):
        raise ValueError("encode_png expects uint8/uint16 (h,w[,3])")
    if depth is None:
        depth = 16 if a.dtype == np.uint16 else 8
    gray = a.ndim == 2
    if depth < 8 and (not gray or int(a.max(initial=0)) >= 1 << depth):
        raise ValueError(f"depth={depth} needs grayscale samples "
                         f"< {1 << depth}")
    if depth == 16 and a.dtype != np.uint16:
        raise ValueError("depth=16 needs uint16 input")
    if depth != 16 and a.dtype == np.uint16:
        raise ValueError(
            "uint16 input encodes at depth 16 — an explicit smaller "
            "depth would silently truncate to the low byte")
    h, w = a.shape[:2]
    channels = 1 if gray else 3
    color = 0 if gray else 2
    flat = a.reshape(h, w, channels)

    raw = bytearray()
    grid = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in grid:
        sub = flat[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += _pack_rows(sub.reshape(sub.shape[0], -1), depth)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    return (_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + chunk(b"IEND", b""))
