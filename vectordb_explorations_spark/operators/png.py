"""Pure-NumPy + stdlib-zlib PNG codec (round-14 follow-on to the
baseline JPEG codec — r13 verdict "What's missing" item 2).

PNG is DEFLATE (RFC 1951) under a chunked container (RFC 2083 / the
W3C PNG spec); CPython ships DEFLATE as ``zlib``, so a native decoder
needs no codec library at all: chunk walk (IHDR/PLTE/IDAT/IEND), one
``zlib.decompress``, and the five scanline filters (none/sub/up/
average/Paeth) unfiltered row by row. Supported: 8-bit depth, color
types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha) and 6 (RGBA),
non-interlaced. Alpha is dropped (the PIL path's ``convert("RGB")``
contract); palette resolves through PLTE. Adam7 interlace and 1/2/4/
16-bit depths raise NotImplementedError so decode_image's seam can
route to PIL where installed.

``encode_png`` writes color type 0/2, filter 0 rows — PNG is lossless,
so round-trip tests assert EXACT equality (decode(encode(x)) == x),
a sharper pin than the JPEG codec's error bounds. Decoded arrays are
deterministic; encoded bytes depend on the zlib version's compressor
choices, so tests pin the decode side, not the payload bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type (at 8-bit depth)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters -> (h, w*bpp) recon bytes.
    ``bpp`` is bytes per pixel. Sub/average/Paeth recursions are
    sequential by definition; rows are numpy everywhere the spec
    allows (none/up wholesale, sub via per-channel cumsum)."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG: IDAT shorter than the scanline grid")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:                       # None
            recon = line
        elif ftype == 1:                     # Sub
            recon = (np.cumsum(line.reshape(w, bpp).astype(np.int64),
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
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG decode -> uint8 (h, w) grayscale or (h, w, 3) RGB — the
    same shape contract as the other native image paths."""
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
            if interlace != 0:
                raise NotImplementedError(
                    "PNG: Adam7 interlace not supported natively — "
                    "PIL handles it where installed")
            if depth != 8:
                raise NotImplementedError(
                    f"PNG: bit depth {depth} not supported natively "
                    f"(8-bit only) — PIL handles it where installed")
            if color not in _CHANNELS:
                raise ValueError(f"PNG: invalid color type {color}")
            ihdr = (w, h, color)
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
    w, h, color = ihdr
    bpp = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    recon = _unfilter(raw, h, w, bpp)
    px = recon.reshape(h, w, bpp)
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


def encode_png(arr: np.ndarray) -> bytes:
    """Lossless PNG encode of uint8 (h, w) grayscale or (h, w, 3) RGB
    (filter 0 scanlines, one zlib stream) — the test-synthesis half;
    ``decode_png(encode_png(x))`` reproduces ``x`` exactly."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise ValueError("encode_png expects uint8 (h,w[,3])")
    gray = a.ndim == 2
    h, w = a.shape[:2]
    color = 0 if gray else 2
    body = a.reshape(h, -1)
    raw = bytearray()
    for y in range(h):
        raw.append(0)                        # filter type None
        raw += body[y].tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + chunk(b"IEND", b""))
