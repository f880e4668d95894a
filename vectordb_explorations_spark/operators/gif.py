"""Native GIF codec (GIF87a/GIF89a) — pure Python/NumPy, no codec
libraries.

GIF is the remaining ubiquitous legacy raster format after PNG/JPEG/BMP
went native, and the ONLY widely-crawled ANIMATION container a
zero-dependency environment can fully carry: palette frames compressed
with GIF-variant LZW — entirely algorithmic (no probability or
transform tables), so a from-the-spec implementation is exact. This
gives the multimodal family real multi-frame decode (frame sampling
over actual animation payloads, not synthesized fakes).

Decoder coverage (the full static+animation grammar):
- logical screen descriptor, global/local color tables, background;
- image descriptors at arbitrary offsets with per-frame palettes;
- interlaced row order (the four-pass 8/8/4/2 schedule);
- LZW with dynamic code widths (3..12 bits, LSB-first), CLEAR/EOI,
  the KwKwK self-reference case, deferred-clear streams (full table
  without reset), and sub-block reassembly;
- GIF89a extensions: Graphic Control (transparency index, disposal
  methods 0/1 draw-over, 2 restore-background, 3 restore-previous,
  delays), and skip-tolerant handling of comment/plain-text/
  application blocks (NETSCAPE loops etc.);
- compositing contract (documented, deterministic): the canvas starts
  as the background color (black if the background index has no
  table entry); transparent pixels leave the canvas unchanged;
  ``decode_gif_frames`` returns one FULL-CANVAS RGB array per frame
  after compositing.

The deterministic encoder (``encode_gif``) writes single- or
multi-frame GIF89a with optional interlace, per-frame delay,
disposal, and transparency — giflib's emission discipline (grow the
code width AFTER writing a code once the next free slot reaches
2^width; emit CLEAR before the table would pass 4095) so streams are
spec-shaped, and the codec pair round-trips bit-exactly for any
<=256-color input. No library compressor anywhere in the loop.

Scale shape: decode is per-payload work inside Arrow-batched stages
(multimodal.decode_image / frame sampling) — embarrassingly parallel
over a binary column; nothing here touches the driver.

Cites hnsw.cc: none — north-star multimodal extension (SURVEY §2.2).
"""

from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF variant)
# ---------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader over the reassembled sub-block data."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        d, p = self.data, self.pos
        byte, bit = p >> 3, p & 7
        acc, got = 0, 0
        while got < n:
            if byte >= len(d):
                raise ValueError("GIF LZW stream truncated")
            acc |= (d[byte] >> bit) << got
            got += 8 - bit
            bit = 0
            byte += 1
        self.pos = p + n
        return acc & ((1 << n) - 1)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int
                ) -> np.ndarray:
    """GIF LZW -> index array of exactly n_pixels entries. Handles
    dynamic widths, CLEAR resets, the KwKwK case, and deferred clear
    (a full 4096-entry table keeps emitting 12-bit codes)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def fresh():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = fresh()
    prev: bytes | None = None
    while n_out < n_pixels:
        code = br.read(width)
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):                 # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW: code beyond table")
        take = min(len(entry), n_pixels - n_out)
        out[n_out:n_out + take] = np.frombuffer(entry[:take],
                                                dtype=np.uint8)
        n_out += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError(
            f"GIF LZW ended early: {n_out}/{n_pixels} pixels")
    return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.bytes.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.bytes.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.bytes)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encoder with giflib's emission discipline: a code is
    written at the CURRENT width, then the width grows if the next
    free slot has reached 2^width — the exact mirror of the decoder's
    grow-after-add rule; CLEAR is emitted before the table would pass
    4095 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    state = {"width": min_code_size + 1, "next": eoi + 1}

    def emit(code: int) -> None:
        bw.write(code, state["width"])
        if state["next"] >= (1 << state["width"]) and state["width"] < 12:
            state["width"] += 1

    table: dict[tuple[int, int], int] = {}
    emit(clear)
    seq = indices.tolist()
    crnt = seq[0]
    for px in seq[1:]:
        key = (crnt, px)
        nxt = table.get(key)
        if nxt is not None:
            crnt = nxt
            continue
        emit(crnt)
        if state["next"] >= 4095:
            emit(clear)
            table.clear()
            state["width"] = min_code_size + 1
            state["next"] = eoi + 1
        else:
            table[key] = state["next"]
            state["next"] += 1
        crnt = px
    emit(crnt)
    emit(eoi)
    return bw.flush()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_color_table(payload: bytes, pos: int, flags: int
                      ) -> tuple[np.ndarray | None, int]:
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        table = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                              offset=pos).reshape(n, 3).copy()
        return table, pos + 3 * n
    return None, pos


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("GIF truncated inside sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def decode_gif_frames(payload: bytes
                      ) -> tuple[list[np.ndarray], list[int]]:
    """Full animation decode: ([frame_rgb...], [delay_cs...]) — one
    composited FULL-CANVAS (H, W, 3) uint8 array per image descriptor,
    with GIF89a disposal and transparency applied (see module
    docstring for the canvas contract)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    W = int.from_bytes(payload[6:8], "little")
    H = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct, pos = _read_color_table(payload, pos, flags)
    if gct is not None and bg_index < len(gct):
        bg_color = gct[bg_index]
    else:
        bg_color = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_color, (H, W, 3)).astype(np.uint8).copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image descriptor
    gce = {"transparent": None, "disposal": 0, "delay": 0}
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                         # trailer
            break
        if block == 0x21:                         # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:                     # graphic control
                sz = payload[pos]
                body = payload[pos + 1:pos + 1 + sz]
                pos = _skip_sub_blocks(payload, pos)
                packed = body[0]
                gce = {
                    "disposal": (packed >> 2) & 0x07,
                    "delay": int.from_bytes(body[1:3], "little"),
                    "transparent": body[3] if packed & 0x01 else None,
                }
            else:                                 # comment/app/plaintext
                pos = _skip_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left = int.from_bytes(payload[pos:pos + 2], "little")
        top = int.from_bytes(payload[pos + 2:pos + 4], "little")
        w = int.from_bytes(payload[pos + 4:pos + 6], "little")
        h = int.from_bytes(payload[pos + 6:pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        lct, pos = _read_color_table(payload, pos, iflags)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF frame has no color table")
        mcs = payload[pos]
        pos += 1
        start = pos
        pos = _skip_sub_blocks(payload, pos)
        raw = bytearray()
        i = start
        while True:
            n = payload[i]
            i += 1
            if n == 0:
                break
            raw += payload[i:i + n]
            i += n
        idx = _lzw_decode(bytes(raw), mcs, w * h)
        if iflags & 0x40:                          # interlaced
            # inv[canvas_row] = stored-row index (pass order 8/8/4/2)
            inv = np.empty(h, dtype=np.int64)
            r = 0
            for start_row, step in _INTERLACE_PASSES:
                for y in range(start_row, h, step):
                    inv[y] = r
                    r += 1
            idx = idx.reshape(h, w)[inv, :]
        else:
            idx = idx.reshape(h, w)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("GIF pixel index beyond color table")
        prev_canvas = canvas.copy() if gce["disposal"] == 3 else None
        region = canvas[top:top + h, left:left + w]
        rgb = palette[idx]
        if gce["transparent"] is not None:
            opaque = idx != gce["transparent"]
            region[opaque] = rgb[opaque]
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(gce["delay"])
        if gce["disposal"] == 2:
            canvas[top:top + h, left:left + w] = bg_color
        elif gce["disposal"] == 3 and prev_canvas is not None:
            canvas = prev_canvas
        gce = {"transparent": None, "disposal": 0, "delay": 0}
    if not frames:
        raise ValueError("GIF has no image data")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame as (H, W, 3) uint8 RGB — the
    decode_image contract for the still-image view of a GIF."""
    return decode_gif_frames(payload)[0][0]


# ---------------------------------------------------------------------------
# Encoder (deterministic, for the codec-pair tests and synthesis)
# ---------------------------------------------------------------------------


def _build_palette(frames: list[np.ndarray]) -> np.ndarray:
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0),
        axis=0)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif needs <=256 distinct colors, got {len(colors)}")
    return colors.astype(np.uint8)


def _quantize(frame: np.ndarray, palette: np.ndarray) -> np.ndarray:
    key = (frame.astype(np.int64) * np.array([65536, 256, 1])).sum(-1)
    pkey = (palette.astype(np.int64)
            * np.array([65536, 256, 1])).sum(-1)
    order = np.argsort(pkey)
    loc = np.searchsorted(pkey[order], key.reshape(-1))
    return order[loc].astype(np.uint8).reshape(frame.shape[:2])


def _interlace_rows(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, dtype=np.int64)


def encode_gif(frames, delays=None, interlace: bool = False,
               disposals=None, transparent_color=None,
               bg_color=None) -> bytes:
    """Deterministic GIF89a writer. ``frames``: one (H, W, 3) uint8
    array or a list of them (all canvas-sized; per-frame rectangles
    are the decoder's concern, the encoder always writes full
    frames). ``transparent_color``: an RGB triple whose pixels encode
    as the transparent index (skipped on composite). Round-trips
    bit-exactly through decode_gif_frames for any <=256-color
    input."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must be (H, W, 3) and equal size")
    palette = _build_palette(frames)
    trans_idx = None
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8)
        hit = np.where((palette == tc).all(axis=1))[0]
        if len(hit) == 0:
            palette = np.vstack([palette, tc[None]])
            if len(palette) > 256:
                raise ValueError("no palette slot for transparent color")
            hit = [len(palette) - 1]
        trans_idx = int(hit[0])
    bg_idx = 0
    if bg_color is not None:
        bg = np.asarray(bg_color, dtype=np.uint8)
        hitbg = np.where((palette == bg).all(axis=1))[0]
        if len(hitbg) == 0:
            palette = np.vstack([palette, bg[None]])
            if len(palette) > 256:
                raise ValueError("no palette slot for background color")
            hitbg = [len(palette) - 1]
        bg_idx = int(hitbg[0])
    depth = max(2, int(len(palette) - 1).bit_length())
    n_entries = 1 << depth
    table = np.zeros((n_entries, 3), dtype=np.uint8)
    table[:len(palette)] = palette
    mcs = depth

    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | ((depth - 1) << 4) | (depth - 1))  # GCT flag+size
    out.append(bg_idx)
    out.append(0)                                   # aspect
    out += table.tobytes()
    delays = delays or [0] * len(frames)
    disposals = disposals or [0] * len(frames)
    for f, delay, disp in zip(frames, delays, disposals):
        out += bytes([0x21, 0xF9, 4,
                      ((disp & 0x07) << 2)
                      | (1 if trans_idx is not None else 0)])
        out += int(delay).to_bytes(2, "little")
        out.append(trans_idx if trans_idx is not None else 0)
        out.append(0)
        out += bytes([0x2C]) + (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x40 if interlace else 0)
        idx = _quantize(f, palette)
        if interlace:
            idx = idx[_interlace_rows(h), :]
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)
