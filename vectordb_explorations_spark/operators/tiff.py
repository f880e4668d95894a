"""Native baseline-TIFF codec — pure Python/NumPy, no codec libraries.

TIFF is the scanned-document and print-pipeline format: a real crawl's
PDF-adjacent image payloads are disproportionately TIFF. The baseline
profile a zero-dependency container can fully carry is entirely
algorithmic — no probability or transform tables — so a from-the-spec
implementation is exact (TIFF 6.0 specification, Adobe, 1992; public).

Decoder coverage:
- both byte orders (``II``/``MM``), classic 8-byte header, full IFD
  walk with out-of-line values, multiple strips (RowsPerStrip);
- Compression 1 (none), 32773 (PackBits), and 5 (TIFF-variant LZW:
  MSB-first bit packing, 9->12-bit codes with the spec's EARLY
  code-width change — one code before the table fills, the documented
  difference from GIF's LZW — CLEAR resets, KwKwK);
- Predictor 2 (horizontal differencing, per-sample cumulative sum);
- PhotometricInterpretation 0/1 (bilevel+gray, WhiteIsZero inverted),
  2 (RGB, SamplesPerPixel 3), 3 (palette via the 16-bit ColorMap,
  folded to the high byte); BitsPerSample 8 (and 1-bit bilevel,
  MSB-first row-padded);
- PlanarConfiguration 1 (chunky; planar raises toward PIL).

The deterministic encoder writes classic little-endian TIFF (gray8 /
RGB8, any RowsPerStrip, compression none/PackBits/LZW, optional
predictor 2) so the codec pair round-trips bit-exactly with no
library compressor in the loop.

Scale shape: per-payload work inside Arrow-batched stages — the same
embarrassingly-parallel shape as every codec here.

Cites hnsw.cc: none — north-star multimodal extension (SURVEY §2.2).
"""

from __future__ import annotations

import numpy as np

# tag ids (TIFF 6.0 §8)
_T_WIDTH, _T_LENGTH, _T_BITS = 256, 257, 258
_T_COMPRESSION, _T_PHOTOMETRIC = 259, 262
_T_STRIP_OFFSETS, _T_SAMPLES_PP, _T_ROWS_PER_STRIP = 273, 277, 278
_T_STRIP_COUNTS, _T_PLANAR, _T_PREDICTOR, _T_COLORMAP = 279, 284, 317, 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8}


# ---------------------------------------------------------------------------
# TIFF LZW (MSB-first, early change)
# ---------------------------------------------------------------------------


def _tiff_lzw_decode(data: bytes, max_bytes: int) -> bytes:
    """TIFF §13 LZW: 256=CLEAR, 257=EOI, first free code 258, widths
    9..12 with the EARLY change (grow when the next free code is
    2^width - 1), MSB-first bit packing."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    state = {"acc": 0, "nacc": 0, "i": 0}

    def read(width: int) -> int:
        while state["nacc"] < width:
            if state["i"] >= len(data):
                raise ValueError("TIFF LZW stream truncated")
            state["acc"] = (state["acc"] << 8) | data[state["i"]]
            state["i"] += 1
            state["nacc"] += 8
        state["nacc"] -= width
        return (state["acc"] >> state["nacc"]) & ((1 << width) - 1)

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""], 9

    table, width = fresh()
    prev: bytes | None = None
    while len(out) < max_bytes:
        code = read(width)
        if code == CLEAR:
            table, width = fresh()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):               # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW: code beyond table")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY change: one code before the table fills
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return bytes(out[:max_bytes])


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    outbits = bytearray()
    acc, nacc = 0, 0

    state = {"width": 9, "next": 258}

    def write(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << state["width"]) | code
        nacc += state["width"]
        while nacc >= 8:
            outbits.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
        # EARLY change mirrored on the write side: the NEXT code must
        # be readable at the width the decoder will have after its add
        if state["next"] >= (1 << state["width"]) - 1 \
                and state["width"] < 12:
            state["width"] += 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    write(CLEAR)
    if data:
        w = data[:1]
        for i in range(1, len(data)):
            c = data[i:i + 1]
            if w + c in table:
                w = w + c
                continue
            write(table[w])
            if state["next"] >= 4093:
                write(CLEAR)
                table = {bytes([j]): j for j in range(256)}
                state["width"], state["next"] = 9, 258
            else:
                table[w + c] = state["next"]
                state["next"] += 1
            w = c
        write(table[w])
    write(EOI)
    if nacc:
        outbits.append((acc << (8 - nacc)) & 0xFF)
    return bytes(outbits)


# ---------------------------------------------------------------------------
# PackBits (TIFF §9)
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, max_bytes: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_bytes:
        n = data[i]
        i += 1
        if n < 128:                     # literal run of n+1
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                   # repeat next byte 257-n times
            out += data[i:i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:max_bytes])


def _packbits_encode(row: bytes) -> bytes:
    """Greedy spec-shaped PackBits: repeat runs >= 3 encode as runs;
    everything else as literals (max 128 either way)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i = j + 1
            continue
        # literal: until the next >=3 run or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += row[i:k]
        i = k
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_ifd(payload: bytes, bo: str) -> dict[int, list[int]]:
    off = int.from_bytes(payload[4:8], bo)
    n = int.from_bytes(payload[off:off + 2], bo)
    tags: dict[int, list[int]] = {}
    for k in range(n):
        e = off + 2 + 12 * k
        tag = int.from_bytes(payload[e:e + 2], bo)
        typ = int.from_bytes(payload[e + 2:e + 4], bo)
        cnt = int.from_bytes(payload[e + 4:e + 8], bo)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            raw = payload[e + 8:e + 8 + size]
        else:
            voff = int.from_bytes(payload[e + 8:e + 12], bo)
            raw = payload[voff:voff + size]
        step = _TYPE_SIZES.get(typ, 1)
        # every type decodes as unsigned fixed-step integers; the
        # baseline tags used here are all BYTE/SHORT/LONG (rationals
        # would need a numerator/denominator split no tag we read has)
        tags[tag] = [int.from_bytes(raw[i:i + step], bo)
                     for i in range(0, size, step)]
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB for color/palette, (h, w) uint8 for
    gray/bilevel — the decode_image shape contract."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")
    tags = _read_ifd(payload, bo)
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_LENGTH][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [1])[0]
    spp = tags.get(_T_SAMPLES_PP, [1])[0]
    bits = tags.get(_T_BITS, [1])[0]
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0] or h
    planar = tags.get(_T_PLANAR, [1])[0]
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if planar != 1:
        raise NotImplementedError(
            "planar-configuration TIFF not decoded natively — PIL "
            "handles it")
    if bits not in (1, 8) or (bits == 1 and spp != 1):
        raise NotImplementedError(
            f"TIFF BitsPerSample {bits} x{spp} not decoded natively "
            f"(8-bit chunky and 1-bit bilevel are) — PIL handles it")
    row_bytes = (w * spp * bits + 7) // 8
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        want = row_bytes * nrows
        strip = payload[off:off + cnt]
        if comp == 1:
            got = strip[:want]
        elif comp == 32773:
            got = _packbits_decode(strip, want)
        elif comp == 5:
            got = _tiff_lzw_decode(strip, want)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} not decoded natively "
                f"(none/PackBits/LZW are) — PIL handles it")
        if len(got) < want:
            raise ValueError("TIFF strip data short")
        raw += got
    arr8 = np.frombuffer(bytes(raw), dtype=np.uint8)
    if bits == 1:
        rows = arr8.reshape(h, row_bytes)
        bits_arr = np.unpackbits(rows, axis=1)[:, :w]   # MSB-first
        gray = (bits_arr * 255).astype(np.uint8)
        if photo == 0:                                   # WhiteIsZero
            gray = 255 - gray
        return gray
    img = arr8.reshape(h, w, spp) if spp > 1 else arr8.reshape(h, w)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1) \
            .astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(
            f"TIFF predictor {predictor} not decoded natively")
    if photo == 3:                                       # palette
        cmap = tags.get(_T_COLORMAP)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        table = (np.array(cmap, dtype=np.uint32)
                 .reshape(3, n).T >> 8).astype(np.uint8)
        flat = img.reshape(h, w) if img.ndim > 2 else img
        return table[flat]
    if photo == 0 and spp == 1:                          # WhiteIsZero
        return (255 - img).astype(np.uint8)
    if spp == 3:
        return img.copy()
    return img.copy()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_tiff(img: np.ndarray, compression: str = "none",
                rows_per_strip: int | None = None,
                predictor: bool = False) -> bytes:
    """Classic little-endian TIFF writer for (h, w) gray or (h, w, 3)
    RGB uint8. ``compression``: 'none' | 'packbits' | 'lzw';
    ``predictor`` applies horizontal differencing (LZW/none only by
    spec custom; we permit it anywhere the decoder inverts it)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    if not gray and spp != 3:
        raise ValueError("encode_tiff: RGB images must be (h, w, 3)")
    rps = rows_per_strip or h
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    src = img.astype(np.int64)
    if predictor:
        diff = src.copy()
        diff[:, 1:] = src[:, 1:] - src[:, :-1]
        src = diff & 0xFF
    data8 = src.astype(np.uint8).reshape(h, -1)
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        block = data8[y0:y0 + rps].tobytes()
        if compression == "none":
            strips.append(block)
        elif compression == "packbits":
            # per-row encoding, concatenated (spec recommendation)
            rb = data8.shape[1]
            strips.append(b"".join(
                _packbits_encode(block[r * rb:(r + 1) * rb])
                for r in range(len(block) // rb)))
        else:
            strips.append(_tiff_lzw_encode(block))

    n_strips = len(strips)
    entries = []                       # (tag, type, count, value(s))
    entries.append((_T_WIDTH, 3, 1, [w]))
    entries.append((_T_LENGTH, 3, 1, [h]))
    entries.append((_T_BITS, 3, spp, [8] * spp))
    entries.append((_T_COMPRESSION, 3, 1, [comp_tag]))
    entries.append((_T_PHOTOMETRIC, 3, 1, [1 if gray else 2]))
    entries.append((_T_STRIP_OFFSETS, 4, n_strips, None))  # fill later
    entries.append((_T_SAMPLES_PP, 3, 1, [spp]))
    entries.append((_T_ROWS_PER_STRIP, 3, 1, [rps]))
    entries.append((_T_STRIP_COUNTS, 4, n_strips,
                    [len(s) for s in strips]))
    if predictor:
        entries.append((_T_PREDICTOR, 3, 1, [2]))
    entries.sort(key=lambda e: e[0])

    ifd_off = 8
    n = len(entries)
    after_ifd = ifd_off + 2 + 12 * n + 4
    # out-of-line value area, then strip data
    extra = bytearray()

    def value_bytes(typ, vals):
        step = _TYPE_SIZES[typ]
        return b"".join(int(v).to_bytes(step, "little") for v in vals)

    # first pass: compute where strip data starts
    extra_len = 0
    for tag, typ, cnt, vals in entries:
        size = _TYPE_SIZES[typ] * cnt
        if size > 4:
            extra_len += size
    data_off = after_ifd + extra_len
    strip_offsets = []
    o = data_off
    for s in strips:
        strip_offsets.append(o)
        o += len(s)

    out = bytearray(b"II*\x00")
    out += ifd_off.to_bytes(4, "little")
    out += n.to_bytes(2, "little")
    extra_cursor = after_ifd
    for tag, typ, cnt, vals in entries:
        if tag == _T_STRIP_OFFSETS:
            vals = strip_offsets
        vb = value_bytes(typ, vals)
        out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        out += cnt.to_bytes(4, "little")
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += extra_cursor.to_bytes(4, "little")
            extra += vb
            extra_cursor += len(vb)
    out += (0).to_bytes(4, "little")          # next-IFD pointer
    out += extra
    for s in strips:
        out += s
    return bytes(out)
