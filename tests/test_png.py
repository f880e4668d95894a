"""Native PNG codec (operators/png.py): lossless round trips, every
scanline filter type inverted against hand-filtered streams, palette /
alpha color types, Adam7 interlacing (round trip AND hand-built
filtered pass streams), 16-bit and sub-byte depths, the decode_image
seam routing, and the ValueError contract for malformed payloads
(nothing in the PNG grammar raises NotImplementedError anymore)."""

import struct
import zlib

import numpy as np
import pytest

from vectordb_explorations_spark.operators.png import (
    _SIGNATURE, decode_png, encode_png)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", crc))


def _build_png(w, h, color, raw, plte=None, depth=8, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def _forward_filter(img2d: np.ndarray, bpp: int,
                    ftypes: list[int]) -> bytes:
    """Apply the spec's FORWARD filters row by row so the decoder's
    inversion is tested against an independent construction."""
    h, stride = img2d.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        r = img2d[y].astype(np.int64)
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        line = np.empty(stride, dtype=np.int64)
        for i in range(stride):
            a = r[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            line[i] = (r[i] - pred) % 256
        raw += line.astype(np.uint8).tobytes()
        prev = r
    return bytes(raw)


def _img(h=13, w=19):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 7 + 3) % 256, (xx * 11) % 256,
                     ((xx * yy) + 5) % 256], -1).astype(np.uint8)


def test_lossless_round_trip_exact():
    """PNG is lossless: decode(encode(x)) must be EXACTLY x — gray
    and RGB, odd dimensions."""
    rgb = _img()
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)
    gray = rgb[:, :, 1].copy()
    assert np.array_equal(decode_png(encode_png(gray)), gray)


def test_every_filter_type_inverts():
    """Streams built with the spec's forward filters (one type per
    row, all five cycled, plus each type alone) decode back to the
    source image exactly."""
    rgb = _img(11, 7)
    flat = rgb.reshape(11, -1)
    for ftypes in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        raw = _forward_filter(flat, 3, ftypes)
        payload = _build_png(7, 11, 2, raw)
        assert np.array_equal(decode_png(payload), rgb), ftypes


def test_palette_and_alpha_color_types():
    # palette: 4 colors, deterministic index pattern
    plte_arr = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                         [7, 8, 9]], dtype=np.uint8)
    idx = (np.add.outer(np.arange(6), np.arange(5)) % 4).astype(np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    payload = _build_png(5, 6, 3, raw, plte=plte_arr.tobytes())
    assert np.array_equal(decode_png(payload), plte_arr[idx])

    # RGBA drops alpha; gray+alpha drops alpha
    rgb = _img(4, 3)
    rgba = np.concatenate(
        [rgb, np.full((4, 3, 1), 200, np.uint8)], axis=-1)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    assert np.array_equal(decode_png(_build_png(3, 4, 6, raw)), rgb)
    ga = np.stack([rgb[..., 0], np.full((4, 3), 99, np.uint8)], -1)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(4))
    assert np.array_equal(decode_png(_build_png(3, 4, 4, raw)),
                          rgb[..., 0])


def test_decode_image_seam_routes_png_natively():
    from vectordb_explorations_spark.operators.multimodal import (
        decode_image)

    rgb = _img()
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)


def test_cross_format_perceptual_triple(spark):
    """The real-world dedup win the native codecs unlock: the SAME
    image saved as JPEG, as PNG, and as lossless WebP forms a
    perceptual near-dup TRIANGLE (three byte-different payloads —
    sha256 is blind to it), found through the Spark banded-hash
    pipeline across formats."""
    from vectordb_explorations_spark.operators.jpeg import (
        encode_baseline_jpeg)
    from vectordb_explorations_spark.operators.perceptual import (
        image_hashes, perceptual_image_pairs)
    from vectordb_explorations_spark.operators.webp import encode_vp8l

    def smooth(seed, h=48, w=64):
        yy, xx = np.mgrid[0:h, 0:w]
        p = float(seed)
        return np.stack([
            128 + 90 * np.sin(yy / (5.0 + p % 7))
            * np.cos(xx / (6.0 + p % 5)),
            128 + 70 * np.cos(yy / 4.5 + p),
            128 + 80 * np.sin(xx / 8.0 + 2 * p),
        ], -1).clip(0, 255).astype(np.uint8)

    rows, planted = [], set()
    for i in range(6):
        img = smooth(i)
        rows.append((i, bytearray(encode_baseline_jpeg(img, 90, "420"))))
        rows.append((100 + i, bytearray(encode_png(img))))
        rows.append((200 + i, bytearray(
            encode_vp8l(img, subtract_green=True))))
        planted |= {(i, 100 + i), (i, 200 + i), (100 + i, 200 + i)}
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_image_pairs(image_hashes(assets)).collect()}
    assert pairs == planted, (planted - pairs, pairs - planted)


_ADAM7_GRID = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


@pytest.mark.parametrize("h,w", [(13, 19), (1, 1), (2, 3), (8, 8),
                                 (9, 17)])
def test_adam7_round_trip_exact(h, w):
    """Adam7 interlaced encode -> decode is the identity at every
    geometry — including sizes where whole passes are empty (1x1 has
    only pass 1) and partial final passes."""
    rgb = _img(h, w)
    assert np.array_equal(decode_png(encode_png(rgb, interlace=True)),
                          rgb)
    gray = rgb[:, :, 2].copy()
    assert np.array_equal(decode_png(encode_png(gray, interlace=True)),
                          gray)


def test_adam7_hand_built_filtered_passes():
    """An Adam7 stream built pass-by-pass in the test (independent of
    the encoder) with NON-zero filters inside each pass decodes to the
    source — pins that filtering restarts per pass (prev row resets)
    and that pass geometry matches the spec grid."""
    h, w = 11, 10
    rgb = _img(h, w)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_GRID:
        sub = rgb[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph = sub.shape[0]
        raw += _forward_filter(sub.reshape(ph, -1), 3,
                               [1, 2, 3, 4])
    payload = _build_png(w, h, 2, bytes(raw), interlace=1)
    assert np.array_equal(decode_png(payload), rgb)


def test_16bit_folds_to_high_byte():
    """16-bit samples decode to their high byte; when the low bytes
    are zero the fold is exact, so encode(uint16)->decode is pinned
    bit-for-bit against the 8-bit source."""
    rgb8 = _img(6, 5)
    wide = rgb8.astype(np.uint16) << 8
    assert np.array_equal(decode_png(encode_png(wide)), rgb8)
    # nonzero low bytes: hand-build big-endian rows, expect high byte
    vals = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 4097
            + 255)  # high byte varies, low byte nonzero
    raw = b"".join(b"\x00" + vals[y].astype(">u2").tobytes()
                   for y in range(3))
    assert np.array_equal(
        decode_png(_build_png(4, 3, 0, raw, depth=16)),
        (vals >> 8).astype(np.uint8))
    # Adam7 + 16-bit RGB compose
    assert np.array_equal(
        decode_png(encode_png(wide, interlace=True)), rgb8)


@pytest.mark.parametrize("depth,scale", [(1, 255), (2, 85), (4, 17)])
def test_sub_byte_gray_depths(depth, scale):
    """1/2/4-bit grayscale: MSB-first packed samples scale by
    255/(2^d - 1) — hand-packed rows and the encoder agree."""
    h, w = 5, 11  # w chosen so rows need pad bits at every depth
    samples = (np.add.outer(np.arange(h), np.arange(w))
               % (1 << depth)).astype(np.uint8)
    packed = bytearray()
    for y in range(h):
        bits = ((samples[y][:, None]
                 >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
        packed += b"\x00" + np.packbits(bits).tobytes()
    expect = samples * scale
    assert np.array_equal(
        decode_png(_build_png(w, h, 0, bytes(packed), depth=depth)),
        expect)
    assert np.array_equal(
        decode_png(encode_png(samples, depth=depth)), expect)


def test_sub_byte_palette_depth():
    """4-bit palette indices resolve through PLTE unscaled."""
    plte_arr = np.array([[9, 8, 7], [1, 2, 3], [200, 100, 50],
                         [0, 255, 0], [5, 5, 5]], dtype=np.uint8)
    idx = (np.add.outer(np.arange(4), np.arange(7)) % 5).astype(np.uint8)
    packed = bytearray()
    for y in range(4):
        bits = ((idx[y][:, None] >> np.arange(3, -1, -1)) & 1)
        packed += b"\x00" + np.packbits(bits.reshape(-1)).tobytes()
    payload = _build_png(7, 4, 3, bytes(packed),
                         plte=plte_arr.tobytes(), depth=4)
    assert np.array_equal(decode_png(payload), plte_arr[idx])


def test_malformed_payloads_raise_valueerror():
    rgb = _img(4, 4)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(4))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(_build_png(4, 4, 2, raw, interlace=2))
    with pytest.raises(ValueError, match="illegal"):
        # depth 4 is illegal for truecolor
        decode_png(_build_png(4, 4, 2, raw, depth=4))
    with pytest.raises(ValueError, match="illegal"):
        # depth 16 is illegal for palette
        decode_png(_build_png(4, 4, 3, raw, depth=16))
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
    with pytest.raises(ValueError):
        # palette image with no PLTE chunk
        idx = np.zeros((2, 2), np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        decode_png(_build_png(2, 2, 3, raw))
