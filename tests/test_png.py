"""Native PNG codec (operators/png.py): lossless round trips, every
scanline filter type inverted against hand-filtered streams, palette /
alpha color types, the decode_image seam routing, and the
NotImplementedError contract for Adam7/16-bit toward the PIL seam."""

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


def test_cross_format_perceptual_pair(spark):
    """The real-world dedup win the native codecs unlock: the SAME
    image saved as JPEG and as PNG is a perceptual near-dup pair
    (different bytes — sha256 is blind to it), found through the
    Spark banded-hash pipeline across formats."""
    from vectordb_explorations_spark.operators.jpeg import (
        encode_baseline_jpeg)
    from vectordb_explorations_spark.operators.perceptual import (
        image_hashes, perceptual_image_pairs)

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
        planted.add((i, 100 + i))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_image_pairs(image_hashes(assets)).collect()}
    assert pairs == planted, (planted - pairs, pairs - planted)


def test_unsupported_shapes_raise_toward_the_seam():
    rgb = _img(4, 4)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(4))
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(_build_png(4, 4, 2, raw, interlace=1))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(_build_png(4, 4, 2, raw, depth=16))
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
    with pytest.raises(ValueError):
        # palette image with no PLTE chunk
        idx = np.zeros((2, 2), np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        decode_png(_build_png(2, 2, 3, raw))
