"""Native TIFF codec (operators/tiff.py): TIFF-variant LZW against a
HAND-PACKED spec stream (MSB-first, early change), the spec's own
PackBits worked example, bit-exact round trips across compression /
predictor / strip layouts / byte orders, palette and bilevel decode,
decode_image routing, and the cross-format perceptual pair."""

import numpy as np
import pytest

from vectordb_explorations_spark.operators.tiff import (
    _packbits_decode, _packbits_encode, _tiff_lzw_decode,
    _tiff_lzw_encode, decode_tiff, encode_tiff)


# [7,7,7,8] -> codes CLEAR(256),7,258,8,EOI(257), all 9-bit, MSB-first:
HAND_LZW_7778 = bytes([0x80, 0x01, 0xE0, 0x40, 0x88, 0x08])


def test_tiff_lzw_decodes_hand_packed_stream():
    assert _tiff_lzw_decode(HAND_LZW_7778, 4) == bytes([7, 7, 7, 8])


def test_tiff_lzw_encoder_emits_the_hand_packed_stream():
    assert _tiff_lzw_encode(bytes([7, 7, 7, 8])) == HAND_LZW_7778


def test_tiff_lzw_early_change_boundary():
    """253 fresh pairs take the table to 511 entries: the EARLY rule
    switches to 10-bit codes one entry before the table fills —
    a GIF-rule implementation desynchronizes exactly here."""
    data = bytes(range(256)) * 4          # plenty of fresh pairs
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_tiff_lzw_roundtrip_through_clear():
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 256, 30000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_packbits_spec_worked_example():
    """The worked example from the TIFF 6.0 specification §9."""
    unpacked = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert _packbits_decode(packed, len(unpacked)) == unpacked
    assert _packbits_encode(unpacked) == packed


@pytest.mark.parametrize("compression,predictor,rps", [
    ("none", False, None), ("none", True, 3),
    ("packbits", False, 4), ("packbits", True, None),
    ("lzw", False, None), ("lzw", True, 2),
])
def test_tiff_roundtrip_gray_and_rgb(compression, predictor, rps):
    rng = np.random.default_rng(hash((compression, predictor)) % 2**31)
    gray = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    rgb = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    for img in (gray, rgb):
        payload = encode_tiff(img, compression=compression,
                              rows_per_strip=rps, predictor=predictor)
        assert np.array_equal(decode_tiff(payload), img)


def test_tiff_big_endian_uncompressed():
    """Hand-built MM (big-endian) gray TIFF decodes identically."""
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    # 8 header + IFD with 6 entries + data
    entries = [(256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 8),
               (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, None),
               (277, 3, 1, 1), (279, 4, 1, 12)]
    n = len(entries)
    data_off = 8 + 2 + 12 * n + 4
    out = bytearray(b"MM\x00*")
    out += (8).to_bytes(4, "big")
    out += n.to_bytes(2, "big")
    for tag, typ, cnt, val in entries:
        if val is None:
            val = data_off
        out += tag.to_bytes(2, "big") + typ.to_bytes(2, "big")
        out += cnt.to_bytes(4, "big")
        step = 2 if typ == 3 else 4
        vb = int(val).to_bytes(step, "big")
        out += vb + b"\x00" * (4 - len(vb))
    out += (0).to_bytes(4, "big")
    out += img.tobytes()
    assert np.array_equal(decode_tiff(bytes(out)), img)


def test_tiff_palette_and_bilevel():
    """Photometric 3 (ColorMap, 16-bit entries folded to the high
    byte) and 1-bit bilevel in both polarities."""
    # a minimal hand-built palette file (patching the encoder's output
    # would be more brittle than assembling the five-tag IFD directly)
    img = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                       [9, 8, 7]], dtype=np.uint8)
    cmap16 = np.zeros(12, dtype=np.uint16)
    cmap16[0:4] = colors[:, 0].astype(np.uint16) << 8
    cmap16[4:8] = colors[:, 1].astype(np.uint16) << 8
    cmap16[8:12] = colors[:, 2].astype(np.uint16) << 8
    entries = [(256, 3, 1, [2]), (257, 3, 1, [2]), (258, 3, 1, [8]),
               (259, 3, 1, [1]), (262, 3, 1, [3]), (273, 4, 1, None),
               (277, 3, 1, [1]), (279, 4, 1, [4]),
               (320, 3, 12, list(cmap16))]
    n = len(entries)
    after_ifd = 8 + 2 + 12 * n + 4
    cmap_off = after_ifd
    data_off = cmap_off + 24
    out = bytearray(b"II*\x00") + (8).to_bytes(4, "little")
    out += n.to_bytes(2, "little")
    for tag, typ, cnt, vals in entries:
        if vals is None:
            vals = [data_off]
        out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
        out += cnt.to_bytes(4, "little")
        step = 2 if typ == 3 else 4
        vb = b"".join(int(v).to_bytes(step, "little") for v in vals)
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += cmap_off.to_bytes(4, "little")
    out += (0).to_bytes(4, "little")
    out += cmap16.astype("<u2").tobytes()
    out += img.tobytes()
    rgb = decode_tiff(bytes(out))
    assert np.array_equal(rgb, colors[img.reshape(-1)].reshape(2, 2, 3))

    # bilevel: 5 px wide (row-padded), both polarities
    bits = np.array([[1, 0, 1, 1, 0], [0, 0, 1, 0, 1]], dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    for photo, expect in ((1, bits * 255), (0, 255 - bits * 255)):
        entries = [(256, 3, 1, 5), (257, 3, 1, 2), (258, 3, 1, 1),
                   (259, 3, 1, 1), (262, 3, 1, photo),
                   (273, 4, 1, None), (277, 3, 1, 1),
                   (279, 4, 1, len(packed))]
        n = len(entries)
        data_off = 8 + 2 + 12 * n + 4
        out = bytearray(b"II*\x00") + (8).to_bytes(4, "little")
        out += n.to_bytes(2, "little")
        for tag, typ, cnt, val in entries:
            if val is None:
                val = data_off
            out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little")
            out += cnt.to_bytes(4, "little")
            step = 2 if typ == 3 else 4
            vb = int(val).to_bytes(step, "little")
            out += vb + b"\x00" * (4 - len(vb))
        out += (0).to_bytes(4, "little") + packed
        assert np.array_equal(decode_tiff(bytes(out)), expect)


def test_decode_image_routes_tiff_natively():
    from vectordb_explorations_spark.operators.multimodal import (
        decode_image)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    payload = encode_tiff(img, compression="lzw", predictor=True)
    assert np.array_equal(decode_image(payload), img)


def test_cross_format_tiff_png_perceptual_pair(spark):
    """The dedup win: the SAME image saved as LZW TIFF and as PNG is
    a perceptual near-dup pair across byte-disjoint formats, found
    through the Spark banded-hash pipeline."""
    from vectordb_explorations_spark.operators.perceptual import (
        image_hashes, perceptual_image_pairs)
    from vectordb_explorations_spark.operators.png import encode_png

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
    for i in range(5):
        img = smooth(i)
        rows.append((i, bytearray(
            encode_tiff(img, compression="lzw", predictor=i % 2 == 0))))
        rows.append((100 + i, bytearray(encode_png(img))))
        planted.add((i, 100 + i))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_image_pairs(image_hashes(assets)).collect()}
    assert pairs == planted, (planted - pairs, pairs - planted)
