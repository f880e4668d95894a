"""Native GIF codec (operators/gif.py): LZW against HAND-BUILT spec
streams (independent of both halves of the codec), full-file
hand-built decode, bit-exact round trips across palette sizes /
interlace / table-growth regimes, the animation compositing contract
(disposal + transparency), the interlace row schedule pinned
independently, decode_image routing, and the cross-format perceptual
pair the codec unlocks."""

import numpy as np
import pytest

from vectordb_explorations_spark.operators.gif import (
    _lzw_decode, _lzw_encode, decode_gif, decode_gif_frames, encode_gif)


# --- LZW against hand-derived spec streams -------------------------------

# mcs=2, pixels [0,1,1]: codes clear(4),0,1,1,eoi(5); the width grows to
# 4 bits after the table reaches 8 entries, so the final data code and
# EOI are 4-bit. Packed LSB-first by hand: 0x44 0x52.
HAND_LZW_011 = b"\x44\x52"

# mcs=2, pixels [0,1,2,3]: codes clear,0,1,2 (3-bit; growth fires after
# emitting 2), then 3 and eoi at 4 bits -> 0x44 0x34 0x05.
HAND_LZW_0123 = b"\x44\x34\x05"


def test_lzw_decodes_hand_built_spec_streams():
    assert _lzw_decode(HAND_LZW_011, 2, 3).tolist() == [0, 1, 1]
    assert _lzw_decode(HAND_LZW_0123, 2, 4).tolist() == [0, 1, 2, 3]


def test_lzw_encoder_emits_the_hand_built_streams():
    """Pins the giflib emission discipline (grow-after-write) to the
    hand-packed bytes — encoder and decoder cannot share a symmetric
    off-by-one and still pass this."""
    assert _lzw_encode(np.array([0, 1, 1], np.uint8), 2) == HAND_LZW_011
    assert _lzw_encode(np.array([0, 1, 2, 3], np.uint8), 2) \
        == HAND_LZW_0123


def test_lzw_kwkwk_case():
    """The classic cScSc stream: [1,1,1] encodes as clear,1,6,eoi
    where code 6 is emitted BEFORE the decoder has added it."""
    data = _lzw_encode(np.array([1, 1, 1], np.uint8), 2)
    assert _lzw_decode(data, 2, 3).tolist() == [1, 1, 1]


def test_lzw_truncated_stream_raises():
    with pytest.raises(ValueError):
        _lzw_decode(HAND_LZW_011, 2, 50)


def test_decode_hand_built_gif_file():
    """A complete 2x2 GIF89a assembled byte by byte (header, GCT,
    descriptor, hand-packed LZW sub-block, trailer) decodes to the
    exact palette colors."""
    gct = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    gif = (b"GIF89a"
           + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + bytes([0x81, 0, 0]) + gct
           + bytes([0x2C]) + b"\x00" * 4
           + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + bytes([0x00, 0x02, len(HAND_LZW_0123)]) + HAND_LZW_0123
           + bytes([0x00, 0x3B]))
    out = decode_gif(gif)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]
    assert out[1, 1].tolist() == [255, 255, 255]


# --- round trips ----------------------------------------------------------


def _quantized(rng, h, w, n_colors):
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.int64)
    idx = rng.integers(0, n_colors, (h, w))
    return palette[idx].astype(np.uint8)


@pytest.mark.parametrize("n_colors,h,w,interlace", [
    (2, 7, 5, False), (17, 16, 16, False), (17, 13, 9, True),
    (256, 24, 31, False), (256, 11, 8, True),
])
def test_gif_roundtrip_exact(n_colors, h, w, interlace):
    rng = np.random.default_rng(n_colors * 100 + h + w)
    img = _quantized(rng, h, w, n_colors)
    frames, delays = decode_gif_frames(
        encode_gif(img, interlace=interlace))
    assert len(frames) == 1 and delays == [0]
    assert np.array_equal(frames[0], img)


def test_gif_roundtrip_through_table_growth_and_clear():
    """A 120x120 random 256-color image pushes the LZW table past
    4095 entries: the encoder must emit CLEAR and both sides resync
    through every code width 9..12."""
    rng = np.random.default_rng(4096)
    img = _quantized(rng, 120, 120, 256)
    payload = encode_gif(img)
    assert np.array_equal(decode_gif(payload), img)


def test_gif_interlace_schedule_matches_spec_independently():
    """encode(img, interlace) carries the SAME image data bytes as
    encode(img[perm], flat) where perm is the 8/8/4/2 pass order
    computed here from the spec — pinning the row schedule without
    trusting the codec's own tables."""
    h, w = 10, 4
    img = np.repeat(np.arange(h, dtype=np.uint8) * 20,
                    w * 3).reshape(h, w, 3)
    perm = ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)]
            + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])
    inter = encode_gif(img, interlace=True)
    flat = encode_gif(img[np.asarray(perm)], interlace=False)
    # identical except the interlace bit in the image descriptor
    diff = [i for i in range(len(inter)) if inter[i] != flat[i]]
    assert len(inter) == len(flat) and len(diff) == 1
    assert inter[diff[0]] == 0x40 and flat[diff[0]] == 0x00
    assert np.array_equal(decode_gif(inter), img)


# --- animation compositing ------------------------------------------------


def test_gif_animation_compositing_disposal_and_transparency():
    """Three-frame animation: frame 1 (red, disposal=2) restores the
    background after display; frame 2 paints one blue pixel through a
    transparent surround onto the restored background (disposal=3
    restores the PREVIOUS canvas next); frame 3's transparent pixels
    then reveal that pre-frame-2 canvas."""
    h = w = 4
    red = np.broadcast_to(np.array([200, 0, 0], np.uint8),
                          (h, w, 3)).copy()
    magenta = np.array([255, 0, 255], np.uint8)
    bg = np.array([10, 20, 30], np.uint8)
    f2 = np.broadcast_to(magenta, (h, w, 3)).copy()
    f2[1, 2] = [0, 0, 250]
    f3 = np.broadcast_to(magenta, (h, w, 3)).copy()
    f3[0, 0] = [0, 250, 0]
    payload = encode_gif([red, f2, f3], delays=[5, 10, 15],
                         disposals=[2, 3, 0],
                         transparent_color=magenta, bg_color=bg)
    frames, delays = decode_gif_frames(payload)
    assert delays == [5, 10, 15]
    assert np.array_equal(frames[0], red)
    exp2 = np.broadcast_to(bg, (h, w, 3)).copy()
    exp2[1, 2] = [0, 0, 250]
    assert np.array_equal(frames[1], exp2)
    exp3 = np.broadcast_to(bg, (h, w, 3)).copy()   # frame 2 disposed
    exp3[0, 0] = [0, 250, 0]
    assert np.array_equal(frames[2], exp3)


def test_gif_too_many_colors_raises():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError):
            encode_gif(img)


# --- integration ----------------------------------------------------------


def test_decode_image_routes_gif_natively():
    from vectordb_explorations_spark.operators.multimodal import (
        decode_image)

    rng = np.random.default_rng(7)
    img = _quantized(rng, 9, 12, 31)
    assert np.array_equal(decode_image(encode_gif(img)), img)


def test_cross_format_gif_png_perceptual_pair(spark):
    """The dedup win: the SAME <=256-color image saved as GIF and as
    PNG is a perceptual near-dup pair across byte-disjoint formats,
    found through the Spark banded-hash pipeline."""
    from vectordb_explorations_spark.operators.perceptual import (
        image_hashes, perceptual_image_pairs)
    from vectordb_explorations_spark.operators.png import encode_png

    def smooth(seed, h=48, w=64):
        yy, xx = np.mgrid[0:h, 0:w]
        p = float(seed)
        img = np.stack([
            128 + 90 * np.sin(yy / (5.0 + p % 7))
            * np.cos(xx / (6.0 + p % 5)),
            128 + 70 * np.cos(yy / 4.5 + p),
            128 + 80 * np.sin(xx / 8.0 + 2 * p),
        ], -1).clip(0, 255).astype(np.uint8)
        return (img // 32) * 32      # <=256 distinct colors for GIF

    rows, planted = [], set()
    for i in range(5):
        img = smooth(i)
        assert len(np.unique(img.reshape(-1, 3), axis=0)) <= 256
        rows.append((i, bytearray(encode_gif(img, interlace=i % 2 == 1))))
        rows.append((100 + i, bytearray(encode_png(img))))
        planted.add((i, 100 + i))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_image_pairs(image_hashes(assets)).collect()}
    assert pairs == planted, (planted - pairs, pairs - planted)


def test_gif_frame_sample_planted(spark):
    """The declared query's planted structure: a doc with a known
    324-char ASCII prefix yields frames 0 and 2 (every-2nd sampling),
    delays 0/20 cs, and each frame's sha256 equals the sha256 of the
    corresponding 108-byte text slice — the codec round-trip
    invariance the oracle rides, asserted here from first
    principles."""
    import hashlib

    from vectordb_explorations_spark.operators.multimodal import (
        GIF_FRAME_BYTES, gif_frame_sample)

    text = "".join(chr(33 + (i * 7) % 90) for i in range(400))
    short = "tiny"                      # ineligible: too short
    docs = spark.createDataFrame(
        [(0, "s", "en", text), (1, "s", "en", short)],
        ["doc_id", "source", "lang", "text"])
    rows = gif_frame_sample(docs).collect()
    assert [(r.doc_id, r.frame_idx, r.delay_cs) for r in rows] \
        == [(0, 0, 0), (0, 2, 20)]
    for r in rows:
        sl = text[r.frame_idx * GIF_FRAME_BYTES:
                  (r.frame_idx + 1) * GIF_FRAME_BYTES].encode()
        assert r.frame_sha256 == hashlib.sha256(sl).hexdigest()
        assert abs(r.mean_byte - sum(sl) / GIF_FRAME_BYTES) < 1e-6
