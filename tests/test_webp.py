"""Native WebP lossless / VP8L codec (operators/webp.py): exact
round trips across the encoder's surface (normal code-length-coded
prefix codes with repeats, subtract-green, color cache, LZ77 runs),
hand-built bitstreams for the paths the encoder does not emit
(simple codes, predictor / color / palette-bundling transforms, meta
prefix groups), per-mode predictor unit pins, sha256 determinism,
and the decode_image seam routing (VP8L native, lossy VP8 still
raises)."""

import hashlib

import numpy as np
import pytest

from vectordb_explorations_spark.operators.webp import (
    _LsbWriter, _add_pixels, _avg2, _clamp_add_sub_full,
    _clamp_add_sub_half, _predict, _select, decode_webp, encode_vp8l)


def _img(h=23, w=31, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("kwargs", [
    dict(), dict(subtract_green=True), dict(cache_bits=4),
    dict(rle=True), dict(subtract_green=True, cache_bits=6, rle=True)])
def test_round_trip_exact(kwargs):
    x = _img()
    assert np.array_equal(decode_webp(encode_vp8l(x, **kwargs)), x)


def test_shapes_and_runs():
    flat = np.full((40, 50, 3), 77, np.uint8)
    assert np.array_equal(decode_webp(encode_vp8l(flat, rle=True)),
                          flat)
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_vp8l(one)), one)
    g = _img()[:, :, 0]
    assert np.array_equal(decode_webp(encode_vp8l(g)),
                          np.stack([g] * 3, -1))
    # the codec compresses runs: a real format, not a container
    assert len(encode_vp8l(flat, rle=True)) < 300


def test_payload_and_decode_sha256_pinned():
    x = _img(16, 16, 9)
    p = encode_vp8l(x, subtract_green=True, cache_bits=5, rle=True)
    assert hashlib.sha256(p).hexdigest() == (
        "662f3b9de65cbc57fc06e29ba6e28b7f"
        "c57b7e574eb0986e839043de7bfc31e6")
    y = decode_webp(p)
    assert np.array_equal(y, x)
    assert encode_vp8l(x, subtract_green=True, cache_bits=5,
                       rle=True) == p


# ---- hand-built streams: the grammar the encoder does not emit ----


def _simple_code(bw, symbols, first_8bit=True):
    """Emit a 'simple' prefix code (1-2 symbols)."""
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    bw.write(1 if first_8bit else 0, 1)
    bw.write(symbols[0], 8 if first_8bit else 1)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _const_group(bw, green_sym, red=0, blue=0, alpha=0xFF):
    """Five simple single-symbol codes: every pixel decodes with ZERO
    bits read."""
    _simple_code(bw, [green_sym])
    _simple_code(bw, [red])
    _simple_code(bw, [blue])
    _simple_code(bw, [alpha])
    _simple_code(bw, [0])                     # distance (unused)


def _wrap_vp8l(body_writer, w, h):
    import struct

    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    body_writer(bw)
    body = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
            + chunk)


def _literal_pixels(bw, pixels, level0=False):
    """Two-symbol simple codes per channel over exactly the values
    appearing in ``pixels`` (list of (r, g, b)); emits each pixel.
    ``level0`` additionally writes the no-meta-prefix bit the main
    stream carries (subimages do not)."""
    rs = sorted({p[0] for p in pixels})
    gs = sorted({p[1] for p in pixels})
    bs = sorted({p[2] for p in pixels})
    assert len(rs) <= 2 and len(gs) <= 2 and len(bs) <= 2
    bw.write(0, 1)                            # no color cache
    if level0:
        bw.write(0, 1)                        # no meta prefix image
    _simple_code(bw, gs)
    _simple_code(bw, rs)
    _simple_code(bw, bs)
    _simple_code(bw, [0xFF])                  # alpha
    _simple_code(bw, [0])                     # distance
    for r, g, b in pixels:
        if len(gs) == 2:
            bw.write_code(gs.index(g), 1)
        if len(rs) == 2:
            bw.write_code(rs.index(r), 1)
        if len(bs) == 2:
            bw.write_code(bs.index(b), 1)


def test_hand_built_predictor_transform():
    """PREDICTOR transform with a constant mode-2 (TOP) tile image:
    output rows accumulate residuals column-wise mod 256."""
    h, w = 5, 4
    res = _img(h, w, seed=1) % 2              # residuals in {0,1}

    def body(bw):
        bw.write(1, 1)                        # transform present
        bw.write(0, 2)                        # PREDICTOR
        bw.write(2, 3)                        # size_bits = 4
        # subimage 1x1: constant mode 2 in the green channel
        bw.write(0, 1)                        # no cache (subimage)
        _const_group(bw, green_sym=2)
        bw.write(0, 1)                        # no more transforms
        _literal_pixels(bw, [tuple(px) for row in res for px in row],
                        level0=True)

    out = decode_webp(_wrap_vp8l(body, w, h))
    # expected: first pixel predicted from ARGB 0xff000000, first row
    # from LEFT, first column handled by mode override, rest mode 2
    exp = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0])
            elif y == 0:
                pred = exp[y, x - 1]
            else:
                pred = exp[y - 1, x]          # mode 2 everywhere else
            exp[y, x] = (res[y, x] + pred) % 256
    assert np.array_equal(out, exp.astype(np.uint8))


def test_hand_built_color_transform():
    """COLOR transform with one constant delta tile: red/blue shift
    by the signed 3.5 fixed-point products of green/red."""
    h, w = 3, 5
    px = _img(h, w, seed=5) % 2

    g2r, g2b, r2b = 16, 8, 4                  # small positive deltas

    def body(bw):
        bw.write(1, 1)
        bw.write(1, 2)                        # COLOR
        bw.write(2, 3)                        # size_bits = 4 (1 tile)
        bw.write(0, 1)                        # no cache (subimage)
        # ColorCodeToMultipliers packing: green_to_red in the BLUE
        # byte, green_to_blue in GREEN, red_to_blue in RED
        _const_group(bw, green_sym=g2b, red=r2b, blue=g2r)
        bw.write(0, 1)
        _literal_pixels(bw, [tuple(p) for row in px for p in row],
                        level0=True)

    out = decode_webp(_wrap_vp8l(body, w, h))

    def delta(t, c):
        cs = c - 256 if c >= 128 else c
        ts = t - 256 if t >= 128 else t
        return (ts * cs) >> 5

    exp = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            r = (r + delta(g2r, g)) & 0xFF
            b = (b + delta(g2b, g)) & 0xFF
            b = (b + delta(r2b, r)) & 0xFF
            exp[y, x] = (r, g, b)
    assert np.array_equal(out, exp.astype(np.uint8))


def test_hand_built_palette_with_bundling():
    """COLOR_INDEXING with a 4-color palette: xbits=2, four pixels
    bundle into each coded green byte; palette entries are
    delta-coded in the stream."""
    h, w = 3, 8
    palette = [(250, 0, 10), (0, 200, 30), (17, 18, 19), (9, 9, 9)]
    idx = (np.add.outer(np.arange(h), np.arange(w)) % 4)

    def body(bw):
        bw.write(1, 1)
        bw.write(3, 2)                        # COLOR_INDEXING
        bw.write(3, 8)                        # palette size - 1
        # palette subimage 4x1, delta-coded: entry i stores
        # component-wise (p[i] - p[i-1]) mod 256
        deltas = []
        prev = (0, 0, 0)
        for p in palette:
            deltas.append(tuple((a - b) % 256 for a, b in
                          zip(p, prev)))
            prev = p
        # _literal_pixels_multi writes the subimage's cache bit itself
        _literal_pixels_multi(bw, deltas)
        bw.write(0, 1)                        # no more transforms
        # packed image: width ceil(8/4)=2, green byte bundles 4
        # 2-bit indices little-end first
        packed = []
        for y in range(h):
            for sx in range(2):
                vals = idx[y, sx * 4:sx * 4 + 4]
                g = sum(int(v) << (2 * k) for k, v in enumerate(vals))
                packed.append((0, g, 0))
        _literal_pixels_multi(bw, packed, level0=True)

    out = decode_webp(_wrap_vp8l(body, w, h))
    exp = np.array(palette, dtype=np.uint8)[idx]
    assert np.array_equal(out, exp)


def _literal_pixels_multi(bw, pixels, level0=False):
    """Literal emission with NORMAL flat 8-bit codes on every channel
    (any number of distinct values) — the hand-built analog of the
    encoder's path, reused where simple codes cannot hold the
    alphabet."""
    from vectordb_explorations_spark.operators.webp import (
        _enc_table, _write_flat_code)

    bw.write(0, 1)                            # no color cache
    if level0:
        bw.write(0, 1)                        # no meta prefix image
    g_lengths = [9] * 280
    byte_lengths = [8] * 256
    _write_flat_code(bw, g_lengths)
    for _ in range(3):
        _write_flat_code(bw, byte_lengths)
    _write_flat_code(bw, [6] * 40)
    g_enc = _enc_table(g_lengths)
    b_enc = _enc_table(byte_lengths)
    for r, g, b in pixels:
        c, ln = g_enc[g]
        bw.write_code(c, ln)
        c, ln = b_enc[r]
        bw.write_code(c, ln)
        c, ln = b_enc[b]
        bw.write_code(c, ln)
        c, ln = b_enc[0xFF]
        bw.write_code(c, ln)


def test_hand_built_meta_prefix_groups():
    """META prefix image: two tiles select two different prefix-code
    groups (constant colors differ per tile) — pins the per-tile
    group lookup and the red<<8|green packing."""
    w, h = 8, 1

    def body(bw):
        bw.write(0, 1)                        # no transforms
        bw.write(0, 1)                        # no color cache
        bw.write(1, 1)                        # meta prefix image
        bw.write(0, 3)                        # meta_bits = 2 (tiles of 4)
        # meta image 2x1: group ids 0 and 1 in red<<8|green
        # (_literal_pixels writes the subimage's cache bit itself)
        _literal_pixels(bw, [(0, 0, 0), (0, 1, 0)])
        # group 0: constant green=10 red=20 blue=30
        _const_group(bw, green_sym=10, red=20, blue=30)
        # group 1: constant green=40 red=50 blue=60
        _const_group(bw, green_sym=40, red=50, blue=60)

    out = decode_webp(_wrap_vp8l(body, w, h))
    exp = np.zeros((1, 8, 3), dtype=np.uint8)
    exp[0, :4] = (20, 10, 30)
    exp[0, 4:] = (50, 40, 60)
    assert np.array_equal(out, exp)


# ---- predictor mode unit pins -------------------------------------


def test_predictor_mode_kernels():
    """Each predictor mode against hand-computed ARGB values."""
    a, b, c = 0xFF102030, 0xFF405060, 0xFF0B0C0D
    assert _avg2(a, b) == 0xFF283848
    assert _select(a, b, c) in (a, b)
    # select: LEFT == TL means the vertical gradient repeats -> TOP;
    # TOP == TL means the horizontal gradient repeats -> LEFT
    assert _select(0xFF000000, 0xFFFFFFFF, 0xFF000000) == 0xFFFFFFFF
    assert _select(0xFFFFFFFF, 0xFF000000, 0xFF000000) == 0xFFFFFFFF
    assert _clamp_add_sub_full(0xFFF0F0F0, 0xFF202020,
                               0xFF101010) == 0xFFFFFFFF
    assert _clamp_add_sub_full(0xFF101010, 0xFF050505,
                               0xFF0A0A0A) == 0xFF0B0B0B
    h = _clamp_add_sub_half(_avg2(0xFF404040, 0xFF808080),
                            0xFF606060)
    assert (h >> 24) & 0xFF == 0xFF
    # full-grid dispatch: every mode returns a valid ARGB word
    img = np.array([[0xFF010203, 0xFF040506],
                    [0xFF070809, 0xFF0A0B0C]], dtype=np.uint32)
    for mode in range(14):
        v = _predict(mode, img, 1, 1, 2)
        assert 0 <= v <= 0xFFFFFFFF
    with pytest.raises(ValueError):
        _predict(14, img, 1, 1, 2)
    # modular per-channel add
    assert _add_pixels(0xFFFF01FE, 0x01020304) == 0x00010402


def test_decode_image_routes_vp8l_natively_and_vp8_raises():
    from vectordb_explorations_spark.operators import multimodal as M

    x = _img(9, 7, 2)
    assert np.array_equal(M.decode_image(encode_vp8l(x)), x)
    if not M.HAS_PIL:
        with pytest.raises(NotImplementedError, match="VP8L|LOSSLESS"):
            M.decode_image(b"RIFF\x20\x00\x00\x00WEBPVP8 \x0c\x00\x00\x00............")


def test_malformed_payloads_raise_valueerror():
    with pytest.raises(ValueError):
        decode_webp(b"not a webp")
    with pytest.raises(ValueError, match="signature"):
        import struct
        body = b"\x00\x00\x00"
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body + b"\x00"
        decode_webp(b"RIFF" + struct.pack("<I", 4 + len(chunk))
                    + b"WEBP" + chunk)
    # truncated entropy data
    x = _img(8, 8, 1)
    p = encode_vp8l(x)
    with pytest.raises(ValueError):
        decode_webp(p[:len(p) - 30])


def test_palette_before_predictor_uses_packed_width():
    """Regression (r14 continuation review): when COLOR_INDEXING with
    sub-byte bundling is read BEFORE PREDICTOR, the predictor inverse
    runs first — on the still-PACKED image — so it must loop the
    packed width, not the full canvas width (the old code indexed
    past the packed array). h=1 exercises the row-0 LEFT override,
    making the expected reconstruction derivable by hand."""
    h, w = 1, 16
    palette = [(250, 0, 10), (0, 200, 30), (17, 18, 19), (9, 9, 9)]
    packed_greens = [17, 34, 51, 68]          # LEFT residuals: all 17
    idx = [(g >> (2 * k)) & 3 for g in packed_greens for k in range(4)]

    def body(bw):
        bw.write(1, 1)
        bw.write(3, 2)                        # COLOR_INDEXING first
        bw.write(3, 8)                        # palette size - 1
        deltas, prev = [], (0, 0, 0)
        for p in palette:
            deltas.append(tuple((a - b) % 256 for a, b in
                          zip(p, prev)))
            prev = p
        _literal_pixels_multi(bw, deltas)
        bw.write(1, 1)
        bw.write(0, 2)                        # PREDICTOR second
        bw.write(2, 3)                        # size_bits = 4 (1 tile)
        bw.write(0, 1)                        # subimage: no cache
        _const_group(bw, green_sym=1)
        bw.write(0, 1)                        # no more transforms
        _literal_pixels(bw, [(0, 17, 0)] * 4, level0=True)

    out = decode_webp(_wrap_vp8l(body, w, h))
    exp = np.array(palette, dtype=np.uint8)[np.array(idx)].reshape(
        1, 16, 3)
    assert np.array_equal(out, exp)
