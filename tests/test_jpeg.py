"""Pure-NumPy JPEG codec (operators/jpeg.py, r13 verdict item 3 +
r14 progressive): round-trip quality, determinism (hash-pinned
payload AND decode), the capability-seam routing in
multimodal.decode_image, the real-world decoder paths (4:2:0 MCU
interleave, restart intervals, progressive multi-scan refinement),
and planted perceptual near-dup recall over JPEG payloads — the
dominant real-corpus format the perceptual family previously could
not ingest in this container."""

import hashlib

import numpy as np
import pytest

from vectordb_explorations_spark.operators.jpeg import (
    decode_baseline_jpeg, decode_jpeg, encode_baseline_jpeg,
    encode_progressive_jpeg)


def _gradient(h=41, w=53):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 3) % 256, (xx * 2) % 256,
                     ((xx + yy) * 2) % 256], -1).astype(np.uint8)


def _smooth(seed, h=48, w=64):
    """Low-frequency procedural image — distinct per seed, stable
    under lossy re-encode (what perceptual hashes are built for)."""
    yy, xx = np.mgrid[0:h, 0:w]
    p = float(seed)
    return np.stack([
        128 + 90 * np.sin(yy / (5.0 + p % 7)) * np.cos(xx / (6.0 + p % 5)),
        128 + 70 * np.cos(yy / 4.5 + p),
        128 + 80 * np.sin(xx / 8.0 + 2 * p),
    ], -1).clip(0, 255).astype(np.uint8)


def test_flat_images_round_trip_exactly():
    """DC-only payloads reconstruct exactly in every mode — the
    sharpest possible correctness pin on the quantize/Huffman/IDCT
    chain (any systematic bias shows up as a level shift here)."""
    for shape in ((24, 17, 3), (30, 22, 3), (16, 16)):
        flat = np.full(shape, 130, dtype=np.uint8)
        for sub in ("444", "422", "420"):
            if flat.ndim == 2 and sub != "444":
                continue
            out = decode_baseline_jpeg(
                encode_baseline_jpeg(flat, 90, sub))
            assert out.shape == flat.shape
            assert np.array_equal(out, flat), (shape, sub)


def test_gradient_round_trip_error_bounds():
    img = _gradient()
    for sub, bound in (("444", 4), ("422", 6), ("420", 8)):
        out = decode_baseline_jpeg(encode_baseline_jpeg(img, 90, sub))
        err = np.abs(out.astype(int) - img.astype(int))
        assert out.shape == img.shape
        assert err.max() <= bound, (sub, err.max())
        assert err.mean() < 2.0, (sub, err.mean())


def test_grayscale_and_odd_dimensions():
    g = _gradient()[:, :, 0].copy()          # (41, 53) odd dims
    out = decode_baseline_jpeg(encode_baseline_jpeg(g, 90))
    assert out.shape == g.shape and out.ndim == 2
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 4


def test_codec_pair_hash_pinned():
    """The round-trip pair hash-checked: fixed procedural input ->
    byte-identical JPEG payload -> bit-identical decode, pinned by
    sha256 on both sides. Everything is pure NumPy with fixed tables,
    so these hashes are environment-independent; a drift here means
    the codec's semantics changed."""
    img = _smooth(0)
    enc = encode_baseline_jpeg(img, quality=90, subsampling="420")
    assert hashlib.sha256(enc).hexdigest() == \
        "c8f79f6b3f4faf93adeb7fc22ea6943daea86d24987abbb4ee5be549c9b078f8"
    dec = decode_baseline_jpeg(enc)
    assert hashlib.sha256(dec.tobytes()).hexdigest() == \
        "d5df76950802ce6bae3eea595ee9a04c52a10b7286d323e36a4ccc00bf45c65e"
    # and the pair is idempotent run-to-run
    assert encode_baseline_jpeg(img, 90, "420") == enc
    assert np.array_equal(decode_baseline_jpeg(enc), dec)


def test_restart_intervals_decode_bit_equal():
    """DRI/RSTn handling: the same image encoded with restart markers
    at several intervals must decode bit-identically to the
    marker-free stream (predictor resets + byte alignment)."""
    img = _gradient()
    for sub in ("444", "422", "420"):
        base = decode_baseline_jpeg(encode_baseline_jpeg(img, 90, sub))
        for ri in (1, 2, 3, 5):
            out = decode_baseline_jpeg(
                encode_baseline_jpeg(img, 90, sub,
                                     restart_interval=ri))
            assert np.array_equal(out, base), (sub, ri)


def test_decode_image_seam_routes_jpeg_natively():
    """multimodal.decode_image must decode baseline JPEG through the
    pure-NumPy path — no PIL in this container, and the declared
    shape contract (uint8, (h,w) / (h,w,3)) holds."""
    from vectordb_explorations_spark.operators.multimodal import (
        decode_image)

    img = _smooth(3)
    payload = encode_baseline_jpeg(img, 85, "420")
    out = decode_image(payload)
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert np.array_equal(out, decode_baseline_jpeg(payload))


def test_progressive_decode_bit_equals_baseline():
    """The strongest possible pin on the progressive layer: both
    encoders share one quantization front half, so the multi-scan
    SOF2 stream (spectral selection + successive approximation: DC
    first/refine, AC first with EOB runs, AC refinement with pending
    correction bits) must reconstruct coefficient planes IDENTICAL to
    the single-scan baseline stream — decodes compare bit-for-bit."""
    rng = np.random.default_rng(1)
    noisy = rng.integers(0, 256, (37, 29, 3)).astype(np.uint8)
    cases = [(_gradient(), ("444", "422", "420")),
             (_smooth(2), ("444", "420")),
             (noisy, ("444", "420")),          # dense AC coefficients
             (_gradient()[:, :, 0].copy(), ("444",))]
    for img, subs in cases:
        for sub in subs:
            for q in (90, 75):
                base = decode_jpeg(encode_baseline_jpeg(img, q, sub))
                prog = decode_jpeg(encode_progressive_jpeg(img, q, sub))
                assert np.array_equal(base, prog), (img.shape, sub, q)


def test_progressive_restart_intervals_bit_equal():
    """RSTn inside progressive scans: DC predictors AND EOB-run /
    correction-bit state reset at every marker, in interleaved and
    single-component scans alike."""
    img = _gradient()
    for sub in ("444", "420"):
        base = decode_jpeg(encode_progressive_jpeg(img, 90, sub))
        for ri in (1, 2, 3, 5):
            out = decode_jpeg(encode_progressive_jpeg(
                img, 90, sub, restart_interval=ri))
            assert np.array_equal(out, base), (sub, ri)


def test_progressive_codec_pair_hash_pinned():
    """Fixed input -> byte-identical SOF2 payload -> bit-identical
    decode, sha256 both directions (the baseline-pair discipline)."""
    img = _smooth(0)
    enc = encode_progressive_jpeg(img, quality=90, subsampling="420")
    assert hashlib.sha256(enc).hexdigest() == (
        "b1b93f5d951532ae557965b374ec414a"
        "9632edd8d0133274f6b549b753f5d001")
    dec = decode_jpeg(enc)
    # identical quantization -> the decode hash IS the baseline pair's
    assert hashlib.sha256(dec.tobytes()).hexdigest() == \
        "d5df76950802ce6bae3eea595ee9a04c52a10b7286d323e36a4ccc00bf45c65e"
    assert encode_progressive_jpeg(img, 90, "420") == enc


def test_progressive_decodes_through_decode_image():
    from vectordb_explorations_spark.operators.multimodal import (
        decode_image)

    img = _smooth(5)
    payload = encode_progressive_jpeg(img, 85, "420")
    assert np.array_equal(decode_image(payload), decode_jpeg(payload))


def test_non_huffman_processes_raise_toward_the_seam():
    """SOF2 now decodes natively; the processes that still route to
    PIL are the non-Huffman ones (arithmetic SOF9 here)."""
    sof9 = (b"\xff\xd8" + b"\xff\xc9" + (11).to_bytes(2, "big")
            + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_baseline_jpeg(sof9)


def test_malformed_payloads_raise_value_error():
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        # SOI but no SOS
        decode_baseline_jpeg(b"\xff\xd8\xff\xd9")


def test_planted_perceptual_recall_over_jpeg(spark):
    """The point of the codec: perceptual near-dup dedup over JPEG
    payloads, end to end through the Spark pipeline. 12 distinct
    procedural images; 6 planted near-dup partners are the SAME image
    re-encoded at a different quality/subsampling (the lossy-re-encode
    twin sha256 can never see). Banded dHash candidates + Hamming
    verify must find every planted pair — recall 1.0 — and pair no
    distinct images."""
    from vectordb_explorations_spark.operators.perceptual import (
        image_hashes, perceptual_image_pairs)

    rows = []
    planted = set()
    for i in range(12):
        img = _smooth(i)
        rows.append((i, bytearray(encode_baseline_jpeg(img, 90, "444"))))
        if i < 6:
            rows.append((100 + i, bytearray(
                encode_baseline_jpeg(img, 75, "420"))))
            planted.add((i, 100 + i))
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")
    hashes = image_hashes(assets)
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_image_pairs(hashes).collect()}
    assert planted <= pairs, planted - pairs      # recall 1.0
    # no cross-image false pairs: every found pair is a planted twin
    assert pairs == planted, pairs - planted


def test_12bit_extended_sequential():
    """precision=12 emits SOF1 extended sequential (samples lifted
    x16, flat wide-category Huffman tables); the decoder folds the
    12-bit reconstruction to the top 8 bits. Flat images come back
    EXACTLY (quantization error vanishes under the fold); structured
    images land at-or-below the 8-bit path's error; restart markers
    compose."""
    for shape in ((24, 17, 3), (16, 16)):
        flat = np.full(shape, 130, np.uint8)
        out = decode_jpeg(encode_baseline_jpeg(flat, 90, "444",
                                               precision=12))
        assert np.array_equal(out, flat), shape
    img = _gradient()
    for sub in ("444", "420"):
        e12 = np.abs(decode_jpeg(encode_baseline_jpeg(
            img, 90, sub, precision=12)).astype(int)
            - img.astype(int)).max()
        e8 = np.abs(decode_jpeg(encode_baseline_jpeg(
            img, 90, sub)).astype(int) - img.astype(int)).max()
        assert e12 <= e8, (sub, e12, e8)
    base = decode_jpeg(encode_baseline_jpeg(img, 90, "444",
                                            precision=12))
    for ri in (1, 3):
        out = decode_jpeg(encode_baseline_jpeg(
            img, 90, "444", precision=12, restart_interval=ri))
        assert np.array_equal(out, base), ri
    # SOF0 with 12-bit precision is malformed, not a seam
    bad = bytearray(encode_baseline_jpeg(img, 90, "444", precision=12))
    i = bad.find(b"\xff\xc1")
    bad[i + 1] = 0xC0
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(bad))


def test_ac_refinement_zrl_correction_bit_ordering():
    """Regression (r14 continuation review): a refinement band with
    >15 consecutive zero-history zeros followed by a history
    coefficient (|v| >= 2) and then a newly-significant one (|v| == 1)
    — zigzag [dc, 0 x 20, 2, 1, 0...] — desynced the old encoder,
    which buffered the history coefficient's correction bit BEFORE
    emitting the pending ZRL (the decoder consumes that bit inside the
    ZRL's 16-zero advance). The block is synthesized through the DCT
    domain so the public encode path reproduces the exact quantized
    layout."""
    import numpy as np

    from vectordb_explorations_spark.operators import jpeg as J

    q = 50
    Q = J._scaled_quant(J.QUANT_LUMA, q).astype(np.float64).reshape(8, 8)
    zz = np.zeros(64)
    zz[0] = 4
    zz[21] = 2
    zz[22] = 1
    coefs = np.zeros(64)
    coefs[J.ZIGZAG] = zz
    spatial = J._T.T @ (coefs.reshape(8, 8) * Q) @ J._T
    img = np.clip(np.rint(spatial + 128), 0, 255).astype(np.uint8)
    # the crafted layout really is what the encoder quantizes to
    *_, quantized = J._prepare_quantized(img, q, "444")
    zzq = quantized[0][:, J.ZIGZAG][0]
    assert not zzq[1:21].any() and zzq[21] == 2 and zzq[22] == 1
    b = J.decode_jpeg(J.encode_baseline_jpeg(img, q))
    p = J.decode_jpeg(J.encode_progressive_jpeg(img, q))
    assert np.array_equal(b, p)


def test_decode_skips_marker_fill_bytes():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; the old parser read 0xFF,0xFF as a marker id 0xFF with a
    garbage length and lost the SOS."""
    import numpy as np

    from vectordb_explorations_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    payload = J.encode_baseline_jpeg(img, 75)
    i = payload.index(b"\xff\xda")          # SOS marker
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    assert np.array_equal(J.decode_jpeg(padded), J.decode_jpeg(payload))
