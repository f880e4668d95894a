"""Native FLAC codec (operators/flac.py): exact lossless round trips
across every subframe type / stereo decorrelation / Rice layout, the
raw-bits escape, CRC verification, sha256-pinned deterministic
payloads, the decode_audio seam routing, and the cross-format
WAV<->FLAC perceptual near-dup pair through the Spark pipeline."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import types as T

from vectordb_explorations_spark.operators.flac import (
    _crc8, _crc16, decode_flac, encode_flac)

ASSET_SCHEMA = T.StructType([T.StructField("asset_id", T.LongType()),
                             T.StructField("payload", T.BinaryType())])


def _signal(n=5000, ch=2, seed=7):
    rng = np.random.default_rng(seed)
    base = np.sin(np.arange(n) / 20)[:, None] * 8000
    return (rng.integers(-2000, 2000, size=(n, ch))
            + base).astype(np.int16)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1",
                                  "fixed2", "fixed3", "fixed4", "lpc"])
@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
def test_round_trip_exact_every_layout(mode, stereo):
    """FLAC is lossless: decode(encode(x)) == x bit-for-bit for every
    subframe type and stereo decorrelation. fixed3/fixed4 over noisy
    data overflow the quotient-bounded Rice parameter, so they also
    exercise the raw-bits escape partitions."""
    x = _signal()
    p = encode_flac(x, 44100, mode=mode, stereo_mode=stereo,
                    block_size=1024)
    y, rate = decode_flac(p)
    assert rate == 44100
    assert np.array_equal(y, x)


def test_long_streams_cross_the_utf8_frame_number_boundary():
    """Frame numbers are UTF-8-coded: numbers >= 128 take multi-byte
    forms whose leading byte once carried an extra one-bit (review
    finding — every stream longer than 128 frames was malformed).
    Pin a 200-frame stream end to end and the coded-number round
    trip across the boundary."""
    from vectordb_explorations_spark.operators.flac import (
        _BitReader, _BitWriter, _read_utf8_number, _write_utf8_number)

    for v in (0, 127, 128, 129, 255, 2047, 2048, 65535, 1 << 20,
              (1 << 36) - 1):
        bw = _BitWriter()
        _write_utf8_number(bw, v)
        bw.align()
        assert _read_utf8_number(_BitReader(bw.bytes())) == v, v
    x = (np.arange(200 * 64) % 251 - 125).astype(np.int16)
    y, rate = decode_flac(encode_flac(x, 8000, block_size=64,
                                      mode="fixed1"))
    assert rate == 8000 and np.array_equal(y[:, 0], x)


def test_rice_partitions_and_odd_tail():
    """Partition order > 0 splits the residual into 2^k Rice chunks
    with independent parameters; a non-dividing tail block falls back
    to verbatim and still reconstructs exactly."""
    rng = np.random.default_rng(3)
    m = np.cumsum(rng.integers(-50, 50, 3001)).astype(np.int16)
    for po in (1, 2, 3):
        y, rate = decode_flac(encode_flac(
            m, 16000, mode="fixed2", block_size=512, part_order=po))
        assert rate == 16000
        assert np.array_equal(y[:, 0], m)


def test_constant_and_8bit_contracts():
    """CONSTANT subframes reconstruct; 8-bit payloads decode shifted
    into the int16 range (the soundfile-path sample contract)."""
    c = np.full(777, -123, np.int16)
    y, rate = decode_flac(encode_flac(c, 8000, mode="constant",
                                      block_size=256))
    assert rate == 8000 and np.array_equal(y[:, 0], c)
    rng = np.random.default_rng(5)
    b8 = rng.integers(-128, 128, 400)
    y, _ = decode_flac(encode_flac(b8, 11025, bps=8, mode="fixed1",
                                   block_size=128))
    assert np.array_equal(y[:, 0], (b8 << 8).astype(np.int16))


def test_fixed_predictor_actually_compresses():
    """The codec is a real compressor, not a container: an order-2
    predictable signal codes smaller under fixed2 than verbatim."""
    rng = np.random.default_rng(3)
    m = np.cumsum(rng.integers(-50, 50, 3000)).astype(np.int16)
    sz_fixed = len(encode_flac(m, 16000, mode="fixed2", block_size=512))
    sz_verb = len(encode_flac(m, 16000, mode="verbatim", block_size=512))
    assert sz_fixed < 0.65 * sz_verb, (sz_fixed, sz_verb)


def test_payload_and_decode_sha256_pinned():
    """No library compressor in the loop: encoded bytes are fully
    deterministic, so the codec pair is pinned BOTH directions (the
    JPEG-pair discipline, sharper than PNG's zlib-dependent bytes)."""
    x = _signal(n=2048, ch=2, seed=42)
    p = encode_flac(x, 32000, mode="lpc", stereo_mode="mid_side",
                    block_size=512, part_order=1)
    assert hashlib.sha256(p).hexdigest() == (
        "403b57581ca79179a47f855f2029a73d"
        "7588979c09f59ad7132ee39431f4d5aa")
    y, rate = decode_flac(p)
    assert rate == 32000 and np.array_equal(y, x)
    assert hashlib.sha256(y.tobytes()).hexdigest() == \
        hashlib.sha256(x.tobytes()).hexdigest()


def test_crc_corruption_raises():
    """Both CRCs are verified: flipping a residual bit breaks the
    frame CRC-16; corrupting the header breaks the CRC-8."""
    x = _signal(n=600, ch=1)
    p = bytearray(encode_flac(x, 22050, mode="fixed1", block_size=600))
    body = bytearray(p)
    body[-3] ^= 0x10                      # inside the last frame body
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(body))
    # locate the frame start (after fLaC + 4-byte block hdr + 34 info)
    frame_start = 4 + 4 + 34
    assert p[frame_start] == 0xFF
    hdr = bytearray(p)
    hdr[frame_start + 4] ^= 0x01          # UTF-8 frame number byte
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(hdr))


def test_malformed_payloads_raise_valueerror():
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"not a flac stream")
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(b"fLaC" + bytes([0x81, 0, 0, 2, 1, 2]))
    x = _signal(n=300, ch=1)
    p = encode_flac(x, 16000, mode="fixed2", block_size=300)
    with pytest.raises(ValueError):
        decode_flac(p[:len(p) - 10])      # truncated mid-frame


def test_crc_self_check():
    """CRC kernels against the published check values for FLAC's
    parameterizations: CRC-8 poly 0x07 init 0 (check 0xF4) and the
    UNREFLECTED CRC-16 poly 0x8005 init 0 (CRC-16/UMTS, check 0xFEE8
    — not the reflected ARC variant's 0xBB3D)."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_decode_audio_routes_flac_natively():
    from vectordb_explorations_spark.operators.multimodal import (
        decode_audio)

    x = _signal(n=1000, ch=2, seed=9)
    y, rate = decode_audio(encode_flac(x, 44100, mode="fixed2",
                                       block_size=256))
    assert rate == 44100 and np.array_equal(y, x)


def test_cross_format_wav_flac_perceptual_pair(spark):
    """The real-world dedup win the native codec unlocks: the SAME
    audio saved as 16-bit PCM WAV and as FLAC is a perceptual
    near-dup pair (different bytes — sha256 is blind to it), found
    through the Spark banded-hash pipeline across containers."""
    from vectordb_explorations_spark.operators.perceptual import (
        AUDIO_N_SAMPLES, audio_hashes, encode_wav16,
        perceptual_audio_pairs)

    rng = np.random.default_rng(17)
    rows, planted = [], set()
    for i in range(5):
        pcm = (np.cumsum(rng.integers(-300, 300, AUDIO_N_SAMPLES * 3))
               .astype(np.int16))
        rows.append((i, bytearray(encode_wav16(pcm))))
        rows.append((100 + i, bytearray(
            encode_flac(pcm, 8000, mode="fixed1", block_size=256))))
        planted.add((i, 100 + i))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_audio_pairs(audio_hashes(assets)).collect()}
    assert pairs == planted, (planted - pairs, pairs - planted)
