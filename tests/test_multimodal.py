"""Multimodal plumbing: Arrow batch shapes, stub behavior, struct assembly."""

import pytest

from vectordb_explorations_spark.operators import multimodal as M
from vectordb_explorations_spark.sources import load_table


def test_feature_extraction_shape(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    feats = M.extract_features(M.synthesize_assets(docs), feature_dim=8)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r = rows[0]
    assert len(r.feature) == 8
    assert len(r.payload_sha) == 64
    assert 0.0 <= r.byte_entropy <= 8.0
    assert r.n_bytes > 0


def test_feature_extraction_deterministic(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(20)
    a = sorted(map(tuple, M.extract_features(M.synthesize_assets(docs)).collect()))
    b = sorted(map(tuple, M.extract_features(M.synthesize_assets(docs)).collect()))
    assert a == b


@pytest.mark.skipif(M.HAS_PIL, reason="PIL present: the seam decodes")
def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...")


def _bmp8(w, h, plte, pixel_data, comp, data_size=None):
    """Hand-built 8-bit BMP container: file header + 40-byte info
    header + BGRA palette + pixel data."""
    import struct

    palette = b"".join(bytes([b, g, r, 0]) for r, g, b in plte)
    off = 14 + 40 + len(palette)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, comp,
                       data_size or len(pixel_data), 0, 0, len(plte), 0)
    head = (b"BM" + struct.pack("<I", off + len(pixel_data))
            + b"\x00" * 4 + struct.pack("<I", off))
    return head + info + palette + pixel_data


def test_bmp_8bit_palette_and_rle8():
    """8-bit palette BMP decodes through the color table (uncompressed
    AND RLE8: encoded runs, absolute runs with word alignment, EOL /
    delta / EOF escapes); both forms resolve to the same RGB."""
    import numpy as np

    plte = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    # target 5x3 index grid (top row first)
    idx = np.array([[0, 1, 2, 3, 0],
                    [1, 1, 1, 2, 2],
                    [3, 0, 0, 0, 0]], dtype=np.uint8)
    want = np.array(plte, dtype=np.uint8)[idx]
    # uncompressed: bottom-up rows, 4-byte padded (stride 8)
    raw = b"".join(idx[y].tobytes() + b"\x00\x00\x00"
                   for y in (2, 1, 0))
    out = M.decode_image(_bmp8(5, 3, plte, raw, comp=0))
    assert np.array_equal(out, want)
    # RLE8, bottom-up: row y=2 via absolute run (5 px, odd -> pad),
    # row y=1 via encoded runs, row y=0 via runs + delta-skip zeros
    rle = (b"\x00\x05" + bytes([3, 0, 0, 0, 0]) + b"\x00"  # absolute+pad
           + b"\x00\x00"                                    # EOL
           + b"\x03\x01" + b"\x02\x02"                      # 111 22
           + b"\x00\x00"                                    # EOL
           + b"\x01\x00" + b"\x01\x01" + b"\x01\x02"        # 0 1 2
           + b"\x01\x03" + b"\x01\x00"                      # 3 0
           + b"\x00\x01")                                   # EOF
    out = M.decode_image(_bmp8(5, 3, plte, rle, comp=1))
    assert np.array_equal(out, want)
    # delta escape: skip stays palette[0] (index 0 prefilled)
    rle_delta = (b"\x00\x02\x02\x00" + b"\x02\x01"  # delta (2,0), 2x idx1
                 + b"\x00\x01")                     # EOF
    want2 = np.zeros((1, 4), dtype=np.uint8)
    want2 = np.array(plte, dtype=np.uint8)[
        np.array([[0, 0, 1, 1]], dtype=np.uint8)]
    out = M.decode_image(_bmp8(4, 1, plte, rle_delta, comp=1))
    assert np.array_equal(out, want2)


def test_bmp_rle4_and_bitfields():
    """RLE4 (nibble-alternating runs, packed absolute runs) and
    BI_BITFIELDS (565 16-bit and 8888 32-bit mask layouts)."""
    import struct

    import numpy as np

    plte = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    # RLE4, 1 row of 6: run of 5 alternating (1,2) + absolute 1 idx 3
    rle = (b"\x05\x12"            # 1,2,1,2,1
           + b"\x00\x03" + bytes([0x30, 0x00])  # absolute 3: 3,0,0
           + b"\x00\x01")                       # EOF
    # absolute run of 3 -> nbytes=2, pad to word: 2 bytes no pad
    payload = _bmp8(8, 1, plte, rle, comp=2)
    # patch bpp to 4 (the helper writes 8)
    payload = bytearray(payload)
    payload[28:30] = struct.pack("<H", 4)
    out = M.decode_image(bytes(payload))
    want = np.array(plte, dtype=np.uint8)[
        np.array([[1, 2, 1, 2, 1, 3, 0, 0]])]
    assert np.array_equal(out, want)

    # 16-bit 565 bitfields, 2x2 bottom-up
    def bmp_bitfields(w, h, bpp, masks, pixdata):
        off = 14 + 40 + 12
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 3,
                           len(pixdata), 0, 0, 0, 0)
        head = (b"BM" + struct.pack("<I", off + len(pixdata))
                + b"\x00" * 4 + struct.pack("<I", off))
        return head + info + struct.pack("<III", *masks) + pixdata

    px = [[0xF800, 0x07E0], [0x001F, 0xFFFF]]  # R, G / B, white
    rows = b""
    for r in (1, 0):                          # bottom-up
        rows += struct.pack("<HH", *px[r])    # stride 4, no pad
    out = M.decode_image(bmp_bitfields(
        2, 2, 16, (0xF800, 0x07E0, 0x001F), rows))
    want = np.array([[[255, 0, 0], [0, 255, 0]],
                     [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    assert np.array_equal(out, want)

    # 32-bit 8888 bitfields, top-down (negative height)
    vals = np.array([[0x00123456, 0x00ABCDEF]], dtype="<u4")
    out = M.decode_image(bmp_bitfields(
        2, -1, 32, (0x00FF0000, 0x0000FF00, 0x000000FF),
        vals.tobytes()))
    want = np.array([[[0x12, 0x34, 0x56], [0xAB, 0xCD, 0xEF]]],
                    dtype=np.uint8)
    assert np.array_equal(out, want)


def test_16bit_netpbm_folds_to_high_byte():
    """maxval > 255 netpbm: two-byte big-endian samples fold to the
    high byte (exact at maxval 65535 — the PNG 16-bit contract)."""
    import numpy as np

    px = np.arange(12, dtype=np.uint16).reshape(2, 6) * 5000 + 123
    payload = b"P5\n6 2\n65535\n" + px.astype(">u2").tobytes()
    assert np.array_equal(M.decode_image(payload),
                          (px >> 8).astype(np.uint8))
    rgb = (np.arange(24, dtype=np.uint16).reshape(2, 4, 3) << 8) | 7
    payload = b"P6\n4 2\n65535\n" + rgb.astype(">u2").tobytes()
    assert np.array_equal(M.decode_image(payload),
                          (rgb >> 8).astype(np.uint8))
    with pytest.raises(ValueError, match="maxval"):
        M.decode_image(b"P5\n2 2\n70000\n" + b"\x00" * 16)


def test_modalities_cycle(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    assets = M.synthesize_assets(docs)
    mods = {r.modality for r in assets.select("modality").distinct().collect()}
    assert mods == set(M.MODALITIES)


def test_struct_schema(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    rec = M.multimodal_struct(docs, emb)
    fields = {f.name for f in rec.schema["record"].dataType.fields}
    assert fields == {"text", "lang", "source", "n_chars", "embedding", "label"}


def test_resize_images_shape_and_determinism(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).where("doc_id < 200")
    assets = M.synthesize_assets(docs)
    out = M.resize_images(assets, out_w=8, out_h=8)
    rows = out.collect()
    n_images = assets.where("modality = 'image'").count()
    assert len(rows) == n_images and n_images > 0
    assert all(r["out_w"] == 8 and r["out_h"] == 8 for r in rows)
    again = {r["asset_id"]: r["resized_sha"] for r in out.collect()}
    assert {r["asset_id"]: r["resized_sha"] for r in rows} == again


def test_sample_frames_fanout(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).where("doc_id < 200")
    assets = M.synthesize_assets(docs)
    frames = M.sample_frames(assets, frame_bytes=64, every_nth=2).collect()
    vids = assets.where("modality = 'video'").count()
    assert vids > 0
    # every video yields >= 1 frame; multi-chunk payloads fan out to > 1
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert len(per_asset) == vids
    assert any(len(v) > 1 for v in per_asset.values())
    for rows in per_asset.values():
        for r in rows:
            assert r["byte_offset"] == r["frame_idx"] * 64
            assert r["frame_idx"] % 2 == 0


# ---- pure-NumPy codecs (no PIL/cv2 in the container: netpbm/BMP/WAV are
# header+raw formats, decodable with index math alone) ----

def _ppm(w, h, px):
    return b"P6\n# c\n%d %d\n255\n" % (w, h) + bytes(px)


def test_decode_netpbm_p6_and_p5():
    import numpy as np
    img = M.decode_image(_ppm(2, 2, [255, 0, 0,  0, 255, 0,
                                     0, 0, 255,  9, 9, 9]))
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 1].tolist() == [9, 9, 9]
    gray = M.decode_image(b"P5\n3 1\n255\n" + bytes([1, 2, 3]))
    assert gray.shape == (1, 3) and gray.tolist() == [[1, 2, 3]]


def test_decode_bmp_bottom_up_with_padding():
    import numpy as np
    # 2x2 24-bit BMP: stride 8 (2 px * 3 B -> padded to 8), bottom-up
    w, h, stride = 2, 2, 8
    off = 14 + 40
    top = [(255, 0, 0), (0, 255, 0)]      # logical top row, RGB
    bot = [(0, 0, 255), (10, 20, 30)]
    def row(px):
        b = b"".join(bytes([b_, g, r]) for r, g, b_ in px)  # stored BGR
        return b + b"\x00" * (stride - len(b))
    data = row(bot) + row(top)            # bottom-up storage
    hdr = (b"BM" + (off + len(data)).to_bytes(4, "little") + b"\x00" * 4
           + off.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + b"\x00" * 20)
    img = M.decode_image(hdr + data)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]   # top-left red
    assert img[1, 1].tolist() == [10, 20, 30]


def test_decode_wav_pcm16():
    import numpy as np
    samples = np.array([[0, 1], [2, 3], [-4, -5]], dtype="<i2")
    data = samples.tobytes()
    fmt = ((1).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    wav = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
           + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
           + b"data" + len(data).to_bytes(4, "little") + data)
    arr, rate = M.decode_audio(wav)
    assert rate == 8000 and arr.shape == (3, 2)
    assert arr.tolist() == samples.tolist()


@pytest.mark.skipif(M.HAS_PIL, reason="PIL present: the seam decodes")
def test_decode_compressed_raises():
    """Formats with no native path (WebP here; PNG/JPEG went native in
    r14) still raise the documented PIL swap-in message without
    Pillow. A TRUNCATED native-format payload is a different contract:
    malformed data -> ValueError, not a codec-availability error."""
    import pytest
    with pytest.raises(NotImplementedError):
        M.decode_image(b"RIFF\x20\x00\x00\x00WEBPVP8 ....")
    with pytest.raises(ValueError):
        M.decode_image(b"\x89PNG\r\n\x1a\n....")


# --- runtime codec capability seams (env-gated: skipped where the codec
# libraries are absent, green where they exist — r10 verdict item 5) ---

@pytest.mark.skipif(not M.HAS_PIL, reason="Pillow not installed")
def test_pil_seam_decodes_png_roundtrip():
    """Where Pillow exists, a PNG round-trips through the seam to the
    exact pixels — and the NATIVE paths still own their formats, so
    declared hashes cannot change with the environment."""
    import io

    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = io.BytesIO()
    M._PIL_IMAGE.fromarray(px, mode="RGB").save(buf, format="PNG")
    out = M.decode_image(buf.getvalue())
    assert out.shape == (2, 3, 3) and (out == px).all()
    # native format still takes the NumPy path (contract: shape + values)
    ppm = b"P6\n3 2\n255\n" + px.tobytes()
    assert (M.decode_image(ppm) == px).all()


@pytest.mark.skipif(not M.HAS_SOUNDFILE, reason="soundfile not installed")
def test_soundfile_seam_decodes_flac_roundtrip():
    import io

    import numpy as np

    samples = (np.sin(np.linspace(0, 8, 800)) * 20000).astype(np.int16)
    buf = io.BytesIO()
    M._SOUNDFILE.write(buf, samples, 8000, format="FLAC")
    arr, rate = M.decode_audio(buf.getvalue())
    assert rate == 8000 and arr.shape == (800, 1)
    assert np.abs(arr[:, 0].astype(int) - samples.astype(int)).max() <= 1


def test_resize_images_real_decode_path(spark):
    """A decodable PPM payload goes through the REAL decode + NN resize:
    the recorded dims are the header's, and the sha matches the kernel
    applied locally."""
    import hashlib
    import numpy as np
    payload = _ppm(4, 2, range(4 * 2 * 3))
    assets = spark.createDataFrame(
        [(1, "image", bytearray(payload), {})], schema=M.ASSET_SCHEMA)
    row = M.resize_images(assets, out_w=2, out_h=2).collect()[0]
    assert (row["src_w"], row["src_h"]) == (4, 2)
    expect = np.ascontiguousarray(
        M.nn_resize(M.decode_image(payload), 2, 2))
    assert row["resized_sha"] == hashlib.sha256(expect.tobytes()).hexdigest()


def test_resize_real_flat_excludes_multibyte_prefix(spark):
    """A doc whose prefix contains a multi-byte char must be filtered out
    (its UTF-8 payload would exceed the raster size and silently take the
    fake-fallback path while the char-indexed oracle still emitted it —
    round-5 ADVICE); pure-ASCII docs of sufficient length stay."""
    n = 8 * 6 * 3
    rows = [(1, "é" + "a" * n, "en", n + 1),     # multi-byte in prefix: out
            (2, "a" * n, "en", n),               # exactly n ASCII: in
            (3, "a" * (n - 1), "en", n - 1),     # too short: out
            (4, "a" * n + "é", "en", n + 1)]     # multi-byte after prefix: in
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    got = sorted(r.asset_id for r in M.resize_real_flat(docs).collect())
    assert got == [2, 4]


# --- G.711 mu-law / A-law and IEEE-float WAV (native, r14 cont.) ---


def test_g711_tables_match_reference_values():
    """Spot-pin the normative G.711 reconstruction levels: mu-law
    0x00 -> -32124 (max negative), 0xFF -> 0; A-law 0x55 -> -8,
    0xD5 -> +8 (min magnitudes), 0x2A -> -32256, 0xAA -> +32256."""
    assert M._MULAW_LEVELS[0x00] == -32124
    assert M._MULAW_LEVELS[0xFF] == 0
    assert M._ALAW_LEVELS[0x55] == -8
    assert M._ALAW_LEVELS[0xD5] == 8
    assert M._ALAW_LEVELS[0x2A] == -32256
    assert M._ALAW_LEVELS[0xAA] == 32256


def test_g711_codec_roundtrips():
    """encode(decode(byte)) == byte for every A-law codeword and every
    mu-law codeword except 0xFF (negative zero duplicates positive
    zero; the deterministic encoder picks the lower byte 0x7F), and
    decode(encode(s)) stays within the largest half-step + clip
    margin for the full int16 range."""
    import numpy as np

    all_bytes = np.arange(256, dtype=np.uint8)
    a_rt = M._g711_encode(M._ALAW_LEVELS[all_bytes], M._ALAW_LEVELS)
    assert (a_rt == all_bytes).all()
    m_rt = M._g711_encode(M._MULAW_LEVELS[all_bytes], M._MULAW_LEVELS)
    keep = all_bytes != 0xFF
    assert (m_rt[keep] == all_bytes[keep]).all()
    assert m_rt[0xFF] == 0x7F

    s = np.linspace(-32768, 32767, 4001).astype(np.int16)
    for levels in (M._MULAW_LEVELS, M._ALAW_LEVELS):
        dec = levels[M._g711_encode(s, levels)]
        assert np.abs(dec.astype(np.int64) - s.astype(np.int64)).max() \
            <= 650


def test_decode_wav_g711_and_float_formats():
    """decode_audio handles format tags 6/7/3 natively: G.711 decodes
    land on reconstruction levels (value-exact vs the table), IEEE
    float32 round-trips int16 samples bit-exactly."""
    import numpy as np

    rng = np.random.default_rng(23)
    s = rng.integers(-32768, 32768, 500).astype(np.int16)
    for law, levels in (("mulaw", M._MULAW_LEVELS),
                        ("alaw", M._ALAW_LEVELS)):
        arr, rate = M.decode_audio(M.encode_wav_g711(s, law=law))
        assert rate == 8000 and arr.shape == (500, 1)
        expect = levels[M._g711_encode(s, levels)]
        assert (arr[:, 0] == expect).all()
    arr, rate = M.decode_audio(M.encode_wav_float32(s))
    assert rate == 8000 and (arr[:, 0] == s).all()
    # extremes survive the clip(rint(x*32767)) contract
    ext = np.array([-32768, -32767, 0, 1, 32767], dtype=np.int16)
    arr, _ = M.decode_audio(M.encode_wav_float32(ext))
    assert arr[:, 0].tolist() == [-32768, -32767, 0, 1, 32767]


def test_decode_wav_extensible_format_tag():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves the real tag from the
    SubFormat GUID head — a 16-bit PCM payload wrapped in an
    extensible fmt chunk decodes exactly like the plain tag-1 form."""
    import numpy as np

    samples = np.array([100, -200, 300], dtype="<i2")
    data = samples.tobytes()
    fmt = ((0xFFFE).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little")
           + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + (22).to_bytes(2, "little")        # cbSize
           + (16).to_bytes(2, "little")        # valid bits
           + (4).to_bytes(4, "little")         # channel mask
           + (1).to_bytes(2, "little") + b"\x00" * 14)   # GUID: PCM
    wav = (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data))
           .to_bytes(4, "little")
           + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
           + b"data" + len(data).to_bytes(4, "little") + data)
    arr, rate = M.decode_audio(wav)
    assert rate == 8000 and arr[:, 0].tolist() == [100, -200, 300]


def test_cross_format_wav_g711_perceptual_pair(spark):
    """The dedup win the G.711 path unlocks: the SAME signal as 16-bit
    PCM and as its mu-law telephony re-encode is a perceptual
    near-dup pair across byte-disjoint containers (the WAV<->FLAC
    discipline extended to a LOSSY companding codec)."""
    import numpy as np
    from pyspark.sql import types as T

    from vectordb_explorations_spark.operators.perceptual import (
        AUDIO_N_SAMPLES, audio_hashes, encode_wav16,
        perceptual_audio_pairs)

    schema = T.StructType([T.StructField("asset_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    rng = np.random.default_rng(29)
    rows, planted = [], set()
    for i in range(5):
        pcm = (np.cumsum(rng.integers(-300, 300, AUDIO_N_SAMPLES * 3))
               .astype(np.int16))
        rows.append((i, bytearray(encode_wav16(pcm))))
        rows.append((100 + i, bytearray(M.encode_wav_g711(pcm))))
        planted.add((i, 100 + i))
    assets = spark.createDataFrame(rows, schema)
    pairs = {(r["id_a"], r["id_b"]) for r in
             perceptual_audio_pairs(audio_hashes(assets)).collect()}
    assert pairs == planted, (planted - pairs, pairs - planted)
