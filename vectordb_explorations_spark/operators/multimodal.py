"""Multimodal columns: image/audio/video as opaque BINARY payloads with
typed metadata, processed by Arrow-batched Python (`mapInPandas`) — the
north-star "multimodal columns" extension (BASELINE.json; absent from the
reference, which knows only float vectors).

Container reality: no codec libraries (PIL/cv2/ffmpeg) are installed.
Codec-free formats decode for REAL with pure NumPy — binary netpbm (P5/P6)
and uncompressed BMP images, 8/16-bit PCM WAV audio — and resize runs a
real nearest-neighbor kernel on them. Compressed formats route through a
RUNTIME CAPABILITY PROBE (``HAS_PIL`` / ``HAS_SOUNDFILE``, r10 verdict
item 5): where Pillow/soundfile exist the seam decodes for real; where
they don't, the decode step raises NotImplementedError naming the
swap-in, with a deterministic fake fallback so every stage shape still
executes. The native NumPy paths always win for the formats they cover,
so declared query hashes never depend on the environment.
Everything Spark-side — schema, batch iteration, partition behavior, UDF
signatures, struct assembly — is real and tested either way.

Scale shape: payload bytes never shuffle except where explicitly keyed;
feature extraction is a narrow mapInPandas over whatever partitioning the
source has; derived features are small fixed-width columns.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6
from pyspark.sql import types as T

def _optional_import(name: str):
    """Runtime codec capability probe (r10 verdict item 5): import the
    library if the environment has it, else None — so the compressed-
    codec seams light up automatically where PIL/soundfile exist, with
    zero behavior change (and zero declared-hash change) where they
    don't. Probed once at import; workers re-probe on first use of the
    module (the import rides the pickled closure's module reference)."""
    import importlib
    try:
        return importlib.import_module(name)
    except Exception:
        return None


_PIL_IMAGE = _optional_import("PIL.Image")
_SOUNDFILE = _optional_import("soundfile")
HAS_PIL = _PIL_IMAGE is not None
HAS_SOUNDFILE = _SOUNDFILE is not None

MODALITIES = ["text", "image", "audio", "video"]

ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_sha", T.StringType()),
    T.StructField("byte_entropy", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Deterministic multimodal fixture: each document becomes an asset
    whose payload is its UTF-8 text bytes and whose modality cycles through
    MODALITIES by doc_id — a stand-in for real blob columns (the real
    pipeline reads payloads from parquet BINARY or object-store URIs)."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES)).cast("int") + 1)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string")).alias("meta"))


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary netpbm: P5 (grayscale) -> (h, w); P6 (RGB) -> (h, w, 3).
    Header is whitespace-separated ASCII tokens with '#' comments; pixel
    data follows the maxval token's single whitespace byte. maxval >
    255 selects two-byte big-endian samples, folded to the high byte
    (exact for maxval 65535 — the same I;16 -> L contract as PNG)."""
    magic = payload[:2]
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval <= 0 or maxval > 65535:
        raise ValueError(f"netpbm: illegal maxval {maxval}")
    i += 1  # exactly one whitespace byte after maxval
    ch = 3 if magic == b"P6" else 1
    if maxval > 255:  # two-byte big-endian samples -> high byte
        arr = np.frombuffer(payload, dtype=">u2", count=w * h * ch,
                            offset=i)
        arr = (arr >> 8).astype(np.uint8)
    else:
        arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch,
                            offset=i)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def _bmp_palette(payload: bytes, bpp: int) -> np.ndarray:
    """BGRA palette entries following the 40-byte BITMAPINFOHEADER ->
    (n, 3) RGB (biClrUsed of 0 means the full 2^bpp table)."""
    hdr_size = int.from_bytes(payload[14:18], "little")
    n_used = int.from_bytes(payload[46:50], "little") or (1 << bpp)
    base = 14 + hdr_size
    tbl = np.frombuffer(payload, dtype=np.uint8, count=n_used * 4,
                        offset=base).reshape(n_used, 4)
    return tbl[:, [2, 1, 0]].copy()          # BGRA -> RGB


def _decode_rle(data: bytes, w: int, ah: int, four: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 (compression 1 / 2) -> (ah, w) palette
    indices, bottom-up row order as stored. Encoded runs (RLE4: the
    run byte alternates its two nibbles), absolute runs
    (word-aligned; RLE4 packs two indices per byte), and the
    0-escapes: end-of-line, end-of-bitmap, delta."""
    idx = np.zeros((ah, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:                          # encoded run
            if four:
                pair = (val >> 4, val & 0x0F)
                for k in range(cnt):
                    if x < w and y < ah:
                        idx[y, x] = pair[k & 1]
                    x += 1
            else:
                end = min(x + cnt, w)
                if y < ah:
                    idx[y, x:end] = val
                x += cnt
        elif val == 0:                       # end of line
            x, y = 0, y + 1
        elif val == 1:                       # end of bitmap
            break
        elif val == 2:                       # delta
            if i + 1 >= n:
                raise ValueError("BMP: truncated RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                                # absolute run of `val`
            nbytes = (val + 1) // 2 if four else val
            if i + nbytes > n:
                raise ValueError("BMP: truncated RLE absolute run")
            for k in range(val):
                b = data[i + (k // 2 if four else k)]
                v = ((b >> 4) if k % 2 == 0 else (b & 0x0F)) \
                    if four else b
                if x < w and y < ah:
                    idx[y, x] = v
                x += 1
            i += nbytes + (nbytes & 1)       # word-aligned
    return idx


def _mask_channel(px: np.ndarray, mask: int) -> np.ndarray:
    """Extract one bitfield channel scaled to 0..255."""
    if mask == 0:
        return np.zeros(px.shape, dtype=np.uint8)
    shift = (mask & -mask).bit_length() - 1
    span = mask >> shift
    v = (px & mask) >> shift
    return (v * 255 // span).astype(np.uint8)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """BMP -> (h, w, 3) RGB: uncompressed 24/32-bit, uncompressed
    8-bit palette, RLE8/RLE4-compressed palettes, and 16/32-bit
    BI_BITFIELDS (mask-extracted channels scaled to 0..255). Rows are
    4-byte padded and stored bottom-up (top-down when the height
    field is negative)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    bottom_up, ah = h > 0, abs(h)
    if (comp == 1 and bpp == 8) or (comp == 2 and bpp == 4):
        plte = _bmp_palette(payload, bpp)    # BI_RLE8 / BI_RLE4
        idx = _decode_rle(payload[off:], w, ah, four=comp == 2)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("BMP: palette index out of range")
        rgb = plte[idx]
        return rgb[::-1].copy() if bottom_up else rgb.copy()
    if comp == 0 and bpp == 8:               # uncompressed palette
        plte = _bmp_palette(payload, bpp)
        stride = (w + 3) & ~3
        rows = np.frombuffer(payload, dtype=np.uint8,
                             count=stride * ah, offset=off)
        idx = rows.reshape(ah, stride)[:, :w]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("BMP: palette index out of range")
        rgb = plte[idx]
        return rgb[::-1].copy() if bottom_up else rgb.copy()
    if comp == 3 and bpp in (16, 32):        # BI_BITFIELDS
        import struct

        masks = struct.unpack("<III", payload[54:66])
        step = bpp // 8
        stride = (w * step + 3) & ~3
        rows = np.frombuffer(payload, dtype=np.uint8,
                             count=stride * ah,
                             offset=off).reshape(ah, stride)
        dt = "<u2" if bpp == 16 else "<u4"
        px = (np.ascontiguousarray(rows[:, :w * step])
              .reshape(-1).view(dt).reshape(ah, w).astype(np.uint32))
        rgb = np.stack([_mask_channel(px, m) for m in masks], -1)
        return rgb[::-1].copy() if bottom_up else rgb.copy()
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP shape not decoded natively (bpp={bpp}, "
            f"compression={comp}); 24/32-bit uncompressed, 8-bit "
            f"palette/RLE8, 4-bit RLE4, and 16/32-bit bitfields are "
            f"covered — PIL handles the rest")
    step = bpp // 8
    stride = (w * step + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * ah,
                         offset=off).reshape(ah, stride)
    px = rows[:, : w * step].reshape(ah, w, step)
    rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    return rgb[::-1].copy() if bottom_up else rgb.copy()


def decode_image(payload: bytes) -> np.ndarray:
    """Image decode. Codec-free formats — binary netpbm (P5/P6),
    24/32-bit + palette/RLE BMP, and (since r14) baseline AND
    progressive JPEG, full-spec static PNG (all depths 1-16, all
    color types, Adam7), lossless-VP8L WebP, full-grammar GIF
    (incl. animation compositing), and baseline TIFF
    (none/PackBits/LZW, predictor 2, gray/RGB/palette/bilevel) —
    ALWAYS decode via the pure-NumPy paths (deterministic,
    dependency-free: the declared queries' hashes never depend on
    which libraries the environment carries). Anything the native
    paths can't handle (lossy-VP8 WebP / arithmetic-coded JPEG /
    planar TIFF) routes through PIL when the runtime probe found it
    (``HAS_PIL``), normalized to uint8 RGB / grayscale arrays
    matching the native paths' shape contract; without PIL those
    formats raise NotImplementedError naming the swap-in."""
    try:
        if payload[:2] in (b"P5", b"P6"):
            return _decode_netpbm(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            from vectordb_explorations_spark.operators.jpeg import (
                decode_baseline_jpeg)
            return decode_baseline_jpeg(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from vectordb_explorations_spark.operators.png import (
                decode_png)
            return decode_png(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from vectordb_explorations_spark.operators.webp import (
                decode_webp)
            return decode_webp(payload)  # VP8L native; VP8 raises
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from vectordb_explorations_spark.operators.gif import (
                decode_gif)
            return decode_gif(payload)   # full grammar incl. animation
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from vectordb_explorations_spark.operators.tiff import (
                decode_tiff)
            return decode_tiff(payload)  # baseline; planar etc. raise
    except NotImplementedError:
        if not HAS_PIL:
            raise
        return _decode_image_pil(payload)
    if HAS_PIL:
        return _decode_image_pil(payload)
    raise NotImplementedError(
        "this compressed image format requires PIL/cv2 (not in this "
        "container); netpbm P5/P6, uncompressed BMP, baseline JPEG, and "
        "PNG decode natively — install Pillow and the remaining "
        "formats light up automatically (HAS_PIL)")


def _decode_image_pil(payload: bytes) -> np.ndarray:
    """PIL-backed decode for the compressed-codec seam: (h, w, 3) uint8
    RGB for color modes, (h, w) uint8 for single-channel — the same
    shape contract as the native netpbm/BMP paths. Library-specific
    failures (UnidentifiedImageError is an OSError) re-raise as
    ValueError so callers see the documented undecodable-payload
    contract regardless of which libraries the environment carries —
    without this, resize_images' fake-fallback except clause never
    matched in Pillow-installed environments (caught by review)."""
    import io

    try:
        img = _PIL_IMAGE.open(io.BytesIO(payload))
        if img.mode in ("L", "1", "I;16", "I"):
            return np.asarray(img.convert("L"), dtype=np.uint8)
        return np.asarray(img.convert("RGB"), dtype=np.uint8)
    except (OSError, SyntaxError) as e:
        raise ValueError(f"payload not decodable by PIL: {e}") from e


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Audio decode -> ((n_samples, n_channels), sample_rate). WAV
    decodes via the pure-NumPy RIFF walk below — 8-bit unsigned /
    16-bit signed PCM, IEEE float32/64 (clip(rint(x*32767)) -> int16),
    G.711 mu-law / A-law companding (format tags 7/6, normative
    reconstruction tables derived algorithmically), and the
    WAVE_FORMAT_EXTENSIBLE wrapper — and FLAC via the native codec
    (operators/flac.py, full frame grammar, int16 contract) —
    deterministic, dependency-free, so declared hashes never depend on
    the environment; remaining WAV encodings (ADPCM...) and containers
    (OGG/MP3...) route through soundfile when the runtime probe found
    it (``HAS_SOUNDFILE``), else raise NotImplementedError naming the
    swap-in."""
    if payload[:4] == b"fLaC":
        from vectordb_explorations_spark.operators.flac import (
            decode_flac)
        return decode_flac(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        if HAS_SOUNDFILE:
            return _decode_audio_soundfile(payload)
        raise ValueError(
            "not a RIFF/WAVE payload (FLAC decodes natively; other "
            "non-WAV containers decode via soundfile when installed "
            "— HAS_SOUNDFILE)")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        sz = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    # WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real format tag is the first
    # two bytes of the 16-byte SubFormat GUID in the fmt extension
    if audio_format == 0xFFFE and len(fmt) >= 26 + 2:
        audio_format = int.from_bytes(fmt[24:26], "little")
    if audio_format == 3 and bits in (32, 64):       # IEEE float
        dt = np.dtype("<f4") if bits == 32 else np.dtype("<f8")
        flo = np.frombuffer(data, dtype=dt).astype(np.float64)
        samples = np.clip(np.rint(flo * 32767.0),
                          -32768, 32767).astype("<i2")
    elif audio_format in (6, 7) and bits == 8:       # G.711 A-law/mu-law
        table = (_ALAW_LEVELS if audio_format == 6 else _MULAW_LEVELS)
        samples = table[np.frombuffer(data, dtype=np.uint8)]
    elif audio_format == 1 and bits in (8, 16):
        dt = np.uint8 if bits == 8 else np.dtype("<i2")
        samples = np.frombuffer(data, dtype=dt)
    else:
        if HAS_SOUNDFILE:
            return _decode_audio_soundfile(payload)
        raise NotImplementedError(
            f"8/16-bit PCM, IEEE-float, and G.711 A-law/mu-law WAV decode "
            f"natively (format={audio_format}, bits={bits}); other "
            f"encodings require a codec library — install soundfile and "
            f"this seam lights up automatically")
    n = len(samples) // channels
    return samples[: n * channels].reshape(n, channels), rate


def _g711_mulaw_levels() -> np.ndarray:
    """All 256 mu-law reconstruction levels (ITU-T G.711 table, derived
    algorithmically — the normative decode: complement, 3-bit exponent,
    4-bit mantissa, bias 0x84). int16."""
    b = np.arange(256, dtype=np.int64) ^ 0xFF          # transmitted is
    sign = (b & 0x80) != 0                             # complemented
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _g711_alaw_levels() -> np.ndarray:
    """All 256 A-law reconstruction levels (G.711: even-bit inversion
    0x55, sign bit SET means positive, segment 0 linear). int16."""
    b = np.arange(256, dtype=np.int64) ^ 0x55
    pos = (b & 0x80) != 0
    seg = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = np.where(seg == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << np.maximum(seg - 1, 0))
    return np.where(pos, mag, -mag).astype(np.int16)


_MULAW_LEVELS = _g711_mulaw_levels()
_ALAW_LEVELS = _g711_alaw_levels()


def _g711_encode(samples: np.ndarray, levels: np.ndarray) -> np.ndarray:
    """Nearest-reconstruction-level G.711 quantizer: the encoder is the
    exact inverse of the normative decoder table (ties and duplicate
    zero levels resolve to the lowest byte value — deterministic).
    Returns uint8 codewords."""
    order = np.argsort(levels, kind="stable")
    sorted_lv = levels[order].astype(np.int64)
    s = np.asarray(samples, dtype=np.int64)
    idx = np.searchsorted(sorted_lv, s)
    idx = np.clip(idx, 1, len(sorted_lv) - 1)
    left, right = sorted_lv[idx - 1], sorted_lv[idx]
    pick = np.where((s - left) <= (right - s), idx - 1, idx)
    # among equal levels prefer the smallest codeword (stable argsort
    # keeps equal levels in byte order; step to the first equal entry)
    first_eq = np.searchsorted(sorted_lv, sorted_lv[pick], side="left")
    return order[first_eq].astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, law: str = "mulaw",
                    rate: int = 8000) -> bytes:
    """Deterministic G.711 WAV writer (format tag 7 mu-law / 6 A-law,
    8 bits per sample) for the codec-pair tests: int16 mono samples are
    quantized by the nearest-level inverse of the decode table."""
    mono = samples[:, 0] if samples.ndim == 2 else samples
    levels = _MULAW_LEVELS if law == "mulaw" else _ALAW_LEVELS
    tag = 7 if law == "mulaw" else 6
    codes = _g711_encode(mono, levels).tobytes()
    return (b"RIFF" + (36 + len(codes)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + tag.to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little") + rate.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
            + b"data" + len(codes).to_bytes(4, "little") + codes)


def encode_wav_float32(samples: np.ndarray, rate: int = 8000) -> bytes:
    """IEEE-float WAV writer (format tag 3, 32-bit) — int16 mono
    samples scaled to [-1, 1]; float32 precision guarantees the decode
    contract (clip(rint(x * 32767))) round-trips bit-exactly."""
    mono = samples[:, 0] if samples.ndim == 2 else samples
    flo = (np.asarray(mono, dtype=np.float64) / 32767.0).astype("<f4")
    body = flo.tobytes()
    return (b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (3).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * 4).to_bytes(4, "little")
            + (4).to_bytes(2, "little") + (32).to_bytes(2, "little")
            + b"data" + len(body).to_bytes(4, "little") + body)


def _decode_audio_soundfile(payload: bytes) -> tuple[np.ndarray, int]:
    """soundfile-backed decode for the compressed-codec seam: always
    returns (n, channels) int16 to match the native PCM path's integer
    sample contract (soundfile's float output is scaled back).
    Library-specific failures (LibsndfileError is a RuntimeError)
    re-raise as ValueError so the documented undecodable-payload
    contract holds regardless of environment (caught by review)."""
    import io

    try:
        data, rate = _SOUNDFILE.read(io.BytesIO(payload), dtype="int16",
                                     always_2d=True)
    except (RuntimeError, OSError) as e:
        raise ValueError(f"payload not decodable by soundfile: {e}") from e
    return np.asarray(data), int(rate)


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake decode used by tests: derive a fixed-size float
    feature from the payload's sha256 — byte-for-byte reproducible."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64) / 2**32


def extract_features(assets: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: size, sha256,
    byte-entropy, and a fake-decoded fixed-width feature vector. Shape is
    identical to a real decode+embed pipeline (batch in, batch out, no
    driver involvement)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n_bytes, shas, ents, feats = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n_bytes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                if b:
                    counts = np.bincount(np.frombuffer(b, dtype=np.uint8),
                                         minlength=256)
                    p = counts[counts > 0] / len(b)
                    ents.append(float(-(p * np.log2(p)).sum()))
                else:
                    ents.append(0.0)
                feats.append(fake_decode(b, feature_dim).tolist())
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": n_bytes,
                "payload_sha": shas,
                "byte_entropy": ents,
                "feature": feats,
            })

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def features_flat(docs: DataFrame) -> DataFrame:
    """Driver-safe projection of :func:`extract_features`: every column is a
    hashable scalar. The ``feature ARRAY<DOUBLE>`` column is re-expressed as
    ``feature_u32`` — the comma-joined little-endian uint32 words the fake
    decode derived them from (``x * 2**32`` is exact in float64, so the
    round-trip is lossless) — and ``byte_entropy`` is rounded to 6 dp.

    Round-1 driver feedback: the rows-only canonicalizer cannot factorize
    list cells (`TypeError: unhashable type: 'list'`), so the declared query
    must not carry arrays. The array-returning operator stays for pipeline
    use; this is the correctness-gate surface.
    """
    feats = extract_features(synthesize_assets(docs))
    u32 = F.transform(
        "feature", lambda x: (x * F.lit(float(2 ** 32))).cast("long").cast("string"))
    return feats.select(
        "asset_id", "modality", "n_bytes", "payload_sha",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        F.concat_ws(",", u32).alias("feature_u32"),
    ).orderBy("asset_id")


# Oracle validity note: DuckDB's sha256() takes VARCHAR (UTF-8 bytes) and the
# synthetic documents corpus is pure ASCII, so char-substrings == byte-slices
# and sha256(text) == sha256 of the payload bytes. The Spark operator itself
# handles arbitrary binary; only the oracle relies on the ASCII fixture.
# byte_entropy: DuckDB's entropy() aggregate is log2-based, matching the
# NumPy -(p*log2 p).sum(); both sides round to 6 dp. The uint32 feature words
# are recovered from the hex digest via strpos-nibble parsing.
FEATURES_FLAT_ORACLE = """
WITH a AS (
  SELECT doc_id AS asset_id,
         CASE doc_id % 4 WHEN 0 THEN 'text' WHEN 1 THEN 'image'
                         WHEN 2 THEN 'audio' ELSE 'video' END AS modality,
         text,
         length(text) AS n_bytes,
         sha256(text) AS payload_sha
  FROM documents
), ent AS (
  SELECT a.asset_id,
         round(entropy(substring(a.text, CAST(t.i AS INT), 1)), 6) AS byte_entropy
  FROM a, LATERAL unnest(generate_series(1, a.n_bytes)) t(i)
  GROUP BY a.asset_id
), nib AS (
  SELECT a.asset_id, jj.j,
         CAST(SUM((
             (strpos('0123456789abcdef',
                     substring(a.payload_sha, CAST((jj.j*4+kk.k)*2+1 AS INT), 1)) - 1) * 16
           + (strpos('0123456789abcdef',
                     substring(a.payload_sha, CAST((jj.j*4+kk.k)*2+2 AS INT), 1)) - 1)
         ) * CAST(pow(256, kk.k) AS BIGINT)) AS BIGINT) AS u32
  FROM a,
       LATERAL unnest(generate_series(0, 7)) jj(j),
       LATERAL unnest(generate_series(0, 3)) kk(k)
  GROUP BY a.asset_id, jj.j
), feat AS (
  SELECT asset_id,
         string_agg(CAST(u32 AS VARCHAR), ',' ORDER BY j) AS feature_u32
  FROM nib GROUP BY asset_id
)
SELECT a.asset_id, a.modality, CAST(a.n_bytes AS BIGINT) AS n_bytes,
       a.payload_sha, ent.byte_entropy, feat.feature_u32
FROM a JOIN ent USING (asset_id) JOIN feat USING (asset_id)
ORDER BY asset_id
"""


def frames_flat(docs: DataFrame) -> DataFrame:
    """Driver-safe declared query for :func:`sample_frames` (already flat —
    every column scalar), ordered deterministically."""
    return (sample_frames(synthesize_assets(docs))
            .orderBy("asset_id", "frame_idx"))


# Same ASCII-fixture caveat as FEATURES_FLAT_ORACLE. Python's
# range(0, n_frames, every_nth) with n_frames = max(1, len // 256) maps to
# generate_series(0, n_frames-1, 4); substring end-clamps like bytes slicing.
FRAMES_ORACLE = """
WITH a AS (
  SELECT doc_id AS asset_id, text,
         greatest(1, length(text) // 256) AS n_frames
  FROM documents WHERE doc_id % 4 = 3
)
SELECT a.asset_id,
       CAST(t.fi AS INT) AS frame_idx,
       CAST(t.fi AS BIGINT) * 256 AS byte_offset,
       sha256(substring(a.text, CAST(t.fi*256+1 AS INT), 256)) AS frame_sha
FROM a, LATERAL unnest(generate_series(0, a.n_frames - 1, 4)) t(fi)
ORDER BY asset_id, frame_idx
"""


def multimodal_struct(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """The multimodal document record: text + typed metadata + embedding in
    one struct column (documents ⋈ embeddings on doc_id = vec_id). At scale
    both sides bucket on the join key; here AQE picks the strategy."""
    joined = docs.join(embeddings, docs.doc_id == embeddings.vec_id, "inner")
    return joined.select(
        "doc_id",
        F.struct(
            F.col("text"), F.col("lang"), F.col("source"),
            F.col("n_chars"), F.col("embedding"), F.col("label"),
        ).alias("record"))


def multimodal_summary(docs: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Oracle-checkable flat projection of the multimodal join: per (lang,
    label) document counts and embedding-norm stats."""
    from vectordb_explorations_spark.functions.vectors import l2_norm
    joined = docs.join(embeddings, docs.doc_id == embeddings.vec_id, "inner")
    return (joined
            .select("lang", "label", F.col("n_chars"),
                    l2_norm(F.col("embedding")).alias("norm"))
            .groupBy("lang", "label")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 round6(F.avg("n_chars")).alias("avg_chars"),
                 F.round(F.avg("norm"), 6).alias("avg_norm"))
            .orderBy("lang", "label"))


MULTIMODAL_SUMMARY_ORACLE = f"""
SELECT lang, label,
       count(*) AS n_docs,
       {r6('avg(n_chars)')} AS avg_chars,
       round(avg(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_norm
FROM documents JOIN embeddings ON doc_id = vec_id
GROUP BY lang, label
ORDER BY lang, label
"""


RESIZE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("src_w", T.IntegerType()),
    T.StructField("src_h", T.IntegerType()),
    T.StructField("out_w", T.IntegerType()),
    T.StructField("out_h", T.IntegerType()),
    T.StructField("resized_sha", T.StringType()),
])


def nn_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w[, c]) array — pure index math,
    the deterministic counterpart of a codec library's NEAREST filter."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


def resize_images(assets: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Image-resize stage: filter to the image modality, decode → resize →
    hash inside one Arrow batch pass. Payloads in a codec-free format
    (netpbm P5/P6, uncompressed BMP) decode for REAL via
    :func:`decode_image` and resize nearest-neighbor; payloads needing an
    external codec (PNG/JPEG — no PIL/cv2 in this container) fall back to
    a clearly-deterministic fake (length-derived dims, stride-sampled
    bytes) so the stage shape — schema, filtering, batching, 1:1 output
    contract — always runs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {k: [] for k in ("asset_id", "src_w", "src_h",
                                    "out_w", "out_h", "resized_sha")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    img = decode_image(b)
                    src_h, src_w = img.shape[:2]
                    resized = np.ascontiguousarray(nn_resize(img, out_w, out_h))
                except (NotImplementedError, ValueError, IndexError):
                    # codec-requiring or non-image payload: deterministic
                    # fake keeps the stage total and reproducible
                    src_w = 16 + (len(b) % 113)
                    src_h = 16 + ((len(b) // 7) % 97)
                    arr = np.frombuffer(b, dtype=np.uint8)
                    idx = (np.arange(out_w * out_h) * max(1, len(arr))
                           // (out_w * out_h)) % max(1, len(arr))
                    resized = arr[idx] if len(arr) else np.zeros(
                        out_w * out_h, dtype=np.uint8)
                rows["asset_id"].append(aid)
                rows["src_w"].append(src_w)
                rows["src_h"].append(src_h)
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["resized_sha"].append(
                    hashlib.sha256(resized.tobytes()).hexdigest())
            yield pd.DataFrame(rows)

    return (assets.where(F.col("modality") == "image")
            .mapInPandas(run, schema=RESIZE_SCHEMA))


def resize_real_flat(docs: DataFrame, src_w: int = 8, src_h: int = 6,
                     out_w: int = 4, out_h: int = 3) -> DataFrame:
    """Driver-checkable REAL-decode resize: each document's first
    src_w*src_h*3 ASCII bytes become a valid binary-PPM (P6) payload, which
    :func:`resize_images` then actually decodes (header parse, raster
    reshape) and nearest-neighbor-resizes — no fake fallback on this path.
    The oracle recomputes the same resize as substring picks with the NN
    index arithmetic baked in as literals, so the driver hash-checks the
    real codec kernel end to end."""
    n = src_w * src_h * 3
    payload = F.encode(
        F.concat(F.lit(f"P6\n{src_w} {src_h}\n255\n"),
                 F.substring("text", 1, n)), "UTF-8")
    # The n-char prefix must encode to exactly n BYTES (i.e. be pure
    # ASCII): a multi-byte character would inflate the raster payload and
    # push the row onto the fake-fallback path while the char-indexed
    # oracle still emits it (round-5 ADVICE). The oracle applies the same
    # strlen(substr(...)) = n guard.
    ascii_prefix = F.length(F.encode(F.substring("text", 1, n), "UTF-8")) == n
    assets = (docs.where((F.length("text") >= n) & ascii_prefix)
              .select(F.col("doc_id").alias("asset_id"),
                      F.lit("image").alias("modality"),
                      payload.alias("payload"),
                      F.create_map().cast("map<string,string>").alias("meta")))
    return (resize_images(assets, out_w=out_w, out_h=out_h)
            .orderBy("asset_id"))


def resize_real_oracle(src_w: int = 8, src_h: int = 6,
                       out_w: int = 4, out_h: int = 3) -> str:
    # same index math as nn_resize: yi = y*h//out_h, xi = x*w//out_w
    yi = [y * src_h // out_h for y in range(out_h)]
    xi = [x * src_w // out_w for x in range(out_w)]
    picks = " || ".join(
        f"substr(text, {y * src_w * 3 + x * 3 + 1}, 3)"
        for y in yi for x in xi)
    n = src_w * src_h * 3
    return f"""
SELECT doc_id AS asset_id,
       CAST({src_w} AS INT) AS src_w, CAST({src_h} AS INT) AS src_h,
       CAST({out_w} AS INT) AS out_w, CAST({out_h} AS INT) AS out_h,
       sha256({picks}) AS resized_sha
FROM documents WHERE length(text) >= {n} AND strlen(substr(text, 1, {n})) = {n}
ORDER BY asset_id
"""


FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("byte_offset", T.LongType()),
    T.StructField("frame_sha", T.StringType()),
])


def sample_frames(assets: DataFrame, frame_bytes: int = 256,
                  every_nth: int = 4) -> DataFrame:
    """Video frame-sampling stage shape: one asset fans out to many frame
    rows (every ``every_nth`` fixed-size chunk stands in for a decoded
    frame; a real demuxer is stubbed out per the container's codec-free
    environment). Demonstrates the 1→N mapInPandas contract: yielded
    batches need not align 1:1 with input rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in ("asset_id", "frame_idx",
                                   "byte_offset", "frame_sha")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, len(b) // frame_bytes)
                for fi in range(0, n_frames, every_nth):
                    off = fi * frame_bytes
                    chunk = b[off: off + frame_bytes]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(fi)
                    out["byte_offset"].append(off)
                    out["frame_sha"].append(
                        hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return (assets.where(F.col("modality") == "video")
            .mapInPandas(run, schema=FRAME_SCHEMA))


# ---- REAL animation frame sampling (native GIF, r14 continuation) ----

GIF_FRAME_W = GIF_FRAME_H = 6
GIF_N_FRAMES = 3
GIF_FRAME_BYTES = GIF_FRAME_W * GIF_FRAME_H * 3      # 108
GIF_SAMPLE_EVERY = 2
GIF_DELAY_STEP_CS = 10

GIF_FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("delay_cs", T.IntegerType()),
    T.StructField("frame_sha256", T.StringType()),
    T.StructField("mean_byte", T.DoubleType()),
])


def gif_frame_sample(docs: DataFrame) -> DataFrame:
    """Declared query (r14 continuation): frame sampling over REAL
    animated GIF payloads — the multimodal frame story upgraded from
    fixed-byte fake containers (sample_frames) to an actual animation
    codec. Each eligible document synthesizes a GIF_N_FRAMES-frame
    animated GIF in-pipeline (frame f's 6x6 raster is the document's
    byte slice [108f, 108(f+1)), per-frame delays f*10 cs), the
    payload decodes through the full GIF grammar
    (operators/gif.py: LZW, palette, GCE delays, compositing), and
    every GIF_SAMPLE_EVERY-th composited frame is emitted with its
    delay, content hash, and mean byte value.

    The oracle rides the codec round-trip invariance (encode_gif is
    palette-exact for <= 256 colors and full-frame draws composite to
    the frame itself): composited frame f's pixel bytes ARE the text
    slice, so sha256/mean recompute from substr() — the FRAMES_ORACLE
    discipline with a real codec in the loop. ASCII eligibility guard
    (bytes == chars) exactly like the perceptual asset stages.

    Scale shape: one narrow projection, one Arrow-batched kernel, no
    shuffle until the final presentation sort. Cites hnsw.cc: none —
    north-star extension."""
    n = GIF_N_FRAMES * GIF_FRAME_BYTES
    elig = docs.where(
        (F.length("text") >= n)
        & (F.length(F.encode(F.substring("text", 1, n), "UTF-8")) == n))
    src = elig.select("doc_id", F.substring("text", 1, n).alias("t"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        from vectordb_explorations_spark.operators.gif import (
            decode_gif_frames, encode_gif)

        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in ("doc_id", "frame_idx", "delay_cs",
                                   "frame_sha256", "mean_byte")}
            for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
                b = t.encode("utf-8")
                frames = [np.frombuffer(
                    b[f * GIF_FRAME_BYTES:(f + 1) * GIF_FRAME_BYTES],
                    dtype=np.uint8).reshape(GIF_FRAME_H, GIF_FRAME_W, 3)
                    for f in range(GIF_N_FRAMES)]
                payload = encode_gif(
                    frames, delays=[GIF_DELAY_STEP_CS * f
                                    for f in range(GIF_N_FRAMES)])
                dec, delays = decode_gif_frames(payload)
                for fi in range(0, GIF_N_FRAMES, GIF_SAMPLE_EVERY):
                    fb = dec[fi].tobytes()
                    s = sum(fb)
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(fi)
                    out["delay_cs"].append(int(delays[fi]))
                    out["frame_sha256"].append(
                        hashlib.sha256(fb).hexdigest())
                    out["mean_byte"].append(
                        math.floor((float(s) / float(GIF_FRAME_BYTES))
                                   * 1_000_000.0 + 0.5) / 1_000_000.0)
            yield pd.DataFrame(out)

    return (src.mapInPandas(run, schema=GIF_FRAMES_SCHEMA)
            .orderBy("doc_id", "frame_idx"))


def gif_frame_sample_oracle() -> str:
    n = GIF_N_FRAMES * GIF_FRAME_BYTES
    fis = ", ".join(f"({fi})"
                    for fi in range(0, GIF_N_FRAMES, GIF_SAMPLE_EVERY))
    return f"""
WITH elig AS (
  SELECT doc_id, substr(text, 1, {n}) AS t FROM documents
  WHERE length(text) >= {n}
    AND strlen(substr(text, 1, {n})) = {n}
), f AS (
  SELECT doc_id, v.fi,
         substr(t, 1 + v.fi * {GIF_FRAME_BYTES}, {GIF_FRAME_BYTES}) AS fb
  FROM elig, (VALUES {fis}) v(fi)
)
SELECT doc_id,
       CAST(fi AS INT) AS frame_idx,
       CAST(fi * {GIF_DELAY_STEP_CS} AS INT) AS delay_cs,
       sha256(fb) AS frame_sha256,
       (floor((CAST(list_sum(list_transform(range(1, {GIF_FRAME_BYTES} + 1),
            i -> ord(substr(fb, CAST(i AS INT), 1)))) AS DOUBLE)
            / CAST({GIF_FRAME_BYTES} AS DOUBLE)) * 1000000.0 + 0.5)
        / 1000000.0) AS mean_byte
FROM f ORDER BY doc_id, frame_idx
"""
