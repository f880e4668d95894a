"""Perceptual near-duplicate detection over multimodal BINARY columns —
the last dedup modality (r11 verdict "What's missing" #1): every other
dedup operator keys on text or text embeddings; real multimodal corpora
are full of RE-ENCODED duplicates (the same image saved as PPM and BMP,
the same audio at a different bit depth) that byte-level sha256 dedup
can never see.

Reference parity note: the reference (hnsw.cc) has no multimodal
support at all; this extends the engine's north-star curation surface
(BASELINE.json "dedup" / "multimodal columns" extend categories) with
the standard public constructions:

- **aHash** (average hash) and **dHash** (difference/gradient hash) for
  images — downscale to a tiny grayscale grid, threshold against the
  mean (aHash) or the horizontal neighbor (dHash); both are public
  folklore algorithms (Krawetz 2011, "Looks Like It").
- an **energy-contour hash** for audio — per-frame energy of the
  centered PCM signal, one bit per consecutive-frame gradient — the
  shape of Haitsma & Kalker's (2002) robust audio fingerprint reduced
  to one band.

Everything is INTEGER-exact end to end (integer grayscale, integer
energies, strict comparisons, MSB-first 32-bit word packing shared with
bq.py's convention), so the whole pipeline — synthesize, REAL codec
decode, REAL re-encode, decode again, hash, band, Hamming verify — is
hash-checkable against a DuckDB oracle that recomputes the hashes from
the source text with baked-in pixel/sample positions.

Why these hashes survive re-encoding: a lossless re-encode (PPM->BMP,
8-bit->16-bit PCM) reproduces the exact pixel/sample values, so the
hashes are bit-identical (the planted structure the declared queries
verify); a lossy-but-mild perturbation (uniform brightness shift,
volume scaling) moves every grid cell together, so the gradient bits
and the against-the-mean bits are unchanged — pytest-pinned.

Scale shape (100 TB): hashing is one narrow Arrow-batched pass over
payload bytes (payloads never shuffle); candidate generation is the
LSH-banding equi-join on compact (band_idx, band_val) integers (the
minhash_lsh discipline — never all-pairs), with a bucket-occupancy cap
(PHASH_BUCKET_CAP, the span-dedup 256 precedent) so degenerate hot
buckets — every all-white scan page collides on the all-zero gradient
word — cannot go quadratic; verification touches candidate pairs only,
via two id-keyed joins against the compact hash frame.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from vectordb_explorations_spark.functions.rounding import round6
from vectordb_explorations_spark.sources.sinks import repartition_for_hive
from vectordb_explorations_spark.operators.multimodal import (
    decode_audio, decode_image)

# one 9x8 source raster serves BOTH image hashes: dHash reads all 9
# columns (8 horizontal gradients per row x 8 rows = 64 bits), aHash
# reads the nearest-neighbor 8x8 grid (x*9//8 == x for x < 8, i.e. the
# left 8 columns — identity picks the oracle bakes in as literals)
PHASH_SRC_W, PHASH_SRC_H = 9, 8
PHASH_GRID = 8
PHASH_IMG_MAX_HAMMING = 6       # of 64 dHash bits
AUDIO_N_SAMPLES = 66            # 33 frames x AUDIO_FRAME samples
AUDIO_FRAME = 2                 # samples per energy frame
AUDIO_N_BITS = 32               # 33 frames -> 32 consecutive gradients
AUDIO_SAMPLE_RATE = 8000
AUDIO_MAX_HAMMING = 3           # of 32 contour bits
# drop band buckets larger than this from candidate generation: a
# degenerate constant payload (all-white image, silence) hashes to the
# all-zero word and would pair quadratically — the span-dedup 256-doc
# occupancy precedent (dedup.py), documented recall trade
PHASH_BUCKET_CAP = 256
# band width policy: b-bit bands over uniform hashes draw
# E = n_bands * N^2 / 2^(b+1) RANDOM candidate pairs, so a fixed width
# is a fixture-scale knob that decays quadratically — the same fixed-
# cap decay the latesim candidate bound and hnsw probe_shards exposed
# (SURVEY §0 discipline: every fixed policy gets a corpus-adaptive
# 'auto'). 16-bit bands (4 over the 64-bit dHash) maximize recall and
# keep E trivial below ~100k assets; past PHASH_AUTO_WIDE_N 'auto'
# widens to 32-bit bands: random collisions fall to ~N^2/2^33 while
# every lossless re-encode / uniform-brightness dup (Hamming 0) still
# collides on EVERY band, and pigeonhole still guarantees pairs within
# Hamming 1 (2 bands). Pairs with larger Hamming spread across both
# halves become probabilistic — the standard multi-index-hashing trade
# (Norouzi et al. 2012); a corpus needing guaranteed ham<=6 recall at
# billions of assets lengthens the HASH (larger grid), not the search.
PHASH_AUTO_WIDE_N = 100_000

IMG_HASH_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("ah_w0", T.LongType()),
    T.StructField("ah_w1", T.LongType()),
    T.StructField("dh_w0", T.LongType()),
    T.StructField("dh_w1", T.LongType()),
])

AUDIO_HASH_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType()),
    T.StructField("eh_w0", T.LongType()),
])


# ---- integer kernels (shared by the Spark stage and the pytests) ----


def gray_int(img: np.ndarray) -> np.ndarray:
    """Integer ITU-R 601 luma: (299 R + 587 G + 114 B) // 1000 — exact
    in int64, so both engines and every codec path agree bit-for-bit.
    Uniform brightness +1 on all channels shifts every cell by exactly
    +1 (the weights sum to 1000), which is what makes aHash/dHash
    brightness-invariant below."""
    if img.ndim == 2:
        return img.astype(np.int64)
    r, g, b = (img[..., 0].astype(np.int64), img[..., 1].astype(np.int64),
               img[..., 2].astype(np.int64))
    return (299 * r + 587 * g + 114 * b) // 1000


def _nn_grid(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor downscale with the nn_resize index math
    (yi = y*h//out_h) — the multimodal.py resize contract, so the
    oracle's baked substring picks line up."""
    h, w = gray.shape
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return gray[np.ix_(yi, xi)]


def ahash_bits(gray: np.ndarray, grid: int = PHASH_GRID) -> np.ndarray:
    """aHash: bit d = 1 iff cell_d >= mean. Compared as
    cell*grid^2 >= total — integer-exact, no float mean."""
    g = _nn_grid(gray, grid, grid).reshape(-1)
    return (g * g.size >= g.sum()).astype(np.int64)


def dhash_bits(gray: np.ndarray, grid: int = PHASH_GRID) -> np.ndarray:
    """dHash: resize to (grid+1) x grid, bit = right neighbor strictly
    brighter. Invariant under any monotone per-pixel shift."""
    g = _nn_grid(gray, grid + 1, grid)
    return (g[:, 1:] > g[:, :-1]).reshape(-1).astype(np.int64)


def pack_words32(bits: np.ndarray) -> list[int]:
    """MSB-first 32-bit word packing — bit d lands at position
    31 - (d % 32) of word d // 32, the bq.py _pack_words convention, so
    band extraction is shiftright/mask on both engines."""
    assert len(bits) % 32 == 0, len(bits)
    out = []
    for w in range(len(bits) // 32):
        v = 0
        for b in bits[w * 32:(w + 1) * 32]:
            v = v * 2 + int(b)
        out.append(v)
    return out


def audio_contour_bits(samples: np.ndarray,
                       n_samples: int = AUDIO_N_SAMPLES,
                       frame: int = AUDIO_FRAME) -> np.ndarray | None:
    """Energy-contour bits over the first ``n_samples`` mono samples.
    Samples are CENTERED to bit-depth-independent integers first —
    uint8: s - 128; int16: s // 256 (floor) — so an 8-bit payload and
    its exact 16-bit re-encode ((s-128) << 8) hash identically. Bit f =
    energy(frame f+1) strictly greater than energy(frame f). Returns
    None when the payload is too short to hash (the caller drops the
    row — same contract as resize's too-short filter)."""
    mono = samples[:, 0] if samples.ndim == 2 else samples
    if mono.shape[0] < n_samples:
        return None
    if mono.dtype == np.uint8:
        c = mono[:n_samples].astype(np.int64) - 128
    else:
        c = np.floor_divide(mono[:n_samples].astype(np.int64), 256)
    e = (c * c).reshape(-1, frame).sum(axis=1)
    return (e[1:] > e[:-1]).astype(np.int64)


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder (bottom-up, BGR, 4-byte
    row padding) — the re-encode half of the PPM->BMP round-trip that
    multimodal.py's _decode_bmp reads back. Deterministic bytes."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    row_len = (w * 3 + 3) & ~3
    data_size = row_len * h
    header = (b"BM" + (54 + data_size).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + data_size.to_bytes(4, "little")
              + b"\x00" * 16)
    rows = []
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):      # bottom-up
        rows.append(img[y, :, ::-1].astype(np.uint8).tobytes() + pad)  # BGR
    return header + b"".join(rows)


def wav_header(n_samples: int, bits: int = 8, channels: int = 1,
               rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    """Canonical 44-byte PCM WAV header for a FIXED sample count — a
    constant literal the Spark synthesis concatenates ahead of the
    payload bytes (sizes are baked, nothing is data-dependent)."""
    block = channels * bits // 8
    n_bytes = n_samples * block
    return (b"RIFF" + (36 + n_bytes).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * block).to_bytes(4, "little")
            + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
            + b"data" + n_bytes.to_bytes(4, "little"))


def encode_wav16(samples: np.ndarray, rate: int = AUDIO_SAMPLE_RATE) -> bytes:
    """Re-encode decoded samples as 16-bit signed PCM WAV. uint8 input
    is center-scaled ((s - 128) << 8) — the exact re-quantization whose
    floor-divide inverse audio_contour_bits applies, so the round-trip
    hash is bit-identical."""
    mono = samples[:, 0] if samples.ndim == 2 else samples
    if mono.dtype == np.uint8:
        pcm = ((mono.astype(np.int64) - 128) << 8).astype("<i2")
    else:
        pcm = mono.astype("<i2")
    return wav_header(len(pcm), bits=16, rate=rate) + pcm.tobytes()


# ---- Arrow-batched hash stages ----


def image_hashes(assets: DataFrame, grid: int = PHASH_GRID) -> DataFrame:
    """(asset_id, ah_w0, ah_w1, dh_w0, dh_w1) via the REAL image decode
    (netpbm/BMP native paths — multimodal.decode_image). One narrow
    mapInPandas pass; payload bytes never leave their partition. Rows
    whose payload cannot hash (undecodable, or smaller than the grid)
    are dropped — the resize_images too-short contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in ("asset_id", "ah_w0", "ah_w1",
                                   "dh_w0", "dh_w1")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    gray = gray_int(decode_image(bytes(payload)))
                except (ValueError, NotImplementedError, IndexError):
                    continue
                if gray.shape[0] < 1 or gray.shape[1] < 2:
                    continue
                ah = pack_words32(ahash_bits(gray, grid))
                dh = pack_words32(dhash_bits(gray, grid))
                out["asset_id"].append(aid)
                out["ah_w0"].append(ah[0])
                out["ah_w1"].append(ah[1])
                out["dh_w0"].append(dh[0])
                out["dh_w1"].append(dh[1])
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=IMG_HASH_SCHEMA)


def audio_hashes(assets: DataFrame) -> DataFrame:
    """(asset_id, eh_w0) via the REAL PCM WAV decode (RIFF walk —
    multimodal.decode_audio). Same narrow one-pass shape as
    image_hashes; too-short / undecodable payloads drop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"asset_id": [], "eh_w0": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    samples, _rate = decode_audio(bytes(payload))
                except (ValueError, NotImplementedError, IndexError):
                    continue
                bits = audio_contour_bits(samples)
                if bits is None:
                    continue
                out["asset_id"].append(aid)
                out["eh_w0"].append(pack_words32(bits)[0])
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=AUDIO_HASH_SCHEMA)


# ---- banding + Hamming verify (pure DataFrame ops) ----


def resolve_band_bits(band_bits: int | str,
                      corpus_n: int | None) -> int:
    """The 'auto' policy: 16-bit bands below PHASH_AUTO_WIDE_N assets
    (max recall, trivial random-collision volume), 32-bit above (see
    the PHASH_AUTO_WIDE_N note). Explicit 16/32 pins the width — the
    declared queries pin 16 so their oracles stay literal."""
    if band_bits == "auto":
        if corpus_n is None:
            raise ValueError("band_bits='auto' needs corpus_n")
        return 32 if corpus_n > PHASH_AUTO_WIDE_N else 16
    if band_bits not in (16, 32):
        raise ValueError(f"band_bits must be 16, 32 or 'auto': {band_bits}")
    return int(band_bits)


def _banded(hashes: DataFrame, words: list[str],
            bucket_cap: int = PHASH_BUCKET_CAP,
            band_bits: int = 16) -> DataFrame:
    """(asset_id, band_idx, band_val): each 32-bit word splits into two
    16-bit bands (shiftright / mask — exact for the nonnegative packed
    words) or stands whole as one 32-bit band, then buckets larger
    than ``bucket_cap`` drop (hot-bucket guard; the window count is
    per compact band key, never per payload)."""
    bands = []
    for w in words:
        if band_bits == 16:
            bands.append(F.shiftright(F.col(w), 16)
                         .bitwiseAND(F.lit(0xFFFF)))
            bands.append(F.col(w).bitwiseAND(F.lit(0xFFFF)))
        else:
            bands.append(F.col(w))
    banded = hashes.select(
        "asset_id", F.posexplode(F.array(*bands)).alias("band_idx",
                                                        "band_val"))
    n = F.count(F.lit(1)).over(Window.partitionBy("band_idx", "band_val"))
    return (banded.withColumn("bucket_n", n)
            .where(F.col("bucket_n") <= bucket_cap)
            .drop("bucket_n"))


def _band_candidates(hashes: DataFrame, words: list[str],
                     bucket_cap: int = PHASH_BUCKET_CAP,
                     band_bits: int = 16) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band — the
    minhash banding_candidates shape: the self-join shuffles only
    (asset_id, band_idx, band_val) integers, and the shuffle_hash hint
    keeps AQE from broadcasting a corpus-sized banded side."""
    banded = _banded(hashes, words, bucket_cap, band_bits)
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    return (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_val") == F.col("b.band_val"))
                   & (F.col("a.asset_id") < F.col("b.asset_id")))
            .select(F.col("a.asset_id").alias("id_a"),
                    F.col("b.asset_id").alias("id_b"))
            .distinct())


def _hamming_pairs(hashes: DataFrame, cand: DataFrame,
                   words: list[str]) -> DataFrame:
    """Join the candidate pairs back to the compact hash frame (twice,
    id-keyed — AQE broadcasts when the hash frame fits) and compute the
    per-word-XOR popcount Hamming distances."""
    a = hashes.select(F.col("asset_id").alias("id_a"),
                      *[F.col(w).alias(f"a_{w}") for w in words])
    b = hashes.select(F.col("asset_id").alias("id_b"),
                      *[F.col(w).alias(f"b_{w}") for w in words])
    out = cand.join(a, "id_a").join(b, "id_b")
    for w in words:
        out = out.withColumn(
            f"ham_{w}",
            F.bit_count(F.col(f"a_{w}").bitwiseXOR(F.col(f"b_{w}"))))
    return out


def perceptual_image_pairs(hashes: DataFrame,
                           max_hamming: int = PHASH_IMG_MAX_HAMMING,
                           bucket_cap: int = PHASH_BUCKET_CAP,
                           band_bits: int | str = 16,
                           corpus_n: int | None = None) -> DataFrame:
    """Near-dup image pairs: band on the 64 dHash bits (4 x 16-bit
    bands — any exact band match is a candidate, the LSH recall knob;
    band_bits='auto' widens to 2 x 32-bit past PHASH_AUTO_WIDE_N
    assets, see the module-top policy note), verify dHash Hamming <=
    max_hamming, report the aHash distance alongside (the
    second-opinion signal a curation pipeline thresholds)."""
    cand = _band_candidates(hashes, ["dh_w0", "dh_w1"], bucket_cap,
                            resolve_band_bits(band_bits, corpus_n))
    out = _hamming_pairs(hashes, cand, ["dh_w0", "dh_w1", "ah_w0", "ah_w1"])
    return (out.select(
        "id_a", "id_b",
        (F.col("ham_dh_w0") + F.col("ham_dh_w1")).alias("ham_dhash"),
        (F.col("ham_ah_w0") + F.col("ham_ah_w1")).alias("ham_ahash"))
        .where(F.col("ham_dhash") <= max_hamming)
        .orderBy("id_a", "id_b"))


def perceptual_audio_pairs(hashes: DataFrame,
                           max_hamming: int = AUDIO_MAX_HAMMING,
                           bucket_cap: int = PHASH_BUCKET_CAP,
                           band_bits: int | str = 16,
                           corpus_n: int | None = None) -> DataFrame:
    """Near-dup audio pairs: band on the 32 contour bits (2 x 16-bit
    bands; band_bits='auto' collapses to the single whole-word band
    past PHASH_AUTO_WIDE_N — exact-contour candidates only, the
    first-stage trade a 32-bit fingerprint forces at scale: for
    guaranteed near-miss recall on billions of clips, lengthen the
    contour, not the search), verify Hamming <= max_hamming."""
    cand = _band_candidates(hashes, ["eh_w0"], bucket_cap,
                            resolve_band_bits(band_bits, corpus_n))
    out = _hamming_pairs(hashes, cand, ["eh_w0"])
    return (out.select("id_a", "id_b",
                       F.col("ham_eh_w0").alias("ham_contour"))
            .where(F.col("ham_contour") <= max_hamming)
            .orderBy("id_a", "id_b"))


# ---- declared-query synthesis: documents -> payload pairs ----
#
# The fixture carries no real blob columns, so the declared queries
# synthesize them the resize_real_flat way: each document's ASCII
# prefix becomes a REAL P6 raster / REAL 8-bit PCM WAV, and a second
# asset per document is the REAL RE-ENCODE of the first (P6 -> BMP,
# 8-bit -> 16-bit PCM) produced by decoding and re-encoding in the
# Arrow stage — the planted re-encoded-duplicate structure a perceptual
# dedup must find. asset_id = doc_id*2 (original) / doc_id*2+1
# (re-encode), so the oracle can address both from the documents table.


def _p6_assets(docs: DataFrame, src_w: int = PHASH_SRC_W,
               src_h: int = PHASH_SRC_H) -> DataFrame:
    n = src_w * src_h * 3
    payload = F.encode(
        F.concat(F.lit(f"P6\n{src_w} {src_h}\n255\n"),
                 F.substring("text", 1, n)), "UTF-8")
    return (docs.where(_prefix_eligible(n))
            .select((F.col("doc_id") * 2).alias("asset_id"),
                    payload.alias("payload")))


def _prefix_eligible(n: int) -> F.Column:
    """length >= n AND the n-char prefix is pure ASCII (chars == bytes
    — the resize_real_flat round-5 guard; oracles apply the same
    strlen(substr)=n)."""
    return ((F.length("text") >= n)
            & (F.length(F.encode(F.substring("text", 1, n), "UTF-8")) == n))


def _wav8_assets(docs: DataFrame,
                 n_samples: int = AUDIO_N_SAMPLES) -> DataFrame:
    payload = F.concat(F.lit(wav_header(n_samples, bits=8)),
                       F.encode(F.substring("text", 1, n_samples), "UTF-8"))
    return (docs.where(_prefix_eligible(n_samples))
            .select((F.col("doc_id") * 2).alias("asset_id"),
                    payload.alias("payload")))


def _reencode_bmp(b: bytes) -> bytes:
    return encode_bmp(decode_image(b))


def _reencode_png(b: bytes) -> bytes:
    from vectordb_explorations_spark.operators.png import encode_png
    return encode_png(decode_image(b))


def _reencode_wav16(b: bytes) -> bytes:
    samples, rate = decode_audio(b)
    return encode_wav16(samples, rate)


def _reencode_flac(b: bytes) -> bytes:
    from vectordb_explorations_spark.operators.flac import encode_flac
    samples, rate = decode_audio(b)
    mono = samples[:, 0] if samples.ndim == 2 else samples
    # the encode_wav16 centering: uint8 -> int16
    pcm16 = (mono.astype(np.int64) - 128) << 8
    return encode_flac(pcm16, rate, bps=16, mode="fixed1")


def _reencode_gif(b: bytes) -> bytes:
    # lossless for these assets by construction: the raster is
    # src_w x src_h = 72 pixels, so <= 72 distinct colors <= 256
    from vectordb_explorations_spark.operators.gif import encode_gif
    return encode_gif(decode_image(b))


def _reencode_tiff(b: bytes) -> bytes:
    # LZW + horizontal predictor: the compressed TIFF shape, lossless
    from vectordb_explorations_spark.operators.tiff import encode_tiff
    return encode_tiff(decode_image(b), compression="lzw",
                       predictor=True)


def _reencode_wavf32(b: bytes) -> bytes:
    # IEEE-float WAV of the SAME centered int16 samples as the WAV16 /
    # FLAC variants; float32 precision makes clip(rint(x*32767))
    # invert bit-exactly, so the variant is lossless
    from vectordb_explorations_spark.operators.multimodal import (
        encode_wav_float32)
    samples, rate = decode_audio(b)
    mono = samples[:, 0] if samples.ndim == 2 else samples
    pcm16 = ((mono.astype(np.int64) - 128) << 8).astype(np.int16)
    return encode_wav_float32(pcm16, rate)


def _with_reencode_variants(assets: DataFrame,
                            encoders) -> DataFrame:
    """Union each asset with REAL re-encodes (decode -> re-encode in
    one Arrow pass): ``encoders`` is a list of (id_offset,
    payload -> bytes) pairs — the single-re-encode pair queries and
    the cross-codec triplet queries share this plumbing."""
    schema = T.StructType([T.StructField("asset_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, payloads = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                for off, fn in encoders:
                    ids.append(aid + off)
                    payloads.append(fn(b))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return assets.unionByName(assets.mapInPandas(run, schema=schema))


def _with_reencodes(assets: DataFrame, modality: str) -> DataFrame:
    """The classic pair layout: each asset (2k) plus ONE lossless
    re-encode (2k+1) — P6 -> 24-bit BMP for images, 8-bit -> 16-bit
    PCM for audio."""
    fn = _reencode_bmp if modality == "image" else _reencode_wav16
    return _with_reencode_variants(assets, [(1, fn)])


def dedup_perceptual_image(docs: DataFrame,
                           max_hamming: int = PHASH_IMG_MAX_HAMMING,
                           band_bits: int | str = 16,
                           corpus_n: int | None = None) -> DataFrame:
    """Declared query: synthesize a REAL P6 raster per (long-enough)
    document plus its REAL BMP re-encode, hash both through the real
    decoders, and emit the banded+verified near-dup pairs. Every
    surviving document plants exactly one (2k, 2k+1) re-encode pair at
    Hamming 0 on both hashes; any cross-document collisions the banding
    surfaces ride the same verify. Cites hnsw.cc: none — north-star
    extension (see module docstring for the public sources)."""
    assets = _with_reencodes(_p6_assets(docs), "image")
    return perceptual_image_pairs(image_hashes(assets), max_hamming,
                                  band_bits=band_bits, corpus_n=corpus_n)


def dedup_perceptual_audio(docs: DataFrame,
                           max_hamming: int = AUDIO_MAX_HAMMING,
                           band_bits: int | str = 16,
                           corpus_n: int | None = None) -> DataFrame:
    """Declared query: synthesize a REAL 8-bit PCM WAV per document
    plus its REAL 16-bit re-encode, hash both through the real RIFF
    decode, and emit banded+verified near-dup pairs (planted (2k, 2k+1)
    re-encode pairs at Hamming 0)."""
    assets = _with_reencodes(_wav8_assets(docs), "audio")
    return perceptual_audio_pairs(audio_hashes(assets), max_hamming,
                                  band_bits=band_bits, corpus_n=corpus_n)


def _with_cross_codec_reencodes(assets: DataFrame,
                                modality: str) -> DataFrame:
    """The cross-codec family layout: each asset with real LOSSLESS
    re-encodes through different codecs. Images ride a QUINTUPLET
    (asset_id = 5k): P6 -> uncompressed BMP (5k+1), -> DEFLATE PNG
    (5k+2), -> LZW GIF (5k+3; always <= 72 distinct colors, so
    palette-exact), and -> LZW+predictor TIFF (5k+4). Audio rides a
    QUADRUPLET (asset_id = 4k): 8-bit PCM WAV -> 16-bit PCM WAV
    (4k+1), -> FLAC (4k+2), and -> IEEE-float32 WAV of the same
    centered samples (4k+3). Losslessness means every variant hashes
    identically, which is what lets a DuckDB oracle address the
    family without running a codec."""
    if modality == "image":
        encoders = [(1, _reencode_bmp), (2, _reencode_png),
                    (3, _reencode_gif), (4, _reencode_tiff)]
    else:
        encoders = [(1, _reencode_wav16), (2, _reencode_flac),
                    (3, _reencode_wavf32)]
    return _with_reencode_variants(assets, encoders)


def dedup_cross_codec_image(docs: DataFrame,
                            max_hamming: int = PHASH_IMG_MAX_HAMMING,
                            band_bits: int | str = 16,
                            corpus_n: int | None = None) -> DataFrame:
    """Declared query (r14): cross-CODEC perceptual near-dup — the
    same raster carried as netpbm P6, uncompressed BMP,
    DEFLATE-compressed PNG (operators/png.py), LZW-compressed GIF
    (operators/gif.py), and LZW+predictor TIFF (operators/tiff.py) —
    every payload byte-different but near-dup under the banded dHash
    pipeline. Each eligible document plants all TEN pairs of the
    (5k .. 5k+4) quintuplet at Hamming 0; the oracle rides the
    lossless-re-encode invariance. This is the PNG, GIF, and TIFF
    codecs on the driver-checked surface, not just under pytest.
    Cites hnsw.cc: none — north-star extension."""
    base = _p6_assets(docs).select(
        (F.shiftright("asset_id", 1) * 5).alias("asset_id"), "payload")
    assets = _with_cross_codec_reencodes(base, "image")
    return perceptual_image_pairs(image_hashes(assets), max_hamming,
                                  band_bits=band_bits, corpus_n=corpus_n)


def dedup_cross_codec_audio(docs: DataFrame,
                            max_hamming: int = AUDIO_MAX_HAMMING,
                            band_bits: int | str = 16,
                            corpus_n: int | None = None) -> DataFrame:
    """Declared query (r14): the audio cross-CODEC quadruplet —
    8-bit PCM WAV, its 16-bit PCM re-encode, the FLAC compression of
    the same samples (operators/flac.py), and the IEEE-float32 WAV of
    the same centered samples — all hashing to one energy contour.
    FLAC and the float-WAV path on the driver-checked surface; same
    six-pair (4k .. 4k+3) planted structure as the image twin."""
    base = _wav8_assets(docs).select(
        (F.shiftright("asset_id", 1) * 4).alias("asset_id"), "payload")
    assets = _with_cross_codec_reencodes(base, "audio")
    return perceptual_audio_pairs(audio_hashes(assets), max_hamming,
                                  band_bits=band_bits, corpus_n=corpus_n)


def perceptual_curation_cards(docs: DataFrame,
                              max_hamming: int = AUDIO_MAX_HAMMING
                              ) -> DataFrame:
    """Per-source multimodal curation card — the quality and perceptual-
    dedup verdicts COMPOSED into the summary a data team publishes (the
    source_data_cards discipline: certify the composition, not just the
    parts): document volume, payload-eligible share, Gopher keep rate,
    perceptual dup rate among eligible docs (cluster root != self), and
    the final kept rate (Gopher keep AND not a perceptual dup). Every
    rate is an exact integer-count ratio rounded once at 6 dp — never a
    float running sum, so both engines agree bit-for-bit.

    Scale shape: gopher is per-row work, the cluster side is the banded
    pair graph + label propagation (see dedup_perceptual_clusters), and
    the composition is two doc_id-keyed joins + ONE combinable
    source-keyed aggregation."""
    from vectordb_explorations_spark.operators.textops import (
        gopher_quality_signals)

    g = gopher_quality_signals(docs).select("doc_id", "keep")
    cl = (dedup_perceptual_clusters(docs, max_hamming)
          .select("doc_id", (F.col("root") != F.col("doc_id"))
                  .alias("is_dup")))
    j = (docs.select("doc_id", "source")
         .join(g, "doc_id", "left")
         .join(cl, "doc_id", "left"))
    n = F.count(F.lit(1))
    n_elig = F.count("is_dup")
    n_keep = F.count(F.when(F.col("keep"), 1))
    n_dup = F.count(F.when(F.col("is_dup"), 1))
    n_final = F.count(F.when(F.col("keep")
                             & ~F.coalesce("is_dup", F.lit(False)), 1))
    return (j.groupBy("source")
            .agg(n.alias("n_docs"),
                 n_elig.alias("n_eligible"),
                 round6(n_keep.cast("double") / n).alias("gopher_keep_rate"),
                 F.when(n_elig > 0,
                        round6(n_dup.cast("double") / n_elig))
                 .alias("perceptual_dup_rate"),
                 round6(n_final.cast("double") / n).alias("kept_rate"))
            .orderBy("source"))


def perceptual_curation_cards_oracle(
        max_hamming: int = AUDIO_MAX_HAMMING) -> str:
    from vectordb_explorations_spark.functions.rounding import r6
    from vectordb_explorations_spark.operators.textops import (
        gopher_quality_signals_oracle)

    gop = gopher_quality_signals_oracle().strip()
    clus = dedup_perceptual_clusters_oracle(max_hamming).strip()
    return f"""
WITH gop AS ({gop}),
clus AS ({clus})
SELECT d.source,
       count(*) AS n_docs,
       count(c.doc_id) AS n_eligible,
       {r6('count(CASE WHEN g.keep THEN 1 END)::DOUBLE / count(*)')}
         AS gopher_keep_rate,
       CASE WHEN count(c.doc_id) > 0 THEN
         {r6('count(CASE WHEN c.root <> c.doc_id THEN 1 END)::DOUBLE'
            ' / count(c.doc_id)')}
       END AS perceptual_dup_rate,
       {r6("count(CASE WHEN g.keep AND COALESCE(c.root <> c.doc_id, FALSE)"
          " = FALSE THEN 1 END)::DOUBLE / count(*)")} AS kept_rate
FROM documents d
LEFT JOIN gop g ON g.doc_id = d.doc_id
LEFT JOIN clus c ON c.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


# ---- DuckDB oracles ----
#
# The oracle recomputes the hashes FROM THE TEXT with every pixel /
# sample position baked as a literal: gray(y,x) over the 9x8 raster is
# three ascii() picks at offset (y*9+x)*3 + header, and the re-encode
# asset (odd id) carries the SAME hash values by construction (lossless
# round-trip — the invariant the Spark side actually exercises through
# the codec kernels). Banding, the bucket cap, and the Hamming verify
# are then plain SQL over the packed words.


def _img_gray_sql(y: int, x: int) -> str:
    off = (y * PHASH_SRC_W + x) * 3 + 1
    return (f"(299*ascii(substr(body,{off},1)) + "
            f"587*ascii(substr(body,{off + 1},1)) + "
            f"114*ascii(substr(body,{off + 2},1))) // 1000")


def _word_sql(bit_exprs: list[str]) -> str:
    """MSB-first fold of 32 bit expressions into one BIGINT."""
    assert len(bit_exprs) == 32
    terms = [f"(CASE WHEN {e} THEN {1 << (31 - j)} ELSE 0 END)"
             for j, e in enumerate(bit_exprs)]
    return "(" + " + ".join(terms) + ")::BIGINT"


def _band16_rows_sql(words: list[str], src: str, id_col: str) -> str:
    """UNION ALL band projection: each 32-bit word of ``src`` splits
    into its high/low 16-bit band values — the SQL twin of the engine's
    shiftright/bitwiseAND banding, with the source CTE and id column as
    explicit parameters (shared by the pair tails, the incremental
    oracle and the streaming oracle; r12 ADVICE: builders, not string
    surgery on rendered SQL)."""
    return " UNION ALL ".join(
        f"SELECT {id_col}, {2 * i + half} AS band_idx, "
        f"{w} {'// 65536' if half == 0 else '% 65536'} AS band_val "
        f"FROM {src}"
        for i, w in enumerate(words) for half in (0, 1))


def _img_hash_ctes(d: str = "d", g: str = "g", g2: str = "g2",
                   h0: str = "h0") -> str:
    """CTE fragment (no WITH keyword) recomputing the per-doc image
    hash words from baked text positions into
    ``{h0}(doc_id, ah_w0, ah_w1, dh_w0, dh_w1)``. Every CTE alias is an
    explicit parameter so composing oracles rename by argument instead
    of editing rendered SQL (r12 ADVICE)."""
    n = PHASH_SRC_W * PHASH_SRC_H * 3
    grays = ",\n         ".join(
        f"{_img_gray_sql(y, x)} AS g{y}_{x}"
        for y in range(PHASH_SRC_H) for x in range(PHASH_SRC_W))
    total = " + ".join(f"g{y}_{x}" for y in range(PHASH_GRID)
                       for x in range(PHASH_GRID))
    ah_bits = [f"g{b // 8}_{b % 8} * 64 >= atot" for b in range(64)]
    dh_bits = [f"g{b // 8}_{b % 8 + 1} > g{b // 8}_{b % 8}"
               for b in range(64)]
    return f"""{d} AS (
  SELECT doc_id, substr(text, 1, {n}) AS body FROM documents
  WHERE length(text) >= {n} AND strlen(substr(text, 1, {n})) = {n}
), {g} AS (
  SELECT doc_id,
         {grays}
  FROM {d}
), {g2} AS (
  SELECT *, ({total}) AS atot FROM {g}
), {h0} AS (
  SELECT doc_id,
         {_word_sql(ah_bits[:32])} AS ah_w0,
         {_word_sql(ah_bits[32:])} AS ah_w1,
         {_word_sql(dh_bits[:32])} AS dh_w0,
         {_word_sql(dh_bits[32:])} AS dh_w1
  FROM {g2}
)"""


def _aud_hash_ctes(d: str = "d", e: str = "e", h0: str = "h0") -> str:
    """CTE fragment recomputing the per-doc audio energy-contour hash
    into ``{h0}(doc_id, eh_w0)`` — alias-parameterized like
    ``_img_hash_ctes``."""
    n = AUDIO_N_SAMPLES
    energies = ",\n         ".join(
        "(" + " + ".join(
            f"(ascii(substr(body,{f * AUDIO_FRAME + s + 1},1)) - 128)"
            f" * (ascii(substr(body,{f * AUDIO_FRAME + s + 1},1)) - 128)"
            for s in range(AUDIO_FRAME)) + f") AS e{f}"
        for f in range(n // AUDIO_FRAME))
    bits = [f"e{f + 1} > e{f}" for f in range(AUDIO_N_BITS)]
    return f"""{d} AS (
  SELECT doc_id, substr(text, 1, {n}) AS body FROM documents
  WHERE length(text) >= {n} AND strlen(substr(text, 1, {n})) = {n}
), {e} AS (
  SELECT doc_id,
         {energies}
  FROM {d}
), {h0} AS (
  SELECT doc_id, {_word_sql(bits)} AS eh_w0 FROM {e}
)"""


def _pairs_tail_sql(words: list[str], ham_out: dict[str, list[str]],
                    verify_col: str, max_hamming: int,
                    bucket_cap: int = PHASH_BUCKET_CAP) -> str:
    """banded -> capped -> candidate pairs -> Hamming verify, shared by
    both oracles. ``ham_out`` maps output column -> contributing
    words."""
    band_rows = _band16_rows_sql(words, "h", "asset_id")
    hams = ",\n       ".join(
        "CAST(" + " + ".join(f"bit_count(xor(a.{w}, b.{w}))" for w in ws)
        + f" AS INT) AS {col}" for col, ws in ham_out.items())
    return f"""
banded AS ({band_rows}),
capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band_idx, band_val) AS bucket_n
    FROM banded)
  WHERE bucket_n <= {bucket_cap}
), cand AS (
  SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.asset_id < b.asset_id
)
SELECT id_a, id_b,
       {hams}
FROM cand JOIN h a ON a.asset_id = id_a JOIN h b ON b.asset_id = id_b
WHERE {verify_col} <= {max_hamming}
ORDER BY id_a, id_b
"""


def perceptual_hash_table(docs: DataFrame) -> DataFrame:
    """Per-document perceptual fingerprint table — the maintained
    artifact a serving pipeline keys near-dup admission on (the
    banded/pair views above are derived from exactly these words):
    (doc_id, ah_w0, ah_w1, dh_w0, dh_w1, eh_w0) via the REAL P6 decode
    and the REAL WAV decode of the document's synthesized payloads.
    All-scalar columns, one row per eligible doc — the direct
    hash-check surface for the hash KERNELS themselves (the pair
    queries certify the banding+verify composition; this certifies
    every packed word value).

    Scale shape: two narrow Arrow passes (image, audio) joined on the
    id — payload bytes never shuffle; the join carries 6 ints/row."""
    img = image_hashes(
        _p6_assets(docs).select(F.shiftright("asset_id", 1)
                                .alias("asset_id"), "payload"))
    aud = audio_hashes(
        _wav8_assets(docs).select(F.shiftright("asset_id", 1)
                                  .alias("asset_id"), "payload"))
    return (img.withColumnRenamed("asset_id", "doc_id")
            .join(aud.withColumnRenamed("asset_id", "doc_id"), "doc_id")
            .orderBy("doc_id"))


def perceptual_hash_table_oracle() -> str:
    """Both hash CTEs keyed on doc_id, joined — the per-word literal
    recomputation the pair oracles share, composed from the
    alias-parameterized builders (r12 ADVICE: no splicing of rendered
    SQL)."""
    return f"""
WITH {_img_hash_ctes()},
{_aud_hash_ctes(d="d2", e="e2", h0="h0a")}
SELECT i.doc_id, ah_w0, ah_w1, dh_w0, dh_w1, eh_w0
FROM h0 i JOIN h0a a ON a.doc_id = i.doc_id
ORDER BY i.doc_id
"""


def perceptual_incremental(docs: DataFrame,
                           max_hamming: int = PHASH_IMG_MAX_HAMMING,
                           bucket_cap: int = PHASH_BUCKET_CAP,
                           band_bits: int | str = 16,
                           corpus_n: int | None = None) -> DataFrame:
    """Incremental-ingest perceptual admission: admit a NEW batch of
    image documents against the EXISTING corpus — the daily-crawl stage
    for the multimodal columns (a re-encoded or lightly-perturbed image
    already ingested is rejected; new-vs-new dups are the batch's own
    pair pass, out of scope here, the incremental_dedup convention).
    The batch is modeled deterministically as doc_id >=
    floor(max(doc_id)/2)+1 so the same split exists in the oracle.

    Plan shape mirrors incremental_dedup (dedup.py): ONE shared banded
    frame over the per-doc image dHash words with the side split as a
    JOIN PREDICATE (a.is_new > b.is_new — new x old only, never
    old x old), the occupancy cap applied BEFORE the join, Hamming
    verify on candidates via two id-keyed joins to the compact hash
    frame, best match per new doc by (hamming ASC, old_id ASC). At
    real scale the old side IS the persisted perceptual_hash_table —
    banding keys are maintained incrementally and the corpus hash pass
    is paid once ever. Output: one row per NEW payload-eligible doc
    with its admission verdict.

    The batch split stays INSIDE the plan as a broadcast single-row
    aggregate (the oracle's split CTE shape) — no driver-side action at
    query-construction time, and an empty documents table yields an
    empty result instead of a TypeError (r12 ADVICE)."""
    split_df = docs.agg((F.floor(F.max("doc_id") / 2) + 1)
                        .cast("long").alias("split_id"))
    h = image_hashes(
        _p6_assets(docs).select(F.shiftright("asset_id", 1)
                                .alias("asset_id"), "payload")) \
        .withColumnRenamed("asset_id", "doc_id")
    bb = resolve_band_bits(band_bits, corpus_n)
    bands = []
    for w in ("dh_w0", "dh_w1"):
        if bb == 16:
            bands.append(F.shiftright(F.col(w), 16)
                         .bitwiseAND(F.lit(0xFFFF)))
            bands.append(F.col(w).bitwiseAND(F.lit(0xFFFF)))
        else:
            bands.append(F.col(w))
    banded = (h.select("doc_id",
                       F.posexplode(F.array(*bands)).alias("band_idx",
                                                           "band_val"))
              .crossJoin(F.broadcast(split_df))
              .withColumn("is_new", F.col("doc_id") >= F.col("split_id"))
              .drop("split_id"))
    occ = F.count(F.lit(1)).over(Window.partitionBy("band_idx",
                                                    "band_val"))
    banded = (banded.withColumn("bucket_n", occ)
              .where(F.col("bucket_n") <= bucket_cap).drop("bucket_n"))
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    cand = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.band_val") == F.col("b.band_val"))
                   & (F.col("a.is_new").cast("int")
                      > F.col("b.is_new").cast("int")))
            .select(F.col("a.doc_id").alias("new_id"),
                    F.col("b.doc_id").alias("old_id"))
            .distinct())
    hn = h.select(F.col("doc_id").alias("new_id"),
                  F.col("dh_w0").alias("n_w0"), F.col("dh_w1").alias("n_w1"))
    ho = h.select(F.col("doc_id").alias("old_id"),
                  F.col("dh_w0").alias("o_w0"), F.col("dh_w1").alias("o_w1"))
    ver = (cand.join(hn, "new_id").join(ho, "old_id")
           .select("new_id", "old_id",
                   (F.bit_count(F.col("n_w0").bitwiseXOR(F.col("o_w0")))
                    + F.bit_count(F.col("n_w1").bitwiseXOR(F.col("o_w1"))))
                   .alias("ham"))
           .where(F.col("ham") <= max_hamming))
    w = Window.partitionBy("new_id").orderBy(F.col("ham").asc(),
                                             F.col("old_id").asc())
    best = (ver.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("new_id", F.col("old_id").alias("matched_old"),
                    F.col("ham").alias("best_hamming")))
    new_docs = (docs.crossJoin(F.broadcast(split_df))
                .where(_prefix_eligible(PHASH_SRC_W * PHASH_SRC_H * 3)
                       & (F.col("doc_id") >= F.col("split_id")))
                .select("doc_id", "source"))
    return (new_docs.join(best, new_docs.doc_id == best.new_id, "left")
            .select("doc_id", "source",
                    F.col("matched_old").isNull().alias("admitted"),
                    "matched_old", "best_hamming")
            .orderBy("doc_id"))


def perceptual_incremental_oracle(
        max_hamming: int = PHASH_IMG_MAX_HAMMING,
        bucket_cap: int = PHASH_BUCKET_CAP) -> str:
    n = PHASH_SRC_W * PHASH_SRC_H * 3
    band_rows = _band16_rows_sql(["dh_w0", "dh_w1"], "h0", "doc_id")
    return f"""
WITH {_img_hash_ctes()},
split AS (
  SELECT CAST(floor(max(doc_id) / 2) + 1 AS BIGINT) AS s FROM documents
), banded AS ({band_rows}),
capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band_idx, band_val) AS bucket_n
    FROM banded)
  WHERE bucket_n <= {bucket_cap}
), cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
  FROM capped a JOIN capped b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  CROSS JOIN split
  WHERE a.doc_id >= split.s AND b.doc_id < split.s
), ver AS (
  SELECT new_id, old_id,
         CAST(bit_count(xor(hn.dh_w0, ho.dh_w0))
              + bit_count(xor(hn.dh_w1, ho.dh_w1)) AS INT) AS ham
  FROM cand JOIN h0 hn ON hn.doc_id = new_id
            JOIN h0 ho ON ho.doc_id = old_id
), best AS (
  SELECT new_id, old_id, ham,
         row_number() OVER (PARTITION BY new_id
                            ORDER BY ham ASC, old_id ASC) AS rn
  FROM ver WHERE ham <= {max_hamming}
)
SELECT d.doc_id, d.source,
       (b.new_id IS NULL) AS admitted,
       b.old_id AS matched_old,
       b.ham AS best_hamming
FROM documents d
CROSS JOIN split
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.new_id = d.doc_id
WHERE d.doc_id >= split.s
  AND length(d.text) >= {n} AND strlen(substr(d.text, 1, {n})) = {n}
ORDER BY d.doc_id
"""


PHASH_PERSIST_BUCKETS = 256   # cap of the 'auto' policy below, and the
                              # fixed default of pre-r15 substrates
PHASH_BUCKET_TARGET_DOCS = 64  # 'auto' keeps >= this many hashed assets
                               # per bucket directory


def phash_auto_buckets(n_assets: int) -> int:
    """Corpus-adaptive bucket count for the persisted perceptual face —
    the minhash_auto_buckets policy applied to the LAST substrate with
    a fixed geometry (r14 VERDICT item 3 / OPTIMIZATION_r14 "Not yet
    optimized" #1): a fixed 256 buckets puts 4 x 256 = 1,024
    directories under every substrate regardless of corpus size — a
    multi-second hive write-commit and listing floor at fixture scale,
    exactly right at 100 TB. Hold >= PHASH_BUCKET_TARGET_DOCS assets
    per bucket directory (power of two, floor 16, cap
    PHASH_PERSIST_BUCKETS); every corpus past ~16k assets resolves to
    the same 256 as before. Admission verdicts are bucket-count-
    independent — the bucket is a pruning route; candidates still
    equi-join on the full 16-bit band_val (pinned by the lifecycle
    pytests). The build stamps the RESOLVED value into the _meta.json
    sidecar; 'auto' at admit/append reads it back, an explicit
    mismatching int still raises."""
    if n_assets <= 0:
        return 16
    raw = n_assets // PHASH_BUCKET_TARGET_DOCS
    p = 1 << max(0, raw.bit_length() - 1)
    return max(16, min(PHASH_PERSIST_BUCKETS, p))


def perceptual_persist(docs: DataFrame, base_dir: str,
                       buckets: int | str = "auto") -> None:
    """Build + persist the perceptual admission substrate ONCE — the
    ivf/hnsw/maxsim partitioned-serving discipline applied to the
    image fingerprints: the per-doc dHash table exploded to its four
    16-bit band values and hive-partitioned by (band_idx, bucket =
    band_val % buckets), each row carrying the full packed words so
    the Hamming verify runs inside the pruned partitions. An admission
    batch touches at most 4 x buckets directories REGARDLESS of corpus
    size — the pruned-read bound that makes daily-crawl admission
    corpus-size-independent at the file listing.

    Incremental maintenance: a plain engine table — append new docs'
    band rows per batch via ``perceptual_append_persisted`` (the
    banding is stateless, so appended rows bucket consistently).

    A ``_meta.json`` sidecar (underscore prefix — invisible to Spark's
    partition discovery) records the build's ``buckets`` so admit and
    append can REFUSE a mismatched geometry instead of silently
    probing the wrong directories (the minhash meta-guard discipline,
    r14). ``buckets='auto'`` (default, r15) resolves corpus-adaptive
    geometry from the hashed-asset count — see phash_auto_buckets."""
    # the decode+hash pass is paid ONCE and materialized
    # (localCheckpoint): it feeds the 'auto' geometry count and the
    # banded write — the frame is compact (5 longs per asset), so the
    # materialization is cheap insurance against Spark re-running the
    # Arrow decode subtree per consumer
    h = _doc_hashes(docs).localCheckpoint()
    if buckets == "auto":
        buckets = phash_auto_buckets(h.count())
    # repartition on the partition columns: one file per occupied
    # directory instead of one per writer task per directory (the
    # minhash_persist probe measured the multi-file layout burying the
    # pruned read in listings/opens — r13)
    (repartition_for_hive(_banded_from_hashes(h, buckets),
                          "band_idx", "bucket")
     .write.mode("overwrite")
     .partitionBy("band_idx", "bucket")
     .parquet(base_dir))
    from vectordb_explorations_spark.sources.sinks import (
        hive_leaf_schema, write_json_sidecar)
    # READ-BACK schema via one leaf dir (a root read would re-list the
    # full tree): admissions pass it to read_hive_pruned so a probe
    # skips the per-call footer read + type inference
    schema = hive_leaf_schema(docs.sparkSession, base_dir, 2)
    write_json_sidecar(docs.sparkSession, f"{base_dir}/_meta.json",
                       {"buckets": buckets,
                        **({"schema": schema.json()}
                           if schema is not None else {})})


def _resolve_perceptual_buckets(spark, base_dir: str, buckets,
                                op: str) -> int:
    """'auto' at serve/append time = the build's stamped value (legacy
    substrates without a sidecar predate the auto policy and were
    always built at the fixed cap); an explicit int differing from the
    build's raises — a silent geometry mismatch would probe the wrong
    bucket directories and miss near-dups."""
    from vectordb_explorations_spark.sources.sinks import (
        read_json_sidecar)

    meta = read_json_sidecar(spark, f"{base_dir}/_meta.json")
    if buckets == "auto":
        if meta is not None and "buckets" in meta:
            return int(meta["buckets"])
        return PHASH_PERSIST_BUCKETS
    buckets = int(buckets)
    if meta is not None and int(meta.get("buckets", buckets)) != buckets:
        raise ValueError(
            f"{op}: caller buckets={buckets} does not match the "
            f"substrate's build value {meta['buckets']} — a mismatched "
            f"geometry probes the wrong bucket directories and "
            f"silently misses near-dups. Use the build's value "
            f"(persisted in {{base_dir}}/_meta.json).")
    return buckets


def _doc_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, ah_*, dh_*) via the REAL image decode over the
    synthesized P6 assets — the one Arrow decode pass every persisted-
    face writer shares."""
    return image_hashes(
        _p6_assets(docs).select(F.shiftright("asset_id", 1)
                                .alias("asset_id"), "payload")) \
        .withColumnRenamed("asset_id", "doc_id")


def _banded_from_hashes(h: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, dh_w0, dh_w1, band_idx, band_val, bucket) substrate
    rows from an already-hashed frame."""
    bands = []
    for w in ("dh_w0", "dh_w1"):
        bands.append(F.shiftright(F.col(w), 16).bitwiseAND(F.lit(0xFFFF)))
        bands.append(F.col(w).bitwiseAND(F.lit(0xFFFF)))
    return (h.select(
        "doc_id", "dh_w0", "dh_w1",
        F.posexplode(F.array(*bands)).alias("band_idx", "band_val"))
        .withColumn("bucket", F.col("band_val") % buckets))


def _banded_fingerprints(docs: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, dh_w0, dh_w1, band_idx, band_val, bucket) substrate rows
    — shared by the bulk build and the incremental append so the two
    writers cannot drift."""
    return _banded_from_hashes(_doc_hashes(docs), buckets)


def perceptual_append_persisted(docs: DataFrame, base_dir: str,
                                buckets: int | str = "auto"
                                ) -> None:
    """Append an ADMITTED batch's image fingerprints to the substrate —
    the maintenance step after ``perceptual_admit_persisted`` says yes.
    The banding is stateless (band_val % buckets), so appended rows
    bucket exactly as the bulk build did; hive append touches only the
    batch's own bucket directories ('auto' reads the build's stamped
    value back). Caller owns idempotence markers. A buckets value
    differing from the build's (sidecar) raises."""
    buckets = _resolve_perceptual_buckets(docs.sparkSession, base_dir,
                                          buckets,
                                          "perceptual_append_persisted")
    from vectordb_explorations_spark.sources.sinks import V1_COMMITTER
    (repartition_for_hive(_banded_fingerprints(docs, buckets),
                          "band_idx", "bucket")
     .write.mode("append").options(**V1_COMMITTER)
     .partitionBy("band_idx", "bucket")
     .parquet(base_dir))


def perceptual_delete_persisted(spark, base_dir: str, doc_ids) -> int:
    """Erase documents from the persisted perceptual substrate — a
    re-upload of an erased image is ADMITTED afterwards (nothing
    remembers its fingerprint). Bounded-touch via
    sinks.delete_rows_partitioned: only the victims' (band_idx, bucket)
    directories rewrite. Returns rows removed."""
    from vectordb_explorations_spark.sources.sinks import (
        delete_rows_partitioned)

    return delete_rows_partitioned(spark, base_dir,
                                   ["band_idx", "bucket"], "doc_id",
                                   doc_ids)


def perceptual_admit_persisted(spark, base_dir: str, new_docs: DataFrame,
                               max_hamming: int = PHASH_IMG_MAX_HAMMING,
                               buckets: int | str = "auto"
                               ) -> DataFrame:
    """Admit a NEW batch against the persisted substrate: the batch's
    hashes band locally, their distinct (band_idx, bucket) probe pairs
    resolve driver-side (BOUNDED: at most 4 x buckets <= 1024 pairs
    whatever the batch size), and the substrate read carries the
    band_idx/bucket isin conjuncts the FILE LISTING prunes on
    (PartitionFilters — plan-asserted in tests) plus the packed-key
    isin that keeps the probe exact within the pruned rectangles (the
    maxsim 504-leg OR-chain lesson). Candidates equi-join on the full
    band value, verify Hamming inside the pruned rows, best match by
    (hamming ASC, old doc_id ASC). Output: one row per payload-eligible
    batch doc with its admission verdict — the serving twin of
    perceptual_incremental's batch-internal split. ``buckets='auto'``
    (default) reads the build's stamped geometry back; an explicit
    value differing from the build's (sidecar) raises — a silent
    geometry mismatch would probe the wrong directories (r14 guard)."""
    buckets = _resolve_perceptual_buckets(spark, base_dir, buckets,
                                          "perceptual_admit_persisted")
    nh = image_hashes(
        _p6_assets(new_docs).select(F.shiftright("asset_id", 1)
                                    .alias("asset_id"), "payload")) \
        .withColumnRenamed("asset_id", "new_id")
    bands = []
    for w in ("dh_w0", "dh_w1"):
        bands.append(F.shiftright(F.col(w), 16).bitwiseAND(F.lit(0xFFFF)))
        bands.append(F.col(w).bitwiseAND(F.lit(0xFFFF)))
    # localCheckpoint: nb feeds the driver-side probe collect AND the
    # candidate join below, and Spark re-executes identical subtrees —
    # without it the batch's Arrow decode+hash pass ran twice per
    # admission (the maxsim/minhash serve lesson, r13). Bounded: the
    # admission batch's band rows only.
    nb = (nh.select("new_id",
                    F.col("dh_w0").alias("n_w0"),
                    F.col("dh_w1").alias("n_w1"),
                    F.posexplode(F.array(*bands)).alias("band_idx",
                                                        "band_val"))
          .withColumn("bucket", F.col("band_val") % buckets)
          .localCheckpoint())
    probe = {(int(r["band_idx"]), int(r["bucket"]))
             for r in nb.select("band_idx", "bucket").distinct().collect()}
    # read ONLY the probed (band_idx, bucket) directories with the
    # build's read-back schema: the full-tree discovery + footer read
    # re-paid per admission is the probe's fixed floor (the minhash
    # admission measurement — guide §6 file-listing discipline)
    import json as _json

    from pyspark.sql.types import StructType
    from vectordb_explorations_spark.sources.sinks import (
        read_hive_pruned, read_json_sidecar)
    _meta = read_json_sidecar(spark, f"{base_dir}/_meta.json") or {}
    _schema = (StructType.fromJson(_json.loads(_meta["schema"]))
               if "schema" in _meta else None)
    idx = read_hive_pruned(spark, base_dir, ["band_idx", "bucket"],
                           probe, schema=_schema)
    if idx is None:
        idx = spark.read.parquet(base_dir).limit(0)
    pred = (F.col("band_idx").isin(sorted({b for b, _ in probe}))
            & F.col("bucket").isin(sorted({k for _, k in probe}))
            & (F.col("band_idx") * buckets + F.col("bucket")).isin(
                sorted(b * buckets + k for b, k in probe)))
    old = (idx.where(pred)
           .select(F.col("doc_id").alias("old_id"),
                   F.col("dh_w0").alias("o_w0"),
                   F.col("dh_w1").alias("o_w1"),
                   "band_idx", "band_val"))
    ver = (nb.join(old, ["band_idx", "band_val"])
           .select("new_id", "old_id",
                   (F.bit_count(F.col("n_w0").bitwiseXOR(F.col("o_w0")))
                    + F.bit_count(F.col("n_w1").bitwiseXOR(F.col("o_w1"))))
                   .alias("ham"))
           .where(F.col("ham") <= max_hamming)
           .distinct())
    w = Window.partitionBy("new_id").orderBy(F.col("ham").asc(),
                                             F.col("old_id").asc())
    best = (ver.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("new_id", F.col("old_id").alias("matched_old"),
                    F.col("ham").alias("best_hamming")))
    eligible = (new_docs.where(
        _prefix_eligible(PHASH_SRC_W * PHASH_SRC_H * 3))
        .select("doc_id"))
    return (eligible.join(best, eligible.doc_id == best.new_id, "left")
            .select("doc_id",
                    F.col("matched_old").isNull().alias("admitted"),
                    "matched_old", "best_hamming")
            .orderBy("doc_id"))


def dedup_perceptual_clusters(docs: DataFrame,
                              max_hamming: int = AUDIO_MAX_HAMMING,
                              max_iters: int = 20,
                              band_bits: int | str = 16,
                              corpus_n: int | None = None) -> DataFrame:
    """Document-level perceptual dup clusters: two documents cluster
    when ANY of their audio assets pair perceptually (the end-of-
    pipeline view a curation run keeps — one representative per
    cluster). Asset pairs collapse to doc pairs by asset_id >> 1 (the
    re-encode planted pairs become self-loops and drop), then the
    dedup family's min-label propagation (dedup.propagate_min_labels —
    pointer-jumped, O(log diameter) rounds) assigns each root over the
    payload-eligible doc universe. The audio contour is the clustering
    signal because its 32-bit resolution yields genuine cross-document
    collisions — exactly the transitive structure a cluster view
    exists to resolve (the 64-bit image hash pairs are near-pure
    re-encode self-loops on this fixture).

    Scale shape: the banded pair join (see perceptual_audio_pairs) +
    the same label-propagation loop dedup_clusters runs — each round
    one keyed join + one min agg on the compact (doc, root) frame."""
    from vectordb_explorations_spark.operators.dedup import (
        propagate_min_labels)

    pairs = dedup_perceptual_audio(docs, max_hamming,
                                   band_bits=band_bits, corpus_n=corpus_n)
    doc_pairs = (pairs.select(
        F.shiftright("id_a", 1).alias("doc_id_a"),
        F.shiftright("id_b", 1).alias("doc_id_b"))
        .where(F.col("doc_id_a") != F.col("doc_id_b"))
        .distinct())
    nodes = (docs.where(_prefix_eligible(AUDIO_N_SAMPLES))
             .select("doc_id"))
    return propagate_min_labels(nodes, doc_pairs, max_iters)


def dedup_perceptual_clusters_oracle(
        max_hamming: int = AUDIO_MAX_HAMMING) -> str:
    """Transitive closure by recursive CTE over the audio pair oracle —
    the dedup_clusters_oracle pattern on the perceptual graph."""
    pairs_sql = dedup_perceptual_audio_oracle(max_hamming).strip()
    n = AUDIO_N_SAMPLES
    return f"""
WITH RECURSIVE pairs AS (
  {pairs_sql}
), dp AS (
  SELECT DISTINCT id_a // 2 AS a, id_b // 2 AS b FROM pairs
  WHERE id_a // 2 <> id_b // 2
), edges AS (
  SELECT a AS src, b AS dst FROM dp
  UNION
  SELECT b AS src, a AS dst FROM dp
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
), docs_f AS (
  SELECT doc_id FROM documents
  WHERE length(text) >= {n} AND strlen(substr(text, 1, {n})) = {n}
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS root
FROM docs_f d LEFT JOIN reach r ON r.src = d.doc_id
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def dedup_perceptual_image_oracle(
        max_hamming: int = PHASH_IMG_MAX_HAMMING) -> str:
    tail = _pairs_tail_sql(
        ["dh_w0", "dh_w1"],
        {"ham_dhash": ["dh_w0", "dh_w1"], "ham_ahash": ["ah_w0", "ah_w1"]},
        "ham_dhash", max_hamming)
    return f"""
WITH {_img_hash_ctes()},
h AS (  -- original (2k) and its lossless re-encode (2k+1): same hash
  SELECT doc_id * 2 + v AS asset_id, ah_w0, ah_w1, dh_w0, dh_w1
  FROM h0, (VALUES (0), (1)) t(v)
), {tail.lstrip()}"""


def dedup_perceptual_audio_oracle(
        max_hamming: int = AUDIO_MAX_HAMMING) -> str:
    tail = _pairs_tail_sql(["eh_w0"], {"ham_contour": ["eh_w0"]},
                           "ham_contour", max_hamming)
    return f"""
WITH {_aud_hash_ctes()},
h AS (
  SELECT doc_id * 2 + v AS asset_id, eh_w0
  FROM h0, (VALUES (0), (1)) t(v)
), {tail.lstrip()}"""


def dedup_cross_codec_image_oracle(
        max_hamming: int = PHASH_IMG_MAX_HAMMING) -> str:
    """Quintuplet twin of dedup_perceptual_image_oracle: P6 / BMP /
    PNG / GIF / TIFF are all lossless carriers of the same raster, so
    the five assets (5k .. 5k+4) share one hash row — the oracle
    never runs a codec, it rides the invariance the engine's real
    decodes must reproduce."""
    tail = _pairs_tail_sql(
        ["dh_w0", "dh_w1"],
        {"ham_dhash": ["dh_w0", "dh_w1"], "ham_ahash": ["ah_w0", "ah_w1"]},
        "ham_dhash", max_hamming)
    return f"""
WITH {_img_hash_ctes()},
h AS (  -- original (5k) and its four lossless re-encodes: same hash
  SELECT doc_id * 5 + v AS asset_id, ah_w0, ah_w1, dh_w0, dh_w1
  FROM h0, (VALUES (0), (1), (2), (3), (4)) t(v)
), {tail.lstrip()}"""


def dedup_cross_codec_audio_oracle(
        max_hamming: int = AUDIO_MAX_HAMMING) -> str:
    """WAV8 / WAV16 / FLAC / float32-WAV quadruplet: the 16-bit
    re-encode inverts under the contour's floor-divide centering,
    FLAC is lossless over the same int16 samples, and float32 holds
    them exactly under clip(rint(x*32767)) — all four share one
    contour hash."""
    tail = _pairs_tail_sql(["eh_w0"], {"ham_contour": ["eh_w0"]},
                           "ham_contour", max_hamming)
    return f"""
WITH {_aud_hash_ctes()},
h AS (
  SELECT doc_id * 4 + v AS asset_id, eh_w0
  FROM h0, (VALUES (0), (1), (2), (3)) t(v)
), {tail.lstrip()}"""
