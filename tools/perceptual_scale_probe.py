#!/usr/bin/env python3
"""Scale probe for the round-12 additions: perceptual image/audio
near-dup and BPE token accounting, at corpus sizes far past the 500-doc
fixture, with planted structure of KNOWN shape so outputs are
checkable, not just timeable.

Generators (deterministic, no RNG):

- documents: N docs x 50 hashed 6-char words (349 ASCII chars — every
  doc clears both payload prefixes). Every DUP_EVERY-th doc (id % 1000
  == 1) COPIES the previous doc's text, planting a cross-document
  perceptual duplicate: the duo's 4 assets (2 originals + 2
  re-encodes) collide pairwise at Hamming 0 — C(4,2)=6 pairs where two
  normal docs contribute 2 — so the structural total is
  N + 4 * duo-count. The ASSERTED check is the planted RE-ENCODE pair
  count (id_a even, id_b = id_a + 1): exactly N, collision-proof by
  id structure. Pairs beyond the structural total are RECORDED as
  extras, not failed — they are true fingerprint behavior on this
  generator, not noise: every probe doc shares the same space grid (a
  6-char word + separator every 7 bytes), i.e. the same TEXTURE, so
  distinct docs genuinely land within the image hash's Hamming budget
  sometimes (~0.016% of structural volume at 1M), and the 32-bit
  audio contour additionally birthday-collides past ~100k docs — the
  resolution limit a 32-bit fingerprint carries by construction
  (lengthen the contour for more discrimination — the documented
  scale path).
- BPE: N docs of the FIXED sentence "table hash query row stream
  teeth" repeated 8 times — 48 whitespace tokens and exactly 128 BPE
  tokens per doc under the baked merges (16 per sentence: 1+1+3+1+5+5),
  so corpus totals are exact.

The probe runs the declared-query path (band_bits pinned 16 at the
fixture-faithful 100k row, 'auto'→32 above) and measures wall seconds.

    python tools/perceptual_scale_probe.py [N ...]   # default 100k 1M
"""

from __future__ import annotations

import json
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 20k exercises the 16-bit-band path (40k assets <= the auto cutoff);
# the larger sizes ride 'auto' -> 32-bit bands
SIZES = [int(a) for a in sys.argv[1:]] or [20_000, 100_000, 1_000_000]
N_WORDS = 50
DUP_EVERY = 1000
SENTENCE_BPE_TOKENS = 16      # table+hash+query+row+stream+teeth
SENTENCE_WS_TOKENS = 6
REPS = 8


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.perceptual import (
        dedup_perceptual_audio, dedup_perceptual_image)
    from vectordb_explorations_spark.operators.textops import (
        bpe_token_counts)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="perceptual-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen_docs(n: int):
        path = f"/tmp/perceptual_probe_docs_{n}"
        if not os.path.exists(path):
            # id%DUP_EVERY==1 copies id-1's text: base both on the
            # SAME seed id so the copy is exact. Word lengths VARY
            # (4-9 chars, seed-hashed) so the separator positions —
            # hence the raster texture — decorrelate across docs: a
            # fixed 6-char grid gave every doc the SAME space lattice,
            # and at 10M docs the correlated band values drove buckets
            # past the occupancy cap, dropping planted pairs (the
            # cap's recall trade, kept as documented evidence in
            # SCALE_NOTES; this generator is the realistic-corpus
            # shape). Min doc length 50*(4+1)-1 = 249 > both payload
            # prefixes.
            words = (
                f"transform(sequence(0, {N_WORDS - 1}), i -> "
                f"substr(md5(concat('v_', CAST((id - CASE WHEN "
                f"id % {DUP_EVERY} = 1 THEN 1 ELSE 0 END) * {N_WORDS}"
                f" + i AS STRING))), 1, "
                f"4 + abs(hash((id - CASE WHEN id % {DUP_EVERY} = 1 "
                f"THEN 1 ELSE 0 END) * {N_WORDS} + i)) % 6))")
            (spark.range(n)
             .select(F.col("id").alias("doc_id"),
                     F.array_join(F.expr(words), " ").alias("text"),
                     F.lit("en").alias("lang"),
                     F.lit("probe").alias("source"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        return spark.read.parquet(path).cache()

    def gen_bpe_docs(n: int):
        path = f"/tmp/perceptual_probe_bpedocs_{n}"
        if not os.path.exists(path):
            sent = " ".join(["table hash query row stream teeth"] * REPS)
            (spark.range(n)
             .select(F.col("id").alias("doc_id"),
                     F.lit(sent).alias("text"),
                     F.lit("en").alias("lang"),
                     F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
                     .alias("source"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        return spark.read.parquet(path).cache()

    rows = []
    for n in SIZES:
        docs = gen_docs(n)
        docs.count()
        timings: dict[str, float] = {}
        checks: dict[str, bool] = {}
        duos = (n - 2) // DUP_EVERY + 1 if n > 1 else 0
        structural = n + 4 * duos
        band_bits = 16 if 2 * n <= 100_000 else "auto"
        planted = (F.col("id_a") % 2 == 0) & (F.col("id_b")
                                              == F.col("id_a") + 1)
        extras: dict[str, int] = {}

        t0 = time.time()
        img = dedup_perceptual_image(docs, band_bits=band_bits,
                                     corpus_n=2 * n)
        img_stats = img.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.count(F.when(planted, 1)).alias("planted"),
            F.max("ham_dhash").alias("max_ham")).collect()[0]
        timings["image_s"] = round(time.time() - t0, 2)
        checks["image_planted_found"] = int(img_stats["planted"]) == n
        checks["image_verify_bound_held"] = int(img_stats["max_ham"]) <= 6
        extras["image_planted_recall"] = round(
            int(img_stats["planted"]) / n, 4)
        extras["image_extra_pairs"] = int(img_stats["pairs"]) - structural

        t0 = time.time()
        aud = dedup_perceptual_audio(docs, band_bits=band_bits,
                                     corpus_n=2 * n)
        aud_stats = aud.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.count(F.when(planted, 1)).alias("planted")).collect()[0]
        timings["audio_s"] = round(time.time() - t0, 2)
        checks["audio_planted_found"] = int(aud_stats["planted"]) == n
        extras["audio_planted_recall"] = round(
            int(aud_stats["planted"]) / n, 4)
        extras["audio_extra_pairs"] = int(aud_stats["pairs"]) - structural
        docs.unpersist()

        bdocs = gen_bpe_docs(n)
        bdocs.count()
        t0 = time.time()
        bpe = bpe_token_counts(bdocs).collect()
        timings["bpe_s"] = round(time.time() - t0, 2)
        checks["bpe_sources"] = len(bpe) == 4
        checks["bpe_ws_total"] = (
            sum(r.ws_tokens for r in bpe)
            == n * SENTENCE_WS_TOKENS * REPS)
        checks["bpe_tokens_total"] = (
            sum(r.bpe_tokens for r in bpe)
            == n * SENTENCE_BPE_TOKENS * REPS)
        bdocs.unpersist()

        row = {"n_docs": n, "band_bits": str(band_bits),
               "structural_pairs": structural, **extras, **timings,
               "checks_pass": all(checks.values()),
               "failed": [k for k, v in checks.items() if not v]}
        rows.append(row)
        print(f"[perceptualprobe] {json.dumps(row)}", flush=True)

    print()
    print("| docs | bands | image s | audio s | bpe s | planted checks |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        status = "ALL PASS" if r["checks_pass"] else f"FAIL {r['failed']}"
        print(f"| {r['n_docs']:,} | {r['band_bits']} | {r['image_s']} "
              f"| {r['audio_s']} | {r['bpe_s']} | {status} |")


if __name__ == "__main__":
    main()
