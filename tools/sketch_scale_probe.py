#!/usr/bin/env python3
"""Sketch-family scale probe (r14 continuation): run the sketch
operators — hll_user_cardinality, cms_heavy_hitters,
bloom_join_prune, kmv_source_overlap — over synthetic corpora at 1M
and 10M rows and verify the structural claims the fixture tests
cannot reach:

- WALL TIME should grow roughly with the SCAN, not the key space:
  every sketch is a combinable groupBy whose shuffle is (groups x m)
  rows regardless of input size.
- HLL: |rel_error| within 3 sigma of the m=16 binomial bound (0.78)
  at 100k+ distinct keys, and the emitted exact harmonic sum is
  internally consistent (recomputable from the registers' claim).
- CMS: overcount >= 0 on every emitted row at every scale.
- Bloom: ZERO false negatives (n_pass == n_true_member +
  n_false_pos), and the measured false-positive rate stays within
  ~4x of the 16-bits/key theory (0.14%) — the corpus-adaptive sizing
  claim at corpus sizes where a fixed-m filter is pure noise.

Prints a table; run:

    python tools/sketch_scale_probe.py [N ...]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.session import get_spark  # noqa: E402
from vectordb_explorations_spark.operators.sketches import (  # noqa: E402
    bloom_join_prune, cms_heavy_hitters, hll_user_cardinality,
    kmv_source_overlap)

SIZES = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
DISTINCT_USERS = 100_000


def main() -> None:
    spark = get_spark(master="local[32]")
    print(f"{'rows':>12} {'op':24} {'wall_s':>8}  verdict")
    for n in SIZES:
        # synthetic events: user ids hash-scattered over a fixed key
        # space, 5 event types — the fixture shape at 10-1000x
        events = (spark.range(n).select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id"), F.lit(DISTINCT_USERS)).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string"))
            .alias("event_type"))).localCheckpoint()

        t0 = time.time()
        hll = hll_user_cardinality(events).collect()
        t_hll = time.time() - t0
        worst = max(abs(r.rel_error) for r in hll)
        ok = all(abs(r.rel_error) < 0.78 for r in hll)
        print(f"{n:>12} {'hll_user_cardinality':24} {t_hll:>8.2f}  "
              f"{'OK' if ok else 'FAIL'} worst |rel_err| {worst:.3f} "
              f"over {len(hll)} groups")

        t0 = time.time()
        cms = cms_heavy_hitters(events).collect()
        t_cms = time.time() - t0
        ok = len(cms) == 20 and all(r.overcount >= 0 for r in cms)
        print(f"{n:>12} {'cms_heavy_hitters':24} {t_cms:>8.2f}  "
              f"{'OK' if ok else 'FAIL'} top true_n {cms[0].true_n}, "
              f"max overcount {max(r.overcount for r in cms)}")

        # bloom: n/100 customers (half eligible), orders = events shape
        ncust = max(n // 100, 1000)
        customer = spark.range(ncust).select(
            F.col("id").alias("c_custkey"),
            F.when(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2)) == 0, 9000.0)
            .otherwise(1.0).alias("c_acctbal"))
        orders = (spark.range(n // 10).select(
            F.col("id").alias("o_orderkey"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(ncust)).alias("o_custkey"),
            F.concat(F.lit("p"), (F.col("id") % 5).cast("string"))
            .alias("o_orderpriority")))
        t0 = time.time()
        bl = bloom_join_prune(customer, orders).collect()
        t_bl = time.time() - t0
        no_fn = all(r.n_pass == r.n_true_member + r.n_false_pos
                    for r in bl)
        fpr = (sum(r.n_false_pos for r in bl)
               / max(sum(r.n_orders - r.n_true_member for r in bl), 1))
        ok = no_fn and fpr < 4 * 0.0014
        print(f"{n:>12} {'bloom_join_prune':24} {t_bl:>8.2f}  "
              f"{'OK' if ok else 'FAIL'} fpr {fpr:.5f} "
              f"(theory 0.00140), build keys ~{ncust // 2}")
        events.unpersist()

        # KMV: synthetic documents with PLANTED overlap structure —
        # 20 sources, source s draws 12 words per doc from vocab slice
        # [50s, 50s+100), so ADJACENT sources share half their vocab
        # (non-trivial shingle overlap) and distant pairs share none.
        # n_docs = n/10 keeps the shingle stream ~ the event stream.
        ndocs = max(n // 10, 10_000)
        word = [F.concat(F.lit("w"), ((F.col("id") % 20) * 50
                 + F.pmod(F.xxhash64("id", F.lit(k)), F.lit(100)))
                 .cast("string")) for k in range(12)]
        docs = (spark.range(ndocs).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string"))
            .alias("source"),
            F.concat_ws(" ", *word).alias("text"))).localCheckpoint()
        t0 = time.time()
        kmv = kmv_source_overlap(docs).collect()
        t_kmv = time.time() - t0
        worst_j = max(abs(r.jaccard_err) for r in kmv)
        ok = (len(kmv) == 190
              and all(abs(r.jaccard_err) < 0.15 for r in kmv)
              and len({r.jaccard_est for r in kmv}) > 1)
        print(f"{n:>12} {'kmv_source_overlap':24} {t_kmv:>8.2f}  "
              f"{'OK' if ok else 'FAIL'} worst |jacc_err| {worst_j:.4f} "
              f"over {len(kmv)} pairs ({ndocs} docs)")
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
