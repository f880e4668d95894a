#!/usr/bin/env python3
"""Span-dedup scale probe: the exact-substring family (pairs / coverage /
strip) measured at corpus sizes far past the 5k-doc fixture, with planted
duplicated spans of KNOWN structure so the outputs are checkable, not
just timeable.

Generator (deterministic, no RNG): N docs x 50 six-char md5 words; every
10th doc carries a 25-token span shared by the ~50 docs of its template
id (T = N/500 templates), inserted at positions 10..34. So the expected
structure is exact: each template contributes C(50,2) = 1,225 doc pairs
(occupancy 50 < SUBSTRING_PAIR_MAX_DOCS), spanned docs have coverage
25/50 = 0.5, and a strip removes 25 tokens from every spanned doc except
each template's keeper.

    python tools/span_dedup_probe.py [N ...]   # default 100k 1M
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

SIZES = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
N_WORDS = 50
SPAN_LEN = 25
SPAN_EVERY = 10     # every 10th doc carries a span
DOCS_PER_TEMPLATE = 50


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.dedup import (
        SUBSTRING_PAIR_MAX_DOCS, exact_substring_pairs,
        strip_duplicated_spans, substring_dup_coverage)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="span-dedup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n: int):
        t = max(1, n // SPAN_EVERY // DOCS_PER_TEMPLATE)
        path = f"/tmp/span_probe_docs_{n}"
        if not os.path.exists(path):
            words = (
                f"transform(sequence(0, {N_WORDS - 1}), i -> "
                f"CASE WHEN id % {SPAN_EVERY} = 0 AND i >= 10 "
                f"AND i < {10 + SPAN_LEN} THEN "
                f"substr(md5(concat('span_', CAST((id DIV {SPAN_EVERY}) "
                f"% {t} AS STRING), '_', i)), 1, 6) "
                f"ELSE substr(md5(concat(id, '_', i)), 1, 6) END)")
            (spark.range(n)
             .select(F.col("id").alias("doc_id"),
                     F.array_join(F.expr(words), " ").alias("text"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        return spark.read.parquet(path).cache(), t

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    rows = []
    for n in SIZES:
        docs, t = gen(n)
        docs.count()
        timings = {}

        t0 = time.time()
        n_pairs = exact_substring_pairs(docs).count()
        timings["pairs_s"] = round(time.time() - t0, 2)
        expected_pairs = t * (DOCS_PER_TEMPLATE * (DOCS_PER_TEMPLATE - 1) // 2)

        t0 = time.time()
        cov = substring_dup_coverage(docs)
        stats = cov.agg(
            F.count(F.when(F.col("coverage") > 0, 1)).alias("dup_docs"),
            F.round(F.max("coverage"), 3).alias("max_cov")).collect()[0]
        timings["coverage_s"] = round(time.time() - t0, 2)

        t0 = time.time()
        force(strip_duplicated_spans(docs))
        timings["strip_s"] = round(time.time() - t0, 2)

        row = {"n_docs": n, "templates": t, "pairs": n_pairs,
               "expected_pairs": expected_pairs,
               "dup_docs": int(stats["dup_docs"]),
               "expected_dup_docs": t * DOCS_PER_TEMPLATE,
               "max_cov": float(stats["max_cov"]), **timings}
        rows.append(row)
        print(f"[spanprobe] {json.dumps(row)}", flush=True)
        docs.unpersist()

    print()
    print("| docs | templates | pairs (expected) | dup docs (expected) "
          "| pairs s | coverage s | strip s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n_docs']:,} | {r['templates']:,} "
              f"| {r['pairs']:,} ({r['expected_pairs']:,}) "
              f"| {r['dup_docs']:,} ({r['expected_dup_docs']:,}) "
              f"| {r['pairs_s']} | {r['coverage_s']} | {r['strip_s']} |")


if __name__ == "__main__":
    main()
