#!/usr/bin/env python3
"""Span-admission state-growth probe — the r7 state-growth discipline
applied to the streaming span-dedup family (r11).

``span_admission_ingest`` persists ONE (md5-hex fp, first_doc) parquet
row per distinct corpus window fingerprint — by construction that count
is batch-derivable (distinct fps of everything ingested), so this probe:

1. runs a REAL two-batch ingest at the smallest N and validates the
   estimator against the actual persisted state table (row count and
   on-disk bytes),
2. measures the estimator at the larger sizes with the cheap batch
   count (docs x 50 tokens, every 10th doc carrying a 25-token planted
   span — the span_dedup_probe corpus, so duplicated-fp sharing is
   known structure, not noise),
3. prints the bytes/row and rows/doc curve for SCALE_NOTES.

Run: python tools/span_state_probe.py [max_n]
"""

from __future__ import annotations

import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SIZES = [n for n in (20_000, 100_000, 1_000_000) if n <= MAX_N]
N_WORDS = 50
SPAN_LEN = 25
SPAN_EVERY = 10
DOCS_PER_TEMPLATE = 50


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.dedup import (
        SUBSTRING_WINDOW, _span_windows)
    from vectordb_explorations_spark.session import get_spark
    from vectordb_explorations_spark.streaming.documents import (
        span_admission_ingest)
    from vectordb_explorations_spark.streaming.events import await_drained

    spark = get_spark(app_name="span-state-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n: int):
        t = max(1, n // SPAN_EVERY // DOCS_PER_TEMPLATE)
        path = f"/tmp/span_probe_docs_{n}"  # shared with span_dedup_probe
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
        return spark.read.parquet(path)

    # 1) real two-batch ingest at the smallest N: state row count must
    # equal the batch-derived distinct-fp count, idempotently
    n0 = SIZES[0]
    docs = gen(n0)
    d = tempfile.mkdtemp(prefix="span_state_src_")
    half = n0 // 2
    (docs.where(F.col("doc_id") < half).coalesce(1)
     .write.parquet(f"{d}/b1.parquet"))
    (docs.where(F.col("doc_id") >= half).coalesce(1)
     .write.parquet(f"{d}/b2.parquet"))
    schema = "doc_id long, text string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(d + "/*.parquet"))
    state = tempfile.mkdtemp(prefix="span_state_")
    results = tempfile.mkdtemp(prefix="span_hits_")
    await_drained(span_admission_ingest(spark, stream, state, results))
    state_df = spark.read.parquet(state)
    rows = state_df.count()
    expect = (_span_windows(docs, SUBSTRING_WINDOW)
              .select("fp").distinct().count())
    by = _dir_bytes(state)
    print(f"[probe] N={n0:,}: REAL state rows={rows:,} "
          f"(batch-derived distinct fps={expect:,}, "
          f"{'MATCH' if rows == expect else 'MISMATCH'}), "
          f"state bytes={by:,} ({by / rows:.1f} B/row parquet-compressed, "
          f"{rows / n0:.1f} rows/doc)", flush=True)
    assert rows == expect, (rows, expect)

    # 2) estimator at the larger rungs (the cheap batch count)
    for n in SIZES[1:]:
        docs = gen(n)
        fps = (_span_windows(docs, SUBSTRING_WINDOW)
               .select("fp").distinct().count())
        # raw row payload: 32-hex md5 + int64 ≈ 40 B + parquet overhead;
        # use the measured compressed B/row from the real rung
        print(f"[probe] N={n:,}: distinct fps={fps:,} "
              f"({fps / n:.1f} rows/doc, est. state "
              f"{fps * (by / rows) / 1e6:.0f} MB at the measured "
              f"B/row)", flush=True)


if __name__ == "__main__":
    main()
