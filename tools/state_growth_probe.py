#!/usr/bin/env python3
"""Streaming near-dedup state-growth probe (r7 verdict item 6).

``near_dup_stream`` keeps one state row per occupied (band_idx,
band_key). By construction that count is batch-derivable — the distinct
banded keys of everything ingested — so this probe:

1. validates the estimator against a REAL stream's state-store metrics
   (numRowsTotal / memoryUsedBytes from lastProgress) at the smallest N,
2. measures occupancy at 100k / 300k / 1M synthetic docs (10% exact
   near-dup groups, the crawl-ish shape) with the cheap batch count,
3. appends the table + the bounded-state policy note to SCALE_NOTES.md.

Run: python tools/state_growth_probe.py [max_n]
"""

from __future__ import annotations

import os
import sys
import time
import uuid

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
SIZES = [n for n in (100_000, 300_000, 1_000_000) if n <= MAX_N]
WORDS_PER_DOC = 12


def synth_docs(spark, n: int):
    """n synthetic documents: 10% are exact copies of their group head
    (doc_id % 10 == 9 copies doc_id - 9), the rest unique word strings —
    unique shingle neighborhoods stay unique, dups collide in ALL bands."""
    from pyspark.sql import functions as F

    base = spark.range(n).withColumnRenamed("id", "doc_id")
    seed = F.when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 9) \
        .otherwise(F.col("doc_id"))
    words = [F.substring(F.md5(F.concat_ws("_", seed.cast("string"),
                                           F.lit(str(j)))), 1, 8)
             for j in range(WORDS_PER_DOC)]
    text = F.concat_ws(" ", *words)
    return base.select(
        "doc_id", text.alias("text"), F.lit("en").alias("lang"),
        F.lit("synth").alias("source"), F.length(text).alias("n_chars"))


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.dedup import (
        banded_keys, minhash_signatures_stateless)
    from vectordb_explorations_spark.session import get_spark
    from vectordb_explorations_spark.streaming.documents import (
        near_dup_stream)
    from vectordb_explorations_spark.streaming.events import run_to_memory

    spark = get_spark(app_name="state-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. validate the batch estimator against real state-store metrics
    n0 = SIZES[0]
    path = f"/tmp/state_probe_docs_{n0}"
    synth_docs(spark, n0).repartition(8).write.mode("overwrite").parquet(path)
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, "
                      "source string, n_chars long")
              .parquet(path))
    name = f"sgp_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    q = run_to_memory(near_dup_stream(stream), name, "append")
    q.awaitTermination(1800)
    stream_s = round(time.time() - t0, 1)
    prog = q.lastProgress
    op = prog["stateOperators"][0]
    state_rows_real = int(op["numRowsTotal"])
    state_bytes_real = int(op["memoryUsedBytes"])
    flagged = spark.table(name).select("doc_id").distinct().count()

    def occupied(n: int) -> int:
        docs = synth_docs(spark, n)
        return (banded_keys(minhash_signatures_stateless(docs))
                .select("band_idx", "band_key").distinct().count())

    est0 = occupied(n0)
    bytes_per_row = state_bytes_real / max(1, state_rows_real)
    print(f"[probe] real stream at {n0:,}: state_rows={state_rows_real:,} "
          f"(batch-derived {est0:,}), bytes={state_bytes_real:,} "
          f"({bytes_per_row:.0f} B/row), flagged={flagged:,}, "
          f"{stream_s}s", flush=True)

    rows = [(n0, est0, state_rows_real, state_bytes_real)]
    for n in SIZES[1:]:
        cnt = occupied(n)
        rows.append((n, cnt, None, int(cnt * bytes_per_row)))
        print(f"[probe] {n:,}: occupied bands {cnt:,} "
              f"(~{cnt * bytes_per_row / 1e6:.0f} MB)", flush=True)

    lines = [
        "",
        "## Round-8 addendum: streaming near-dedup state growth "
        "(r7 verdict item 6)",
        "",
        f"`near_dup_stream` keeps one state row per occupied (band_idx, "
        f"band_key) — forever, under the default NoTimeout. Synthetic "
        f"corpus: {WORDS_PER_DOC}-word docs, 10% exact near-dup groups, "
        f"{len(SIZES)} sizes; the batch-derived occupancy count was "
        f"validated against a real run's state-store metrics at "
        f"{n0:,} docs (numRowsTotal {state_rows_real:,} vs batch "
        f"{est0:,}; {bytes_per_row:.0f} B/row incl. RocksDB/HDFS-store "
        f"overhead). Regenerate: `python tools/state_growth_probe.py`.",
        "",
        "| docs ingested | state rows (occupied bands) | store bytes |",
        "|---|---|---|",
    ]
    for n, cnt, real, byts in rows:
        tag = f" (measured {real:,})" if real is not None else " (est.)"
        lines.append(f"| {n:,} | {cnt:,}{'' if real is None else tag} "
                     f"| {byts:,}{'' if real is not None else tag} |")
    lines += [
        "",
        "- **Growth is linear in unique documents** (~num_bands rows per "
        "unique shingle neighborhood; dup arrivals add nothing) — at a "
        "daily crawl the store IS the resource that grows, exactly as "
        "the r7 verdict flagged.",
        "- **Bounded-state option**: `near_dup_stream(state_ttl_ms=...)` "
        "evicts bands idle past the TTL (ProcessingTimeTimeout, "
        "refreshed on every touch — a sliding dedup window; a re-crawl "
        "past the window re-admits a fresh representative). Eviction "
        "and keep-alive semantics are pinned by "
        "tests/test_streaming.py (ttl tests). State then holds "
        "~num_bands x (unique docs per TTL window) rows regardless of "
        "total stream length.",
        "",
    ]
    notes = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_NOTES.md")
    existing = open(notes).read()
    marker = "## Round-8 addendum: streaming near-dedup state growth"
    idx = existing.find(marker)
    if idx >= 0:
        nxt = existing.find("\n## ", idx)
        existing = existing[:idx - 1] + (existing[nxt:] if nxt >= 0 else "")
    with open(notes, "w") as f:
        f.write(existing.rstrip("\n") + "\n" + "\n".join(lines))
    print("appended state-growth addendum to SCALE_NOTES.md")


if __name__ == "__main__":
    main()
