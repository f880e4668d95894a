#!/usr/bin/env python3
"""BPE merge-learning scale probe: verify the trainer's cost is bound by
the VOCABULARY, not the corpus — the property that makes 8 learning
iterations viable at 100 TB.

Generator (deterministic, no RNG): N docs x 30 words drawn from a FIXED
10k-word template vocabulary (word = first 6 chars of md5('v_' || slot),
slot = (doc_id * 31 + i) % 10000). Growing N grows the one corpus scan
that builds the word-frequency dictionary, but the dictionary itself
stays ~10k rows, so per-rank iteration cost should be flat. The learned
rank-1 merge must be identical across scales (same slot distribution =>
proportional counts).

    python tools/bpe_learn_probe.py [N ...]    # default 100k 1M
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
N_WORDS = 30
VOCAB = 10_000


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.textops import (
        bpe_learn_merges)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="bpe-learn-probe")
    spark.sparkContext.setLogLevel("ERROR")

    first = None
    for n in SIZES:
        path = f"/tmp/bpe_probe_docs_{n}"
        if not os.path.exists(path):
            words = (f"transform(sequence(0, {N_WORDS - 1}), i -> "
                     f"substr(md5(concat('v_', (id * 31 + i) % {VOCAB})),"
                     f" 1, 6))")
            (spark.range(n)
             .select(F.col("id").alias("doc_id"),
                     F.array_join(F.expr(words), " ").alias("text"))
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        docs = spark.read.parquet(path).cache()
        docs.count()

        t0 = time.time()
        merges = [tuple(r) for r in bpe_learn_merges(docs).collect()]
        wall = round(time.time() - t0, 2)
        assert len(merges) == 8, merges
        print(f"N={n} learn_8_ranks_s={wall} rank1={merges[0][1:3]} "
              f"rank8={merges[7][1:3]}", flush=True)
        if first is None:
            first = merges
        else:
            same = sum(1 for a, b in zip(first, merges)
                       if a[1:3] == b[1:3])
            print(f"  merge-sequence agreement vs {SIZES[0]}: {same}/8",
                  flush=True)
        docs.unpersist()


if __name__ == "__main__":
    main()
