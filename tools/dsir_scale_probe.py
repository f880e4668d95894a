#!/usr/bin/env python3
"""DSIR scale probe: importance resampling measured at corpus sizes far
past the 500-doc fixture, with a PLANTED target distribution so recovery
is checkable, not just timeable.

Generator (deterministic, no RNG): the target exemplar corpus is N/100
docs speaking a fixed 6-word phrase vocabulary; the raw pool is N docs of
which every 10th is a lookalike (same vocabulary) and the rest are
per-doc-unique md5-token gibberish. A correct importance sampler asked
for k = N/10 docs (exactly the lookalike count) should return almost
exclusively lookalikes — the gibberish log-ratio sits far below — so the
probe reports the selected-lookalike fraction alongside wall time. The
fraction is not exactly 1.0 by design: Gumbel-top-k SAMPLES, and the
noise occasionally promotes a gibberish doc; >=0.95 is the pass bar.

    python tools/dsir_scale_probe.py [N ...]   # default 100k 1M
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
PHRASE = "alpha beta gamma delta epsilon zeta"
LOOKALIKE_EVERY = 10
TARGET_FRACTION = 100   # one target exemplar per 100 raw docs


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.sampling import dsir_select
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="dsir-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n: int):
        raw = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("raw").alias("source"),
            F.when(F.col("id") % LOOKALIKE_EVERY == 0, F.lit(PHRASE))
            .otherwise(F.concat_ws(
                " ",
                F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                F.substring(F.md5(F.col("id").cast("string")), 9, 8),
                F.substring(F.md5(F.col("id").cast("string")), 17, 8),
                F.substring(F.md5((F.col("id") + 7).cast("string")), 1, 8),
                F.substring(F.md5((F.col("id") + 7).cast("string")), 9, 8),
                F.substring(F.md5((F.col("id") + 7).cast("string")), 17, 8)))
            .alias("text"))
        tgt = spark.range(n // TARGET_FRACTION).select(
            (F.col("id") + n).alias("doc_id"),
            F.lit("tgt").alias("source"),
            F.lit(PHRASE).alias("text"))
        return raw.unionByName(tgt).repartition(32).persist()

    results = []
    for n in SIZES:
        docs = gen(n)
        docs.count()
        k = n // LOOKALIKE_EVERY
        t0 = time.time()
        sel = dsir_select(docs, target_sources=("tgt",), k=k).collect()
        wall = round(time.time() - t0, 2)
        look = sum(1 for r in sel if r.doc_id % LOOKALIKE_EVERY == 0
                   and r.doc_id < n)
        frac = round(look / max(1, len(sel)), 4)
        row = {"n_raw": n, "k": k, "selected": len(sel),
               "lookalike_fraction": frac, "wall_sec": wall}
        results.append(row)
        print(f"[probe] N={n:,} k={k:,} wall={wall}s "
              f"lookalike_fraction={frac}", flush=True)
        assert frac >= 0.95, f"planted recovery failed: {row}"
        docs.unpersist()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
