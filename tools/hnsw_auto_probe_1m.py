#!/usr/bin/env python3
"""1M validation of the HNSW routed-probe auto policy (r10 verdict item
4): serve the 1M kmeans-routed index (64 cells — the
tools/scale_probe_1m.py build, reused from /tmp when present) at the old
fixed probe_shards=8 operating point vs ``probe_shards='auto'`` (the
calibrated 37.5% cell fraction -> 24 of 64 cells) and report recall@10
vs the exact path plus steady-state serving wall — the same
decay-and-remediation table shape as the LSH auto-cap 1M row.

    python tools/hnsw_auto_probe_1m.py [N]
"""

from __future__ import annotations

import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 64
K = 10
NQ = 100
CORPUS = f"/tmp/scale_probe_embeddings_{N}"
IDX = "/tmp/probe1m_idx_hnsw" if N == 1_000_000 else f"/tmp/probe_hnsw_{N}"


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.ann import recall_at_k
    from vectordb_explorations_spark.operators.hnsw import (
        adaptive_probe_shards, hnsw_build, hnsw_search)
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="hnsw-auto-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(CORPUS):
        # the shared deterministic clustered generator (scale_probe_1m)
        base = spark.range(N).withColumn("label",
                                         (F.col("id") % 32).cast("int"))
        dims = [
            (
                (F.conv(F.substring(F.md5(F.concat_ws(
                    "_", F.col("id"), F.lit(d))), 1, 8), 16, 10)
                 .cast("double") / F.lit(float(0xFFFFFFFF)) - 0.5)
                + (F.col("label") % 8) * F.lit(0.25)
                * F.lit(1.0 if d % 3 == 0 else 0.0)
            ).cast("float")
            for d in range(DIM)
        ]
        (base.select(F.col("id").alias("vec_id"), "label",
                     F.array(*dims).alias("embedding"))
         .repartition(32)
         .write.mode("overwrite").parquet(CORPUS))

    emb = spark.read.parquet(CORPUS).cache()
    emb.count()
    queries = sample_queries(emb, NQ).cache()
    queries.count()

    if os.path.exists(IDX):
        idx = spark.read.parquet(IDX).cache()
        print(f"[probe] reusing persisted index {IDX}", flush=True)
    else:
        t0 = time.time()
        idx = hnsw_build(emb, num_shards=64, shard_by="kmeans",
                         shard_cap=65536).cache()
        idx.count()
        print(f"[probe] hnsw_build: {time.time() - t0:.1f}s", flush=True)
        idx.write.mode("overwrite").parquet(IDX)
    n_cells = idx.select("centroid").distinct().count()
    auto = adaptive_probe_shards(n_cells)
    print(f"[probe] cells={n_cells} auto={auto}", flush=True)

    t0 = time.time()
    exact = knn_join_blockwise(emb, queries, K).cache()
    exact.count()
    print(f"[probe] exact baseline: {time.time() - t0:.1f}s", flush=True)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for label, ps in (("fixed8", 8), ("auto", "auto")):
        run = lambda: hnsw_search(idx, queries, K, probe_shards=ps)  # noqa: E731
        force(run())  # warm
        runs = []
        for _ in range(3):
            t0 = time.time()
            force(run())
            runs.append(time.time() - t0)
        rec = recall_at_k(run(), exact, K)
        print(f"[probe] probe_shards={label}: recall@10={rec:.4f} "
              f"wall={sorted(runs)[1]:.2f}s "
              f"(spread {min(runs):.1f}-{max(runs):.1f})", flush=True)


if __name__ == "__main__":
    main()
