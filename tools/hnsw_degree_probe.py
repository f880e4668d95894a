#!/usr/bin/env python3
"""HNSW degree-cap vs index-bytes experiment at 1M (r8 verdict item 4).

The routed 1M index measured 1.23 GB for a 256 MB corpus — edges ~5x
payload, faithful to the reference's own SizeTest arithmetic (512 MB
pointers vs 100 MB floats, hnsw.cc:486) but bad 100 TB serving
economics. Two levers, measured here in one table:

1. **Packed blob serialization** (now the default, HnswGraph
   __getstate__): trims slack slots, stores cached neighbor distances
   float32, and pays one pickle header per graph instead of one per
   (node, layer) ndarray. Search output is bit-identical — the packer
   only changes the wire format.
2. **Degree cap M**: layer-0 degree is 2M. Lower M = fewer edges AND a
   narrower beam during wiring, so it trades recall for bytes + build
   time. Measured at M in {4, 6, 8} on the same clustered 1M corpus as
   tools/scale_probe_1m.py (md5 generator, dim 64), kmeans-routed 64
   shards, probe 8, shard_cap 16384.

Run:  python tools/hnsw_degree_probe.py [N]
Appends a quiet-box table to SCALE_NOTES.md.
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
OUT = f"/tmp/scale_probe_embeddings_{N}"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.ann import recall_at_k
    from vectordb_explorations_spark.operators.hnsw import (
        hnsw_build, hnsw_search)
    from vectordb_explorations_spark.operators.knn import (
        knn_join_blockwise, sample_queries)
    from vectordb_explorations_spark.session import get_spark

    spark = get_spark(app_name="hnsw-degree-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(OUT):
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
         .write.mode("overwrite").parquet(OUT))

    emb = spark.read.parquet(OUT).cache()
    n = emb.count()
    queries = sample_queries(emb, NQ).cache()
    queries.count()
    corpus_bytes = _dir_bytes(OUT)

    exact = knn_join_blockwise(emb, queries, K).cache()
    exact.count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    rows = []
    for m in (8, 6, 4):
        t0 = time.time()
        idx = hnsw_build(emb, num_shards=64, m=m, shard_by="kmeans",
                         shard_cap=16384).cache()
        idx.count()
        build_s = round(time.time() - t0, 2)
        path = f"/tmp/probe_hnsw_m{m}"
        idx.write.mode("overwrite").parquet(path)
        bts = _dir_bytes(path)

        runs = []
        force(hnsw_search(idx, queries, K, probe_shards=8))
        for _ in range(3):
            t0 = time.time()
            force(hnsw_search(idx, queries, K, probe_shards=8))
            runs.append(time.time() - t0)
        search_s = round(sorted(runs)[1], 2)
        rec = round(recall_at_k(
            hnsw_search(idx, queries, K, probe_shards=8), exact, K), 3)
        idx.unpersist()
        rows.append((m, build_s, search_s, bts, rec))
        print(f"[probe] m={m}: build {build_s}s search {search_s}s "
              f"bytes {bts:,} recall {rec}", flush=True)

    lines = [
        "",
        f"## Round-9 addendum: HNSW degree cap vs index bytes at {n:,} "
        "(packed-blob serialization)",
        "",
        f"Corpus parquet: {corpus_bytes:,} bytes. Same clustered md5 "
        "generator / kmeans-routed 64 shards / probe 8 of 64 / "
        "shard_cap 16384 as the r8 1M matrix (whose m=8 row measured "
        "1.23 GB under the OLD per-ndarray pickling — the packed blob "
        "is the same graph on a cheaper wire format, search "
        "bit-identical).",
        "",
        "| M (layer-0 degree 2M) | build s | search s/batch100 | "
        "index bytes | recall@10 |",
        "|---|---|---|---|---|",
    ]
    for m, bs, ss, bts, rec in rows:
        lines.append(f"| {m} | {bs} | {ss} | {bts:,} | {rec} |")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALE_NOTES.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("[probe] SCALE_NOTES.md updated", flush=True)


if __name__ == "__main__":
    main()
