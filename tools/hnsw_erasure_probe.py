#!/usr/bin/env python3
"""HNSW erasure-locate scale probe (r14): measure the (vec_id ->
shard) members sidecar against the legacy unpickle-every-blob locate
as the index grows. The sidecar's claim is structural — locate reads
two narrow pruned scans, O(victims' shards) instead of O(index
blobs) — and this probe puts numbers on it at 100k and 1M vectors.

Per N: build a kmeans-sharded HNSW index over synthetic vectors,
persist (writes the sidecar), then time

  - locate+delete of a 10-victim batch THROUGH the sidecar,
  - the same batch on a fresh copy with the sidecar removed (the
    legacy Arrow blob pass),

and assert the two paths removed identical membership (planted
verdict, not just timing). Run:

    python tools/hnsw_erasure_probe.py [N ...]     # default 100k 1M
"""

from __future__ import annotations

import os
import pickle
import shutil
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from vectordb_explorations_spark.operators.hnsw import (
        _members_path, hnsw_build, hnsw_delete_partitioned,
        hnsw_persist_partitioned)
    from vectordb_explorations_spark.session import get_spark

    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000]
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        shards = max(8, n // 8192)
        emb = (spark.range(n)
               .select(F.col("id").alias("vec_id"),
                       F.transform(
                           F.sequence(F.lit(1), F.lit(DIM)),
                           lambda i: (F.hash(F.col("id") * 1000 + i)
                                      % 1000).cast("float") / 100.0)
                       .alias("embedding")))
        t0 = time.time()
        idx = hnsw_build(emb, num_shards=shards, shard_by="kmeans")
        path = f"/tmp/hnsw_erasure_probe_{n}"
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(_members_path(path), ignore_errors=True)
        hnsw_persist_partitioned(idx, path)
        t_build = time.time() - t0

        victims = list(range(7, 7 + 10 * 97, 97))  # 10 scattered ids

        # legacy copy: same index bytes, sidecar removed
        path2 = f"{path}_legacy"
        shutil.rmtree(path2, ignore_errors=True)
        shutil.copytree(path, path2)

        t0 = time.time()
        n_side = hnsw_delete_partitioned(spark, path, victims)
        t_side = time.time() - t0

        t0 = time.time()
        n_legacy = hnsw_delete_partitioned(spark, path2, victims)
        t_legacy = time.time() - t0

        assert n_side == n_legacy, (n_side, n_legacy)

        def membership(p):
            out = set()
            for r in spark.read.parquet(p).select("shard",
                                                  "blob").collect():
                g = pickle.loads(r["blob"])
                out |= {(int(r["shard"]), int(i)) for i in g.ids}
            return out

        m1, m2 = membership(path), membership(path2)
        assert m1 == m2, "paths removed different membership"
        assert not {v for _, v in m1} & set(victims)

        print(f"N={n:>9,} shards={shards:>4} build+persist {t_build:7.1f}s"
              f"  delete(10 ids): sidecar {t_side:6.2f}s"
              f"  legacy blob-pass {t_legacy:6.2f}s"
              f"  ({t_legacy / t_side:4.1f}x)  removed={n_side}")
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(_members_path(path), ignore_errors=True)
        shutil.rmtree(path2, ignore_errors=True)
        shutil.rmtree(_members_path(path2), ignore_errors=True)


if __name__ == "__main__":
    main()
