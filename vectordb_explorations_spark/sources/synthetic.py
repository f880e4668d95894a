"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic embedding corpus, partition-parallel, driver-free.

The reference's only data "sources" are rand() and hard-coded literals
(hnsw.cc:337-339, 289-291); this is the extensible-source surface a real
engine offers. Each input partition generates its id range independently
from a seeded hash — no shared RNG state, no driver materialization, and
identical output for identical options, so generated corpora are
reproducible test/bench fixtures at any size.

Usage:
    spark.dataSource.register(SyntheticVectorsDataSource)
    df = (spark.read.format("synthetic_vectors")
          .option("n", 100000).option("dim", 64).load())
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticVectorsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.dim = int(options.get("dim", 64))
        self.num_labels = int(options.get("labels", 16))
        self.parts = int(options.get("partitions", 16))
        self.seed = options.get("seed", "42")

    def partitions(self):
        step = max(1, self.n // self.parts)
        return [_Range(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, partition: _Range):
        # Arrow-friendly row generation; md5(seed, id, dim) → [-0.5, 0.5)
        import numpy as np

        for i in range(partition.start, partition.end):
            h = hashlib.md5(f"{self.seed}_{i}".encode()).digest()
            # expand 16 md5 bytes to `dim` floats via counter-mode hashing
            vals = []
            for blk in range((self.dim + 3) // 4):
                hb = hashlib.md5(h + blk.to_bytes(4, "little")).digest()
                vals.extend(np.frombuffer(hb, dtype="<u4").astype("f8"))
            vec = (np.array(vals[: self.dim]) / 2**32 - 0.5).astype("f4")
            yield (i, [float(x) for x in vec], i % self.num_labels)


class SyntheticVectorsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_vectors"

    def schema(self):
        return T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ])

    def reader(self, schema):
        return SyntheticVectorsReader(self.options)
