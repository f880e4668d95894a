"""Approximate nearest-neighbor search — the Spark-native re-expression of
the reference's HNSW index (hnsw.cc:94-285).

The reference serves online point inserts into a single in-process graph;
Spark is batch, so the design is **bulk build + partition-routed search**
(SURVEY §7 M3, BASELINE.json "DataFrame bulk indexing"):

1. ``random_hyperplane_lsh`` — signed projections onto deterministic
   hyperplanes → bucket id. Build is a narrow map (no shuffle); search
   probes only matching buckets (the relational analog of HNSW's layer
   descent: both prune the search space before scoring).
2. ``ivf_*`` — k-means coarse quantizer (MLlib), nprobe-limited search.
3. ``hnsw_*`` (operators/hnsw.py) — faithful per-partition graphs.

ANN results are stochastic-by-construction in the reference (seeded random
levels, hnsw.cc:140-145); here the accelerators are deterministic given the
seed, but they are still *approximate* — validated by recall@k against the
exact path (operators/knn.py), never by value hash (SURVEY §0, §5).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from vectordb_explorations_spark.functions.vectors import l2_distance
from vectordb_explorations_spark.schemas import EMBEDDING_DIM


def _hyperplanes(num_tables: int, num_planes: int, dim: int, seed: int) -> np.ndarray:
    """(num_tables, num_planes, dim) deterministic Gaussian hyperplanes."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((num_tables, num_planes, dim))


def _buckets_np(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(N, T) bucket ids: bit b of table t set iff dot(vec, plane_tb) >= 0.
    One GEMM per call — the whole signature family in a single Arrow batch."""
    t, p, d = planes.shape
    proj = mat @ planes.reshape(t * p, d).T  # (N, T*P)
    bits = (proj >= 0).astype(np.int64).reshape(-1, t, p)
    weights = (1 << np.arange(p, dtype=np.int64))
    return (bits * weights).sum(axis=2)  # (N, T)


def random_hyperplane_lsh(vectors: DataFrame, num_tables: int = 8,
                          num_planes: int = 6, seed: int = 42,
                          dim: int = EMBEDDING_DIM,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Build the narrow LSH index: one (id, table_id, bucket) row per table.

    Scale shape: the index is id+two-ints wide regardless of vector dim —
    at 100 TB the vectors stay in place and only this slim index shuffles.
    Bucket computation is an Arrow-batched NumPy GEMM (a native expression
    tree for T×P×D multiply-adds would exceed codegen limits).
    Persist bucketed by (table_id, bucket) for partition-pruned probes."""
    import pandas as pd

    planes = _hyperplanes(num_tables, num_planes, dim, seed)
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("table_id", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
    ])

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            bk = _buckets_np(mat, planes)  # (N, T)
            n, t = bk.shape
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), t),
                "table_id": np.tile(np.arange(t, dtype=np.int32), n),
                "bucket": bk.ravel().astype(np.int32),
            })

    return vectors.select(id_col, vec_col).mapInPandas(assign, schema=out_schema)


def lsh_search(vectors: DataFrame, queries: DataFrame, k: int,
               num_tables: int = 8, num_planes: int = 6, seed: int = 42,
               dim: int = EMBEDDING_DIM,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "query_id", qvec_col: str = "query_vec",
               multiprobe_bits: int = 1,
               index: DataFrame | None = None) -> DataFrame:
    """Multi-table multiprobe LSH ANN search.

    Candidates = vectors sharing a bucket with the query in ANY table
    (queries additionally probe all buckets within ``multiprobe_bits`` bit
    flips). Only candidate ids shuffle; full vectors are joined back just
    for the surviving candidate set, then exact-scored and top-k'd.
    """
    if index is None:
        index = random_hyperplane_lsh(vectors, num_tables, num_planes, seed,
                                      dim, id_col, vec_col)
    planes = _hyperplanes(num_tables, num_planes, dim, seed)
    qrows = queries.select(qid_col, qvec_col).collect()
    qids = [int(r[0]) for r in qrows]
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
    qb = _buckets_np(qmat, planes)  # (Q, T)
    probe_rows = []
    for qi, qid in enumerate(qids):
        for t in range(qb.shape[1]):
            base = int(qb[qi, t])
            probe_rows.append((qid, t, base))
            if multiprobe_bits >= 1:
                for b in range(num_planes):
                    probe_rows.append((qid, t, base ^ (1 << b)))
    spark = vectors.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"{qid_col} long, table_id int, bucket int").distinct()
    cand = (index.join(F.broadcast(probes), ["table_id", "bucket"])
            .select(qid_col, id_col).distinct())
    # Scoring shape: group candidates per vector FIRST — (vec_id, [qids])
    # is ~num_candidate_vectors rows instead of num_(query,vector)_pairs,
    # so the join against the vector table shuffles each candidate vector
    # once, not once per probing query. The Arrow stage scores every
    # (vector, probing-query) pair via NumPy against the broadcast query
    # matrix and emits only per-batch top-k per query; the global window
    # then ranks <= batches*Q*k narrow rows.
    import pandas as pd

    cand_by_vec = cand.groupBy(id_col).agg(F.collect_list(qid_col).alias("qids"))
    joined = cand_by_vec.join(vectors.select(id_col, vec_col), id_col)
    qindex = {qid: i for i, qid in enumerate(qids)}
    out_schema = T.StructType([
        T.StructField(qid_col, T.LongType()),
        T.StructField(id_col, T.LongType()),
        T.StructField("dist", T.DoubleType()),
    ])

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            ids = pdf[id_col].to_numpy()
            # vectorized ragged expansion (a Python per-pair loop here costs
            # more than the distance math itself)
            lens = np.fromiter((len(x) for x in pdf["qids"]), dtype=np.int64,
                               count=len(pdf))
            ri = np.repeat(np.arange(len(pdf), dtype=np.int64), lens)
            flat_q = np.concatenate([np.asarray(x, dtype=np.int64)
                                     for x in pdf["qids"]]) if lens.sum() else \
                np.empty(0, dtype=np.int64)
            qi = pd.Series(flat_q).map(qindex).to_numpy(dtype=np.int64)
            d = mat[ri] - qmat[qi]
            dist = np.sqrt(np.einsum("ij,ij->i", d, d))
            flat = pd.DataFrame({qid_col: np.asarray(qids, dtype=np.int64)[qi],
                                 id_col: ids[ri], "dist": dist})
            # per-batch local top-k per query bounds the shuffle
            flat = (flat.sort_values([qid_col, "dist", id_col])
                    .groupby(qid_col, sort=False).head(k))
            yield flat

    local = joined.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (local.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid_col, id_col, F.round("dist", 6).alias("dist"), "rank"))


# ---------------- IVF (inverted-file / coarse k-means) ----------------

def ivf_build(vectors: DataFrame, num_centroids: int = 16, seed: int = 42,
              vec_col: str = "embedding",
              max_iter: int = 10,
              fit_sample: int = 50_000) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: k-means centroids (MLlib, seeded), each vector
    assigned to its nearest centroid's list. Returns (assigned_df, centroids).

    Scale: KMeans FITS on a bounded sample (centroid quality depends on the
    distribution, not the corpus size — fitting on 100 TB would iterate the
    whole corpus max_iter times); ASSIGNMENT transforms the full table in
    one narrow pass. Persist the assignment bucketed by list_id for pruned
    probes.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = vectors.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=num_centroids, seed=seed, maxIter=max_iter, featuresCol="features",
                predictionCol="list_id")
    model = km.fit(ml_df.limit(fit_sample))
    assigned = model.transform(ml_df).drop("features")
    centroids = np.array(model.clusterCenters())
    return assigned, centroids


def ivf_search(assigned: DataFrame, centroids: np.ndarray, queries: DataFrame,
               k: int, nprobe: int = 8,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "query_id", qvec_col: str = "query_vec") -> DataFrame:
    """Probe the ``nprobe`` nearest centroid lists per query, exact-score
    within them, global top-k. Equivalent role to HNSW's upper-layer
    routing (hnsw.cc:150-156): coarse structure prunes, fine search scores.
    """
    # Probe selection is a (Q, C) argmin over driver-resident centroids —
    # pure NumPy, no crossJoin/window stage (queries and centroids are both
    # tiny; the cluster only ever sees the final probe list).
    spark = assigned.sparkSession
    qrows = queries.select(qid_col, qvec_col).collect()
    qmat = np.asarray([r[1] for r in qrows], dtype=np.float64)
    cd = (qmat[:, None, :] - centroids[None, :, :])
    cdist = (cd * cd).sum(-1)  # (Q, C)
    nn = min(nprobe, centroids.shape[0])
    probe_rows = []
    for qi, r in enumerate(qrows):
        order = np.lexsort((np.arange(centroids.shape[0]), cdist[qi]))[:nn]
        for li in order:
            probe_rows.append((int(r[0]), [float(x) for x in qmat[qi]], int(li)))
    probes = spark.createDataFrame(
        probe_rows, f"{qid_col} long, {qvec_col} array<double>, list_id int")
    from vectordb_explorations_spark.functions.vectors import l2_distance_arrow
    adist = l2_distance_arrow()
    scored = (assigned.join(F.broadcast(probes), "list_id")
              .withColumn("dist", F.round(adist(F.col(vec_col), F.col(qvec_col)), 6)))
    w = Window.partitionBy(qid_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid_col, id_col, "dist", "rank"))


# ---------------- recall harness ----------------

def recall_at_k(approx: DataFrame, exact: DataFrame, k: int,
                qid_col: str = "query_id", id_col: str = "vec_id") -> float:
    """recall@k = |approx ∩ exact| / |exact| per query, averaged. The gate
    for every ANN path (SURVEY §5: never hash-match a stochastic search)."""
    a = approx.where(F.col("rank") <= k).select(qid_col, id_col)
    e = exact.where(F.col("rank") <= k).select(qid_col, id_col)
    hits = a.join(e, [qid_col, id_col], "inner").groupBy(qid_col).count()
    denom = e.groupBy(qid_col).count().withColumnRenamed("count", "total")
    per_q = (denom.join(hits, qid_col, "left")
             .select((F.coalesce(F.col("count"), F.lit(0)) / F.col("total")).alias("r")))
    row = per_q.agg(F.avg("r").alias("recall")).collect()[0]
    return float(row["recall"])


def lsh_persist_bucketed(index: DataFrame, table_name: str, path: str,
                         num_buckets: int = 64) -> None:
    """Persist the LSH index hash-bucketed on the `bucket` column (SURVEY
    §7 M6): probe queries then read only the file buckets their target
    bucket ids hash into — at 100 TB the probe touches a constant fraction
    of the index instead of scanning it."""
    (index.write.mode("overwrite")
     .bucketBy(num_buckets, "bucket").sortBy("bucket")
     .option("path", path).saveAsTable(table_name))


def lsh_probe_bucketed(spark, table_name: str,
                       probes: list[tuple[int, int]]) -> DataFrame:
    """Read only the index buckets matching the probe list. Requires
    autoBucketedScan=false so the scan keeps the bucketed layout (otherwise
    Spark 4 rewrites joinless bucketed scans as plain scans and the
    SelectedBucketsCount pruning is lost). The bucket-id IN filter does the
    pruning; the exact (table_id, bucket) pair filter tightens on top."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    bucket_ids = sorted({b for _, b in probes})
    pair_cond = F.struct("table_id", "bucket").isin(
        [F.struct(F.lit(t), F.lit(b)) for t, b in probes])
    return (spark.table(table_name)
            .where(F.col("bucket").isin(bucket_ids))
            .where(pair_cond))
