"""Hashing-trick text featurization: documents -> dense signed-hash
embeddings (HashingTF with a sign hash, L2-normalized) — the step that
PRODUCES a vector column from text inside the engine, bridging the
documents table to everything the vector families (knn/ann/pq/sq/bq)
consume. The fixture corpus ships pre-computed embeddings; a real pipeline
computes them, and feature hashing is the classic coordination-free way:
no vocabulary to build, no model to broadcast, one scan.

    dim(tok)  = md5(tok)[0:8]  as uint32  mod HASH_DIM
    sign(tok) = md5(tok)[8]    hex digit  even -> +1, odd -> -1
    w(doc, d) = sum of signs of the doc's tokens hashing to d   (exact int)
    e(doc)    = w / ||w||_2

Everything before the final normalization is INTEGER math, and the norm is
sqrt of an integer sum — order-independent on both engines, so the audit
is hash-checked (no float-summation-order hazard anywhere).

Scale shape: one explode (fan-out = tokens/doc, the same budget as every
shingling op), one combinable (doc_id, dim) sum, then a doc_id-local
densify — two hash exchanges that AQE coalesces onto the same key. No
driver pass, no fitted state, stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6

HASH_DIM = 64       # matches the fixture embedding width
AUDIT_DOCS = 50     # declared audit covers the first 50 docs (sparse rows)


def _tokens():
    """The SHARED tokenizer contract (functions/text.py) — same
    expression hybrid.bm25 scores with, same DuckDB list_filter twin."""
    from vectordb_explorations_spark.functions.text import whitespace_tokens
    return whitespace_tokens("text")


def _sparse_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, dim_id, w): exact integer signed-hash weights, zero-sum
    dims dropped (they contribute nothing to the vector)."""
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    h = F.md5(F.col("tok"))
    dim_id = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
              % HASH_DIM).cast("int")
    sign = (F.when(F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
                   F.lit(1)).otherwise(F.lit(-1)).cast("long"))
    return (toks.select("doc_id", dim_id.alias("dim_id"), sign.alias("sign"))
            .groupBy("doc_id", "dim_id")
            .agg(F.sum("sign").alias("w"))
            .where(F.col("w") != 0))


def hashed_embeddings(docs: DataFrame) -> DataFrame:
    """Pipeline form: (doc_id, embedding ARRAY<DOUBLE> length HASH_DIM,
    L2-normalized) — densify the sparse weights via map lookup over a
    static index sequence, then scale by the integer-exact norm.

    Row contract: EVERY input doc_id appears in the output. A doc with no
    tokens (or whose signs fully cancel in every dimension) has no
    direction to normalize — its embedding is NULL, not a dropped row,
    so downstream joins see the id and can filter explicitly
    (code-review finding: the inner shape silently lost such docs)."""
    w = _sparse_weights(docs)
    dense = (w.groupBy("doc_id")
             .agg(F.map_from_entries(
                 F.collect_list(F.struct("dim_id", "w"))).alias("m"),
                 F.sum(F.col("w") * F.col("w")).alias("ssq")))
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(HASH_DIM - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("int")),
                             F.lit(0).cast("long")).cast("double")
        / F.sqrt(F.col("ssq").cast("double")))
    return (docs.select("doc_id")
            .join(dense.select("doc_id", arr.alias("embedding")),
                  "doc_id", "left"))


def hashed_embedding_audit(docs: DataFrame) -> DataFrame:
    """Declared (hash-checked) audit: the sparse weights of the first
    AUDIT_DOCS docs with their normalized values — integer weights and a
    sqrt-of-integer norm, so both engines agree bit-for-bit."""
    w = _sparse_weights(docs.where(F.col("doc_id") < AUDIT_DOCS))
    norm = (w.groupBy("doc_id")
            .agg(F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double"))
                 .alias("norm")))
    return (w.join(norm, "doc_id")
            .select("doc_id", "dim_id", "w",
                    round6(F.col("w").cast("double") / F.col("norm"))
                    .alias("w_norm"))
            .orderBy("doc_id", "dim_id"))


def hashed_embedding_audit_oracle() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
           AS tok
  FROM documents WHERE doc_id < {AUDIT_DOCS}
),
h AS (
  SELECT doc_id,
         CAST(CAST(CAST('0x' || substring(md5(tok), 1, 8) AS UBIGINT)
                   % {HASH_DIM} AS BIGINT) AS INTEGER) AS dim_id,
         CASE WHEN CAST('0x' || substring(md5(tok), 9, 1) AS UBIGINT) % 2 = 0
              THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sign
  FROM t
),
w AS (
  SELECT doc_id, dim_id, CAST(SUM(sign) AS BIGINT) AS w
  FROM h GROUP BY doc_id, dim_id
  HAVING CAST(SUM(sign) AS BIGINT) <> 0
),
n AS (
  SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS norm
  FROM w GROUP BY doc_id
)
SELECT w.doc_id, w.dim_id, w.w,
       {r6('CAST(w.w AS DOUBLE) / n.norm')} AS w_norm
FROM w JOIN n ON w.doc_id = n.doc_id
ORDER BY w.doc_id, w.dim_id
"""


# ---- embedding-space outlier audit (distance-to-centroid z-score) ----

EMB_OUTLIER_TOPK = 5


def embedding_outliers(embeddings: DataFrame,
                       top_k: int = EMB_OUTLIER_TOPK) -> DataFrame:
    """Per-label embedding-space outliers: distance to the label's own
    centroid, z-scored within the label, top-k furthest per label — the
    mislabeled-example / corrupted-embedding audit a training-data
    pipeline runs over any labeled embedding column (the quality twin of
    cluster_balanced_sample's density question). Ranking is by rounded
    distance (z is monotone in distance within a label, so the rank is
    identical and never depends on float summation order); z itself is
    reported for the thresholding use case.

    Scale shape (100 TB): centroids are one posexplode + combinable
    grouped avg (|labels| x dim rows — tiny), re-assembled into arrays
    and broadcast back onto the corpus; the distance is a per-row
    zip_with fold (left-to-right — deterministic, the hybrid.py
    discipline); the per-label moments and top-k ride one
    label-partitioned window sort. Centroid dims are 6-dp binary-rounded
    BEFORE the distance so both engines fold bit-identical inputs."""
    from vectordb_explorations_spark.functions.rounding import round6

    cent = (embeddings
            .select("label", F.posexplode("embedding").alias("dim_idx", "v"))
            .groupBy("label", "dim_idx")
            .agg(round6(F.avg(F.col("v").cast("double"))).alias("c")))
    carr = (cent.groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim_idx", "c"))),
                lambda p: p["c"]).alias("cent")))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("embedding"), F.col("cent"),
                   lambda x, c: (x.cast("double") - c)
                   * (x.cast("double") - c)),
        F.lit(0.0), lambda acc, t: acc + t))
    d = (embeddings.join(F.broadcast(carr), "label")
         .select("label", "vec_id", round6(dist).alias("dist")))
    wlab = Window.partitionBy("label")
    worder = Window.partitionBy("label").orderBy(
        F.col("dist").desc(), F.col("vec_id"))
    s = (d.withColumn("m", F.avg("dist").over(wlab))
         .withColumn("sd", F.stddev_pop("dist").over(wlab))
         .withColumn("rk", F.row_number().over(worder)))
    z = F.when(F.col("sd") > 0, round6((F.col("dist") - F.col("m"))
                                       / F.col("sd")))
    return (s.where(F.col("rk") <= int(top_k))
            .select("label", "vec_id", "dist", z.alias("z"), "rk")
            .orderBy("label", "rk"))


def embedding_outliers_oracle(top_k: int = EMB_OUTLIER_TOPK,
                              dim: int | None = None) -> str:
    from vectordb_explorations_spark.functions.rounding import r6
    from vectordb_explorations_spark.schemas import EMBEDDING_DIM

    dim = EMBEDDING_DIM if dim is None else int(dim)
    sq = ("(CAST(e.embedding[i] AS DOUBLE) - cent[i])"
          " * (CAST(e.embedding[i] AS DOUBLE) - cent[i])")
    return f"""
WITH x AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim_idx,
         unnest(embedding) AS v
  FROM embeddings
), c AS (
  SELECT label, dim_idx, {r6('avg(CAST(v AS DOUBLE))')} AS mean_v
  FROM x GROUP BY label, dim_idx
), carr AS (
  SELECT label, list(mean_v ORDER BY dim_idx) AS cent FROM c GROUP BY label
), d AS (
  SELECT e.label, e.vec_id,
         {r6(f'sqrt(list_sum(list_transform(range(1, {dim + 1}),'
             f' i -> {sq})))')} AS dist
  FROM embeddings e JOIN carr USING (label)
), s AS (
  SELECT label, vec_id, dist,
         avg(dist) OVER (PARTITION BY label) AS m,
         stddev_pop(dist) OVER (PARTITION BY label) AS sd,
         row_number() OVER (PARTITION BY label
                            ORDER BY dist DESC, vec_id) AS rk
  FROM d
)
SELECT label, vec_id, dist,
       CASE WHEN sd > 0 THEN {r6('(dist - m) / sd')} END AS z,
       rk
FROM s WHERE rk <= {int(top_k)} ORDER BY label, rk
"""
