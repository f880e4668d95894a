"""Training-pipeline data management: deterministic train/val/test splits
and hash-sharded training output.

A 100 TB corpus can't be split by `rand()` (non-reproducible, non-resumable)
or by row position (correlated with ingest order). The split here hashes the
stable document id through md5 and thresholds the hex prefix — every engine
computes the same assignment for the same id, forever, with no coordination.
Lexicographic thresholds on the 8-hex-digit prefix give ratio control at
2^-32 granularity without portable-integer-conversion headaches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _hex_threshold(ratio: float) -> str:
    """The 8-digit hex string h such that P[md5_prefix < h] = ratio."""
    return format(int(ratio * 0x100000000), "08x")


def split_column(id_col: Column, train: float = 0.9,
                 val: float = 0.05) -> Column:
    """'train' / 'val' / 'test' by md5(id) hex-prefix thresholds —
    deterministic, engine-portable, uncorrelated with id order."""
    h = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return (F.when(h < F.lit(_hex_threshold(train)), "train")
            .when(h < F.lit(_hex_threshold(train + val)), "val")
            .otherwise("test"))


def train_val_split_stats(docs: DataFrame, train: float = 0.9,
                          val: float = 0.05) -> DataFrame:
    """Split assignment audit: document counts and char volume per
    (split, lang) — the query a pipeline runs before committing a split."""
    return (docs.withColumn("split", split_column(F.col("doc_id"), train, val))
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"))
            .orderBy("split", "lang"))


def train_val_split_stats_oracle(train: float = 0.9,
                                 val: float = 0.05) -> str:
    t1, t2 = _hex_threshold(train), _hex_threshold(train + val)
    return f"""
WITH s AS (
  SELECT *, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{t1}'
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{t2}'
                   THEN 'val'
                 ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang, count(*) AS n_docs, sum(n_chars) AS total_chars
FROM s GROUP BY split, lang ORDER BY split, lang
"""


STRATIFIED_PER_LANG = 20


def stratified_sample(docs: DataFrame,
                      per_stratum: int = STRATIFIED_PER_LANG) -> DataFrame:
    """Deterministic stratified sample: the first ``per_stratum`` documents
    per language, ordered by md5(doc_id) — a hash-shuffled-but-reproducible
    balanced subset (eval-set construction, per-language inspection pulls).

    Scale shape: one keyed shuffle on lang for the window rank; the md5
    order decorrelates the pick from ingest order without RNG state. For
    strata too hot for a single reducer, the same hash order nests under a
    salted pre-rank — the declared semantics stay identical."""
    h = F.md5(F.col("doc_id").cast("string"))
    rank = F.row_number().over(
        Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc()))
    return (docs.select("doc_id", "lang", "n_chars", h.alias("pick_hash"))
            .withColumn("rk", rank)
            .where(F.col("rk") <= per_stratum)
            .select("doc_id", "lang", "n_chars", "pick_hash", "rk")
            .orderBy("lang", "rk"))


def stratified_sample_oracle(per_stratum: int = STRATIFIED_PER_LANG) -> str:
    return f"""
WITH r AS (
  SELECT doc_id, lang, n_chars,
         md5(CAST(doc_id AS VARCHAR)) AS pick_hash,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang, n_chars, pick_hash, rk
FROM r WHERE rk <= {per_stratum}
ORDER BY lang, rk
"""


def write_training_shards(df: DataFrame, path: str, num_shards: int,
                          id_col: str = "doc_id") -> None:
    """Hash-sharded training output: exactly ``num_shards`` parquet files,
    rows assigned by id hash so shard contents are stable under re-runs and
    shard sizes are balanced regardless of input partitioning. One shuffle
    (the repartition); readers stream shards independently."""
    (df.repartition(num_shards, F.col(id_col))
       .write.mode("overwrite").parquet(path))
