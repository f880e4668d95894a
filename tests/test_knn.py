"""Exact k-NN: physical-strategy agreement and edge cases."""

from pyspark.sql import functions as F

from vectordb_explorations_spark.operators.knn import (
    knn_exact, knn_join, knn_join_blockwise, sample_queries)
from vectordb_explorations_spark.sources import load_table


def test_knn_join_equals_blockwise(spark, sf_dir):
    """The window-ranking path and the Arrow/NumPy local-top-k path must
    produce identical rows — same logical operator, two physical plans."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = sample_queries(emb, 5)
    a = sorted(tuple(r) for r in knn_join(emb, qs, 7).collect())
    b = sorted(tuple(r) for r in knn_join_blockwise(emb, qs, 7).collect())
    assert a == b


def test_knn_self_is_nearest(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    qs = sample_queries(emb, 10)
    top1 = (knn_join(emb, qs, 1)
            .select("query_id", "vec_id").collect())
    assert all(r.query_id == r.vec_id for r in top1)


def test_knn_k_larger_than_table(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.orderBy("vec_id").first()["embedding"]
    n = emb.count()
    assert knn_exact(emb, q, n + 100).count() == n


def test_knn_deterministic_tiebreak(spark):
    """Equal distances break ties by id ascending (SURVEY §7)."""
    df = spark.createDataFrame(
        [(5, [1.0, 0.0]), (2, [0.0, 1.0]), (9, [1.0, 0.0])],
        "vec_id long, embedding array<float>")
    rows = knn_exact(df, [0.0, 0.0], 3).collect()
    assert [r.vec_id for r in rows] == [2, 5, 9]
