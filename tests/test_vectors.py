"""Vector-function goldens from the reference's own fixtures (FIXTURES.md §A)."""

import math

import pytest
from pyspark.sql import functions as F

from vectordb_explorations_spark.functions.vectors import (
    compat_distance, cosine_similarity, dot_product, l2_distance, l2_norm,
    vector_to_string)


def test_priority_queue_golden(spark):
    """FIXTURES A2 / PriorityQueueTest (hnsw.cc:287-323): query [1,2,3];
    [2,4,6] (dist √14) must sort before [4,8,12] (dist √126)."""
    df = spark.createDataFrame(
        [(1, [2.0, 4.0, 6.0]), (2, [4.0, 8.0, 12.0])], "id long, vec array<float>")
    q = F.array(*[F.lit(float(x)).cast("float") for x in [1.0, 2.0, 3.0]])
    rows = (df.select("id", l2_distance(F.col("vec"), q).alias("d"))
            .orderBy("d", "id").collect())
    assert [r.id for r in rows] == [1, 2]
    assert rows[0].d == pytest.approx(math.sqrt(14), abs=1e-9)
    assert rows[1].d == pytest.approx(math.sqrt(126), abs=1e-9)


def test_compat_distance_goldens(spark):
    """FIXTURES A4 (hnsw.cc:66-83): left-driven loop; right operand
    zero-padded when shorter, truncated when longer."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0], [1.0, 2.0]),
         (2, [1.0, 2.0], [1.0, 2.0, 3.0]),
         (3, [1.0, 2.0], [3.0, 4.0])],
        "id long, l array<float>, r array<float>")
    rows = (df.select("id", compat_distance(F.col("l"), F.col("r")).alias("d"))
            .orderBy("id").collect())
    assert rows[0].d == pytest.approx(3.0)       # zero-pad: third term 3-0
    assert rows[1].d == pytest.approx(0.0)       # truncate: extra right dim ignored
    assert rows[2].d == pytest.approx(math.sqrt(8))


def test_scalar_functions(spark):
    df = spark.createDataFrame([([3.0, 4.0], [3.0, 4.0])], "a array<float>, b array<float>")
    row = df.select(
        l2_norm(F.col("a")).alias("n"),
        dot_product(F.col("a"), F.col("b")).alias("dp"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        vector_to_string(F.col("a")).alias("s"),
    ).first()
    assert row.n == pytest.approx(5.0)
    assert row.dp == pytest.approx(25.0)
    assert row.cos == pytest.approx(1.0)
    assert row.s == "3.0 4.0"


def test_perturbation_oracle(spark, sf_dir):
    """FIXTURES A1 / RgbTest (hnsw.cc:326-368), restated deterministically:
    perturb an indexed embedding by a tiny delta; exact 1-NN must return the
    source row (no other vector is that close in the fixture set)."""
    from vectordb_explorations_spark.operators.knn import knn_exact
    from vectordb_explorations_spark.sources import load_table
    emb = load_table(spark, "embeddings", sf_dir)
    src = emb.where(F.col("vec_id") == 7).first()
    q = [v + (0.001 if i == 0 else -0.001 if i == 1 else 0.0)
         for i, v in enumerate(src["embedding"])]
    top = knn_exact(emb, q, 1).first()
    assert top.vec_id == 7


def test_sql_twins_bit_identical(spark, sf_dir):
    """The F.expr-parsed SQL twins (functions/vectors.py) must produce
    BIT-identical doubles to the Column-built unrolled trees — the SQL
    path exists only to cut py4j construction cost, never semantics."""
    from vectordb_explorations_spark.functions.vectors import (
        array_lit_sql, cosine_similarity_sql, dot_product, l2_distance,
        l2_distance_sql, l2_norm, squared_l2, squared_l2_sql)
    from vectordb_explorations_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    dim = len(emb.first()["embedding"])
    q = emb.where(F.col("vec_id") == 3).first()["embedding"]
    two = (emb.alias("a").crossJoin(
        emb.where(F.col("vec_id") == 3)
        .select(F.col("embedding").alias("qv"))))
    col_side = two.select(
        F.col("vec_id"),
        l2_distance(F.col("embedding"), F.col("qv"), dim=dim).alias("l2"),
        (dot_product(F.col("embedding"), F.col("qv"), dim=dim)
         / (l2_norm(F.col("embedding"), dim=dim)
            * l2_norm(F.col("qv"), dim=dim))).alias("cos"),
        squared_l2(F.col("embedding"), F.col("qv"), dim=dim).alias("sq"))
    sql_side = two.select(
        F.col("vec_id"),
        F.expr(l2_distance_sql("embedding", "qv", dim)).alias("l2"),
        F.expr(cosine_similarity_sql("embedding", "qv", dim)).alias("cos"),
        F.expr(squared_l2_sql("embedding", "qv", dim)).alias("sq"))
    a = sorted(map(tuple, col_side.collect()))
    b = sorted(map(tuple, sql_side.collect()))
    assert a == b  # exact float equality, not approx

    # literal-array rendering: the SQL literal twin of F.array(lit...)
    lit_sql = sorted(map(tuple, emb.select(
        "vec_id",
        F.expr(l2_distance_sql("embedding", array_lit_sql(q), dim))
        .alias("d")).collect()))
    lit_col = sorted(map(tuple, emb.select(
        "vec_id",
        l2_distance(F.col("embedding"),
                    F.array(*[F.lit(float(x)).cast("float") for x in q]),
                    dim=dim).alias("d")).collect()))
    assert lit_sql == lit_col
