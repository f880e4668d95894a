"""Property-based tests (hypothesis) for the vector expression library:
Spark's native-expression results must match a NumPy model on arbitrary
finite float32 inputs — including the reference's asymmetric mismatched-
dimension semantics (SURVEY §1.4) and masked element access.

Examples are batched into one DataFrame per hypothesis case to keep the
Spark-job count bounded (deadline disabled; 15 cases x 1 job each)."""

import math
import os
import sys

import numpy as np
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_explorations_spark.functions import vectors as V  # noqa: E402

finite_f32 = st.floats(min_value=-1e3, max_value=1e3, width=32,
                       allow_nan=False, allow_infinity=False)
vec = st.lists(finite_f32, min_size=1, max_size=12)
pair = st.tuples(vec, vec)
CASES = settings(max_examples=15, deadline=None)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(i, [float(x) for x in a], [float(y) for y in b])
         for i, (a, b) in enumerate(pairs)],
        "id long, a array<float>, b array<float>")


def _ref_compat(a, b):
    # the reference's Distance (hnsw.cc:74-83): left drives; right is
    # zero-padded / truncated via the masked Get (hnsw.cc:66-72)
    a64 = np.asarray(a, dtype=np.float32).astype(np.float64)
    b64 = np.asarray(b, dtype=np.float32).astype(np.float64)
    acc = 0.0
    for i, x in enumerate(a64):
        y = b64[i] if i < len(b64) else 0.0
        acc += (x - y) * (x - y)
    return math.sqrt(acc)


@given(st.lists(pair, min_size=1, max_size=6))
@CASES
def test_compat_distance_matches_reference_model(spark, pairs):
    rows = _df(spark, pairs).select(
        "id",
        V.compat_distance(F.col("a"), F.col("b")).alias("ab"),
        V.compat_distance(F.col("b"), F.col("a")).alias("ba")).collect()
    for r in rows:
        a, b = pairs[r["id"]]
        assert math.isclose(r["ab"], _ref_compat(a, b), rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(r["ba"], _ref_compat(b, a), rel_tol=1e-9, abs_tol=1e-9)


@given(st.lists(vec, min_size=1, max_size=6))
@CASES
def test_l2_self_distance_zero_and_symmetry(spark, vecs):
    pairs = [(v, v) for v in vecs]
    rows = _df(spark, pairs).select(
        "id", V.l2_distance(F.col("a"), F.col("b")).alias("d"),
        V.l2_norm(F.col("a")).alias("n")).collect()
    for r in rows:
        assert r["d"] == 0.0
        a = np.asarray(vecs[r["id"]], dtype=np.float32).astype(np.float64)
        assert math.isclose(r["n"], float(np.sqrt((a * a).sum())),
                            rel_tol=1e-9, abs_tol=1e-9)


@given(st.lists(vec, min_size=1, max_size=6), st.integers(0, 20))
@CASES
def test_masked_get_oob_is_zero(spark, vecs, idx):
    pairs = [(v, v) for v in vecs]
    rows = _df(spark, pairs).select(
        "id", V.masked_get(F.col("a"), idx).alias("g")).collect()
    for r in rows:
        a = vecs[r["id"]]
        expected = float(np.float32(a[idx])) if idx < len(a) else 0.0
        assert math.isclose(r["g"], expected, rel_tol=1e-6, abs_tol=1e-9)


@given(vec, st.integers(0, 15), finite_f32)
@CASES
def test_set_element_rebuild(spark, v, idx, value):
    rows = _df(spark, [(v, v)]).select(
        V.set_element(F.col("a"), idx, float(value)).alias("s")).collect()
    got = rows[0]["s"]
    expected = [float(np.float32(x)) for x in v]
    if idx < len(v):
        expected[idx] = float(np.float32(value))
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert math.isclose(g, e, rel_tol=1e-6, abs_tol=1e-9)


class TestBqPackingRoundtrip:
    """Property: for ANY dim (including partial trailing words) the BQ1
    NumPy packer and unpacker are exact inverses, and packed words always
    fit 32 unsigned bits — generalizes the dim=40 MSB-alignment
    regression the code-review caught."""

    @given(st.integers(min_value=1, max_value=80), st.integers(0, 2**32 - 1))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip(self, dim, seed):
        import numpy as np
        from vectordb_explorations_spark.operators import bq as BQ
        rng = np.random.default_rng(seed)
        mat = rng.normal(size=(8, dim))
        thr = rng.normal(size=dim)
        words = BQ._encode_np(mat, thr)
        assert words.shape == (8, (dim + 31) // 32)
        assert ((words >= 0) & (words < (1 << 32))).all()
        bits = BQ._unpack_bits_np(words, dim)
        assert (bits == (mat > thr).astype(float)).all()


def test_sql_twins_bit_identical_on_random_vectors(spark):
    """Property form of the SQL-twin bit-identity pin: across random
    float32 vectors and dims, the F.expr-parsed twins must equal the
    Column-built trees EXACTLY (no tolerance) — the twins exist only to
    cut py4j construction cost."""
    import random

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.functions.vectors import (
        cosine_similarity_sql, dot_product, l2_distance, l2_distance_sql,
        l2_norm, squared_l2, squared_l2_sql)

    rng = random.Random(1234)
    for dim in (1, 2, 3, 7, 16, 33):
        rows = [([rng.uniform(-50, 50) for _ in range(dim)],
                 [rng.uniform(-50, 50) for _ in range(dim)])
                for _ in range(8)]
        df = spark.createDataFrame(rows, "a array<float>, b array<float>")
        col_side = df.select(
            l2_distance(F.col("a"), F.col("b"), dim=dim).alias("l2"),
            squared_l2(F.col("a"), F.col("b"), dim=dim).alias("sq"),
            (dot_product(F.col("a"), F.col("b"), dim=dim)
             / (l2_norm(F.col("a"), dim=dim)
                * l2_norm(F.col("b"), dim=dim))).alias("cos")).collect()
        sql_side = df.select(
            F.expr(l2_distance_sql("a", "b", dim)).alias("l2"),
            F.expr(squared_l2_sql("a", "b", dim)).alias("sq"),
            F.expr(cosine_similarity_sql("a", "b", dim)).alias("cos")
        ).collect()
        assert [tuple(r) for r in col_side] == [tuple(r) for r in sql_side]
