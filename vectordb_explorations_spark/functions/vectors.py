"""Dense-vector scalar functions as native Spark SQL expressions.

Reproduces the reference's vector surface (`Vector`, hnsw.cc:33-92) on
``ARRAY<FLOAT>`` columns. Everything here stays inside whole-stage codegen —
no Python in the hot path (SURVEY §1.5, §4.2). Distances are computed in
DOUBLE: float32 accumulation order (hnsw.cc:76-81) is not bit-reproducible
across engines, so declared query semantics are double-precision (SURVEY §7).

The elementwise fold is sequential left-to-right in both Spark's
``aggregate`` and DuckDB's ``list_sum``, so with explicit double casts the
oracle comparison is bit-stable, not merely within-epsilon.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return c.cast("double")


# ---------------------------------------------------------------------------
# SQL-string twins of the unrolled expressions below. Building a 64-term
# tree Column-by-Column costs thousands of py4j round-trips PER QUERY
# CONSTRUCTION (measured 4.5 s of driver time for the hybrid query at
# sf0.1 — more than 3x its actual execution); rendering the identical
# tree as ONE SQL string and parsing it JVM-side via F.expr is a single
# round-trip. The generated tree is node-for-node the tree the Column
# API builds (same element_at indices, same CAST placement, same left
# association), so results are bit-identical — pinned by
# tests/test_vectors.py::test_sql_twins_bit_identical. ``a``/``b`` accept
# any SQL fragment (a column name or a rendered literal array).
# ---------------------------------------------------------------------------

def _el(a: str, i: int) -> str:
    return f"CAST(element_at({a}, {i}) AS DOUBLE)"


def squared_l2_sql(a: str, b: str, dim: int) -> str:
    terms = [f"({_el(a, i)} - {_el(b, i)}) * ({_el(a, i)} - {_el(b, i)})"
             for i in range(1, dim + 1)]
    return " + ".join(terms)


def l2_distance_sql(a: str, b: str, dim: int) -> str:
    return f"sqrt({squared_l2_sql(a, b, dim)})"


def dot_product_sql(a: str, b: str, dim: int) -> str:
    return " + ".join(f"{_el(a, i)} * {_el(b, i)}"
                      for i in range(1, dim + 1))


def l2_norm_sql(a: str, dim: int) -> str:
    return f"sqrt({dot_product_sql(a, a, dim)})"


def cosine_similarity_sql(a: str, b: str, dim: int) -> str:
    return (f"({dot_product_sql(a, b, dim)})"
            f" / ({l2_norm_sql(a, dim)} * {l2_norm_sql(b, dim)})")


def array_lit_sql(values, element_type: str = "FLOAT") -> str:
    """Render a Python sequence as a Spark SQL array literal with
    per-element casts — the SQL twin of
    ``F.array(*[F.lit(float(x)).cast("float") for x in values])``."""
    inner = ", ".join(f"CAST({float(x)!r} AS {element_type})" for x in values)
    return f"array({inner})"


def squared_l2(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ (a_i - b_i)² in double. Mirrors the loop at hnsw.cc:76-81 with
    double accumulation. Requires equal dims (enforced at ingest).

    With ``dim`` given, the sum unrolls into a fixed expression tree that
    whole-stage codegen compiles (higher-order functions are interpreted
    per row — measured 3x slower on the sf0.1 crossJoin scoring path).
    The unrolled left-associated sum is bit-identical to the fold: the
    fold's leading 0.0 + t1 equals t1 for the non-negative terms here.
    Callers with variable or unknown dims omit ``dim`` and get the
    generic fold."""
    if dim is not None:
        terms: Column | None = None
        for i in range(1, dim + 1):
            d = _d(F.element_at(a, i)) - _d(F.element_at(b, i))
            t = d * d
            terms = t if terms is None else terms + t
        assert terms is not None
        return terms
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_distance(a: Column, b: Column, dim: int | None = None) -> Column:
    """Euclidean distance — `Vector::Distance` (hnsw.cc:74-83), double."""
    return F.sqrt(squared_l2(a, b, dim))


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is not None:  # unrolled codegen sum — see squared_l2
        terms: Column | None = None
        for i in range(1, dim + 1):
            t = _d(F.element_at(a, i)) * _d(F.element_at(b, i))
            terms = t if terms is None else terms + t
        assert terms is not None
        return terms
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:  # unrolled codegen sum — see squared_l2
        terms: Column | None = None
        for i in range(1, dim + 1):
            t = _d(F.element_at(a, i)) * _d(F.element_at(a, i))
            terms = t if terms is None else terms + t
        assert terms is not None
        return F.sqrt(terms)
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: _d(x) * _d(x)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    ))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    """dot(a,b) / (|a||b|). Not in the reference (L2 is its only metric,
    SURVEY §1.5); needed by the embedding near-dup path."""
    return dot_product(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def l2_normalize(df, vec_col: str = "embedding",
                 dim: int | None = None, out_col: str | None = None):
    """Unit-normalize a vector column — the COSINE / INNER-PRODUCT
    SERVING CONTRACT for every L2 index family (r12 verdict item 4).

    For unit vectors, ``|a-b|^2 = 2 - 2*cos(a,b)``: L2 distance is a
    strictly decreasing function of cosine similarity, so ANY L2 index
    (IVF, HNSW, PQ, SQ8, BQ1, cascade — all of operators/ann.py and
    friends) serves cosine top-k EXACTLY by (1) normalizing the corpus
    through this helper at ingest, before the index build, and (2)
    normalizing each query vector the same way at search time. The
    same holds for inner product on corpora where IP ranking is
    wanted under unit-query semantics. The reference has no such
    contract because L2 is its only metric (hnsw.cc:74-83; SURVEY
    §1.5); exact cosine retrieval (knn_cosine, hybrid's vector
    channel) is unaffected — this is the path that makes the
    APPROXIMATE families metric-complete. Pinned by
    tests/test_ann.py::test_cosine_serving_contract_* and benched as
    recall_ivf_cosine_at_10.

    Zero vectors pass through unchanged (cosine is undefined for
    them; keeping them finite beats emitting NULL/Inf into an index
    build). The norm is STAGED through a projection rather than
    composed into the transform lambda — a composed Column HOF
    re-inlines the full 2*dim-term norm tree per element (no CSE).
    Output elements stay FLOAT so the column's schema (and any
    downstream Arrow kernel's dtype) is unchanged."""
    out = out_col or vec_col
    norm = l2_norm(F.col(vec_col), dim)
    return (df.withColumn("_l2n", norm)
            .withColumn(
                out,
                F.when(F.col("_l2n") > 0.0,
                       F.transform(F.col(vec_col),
                                   lambda x: (_d(x) / F.col("_l2n"))
                                   .cast("float")))
                .otherwise(F.col(vec_col)))
            .drop("_l2n"))


def mips_augment(df, vec_col: str = "embedding",
                 dim: int | None = None, out_col: str | None = None):
    """Corpus-side MIPS -> L2 reduction — the INNER-PRODUCT SERVING
    CONTRACT for the L2 index families, completing the metric trio
    (L2 native, cosine via ``l2_normalize``, IP via this): augment
    every corpus vector x to [x ; sqrt(M^2 - |x|^2)] where M is the
    corpus' maximum norm (the classic order-preserving transform —
    Bachrach et al. 2014). For a query padded with a ZERO last
    coordinate (``mips_pad_query``),

        |q_hat - x_hat|^2 = |q|^2 + M^2 - 2<q, x>,

    constant in x except the inner product — so L2 nearest neighbors
    in the augmented dim+1 space ARE the maximum-inner-product
    vectors, and any L2 family (IVF/HNSW/PQ/...) serves MIPS by
    building on the augmented corpus and padding queries. Exact IP
    retrieval is the staged ``knn_ip`` query; pinned by
    tests/test_ann.py::test_mips_serving_contract_*.

    The corpus max rides a broadcast single-row aggregate (lazy — no
    driver action); the pad is clamped at 0 against float roundoff on
    the max-norm row itself; elements stay FLOAT."""
    out = out_col or vec_col
    nd = df.withColumn("_mips_n", l2_norm(F.col(vec_col), dim))
    mx = nd.agg(F.max("_mips_n").alias("_mips_m"))
    pad = F.sqrt(F.greatest(
        F.col("_mips_m") * F.col("_mips_m")
        - F.col("_mips_n") * F.col("_mips_n"), F.lit(0.0)))
    return (nd.crossJoin(F.broadcast(mx))
            .withColumn(out, F.concat(F.col(vec_col),
                                      F.array(pad.cast("float"))))
            .drop("_mips_n", "_mips_m"))


def mips_pad_query(df, vec_col: str = "query_vec",
                   out_col: str | None = None):
    """Query-side half of the MIPS contract: append the zero
    coordinate that makes augmented-L2 rank by inner product."""
    out = out_col or vec_col
    return df.withColumn(
        out, F.concat(F.col(vec_col),
                      F.array(F.lit(0.0).cast("float"))))


def compat_distance(left: Column, right: Column) -> Column:
    """The reference's mismatched-dimension distance semantics (SURVEY §1.4):
    the LEFT operand drives the loop (hnsw.cc:76); out-of-range reads of the
    right operand return 0.0 via the branchless mask (hnsw.cc:29-31, 66-72),
    so a shorter right is zero-padded and a longer right is truncated.
    Asymmetric by construction. Opt-in compat mode only — default ingest
    enforces uniform dims.
    """
    # Drive by the left array's indices; try_element_at is 1-based and returns
    # NULL out of range (plain element_at throws under ANSI mode) → coalesce
    # to 0.0 reproduces the masked read.
    diffs = F.transform(
        left,
        lambda x, i: (
            (_d(x) - F.coalesce(_d(F.try_element_at(right, i + F.lit(1))), F.lit(0.0)))
            * (_d(x) - F.coalesce(_d(F.try_element_at(right, i + F.lit(1))), F.lit(0.0)))
        ),
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0).cast("double"), lambda acc, v: acc + v))


def vector_to_string(a: Column) -> Column:
    """`Vector::Print` (hnsw.cc:86-91): space-joined float components."""
    return F.concat_ws(" ", F.transform(a, lambda x: x.cast("string")))


def masked_get(a: Column, idx: Column | int) -> Column:
    """`Vector::Get` (hnsw.cc:66-72): branchless bounds-masked element read —
    out-of-range indices return 0.0 instead of erroring (the ZeroIfTrue mask,
    hnsw.cc:29-31). ``idx`` is 0-based like the reference."""
    i = F.lit(idx) if isinstance(idx, int) else idx
    return F.coalesce(_d(F.try_element_at(a, i + F.lit(1))), F.lit(0.0))


def set_element(a: Column, idx: int, value: float) -> Column:
    """`Vector::Set` (hnsw.cc:57-60) as an immutable rebuild: return a copy
    of the array with element ``idx`` (0-based) replaced. Out-of-range
    writes are no-ops — the reference's `idx == size_` off-by-one write past
    the buffer (SURVEY §1.4) is a latent bug, not a semantic we reproduce."""
    return F.transform(
        a, lambda x, i: F.when(i == F.lit(idx), F.lit(value).cast("float"))
                         .otherwise(x))


def l2_distance_arrow():
    """Arrow-vectorized L2 distance as a pandas UDF — the scoring kernel
    for ANN candidate sets. The native `l2_distance` expression runs
    zip_with/aggregate in Spark's *interpreted* higher-order-function path
    (~10x slower per row); at candidate volumes (millions of pairs at
    scale) the Arrow batch + NumPy row-wise form wins decisively. Not used
    in declared oracle queries (those stay native expressions); ANN paths
    are recall-gated so the float64 summation-order difference is
    irrelevant."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dist(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.asarray(list(a), dtype=np.float64)
        mb = np.asarray(list(b), dtype=np.float64)
        d = ma - mb
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", d, d)))

    return _dist
