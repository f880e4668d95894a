"""Dense dimensionality reduction for embedding columns: seeded random
(Johnson-Lindenstrauss) projection and sample-fitted PCA — the embedding
COMPRESSION step of a training-data pipeline (cheap low-dim
representations for blocking, visualization, coarse routing), sitting
beside the quantization families (SQ8/PQ/BQ1) which compress per-value
rather than per-dimension.

Both paths share one projection kernel: a (k, dim) float64 matrix applied
as k generated scalar expressions — pure whole-stage codegen, no Python
stage, no shuffle (a projection is a per-row map). The expression text is
generated ONCE from shared float64 literals into BOTH engines
(`repr(float)` round-trips exactly — the baked-hyperplane oracle
pattern), so the random-projection query is hash-checked end to end.

PCA's fit is data-dependent (driver-side SVD over a bounded hash-ordered
sample — the ivf_build fit pattern), so it cannot be baked into a static
DuckDB oracle string; its correctness is pinned by pytest instead:
component orthonormality, exact agreement with a NumPy projection of the
collected table, and beating the random projection on reconstruction
error. At 100 TB both fits stay bounded (sample-sized) and the
projection pass is one codegen scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

PROJ_K = 8
PROJ_SEED = 42
PCA_FIT_SAMPLE = 4096


def random_projection_matrix(k: int, dim: int,
                             seed: int = PROJ_SEED) -> np.ndarray:
    """(k, dim) seeded Gaussian JL matrix, scaled 1/sqrt(k) so expected
    squared norms are preserved."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((k, dim)) / np.sqrt(k)


def projection_exprs(mat: np.ndarray, mean: np.ndarray | None,
                     element: str) -> list[str]:
    """One scalar SQL expression per output dim, shared by both engines:
    ``element`` is the dialect's 1-based accessor format with an ``{i}``
    placeholder (Spark: ``CAST(element_at(embedding, {i}) AS DOUBLE)``,
    DuckDB: ``CAST(embedding[{i}] AS DOUBLE)``). Literals are
    ``repr(float64)`` — exact round-trip, identical parsed doubles."""
    k, dim = mat.shape
    out = []
    for j in range(k):
        terms = []
        for i in range(dim):
            x = element.format(i=i + 1)
            if mean is not None:
                x = f"({x} - {float(mean[i])!r})"
            terms.append(f"{x} * {float(mat[j, i])!r}")
        out.append(" + ".join(terms))
    return out


SPARK_ELEMENT = "CAST(element_at({col}, {{i}}) AS DOUBLE)"
DUCKDB_ELEMENT = "CAST({col}[{{i}}] AS DOUBLE)"


def project(vectors: DataFrame, mat: np.ndarray,
            mean: np.ndarray | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            round_dp: int | None = 6) -> DataFrame:
    """Apply a (k, dim) projection (optionally mean-centered) as k codegen
    expressions — (id, p0..p{k-1}), ordered by id. One scan, zero
    exchanges beyond the declared output order."""
    exprs = projection_exprs(mat, mean,
                             SPARK_ELEMENT.format(col=vec_col))
    cols = [F.expr(e) for e in exprs]
    if round_dp is not None:
        cols = [F.round(c, round_dp) for c in cols]
    return (vectors.select(F.col(id_col),
                           *[c.alias(f"p{j}") for j, c in enumerate(cols)])
            .orderBy(id_col))


def random_projection(vectors: DataFrame, k: int = PROJ_K,
                      seed: int = PROJ_SEED, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Seeded JL projection of the embedding column — the declared,
    hash-checked query form (the oracle bakes the same seeded matrix)."""
    return project(vectors, random_projection_matrix(k, dim, seed),
                   id_col=id_col, vec_col=vec_col)


def random_projection_oracle(k: int = PROJ_K, seed: int = PROJ_SEED,
                             dim: int = 64) -> str:
    mat = random_projection_matrix(k, dim, seed)
    exprs = projection_exprs(mat, None, DUCKDB_ELEMENT.format(col="embedding"))
    sel = ",\n       ".join(f"round({e}, 6) AS p{j}"
                            for j, e in enumerate(exprs))
    return f"""
SELECT vec_id,
       {sel}
FROM embeddings
ORDER BY vec_id
"""


def pca_fit(vectors: DataFrame, k: int = PROJ_K,
            fit_sample: int = PCA_FIT_SAMPLE,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Driver-side PCA fit on a bounded hash-ordered sample (the
    ivf_build fit pattern: quality tracks the distribution, not the
    corpus size). Returns (mean, components (k, dim)). Component signs
    are canonicalized (largest-|coefficient| entry positive) so the fit
    is deterministic across LAPACK builds."""
    sample = [r[0] for r in
              vectors.orderBy(F.xxhash64(F.col(id_col)), id_col)
              .limit(fit_sample).select(vec_col).collect()]
    X = np.asarray(sample, dtype=np.float64)
    mean = X.mean(axis=0)
    _, _, vt = np.linalg.svd(X - mean, full_matrices=False)
    comps = vt[:k].copy()
    for j in range(comps.shape[0]):
        if comps[j, np.argmax(np.abs(comps[j]))] < 0:
            comps[j] = -comps[j]
    return mean, comps


def pca_project(vectors: DataFrame, mean: np.ndarray, comps: np.ndarray,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_dp: int | None = 6) -> DataFrame:
    """Mean-centered projection onto fitted components — same codegen
    kernel as the random projection."""
    return project(vectors, comps, mean=mean,
                   id_col=id_col, vec_col=vec_col, round_dp=round_dp)
