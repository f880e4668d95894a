"""Dimensionality reduction: the shared codegen projection kernel, the
seeded JL query's oracle parity (covered again by the sweep), and PCA's
pytest-pinned correctness (no static oracle exists for a data-dependent
fit — see the module docstring)."""

import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import projection as P  # noqa: E402
from vectordb_explorations_spark.sources import load_table  # noqa: E402


def test_projection_matches_numpy_and_is_python_free(spark, sf_dir):
    from vectordb_explorations_spark.plans.explain import plan_summary
    emb = load_table(spark, "embeddings", sf_dir)
    mat = P.random_projection_matrix(4, 64, seed=7)
    got = P.project(emb, mat, round_dp=None)
    s = plan_summary(got)
    assert not s["python_stages"]
    rows = got.collect()
    src = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.select("vec_id", "embedding").collect()}
    for r in rows:
        want = mat @ src[r["vec_id"]]
        np.testing.assert_allclose(
            [r[f"p{j}"] for j in range(4)], want, rtol=0, atol=1e-9)


def test_pca_fit_properties_and_projection(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    mean, comps = P.pca_fit(emb, k=4, fit_sample=256)
    # orthonormal components, canonical signs
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-9)
    for j in range(4):
        assert comps[j, np.argmax(np.abs(comps[j]))] > 0
    # determinism of the fit (same sample order -> same components)
    mean2, comps2 = P.pca_fit(emb, k=4, fit_sample=256)
    assert np.array_equal(mean, mean2) and np.array_equal(comps, comps2)
    # projection agrees with numpy
    rows = P.pca_project(emb, mean, comps, round_dp=None).collect()
    src = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.select("vec_id", "embedding").collect()}
    X = np.stack([src[r["vec_id"]] for r in rows])
    want = (X - mean) @ comps.T
    got = np.asarray([[r[f"p{j}"] for j in range(4)] for r in rows])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)


def test_pca_beats_random_projection_on_reconstruction(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    X = np.asarray([r[0] for r in emb.select("embedding").collect()],
                   dtype=np.float64)
    mean, comps = P.pca_fit(emb, k=4, fit_sample=256)
    rp = P.random_projection_matrix(4, 64)
    # orthonormalize the random matrix for a fair reconstruction compare
    q, _ = np.linalg.qr(rp.T)
    xc = X - X.mean(axis=0)
    err_pca = ((xc - (xc @ comps.T) @ comps) ** 2).sum()
    err_rp = ((xc - (xc @ q) @ q.T) ** 2).sum()
    assert err_pca < err_rp
