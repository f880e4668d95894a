"""Property tests for the hybrid-retrieval math: the Spark BM25 expression
must match an independently-written reference implementation on arbitrary
integer (tf, df, dl) inputs, and must exhibit BM25's defining analytic
properties (monotone in tf, anti-monotone in df, length-normalized)."""

import math
import os
import sys

import pytest
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import hybrid as H  # noqa: E402


def ref_bm25(tf: int, df: int, dl: int, n: int, avgdl: float) -> float:
    """Independent reference (textbook form, written separately from the
    generator in hybrid.py)."""
    if tf == 0:
        return 0.0
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    norm = 1.0 - H.BM25_B + H.BM25_B * dl / avgdl
    return idf * tf * (H.BM25_K1 + 1.0) / (tf + H.BM25_K1 * norm)


@st.composite
def corpus_stats(draw):
    n = draw(st.integers(min_value=2, max_value=10_000))
    df = draw(st.integers(min_value=1, max_value=n))
    dl = draw(st.integers(min_value=1, max_value=500))
    tf = draw(st.integers(min_value=0, max_value=dl))
    avgdl = draw(st.floats(min_value=1.0, max_value=500.0,
                           allow_nan=False, allow_infinity=False))
    return tf, df, dl, n, avgdl


@settings(max_examples=300, deadline=None)
@given(corpus_stats())
def test_sql_generator_matches_reference(params):
    """Evaluate the GENERATED DuckDB SQL expression (the exact text the
    oracle embeds) against the independent Python reference — guards the
    expression generator itself, not just the fixture corpus."""
    import duckdb
    tf, df, dl, n, avgdl = params
    expr = H._bm25_contrib_sql(
        f"CAST({tf} AS DOUBLE)", f"CAST({df} AS DOUBLE)",
        f"CAST({dl} AS DOUBLE)", f"CAST({n} AS DOUBLE)", repr(avgdl))
    got = duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]
    assert got == pytest.approx(ref_bm25(tf, df, dl, n, avgdl),
                                rel=1e-12, abs=1e-300)


@settings(max_examples=200, deadline=None)
@given(corpus_stats())
def test_bm25_analytic_properties(params):
    tf, df, dl, n, avgdl = params
    v = ref_bm25(tf, df, dl, n, avgdl)
    assert v >= 0.0
    # monotone in tf
    assert ref_bm25(tf + 1, df, dl, n, avgdl) > v
    # anti-monotone in df (more common term -> lower score), tf > 0
    if tf > 0 and df < n:
        assert ref_bm25(tf, df + 1, dl, n, avgdl) < v
    # longer doc at same tf scores no higher
    if tf > 0:
        assert ref_bm25(tf, df, dl + 10, n, avgdl) < v


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=H.HYBRID_POOL),
       st.integers(min_value=1, max_value=H.HYBRID_POOL))
def test_rrf_prefers_dual_channel(rb, rv):
    """A doc present in BOTH pools always outscores a doc that tops just
    one — the reason RRF is robust to score-scale mismatch."""
    both = 1.0 / (H.RRF_K + rb) + 1.0 / (H.RRF_K + rv)
    single_best = 1.0 / (H.RRF_K + 1)
    # worst dual (50, 50) still beats best single: 2/110 > 1/61 — holds
    # for any pool <= RRF_K - 10, which the constants guarantee
    assert both > single_best
    # monotone: improving either rank improves the fused score
    if rb > 1:
        assert 1.0 / (H.RRF_K + rb - 1) + 1.0 / (H.RRF_K + rv) > both
