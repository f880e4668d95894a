"""BQ1 (1-bit binary quantization): packing contract (codegen encode, the
NumPy twin, 32-bit word range), deterministic Hamming top-k self-match, and
recall gates for the asymmetric-scored, exact-refined search path."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators import bq as BQ  # noqa: E402
from vectordb_explorations_spark.operators.ann import recall_at_k  # noqa: E402
from vectordb_explorations_spark.operators.knn import (  # noqa: E402
    knn_join, sample_queries)
from vectordb_explorations_spark.schemas import EMBEDDING_DIM  # noqa: E402
from vectordb_explorations_spark.sources.catalog import load_table  # noqa: E402

K = 10


@pytest.fixture(scope="module")
def setup(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    thr = BQ.bq_thresholds(emb, EMBEDDING_DIM)
    levels = BQ.bq_levels(emb, thr)
    codes = BQ.bq_encode(emb, thr).cache()
    codes.count()
    queries = sample_queries(emb, 30).cache()
    exact = knn_join(emb, queries, K).cache()
    exact.count()
    return emb, thr, levels, codes, queries, exact


def test_codes_match_numpy_twin(setup):
    """The Spark shift-accumulate packing and the NumPy query-side encoder
    must produce bit-identical words (the search XORs one against the
    other — any layout drift silently zeroes recall)."""
    emb, thr, _, codes, _, _ = setup
    rows = emb.orderBy("vec_id").limit(50).collect()
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    expect = BQ._encode_np(mat, thr)
    got = {r["vec_id"]: list(r["words"]) for r in codes.collect()}
    for i, r in enumerate(rows):
        assert got[int(r["vec_id"])] == list(expect[i])


def test_words_fit_32_bits(setup):
    """Packing 32 bits per BIGINT keeps every engine's integer math signed —
    words must land in [0, 2^32)."""
    _, _, _, codes, _, _ = setup
    n_words = (EMBEDDING_DIM + BQ.BQ_WORD_BITS - 1) // BQ.BQ_WORD_BITS
    for r in codes.limit(100).collect():
        assert len(r["words"]) == n_words
        assert all(0 <= w < (1 << 32) for w in r["words"])


def test_unpack_inverts_pack(setup):
    _, thr, _, _, _, _ = setup
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(20, EMBEDDING_DIM))
    words = BQ._encode_np(mat, thr)
    bits = BQ._unpack_bits_np(words, EMBEDDING_DIM)
    assert (bits == (mat > thr).astype(np.float64)).all()


def test_encode_is_jvm_only(setup):
    emb, thr, _, _, _, _ = setup
    plan = BQ.bq_encode(emb, thr)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BatchEvalPython" not in plan


def test_encode_deterministic(setup):
    emb, thr, _, codes, _, _ = setup
    again = {r["vec_id"]: r["words"]
             for r in BQ.bq_encode(emb.repartition(7), thr).collect()}
    assert {r["vec_id"]: r["words"] for r in codes.collect()} == again


def test_hamming_topk_self_match(setup):
    """Every query is its own rank-1 neighbor at Hamming distance 0 — the
    RgbTest perturbation oracle's shape (hnsw.cc:326-368) applied to the
    declared deterministic query."""
    emb, _, _, _, _, _ = setup
    df = BQ.bq_hamming_topk(emb, 5, K, EMBEDDING_DIM)
    top = {r["query_id"]: (r["vec_id"], r["hamming"])
           for r in df.collect() if r["rank"] == 1}
    assert top == {q: (q, 0) for q in top}


def test_bq_refined_recall(setup):
    """Asymmetric shortlist + exact refine: measured 0.948 at sf0.1 and
    higher at sf0.01 (shortlist covers a larger corpus fraction)."""
    emb, thr, levels, codes, queries, exact = setup
    refined = BQ.bq_search(codes, thr, queries, K, refine_with=emb,
                           refine_factor=20, levels=levels)
    r = recall_at_k(refined, exact, K)
    assert r >= 0.9, r


def test_asymmetric_beats_symmetric(setup):
    """The reason the asymmetric scorer exists: at the same shortlist size
    it must not lose to plain Hamming (measured +0.17 recall at sf0.1)."""
    emb, thr, levels, codes, queries, exact = setup
    sym = BQ.bq_search(codes, thr, queries, K, refine_with=emb,
                       refine_factor=10)
    asym = BQ.bq_search(codes, thr, queries, K, refine_with=emb,
                        refine_factor=10, levels=levels)
    assert recall_at_k(asym, exact, K) >= recall_at_k(sym, exact, K)


def test_cascade_recovers_shortlist_ceiling(setup, spark, sf_dir):
    """BQ1->SQ8->exact cascade: at fixture scale the shortlist covers most
    of the corpus, so the cascade must match the exact top-k almost
    perfectly — and must never beat its own stage-1 shortlist ceiling."""
    from vectordb_explorations_spark.operators import sq as SQ
    emb, thr, levels, codes, queries, exact = setup
    mins, maxs = SQ.sq_train(emb, EMBEDDING_DIM)
    sq_codes = SQ.sq_encode(emb, mins, maxs).cache()
    sq_codes.count()
    out = BQ.bq_cascade_search(codes, thr, levels, sq_codes, mins, maxs,
                               queries, K, refine_with=emb,
                               shortlist=200, midlist=50)
    r = recall_at_k(out, exact, K)
    assert r >= 0.9, r
    # output contract: k ranked rows per query, exact distances
    per_q = {}
    for row in out.collect():
        per_q.setdefault(row["query_id"], []).append(row["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, K + 1))


def test_partial_word_dims_pack_msb_aligned(spark):
    """dims not divisible by 32 must stay MSB-aligned in the trailing
    word so Spark packing, the NumPy twin and the unpack agree (the
    code-review repro: dim=40 packed LSB-aligned before the fix)."""
    dim = 40
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(12, dim)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(len(mat))],
        "vec_id long, embedding array<float>")
    thr = np.zeros(dim)
    got = {r["vec_id"]: list(r["words"])
           for r in BQ.bq_encode(df, thr).collect()}
    expect = BQ._encode_np(mat.astype(np.float64), thr)
    for i in range(len(mat)):
        assert got[i] == list(expect[i]), i
    bits = BQ._unpack_bits_np(expect, dim)
    assert (bits == (mat.astype(np.float64) > thr)).all()


def test_adaptive_shortlist_policy(spark, sf_dir, tmp_path):
    """r7 verdict item 4: shortlist='auto' scales super-linearly with N
    (floor below the 200k anchor, 5% at 1M — the measured >=0.9 curve);
    a fixed shortlist below the curve warns loudly; fixture-scale
    results are unchanged by 'auto' (the hash-stability guarantee)."""
    import warnings

    from vectordb_explorations_spark.operators.bq import (
        BQ_SHORTLIST_FLOOR, adaptive_shortlist, bq_cascade_search,
        bq_encode, bq_levels, bq_thresholds)
    from vectordb_explorations_spark.operators.sq import sq_encode, sq_train
    from vectordb_explorations_spark.operators.knn import sample_queries
    from vectordb_explorations_spark.schemas import EMBEDDING_DIM
    from vectordb_explorations_spark.sources.catalog import load_table

    assert adaptive_shortlist(2_000) == BQ_SHORTLIST_FLOOR
    assert adaptive_shortlist(200_000) == BQ_SHORTLIST_FLOOR
    assert adaptive_shortlist(1_000_000) == 50_000
    assert adaptive_shortlist(400_000) == 8_000  # 1% * 2x super-linear

    emb = load_table(spark, "embeddings", sf_dir)
    thr = bq_thresholds(emb, EMBEDDING_DIM)
    levels = bq_levels(emb, thr)
    codes = bq_encode(emb, thr)
    mins, maxs = sq_train(emb, EMBEDDING_DIM)
    sqc = sq_encode(emb, mins, maxs)
    qs = sample_queries(emb, 3)

    fixed = bq_cascade_search(codes, thr, levels, sqc, mins, maxs, qs, 5,
                              refine_with=emb).collect()
    auto = bq_cascade_search(codes, thr, levels, sqc, mins, maxs, qs, 5,
                             refine_with=emb, shortlist="auto").collect()
    assert sorted(map(tuple, fixed)) == sorted(map(tuple, auto))

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bq_cascade_search(codes, thr, levels, sqc, mins, maxs, qs, 5,
                          refine_with=emb, shortlist=10).collect()
    msgs = [str(w.message) for w in caught
            if issubclass(w.category, RuntimeWarning)]
    assert any("PRE-FILTER" in m and "auto" in m for m in msgs), msgs


def test_cascade_route_crossover(spark, sf_dir):
    """r8 verdict item 5: the engine ROUTES away from the cascade once
    the resolved shortlist fraction crosses the measured cliff, instead
    of warning from inside it. Pin the crossover arithmetic and that the
    auto entry point's sq8 branch serves identical rows to plain SQ8."""
    from vectordb_explorations_spark.operators.bq import (
        CASCADE_MAX_SHORTLIST_FRACTION, adaptive_shortlist,
        bq_cascade_search_auto, bq_encode, bq_levels, bq_thresholds,
        cascade_route)
    from vectordb_explorations_spark.operators.knn import sample_queries
    from vectordb_explorations_spark.operators.sq import (
        sq_encode, sq_search, sq_train)

    # crossover math: the resolved fraction is 0.01 * N/200k past the
    # anchor, so it crosses the 2% ceiling exactly at N = 400k
    assert cascade_route(200_000, 64) == "cascade"
    assert cascade_route(400_000, 64) == "cascade"   # boundary inclusive
    assert cascade_route(410_000, 64) == "sq8"
    assert cascade_route(1_000_000, 64) == "sq8"
    # a >=256-bit code ranks on its own: cascade at any N
    assert cascade_route(10_000_000, 256) == "cascade"
    # the routed boundary really is the constant, not a magic number
    n = 410_000
    assert adaptive_shortlist(n) / n > CASCADE_MAX_SHORTLIST_FRACTION

    emb = load_table(spark, "embeddings", sf_dir)
    thr = bq_thresholds(emb, EMBEDDING_DIM)
    levels = bq_levels(emb, thr)
    codes = bq_encode(emb, thr)
    mins, maxs = sq_train(emb, EMBEDDING_DIM)
    sqc = sq_encode(emb, mins, maxs)
    qs = sample_queries(emb, 3)

    # fixture corpus (500 rows) -> cascade branch; forcing corpus_n past
    # the crossover -> sq8 branch, row-identical to plain sq_search
    routed = bq_cascade_search_auto(codes, thr, levels, sqc, mins, maxs,
                                    qs, 5, refine_with=emb,
                                    corpus_n=1_000_000).collect()
    plain = sq_search(sqc, mins, maxs, qs, 5, refine_with=emb,
                      refine_factor=3).collect()
    assert sorted(map(tuple, routed)) == sorted(map(tuple, plain))
    fixture = bq_cascade_search_auto(codes, thr, levels, sqc, mins, maxs,
                                     qs, 5, refine_with=emb,
                                     corpus_n=500).collect()
    assert {r[0] for r in fixture} == {r[0] for r in routed}
