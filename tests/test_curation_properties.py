"""Property-based tests (hypothesis) for the corpus-curation operators:
repetition metrics, chunk coverage, and contamination symmetry must hold
on arbitrary word-token documents, not just the fixture corpus.

Examples are batched into one DataFrame per hypothesis case to keep the
Spark-job count bounded (deadline disabled)."""

import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_explorations_spark.operators.sampling import (  # noqa: E402
    CHUNK_STRIDE, CHUNK_WIN, doc_chunks)
from vectordb_explorations_spark.operators.textops import (  # noqa: E402
    doc_repetition_stats)

word = st.text(alphabet="abcde", min_size=1, max_size=3)
doc = st.lists(word, min_size=1, max_size=60).map(" ".join)
docs_strategy = st.lists(doc, min_size=1, max_size=8)
CASES = settings(max_examples=10, deadline=None)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


@CASES
@given(docs_strategy)
def test_repetition_metrics_bounded(spark, texts):
    """Both fractions live in [0, 1]; a doc of one repeated token maxes
    top_word_frac; fully-distinct docs have dup_bigram_frac 0."""
    rows = doc_repetition_stats(_df(spark, texts)).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert 0.0 <= r["top_word_frac"] <= 1.0
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0
        toks = texts[r["doc_id"]].split(" ")
        assert r["n_tokens"] == len(toks)
        if len(set(toks)) == 1:
            assert r["top_word_frac"] == 1.0
        if len(toks) == len(set(toks)):
            assert r["dup_bigram_frac"] == 0.0


@CASES
@given(docs_strategy)
def test_chunks_tile_every_token(spark, texts):
    """Windows cover the whole document: first starts at 0, consecutive
    starts differ by the stride, the last window reaches the final token,
    and every window is full-width except possibly the last."""
    rows = doc_chunks(_df(spark, texts)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        n = len(t.split(" "))
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert chunks[0]["chunk_start"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b["chunk_start"] - a["chunk_start"] == CHUNK_STRIDE
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_len"] == n
        for c in chunks[:-1]:
            assert c["chunk_len"] == CHUNK_WIN


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_round6_matches_oracle_r6_on_arbitrary_doubles(spark, xs):
    """The binary-rounding pair (functions/rounding.py) must agree between
    Spark and DuckDB on ARBITRARY doubles — including adversarial
    .XXXXXX5-boundary values hypothesis shrinks toward — because the whole
    point of the pair is that both engines perform the identical IEEE
    ops."""
    import duckdb

    from pyspark.sql import functions as F

    from vectordb_explorations_spark.functions.rounding import r6, round6

    # exercise the exact boundary shape too: k/64-style rationals
    xs = xs + [x + 1 / 64 for x in xs[:5]]
    df = spark.createDataFrame([(i, float(x)) for i, x in enumerate(xs)],
                               "i long, x double")
    got = {r["i"]: r["y"]
           for r in df.select("i", round6(F.col("x")).alias("y")).collect()}
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(i BIGINT, x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)",
                        [(i, float(x)) for i, x in enumerate(xs)])
        want = dict(con.execute(f"SELECT i, {r6('x')} FROM t").fetchall())
    finally:
        con.close()
    assert got == want


@CASES
@given(docs_strategy)
def test_gram_buckets_cross_engine_contract(spark, texts):
    """The _gram_buckets / _gram_buckets_sql pair IS the cross-engine
    contract dsir_select and source_kl_divergence hash against: on
    arbitrary word-token documents (including empty, whitespace-only and
    single-token edge docs, which Spark's descending sequence(1, 0) used
    to crash) both engines must produce the IDENTICAL
    (doc_id, source, bucket) multiset."""
    import duckdb

    from vectordb_explorations_spark.operators.sampling import (
        DSIR_BUCKETS, _gram_buckets, _gram_buckets_sql)

    edge = ["", "   ", "solo"]
    all_texts = list(texts) + edge
    sdf = spark.createDataFrame(
        [(i, f"s{i % 3}", t) for i, t in enumerate(all_texts)],
        "doc_id long, source string, text string")
    got = sorted((r.doc_id, r.source, r.bucket)
                 for r in _gram_buckets(sdf, DSIR_BUCKETS).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                    [(i, f"s{i % 3}", t)
                     for i, t in enumerate(all_texts)])
    want = sorted(map(tuple, con.execute(
        f"WITH {_gram_buckets_sql(DSIR_BUCKETS)} "
        "SELECT doc_id, source, bucket FROM gbkt").fetchall()))
    con.close()
    assert got == want


@CASES
@given(docs_strategy)
def test_gopher_signals_cross_engine_contract(spark, texts):
    """gopher_quality_signals' full row — including the staged
    top-n-gram char fractions with their lexicographic-min tie-break —
    must match the DuckDB oracle on ARBITRARY word-token documents,
    including empty / whitespace-only / single-token edge docs and the
    pathological one-repeated-token shape where the raw occurrence-
    count formula over-counts overlapping repeats past 1.0 — capped at
    1.0 in BOTH engines since r12 (the r11 ADVICE fix); both must agree
    on the capped value too."""
    import duckdb

    from vectordb_explorations_spark.operators.textops import (
        gopher_quality_signals, gopher_quality_signals_oracle)

    edge = ["", "   ", "solo", "z " * 30]
    all_texts = list(texts) + edge
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(all_texts)],
        "doc_id long, text string")
    got = sorted(tuple(r) for r in gopher_quality_signals(sdf).collect())

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(all_texts)))
        want = sorted(map(tuple, con.execute(
            gopher_quality_signals_oracle()).fetchall()))
    finally:
        con.close()
    assert got == want


@CASES
@given(st.lists(st.lists(word, min_size=1, max_size=30).map(" ".join),
                min_size=1, max_size=8))
def test_ngram_novelty_cross_engine_contract(spark, texts):
    """ngram_novelty (w=5 so hypothesis-sized docs actually window) must
    match the DuckDB oracle on arbitrary word-token documents — the
    tiny 'abcde'-alphabet vocabulary makes window collisions COMMON, so
    this exercises the keeper-attribution path far harder than the
    fixture; sub-w docs must be absent from both engines."""
    import duckdb

    from vectordb_explorations_spark.operators.dedup import (
        ngram_novelty, ngram_novelty_oracle)

    w = 5
    all_texts = list(texts) + ["", "one two three four"]  # sub-w edges
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(all_texts)],
        "doc_id long, text string")
    got = sorted(tuple(r) for r in ngram_novelty(sdf, w=w).collect())

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(all_texts)))
        want = sorted(map(tuple, con.execute(
            ngram_novelty_oracle(w=w)).fetchall()))
    finally:
        con.close()
    assert got == want
    # the keeper invariant on any corpus: every doc's novelty in [0, 1],
    # and the smallest doc_id holding any duplicated fingerprint still
    # scores novelty 1.0 when it is the corpus-wide first for ALL its
    # windows (doc 0 by construction if present)
    for _, n_win, novel, nov in got:
        assert 0 <= novel <= n_win and 0.0 <= nov <= 1.0
    if got and got[0][0] == 0:
        assert got[0][3] == 1.0


@given(st.lists(
    st.tuples(st.sampled_from(["A", "B", "C"]),
              st.lists(st.integers(min_value=-8, max_value=8),
                       min_size=4, max_size=4)),
    min_size=2, max_size=24))
@settings(max_examples=10, deadline=None)
def test_embedding_outliers_cross_engine_contract(spark, rows):
    """embedding_outliers' full row — rounded centroid dims, the zip_with
    distance fold, the per-label moments, the sd=0 NULL-z guard, and the
    (dist DESC, vec_id) rank — must match the DuckDB oracle on arbitrary
    small-integer vectors (exact float arithmetic, so ties and the
    degenerate single-vector / identical-vector labels are COMMON —
    exactly the paths the fixture's spread-out floats never hit)."""
    import duckdb

    from vectordb_explorations_spark.operators.featurize import (
        embedding_outliers, embedding_outliers_oracle)

    data = [(i, [float(x) for x in vec], lab)
            for i, (lab, vec) in enumerate(rows)]
    sdf = spark.createDataFrame(data, "vec_id long, embedding array<float>,"
                                      " label string")
    got = sorted(tuple(r) for r in embedding_outliers(sdf, top_k=3).collect())

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE embeddings "
                    "(vec_id BIGINT, embedding FLOAT[], label VARCHAR)")
        con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", data)
        want = sorted(map(tuple, con.execute(
            embedding_outliers_oracle(top_k=3, dim=4)).fetchall()))
    finally:
        con.close()
    assert got == want


@given(st.lists(
    st.tuples(st.sampled_from(["A", "B"]),
              st.lists(st.integers(min_value=-6, max_value=6),
                       min_size=3, max_size=3)),
    min_size=2, max_size=20))
@settings(max_examples=10, deadline=None)
def test_retrieval_and_hard_example_cross_engine_contracts(spark, rows):
    """retrieval_quality (the MRR max, the DCG sum, the IDCG fold with
    its r_total=0 guard — labels with a single member are common here)
    and hard_examples (missing-kind NULLs, rank tie-breaks on equal
    integer distances) must match their DuckDB oracles on arbitrary
    small-integer vectors."""
    import duckdb

    from vectordb_explorations_spark.operators.knn import (
        hard_examples, hard_examples_oracle, retrieval_quality,
        retrieval_quality_oracle)

    data = [(i, [float(x) for x in vec], lab)
            for i, (lab, vec) in enumerate(rows)]
    sdf = spark.createDataFrame(data, "vec_id long, embedding array<float>,"
                                      " label string")
    nq, k = min(4, len(data)), 5

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE embeddings "
                    "(vec_id BIGINT, embedding FLOAT[], label VARCHAR)")
        con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", data)
        got_rq = sorted(tuple(r) for r in
                        retrieval_quality(sdf, nq, k).collect())
        want_rq = sorted(map(tuple, con.execute(
            retrieval_quality_oracle(nq, k)).fetchall()))
        got_he = sorted(tuple(r) for r in
                        hard_examples(sdf, nq, k).collect())
        want_he = sorted(map(tuple, con.execute(
            hard_examples_oracle(nq, k)).fetchall()))
    finally:
        con.close()
    assert got_rq == want_rq
    assert got_he == want_he


@CASES
@given(docs_strategy)
def test_bpe_token_counts_cross_engine_contract(spark, texts):
    """bpe_token_counts — the char-split, the double-space boundary
    guard, all sixteen sequential merges, and the per-source rollup —
    must match the DuckDB oracle on ARBITRARY word-token documents
    (plus docs built from the merge table's own target words, where
    every cascade fires)."""
    import duckdb

    from vectordb_explorations_spark.operators.textops import (
        bpe_token_counts, bpe_token_counts_oracle)

    edge = ["table hash", "query row stream", "tab ta b erery"]
    all_texts = list(texts) + edge
    rows = [(i, f"s{i % 3}", t) for i, t in enumerate(all_texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(tuple(r) for r in bpe_token_counts(sdf).collect())

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents "
                    "(doc_id BIGINT, source VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
        want = sorted(map(tuple, con.execute(
            bpe_token_counts_oracle()).fetchall()))
    finally:
        con.close()
    assert got == want


# long enough that some docs clear the 216-char image payload prefix
# and others don't (the filter edge is part of the contract)
long_word = st.text(alphabet="abcdefgh", min_size=3, max_size=6)
long_doc = st.lists(long_word, min_size=5, max_size=60).map(" ".join)
long_docs_strategy = st.lists(long_doc, min_size=1, max_size=6)
PCASES = settings(max_examples=6, deadline=None)


@PCASES
@given(long_docs_strategy)
def test_perceptual_pairs_cross_engine_contract(spark, texts):
    """The whole perceptual pipeline — payload synthesis filters, the
    REAL P6/BMP and 8/16-bit WAV round-trips, integer luma, NN grid,
    aHash/dHash/energy-contour bits, MSB-first packing, banding, the
    occupancy cap, and the Hamming verify — must match the DuckDB
    oracles (which recompute the hashes from text positions) on
    arbitrary ASCII documents, including a planted duplicate pair."""
    import duckdb

    from vectordb_explorations_spark.operators.perceptual import (
        dedup_perceptual_audio, dedup_perceptual_audio_oracle,
        dedup_perceptual_image, dedup_perceptual_image_oracle)

    all_texts = list(texts) + [texts[0]]        # planted cross-doc dup
    rows = [(i, t) for i, t in enumerate(all_texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        for fn, oracle in ((dedup_perceptual_image,
                            dedup_perceptual_image_oracle),
                           (dedup_perceptual_audio,
                            dedup_perceptual_audio_oracle)):
            got = sorted(tuple(r) for r in fn(sdf).collect())
            want = sorted(map(tuple, con.execute(oracle()).fetchall()))
            assert got == want
    finally:
        con.close()


@settings(max_examples=5, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="abcde", min_size=1,
                                 max_size=5),
                         min_size=1, max_size=12).map(" ".join),
                min_size=1, max_size=5))
def test_bpe_learn_merges_cross_engine_contract(spark, texts):
    """The full trainer loop — dictionary build, weighted pair counts,
    the (count DESC, pair ASC) argmax, the boundary-guarded rewrite,
    the early stop — must match the unrolled-CTE DuckDB oracle rank
    for rank on ARBITRARY small-alphabet corpora (a 5-letter alphabet
    forces heavy pair collisions, cascades, and ties)."""
    import duckdb

    from vectordb_explorations_spark.operators.textops import (
        bpe_learn_merges, bpe_learn_merges_oracle)

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(sdf).collect()]

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = [tuple(r) for r in
                con.execute(bpe_learn_merges_oracle()).fetchall()]
    finally:
        con.close()
    assert got == want
