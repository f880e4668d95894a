"""Unit tests for the corpus-curation text ops added in round 2:
intra-document repetition stats (Gopher-style rules) and eval-set
n-gram contamination. Hand-built fixtures pin the exact semantics the
DuckDB oracle twins re-derive at fixture scale."""

from vectordb_explorations_spark.operators.textops import (
    contamination_check, doc_repetition_stats)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_keyword_stuffing(spark):
    docs = _docs(spark, [
        (1, "spam spam spam spam spam"),          # one token repeated
        (2, "a b c d e f g h i j"),               # all distinct
        (3, "x y x y x y x y x y"),               # repeated bigram loop
    ])
    rows = {r["doc_id"]: r for r in doc_repetition_stats(docs).collect()}
    assert rows[1]["top_word_frac"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 0.75       # 4 bigrams, 1 distinct
    assert rows[1]["repetitive"] == 1
    assert rows[2]["top_word_frac"] == 0.1
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["repetitive"] == 0
    # doc 3: 10 tokens, top token 5/10; 9 bigrams, 2 distinct
    assert rows[3]["top_word_frac"] == 0.5
    assert rows[3]["dup_bigram_frac"] == round(1 - 2 / 9, 6)
    assert rows[3]["repetitive"] == 1


def test_repetition_bigram_math(spark):
    # 5 tokens -> 4 bigrams: "s s","s s","s s","s s" -> 1 distinct -> 0.75
    docs = _docs(spark, [(1, "s s s s s")])
    r = doc_repetition_stats(docs).collect()[0]
    assert r["dup_bigram_frac"] == 0.75
    assert r["n_tokens"] == 5


def test_contamination_detects_eval_ngram(spark):
    # doc 0 is the eval slice (doc_id % 50 == 0); doc 1 shares its 8-gram
    # prefix, doc 2 shares nothing.
    eval_text = "one two three four five six seven eight nine ten"
    contaminated = "one two three four five six seven eight QQQ RRR"
    clean = "aa bb cc dd ee ff gg hh ii jj"
    docs = _docs(spark, [(0, eval_text), (1, contaminated), (2, clean)])
    out = {r["doc_id"]: r for r in contamination_check(docs).collect()}
    assert set(out) == {1}                       # only doc 1 overlaps
    r = out[1]
    assert r["n_grams"] == 3                     # 10 tokens -> 3 distinct 8-grams
    assert r["n_contaminated"] == 1              # the shared prefix 8-gram
    assert r["contam_frac"] == round(1 / 3, 6)


def test_contamination_skips_short_docs(spark):
    # under 8 tokens -> no 8-grams -> excluded from both slices, no crash
    docs = _docs(spark, [(0, "a b c d e f g h i"), (1, "too short doc")])
    assert contamination_check(docs).count() == 0


def test_doc_chunks_window_math(spark):
    from vectordb_explorations_spark.operators.sampling import doc_chunks
    # 40 tokens, win=32, stride=24 -> chunks at 0 (len 32) and 24 (len 16)
    text40 = " ".join(f"t{i}" for i in range(40))
    short = "a b c"   # shorter than the window -> one full-doc chunk
    docs = _docs(spark, [(1, text40), (2, short)])
    rows = doc_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [(r["chunk_start"], r["chunk_len"]) for r in c1] == [(0, 32), (24, 16)]
    assert [(r["chunk_start"], r["chunk_len"]) for r in by_doc[2]] == [(0, 3)]


def test_boilerplate_ngrams_planted(spark):
    """A phrase recurring in most docs is flagged; a phrase in one doc is
    not; docs shorter than the gram size contribute nothing; coverage
    counts docs with zero hot grams in the per-lang average."""
    from vectordb_explorations_spark.operators.textops import (
        boilerplate_coverage, boilerplate_ngrams)
    rows = [(i, f"subscribe to our newsletter unique{i} words here", "en", 1)
            for i in range(8)]
    rows += [(8, "totally different content entirely", "en", 1),
             (9, "short", "en", 1)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")
    hot = {r.ngram: r.df
           for r in boilerplate_ngrams(docs, k=2, min_frac=0.5).collect()}
    assert hot.get("subscribe to") == 8
    assert hot.get("to our") == 8
    assert "totally different" not in hot
    cov = {r.lang: r for r in
           boilerplate_coverage(docs, k=2, min_frac=0.5).collect()}
    en = cov["en"]
    # doc 9 has 1 token < k and drops from the gram universe; doc 8 stays
    # with coverage 0
    assert en.n_docs == 9
    assert en.n_flagged == 8
    assert 0.0 < en.avg_cov < 1.0


# ---- deterministic BPE-apply (bpe_token_counts) ----

def test_bpe_known_merge_sequences(spark):
    """Pin the canonical merge walk for words the fixed table fully,
    partially, and never covers: table->1 (t,a / ta,b / tab,l /
    tabl,e), hash->1 (h,a / ha,s / has,h), query->3 (e,r then er,y),
    row->1 (o,w then r,ow), stream->5 (only s,t fires), teeth->5 (no
    merge matches)."""
    from pyspark.sql import functions as F
    from vectordb_explorations_spark.operators.textops import (
        bpe_word_tokens)

    words = ["table", "hash", "query", "row", "stream", "teeth"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {r.w: r.n for r in
           df.select("w", bpe_word_tokens(F.col("w")).alias("n")).collect()}
    assert got == {"table": 1, "hash": 1, "query": 3, "row": 1,
                   "stream": 5, "teeth": 5}


def test_bpe_boundary_guard_blocks_cross_token_merge(spark):
    """'tab' under merges [(t,a), (a,b)] must resolve to [ta, b] — a
    single-space token stream would false-match 'a b' inside 'ta b'
    and merge across the token boundary to 1."""
    from pyspark.sql import functions as F
    from vectordb_explorations_spark.operators.textops import (
        bpe_word_tokens)

    df = spark.createDataFrame([("tab",)], ["w"])
    n = df.select(bpe_word_tokens(
        F.col("w"), merges=[("t", "a"), ("a", "b")]).alias("n")
    ).collect()[0].n
    assert n == 2


def test_bpe_consecutive_merge_sites_same_pass(spark):
    """'abab' under merge [(a,b)] -> [ab, ab]: the double-space
    separator re-emits the boundary each replacement, so the second
    site stays matchable in the same pass (a single-space form would
    consume the shared space and miss it)."""
    from pyspark.sql import functions as F
    from vectordb_explorations_spark.operators.textops import (
        bpe_word_tokens)

    df = spark.createDataFrame([("abab",)], ["w"])
    n = df.select(bpe_word_tokens(
        F.col("w"), merges=[("a", "b")]).alias("n")).collect()[0].n
    assert n == 2


def test_bpe_token_counts_per_source(spark):
    docs = spark.createDataFrame([
        (0, "sa", "table hash"),             # 1 + 1 bpe tokens
        (1, "sa", "query"),                  # 3
        (2, "sb", "teeth"),                  # 5
    ], ["doc_id", "source", "text"])
    from vectordb_explorations_spark.operators.textops import (
        bpe_token_counts)

    out = {r.source: r for r in bpe_token_counts(docs).collect()}
    sa, sb = out["sa"], out["sb"]
    assert (sa.n_docs, sa.ws_tokens, sa.bpe_tokens) == (2, 3, 5)
    assert round(sa.tokens_per_word, 6) == round(5 / 3, 6)
    assert (sb.n_docs, sb.ws_tokens, sb.bpe_tokens) == (1, 1, 5)


def test_bpe_learn_merges_planted(spark):
    """Hand-computed trainer run: the dominant pair wins rank 1, the
    LEARNED token participates in rank 2 (the cascade), rank 3 takes
    the remaining pair, and the trainer STOPS when the corpus runs out
    of pairs (3 rows, not n_merges)."""
    from vectordb_explorations_spark.operators.textops import (
        bpe_learn_merges)

    rows = [(1, "abab abab abab"), (2, "cd cd")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(docs, n_merges=8).collect()]
    # abab x3: pairs (a,b) 2/word, (b,a) 1/word -> (a,b)=6 wins;
    # rewrite 'ab ab': (ab,ab)=3 wins rank 2 -> 'abab';
    # cd x2: (c,d)=2 wins rank 3; then no pairs remain.
    assert got == [(1, "a", "b", 6), (2, "ab", "ab", 3),
                   (3, "c", "d", 2)]


def test_bpe_learn_merges_tie_break(spark):
    """Equal-count pairs resolve by (lhs ASC, rhs ASC) — the
    deterministic tie the oracle replays."""
    from vectordb_explorations_spark.operators.textops import (
        bpe_learn_merges)

    docs = spark.createDataFrame([(1, "xy yx")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_learn_merges(docs, n_merges=1).collect()]
    assert got == [(1, "x", "y", 1)]


def _run_learned_budget_both_engines(spark, rows, n_merges):
    import duckdb

    from vectordb_explorations_spark.operators.textops import (
        bpe_learned_budget, bpe_learned_budget_oracle)

    sdf = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    got = [tuple(x if not isinstance(x, float) else round(x, 6)
                 for x in r)
           for r in bpe_learned_budget(sdf, n_merges=n_merges).collect()]
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents "
                    "(doc_id BIGINT, source VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
        want = [tuple(x if not isinstance(x, float) else round(x, 6)
                      for x in r)
                for r in con.execute(
                    bpe_learned_budget_oracle(n_merges)).fetchall()]
    finally:
        con.close()
    return got, want


def test_bpe_learned_budget_corpus_edit_flips_downstream(spark):
    """The closed tokenizer loop (learn -> apply -> budget) as ONE
    operator: an edit to the corpus flips the LEARNED rank-1 merge and
    the flip propagates to the downstream per-source budgets — in BOTH
    engines, which must agree before and after (r13 verdict item 2's
    planted-semantics pin)."""
    from vectordb_explorations_spark.operators.textops import (
        bpe_learn_merges)

    base = [(0, "sa", "xy xy xy zq"), (1, "sb", "xy zq zq")]
    # the edit makes zq dominant where xy was
    edited = [(0, "sa", "zq zq zq xy"), (1, "sb", "xy zq zq")]

    got_a, want_a = _run_learned_budget_both_engines(spark, base, 1)
    got_b, want_b = _run_learned_budget_both_engines(spark, edited, 1)
    assert got_a == want_a
    assert got_b == want_b

    def rank1(rows):
        sdf = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        return [(r["lhs"], r["rhs"])
                for r in bpe_learn_merges(sdf, n_merges=1).collect()]

    assert rank1(base) == [("x", "y")]
    assert rank1(edited) == [("z", "q")]
    # the learned flip changes the budgets, not just the merge table:
    # under rank1=xy, sa's 3 xy words collapse to 1 token each; under
    # rank1=zq they stay 2 tokens (and vice versa for the zq words)
    budget = {r[0]: r[3] for r in got_a}          # source -> bpe_tokens
    budget_b = {r[0]: r[3] for r in got_b}
    assert budget["sa"] == 3 * 1 + 1 * 2          # xy xy xy zq
    assert budget_b["sa"] == 3 * 1 + 1 * 2        # zq zq zq xy (mirror)
    assert budget["sb"] == 1 * 1 + 2 * 2          # xy merged, zq not
    assert budget_b["sb"] == 1 * 2 + 2 * 1        # zq merged, xy not


def test_bpe_learned_budget_exhausted_ranks_are_identity(spark):
    """A corpus with no learnable pairs (all 1-char words) learns an
    EMPTY table; the apply chain must be the identity in both engines
    (the oracle's LEFT JOIN ON TRUE guard vs Spark's short list)."""
    rows = [(0, "sa", "a b a"), (1, "sb", "c")]
    got, want = _run_learned_budget_both_engines(spark, rows, 3)
    assert got == want
    out = {r[0]: r for r in got}
    assert out["sa"][2:4] == (3, 3)   # ws_tokens == bpe_tokens
    assert out["sb"][2:4] == (1, 1)


def test_bpe_fertility_by_lang_planted(spark):
    """Hand-computed fertility semantics for the staged r15 operator:
    a merge learned from the dominant (en) pairs lowers en fertility;
    multibyte words drive bytes_per_token up even at equal fertility —
    and both engines agree on the exact row values."""
    import duckdb

    from vectordb_explorations_spark.operators.textops import (
        bpe_fertility_by_lang, bpe_fertility_by_lang_oracle)

    rows = [(0, "en", "abab abab abab"), (1, "zh", "火火 火火")]
    sdf = spark.createDataFrame(rows,
                                "doc_id long, lang string, text string")
    got = {r["lang"]: tuple(r)
           for r in bpe_fertility_by_lang(sdf, n_merges=1).collect()}
    # learned rank 1 = (a,b): en 'abab' -> 'ab ab' (2 tokens/word);
    # zh words untouched (2 tokens/word) — equal fertility, but the
    # 3-byte CJK chars double bytes_per_token
    assert got["en"] == ("en", 1, 3, 6, 2.0, 2.0)
    assert got["zh"] == ("zh", 1, 2, 4, 2.0, 3.0)

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents "
                    "(doc_id BIGINT, lang VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
        want = {r[0]: tuple(r) for r in con.execute(
            bpe_fertility_by_lang_oracle(1)).fetchall()}
    finally:
        con.close()
    assert got == want


def test_bpe_learn_merges_head_matches_fixture_table(spark):
    """The baked BPE_MERGES table's non-cascade head was derived from
    the gate-scale fixture (sf0.01 — the smoke corpus ranks rank-2+
    differently) — the trainer must re-derive it: rank 1-5 equal the
    table's first five merges."""
    from vectordb_explorations_spark.operators.textops import (
        BPE_MERGES, bpe_learn_merges)
    from vectordb_explorations_spark.sources import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.01")
    got = [(r["lhs"], r["rhs"])
           for r in bpe_learn_merges(docs, n_merges=5).collect()]
    assert got == BPE_MERGES[:5]
