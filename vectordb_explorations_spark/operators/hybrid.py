"""Hybrid retrieval: BM25 keyword scoring fused with embedding-cosine
ranking via Reciprocal Rank Fusion (RRF) — the serving-side query shape
modern vector stores pair with their ANN index (the reference indexes
vectors only, hnsw.cc:94-285; production retrieval almost always blends a
lexical channel).

Determinism contract: every floating-point expression is generated ONCE
from shared source text into BOTH engines — the BM25 per-term fragment
(:func:`_bm25_contrib_sql`) is literally the same SQL string Spark parses
via ``F.expr`` and the DuckDB oracle embeds, so the per-term doubles and
their left-to-right fold order are bit-identical by construction
(group-aggregate float sums are order-nondeterministic across engines; a
written-out `c0 + c1 + c2` is not). Corpus statistics (N, df, avgdl) are
exact-integer derived, tie-breaks are by doc_id, and the fused score is
binary-6dp rounded — the full pipeline is hash-checked against DuckDB.

Scale shape: BM25 needs NO explode and NO per-token shuffle — term
frequencies and document length are per-row array scans in one codegen
projection; the corpus statistics are ONE tiny combinable aggregate
broadcast back (crossJoin of a 1-row frame). The fused query unions both
channels' SCORED rows under a single pool window whose (query_id, ch)
exchange carries a Partial WindowGroupLimit — shuffle traffic is
O(queries x pool x partitions), never corpus-sized — and one pool-sized
repartition then serves the RRF aggregate and the final ranking window.
The vector channel reuses the broadcast-queries shape proven by the k-NN
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6
from vectordb_explorations_spark.functions.vectors import cosine_similarity_sql
from vectordb_explorations_spark.schemas import EMBEDDING_DIM

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60          # the standard RRF dampening constant
HYBRID_POOL = 50    # per-channel candidate pool fed into the fusion
HYBRID_TOP = 10

# (query_id, keyword terms). The vector side of query q is the embedding of
# vec_id == q (documents and embeddings share ids). 'dup' is the one rare
# token in the synthetic vocabulary (df ~ 5% of docs) — it exercises the
# high-idf branch the uniformly-common tokens cannot.
HYBRID_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("vector", "scan", "dup")),
    (1, ("spark", "window", "merge")),
    (2, ("stream", "batch", "join")),
)

_ALL_TERMS = tuple(sorted({t for _, terms in HYBRID_QUERIES for t in terms}))


def _tok_array():
    """Whitespace tokens of lower(text), empties dropped — the SHARED
    tokenizer contract (functions/text.py), identical semantics to
    DuckDB's list_filter(string_split(...))."""
    from vectordb_explorations_spark.functions.text import whitespace_tokens
    return whitespace_tokens("text")


def _bm25_contrib_sql(tf: str, df_: str, dl: str, n: str, avgdl: str) -> str:
    """One term's BM25 contribution as a SQL fragment — the SINGLE
    expression source for BOTH engines (Spark parses it via F.expr, the
    oracle embeds it in DuckDB SQL), so the per-term doubles are
    bit-identical by construction. tf == 0 contributes 0."""
    idf = f"ln(1.0 + ({n} - {df_} + 0.5) / ({df_} + 0.5))"
    return (f"{idf} * {tf} * {BM25_K1 + 1.0!r}"
            f" / ({tf} + {BM25_K1!r}"
            f" * (1.0 - {BM25_B!r} + {BM25_B!r} * {dl} / {avgdl}))")


def _bm25_scored(docs: DataFrame,
                 queries: tuple[tuple[int, tuple[str, ...]], ...]
                 = HYBRID_QUERIES) -> DataFrame:
    """Per-(query, doc) BM25 scores WITHOUT the pool window:
    (query_id, doc_id, bm25) rows with bm25 > 0 — the shared corpus-scan
    half of :func:`bm25_pool` and :func:`hybrid_rrf` (the fused query
    pools both channels under ONE query_id exchange, so it needs the
    un-pooled scores).

    One corpus scan computes dl and every term's tf as array scans (no
    explode); one 1-row aggregate yields N, avgdl and each term's df and
    broadcasts back; scores stack per query through a generated
    fixed-association sum."""
    def _eq(term):
        # closure factory, NOT a default arg: a second lambda parameter
        # would flip F.filter into its (element, index) form
        return lambda t: t == F.lit(term)

    all_terms = tuple(sorted({t for _, terms in queries for t in terms}))

    # project tokens ONCE: interpreted HOFs don't CSE, so referencing the
    # split expression in dl + every tf column re-tokenized per column
    # (measured 3.57s -> 3.09s at sf0.1 for the full fused query — the
    # rest of that row is fixed stage overhead, ~10 pool-sized stages)
    toked = docs.select("doc_id", _tok_array().alias("toks"))
    base = toked.select(
        "doc_id", F.size("toks").alias("dl"),
        *[F.size(F.filter(F.col("toks"), _eq(term))).alias(f"tf_{i}")
          for i, term in enumerate(all_terms)])
    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double"))
        .alias("avgdl"),
        *[F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).cast("double")
          .alias(f"df_{i}") for i in range(len(all_terms))])
    joined = base.crossJoin(F.broadcast(stats))

    def score_sql(terms) -> str:
        parts = [
            _bm25_contrib_sql(
                f"CAST(tf_{all_terms.index(t)} AS DOUBLE)",
                f"df_{all_terms.index(t)}", "CAST(dl AS DOUBLE)",
                "n_docs", "avgdl")
            for t in terms
        ]
        out = parts[0]
        for p in parts[1:]:
            out = f"{out} + {p}"
        return out

    # The per-query score array is rendered as ONE SQL string and parsed
    # JVM-side: the SAME _bm25_contrib_sql generator feeds the DuckDB
    # oracle, so the two engines now share the expression source text
    # (py4j round-trips for the Column-built twin dominated the query's
    # construction time — see functions/vectors.py SQL twins).
    # query_id as LONG to match the vector channel's vec_id-derived ids:
    # an INT here makes the fusion grouping key `cast(query_id as
    # bigint)`, which breaks partitioning reuse downstream.
    structs = ", ".join(
        f"named_struct('query_id', CAST({qid} AS BIGINT),"
        f" 'bm25', {score_sql(terms)})"
        for qid, terms in queries)
    return (joined.select("doc_id",
                          F.expr(f"explode(array({structs}))").alias("s"))
            .select("doc_id", "s.query_id", "s.bm25")
            .where(F.col("bm25") > 0))


def bm25_pool(docs: DataFrame,
              queries: tuple[tuple[int, tuple[str, ...]], ...] = HYBRID_QUERIES,
              pool: int = HYBRID_POOL) -> DataFrame:
    """Per-query BM25 candidate pool: (query_id, doc_id, bm25, bm25_rank)
    — :func:`_bm25_scored` plus one pool window (WindowGroupLimit pushes
    the rank<=pool cut below the exchange, so only pool-sized groups
    shuffle)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc())
    return (_bm25_scored(docs, queries)
            .withColumn("bm25_rank", F.row_number().over(w))
            .where(F.col("bm25_rank") <= pool))


def bm25_topk(docs: DataFrame,
              queries: tuple[tuple[int, tuple[str, ...]], ...]
              = HYBRID_QUERIES,
              top: int = HYBRID_TOP) -> DataFrame:
    """Lexical-only BM25 retrieval as a DECLARED (hash-checked) query —
    the serving kind between exact k-NN (pure vector) and hybrid_rrf
    (fused): keyword search with no embedding involved. New in round 8.

    Plan shape is bm25_pool's: one tokenize-once corpus scan (tf/dl as
    array scans, no explode), one broadcast 1-row stats aggregate, one
    pool window whose rank cut WindowGroupLimit pushes below the
    exchange. Scores render from the same _bm25_contrib_sql fragments
    the DuckDB oracle embeds, so the doubles are bit-identical by
    construction; the binary 6-dp rounder closes the final-digit class."""
    return (bm25_pool(docs, queries, pool=top)
            .select("query_id", "doc_id",
                    round6(F.col("bm25")).alias("bm25_score"),
                    F.col("bm25_rank").alias("rank"))
            .orderBy("query_id", "rank"))


def _bm25_oracle_ctes() -> str:
    """The shared DuckDB CTE chain (base → stats → joined → scored) that
    recomputes BM25 from the same _bm25_contrib_sql fragments Spark
    parses — used by both bm25_topk_oracle and hybrid_rrf_oracle."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, t -> t = '{term}')) AS tf_{i}"
        for i, term in enumerate(_ALL_TERMS))
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(_ALL_TERMS)))

    def score_sql(terms) -> str:
        parts = [
            _bm25_contrib_sql(
                f"CAST(tf_{_ALL_TERMS.index(t)} AS DOUBLE)",
                f"df_{_ALL_TERMS.index(t)}", "CAST(dl AS DOUBLE)",
                "n_docs", "avgdl")
            for t in terms
        ]
        out = parts[0]
        for p in parts[1:]:
            out = f"{out} + {p}"
        return out

    per_query = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {qid} AS query_id, {score_sql(terms)} AS bm25"
        f" FROM joined"
        for qid, terms in HYBRID_QUERIES)
    return f"""base AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_cols}
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
        FROM documents)
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
         {df_cols}
  FROM base
),
joined AS (SELECT * FROM base CROSS JOIN stats),
scored AS (
{per_query}
)"""


def bm25_topk_oracle(top: int = HYBRID_TOP) -> str:
    """DuckDB twin of :func:`bm25_topk` — the BM25 half of
    hybrid_rrf_oracle's CTEs, built from the same generators."""
    return f"""
WITH {_bm25_oracle_ctes()}
SELECT query_id, doc_id, {r6('bm25')} AS bm25_score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
         AS rank
FROM scored WHERE bm25 > 0
QUALIFY rank <= {top}
ORDER BY query_id, rank
"""


def _vector_scored(embeddings: DataFrame) -> DataFrame:
    """Per-(query, vector) cosine scores WITHOUT the pool window:
    broadcast the 3 query vectors, one codegen projection per corpus
    row — (query_id, vec_id, cos_sim)."""
    qids = [qid for qid, _ in HYBRID_QUERIES]
    qdf = (embeddings.where(F.col("vec_id").isin(qids))
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    sim = F.expr(cosine_similarity_sql("embedding", "query_vec",
                                       EMBEDDING_DIM))
    return (embeddings.crossJoin(F.broadcast(qdf))
            .select("query_id", "vec_id", sim.alias("cos_sim")))


def vector_pool(embeddings: DataFrame, pool: int = HYBRID_POOL) -> DataFrame:
    """Per-query cosine candidate pool: (query_id, vec_id, cos_sim,
    vec_rank) — broadcast the 3 query vectors, one window exchange."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (_vector_scored(embeddings)
            .withColumn("vec_rank", F.row_number().over(w))
            .where(F.col("vec_rank") <= pool))


def hybrid_rrf(docs: DataFrame, embeddings: DataFrame,
               top: int = HYBRID_TOP) -> DataFrame:
    """Declared (hash-checked) hybrid search: both channels' SCORED rows
    union under ONE hash exchange on query_id that then serves every
    downstream step — the per-channel pool windows (partitionBy
    (query_id, ch) is co-partitioned by the query_id exchange), the RRF
    hash aggregate (grouping (query_id, id) is clustered by it), and the
    final top-``top`` window. r6 plan: 4 shuffle exchanges + a
    range-partitioned orderBy (sampling pass + exchange for <=30 rows);
    this shape (per the rendered PLANS.md evidence): 3 exchanges total —
    the single POOLING/FUSION exchange described above, the (query_id,
    ch) window exchange that feeds it, and the 1-row corpus-stats
    single-partition aggregate — and the presentation sort is a
    coalesce(1).sortWithinPartitions over the <=queries*top output rows
    (no sampling job, no range exchange — the output is bounded, never
    corpus-sized).

    Fusion semantics are unchanged from the join form: sum of 1/(K+rank)
    over present channels with per-channel ranks recovered by
    conditional min. IEEE addition of two terms is commutative, so the
    2-term sum is exactly deterministic regardless of union order, and a
    single-channel doc's score equals the join form's contrib + 0.0
    bit-for-bit. WindowGroupLimit still cuts each channel to pool-sized
    groups BELOW the exchange, so the one shuffle moves
    O(queries * pool * partitions) rows, never corpus-sized traffic."""
    b = (_bm25_scored(docs)
         .select("query_id", F.col("doc_id").alias("id"),
                 F.col("bm25").alias("score"), F.lit("b").alias("ch")))
    v = (_vector_scored(embeddings)
         .select("query_id", F.col("vec_id").alias("id"),
                 F.col("cos_sim").alias("score"), F.lit("v").alias("ch")))
    wch = Window.partitionBy("query_id", "ch").orderBy(
        F.col("score").desc(), F.col("id").asc())
    pooled = (b.unionByName(v)
              .withColumn("rank_in", F.row_number().over(wch))
              .where(F.col("rank_in") <= HYBRID_POOL))
    contrib = F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_in"))
    fused = (pooled.select("query_id", "id", "ch", "rank_in",
                           contrib.alias("contrib"))
             .repartition("query_id")
             .groupBy("query_id", "id")
             .agg(F.sum("contrib").alias("_rrf"),
                  F.min(F.when(F.col("ch") == "b", F.col("rank_in")))
                  .alias("bm25_rank"),
                  F.min(F.when(F.col("ch") == "v", F.col("rank_in")))
                  .alias("vec_rank")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_rrf").desc(), F.col("id").asc())
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top)
            .select("query_id", F.col("id").alias("doc_id"),
                    round6(F.col("_rrf")).alias("rrf_score"),
                    "bm25_rank", "vec_rank", "rank")
            .coalesce(1).sortWithinPartitions("query_id", "rank"))


def hybrid_rrf_oracle(top: int = HYBRID_TOP) -> str:
    """DuckDB twin built from the SAME constants and expression generators
    (the zorder-style shared-literal pattern): per-term tf/df as list
    scans (via the _bm25_oracle_ctes chain bm25_topk_oracle shares), the
    identical fixed-association BM25 sum, the identical RRF fold, binary
    6-dp round."""
    qids = ", ".join(str(qid) for qid, _ in HYBRID_QUERIES)
    dot = ("list_sum(list_transform(list_zip(e.embedding, q.query_vec), "
           "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))")
    na = ("sqrt(list_sum(list_transform(e.embedding, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    nb = ("sqrt(list_sum(list_transform(q.query_vec, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    return f"""
WITH {_bm25_oracle_ctes()},
bpool AS (
  SELECT query_id, doc_id AS id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY bm25 DESC, doc_id ASC) AS INTEGER)
           AS bm25_rank
  FROM scored WHERE bm25 > 0
  QUALIFY bm25_rank <= {HYBRID_POOL}
),
q AS (SELECT vec_id AS query_id, embedding AS query_vec
      FROM embeddings WHERE vec_id IN ({qids})),
vscored AS (
  SELECT q.query_id, e.vec_id AS id,
         {dot} / ({na} * {nb}) AS cos_sim
  FROM embeddings e CROSS JOIN q
),
vpool AS (
  SELECT query_id, id,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, id ASC) AS INTEGER)
           AS vec_rank
  FROM vscored
  QUALIFY vec_rank <= {HYBRID_POOL}
),
fused AS (
  SELECT coalesce(b.query_id, v.query_id) AS query_id,
         coalesce(b.id, v.id) AS doc_id, b.bm25_rank, v.vec_rank,
         coalesce(1.0 / ({RRF_K}.0 + b.bm25_rank), 0.0)
           + coalesce(1.0 / ({RRF_K}.0 + v.vec_rank), 0.0) AS rrf
  FROM bpool b FULL OUTER JOIN vpool v
    ON b.query_id = v.query_id AND b.id = v.id
)
SELECT query_id, doc_id, {r6('rrf')} AS rrf_score, bm25_rank, vec_rank,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id ASC) AS INTEGER)
         AS rank
FROM fused
QUALIFY rank <= {top}
ORDER BY query_id, rank
"""
