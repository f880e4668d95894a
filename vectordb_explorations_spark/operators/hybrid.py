"""Hybrid retrieval: BM25 keyword scoring fused with embedding-cosine
ranking via Reciprocal Rank Fusion (RRF) — the serving-side query shape
modern vector stores pair with their ANN index (the reference indexes
vectors only, hnsw.cc:94-285; production retrieval almost always blends a
lexical channel).

Determinism contract: every floating-point expression is generated ONCE
from shared Python constants into BOTH engines with identical structure and
left-to-right association, so the per-term BM25 contributions fold in the
same order (group-aggregate float sums are order-nondeterministic across
engines; a written-out `c0 + c1 + c2` is not). Corpus statistics (N, df,
avgdl) are exact-integer derived, tie-breaks are by doc_id, and the fused
score is binary-6dp rounded — the full pipeline is hash-checked against
DuckDB.

Scale shape: BM25 needs NO explode and NO per-token shuffle — term
frequencies and document length are per-row array scans in one codegen
projection; the corpus statistics are ONE tiny combinable aggregate
broadcast back (crossJoin of a 1-row frame); the only real exchanges are
the two pool windows (partitionBy query_id) and the pool-sized RRF join —
both bounded at queries x pool rows, never corpus-sized. The vector channel
reuses the broadcast-queries + window shape proven by the k-NN family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vectordb_explorations_spark.functions.rounding import r6, round6
from vectordb_explorations_spark.functions.vectors import cosine_similarity
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


def _bm25_contrib_col(tf, df_, dl, n, avgdl):
    """One term's BM25 contribution, structured IDENTICALLY to
    :func:`_bm25_contrib_sql` (same association, same literal spellings) so
    both engines compute bit-identical doubles. tf == 0 contributes 0."""
    idf = F.log(F.lit(1.0) + (n - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))
    return (idf * tf * F.lit(BM25_K1 + 1.0)
            / (tf + F.lit(BM25_K1)
               * (F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * dl / avgdl)))


def _bm25_contrib_sql(tf: str, df_: str, dl: str, n: str, avgdl: str) -> str:
    idf = f"ln(1.0 + ({n} - {df_} + 0.5) / ({df_} + 0.5))"
    return (f"{idf} * {tf} * {BM25_K1 + 1.0!r}"
            f" / ({tf} + {BM25_K1!r}"
            f" * (1.0 - {BM25_B!r} + {BM25_B!r} * {dl} / {avgdl}))")


def bm25_pool(docs: DataFrame,
              queries: tuple[tuple[int, tuple[str, ...]], ...] = HYBRID_QUERIES,
              pool: int = HYBRID_POOL) -> DataFrame:
    """Per-query BM25 candidate pool: (query_id, doc_id, bm25, bm25_rank).

    One corpus scan computes dl and every term's tf as array scans (no
    explode); one 1-row aggregate yields N, avgdl and each term's df and
    broadcasts back; scores stack per query through a generated
    fixed-association sum; a pool window ranks the (query, doc) rows with
    bm25 > 0."""
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

    def score_col(terms):
        cols = [
            _bm25_contrib_col(
                F.col(f"tf_{all_terms.index(t)}").cast("double"),
                F.col(f"df_{all_terms.index(t)}"), F.col("dl").cast("double"),
                F.col("n_docs"), F.col("avgdl"))
            for t in terms
        ]
        total = cols[0]
        for c in cols[1:]:
            total = total + c
        return total

    # query_id as LONG to match the vector channel's vec_id-derived ids:
    # an INT here makes the fusion join key `cast(query_id as bigint)`,
    # which breaks partitioning reuse — the join and the final window
    # each re-exchange (3 extra shuffles observed at sf0.1)
    per_query = F.array(*[
        F.struct(F.lit(qid).cast("long").alias("query_id"),
                 score_col(terms).alias("bm25"))
        for qid, terms in queries])
    scored = (joined.select("doc_id", F.explode(per_query).alias("s"))
              .select("doc_id", "s.query_id", "s.bm25")
              .where(F.col("bm25") > 0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc())
    return (scored.withColumn("bm25_rank", F.row_number().over(w))
            .where(F.col("bm25_rank") <= pool))


def vector_pool(embeddings: DataFrame, pool: int = HYBRID_POOL) -> DataFrame:
    """Per-query cosine candidate pool: (query_id, vec_id, cos_sim,
    vec_rank) — broadcast the 3 query vectors, one window exchange."""
    qids = [qid for qid, _ in HYBRID_QUERIES]
    qdf = (embeddings.where(F.col("vec_id").isin(qids))
           .select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("query_vec")))
    sim = cosine_similarity(F.col("embedding"), F.col("query_vec"),
                            dim=EMBEDDING_DIM)
    scored = (embeddings.crossJoin(F.broadcast(qdf))
              .select("query_id", "vec_id", sim.alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (scored.withColumn("vec_rank", F.row_number().over(w))
            .where(F.col("vec_rank") <= pool))


def hybrid_rrf(docs: DataFrame, embeddings: DataFrame,
               top: int = HYBRID_TOP) -> DataFrame:
    """Declared (hash-checked) hybrid search: the two pools UNION into
    (query_id, id, channel contribution) rows and ONE hash aggregate
    fuses them — sum of 1/(K+rank) over present channels, with the
    per-channel ranks recovered by conditional min. A full-outer
    sort-merge join computes the same thing with two sort exchanges; the
    union-agg needs one (and IEEE addition of two terms is commutative,
    so the 2-term sum is exactly deterministic regardless of union
    order; a single-channel doc's score equals the join form's
    contrib + 0.0 bit-for-bit). Top-``top`` per query by (rrf desc, id)."""
    b = (bm25_pool(docs)
         .select("query_id", F.col("doc_id").alias("id"),
                 F.col("bm25_rank").alias("rank_in"),
                 F.lit("b").alias("ch")))
    v = (vector_pool(embeddings)
         .select("query_id", F.col("vec_id").alias("id"),
                 F.col("vec_rank").alias("rank_in"),
                 F.lit("v").alias("ch")))
    contrib = F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_in"))
    fused = (b.unionByName(v)
             .select("query_id", "id", "ch", "rank_in",
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
            .orderBy("query_id", "rank"))


def hybrid_rrf_oracle(top: int = HYBRID_TOP) -> str:
    """DuckDB twin built from the SAME constants and expression generators
    (the zorder-style shared-literal pattern): per-term tf/df as list
    scans, the identical fixed-association BM25 sum, the identical RRF
    fold, binary 6-dp round."""
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
    qids = ", ".join(str(qid) for qid, _ in HYBRID_QUERIES)
    dot = ("list_sum(list_transform(list_zip(e.embedding, q.query_vec), "
           "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))")
    na = ("sqrt(list_sum(list_transform(e.embedding, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    nb = ("sqrt(list_sum(list_transform(q.query_vec, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    return f"""
WITH base AS (
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
),
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
