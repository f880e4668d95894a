"""MMR (Maximal Marginal Relevance) diversified re-ranking: greedily pick
results that are relevant to the query but dissimilar to what was already
picked — the standard answer to "my top-10 are ten near-copies", and (with
near-duplicated corpora) the serving-side twin of the dedup family.

    score(d | S) = LAM * rel(d) - MU * max_{s in S} sim(d, s)

The greedy argmax is inherently SEQUENTIAL, which is exactly why this
operator earns its own execution shape: the candidate pool per query is
BOUNDED (top-``pool`` from the vector channel), so the loop runs inside
``applyInPandas`` per query group — the same bounded-imperative-core
pattern as the per-shard HNSW build (operators/hnsw.py), while pool
generation and everything before it stays declarative. At 100 TB the
corpus-sized work (the pool scan) is the k-NN family's; the MMR stage
touches pool-sized data only (queries x pool rows), so it adds no
corpus-scale shuffle.

Determinism (hash-checked): every similarity is a sequential left-fold of
doubles — Python loops in the UDF reproduce DuckDB's list_sum fold exactly
(the same equivalence every knn oracle relies on, F.aggregate ≡ list_sum)
— ties break by vec_id, and the oracle UNROLLS the k greedy iterations
into generated CTEs from the same constants (no recursive-CTE semantics to
trust). LAM/MU are independent literals (NOT computed as 1-LAM, which is
0.30000000000000004 in binary).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from vectordb_explorations_spark.functions.rounding import r6, round6
from vectordb_explorations_spark.operators.hybrid import HYBRID_QUERIES, vector_pool

MMR_LAM = 0.7    # relevance weight
MMR_MU = 0.3     # diversity penalty weight (a literal, not 1-LAM)
MMR_POOL = 25    # bounded candidate pool per query
MMR_TOP = 10


def _dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cos(a, b) -> float:
    # mirrors the oracle's dot / (sqrt(ssq_a) * sqrt(ssq_b)) structure
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def mmr_rerank(embeddings: DataFrame, pool: int = MMR_POOL,
               top: int = MMR_TOP) -> DataFrame:
    """Declared (hash-checked) MMR re-rank of the cosine top-``pool`` for
    the shared HYBRID_QUERIES probe vectors. Pool generation is the proven
    broadcast+window channel; the greedy loop runs per query group over at
    most ``pool`` rows."""
    import pandas as pd

    cand = (vector_pool(embeddings, pool=pool)
            .select("query_id", "vec_id", F.col("cos_sim").alias("rel")))
    with_vec = cand.join(embeddings.select("vec_id", "embedding"), "vec_id")

    schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("mmr_score", T.DoubleType()),
        T.StructField("rank", T.IntegerType()),
    ])

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows = [(int(r.vec_id), float(r.rel), list(r.embedding))
                for r in pdf.itertuples()]
        rows.sort(key=lambda r: r[0])
        qid = int(pdf["query_id"].iloc[0])
        # pairwise sims once: pool^2 sequential folds, ~pool^2*dim flops
        sims = {}
        for i, (vi, _, ei) in enumerate(rows):
            for vj, _, ej in rows[i + 1:]:
                sims[(vi, vj)] = sims[(vj, vi)] = _cos(ei, ej)
        chosen: list[int] = []
        out = []
        remaining = {v: rel for v, rel, _ in rows}
        while remaining and len(chosen) < top:
            best = None
            for v in sorted(remaining):  # ascending id = the tie-break
                maxsim = max((sims[(v, c)] for c in chosen), default=0.0)
                score = MMR_LAM * remaining[v] - MMR_MU * maxsim
                if best is None or score > best[1]:
                    best = (v, score)
            v, score = best
            chosen.append(v)
            del remaining[v]
            out.append((qid, v, math.floor(score * 1e6 + 0.5) / 1e6,
                        len(chosen)))
        return pd.DataFrame(out, columns=["query_id", "vec_id", "mmr_score",
                                          "rank"])

    return (with_vec.groupBy("query_id")
            .applyInPandas(greedy, schema=schema)
            .orderBy("query_id", "rank"))


def mmr_rerank_oracle(pool: int = MMR_POOL, top: int = MMR_TOP) -> str:
    """DuckDB twin with the ``top`` greedy iterations UNROLLED into
    generated CTEs (s1..sN), each picking the per-query argmax of
    LAM*rel - MU*max-sim-to-chosen with a vec_id tie-break."""
    qids = ", ".join(str(qid) for qid, _ in HYBRID_QUERIES)
    dot = ("list_sum(list_transform(list_zip(e.embedding, q.query_vec), "
           "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))")
    na = ("sqrt(list_sum(list_transform(e.embedding, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    nb = ("sqrt(list_sum(list_transform(q.query_vec, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    pdot = ("list_sum(list_transform(list_zip(a.embedding, b.embedding), "
            "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))")
    pna = ("sqrt(list_sum(list_transform(a.embedding, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    pnb = ("sqrt(list_sum(list_transform(b.embedding, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")

    # one CTE per greedy iteration, plus a LINEAR chain of accumulator
    # CTEs (sel_i = sel_{i-1} + s_i) — inlining the growing union into
    # every step would expand O(k^2) and re-open the parquet per copy
    # (observed: DuckDB hit EMFILE at k=10 before MATERIALIZED + chaining)
    steps = []
    for i in range(1, top + 1):
        if i == 1:
            maxsim = "0.0"
            not_in = ""
        else:
            maxsim = (f"coalesce((SELECT max(p.sim) FROM pairs p"
                      f" JOIN sel{i - 1} s ON p.query_id = s.query_id"
                      f" AND p.j = s.vec_id"
                      f" WHERE p.query_id = c.query_id"
                      f" AND p.i = c.vec_id), 0.0)")
            not_in = (f" WHERE c.vec_id NOT IN (SELECT s.vec_id"
                      f" FROM sel{i - 1} s"
                      f" WHERE s.query_id = c.query_id)")
        steps.append(f"""s{i} AS MATERIALIZED (
  SELECT query_id, vec_id, score, {i} AS rank FROM (
    SELECT c.query_id, c.vec_id,
           {MMR_LAM!r} * c.rel - {MMR_MU!r} * {maxsim} AS score,
           row_number() OVER (
             PARTITION BY c.query_id
             ORDER BY {MMR_LAM!r} * c.rel - {MMR_MU!r} * {maxsim} DESC,
                      c.vec_id ASC) AS rn
    FROM cand c{not_in}
  ) WHERE rn = 1
)""")
        if i == 1:
            steps.append("sel1 AS MATERIALIZED "
                         "(SELECT query_id, vec_id FROM s1)")
        elif i < top:
            steps.append(f"sel{i} AS MATERIALIZED (SELECT * FROM sel{i - 1} "
                         f"UNION ALL SELECT query_id, vec_id FROM s{i})")

    all_sel = "\nUNION ALL\n".join(
        f"SELECT query_id, vec_id, score, rank FROM s{i}"
        for i in range(1, top + 1))
    steps_sql = ",\n".join(steps)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec
           FROM embeddings WHERE vec_id IN ({qids})),
scored AS (
  SELECT q.query_id, e.vec_id, {dot} / ({na} * {nb}) AS rel, e.embedding
  FROM embeddings e CROSS JOIN q
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id, rel, embedding FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {pool}
),
pairs AS MATERIALIZED (
  SELECT a.query_id, a.vec_id AS i, b.vec_id AS j,
         {pdot} / ({pna} * {pnb}) AS sim
  FROM cand a JOIN cand b
    ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
),
{steps_sql}
SELECT query_id, vec_id, {r6('score')} AS mmr_score,
       CAST(rank AS INTEGER) AS rank
FROM ({all_sel})
ORDER BY query_id, rank
"""


QUOTA_PER_SOURCE = 2
QUOTA_TOP = 10


def quota_capped_topk(embeddings: DataFrame, documents: DataFrame,
                      per_source_cap: int = QUOTA_PER_SOURCE,
                      top: int = QUOTA_TOP) -> DataFrame:
    """Quota-capped (host-crowding) top-k: at most ``per_source_cap``
    results per document source in each query's top-``top`` — the other
    standard diversification rule next to MMR, and unlike MMR it is a
    pure window composition (rank within (query, source), keep <= cap,
    re-rank globally), so it stays fully declarative: no Python stage,
    hash-checked.

    Scale shape: the cosine pool is the corpus-scale work (broadcast
    probes + one window); the source join hits pool-sized rows via a
    broadcast of the pool; the two quota windows partition by
    (query, source) and query — both pool-sized exchanges."""
    pool = (vector_pool(embeddings)
            .join(F.broadcast(documents.select(
                F.col("doc_id").alias("vec_id"), "source")), "vec_id"))
    w_src = Window.partitionBy("query_id", "source").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc())
    w_all = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (pool
            .withColumn("src_rank", F.row_number().over(w_src))
            .where(F.col("src_rank") <= per_source_cap)
            .withColumn("rank", F.row_number().over(w_all))
            .where(F.col("rank") <= top)
            .select("query_id", F.col("vec_id").alias("doc_id"), "source",
                    round6(F.col("cos_sim")).alias("cos_sim"),
                    F.col("src_rank").cast("int").alias("src_rank"), "rank")
            .orderBy("query_id", "rank"))


def quota_capped_topk_oracle(per_source_cap: int = QUOTA_PER_SOURCE,
                             top: int = QUOTA_TOP) -> str:
    from vectordb_explorations_spark.operators.hybrid import (
        HYBRID_POOL, HYBRID_QUERIES)
    qids = ", ".join(str(qid) for qid, _ in HYBRID_QUERIES)
    dot = ("list_sum(list_transform(list_zip(e.embedding, q.query_vec), "
           "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))")
    na = ("sqrt(list_sum(list_transform(e.embedding, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    nb = ("sqrt(list_sum(list_transform(q.query_vec, "
          "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS query_vec
           FROM embeddings WHERE vec_id IN ({qids})),
vpool AS (
  SELECT query_id, vec_id, cos_sim FROM (
    SELECT q.query_id, e.vec_id, {dot} / ({na} * {nb}) AS cos_sim,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {dot} / ({na} * {nb}) DESC,
                                       e.vec_id ASC) AS rn
    FROM embeddings e CROSS JOIN q
  ) WHERE rn <= {HYBRID_POOL}
),
joined AS (
  SELECT p.query_id, p.vec_id, p.cos_sim, d.source
  FROM vpool p JOIN documents d ON p.vec_id = d.doc_id
),
capped AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id, source
                                    ORDER BY cos_sim DESC, vec_id ASC)
                 AS INTEGER) AS src_rank
  FROM joined
  QUALIFY src_rank <= {per_source_cap}
)
SELECT query_id, vec_id AS doc_id, source,
       {r6('cos_sim')} AS cos_sim, src_rank,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER)
         AS rank
FROM capped
QUALIFY rank <= {top}
ORDER BY query_id, rank
"""
