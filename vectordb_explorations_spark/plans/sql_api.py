"""SQL-text surface: fixture tables as views plus the vector functions
registered for SQL, so every capability is reachable from ``spark.sql``.

The reference has no query language at all (hard-coded C++ drivers,
hnsw.cc:326-368); SURVEY §4.3 notes the SQL surface is registration, not a
Catalyst extension — these queries compile to the exact same plans as their
DataFrame twins, so pushdown/broadcast behavior is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from vectordb_explorations_spark.functions.vectors import (
    cosine_similarity, l2_distance, l2_norm)
from vectordb_explorations_spark.sources.catalog import register_tables


_SQL_FUNCTIONS = {
    "l2_dist": """
      CREATE OR REPLACE TEMPORARY FUNCTION l2_dist(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
      RETURNS DOUBLE
      RETURN sqrt(aggregate(zip_with(a, b,
               (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                       * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
    """,
    "l2_norm": """
      CREATE OR REPLACE TEMPORARY FUNCTION l2_norm(a ARRAY<FLOAT>)
      RETURNS DOUBLE
      RETURN sqrt(aggregate(a, CAST(0.0 AS DOUBLE),
             (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
    """,
    "cosine_sim": """
      CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
      RETURNS DOUBLE
      RETURN aggregate(zip_with(a, b,
               (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
             / (l2_norm(a) * l2_norm(b))
    """,
    # the third retrieval metric (r13 metric trio: L2, cosine, IP)
    "ip_sim": """
      CREATE OR REPLACE TEMPORARY FUNCTION ip_sim(a ARRAY<FLOAT>, b ARRAY<FLOAT>)
      RETURNS DOUBLE
      RETURN aggregate(zip_with(a, b,
               (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    """,
}


def register_functions(spark: SparkSession) -> None:
    """Register the vector library as SQL scalar functions (Spark 4 SQL
    UDFs). These inline as native expression trees at plan time — no Python
    UDF, no codegen break (verify: executed plan contains no `Python`)."""
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral volume: revenue shipped between two nations
    per year, written as SQL text. Dim joins broadcast; lineitem aggregates
    after the ship-year projection."""
    register_tables(spark, sf_dir)
    return spark.sql("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS ship_year,
             round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS revenue
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('FRANCE', 'GERMANY')
        AND n2.n_name IN ('FRANCE', 'GERMANY')
        AND n1.n_name <> n2.n_name
      GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
      ORDER BY supp_nation, cust_nation, ship_year
    """)


VOLUME_SHIPPING_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 6) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('FRANCE', 'GERMANY')
  AND n2.n_name IN ('FRANCE', 'GERMANY')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, ship_year
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of cube/rollup (SURVEY
    §2.2): totals by (returnflag, linestatus), by returnflag alone, and the
    grand total, in one Expand pass. SQL-text because the DataFrame API has
    no grouping-sets builder (cube/rollup are its special cases)."""
    register_tables(spark, sf_dir)
    return spark.sql("""
      SELECT l_returnflag, l_linestatus,
             count(*) AS n_items,
             round(sum(l_extendedprice), 2) AS total_price,
             grouping_id() AS gid
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


GROUPING_SETS_REVENUE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS total_price,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def sql_knn(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """The flagship k-NN expressed purely in SQL over the registered views
    and the registered `l2_dist` SQL function — proves the vector library
    composes inside SQL text. Same TakeOrderedAndProject shape as the
    DataFrame twin; the SQL UDF inlines to a native higher-order-function
    tree (no Python), while the DataFrame twin additionally unrolls the
    fixed-dim sum into whole-stage codegen (functions/vectors.squared_l2)
    — generic-dim SQL keeps the fold."""
    register_tables(spark, sf_dir)
    register_functions(spark)
    q = (spark.table("embeddings").orderBy("vec_id").limit(1)
         .select(F.col("embedding").alias("qv")))
    # SQL UDFs may not appear under Sort (UNSUPPORTED_SQL_UDF_USAGE) —
    # project the distance first and order by the column. The query vector
    # joins in as a DataFrame placeholder, not a temp view, so nothing
    # session-global is (re)registered per call (round-1 VERDICT item 9).
    return spark.sql(f"""
      SELECT vec_id, round(d, 6) AS dist
      FROM (SELECT e.vec_id, l2_dist(e.embedding, q.qv) AS d
            FROM embeddings e CROSS JOIN {{knn_query}} q)
      ORDER BY d ASC, vec_id ASC
      LIMIT {k}
    """, knn_query=q)


def register_chunk_ranges_udtf(spark: SparkSession) -> None:
    """Register a real Python UDTF (Spark 4 ``udtf`` API) — the
    table-function extension point itself, distinct from the Arrow
    grouped-map surface (`applyInPandas`) the engine uses on hot paths.

    ``chunk_ranges(n, win, stride)`` emits one row per sliding training
    window over an n-token document — the same window math as
    operators/sampling.doc_chunks, which is the declared, codegen,
    oracle-checked twin. The UDTF form exists to prove the surface: it
    evaluates row-at-a-time in Python and belongs in ad-hoc SQL (lateral
    joins), never in a 100 TB hot path.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk_start int, chunk_len int")
    class ChunkRanges:
        def eval(self, n: int, win: int, stride: int):
            if n is None or n <= 0:
                return
            cid, start = 0, 0
            while True:
                yield cid, start, min(win, n - start)
                if start + win >= n:
                    break
                cid, start = cid + 1, start + stride

    spark.udtf.register("chunk_ranges", ChunkRanges)
