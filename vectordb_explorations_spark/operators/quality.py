"""Table-level data-quality audit: per-column row counts, null counts,
exact distinct counts and typed extents — the validation gate every
training-data pipeline runs between ingest and training (schema drift,
null regressions, cardinality explosions, out-of-range values).

Output is one row per audited column with TYPE-SPLIT extents (numeric
extents in DOUBLE columns, text/date extents as strings) — cross-engine
string formatting of doubles differs, so numbers never pass through a
string cast.

Scale shape: ONE scan computing every metric in a single aggregate row
(count/null-count/min/max are trivially combinable; the multiple exact
COUNT(DISTINCT)s expand map-side), then a literal-sized unpivot to rows.
At 100 TB the exact distincts are the one non-combinable cost — swap in
approx_count_distinct (see operators/sketches.py for the gated HLL
pattern) when cardinality, not exactness, is the question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (column, kind) pairs audited by the declared query — kind drives which
# extent columns fill: 'num' -> min_num/max_num, 'txt' -> min_txt/max_txt
ORDERS_AUDIT_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "txt"),
    ("o_orderpriority", "txt"),
    ("o_orderdate", "txt"),   # dates audit as ISO strings (identical in
                              # both engines, unlike float formatting)
)


def table_quality_audit(df: DataFrame,
                        cols: tuple[tuple[str, str], ...] = ORDERS_AUDIT_COLS
                        ) -> DataFrame:
    """One aggregate row -> one audit row per column via a generated
    stack: (col_name, n_rows, n_null, n_distinct, min_num, max_num,
    min_txt, max_txt)."""
    aggs = [F.count("*").alias("_n")]
    for c, kind in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("long").alias(f"_null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_dist_{c}"))
        if kind == "num":
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"_max_{c}"))
    one = df.agg(*aggs)

    rows = []
    for c, kind in cols:
        num_min = F.col(f"_min_{c}") if kind == "num" else F.lit(None).cast("double")
        num_max = F.col(f"_max_{c}") if kind == "num" else F.lit(None).cast("double")
        txt_min = F.col(f"_min_{c}") if kind == "txt" else F.lit(None).cast("string")
        txt_max = F.col(f"_max_{c}") if kind == "txt" else F.lit(None).cast("string")
        rows.append(F.struct(
            F.lit(c).alias("col_name"), F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            num_min.alias("min_num"), num_max.alias("max_num"),
            txt_min.alias("min_txt"), txt_max.alias("max_txt")))
    return (one.select(F.explode(F.array(*rows)).alias("s"))
            .select("s.*").orderBy("col_name"))


def table_quality_audit_oracle(
        table: str = "orders",
        cols: tuple[tuple[str, str], ...] = ORDERS_AUDIT_COLS) -> str:
    parts = []
    for c, kind in cols:
        if kind == "num":
            mn = f"CAST(min({c}) AS DOUBLE)"
            mx = f"CAST(max({c}) AS DOUBLE)"
            tn = tx = "CAST(NULL AS VARCHAR)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            tn = f"CAST(min({c}) AS VARCHAR)"
            tx = f"CAST(max({c}) AS VARCHAR)"
        parts.append(f"""  SELECT '{c}' AS col_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
         {mn} AS min_num, {mx} AS max_num,
         {tn} AS min_txt, {tx} AS max_txt
  FROM {table}""")
    union = "\n  UNION ALL\n".join(parts)
    return f"SELECT * FROM (\n{union}\n) ORDER BY col_name"
