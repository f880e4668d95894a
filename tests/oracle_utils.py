"""Shared Spark↔DuckDB parity harness mirroring the driver's correctness
gate: run a Spark DataFrame and a DuckDB SQL string over the same parquet
fixtures, then compare row count, column names, and order-insensitive values
with floats rounded to 6 dp."""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb

from vectordb_explorations_spark.schemas import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.isoformat()
    if hasattr(v, "__float__") and not isinstance(v, int):  # Decimal
        return round(float(v), 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str, verbose: bool = True):
    """Return (ok, detail). Mirrors the driver: count + schema-names +
    order-insensitive normalized-value multiset."""
    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle_sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        con.close()
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    detail = []
    ok = True
    if sorted(spark_cols) != sorted(duck_cols):
        ok = False
        detail.append(f"columns differ: spark={spark_cols} duck={duck_cols}")
    if len(spark_rows) != len(duck_rows):
        ok = False
        detail.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    if ok:
        # Compare as column-name-sorted, order-insensitive multisets.
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
        s_set = sorted(repr(tuple(_norm(r[i]) for i in s_ix)) for r in spark_rows)
        d_set = sorted(repr(tuple(_norm(r[i]) for i in d_ix)) for r in duck_rows)
        if s_set != d_set:
            ok = False
            diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
            detail.append(f"values differ; first diffs: {diffs}")
    if verbose and not ok:
        print("MISMATCH:", "; ".join(detail))
    return ok, "; ".join(detail)
