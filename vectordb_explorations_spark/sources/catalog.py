"""Parquet-backed table catalog over the fixture directories.

The reference's only data sources are ``rand()`` and hard-coded literals
(hnsw.cc:337-339, 289-291); every real source here is new surface. Reads are
plain ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and partition pruning for free — check ``PushedFilters`` /
``ReadSchema`` in ``.explain("formatted")``.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

from vectordb_explorations_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrames are immutable logical plans, so one per (session, table,
# sf_dir) is safe to hand out repeatedly; re-reading per call paid a
# footer-read + conf round-trips on every query at fixture scale (round-5
# verdict item 6). Weak-keyed so a garbage-collected session drops its
# entries instead of pinning them.
_TABLE_CACHE: WeakKeyDictionary = WeakKeyDictionary()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to Spark Python workers once per session.

    cloudpickle serializes the package's mapInPandas/applyInPandas
    functions BY REFERENCE (module + qualname), so workers must be able to
    import ``vectordb_explorations_spark``. Sessions from our factory
    inherit the repo on PYTHONPATH; a caller-provided vanilla session's
    workers would die with ModuleNotFoundError. addPyFile(zip) makes the
    package importable from the zip on every worker; guarded by a session
    conf so the zip ships once."""
    key = "spark.vectordb_explorations.pyfiles.shipped"
    if spark.conf.get(key, "false") == "true":
        return
    import shutil
    import tempfile

    import vectordb_explorations_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    base = os.path.join(tempfile.gettempdir(),
                        f"vx_pkg_{os.getpid()}")
    zip_path = shutil.make_archive(
        base, "zip", root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set(key, "true")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    per_session = _TABLE_CACHE.setdefault(spark, {})
    cache_key = (name, os.path.abspath(sf_dir))
    cached = per_session.get(cache_key)
    if cached is not None:
        return cached
    ensure_package_on_workers(spark)
    if name == "events":
        # Older fixture generations stored ts as TIMESTAMP(NANOS), which is
        # unreadable without this legacy conf (it makes the column arrive as
        # INT64 nanos). Harmless when the fixture is micros-precision, as the
        # current one is; set defensively so queries() callables also work
        # under a caller-provided vanilla session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name in ("events", "orders", "lineitem"):
        # Declared outputs render dates/epochs in UTC (the oracle's frame
        # of reference); a caller session in another timezone would shift
        # date_format/year results.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
    per_session[cache_key] = df
    return df


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a UTC TIMESTAMP regardless of
    how the fixture stored it. Three shapes exist in the wild:

    - ``bigint``: INT64 nanos (TIMESTAMP(NANOS) fixture read under
      ``nanosAsLong``) — integer-divide to micros. ``div``, not ``/``:
      double division loses ulps at 1e18 nanos and floors to the wrong
      microsecond. The oracle mirrors this floor (epoch_ns(ts) // 1000).
    - ``timestamp_ntz``: micros-precision TIMESTAMP(isAdjustedToUTC=false)
      fixture read natively by Spark 4.x — a plain cast under the UTC
      session zone is lossless (the physical column is already micros, so
      no truncation can occur) and bit-identical to the oracle's instants.
    - ``timestamp``: already the target type; pass through.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts", "")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type.startswith("timestamp_ntz"):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                    names: list[str] | None = None) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view; return name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
