from vectordb_explorations_spark.sources.catalog import load_table, register_tables  # noqa: F401
