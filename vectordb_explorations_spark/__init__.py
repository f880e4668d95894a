"""PySpark-native analytics engine with the capability surface of
svetly-t/vectordb-explorations (an HNSW vector-index exploration,
/root/reference/hnsw.cc), extended with the LLM-data-pipeline operators a
100 TB training-data pipeline needs: exact/approximate k-NN, dedup
(exact/MinHash-LSH/SimHash/n-gram-Jaccard/embedding-cosine), text analysis,
multimodal binary columns, relational + streaming coverage.

Design stance (Spark-first, not a port):
- Declarative DataFrame/SQL plans; Catalyst does pushdown/pruning/reordering.
- Vector math as native ``zip_with``/``aggregate`` expressions (JVM codegen)
  for the deterministic declared queries; Arrow-batched NumPy (``mapInPandas``)
  block scoring for the large-scale path.
- The reference's stochastic graph search (hnsw.cc:231-274) is an internal
  accelerator validated by recall against the exact path, never by hash.
"""

__version__ = "0.1.0"

from vectordb_explorations_spark.session import get_spark  # noqa: F401
