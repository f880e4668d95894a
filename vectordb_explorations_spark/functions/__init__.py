from vectordb_explorations_spark.functions.vectors import (  # noqa: F401
    l2_distance,
    squared_l2,
    dot_product,
    l2_norm,
    cosine_similarity,
    compat_distance,
    vector_to_string,
)
