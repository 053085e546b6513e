"""lsh_spark — PySpark-native LSH + training-data analytics engine.

Public API (see README.md for the full tour):

    from lsh_spark import (
        get_spark, register_all,
        lsh_min, lsh_min32, lsh_min_shingles, lsh_min32_shingles,
        lsh_jaccard, lsh_euclidean, lsh_euclidean32,
    )
    from lsh_spark.operators.similarity_join import (
        lsh_similarity_join, lsh_self_dedup_pairs, lsh_dedup_keep_first)
"""

from .functions.lsh import (
    lsh_euclidean,
    lsh_euclidean32,
    lsh_jaccard,
    lsh_min,
    lsh_min32,
    lsh_min32_shingles,
    lsh_min_shingles,
)
from .functions.register import register_all
from .plans.session import get_spark

__all__ = [
    "get_spark",
    "register_all",
    "lsh_min",
    "lsh_min32",
    "lsh_min_shingles",
    "lsh_min32_shingles",
    "lsh_jaccard",
    "lsh_euclidean",
    "lsh_euclidean32",
]

__version__ = "0.1.0"
