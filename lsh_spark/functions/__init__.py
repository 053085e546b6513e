from .lsh import (
    lsh_euclidean,
    lsh_euclidean32,
    lsh_euclidean_bands_long,
    lsh_jaccard,
    lsh_min,
    lsh_min32,
    lsh_min32_shingles,
    lsh_min_bands_long,
    lsh_min_shingles,
)
from .register import register_all

__all__ = [
    "lsh_min", "lsh_min32", "lsh_min_shingles", "lsh_min32_shingles",
    "lsh_jaccard", "lsh_euclidean", "lsh_euclidean32",
    "lsh_min_bands_long", "lsh_euclidean_bands_long", "register_all",
]
