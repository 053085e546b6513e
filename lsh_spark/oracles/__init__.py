from .duckdb_lsh import (
    dedup_clusters_sql,
    dedup_keep_first_sql,
    doc_fingerprints_sql,
    euclidean_signatures_sql,
    kmv_doc_stats_sql,
    minhash_shingle_signatures_sql,
    minhash_signatures_sql,
    near_dup_pairs_sql,
    similarity_join_ab_sql,
    simhash_pairs_sql,
)

__all__ = [
    "minhash_signatures_sql", "minhash_shingle_signatures_sql",
    "euclidean_signatures_sql", "near_dup_pairs_sql",
    "similarity_join_ab_sql", "dedup_keep_first_sql", "dedup_clusters_sql",
    "kmv_doc_stats_sql", "doc_fingerprints_sql", "simhash_pairs_sql",
]
