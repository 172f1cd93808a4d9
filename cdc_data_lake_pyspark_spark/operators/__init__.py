"""Large-scale pipeline operators: dedup, similarity search, multimodal."""

from cdc_data_lake_pyspark_spark.operators.dedup_text import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_near_duplicates,
    minhash_near_dup_clusters_cv,
    simhash_signatures,
)
from cdc_data_lake_pyspark_spark.operators.similarity import (
    cosine,
    brute_force_top_k,
    hyperplane_lsh_top_k,
)

__all__ = [
    "exact_dedup",
    "jaccard_similar_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_duplicates",
    "minhash_near_dup_clusters_cv",
    "simhash_signatures",
    "cosine",
    "brute_force_top_k",
    "hyperplane_lsh_top_k",
]
