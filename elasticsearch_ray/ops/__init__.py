"""Training-data / corpus ops — convenience re-exports.

Each op lives in its own module (the canonical import path used by the
tests and the driver entries); this package surface exists so a user can
``from elasticsearch_ray.ops import minhash_lsh_dedup`` etc.
"""

from .ann import brute_force_topk, ivf_build, ivf_query_rescore, ivf_topk
from .corpus import bigram_counts, hash_split_counts, source_quota
from .curation import curate, curate_resumable
from .dedup import (
    dup_clusters,
    embedding_cosine_dedup,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    ngram_jaccard,
    simhash_dedup,
    verified_dup_edges,
)
from .datastore_export import (
    export_postgres,
    export_redis,
    post_resp,
    read_postgres_copy,
    read_redis_doclens,
    read_redis_postings,
)
from .events import asof_join, sessionize, window_agg
from .packing import pack_manifest
from .percolate import Percolator, percolate
from .plots import generate_frequency_plots, plot_word_frequencies, plot_zipf
from .textstats import language_id, quality_scores, token_counts

__all__ = [
    "brute_force_topk", "ivf_build", "ivf_query_rescore", "ivf_topk",
    "bigram_counts", "hash_split_counts", "source_quota",
    "curate", "curate_resumable",
    "dup_clusters", "embedding_cosine_dedup", "exact_dedup",
    "lsh_candidate_pairs", "minhash_lsh_dedup", "ngram_jaccard",
    "simhash_dedup", "verified_dup_edges",
    "export_postgres", "export_redis", "post_resp",
    "read_postgres_copy", "read_redis_doclens", "read_redis_postings",
    "generate_frequency_plots", "plot_word_frequencies", "plot_zipf",
    "asof_join", "sessionize", "window_agg",
    "pack_manifest", "Percolator", "percolate",
    "language_id", "quality_scores", "token_counts",
]
