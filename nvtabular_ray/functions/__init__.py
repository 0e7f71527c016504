"""Corpus/data-pipeline function library (dataset-in, dataset-out) plus the
vectorized helper kernels they share: stable hashing, distributed
quantiles, streaming/bucketed aggregation, sketches.

Heavy deps import lazily inside each module — importing this package pulls
in nothing beyond numpy/pyarrow.
"""

from nvtabular_ray.functions.ann import brute_force_topk, ivf_topk, lsh_topk
from nvtabular_ray.functions.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_dedup,
    semantic_dedup,
    simhash_dedup,
)
from nvtabular_ray.functions.hashing import hash64, hash64_columns, md5_60
from nvtabular_ray.functions.packing import pack_sequences
from nvtabular_ray.functions.sampling import corpus_mix, hash_sample, hash_split
from nvtabular_ray.functions.text import (
    chunk_documents,
    detect_language,
    fingerprint,
    pii_redact,
    quality_score,
    repetition_ratio,
    text_clean,
    text_stats,
    token_count,
)

__all__ = [
    "brute_force_topk",
    "chunk_documents",
    "corpus_mix",
    "detect_language",
    "embedding_near_dup",
    "exact_dedup",
    "fingerprint",
    "hash64",
    "hash64_columns",
    "hash_sample",
    "hash_split",
    "ivf_topk",
    "lsh_topk",
    "md5_60",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "pack_sequences",
    "pii_redact",
    "quality_score",
    "repetition_ratio",
    "semantic_dedup",
    "simhash_dedup",
    "text_clean",
    "text_stats",
    "token_count",
]
