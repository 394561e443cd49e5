"""Composed operators over collections.

- ``topk``       — top-k search, batch (multi-query) search, prefetch→rerank
- ``dedup``      — exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
- ``ann``        — brute-force kNN + IVF- and LSH-bucketed approximate paths
- ``multimodal`` — binary-column plumbing for image/audio/video payloads
"""

from qdrant_datafusion_spark.operators.topk import (  # noqa: F401
    batch_search,
    prefetch_rerank,
    top_k,
)
from qdrant_datafusion_spark.operators.dedup import (  # noqa: F401
    dup_clusters,
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_dups,
    ngram_jaccard_dups,
    simhash_dups,
)
from qdrant_datafusion_spark.operators.ann import (  # noqa: F401
    ivf_topk,
    knn_bruteforce,
    knn_join,
    lsh_bucket_topk,
    self_knn_join,
)
