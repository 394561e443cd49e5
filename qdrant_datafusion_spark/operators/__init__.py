"""Composed operators over collections.

- ``topk``       — top-k search, batch (multi-query) search, prefetch→rerank
- ``dedup``      — exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
- ``fuzzy``      — similarity self-joins: PassJoin edit distance +
                   prefix-filtered exact Jaccard (All-Pairs/PPJoin)
- ``ann``        — brute-force kNN + IVF- and LSH-bucketed approximate paths,
                   MMR diversification, DPR-style hard-negative mining
- ``classify``   — trained quality filters: hashed-BoW NB (+ margin and
                   PR-curve threshold tuning), batch perceptron
- ``cdc``        — changelog folding: latest snapshot, SCD2 history,
                   incremental MERGE into both, snapshot diff
- ``quantize``   — scalar int8 / binary sign-bit / product quantization + searches
- ``multimodal`` — binary-column plumbing for image/audio/video payloads
- ``phash``      — perceptual-hash (dHash) image dedup over binary columns
- ``audio``      — energy-envelope fingerprint dedup over PCM WAV columns
- ``video``      — temporal luma-envelope fingerprint dedup over Y4M columns
- ``tokenizer``  — distributed BPE merge-rule training
- ``pipeline``   — dataset assembly: splits, decontamination, repetition
                   quality, sequence packing
- ``sketch``     — bounded-size sketches: count-min frequencies, KMV
                   distincts + set algebra, equi-width histogram
                   quantiles, exact hot-key skew diagnostics
- ``layout``     — space-filling-curve data layout (Morton AND Hilbert)
                   for multi-dimensional file skipping, with the
                   footer-stats prune model
- ``temporal``   — as-of join (union + keyed carry, no pair join),
                   point-in-interval join, grid resample with linear
                   interpolation
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
    minhash_buckets,
    minhash_incremental_dups,
    minhash_lsh_dups,
    minhash_lsh_dups_mllib,
    sorted_neighborhood_pairs,
    ngram_jaccard_dups,
    paragraph_dedup_global,
    paragraph_dedup_incremental,
    select_canonical,
    simhash_dups,
)
from qdrant_datafusion_spark.operators.classify import (  # noqa: F401
    hashed_bow_counts,
    hashed_bow_features,
    nb_bow_predict,
    nb_bow_score,
    perceptron_predict,
    pr_curve,
    train_nb_bow,
    train_perceptron,
)
from qdrant_datafusion_spark.operators.ann import (  # noqa: F401
    ivf_topk,
    knn_bruteforce,
    knn_join,
    lsh_bucket_topk,
    self_knn_join,
)
from qdrant_datafusion_spark.operators.ann import (  # noqa: F401
    hard_negatives,
    mmr_select,
    self_knn_join_lsh,
    train_ivf_centroids,
)
from qdrant_datafusion_spark.operators.quantize import (  # noqa: F401
    binary_quantize,
    binary_search_topk,
    hamming_distance,
    ivfpq_search_topk,
    pq_encode,
    pq_search_topk,
    scalar_dequantize,
    scalar_quantize,
    train_pq_codebooks,
)
from qdrant_datafusion_spark.operators.multimodal import (  # noqa: F401
    attach_media,
    decode_audio_meta,
    decode_image_features,
    media_stats,
    resize_images,
    sample_video_frames,
)
from qdrant_datafusion_spark.operators.pipeline import (  # noqa: F401
    decontaminate,
    hash_split,
    pack_sequences,
    quantile_normalize,
    repetition_stats,
    source_cap,
    weighted_sample,
)
from qdrant_datafusion_spark.operators.temporal import (  # noqa: F401
    as_of_join,
    interval_join,
    resample_interpolate,
    robust_anomalies,
)
from qdrant_datafusion_spark.operators.joins import (  # noqa: F401
    bloom_semi_join,
    salted_join,
)
from qdrant_datafusion_spark.operators.cdc import (  # noqa: F401
    apply_changes,
    cdc_latest_snapshot,
    scd2_apply_changes,
    scd2_history,
    table_diff,
)
from qdrant_datafusion_spark.operators.validate import (  # noqa: F401
    discover_fds,
    k_anonymity_audit,
    validate_constraints,
)
from qdrant_datafusion_spark.operators.fuzzy import (  # noqa: F401
    containment_pairs,
    edit_distance_pairs,
    set_similarity_pairs,
)
from qdrant_datafusion_spark.operators.audio import (  # noqa: F401
    audio_energy_dups,
    audio_hash_codes,
)
from qdrant_datafusion_spark.operators.phash import (  # noqa: F401
    dhash_codes,
    hamming_code_dups,
    phash_image_dups,
)
from qdrant_datafusion_spark.operators.tokenizer import train_bpe  # noqa: F401
from qdrant_datafusion_spark.operators.video import (  # noqa: F401
    video_hash_codes,
    video_temporal_dups,
)
from qdrant_datafusion_spark.operators.sketch import (  # noqa: F401
    cms_auto_width,
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_join_size,
    hist_build,
    hist_quantiles,
    kmv_build,
    kmv_build_grouped,
    kmv_estimate,
    kmv_estimate_grouped,
    kmv_merge,
    kmv_set_estimates,
    skew_hot_keys,
)
from qdrant_datafusion_spark.operators.layout import (  # noqa: F401
    compaction_plan,
    file_minmax,
    files_touched,
    hilbert_key,
    hilbert_value,
    layout_files,
    z_value,
    zorder_key,
    zorder_layout,
)
