"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

Each headline query is executed once on a warm session (the driver
compares wall-clock against BASELINE.md at the same scale factor); the
24-query round-1 comparison subset gets ``--repeat`` observations
(default 3) and reports per-query MEDIANS + spread — sub-second queries
showed +-30% single-shot swings inside the measured control spread.
Timing counts full execution to a driver-side collect of the (small)
result.

Two additions beyond raw per-query times:

- **Control query** (machine-drift attribution): a fixed full-scan
  aggregate over lineitem whose code never changes across rounds, timed
  immediately after warmup AND after the headline loop.  Round-over-round
  per-query ratios should be read as ``(q_rN / q_rM) / (control_rN /
  control_rM)`` — the round-3 verdict found a uniform ~1.6x slowdown on
  unchanged queries that could not be attributed without this row.
- **sf1 scale-headroom section**: the scale-path operators re-run on a
  10x deterministic scale-up of documents/embeddings/events (generated
  once into .scale_cache/, embeddings perturbed per-replica so
  similarity structure doesn't degenerate into exact copies).  A
  scale-safe plan should grow roughly linearly (growth ~ 10x or less
  after fixed overhead); a quadratic plan would show ~100x.  Skip with
  SPARK_GRAFT_SKIP_SF1=1.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: the headline set: one per operator family, weighted toward the
#: scale-sensitive ones (joins, fusion, dedup)
HEADLINE = [
    "q1_pricing_summary",
    "q3_topk_revenue",
    "q5_nation_revenue",
    "q_window_topk_per_group",
    "q_events_hourly",
    "q_events_sessions",
    "v_search_topk",
    "v_recommend_topk",
    "v_colbert_topk",
    "v_sparse_topk",
    "v_fusion_hybrid",
    "v_geo_decay_topk",
    "v_lateral_batch_search",
    "match_text_topk",
    "match_text_tfidf",
    "text_vocabulary",
    "q14_promo_revenue",
    "q_event_percentiles",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_mllib",
    "v_search_brp_mllib",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "ann_knn_graph_blocked",
    "v_search_scalar_quant",
    "v_search_binary_quant",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "text_quality",
    "doc_fingerprints",
    "pipeline_hash_split",
    "text_decontaminate",
    "text_repetition",
    "pipeline_pack_sequences",
    "q_asof_purchase_click",
    "v_sparse_batch_inverted",
    "text_clean",
    "text_chunking",
    "pipeline_token_budget",
    "match_text_bm25",
    "text_decontaminate_bloom",
    # round 4
    "dedup_minhash_capped",
    "dedup_simhash_capped",
    "q_salted_join",
    "q_json_length_keys",
    "embed_jl_project",
    # round 5
    "text_decontaminate_semantic",
    "dedup_keep_best",
    "dedup_substring",
    "dedup_semantic",
    "pipeline_global_shuffle",
    "text_perplexity",
    "q_events_funnel",
    "graph_pagerank",
    "v_search_mmr",
    "text_source_profile",
    "pipeline_mix_temperature",
    "q_value_histogram",
    "graph_trustrank",
    "q_events_cohorts",
    # round 6
    "text_bpe_vocab",
    "multimodal_phash_dups",
    "multimodal_audio_dups",
    "multimodal_video_dups",
    "q_approx_percentile",
    # round 7
    "text_unigram_vocab",
    "multimodal_cross_dups",
    # round 8-9: tokenizer apply family + classifiers
    "text_bpe_encode",
    "text_unigram_encode",
    "pipeline_pack_bpe",
    "text_dsir_select",
    "text_lang_id_ngram",
    "text_unigram_vocab_mb",
    # round 9: sketch + layout families
    "sketch_cms_heavy_hitters",
    "sketch_cms_error",
    "skew_hot_keys",
    "sketch_join_size",
    "layout_zvalue",
    "layout_zorder_prune",
    "pipeline_weighted_sample",
    # round 9 session 3: KMV + histogram sketches, Hilbert, resample
    "sketch_kmv_distinct",
    "sketch_kmv_jaccard",
    "sketch_kmv_groups",
    "sketch_hist_quantiles",
    "layout_hilbert_value",
    "layout_hilbert_prune",
    "q_events_resample",
    "q_events_rolling",
    "pipeline_profile",
    "text_pmi_phrases",
    "q10_returned_items",
    "sketch_drift_report",
    "cdc_latest_state",
    "cdc_scd2_history",
    "cdc_table_diff",
    "q_bloom_semi_join",
    "pipeline_validate",
    "dedup_minhash_incremental",
    "dedup_sorted_neighborhood",
    "q_events_anomalies",
    "dedup_fuzzy_pairs",
    "dedup_fuzzy_incremental",
    "dedup_jaccard_prefix",
    "dedup_containment",
    "pipeline_fd_audit",
    "pipeline_k_anonymity",
    "layout_compaction_plan",
    "v_search_matryoshka",
    "pipeline_quantile_normalize",
    "pipeline_source_cap",
    # round 10
    "cdc_apply_changes",
    "dedup_paragraphs_global",
    "dedup_paragraphs_incremental",
    "text_quality_classifier",
    "text_classifier_pr",
    "cdc_scd2_apply_changes",
    "ann_hard_negatives",
    "source_formats_roundtrip",
    # round 11
    "v_search_udtf",
    "v_centroid_udaf",
    "graph_hits",
    # round 13
    "dedup_embedding_brp",
    "text_quality_pipeline_ml",
    "pipeline_group_split",
    "dedup_source_overlap",
    "q_range_bucket_join",
]

#: streaming gates: timed and reported under their own total, NOT in
#: headline_queries_total — each run's cost is dominated by fixture
#: re-layout writes + micro-batch orchestration (76s of r8's 207s came
#: from the two LSH ingest gates alone), which drowned the kernel
#: signal the headline total exists to track (round-7 verdict task #4)
STREAMING = [
    "streaming_hourly_counts",
    "streaming_dedup_survivors",
    "streaming_funnel_conversion",
    "streaming_topk_values",
    "streaming_sessions",
    "streaming_near_dup_ingest",
    "streaming_semantic_ingest",
    "streaming_heavy_hitters",
    "streaming_hist_quantiles",
    "streaming_interval_join",
    "streaming_paragraph_ingest",
    "streaming_cdc_apply",
    "streaming_dedup_bounded",
]

#: context labels recorded with the bench so a row's cost isn't misread:
#: "parity-form" = kept deliberately as the literal corpus SQL proof (the
#: production path is the window rewrite, benched as other rows);
#: "oracle-tier" = exact all-pairs kept as the verify/oracle tier (the
#: production path at scale is the LSH-bucketed sibling row).
TAGS = {
    "v_lateral_batch_search": "parity-form (production path = v_batch_search window rewrite)",
    "dedup_embedding": "oracle-tier exact grid (production path = dedup_embedding_lsh)",
    "text_decontaminate_bloom": (
        "scale-path form (fixed 128KB broadcast; wins when the eval set "
        "outgrows the exact path's per-shingle broadcast)"
    ),
    "dedup_minhash_capped": (
        "skew-guard form on the scale-relative boilerplate fixture "
        "(+2x n_docs copies; 10k extra docs at sf0.1)"
    ),
    "dedup_simhash_capped": (
        "skew-guard form on the scale-relative boilerplate fixture "
        "(+2x n_docs copies; 10k extra docs at sf0.1)"
    ),
    "dedup_keep_best": (
        "composition gate (MinHash pairs -> connected components -> "
        "quality argmax); cost is the full dedup pipeline, not one op"
    ),
    "streaming_hourly_counts": (
        "streaming gate: cost includes a full readStream->availableNow "
        "micro-batch run plus sink presentation, not a batch plan"
    ),
    "streaming_dedup_survivors": (
        "streaming gate: includes a 2-file re-layout write + 2 "
        "micro-batches of cross-batch dedup state"
    ),
    "streaming_funnel_conversion": (
        "streaming gate: full applyInPandasWithState funnel run"
    ),
    "streaming_topk_values": (
        "streaming gate: 2-file re-layout + 2 stateful micro-batches"
    ),
    "streaming_sessions": "streaming gate: session_window complete-mode run",
    "streaming_hist_quantiles": (
        "streaming gate: 2-file re-layout + complete-mode histogram "
        "aggregation run, then the batch quantile walk on the drained sketch"
    ),
    "text_bpe_vocab": (
        "driver-loop op: 12 sequential merge jobs over the word table "
        "(inherent to BPE; each job is one groupBy + argmax + map)"
    ),
    "text_unigram_vocab": (
        "driver-loop op: seed pass + 3 EM iterations (one Arrow "
        "Viterbi map + one groupBy each) plus the gate's two "
        "precondition aggs"
    ),
    "multimodal_cross_dups": (
        "composition gate: synthesizes and encodes 256 docs x 3 "
        "codecs, then runs all three fingerprint dedups + flag joins"
    ),
    "streaming_near_dup_ingest": (
        "streaming ingest gate: 2-file staggered re-layout write + 2 "
        "foreachBatch micro-batches of MinHash store-join filtering"
    ),
    "streaming_semantic_ingest": (
        "streaming ingest gate: 2-file staggered re-layout write + 2 "
        "foreachBatch micro-batches of hyperplane-LSH store filtering"
    ),
    "streaming_heavy_hitters": (
        "streaming gate: 2-file re-layout + complete-mode cms_build "
        "run (sketch mergeability proof) ahead of the batch estimate"
    ),
    "multimodal_phash_dups": (
        "includes fixture synthesis (PNG encode of 4096 images) ahead "
        "of the decode+hash+join path under test"
    ),
    "multimodal_audio_dups": (
        "includes fixture synthesis (WAV encode of 512 clips) ahead of "
        "the parse+hash+join path under test"
    ),
    "multimodal_video_dups": (
        "includes fixture synthesis (Y4M encode of 256 clips) ahead of "
        "the demux+hash+join path under test"
    ),
    "text_quality_pipeline_ml": (
        "interop gate: cost includes a PipelineModel save/load "
        "round-trip to disk inside the gate, not just the classify plan"
    ),
    "pipeline_group_split": (
        "composition gate (jaccard pairs -> connected components -> "
        "keyed split); cost is the full leakage-safe chain, not one op"
    ),
    "streaming_dedup_bounded": (
        "streaming gate: 2-file re-layout + 2 micro-batches through the "
        "dropDuplicatesWithinWatermark state store"
    ),
}

#: the round-1 comparison subset: the 24 queries BASELINE.md's
#: apples-to-apples total tracks; timed twice per run (A/B), min wins
R1_SUBSET = [
    "q1_pricing_summary", "q3_topk_revenue", "q5_nation_revenue",
    "q_window_topk_per_group", "q_events_hourly", "q_events_sessions",
    "v_search_topk", "v_recommend_topk", "v_colbert_topk",
    "v_sparse_topk", "v_fusion_hybrid", "v_geo_decay_topk",
    "v_lateral_batch_search", "match_text_topk", "match_text_tfidf",
    "text_vocabulary", "q14_promo_revenue", "q_event_percentiles",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_embedding",
    "text_quality", "doc_fingerprints",
]

#: operators whose 100 TB story rests on a bucketed / single-shuffle /
#: broadcast plan — these re-run at the 10x scale-up to measure growth
SCALE_PATH = [
    "dedup_embedding_lsh",
    "ann_knn_graph_blocked",
    "q_asof_purchase_click",
    "pipeline_pack_sequences",
    "v_sparse_batch_inverted",
    "text_decontaminate_bloom",
    "text_perplexity",
    "text_lang_id_ngram",
    # round 10 s2: verbatim replicas multiply every unit hash's occurrence
    # count ×replicas — exactly the boilerplate-skew stress the
    # map-side-combining min(struct) groupBy exists for
    "dedup_paragraphs_global",
    "text_quality_classifier",
    # round 13 (r12 verdict task 4): the expensive-tail growth rows —
    # dedup_simhash was the costliest headline dedup gate with no growth
    # evidence; dedup_keep_best measures the post-memo path (it pays the
    # sf1 signature-memo build, so its growth row INCLUDES the build —
    # the honest number); graph_pagerank likewise pays the sf1 kNN-memo
    # build it shares with the other graph gates
    "dedup_simhash",
    "dedup_keep_best",
    "graph_pagerank",
]

_SCALE_REPLICAS = 10
_SCALE_TABLES = ("documents", "embeddings", "events")


def _control(spark, sf_dir: str) -> float:
    """Fixed-cost full-scan aggregate; the machine-drift yardstick.

    NEVER change this query: its only value is being identical across
    rounds.  (lineitem full scan, three aggregates, one collect.)
    """
    from pyspark.sql import functions as F

    t0 = time.time()
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").alias("s"),
            F.avg("l_quantity").alias("a"),
        )
        .collect()
    )
    return round(time.time() - t0, 3)


def _ensure_sf1(
    spark, base_dir: str, replicas: int = _SCALE_REPLICAS
) -> tuple[str, float]:
    """Deterministic ``replicas``× scale-up of the scale-path input
    tables (default 10× for the per-round bench; scripts/scale_probe.py
    passes 100), written once to ``.scale_cache/<base>_x{replicas}v2/``
    next to this file.  Ids shift per replica; embeddings get a small
    deterministic per-replica perturbation so the scaled similarity
    structure stays non-degenerate (exact copies of every vector would
    turn near-dup output quadratic in replicas and measure the data, not
    the operator)."""
    from pyspark.sql import functions as F

    # v2: perturbed embedding elements cast back to the SOURCE element
    # type — float+double arithmetic silently widened the array to
    # list<double>, so the r4 "sf1" embeddings scanned ~2x bytes/vector
    # and growth conflated data volume with a type change
    # v3: adds documents_salted.parquet (per-replica token salting) for
    # the span-dedup probe — verbatim text replicas make span-dup OUTPUT
    # grow ~quadratically by construction, so its growth factor measured
    # the fixture, not the operator
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scale_cache",
        f"{os.path.basename(os.path.normpath(base_dir))}_x{replicas}v3",
    )
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir, 0.0
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    rep = spark.range(replicas).withColumnRenamed("id", "_rep")

    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_rep") * F.lit(1_000_000)).alias("doc_id"),
            *[c for c in docs.columns if c != "doc_id"],
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )

    # salted twin for span-level dedup probes: every token of replica
    # r > 0 gets an "_r<r>" suffix, so within-replica span structure is
    # IDENTICAL to base (the suffix is constant inside a replica) while
    # cross-replica spans never match — duplicate RATE stays constant and
    # output grows exactly linearly in replicas
    salted_text = F.when(F.col("_rep") == 0, F.col("text")).otherwise(
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1_r"), F.col("_rep").cast("string")),
        )
    )
    (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("_rep") * F.lit(1_000_000)).alias("doc_id"),
            salted_text.alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents_salted.parquet"))
    )

    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    other = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    elem_type = emb.schema["embedding"].dataType.elementType.simpleString()
    perturbed = F.transform(
        "embedding",
        lambda x, i: (
            x
            + (
                (F.pmod(F.col("vec_id") * 31 + i * 7 + F.col("_rep") * 13, F.lit(97)) - 48)
                / F.lit(9700.0)
            )
            * F.col("_rep").cast("double")
        ).cast(elem_type),
    )
    (
        emb.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("_rep") * F.lit(1_000_000)).alias("vec_id"),
            perturbed.alias("embedding"),
            *other,
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )

    ev = spark.read.parquet(os.path.join(base_dir, "events.parquet"))
    (
        ev.crossJoin(rep)
        .select(
            (F.col("event_id") + F.col("_rep") * F.lit(100_000_000)).alias("event_id"),
            (F.col("user_id") + F.col("_rep") * F.lit(1_000_000)).alias("user_id"),
            *[c for c in ev.columns if c not in ("event_id", "user_id")],
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "events.parquet"))
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return out_dir, round(time.time() - t0, 3)


def _parse_repeat(argv: list[str]) -> int:
    """Validate --repeat N up front — a bare trailing flag or a
    non-numeric value must fail with a usage message BEFORE any warm-up
    or timed work, not as an IndexError/ValueError an hour in."""
    if "--repeat" not in argv:
        return 3
    i = argv.index("--repeat")
    # plain-digit check: '-5' must be rejected with the usage message,
    # not silently clamped to 1 (the promised contract is N >= 1)
    if i + 1 >= len(argv) or not argv[i + 1].isdigit() or int(argv[i + 1]) < 1:
        sys.exit("usage: bench.py [--repeat N]  (N = positive integer)")
    return int(argv[i + 1])


def main() -> None:
    repeat = _parse_repeat(sys.argv)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from qdrant_datafusion_spark.entry_queries import QUERIES
    from qdrant_datafusion_spark.session import get_spark

    spark = get_spark(app_name="qdrant-datafusion-spark-bench")
    # warm the JVM + parquet footers with a trivial action, then the
    # control query itself a few times untimed (ONE warm run left the
    # next timed run ~1.7x slower than end-of-run — C2 JIT tiering needs
    # several iterations, and an inflated control_first trips the
    # spread>1.5 refusal and loses the normalized ratio, round-10), then
    # take the min of three timed runs — the same least-loaded-observation
    # rule the normalizer itself applies.  (Round 12: 3 warmups + min-of-2
    # still measured control_first ~1.5x control_last on this machine —
    # C2 keeps improving through the run — so the warmup is 6 and the min
    # is over 3; this only makes the control LESS favorable to us, since
    # a slow control_first inflates the normalized baseline.)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for _ in range(6):
        _control(spark, sf_dir)

    control_first = min(
        _control(spark, sf_dir), _control(spark, sf_dir), _control(spark, sf_dir)
    )

    def _run(name: str) -> tuple[float, int]:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count() if df.isStreaming is False else -1
        return round(time.time() - t0, 3), n

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        timings[name], rows[name] = _run(name)
        print(
            f"# {name}: {timings[name]:.2f}s ({rows[name]} rows)",
            file=sys.stderr,
        )

    # repeated timed passes over the round-1 comparison subset: the
    # headline pass is observation 1; --repeat N (default 3) adds N-1
    # more.  r9->r10 showed +-30% single-observation swings on
    # sub-second queries with control spread 1.138, so the primary
    # subset number is now the per-query MEDIAN (robust to one loaded
    # observation) with the per-query max/min spread reported alongside;
    # the min is kept for continuity with r<=10 recordings (round-10
    # verdict task #4).  The full headline set stays single-shot to
    # bound wall time.
    r1_obs: dict[str, list[float]] = {q: [timings[q]] for q in R1_SUBSET}
    for _ in range(repeat - 1):
        for name in R1_SUBSET:
            t, _n = _run(name)
            r1_obs[name].append(t)
    print(
        "# r1 subset obs: "
        + " ".join(
            "{}={}".format(q, "/".join(f"{t:.2f}" for t in r1_obs[q]))
            for q in R1_SUBSET
        ),
        file=sys.stderr,
    )

    streaming_timings: dict[str, float] = {}
    streaming_rows: dict[str, int] = {}
    for name in STREAMING:
        streaming_timings[name], streaming_rows[name] = _run(name)
        print(
            f"# [streaming] {name}: {streaming_timings[name]:.2f}s",
            file=sys.stderr,
        )

    control_last = _control(spark, sf_dir)
    print(
        f"# control: first={control_first:.2f}s last={control_last:.2f}s",
        file=sys.stderr,
    )

    total = round(sum(timings.values()), 3)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    r1_med = {q: round(_median(obs), 3) for q, obs in r1_obs.items()}
    r1_min = {q: min(obs) for q, obs in r1_obs.items()}
    r1_spread = {
        q: round(max(obs) / max(min(obs), 1e-9), 2)
        for q, obs in r1_obs.items()
    }
    # the primary subset number: sum of per-query medians
    r1_subset_sec = round(sum(r1_med.values()), 3)
    r1_subset_min_sec = round(sum(r1_min.values()), 3)
    # Drift normalization: every round has re-litigated machine drift
    # (r3 1.64x -> false alarm; r5 1.12x raw vs ~1.01x clean).  Scale the
    # subset total by (reference control / this run's control) so the
    # baseline comparison is ONE number.  The reference control is the
    # cleanest recorded run of the never-changing _control query on this
    # hardware (30.2s subset at control 0.317, round-5 BENCH_DETAIL
    # history); r1 itself predates the control query, so its 29.959s
    # recording is compared via that anchor.
    r1_control_ref = 0.317
    r1_subset_baseline = 29.959
    # Round-6 verdict: normalizing by control_first ALONE over-corrected by
    # ~4.5x when the machine was loaded only at run start (0.912 vs 0.201).
    # Use min(first, last) — the least-loaded observation bounds true
    # machine speed from below, so the correction can only shrink toward
    # 1.0, never flatter the run — and REFUSE to normalize at all when the
    # control pair spreads >1.5x (the run is too noisy for one number).
    control_min = min(control_first, control_last)
    control_spread = round(
        max(control_first, control_last) / max(control_min, 1e-9), 3
    )
    if control_spread <= 1.5:
        norm = round(r1_subset_sec * (r1_control_ref / control_min), 3)
        ratio_norm = round(norm / r1_subset_baseline, 3)
        # continuity number: min-of-N vs the single-shot baseline — the
        # r<=10 definition (median-of-3 vs a 1-observation baseline is
        # biased against this repo; min is biased for it; report both)
        ratio_norm_min = round(
            r1_subset_min_sec
            * (r1_control_ref / control_min)
            / r1_subset_baseline,
            3,
        )
        ratio_bounds = None
    else:
        norm = None
        ratio_norm = None
        ratio_norm_min = None
        # the pair disagrees too much for ONE number (measured round-10:
        # the spread is systematic JVM maturation — a fresh session
        # plateaus ~1.5x above the end-of-run control — not load), but
        # the two controls still BRACKET true machine speed, so report
        # the honest normalized-ratio interval instead of nothing
        ratio_bounds = [
            round(
                r1_subset_sec
                * (r1_control_ref / c)
                / r1_subset_baseline,
                3,
            )
            for c in (max(control_first, control_last), control_min)
        ]
        # say WHY the point estimate is missing, loudly, so a run that
        # loses normalization (round-12 driver run: spread 1.603) is
        # self-explaining in the captured stderr.  Expected envelope on a
        # quiet machine after the 6-untimed + min-of-3 control warmup:
        # ~1.0-1.2; a busy/cold machine reads up to ~1.6 (JIT maturation
        # + load).  The refusal is by design — it is NOT a benchmark
        # failure; read r1_ratio_bounds as [worst-case, best-case].
        print(
            "# NORMALIZATION WITHHELD: control spread "
            f"{control_spread} > 1.5 (first={control_first:.3f}s, "
            f"last={control_last:.3f}s) — machine too noisy for a point "
            "estimate; r1_ratio_normalized=null BY DESIGN. Honest bounds "
            f"r1_ratio_bounds={ratio_bounds} (normalized by the slower / "
            "faster control respectively; truth is inside). Raw ratio "
            f"{round(r1_subset_sec / r1_subset_baseline, 3)} is "
            "unnormalized. Re-run on a quiet machine for the point "
            "estimate (expected spread envelope ~1.0-1.2 quiet, up to "
            "~1.6 cold/loaded).",
            file=sys.stderr,
        )
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "tags": TAGS,
        "control_first_sec": control_first,
        "control_last_sec": control_last,
        "control_spread": control_spread,
        "r1_subset_sec": r1_subset_sec,
        "r1_subset_min_sec": r1_subset_min_sec,
        "r1_subset_repeat": repeat,
        "r1_subset_n": len(r1_med),
        "r1_subset_raw_ratio": round(r1_subset_sec / r1_subset_baseline, 3),
        "r1_subset_normalized_sec": norm,
        "r1_ratio_normalized": ratio_norm,
        "r1_ratio_normalized_min": ratio_norm_min,
        "r1_ratio_bounds": ratio_bounds,
        "r1_subset_obs": {q: r1_obs[q] for q in sorted(r1_obs)},
        "r1_subset_spread": {q: r1_spread[q] for q in sorted(r1_spread)},
        "streaming": {
            "total_sec": round(sum(streaming_timings.values()), 3),
            "queries": streaming_timings,
            "rows": streaming_rows,
        },
        "sf": sf,
    }

    if not os.environ.get("SPARK_GRAFT_SKIP_SF1"):
        try:
            sf1_dir, gen_sec = _ensure_sf1(spark, sf_dir)
            sf1_timings: dict[str, float] = {}
            sf1_rows: dict[str, int] = {}
            for name in SCALE_PATH:
                fn = QUERIES[name]
                t0 = time.time()
                n = fn(spark, sf1_dir).count()
                sf1_timings[name] = round(time.time() - t0, 3)
                sf1_rows[name] = n
                print(
                    f"# sf1x {name}: {sf1_timings[name]:.2f}s ({n} rows)",
                    file=sys.stderr,
                )
            detail["sf1"] = {
                "data_growth": _SCALE_REPLICAS,
                "gen_sec": gen_sec,
                "queries": sf1_timings,
                "rows": sf1_rows,
                # wall-clock growth vs the same query at sf0.1 this run —
                # linear-or-better plans sit at ~data_growth or below
                # (fixed overhead amortizes); quadratic would be ~100x
                "growth": {
                    q: round(sf1_timings[q] / timings[q], 2)
                    for q in SCALE_PATH
                    if timings.get(q)
                },
                # OUTPUT growth — near-dup queries on the replica fixture
                # legitimately emit superlinear pair counts (10 perturbed
                # replicas of one base vector are all mutually near), so a
                # runtime growth above data_growth but at-or-below output
                # growth is the operator tracking its output, not a
                # quadratic plan
                "output_growth": {
                    q: round(sf1_rows[q] / rows[q], 2)
                    for q in SCALE_PATH
                    if rows.get(q)
                },
                "lsh_occupancy": _lsh_occupancy_probe(spark, sf_dir, sf1_dir),
            }
        except Exception as e:  # the scale section must never sink the bench
            detail["sf1"] = {"error": str(e)[:300]}

    # full per-query detail: stderr + a file next to this script (the
    # driver's stdout tail capture is ~2000 chars; r4's single fat line
    # outgrew it and the round recorded "parsed: null")
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"# detail -> {detail_path}", file=sys.stderr)

    # ONE compact machine-parseable stdout line, well under the capture
    # window: totals + the r1-subset per-query map (the apples-to-apples
    # baseline comparison set) + control pair + sf1 growth
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {q: r1_med[q] for q in sorted(r1_med)},
        "sf": sf,
        "n_queries": len(timings),
        "streaming_total_sec": detail["streaming"]["total_sec"],
        "r1_subset_sec": detail["r1_subset_sec"],
        "r1_subset_min_sec": detail["r1_subset_min_sec"],
        "r1_subset_repeat": repeat,
        "r1_subset_n": len(r1_med),
        "r1_subset_normalized_sec": detail["r1_subset_normalized_sec"],
        "r1_ratio_normalized": detail["r1_ratio_normalized"],
        "r1_ratio_normalized_min": detail["r1_ratio_normalized_min"],
        "r1_ratio_bounds": detail["r1_ratio_bounds"],
        "control_first_sec": control_first,
        "control_last_sec": control_last,
        "detail_file": "BENCH_DETAIL.json",
    }
    sf1 = detail.get("sf1", {})
    if "growth" in sf1:
        compact["sf1_growth"] = sf1["growth"]
        compact["sf1_output_growth"] = sf1["output_growth"]
    elif "error" in sf1:
        compact["sf1_error"] = sf1["error"][:80]
    # belt-and-braces: never outgrow the ~2000-char capture window — but
    # NEVER by dropping "queries" entries (the driver contract: entries may
    # be added, never removed).  Shed the optional sf1 maps instead; the
    # full copies always live in BENCH_DETAIL.json.  (Round 13: the three
    # added sf1 growth rows pushed the line over 1900 and the old fallback
    # emptied "queries" — a contract violation, fixed here.)
    line = json.dumps(compact)
    if len(line) > 1900:
        compact.pop("sf1_output_growth", None)
        line = json.dumps(compact)
    if len(line) > 1900:
        compact.pop("sf1_growth", None)
        compact["sf1_detail"] = "see BENCH_DETAIL.json"
        line = json.dumps(compact)
    print(line)


def _lsh_occupancy_probe(spark, base_dir: str, sf1_dir: str) -> dict:
    """Bucket-occupancy evidence for the dedup_embedding_lsh growth
    factor: per-bucket candidate pair mass Σ c·(c−1)/2 at sf0.1 vs the
    10x fixture, fixed 16×4 planes vs corpus-scaled.  The r4 open
    question — 11.08x runtime at 10x data — decomposes into occupancy
    (per-table buckets hold ~N/16, so pair mass grows ~x²) plus output
    growth; scaling planes with N (p ≈ log2(N/target)) restores linear
    occupancy, shown by the p-scaled row.  Since round 10 the gates
    DEFAULT to the corpus-scaled pool slice (entry_queries.
    _emb_lsh_planes_for), so the fixed row here is the counterfactual
    and the scaled row is what ships."""
    from pyspark.sql import functions as F

    from qdrant_datafusion_spark.entry_queries import EMB_LSH_P, EMB_LSH_TABLES
    from qdrant_datafusion_spark.operators.dedup import (
        _make_lsh_bucket_udf,
        auto_bucket_planes,
    )

    def probe(dir_, planes, tables):
        emb = (
            spark.read.parquet(os.path.join(dir_, "embeddings.parquet"))
            .filter(F.col("embedding").isNotNull())
        )
        udf = _make_lsh_bucket_udf(planes, tables)
        r = (
            emb.select(F.explode(udf(F.col("embedding"))).alias("_b"))
            .groupBy("_b")
            .count()
            .agg(
                F.count("*").alias("n_buckets"),
                F.max("count").alias("max_occ"),
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pair_mass"),
            )
            .collect()[0]
        )
        return {
            "n_buckets": int(r["n_buckets"]),
            "max_occ": int(r["max_occ"]),
            "pair_mass": int(r["pair_mass"]),
        }

    # the gate's fixed planes (p=4, seed 200 — auto_bucket_planes
    # reproduces EMB_LSH_PLANES bit-for-bit at p=4) vs the corpus-scaled
    # p from the production helper: constant occupancy target, so
    # per-task GEMM cost stays flat while the fixed config grows ~x²
    fixed, _ = auto_bucket_planes(1, 64, tables=EMB_LSH_TABLES, min_planes=EMB_LSH_P)
    n_sf1 = (
        spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet")).count()
    )
    scaled, p_scaled = auto_bucket_planes(n_sf1, 64, tables=EMB_LSH_TABLES)
    return {
        "planes_fixed": f"{EMB_LSH_TABLES}x{EMB_LSH_P}",
        "planes_scaled": f"{EMB_LSH_TABLES}x{p_scaled}",
        "sf_base_fixed": probe(base_dir, fixed, EMB_LSH_TABLES),
        "sf1_fixed": probe(sf1_dir, fixed, EMB_LSH_TABLES),
        "sf1_scaled": probe(sf1_dir, scaled, EMB_LSH_TABLES),
    }


if __name__ == "__main__":
    main()
