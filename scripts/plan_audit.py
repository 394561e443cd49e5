"""Physical-plan audit over every queries() entry.

Runs each query's .explain("formatted") at a small SF (plans don't change
shape with SF; AQE re-plans at runtime) and reports the scale-relevant
plan features per query:

- scan:         number of parquet scans and whether PushedFilters is non-empty
                on scans under a Filter
- joins:        BroadcastHashJoin / SortMergeJoin / BroadcastNestedLoopJoin /
                CartesianProduct counts
- topk:         TakeOrderedAndProject present (top-k without global sort)
- exchanges:    shuffle-exchange count (lower = fewer wide stages)
- codegen:      WholeStageCodegen span count

Anti-patterns flagged: CartesianProduct anywhere; SortMergeJoin in a query
that joins a dim table small enough to broadcast (heuristic: query name
prefixed q3/q5/q14/v_batch); >0 parquet scans with a Filter above but no
PushedFilters.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]   (writes PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit(plan: str) -> dict:
    # count the "(N) NodeName" detail headers so each physical node counts
    # once (the tree rendering repeats every node name)
    def nodes(name: str) -> int:
        return len(re.findall(rf"\(\d+\) {name}[\s(]", plan))

    return {
        "scans": nodes("Scan parquet"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]+\]", plan)),
        "bhj": nodes("BroadcastHashJoin"),
        "smj": nodes("SortMergeJoin"),
        "bnlj": nodes("BroadcastNestedLoopJoin"),
        "cartesian": nodes("CartesianProduct"),
        "topk": nodes("TakeOrderedAndProject"),
        "shuffles": nodes("Exchange"),
        "broadcasts": nodes("BroadcastExchange"),
    }


#: per-query context so an unusual-looking row isn't misread as a flag
NOTES = {
    "text_perplexity": (
        "0 scans / high shuffle count is the lazy-localCheckpoint "
        "restructure: the corpus scan+explode materializes ONCE as a "
        "LogicalRDD (invisible to this audit's parquet-scan counter) and "
        "the remaining exchanges all run over the shrunken count tables; "
        "its NLJ entries are 1-row scalar broadcasts (vocab size V, "
        "rank total), not data-sized loops"
    ),
    "graph_pagerank": (
        "all-zero row: the returned frame is a Project over the final "
        "iteration's lazy localCheckpoint (LogicalRDD), so the audit "
        "cannot see the per-iteration plans; the per-iteration shape "
        "(one keyed edge join + one groupBy(dst) exchange) is asserted "
        "in test_operators.py::TestPageRank and measured at 100x in "
        "SCALE_PROBE.md (graph_pagerank_autoplanes)"
    ),
    "graph_trustrank": (
        "near-zero row for the same reason as graph_pagerank (final "
        "state is a lazy localCheckpoint); the TopK entry is the gate's "
        "top-50 TakeOrdered over it"
    ),
    "v_search_mmr": (
        "all-zero row: MMR's result IS driver state (k greedy picks), "
        "so the gate returns a LocalRelation; each greedy step's "
        "distributed plan (TakeOrdered argmax over the checkpointed "
        "relevance table) executes during construction — scale "
        "evidence lives in the operator docstring + TestMmrSelect"
    ),
    "q_events_funnel": (
        "3 exchanges = the three per-stage groupBys; the stage joins "
        "sit behind each stage's lazy localCheckpoint"
    ),
    "streaming_hourly_counts": (
        "the gate EXECUTES a real streaming query (readStream -> "
        "windowed agg -> availableNow -> memory sink) during "
        "construction; the audited plan is the batch SELECT over the "
        "already-materialized sink, so scan/shuffle counts describe the "
        "presentation, not the streaming micro-batch plans (those are "
        "exercised by the gate itself and test_streaming.py)"
    ),
    "streaming_dedup_survivors": (
        "same as streaming_hourly_counts: the 4-micro-batch dedup "
        "stream runs during construction; the audit sees the groupBy "
        "over the memory sink"
    ),
    "streaming_funnel_conversion": (
        "same streaming-gate shape; the returned frame is the 3-row "
        "LocalRelation of stage counts (driver state), so the row is "
        "near-zero by design"
    ),
    "streaming_topk_values": (
        "same streaming-gate shape: the 4-micro-batch stateful top-k "
        "runs during construction; the audit sees the dedup + window "
        "presentation over the memory sink"
    ),
    "streaming_sessions": (
        "same streaming-gate shape: the session_window aggregation "
        "runs during construction; the audit sees the per-user groupBy "
        "over the memory sink"
    ),
    "dedup_sorted_neighborhood": (
        "the rank pipeline pins via two lazy localCheckpoints (ranked: "
        "read by the size aggregate AND the offset join; positioned: "
        "read by both bucket-join sides) so the corpus is scanned once "
        "instead of 4x; the audit sees the bucket equi-join over the "
        "LogicalRDD — scan count 0 by design, the full shape is one "
        "range exchange + one pid window + the bucket join"
    ),
    "streaming_interval_join": (
        "same streaming-gate shape: the two-branch watermarked "
        "stream-stream join runs during construction (cross-batch "
        "pairs meet through join state); the audit sees the SELECT "
        "over the appended memory sink"
    ),
    "streaming_paragraph_ingest": (
        "streaming-gate shape: the foreachBatch explode/groupBy/"
        "store-join pipeline runs during construction; the audit sees "
        "the pinned (localCheckpoint) read of the drained out_dir"
    ),
    "streaming_cdc_apply": (
        "streaming-gate shape: the bucketed MERGE runs during "
        "construction; the audit sees the pinned read of the drained "
        "snapshot store"
    ),
    "dedup_paragraphs_global": (
        "0 scans is the lazy-localCheckpoint pin on the unit explode "
        "(one LogicalRDD feeds the firsts aggregate AND the join-back); "
        "the 3 exchanges are groupBy(hash), the co-partitioned "
        "join-back, and the per-doc rejoin"
    ),
    "ann_hard_negatives": (
        "inherits the self_knn_join plan: the single NLJ is the "
        "bounded block-pair crossJoin (nblocks² grouped rows, not "
        "data-sized) feeding the Arrow GEMM candidate stage — same "
        "shape as ann_knn_graph"
    ),
    "source_formats_roundtrip": (
        "the ORC/JSON/CSV write+read round-trips execute during gate "
        "construction; the audit sees the 3-row literal result frame"
    ),
    "streaming_collection_source": (
        "same streaming-gate shape: the custom qdrant_collection "
        "Python DataSource streams the 4-fragment dir during "
        "construction; the audit sees the digest projection over the "
        "memory sink"
    ),
    "text_bpe_vocab": (
        "all-zero row: BPE merges ARE driver state (N argmax-collected "
        "rows -> LocalRelation); each merge's distributed plan (pair "
        "groupBy + TakeOrdered over the checkpointed word table) "
        "executes during construction — scale evidence in "
        "operators/tokenizer.py docstring + TestTrainBpe"
    ),
    "v_random_sample": (
        "property-form gate: the V_RANDOM sample pins via "
        "localCheckpoint (LogicalRDD), the audited plan is the tiny "
        "agg + semi-join over those 25 rows"
    ),
    "text_unigram_vocab": (
        "all-zero row: the learned vocabulary IS driver state "
        "(bounded collect -> LocalRelation); each EM iteration's "
        "distributed plan (Arrow Viterbi map + groupBy re-count over "
        "the checkpointed word table) executes during construction — "
        "scale evidence in operators/tokenizer.py + TestTrainUnigram "
        "+ the text_unigram_probe SCALE_PROBE row"
    ),
    "multimodal_cross_dups": (
        "the mixed media table pins via localCheckpoint (one "
        "synth+encode pass, three fingerprint readers), so the audit "
        "sees the three banded joins + broadcast flag joins over a "
        "LogicalRDD — scan count 0 by design"
    ),
    "streaming_near_dup_ingest": (
        "foreachBatch ingest gate: the 4-micro-batch MinHash filter "
        "runs during construction and survivors pin via eager "
        "localCheckpoint (the temp source dirs are deleted before "
        "return), so the audited plan is a LogicalRDD projection; "
        "per-batch plans are the batch MinHash operator's (audited "
        "under dedup_minhash)"
    ),
    "streaming_semantic_ingest": (
        "same foreachBatch shape as streaming_near_dup_ingest; "
        "per-batch plans are embedding_near_dups' bucket joins "
        "(audited under dedup_embedding_lsh)"
    ),
    "text_bpe_encode": (
        "the merge table is driver state learned during construction "
        "(text_bpe_vocab's collected argmax rows); the audited plan is "
        "the pure-projection encode (merge replay + id map) feeding the "
        "posexplode presentation — zero joins by design"
    ),
    "text_unigram_encode": (
        "vocabulary learned during construction (driver state); the "
        "audited plan is ONE Arrow-batched Viterbi map (ArrowEvalPython) "
        "+ the posexplode presentation"
    ),
    "pipeline_pack_bpe": (
        "train (construction) -> encode projection -> pack_sequences' "
        "single (id, n_tokens) shuffle + per-bucket applyInPandas — the "
        "composed train->apply->pack plan"
    ),
    "text_lang_id_ngram": (
        "model trained during construction (three bounded collects: "
        "top-K features, K x L counts, L doc counts); the audited plan "
        "is the apply: ngram explode -> broadcast join of the K-row "
        "weight table -> L-lane partial-agg groupBy per doc -> static "
        "argmax chain + confusion-matrix groupBy"
    ),
    "text_unigram_vocab_mb": (
        "same all-zero driver-state shape as text_unigram_vocab (the "
        "vocabulary is a bounded collect); the corpus here is the "
        "multibyte-augmented projection"
    ),
    "sketch_cms_heavy_hitters": (
        "the BNLJs are the two single-row broadcast stat joins (stream "
        "total read off the sketch's d=0 lane + distinct-key count); the "
        "sketch side of the estimate join is broadcast because it is "
        "<= depth x width rows by construction"
    ),
    "sketch_cms_error": (
        "one BNLJ-free shape: exact-count groupBy + broadcast sketch "
        "estimate join + single-row final agg; the sketch is bounded "
        "driver-free distributed state (<= depth x width rows)"
    ),
    "skew_hot_keys": (
        "the BNLJ is the single-row (total, n_keys) stats broadcast over "
        "the per-key count table — the exact skew-diagnosis pass"
    ),
    "pipeline_weighted_sample": (
        "narrow md5+division projection into TakeOrderedAndProject — "
        "per-partition top-k heaps, no global sort, zero data shuffle"
    ),
    "sketch_join_size": (
        "two bounded sketch builds (one shuffle each), a broadcast "
        "sketch-to-sketch cell join, and the exact-count SMJ the gate "
        "carries only to grade the estimate — a production caller runs "
        "just the sketch half"
    ),
    "streaming_heavy_hitters": (
        "the sketch is built DURING construction by a real complete-mode "
        "streaming run of the unchanged cms_build (4-file re-layout, "
        "maxFilesPerTrigger=1) and pinned via eager localCheckpoint, so "
        "the audited plan is the batch estimate/threshold math over a "
        "LogicalRDD sketch + broadcast stat joins"
    ),
    "layout_zvalue": (
        "the BNLJ is the single-row dim-range broadcast feeding the "
        "min-max normalization; the Morton interleave itself is a pure "
        "codegen projection"
    ),
    "layout_zorder_prune": (
        "measurement gate: the three ntile windows (one per layout arm) "
        "are the cross-engine-deterministic stand-in for "
        "repartitionByRange — single-partition sorts at gate scale by "
        "design; the production write path (zorder_layout) is the range "
        "shuffle, carried by the pytest partition-disjointness test, not "
        "this plan.  BNLJs are single-row range/box broadcasts"
    ),
    "layout_hilbert_value": (
        "same shape as layout_zvalue: one single-row dim-range broadcast "
        "BNLJ for the normalization; the Hilbert walk is ONE aggregate "
        "fold expression in the projection — no per-bit plan growth"
    ),
    "layout_hilbert_prune": (
        "same measurement-gate shape as layout_zorder_prune (ntile "
        "stand-ins, single-row box broadcasts), with a hilbert arm "
        "alongside bydim/zorder; 0 scans because the shared "
        "(x, y, z, h) base is lazily localCheckpoint-ed once for its "
        "five consumers"
    ),
    "sketch_kmv_distinct": (
        "the sketch build is distinct-then-TakeOrderedAndProject (k-row "
        "heap merge, no global sort); the single-row exact-count arm "
        "exists only to grade the estimate"
    ),
    "sketch_kmv_jaccard": (
        "all joins are broadcasts over <= k-row sketches (merge + two "
        "semi-joins for rho), each sketch lazily localCheckpoint-ed so "
        "its two consumers share one build; the exact "
        "union/intersection arm is one conditional-count aggregate "
        "carried for grading"
    ),
    "sketch_kmv_groups": (
        "per-group sketches bound the rank window's input to distinct "
        "(group, hash) pairs and its output to k rows per group"
    ),
    "sketch_hist_quantiles": (
        "the no-partition window runs over the <= 256-row sketch "
        "(cumulative counts) — bounded by construction, never "
        "data-sized; the 3-row quantile result is localCheckpoint-ed "
        "so the grading cross-join and the final select share one "
        "sketch build, leaving one histogram pass and one grading "
        "pass over the data"
    ),
    "q_events_resample": (
        "one key exchange feeds both opposite-direction carry windows "
        "(same partitioning, two in-partition sorts); the grid arm's "
        "groupBy carries two BIGINTs per key; the tiebreak rides the "
        "sort order so duplicate resolution adds no shuffle"
    ),
    "pipeline_profile": (
        "the (column, value) explode stream feeds two consumers (stats "
        "groupBy + per-column KMV) — two column-pruned scans by design, "
        "vs one COUNT(DISTINCT) shuffle per profiled column naively; "
        "the exact-distinct arm exists only to grade the estimates"
    ),
    "streaming_hist_quantiles": (
        "near-zero row: the sketch is built DURING construction by a "
        "real complete-mode streaming run of the unchanged hist_build "
        "(4-file re-layout, maxFilesPerTrigger=1, explicit bounds) and "
        "pinned via eager localCheckpoint; the audited plan is the "
        "batch quantile walk + grading counts over a LogicalRDD sketch"
    ),
    "sketch_drift_report": (
        "composition gate over bounded sketches: two explicit-bounds "
        "histograms (shared edges) full-joined over <= B rows for the "
        "L1 proportion distance, two <= k-row KMV sketches for the key "
        "Jaccard; every join input is bounded, the data is scanned once "
        "per slice per sketch"
    ),
    "text_pmi_phrases": (
        "two map-side-combined explode counts, two word-keyed joins "
        "(AQE broadcasts while the vocabulary fits), a 1-row total "
        "broadcast, TakeOrderedAndProject for the top slice"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from qdrant_datafusion_spark.entry_queries import QUERIES
    from qdrant_datafusion_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cores=4)

    lines = [
        "# PLANS — physical-plan audit of every driver query",
        "",
        f"Generated by `scripts/plan_audit.py` at `{sf_dir}`.",
        "Plan shape is SF-independent (AQE refines at runtime).",
        "",
        "| query | scans | pushed-filter scans | BHJ | SMJ | NLJ | cartesian | TopK | shuffles | broadcasts |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    flags: list[str] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            p = plan_of(df)
        except Exception as exc:  # pragma: no cover - audit tool
            flags.append(f"- **{name}**: failed to plan: {exc}")
            continue
        a = audit(p)
        lines.append(
            f"| {name} | {a['scans']} | {a['pushed']} | {a['bhj']} | {a['smj']} "
            f"| {a['bnlj']} | {a['cartesian']} | {a['topk']} | {a['shuffles']} "
            f"| {a['broadcasts']} |"
        )
        if a["cartesian"]:
            flags.append(f"- **{name}**: CartesianProduct in plan")
        if a["smj"] and name.split("_")[0] in {"q3", "q5", "q14"}:
            flags.append(f"- **{name}**: SortMergeJoin where dims should broadcast")

    lines.append("")
    lines.append("## Notes")
    lines.append("")
    lines.extend(f"- **{n}**: {t}" for n, t in NOTES.items() if not only or n in only)
    lines.append("")
    lines.append("## Flags")
    lines.append("")
    lines.extend(flags or ["- none"])
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    for fl in flags:
        print(fl)


if __name__ == "__main__":
    main()
