"""One-command curation-pipeline demo — the USAGE.md chain, runnable.

Runs the SAME composed flow ``tests/test_e2e_pipeline.py`` asserts
invariants over (one canonical definition, imported from there — this
script adds only presentation): clean → per-source quality cut →
LM-perplexity gate → trained-NB gate → exact dedup → MinHash keep-best →
substring-span gate → paragraph-dedup rewrite → SemDeDup →
decontaminate → pack / split / deterministic global shuffle, on the
sf0.01 fixtures (or $SPARK_GRAFT_SF_DIR), printing the stage-by-stage
row counts USAGE.md promises.

Usage: python scripts/demo_pipeline.py   (~1 min on local[32])
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = [
    ("ingest", "documents.parquet scan"),
    ("quality", "per-source relative cut: keep each source's best 80%"),
    ("perplexity", "corpus-trained bigram LM, drop the worst-fluency decile"),
    ("classifier", "hashed-BoW Naive Bayes gate (trained, integer fixed-point)"),
    ("exact-dedup", "one survivor per distinct normalized content"),
    ("near-dup", "MinHash-LSH pairs -> components -> quality argmax keep-best"),
    ("span-gate", "drop docs >50% covered by repeated k-token spans"),
    ("paragraph", "corpus-wide first-occurrence unit rewrite (CCNet/Dolma)"),
    ("semdedup", "embedding-level semantic duplicates (SemDeDup)"),
    ("decontaminate", "drop anything sharing a 5-gram with the eval set"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    spec = importlib.util.spec_from_file_location(
        "e2e_pipeline", os.path.join(REPO, "tests", "test_e2e_pipeline.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from qdrant_datafusion_spark.session import get_spark

    spark = get_spark(app_name="curation-pipeline-demo")
    t0 = time.time()
    flow = mod.run_pipeline(spark, sf_dir)
    (
        docs, quality_kept, ppl_kept, clf_kept, exact_kept, near_kept,
        span_kept, para_kept, sem_kept, final, packed, split, shuffled,
    ) = flow

    frames = [
        docs, quality_kept, ppl_kept, clf_kept, exact_kept,
        near_kept, span_kept, para_kept, sem_kept, final,
    ]
    print(f"\ncuration pipeline @ {sf_dir}\n" + "=" * 72)
    prev = None
    for (name, what), df in zip(STAGES, frames):
        n = df.count()
        delta = "" if prev is None else f"  (-{prev - n})"
        print(f"{name:>14}  {n:>7} docs{delta:<9} {what}")
        prev = n

    n_seq = packed.select("bucket", "pack_id").distinct().count()
    print("-" * 72)
    print(f"{'pack':>14}  {n_seq:>7} sequences   greedy first-fit, budget "
          f"{mod.BUDGET} tokens, one shuffle")
    by_split = {r["split"]: r["n"] for r in
                split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    print(f"{'split':>14}  " + "  ".join(
        f"{k}={by_split.get(k, 0)}" for k in ("train", "val", "test")
    ) + "   md5-deterministic, re-rollable by seed")
    n_shuf = shuffled.count()
    print(f"{'shuffle':>14}  {n_shuf:>7} docs        deterministic global read "
          f"order (two-phase scan, no single-partition sort)")
    print("=" * 72)
    print(f"total wall: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
