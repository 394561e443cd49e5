"""One-command demo of BOTH engine halves — curation + vector index.

Part 1 runs the SAME composed flow ``tests/test_e2e_pipeline.py``
asserts invariants over (one canonical definition, imported from there —
this script adds only presentation): clean → per-source quality cut →
LM-perplexity gate → trained-NB gate → exact dedup → MinHash keep-best →
substring-span gate → paragraph-dedup rewrite → SemDeDup →
decontaminate → pack / split / deterministic global shuffle, on the
sf0.01 fixtures (or $SPARK_GRAFT_SF_DIR), printing the stage-by-stage
row counts USAGE.md promises.

Part 2 runs the vector-index lifecycle ``tests/test_e2e_vector.py``
gates: train IVF centroids (deterministic k-means) → assign cells →
``write.partitionBy(ivf_cell)`` → partition-PRUNED probe of the
written index (only nprobe of k cell directories are read) → recall
and score parity vs the brute-force exact top-k.

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

    # ---- part 2: vector-index lifecycle (test_e2e_vector's chain) ----
    import shutil
    import tempfile

    from qdrant_datafusion_spark.operators.ann import (
        assign_ivf_cells,
        ivf_topk,
        knn_bruteforce,
        train_ivf_centroids,
    )

    print(f"\nvector-index lifecycle @ {sf_dir}\n" + "=" * 72)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    query = [
        float(x)
        for x in emb.orderBy("vec_id").select("embedding").first()[0]
    ]
    k = 10
    centroids = train_ivf_centroids(
        emb, "embedding", k=8, iterations=3, id_col="vec_id"
    )
    print(f"{'train':>14}  {len(centroids):>7} IVF centroids (deterministic "
          f"k-means, 3 iterations, bounded driver state)")
    ivf_dir = tempfile.mkdtemp(prefix="demo_ivf_")
    try:
        assign_ivf_cells(emb, "embedding", centroids).write.partitionBy(
            "ivf_cell"
        ).parquet(os.path.join(ivf_dir, "table"))
        written = spark.read.parquet(os.path.join(ivf_dir, "table"))
        n_cells = written.select("ivf_cell").distinct().count()
        print(f"{'write':>14}  {n_cells:>7} cell partitions "
              f"(partitionBy(ivf_cell) -> partition-pruned probes)")
        exact = {
            r["vec_id"]: r["score"]
            for r in knn_bruteforce(
                emb, "embedding", query, k, id_col="vec_id"
            ).collect()
        }
        probed = {
            r["vec_id"]: r["score"]
            for r in ivf_topk(
                written, "embedding", query, centroids, k, nprobe=3,
                id_col="vec_id",
            ).collect()
        }
        hits = len(probed.keys() & exact.keys())
        parity = all(probed[i] == exact[i] for i in probed.keys() & exact.keys())
        # with zero shared ids the all(...) above is vacuously True —
        # label parity n/a rather than claiming bit-identical on nothing
        parity_label = (
            ("bit-identical" if parity else "DIVERGED") if hits else "n/a (0 hits)"
        )
        print(f"{'probe':>14}  {hits:>6}/{k} recall@{k} at nprobe=3/8 "
              f"(reads 3 of {n_cells} cell dirs); shared-id scores "
              f"{parity_label} vs brute force")
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)
    print("=" * 72)
    print(f"total wall: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
