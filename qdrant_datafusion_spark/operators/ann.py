"""Approximate / exact nearest-neighbor search over an embedding column.

Three strategies over ``array<float>``:

- ``knn_bruteforce`` — exact: score every row (native O(dim) kernel inside
  the scan's codegen stage) + TakeOrderedAndProject.  The correctness
  baseline; at 100 TB still a single scan with no shuffle, bounded by I/O.
- ``ivf_topk``      — IVF-style: assign each row to its nearest of K
  centroids (a broadcast-sized literal list), *pre-materialize* the
  assignment partitioned by centroid, and probe only ``nprobe`` cells per
  query → reads shrink by ~nprobe/K when the assignment table is stored
  partitioned-by-cell (partition pruning does the skipping).
- ``lsh_bucket_topk`` — random-hyperplane LSH buckets: sign-pattern of a
  few plane dot-products is the bucket key; a query probes its own bucket
  (optionally multi-probe neighbors at Hamming 1).

``knn_join`` batches many queries (exact) via broadcast + window — the
building block for embedding-dedup verification and kNN-graph jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.distance import (
    dot_product,
    v_search,
)
from qdrant_datafusion_spark.operators.topk import batch_search


def knn_bruteforce(
    collection: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int,
    metric: str = "cosine",
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Exact top-k by full scan — the ANN correctness baseline."""
    return (
        collection.filter(F.col(vector_col).isNotNull())
        .select(id_col, v_search(vector_col, query, metric).alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


knn_join = batch_search  # exact batched kNN is the batch_search window plan


def knn_brp_mllib(
    collection: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int,
    id_col: str = "id",
    num_hash_tables: int = 10,
    bucket_length: float = 2.0,
    seed: int = 42,
) -> DataFrame:
    """MLlib interop ANN tier: top-k EUCLIDEAN neighbors via the stock
    ``pyspark.ml`` ``BucketedRandomProjectionLSH.approxNearestNeighbors``
    (SURVEY §2.3 names the primitive; ``array_to_vector`` bridges the
    ``array<float>`` column to ``VectorUDT``).

    Candidates = rows sharing ANY of the ``num_hash_tables`` single-probe
    bucket hashes with the query; MLlib refines them by exact distance.
    The emitted ``distance`` is recomputed with the house euclid kernel
    (``functions.distance.euclid_distance`` — the same sequential-fold
    expression every V_* gate rounds), so values are engine-exact; the
    call over-fetches ``2k`` candidates and takes the top-k after a
    (distance, id) re-sort, so the emitted set is deterministic even
    under distance ties at rank k (MLlib's own truncation has no id
    tie-break).  Seeded ⇒ the candidate set (hence recall) is
    deterministic; if the single-probe candidate set holds < k rows,
    fewer than k rows are returned.

    Scale/honesty notes: single-probe BRP prunes by ~(collision prob)^1
    per table — on corpora whose pairwise-distance spectrum is NARROW
    (this repo's embeddings fixture: all pairs within [0.9, 1.4]) the
    candidate set approaches the corpus and the win is small; the house
    hyperplane-LSH cosine tier (``lsh_bucket_topk``,
    ``embedding_near_dups(bucket_planes=)``) with corpus-scaled planes
    remains the gated scale path.  A BRP *similarity join* on such a
    spectrum would ship ~all-pairs structs, so only the ANN form is
    exposed — the join-form stock interop is ``minhash_lsh_dups_mllib``
    (Jaccard), where banding does prune.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    from qdrant_datafusion_spark.functions.distance import euclid_distance

    q = [float(x) for x in query]
    base = collection.filter(F.col(vector_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(vector_col).alias("_arr"),
        array_to_vector(F.col(vector_col).cast("array<double>")).alias("_v"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_v", outputCol="_h",
        numHashTables=num_hash_tables, bucketLength=bucket_length,
        seed=seed,
    )
    model = lsh.fit(base)
    # over-fetch 2k: approxNearestNeighbors truncates to its k by
    # MLlib's internal distCol with NO id tie-break, so asking for
    # exactly k would let a distance tie at rank k pick rows
    # nondeterministically (and the post-hoc sort could only order the
    # rows MLlib already chose).  Fetching 2k and taking the top-k after
    # the house-kernel (distance, id) re-sort makes the emitted SET
    # deterministic under any tie narrower than k rows.  Under-k caveat
    # remains inherent to single-probe LSH: if the candidate set itself
    # holds < k rows, fewer than k rows come back.
    nn = model.approxNearestNeighbors(
        model.transform(base), Vectors.dense(q), 2 * k, distCol="_d"
    )
    return (
        nn.select(
            F.col("_id").alias(id_col),
            euclid_distance(F.col("_arr"), q).alias("distance"),
        )
        .orderBy(F.asc("distance"), F.asc(id_col))
        .limit(k)
    )


def _centroid_id(vector_col: str, centroids: Sequence[Sequence[float]]) -> Column:
    """Index of the max-dot-product centroid (literal centroid list)."""
    scores = F.array(
        *[dot_product(F.col(vector_col), list(c)) for c in centroids]
    )
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


def assign_ivf_cells(
    collection: DataFrame,
    vector_col: str,
    centroids: Sequence[Sequence[float]],
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Add an IVF cell id per row.  Write the result
    ``.write.partitionBy(cell_col)`` to make per-cell probing a
    partition-pruned read at query time."""
    return collection.filter(F.col(vector_col).isNotNull()).withColumn(
        cell_col, _centroid_id(vector_col, centroids)
    )


def ivf_topk(
    assigned: DataFrame,
    vector_col: str,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    k: int,
    nprobe: int = 2,
    metric: str = "cosine",
    id_col: str = "id",
    cell_col: str = "ivf_cell",
    score_col: str = "score",
) -> DataFrame:
    """Probe the ``nprobe`` cells whose centroids best match the query, then
    exact top-k within them.  ``assigned`` is the output of
    ``assign_ivf_cells`` (ideally read back partitioned by cell so the
    cell filter prunes partitions instead of scanning)."""
    q = [float(x) for x in query]
    cscores = [(i, sum(a * b for a, b in zip(q, c))) for i, c in enumerate(centroids)]
    probe = [i for i, _ in sorted(cscores, key=lambda t: -t[1])[:nprobe]]
    return (
        assigned.filter(F.col(cell_col).isin(probe))
        .select(id_col, v_search(vector_col, q, metric).alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket(vector_col: str, planes: Sequence[Sequence[float]]) -> Column:
    """Random-hyperplane LSH bucket key: the concatenated sign pattern of
    the vector's dot products with each plane."""
    bits = [
        (dot_product(F.col(vector_col), list(p)) > 0).cast("int").cast("string")
        for p in planes
    ]
    return F.concat(*bits)


def lsh_bucket_topk(
    collection: DataFrame,
    vector_col: str,
    query: Sequence[float],
    planes: Sequence[Sequence[float]],
    k: int,
    metric: str = "cosine",
    id_col: str = "id",
    score_col: str = "score",
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k probing the query's LSH bucket (and, with
    ``multiprobe``, all buckets at Hamming distance 1 — recall insurance
    for points near a hyperplane)."""
    q = [float(x) for x in query]
    qbits = [1 if sum(a * b for a, b in zip(q, p)) > 0 else 0 for p in planes]
    buckets = {"".join(map(str, qbits))}
    if multiprobe:
        for i in range(len(qbits)):
            flipped = qbits.copy()
            flipped[i] ^= 1
            buckets.add("".join(map(str, flipped)))
    return (
        collection.filter(F.col(vector_col).isNotNull())
        .withColumn("_bucket", lsh_bucket(vector_col, planes))
        .filter(F.col("_bucket").isin(list(buckets)))
        .select(id_col, v_search(vector_col, q, metric).alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def planted_cluster_embeddings(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    group_size: int = 4,
    noise_scale: float = 0.01,
    out_col: str = "cemb",
) -> DataFrame:
    """Deterministic PLANTED-CLUSTER transform of an embedding column —
    the evaluation fixture for approximate-join recall/pruning claims.

    Every ``group_size`` consecutive ids form one cluster; the cluster's
    centroid coordinate ``d`` (1-based) is an md5-derived grid point in
    [-10, 10] (``(bigint(md5(cluster || '_' || d)[:8]) % 2001 - 1000) /
    100.0`` — the repo's cross-engine hash trick, bit-identical in
    DuckDB), and each member is ``centroid + noise_scale * embedding``.
    On this repo's synthetic embeddings (all pairwise distances in
    [0.9, 1.4]) that yields intra-cluster euclid distances of
    ``~noise_scale * [0.9, 1.4]`` versus inter-cluster distances of
    ~sqrt(2·dim·Var[U(-10,10)]) ≈ 46 at dim 64 — the wide separation the
    flat fixture lacks, which is exactly what lets a bucketed euclidean
    join (BRP LSH) demonstrate REAL candidate pruning with full recall
    (``operators/ann.py:80-89`` documents why the flat spectrum cannot).

    Contract: ``id_col`` must be a non-negative integer (floor == integer
    division, matching DuckDB ``//``).  Pure per-element codegen — no
    shuffle, no UDF; at 100 TB this is a free map stage.  Elementwise
    arithmetic (hash grid + one multiply + one add) is IEEE-identical
    across engines, so gates over the transform keep full value oracles.
    """
    cl = F.floor(F.col(id_col).cast("long") / F.lit(group_size)).cast("long")
    base = df.withColumn("_cl", cl)

    def elem(x: Column, i: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("_cl").cast("string"),
                        F.lit("_"),
                        (i + F.lit(1)).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        return (h % 2001 - 1000) / F.lit(100.0) + F.lit(float(noise_scale)) * x

    return base.withColumn(
        out_col,
        F.when(
            F.col(vector_col).isNotNull(),
            F.transform(F.col(vector_col).cast("array<double>"), elem),
        ),
    ).drop("_cl")


def _seq_dot(A, B):
    """Left-to-right sequential-order row dot products — bit-identical
    to the JVM fold ``functions.distance.dot_product`` (``aggregate``
    starting at 0.0, adding ``a[i]*b[i]`` in element order, all in
    double).  ``np.cumsum`` along the last axis is ``np.add.accumulate``
    — strictly sequential partial sums, the same IEEE add sequence —
    so GEMM block tasks can emit EXACT scores themselves instead of the
    caller re-scoring candidates through an interpreted HOF join (the
    round-13 measurement: the join + 3×aggregate/zip_with fold over the
    candidate table was ~90% of the kNN-build wall at 10× scale)."""
    import numpy as np

    prod = A.astype(np.float64, copy=False) * B.astype(np.float64, copy=False)
    if prod.shape[1] == 0:
        return np.zeros(prod.shape[0], dtype=np.float64)
    return np.cumsum(prod, axis=1)[:, -1]


def _seq_norms(M):
    """sqrt of the sequential-order self dot — bit-identical to the JVM
    ``norm`` fold (sqrt is correctly rounded in both runtimes)."""
    import numpy as np

    return np.sqrt(_seq_dot(M, M))


#: per-tile output budget for the blocked-GEMM selection loops.  The
#: (block × block) similarity matrix at the auto-sized 4096-row blocks is
#: ~128 MB of float64 — measured on this machine class, 15 CONCURRENT
#: tasks each streaming a 128 MB matrix through GEMM + argpartition run
#: ~100× slower per task than solo (memory-system collapse: 38 s vs
#: 0.38 s for one normalized GEMM), while row-tiles whose output stays
#: ~4 MB keep every task cache-resident (15-way wall: 0.74 s vs 62 s).
#: FLOPs are identical — only the working set changes.
_GEMM_TILE_BYTES = 4 << 20


def _gemm_tile_rows(ncols: int) -> int:
    """Query-row tile height whose (rows × ncols) float64 output fits
    the _GEMM_TILE_BYTES budget."""
    return max(16, _GEMM_TILE_BYTES // (8 * max(1, ncols)))


def _gemm_pair_parallelism(df: DataFrame, npairs: int) -> int:
    """Round-robin partition count for the block-pair grid: the
    crossJoin leaves all pairs with blk_a = b in ONE partition (the
    build side is broadcast), so without a repartition the grid's
    makespan is the hottest block's whole row.  Cap at 2× the session's
    shuffle parallelism — beyond that the extra partitions only add
    scheduling overhead."""
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(npairs, 2 * sp))


def _auto_gemm_nblocks(n: int) -> int:
    """Scale-adaptive GEMM grid size (guide §2.2/§2.3): every block's
    vectors are re-shipped through Arrow once per partner block, so the
    Python-boundary bytes grow with ``nblocks × n`` — minimize the block
    count subject to (a) enough block pairs to fill the cores
    (``nblocks ≥ 4`` ⇒ ≥ 10 pairs, and the floor also keeps the
    multi-block grid path exercised at tiny test SFs) and (b) per-task
    state staying bounded (blocks of ≤ 4096 rows ⇒ a 4096² float64 sims
    matrix ≈ 134 MB).  A fixed small block size is the knob that silently
    degrades at scale: at 10× the rows it ships ~10× the duplicated
    vector bytes and schedules ~100× the (tiny) tasks."""
    import math

    return max(4, math.ceil(n / 4096))


def self_knn_join(
    collection: DataFrame,
    vector_col: str,
    id_col: str,
    k: int = 5,
    block_size: int | None = None,
) -> DataFrame:
    """Each row's exact k nearest neighbors *within the table* by cosine —
    the kNN-graph builder behind embedding clustering and graph-based
    dedup.  Returns (id, nbr_id, score, rank), rank 1..k, self excluded.

    Three stages, all shuffle-bounded:

    1. **Blocked-GEMM candidates**: hash rows into blocks; each block pair
       is one Arrow task doing a BLAS matmul that keeps the top k+4 per
       row *per block pair* (the +4 absorbs BLAS summation-order ulps so
       a true neighbor can't fall off a block-local list).  The union of
       block-pair lists provably contains every global top-k neighbor.
    2. **Exact in-task scoring**: each kept candidate's score is computed
       IN the same task with the sequential-order cumsum kernel
       (``_seq_dot``) — bit-identical to the native fold a join-back
       re-score would produce, without shipping candidate pairs through
       a vector join + interpreted higher-order fold (round 13: that
       join was ~90% of the build wall at 10× scale).
    3. **Final ranking**: window partitioned by id (never global) keeps
       rank ≤ k.
    """
    import math

    import pandas as pd

    rows = collection.select(
        F.col(id_col).alias("_id"), F.col(vector_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    n = rows.count()
    # block_size=None (the default) sizes the grid to the corpus; an
    # explicit block_size pins the legacy geometry (tests, probes).
    # Either way the output is invariant: every block pair is compared,
    # and each per-pair top-(k+4) list provably contains every global
    # top-k neighbor (fewer than k candidates beat it anywhere, so fewer
    # than k+4 beat it inside its own block pair).
    nblocks = (
        _auto_gemm_nblocks(n)
        if block_size is None
        else max(1, math.ceil(n / block_size))
    )
    blocks = rows.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(nblocks)).cast("int")
    )
    grouped = blocks.groupBy("_blk").agg(
        F.collect_list("_id").alias("_ids"), F.collect_list("_v").alias("_vs")
    )
    a = grouped.select(
        F.col("_blk").alias("blk_a"), F.col("_ids").alias("ids_a"), F.col("_vs").alias("vs_a")
    )
    b = grouped.select(
        F.col("_blk").alias("blk_b"), F.col("_ids").alias("ids_b"), F.col("_vs").alias("vs_b")
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("blk_a") <= F.col("blk_b"))
        # spread the grid's block pairs round-robin: the crossJoin output
        # inherits ONE partition per blk_a, so block 0's nblocks pairs
        # would otherwise run serially in one task (guide §2.5 skew)
        .repartition(_gemm_pair_parallelism(collection, nblocks * (nblocks + 1) // 2))
    )

    id_field = collection.select(F.col(id_col)).schema.fields[0]
    id_t = id_field.dataType.simpleString()
    out_schema = f"id {id_t}, nbr_id {id_t}, score double"
    keep = k + 4

    def topk_candidates(batches):
        import numpy as np

        for pdf in batches:
            # vectorized emitter (guide §4.2): the per-(query, candidate)
            # work is pure NumPy indexing — argpartition + take_along_axis
            # + boolean masks — instead of a Python loop appending one
            # pair at a time (measured ~2x on the k=20 overfetch path)
            q_parts: list = []
            n_parts: list = []
            s_parts: list = []
            for r in pdf.itertuples(index=False):
                same = r.blk_a == r.blk_b
                # np.stack: one C-loop copy of the Arrow float32 rows
                # into the (rows, dim) matrix, instead of a Python loop
                # converting one vector at a time (guide §4.2)
                va = np.stack(r.vs_a).astype(np.float64)
                vb = va if same else np.stack(r.vs_b).astype(np.float64)
                na = np.linalg.norm(va, axis=1)
                nb = na if same else np.linalg.norm(vb, axis=1)
                # normalize ROWS first (n×dim elements, not the n²
                # outer+divide — measured memory-bandwidth-bound), then
                # GEMM in ROW TILES whose output fits the cache budget
                # (see _GEMM_TILE_BYTES).  sims values are selection-only;
                # ulp differences vs the divide-after form sit inside the
                # +4-rank margin like any BLAS reassociation.
                van = va / na[:, None]
                vbn = van if same else vb / nb[:, None]
                ids_a = np.asarray(list(r.ids_a))
                ids_b = ids_a if same else np.asarray(list(r.ids_b))
                # sequential-order norms once per block row: kept
                # candidates get their EXACT score computed here (the
                # _seq_dot cumsum contract), so no vector join / HOF
                # re-score stage exists downstream
                sna = _seq_norms(va)
                snb = sna if same else _seq_norms(vb)

                def emit(ids_q, ids_n, vqn, vnn, vq, vn, nq, nn, diag):
                    ncols = vnn.shape[0]
                    kk = min(keep, ncols)
                    trows = _gemm_tile_rows(ncols)
                    for s0 in range(0, vqn.shape[0], trows):
                        s = vqn[s0 : s0 + trows] @ vnn.T
                        if diag:
                            li = np.arange(s.shape[0])
                            gi = s0 + li
                            ok = gi < ncols
                            s[li[ok], gi[ok]] = -np.inf
                        # tail argpartition: top-kk without a negated copy
                        top = np.argpartition(s, ncols - kk, axis=1)[:, -kk:]
                        finite = np.isfinite(np.take_along_axis(s, top, axis=1))
                        qi = (
                            s0
                            + np.broadcast_to(
                                np.arange(s.shape[0])[:, None], top.shape
                            )
                        )[finite]
                        ni = top[finite]
                        q_parts.append(ids_q[qi])
                        n_parts.append(ids_n[ni])
                        s_parts.append(
                            _seq_dot(vq[qi], vn[ni]) / (nq[qi] * nn[ni])
                        )

                emit(ids_a, ids_b, van, vbn, va, vb, sna, snb, same)
                if not same:
                    emit(ids_b, ids_a, vbn, van, vb, va, snb, sna, False)
            yield pd.DataFrame(
                {
                    "id": np.concatenate(q_parts) if q_parts else [],
                    "nbr_id": np.concatenate(n_parts) if n_parts else [],
                    "score": (
                        np.concatenate(s_parts)
                        if s_parts
                        else np.array([], dtype=np.float64)
                    ),
                }
            )

    cands = pairs.mapInPandas(topk_candidates, schema=out_schema)

    scored = cands.select(
        "id", "nbr_id", F.round(F.col("score"), 6).alias("score")
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negatives(
    collection: DataFrame,
    vector_col: str,
    id_col: str,
    k: int = 5,
    lo: float = 0.5,
    hi: float = 0.95,
    overfetch_rank: int = 50,
    block_size: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training
    (Karpukhin et al. 2020, DPR; the standard retrieve-then-filter
    recipe): per anchor row, the top-``k`` neighbors whose cosine falls
    in the band ``[lo, hi)`` — similar enough to be informative
    negatives, below the near-duplicate ceiling ``hi`` (pair it with
    the dedup tiers: anything ≥ ``hi`` is a positive/duplicate, not a
    negative).  Returns ``(id, nbr_id, score, neg_rank)``.

    Band members are drawn from each anchor's EXACT global
    top-``overfetch_rank`` list (:func:`self_knn_join` — blocked-GEMM
    candidates, sequential-exact re-score), then band-filtered and
    re-ranked.  Contract: an anchor with more than
    ``overfetch_rank − k`` neighbors scoring ≥ ``lo`` above the band
    may under-return — size ``overfetch_rank`` ≥ k + the corpus's
    near-dup ceiling (the dedup gates measure it).  This is the same
    top-N-then-filter contract DPR mining runs in production, and it
    keeps the kernel the proven kNN plan instead of a second
    band-aware candidate stage.
    """
    if not (lo < hi):
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if overfetch_rank < k:
        raise ValueError("overfetch_rank must be >= k")
    nn = self_knn_join(
        collection, vector_col, id_col, k=overfetch_rank,
        block_size=block_size,
    )
    band = nn.filter((F.col("score") >= lo) & (F.col("score") < hi))
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        band.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select("id", "nbr_id", "score", "neg_rank")
    )


def self_knn_join_lsh(
    collection: DataFrame,
    vector_col: str,
    id_col: str,
    planes: Sequence[Sequence[float]],
    k: int = 5,
    tables: int = 1,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate kNN graph via multi-table hyperplane-LSH blocking — the
    100 TB default; :func:`self_knn_join` (exact block-GEMM grid) is the
    verify/oracle tier.

    ``planes`` is split into ``tables`` groups of p planes; a pair is a
    candidate iff it shares a sign-pattern bucket in ANY table
    (OR-construction: recall 1-(1-q^p)^L).  Each bucket becomes ONE
    in-task GEMM block emitting per-id shortlists of (k+4) best
    neighbors within the bucket — candidate pairs never materialize as a
    shuffled vector-pair join, and the only wide exchanges key on
    (table, bucket) and id.  Each bucket task also computes every
    shortlisted pair's EXACT score with the sequential-order cumsum
    kernel (``_seq_dot`` — the same bits the native fold produces), so
    the global re-rank (approx, then exact) needs no vector join or
    interpreted re-score stage; truncation is sound because a pair's
    global candidate rank for an id can't beat its rank inside any
    shared bucket, and the 4-slot margin absorbs BLAS-vs-sequential
    ulps at rank boundaries.  ``max_bucket_size`` drops oversized
    buckets (skew guard, same contract as the LSH dedup cap).

    Returns (id, nbr_id, score, rank) — the same shape as
    :func:`self_knn_join`; edge recall vs the exact graph is itself a
    gated query (dedup_embedding_recall) rather than a silent assumption.
    """
    import numpy as np
    import pandas as pd

    from qdrant_datafusion_spark.operators.dedup import (
        _cap_hot_buckets,
        _make_lsh_bucket_udf,
    )

    if len(planes) % tables:
        raise ValueError("tables must divide len(planes)")
    rows = collection.select(
        F.col(id_col).alias("_id"), F.col(vector_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    id_dt = collection.select(id_col).schema.fields[0].dataType.simpleString()
    bucket_udf = _make_lsh_bucket_udf(planes, tables)
    bucketed = _cap_hot_buckets(
        rows.select("_id", "_v", F.explode(bucket_udf(F.col("_v"))).alias("_bucket")),
        ["_bucket"],
        max_bucket_size,
    )
    shortlist_k = k + 4

    def block(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows sorted by id so a stable argsort breaks approx-score ties
        # by ascending neighbor id (the oracle's tie-break)
        pdf = pdf.sort_values("_id", kind="stable")
        M = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
        ids = pdf["_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {
                    "id": ids[:0],
                    "nbr_id": ids[:0],
                    "_approx": np.array([], dtype=np.float64),
                    "score": np.array([], dtype=np.float64),
                }
            )
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0.0] = np.nan
        Mn = M / norms[:, None]  # normalize-first: selection-only GEMM
        C = Mn @ Mn.T
        np.fill_diagonal(C, -np.inf)
        top = min(shortlist_k, n - 1)
        nbr_pos = np.argsort(-C, axis=1, kind="stable")[:, :top]
        src_pos = np.repeat(np.arange(n), top)
        nbr_flat = nbr_pos.reshape(-1)
        approx = np.take_along_axis(C, nbr_pos, axis=1).reshape(-1)
        keep = np.isfinite(approx)
        si, ni = src_pos[keep], nbr_flat[keep]
        # exact sequential-order score computed IN the block task (the
        # _seq_dot cumsum contract) — same bits the join-back HOF
        # re-score produced, no vector join downstream.  A pair emitted
        # from several buckets computes from identical operands, so
        # dropDuplicates keeps a bit-identical score whichever row wins.
        sn = _seq_norms(M)
        exact = _seq_dot(M[si], M[ni]) / (sn[si] * sn[ni])
        return pd.DataFrame(
            {
                "id": ids[si],
                "nbr_id": ids[ni],
                "_approx": approx[keep],
                "score": exact,
            }
        )

    per_bucket = bucketed.groupBy("_bucket").applyInPandas(
        block, schema=f"id {id_dt}, nbr_id {id_dt}, _approx double, score double"
    )
    # same pair from several buckets carries an identical approx score
    # (same GEMM operands) — keep one, then re-rank the union per id
    approx_w = Window.partitionBy("id").orderBy(F.desc("_approx"), F.asc("nbr_id"))
    shortlist = (
        per_bucket.dropDuplicates(["id", "nbr_id"])
        .withColumn("_arank", F.row_number().over(approx_w))
        .filter(F.col("_arank") <= shortlist_k)
    )
    scored = shortlist.select(
        "id", "nbr_id", F.round(F.col("score"), 6).alias("score")
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_ivf_centroids(
    collection: DataFrame,
    vector_col: str,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "id",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over DataFrame ops — the batch
    index-build stage for :func:`assign_ivf_cells` / :func:`ivf_topk`.

    Init = the k rows with the smallest ids (deterministic, no RNG).  Each
    iteration is one assignment pass (broadcast centroid literals, argmax
    dot inside codegen) + one groupBy computing per-cell mean vectors via
    ``posexplode`` + (cell, dim) aggregation — both shuffle only k×dim
    aggregates, never vectors-to-driver.  Empty cells keep their previous
    centroid.  Returns plain Python lists, ready to broadcast into
    ``ivf_topk`` or store with the collection descriptor.

    Scale: per iteration one scan + one shuffle of (cell, dim, partial
    sums); centroids live as plan literals (fine to a few thousand
    k×dim).  At 100 TB run iterations on a sample, then one full
    assignment pass.
    """
    rows = collection.select(
        F.col(id_col).alias("_id"), F.col(vector_col).alias("_v")
    ).filter(F.col(vector_col).isNotNull())
    init = rows.orderBy("_id").limit(k).collect()
    centroids = [[float(x) for x in r._v] for r in init]
    if len(centroids) < k:
        raise ValueError(f"need at least {k} non-null vectors")

    for _ in range(iterations):
        assigned = rows.withColumn("_cell", _centroid_id("_v", centroids))
        sums = (
            assigned.select(
                "_cell", F.posexplode("_v").alias("_dim", "_x")
            )
            .groupBy("_cell", "_dim")
            .agg(F.sum(F.col("_x").cast("double")).alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in sums:
            by_cell.setdefault(r._cell, {})[r._dim] = r._s
            counts[r._cell] = r._n
        centroids = [
            [by_cell[c][d] / counts[c] for d in sorted(by_cell[c])]
            if c in by_cell
            else centroids[c]
            for c in range(k)
        ]
    return centroids


def mmr_select(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query: Sequence[float] | None = None,
    k: int = 10,
    lambda_pct: int = 70,
    units: int = 10**6,
) -> list[tuple]:
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein
    1998) — the diversity-aware data-selection step: greedily pick the
    candidate maximizing ``λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)``
    so the returned set is both relevant to ``query`` and mutually
    non-redundant (a plain top-k returns near-duplicate clusters).

    Exactness — engine-portable by the same trick as
    :func:`operators.graph.pagerank`: relevance and pairwise cosines are
    quantized ONCE to integer ``units`` (``round(cos * units)``) and the
    MMR objective is the all-integer
    ``lambda_pct·rel_u − (100−lambda_pct)·max_sim_u``; the argmax orders
    by ``(mmr_u DESC, id ASC)``, so selection is deterministic and the
    unrolled DuckDB oracle matches exactly.

    Scale: the relevance pass is one narrow scan (the native
    sequential-fold cosine kernel), lazily ``localCheckpoint``-ed; each
    of the ``k`` greedy steps folds ONE new cosine per candidate (vs
    the newest pick, a plan literal) into a stored running ``max_sim``
    column and takes a distributed argmax (``orderBy().limit(1)`` →
    TakeOrdered, no global sort) — O(k·N) kernel evaluations total, not
    the naive O(k²·N).  Driver state is ``k`` rows — the same
    bounded-collect budget as IVF training
    (``ann.train_ivf_centroids``).  k Spark jobs total; MMR is
    inherently sequential (each pick conditions the next), so the
    latency floor is k small jobs, not one big one.

    Returns a list of ``(rank, id, mmr_units)`` tuples (rank 1-based) —
    a list, not a DataFrame, because the result IS driver state (k
    rows); callers wanting a DataFrame wrap it with
    ``spark.createDataFrame``.
    """
    if query is None:
        raise ValueError("query vector is required")
    if k < 1:
        raise ValueError("k must be >= 1")
    if k > 1000:
        # each greedy pick is one Spark job — a 10^5-step driver loop is
        # never the right tool.  Prefetch a candidate pool (ann top-k /
        # ivf_search) and run MMR over the pool instead.
        raise ValueError(
            "k > 1000 would launch k sequential driver jobs; prefetch a "
            "candidate pool (e.g. brute_force_topk / ivf_search) and run "
            "mmr_select over the pool"
        )
    if not 0 <= lambda_pct <= 100:
        raise ValueError("lambda_pct must be in [0, 100]")
    qv = [float(x) for x in query]
    # Arrow-batched integer-units cosine vs a FIXED vector.  The naive
    # form — F.round(v_search(...) * units) per step — inlines the
    # 64-element literal array three times into a zip_with/aggregate
    # tree, and every greedy step embeds a NEW pick vector, so every
    # step pays whole-stage-codegen compilation of a fresh giant plan
    # (measured: the k=10 gate is ~50s cold / ~7s warm at sf0.1 with the
    # kernel math itself being milliseconds — the wall is per-step
    # compilation, guide §7.3 "planning time itself").  The UDF closure
    # swaps the vector without changing the compiled plan shape.
    # Exactness: np.cumsum IS the JVM fold's IEEE add sequence (the
    # _seq_dot contract, same as the GEMM kernels) and the final
    # round-to-units goes through Decimal(repr(x)) — BigDecimal.valueOf
    # semantics, the _round6_half_up argument at scale 0.
    def _units_cos_udf(fixed: list[float]):
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        fq = np.asarray(fixed, dtype=np.float64)
        fqn = float(np.sqrt(_seq_dot(fq[None, :], fq[None, :])[0]))
        u = float(units)

        # plain Series->Series scalar form (no type hints: this module's
        # `from __future__ import annotations` would stringify them and
        # break pandas_udf inference)
        def score(col):
            from decimal import ROUND_HALF_UP, Decimal

            one = Decimal(1)
            if len(col) == 0:
                return pd.Series([], dtype="Int64")
            M = np.stack(col.values).astype(np.float64)
            dots = _seq_dot(M, np.broadcast_to(fq, M.shape))
            denom = _seq_norms(M) * fqn
            out = [
                None
                if d == 0.0
                else int(
                    Decimal(repr(dot / d * u)).quantize(
                        one, rounding=ROUND_HALF_UP
                    )
                )
                for dot, d in zip(dots, denom)
            ]
            return pd.Series(out, dtype="Int64")

        return pandas_udf(score, "long")

    cand = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _units_cos_udf(qv)(F.col(vec_col)).alias("_rel_u"),
    ).localCheckpoint(eager=False)
    mu = 100 - lambda_pct
    # running max-sim state: each step computes ONE new cosine per
    # candidate (vs the newest pick) and folds it into the stored
    # maximum — O(k·N) kernel evaluations total instead of the naive
    # O(k²·N) of re-scoring every candidate against every pick each
    # step.  max over the same value set, so results are identical to
    # the naive form (and to the unrolled oracle).
    state = cand.withColumn(
        "_max_sim", F.lit(-2 * units).cast("long")  # < any cosine unit
    )
    picked: list[tuple] = []
    for step in range(k):
        if picked:
            last_id, last_vec = picked[-1][1], picked[-1][3]
            new_sim = _units_cos_udf(last_vec)(F.col("_v"))
            state = (
                state.where(F.col("_id") != F.lit(last_id))
                .withColumn("_max_sim", F.greatest("_max_sim", new_sim))
                .localCheckpoint(eager=False)
            )
            mmr_u = (
                F.lit(lambda_pct) * F.col("_rel_u")
                - F.lit(mu) * F.col("_max_sim")
            )
        else:
            mmr_u = F.lit(lambda_pct) * F.col("_rel_u")
        rows = (
            state.select("_id", "_v", mmr_u.cast("long").alias("_mmr_u"))
            .orderBy(F.desc("_mmr_u"), F.asc("_id"))
            .limit(1)
            .collect()
        )
        if not rows:
            break  # fewer than k candidates
        r = rows[0]
        picked.append(
            (step + 1, r["_id"], r["_mmr_u"], [float(x) for x in r["_v"]])
        )
    return [(rank, pid, mmr) for rank, pid, mmr, _ in picked]
