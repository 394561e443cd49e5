"""Distributed graph algorithms over DataFrame edge lists.

``pagerank`` — fixed-point PageRank over an ``(src, dst)`` edge
DataFrame.  In a training-data pipeline this is the graph-centrality
data-selection step: run it over the corpus kNN graph
(``operators.ann.self_knn_join`` / the LSH-blocked sibling) and keep
high-rank documents as "representative" or down-weight low-rank
outliers.  The same operator serves link-graph quality scoring when the
edges come from hyperlinks.

Exactness: the classic float iteration is NOT engine-reproducible (sum
order changes the low bits, and 3 iterations amplify them).  This
implementation quantizes rank mass to integer ``units`` (1e-9 at the
default) and every step — initial ``1/N``, per-edge ``rank/degree``
contribution, the ``(1-d)/N`` base term, the ``d * inflow`` damping —
is integer HALF_UP division ``(2a + b) div (2b)`` on bigints, the same
arithmetic as the repo's ``_avg_round6`` family.  Sums of integers are
associative, so the result is bit-identical on any partitioning and any
engine (the DuckDB oracle unrolls the identical arithmetic).  The cost
is a deliberate ~1e-9-per-step quantization, documented, not drift.

Scale: per iteration, ONE keyed equi-join of edges against the rank
state on ``src`` (AQE-skew-splittable; a hub node is a big build-side
key, not a cartesian) and ONE ``groupBy(dst)`` shuffle with map-side
partial sums.  The state (one row per node) is lazily
``localCheckpoint``-ed every iteration — the standard lineage
truncation without which iteration *i* would replay iterations 1..i-1.
Dangling nodes (no out-edges) keep their mass out of circulation (the
simplified PageRank variant); kNN graphs have uniform out-degree k, so
none exist there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hits", "pagerank"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    units: int = 10**9,
    materialize: bool = True,
    seeds: list[int] | None = None,
) -> DataFrame:
    """PageRank over an edge list; returns ``(node, rank_units, pagerank)``
    with ``rank_units`` the exact integer fixed-point mass (1/``units``
    steps) and ``pagerank = rank_units / units`` for reading.

    ``damping_pct`` is the damping factor in percent (85 = the classic
    0.85) so the damping arithmetic stays integer-exact.

    ``seeds`` switches to PERSONALIZED PageRank (TrustRank, Gyöngyi et
    al. 2004): the teleport vector is uniform over the seed set instead
    of all nodes — initial mass and the ``(1-d)`` base term go only to
    seeds, so rank measures proximity to the trusted set.  The curation
    use: propagate quality from a hand-vetted seed corpus through the
    similarity graph and keep what the seeds endorse.  Seeds are plan
    literals (a vetted set is small); same integer arithmetic.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if seeds is not None and not seeds:
        raise ValueError("seeds must be None or non-empty")
    e = edges.select(
        F.col(src_col).cast("long").alias("_s"),
        F.col(dst_col).cast("long").alias("_d"),
    )
    if materialize:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("_n"))
        .union(e.select(F.col("_d").alias("_n")))
        .distinct()
    )
    n_df = nodes.agg(F.count("*").alias("_nn"))
    deg = e.groupBy(F.col("_s").alias("_n")).agg(
        F.count("*").alias("_deg")
    )
    # state: (node, out-degree, node count, rank units); r0 = HALF_UP
    # of units/N.  NOTE the count column is `_nn`, not `_N` — Spark
    # resolves names case-insensitively, so `_N` would collide with `_n`.
    if seeds is None:
        r0 = F.expr(f"(2 * {units}L + _nn) div (2 * _nn)")
    else:
        ns = len(seeds)
        r0 = F.when(
            F.col("_n").isin([int(x) for x in seeds]),
            F.lit((2 * units + ns) // (2 * ns)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    state = (
        nodes.join(deg, "_n", "left")
        .withColumn("_deg", F.coalesce("_deg", F.lit(0)))
        .crossJoin(F.broadcast(n_df))
        .withColumn("_r", r0)
    )
    if materialize:
        state = state.localCheckpoint(eager=False)
    d, base_num = damping_pct, (100 - damping_pct) * units
    for _ in range(iters):
        contrib = (
            e.join(
                state.where(F.col("_deg") > 0).select(
                    F.col("_n").alias("_s"), "_r", "_deg"
                ),
                "_s",
            )
            .select(
                "_d",
                F.expr("(2 * _r + _deg) div (2 * _deg)").alias("_c"),
            )
            .groupBy("_d")
            .agg(F.sum("_c").alias("_in"))
        )
        if seeds is None:
            base = F.expr(
                f"(2 * {base_num}L + 100 * _nn) div (2 * 100 * _nn)"
            )
        else:
            ns = len(seeds)
            base = F.when(
                F.col("_n").isin([int(x) for x in seeds]),
                F.lit((2 * base_num + 100 * ns) // (200 * ns)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        state = (
            state.join(contrib, state["_n"] == contrib["_d"], "left")
            .select(
                "_n",
                "_deg",
                "_nn",
                (
                    base
                    + F.expr(
                        f"(2 * {d} * coalesce(_in, 0L) + 100) div (2 * 100)"
                    )
                ).alias("_r"),
            )
        )
        if materialize:
            state = state.localCheckpoint(eager=False)
    return state.select(
        F.col("_n").alias("node"),
        F.col("_r").alias("rank_units"),
        (F.col("_r").cast("double") / F.lit(float(units))).alias("pagerank"),
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 2,
    units: int = 10**6,
    materialize: bool = True,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, JACM 46(5)) over an
    edge list; returns ``(node, auth_units, hub_units, authority,
    hub)``.

    In a training-data pipeline over the corpus kNN graph this splits
    centrality into two roles PageRank folds together: AUTHORITIES are
    documents many neighborhoods point at (canonical/representative —
    keep), HUBS are documents whose neighbor lists cover many
    authorities (broad connectors — good seeds for diversity sampling).
    On link graphs it is the classic endorsement measure.

    Exactness: the textbook iteration L2-normalizes, which no integer
    arithmetic can reproduce across engines (sqrt).  This implementation
    L1-normalizes — the standard convergence-preserving alternative
    (both are positive-scalar rescalings, so the fixed-point DIRECTION
    (the principal eigenvectors of AᵀA / AAᵀ) is identical; only the
    reported scale differs) — and every step is integer:

    - ``a_raw[i] = Σ_{j→i} h[j]``, then ``a = HALF_UP(a_raw·units/Σa_raw)``;
    - ``h_raw[j] = Σ_{j→i} a[i]``, then the same normalization.

    The normalizer Σ is a 1-row aggregate broadcast back (the repo's
    1-row stat crossJoin pattern), so each half-iteration is ONE keyed
    equi-join of edges against the state plus ONE map-side-combined
    groupBy — the pagerank shuffle shape exactly, AQE-skew-splittable.
    State is lazily localCheckpoint-ed per iteration (lineage
    truncation).  ``units`` defaults to 1e6 so the normalization
    numerator ``2·a_raw·units`` stays far inside int64 for any graph
    with Σ out-degree ≤ ~4e12.

    Node-count bounds: int64 caps Σ out-degree above (documented), and
    the integer initial state ``(2·units + n) div (2·n)`` (HALF_UP of
    ``units/n``) underflows to 0 once ``n_nodes > 2·units`` — every
    first-pass ``a_raw`` would be 0 and the normalizer would divide by
    zero.  That bound is enforced in-plan: a graph with more than
    ``2·units`` nodes raises a loud error naming the fix (raise
    ``units`` to at least ``n_nodes/2``) instead of an opaque ANSI
    divide-by-zero.  At the default units=1e6 that admits 2M nodes;
    production-scale graphs pass ``units=10**9`` (int64 then still
    allows Σ out-degree ~4e9 per the numerator bound above).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src_col).cast("long").alias("_s"),
        F.col(dst_col).cast("long").alias("_d"),
    )
    if materialize:
        e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("_s").alias("_n"))
        .union(e.select(F.col("_d").alias("_n")))
        .distinct()
    )
    n_df = nodes.agg(F.count("*").alias("_nn"))
    # in-plan guard: n_nodes > 2*units would underflow the integer 1/n
    # initial state to 0 (see docstring) — fail loudly, no extra job
    init_h = (
        f"CASE WHEN _nn > 2 * {units}L THEN cast(assert_true(false,"
        f" concat('hits(): graph has ', _nn, ' nodes > 2*units = ',"
        f" 2 * {units}L, '; the integer initial state (2*units + n)"
        f" div (2*n) underflows to 0 — pass units >= n_nodes/2'))"
        f" AS bigint)"
        f" ELSE (2 * {units}L + _nn) div (2 * _nn) END"
    )
    state = (
        nodes.crossJoin(F.broadcast(n_df))
        .select("_n", F.expr(init_h).alias("_h"))
    )
    if materialize:
        state = state.localCheckpoint(eager=False)

    def _norm(raw: DataFrame, key: str) -> DataFrame:
        """HALF_UP(v·units/Σv) over nodes (absent key -> 0 mass)."""
        s = raw.agg(F.sum("_v").cast("long").alias("_sum"))
        return (
            nodes.join(raw.withColumnRenamed(key, "_n"), "_n", "left")
            .crossJoin(F.broadcast(s))
            .select(
                "_n",
                F.expr(
                    f"(2 * coalesce(_v, 0L) * {units}L + _sum)"
                    " div (2 * _sum)"
                ).alias("_x"),
            )
        )

    auth = None
    for _ in range(iters):
        a_raw = (
            e.join(state.select(F.col("_n").alias("_s"), "_h"), "_s")
            .groupBy("_d")
            .agg(F.sum("_h").cast("long").alias("_v"))
        )
        auth = _norm(a_raw, "_d").withColumnRenamed("_x", "_a")
        if materialize:
            auth = auth.localCheckpoint(eager=False)
        h_raw = (
            e.join(auth.select(F.col("_n").alias("_d"), "_a"), "_d")
            .groupBy("_s")
            .agg(F.sum("_a").cast("long").alias("_v"))
        )
        state = _norm(h_raw, "_s").withColumnRenamed("_x", "_h")
        if materialize:
            state = state.localCheckpoint(eager=False)
    return (
        auth.join(state, "_n")
        .select(
            F.col("_n").alias("node"),
            F.col("_a").alias("auth_units"),
            F.col("_h").alias("hub_units"),
            (F.col("_a").cast("double") / F.lit(float(units))).alias("authority"),
            (F.col("_h").cast("double") / F.lit(float(units))).alias("hub"),
        )
    )
