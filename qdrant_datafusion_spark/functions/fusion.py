"""Rank fusion — ``V_FUSION`` (reference tests/bin/tests.sql:174-196,
350-383: hybrid dense+sparse RRF).

The corpus writes RRF as a scalar over raw scores, but true reciprocal-rank
fusion needs *global ranks* per branch — a per-row scalar cannot compute
them (SURVEY.md §7 "What's hard").  The faithful Spark realization is
rank-window per branch, then union the per-branch 1/(k+rank) contributions
and sum per id in one aggregation:

- ``rrf_fuse``    — DataFrame-level fusion of N scored branches (correct RRF)
- ``v_fusion``    — the corpus's scalar form (weighted-sum / max over score
                    columns already present on one row) for literal parity
                    with ``V_FUSION([s1, s2], 'method')`` call sites.

Scale: each branch ranks with a single window over its own (usually already
top-k-truncated) result; fusion is one shuffle over the union of candidate
ids (small), so its cost is negligible next to the scans that produced the
branches — for any number of branches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60  # the standard reciprocal-rank-fusion constant


def rrf_fuse(
    branches: Sequence[DataFrame],
    on: str = "id",
    score_col: str = "score",
    k: int = RRF_K,
    fused_col: str = "fused_score",
    per_branch_limit: int | None = 1000,
) -> DataFrame:
    """True reciprocal-rank fusion of N (id, score) branches.

    Each branch is ranked by its own score descending (ties broken by id so
    the result is deterministic); missing ids in a branch contribute 0.
    Returns (id, fused_score) sorted descending.

    ``per_branch_limit`` truncates each branch with orderBy+limit
    (TakeOrderedAndProject: parallel per-partition heaps) *before* the
    global row_number window, so the single-partition window only ever
    sees ``per_branch_limit`` rows — without it, ranking a large branch
    is a full single-partition sort.  Pass None only for pre-truncated
    branches.
    """
    if not branches:
        raise ValueError("need at least one branch")
    ranked = []
    for i, b in enumerate(branches):
        w = Window.orderBy(F.desc(score_col), F.asc(on))
        branch = b.select(on, score_col)
        if per_branch_limit is not None:
            branch = branch.orderBy(F.desc(score_col), F.asc(on)).limit(
                per_branch_limit
            )
        ranked.append(
            branch.withColumn("_rank", F.row_number().over(w))
            .select(
                F.col(on),
                (F.lit(1.0) / (F.lit(float(k)) + F.col("_rank"))).alias("_contrib"),
            )
        )
    # union + one aggregation instead of an N-way full-outer join ladder:
    # full-outer joins can't broadcast-hash in Spark and each ladder step
    # is its own shuffle; a union of the (tiny, pre-truncated) branches
    # fuses any number of them with a single groupBy on the candidate ids.
    # Missing ids simply contribute nothing.  (Double addition is
    # commutative, so 2-branch fusion is bit-identical to the join form;
    # ≥3 branches may differ in the last ulp from any fixed order.)
    allc = ranked[0]
    for nxt in ranked[1:]:
        allc = allc.unionByName(nxt)
    return (
        allc.groupBy(on)
        .agg(F.sum("_contrib").alias(fused_col))
        .orderBy(F.desc(fused_col), F.asc(on))
    )


def v_fusion(scores: Sequence[Column], method: str = "rrf", weights: Sequence[float] | None = None) -> Column:
    """Scalar fusion over score columns on one row — the corpus's literal
    ``V_FUSION([score1, score2], 'method')`` shape.

    ``rrf`` here degrades to a sum of reciprocal *scores* (documented
    semantic difference — true RRF is ``rrf_fuse``); ``weighted_sum`` and
    ``max`` are exact.
    """
    scores = list(scores)
    if not scores:
        raise ValueError("need at least one score column")
    if method == "max":
        return F.greatest(*scores) if len(scores) > 1 else scores[0]
    if method == "weighted_sum":
        if weights is None:
            weights = [1.0] * len(scores)
        total = scores[0] * F.lit(float(weights[0]))
        for s, w in zip(scores[1:], weights[1:]):
            total = total + s * F.lit(float(w))
        return total
    if method == "rrf":
        total = F.lit(1.0) / (F.lit(float(RRF_K)) + scores[0])
        for s in scores[1:]:
            total = total + F.lit(1.0) / (F.lit(float(RRF_K)) + s)
        return total
    raise ValueError(f"unknown fusion method {method!r}")
