"""Similarity self-joins: edit distance (PassJoin) + exact Jaccard (prefix filter).

The reference engine exposes no fuzzy string matching; this is part of
the training-data-pipeline surface (entity resolution on near-identical
keys, fuzzy record linkage, OCR/typo-tolerant dedup keys).  Scheme:
Li, Deng, Wang, Feng — "PassJoin: A Partition-based Method for
Similarity Joins" (PVLDB 5(3), 2011), re-expressed as three DataFrame
projections and one equi-join.

Why not brute force: an all-pairs ``levenshtein`` self-join is O(n²)
rows — dead at any scale.  PassJoin's pigeonhole makes the join EQUI:

* split every string into ``d+1`` contiguous segments (``d`` =
  ``max_dist``).  If ``ed(a, b) <= d`` with ``len(a) <= len(b)``, then
  at most ``d`` edits touch ``a``'s ``d+1`` segments, so at least one
  segment survives verbatim inside ``b`` — at a position shifted by at
  most ``d`` (each edit shifts the alignment by <= 1).
* so: index side emits its ``d+1`` segments; probe side emits every
  substring of itself that could BE such a segment (for each candidate
  shorter length ``l`` in ``[m-d, m]``, each segment index, each start
  within ``±d`` of the segment's home position) — at most
  ``(d+1)²·(2d+1)`` short substrings per row (45 at ``d=2``),
  constants, not data-dependent.
* candidates = one hash equi-join on ``(piece, segment_idx, l)``;
  exact ``levenshtein`` (JVM codegen, no UDF) verifies the residue, so
  the result is EXACT despite the filter being a superset.

Scale shape: two narrow projections with constant fan-out, one
shuffle-by-short-string equi-join, one distinct on surviving pairs.
Candidate mass is data-distribution-dependent (a segment value shared
by k rows meets all its probes), but segments are ``~key_len/(d+1)``
chars — at the 13+ chars of the default gate they are near-unique;
hot-segment skew is handled the same way the MinHash band joins do it
(cap or salt the bucket key) if a corpus ever needs it.

Cross-engine caveat (why gates ASCII-normalize the key): DuckDB's
``levenshtein`` counts BYTE edits, Spark's counts CHARACTER edits; they
agree only on ASCII, so oracle-graded keys strip ``[^ -~]`` first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "containment_pairs",
    "edit_distance_pairs",
    "hashed_token_sets",
    "ranked_token_index",
    "set_similarity_pairs",
]


def hashed_token_sets(
    df: DataFrame, tokens_col: Column | str, id_col: str
) -> DataFrame:
    """``(_id, _toks, _n)`` — distinct xxhash64-hashed token sets, the
    shared first stage of :func:`set_similarity_pairs` and
    :func:`containment_pairs` (same rationale as
    ``pipeline.decontaminate``'s 64-bit trick: every downstream shuffle
    carries fixed 8-byte keys instead of shingle strings).  Exposed so a
    caller running BOTH prefix-filter joins over one corpus builds this
    (and :func:`ranked_token_index`) once, pins it, and passes it back
    through the ``base=`` / ``ranked=`` parameters — the
    ``minhash_buckets``/``simhash_buckets`` precomputed-table seam,
    prefix-filter edition."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(
                F.transform(toks, lambda x: F.xxhash64(x))
            ).alias("_toks"),
        )
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") >= 1)
    )


def ranked_token_index(base: DataFrame) -> DataFrame:
    """``(_id, _n, _tok, _rn)`` — every document's tokens ranked
    rarest-first by global ``(frequency, token)`` — the prefix-filter
    ordering both pair joins cut their prefixes from.  One token-count
    shuffle (map-side combined) + one count join-back + one per-doc
    window, shared verbatim by both consumers (the rank order does not
    depend on the threshold; each consumer applies its own prefix-length
    cut to the same ranks)."""
    ex = base.select("_id", "_n", F.explode("_toks").alias("_tok"))
    counts = ex.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.partitionBy("_id").orderBy(
        F.col("_cnt").asc(), F.col("_tok").asc()
    )
    return (
        ex.join(counts, "_tok")
        .withColumn("_rn", F.row_number().over(w))
        .select("_id", "_n", "_tok", "_rn")
    )


def _seg_start(i: str, l: str, d: int) -> str:
    """0-based SQL start of segment ``i`` of a length-``l`` string split
    into ``d+1`` even parts (the last ``l % (d+1)`` parts one longer)."""
    k = d + 1
    return f"({i} * ({l} div {k}) + greatest(0, {i} - ({k} - {l} % {k})))"


def _seg_len(i: str, l: str, d: int) -> str:
    k = d + 1
    return f"(({l} div {k}) + (CASE WHEN {i} >= {k} - {l} % {k} THEN 1 ELSE 0 END))"


def edit_distance_pairs(
    df: DataFrame,
    key_col: Column | str,
    id_col: str,
    max_dist: int = 2,
    new_col: str | None = None,
) -> DataFrame:
    """All unordered pairs with ``levenshtein(key_a, key_b) <= max_dist``.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``.  Rows whose key
    is shorter than ``max_dist + 1`` characters are dropped (segments
    must be non-empty for the pigeonhole; such keys are degenerate for
    edit-distance blocking anyway — document the minimum in the caller).

    ``new_col`` names an optional boolean column marking a NEW ingest
    batch: only pairs with at least one new side are emitted, and —
    the point — corpus-internal candidates are dropped BEFORE the
    verify, so a daily increment pays for batch×corpus work, not
    corpus² (the `dedup_minhash_incremental` contract, fuzzy edition).
    """
    d = int(max_dist)
    if d < 1:
        raise ValueError("max_dist must be >= 1")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    cols = [F.col(id_col).alias("_id"), key.alias("_k")]
    if new_col is not None:
        cols.append(F.col(new_col).cast("boolean").alias("_new"))
    base = (
        df.select(*cols)
        .withColumn("_l", F.length("_k"))
        .filter(F.col("_l") >= d + 1)
    )

    # index side: the d+1 segments of each string (it plays the SHORTER
    # role of a candidate pair)
    st_a, ln_a = _seg_start("i", "_l", d), _seg_len("i", "_l", d)
    segs = base.select(
        F.col("_id").alias("_ida"),
        F.col("_k").alias("_ka"),
        F.col("_l").alias("_la"),
        *([F.col("_new")] if new_col is not None else []),
        F.explode(
            F.expr(
                f"transform(sequence(0, {d}), i -> "
                f"struct(i AS i, substring(_k, {st_a} + 1, {ln_a}) AS piece))"
            )
        ).alias("_sg"),
    ).select(
        "_ida",
        "_ka",
        "_la",
        F.col("_sg.i").alias("_i"),
        F.col("_sg.piece").alias("_piece"),
        *([F.col("_new").alias("_newa")] if new_col is not None else []),
    )

    # probe side: every substring that could be segment i of a shorter
    # partner of length l in [m-d, m], within ±d of its home position.
    # Bounds are always non-empty: max(0, st-d) <= st <= l-len <= m-len.
    st_b, ln_b = _seg_start("i", "l", d), _seg_len("i", "l", d)
    probes = base.select(
        F.col("_id").alias("_idb"),
        F.col("_k").alias("_kb"),
        F.col("_l").alias("_m"),
        *([F.col("_new")] if new_col is not None else []),
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(greatest({d + 1}, _l - {d}), _l), l ->
                    flatten(transform(sequence(0, {d}), i ->
                      transform(
                        sequence(greatest(0, {st_b} - {d}),
                                 least(_l - {ln_b}, {st_b} + {d})),
                        p -> struct(l AS l, i AS i,
                                    substring(_k, p + 1, {ln_b}) AS piece))))))"""
            )
        ).alias("_pr"),
    ).select(
        "_idb",
        "_kb",
        "_m",
        F.col("_pr.l").alias("_pl"),
        F.col("_pr.i").alias("_pi"),
        F.col("_pr.piece").alias("_ppiece"),
        *([F.col("_new").alias("_newb")] if new_col is not None else []),
    )

    # pin the candidate join to sort-merge: BOTH sides are data-sized
    # exploded projections whose size Catalyst estimates from the
    # pre-explode child, so it happily picks a broadcast that
    # materializes at gigabytes on the driver at 100× (observed in the
    # scale probe).  SMJ shuffles on the short piece key — safe at any
    # scale; AQE still handles skewed piece keys.
    cand = segs.hint("merge").join(
        probes,
        on=[
            segs["_piece"] == probes["_ppiece"],
            segs["_i"] == probes["_pi"],
            segs["_la"] == probes["_pl"],
        ],
        how="inner",
    ).filter(
        (F.col("_la") < F.col("_m"))
        | ((F.col("_la") == F.col("_m")) & (F.col("_ida") < F.col("_idb")))
    )
    if new_col is not None:
        # corpus-internal candidates die here, before any levenshtein
        cand = cand.filter(F.col("_newa") | F.col("_newb"))

    # exact verify on the residue, THEN distinct — only true pairs pay
    # the pair-dedup shuffle (a near-dup pair can meet via several
    # (segment, position) keys)
    return (
        cand.withColumn("_dist", F.levenshtein("_ka", "_kb"))
        .filter(F.col("_dist") <= d)
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            F.col("_dist").cast("long").alias("dist"),
        )
        .distinct()
    )


def set_similarity_pairs(
    df: DataFrame,
    tokens_col: Column | str,
    id_col: str,
    t_num: int = 1,
    t_den: int = 2,
    base: DataFrame | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """EXACT Jaccard similarity self-join at threshold ``t_num/t_den``
    via prefix filtering (All-Pairs / PPJoin family: Chaudhuri et al.
    ICDE'06, Bayardo et al. WWW'07) — the scale tier of
    `dedup.ngram_jaccard_dups`, which joins on EVERY shared token and
    melts on hot tokens; this joins only on PREFIX tokens and returns
    the identical exact pair set.

    Pigeonhole: order all tokens by global (frequency, token) — rarest
    first.  If ``J(x,y) >= t`` then ``|x∩y| >= ceil(t·|x|)``, and the
    FIRST common token in that order sits within the first
    ``|x| − ceil(t·|x|) + 1`` tokens of x (all other common tokens come
    after it), and likewise within y's prefix — so every qualifying
    pair meets on a prefix-token equi-join.  Exact
    ``array_intersect`` verifies the residue with the threshold as an
    integer CROSS-MULTIPLICATION (``inter·t_den >= t_num·(n_a+n_b−inter)``)
    — no float compare anywhere, bit-identical on every engine.

    Returns ``(id_a, id_b, inter, n_union, jaccard)`` with
    ``id_a < id_b`` (same shape as ``ngram_jaccard_dups``; ``jaccard``
    is the double ratio of the exact integers).

    Scale shape: one token-count shuffle (map-side combined), one
    count join-back, one per-doc window to take the prefix, one
    prefix-token equi-join whose candidate mass concentrates on RARE
    tokens by construction (frequency order puts every document's
    rarest tokens in its prefix), a distinct over candidate pairs, and
    one verify join.  The length filter
    ``min(n)·t_den >= t_num·max(n)`` prunes size-incompatible pairs
    before the distinct.  Nothing is quadratic in a hot token: a token
    shared by k documents contributes candidates only if it lands in
    prefixes, and high-frequency tokens sort LAST, out of every prefix.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    # hash every token to int64 up front (hashed_token_sets — same
    # 64-bit trick as pipeline.decontaminate): the count shuffle, the
    # prefix equi-join, and the verify intersect all carry fixed 8-byte
    # keys instead of raw shingle strings (~4x narrower for 3-word
    # shingles).  Set cardinalities and intersections are preserved up
    # to xxhash64 collisions (P ~ n_tokens^2 / 2^65 per doc —
    # negligible; the brute-force pytest oracle would surface one).
    # ``base=``/``ranked=`` accept the precomputed tables so several
    # prefix-filter consumers share one build.
    if base is None:
        # the base frame feeds the explode AND both sides of the verify
        # join — pin it once (executor-side, lineage truncated)
        base = hashed_token_sets(df, tokens_col, id_col).localCheckpoint(
            eager=False
        )
    if ranked is None:
        ranked = ranked_token_index(base)
    # prefix length p = n - ceil(t*n) + 1, all-integer:
    # ceil(t*n) = (t_num*n + t_den - 1) div t_den
    prefix = (
        ranked.filter(
            F.col("_rn")
            <= F.col("_n")
            - F.expr(f"(_n * {int(t_num)} + {int(t_den)} - 1) div {int(t_den)}")
            + 1
        )
        .select("_tok", "_id", "_n", "_rn")
    )

    a = prefix.select(
        F.col("_tok"),
        F.col("_id").alias("_ida"),
        F.col("_n").alias("_na"),
        F.col("_rn").alias("_rna"),
    )
    b = prefix.select(
        F.col("_tok"),
        F.col("_id").alias("_idb"),
        F.col("_n").alias("_nb"),
        F.col("_rn").alias("_rnb"),
    )
    # positional filter (the "PP" of PPJoin): a token matched at sorted
    # positions (rna, rnb) caps the overlap at
    # min(na-rna, nb-rnb) + 1 (that token plus everything AFTER it on
    # both sides — anything before it on either side is provably not
    # shared through THIS meeting; a pair whose real overlap includes
    # earlier tokens still meets on its globally-first common token,
    # where the cap is tight).  Required overlap for J >= t is
    # alpha = ceil(t/(1+t) * (na+nb)) — integer form below.
    alpha = F.expr(
        f"(({int(t_num)} * (_na + _nb)) + {int(t_num + t_den)} - 1)"
        f" div {int(t_num + t_den)}"
    )
    cand = (
        # same sort-merge pin as edit_distance_pairs: both prefix sides
        # are data-sized, don't let a misestimated broadcast through
        a.hint("merge").join(b, "_tok")
        .filter(
            (F.col("_ida") < F.col("_idb"))
            & (
                F.least("_na", "_nb") * t_den
                >= F.greatest("_na", "_nb") * t_num
            )
            & (
                F.least(
                    F.col("_na") - F.col("_rna"), F.col("_nb") - F.col("_rnb")
                )
                + 1
                >= alpha
            )
        )
        .select("_ida", "_idb")
        .distinct()
    )

    ta = base.select(F.col("_id").alias("_ida"), F.col("_toks").alias("_ta"))
    tb = base.select(F.col("_id").alias("_idb"), F.col("_toks").alias("_tb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    return (
        cand.join(ta, "_ida")
        .join(tb, "_idb")
        .withColumn("_inter", inter)
        .withColumn("_union", union)
        .filter(F.col("_inter") * t_den >= t_num * F.col("_union"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.col("_inter").cast("long").alias("inter"),
            F.col("_union").cast("long").alias("n_union"),
            (F.col("_inter") / F.col("_union")).alias("jaccard"),
        )
    )


def containment_pairs(
    df: DataFrame,
    tokens_col: Column | str,
    id_col: str,
    t_num: int = 4,
    t_den: int = 5,
    base: DataFrame | None = None,
    ranked: DataFrame | None = None,
) -> DataFrame:
    """EXACT containment self-join: ordered pairs where at least
    ``t_num/t_den`` of the LEFT set's tokens appear in the right set
    (``|x∩y| >= t·|x|``) — the asymmetric near-dup relation Jaccard
    misses: a truncated copy, a quoted excerpt, or boilerplate embedded
    in a larger page scores low Jaccard (union is dominated by the big
    side) but high containment.

    One-sided prefix filtering: the required overlap ``ceil(t·|x|)``
    depends only on the CONTAINED side, so x joins through its prefix
    (``|x| − ceil(t·|x|) + 1`` rarest-first tokens — the globally-first
    common token provably lands there) against the FULL token list of
    every candidate container; the positional cap
    ``min(|x|−rn_x, |y|−rn_y) + 1 >= ceil(t·|x|)`` prunes meetings that
    cannot reach the requirement (tight at the first common token).
    Exact ``array_intersect`` verifies with integer cross-multiplication.

    Returns ``(id_a, id_b, inter, n_a, containment)`` with id_a the
    contained side, ``id_a != id_b`` (both directions can hold for
    near-equal sets and are reported separately).

    Scale shape: the container side is the plain exploded token list
    (data-sized, like every inverted index); the contained side ships
    only prefixes.  Same one count shuffle + SMJ-pinned candidate join
    + distinct + verify as :func:`set_similarity_pairs`.  A hot token
    on the container side meets only the (rare-token) prefixes that
    name it — the frequency order again keeps hot tokens out of probes.
    """
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must satisfy 0 < t_num/t_den <= 1")
    # int64-hashed tokens, same rationale as set_similarity_pairs: the
    # inverted-index side (every token of every container) is the widest
    # shuffle in this operator — 8-byte keys instead of shingle strings.
    # ``base=``/``ranked=`` accept the precomputed tables (the shared
    # hashed-set + rarest-first rank build) so both prefix-filter joins
    # over one corpus pay for it once.
    if base is None:
        base = hashed_token_sets(df, tokens_col, id_col).localCheckpoint(
            eager=False
        )
    if ranked is None:
        ranked = ranked_token_index(base)
    # contained side ships its prefix only; container side ships ALL
    # tokens (its required overlap depends on the partner's size, so it
    # has no local prefix — the inverted-index side of the join)
    need = F.expr(f"(_n * {int(t_num)} + {int(t_den)} - 1) div {int(t_den)}")
    a = ranked.filter(F.col("_rn") <= F.col("_n") - need + 1).select(
        F.col("_tok"),
        F.col("_id").alias("_ida"),
        F.col("_n").alias("_na"),
        F.col("_rn").alias("_rna"),
    )
    b = ranked.select(
        F.col("_tok"),
        F.col("_id").alias("_idb"),
        F.col("_n").alias("_nb"),
        F.col("_rn").alias("_rnb"),
    )
    alpha = F.expr(
        f"(_na * {int(t_num)} + {int(t_den)} - 1) div {int(t_den)}"
    )
    cand = (
        a.hint("merge").join(b, "_tok")
        .filter(
            (F.col("_ida") != F.col("_idb"))
            # container must be able to hold the requirement at all
            & (F.col("_nb") * t_den >= F.col("_na") * t_num)
            & (
                F.least(
                    F.col("_na") - F.col("_rna"), F.col("_nb") - F.col("_rnb")
                )
                + 1
                >= alpha
            )
        )
        .select("_ida", "_idb")
        .distinct()
    )

    ta = base.select(F.col("_id").alias("_ida"), F.col("_toks").alias("_ta"))
    tb = base.select(F.col("_id").alias("_idb"), F.col("_toks").alias("_tb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(ta, "_ida")
        .join(tb, "_idb")
        .withColumn("_inter", inter)
        .filter(F.col("_inter") * t_den >= t_num * F.size("_ta"))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            F.col("_inter").cast("long").alias("inter"),
            F.size("_ta").cast("long").alias("n_a"),
            (F.col("_inter") / F.size("_ta")).alias("containment"),
        )
    )
