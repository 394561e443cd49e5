"""Vector quantization — the compressed-search tier of the engine.

Qdrant's quantization families (scalar int8, binary) re-expressed
Spark-first (reference scope: the qdrant-datafusion provider serves
collections whose server-side storage uses exactly these compressions;
here they become *columnar* codes so 100 TB of float32 vectors shrink
4-32× before any shuffle).

Everything is native Column expressions — codes are built with
``transform``/``aggregate`` HOFs, distances with integer XOR +
``bit_count`` — so quantized search stays inside whole-stage codegen and
never crosses the Python boundary.

- ``scalar_quantize``   — per-vector min/max → uint8 codes (array<int>)
                          + (lo, scale) reconstruction params
- ``scalar_dequantize`` — codes → approximate float vector
- ``binary_quantize``   — sign bits packed 64-per-bigint (array<bigint>)
- ``hamming_distance``  — XOR + bit_count over packed words
- ``binary_search_topk``— two-stage: Hamming shortlist on packed bits →
                          exact cosine rerank (the 100 TB default for
                          brute-force search: the shortlist scan reads
                          8 bytes/vector instead of 256)

Determinism: code assignment uses ``floor(x + 0.5)`` (half-up for the
non-negative scaled domain), which DuckDB reproduces bit-for-bit — every
operator here has a full value oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qdrant_datafusion_spark.functions.distance import cosine_similarity

#: quantization levels for int8-style codes (0..255)
SCALAR_LEVELS = 255


def _arr(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scalar_quantize(
    df: DataFrame,
    vector_col: str,
    out_col: str = "codes",
    lo_col: str = "q_lo",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Per-vector min/max scalar quantization: float vector → 0..255 codes.

    Each vector carries its own (lo, scale) so reconstruction is
    ``lo + code * scale`` — no global statistics pass, which is what
    keeps this a single narrow map at any scale (no shuffle, no fit
    stage).  scale is (max-lo)/255; constant vectors get scale 0 and
    all-zero codes.  ``floor(x + 0.5)`` rounding keeps an exact DuckDB
    oracle."""
    # all math in float64 (cast BEFORE min/max) so the code assignment is
    # reproducible bit-for-bit by a DOUBLE[]-casting oracle
    v = _arr(vector_col).cast("array<double>")
    lo = F.array_min(v)
    scale = (F.array_max(v) - lo) / F.lit(float(SCALAR_LEVELS))
    # lo/scale land as columns FIRST so the per-element lambda references
    # scalars, not a re-evaluated array_min per element
    out = df.withColumn(lo_col, lo.cast("double")).withColumn(
        scale_col, scale.cast("double")
    )
    codes = F.when(
        F.col(scale_col) > 0.0,
        F.transform(
            v,
            lambda x: F.floor(
                (x - F.col(lo_col)) / F.col(scale_col) + F.lit(0.5)
            ).cast("int"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return out.withColumn(out_col, codes)


def scalar_dequantize(
    codes_col: Column | str, lo_col: Column | str, scale_col: Column | str
) -> Column:
    """codes + (lo, scale) → approximate float vector (array<double>)."""
    lo = _arr(lo_col)
    scale = _arr(scale_col)
    return F.transform(_arr(codes_col), lambda c: lo + c.cast("double") * scale)


def binary_quantize(
    df: DataFrame, vector_col: str, out_col: str = "bits"
) -> DataFrame:
    """Sign-bit binary quantization packed 64 dims per bigint.

    ``bits[w]`` holds dims ``[64w, 64w+64)``; dim d sets bit ``d % 64``
    when ``v[d] > 0``.  A 64-dim float32 vector (256 B) becomes ONE
    bigint (8 B) — the at-rest/shuffle representation for the Hamming
    shortlist stage.  Pure ``aggregate`` over a dim-index sequence, so
    the packing is codegen'd (no UDF)."""
    # SQL text because shiftleft's Python binding takes only a literal
    # shift count — the SQL form accepts the per-dim column exponent
    words = F.expr(
        f"""
        transform(
          sequence(0, cast(ceil(size({vector_col}) / 64.0) as int) - 1),
          w -> aggregate(
            sequence(w * 64, least(w * 64 + 63, size({vector_col}) - 1)),
            cast(0 as bigint),
            (acc, d) -> acc + if({vector_col}[d] > 0.0D,
                                 shiftleft(cast(1 as bigint), d % 64),
                                 cast(0 as bigint))))
        """
    )
    return df.withColumn(out_col, words)


def binary_quantize_query(query: list[float]) -> list[int]:
    """Driver-side packing of a literal query vector (same bit layout)."""
    words = []
    for w in range(0, len(query), 64):
        word = 0
        for j, x in enumerate(query[w : w + 64]):
            if x > 0.0:
                word |= 1 << j
        # two's-complement into signed int64 (bit 63 set -> negative)
        if word >= 1 << 63:
            word -= 1 << 64
        words.append(word)
    return words


def hamming_distance(bits_col: Column | str, query_words: list[int]) -> Column:
    """Popcount of XOR over packed words — one codegen'd expression,
    no array allocation: ``Σ bit_count(bits[w] ^ q[w])``."""
    b = _arr(bits_col)
    total = F.lit(0)
    for w, qw in enumerate(query_words):
        total = total + F.bit_count(
            F.element_at(b, w + 1).bitwiseXOR(F.lit(qw).cast("bigint"))
        )
    return total


def binary_search_topk(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    shortlist: int | None = None,
    bits_col: str | None = None,
) -> DataFrame:
    """Two-stage quantized search: Hamming shortlist → exact cosine top-k.

    Stage 1 scans only the packed bits (8 B per 64 dims) and keeps the
    ``shortlist`` (default 4k) nearest by Hamming distance — a
    TakeOrdered over integers, no shuffle of float vectors.  Stage 2
    re-scores just the shortlist with exact cosine and keeps the top k.
    With a stored ``bits_col`` the float column is only *read* for
    shortlisted rows' re-scoring; at 100 TB the stage-1 scan is ~3% of
    the full-float scan's bytes.

    Ties at the Hamming boundary are broken by id so the shortlist —
    and therefore the result — is deterministic (matching the oracle's
    ``ORDER BY hd, id LIMIT s`` subquery)."""
    shortlist = shortlist or max(4 * k, 64)
    work = df if bits_col else binary_quantize(df, vector_col, "_bits")
    bcol = bits_col or "_bits"
    qwords = binary_quantize_query(query)
    hd = hamming_distance(bcol, qwords).alias("_hd")
    short = (
        work.select(id_col, vector_col, hd)
        .orderBy(F.asc("_hd"), F.asc(id_col))
        .limit(shortlist)
    )
    return (
        short.select(
            id_col,
            F.round(cosine_similarity(F.col(vector_col), query), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def quantization_error_stats(
    df: DataFrame, vector_col: str, id_col: str
) -> DataFrame:
    """One-row audit of scalar-quantization fidelity: max |x - x̂| equals
    scale/2 per vector by construction; this measures it empirically
    (mean/max absolute reconstruction error over the collection) so the
    compression claim is a gated value, not an assumption."""
    q = scalar_quantize(df.filter(_arr(vector_col).isNotNull()), vector_col)
    recon = scalar_dequantize("codes", "q_lo", "q_scale")
    err = F.aggregate(
        F.zip_with(_arr(vector_col), recon, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    per_vec = q.select(F.col(id_col), err.alias("max_err"), F.col("q_scale"))
    return per_vec.agg(
        F.count("*").alias("n"),
        # decimal sum: order-independent across partitionings (oracle parity)
        F.round(
            F.sum(F.col("max_err").cast("decimal(18,12)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_max_err"),
        F.round(F.max("max_err"), 6).alias("worst_err"),
        # reconstruction error is bounded by scale/2 + fp slack
        F.min(F.col("max_err") <= F.col("q_scale") * 0.5 + 1e-9).alias("bound_ok"),
    )


# ---------------------------------------------------------------------------
# product quantization (PQ): m subspaces, k centroids each — codes are m
# small ints (m bytes at k<=256 vs 4*dim bytes of float32), and query
# scoring is an additive lookup over m precomputed distance tables (ADC)
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    vector_col: str,
    m: int = 8,
    k: int = 16,
    iterations: int = 5,
    id_col: str = "id",
) -> list[list[list[float]]]:
    """Train PQ codebooks: deterministic k-means per subspace, reusing the
    IVF trainer on each dim-slice.  Returns ``codebooks[m][k][dim/m]``.

    m × iterations scans — an offline index-build; at 100 TB train on a
    sample and encode with one full pass (:func:`pq_encode`)."""
    from qdrant_datafusion_spark.operators.ann import train_ivf_centroids

    dim = len(df.select(vector_col).filter(
        _arr(vector_col).isNotNull()).first()[0])
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    books = []
    for s in range(m):
        sliced = df.filter(_arr(vector_col).isNotNull()).select(
            F.col(id_col),
            F.slice(_arr(vector_col), s * sub + 1, sub).alias("_sub"),
        )
        books.append(
            train_ivf_centroids(sliced, "_sub", k=k, iterations=iterations,
                                id_col=id_col)
        )
    return books


def _sub_sq_dist(v: Column, s: int, sub: int, centroid: Sequence[float]) -> Column:
    """Squared euclid between dim-slice s of ``v`` and a literal centroid —
    sequential-fold sum so a DuckDB list_dot_product oracle matches."""
    diff = F.zip_with(
        F.slice(v, s * sub + 1, sub).cast("array<double>"),
        F.array(*[F.lit(float(c)) for c in centroid]),
        lambda a, b: a - b,
    )
    return F.aggregate(
        F.zip_with(diff, diff, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    vector_col: str,
    codebooks: Sequence[Sequence[Sequence[float]]],
    out_col: str = "pq_codes",
) -> DataFrame:
    """vector → m codes: per subspace, the 1-based index of the nearest
    centroid (np.argmin first-match-on-ties — the same semantics as
    array_position / DuckDB list_position).  One narrow Arrow-batched map,
    no shuffle: each batch does m broadcasted (n, k, sub) squared-diff
    reductions (the elementwise (a-b)² formula, NOT the a²-2ab+b² GEMM
    expansion, so distances match an elementwise oracle to reduction-order
    ulps; an argmin flip would need two centroids within ~1e-15 of the
    same distance).  The native-expression distance (:func:`_sub_sq_dist`)
    remains the reference formula and is what :func:`pq_search_topk`'s
    oracle reproduces."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = np.asarray(codebooks, dtype=np.float64)  # (m, k, sub)

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        import numpy as np

        M = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        out = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            Ms = M[:, s * sub : (s + 1) * sub]  # (n, sub)
            diff = Ms[:, None, :] - books[s][None, :, :]  # (n, k, sub)
            d = np.einsum("nks,nks->nk", diff, diff)
            out[:, s] = np.argmin(d, axis=1) + 1  # 1-based, first-match
        return pd.Series([row.tolist() for row in out])

    return df.withColumn(out_col, encode(_arr(vector_col)))


def pq_decode(
    codes_col: Column | str,
    codebooks: Sequence[Sequence[Sequence[float]]],
) -> Column:
    """m codes → reconstructed vector (concat of the coded centroids)."""
    codes = _arr(codes_col)
    parts = []
    for s, book in enumerate(codebooks):
        lit_book = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in book]
        )
        parts.append(F.element_at(lit_book, F.element_at(codes, s + 1)))
    return F.concat(*parts)


def pq_adc_score(
    codes_col: Column | str,
    query: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
) -> Column:
    """Asymmetric distance (ADC): Σ_s table_s[code_s], where table_s holds
    the squared distances from the query's s-th slice to every centroid —
    computed driver-side once (query and codebooks are literals), so the
    scan does m array lookups + adds per row and nothing else.  Lower is
    closer."""
    codes = _arr(codes_col)
    sub = len(codebooks[0][0])
    total = F.lit(0.0)
    for s, book in enumerate(codebooks):
        qs = [float(x) for x in query[s * sub : (s + 1) * sub]]
        table = [
            float(sum((a - b) * (a - b) for a, b in zip(qs, c))) for c in book
        ]
        lit_table = F.array(*[F.lit(d) for d in table])
        total = total + F.element_at(lit_table, F.element_at(codes, s + 1))
    return total


def pq_search_topk(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    query: Sequence[float],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    rerank: int | None = None,
) -> DataFrame:
    """Two-stage PQ search: ADC shortlist over codes (m lookups/row) →
    exact cosine rerank.  ``rerank`` (default 4k) bounds stage 2; ties on
    ADC break by id so the shortlist is deterministic.  Returns
    (id, score) — same contract as :func:`binary_search_topk`."""
    from qdrant_datafusion_spark.functions.distance import cosine_similarity

    rerank = rerank or max(4 * k, 64)
    encoded = pq_encode(
        df.filter(_arr(vector_col).isNotNull()), vector_col, codebooks
    )
    short = (
        encoded.withColumn("_adc", pq_adc_score("pq_codes", query, codebooks))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(rerank)
    )
    return (
        short.select(
            id_col,
            F.round(cosine_similarity(F.col(vector_col), list(query)), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_search_topk(
    df: DataFrame,
    vector_col: str,
    id_col: str,
    query: Sequence[float],
    centroids: Sequence[Sequence[float]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    nprobe: int = 2,
    rerank: int | None = None,
) -> DataFrame:
    """IVF + PQ — the classic two-level ANN index, composed from this
    repo's pieces: coarse cells prune the scan (written
    ``partitionBy(ivf_cell)`` the probe is a partition-pruned READ, proof
    in ``test_plans.py::TestIvfPartitionPruning``), PQ/ADC ranks the
    probed cells with m lookups per row, and exact cosine reranks the
    shortlist.  At 100 TB the full-vector column is touched only for
    ``rerank`` rows; everything before that reads cell partitions and
    m-byte codes.  Probe-set selection is driver-side over literal
    centroids (same rule as :func:`~.ann.ivf_topk`)."""
    from qdrant_datafusion_spark.functions.distance import cosine_similarity
    from qdrant_datafusion_spark.operators.ann import assign_ivf_cells

    rerank = rerank or max(4 * k, 64)
    q = [float(x) for x in query]
    cscores = [
        (i, sum(a * b for a, b in zip(q, c))) for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(cscores, key=lambda t: -t[1])[:nprobe]]
    assigned = assign_ivf_cells(
        df.select(id_col, vector_col), vector_col, centroids
    )
    probed = assigned.filter(F.col("ivf_cell").isin(probe))
    encoded = pq_encode(probed, vector_col, codebooks)
    short = (
        encoded.withColumn("_adc", pq_adc_score("pq_codes", q, codebooks))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(rerank)
    )
    return (
        short.select(
            id_col,
            F.round(cosine_similarity(F.col(vector_col), q), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection — the dimension-reduction tier
# ---------------------------------------------------------------------------

def jl_sign_matrix(dim_in: int, dim_out: int, seed: str = "jl") -> list[list[float]]:
    """±1 Rademacher projection matrix, [j][i] layout, derived from md5 of
    ``"j:i:seed"`` — deterministic, engine-independent, and cheap to
    regenerate anywhere (no matrix needs shipping or storing; the seed IS
    the matrix).  First hex digit < 8 → +1, else −1 (unbiased)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{j}:{i}:{seed}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for i in range(dim_out)
        ]
        for j in range(dim_in)
    ]


def jl_project(
    vec: Column | str,
    dim_in: int,
    dim_out: int,
    seed: str = "jl",
) -> Column:
    """Project a ``dim_in`` vector to ``dim_out`` dims with the ±1 JL
    transform: ``out_i = (Σ_j v_j · s_ji) / √dim_out``.

    Johnson–Lindenstrauss: pairwise distances distort by at most ε with
    dim_out = O(ln n / ε²) — the standard pre-compression before LSH /
    brute-force rerank when embeddings are wide (a 4096-d → 64-d
    projection cuts every downstream shuffle, GEMM block, and broadcast
    by 64× while keeping neighbor ranking approximately intact).

    Execution: pure codegen'd Column — one ``zip_with`` + sequential
    ``aggregate`` fold per output dim against a LITERAL sign array
    (no UDF, no shuffle, deterministic float order for the oracle).
    The fold is left-to-right, so results are bit-identical across
    engines that evaluate the same order (DuckDB oracle mirrors the
    term order textually).
    """
    import math

    signs = jl_sign_matrix(dim_in, dim_out, seed)
    scale = 1.0 / math.sqrt(dim_out)
    v = _arr(vec)
    outs = []
    for i in range(dim_out):
        col_signs = F.array(*[F.lit(signs[j][i]) for j in range(dim_in)])
        prod = F.zip_with(v, col_signs, lambda a, b: a.cast("double") * b)
        outs.append(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x) * F.lit(scale)
        )
    return F.array(*outs)
