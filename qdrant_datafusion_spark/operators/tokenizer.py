"""Distributed tokenizer training — BPE merge-rule learning over a corpus.

The standard pipeline stage between cleaning and packing that sits beside
token counting (functions/text.py's BPE-ish regex counter is a *heuristic*;
this learns real merge rules).  Part of the beyond-reference LLM-pipeline
surface (SURVEY.md §2.12) — the reference engine (qdrant-datafusion) has no
tokenizer trainer.

Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"): start from the character-level symbol sequence of
each distinct word (plus an end-of-word marker), then repeat N times:
count adjacent symbol pairs weighted by word frequency, merge the most
frequent pair everywhere (greedy left-to-right within a word), record the
rule.  The learned ``(rank, left, right, pair_count)`` table IS the
tokenizer.

Scale design (the pagerank/MMR recipe):

- the corpus collapses to the DISTINCT-WORD table up front — one
  shuffle, after which every iteration touches only the vocabulary
  (bounded by distinct words, not corpus size; at 100 TB the word table
  is millions of rows, not trillions of tokens);
- each merge iteration is ONE groupBy (pair counts, map-side combined)
  + ONE argmax (``orderBy().limit(1)`` → TakeOrdered, no global sort)
  + ONE narrow map (string ``replace``) — no joins, no growth;
- the word table is ``localCheckpoint``-ed per iteration so lineage stays
  flat across N iterations (Catalyst would otherwise replay all prior
  merges on every pass);
- driver state is exactly N merge rows — the same bounded-collect budget
  as IVF training and MMR.  N sequential jobs: BPE is inherently
  sequential (each merge conditions the next pair counts).

Engine-portable exactness: symbol sequences are flat strings with a
two-byte U+001F boundary between symbols (``␟␟a␟␟b␟␟``); applying merge
(a,b) is ``replace('␟a␟␟b␟' → '␟ab␟')``.  The single-␟ pattern edges
anchor on true boundaries only (symbols never contain the separator), and
consuming one boundary byte per side leaves the neighbour's boundary
intact, so left-to-right non-overlapping ``replace`` — identical in
Spark, DuckDB, and Python — reproduces classic greedy BPE exactly
(``aaaa`` + (a,a) → ``aa aa``, not ``aa a a``).  Pair counts are integer,
ties break on (count DESC, left ASC, right ASC): fully deterministic, so
an unrolled-CTE SQL oracle matches bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qdrant_datafusion_spark.session import fan_out

__all__ = [
    "SEP",
    "END_MARK",
    "train_bpe",
    "bpe_reference",
    "train_unigram",
    "unigram_reference",
    "bpe_vocab_ids",
    "bpe_encode",
    "bpe_encode_reference",
    "bpe_encode_via_words",
    "unigram_encode",
    "unigram_encode_reference",
]

#: symbol separator (U+001F unit separator — never in natural text);
#: boundaries between symbols are TWO of these, merge patterns consume one
#: from each flanking boundary
SEP = "\x1f"
_B = SEP + SEP

#: end-of-word marker appended as a final single-char symbol (U+001E)
END_MARK = "\x1e"


#: ASCII whitespace class used by BOTH the Spark trainer and the Python
#: reference — ``str.split()`` splits ALL Unicode whitespace while Spark's
#: ``\s`` (and DuckDB RE2's) is ASCII-only, so an explicit shared class is
#: the only way the three engines tokenize identically.
_WS_CLASS = r"[ \t\n\r\f\x0b]+"


def _words(df: DataFrame, text_col: str) -> DataFrame:
    """corpus → distinct lowercased words ``(_w, _n)`` — the shared
    tokenization of the whole trainer family (BPE and unigram): marker
    chars U+001F/U+001E stripped, explicit ASCII whitespace class (see
    _word_table's docstring for the cross-engine rationale)."""
    clean = F.regexp_replace(F.lower(F.col(text_col)), "[\x1f\x1e]", "")
    # fan_out BEFORE the split/explode/partial-agg: on a single-row-group
    # file the whole word walk otherwise runs in one scan task
    # (session.fan_out); keyed on the text itself — deterministic, and
    # there is no id column in this contract
    return (
        fan_out(df.select(F.col(text_col)), text_col)
        .select(F.explode(F.split(clean, _WS_CLASS)).alias("_w"))
        .where(F.length("_w") > 0)
        .groupBy("_w")
        .agg(F.count("*").cast("long").alias("_n"))
    )


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """corpus → distinct lowercased whitespace words with frequencies,
    each as the boundary-joined character symbol string.

    The control characters U+001F/U+001E are STRIPPED from the input
    first: they are the symbol-boundary / end-of-word markers of the
    encoding, and a corpus byte colliding with them would corrupt the
    merge ``replace`` patterns.  Both never occur in natural text.

    Cross-engine caveat (documented, not guarded): Spark ``split(w, '')``
    and Python ``list(w)`` both split CODE POINTS, but DuckDB's
    ``string_split(w, '')`` splits grapheme clusters — the generated
    unrolled-CTE oracle is therefore exact on corpora whose words are
    single-codepoint graphemes (all ASCII, and most non-combining text);
    the trainer itself is codepoint-correct on any input.
    """
    words = _words(df, text_col)
    return words.select(
        F.concat(
            F.lit(_B),
            F.array_join(
                F.split(F.concat(F.col("_w"), F.lit(END_MARK)), ""), _B
            ),
            F.lit(_B),
        ).alias("_syms"),
        "_n",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies, weighted by word frequency."""
    arr = F.split(F.trim(F.col("_syms"), F.lit(SEP)), _B)
    pairs = F.expr(
        "transform(sequence(0, size(_arr) - 2),"
        " j -> struct(_arr[j] AS a, _arr[j + 1] AS b))"
    )
    return (
        vocab.select(arr.alias("_arr"), "_n")
        .where(F.size("_arr") >= 2)
        .select(F.explode(pairs).alias("_p"), "_n")
        .groupBy(F.col("_p.a").alias("left"), F.col("_p.b").alias("right"))
        .agg(F.sum("_n").cast("long").alias("pair_count"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    materialize: bool = True,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns ``[(rank, left, right, pair_count), ...]`` (rank 1-based) — a
    list, not a DataFrame, because the result IS driver state (N rows);
    callers wanting a DataFrame wrap it with ``spark.createDataFrame``.
    Stops early if the vocabulary runs out of adjacent pairs.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if n_merges > 10_000:
        # each merge is one Spark job over the word table; vocabularies
        # beyond ~10k merges belong in a specialized trainer loop
        raise ValueError("n_merges > 10000: one Spark job per merge")
    vocab = _word_table(df, text_col)
    if materialize:
        vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("pair_count"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word fully merged
        a, b, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((rank, a, b, cnt))
        vocab = vocab.withColumn(
            "_syms",
            F.replace(
                F.col("_syms"),
                F.lit(SEP + a + _B + b + SEP),
                F.lit(SEP + a + b + SEP),
            ),
        )
        if materialize:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_reference(
    texts: list[str], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Pure-Python reference implementation (same greedy semantics) for
    equality testing — dict-based, no Spark.  Mirrors the trainer's input
    normalization exactly: U+001F/U+001E stripped, ASCII whitespace class
    (NOT ``str.split()``, which splits all Unicode whitespace)."""
    import re

    ws = re.compile(_WS_CLASS)
    freq: dict[str, int] = {}
    for t in texts:
        for w in ws.split(t.lower().replace(SEP, "").replace(END_MARK, "")):
            if not w:
                continue
            freq[w] = freq.get(w, 0) + 1
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in freq.items():
        key = tuple(list(w) + [END_MARK])
        vocab[key] = vocab.get(key, 0) + n
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)  # greedy left-to-right
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


# ===========================================================================
# Unigram-LM (SentencePiece-style) tokenizer training — the EM sibling of
# train_bpe, completing the tokenizer family a training-data pipeline
# actually chooses between (Kudo 2018, "Subword Regularization").  Hard-EM
# (Viterbi) variant so every step is integer-deterministic and an
# unrolled-CTE DuckDB oracle can reproduce it bit-for-bit:
#
#   seed    all substrings of the distinct words up to ``max_piece_len``,
#           occurrence-weighted; vocabulary = every single character
#           (mandatory — keeps all words segmentable) + the top
#           ``seed_multi`` multi-char pieces by (count DESC, piece ASC);
#   E-step  Viterbi-segment each DISTINCT word under integer piece costs
#           cost(p) = Q(T) − Q(cnt_p) where Q(x) = floor(ln(x)·10^6 + 0.5)
#           and T = Σ cnt (the quantized unigram negative log-likelihood);
#           ties break on (total cost ASC, piece count ASC, segmentation
#           string ASC) — fully ordered, so one optimum;
#   M-step  re-count pieces over the segmentations (word-frequency
#           weighted); single chars are retained with count
#           max(observed, 1) (a dropped character would make some word
#           unsegmentable), multi-char pieces are pruned to the top
#           ``keep_multi`` — zero-count pieces drop out naturally.
#
# Scale design (same shape as train_bpe): the corpus collapses to the
# distinct-word table once; each iteration is ONE Arrow-batched Viterbi
# map over that table (costs broadcast — the vocabulary is bounded by
# seed construction) + ONE explode/groupBy re-count.  Driver state is the
# vocabulary itself (≤ alphabet + seed_multi rows), the same bounded
# budget as IVF centroids and BPE merges.
#
# Cross-engine exactness: costs are integers, but Q() itself evaluates
# ln() in double precision on both engines (glibc on this container for
# CPython *and* DuckDB).  _qlog therefore ASSERTS that ln(x)·10^6 + 0.5
# is ≥ 1e-6 away from every integer boundary — any count for which the
# two engines' last-ulp could disagree fails loudly instead of silently
# diverging.  String tie-breaks compare bytes (DuckDB) vs code points
# (Python/Spark): identical on ASCII corpora — the documented trainer
# precondition (see _word_table).
# ===========================================================================

#: quantization scale for log-costs (6 decimal digits of ln)
_QSCALE = 1_000_000


def _qlog(x: int) -> int:
    """floor(ln(x)·10^6 + 0.5) with a cross-engine boundary guard."""
    v = math.log(x) * _QSCALE + 0.5
    frac = v - math.floor(v)
    if min(frac, 1.0 - frac) < 1e-6 and x != 1:  # ln(1)=0 -> frac=0.5 exact
        raise AssertionError(
            f"_qlog boundary hazard: ln({x})*{_QSCALE}+0.5 = {v!r} is within "
            "1e-6 of an integer — cross-engine rounding could disagree; "
            "bump _QSCALE or perturb the fixture"
        )
    return int(math.floor(v))


def _viterbi(word: str, costs: dict[str, int], max_piece_len: int):
    """Min-(cost, n_pieces, seg) segmentation DP; ``seg`` is the
    SEP-prefixed SEP-joined piece string (matches the SQL oracle's
    ``seg || chr(31) || piece`` accumulator byte-for-byte)."""
    best: list[tuple[int, int, str] | None] = [None] * (len(word) + 1)
    best[0] = (0, 0, "")
    for p in range(1, len(word) + 1):
        cands = []
        for k in range(1, min(max_piece_len, p) + 1):
            c = costs.get(word[p - k : p])
            if c is None or best[p - k] is None:
                continue
            pc, pn, ps = best[p - k]
            cands.append((pc + c, pn + 1, ps + SEP + word[p - k : p]))
        best[p] = min(cands) if cands else None
    out = best[len(word)]
    if out is None:  # unreachable while all single chars stay in vocab
        raise AssertionError(f"unsegmentable word: {word!r}")
    return out


def _unigram_step(
    vocab: list[tuple[str, int]],
    words: DataFrame,
    chars: list[str],
    max_piece_len: int,
    keep_multi: int,
) -> list[tuple[str, int]]:
    """One hard-EM iteration: Viterbi E-step over the distinct-word table
    (Arrow-batched, costs broadcast in the UDF closure) + groupBy M-step
    + char-retaining prune.  Returns the new vocabulary."""
    from pyspark.sql.functions import pandas_udf

    total = sum(c for _, c in vocab)
    qt = _qlog(total)
    costs = {p: qt - _qlog(c) for p, c in vocab}
    L = max_piece_len

    # lambda form: with `from __future__ import annotations` the hints
    # stringify and pandas is not a module-level import here
    _seg = pandas_udf(
        lambda w: w.map(lambda s: _viterbi(s, costs, L)[2]), "string"
    )

    counted = (
        words.select(_seg(F.col("_w")).alias("_seg"), "_n")
        .select(
            F.explode(
                F.split(F.expr(f"substring(_seg, 2)"), SEP, -1)
            ).alias("piece"),
            "_n",
        )
        .groupBy("piece")
        .agg(F.sum("_n").cast("long").alias("cnt"))
        .collect()  # bounded: <= current vocabulary size
    )
    observed = {r["piece"]: int(r["cnt"]) for r in counted}
    new_vocab = [(ch, max(observed.get(ch, 0), 1)) for ch in chars]
    multi = sorted(
        ((p, c) for p, c in observed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:keep_multi]
    return new_vocab + multi


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_multi: int = 60,
    keep_multi: int = 40,
    n_iters: int = 3,
    top_k: int = 40,
) -> list[tuple[int, str, int]]:
    """Learn a unigram-LM piece vocabulary from the corpus.

    Returns ``[(rank, piece, count), ...]`` — the ``top_k`` final pieces
    by (count DESC, piece ASC), rank 1-based.  A list, not a DataFrame,
    because the vocabulary IS bounded driver state (same contract as
    train_bpe).
    """
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    if n_iters > 1000:
        raise ValueError("n_iters > 1000: one E/M pass per iteration")
    if seed_multi < 0 or keep_multi < 0 or top_k < 1:
        raise ValueError("seed_multi/keep_multi must be >= 0, top_k >= 1")
    words = _words(df, text_col).localCheckpoint(eager=False)
    L = max_piece_len
    seed_rows = (
        words.select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(_w)), s -> "
                    f"transform(sequence(1, least({L}, length(_w) - s + 1)),"
                    f" k -> substring(_w, s, k))))"
                )
            ).alias("piece"),
            "_n",
        )
        .groupBy("piece")
        .agg(F.sum("_n").cast("long").alias("cnt"))
        .collect()  # bounded: we keep alphabet + seed_multi of these;
        # at true corpus scale substitute a TakeOrdered top-(seed_multi)
        # + a distinct-char agg — the gate fixture's piece table is tiny
    )
    seed = {r["piece"]: int(r["cnt"]) for r in seed_rows}
    chars = sorted(p for p in seed if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_multi]
    vocab = [(ch, seed[ch]) for ch in chars] + multi
    for _ in range(n_iters):
        vocab = _unigram_step(vocab, words, chars, max_piece_len, keep_multi)
    final = sorted(vocab, key=lambda pc: (-pc[1], pc[0]))[:top_k]
    return [(i + 1, p, c) for i, (p, c) in enumerate(final)]


# ===========================================================================
# Tokenizer APPLY — encode the corpus with a learned vocabulary, the other
# half of train→apply that a real pipeline runs (train_bpe/train_unigram
# produce the model; these produce the token ids that pack_sequences /
# token_budget_select consume).  Beyond-reference surface like the trainers.
# ===========================================================================


def bpe_vocab_ids(
    chars: list[str], merges: list[tuple[int, str, str, int]]
) -> list[tuple[str, int]]:
    """The deterministic piece→id table of a trained BPE model: id 0 is
    reserved for <unk>, ids 1..C are the base symbols (single characters
    incl. END_MARK) in codepoint order, id C+rank is merge ``rank``'s
    piece ``left+right``.  Two merges CAN yield the same piece string
    (("ab","c") and ("a","bc") both → "abc"); the table keeps the
    smallest id per piece, exactly like a set-valued tokenizer vocab.
    """
    base = sorted(set(chars) | {END_MARK})
    table: dict[str, int] = {}
    for i, ch in enumerate(base, start=1):
        table.setdefault(ch, i)
    # rank order, not caller order: min id must win on piece collisions
    for rank, a, b, _cnt in sorted(merges):
        table.setdefault(a + b, len(base) + rank)
    return sorted(table.items(), key=lambda kv: kv[1])


def _clean_words(text_col: str):
    """lowercased, marker-stripped whitespace words of ``text_col`` — the
    encode-side twin of :func:`_words` (same normalization, per row
    instead of corpus-distinct)."""
    clean = F.regexp_replace(F.lower(F.col(text_col)), "[\x1f\x1e]", "")
    return F.filter(
        F.split(clean, _WS_CLASS), lambda w: F.length(w) > 0
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[tuple[str, int]] | None = None,
    unk_id: int = 0,
) -> DataFrame:
    """Encode the corpus with a trained BPE model: every word becomes its
    greedy merge-replay segmentation, concatenated in document order.

    Returns ``(id_col, n_tokens, pieces array<string>,
    token_ids array<int>)``.  ``vocab`` is the piece→id table
    (:func:`bpe_vocab_ids`); pieces outside it map to ``unk_id`` (with
    the table derived from the training corpus only characters unseen in
    training can miss — the standard <unk> contract).

    Execution shape — this is the 100 TB path, so it is deliberately
    **pure native expressions, zero shuffles, zero Python**:

    - one projection per document: split to words, each word replayed
      through the ``n_merges`` learned rules as a chain of non-overlapping
      ``replace`` calls on the boundary-joined symbol string — the exact
      operation training applied, so encode reproduces the training
      segmentation bit-for-bit (a later merge can never create a new
      adjacency for an earlier pair: merges only concatenate, so any new
      neighbour is the new symbol itself);
    - the whole thing runs inside WholeStageCodegen over the scan — no
      join, no aggregation, nothing to skew.  A merge table of N rules
      costs N string passes per word; for very large N (>~1k) encode the
      DISTINCT-word table once and broadcast-join back instead (same
      replay, one extra shuffle) — at the gate sizes the direct map wins;
    - the id lookup is a literal map over the bounded vocabulary (driver
      state by the same contract as the merge list itself).
    """
    ordered = sorted(merges, key=lambda m: m[0])
    vocab = _derived_vocab(df, text_col, ordered, vocab)
    pieces = F.coalesce(
        F.flatten(
            F.transform(_clean_words(text_col), _word_pieces_fn(ordered))
        ),
        F.array().cast("array<string>"),  # NULL text = zero tokens
    )
    # fan_out: N replace passes per word all run in the scan stage — one
    # task on a single-row-group file (session.fan_out)
    return _with_token_ids(
        fan_out(df.select(F.col(id_col), F.col(text_col)), id_col).select(
            F.col(id_col), pieces.alias("pieces")
        ),
        id_col,
        vocab,
        unk_id,
    )


def _derived_vocab(df, text_col, ordered, vocab):
    if vocab is not None:
        return vocab
    chars = [
        r["c"]
        for r in _words(df, text_col)
        .select(F.explode(F.split(F.col("_w"), "")).alias("c"))
        .distinct()
        .collect()  # bounded: the corpus alphabet
    ]
    return bpe_vocab_ids(chars, ordered)


def _word_pieces_fn(ordered):
    """Column fn: one word → its greedy merge-replay piece array."""

    def word_pieces(w):
        s = F.concat(
            F.lit(_B),
            F.array_join(F.split(F.concat(w, F.lit(END_MARK)), ""), _B),
            F.lit(_B),
        )
        for _rank, a, b, _cnt in ordered:
            s = F.replace(
                s,
                F.lit(SEP + a + _B + b + SEP),
                F.lit(SEP + a + b + SEP),
            )
        return F.split(F.trim(s, F.lit(SEP)), _B)

    return word_pieces


def _with_token_ids(pieces_df, id_col, vocab, unk_id):
    id_map = F.create_map(
        *[x for p, i in vocab for x in (F.lit(p), F.lit(i))]
    )
    return pieces_df.select(
        id_col,
        F.size("pieces").alias("n_tokens"),
        "pieces",
        F.transform(
            F.col("pieces"),
            lambda p: F.coalesce(
                F.element_at(id_map, p), F.lit(unk_id)
            ).cast("int"),
        ).alias("token_ids"),
    )


def bpe_encode_via_words(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: list[tuple[str, int]] | None = None,
    unk_id: int = 0,
) -> DataFrame:
    """:func:`bpe_encode` through the distinct-word table — the variant
    the direct map's docstring promises for very large merge tables.

    The direct encode replays all N merge rules per word *occurrence*;
    with N in the thousands that is N string passes over every token of
    the corpus.  Here the replay runs once per DISTINCT word (the same
    collapse the trainers use — Zipf makes |distinct| ≪ |occurrences|),
    then an equi-join carries each word's piece array back to its
    positions and one groupBy reassembles documents in word order:

    - shuffle cost: (id, wpos, word) exploded rows + the groupBy — both
      linear in corpus tokens, keyed by doc id (no skew: one document's
      rows are one group);
    - AQE picks a broadcast join automatically while the distinct-word
      table is small; beyond that it degrades to a shuffle join, still
      linear — the trade against the direct map is N× fewer replace
      passes for one extra shuffle;
    - output is BIT-IDENTICAL to :func:`bpe_encode` (same expression
      replays the same rules; proven by the equivalence pytest).
    """
    ordered = sorted(merges, key=lambda m: m[0])
    vocab = _derived_vocab(df, text_col, ordered, vocab)
    words = df.select(
        F.col(id_col),
        F.posexplode(_clean_words(text_col)).alias("_wpos", "_w"),
    )
    enc = (
        words.select("_w")
        .distinct()
        .select(
            "_w", _word_pieces_fn(ordered)(F.col("_w")).alias("_pieces")
        )
    )
    per_doc = (
        words.join(enc, "_w")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_wpos"), F.col("_pieces")))
            ).alias("_wp")
        )
        .select(
            id_col,
            F.flatten(
                F.transform(F.col("_wp"), lambda s: s["_pieces"])
            ).alias("pieces"),
        )
    )
    # wordless documents (empty/NULL text) vanish in the explode; they
    # must come back with empty piece arrays, like the direct encode
    base = df.select(id_col)
    restored = base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(
            F.col("pieces"), F.array().cast("array<string>")
        ).alias("pieces"),
    )
    return _with_token_ids(restored, id_col, vocab, unk_id)


def bpe_encode_reference(
    texts: list[str], merges: list[tuple[int, str, str, int]]
) -> list[list[str]]:
    """Pure-Python encode mirror (greedy merge replay per word) for
    equality testing — one piece list per input text."""
    import re

    ws = re.compile(_WS_CLASS)
    out: list[list[str]] = []
    for t in texts:
        pieces: list[str] = []
        clean = t.lower().replace(SEP, "").replace(END_MARK, "")
        for w in ws.split(clean):
            if not w:
                continue
            syms = list(w) + [END_MARK]
            for _rank, a, b, _cnt in sorted(merges, key=lambda m: m[0]):
                j, nxt = 0, []
                while j < len(syms):
                    if (
                        j + 1 < len(syms)
                        and syms[j] == a
                        and syms[j + 1] == b
                    ):
                        nxt.append(a + b)
                        j += 2
                    else:
                        nxt.append(syms[j])
                        j += 1
                syms = nxt
            pieces.extend(syms)
        out.append(pieces)
    return out


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[int, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode the corpus with a trained unigram-LM vocabulary: every word
    becomes its Viterbi segmentation under the integer piece costs
    ``cost(p) = Q(total) − Q(cnt_p)`` (the training E-step's objective,
    evaluated on the FINAL vocabulary), token id = the piece's 1-based
    ``rank``.

    Returns ``(id_col, n_tokens, pieces array<string>,
    token_ids array<int>)``.  Pass the **full** final vocabulary (train
    with ``top_k`` ≥ alphabet + keep_multi): the mandatory single-char
    pieces are what keep every word segmentable — a word containing a
    character absent from ``vocab`` raises (no silent <unk> here: unigram
    ids are ranks, and inventing one would corrupt the model's id space).

    Execution shape: ONE Arrow-batched map over the rows — the costs
    dict is a closure broadcast (bounded vocabulary), each batch memoizes
    segmentations per distinct word, and ids resolve in the same pass.
    No shuffle, no join; the heavy DP runs vectorized per batch exactly
    like the training E-step (`_unigram_step`).
    """
    from pyspark.sql.functions import pandas_udf

    total = sum(c for _, _, c in vocab)
    qt = _qlog(total)
    costs = {p: qt - _qlog(c) for _, p, c in vocab}
    ranks = {p: int(r) for r, p, _ in vocab}
    L = max_piece_len
    ws_cls = _WS_CLASS

    def _encode_series(texts):
        import re

        ws = re.compile(ws_cls)
        memo: dict[str, list[str]] = {}

        def one(t):
            clean = (t or "").lower().replace(SEP, "").replace(END_MARK, "")
            pieces: list[str] = []
            for w in ws.split(clean):
                if not w:
                    continue
                seg = memo.get(w)
                if seg is None:
                    seg = _viterbi(w, costs, L)[2].split(SEP)[1:]
                    memo[w] = seg
                pieces.extend(seg)
            return pieces

        return texts.map(one)

    _enc = pandas_udf(_encode_series, "array<string>")
    id_map = F.create_map(
        *[x for pc, r in ranks.items() for x in (F.lit(pc), F.lit(r))]
    )
    # fan_out: the Viterbi DP batches otherwise all land in the one scan
    # task of a single-row-group file (session.fan_out)
    return fan_out(
        df.select(F.col(id_col), F.col(text_col)), id_col
    ).select(
        F.col(id_col), _enc(F.col(text_col)).alias("pieces")
    ).select(
        id_col,
        F.size("pieces").alias("n_tokens"),
        "pieces",
        F.transform(
            F.col("pieces"),
            # unreachable while the vocab keeps all single chars
            # (_viterbi raises on unsegmentable words), but 0-fill so the
            # out-of-vocab contract matches the SQL oracle's coalesce(,0)
            lambda p: F.coalesce(
                F.element_at(id_map, p), F.lit(0)
            ).cast("int"),
        ).alias("token_ids"),
    )


def unigram_encode_reference(
    texts: list[str],
    vocab: list[tuple[int, str, int]],
    max_piece_len: int = 4,
) -> list[list[str]]:
    """Pure-Python encode mirror (Viterbi under final-vocab costs)."""
    import re

    total = sum(c for _, _, c in vocab)
    qt = _qlog(total)
    costs = {p: qt - _qlog(c) for _, p, c in vocab}
    ws = re.compile(_WS_CLASS)
    out: list[list[str]] = []
    for t in texts:
        clean = t.lower().replace(SEP, "").replace(END_MARK, "")
        pieces: list[str] = []
        for w in ws.split(clean):
            if w:
                pieces.extend(
                    _viterbi(w, costs, max_piece_len)[2].split(SEP)[1:]
                )
        out.append(pieces)
    return out


def unigram_reference(
    texts: list[str],
    max_piece_len: int = 4,
    seed_multi: int = 60,
    keep_multi: int = 40,
    n_iters: int = 3,
    top_k: int = 40,
) -> list[tuple[int, str, int]]:
    """Pure-Python reference (same hard-EM semantics) for equality
    testing — mirrors train_unigram's normalization and tie-breaks."""
    import re

    ws = re.compile(_WS_CLASS)
    freq: dict[str, int] = {}
    for t in texts:
        for w in ws.split(t.lower().replace(SEP, "").replace(END_MARK, "")):
            if w:
                freq[w] = freq.get(w, 0) + 1
    seed: dict[str, int] = {}
    for w, n in freq.items():
        for s in range(len(w)):
            for k in range(1, min(max_piece_len, len(w) - s) + 1):
                p = w[s : s + k]
                seed[p] = seed.get(p, 0) + n
    chars = sorted(p for p in seed if len(p) == 1)
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_multi]
    vocab = [(ch, seed[ch]) for ch in chars] + multi
    for _ in range(n_iters):
        total = sum(c for _, c in vocab)
        qt = _qlog(total)
        costs = {p: qt - _qlog(c) for p, c in vocab}
        observed: dict[str, int] = {}
        for w, n in freq.items():
            for p in _viterbi(w, costs, max_piece_len)[2].split(SEP)[1:]:
                observed[p] = observed.get(p, 0) + n
        vocab = [(ch, max(observed.get(ch, 0), 1)) for ch in chars] + sorted(
            ((p, c) for p, c in observed.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep_multi]
    final = sorted(vocab, key=lambda pc: (-pc[1], pc[0]))[:top_k]
    return [(i + 1, p, c) for i, (p, c) in enumerate(final)]
