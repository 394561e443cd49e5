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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SEP", "END_MARK", "train_bpe", "bpe_reference"]

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
    clean = F.regexp_replace(
        F.lower(F.col(text_col)), "[\x1f\x1e]", ""
    )
    words = (
        df.select(F.explode(F.split(clean, _WS_CLASS)).alias("_w"))
        .where(F.length("_w") > 0)
        .groupBy("_w")
        .agg(F.count("*").cast("long").alias("_n"))
    )
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
