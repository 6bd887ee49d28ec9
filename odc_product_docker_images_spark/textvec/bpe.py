"""BPE subword tokenization (SURVEY.md §2.10 X4 — "token counting with a
BPE-ish tokenizer", upgraded from the regex approximation to REAL greedy
byte-pair-encoding application).

The merge table below was trained OFFLINE with the classic BPE procedure
(count adjacent symbol pairs over the word-frequency dict, merge the most
frequent, repeat; count-desc + lexicographic tie-break makes the training
deterministic) on the fixture corpus — shipping the merge ranks as a
static artifact mirrors how production tokenizers deploy (the tokenizer
file is data, not code).  Application is the standard greedy algorithm:
per word, repeatedly merge the PRESENT pair with the best (lowest) rank
until none applies — inherently iterative and data-dependent, hence a
Pandas-UDF kernel and a rows-only registration (the pytest oracle is an
independent pure-Python implementation; no SQL engine expresses the
fixpoint loop)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import fanout, load
from ..registry import register

# Offline-trained on sf0.01 documents (24 merges; see module docstring).
_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("p", "a"), ("pa", "r"),
    ("o", "in"), ("j", "oin"), ("s", "h"), ("h", "a"), ("ha", "sh"),
    ("r", "ow"), ("c", "h"), ("b", "at"), ("bat", "ch"), ("s", "c"),
    ("sc", "a"), ("sca", "n"), ("u", "st"), ("ust", "o"),
]
_RANK = {p: i for i, p in enumerate(_MERGES)}


def bpe_word(word: str, rank: dict[tuple[str, str], int] | None = None) -> list[str]:
    """Greedy BPE apply: merge the best-ranked present pair until stable.
    All occurrences of the chosen pair merge left-to-right per round —
    the classic reference algorithm.  ``rank`` defaults to the static
    deployed table; the trainer passes its growing table explicitly."""
    if rank is None:
        rank = _RANK
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = rank.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


@register(
    "text_bpe_tokens",
    doc="X4: REAL greedy BPE tokenization (static offline-trained merge "
    "ranks) — per-doc subword counts via an Arrow-batched kernel; "
    "rows-only (the merge fixpoint is not SQL-expressible; pytest oracle "
    "is an independent pure-Python BPE)",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: subword token accounting with a REAL BPE tokenizer — the unit
    every training-data budget is denominated in.  Per document: word
    count, character-symbol count (pre-merge floor), BPE token count, and
    the compression ratio chars/tokens (per-row IEEE divide).  Spark-first
    shape: the merge table rides into each Arrow batch as a closure
    constant (broadcast-equivalent), the kernel is ``mapInPandas`` over
    repartitioned input (single-file fixture would serialize otherwise),
    and nothing shuffles at all — token counting is embarrassingly
    parallel, which is exactly why it belongs in a map pass, not a UDF
    per row.  At 100 TB: linear scan, zero exchange; a vocab-id emission
    variant would add one broadcast of the subword→id dict."""
    docs = load(spark, sf_dir, "documents").repartition(fanout(spark)).select("doc_id", "text")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in text.split(" ") if w]
                n_sym = sum(len(w) for w in words)
                n_bpe = sum(len(bpe_word(w)) for w in words)
                rows.append((doc_id, len(words), n_sym, n_bpe))
            out = pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_symbols", "n_bpe_tokens"]
            )
            out["compression"] = out["n_symbols"] / out["n_bpe_tokens"]
            yield out

    return docs.mapInPandas(
        kernel,
        "doc_id long, n_words long, n_symbols long, n_bpe_tokens long, compression double",
    )


def _rank_pairs(pairs: DataFrame, top_n: int) -> DataFrame:
    """count-desc + (l, r) lexicographic rank of a (l, r, pair_count)
    stream — TakeOrdered top_n first, then a row_number over those few
    rows only (never a global single-task window)."""
    from pyspark.sql import Window

    top = pairs.orderBy(F.desc("pair_count"), "l", "r").limit(top_n)
    w = Window.orderBy(F.desc("pair_count"), "l", "r")
    return top.select(
        "l", "r", "pair_count", F.row_number().over(w).cast("bigint").alias("rank")
    )


def _word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark))
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train_pair_counts(
    spark: SparkSession, sf_dir: str, merges: list[tuple[str, str]], top_n: int = 20
) -> DataFrame:
    """One BPE TRAINING iteration at any merge depth K: symbolize each
    word type with the first K merges, count adjacent symbol pairs
    weighted by word frequency, rank count-desc.  Row 1 is the next merge
    the classic trainer would pick.  K=0 stays pure Catalyst (the
    registered, full-oracle form); K>0 symbolizes via the same Arrow
    kernel `text_bpe_tokens` uses (verified in pytest against an
    independent pure-Python trainer)."""
    wf = _word_freq(spark, sf_dir)
    if not merges:
        # length(w) > 1 guard: sequence(1, 0) is the DESCENDING array [1, 0]
        # in Spark, so an unguarded 1-char word emits two spurious pairs
        # the oracle never produces (found in round-5 self-review)
        pairs = wf.where(F.length("w") > 1).select(
            F.expr(
                "inline(transform(sequence(1, length(w) - 1),"
                " i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r)))"
            ),
            "freq",
        )
    else:
        rank = {p: i for i, p in enumerate(merges)}

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for word, freq in zip(pdf["w"], pdf["freq"]):
                    sym = bpe_word(word, rank)
                    rows.extend(
                        (sym[i], sym[i + 1], int(freq))
                        for i in range(len(sym) - 1)
                    )
                yield pd.DataFrame(rows, columns=["l", "r", "freq"])

        pairs = wf.mapInPandas(kernel, "l string, r string, freq long")
    counts = pairs.groupBy("l", "r").agg(F.sum("freq").alias("pair_count"))
    return _rank_pairs(counts, top_n)


@register(
    "text_bpe_train_step",
    oracle="""
        WITH wf AS (
            SELECT w, COUNT(*) AS freq
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents) t
            WHERE w <> ''
            GROUP BY 1
        ), wi AS (
            -- length-driven per-row UNNEST (no fixed word-length cap)
            SELECT w, freq, UNNEST(RANGE(1, CAST(LEN(w) AS BIGINT))) AS i
            FROM wf
        ), p AS (
            SELECT SUBSTRING(w, CAST(i AS INTEGER), 1) AS l,
                   SUBSTRING(w, CAST(i AS INTEGER) + 1, 1) AS r,
                   SUM(freq) AS pair_count
            FROM wi
            GROUP BY 1, 2
        )
        SELECT l, r, CAST(pair_count AS BIGINT) AS pair_count,
               CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, l, r) AS BIGINT)
                 AS rank
        FROM p
        ORDER BY pair_count DESC, l, r
        LIMIT 20
    """,
)
def text_bpe_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4++/r5: the distributed BPE merge-TRAINING step — adjacent-pair
    counts over the word-frequency dict, ranked count-desc with the
    classic (l, r) lexicographic tie-break; row 1 is the merge the
    trainer adopts next.  This is the induction step that produced the
    static `_MERGES` table `text_bpe_tokens` applies, completing the
    tokenizer loop the way `sim_kmeans_step` completes IVF training.

    Spark-first: the word-freq dict is one groupBy (classic BPE counts
    pairs per word TYPE × corpus frequency, so the pair stage's input is
    |vocab|, not |corpus|); pair extraction is a codegen'd
    inline(transform(sequence(...))) — no Python at K=0 — and the ranked
    head is TakeOrdered + a 20-row window.  At 100 TB the vocab agg is
    the only corpus-sized shuffle; each further K re-runs with the grown
    merge list (driver loop bounded by vocab size, the standard trainer
    shape)."""
    return bpe_train_pair_counts(spark, sf_dir, [], top_n=20)
