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

from ..io import load
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


def bpe_word(word: str) -> list[str]:
    """Greedy BPE apply: merge the best-ranked present pair until stable.
    All occurrences of the chosen pair merge left-to-right per round —
    the classic reference algorithm."""
    sym = list(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = _RANK.get((sym[i], sym[i + 1]))
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
    docs = load(spark, sf_dir, "documents").repartition(32).select("doc_id", "text")

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
