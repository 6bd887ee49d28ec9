"""Shared k-word shingle expression (SURVEY.md §2.10 X2).

Lives in its own non-registering module so every consumer (the dedup
family, the pairwise near-dup closures, curation's repetition scoring)
can import it without triggering another module's query-key registrations
— registration ORDER is load-bearing for the driver's grading window
(see registry._MODULES).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _shingles(col: str = "text", k: int = 3, distinct: bool = True) -> F.Column:
    """k-word shingles as an array column (pure exprs); ``distinct=False``
    keeps positional duplicates (intra-doc repetition scoring needs them)."""
    toks = F.split(F.col(col), " ")
    n = F.size(toks)
    seq = F.sequence(F.lit(1), n - (k - 1))
    make = F.transform(
        seq,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    if distinct:
        make = F.array_distinct(make)
    # guard: sequence(1, x<1) would generate a DESCENDING sequence in Spark
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))
