"""Exact-count stratified sampling (SURVEY.md §2.10 X4++).

The companion to ``data_mix_sample`` (hash-gate Bernoulli by source
weight): when the mixture spec demands EXACT per-stratum counts — "take
exactly ⌈20%⌉ of every language, reproducibly" — the Bernoulli gate's
binomial variance is not acceptable and the pipeline needs rank-based
selection.

Spark-first shape: order each stratum by a deterministic content-free hash
(md5 of the key — both engines render identical lowercase hex) and keep
``row_number ≤ ⌈rate · stratum_size⌉`` via one window pass.  Every part is
engine-portable, so the key carries a FULL value oracle: same hash, same
ranking, same ceiling arithmetic in DuckDB.

Scale note (100 TB): the window costs one shuffle on the stratum key plus
a per-stratum sort.  Strata here are few and huge, which is exactly where
a naive global-window would bottleneck — but ``row_number`` over a
PARTITIONed window is NOT a single-task global sort (each stratum sorts
within its own partitions after the hash exchange; with AQE the sort
spills, never collects).  When even that is too much, the production
escape hatch is a two-pass hash-threshold: approximate the per-stratum
hash quantile at the target rate (mergeable sketch), then filter
``hash < cutoff`` map-side — the same result ± sketch error with zero
sort.  This key keeps the exact form; the sketch form's building block is
``agg_approx_percentile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_RATE = 0.2


@register(
    "sample_stratified",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY lang) AS stratum_n
            FROM documents
        )
        SELECT doc_id, lang, rk, stratum_n
        FROM ranked
        WHERE rk <= CAST(CEIL({_RATE!r} * stratum_n) AS BIGINT)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4++: exact-count stratified sample — ⌈20%⌉ of every language,
    selected by deterministic hash rank (md5 of the doc key; unique
    tie-break on doc_id per the ordering convention).  One window pass:
    ``row_number`` and the stratum size come from the same partition
    window, so the plan is scan → one Exchange on lang → one sort → filter
    (pinned in tests/test_plans.py)."""
    dc = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wc = Window.partitionBy("lang")
    ranked = dc.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("stratum_n"),
    )
    return ranked.where(
        F.col("rk") <= F.ceil(F.lit(_RATE) * F.col("stratum_n")).cast("long")
    )
