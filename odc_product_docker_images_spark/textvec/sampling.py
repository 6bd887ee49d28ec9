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

from ..functions.det import dround, sql_dround
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


_K_WEIGHTED = 5
_KNUTH = 2654435761
_UPRIME = 1000003  # hash-uniform grid

_U_SQL = (
    f"(((doc_id * {_KNUTH}) % {_UPRIME}) + CAST(0.5 AS DOUBLE))"
    f" / CAST({float(_UPRIME)!r} AS DOUBLE)"
)
_WKEY_SQL = sql_dround(f"POWER({_U_SQL}, CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE))")


@register(
    "sample_weighted",
    oracle=f"""
        WITH keyed AS (
            SELECT source, doc_id, n_chars,
                   {_WKEY_SQL} AS wkey
            FROM documents
        ), ranked AS (
            SELECT source, doc_id, n_chars, wkey,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY wkey DESC, doc_id
                   ) AS BIGINT) AS rk
            FROM keyed
        )
        SELECT source, doc_id, n_chars, wkey, rk
        FROM ranked WHERE rk <= {_K_WEIGHTED}
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: weighted sampling WITHOUT replacement, k per stratum, fully
    deterministic — the Efraimidis–Spirakis A-ES scheme with the random
    draw replaced by a multiplicative-hash uniform: key = u^(1/w) with
    u = ((doc_id·2654435761) mod p + 0.5)/p and w = n_chars; the k
    largest keys per source are the sample, and inclusion probability is
    proportional to weight.  Reproducible across runs, engines, and
    cluster sizes (no rand(): a reshuffled corpus selects the same docs —
    the property ``data_mix_sample``'s hash gate has, now for weighted
    draws).  One window pass per stratum, same scale shape as
    ``sample_stratified`` (including its two-pass hash-threshold escape
    hatch for huge strata).  pow is libm → the key rounds 6 dp on both
    engines BEFORE ranking (bit-identical keys ⇒ identical order; doc_id
    breaks rounded ties)."""
    dc = load(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_UPRIME) + F.lit(0.5)
    ) / F.lit(float(_UPRIME))
    wkey = dround(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")))
    keyed = dc.select("source", "doc_id", "n_chars", wkey.alias("wkey"))
    wr = Window.partitionBy("source").orderBy(F.col("wkey").desc(), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(wr).cast("long"))
        .where(F.col("rk") <= _K_WEIGHTED)
    )


_BOTTOM_K = 8


@register(
    "sample_bottomk_hash",
    oracle=f"""
        WITH h AS (
            SELECT source, doc_id,
                   MD5(CAST(doc_id AS VARCHAR)) AS hkey
            FROM documents
        ), ranked AS (
            SELECT source, doc_id, hkey,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY hkey, doc_id) AS rn
            FROM h
        )
        SELECT source, doc_id, hkey, CAST(rn AS INT) AS rn
        FROM ranked WHERE rn <= {_BOTTOM_K}
    """,
)
def sample_bottomk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: deterministic bottom-k-by-hash sampling per stratum — the
    coordination-free, REPRODUCIBLE uniform sample every curation
    experiment needs (same k docs per source on every run, any cluster,
    any partitioning; adding documents only ever swaps members whose
    hash enters the bottom k — the classic bottom-k sketch property,
    which also makes per-stratum samples mergeable across shards).
    MD5 of the key is the sort axis on both engines (identical hex).
    Shape: one hash projection + per-stratum top-k window; at real scale
    the rank pass is preceded by a cheap hash-prefix filter (hkey <
    threshold chosen from k and the stratum-size floor) so the window
    sees a sliver — documented, not needed at fixture sizes."""
    dc = load(spark, sf_dir, "documents")
    h = dc.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hkey")
    )
    ranked = h.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("source").orderBy("hkey", "doc_id")),
    )
    return ranked.where(F.col("rn") <= _BOTTOM_K).select(
        "source", "doc_id", "hkey", F.col("rn").cast("int").alias("rn")
    )
