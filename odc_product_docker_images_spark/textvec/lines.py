"""Corpus-level boilerplate-span dedup (SURVEY.md §2.10 X4++).

The CCNet/RefinedWeb pass every web-scale curation pipeline runs BEFORE
document-level dedup: hash each paragraph/line across the WHOLE corpus,
count how many documents repeat it, and strip (or down-weight) the spans
that recur everywhere — navigation chrome, cookie banners, license
footers.  Document-granularity dedup (X1/X2) cannot catch these: the
documents differ, the spans repeat.

Fixture adaptation: the synthetic corpus has no newlines, so the "line"
unit is the deterministic non-overlapping 8-token chunk (the same
windowing convention as ``udtf_chunk_text``).  The relational shape is
identical to the real pass: explode doc → spans, one hash agg for
corpus-wide document frequency, one equi-join back, one per-doc rollup —
three linear shuffles keyed on span/doc, nothing quadratic, no Python.
At 100 TB the span→df map is exactly the MinHash-shingle cost model
(shuffle rows = span count), and the df side aggregates BEFORE the join so
the join input is one row per distinct span, not per occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import load
from ..registry import register

_W = 8  # tokens per span
_DF = 3  # a span in >= _DF distinct docs is boilerplate
_MAX_CHUNKS = 20  # fixture texts are <= ~100 tokens -> <= 13 chunks


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → its non-overlapping 8-token spans (one row per span)."""
    # single-file input -> one partition; repartition BEFORE the span
    # explode so the fan-out and the df-join probe side parallelize
    dc = load(spark, sf_dir, "documents").repartition(32, "doc_id")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(_W)).cast("long")
    return (
        dc.select(
            "doc_id",
            toks.alias("toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci"),
        )
        .select(
            "doc_id",
            "ci",
            F.array_join(
                F.expr(f"slice(toks, ci * {_W} + 1, {_W})"), " "
            ).alias("span"),
        )
    )


_SQL_SPANS = f"""
            SELECT doc_id, r.ci,
                   ARRAY_TO_STRING(toks[r.ci * {_W} + 1 : r.ci * {_W} + {_W}], ' ') AS span
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents) t
            CROSS JOIN RANGE(0, {_MAX_CHUNKS}) r(ci)
            WHERE r.ci < CAST(CEIL(LEN(toks) / {float(_W)!r}) AS BIGINT)
"""


@register(
    "dedup_boilerplate",
    oracle=f"""
        WITH spans AS ({_SQL_SPANS}),
        df AS (
            SELECT span, COUNT(DISTINCT doc_id) AS span_df
            FROM spans GROUP BY span
        )
        SELECT s.doc_id,
               COUNT(*) AS n_spans,
               CAST(SUM(CASE WHEN d.span_df >= {_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
               {sql_dround(f"SUM(CASE WHEN d.span_df >= {_DF} THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)")} AS boiler_frac
        FROM spans s JOIN df d USING (span)
        GROUP BY s.doc_id
    """,
)
def dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4++: corpus-wide boilerplate-span profile per document — span
    document-frequency via one hash agg, equi-join back on the span, per-doc
    boilerplate fraction.  The df aggregate collapses to one row per
    DISTINCT span before the join (at web scale: navigation chrome is few
    distinct strings with huge df — the distinct-side join input stays
    small even when occurrences are billions; the hot-span skew lives in
    the JOIN probe side, which AQE skew-split handles, not in a shuffle
    key)."""
    spans = _spans(spark, sf_dir)
    df = spans.groupBy("span").agg(F.countDistinct("doc_id").alias("span_df"))
    boiler = F.when(F.col("span_df") >= _DF, 1).otherwise(0)
    return (
        spans.join(df, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(boiler).alias("n_boiler"),
            dround(
                F.sum(boiler) / F.count(F.lit(1)).cast("double"), 6
            ).alias("boiler_frac"),
        )
    )
