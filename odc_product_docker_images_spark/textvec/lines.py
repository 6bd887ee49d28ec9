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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dround, sql_dround
from ..io import fanout, load
from ..registry import register

_W = 8  # tokens per span
_DF = 3  # a span in >= _DF distinct docs is boilerplate
_MAX_CHUNKS = 20  # fixture texts are <= ~100 tokens -> <= 13 chunks


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → its non-overlapping 8-token spans (one row per span)."""
    # single-file input -> one partition; repartition BEFORE the span
    # explode so the fan-out and the df-join probe side parallelize
    dc = load(spark, sf_dir, "documents").repartition(fanout(spark), "doc_id")
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


_WIN_K = 4  # k-gram size (tokens)
_WIN_W = 4  # winnowing window (grams)


@register(
    "text_winnowing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '') AS ts
            FROM documents
        ), grams AS (
            SELECT doc_id, gpos,
                   MD5(ARRAY_TO_STRING(ts[gpos : gpos + {_WIN_K} - 1], ' '))
                       AS gh
            FROM toks
            CROSS JOIN UNNEST(RANGE(1, LEN(ts) - {_WIN_K} + 2)) AS t(gpos)
            WHERE LEN(ts) >= {_WIN_K} + {_WIN_W} - 1
        ), nbrs AS (
            SELECT doc_id, gpos, gh,
                   LAG(gh, 1) OVER w AS l1, LAG(gh, 2) OVER w AS l2,
                   LAG(gh, 3) OVER w AS l3,
                   LEAD(gh, 1) OVER w AS r1, LEAD(gh, 2) OVER w AS r2,
                   LEAD(gh, 3) OVER w AS r3,
                   CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT)
                       AS n_grams
            FROM grams
            WINDOW w AS (PARTITION BY doc_id ORDER BY gpos)
        ), sel AS (
            SELECT doc_id, gpos, gh, n_grams,
                   CAST(
                       gh < LEAST(COALESCE(r1, ''), COALESCE(r2, ''),
                                  COALESCE(r3, ''))
                    OR (gh < LEAST(COALESCE(l1, ''))
                        AND gh < LEAST(COALESCE(r1, ''), COALESCE(r2, '')))
                    OR (gh < LEAST(COALESCE(l1, ''), COALESCE(l2, ''))
                        AND gh < COALESCE(r1, ''))
                    OR gh < LEAST(COALESCE(l1, ''), COALESCE(l2, ''),
                                  COALESCE(l3, ''))
                   AS INTEGER) AS selected
            FROM nbrs
        )
        SELECT doc_id,
               CAST(MAX(n_grams) AS BIGINT) AS n_grams,
               CAST(SUM(selected) AS BIGINT) AS n_fingerprints,
               CAST(SUM(selected) AS DOUBLE) / MAX(n_grams) AS density
        FROM sel GROUP BY doc_id
    """,
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X4: winnowing fingerprint selection (Schleimer-Wilkerson-Aiken
    / MOSS) — pick the minimum k-gram hash of every w-gram window so any
    match of length ≥ w+k−1 is guaranteed caught with density ≈ 2/(w+1):
    the position-robust document fingerprinting behind plagiarism and
    near-dup span detection (``text_fingerprint``'s principled upgrade).

    The per-window argmin NEVER materializes windows: with distinct
    hashes (md5 on token grams), position p is selected iff its hash
    beats min(L_j ∪ R_{{w-1-j}}) for SOME split of its w−1 neighbors —
    so w−1 lag + w−1 lead columns over ONE per-doc ordering decide
    selection locally ('' < every hex digit invalidates incomplete edge
    windows).  One tokenize pass, one doc-partition window stack, exact
    counts; the density column shows the ≈2/(w+1) guarantee."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("ts"),
    ).where(F.size("ts") >= _WIN_K + _WIN_W - 1)
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(ts) - {_WIN_K} + 1), i ->"
                f" md5(array_join(slice(ts, i, {_WIN_K}), ' ')))"
            )
        ).alias("gpos0", "gh"),
    )
    w_d = Window.partitionBy("doc_id").orderBy("gpos0")
    w_all = Window.partitionBy("doc_id")
    # missing neighbors INVALIDATE their split (the textbook algorithm
    # only considers COMPLETE w-windows): '' sorts below every hex digest
    # so gh < '' is false — a +inf sentinel would spuriously select the
    # first/last w-1 positions (caught by the reference-loop test)
    NEG = F.lit("")
    nbrs = grams.select(
        "doc_id",
        "gh",
        *[F.coalesce(F.lag("gh", j).over(w_d), NEG).alias(f"l{j}") for j in (1, 2, 3)],
        *[F.coalesce(F.lead("gh", j).over(w_d), NEG).alias(f"r{j}") for j in (1, 2, 3)],
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_grams"),
    )
    gh = F.col("gh")
    sel = (
        (gh < F.least(F.col("r1"), F.col("r2"), F.col("r3")))
        | ((gh < F.col("l1")) & (gh < F.least(F.col("r1"), F.col("r2"))))
        | ((gh < F.least(F.col("l1"), F.col("l2"))) & (gh < F.col("r1")))
        | (gh < F.least(F.col("l1"), F.col("l2"), F.col("l3")))
    ).cast("int")
    return (
        nbrs.select("doc_id", "n_grams", sel.alias("selected"))
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").cast("long").alias("n_grams"),
            F.sum("selected").cast("long").alias("n_fingerprints"),
            (F.sum("selected").cast("double") / F.max("n_grams")).alias(
                "density"
            ),
        )
    )
