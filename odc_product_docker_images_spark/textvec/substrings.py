"""Exact substring deduplication — duplicated token-window SPANS
(X2+++, r5d).

The published exact-substring method (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better": any ≥50-token span that
appears more than once in the corpus is removed) is the other pillar of
production dedup next to MinHash — document-level near-dup misses a
paragraph quoted across otherwise-distinct documents.  The paper builds
a suffix array; the relational equivalent over fixed-width anchors is:
slide a W-token window over every document, hash each window, keep
windows whose hash occurs ≥2 times in the corpus, and merge overlapping
duplicated windows into maximal spans (the suffix-array result for
span lengths ≥ W, quantized to window starts).  `dedup_boilerplate`
does this at LINE granularity; this operator works at token granularity
with span coalescing — W = 8 matches the decontamination 8-gram
convention.

Spark-first, one linear pipeline: windows explode from the scan
(repartitioned first — single-file fixture), corpus occurrence counts
are a window COUNT over the hash partitioning (one shuffle, no join),
span merging is the gaps-and-islands lag trick over (doc, pos) — fixed
window width makes "overlaps previous" a pure lag comparison — and the
per-doc rollup reuses the doc partitioning.  At 100 TB: three linear
shuffles (hash, doc, doc), nothing quadratic, no Python anywhere; a
hot-window skew guard would cap df exactly like `dedup_ngram_dfcap`.

Determinism: token windows stringify identically (same split + join on
single spaces), MD5 hex is bit-identical across engines, and everything
downstream is integer arithmetic plus one exact IEEE divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import fanout, load
from ..registry import register

_W = 8  # window width in tokens (the corpus's 8-gram convention)


@register(
    "dedup_substring_spans",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tok
            FROM documents
        ), wp AS (
            -- per-row UNNEST(RANGE(...)) is length-driven (no fixed cap a
            -- longer fixture could silently exceed) and yields no rows for
            -- docs shorter than the window
            SELECT doc_id, n_tok,
                   UNNEST(RANGE(1, CAST(n_tok AS BIGINT) - {_W - 2})) AS pos,
                   toks
            FROM t
        ), w AS (
            SELECT doc_id, n_tok, pos,
                   MD5(ARRAY_TO_STRING(LIST_SLICE(toks, CAST(pos AS INTEGER),
                       CAST(pos + {_W - 1} AS INTEGER)), ' ')) AS h
            FROM wp
        ), occ AS (
            SELECT doc_id, n_tok, pos,
                   COUNT(*) OVER (PARTITION BY h) AS n_occ
            FROM w
        ), dup AS (
            SELECT doc_id, n_tok, pos,
                   CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                        ORDER BY pos) <= {_W - 1} THEN 0 ELSE 1 END AS brk
            FROM occ WHERE n_occ >= 2
        ), isl AS (
            SELECT doc_id, n_tok, pos,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM dup
        ), g AS (
            SELECT doc_id, n_tok, island,
                   COUNT(*) AS n_windows,
                   MAX(pos) - MIN(pos) + {_W} AS covered
            FROM isl GROUP BY doc_id, n_tok, island
        )
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CAST(SUM(n_windows) AS BIGINT) AS dup_windows,
               CAST(COUNT(*) AS BIGINT) AS dup_spans,
               CAST(SUM(covered) AS BIGINT) AS dup_tokens,
               CAST(SUM(covered) AS DOUBLE) / CAST(n_tok AS DOUBLE) AS dup_frac
        FROM g GROUP BY doc_id, n_tok
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+++: exact substring dedup — every W-token window hashed, corpus
    occurrence counted, duplicated windows coalesced into maximal spans;
    one row per document that contains duplicated material (window
    count, span count, covered-token count, covered fraction) — the
    per-doc removal ledger the Lee et al. pipeline acts on."""
    docs = (
        load(spark, sf_dir, "documents")
        .repartition(fanout(spark))
        .select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n_tok", F.size("toks"))
    )
    wins = docs.where(F.col("n_tok") >= _W).select(
        "doc_id",
        "n_tok",
        F.explode(F.sequence(F.lit(1), F.col("n_tok") - _W + 1)).alias("pos0"),
        "toks",
    ).select(
        "doc_id",
        "n_tok",
        F.col("pos0").cast("bigint").alias("pos"),
        "toks",
    ).select(
        "doc_id",
        "n_tok",
        "pos",
        F.md5(
            F.array_join(
                F.slice("toks", F.col("pos").cast("int"), _W), " "
            ).cast("binary")
        ).alias("h"),
    )
    occ = wins.select(
        "doc_id", "n_tok", "pos",
        F.count(F.lit(1)).over(Window.partitionBy("h")).alias("n_occ"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    dup = occ.where(F.col("n_occ") >= 2).select(
        "doc_id",
        "n_tok",
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(wdoc) <= _W - 1, 0)
        .otherwise(1)
        .alias("brk"),
    )
    isl = dup.select(
        "doc_id", "n_tok", "pos",
        F.sum("brk")
        .over(wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    g = isl.groupBy("doc_id", "n_tok", "island").agg(
        F.count(F.lit(1)).alias("n_windows"),
        (F.max("pos") - F.min("pos") + _W).alias("covered"),
    )
    return g.groupBy("doc_id", "n_tok").agg(
        F.sum("n_windows").cast("bigint").alias("dup_windows"),
        F.count(F.lit(1)).cast("bigint").alias("dup_spans"),
        F.sum("covered").cast("bigint").alias("dup_tokens"),
        (F.sum("covered").cast("double") / F.col("n_tok").cast("double")).alias(
            "dup_frac"
        ),
    ).select(
        "doc_id",
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        "dup_windows",
        "dup_spans",
        "dup_tokens",
        "dup_frac",
    )
