"""Training-data pipeline composites (SURVEY.md §2.10 X4 applied).

The operators a 100 TB pretraining-data run chains between raw crawl and
tokenizer: normalization, deterministic split assignment, and the fused
keep/drop filter decision.  All pure Column expressions — one codegen'd
map pass per document plus the final small aggregates; nothing here
shuffles except the explicit rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# Knuth multiplicative hash on the doc key: deterministic, engine-identical
# BIGINT arithmetic (no engine hash builtin is shared between Spark and
# DuckDB).  Fixture ids are small; at production id ranges, reduce the key
# mod a prime first to keep the product inside int64.
_KNUTH = 2654435761


def _bucket(col: str = "doc_id", buckets: int = 100) -> Column:
    return (F.col(col) * F.lit(_KNUTH)) % F.lit(buckets)


def _sql_bucket(col: str = "doc_id", buckets: int = 100) -> str:
    return f"(({col} * {_KNUTH}) % {buckets})"


@register(
    "text_normalize",
    oracle="""
        SELECT doc_id,
               LOWER(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(text, '[^a-zA-Z0-9 ]', '', 'g'),
                                         ' +', ' ', 'g'))) AS norm_text,
               LEN(LOWER(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(text, '[^a-zA-Z0-9 ]', '', 'g'),
                                             ' +', ' ', 'g')))) AS norm_len
        FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: canonical text cleanup — strip non-alphanumerics, collapse
    whitespace, trim, lowercase (the C4-style normalization pass that
    feeds exact dedup; run it BEFORE hashing or trivial formatting
    variants defeat the content key)."""
    dc = load(spark, sf_dir, "documents")
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace("text", r"[^a-zA-Z0-9 ]", ""), " +", " "
            )
        )
    )
    return dc.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("norm_len"),
    )


@register(
    "sample_split",
    oracle=f"""
        SELECT lang,
               CASE WHEN {_sql_bucket()} < 80 THEN 'train'
                    WHEN {_sql_bucket()} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS min_doc,
               MAX(doc_id) AS max_doc
        FROM documents
        GROUP BY 1, 2
    """,
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: deterministic 80/10/10 train/val/test assignment by a
    multiplicative hash of the doc key — reproducible across runs,
    engines, and cluster sizes (no rand(); a reshuffled table gets the
    same split), stratified counts per language as the verification
    surface."""
    dc = load(spark, sf_dir, "documents")
    b = _bucket()
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return dc.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@register(
    "filter_pipeline",
    oracle="""
        WITH scored AS (
            SELECT doc_id, lang, n_chars,
                   LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
                   LEN(LIST_DISTINCT(STRING_SPLIT(text, ' ')))
                     / LEN(STRING_SPLIT(text, ' ')) AS ttr,
                   MD5(text) AS h,
                   MIN(doc_id) OVER (PARTITION BY MD5(text)) AS keeper
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN doc_id != keeper THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exact_dup,
               CAST(SUM(CASE WHEN n_tokens NOT BETWEEN 20 AND 200 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_len_fail,
               CAST(SUM(CASE WHEN ttr <= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ttr_fail,
               CAST(SUM(CASE WHEN doc_id = keeper AND n_tokens BETWEEN 20 AND 200
                                  AND ttr > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept
        FROM scored
        GROUP BY lang
    """,
)
def filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 fused: the end-to-end keep/drop decision — exact-dup removal
    (content-hash keeper window), length band, type-token-ratio gate —
    rolled up per language.  One scan, one window on the content hash,
    one aggregate: the shape that filters a 100 TB crawl in a single
    pass.  A doc can fail several gates; ``n_kept`` counts survivors of
    ALL of them."""
    from pyspark.sql import Window

    dc = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    scored = dc.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        ttr.alias("ttr"),
        keeper.alias("keeper"),
    )
    is_dup = F.col("doc_id") != F.col("keeper")
    len_ok = F.col("n_tokens").between(20, 200)
    ttr_ok = F.col("ttr") > 0.2
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(is_dup.cast("int")).cast("bigint").alias("n_exact_dup"),
        F.sum((~len_ok).cast("int")).cast("bigint").alias("n_len_fail"),
        F.sum((~ttr_ok).cast("int")).cast("bigint").alias("n_ttr_fail"),
        F.sum(((~is_dup) & len_ok & ttr_ok).cast("int")).cast("bigint").alias("n_kept"),
    )
