"""Bigram language-model scoring (SURVEY.md §2.10 X4 — the step past
``text_perplexity_proxy``'s unigram gate toward the KenLM-style filter).

Fit and score in one job: bigram type counts with add-k smoothing over
the corpus, then every document scored by its mean conditional
log-probability.  Same two-touch contract as the unigram key: the token
stream is scanned exactly twice (fit + score), everything between is
vocabulary-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import load
from ..registry import register

_K = 0.5  # add-k smoothing mass


@register(
    "text_lm_bigram",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w,
                   GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
            FROM documents
        ), bg AS (
            SELECT doc_id,
                   LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                   w AS w2
            FROM toks
            QUALIFY w1 IS NOT NULL
        ), types AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
        ), ctx AS (
            SELECT w1, w2,
                   CAST(c12 AS DOUBLE) AS c12,
                   CAST(SUM(c12) OVER (PARTITION BY w1) AS DOUBLE) AS c1,
                   CAST(COUNT(DISTINCT w2) OVER () AS DOUBLE) AS v
            FROM types
        ), lp AS (
            SELECT w1, w2,
                   ROUND(LN((c12 + CAST({_K!r} AS DOUBLE))
                            / (c1 + CAST({_K!r} AS DOUBLE) * v)), 6) AS lnp
            FROM ctx
        )
        SELECT bg.doc_id,
               COUNT(*) AS n_bigrams,
               {sql_davg("lnp", "avg_logprob")}
        FROM bg JOIN lp USING (w1, w2)
        GROUP BY bg.doc_id
    """,
)
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: bigram-LM document scoring with add-k smoothing — score(d) =
    mean ln p(wᵢ | wᵢ₋₁) with p = (c₁₂+k)/(c₁+k·V).  The bigram stream
    comes from one lag window per document (partitioned by doc_id — no
    self-join on position); type counts, context totals (a w1-partitioned
    window over the TYPE table, vocabulary-sized) and the follower-vocab
    size V never touch the corpus again; scoring is one equi-join on the
    bigram key.  ln is libm → each bigram TYPE's lnp rounds 6 dp before
    the per-doc decimal-exact mean (det.py policy, same as the unigram
    key).  At 100 TB: two sharded corpus passes, a vocab²-bounded model
    table, equi-join co-partitioned on the bigram — nothing quadratic,
    nothing driver-side."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.repartition(32).select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("w1", F.lag("w").over(wdoc))
        .where(F.col("w1").isNotNull())
        .select("doc_id", "w1", F.col("w").alias("w2"))
    )
    types = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    wctx = Window.partitionBy("w1")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # COUNT(DISTINCT w2) OVER () has no direct Spark window form; the
    # dense_rank trick ranks distinct w2 over the TYPE table and the max
    # rank is V — two staged windows (Spark forbids nesting them in one
    # expression).  Both run over the MODEL table (bigram types, vocab²-
    # bounded, orders below the corpus) — the same small-side-window move
    # as the unigram key; a separate 1-row agg + cross join would re-plan
    # the whole corpus subtree per branch instead.
    wv = Window.orderBy("w2")
    ranked = types.select(
        "w1",
        "w2",
        F.col("c12").cast("double").alias("c12"),
        F.dense_rank().over(wv).alias("r"),
    )
    ctx = ranked.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(wctx).cast("double").alias("c1"),
        F.max("r").over(wall).cast("double").alias("v"),
    )
    k = F.lit(_K)
    lp = ctx.select(
        "w1",
        "w2",
        F.round(F.log((F.col("c12") + k) / (F.col("c1") + k * F.col("v"))), 6).alias(
            "lnp"
        ),
    )
    return (
        bg.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), davg("lnp", "avg_logprob"))
    )
