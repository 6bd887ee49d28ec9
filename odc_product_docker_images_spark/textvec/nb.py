"""Multinomial naive-Bayes language classifier (SURVEY.md §2.9/X4
extension — the classic fast text classifier: the supervised upgrade of
``text_lang_id``'s n-gram heuristic and the generative sibling of
``text_quality_lr_step``'s discriminative filter).

Train and apply are BOTH relational: training is one token-count
aggregate smoothed into a (token × class) log-likelihood table small
enough to broadcast (vocab × #classes rows); scoring joins each
document's token counts against it and argmaxes the class.  Laplace
smoothing makes every (token, class) cell well-defined, so train==test
here has no OOV hole; a real deployment scores a different corpus with
the same plan.

Determinism: token/class counts are exact integers; each log-likelihood
and log-prior rounds 6 dp (libm policy); per-document class scores are
decimal sums of count×loglik products rounded 6 dp before the argmax,
whose tie-break is the lexicographically smallest class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import (
    dec_cast,
    dround,
    exact_double,
    sql_dec_cast,
    sql_dround,
    sql_exact_double,
)
from ..io import load
from ..registry import register


@register(
    "ml_naive_bayes",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, tok
            FROM (
                SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
        ), counts AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY lang, tok
        ), vocab AS (
            SELECT DISTINCT tok FROM counts
        ), vsize AS (
            SELECT tok, CAST(COUNT(*) OVER () AS BIGINT) AS v FROM vocab
        ), totals AS (
            SELECT lang, CAST(SUM(c) AS BIGINT) AS t_l
            FROM counts GROUP BY lang
        ), grid AS (
            SELECT t.lang, s.tok, s.v, t.t_l, COALESCE(c.c, 0) AS c
            FROM vsize s CROSS JOIN totals t
            LEFT JOIN counts c ON c.lang = t.lang AND c.tok = s.tok
        ), params AS (
            SELECT lang, tok,
                   {sql_dround(
                       "LN((CAST(c AS DOUBLE) + 1.0)"
                       " / (CAST(t_l AS DOUBLE) + v))"
                   )} AS ll
            FROM grid
        ), priors AS (
            SELECT lang,
                   {sql_dround(
                       "LN(CAST(COUNT(*) AS DOUBLE)"
                       " / (SUM(COUNT(*)) OVER ()))"
                   )} AS lp
            FROM documents GROUP BY lang
        ), doctoks AS (
            SELECT doc_id, lang AS true_lang, tok,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM toks GROUP BY doc_id, lang, tok
        ), scores AS (
            SELECT d.doc_id, d.true_lang, p.lang AS cand,
                   {sql_dround(
                       "MAX(pr.lp) + ("
                       + sql_exact_double(
                           "SUM(" + sql_dec_cast("d.n * p.ll") + ")"
                       )
                       + ")"
                   )} AS score
            FROM doctoks d
            JOIN params p ON d.tok = p.tok
            JOIN priors pr ON pr.lang = p.lang
            GROUP BY d.doc_id, d.true_lang, p.lang
        ), ranked AS (
            SELECT doc_id, true_lang, cand AS pred_lang, score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cand ASC) AS rn
            FROM scores
        )
        SELECT doc_id, true_lang, pred_lang, score AS best_score,
               CAST(true_lang = pred_lang AS INT) AS correct
        FROM ranked WHERE rn = 1
    """,
)
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: multinomial naive Bayes over document tokens with the lang
    column as labels — train (one token-count pass → broadcastable
    smoothed log-likelihood table) and apply (per-doc token counts ×
    broadcast params → class score decimal-sum → argmax) in one plan.
    Two corpus passes by design: train and apply are separate scans, as
    they are on real disjoint corpora.  The Laplace grid completes every
    (token, class) cell so no join drops mass; the per-doc argmax is a
    row_number over the 5-row class partition."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).where(F.col("tok") != "")
    # params are vocab x classes — tiny; persisted because the grid
    # assembly reads it from three sides (counts, vocab, totals)
    counts = (
        toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    wall = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    vsize = (
        counts.select("tok")
        .distinct()
        .withColumn("v", F.count(F.lit(1)).over(wall).cast("long"))
    )
    totals = counts.groupBy("lang").agg(F.sum("c").cast("long").alias("t_l"))
    grid = (
        vsize.crossJoin(F.broadcast(totals))
        .join(counts, ["lang", "tok"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    params = grid.select(
        "lang",
        "tok",
        dround(
            F.log(
                (F.col("c").cast("double") + F.lit(1.0))
                / (F.col("t_l").cast("double") + F.col("v"))
            )
        ).alias("ll"),
    )
    priors = dc.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l")).select(
        "lang",
        dround(
            F.log(F.col("n_l").cast("double") / F.sum("n_l").over(wall))
        ).alias("lp"),
    )
    doctoks = toks.groupBy("doc_id", F.col("lang").alias("true_lang"), "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    scores = (
        doctoks.join(
            F.broadcast(
                params.select(F.col("lang").alias("cand"), "tok", "ll")
            ),
            "tok",
        )
        .join(
            F.broadcast(priors.select(F.col("lang").alias("cand"), "lp")), "cand"
        )
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            dround(
                F.max("lp")
                + exact_double(F.sum(dec_cast(F.col("n") * F.col("ll"))))
            ).alias("score")
        )
    )
    ranked = scores.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("score").desc(), F.col("cand").asc()
            )
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "true_lang",
        F.col("cand").alias("pred_lang"),
        F.col("score").alias("best_score"),
        (F.col("true_lang") == F.col("cand")).cast("int").alias("correct"),
    )
