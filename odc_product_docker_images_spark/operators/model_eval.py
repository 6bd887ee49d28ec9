"""Model-evaluation metrics over scored examples (SURVEY.md §2.9
extension — the offline-eval tier of the LLM-data pipeline: every
quality-filter model (``text_quality_lr_step``), dedup threshold, and
retrieval ranker ships with a ROC/AUC report before its cutoff is
frozen).

Examples are the embeddings table: score = first embedding component,
positive = label < 5 — a deliberately weak "model" (AUC ≈ 0.5) so the
metrics, not the classifier, are what's under test.

Both keys are EXACT integer-arithmetic forms, no float tolerance: ROC
points are integer TP/FP counts at every distinct score, and AUC uses
the tie-averaged rank-sum identity with the doubled-rank trick (2·R₁ is
always an integer), so the only float ops are final divisions of exact
integers — identical IEEE on both engines.

Scale shape (100 TB of scored examples): one score-grouped count
shuffle, then the same deterministic-bucket distributed prefix pattern
as ``agg_ks_test`` — bucket-partitioned cumsums, a ~#buckets-row
exclusive-offset table built off the SAME exchange (reused at runtime),
broadcast back.  No single-task global window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SCORE_BUCKET_W = 16.0  # buckets = floor(score * 16): ~13 over the ±0.4 range


def _scored_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-distinct-score positive/negative counts with global inclusive
    prefix counts and totals — the shared ECDF scaffold for both keys.

    Columns: score, cp, cn (group counts), gp, gn (global inclusive
    cumulative counts in ascending score order), p, n (class totals).
    """
    emb = load(spark, sf_dir, "embeddings")
    g = (
        emb.select(
            F.element_at("embedding", 1).cast("double").alias("score"),
            (F.col("label") < 5).cast("long").alias("pos"),
        )
        .groupBy("score")
        .agg(
            F.sum("pos").alias("cp"),
            (F.count(F.lit(1)) - F.sum("pos")).alias("cn"),
        )
        .withColumn("bkt", F.floor(F.col("score") * _SCORE_BUCKET_W).cast("long"))
    )
    within = Window.partitionBy("bkt").orderBy("score")
    w = g.withColumn("lp", F.sum("cp").over(within)).withColumn(
        "ln", F.sum("cn").over(within)
    )
    off_w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # bucket totals off the cumsums (max of increasing prefix) so this
    # branch shares the identical subtree → the one shuffle is reused
    offsets = (
        w.groupBy("bkt")
        .agg(F.max("lp").alias("tp_"), F.max("ln").alias("tn_"))
        .withColumn("op", F.coalesce(F.sum("tp_").over(off_w), F.lit(0)))
        .withColumn("on", F.coalesce(F.sum("tn_").over(off_w), F.lit(0)))
        .withColumn("p", F.sum("tp_").over(wall))
        .withColumn("n", F.sum("tn_").over(wall))
        .select("bkt", "op", "on", "p", "n")
    )
    return w.join(F.broadcast(offsets), "bkt", "left").select(
        "score",
        "cp",
        "cn",
        (F.col("op") + F.col("lp")).alias("gp"),
        (F.col("on") + F.col("ln")).alias("gn"),
        "p",
        "n",
    )


_SQL_GROUPS = """
        WITH s AS (
            SELECT embedding[1]::DOUBLE AS score,
                   CAST(label < 5 AS BIGINT) AS pos
            FROM embeddings
        ), g AS (
            SELECT score, SUM(pos) AS cp, COUNT(*) - SUM(pos) AS cn
            FROM s GROUP BY score
        ), cum AS (
            SELECT score, cp, cn,
                   SUM(cp) OVER (ORDER BY score) AS gp,
                   SUM(cn) OVER (ORDER BY score) AS gn,
                   SUM(cp) OVER () AS p,
                   SUM(cn) OVER () AS n
            FROM g
        )
"""


@register(
    "ml_roc_curve",
    oracle=_SQL_GROUPS
    + """
        SELECT score AS threshold,
               CAST(p - (gp - cp) AS BIGINT) AS tp,
               CAST(n - (gn - cn) AS BIGINT) AS fp,
               CAST(p - (gp - cp) AS DOUBLE) / CAST(p AS DOUBLE) AS tpr,
               CAST(n - (gn - cn) AS DOUBLE) / CAST(n AS DOUBLE) AS fpr
        FROM cum
    """,
)
def ml_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: full ROC curve — integer TP/FP at every distinct score
    threshold (predict positive when score ≥ t), from one score-grouped
    pass + the bucket-partitioned prefix scaffold.  TP at t is
    P − #(positives below t), i.e. totals minus the exclusive prefix —
    no descending re-sort needed.  TPR/FPR are single divisions of
    exact integers."""
    cum = _scored_groups(spark, sf_dir)
    tp = F.col("p") - (F.col("gp") - F.col("cp"))
    fp = F.col("n") - (F.col("gn") - F.col("cn"))
    return cum.select(
        F.col("score").alias("threshold"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        (tp.cast("double") / F.col("p").cast("double")).alias("tpr"),
        (fp.cast("double") / F.col("n").cast("double")).alias("fpr"),
    )


@register(
    "ml_auc_exact",
    oracle=_SQL_GROUPS
    + """
        SELECT CAST(SUM(cp * (2 * (gp + gn - cp - cn) + (cp + cn) + 1))
                    - MAX(p) * (MAX(p) + 1) AS BIGINT) AS auc_num2,
               CAST(MAX(p) AS BIGINT) AS n_pos,
               CAST(MAX(n) AS BIGINT) AS n_neg,
               CAST(SUM(cp * (2 * (gp + gn - cp - cn) + (cp + cn) + 1))
                    - MAX(p) * (MAX(p) + 1) AS DOUBLE)
                   / (CAST(2 AS DOUBLE) * MAX(p) * MAX(n)) AS auc
        FROM cum
    """,
)
def ml_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: exact ROC AUC via the tie-averaged Mann-Whitney rank-sum
    identity, AUC = (R₁ − n₁(n₁+1)/2) / (n₁n₀) — kept in integers with
    the doubled-rank trick: a tie group occupying ranks [a, b] gives
    each member average rank (a+b)/2, so 2·R₁ sums cp·(2·c_lt + m + 1)
    per group (c_lt = examples strictly below, m = group size), always
    an integer.  The one float op is the final division.  Semantic
    cross-check: equals the trapezoidal integral of ``ml_roc_curve``
    (pinned in tests).  Same single-shuffle scaffold as the curve."""
    cum = _scored_groups(spark, sf_dir)
    c_lt = F.col("gp") + F.col("gn") - F.col("cp") - F.col("cn")
    m = F.col("cp") + F.col("cn")
    two_r1 = F.sum(F.col("cp") * (2 * c_lt + m + 1))
    num = two_r1 - F.max("p") * (F.max("p") + 1)
    return cum.agg(
        num.cast("long").alias("auc_num2"),
        F.max("p").cast("long").alias("n_pos"),
        F.max("n").cast("long").alias("n_neg"),
        (
            num.cast("double")
            / (F.lit(2.0) * F.max("p").cast("double") * F.max("n").cast("double"))
        ).alias("auc"),
    )
