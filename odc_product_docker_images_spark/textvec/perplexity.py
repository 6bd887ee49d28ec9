"""Unigram-LM perplexity-proxy scoring (SURVEY.md §2.10 X4).

Split out of ``text_analysis`` so the key registers independently —
registration order is the driver's grading-window mechanism
(registry._MODULES); the rest of the text-analysis family keeps its own
slot later in the order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import fanout, load
from ..registry import register


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


@register(
    "text_perplexity_proxy",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
        ), cnt AS (
            SELECT w, COUNT(*) AS c FROM toks GROUP BY w
        ), lp AS (
            SELECT w, ROUND(LN(c / SUM(c) OVER ()), 6) AS lnp FROM cnt
        )
        SELECT toks.doc_id,
               COUNT(*) AS n_tokens,
               {sql_davg("lnp", "avg_logprob")}
        FROM toks JOIN lp USING (w)
        GROUP BY toks.doc_id
    """,
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality filter: unigram-LM log-probability scoring — the
    CCNet/KenLM perplexity gate's relational skeleton.  Fit = corpus MLE
    unigram probs (one token hash-agg + the 1-row total broadcast); score =
    mean ln p(w) per document via the vocab ⋈ token-stream equi-join.
    Low (very negative) scores flag gibberish/rare-token docs, high scores
    flag boilerplate — both tails get cut in a real pipeline.  The corpus
    total is Σc over the aggregated vocab (global window on the small
    side), so the token stream is scanned exactly twice — fit and score —
    and nothing else touches it (PLANS.md pins the scan count).

    Determinism: ln is libm (JVM vs C last-ulp), so each token TYPE's lnp
    is rounded 6 dp BEFORE the per-doc aggregation; the per-doc mean then
    runs both engines over identical addends through the exact decimal path
    (det.davg).  Scale: the vocab join is a plain equi-join on the token —
    co-partitioned shuffle at web-scale vocab, AQE broadcast when the
    vocab is small; nothing here is quadratic and the token stream is
    touched exactly twice (fit + score), both times sharded."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.repartition(fanout(spark)).select("doc_id", F.explode(_toks()).alias("w"))
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # total token count = Σc over the VOCAB (a global window on the small
    # aggregated side) — deriving it from `toks` with a separate agg
    # duplicated the corpus scan+explode subplan (PLANS.md caught the 3rd
    # scan; DataFrame branches don't dedupe statically).  The single-task
    # window is over vocab rows only, orders below the corpus.
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lp = cnt.select(
        "w", F.round(F.log(F.col("c") / F.sum("c").over(wall)), 6).alias("lnp")
    )
    return (
        toks.join(lp, "w")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), davg("lnp", "avg_logprob"))
    )
