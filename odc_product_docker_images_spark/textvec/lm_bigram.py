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
from ..io import fanout, load
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
    toks = dc.repartition(fanout(spark)).select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # r13 (guide §5.4 / VERDICT item 2): the bigram stream has TWO
    # consumers (model type counts + the scoring join) and lineage
    # re-ran the corpus scan + tokenize + lag window per consumer —
    # 2 corpus scans by design until now.  Persisting the (doc_id, w1,
    # w2) stream makes it ONE pass; an exchange-reuse form was rejected
    # because per-branch column pruning silently breaks reuse (the r11
    # shard_pack hazard).  Interleaved A/B at sf0.1 (2 rounds): 1.57 →
    # 1.33 s warm min (trigram 2.45 → 1.70; see OPTIMIZATION_r13.md).
    bg = (
        toks.withColumn("w1", F.lag("w").over(wdoc))
        .where(F.col("w1").isNotNull())
        .select("doc_id", "w1", F.col("w").alias("w2"))
        .persist()
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


_PRUNE = 2  # keep a trigram/bigram type only if seen >= _PRUNE times
# Broadcast the pruned model in the scoring join only while the SOURCE
# corpus is below this size (the pipeline._EVAL_BROADCAST_MAX_BYTES
# move: corpus bytes estimate the derived table, no extra job).  The 10x
# replica (6 MB corpus) holds a 272k-row model — comfortably broadcast;
# a corpus big enough to blow this gate gets the shuffle join back.
_LM_BROADCAST_MAX_BYTES = 32 << 20
_BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007 convention)
_BACKOFF2 = _BACKOFF * _BACKOFF  # exact double product, repr'd into BOTH sides


@register(
    "text_lm_trigram",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w,
                   GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
            FROM documents
        ), tg AS (
            SELECT doc_id,
                   LAG(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                   LAG(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
                   w AS w3
            FROM toks
            QUALIFY w1 IS NOT NULL
        ), t3 AS (
            SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
            FROM tg GROUP BY w1, w2, w3
        ), t3c AS (
            SELECT w1, w2, w3, c123,
                   CAST(SUM(c123) OVER (PARTITION BY w1, w2) AS BIGINT) AS c12
            FROM t3
        ), b AS (
            SELECT w2, w3, CAST(SUM(c123) AS BIGINT) AS c23
            FROM t3 GROUP BY w2, w3
        ), bc AS (
            SELECT w2, w3, c23,
                   CAST(SUM(c23) OVER (PARTITION BY w2) AS BIGINT) AS c2
            FROM b
        ), ug AS (
            SELECT w3, CAST(SUM(c23) AS BIGINT) AS c3 FROM b GROUP BY w3
        ), ugc AS (
            SELECT w3, c3, CAST(SUM(c3) OVER () AS BIGINT) AS nn FROM ug
        ), model AS (
            SELECT t.w1, t.w2, t.w3,
                   CASE WHEN t.c123 >= {_PRUNE} THEN 0
                        WHEN bc.c23 >= {_PRUNE} THEN 1
                        ELSE 2 END AS tier,
                   ROUND(LN(CASE
                       WHEN t.c123 >= {_PRUNE}
                           THEN CAST(t.c123 AS DOUBLE) / CAST(t.c12 AS DOUBLE)
                       WHEN bc.c23 >= {_PRUNE}
                           THEN CAST({_BACKOFF!r} AS DOUBLE)
                                * (CAST(bc.c23 AS DOUBLE) / CAST(bc.c2 AS DOUBLE))
                       ELSE CAST({_BACKOFF2!r} AS DOUBLE)
                            * (CAST(u.c3 AS DOUBLE) / CAST(u.nn AS DOUBLE))
                   END), 6) AS lnp
            FROM t3c t
            JOIN bc ON t.w2 = bc.w2 AND t.w3 = bc.w3
            JOIN ugc u ON t.w3 = u.w3
        )
        SELECT tg.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_trigrams,
               CAST(COUNT(CASE WHEN tier = 0 THEN 1 END) AS BIGINT) AS n_tri_hits,
               CAST(COUNT(CASE WHEN tier = 1 THEN 1 END) AS BIGINT) AS n_bi_hits,
               CAST(COUNT(CASE WHEN tier = 2 THEN 1 END) AS BIGINT) AS n_uni_hits,
               {sql_davg("lnp", "avg_logprob")}
        FROM tg JOIN model USING (w1, w2, w3)
        GROUP BY tg.doc_id
    """,
)
def text_lm_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: KenLM-style trigram scoring with STUPID BACKOFF — the step
    past text_lm_bigram toward the production LM filter.  The model
    prunes singleton trigram/bigram types (c >= {_PRUNE} kept, the KenLM
    pruning move), so scoring genuinely exercises the backoff chain:
    s(w3|w1,w2) = c123/c12 if the trigram survives pruning, else
    {_BACKOFF}·c23/c2 if the bigram does, else {_BACKOFF}²·c3/N — raw
    relative frequencies, no normalization (Brants et al. 2007: the
    backoff that scales because every count is a hash-agg).

    ONE corpus pass builds every tier: the trigram TYPE table is
    persisted and the bigram/unigram/total counts all derive from it by
    vocab-bounded aggs and windows (c12/c2/N are partition windows over
    the MODEL tables, never the corpus); scoring is the second corpus
    pass — an equi-join on the trigram key.  Per-doc outputs: trigram
    count, per-tier hit counts (exact integers — the backoff-path mix is
    itself driver-verified), and the mean lnp (6 dp round per TYPE, then
    the exact decimal mean, the text_lm_bigram policy).  The
    {_BACKOFF}² factor is computed once in Python and repr'd into both
    engines (0.4·0.4 ≠ 0.16 in IEEE — a literal 0.16 would diverge).

    r9 scale attribution (SCALING.md): at the 10× replica the tokenize
    and model-build stages are flat (0.94 s / 1.43 s); the SCORING JOIN
    was the whole growth axis — shuffling every corpus trigram instance
    on a three-string key.  The model table is type-bounded (272k rows
    at 10×), so it BROADCASTS below the same corpus-size gate the
    decontamination join uses (the `_EVAL_BROADCAST_MAX_BYTES` pattern):
    the corpus-side shuffle disappears entirely (measured 8.4 → 6.5 s at
    10× same-session).  Above the gate — a corpus whose pruned type
    table outgrows a broadcast — the shuffle join is the correct plan
    and the gate falls back to it."""
    dc = load(spark, sf_dir, "documents")
    toks = dc.repartition(fanout(spark)).select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    # r13: same single-pass move as text_lm_bigram — tg feeds the model
    # build AND the scoring join; the persist cuts the corpus scans 2 → 1
    tg = (
        toks.withColumn("w1", F.lag("w", 2).over(wdoc))
        .withColumn("w2", F.lag("w", 1).over(wdoc))
        .where(F.col("w1").isNotNull())
        .select("doc_id", "w1", "w2", F.col("w").alias("w3"))
        .persist()
    )
    t3 = (
        tg.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c123"))
        .persist()  # two consumers (context window + bigram rollup) —
        # without the cache each re-plans the corpus tokenize+lag subtree
    )
    t3c = t3.withColumn(
        "c12", F.sum("c123").over(Window.partitionBy("w1", "w2")).cast("long")
    )
    b = (
        t3.groupBy("w2", "w3")
        .agg(F.sum("c123").cast("long").alias("c23"))
        .persist()  # two consumers (context window + unigram rollup)
    )
    bc = b.withColumn("c2", F.sum("c23").over(Window.partitionBy("w2")).cast("long"))
    ug = b.groupBy("w3").agg(F.sum("c23").cast("long").alias("c3"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ugc = ug.withColumn("nn", F.sum("c3").over(wall).cast("long"))
    tier = (
        F.when(F.col("c123") >= _PRUNE, F.lit(0))
        .when(F.col("c23") >= _PRUNE, F.lit(1))
        .otherwise(F.lit(2))
    )
    s = (
        F.when(
            F.col("c123") >= _PRUNE,
            F.col("c123").cast("double") / F.col("c12").cast("double"),
        )
        .when(
            F.col("c23") >= _PRUNE,
            F.lit(_BACKOFF) * (F.col("c23").cast("double") / F.col("c2").cast("double")),
        )
        .otherwise(
            F.lit(_BACKOFF2) * (F.col("c3").cast("double") / F.col("nn").cast("double"))
        )
    )
    model = (
        t3c.join(bc, ["w2", "w3"])
        .join(ugc, "w3")
        .select(
            "w1", "w2", "w3", tier.alias("tier"), F.round(F.log(s), 6).alias("lnp")
        )
    )
    # Size-gated broadcast of the type-bounded model (docstring: the
    # scoring join was the measured 10x growth axis; broadcasting it
    # removes the corpus-side shuffle).  Same estimator/pattern as the
    # decontamination join's broadcast gate.
    from .pipeline import _corpus_bytes

    if _corpus_bytes(sf_dir) < _LM_BROADCAST_MAX_BYTES:
        model = F.broadcast(model)
    return (
        tg.join(model, ["w1", "w2", "w3"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.count(F.when(F.col("tier") == 0, 1)).cast("long").alias("n_tri_hits"),
            F.count(F.when(F.col("tier") == 1, 1)).cast("long").alias("n_bi_hits"),
            F.count(F.when(F.col("tier") == 2, 1)).cast("long").alias("n_uni_hits"),
            davg("lnp", "avg_logprob"),
        )
    )
