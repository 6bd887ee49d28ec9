"""Trainable quality-classifier step — one logistic-regression batch
gradient over document features (X4++, r5b).

Production curation pipelines (CCNet, GPT-3, LLaMA data work) gate
documents with a LEARNED linear/fasttext-style quality classifier, not
just heuristics.  Training one is a loop of relational steps: score every
doc with the current weights, aggregate the batch gradient, update the
weights.  Like `sim_kmeans_step` and `text_bpe_train_step`, this key pins
ONE full iteration end-to-end against a SQL oracle — the auditable
induction step of the training loop (`text_quality` is the inference-side
heuristic gate; this is how its learned replacement gets fit).

Spark-first: features, margin, sigmoid, and per-row loss are codegen'd
column exprs inside the scan stage; the ONLY shuffle is the single-row
batch-gradient aggregate (map-side partial sums of D+2 doubles — at
100 TB this is the textbook data-parallel GD shape: O(bytes scanned) work,
O(D) communication).  The weight update is driver-free arithmetic on the
aggregate row, and the 3-row output unpivots via a literal array explode.

Determinism: libm results (LN, EXP) round per-row at 6 dp via the dround
exact-decimal path; every product/sum around them is IEEE-exact on
bit-identical operands; gradients/loss accumulate via dsum (exact decimal
sums).  All float literals CAST to DOUBLE on the DuckDB side (bare
literals parse as DECIMAL — the documented trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dround, dsum, sql_dround, sql_dsum
from ..io import load
from ..registry import register

# (feature name, initial weight) — the weights under test; eta is the step.
_W = [("bias", -0.2), ("log_len", 0.05), ("n_tokens", 0.1)]
_ETA = 0.1


@register(
    "text_quality_lr_step",
    oracle=f"""
        WITH f AS (
            SELECT CAST(CAST(lang = 'en' AS INTEGER) AS DOUBLE) AS y,
                   CAST(1.0 AS DOUBLE) AS x0,
                   {sql_dround("LN(CAST(1 + n_chars AS DOUBLE))")} AS x1,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE)
                     / CAST(100.0 AS DOUBLE) AS x2
            FROM documents
        ), s AS (
            SELECT y, x0, x1, x2,
                   CAST({_W[0][1]!r} AS DOUBLE) * x0
                     + CAST({_W[1][1]!r} AS DOUBLE) * x1
                     + CAST({_W[2][1]!r} AS DOUBLE) * x2 AS m
            FROM f
        ), pr AS (
            SELECT y, x0, x1, x2,
                   {sql_dround("CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + EXP(-m))")} AS p,
                   {sql_dround("LN(CAST(1.0 AS DOUBLE) + EXP(-(CAST(2.0 AS DOUBLE) * y - CAST(1.0 AS DOUBLE)) * m))")} AS ll
            FROM s
        ), g AS (
            SELECT {sql_dsum("(p - y) * x0", "g0")},
                   {sql_dsum("(p - y) * x1", "g1")},
                   {sql_dsum("(p - y) * x2", "g2")},
                   {sql_dsum("ll", "loss")},
                   COUNT(*) AS n_docs
            FROM pr
        )
        SELECT t.feature,
               CAST(t.w AS DOUBLE) AS w_old,
               CASE t.feature WHEN 'bias' THEN g0
                              WHEN 'log_len' THEN g1
                              ELSE g2 END AS grad,
               CAST(t.w AS DOUBLE) - CAST({_ETA!r} AS DOUBLE)
                 * (CASE t.feature WHEN 'bias' THEN g0
                                   WHEN 'log_len' THEN g1
                                   ELSE g2 END) AS w_new,
               loss, n_docs
        FROM g, (VALUES ('bias', {_W[0][1]!r}), ('log_len', {_W[1][1]!r}),
                        ('n_tokens', {_W[2][1]!r})) t(feature, w)
    """,
)
def text_quality_lr_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4++: one batch-gradient logistic-regression step for a learned
    quality filter (label: lang = 'en'; features: bias, ln(1 + n_chars),
    token count / 100).  Emits per-feature (w_old, grad, w_new) plus the
    batch log-loss and row count — row 1..3 is the updated classifier the
    next iteration scores with."""
    dc = load(spark, sf_dir, "documents")
    y = (F.col("lang") == "en").cast("int").cast("double")
    x0 = F.lit(1.0)
    x1 = dround(F.log(F.lit(1).cast("double") + F.col("n_chars")))
    x2 = F.size(F.split("text", " ")).cast("double") / F.lit(100.0)
    m = (
        F.lit(_W[0][1]) * x0 + F.lit(_W[1][1]) * x1 + F.lit(_W[2][1]) * x2
    )
    p = dround(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)))
    ll = dround(F.log(F.lit(1.0) + F.exp(-(F.lit(2.0) * y - F.lit(1.0)) * m)))
    g = dc.select(
        ((p - y) * x0).alias("a0"),
        ((p - y) * x1).alias("a1"),
        ((p - y) * x2).alias("a2"),
        ll.alias("ll"),
    ).agg(
        dsum("a0", "g0"),
        dsum("a1", "g1"),
        dsum("a2", "g2"),
        dsum("ll", "loss"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    grads = {"bias": "g0", "log_len": "g1", "n_tokens": "g2"}
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("feature"),
                F.lit(w).alias("w_old"),
                F.col(col).alias("grad"),
            )
            for (name, w), col in zip(_W, grads.values())
        ]
    )
    return (
        g.select(F.explode(rows).alias("r"), "loss", "n_docs")
        .select("r.*", "loss", "n_docs")
        .withColumn("w_new", F.col("w_old") - F.lit(_ETA) * F.col("grad"))
        .select("feature", "w_old", "grad", "w_new", "loss", "n_docs")
    )
