"""Temperature-based domain mixture reweighting (X4+++, r5d).

`data_mix_sample` applies FIXED per-source rates; production multilingual
/ multi-domain pretraining derives the rates FROM the corpus with
temperature sampling (⟨pub⟩ XLM-R / mT5 practice: p_s ∝ n_s^α with
α < 1 upweights the tail, then per-source keep rates hit a total sample
budget): weight w_s = n_s^α, mixture p_s = w_s / Σw, keep rate
r_s = min(1, T·N·p_s / n_s) for budget fraction T.  This operator is the
derivation AND the application in one auditable pass — the learned
sibling of the fixed-rate mixer, the way `text_quality_lr_step` is the
learned sibling of the heuristic quality gate.

Spark-first: source counts are one grouped shuffle; the corpus total is
a 1-row broadcast (cross join); the |langs|-row rate table broadcasts back
onto the document scan where the deterministic multiplicative-hash gate
(same `_bucket` as sample_split — no rand(), reproducible across
engines and partitionings) applies the rate.  At 100 TB this is the
canonical two-pass reweight: count pass + gated pass, both linear, the
mixture table never bigger than the source cardinality.

Determinism: POW is libm → dround(6); the weight total is a dsum over
|sources| rounded weights; every downstream value (p, rate, expected)
is exact IEEE arithmetic on bit-identical operands; the gate compares
an integer bucket against rate·100 — identical doubles both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.det import dec_cast, dround, exact_double, sql_dround, sql_dsum
from ..io import load
from ..registry import register
from .pipeline import _bucket, _sql_bucket

_ALPHA = 0.5
_BUDGET = 0.3  # target sample fraction of the corpus


@register(
    "data_mix_temperature",
    oracle=f"""
        WITH c AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ), w AS (
            SELECT lang, n_docs,
                   {sql_dround(f"POW(CAST(n_docs AS DOUBLE), CAST({_ALPHA!r} AS DOUBLE))")} AS wgt
            FROM c
        ), tot AS (
            SELECT {sql_dsum("wgt", "total")}, SUM(n_docs) AS n_corpus FROM w
        ), r AS (
            SELECT lang, n_docs, wgt, wgt / total AS p_sample,
                   LEAST(CAST(1.0 AS DOUBLE),
                         CAST({_BUDGET!r} AS DOUBLE) * n_corpus * (wgt / total)
                           / CAST(n_docs AS DOUBLE)) AS keep_rate
            FROM w CROSS JOIN tot
        )
        SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs, r.wgt AS weight,
               r.p_sample, r.keep_rate,
               CAST(SUM(CASE WHEN {_sql_bucket()} < keep_rate * 100.0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM r JOIN documents d ON r.lang = d.lang
        GROUP BY 1, 2, 3, 4, 5
    """,
)
def data_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+++: temperature mixture — derive p_s ∝ n_s^α and budgeted keep
    rates from the corpus, then apply them through the deterministic hash
    gate; one row per language with the derived weight, mixture
    probability, keep rate, and realized kept count."""
    dc = load(spark, sf_dir, "documents")
    c = dc.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = c.select(
        "lang",
        "n_docs",
        dround(F.pow(F.col("n_docs").cast("double"), F.lit(_ALPHA))).alias("wgt"),
    )
    # total via an unpartitioned window over the |sources|-row table (20
    # rows — the _rank_pairs small-table pattern, NOT a corpus window);
    # the agg + crossJoin form re-computed the count subtree (3 scans).
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = w.select(
        "lang",
        "n_docs",
        "wgt",
        exact_double(F.sum(dec_cast("wgt")).over(wall)).alias("total"),
        F.sum("n_docs").over(wall).alias("n_corpus"),
    ).select(
        "lang",
        "n_docs",
        "wgt",
        (F.col("wgt") / F.col("total")).alias("p_sample"),
        F.least(
            F.lit(1.0),
            F.lit(_BUDGET)
            * F.col("n_corpus")
            * (F.col("wgt") / F.col("total"))
            / F.col("n_docs").cast("double"),
        ).alias("keep_rate"),
    )
    gated = dc.select("doc_id", "lang", _bucket().alias("bucket")).join(
        F.broadcast(r), "lang"
    )
    return gated.groupBy(
        "lang", "n_docs", "wgt", "p_sample", "keep_rate"
    ).agg(
        F.sum(
            (F.col("bucket") < F.col("keep_rate") * F.lit(100.0)).cast("int")
        )
        .cast("bigint")
        .alias("n_kept")
    ).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("wgt").alias("weight"),
        "p_sample",
        "keep_rate",
        "n_kept",
    )
