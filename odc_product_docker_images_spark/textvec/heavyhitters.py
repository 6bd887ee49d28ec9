"""Mergeable heavy-hitters sketch — Misra-Gries (SURVEY.md §2.10 X4).

The frequent-items question every corpus profile asks ("which tokens
dominate?") has an exact answer (``explode_tokens``: full groupBy, shuffle
= distinct-token cardinality) and a SKETCH tier for when the token
universe itself is too large to shuffle: the Misra-Gries summary, which is
MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS'12) — per-partition
summaries of size k combine into a size-k summary whose total error stays
≤ n/(k+1) REGARDLESS of merge tree shape.  That mergeability is exactly
the partial-aggregate contract Spark's hash aggregates rely on, expressed
for a holistic question.

Plan shape: one Arrow map pass builds a per-partition summary from exact
within-partition counts (compress = subtract the (k+1)-th largest count,
keep positive — the order-free equivalent of streaming MG decrements);
the ≤ P·k summary rows then merge relationally: sum by token, subtract
the combined (k+1)-th largest (computed with a top-(k+1) sort over ≤ P·k
rows, broadcast back), keep positive.  Nothing driver-side; shuffle
volume is P·k rows, independent of corpus size — that is the point.

⊘oracle: the summary's VALUES depend on the partition layout (any valid
MG summary does); the GUARANTEES don't, so pytest asserts them against
exact counts: underestimates only, error ≤ n/(k+1), and every true
heavy hitter (count > n/(k+1)) present.  Determinism for the driver's
rows-check comes from the fixed repartition key and the total (count,
token) tie order used in both compress steps.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

K = 32  # summary capacity; error <= n_tokens / (K+1)
_P = 8  # ingest partitions (partition by doc — the data-parallel layout)
_CAP = 4096  # in-flight summary cap: compress when the working dict
# exceeds this, so per-task memory is bounded by the cap — NOT by the
# partition's distinct-token universe (r9 kernel-memory discipline: the
# exact-Counter form grew with the corpus vocabulary and is exactly the
# fixture-tuned-allocation class the 100x tier flags).  Every compress
# round that decrements by `dec` removes >= (k+1)*dec total mass, so the
# summed decrement across all intermediate rounds plus the final
# compress-to-K stays <= n/(K+1) — the guarantees tests pin are intact.


def _mg_compress(counts: dict[str, int], k: int) -> dict[str, int]:
    """Reduce exact counts to a size-k Misra-Gries summary: subtract the
    (k+1)-th largest count from everything, drop non-positive.  Ties
    break on (count, token) so the result is a function of the counts,
    not of iteration order."""
    if len(counts) <= k:
        return dict(counts)
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    dec = ordered[k][1]  # (k+1)-th largest
    return {t: c - dec for t, c in ordered[:k] if c - dec > 0}


def _partition_summaries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from collections import Counter

    counts: Counter[str] = Counter()
    for pdf in it:
        for text in pdf["text"]:
            counts.update(text.split(" "))
            if len(counts) > _CAP:
                # online Misra-Gries step: compress to _CAP // 2 (not K)
                # so intermediate rounds subtract the much-smaller
                # (_CAP//2 + 1)-th largest — tighter running estimates,
                # same worst-case bound, bounded memory either way.
                counts = Counter(_mg_compress(counts, _CAP // 2))
    if not counts:
        return
    summ = _mg_compress(counts, K)
    yield pd.DataFrame(
        {"token": list(summ.keys()), "cnt": list(summ.values())}
    )


@register("text_heavy_hitters")  # ⊘oracle: summary values are layout-dependent; guarantees pytest-gated
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sketch tier: corpus heavy hitters via mergeable Misra-Gries.
    Per-partition summaries (Arrow pass over doc-partitioned text) merge
    relationally: sum estimates by token, subtract the combined (k+1)-th
    largest, keep positive — ≤ K rows out, every true token with
    frequency > n/(K+1) guaranteed present, estimates never above truth.
    The 100 TB story is the shuffle volume: P·K summary rows instead of
    the distinct-token universe; the exact twin (``explode_tokens``)
    remains the re-ranker on the survivors."""
    dc = load(spark, sf_dir, "documents")
    summaries = (
        dc.select("doc_id", "text")
        .repartition(_P, "doc_id")
        .mapInPandas(_partition_summaries, schema="token string, cnt long")
    )
    merged = summaries.groupBy("token").agg(F.sum("cnt").alias("est"))
    # combined compress: (K+1)-th largest merged estimate, broadcast back.
    # <= P*K rows feed this sort — constant-size regardless of corpus.
    # compress only applies when the merged set exceeds K tokens — with
    # <= K survivors the summary is already valid and dec must be 0.
    kth = (
        merged.orderBy(F.desc("est"), F.asc("token"))
        .limit(K + 1)
        .agg(
            F.when(F.count(F.lit(1)) <= K, F.lit(0))
            .otherwise(F.min("est"))
            .alias("dec")
        )
    )
    return (
        merged.crossJoin(F.broadcast(kth))
        .select("token", (F.col("est") - F.col("dec")).alias("est_count"))
        .where(F.col("est_count") > 0)
    )


_HLL_REL_ERR_PCT = 5  # HLL gate: every group within 5% of exact (rsd=0.02)


@register(
    "sketch_error_gates",
    oracle=f"""
        WITH tok AS (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
        ), nn AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
        ), tc AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY token
        ), hh AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_true
            FROM tc CROSS JOIN nn WHERE c * {K + 1} > n
        ), hl AS (
            SELECT CAST(SUM(ex) AS BIGINT) AS n_true FROM (
                SELECT COUNT(DISTINCT l_partkey) AS ex
                FROM lineitem GROUP BY l_returnflag
            )
        )
        SELECT 'hll_distinct' AS method, n_true, TRUE AS gate_met FROM hl
        UNION ALL
        SELECT 'misra_gries' AS method, n_true, TRUE AS gate_met FROM hh
    """,
)
def sketch_error_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 sketch-quality gate — the ``sim_ann_recall`` pattern applied to
    the two ⊘rows-only sketches, so a sketch regression flips a driver
    hash row instead of staying invisible:

    - ``misra_gries``: n_true = exact count of TRUE heavy hitters
      (tokens with count·(K+1) > n, the integer form of count > n/(K+1))
      — SQL-verified; gate_met asserts the summary's three guarantees
      against the exact counts: every true heavy hitter present (no
      false negatives), every estimate ≤ truth, every underestimate
      ≤ n/(K+1).
    - ``hll_distinct``: n_true = Σ exact per-group distinct parts —
      SQL-verified; gate_met asserts every group's
      ``approx_count_distinct(rsd=0.02)`` lands within
      {_HLL_REL_ERR_PCT}% of exact.

    The oracle pins both booleans TRUE.  The gate key computes the exact
    sides the sketches exist to avoid — that is its job as the auditor;
    at 100 TB it runs on a sampled slice while the sketches run on the
    corpus."""
    dc = load(spark, sf_dir, "documents")
    tok = dc.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    tc = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c")).persist()
    nn = tc.agg(F.sum("c").cast("long").alias("n"))
    truth = (
        tc.crossJoin(F.broadcast(nn))
        .where(F.col("c") * (K + 1) > F.col("n"))
        .select("token")
    )
    n_true_hh = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    mg = text_heavy_hitters(spark, sf_dir).persist()
    misses = truth.join(mg, "token", "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("no_fn")
    )
    checks = (
        mg.join(tc, "token")
        .crossJoin(F.broadcast(nn))
        .agg(
            (F.max(F.col("est_count") - F.col("c")) <= 0).alias("under_only"),
            (
                F.max((F.col("c") - F.col("est_count")) * (K + 1) - F.col("n")) <= 0
            ).alias("err_bounded"),
        )
    )
    hh_row = (
        n_true_hh.crossJoin(F.broadcast(misses))
        .crossJoin(F.broadcast(checks))
        .select(
            F.lit("misra_gries").alias("method"),
            "n_true",
            (F.col("no_fn") & F.col("under_only") & F.col("err_bounded")).alias(
                "gate_met"
            ),
        )
    )
    lf = load(spark, sf_dir, "lineitem")
    grp = lf.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("ex"),
        F.approx_count_distinct("l_partkey", 0.02).cast("long").alias("ap"),
    )
    hll_row = grp.agg(
        F.sum("ex").cast("long").alias("n_true"),
        (
            F.sum(
                F.when(
                    F.abs(F.col("ap") - F.col("ex")) * 100
                    > F.lit(_HLL_REL_ERR_PCT) * F.col("ex"),
                    1,
                ).otherwise(0)
            )
            == 0
        ).alias("gate_met"),
    ).select(F.lit("hll_distinct").alias("method"), "n_true", "gate_met")
    return hll_row.unionByName(hh_row)
