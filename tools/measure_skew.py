"""Measure the manual salted join at HONEST skew (SCALING.md feed).

The fixture's ``l_partkey`` is near-uniform, so ``join_skew_salted``
(operators/joins_skew.py) never demonstrates the condition it exists for.
This builds ``.tmp/skew/``: a 6M-row lineitem replica (10 PK-shifted copies
of sf0.1, the make_scaleup.py pattern) whose ``l_partkey`` is remapped so
ONE key owns ~30% of the rows, then times three strategies that produce the
IDENTICAL grouped result:

- ``plain``   — merge-hint SMJ, AQE skew-split disabled: the straggler
                baseline (one reducer owns the hot key's rows).
- ``aqe``     — AQE skew-join split enabled with thresholds lowered to
                fire at local scale (the defaults target 256MB shuffle
                partitions): Spark's own runtime mitigation.
- ``salted8`` / ``salted32`` — the manual deterministic salt from
                joins_skew.py at 8 and 32 ways: the mitigation that still
                works when AQE can't see the skew (pre-AQE engines, or a
                downstream op pinning the partitioning).

Broadcast is disabled throughout — at 100 TB the dim side doesn't
broadcast, and a local broadcast would bypass the shuffle the experiment
is about.  Runs interleaved min-of-N on one warm session; a one-time
cross-strategy result check guards that salting/splitting never changes
results.

Usage: python tools/measure_skew.py [--runs 5]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"
OUT = REPO / ".tmp" / "skew"
COPIES = 10
HOT_SHARE = 3  # pmod(hash, 10) < 3  ->  ~30% of rows on the hot key
HOT_KEY = 1


def build(spark) -> None:
    from pyspark.sql import functions as F

    from odc_product_docker_images_spark.io import load

    dst = OUT / "lineitem.parquet"
    if dst.exists():
        return
    OUT.mkdir(parents=True, exist_ok=True)
    base = load(spark, SRC, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    out = None
    for k in range(COPIES):
        rep = base.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 10_000_000))
        out = rep if out is None else out.unionByName(rep)
    # Deterministic remap: ~30% of rows land on HOT_KEY, the rest keep
    # their (near-uniform) original key — the "one key dominates" profile.
    skewed = out.withColumn(
        "l_partkey",
        F.when(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) < HOT_SHARE,
            F.lit(HOT_KEY),
        ).otherwise(F.col("l_partkey")),
    )
    skewed.repartition(32).write.mode("overwrite").parquet(str(dst))


def main() -> None:
    from pyspark.sql import functions as F

    from odc_product_docker_images_spark.functions.det import dsum
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.session import get_spark

    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 5
    spark = get_spark("measure-skew", shuffle_partitions=32)
    build(spark)

    fact = spark.read.parquet(str(OUT / "lineitem.parquet"))
    dim = load(spark, SRC, "part").select("p_partkey", "p_type")

    def agg(j):
        return j.groupBy("p_type").agg(
            F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "sum_qty")
        )

    def plain():
        return agg(
            fact.hint("merge").join(dim, fact["l_partkey"] == dim["p_partkey"])
        )

    def salted(ways: int):
        salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(ways))
        big = fact.select(
            "l_partkey", "l_quantity", salt.cast("int").alias("salt")
        )
        rep = dim.crossJoin(
            spark.range(ways).select(F.col("id").cast("int").alias("salt"))
        )
        return agg(
            big.hint("merge").join(
                rep,
                (big["l_partkey"] == rep["p_partkey"]) & (big["salt"] == rep["salt"]),
            )
        )

    # Broadcast off for every strategy: the experiment is about the shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def configure(strategy: str) -> None:
        on = strategy == "aqe"
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())
        # Defaults (256MB threshold / factor 5) never fire on a ~100MB
        # shuffle; scale them to the local partition sizes so AQE sees the
        # same relative skew a 100 TB job would.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB" if on else "256MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB" if on else "64MB"
        )

    strategies = {
        "plain": plain,
        "aqe": plain,
        "salted8": lambda: salted(8),
        "salted32": lambda: salted(32),
    }

    # One-time result-identity check (tool context: driver collect is fine).
    rows = {}
    for name, mk in strategies.items():
        configure(name)
        rows[name] = sorted(
            (r["p_type"], r["n_lines"], r["sum_qty"]) for r in mk().collect()
        )
    assert all(v == rows["plain"] for v in rows.values()), "strategy results differ"

    best = {name: float("inf") for name in strategies}
    for _ in range(runs):  # interleaved: VM noise hits all strategies alike
        for name, mk in strategies.items():
            configure(name)
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], time.perf_counter() - t0)

    hot = fact.where(F.col("l_partkey") == HOT_KEY).count()
    total = fact.count()
    print(f"rows={total} hot_key_share={hot / total:.1%} runs={runs} (min)")
    for name, t in best.items():
        print(f"| {name} | {t:.2f} s |")


if __name__ == "__main__":
    main()
