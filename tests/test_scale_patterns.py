"""Scale-pattern invariants: bucketed co-located joins, salted aggregation
equivalence, decimal-sum partitioning-independence (SURVEY.md §4, §7
hard-part 6)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from odc_product_docker_images_spark.plans import checks as C

SF = "/root/testdata/sf0.001"


def test_bucketed_join_needs_no_shuffle(spark):
    """Pre-bucketing both sides on the join key co-locates matching rows —
    the join plan carries NO Exchange.  This is the 100 TB answer to
    repeatedly joining the same fact tables (scene ⋈ ledger every round)."""
    from odc_product_docker_images_spark.io import load

    tag = uuid.uuid4().hex[:6]
    ta, tb = f"li_bkt_{tag}", f"od_bkt_{tag}"
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test tables would broadcast-join (planner then ignores
        # bucketing entirely); force the sort-merge path bucketing serves
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            load(spark, SF, "lineitem")
            .select("l_orderkey", "l_quantity")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(ta)
        )
        (
            load(spark, SF, "orders")
            .select("o_orderkey", "o_totalprice")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(tb)
        )
        joined = spark.table(ta).join(
            spark.table(tb), F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert C.exchange_count(joined) == 0, C.formatted_plan(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_salted_equals_direct(spark):
    from odc_product_docker_images_spark.operators.composites import agg_salted_twophase
    from odc_product_docker_images_spark.operators.aggregates import _disc_price  # noqa: PLC2701
    from odc_product_docker_images_spark.functions.det import dsum
    from odc_product_docker_images_spark.io import load

    salted = {
        r["l_returnflag"]: (r["revenue"], r["n"])
        for r in agg_salted_twophase(spark, SF).collect()
    }
    direct = {
        r["l_returnflag"]: (r["revenue"], r["n"])
        for r in load(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(_disc_price(), "revenue"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == direct  # bit-identical, not approximately


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_decimal_sum_is_partitioning_invariant(spark, parts):
    """det.dsum must return the SAME double no matter how rows are split
    across partitions — the property the whole oracle-hash strategy
    rests on."""
    from odc_product_docker_images_spark.functions.det import dsum
    from odc_product_docker_images_spark.io import load

    df = load(spark, SF, "lineitem").repartition(parts)
    got = df.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "s")
    ).collect()[0]["s"]
    # reference value from a single-partition run
    ref = (
        load(spark, SF, "lineitem")
        .coalesce(1)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "s"))
        .collect()[0]["s"]
    )
    assert got == ref


def test_iter_udf_matches_expr(spark):
    """The iterator pandas UDF scores bit-match the equivalent Column
    expression (Arrow round-trip preserves doubles exactly)."""
    from odc_product_docker_images_spark.kernels.udfs import _W, udf_iter_score
    from odc_product_docker_images_spark.io import load

    got = udf_iter_score(spark, SF).toPandas().sort_values(
        ["l_orderkey", "l_linenumber", "score"]
    )["score"].to_numpy()
    expr = (
        load(spark, SF, "lineitem")
        .select(
            (
                F.lit(_W["bias"])
                + F.lit(_W["qty"]) * F.col("l_quantity")
                + F.lit(_W["disc"]) * F.col("l_discount")
                + F.lit(_W["tax"]) * F.col("l_tax")
            ).alias("score"),
            "l_orderkey",
            "l_linenumber",
        )
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber", "score"])["score"]
        .to_numpy()
    )
    assert (got == expr).all()