"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``odc_product_docker_images_spark.registry``: every operator
from SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame`` callable plus
(when SQL-expressible) a DuckDB oracle string.  The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01
and compares it against ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from odc_product_docker_images_spark import registry
from odc_product_docker_images_spark.session import prep


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (`agg_multi_stat`, SURVEY §2.4 A7) on sf0.001.

    Resolved THROUGH the registry (not a direct module import): a direct
    import would register that module's keys first and scramble the
    curated registration order the driver's grading window keys off."""
    prep(spark)
    return registry.queries()["agg_multi_stat"](spark, "/root/testdata/sf0.001")


def _wrap(fn: registry.QueryFn) -> registry.QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        prep(spark)  # UTC + Arrow + AQE on whatever session the driver hands us
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: _wrap(fn) for k, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query key."""
    return registry.oracle_sql()
