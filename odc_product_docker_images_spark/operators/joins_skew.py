"""Manual skew-salted join (SURVEY.md §2.3 J-scale).

Split out of ``joins`` so the key registers independently — registration
order is the driver's grading-window mechanism (registry._MODULES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import dsum, sql_dsum
from ..io import load
from ..registry import register

_SALT_WAYS = 8


@register(
    "join_skew_salted",
    oracle=f"""
        SELECT p_type, COUNT(*) AS n_lines, {sql_dsum("l_quantity", "sum_qty")}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J-scale: the MANUAL salted join — the mitigation when one join key
    holds a pathological share of the fact rows and the dimension side
    can't broadcast (too big) while AQE's skew split can't help (e.g. the
    skew feeds a downstream aggregation, or the engine predates AQE).
    Technique: salt the fact side with a DETERMINISTIC per-row hash (never
    ``rand()`` — retries must re-salt identically), replicate the
    dimension side ``_SALT_WAYS`` times, and join on (key, salt): the hot
    key's rows now spread over ``_SALT_WAYS`` reducers.  Salting must
    never change RESULTS — the oracle is the plain unsalted join.  The
    join is hinted merge (a broadcast would make the salt pointless at
    fixture size); the salted key set is plan-pinned in
    tests/test_plans.py.  At 100 TB: salt ways ≈ ceil(hot-key share ×
    shuffle partitions) — replication multiplies the dim shuffle volume,
    so it prices in only when a key genuinely dominates."""
    lf = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT_WAYS))
    big = lf.select("l_partkey", "l_quantity", salt.cast("int").alias("salt"))
    dim = pt.select("p_partkey", "p_type").crossJoin(
        spark.range(_SALT_WAYS).select(F.col("id").cast("int").alias("salt"))
    )
    j = big.hint("merge").join(
        dim, (big["l_partkey"] == dim["p_partkey"]) & (big["salt"] == dim["salt"])
    )
    return j.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "sum_qty")
    )
