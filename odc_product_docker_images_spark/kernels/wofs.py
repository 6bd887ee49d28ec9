"""WOfS-style water classifier as a pure expression tree (SURVEY.md §2.8 U1).

Reference analog: ``data_cube_utilities/dc_water_classifier.py ::
wofs_classify`` — the published Water Observations from Space regression
tree (Mueller et al. 2016, Remote Sensing of Environment): ~20 decision
nodes over Landsat band values and normalized band ratios
(``_band_ratio(a,b) = (a-b)/(a+b)``), vectorized with ``np.where``.

Spark-first design: the reference needs a numpy kernel; here the whole tree
compiles to ONE nested ``when/otherwise`` Column expression — Catalyst sees
every branch, whole-stage codegen fuses it with the scan, and there is no
Python in the row path at any scale.  The SAME tree spec also compiles to a
nested SQL CASE for the DuckDB oracle, so Spark and oracle cannot drift.

Fixture band mapping (FIXTURES.md): b1=l_quantity, b2=100*l_discount,
b3=100*l_tax, b4=l_extendedprice/1000 — stand-ins for the 6 Landsat bands;
thresholds are synthetic but the tree SHAPE mirrors the published
classifier (ratio nodes near the root, band-value nodes at depth).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg_fast as _davg
from ..functions.det import dround as _dround
from ..functions.det import sql_davg as _sql_davg
from ..functions.det import sql_dround as _sql_dround
from ..io import load
from ..registry import register

# Named features: (Spark Column factory, SQL fragment). Denominators are
# strictly positive on the fixture domain (no div-by-zero asymmetry).
_FEATURES: dict[str, tuple] = {
    "b1": (lambda: F.col("l_quantity"), "l_quantity"),
    "b4": (lambda: F.col("l_extendedprice") / 1000, "(l_extendedprice / 1000)"),
    # _band_ratio analogs
    "r14": (
        lambda: (F.col("l_quantity") - F.col("l_extendedprice") / 1000)
        / (F.col("l_quantity") + F.col("l_extendedprice") / 1000),
        "((l_quantity - l_extendedprice / 1000) / (l_quantity + l_extendedprice / 1000))",
    ),
    "r12": (
        lambda: (F.col("l_quantity") - 100 * F.col("l_discount"))
        / (F.col("l_quantity") + 100 * F.col("l_discount") + 1),
        "((l_quantity - 100 * l_discount) / (l_quantity + 100 * l_discount + 1))",
    ),
    "r34": (
        lambda: (100 * F.col("l_tax") - F.col("l_extendedprice") / 1000)
        / (100 * F.col("l_tax") + F.col("l_extendedprice") / 1000 + 1),
        "((100 * l_tax - l_extendedprice / 1000) / (100 * l_tax + l_extendedprice / 1000 + 1))",
    ),
}


@dataclass
class Node:
    """feature <= threshold ? left : right; leaves are int class labels."""

    feature: str
    threshold: float
    left: "Node | int"
    right: "Node | int"


# Tree shaped like the WOfS classifier: ratio tests near the root,
# band-magnitude refinements deeper, 1 = water, 0 = dry.
TREE = Node(
    "r14", -0.60,
    Node("r34", -0.97, Node("b4", 45.0, 1, 0), Node("r12", 0.20, 1, Node("b1", 8.0, 1, 0))),
    Node(
        "b1", 30.0,
        Node("r12", 0.55, Node("b4", 25.0, 0, 1), Node("r34", -0.93, 0, 1)),
        Node("b4", 55.0, Node("r14", -0.35, 1, 0), 0),
    ),
)


def compile_column(node: "Node | int") -> Column:
    if isinstance(node, int):
        return F.lit(node)
    feat = _FEATURES[node.feature][0]()
    return F.when(feat <= node.threshold, compile_column(node.left)).otherwise(
        compile_column(node.right)
    )


def compile_sql(node: "Node | int") -> str:
    if isinstance(node, int):
        return str(node)
    sql = _FEATURES[node.feature][1]
    return (
        f"CASE WHEN {sql} <= {node.threshold} THEN {compile_sql(node.left)} "
        f"ELSE {compile_sql(node.right)} END"
    )


def classify(node: "Node | int", row: dict) -> int:
    """Python reference evaluator (for the pytest numpy oracle)."""
    feats = {
        "b1": row["l_quantity"],
        "b4": row["l_extendedprice"] / 1000,
        "r14": (row["l_quantity"] - row["l_extendedprice"] / 1000)
        / (row["l_quantity"] + row["l_extendedprice"] / 1000),
        "r12": (row["l_quantity"] - 100 * row["l_discount"])
        / (row["l_quantity"] + 100 * row["l_discount"] + 1),
        "r34": (100 * row["l_tax"] - row["l_extendedprice"] / 1000)
        / (100 * row["l_tax"] + row["l_extendedprice"] / 1000 + 1),
    }
    while isinstance(node, Node):
        node = node.left if feats[node.feature] <= node.threshold else node.right
    return node


@register(
    "udf_wofs_tree",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               CAST({compile_sql(TREE)} AS INTEGER) AS water
        FROM lineitem
    """,
)
def udf_wofs_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: the 'UDF' that refuses to be a UDF — the classifier tree as a
    Catalyst-visible expression, fully pushdown/codegen-friendly."""
    lf = load(spark, sf_dir, "lineitem")
    return lf.select(
        "l_orderkey",
        "l_linenumber",
        compile_column(TREE).cast("int").alias("water"),
    )


@register(
    "udf_wofs_summary",
    oracle=f"""
        SELECT l_suppkey,
               COUNT(CASE WHEN ({compile_sql(TREE)}) = 1 THEN 1 END) AS wet_count,
               COUNT(*) AS total_count,
               ROUND(COUNT(CASE WHEN ({compile_sql(TREE)}) = 1 THEN 1 END)
                     / COUNT(*), 6) AS pct_water
        FROM lineitem
        GROUP BY l_suppkey
    """,
)
def udf_wofs_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1+A6 fused: classifier + per-pixel water summary in one plan —
    the full ``water_classification`` → ``water_permanency`` product chain
    as a single shuffle (classify map-side, aggregate on the pixel key)."""
    lf = load(spark, sf_dir, "lineitem")
    water = compile_column(TREE)
    wet = F.count(F.when(water == 1, 1))
    total = F.count(F.lit(1))
    return lf.groupBy("l_suppkey").agg(
        wet.alias("wet_count"),
        total.alias("total_count"),
        F.round(wet / total, 6).alias("pct_water"),
    )


# Logistic confidence weights (binary-exact doubles: sums of powers of two,
# so every multiply-add is one IEEE op written identically in both engines).
_CONF_W = {"bias": -2.0, "pct": 4.0, "b1": 0.0625, "b4": -0.03125}


@register(
    "udf_wofs_confidence",
    oracle=f"""
        WITH s AS (
            SELECT l_suppkey,
                   COUNT(CASE WHEN ({compile_sql(TREE)}) = 1 THEN 1 END) AS wet_count,
                   COUNT(*) AS total_count,
                   {_sql_davg("l_quantity", "m_b1")},
                   {_sql_davg("(l_extendedprice / 1000)", "m_b4")}
            FROM lineitem
            GROUP BY l_suppkey
        )
        SELECT l_suppkey,
               CAST(wet_count AS BIGINT) AS wet_count,
               CAST(total_count AS BIGINT) AS total_count,
               {_sql_dround(
                   "1.0 / (1.0 + EXP(-("
                   f"{_CONF_W['bias']!r} + {_CONF_W['pct']!r} * (wet_count / total_count)"
                   f" + {_CONF_W['b1']!r} * m_b1 + {_CONF_W['b4']!r} * m_b4)))",
                   6,
               )} AS confidence
        FROM s
    """,
)
def udf_wofs_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1++/r5: the WOfS CONFIDENCE layer — the full product pairs the
    per-observation classifier with a logistic-regression confidence band
    over ancillary summary features (⟨pub⟩ GA WOfS / ceos-seo DEA water
    product: sigmoid over MrVBF/slope/clear-count covariates).  Here the
    covariates are the per-pixel wet ratio and two band means; the
    sigmoid is one codegen'd expression over ONE grouped pass (classifier
    fused map-side, exactly like `udf_wofs_summary`), so the confidence
    band costs the same single shuffle as the summary it annotates.

    Determinism: weights are binary-exact, the ratio is an exact int
    division, band means take the decimal-exact davg_fast path (long-split
    accumulation, bit-identical to davg and ~2x cheaper per row on this
    hot two-measure aggregate — both measures are |x| < 9e8), and the one
    libm op (EXP) is absorbed by dround(6)."""
    lf = load(spark, sf_dir, "lineitem")
    water = compile_column(TREE)
    per = lf.groupBy("l_suppkey").agg(
        F.count(F.when(water == 1, 1)).alias("wet_count"),
        F.count(F.lit(1)).alias("total_count"),
        _davg("l_quantity", "m_b1"),
        _davg(F.col("l_extendedprice") / 1000, "m_b4"),
    )
    z = (
        F.lit(_CONF_W["bias"])
        + F.lit(_CONF_W["pct"]) * (F.col("wet_count") / F.col("total_count"))
        + F.lit(_CONF_W["b1"]) * F.col("m_b1")
        + F.lit(_CONF_W["b4"]) * F.col("m_b4")
    )
    return per.select(
        "l_suppkey",
        "wet_count",
        "total_count",
        _dround(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("confidence"),
    )
