"""Virtual-product combinators (SURVEY.md §2.11 — the ODC virtual-product
framework re-expressed Spark-first).

The reference stack's ``datacube.virtual`` lets users DECLARE a product as
a recipe of combinators instead of writing load-and-loop code:

- ``input``       — a raw product load (product + measurements + query)
- ``transform``   — per-pixel band math over an upstream product
- ``collate``     — stack several products into one cube along a new
                    source coordinate (multi-platform harmonization)
- ``juxtapose``   — align several products side-by-side on shared
                    coordinates (multi-sensor band join)
- ``aggregate``   — a statistic over a coordinate (temporal composite)

The Spark translation is exact and *thin*: every combinator emits a
declarative DataFrame fragment (selectExpr / unionByName / equi-join /
groupBy-agg), so Catalyst sees ONE fused logical plan for the whole recipe
— filters still push into the leaf scans, unreferenced measurements still
prune, and the physical strategy (broadcast vs shuffle, partial aggs) is
chosen over the composed plan, not per combinator.  That is the point of
re-hosting the framework on Spark: the reference evaluates each recipe
node eagerly over xarray chunks, while here composition costs nothing at
runtime.

Determinism contract: ``mean`` routes through det.davg (exact decimal
path), ``sum_long`` stays integer; per-pixel transform arithmetic is
plain IEEE (left unrounded, both engines evaluate identical exprs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.det import davg, sql_davg
from ..io import load
from ..registry import register


def build(spark: SparkSession, sf_dir: str, spec: dict) -> DataFrame:
    """Interpret a virtual-product recipe (nested single-key dicts) into a
    composed DataFrame plan.  Non-key column names must be disjoint across
    ``juxtapose`` inputs (ODC raises on duplicate measurement names too)."""
    (kind, body), = spec.items()
    if kind == "input":
        df = load(spark, sf_dir, body["table"])
        if body.get("where"):
            df = df.where(F.expr(body["where"]))
        return df.selectExpr(*body["select"])
    if kind == "transform":
        df = build(spark, sf_dir, body["input"])
        exprs = [f"{e} AS {a}" for a, e in body["exprs"].items()]
        return df.selectExpr(*body.get("keep", []), *exprs)
    if kind == "collate":
        tagged = []
        for tag, sub in zip(body["tags"], body["inputs"]):
            tagged.append(
                build(spark, sf_dir, sub).withColumn(
                    body["tag_name"], F.lit(tag)
                )
            )
        out = tagged[0]
        for t in tagged[1:]:
            out = out.unionByName(t)
        return out
    if kind == "juxtapose":
        dfs = [build(spark, sf_dir, sub) for sub in body["inputs"]]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.join(d, body["on"])
        return out
    if kind == "aggregate":
        df = build(spark, sf_dir, body["input"])
        aggs = []
        for alias, stat, col in body["stats"]:
            if stat == "mean":
                aggs.append(davg(col, alias))
            elif stat == "count":
                aggs.append(F.count(F.lit(1)).alias(alias))
            elif stat == "count_distinct":
                aggs.append(F.countDistinct(col).alias(alias))
            elif stat == "sum_long":
                aggs.append(F.sum(col).cast("long").alias(alias))
            elif stat == "max":
                aggs.append(F.max(col).alias(alias))
            elif stat == "min":
                aggs.append(F.min(col).alias(alias))
            else:
                raise ValueError(f"unknown stat {stat!r}")
        return df.groupBy(*body["group"]).agg(*aggs)
    raise ValueError(f"unknown combinator {kind!r}")


# The registered recipe exercises every combinator the way an EO user
# would: harmonize two optical "platforms" (collate) into a solar-day
# composite (aggregate), juxtapose a second sensor's composite, band-math
# the ratio (transform), then summarize per pixel (aggregate).
_RECIPE: dict = {
    "aggregate": {
        "group": ["user_id"],
        "stats": [
            ("n_days", "count", "*"),
            ("mean_ratio", "mean", "ratio"),
            ("total_a_obs", "sum_long", "a_obs"),
            ("max_platforms", "max", "n_platforms"),
        ],
        "input": {
            "transform": {
                "keep": ["user_id", "a_obs", "n_platforms"],
                "exprs": {"ratio": "b_mean / a_mean"},
                "input": {
                    "juxtapose": {
                        "on": ["user_id", "day"],
                        "inputs": [
                            {
                                "aggregate": {
                                    "group": ["user_id", "day"],
                                    "stats": [
                                        ("a_mean", "mean", "value"),
                                        ("a_obs", "count", "*"),
                                        ("n_platforms", "count_distinct", "platform"),
                                    ],
                                    "input": {
                                        "transform": {
                                            "keep": ["user_id", "value", "platform"],
                                            "exprs": {"day": "CAST(ts AS DATE)"},
                                            "input": {
                                                "collate": {
                                                    "tag_name": "platform",
                                                    "tags": ["p_click", "p_view"],
                                                    "inputs": [
                                                        {
                                                            "input": {
                                                                "table": "events",
                                                                "select": ["user_id", "ts", "value"],
                                                                "where": "event_type = 'click'",
                                                            }
                                                        },
                                                        {
                                                            "input": {
                                                                "table": "events",
                                                                "select": ["user_id", "ts", "value"],
                                                                "where": "event_type = 'view'",
                                                            }
                                                        },
                                                    ],
                                                }
                                            },
                                        }
                                    },
                                }
                            },
                            {
                                "aggregate": {
                                    "group": ["user_id", "day"],
                                    "stats": [("b_mean", "mean", "value")],
                                    "input": {
                                        "transform": {
                                            "keep": ["user_id", "value"],
                                            "exprs": {"day": "CAST(ts AS DATE)"},
                                            "input": {
                                                "input": {
                                                    "table": "events",
                                                    "select": ["user_id", "ts", "value"],
                                                    "where": "event_type = 'purchase'",
                                                }
                                            },
                                        }
                                    },
                                }
                            },
                        ],
                    }
                },
            }
        },
    }
}


@register(
    "product_virtual",
    oracle=f"""
        WITH colla AS (
            SELECT user_id, ts, value, 'p_click' AS platform
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, ts, value, 'p_view' AS platform
            FROM events WHERE event_type = 'view'
        ), compa AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   {sql_davg("value", "a_mean")},
                   COUNT(*) AS a_obs,
                   CAST(COUNT(DISTINCT platform) AS BIGINT) AS n_platforms
            FROM colla GROUP BY 1, 2
        ), compb AS (
            SELECT user_id, CAST(ts AS DATE) AS day, {sql_davg("value", "b_mean")}
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ), jux AS (
            SELECT compa.user_id, compa.a_obs, compa.n_platforms,
                   compb.b_mean / compa.a_mean AS ratio
            FROM compa JOIN compb
              ON compa.user_id = compb.user_id AND compa.day = compb.day
        )
        SELECT user_id,
               COUNT(*) AS n_days,
               {sql_davg("ratio", "mean_ratio")},
               CAST(SUM(a_obs) AS BIGINT) AS total_a_obs,
               MAX(n_platforms) AS max_platforms
        FROM jux GROUP BY user_id
    """,
)
def product_virtual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11: the virtual-product framework end-to-end — one declarative
    recipe using ALL five combinators (input → collate → transform →
    aggregate → juxtapose → transform → aggregate) compiled into a single
    fused Catalyst plan.  Plan shape to want (and PLANS.md audits): three
    leaf scans of events with their ``event_type`` predicates PUSHED (the
    recipe's query reaches the parquet reader through four combinator
    layers), two partial-aggregated composites, one equi-join on the
    (pixel, day) coordinates — AQE picks broadcast at fixture size,
    co-partitioned SMJ at 100 TB — and a final hash-agg.  Nothing about
    the combinator framework adds a pass, a UDF, or a shuffle beyond what
    the handwritten query would do; that is the acceptance bar for
    re-hosting ODC's recipe DSL on Spark."""
    return build(spark, sf_dir, _RECIPE)
