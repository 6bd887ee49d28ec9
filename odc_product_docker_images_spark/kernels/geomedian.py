"""Geometric median composite (SURVEY.md §2.4 A3 / §2.8 U3).

Reference analog: ``dc_mosaic.create_hdmedians_multiple_band_mosaic`` →
``hdmedians :: nangeomedian`` (Cython Weiszfeld iteration) and
``odc-algo :: _geomedian.py`` — the robust multi-band composite used for
DEA's annual geomedian products.

Spark mapping: a HOLISTIC aggregate — no partial aggregation exists (the
geometric median of medians is not the median).  So this is the documented
``applyInPandas`` path: one shuffle on the pixel key, then an
Arrow-batched, numpy-vectorized Weiszfeld solve per group.  Known perf
cliff vs algebraic aggregates (SURVEY §4): mitigations are (a) Arrow
transfer, (b) vectorized iteration within each group, (c) capped
iterations with tolerance, (d) pre-partitioning by pixel key when the
composite is recomputed repeatedly.

⊘oracle: not SQL-expressible — pytest compares against a direct numpy
Weiszfeld on collected data (tests/test_kernels.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

BANDS = ["l_quantity", "l_discount", "l_tax"]


def weiszfeld(X: np.ndarray, max_iter: int = 200, tol: float = 1e-10) -> np.ndarray:
    """Geometric median of points X (n, d) by Weiszfeld iteration.

    Pure-numpy re-derivation of the classic algorithm (as in the public
    hdmedians/odc-algo kernels): start at the centroid, iterate the
    distance-weighted mean, guard points coincident with the iterate.
    """
    y = X.mean(axis=0)
    for _ in range(max_iter):
        d = np.sqrt(((X - y) ** 2).sum(axis=1))
        nz = d > 1e-12
        if not nz.any():
            break
        w = 1.0 / d[nz]
        y_new = (X[nz] * w[:, None]).sum(axis=0) / w.sum()
        if np.sqrt(((y_new - y) ** 2).sum()) < tol:
            y = y_new
            break
        y = y_new
    return y


def _gm_group(pdf: pd.DataFrame) -> pd.DataFrame:
    X = pdf[BANDS].to_numpy(dtype=np.float64)
    gm = weiszfeld(X)
    out = {"l_suppkey": [pdf["l_suppkey"].iloc[0]], "n_obs": [len(pdf)]}
    for i, b in enumerate(BANDS):
        out[f"gm_{b}"] = [round(float(gm[i]), 6)]
    return pd.DataFrame(out)


_SCHEMA = (
    "l_suppkey long, n_obs long, "
    + ", ".join(f"gm_{b} double" for b in BANDS)
)


@register("agg_geomedian")  # ⊘oracle: holistic iterative kernel — numpy-oracled in pytest
def agg_geomedian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-pixel multi-band geometric median via applyInPandas."""
    lf = load(spark, sf_dir, "lineitem")
    return (
        lf.select("l_suppkey", *BANDS)
        .groupBy("l_suppkey")
        .applyInPandas(_gm_group, schema=_SCHEMA)
    )


@register(
    "agg_geomedian_1d",
    oracle="""
        SELECT l_suppkey, ROUND(MEDIAN(l_quantity), 6) AS gm_l_quantity,
               COUNT(*) AS n_obs
        FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_geomedian_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 cross-check: in 1-D the geometric median IS the ordinary median,
    which DuckDB can oracle exactly — pins the kernel's semantics to SQL
    where the math allows it.  (DuckDB interpolates even-count medians, so
    the exact F.median built-in is used here; the Weiszfeld kernel converges
    to the same point but is only tol-close — compared in pytest instead.)"""
    lf = load(spark, sf_dir, "lineitem")
    return lf.groupBy("l_suppkey").agg(
        F.round(F.median("l_quantity"), 6).alias("gm_l_quantity"),
        F.count(F.lit(1)).alias("n_obs"),
    )
