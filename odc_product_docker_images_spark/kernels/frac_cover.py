"""Fractional cover unmixing (SURVEY.md §2.8 U4).

Reference analog: ``data_cube_utilities/dc_fractional_coverage_classifier.py
:: frac_coverage_classify`` — per-pixel constrained least-squares unmixing
of surface reflectance against a fixed endmember matrix (photosynthetic
vegetation / non-photosynthetic vegetation / bare soil), solved with
scipy ``nnls`` per pixel.

Spark mapping: ``mapInPandas`` — Arrow batches stream through a numpy
solver; no shuffle at all (embarrassingly parallel per row), so this
scales linearly with executors.  scipy isn't available in this
environment, so the NNLS is solved exactly by active-set enumeration:
for 3 endmembers there are only 2^3 support sets — solve each
unconstrained subproblem with ``np.linalg.lstsq``, keep the best feasible
(f >= 0) solution.  Exact for this dimensionality, deterministic, and
dependency-free.

⊘oracle: not SQL-expressible — pytest checks feasibility, optimality vs
brute-force grid, and exact recovery of in-cone mixtures.
"""

from __future__ import annotations

from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.det import davg
from ..io import load
from ..registry import register

# Endmember matrix (bands × endmembers), synthetic but fixed: columns are
# the 'pure' band signatures of pv / npv / soil on the fixture band scale.
ENDMEMBERS = np.array(
    [
        [0.9, 0.3, 0.1],
        [0.2, 0.7, 0.2],
        [0.1, 0.2, 0.8],
    ]
)
EM_NAMES = ["pv", "npv", "soil"]


def nnls_exact(A: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, float]:
    """Exact NNLS for small n via support enumeration.

    min ||A f - b||  s.t. f >= 0.  The optimum has some support S; for
    |cols| <= ~6, trying every S and keeping the best feasible candidate is
    exact and fast (8 tiny lstsq solves for 3 endmembers).
    """
    n = A.shape[1]
    best_f = np.zeros(n)
    best_r = float(np.linalg.norm(b))
    for k in range(1, n + 1):
        for S in combinations(range(n), k):
            fs, *_ = np.linalg.lstsq(A[:, S], b, rcond=None)
            if (fs < -1e-12).any():
                continue
            f = np.zeros(n)
            f[list(S)] = np.clip(fs, 0.0, None)
            r = float(np.linalg.norm(A @ f - b))
            if r < best_r - 1e-15:
                best_r, best_f = r, f
    return best_f, best_r


def _unmix_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        B = pdf[["b1", "b2", "b3"]].to_numpy(dtype=np.float64)
        out = np.empty((len(pdf), 4))
        for i in range(len(pdf)):
            f, r = nnls_exact(ENDMEMBERS, B[i])
            out[i, :3] = f
            out[i, 3] = r
        res = pd.DataFrame(
            {
                "l_suppkey": pdf["l_suppkey"].to_numpy(),
                **{n: np.round(out[:, j], 6) for j, n in enumerate(EM_NAMES)},
                "residual": np.round(out[:, 3], 6),
            }
        )
        yield res


@register("udf_frac_cover")  # ⊘oracle: iterative numpy kernel — numpy-oracled in pytest
def udf_frac_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: composite per pixel (mean bands, normalized to ~[0,1]) then
    unmix against the endmember matrix via mapInPandas."""
    lf = load(spark, sf_dir, "lineitem")
    comp = lf.groupBy("l_suppkey").agg(
        davg(lf.l_quantity / 50, "b1"),
        davg(lf.l_discount * 10, "b2"),
        davg(lf.l_tax * 10, "b3"),
    )
    return comp.mapInPandas(
        _unmix_batches,
        schema="l_suppkey long, pv double, npv double, soil double, residual double",
    )
