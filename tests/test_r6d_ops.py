"""Round-6d operator tests — independent semantic checks beside the
DuckDB parity gate: each key is validated against a different algorithm
(numpy reference implementations over the raw fixture) rather than the
SQL oracle's relational form."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_ks_matches_numpy_ecdf_scan(spark):
    """KS D recomputed the classic way — merge-sort both samples and
    walk the pooled ECDF gap — must agree exactly (integer numerator)."""
    from odc_product_docker_images_spark.operators.stats_tests import agg_ks_test

    row = agg_ks_test(spark, SF).collect()[0]
    ev = _events()
    x1 = np.sort(ev.loc[ev.user_id % 2 == 1, "value"].to_numpy())
    x0 = np.sort(ev.loc[ev.user_id % 2 == 0, "value"].to_numpy())
    n1, n0 = len(x1), len(x0)
    grid = np.unique(np.concatenate([x1, x0]))
    cc1 = np.searchsorted(x1, grid, side="right")
    cc0 = np.searchsorted(x0, grid, side="right")
    nums = np.abs(cc1.astype(np.int64) * n0 - cc0.astype(np.int64) * n1)
    best = int(nums.max())
    at = grid[np.argmax(nums)]  # first occurrence = smallest value tiebreak
    assert (row["n1"], row["n0"]) == (n1, n0)
    assert row["d_num"] == best
    assert row["at_value"] == at
    assert abs(row["ks_d"] - best / (n1 * n0)) < 1e-12


def test_anova_matches_numpy_decomposition(spark):
    """F recomputed from raw per-group arrays (direct SS decomposition,
    no sufficient-statistics shortcut) — agrees to the 6 dp policy, and
    SSB+SSW reproduces the total sum of squares."""
    from odc_product_docker_images_spark.operators.stats_tests import (
        agg_anova_oneway,
    )

    row = agg_anova_oneway(spark, SF).collect()[0]
    ev = _events()
    groups = [g["value"].to_numpy() for _, g in ev.groupby("event_type")]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row["k_groups"], row["n_total"]) == (k, n)
    assert abs(row["ssb"] - ssb) < 1e-3
    assert abs(row["ssw"] - ssw) < 1e-3
    assert abs(row["f_stat"] - f) < 1e-4
    sst = ((np.concatenate(groups) - grand) ** 2).sum()
    assert abs((row["ssb"] + row["ssw"]) - sst) < 1e-2
