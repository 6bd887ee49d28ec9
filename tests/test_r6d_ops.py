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


def test_acf_matches_numpy_direct(spark):
    """ACF recomputed directly from the numpy daily-count series."""
    from odc_product_docker_images_spark.operators.stats_tests import agg_acf

    rows = {r["lag"]: r for r in agg_acf(spark, SF).collect()}
    ev = _events()
    days = ev.ts.dt.floor("D")
    x = days.value_counts().sort_index().to_numpy().astype(float)
    mu = x.mean()
    dv = x - mu
    den = (dv**2).sum()
    for k in range(1, 8):
        ref = (dv[:-k] * dv[k:]).sum() / den
        assert rows[k]["n_pairs"] == len(x) - k
        assert abs(rows[k]["acf"] - ref) < 1e-6, k
    # sanity: a daily event stream is near-uniform → weak ACF everywhere
    assert all(abs(r["acf"]) < 0.9 for r in rows.values())


def test_circular_mean_matches_numpy_and_wraps(spark):
    """Mean direction recomputed with numpy vector sums; also pin the
    wrap-around property on a synthetic 359/1 pair."""
    import math

    from pyspark.sql import functions as F

    from odc_product_docker_images_spark.operators.stats_tests import (
        agg_circular_mean,
    )

    got = {r["event_type"]: r for r in agg_circular_mean(spark, SF).collect()}
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        ang = np.deg2rad(np.fmod(grp["value"].to_numpy(), 360.0))
        s, c = np.sin(ang).sum(), np.cos(ang).sum()
        ref_dir = math.degrees(math.atan2(s, c))
        ref_r = math.hypot(s, c) / len(grp)
        assert abs(got[et]["mean_dir_deg"] - ref_dir) < 1e-3, et
        assert abs(got[et]["r_len"] - ref_r) < 1e-6, et
        assert got[et]["n"] == len(grp)
    # wrap-around: mean of bearings 359° and 1° is 0°, not 180°
    sdf = spark.createDataFrame([(359.0,), (1.0,)], ["value"]).withColumn(
        "event_type", F.lit("syn")
    )
    import odc_product_docker_images_spark.operators.stats_tests as st

    orig_load = st.load
    st.load = lambda sp, d, t: sdf
    try:
        row = st.agg_circular_mean(spark, SF).collect()[0]
    finally:
        st.load = orig_load
    assert abs(row["mean_dir_deg"]) < 1e-6
