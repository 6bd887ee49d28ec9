"""r10 independent-replica audits — the r9c method (a numpy replica on
collected data) applied to the remaining raw-power-sum keys the
mean-normalization sweep did not rewrite.  Parity cannot see a
cancellation loss both engines mirror; only an independent float64
two-pass replica can.  Audited live this round: ml_ridge_closed_form
(rel diff ~1e-13 on all three betas), agg_breusch_pagan (LM matches the
unrounded replica to the 6 dp-sum propagation), agg_cronbach_alpha
(alpha matches to 1e-6; the population-variance convention cancels in
the iv/tv ratio).  These pins keep the findings from regressing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from odc_product_docker_images_spark.io import load
from odc_product_docker_images_spark.registry import all_queries

from conftest import SF_DIR


def test_ridge_closed_form_matches_numpy_solve(spark):
    """Cramer-over-decimal-sums vs an independent float64 normal-equation
    solve: the 6 dp-rounded sufficient sums propagate to <=1e-9 relative
    on this fixture's conditioning; a cancellation bug would blow past
    1e-6 immediately."""
    li = (
        load(spark, SF_DIR, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(li)), li["l_quantity"], li["l_discount"]]
    ).astype(float)
    y = li["l_extendedprice"].to_numpy(float)
    A = X.T @ X + 10.0 * np.diag([0.0, 1.0, 1.0])  # _RIDGE_LAMBDA
    beta = np.linalg.solve(A, X.T @ y)
    row = all_queries()["ml_ridge_closed_form"].fn(spark, SF_DIR).collect()[0]
    got = np.array([row["beta0"], row["beta1"], row["beta2"]])
    rel = np.abs(got - beta) / np.maximum(np.abs(beta), 1e-12)
    assert rel.max() < 1e-6, (got, beta, rel)


def test_breusch_pagan_matches_numpy_replica(spark):
    """LM = n * R^2 of e^2-on-x vs an independent polyfit/corrcoef chain
    (different operation order, unrounded intermediates): agreement
    within the 6 dp-rounded-sum propagation proves the two-pass
    fit+residual pipeline is numerically sound, not just engine-mirrored."""
    ev = load(spark, SF_DIR, "events").select("ts", "value").toPandas()
    x = (
        (pd.to_datetime(ev["ts"]).dt.normalize() - pd.Timestamp("2024-01-01"))
        .dt.days.to_numpy(float)
    )
    y = ev["value"].to_numpy(float)
    b, a = np.polyfit(x, y, 1)
    e2 = (y - a - b * x) ** 2
    r = np.corrcoef(x, e2)[0, 1]
    lm = len(x) * r * r
    row = all_queries()["agg_breusch_pagan"].fn(spark, SF_DIR).collect()[0]
    assert abs(row["lm_stat"] - lm) / max(abs(lm), 1e-12) < 1e-4, (
        row["lm_stat"],
        lm,
    )


def test_cronbach_alpha_matches_numpy_replica(spark):
    """alpha from an independent two-pass (sample-variance) replica: the
    n/(n-1) convention cancels in the sum_item_var/total_var ratio, so
    alpha must agree to rounding even though the key reports population
    variances."""
    em = load(spark, SF_DIR, "embeddings").select("embedding").toPandas()
    E = np.stack(em["embedding"].to_numpy()).astype(float)
    items = E[:, :4]  # _CA_ITEMS
    k = items.shape[1]
    iv = items.var(axis=0, ddof=1).sum()
    tv = items.sum(axis=1).var(ddof=1)
    alpha = k / (k - 1) * (1 - iv / tv)
    row = all_queries()["agg_cronbach_alpha"].fn(spark, SF_DIR).collect()[0]
    assert abs(row["alpha"] - alpha) < 1e-4, (row["alpha"], alpha)
