"""Numpy oracles for the non-SQL kernels (SURVEY.md §5.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from odc_product_docker_images_spark.kernels.frac_cover import (
    ENDMEMBERS,
    nnls_exact,
)
from odc_product_docker_images_spark.kernels.geomedian import BANDS, weiszfeld
from odc_product_docker_images_spark.kernels.wofs import TREE, classify


def test_geomedian_matches_numpy(spark, sf_dir):
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.kernels.geomedian import agg_geomedian

    got = agg_geomedian(spark, sf_dir).toPandas().set_index("l_suppkey").sort_index()
    raw = load(spark, sf_dir, "lineitem").select("l_suppkey", *BANDS).toPandas()
    for supp, grp in raw.groupby("l_suppkey"):
        expect = weiszfeld(grp[BANDS].to_numpy(dtype=np.float64))
        for i, b in enumerate(BANDS):
            assert got.loc[supp, f"gm_{b}"] == pytest.approx(expect[i], abs=1e-6)
        assert got.loc[supp, "n_obs"] == len(grp)


def test_geomedian_bucketed_is_bit_identical(spark, sf_dir):
    """The shuffle-free bucketed form must produce EXACTLY what the
    shuffled form does: per-group Weiszfeld math is independent of which
    partition (bucket vs hash-shuffle) a group lands in."""
    from odc_product_docker_images_spark.kernels.geomedian import (
        agg_geomedian,
        agg_geomedian_bucketed,
    )

    cols = ["l_suppkey", "n_obs"] + [f"gm_{b}" for b in BANDS]
    a = agg_geomedian(spark, sf_dir).toPandas().sort_values("l_suppkey")
    b = agg_geomedian_bucketed(spark, sf_dir).toPandas().sort_values("l_suppkey")
    for c in cols:
        assert list(a[c]) == list(b[c]), f"column {c} diverged"


def test_geomedian_minimizes_distance_sum():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 3))
    gm = weiszfeld(X)

    def dist_sum(y):
        return np.sqrt(((X - y) ** 2).sum(axis=1)).sum()

    base = dist_sum(gm)
    # perturbations can't beat the optimum
    for _ in range(20):
        assert base <= dist_sum(gm + rng.normal(scale=0.05, size=3)) + 1e-9
    # 1-D degenerate: geometric median == coordinate median
    X1 = rng.normal(size=(101, 1))
    assert weiszfeld(X1)[0] == pytest.approx(np.median(X1), abs=1e-6)


def test_nnls_exact_properties():
    rng = np.random.default_rng(42)
    for _ in range(100):
        b = rng.uniform(0, 1, size=3)
        f, r = nnls_exact(ENDMEMBERS, b)
        assert (f >= 0).all()
        assert r == pytest.approx(np.linalg.norm(ENDMEMBERS @ f - b), abs=1e-12)
        # optimality vs a coarse nonnegative grid search
        grid = np.linspace(0, 1.5, 16)
        best_grid = min(
            np.linalg.norm(ENDMEMBERS @ np.array([a, c, d]) - b)
            for a in grid for c in grid for d in grid
        )
        assert r <= best_grid + 1e-9
    # exact recovery for in-cone mixtures
    f_true = np.array([0.5, 0.3, 0.2])
    f, r = nnls_exact(ENDMEMBERS, ENDMEMBERS @ f_true)
    assert r == pytest.approx(0, abs=1e-10)
    assert f == pytest.approx(f_true, abs=1e-8)


def test_wofs_expr_matches_python_reference(spark, sf_dir):
    from odc_product_docker_images_spark.kernels.wofs import udf_wofs_tree

    got = udf_wofs_tree(spark, sf_dir).toPandas()
    from odc_product_docker_images_spark.io import load

    raw = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).toPandas()
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
    # compare as sorted multisets of (key..., water) instead of merging
    expect = raw.apply(lambda row: classify(TREE, row), axis=1)
    a = sorted(zip(got["l_orderkey"], got["l_linenumber"], got["water"]))
    b = sorted(zip(raw["l_orderkey"], raw["l_linenumber"], expect))
    assert a == b
    # both classes must actually occur, else the tree is degenerate
    assert set(got["water"].unique()) == {0, 1}


def test_frac_cover_spark_output(spark, sf_dir):
    from odc_product_docker_images_spark.kernels.frac_cover import udf_frac_cover

    got = udf_frac_cover(spark, sf_dir).toPandas()
    assert len(got) > 0
    for n in ["pv", "npv", "soil"]:
        assert (got[n] >= 0).all()
    assert (got["residual"] >= 0).all()


def test_geomad_matches_numpy(spark, sf_dir):
    """agg_geomedian_mads: every group's EMAD/SMAD/BCMAD must equal a
    direct per-group numpy computation around that group's own Weiszfeld
    geomedian (the rows-only key's oracle)."""
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.kernels.geomad import (
        agg_geomedian_mads,
        mads_reference,
    )

    got = agg_geomedian_mads(spark, sf_dir).toPandas().set_index("l_suppkey").sort_index()
    raw = load(spark, sf_dir, "lineitem").select("l_suppkey", *BANDS).toPandas()
    assert len(got) == raw["l_suppkey"].nunique()
    for supp, grp in raw.groupby("l_suppkey"):
        X = grp[BANDS].to_numpy(dtype=np.float64)
        gm = weiszfeld(X)
        emad, smad, bcmad = mads_reference(X, gm)
        # kernel output is rounded at 6 dp -> half-tick tolerance 5e-7
        assert got.loc[supp, "emad"] == pytest.approx(emad, abs=6e-7)
        assert got.loc[supp, "smad"] == pytest.approx(smad, abs=6e-7)
        assert got.loc[supp, "bcmad"] == pytest.approx(bcmad, abs=6e-7)
        assert got.loc[supp, "n_obs"] == len(X)


def test_geomad_known_values():
    """Hand-checkable MADs: symmetric 1-D-embedded points where every
    median is computable by eye."""
    from odc_product_docker_images_spark.kernels.geomad import mads_reference

    X = np.array([[1.0, 0.0], [3.0, 0.0], [5.0, 0.0]])
    gm = np.array([3.0, 0.0])  # geomedian of collinear points = 1-D median
    emad, smad, bcmad = mads_reference(X, gm)
    assert emad == pytest.approx(2.0)  # |1-3|, |3-3|, |5-3| -> median 2
    assert smad == pytest.approx(0.0)  # all colinear with gm -> cos == 1
    # bray-curtis: |1-3|/|1+3|=.5, 0, |5-3|/|5+3|=.25 -> median .25
    assert bcmad == pytest.approx(0.25)
