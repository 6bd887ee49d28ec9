"""Round-5c operator tests: CUSUM change point, polygon-zone tagging
join, and the TM inverse round trip — each against an independent
reference implementation or a self-validating closure property."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def test_cusum_matches_independent_numpy(spark):
    """Recompute per-series CUSUM with plain numpy (unrounded mean) and
    require the same change-point pick and statistics within the rounding
    policy's tolerance."""
    from odc_product_docker_images_spark.operators.changepoint import (
        window_cusum_change,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    got = {r["user_id"]: r for r in window_cusum_change(spark, SF).collect()}
    assert len(got) == ev["user_id"].nunique()

    rng = np.random.default_rng(3)
    sample = rng.choice(sorted(got), size=25, replace=False)
    for uid in sample:
        s = ev[ev["user_id"] == uid].sort_values(["sec", "event_id"])
        x = s["value"].to_numpy(np.float64)
        c = np.cumsum(x - x.mean())
        r = got[uid]
        assert r["n_obs"] == len(x)
        assert r["cusum_max"] == pytest.approx(c.max(), abs=1e-5)
        assert r["cusum_min"] == pytest.approx(c.min(), abs=1e-5)
        assert r["cusum_range"] == pytest.approx(c.max() - c.min(), abs=1e-5)
        k = int(np.argmax(np.abs(c)))  # first max — matches the (sec, id) tie-break
        assert r["cp_event_id"] == s["event_id"].iloc[k]
        assert r["cp_cusum"] == pytest.approx(c[k], abs=1e-5)


def _winding_inside(px, py, verts):
    """Winding-number point-in-polygon — a DIFFERENT algorithm from the
    operator's even-odd ray cast (cross-product signs, no division)."""
    wn = 0
    n = len(verts)
    for i in range(n):
        (x1, y1), (x2, y2) = verts[i], verts[(i + 1) % n]
        if y1 <= py:
            if y2 > py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0:
                wn += 1
        elif y2 <= py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0:
            wn -= 1
    return wn != 0


def test_polygon_zone_join_matches_winding_number(spark):
    """The ray-cast join must agree with an independent winding-number
    classifier on every zone's membership count and value stats.  (The
    zones are simple polygons, where even-odd and winding coincide.)"""
    from odc_product_docker_images_spark.operators.joins_polygon import (
        _ZONES,
        join_polygon_zone,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    px = ev["value"].to_numpy(np.float64)
    py = ev["user_id"].to_numpy(np.float64)

    expected = {}
    for zone, verts in _ZONES.items():
        mask = np.array([_winding_inside(x, y, verts) for x, y in zip(px, py)])
        if mask.any():
            vals = px[mask]
            expected[zone] = (int(mask.sum()), vals.min(), vals.max(), vals.mean())

    got = {r["zone_id"]: r for r in join_polygon_zone(spark, SF).collect()}
    assert set(got) == set(expected) == set(_ZONES)  # every zone populated
    for zone, (n, vmin, vmax, vmean) in expected.items():
        r = got[zone]
        assert r["n_points"] == n
        assert r["min_value"] == vmin and r["max_value"] == vmax
        assert r["avg_value"] == pytest.approx(vmean, abs=1e-5)


def test_tm_inverse_closes_and_matches_independent_numpy(spark):
    """Two gates: (1) every cell's closure flag is 1 — forward and inverse
    are independent series, so a defect in either leg would blow the 5 mm
    gate by orders of magnitude (measured max closure error: 0.35 mm,
    dominated by the 0.1 mm artifact rounding); (2) an independently
    written numpy inverse (Snyder 8-18..8-25) recovers the source
    latitudes to < 0.5 mm on a sample."""
    import pyspark.sql.functions as F

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.operators.reproject_inverse import (
        proj_crs_roundtrip,
    )
    from odc_product_docker_images_spark.operators.scans import _TM, _TM_STEPS

    rows = proj_crs_roundtrip(spark, SF).collect()
    assert len(rows) > 100
    assert all(r["closes_within_5mm"] == 1 for r in rows)

    # independent numpy inverse on the forward outputs
    df = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value"
    ).limit(300)
    for name, txt in _TM_STEPS:
        df = df.withColumn(name, F.expr(txt))
    sample = df.select("phi", "dlam", "easting", "northing").collect()
    a, e2, ep2, k0 = _TM["a"], _TM["e2"], _TM["ep2"], _TM["k0"]
    phi = np.array([r["phi"] for r in sample])
    dlam = np.array([r["dlam"] for r in sample])
    x = np.array([r["easting"] for r in sample]) - 500000.0
    y = np.array([r["northing"] for r in sample])

    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    mu = (y / k0) / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    s1, c1v, t1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    cc1 = ep2 * c1v**2
    tt1 = t1**2
    n1 = a / np.sqrt(1 - e2 * s1**2)
    r1 = a * (1 - e2) / (1 - e2 * s1**2) ** 1.5
    d = x / (n1 * k0)
    phi_b = phi1 - (n1 * t1 / r1) * (
        d**2 / 2
        - (5 + 3 * tt1 + 10 * cc1 - 4 * cc1**2 - 9 * ep2) * d**4 / 24
        + (61 + 90 * tt1 + 298 * cc1 + 45 * tt1**2 - 252 * ep2 - 3 * cc1**2)
        * d**6 / 720
    )
    dlam_b = (
        d
        - (1 + 2 * tt1 + cc1) * d**3 / 6
        + (5 - 2 * cc1 + 28 * tt1 - 3 * cc1**2 + 8 * ep2 + 24 * tt1**2) * d**5 / 120
    ) / c1v
    assert np.abs(phi_b - phi).max() * a < 5e-4
    assert (np.abs(dlam_b - dlam) * a * np.cos(phi)).max() < 5e-4
