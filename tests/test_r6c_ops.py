"""Round-6c operator tests — independent semantic checks beside the
DuckDB parity gate: each key is validated against a different algorithm
or a closure property the SQL oracle can't express (library round-trips,
statistical guarantees, convergence behavior)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def test_tar_index_readable_by_stdlib_tarfile(spark):
    """The hand-walked index must agree with the stdlib READER (a second,
    independent parser) on every member of every shard."""
    import io
    import tarfile

    from odc_product_docker_images_spark.multimodal.tar_shards import (
        _pack,
        multimodal_tar_index,
    )

    got = {
        (r["shard_id"], r["member"]): (r["offset"], r["data_size"])
        for r in multimodal_tar_index(spark, SF).collect()
    }
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    checked = 0
    for shard_id, grp in docs.assign(shard_id=docs.doc_id // 50).groupby(
        "shard_id"
    ):
        blob = _pack(grp)["tar"].iloc[0]
        with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as tf:
            for m in tf.getmembers():
                off, size = got[(shard_id, m.name)]
                assert (off, size) == (m.offset, m.size)
                checked += 1
    assert checked == len(docs)


def test_safetensors_roundtrip_recovers_exact_floats(spark):
    """first/last/dim must equal the source embeddings exactly (f32
    carried into f64 is lossless)."""
    from odc_product_docker_images_spark.multimodal.safetensors import (
        multimodal_safetensors_roundtrip,
    )

    em = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    src = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float32)
        for r in em.itertuples()
    }
    rows = multimodal_safetensors_roundtrip(spark, SF).collect()
    assert len(rows) == len(src)
    for r in rows:
        arr = src[r["vec_id"]]
        assert r["dim"] == arr.shape[0]
        assert r["first_val"] == float(arr[0])
        assert r["last_val"] == float(arr[-1])


def test_sessionize_respects_gap_boundary(spark):
    """Recompute sessions for a sample of users with a plain Python scan:
    same session count, bounds, and bounce flags."""
    from odc_product_docker_images_spark.operators.windows_gaps import (
        agg_sessionize,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    got = {}
    for r in agg_sessionize(spark, SF).collect():
        got.setdefault(r["user_id"], {})[r["session_idx"]] = r
    rng = np.random.default_rng(7)
    for uid in rng.choice(sorted(got), size=20, replace=False):
        s = ev[ev["user_id"] == uid].sort_values(["sec", "event_id"])
        sessions, cur = [], None
        prev = None
        for sec in s["sec"]:
            if prev is None or sec - prev > 1800:
                cur = [sec, sec, 0]
                sessions.append(cur)
            cur[1] = sec
            cur[2] += 1
            prev = sec
        assert len(got[uid]) == len(sessions)
        for idx, (start, end, n) in enumerate(sessions, start=1):
            r = got[uid][idx]
            assert (r["start_sec"], r["end_sec"], r["n_events"]) == (start, end, n)
            assert r["is_bounce"] == int(n == 1)


def test_bootstrap_weights_behave_like_poisson(spark):
    """The md5-derived weight distribution must put the CI around the
    point estimate with plausible width (a real bootstrap property, not
    a value re-check)."""
    from odc_product_docker_images_spark.operators.metrics import agg_bootstrap_ci

    for r in agg_bootstrap_ci(spark, SF).collect():
        assert r["ci_lo"] <= r["mean_full"] <= r["ci_hi"], r
        spread = r["ci_hi"] - r["ci_lo"]
        assert 0 < spread < r["mean_full"], r  # sane width at n≈2000/variant


def test_kalman_gain_converges_to_fixed_point(spark):
    """With constant q and r the Kalman gain converges to the
    steady-state Riccati fixed point k* = p*/(p*+r) with p* solving
    p = (1-k)(p+q); every long-enough series must be at the limit."""
    from odc_product_docker_images_spark.kernels.holt import (
        _KF_Q,
        _KF_R,
        forecast_kalman_1d,
    )

    # fixed point of p <- (1-k)(p+q), k = (p+q)/(p+q+r)
    p = 1.0
    for _ in range(200):
        pp = p + _KF_Q
        p = (1.0 - pp / (pp + _KF_R)) * pp
    k_star = (p + _KF_Q) / (p + _KF_Q + _KF_R)
    rows = forecast_kalman_1d(spark, SF).collect()
    assert rows
    for r in rows:
        if r["n_obs"] >= 30:
            assert r["gain"] == pytest.approx(k_star, abs=1e-9)


def test_modularity_terms_are_consistent(spark):
    """Σ deg_c = 2m, Σ intra_c ≤ m, and each q_term matches the formula
    recomputed from its own integer columns."""
    from odc_product_docker_images_spark.operators.graph import graph_modularity

    rows = graph_modularity(spark, SF).collect()
    m = rows[0]["m"]
    assert sum(r["deg_sum"] for r in rows) == 2 * m
    assert sum(r["intra_edges"] for r in rows) <= m
    for r in rows:
        frac = r["deg_sum"] / (2.0 * m)
        assert r["q_term"] == pytest.approx(r["intra_edges"] / m - frac * frac)


def test_gmm_step_improves_separation(spark):
    """One EM step from the symmetric init must (a) keep weights in
    (0,1) summing to 1 and (b) keep the component means ordered — the
    step moved toward the data, not past it."""
    from odc_product_docker_images_spark.operators.metrics import ml_gmm_em_step

    rows = {r["k"]: r for r in ml_gmm_em_step(spark, SF).collect()}
    w1, w2 = rows[1]["weight"], rows[2]["weight"]
    assert 0 < w1 < 1 and 0 < w2 < 1
    assert w1 + w2 == pytest.approx(1.0, abs=1e-9)
    assert rows[1]["mu"] < rows[2]["mu"]
    assert rows[1]["var"] > 0 and rows[2]["var"] > 0


def test_ridge_matches_numpy_solver(spark):
    """The Cramer solve must match an INDEPENDENT numpy linalg.solve of
    the same penalized normal equations (different solver, float64
    accumulation) to high relative precision."""
    from odc_product_docker_images_spark.operators.trend import (
        _RIDGE_LAMBDA,
        ml_ridge_closed_form,
    )

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    ).to_pandas()
    X = np.column_stack(
        [np.ones(len(li)), li.l_quantity.to_numpy(), li.l_discount.to_numpy()]
    )
    y = li.l_extendedprice.to_numpy()
    A = X.T @ X + _RIDGE_LAMBDA * np.diag([0.0, 1.0, 1.0])
    beta = np.linalg.solve(A, X.T @ y)
    r = ml_ridge_closed_form(spark, SF).collect()[0]
    assert r["n_rows"] == len(li)
    for got, ref in [
        (r["beta0"], beta[0]),
        (r["beta1"], beta[1]),
        (r["beta2"], beta[2]),
    ]:
        assert got == pytest.approx(ref, rel=1e-6)


def test_pca_step_increases_rayleigh_quotient(spark):
    """One power-iteration step must not decrease the Rayleigh quotient
    v'Cv/v'v (numpy-computed covariance-free Gram), and the output must
    be unit-norm."""
    from odc_product_docker_images_spark.textvec.kmeans import (
        _PCA_V0,
        ml_pca_power_step,
    )

    em = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack(em.embedding.to_numpy()).astype(np.float64)
    v0 = np.array(_PCA_V0)
    v0 = v0 / np.linalg.norm(v0)
    rows = sorted(ml_pca_power_step(spark, SF).collect(), key=lambda r: r["dim_idx"])
    v1 = np.array([r["v_next"] for r in rows])
    assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-6)
    G = X.T @ X
    rq0 = v0 @ G @ v0
    rq1 = v1 @ G @ v1
    assert rq1 >= rq0 - 1e-6


def test_lift_table_deciles_partition_population(spark):
    """Deciles 1-10 cover the whole population with near-equal sizes and
    the lift-weighted average is exactly 1 (conservation)."""
    from odc_product_docker_images_spark.operators.metrics import ml_lift_table

    rows = sorted(ml_lift_table(spark, SF).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    total = sum(r["n_rows"] for r in rows)
    assert total == 10000  # sf0.01 events
    assert max(r["n_rows"] for r in rows) - min(r["n_rows"] for r in rows) <= 1
    base = sum(r["n_conv"] for r in rows) / total
    wavg = sum(r["lift"] * r["n_rows"] for r in rows) / total
    assert wavg == pytest.approx(1.0, abs=1e-9)
    assert base > 0


def test_url_canonical_groups_by_construction(spark):
    """Every doc with the same doc_id % 97 must land in the same
    canonical group, and the canonical URL must carry no tracker params,
    no www, no port, no fragment."""
    from odc_product_docker_images_spark.textvec.urls import dedup_url_canonical

    rows = dedup_url_canonical(spark, SF).collect()
    assert len(rows) == 97
    seen = set()
    for r in rows:
        u = r["canonical_url"]
        assert "utm_" not in u and "ref=" not in u and "#" not in u
        assert "www." not in u and ":443" not in u
        assert u.startswith("https://ex")
        members = [int(x) for x in r["members"].split(",")]
        assert r["keep_doc"] == min(members)
        assert len(members) == r["n_dups"]
        assert len({m % 97 for m in members}) == 1
        seen.update(members)
    assert len(seen) == 500
