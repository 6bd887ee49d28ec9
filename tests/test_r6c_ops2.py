"""Round-6c operator tests, part 2 — independent semantic checks for the
second wave of keys (FIFO, skyline, Mann-Whitney, survivorship, bridge,
DiD, nearest-asof, DBSCAN, absorption): each validated against a numpy /
pandas recomputation or a conservation identity."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def test_fifo_allocations_conserve_quantities(spark):
    """Per out-lot, allocations sum to min(out qty, remaining supply);
    per in-lot, allocations never exceed the lot quantity."""
    from odc_product_docker_images_spark.operators.joins import agg_fifo_allocation

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=[
            "l_partkey", "l_orderkey", "l_linenumber", "l_quantity",
            "l_returnflag", "l_shipdate",
        ],
    ).to_pandas()
    rows = agg_fifo_allocation(spark, SF).collect()
    by_out: dict[tuple, int] = {}
    by_in: dict[tuple, int] = {}
    for r in rows:
        assert r["qty_alloc"] > 0
        by_out[(r["part"], r["out_id"])] = (
            by_out.get((r["part"], r["out_id"]), 0) + r["qty_alloc"]
        )
        by_in[(r["part"], r["in_id"])] = (
            by_in.get((r["part"], r["in_id"]), 0) + r["qty_alloc"]
        )
    li["lot_id"] = li.l_orderkey * 10 + li.l_linenumber
    li["q"] = li.l_quantity.astype("int64")
    ins = li[li.l_returnflag == "N"]
    outs = li[li.l_returnflag == "R"]
    in_q = ins.set_index(["l_partkey", "lot_id"]).q.to_dict()
    supply = ins.groupby("l_partkey").q.sum().to_dict()
    for (part, in_id), alloc in by_in.items():
        assert alloc <= in_q[(part, in_id)]
    # out lots fill FIFO until supply runs dry: per-out totals equal the
    # overlap of the out interval with [0, total_supply)
    outs = outs.sort_values(["l_partkey", "l_shipdate", "l_orderkey", "l_linenumber"])
    outs["hi"] = outs.groupby("l_partkey").q.cumsum()
    for t in outs.itertuples():
        expect = max(0, min(t.hi, supply.get(t.l_partkey, 0)) - (t.hi - t.q))
        got = by_out.get((t.l_partkey, t.lot_id), 0)
        assert got == expect, (t.l_partkey, t.lot_id)


def test_skyline_matches_bruteforce_dominance(spark):
    """The returned front must be EXACTLY the numpy brute-force
    undominated set."""
    from odc_product_docker_images_spark.operators.metrics import agg_skyline_2d

    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    ).to_pandas()
    x = li.l_extendedprice.to_numpy()
    y = li.l_discount.to_numpy()
    pid = (li.l_orderkey * 10 + li.l_linenumber).to_numpy()
    front = set()
    for i in range(len(x)):
        dominated = np.any(
            (x >= x[i]) & (y <= y[i]) & ((x > x[i]) | (y < y[i]))
        )
        if not dominated:
            front.add(int(pid[i]))
    got = {r["pid"] for r in agg_skyline_2d(spark, SF).collect()}
    assert got == front


def test_mann_whitney_matches_numpy_midranks(spark):
    """U and AUC recomputed with numpy midranks must match exactly."""
    from odc_product_docker_images_spark.operators.metrics import agg_mann_whitney

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value", "event_id"]
    ).to_pandas()
    order = np.lexsort((ev.event_id.to_numpy(), ev.value.to_numpy()))
    v = ev.value.to_numpy()[order]
    t = ev.event_type.to_numpy()[order]
    rk = np.arange(1, len(v) + 1, dtype=np.float64)
    # midranks per tied value
    import pandas as pd

    df = pd.DataFrame({"v": v, "t": t, "rk": rk})
    df["ark"] = df.groupby("v").rk.transform(lambda s: (s.min() + s.max()) / 2)
    sums = df.groupby("t").ark.sum().to_dict()
    ns = df.groupby("t").size().to_dict()
    for r in agg_mann_whitney(spark, SF).collect():
        a = r["type_a"]
        u = sums[a] - ns[a] * (ns[a] + 1) / 2
        assert r["u_a"] == pytest.approx(u, abs=1e-6)
        assert r["auc"] == pytest.approx(u / (ns[a] * ns[r["type_b"]]), abs=1e-12)


def test_survivorship_picks_latest_nonnull(spark):
    """Recompute survivors for sample users with pandas."""
    import json

    from odc_product_docker_images_spark.textvec.urls import dedup_survivorship

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    got = {r["user_id"]: r for r in dedup_survivorship(spark, SF).collect()}
    rng = np.random.default_rng(11)
    for uid in rng.choice(sorted(got), size=15, replace=False):
        s = ev[ev.user_id == uid].sort_values(["sec", "event_id"])
        types = [x for x in s.event_type if x != "error"]
        bigs = [x for x in s.value if x > 100.0]
        ks = [json.loads(p).get("k") for p in s.props]
        ks = [str(k) for k in ks if k is not None]
        r = got[uid]
        assert r["n_records"] == len(s)
        assert r["last_type"] == (types[-1] if types else None)
        assert r["last_big"] == (bigs[-1] if bigs else None)
        assert r["last_k"] == (ks[-1] if ks else None)


def test_revenue_bridge_conserves_total_delta(spark):
    """Bucket deltas must sum exactly to total P2 − P1 revenue (6 dp
    grid), and bucket labels must match their sign structure."""
    from odc_product_docker_images_spark.operators.metrics import agg_revenue_bridge

    rows = agg_revenue_bridge(spark, SF).collect()
    od = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    split = np.datetime64("1998-06-01")
    p1 = od[od.o_orderdate < split].o_totalprice.sum()
    p2 = od[od.o_orderdate >= split].o_totalprice.sum()
    assert sum(r["delta"] for r in rows) == pytest.approx(p2 - p1, abs=1e-4)
    for r in rows:
        if r["bucket"] == "new":
            assert r["rev_p1"] == 0.0 and r["rev_p2"] > 0.0
        if r["bucket"] == "churned":
            assert r["rev_p2"] == 0.0 and r["rev_p1"] > 0.0
        if r["bucket"] == "expansion":
            assert r["delta"] > 0
        if r["bucket"] == "contraction":
            assert r["delta"] < 0


def test_did_matches_numpy_cell_means(spark):
    """The estimator must equal the four numpy cell means combined."""
    from odc_product_docker_images_spark.operators.metrics import agg_diff_in_diff

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"]
    ).to_pandas()
    wk = ev["ts"].astype("datetime64[s]").astype("int64") // (7 * 86400)
    treat = (ev.user_id % 2).to_numpy()
    post = (wk >= 2819).to_numpy()
    v = ev.value.to_numpy()
    m = lambda t, p: v[(treat == t) & (post == p)].mean()  # noqa: E731
    r = agg_diff_in_diff(spark, SF).collect()[0]
    expect = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
    assert r["did_estimate"] == pytest.approx(expect, abs=1e-6)
    assert r["n_total"] == len(ev)


def test_asof_nearest_is_truly_minimal(spark):
    """For sample purchases, the matched view must be the argmin |Δ|
    within tolerance against a pandas recompute."""
    from odc_product_docker_images_spark.operators.joins import join_asof_nearest

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    views = ev[ev.event_type == "view"]
    got = {r["event_id"]: r for r in join_asof_nearest(spark, SF).collect()}
    purchases = ev[ev.event_type == "purchase"]
    n_checked = 0
    for t in purchases.itertuples():
        vv = views[views.user_id == t.user_id]
        if len(vv) == 0:
            assert t.event_id not in got
            continue
        d = (vv.sec - t.sec).abs()
        if d.min() > 3600:
            assert t.event_id not in got
            continue
        best = d.min()
        r = got[t.event_id]
        assert r["gap_sec"] == best
        n_checked += 1
    assert n_checked == len(got)


def test_dbscan_counts_match_bruteforce(spark):
    """Neighbor counts for a sample of points must equal the numpy
    all-pairs haversine count."""
    from odc_product_docker_images_spark.operators.joins_spatial import (
        _MIX,
        _MIX2,
        geo_dbscan_core,
    )

    cu = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    k = cu.c_custkey.to_numpy().astype(np.int64)
    lat = np.radians((k * _MIX % 10000) / 1000.0 - 5.0)
    lon = np.radians((k * _MIX2 % 20000) / 1000.0 - 10.0)
    got = {r["cid"]: r for r in geo_dbscan_core(spark, SF).collect()}
    rng = np.random.default_rng(13)
    for cid in rng.choice(sorted(got), size=20, replace=False):
        i = int(np.where(k == cid)[0][0])
        d = (
            2
            * 6371.0
            * np.arcsin(
                np.sqrt(
                    np.sin((lat - lat[i]) / 2) ** 2
                    + np.cos(lat[i]) * np.cos(lat) * np.sin((lon - lon[i]) / 2) ** 2
                )
            )
        )
        n = int(np.sum((np.round(d, 6) <= 50.0) & (k != cid)))
        assert got[cid]["n_neighbors"] == n


def test_absorption_probs_are_valid_and_consistent(spark):
    """b must solve (I−Q)b = R against the independently recomputed
    transition matrix, and each b must lie in [0, 1]."""
    import pandas as pd

    from odc_product_docker_images_spark.operators.behavior import (
        agg_markov_absorption,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    ev = ev.sort_values(["user_id", "sec", "event_id"])
    ev["next"] = ev.groupby("user_id").event_type.shift(-1)
    pairs = ev.dropna(subset=["next"])
    counts = pairs.groupby(["event_type", "next"]).size()
    totals = pairs.groupby("event_type").size()
    T = ["click", "signup", "view"]
    Q = np.zeros((3, 3))
    R = np.zeros(3)
    for i, s in enumerate(T):
        for j, d in enumerate(T):
            Q[i, j] = counts.get((s, d), 0) / totals[s]
        R[i] = counts.get((s, "purchase"), 0) / totals[s]
    b = np.linalg.solve(np.eye(3) - Q, R)
    r = agg_markov_absorption(spark, SF).collect()[0]
    for name, ref in zip(["b_click", "b_signup", "b_view"], b):
        assert 0.0 <= r[name] <= 1.0
        assert r[name] == pytest.approx(ref, abs=1e-9)
