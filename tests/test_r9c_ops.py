"""Round-9c operator tests — independent semantic checks beside the
DuckDB parity gate (the test_r6c/r6d/r8 convention): each key is
validated against a different algorithm (numpy/stdlib reference
implementations over the raw fixture) rather than the SQL oracle's
relational form."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _events():
    return pq.read_table(
        f"{SF}/events.parquet", columns=["event_id", "ts", "event_type", "value"]
    ).to_pandas()


def _embeddings():
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return t["vec_id"].to_numpy(), mat, t["label"].to_numpy()


def test_jarque_bera_matches_numpy_moments(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_jarque_bera,
    )

    got = {r["event_type"]: r for r in agg_jarque_bera(spark, SF).collect()}
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        x = grp["value"].to_numpy() / 512.0
        n = len(x)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4)
        r = got[et]
        assert r["n"] == n
        assert abs(r["skewness"] - g1) < 1e-4
        assert abs(r["kurtosis_excess"] - g2) < 1e-4
        assert abs(r["jb_stat"] - jb) < max(1e-3, 1e-5 * abs(jb))
        assert r["nonnormal"] == int(jb > 5.991)
    # value is exponential-ish: strongly right-skewed everywhere
    assert all(r["skewness"] > 0 for r in got.values())


def test_durbin_watson_matches_numpy_ols(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_durbin_watson,
    )

    got = {r["event_type"]: r for r in agg_durbin_watson(spark, SF).collect()}
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    for et, grp in ev.groupby("event_type"):
        y = grp.groupby("d").size().sort_index().to_numpy().astype(float)
        n = len(y)
        i = np.arange(n, dtype=float)
        b, a = np.polyfit(i, y, 1)
        e = y - (a + b * i)
        dw = ((e[1:] - e[:-1]) ** 2).sum() / (e**2).sum()
        r = got[et]
        assert r["n_days"] == n
        assert abs(r["dw"] - dw) < 1e-4
        assert abs(r["rho_lag1"] - (1 - dw / 2)) < 1e-4


def test_levene_bf_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_levene_bf,
    )

    row = agg_levene_bf(spark, SF).collect()[0]
    ev = _events()
    zs = []
    for _, grp in ev.groupby("event_type"):
        x = grp["value"].to_numpy()
        zs.append(np.abs(x - np.median(x)))
    k = len(zs)
    ntot = sum(len(z) for z in zs)
    zbar = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f = (ssb / (k - 1)) / (ssw / (ntot - k))
    assert row["k"] == k and row["ntot"] == ntot
    assert abs(row["ssb"] - ssb) < max(1e-3, 1e-6 * ssb)
    assert abs(row["ssw"] - ssw) < max(1e-3, 1e-6 * ssw)
    assert abs(row["f_stat"] - f) < 1e-3
    assert row["reject_equal_var"] == int(f > 2.372)


def test_ccf_lags_matches_numpy_corrcoef(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_ccf_lags,
    )

    got = {r["lag"]: r for r in agg_ccf_lags(spark, SF).collect()}
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    daily = ev.groupby("d").agg(x=("event_id", "size"), y=("value", "sum"))
    daily = daily.sort_index()
    x = daily["x"].to_numpy().astype(float)
    y = daily["y"].to_numpy()
    assert set(got) == set(range(8))
    for k in range(8):
        xp = x[: len(x) - k] if k else x
        yp = y[k:]
        r = np.corrcoef(xp, yp)[0, 1]
        assert got[k]["n_pairs"] == len(xp)
        assert abs(got[k]["ccf"] - r) < 1e-4
    # lag 0 is the strongest co-movement on a volume-driven revenue series
    assert got[0]["ccf"] == max(v["ccf"] for v in got.values())


def test_periodogram_matches_direct_dft(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_periodogram,
    )

    got = {r["k"]: r for r in agg_periodogram(spark, SF).collect()}
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    x = ev.groupby("d").size().sort_index().to_numpy().astype(float)
    n = len(x)
    t = np.arange(n)
    for k in range(1, 11):
        ang = 2 * np.pi * k * t / n
        c = (x * np.cos(ang)).sum()
        s = (x * np.sin(ang)).sum()
        p = (c * c + s * s) / n
        r = got[k]
        assert r["n_days"] == n
        # per-row 6 dp trig rounds × count weights → absolute slack
        assert abs(r["power"] - p) < max(1.0, 1e-4 * p)
        assert abs(r["period_days"] - n / k) < 1e-6


def test_cooks_distance_matches_numpy_influence(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_cooks_distance,
    )

    rows = sorted(agg_cooks_distance(spark, SF).collect(), key=lambda r: r["t"])
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    y = ev.groupby("d")["value"].sum().sort_index().to_numpy() / 1048576.0
    n = len(y)
    t = np.arange(n, dtype=float)
    b, a = np.polyfit(t, y, 1)
    e = y - (a + b * t)
    stt = ((t - t.mean()) ** 2).sum()
    h = 1.0 / n + (t - t.mean()) ** 2 / stt
    s2 = (e**2).sum() / (n - 2)
    d = e**2 * h / (2 * s2 * (1 - h) ** 2)
    assert len(rows) == n
    for r in rows:
        i = r["t"]
        assert abs(r["leverage"] - h[i]) < 1e-6
        assert abs(r["cooks_d"] - d[i]) < max(1e-5, 1e-3 * d[i])
        assert r["influential"] == int(d[i] > 4.0 / n)
    # leverage is maximal at the series endpoints
    assert rows[0]["leverage"] == max(r["leverage"] for r in rows)


def test_pr_auc_matches_numpy_average_precision(spark):
    from odc_product_docker_images_spark.operators.model_eval import ml_pr_auc

    row = ml_pr_auc(spark, SF).collect()[0]
    _, mat, label = _embeddings()
    score = mat[:, 0]
    ypos = (label < 5).astype(int)
    # group by distinct score descending (threshold = score, inclusive)
    order = np.argsort(-score, kind="stable")
    s_sorted, y_sorted = score[order], ypos[order]
    p = int(ypos.sum())
    ap = 0.0
    best_f1 = 0.0
    i = 0
    tp = fp = 0
    nthr = 0
    while i < len(s_sorted):
        j = i
        cp = cn = 0
        while j < len(s_sorted) and s_sorted[j] == s_sorted[i]:
            cp += y_sorted[j]
            cn += 1 - y_sorted[j]
            j += 1
        tp += cp
        fp += cn
        ap += (cp / p) * (tp / (tp + fp))
        best_f1 = max(best_f1, 2 * tp / (tp + fp + p))
        nthr += 1
        i = j
    assert row["n_thresholds"] == nthr
    assert row["n_pos"] == p and row["n_neg"] == len(ypos) - p
    assert abs(row["avg_precision"] - ap) < 1e-6
    assert abs(row["best_f1"] - best_f1) < 1e-6
    # weak scorer: AP should hover near prevalence, far from 1
    prev = p / len(ypos)
    assert abs(row["avg_precision"] - prev) < 0.2


def test_brier_decomposition_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.model_eval import (
        ml_brier_decomposition,
    )

    row = ml_brier_decomposition(spark, SF).collect()[0]
    _, mat, label = _embeddings()
    prob = np.clip(0.5 + mat[:, 0], 0.0, 1.0)
    y = (label < 5).astype(float)
    bins = np.minimum(np.floor(prob * 10).astype(int), 9)
    n = len(y)
    brier = ((prob - y) ** 2).mean()
    ybar = y.mean()
    rel = res = 0.0
    for b in np.unique(bins):
        m = bins == b
        nb = m.sum()
        rel += nb * (prob[m].mean() - y[m].mean()) ** 2
        res += nb * (y[m].mean() - ybar) ** 2
    rel /= n
    res /= n
    unc = ybar * (1 - ybar)
    assert row["n"] == n
    assert abs(row["brier"] - brier) < 1e-6
    assert abs(row["reliability"] - rel) < 1e-6
    assert abs(row["resolution"] - res) < 1e-6
    assert abs(row["uncertainty"] - unc) < 1e-6
    # Murphy identity holds for the BINNED decomposition up to within-bin
    # calibration spread: brier ≈ rel − res + unc at this bin width
    assert abs((rel - res + unc) - brier) < 0.05


def test_mcnemar_matches_numpy_cells(spark):
    from odc_product_docker_images_spark.operators.model_eval import (
        ml_mcnemar_test,
    )

    row = ml_mcnemar_test(spark, SF).collect()[0]
    _, mat, label = _embeddings()
    truth = label < 5
    a_ok = (mat[:, 0] > 0) == truth
    b_ok = (mat[:, 1] > 0) == truth
    br = int((a_ok & b_ok).sum())
    oa = int((a_ok & ~b_ok).sum())
    ob = int((~a_ok & b_ok).sum())
    bw = int((~a_ok & ~b_ok).sum())
    assert (row["both_right"], row["only_a"], row["only_b"], row["both_wrong"]) == (
        br,
        oa,
        ob,
        bw,
    )
    assert row["n"] == br + oa + ob + bw
    chi2 = (oa - ob) ** 2 / (oa + ob)
    assert abs(row["chi2"] - chi2) < 1e-6
    assert abs(row["chi2_cc"] - (abs(oa - ob) - 1) ** 2 / (oa + ob)) < 1e-6
    assert row["differ"] == int(chi2 > 3.841)


def test_binary_quantize_matches_numpy_hamming(spark):
    from odc_product_docker_images_spark.textvec.quantize import (
        sim_binary_quantize,
    )

    rows = sim_binary_quantize(spark, SF).collect()
    vid, mat, _ = _embeddings()
    order = np.argsort(vid)
    vid, mat = vid[order], mat[order]
    bits = (mat > 0).astype(np.uint64)
    got = {}
    for r in rows:
        got.setdefault(r["vec_id"], []).append(r)
    assert set(got) == set(v for v in vid if v < 10)
    for q in sorted(got):
        qi = int(np.where(vid == q)[0][0])
        ham = (bits ^ bits[qi]).sum(axis=1)
        cand = [(int(ham[j]), int(vid[j])) for j in range(len(vid)) if vid[j] != q]
        cand.sort()
        expect = cand[:5]
        rs = sorted(got[q], key=lambda r: (r["hamming"], r["nbr_id"]))
        assert [(r["hamming"], r["nbr_id"]) for r in rs] == expect
        for r in rs:
            j = int(np.where(vid == r["nbr_id"])[0][0])
            cos = float(
                mat[qi] @ mat[j]
                / (np.linalg.norm(mat[qi]) * np.linalg.norm(mat[j]))
            )
            assert abs(r["true_cos"] - cos) < 1e-5
            est = np.cos(np.pi * r["hamming"] / 64)
            assert abs(r["est_cos"] - est) < 1e-5
    # SRP estimate correlates with the exact cosine across the surfaced
    # pairs (the funnel's reason to exist).  The top-5 restriction range-
    # restricts both variables, so the observable correlation is modest
    # (~0.29 on this fixture) — the bound only guards the SIGN and a
    # non-trivial association, not calibration.
    ests = np.array([r["est_cos"] for r in rows])
    coss = np.array([r["true_cos"] for r in rows])
    assert np.corrcoef(ests, coss)[0, 1] > 0.2


def test_r9c_keys_survive_degenerate_grain(spark):
    """The full r9c tier must run on the pathological 1-2-row fixture
    (constant values, single day/user, one embedding) — NULL statistics,
    never ANSI DIVIDE_BY_ZERO / decimal overflow."""
    from test_r8_ops import _degen_dir

    from odc_product_docker_images_spark import registry

    d = _degen_dir()
    qs = registry.all_queries()
    for k in [
        "agg_jarque_bera",
        "agg_durbin_watson",
        "agg_levene_bf",
        "agg_ccf_lags",
        "agg_periodogram",
        "agg_cooks_distance",
        "ml_pr_auc",
        "ml_brier_decomposition",
        "ml_mcnemar_test",
        "sim_binary_quantize",
    ]:
        qs[k].fn(spark, d).collect()  # must not raise


def test_seasonal_mann_kendall_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_seasonal_mann_kendall,
    )

    rows = {r["season"]: r for r in agg_seasonal_mann_kendall(spark, SF).collect()}
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    daily = ev.groupby("d").size().sort_index()
    s_total = 0
    var_total = 0.0
    for dow in range(1, 8):
        sub = daily[[d.isoweekday() == dow for d in daily.index]]
        x = sub.to_numpy()
        n = len(x)
        s = sum(
            np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)
        )
        assert rows[dow]["n_days"] == n
        assert rows[dow]["s_season"] == s
        assert rows[dow]["n_pairs"] == n * (n - 1) // 2
        s_total += s
        var_total += n * (n - 1) * (2 * n + 5) / 18.0
    z = (s_total - np.sign(s_total)) / np.sqrt(var_total)
    any_row = rows[1]
    assert any_row["s_total"] == s_total
    assert abs(any_row["z_total"] - z) < 1e-5


def test_pacf_matches_statsmodels_style_durbin_levinson(spark):
    from odc_product_docker_images_spark.operators.stats_diag import agg_pacf

    got = {r["lag"]: r["pacf"] for r in agg_pacf(spark, SF).collect()}
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    x = ev.groupby("d").size().sort_index().to_numpy().astype(float)
    mu = x.mean()
    den = ((x - mu) ** 2).sum()
    rho = [((x[: len(x) - k] - mu) * (x[k:] - mu)).sum() / den for k in (1, 2, 3)]
    r1, r2, r3 = rho
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - p22)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    assert abs(got[1] - r1) < 1e-4
    assert abs(got[2] - p22) < 1e-4
    assert abs(got[3] - p33) < 1e-4


def test_grubbs_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_grubbs_outlier,
    )

    got = {r["event_type"]: r for r in agg_grubbs_outlier(spark, SF).collect()}
    ev = _events()
    for et, grp in ev.groupby("event_type"):
        x = grp["value"].to_numpy()
        g = np.abs(x - x.mean()).max() / x.std(ddof=1)
        r = got[et]
        assert r["n"] == len(x)
        assert abs(r["g_stat"] - g) < 1e-4
        # the achiever: for a right-skewed positive series it is the max
        assert abs(r["outlier_value"] - x[np.abs(x - x.mean()).argmax()]) < 1e-9
        assert r["flagged"] == int(g > 4.0)


def test_friedman_matches_numpy_ranks(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_friedman_test,
    )

    row = agg_friedman_test(spark, SF).collect()[0]
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    cells = ev.groupby(["d", "event_type"])["value"].mean().unstack()
    cells = cells.dropna()  # complete blocks only
    n, k = cells.shape
    ranks = cells.rank(axis=1)  # average ranks on ties
    rj = ranks.sum(axis=0).to_numpy()
    chi2 = 12.0 / (n * k * (k + 1)) * (rj**2).sum() - 3 * n * (k + 1)
    assert (row["k"], row["n_blocks"]) == (k, n)
    assert abs(row["chi2_f"] - chi2) < 1e-4
    assert row["reject"] == int(chi2 > 9.488)


def test_bollinger_matches_pandas_rolling(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        window_bollinger,
    )

    rows = sorted(window_bollinger(spark, SF).collect(), key=lambda r: r["d"])
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    s = ev.groupby("d").size().sort_index()
    mid = s.rolling(7, min_periods=1).mean()
    sd = s.rolling(7, min_periods=2).std(ddof=1)
    for i, r in enumerate(rows):
        assert r["x"] == s.iloc[i]
        assert abs(r["mid"] - mid.iloc[i]) < 1e-5
        if i == 0:
            assert r["breakout"] is None
            continue
        assert abs(r["upper_band"] - (mid.iloc[i] + 2 * sd.iloc[i])) < 1e-5
        assert abs(r["lower_band"] - (mid.iloc[i] - 2 * sd.iloc[i])) < 1e-5
        expect_flag = (
            1
            if s.iloc[i] > round(mid.iloc[i] + 2 * sd.iloc[i], 6)
            else (-1 if s.iloc[i] < round(mid.iloc[i] - 2 * sd.iloc[i], 6) else 0)
        )
        assert r["breakout"] == expect_flag


def test_two_proportion_ztest_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_two_proportion_ztest,
    )

    row = agg_two_proportion_ztest(spark, SF).collect()[0]
    ev = _events()
    ev2 = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    treat = (ev2["user_id"] % 2 == 1).to_numpy()
    conv = (ev["event_type"] == "purchase").to_numpy()
    n1, x1 = int(treat.sum()), int((treat & conv).sum())
    n0, x0 = int((~treat).sum()), int((~treat & conv).sum())
    p1, p0 = x1 / n1, x0 / n0
    pp = (x1 + x0) / (n1 + n0)
    z = (p1 - p0) / np.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n0))
    assert (row["n1"], row["x1"], row["n0"], row["x0"]) == (n1, x1, n0, x0)
    assert abs(row["z_stat"] - z) < 1e-5
    assert row["significant"] == int(abs(z) > 1.96)


def test_fertility_stats_matches_python(spark):
    from odc_product_docker_images_spark.textvec.text_analysis import (
        text_fertility_stats,
    )

    got = {
        (r["lang"], r["source"]): r
        for r in text_fertility_stats(spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for (lang, source), grp in t.groupby(["lang", "source"]):
        toks = sum(len(s.split(" ")) for s in grp["text"])
        chars = int(grp["text"].str.len().sum())
        bts = int(sum(len(s.encode("utf-8")) for s in grp["text"]))
        r = got[(lang, source)]
        assert r["n_docs"] == len(grp)
        assert r["total_tokens"] == toks
        assert r["total_chars"] == chars
        assert r["total_bytes"] == bts
        assert abs(r["chars_per_token"] - chars / toks) < 1e-5
        assert abs(r["tokens_per_doc"] - toks / len(grp)) < 1e-5


def test_r9c_tier2_survives_degenerate_grain(spark):
    from test_r8_ops import _degen_dir

    from odc_product_docker_images_spark import registry

    d = _degen_dir()
    qs = registry.all_queries()
    for k in [
        "agg_seasonal_mann_kendall",
        "agg_pacf",
        "agg_grubbs_outlier",
        "agg_friedman_test",
        "window_bollinger",
        "agg_two_proportion_ztest",
        "text_fertility_stats",
    ]:
        qs[k].fn(spark, d).collect()  # must not raise


def test_ks_statistic_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.model_eval import (
        ml_ks_statistic,
    )

    row = ml_ks_statistic(spark, SF).collect()[0]
    _, mat, label = _embeddings()
    score = mat[:, 0]
    pos = score[label < 5]
    neg = score[label >= 5]
    p, n = len(pos), len(neg)
    grid = np.unique(score)
    diffs = np.array(
        [abs((pos <= s).mean() - (neg <= s).mean()) for s in grid]
    )
    ks = diffs.max()
    thr = grid[diffs.argmax()]
    crit = 1.36 * np.sqrt((p + n) / (p * n))
    assert (row["n_pos"], row["n_neg"]) == (p, n)
    assert abs(row["ks_stat"] - ks) < 1e-6
    assert abs(row["ks_threshold"] - thr) < 1e-9
    assert row["separable"] == int(round(ks, 6) > round(crit, 6))


def test_partial_corr_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_partial_corr,
    )

    row = agg_partial_corr(spark, SF).collect()[0]
    ev = _events()
    ev2 = pq.read_table(
        f"{SF}/events.parquet", columns=["ts", "user_id"]
    ).to_pandas()
    ev["user_id"] = ev2["user_id"]
    ev["d"] = ev["ts"].dt.floor("D")
    daily = ev.groupby("d").agg(
        x=("event_id", "size"), y=("value", "sum"), z=("user_id", "nunique")
    )
    x, y, z = (daily[c].to_numpy().astype(float) for c in ("x", "y", "z"))
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    pc = (rxy - rxz * ryz) / np.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert row["n"] == len(daily)
    assert abs(row["r_xy"] - rxy) < 1e-4
    assert abs(row["r_xz"] - rxz) < 1e-4
    assert abs(row["r_yz"] - ryz) < 1e-4
    assert abs(row["r_xy_given_z"] - pc) < 1e-3


def test_rsi_matches_pandas(spark):
    from odc_product_docker_images_spark.operators.stats_diag import window_rsi

    rows = sorted(window_rsi(spark, SF).collect(), key=lambda r: r["d"])
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    s = ev.groupby("d").size().sort_index()
    chg = s.diff()
    gain = chg.clip(lower=0)
    loss = (-chg).clip(lower=0)
    g7 = gain.rolling(7, min_periods=1).sum()
    l7 = loss.rolling(7, min_periods=1).sum()
    nret = chg.notna().rolling(7, min_periods=1).sum()
    for i, r in enumerate(rows):
        assert r["x"] == s.iloc[i]
        assert r["nret"] == int(nret.iloc[i])
        if nret.iloc[i] < 7:
            assert r["rsi"] is None
        else:
            expect = (
                100 * g7.iloc[i] / (g7.iloc[i] + l7.iloc[i])
                if g7.iloc[i] + l7.iloc[i] > 0
                else 50.0
            )
            assert abs(r["rsi"] - expect) < 1e-5
    # with 30 days and a 7-day warm-up there are exactly 23 live readings
    assert sum(r["rsi"] is not None for r in rows) == len(rows) - 7


def test_changepoint_binseg_matches_numpy(spark):
    from odc_product_docker_images_spark.operators.stats_diag import (
        agg_changepoint_binseg,
    )

    row = agg_changepoint_binseg(spark, SF).collect()[0]
    ev = _events()
    ev["d"] = ev["ts"].dt.floor("D")
    y = ev.groupby("d")["value"].sum().sort_index()
    yv = y.to_numpy() / y.to_numpy().mean()
    n = len(yv)

    def ss(a):
        return ((a - a.mean()) ** 2).sum()

    total = ss(yv)
    gains = [
        (total - (ss(yv[:t]) + ss(yv[t:])), t) for t in range(1, n)
    ]
    best_gain, best_t = max(gains)
    assert row["n_days"] == n
    assert row["split_after"] == best_t
    assert row["change_day"] == y.index[best_t - 1]
    assert abs(row["sse_gain"] - best_gain) < 1e-4
    assert abs(row["mean_left"] - yv[:best_t].mean()) < 1e-5
    assert abs(row["mean_right"] - yv[best_t:].mean()) < 1e-5


def test_r9c_tier3_survives_degenerate_grain(spark):
    from test_r8_ops import _degen_dir

    from odc_product_docker_images_spark import registry

    d = _degen_dir()
    qs = registry.all_queries()
    for k in [
        "ml_ks_statistic",
        "agg_partial_corr",
        "window_rsi",
        "agg_changepoint_binseg",
    ]:
        qs[k].fn(spark, d).collect()  # must not raise


def test_degen_guard_fixes_survive_full_evaluation(spark):
    """The r9c full-evaluation degenerate sweep found 27 keys whose
    guards only held under count()-pruned plans: ANSI DIVIDE_BY_ZERO in
    eagerly-evaluated projections (Spark ANSI raises even for double/0),
    an out-of-bounds element_at, and a negative-variance sqrt in the GMM
    oracle.  All were fixed with SYMMETRIC NULLIF/try_element_at/clamp
    guards (both engines emit NULL); this pins the full-evaluation path
    (collect, not count — count() lets Catalyst prune the raising
    expressions)."""
    from test_r8_ops import _degen_dir

    from odc_product_docker_images_spark import registry

    d = _degen_dir()
    qs = registry.all_queries()
    for k in [
        "agg_anova_oneway", "agg_bootstrap_ci", "agg_breusch_pagan",
        "agg_cmh_test", "agg_cohens_kappa", "agg_cronbach_alpha",
        "agg_cuped", "agg_gumbel_fit", "agg_iptw_ate",
        "agg_kruskal_wallis", "agg_ks_by_group_fdr", "agg_ks_test",
        "agg_markov_absorption", "agg_odds_ratio_mh", "agg_overdispersion",
        "agg_spatial_moran", "agg_spc_rules", "agg_spearman_corr",
        "agg_stl_lite", "agg_two_proportion_ztest", "graph_assortativity",
        "ml_auc_delong_se", "ml_auc_exact", "ml_gmm_em_loop",
        "ml_lift_table", "ml_roc_curve", "text_js_divergence",
    ]:
        qs[k].fn(spark, d).collect()  # must not raise
