"""Round-5d operator tests: exact substring-span dedup and temperature
mixture reweighting, each against an independent pure-Python reference."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def test_substring_spans_match_independent_python(spark):
    """Recompute the Lee-style exact-substring ledger with plain Python
    dicts (token tuples as keys — no hashing, so an md5-plumbing bug on
    the Spark side cannot hide) and require identical per-doc numbers."""
    from odc_product_docker_images_spark.textvec.substrings import (
        _W,
        dedup_substring_spans,
    )

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    occ: dict[tuple, int] = {}
    per_doc: dict[int, list[int]] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        for i in range(len(toks) - _W + 1):
            occ[tuple(toks[i : i + _W])] = occ.get(tuple(toks[i : i + _W]), 0) + 1

    expected = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        dup_pos = [
            i + 1
            for i in range(len(toks) - _W + 1)
            if occ[tuple(toks[i : i + _W])] >= 2
        ]
        if not dup_pos:
            continue
        spans = []
        start = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev <= _W - 1:
                prev = p
            else:
                spans.append((start, prev))
                start = prev = p
        spans.append((start, prev))
        covered = sum(e - s + _W for s, e in spans)
        expected[doc_id] = (
            len(toks),
            len(dup_pos),
            len(spans),
            covered,
            covered / len(toks),
        )

    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["dup_windows"],
            r["dup_spans"],
            r["dup_tokens"],
            r["dup_frac"],
        )
        for r in dedup_substring_spans(spark, SF).collect()
    }
    assert got.keys() == expected.keys()
    for k, exp in expected.items():
        assert got[k][:4] == exp[:4], (k, got[k], exp)
        assert got[k][4] == pytest.approx(exp[4], abs=1e-12)
    assert len(expected) > 10  # the fixture must exercise the path


def test_temperature_mixing_matches_independent_numpy(spark):
    """Recompute p ∝ n^α, budgeted rates, and the hash-gated kept counts
    with plain numpy/Python; mixture probabilities must sum to 1."""
    from odc_product_docker_images_spark.textvec.mixing import (
        _ALPHA,
        _BUDGET,
        data_mix_temperature,
    )
    from odc_product_docker_images_spark.textvec.pipeline import _KNUTH

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    counts = docs.groupby("lang").size()  # genuinely non-uniform (source is flat)
    w = counts.to_numpy(np.float64) ** _ALPHA
    p = w / w.sum()
    n_corpus = counts.sum()
    rate = np.minimum(1.0, _BUDGET * n_corpus * p / counts.to_numpy(np.float64))
    rate_by_lang = dict(zip(counts.index, rate))
    kept = {
        s: int(
            sum(
                1
                for d in docs[docs["lang"] == s]["doc_id"]
                if (d * _KNUTH) % 100 < rate_by_lang[s] * 100.0
            )
        )
        for s in counts.index
    }

    rows = {r["lang"]: r for r in data_mix_temperature(spark, SF).collect()}
    assert set(rows) == set(counts.index)
    assert sum(r["p_sample"] for r in rows.values()) == pytest.approx(1.0, abs=1e-9)
    for i, s in enumerate(counts.index):
        r = rows[s]
        assert r["n_docs"] == counts[s]
        assert r["weight"] == pytest.approx(w[i], abs=1e-5)
        assert r["p_sample"] == pytest.approx(p[i], abs=1e-6)
        assert r["keep_rate"] == pytest.approx(rate[i], abs=1e-6)
        assert r["n_kept"] == kept[s]
    # the temperature property must actually hold: alpha < 1 upweights
    # the tail, so the smallest language keeps a HIGHER rate than the largest
    smallest = counts.idxmin()
    largest = counts.idxmax()
    assert counts[smallest] < counts[largest]  # the fixture is non-uniform
    assert rows[smallest]["keep_rate"] > rows[largest]["keep_rate"]
    total_kept = sum(r["n_kept"] for r in rows.values())
    assert 0 < total_kept < n_corpus


def test_seasonal_zscore_matches_independent_numpy(spark):
    """Recompute per-(series, month) climatology z-scores with plain
    numpy (unrounded mean/std) and require matching anomaly counts and
    peak picks on a sample of series."""
    from odc_product_docker_images_spark.operators.changepoint import (
        window_seasonal_zscore,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    ev["month"] = ev["ts"].dt.month
    got = {r["user_id"]: r for r in window_seasonal_zscore(spark, SF).collect()}

    rng = np.random.default_rng(5)
    for uid in rng.choice(sorted(got), size=20, replace=False):
        s = ev[ev["user_id"] == uid].sort_values(["sec", "event_id"]).copy()
        g = s.groupby("month")["value"]
        mu = g.transform("mean")
        sd = g.transform("std")  # sample std, ddof=1
        n = g.transform("size")
        ok = (n >= 2) & (sd > 0)
        z = ((s["value"] - mu) / sd)[ok]
        sub = s[ok]
        r = got[uid]
        assert r["n_scored"] == int(ok.sum())
        assert r["n_anomalies"] == int((z.abs() >= 2.0 - 1e-9).sum())
        k = int(np.argmax(z.abs().to_numpy()))
        assert r["peak_event_id"] == sub["event_id"].iloc[k]
        assert r["peak_month"] == sub["month"].iloc[k]
        assert r["peak_z"] == pytest.approx(z.iloc[k], abs=1e-3)


def test_image_resize_matches_independent_loop(spark):
    """Recompute the 2x box downsample with an explicit per-pixel Python
    loop over the decoded raster (no numpy slicing tricks shared with the
    kernel) and require identical resized stats."""
    from odc_product_docker_images_spark.multimodal.columns import (
        _decode_bmp,
        _pack_bmp,
    )
    from odc_product_docker_images_spark.multimodal.resize import (
        _DH,
        _DW,
        multimodal_image_resize,
    )

    got = {r["doc_id"]: r for r in multimodal_image_resize(spark, SF).collect()}
    assert len(got) == 500
    for doc_id in list(got)[:5]:
        w, h, bpp, px = _decode_bmp(_pack_bmp(int(doc_id)))
        assert (w, h, bpp) == (31, 16, 24)
        def b(x, y, ch):
            return px[(y * w + x) * 3 + ch]
        flat = []
        for y in range(_DH):
            for x in range(_DW):
                for ch in range(3):
                    s = (
                        b(2 * x, 2 * y, ch) + b(2 * x + 1, 2 * y, ch)
                        + b(2 * x, 2 * y + 1, ch) + b(2 * x + 1, 2 * y + 1, ch)
                    )
                    flat.append(s // 4)
        r = got[doc_id]
        assert (r["dst_w"], r["dst_h"]) == (_DW, _DH)
        assert r["px_sum"] == sum(flat)
        assert r["pos_weighted_sum"] == sum((i + 1) * v for i, v in enumerate(flat))
        assert r["max_px"] == max(flat)


def test_ohlc_matches_independent_pandas(spark):
    """Recompute hourly bars with pandas groupby first/last/min/max and
    require identical values (open/close are raw stored doubles)."""
    from odc_product_docker_images_spark.operators.resample import (
        _BUCKET_S,
        agg_resample_ohlc,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    ev["bucket"] = ev["sec"] // _BUCKET_S
    ev = ev.sort_values(["sec", "event_id"])
    g = ev.groupby(["user_id", "bucket"])["value"]
    exp = g.agg(["first", "max", "min", "last", "count", "mean"])

    got = {
        (r["user_id"], r["bucket"]): r for r in agg_resample_ohlc(spark, SF).collect()
    }
    assert len(got) == len(exp)
    for (uid, bkt), row in exp.iterrows():
        r = got[(uid, bkt)]
        assert r["open"] == row["first"] and r["close"] == row["last"]
        assert r["high"] == row["max"] and r["low"] == row["min"]
        assert r["n_obs"] == row["count"]
        assert r["mean_value"] == pytest.approx(row["mean"], abs=1e-5)


def test_drift_psi_matches_independent_numpy(spark):
    """Recompute PSI/KS with plain numpy histograms; the full bin spine
    must appear (empty bins with zero counts), probabilities must sum to
    1, and the KS statistic must match the running-CDF gap max."""
    from odc_product_docker_images_spark.operators.drift import (
        _BW,
        _NBINS,
        profile_drift_psi,
    )

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    bins = np.clip((ev["value"].to_numpy() // _BW).astype(int), 0, _NBINS - 1)
    ref = np.bincount(bins[ev["user_id"] % 2 == 0], minlength=_NBINS)
    cand = np.bincount(bins[ev["user_id"] % 2 == 1], minlength=_NBINS)
    p = (ref + 0.5) / (ref.sum() + 5.0)
    q = (cand + 0.5) / (cand.sum() + 5.0)
    psi = ((p - q) * np.log(p / q)).sum()
    ks = np.abs(np.cumsum(p) - np.cumsum(q)).max()

    rows = sorted(profile_drift_psi(spark, SF).collect(), key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(_NBINS))  # full spine
    assert [r["n_ref"] for r in rows] == ref.tolist()
    assert [r["n_cand"] for r in rows] == cand.tolist()
    assert sum(r["p_ref"] for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r["psi_contrib"] for r in rows) == pytest.approx(psi, abs=1e-4)
    assert max(r["cdf_gap"] for r in rows) == pytest.approx(ks, abs=1e-6)
    assert all(r["psi_contrib"] >= 0 for r in rows)  # PSI terms are nonneg
