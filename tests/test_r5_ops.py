"""Round-5 operator tests: GeoTIFF sink codec, curvilinear reprojection,
solar-day grouping, BPE train step, WOfS confidence."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def test_geotiff_codec_is_spec_real():
    """The sink's encoder must produce a real classic TIFF the independent
    decoder can walk: strips round-trip the raster, geo tags recover the
    model transform, and corrupted layout fails loudly."""
    from odc_product_docker_images_spark.multimodal.geotiff import (
        _EPSG,
        _SCALE,
        _TIEPOINT,
        _decode_tiff,
        _pack_tiff,
    )

    rng = np.random.default_rng(7)
    raster = rng.integers(0, 65536, size=(15, 24), dtype=np.uint16)
    payload = _pack_tiff(raster)

    w, h, back, ps, tp, gk = _decode_tiff(payload)
    assert (w, h) == (24, 15)
    assert np.array_equal(back, raster)
    assert ps == _SCALE and tp == _TIEPOINT
    keys = {gk[4 + 4 * i]: gk[7 + 4 * i] for i in range((len(gk) - 4) // 4)}
    assert keys[2048] == _EPSG and keys[1024] == 2  # geographic CRS model

    # non-TIFF magic -> NotImplementedError (honest-codec contract)
    with pytest.raises(NotImplementedError):
        _decode_tiff(b"MM\x00*" + payload[4:])  # big-endian not supported

    # corrupt a strip byte count -> layout validation fires
    bad = bytearray(payload)
    # StripByteCounts array lives right after the offsets array; flip one
    sbc_entry = payload.index(struct.pack("<HHI", 279, 4, 15))
    (sbc_off,) = struct.unpack_from("<I", payload, sbc_entry + 8)
    struct.pack_into("<I", bad, sbc_off, 7)  # not w*2
    with pytest.raises(ValueError, match="strip layout"):
        _decode_tiff(bytes(bad))


def test_tm_projection_matches_independent_reference(spark):
    """proj_crs_curvilinear's oracle shares the expression TEXT with the
    Spark side (that is the determinism design), so parity alone can't
    catch a shared formula typo.  This check recomputes the ellipsoidal
    TM forward with an INDEPENDENTLY-written numpy implementation of
    Snyder eq. 8-9..8-13 and matches per-row easting/northing to ~1e-6 m,
    far tighter than the 512 m cell size."""
    import pyspark.sql.functions as F

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.operators.scans import _TM, _TM_STEPS

    SF = "/root/testdata/sf0.001"
    df = load(spark, SF, "events").select("event_id", "user_id", "value").limit(200)
    for name, txt in _TM_STEPS:
        df = df.withColumn(name, F.expr(txt))
    rows = df.select("user_id", "value", "easting", "northing").collect()

    a, e2, ep2, k0 = _TM["a"], _TM["e2"], _TM["ep2"], _TM["k0"]
    lat = np.deg2rad(np.array([r["user_id"] % 80 for r in rows]) - 40.0)
    dlam = np.deg2rad(np.fmod(np.array([r["value"] for r in rows]), 6.0) - 3.0)
    sphi, cphi, tphi = np.sin(lat), np.cos(lat), np.tan(lat)
    nn = a / np.sqrt(1 - e2 * sphi**2)
    tt, cc, aa = tphi**2, ep2 * cphi**2, dlam * cphi
    m = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
        - (35 * e2**3 / 3072) * np.sin(6 * lat)
    )
    x = k0 * nn * (
        aa + (1 - tt + cc) * aa**3 / 6
        + (5 - 18 * tt + tt**2 + 72 * cc - 58 * ep2) * aa**5 / 120
    ) + 500000.0
    y = k0 * (
        m + nn * tphi * (
            aa**2 / 2 + (5 - tt + 9 * cc + 4 * cc**2) * aa**4 / 24
            + (61 - 58 * tt + tt**2 + 600 * cc - 330 * ep2) * aa**6 / 720
        )
    )
    got_x = np.array([r["easting"] for r in rows])
    got_y = np.array([r["northing"] for r in rows])
    assert np.max(np.abs(got_x - x)) < 1e-6
    assert np.max(np.abs(got_y - y)) < 1e-6
    # sanity: the test exercised real curvature (spread across the zone)
    assert np.ptp(got_x) > 1e5 and np.ptp(got_y) > 1e6


def test_solar_day_offset_changes_membership(spark):
    """The longitude offset must actually move events across day
    boundaries (else the key silently degrades to plain UTC date), and the
    key must match an independent per-row Python recomputation."""
    import pyspark.sql.functions as F

    from odc_product_docker_images_spark.io import load

    SF = "/root/testdata/sf0.001"
    ev = load(spark, SF, "events").select("ts", "value").limit(500)
    sec = F.unix_timestamp("ts")
    off = F.floor(((F.col("value") % F.lit(360.0)) - F.lit(180.0)) * F.lit(240.0)).cast("bigint")
    rows = ev.select(
        sec.alias("sec"),
        off.alias("off"),
        F.floor((sec + off) / F.lit(86400.0)).cast("bigint").alias("solar_day"),
        F.floor(sec / F.lit(86400.0)).cast("bigint").alias("utc_day"),
    ).collect()
    import math

    moved = 0
    for r in rows:
        want = math.floor((r["sec"] + r["off"]) / 86400.0)
        assert r["solar_day"] == want
        assert -86400 <= r["off"] < 86400
        moved += int(r["solar_day"] != r["utc_day"])
    # with lon spread over [-180, 180) a large minority must shift days
    assert moved > len(rows) * 0.1, f"offset never moved a day: {moved}"


def test_wofs_confidence_matches_python_sigmoid(spark):
    """Independent per-group recomputation of the logistic confidence from
    raw rows (classifier + means in plain Python), to ~1e-6."""
    import math

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.kernels.wofs import (
        _CONF_W,
        TREE,
        classify,
        udf_wofs_confidence,
    )

    SF = "/root/testdata/sf0.001"
    got = {r["l_suppkey"]: r for r in udf_wofs_confidence(spark, SF).collect()}
    raw = load(spark, SF, "lineitem").select(
        "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    groups: dict[int, list] = {}
    for r in raw:
        groups.setdefault(r["l_suppkey"], []).append(r)
    assert set(got) == set(groups)
    for k, rows in groups.items():
        wet = sum(classify(TREE, r.asDict()) for r in rows)
        total = len(rows)
        m_b1 = sum(r["l_quantity"] for r in rows) / total
        m_b4 = sum(r["l_extendedprice"] / 1000 for r in rows) / total
        z = (_CONF_W["bias"] + _CONF_W["pct"] * (wet / total)
             + _CONF_W["b1"] * m_b1 + _CONF_W["b4"] * m_b4)
        want = 1.0 / (1.0 + math.exp(-z))
        assert got[k]["wet_count"] == wet and got[k]["total_count"] == total
        assert abs(got[k]["confidence"] - want) < 2e-6, k
        assert 0.0 < got[k]["confidence"] < 1.0


def _python_bpe_trainer_step(word_freq: dict[str, int], merges: list[tuple[str, str]]):
    """Independent sequential BPE trainer iteration: symbolize each word
    type with `merges` (greedy best-rank-first), count adjacent pairs
    weighted by frequency, return the count table."""
    rank = {p: i for i, p in enumerate(merges)}
    counts: dict[tuple[str, str], int] = {}
    for word, freq in word_freq.items():
        sym = list(word)
        while len(sym) > 1:
            cands = [(rank[(sym[i], sym[i + 1])], i)
                     for i in range(len(sym) - 1) if (sym[i], sym[i + 1]) in rank]
            if not cands:
                break
            r = min(c[0] for c in cands)
            a, b = merges[r]
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(sym[i]); i += 1
            sym = out
        for i in range(len(sym) - 1):
            counts[(sym[i], sym[i + 1])] = counts.get((sym[i], sym[i + 1]), 0) + freq
    return counts


def test_bpe_train_step_matches_sequential_trainer(spark):
    """The distributed train step must reproduce the classic sequential
    trainer: at K=0 AND at K=5 (greedy-symbolized state), the ranked pair
    table matches the independent Python trainer's counts, and iterating
    the step regenerates the trainer's merge choices."""
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.textvec.bpe import bpe_train_pair_counts

    SF = "/root/testdata/sf0.001"
    texts = [r["text"] for r in load(spark, SF, "documents").select("text").collect()]
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wf[w] = wf.get(w, 0) + 1

    merges: list[tuple[str, str]] = []
    for k in (0, 5):
        while len(merges) < k:  # grow the table with the PYTHON trainer
            c = _python_bpe_trainer_step(wf, merges)
            merges.append(min(c, key=lambda p: (-c[p], p)))
        want = _python_bpe_trainer_step(wf, merges)
        got = bpe_train_pair_counts(spark, SF, list(merges), top_n=20).collect()
        want_ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert [((r["l"], r["r"]), r["pair_count"]) for r in got] == want_ranked, k
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_jpeg_codec_entropy_layer_is_lossless_and_idct_matches():
    """JPEG is lossy end-to-end, but its entropy layer is NOT: decode must
    reproduce EXACTLY the pixels of an independent quant→dequant→IDCT
    straight-through reference (no Huffman/bitstream) — any bit slip in
    the DHT parse, stuffing, DC prediction, or zigzag breaks equality.
    Quantization error vs the original stays bounded; DC-only blocks
    (constant image) decode EXACTLY; non-baseline streams raise."""
    import numpy as np
    import pytest as _pt

    import odc_product_docker_images_spark.multimodal.jpeg as J

    payload = J._pack_jpeg(321)
    w, h, px = J._decode_jpeg(payload)
    assert (w, h) == (16, 16)

    img = J._synth_image(321)
    qb = J._quantized_blocks(img).reshape(-1, 8, 8).astype(np.float64)
    c = J._dct_mat()
    q = np.asarray(J._QTABLE, float).reshape(8, 8)
    blocks = np.einsum("xu,buv,yv->bxy", c.T, qb * q, c.T)
    want = np.clip(np.round(blocks + 128.0), 0, 255).astype(np.uint8)
    want = want.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    assert np.array_equal(px, want)
    # lossy but bounded: flat q=16 keeps per-pixel error well under q
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 32

    # 0xFF byte stuffing actually occurs and decodes across the corpus
    assert any(b"\xff\x00" in J._pack_jpeg(d)[20:] for d in range(100))
    for d in range(20):
        J._decode_jpeg(J._pack_jpeg(d))

    # DC-only exactness: a constant image survives bit-exactly
    const = np.full((16, 16), 200, np.uint8)
    orig = J._synth_image
    J._synth_image = lambda _d: const
    try:
        _w, _h, px2 = J._decode_jpeg(J._pack_jpeg(0))
    finally:
        J._synth_image = orig
    assert np.array_equal(px2, const)

    # honest-codec contract: non-JPEG magic and progressive SOF raise
    with _pt.raises(NotImplementedError):
        J._decode_jpeg(b"\x89PNG" + payload[4:])
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pt.raises(NotImplementedError):
        J._decode_jpeg(prog)
    # truncation inside the entropy stream fails loudly
    with _pt.raises(ValueError):
        J._decode_jpeg(payload[:-20] + b"\xff\xd9")


def test_mann_kendall_matches_python_reference(spark):
    """Independent sequential MK/Theil-Sen recomputation per series."""
    import math

    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.operators.trend import agg_mann_kendall

    SF = "/root/testdata/sf0.001"
    got = {r["user_id"]: r for r in agg_mann_kendall(spark, SF).collect()}
    rows = load(spark, SF, "events").select("user_id", "event_id", "ts", "value").collect()
    series: dict[int, list] = {}
    for r in rows:
        sec = int(r["ts"].timestamp())
        series.setdefault(r["user_id"], []).append((sec, r["event_id"], r["value"]))
    for uid, obs in series.items():
        obs.sort()
        n = len(obs)
        if n < 2:
            assert uid not in got
            continue
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                d = obs[j][2] - obs[i][2]
                s += (d > 0) - (d < 0)
                dt = obs[j][0] - obs[i][0]
                if dt > 0:
                    slopes.append(d / dt)
        g = got[uid]
        assert g["n_obs"] == n and g["s_stat"] == s
        assert g["n_pairs"] == n * (n - 1) // 2
        var = n * (n - 1) * (2 * n + 5) / 18.0
        z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var)
        assert abs(g["z_stat"] - z) < 2e-6
        slopes.sort()
        m = len(slopes)
        med = (slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2)
        assert abs(g["sen_slope_ppm"] - med * 1e6) < 2e-6, uid
