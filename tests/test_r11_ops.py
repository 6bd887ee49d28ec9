"""r11 quality-gate keys — behavior + SENSITIVITY tests.

The four r11 gates convert the last gate-less rows-only keys
(multimodal_jpeg_decode, text_compression_ratio, scalar_map,
catalog_tables) into driver-hashable rows.  Parity proves each gate is
GREEN; these tests prove each gate is SHARP — that the boolean actually
flips when the audited property breaks (a gate that can't fail guards
nothing).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from conftest import SF_DIR


def test_jpeg_gate_green_and_sensitive(spark):
    from odc_product_docker_images_spark.multimodal import jpeg as J
    from odc_product_docker_images_spark.multimodal.jpeg import jpeg_decode_gate

    rows = jpeg_decode_gate(spark, SF_DIR).collect()
    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    assert len(rows) == n_docs
    assert all(r["entropy_lossless"] for r in rows)
    assert all(r["quant_error_bounded"] for r in rows)
    assert all((r["width"], r["height"]) == (16, 16) for r in rows)

    # SENSITIVITY: corrupt one byte inside the entropy-coded segment —
    # the decode must either raise (bitstream desync) or produce pixels
    # that no longer match the straight-through reference, i.e. the
    # gate's lossless boolean cannot stay vacuously true.
    payload = bytearray(J._pack_jpeg(7))
    sos = bytes(payload).find(b"\xff\xda")
    assert sos > 0
    hit = 0
    for off in range(sos + 20, sos + 26):  # deep in the entropy stream
        tampered = bytearray(payload)
        tampered[off] ^= 0x55
        if bytes(tampered) == bytes(payload):
            continue
        try:
            _w, _h, px = J._decode_jpeg(bytes(tampered))
        except Exception:
            hit += 1  # desync raised: the gate key would error loudly
            continue
        _w0, _h0, px0 = J._decode_jpeg(bytes(payload))
        if not np.array_equal(px, px0):
            hit += 1
    assert hit > 0


def test_compression_gate_green_and_sensitive(spark):
    import zlib

    from odc_product_docker_images_spark.textvec.curation import compression_gate

    rows = compression_gate(spark, SF_DIR).collect()
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    assert len(rows) == len(docs)
    for r in rows:
        assert r["raw_match"] and r["deflate_match"] and r["roundtrip_exact"]
        assert r["within_bound"] and r["decile_consistent"]
    byid = {d.doc_id: d.text for _, d in docs.iterrows()}
    for r in rows[:20]:
        assert r["raw_bytes"] == len(byid[r["doc_id"]].encode("utf-8"))

    # SENSITIVITY: a level drift (the exact regression the gate exists
    # to catch) changes the byte count on this corpus for some doc, so
    # deflate_match would flip.
    diff = sum(
        len(zlib.compress(t.encode(), 1)) != len(zlib.compress(t.encode(), 6))
        for t in docs["text"]
    )
    assert diff > 0


def test_scalar_map_gate_green(spark):
    from odc_product_docker_images_spark.functions.scalars import scalar_map_gate

    rows = scalar_map_gate(spark, SF_DIR).collect()
    n_ev = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    assert len(rows) == n_ev
    assert all(r["json_roundtrip_ok"] for r in rows)
    assert all(r["n_keys"] == 2 for r in rows)
    assert {r["meta_type"] for r in rows} <= {
        "view", "click", "purchase", "signup", "error",
    }


def test_scalar_map_gate_sensitive_to_dropped_entry(spark):
    """If Spark's to_json ever started DROPPING null-valued map entries
    (the documented failure mode the gate pins against), the restored
    size would undercount n_keys and json_roundtrip_ok would flip: prove
    the expression distinguishes a 1-entry JSON from the 2-entry map."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"type":"view"}', "view", 2)],  # k entry dropped
        "event_id long, meta_json string, meta_type string, n_keys int",
    )
    m2 = F.from_json("meta_json", "map<string,string>")
    ok = df.select(
        (F.size(F.map_keys(m2)) == F.col("n_keys")).alias("ok")
    ).collect()[0]["ok"]
    assert ok is False


def test_catalog_gate_green_against_footers(spark):
    from odc_product_docker_images_spark import schemas
    from odc_product_docker_images_spark.operators.composites import catalog_gate

    rows = {r["table_name"]: r for r in catalog_gate(spark, SF_DIR).collect()}
    assert set(rows) == set(schemas.TABLES)
    for t, st in schemas.TABLES.items():
        r = rows[t]
        assert r["schema_match"], t
        assert r["n_columns"] == len(st.fields), t
        assert r["n_rows"] == pq.read_metadata(f"{SF_DIR}/{t}.parquet").num_rows, t
    assert rows["lineitem"]["has_time_axis"]
    assert not rows["region"]["has_time_axis"]


def test_catalog_gate_sensitive_to_schema_drift(spark):
    """schema_match must actually compare: a catalog row claiming the
    wrong column count fails the join-side comparison."""
    from pyspark.sql import functions as F

    cat = spark.createDataFrame(
        [("region", 99, False)],
        "table_name string, n_columns int, has_time_axis boolean",
    )
    actual = spark.createDataFrame(
        [("region", 2, False)],
        "table_name string, actual_cols int, actual_time_axis boolean",
    )
    j = actual.join(F.broadcast(cat), "table_name").select(
        (
            (F.col("actual_cols") == F.col("n_columns"))
            & (F.col("actual_time_axis") == F.col("has_time_axis"))
        ).alias("schema_match")
    )
    assert j.collect()[0]["schema_match"] is False


def test_spearman_normalized_rank_form_matches_pandas(spark):
    """r11 rewrote agg_spearman_corr onto normalized ranks u = r/n with
    the closed-form mean (n+1)/(2n) after the 100x slice found the raw
    rank-moment form's CAST_OVERFLOW (centered rank sums grow ~n^3/12).
    rho is invariant under the per-variable rescale — pin the value
    against pandas' own tie-aware Spearman, independently of both
    engines' pipelines."""
    import pandas as pd

    from odc_product_docker_images_spark.operators.stats_tests import (
        agg_spearman_corr,
    )

    row = agg_spearman_corr(spark, SF_DIR).collect()[0]
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    per_user = ev.groupby("user_id").agg(
        tv=("value", lambda s: round(s.sum(), 6)), ne=("value", "size")
    )
    # tie-averaged ranks + Pearson = Spearman (scipy is not installed,
    # so rank explicitly; pandas' default corr is Pearson, scipy-free)
    rx = per_user["tv"].rank(method="average")
    ry = per_user["ne"].rank(method="average")
    want = rx.corr(ry)
    assert row["n_users"] == len(per_user)
    assert abs(row["spearman_rho"] - want) < 1e-6


def test_embedding_drift_matches_numpy_replica(spark):
    """r11 new-surface key: PSI over int8 quantization-code histograms.
    Replicate the full pipeline (max-abs int8 quantize -> 16-wide code
    bins -> even/odd slice counts -> smoothed PSI) in numpy, independent
    of both engines, and compare every output cell."""
    from odc_product_docker_images_spark.operators.drift import (
        profile_embedding_drift,
    )

    rows = {
        r["bin"]: r
        for r in profile_embedding_drift(spark, SF_DIR).collect()
    }
    assert sorted(rows) == list(range(16))

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    e = np.stack(emb["embedding"].map(np.asarray).to_numpy()).astype(np.float64)
    s = 127.0 / np.abs(e).max(axis=1, keepdims=True)
    code = np.floor(e * s + 0.5)
    bins = np.clip(np.floor((code + 128) / 16).astype(np.int64), 0, 15)
    is_ref = (emb["vec_id"].to_numpy() % 2 == 0)[:, None]
    n_ref = np.bincount(bins[np.broadcast_to(is_ref, bins.shape)], minlength=16)
    n_cand = np.bincount(bins[~np.broadcast_to(is_ref, bins.shape)], minlength=16)
    p_ref = (n_ref + 0.5) / (n_ref.sum() + 8.0)
    p_cand = (n_cand + 0.5) / (n_cand.sum() + 8.0)
    psi = (p_ref - p_cand) * np.log(p_ref / p_cand)
    for b in range(16):
        r = rows[b]
        assert r["n_ref"] == n_ref[b] and r["n_cand"] == n_cand[b]
        assert r["p_ref"] == pytest.approx(p_ref[b], abs=1e-15)
        assert r["psi_contrib"] == pytest.approx(psi[b], abs=1e-6)
    # both slices draw from the same fixture distribution: total PSI must
    # read "no drift" (industry threshold for action is 0.1-0.25)
    assert sum(r["psi_contrib"] for r in rows.values()) < 0.05


def test_shard_manifest_matches_python_replica_and_flips(spark):
    """r11 new-surface key: per-shard XOR-fold content checksum over the
    shard_pack assignment.  Replicate in pure Python (hashlib md5 over
    the canonical doc_id|text encoding, token-prefix shard assignment),
    compare every shard row, then verify a single-document edit flips
    exactly its shard's checksum words in the replica fold."""
    import hashlib

    from odc_product_docker_images_spark.textvec.curation import (
        shard_manifest_checksum,
        shard_pack,
    )

    got = {r["shard_id"]: r for r in shard_manifest_checksum(spark, SF_DIR).collect()}

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    n_tok = docs["text"].str.split(" ").map(len).to_numpy(dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    shard = start // 2000

    def words(doc_id, text):
        h = hashlib.md5(f"{doc_id}|{text}".encode()).hexdigest()
        return int(h[:8], 16), int(h[8:16], 16)

    want = {}
    for sid in np.unique(shard):
        m = shard == sid
        sub = docs[m]
        xa = xb = 0
        for did, txt in zip(sub["doc_id"], sub["text"]):
            w1, w2 = words(did, txt)
            xa ^= w1
            xb ^= w2
        want[int(sid)] = (
            int(m.sum()), int(n_tok[m].sum()),
            int(sub["doc_id"].min()), int(sub["doc_id"].max()), xa, xb,
        )
    assert sorted(got) == sorted(want)
    for sid, (nd, ts, fd, ld, xa, xb) in want.items():
        r = got[sid]
        assert (r["n_docs"], r["tok_sum"], r["first_doc"], r["last_doc"]) == (nd, ts, fd, ld)
        assert (r["checksum_a"], r["checksum_b"]) == (xa, xb)

    # manifest grain agrees with shard_pack's (same assignment rule)
    sp = {r["shard_id"]: r for r in shard_pack(spark, SF_DIR).collect()}
    assert sorted(sp) == sorted(got)
    for sid, r in got.items():
        assert (r["n_docs"], r["tok_sum"]) == (sp[sid]["n_docs"], sp[sid]["tok_sum"])

    # SENSITIVITY: editing one document flips its shard's checksum words
    did0, txt0 = int(docs["doc_id"].iloc[0]), docs["text"].iloc[0]
    w1, w2 = words(did0, txt0)
    w1e, w2e = words(did0, txt0 + " tampered")
    sid0 = int(shard[0])
    assert (want[sid0][4] ^ w1 ^ w1e, want[sid0][5] ^ w2 ^ w2e) != (
        want[sid0][4], want[sid0][5],
    )


def test_snapshot_drift_matches_numpy_replica_and_detects_shift(spark):
    """r11 new-surface key: PSI between versioned-table snapshots.  The
    appended ×1.5 cohort must register as REAL drift (total PSI clearly
    above the same-distribution noise floor — measured 0.049 at sf0.001,
    asserted > 0.02; small values often stay in their 50-wide bin under
    ×1.5 so the mass shift is partial), and every cell must match a numpy
    replica of the binning + smoothing pipeline computed straight from
    the fixture, independent of the storage layer."""
    from odc_product_docker_images_spark.operators.drift import (
        table_snapshot_drift,
    )

    rows = {r["bin"]: r for r in table_snapshot_drift(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(10))

    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    v = ev["value"].to_numpy(dtype=np.float64)
    ref = v
    cand = np.concatenate([v, v * 1.5])

    def hist(x):
        return np.bincount(
            np.clip(np.floor(x / 50.0).astype(np.int64), 0, 9), minlength=10
        )

    n_ref, n_cand = hist(ref), hist(cand)
    p_ref = (n_ref + 0.5) / (n_ref.sum() + 5.0)
    p_cand = (n_cand + 0.5) / (n_cand.sum() + 5.0)
    psi = (p_ref - p_cand) * np.log(p_ref / p_cand)
    for b in range(10):
        r = rows[b]
        assert r["n_ref"] == n_ref[b] and r["n_cand"] == n_cand[b]
        assert r["p_ref"] == pytest.approx(p_ref[b], abs=1e-15)
        assert r["psi_contrib"] == pytest.approx(psi[b], abs=1e-6)
    # the shifted cohort is half of v1: the monitor must register clear
    # drift (measured 0.049 at sf0.001 — small values often stay in
    # their 50-wide bin under x1.5, so the mass shift is partial; still
    # ~50x the same-distribution noise floor of profile_embedding_drift)
    assert sum(r["psi_contrib"] for r in rows.values()) > 0.02
