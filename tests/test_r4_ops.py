"""Round-4 operator semantics: virtual-product combinators, polygon AOI
filter, BM25 retrieval scoring, incremental MV maintenance.

(The cross-engine value-hash gate for these keys lives in test_parity.py /
check_parity.py; these tests pin the semantics against independent
references — a handwritten plan, a pure-Python ray cast, a pandas BM25,
a full recompute.)
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from odc_product_docker_images_spark.plans import checks as C

SF = "/root/testdata/sf0.001"


# -- virtual products --------------------------------------------------------


def test_virtual_matches_handwritten(spark):
    """The combinator interpreter must produce exactly what the handwritten
    DataFrame query produces — composition adds nothing."""
    from odc_product_docker_images_spark.functions.det import davg
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.operators.virtual import product_virtual

    got = sorted(product_virtual(spark, SF).collect())

    ev = load(spark, SF, "events")
    colla = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "value", F.lit("p_click").alias("platform")
    ).unionByName(
        ev.where(F.col("event_type") == "view").select(
            "user_id", "ts", "value", F.lit("p_view").alias("platform")
        )
    )
    compa = colla.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        davg("value", "a_mean"),
        F.count(F.lit(1)).alias("a_obs"),
        F.countDistinct("platform").alias("n_platforms"),
    )
    compb = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(davg("value", "b_mean"))
    )
    jux = compa.join(compb, ["user_id", "day"])
    want = sorted(
        jux.select(
            "user_id", "a_obs", "n_platforms",
            (F.col("b_mean") / F.col("a_mean")).alias("ratio"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            davg("ratio", "mean_ratio"),
            F.sum("a_obs").cast("long").alias("total_a_obs"),
            F.max("n_platforms").alias("max_platforms"),
        )
        .collect()
    )
    assert got == want


def test_virtual_plan_is_fused(spark):
    """One composed Catalyst plan: three pushed leaf scans, no more — the
    recipe's per-leaf event_type predicates reach the parquet readers."""
    from odc_product_docker_images_spark.operators.virtual import product_virtual

    df = product_virtual(spark, SF)
    assert C.scan_count(df) == 3
    C.assert_filter_pushed(df, "event_type")
    C.assert_no_python_row_path(df)


def test_virtual_rejects_unknown_nodes(spark):
    from odc_product_docker_images_spark.operators.virtual import build

    with pytest.raises(ValueError, match="unknown combinator"):
        build(spark, SF, {"frobnicate": {}})
    with pytest.raises(ValueError, match="unknown stat"):
        build(
            spark,
            SF,
            {
                "aggregate": {
                    "group": ["user_id"],
                    "stats": [("x", "median_abs_dev", "value")],
                    "input": {
                        "input": {"table": "events", "select": ["user_id", "value"]}
                    },
                }
            },
        )


# -- polygon AOI filter ------------------------------------------------------


def _py_inside(px: float, py: float) -> bool:
    """Independent pure-Python even-odd ray cast, same edge convention."""
    from odc_product_docker_images_spark.operators.scans import _POLY

    n, crossings = len(_POLY), 0
    for i in range(n):
        (x1, y1), (x2, y2) = _POLY[i], _POLY[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            crossings += 1
    return crossings % 2 == 1


def test_polygon_sql_matches_python_raycast():
    """The generated SQL crossing expression classifies a dense point grid
    identically to the independent Python ray cast (DuckDB evaluates the
    same expression text the oracle embeds)."""
    import duckdb

    from odc_product_docker_images_spark.operators.scans import _poly_crossings_sql

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH pts AS (
            SELECT CAST(gx.range * 7 + 0.3 AS DOUBLE) AS px,
                   CAST(gy.range * 3 + 0.7 AS DOUBLE) AS py
            FROM range(0, 72) gx, range(0, 50) gy
        )
        SELECT px, py, ({_poly_crossings_sql("px", "py")}) % 2 = 1 AS inside
        FROM pts
        """
    ).fetchall()
    assert len(rows) == 72 * 50
    mism = [(px, py) for px, py, inside in rows if inside != _py_inside(px, py)]
    assert not mism, f"SQL vs Python ray-cast divergence at {mism[:5]}"
    assert any(inside for _, _, inside in rows)  # the polygon is non-empty
    assert any(not inside for _, _, inside in rows)


def test_polygon_bbox_is_semantics_preserving(sf_dir):
    """The pushed bounding-box predicates must be a pure superset guard —
    dropping them can't change the result set."""
    import duckdb

    from odc_product_docker_images_spark.operators.scans import _poly_crossings_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    pred = f"({_poly_crossings_sql('value', 'CAST(user_id AS DOUBLE)')}) % 2 = 1"
    with_bbox = con.execute(
        f"""SELECT COUNT(*) FROM events
            WHERE value >= 50.0 AND value <= 450.0
              AND user_id >= 11 AND user_id <= 140 AND {pred}"""
    ).fetchone()[0]
    without = con.execute(f"SELECT COUNT(*) FROM events WHERE {pred}").fetchone()[0]
    assert with_bbox == without


def test_polygon_plan_pushes_bbox(spark):
    from odc_product_docker_images_spark.operators.scans import filter_polygon

    df = filter_polygon(spark, SF)
    C.assert_filter_pushed(df, "value")
    C.assert_filter_pushed(df, "user_id")
    C.assert_columns_pruned(df, {"event_id", "user_id", "value"})


# -- BM25 --------------------------------------------------------------------


def _dround_py(v: float, nd: int = 6) -> float:
    """Python twin of det.dround: half-up at 10 dp, then half-up at nd."""
    d = Decimal(repr(v)).quantize(Decimal("1e-10"), ROUND_HALF_UP)
    return float(d.quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))


def test_bm25_matches_pandas_reference(spark):
    import math

    import pandas as pd

    from odc_product_docker_images_spark.textvec.retrieval import _B, _K1, _Q, text_bm25

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    dl = {d: len(ws) for d, ws in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    tf = {
        (d, t): sum(1 for w in ws if w == t)
        for d, ws in toks.items()
        for t in _Q
    }
    dfreq = {t: sum(1 for d in dl if tf[(d, t)] > 0) for t in _Q}

    def score(d: int) -> tuple[int, float] | None:
        n_matched, total = 0, 0.0
        for t in _Q:  # fixed term order, like the pivot-sum
            if tf[(d, t)] == 0:
                continue
            n_matched += 1
            idf = math.log((n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            num = tf[(d, t)] * (_K1 + 1.0)
            den = tf[(d, t)] + _K1 * (1.0 - _B + _B * (dl[d] / avgdl))
            total += _dround_py(idf * num / den)
        return (n_matched, total) if n_matched else None

    want = {d: s for d in dl if (s := score(d)) is not None}
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25"])
        for r in text_bm25(spark, SF).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-9, (d, got[d], want[d])


# -- incremental MV maintenance ---------------------------------------------


def test_incremental_agg_equals_full_recompute(spark):
    """The refreshed view must be BIT-IDENTICAL to recomputing the
    aggregate over the final table state — the definition of correct
    incremental maintenance."""
    from odc_product_docker_images_spark.functions.det import dec_cast, exact_double
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.sources.incremental import (
        _BUCKETS,
        table_incremental_agg,
    )

    got = sorted(table_incremental_agg(spark, SF).collect())

    ev = load(spark, SF, "events").select("event_id", "value")
    final = ev.select(
        "event_id",
        F.when(
            (F.col("event_id") < 1000) & (F.col("event_id") % 2 == 0),
            F.col("value") + 1000,
        )
        .otherwise(F.col("value"))
        .alias("value"),
    ).unionByName(
        ev.where(F.col("event_id") < 100).select(
            (F.col("event_id") + 1_000_000).alias("event_id"),
            (F.col("value") * 2).alias("value"),
        )
    )
    want = sorted(
        final.groupBy(
            F.pmod(F.col("event_id"), F.lit(_BUCKETS)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            exact_double(F.sum(dec_cast("value")), 6).alias("sum_value"),
        )
        .collect()
    )
    assert got == want


# -- zonal stats -------------------------------------------------------------


def test_zonal_blocked_equals_bruteforce(spark):
    """The grid-blocked spatial join must be indistinguishable from the
    naive |zones| x |points| theta join (computed Spark-side here; the
    DuckDB oracle independently runs the same brute force)."""
    from odc_product_docker_images_spark.functions.det import davg
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.operators.zonal import (
        _RX,
        _RY,
        agg_zonal_stats,
    )

    got = sorted(agg_zonal_stats(spark, SF).collect())

    nat = load(spark, SF, "nation")
    zones = nat.select(
        F.col("n_nationkey").alias("zone_id"),
        ((F.col("n_nationkey") % 5).cast("double") * 100.0 + 50.0).alias("cx"),
        (F.expr("n_nationkey div 5").cast("double") * 30.0 + 15.0).alias("cy"),
    )
    pts = load(spark, SF, "events").select(
        "value", F.col("user_id").cast("double").alias("py")
    )
    inside = (
        F.abs(F.col("value") - F.col("cx")) * F.lit(_RY)
        + F.abs(F.col("py") - F.col("cy")) * F.lit(_RX)
        < F.lit(_RX * _RY)
    )
    want = sorted(
        zones.join(pts, inside, "left")
        .groupBy("zone_id")
        .agg(F.count("value").alias("n_points"), davg("value", "mean_value"))
        .collect()
    )
    assert got == want


def test_zonal_plan_broadcasts_zone_cells(spark):
    """The zone-cell fanout must ride a broadcast (candidate join), and no
    cartesian product may appear anywhere."""
    from odc_product_docker_images_spark.operators.zonal import agg_zonal_stats

    plan = C.formatted_plan(agg_zonal_stats(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- EWMA --------------------------------------------------------------------


def test_ewma_matches_python_reference(spark):
    """Per-series fixed-order tap sum vs an independent Python loop."""
    import pandas as pd

    from odc_product_docker_images_spark.operators.windows import (
        _EWMA_DECAY,
        _EWMA_TAPS,
        window_ewma,
    )

    got = {
        r["event_id"]: r["ewma"] for r in window_ewma(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["event_id", "ts", "user_id", "value"]
    ].sort_values(["user_id", "ts", "event_id"])
    for _, g in ev.groupby("user_id"):
        vals = g["value"].tolist()
        ids = g["event_id"].tolist()
        for i, eid in enumerate(ids):
            num, den = 0.0, 0.0
            for k in range(_EWMA_TAPS):
                if i - k >= 0:
                    num = num + vals[i - k] * (_EWMA_DECAY**k)
                    den = den + _EWMA_DECAY**k
                else:
                    num = num + 0.0
                    den = den + 0.0
            assert got[eid] == num / den, eid


# -- schema evolution --------------------------------------------------------


def test_schema_evolution_preserves_old_snapshot(spark):
    """Time travel to v0 must still present the ORIGINAL schema, while the
    evolved snapshot surfaces the new column with NULLs for legacy rows."""
    from odc_product_docker_images_spark.io import load
    from odc_product_docker_images_spark.sources.versioned import _fresh_table

    ev = load(spark, SF, "events").select("event_id", "value")
    t = _fresh_table("schevo_test")
    t.write(ev.where(F.col("event_id") < 50), mode="overwrite")
    t.write(
        ev.where(F.col("event_id") < 20).select(
            (F.col("event_id") + 1000).alias("event_id"),
            "value",
            F.lit(7).cast("int").alias("quality"),
        ),
        mode="append",
    )
    v0 = t.read(spark, 0)
    assert v0.columns == ["event_id", "value"]
    merged = t.read(spark, merge_schema=True)
    assert "quality" in merged.columns
    legacy_nulls = merged.where(
        (F.col("event_id") < 50) & F.col("quality").isNull()
    ).count()
    assert legacy_nulls == merged.where(F.col("event_id") < 50).count()


# -- profiling ---------------------------------------------------------------


def test_profile_matches_pandas(spark):
    import pandas as pd

    from odc_product_docker_images_spark.operators.profile import profile_table

    got = {r["column_name"]: r for r in profile_table(spark, SF).collect()}
    lf = pd.read_parquet(f"{SF}/lineitem.parquet")
    for c in ["l_quantity", "l_extendedprice", "l_partkey"]:
        assert got[c]["n_rows"] == len(lf)
        assert got[c]["n_nulls"] == int(lf[c].isna().sum())
        assert got[c]["n_distinct"] == lf[c].nunique()
        assert got[c]["min_v"] == float(lf[c].min())
        assert got[c]["max_v"] == float(lf[c].max())


def test_profile_single_scan(spark):
    from odc_product_docker_images_spark.operators.profile import profile_table

    df = profile_table(spark, SF)
    assert C.scan_count(df) == 1


# -- BPE ---------------------------------------------------------------------


def _bpe_sequential(word: str, merges) -> list[str]:
    """Independent reference: apply merges in TRAINING ORDER, each
    exhaustively (the original Sennrich apply loop) — equivalent to the
    operator's greedy min-rank fixpoint for tables produced by training."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_matches_sequential_reference(spark):
    import pandas as pd

    from odc_product_docker_images_spark.textvec.bpe import (
        _MERGES,
        bpe_word,
        text_bpe_tokens,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # kernel-level agreement on every word in the corpus
    words = {w for t in docs["text"] for w in t.split(" ") if w}
    for w in sorted(words):
        assert bpe_word(w) == _bpe_sequential(w, _MERGES), w
    # operator-level agreement on the per-doc counts
    got = {r["doc_id"]: r for r in text_bpe_tokens(spark, SF).collect()}
    for rec in docs.itertuples():
        ws = [w for w in rec.text.split(" ") if w]
        n_bpe = sum(len(_bpe_sequential(w, _MERGES)) for w in ws)
        row = got[rec.doc_id]
        assert row["n_words"] == len(ws)
        assert row["n_bpe_tokens"] == n_bpe
        assert row["n_symbols"] == sum(len(w) for w in ws)
        assert row["compression"] == row["n_symbols"] / n_bpe


def test_bpe_actually_compresses():
    from odc_product_docker_images_spark.textvec.bpe import bpe_word

    assert bpe_word("hash") == ["hash"]
    assert bpe_word("batch") == ["batch"]
    assert len(bpe_word("customer")) < len("customer")


# -- k-means step ------------------------------------------------------------


def test_kmeans_step_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from odc_product_docker_images_spark.textvec.kmeans import (
        _K,
        sim_kmeans_step,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    X, ids = X[order], ids[order]
    C = X[ids < _K]
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    # operator rounds distances 6dp before argmin (ties -> lowest id);
    # replicate with the same tie-break on the rounded matrix
    d2r = np.round(d2, 6)  # numpy half-even vs half-up: midpoints are
    # improbable for these irrational sums; assignment only needs ordering
    assign = d2r.argmin(axis=1)
    got = {
        (r["centroid_id"], r["dim"]): (r["new_val"], r["n_members"])
        for r in sim_kmeans_step(spark, SF).collect()
    }
    assert len(got) == _K * X.shape[1]
    for k in range(_K):
        members = X[assign == k]
        for dim in range(X.shape[1]):
            val, n = got[(k, dim + 1)]
            assert n == len(members)
            assert abs(val - members[:, dim].mean()) < 1e-6, (k, dim)


# -- PageRank step -----------------------------------------------------------


def test_pagerank_step_matches_numpy(spark):
    import duckdb

    from odc_product_docker_images_spark.operators.graph import (
        _DAMP,
        _DST_OFF,
        graph_pagerank_step,
    )

    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT l_suppkey, l_partkey
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    edges = [(s, p + _DST_OFF) for s, p in edges]
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    dangling = sum(1 for v in nodes if v not in outdeg)
    contrib = {}
    for s, d in edges:
        contrib[d] = contrib.get(d, 0.0) + 1.0 / outdeg[s]
    got = {r["node_id"]: r["pr"] for r in graph_pagerank_step(spark, SF).collect()}
    assert set(got) == set(nodes)
    total = 0.0
    for v in nodes:
        # the operator's exact-decimal sum rounds the contribution at 6 dp
        c = _dround_py(contrib.get(v, 0.0)) if v in contrib else 0.0
        want = (0.15 + _DAMP * (c + dangling / n)) / n
        assert abs(got[v] - want) < 1e-12, v
        total += got[v]
    # mass conservation: sum(pr) = 1 under dangling redistribution
    assert abs(total - 1.0) < 1e-6
