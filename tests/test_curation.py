"""Curation-family property tests (textvec/curation.py): invariants the
DuckDB oracle can't express — propagation fixpoint, conservation laws,
partitioning-independence of the distributed prefix sum."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

ORACLE_SF = "/root/testdata/sf0.01"


def test_dedup_clusters_rounds_reach_fixpoint(spark):
    """One extra propagation round must not change any label — i.e.
    _CC_ROUNDS is at/after the fixpoint on the oracle-grade fixture."""
    import odc_product_docker_images_spark.textvec.curation as cur

    base = cur.dedup_clusters(spark, ORACLE_SF).toPandas()
    orig = cur._CC_ROUNDS
    try:
        cur._CC_ROUNDS = orig + 1
        more = cur.dedup_clusters(spark, ORACLE_SF).toPandas()
    finally:
        cur._CC_ROUNDS = orig
    key = ["cluster_rep", "n_members", "member_max", "member_sum"]
    pd.testing.assert_frame_equal(
        base.sort_values(key).reset_index(drop=True)[key],
        more.sort_values(key).reset_index(drop=True)[key],
    )


def test_dedup_clusters_cover_pair_docs(spark):
    """Every doc in a near-dup pair lands in exactly one cluster, and the
    total membership equals the number of distinct paired docs."""
    from odc_product_docker_images_spark.textvec.curation import dedup_clusters
    from odc_product_docker_images_spark.textvec.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, ORACLE_SF).toPandas()
    docs = set(pairs.doc_a) | set(pairs.doc_b)
    clusters = dedup_clusters(spark, ORACLE_SF).toPandas()
    assert clusters.n_members.sum() == len(docs)
    assert (clusters.n_members >= 2).all()  # singletons never enter the graph
    # the representative is the component min, so it can't exceed member_max
    assert (clusters.cluster_rep < clusters.member_max).all()


def test_shard_pack_conserves_tokens_and_order(spark):
    """Shard packing is a partition of the corpus: token totals conserved,
    shard ids contiguous from 0, doc ranges non-overlapping in id order."""
    from odc_product_docker_images_spark.textvec.curation import (
        _SHARD_TOKENS,
        shard_pack,
    )
    from odc_product_docker_images_spark.io import load

    out = shard_pack(spark, ORACLE_SF).toPandas().sort_values("shard_id")
    dc = load(spark, ORACLE_SF, "documents")
    totals = dc.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("toks"),
    ).first()
    assert out.n_docs.sum() == totals.n
    assert out.tok_sum.sum() == totals.toks
    assert list(out.shard_id) == list(range(len(out)))
    # id ranges must be disjoint and increasing shard to shard
    assert (out.first_doc.values[1:] > out.last_doc.values[:-1]).all()
    # every shard starts within budget of its nominal boundary: a doc that
    # straddles the boundary belongs to the shard where it STARTS
    assert (out.tok_sum.values[:-1] >= _SHARD_TOKENS - 60).all()


def test_shard_pack_partitioning_invariance(spark):
    """The distributed prefix sum must not depend on the partition count —
    same shard assignment at 1 partition and 32."""
    from odc_product_docker_images_spark.textvec import curation
    from odc_product_docker_images_spark.io import load

    out32 = curation.shard_pack(spark, ORACLE_SF).toPandas().sort_values("shard_id")

    # recompute with the oracle's single-window form on the same session
    dc = load(spark, ORACLE_SF, "documents")
    from pyspark.sql import Window

    w = dc.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    win = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = w.withColumn("cum", F.sum("n_tokens").over(win)).select(
        "doc_id",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / curation._SHARD_TOKENS)
        .cast("bigint")
        .alias("shard_id"),
    )
    ref = (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tok_sum"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .toPandas()
        .sort_values("shard_id")
    )
    pd.testing.assert_frame_equal(
        out32.reset_index(drop=True), ref.reset_index(drop=True)
    )


def test_contamination_flags_planted_eval_overlap(spark):
    """Contaminated docs must each share >=1 8-gram with an eval-bucket doc
    (verified against an independent pandas recomputation)."""
    from odc_product_docker_images_spark.textvec.curation import text_contamination
    from odc_product_docker_images_spark.textvec.pipeline import _KNUTH
    from odc_product_docker_images_spark.io import load

    got = text_contamination(spark, ORACLE_SF).toPandas()
    docs = load(spark, ORACLE_SF, "documents").select("doc_id", "text").toPandas()

    def grams(text: str) -> set[str]:
        t = text.split(" ")
        return {" ".join(t[i : i + 8]) for i in range(len(t) - 7)}

    eval_ids = {d for d in docs.doc_id if (d * _KNUTH) % 100 < 5}
    eval_grams: dict[int, set[str]] = {
        r.doc_id: grams(r.text) for r in docs.itertuples() if r.doc_id in eval_ids
    }
    expect = {}
    for r in docs.itertuples():
        if r.doc_id in eval_ids:
            continue
        g = grams(r.text)
        shared = set().union(*[g & eg for eg in eval_grams.values()]) if eval_grams else set()
        hits = sum(1 for eg in eval_grams.values() if g & eg)
        if hits:
            expect[r.doc_id] = (len(shared), hits)
    assert expect, "fixture should contain contaminated near-dups"
    got_map = {
        r.doc_id: (r.n_shared_shingles, r.n_eval_docs_hit) for r in got.itertuples()
    }
    assert got_map == expect


def test_data_mix_rates_hit_targets(spark):
    """Kept fraction per source must track its keep_pct (exact hash gate —
    the check is exact equality against a pandas recomputation)."""
    from odc_product_docker_images_spark.textvec.curation import data_mix_sample
    from odc_product_docker_images_spark.textvec.pipeline import _KNUTH
    from odc_product_docker_images_spark.io import load

    got = data_mix_sample(spark, ORACLE_SF).toPandas()
    docs = load(spark, ORACLE_SF, "documents").select("doc_id", "source").toPandas()
    pct = {0: 100, 1: 50, 2: 25, 3: 10}
    for r in got.itertuples():
        srcn = int(r.source[3:])
        assert r.keep_pct == pct[srcn % 4]
        sub = docs[docs.source == r.source]
        kept = sum(1 for d in sub.doc_id if (d * _KNUTH) % 100 < r.keep_pct)
        assert r.n_kept == kept
        assert r.n_total == len(sub)
