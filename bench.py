"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Execution is forced with the ``noop`` sink (full plan runs, nothing
written) so column pruning can't optimize the measured work away.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one per operator family, preferring the scale-relevant ones.
HEADLINE = [
    "scan_pushdown",
    "agg_multi_stat",
    "agg_mean",
    "agg_max_by",
    "agg_median",
    "join_inner",
    "join_broadcast",
    "join_asof",
    "window_rank",
    "window_rolling",
    "udf_wofs_summary",
    "agg_geomedian",
    "dedup_exact_hash",
    "dedup_minhash",  # near-dup family; the exact-jaccard twin has inherent
    # hot-shingle pair-count variance (10-19s run to run) — oracled but not benched
    "sim_topk_cosine",
    "explode_tokens",
    "text_quality",
    "text_repetition",  # curation family: pure-map repetition scoring
    "shard_pack",  # curation family: distributed prefix-sum packing
    "stream_session",  # batch session-window form — real streams are below
]

# Real Structured Streaming keys, timed separately: micro-batch machinery
# (state store, checkpointing, file-source listing) would otherwise dilute
# the batch-engine regression signal in the headline total.  All three run
# fixed deterministic feeds, so their cost is sf-independent.
STREAMING = [
    "stream_watermark",
    "stream_stateful_ledger",
    "stream_foreach_batch",
]

# Storage-layer keys, also timed separately: each one WRITES a fresh
# versioned table before reading it (write + manifest + read in one
# number), which is a different regression signal than pure query time.
STORAGE = [
    "table_merge_upsert",
    "table_data_skipping",
    "table_zorder_skipping",
]

# Round-5 additions, timed separately so the headline total stays
# comparable against the frozen BASELINE band across rounds.
# Round-6 additions, same separate-section contract.
R6 = [
    "join_bloom_prefilter",
    "join_partition_pruned",
    "agg_ttest_welch",
    "agg_rolling_distinct",
    "window_rolling_slope",
    "table_scd2_build",
    "graph_triangle_count",
    "join_range_bucket",
    "text_lm_bigram",
    "agg_assoc_rules",
    "sample_weighted",
    "agg_attribution",
    "graph_link_prediction",
    "agg_chi_square",
    "agg_survival_curve",
    "stream_cdc_apply",
    "scalar_geohash",
    "forecast_holt",
    "agg_markov_transitions",
    "agg_rfm_segments",
    "profile_benford",
    "window_interpolate_linear",
    "text_inverted_index",
    "table_incremental_join",  # graded in the r6 window (CORRECTNESS_r06 row)
]

# r6c post-window additions (rotated into grading windows from r7 on).
R6C = [
    "dedup_url_canonical",
    "window_rolling_median",
    "agg_cohort_ltv",
    "text_token_entropy",
    "agg_cuped",
    "sim_hybrid_rrf",
    "forecast_holt_winters",
    "agg_bootstrap_ci",
    "agg_sessionize",
    "graph_modularity",
    "multimodal_tar_index",
    "multimodal_safetensors_roundtrip",
    "text_keyphrase_rake",
    "join_haversine_radius",
    "forecast_kalman_1d",
    "table_delete_vectors",
    "window_theil_sen",
    "agg_hhi_concentration",
    "ml_gmm_em_step",
    "window_drawdown",
    "join_scd2_asof",
    "ml_ridge_closed_form",
    "ml_pca_power_step",
    "ml_lift_table",
    "agg_mann_whitney",
    "text_feature_hashing",
    "geo_dbscan_core",
    "text_quality_gopher",
    "join_asof_nearest",
    "ml_target_encoding",
    "agg_spc_rules",
    "table_wap_publish",
    "agg_fifo_allocation",
    "agg_revenue_bridge",
    "agg_skyline_2d",
    "forecast_backtest_metrics",
    "agg_diff_in_diff",
    "dedup_survivorship",
    "graph_bfs_step",
    "agg_markov_absorption",
    "product_phenology",
    "agg_logrank_test",
]

# r6d (continuation-session) additions — same rotation fate as R6C.
R6D = [
    "agg_ks_test",
    "agg_anova_oneway",
    "agg_acf",
    "agg_circular_mean",
    "ml_roc_curve",
    "ml_auc_exact",
    "ml_calibration_bins",
    "ml_confusion_metrics",
    "raster_slope_aspect",
    "agg_medoid_composite",
    "agg_winsorized_mean",
    "sample_bottomk_hash",
    "graph_hits_step",
    "text_readability",
    "geo_idw_interpolate",
    "agg_ljung_box",
    "ml_isotonic_pava",
    "raster_flow_direction",
    "raster_hillshade",
    "table_bloom_skipping",
    "graph_label_prop_step",
    "agg_spatial_moran",
    "text_collocations_pmi",
    "agg_abc_classification",
    "agg_bitmap_distinct",
    "agg_stl_lite",
    "window_rolling_corr",
    "agg_hurst_rs",
    "sim_matryoshka_prefix",
    "ml_naive_bayes",
    "profile_parquet_footers",
    "forecast_croston",
    "agg_price_index",
    "agg_ks_by_group_fdr",
    "agg_cmh_test",
    "table_content_checksum",
    "agg_kruskal_wallis",
    "agg_spearman_corr",
    "ml_decision_stump",
    "agg_cohens_kappa",
    "agg_lorenz_points",
    "text_compression_ratio",
    "agg_wilcoxon_signed_rank",
    "agg_cronbach_alpha",
    "ml_platt_scaling_step",
    "graph_kcore_step",
    "agg_tost_equivalence",
    "agg_breusch_pagan",
    "agg_runs_test",
    "agg_theil_index",
    "agg_hill_tail",
    "text_js_divergence",
    "text_burstiness",
    "agg_overdispersion",
    "agg_iptw_ate",
    "ml_auc_delong_se",
    "text_mattr",
    "agg_sprt_decision",
    "agg_adf_test",
    "graph_assortativity",
    "join_bipartite_projection",
    "agg_new_vs_returning",
    "composite_q10_shape",
    "agg_entropy_by_group",
    "agg_capture_recapture",
    "agg_gamma_mom",
    "ml_ndcg_at_k",
    "agg_odds_ratio_mh",
    "agg_cohort_decay_fit",
    "ml_recall_at_k",
    "text_winnowing",
    "agg_interevent_burstiness",
    "agg_apdex_daily",
    "agg_gumbel_fit",
    "window_record_highs",
    "agg_srm_check",
    "window_mix_drift",
]

# Round-7 additions (new keys this round; all enter the r7 grading window).
R7: list[str] = []

# Round-8 additions (all enter the r8 grading window): the iterative-loop
# tier (unrolled verified steps), the ANN recall gate, the TIFF-decoding
# tile source, and the stupid-backoff trigram LM.
R8 = [
    "graph_pagerank_loop",
    "graph_kcore_loop",
    "graph_label_prop_loop",
    "sim_kmeans_loop",
    "sim_ann_recall",
    "source_tile_scan_tiff",
    "text_lm_trigram",
    "sim_ivf_pq_funnel",
    "graph_hits_loop",
    "ml_pca_power_loop",
    "ml_platt_scaling_loop",
    "ml_gmm_em_loop",
    "sketch_error_gates",
    # dedup_minhash_recall is oracled + window-graded but NOT benched: its
    # exact-jaccard truth join inherits dedup_ngram_jaccard's documented
    # hot-shingle pair-count variance (10-19s run to run at sf0.1).
]

# Round-9 additions (all enter the r9 grading window): the loop tier's
# traversal corner.
R9 = [
    "graph_bfs_loop",
]

R5 = [
    "sink_geotiff_roundtrip",
    "proj_crs_curvilinear",
    "scalar_solar_day",
    "text_bpe_train_step",
    "udf_wofs_confidence",
    "multimodal_jpeg_decode",
    "dedup_semantic",
    "text_quality_lr_step",
    "sink_geotiff_tiled",
    "window_cusum_change",
    "join_polygon_zone",
    "proj_crs_roundtrip",
    "dedup_substring_spans",
    "data_mix_temperature",
    "window_seasonal_zscore",
    "multimodal_image_resize",
    "agg_resample_ohlc",
    "profile_drift_psi",
    "table_clone_shallow",
    "agg_funnel_steps",
    "agg_retention_cohort",
    "proj_unpivot_bands",
    "profile_skew_keys",
    "stream_ohlc_bars",
    "sim_mmr_rerank",
    "source_fixed_width_roundtrip",
    "graph_subtree_rollup",
    "agg_gini",
]


def _time_keys(spark, qs, sf_dir: str, section: str, keys: list[str], passes: int) -> dict[str, float]:
    """Min-of-N wall time per key through the noop sink.

    Pass 1 doubles as warm-up (whole-stage codegen compile + full C2
    tiering; cold-vs-warm on the banded-LSH key is 11s vs 2s, and a
    smaller-sf warm-up is not enough — heavy loops keep tiering mid-run on
    the first full-size pass).  Min, not mean, filters this VM's sporadic
    multi-second noisy-neighbor stalls (identical plans swing 2s ↔ 7s with
    CPU idle): we're measuring the engine, not the hypervisor.
    """
    out: dict[str, float] = {}
    for _pass in range(passes):
        for key in (k for k in keys if k in qs):
            t0 = time.time()
            qs[key](spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if key not in out or dt < out[key]:
                out[key] = dt
            print(f"# [{section}] pass{_pass} {key}: {dt:.3f}s", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from odc_product_docker_images_spark.registry import queries
    from odc_product_docker_images_spark.session import get_spark

    spark = get_spark("bench")
    qs = queries()

    # Headline: 3 passes (min); non-headline sections: 2 passes (min).
    timings = _time_keys(spark, qs, sf_dir, "headline", HEADLINE, 3)
    total = sum(timings.values())

    sections = {
        # streaming fns drive the real streaming query to completion
        # internally; the noop save materializes the result read-back.
        "streaming": _time_keys(spark, qs, sf_dir, "stream", STREAMING, 2),
        # storage keys WRITE a fresh versioned table before reading it
        # (write + manifest + read in one number).
        "storage": _time_keys(spark, qs, sf_dir, "storage", STORAGE, 2),
        "r5": _time_keys(spark, qs, sf_dir, "r5", R5, 2),
        "r6": _time_keys(spark, qs, sf_dir, "r6", R6, 2),
        "r6c": _time_keys(spark, qs, sf_dir, "r6c", R6C, 2),
        "r6d": _time_keys(spark, qs, sf_dir, "r6d", R6D, 2),
        "r7": _time_keys(spark, qs, sf_dir, "r7", R7, 2),
        "r8": _time_keys(spark, qs, sf_dir, "r8", R8, 2),
        "r9": _time_keys(spark, qs, sf_dir, "r9", R9, 2),
    }

    # Full per-key detail goes to a FILE (BENCH_r06 lesson: the one-line
    # stdout JSON grew past the driver's tail capture and parsed as null).
    # Stdout's last line stays SMALL: headline metric + headline per-key
    # timings + per-section totals only.
    detail = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **sections,
    }
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")
    print(f"# full per-section detail: {detail_path}", file=sys.stderr)

    print(summary_line(total, timings, sections, sf))


def summary_line(
    total: float,
    timings: dict[str, float],
    sections: dict[str, dict[str, float]],
    sf: float,
) -> str:
    """The driver-parsed stdout contract: ONE small JSON line (tested by
    tests/test_driver_contract.py — the BENCH_r06 `"parsed": null` failure
    class).  Per-key detail stays in BENCH_DETAIL.json; section totals are
    always floats (an empty section's sum is int 0 otherwise)."""
    return json.dumps(
        {
            "metric": "headline_suite_wall",
            "value": round(total, 3),
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "sections_sec": {
                name: float(round(sum(v.values()), 3))
                for name, v in sections.items()
            },
            "detail": "BENCH_DETAIL.json",
        }
    )


if __name__ == "__main__":
    main()
