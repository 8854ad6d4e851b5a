#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line with per-query seconds.

Workload = the engine's core single-pass profile over the five biggest
tables + the frequency operator + the heavyweight extension operators
(MinHash-LSH dedup, brute-force ANN, text stats, windowed rollup) — the
operators whose shuffle/scan shape dominates at 100 TB.
"""

from __future__ import annotations

import json
import os
import time

from whiterrabbit_spark.config import ScanConfig
from whiterrabbit_spark.frequency import value_frequencies
from whiterrabbit_spark.profile import profile_table
from whiterrabbit_spark.queries import build_registry
from whiterrabbit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Registry queries deliberately NOT in the bench workload, with the
# reason (VERDICT r3 #7). tests/test_docs_sync.py::
# test_bench_covers_registry enforces that every registry entry is
# either referenced in this file's workload or matched by exactly one
# of these patterns — no silent bench gaps. Patterns are regexes over
# the registry name; reasons name the benched representative where one
# exists.
BENCH_EXCLUSIONS: list[tuple[str, str]] = [
    (r"^(counts|summary_stats|date_stats|infer_types|freq)_",
     "per-table variant of the single-pass profile/frequency/inference "
     "pipeline; the benched profile_*/freq_* rows run the identical plan "
     "on the biggest tables"),
    (r"^overview_tables$",
     "parse-free count(*) per file — a strict subset of every benched "
     "profile entry's scan"),
    (r"^streaming_(sessionize|join|psi|dedup|frequencies|topk|pysource|"
     r"windowed_profile|running_stats)_",
     "bounded micro-batch streams: wall time is streaming-engine fixed "
     "overhead, pinned once by the benched streaming_active_users / "
     "streaming_sliding_rate pair"),
    (r"^(zscore|winsorize)_",
     "map-only standardization — plan prefix of the benched robust_scale"),
    (r"^(extremes|row_dups|mad_outliers|outlier_counts|value_entropy|check_constraints|"
     r"histogram|grouped_quantiles|grouped_profile)_",
     "small-aggregate profiling variants of benched family members "
     "(dow_outliers, equi_depth_hist, grouped_freq, key_skew)"),
    (r"^(corr_matrix|mutual_info|cramers_v|fk_coverage|"
     r"functional_dependencies|profile_drift|psi_drift)",
     "association/drift scalars sharing the two-pass agg shape of the "
     "benched spearman_corr / ks_drift / jsd_drift / chi2_drift"),
    (r"^(ohlc_bars|peak_detection|events_cube|events_multi_rollup|json_props_rollup|json_schema_(profile|drift)|seasonality|"
     r"active_users|cohort_retention|event_transitions|"
     r"missingness_patterns|range_moving_stats|asof_join_forward|"
     r"resample_interpolate)_?",
     "rollup/window variants of the benched events_hourly_rollup, "
     "variant_props_rollup, seasonality_strength, rolling_distinct, "
     "funnel, moving_stats and asof_join entries (same shuffle shape, "
     "different grouping sets or direction)"),
    (r"^(dup_weighted_size|dedup_exact|dedup_clusters|dedup_ngram_jaccard|dedup_threshold_sweep|"
     r"edit_distance_pairs|semantic_dedup|fingerprint|novel|"
     r"winnow_fingerprint|corpus_report)_",
     "dedup family: the benched dedup_minhash_lsh / dedup_simhash / "
     "containment_pairs / line_dedup / keep_best_dedup rows cover the "
     "shingle, banded-join and cluster plans; these are their exact / "
     "clustering / cross-snapshot / threshold-curve variants"),
    (r"^(code_detect|readability|lang_id|quality_score|repetition_signals|normalize_text|"
     r"pii_redact|tfidf_top_terms|token_count_bpe|source_diversity|"
     r"topk_quality_per_lang|temperature_mixture|chunk)_",
     "map-mostly text operators; the benched text_stats / "
     "curation_pipeline / heuristic_filters / bigram_perplexity rows "
     "bench the same scan+project (and the curation pipeline composes "
     "several of these end-to-end)"),
    (r"^(dataset_split|kfold_split|leakage_safe_split|stratified_sample|"
     r"weighted_sample|pack_shards|pack_sequences|decontaminate)_",
     "hash-split/packing operators: deterministic md5-threshold "
     "projections or the pack prefix-sum benched via pack_manifest and "
     "balanced_sample/neyman_sample"),
    (r"^(shuffle_shards|epoch_upsample|padding_efficiency)_",
     "map-side md5 assignment + one small groupBy — the same plan "
     "shape as the benched balanced_sample / neyman_sample "
     "hash-threshold family"),
    (r"^bucket_join_",
     "CTAS write cost dominates and is environment-bound (bucketed "
     "managed-table write); the join itself is exchange-free by "
     "construction and plan-pinned in test_scale_techniques"),
    (r"^approx_quantile_gate_",
     "two single-row aggregate scans (percentile + conditional "
     "counts) — the same physical shape as the benched "
     "profile_lineitem summary aggregates"),
    (r"^dp_counts_",
     "one bounded groupBy + a map-side seeded-noise projection — a "
     "plan prefix of the benched k_anonymity / l_diversity privacy "
     "rollups"),
    (r"^curriculum_stages_",
     "exact percentile over 6-dp-ROUNDED scores (state capped at "
     "10^6+1 distincts) + one broadcast threshold row + map-side "
     "assignment; the rounded-distinct percentile merge that "
     "dominates is measured by the 20M smoke in PLANS.md"),
    (r"^(centroid_matrix|embedding_stats|multimodal_features|image_near_dups|image_keep_best|image_dims_profile|audio_near_dups|audio_keep_best|video_near_dups|video_keep_best|video_scene_cuts)_",
     "per-row array/binary feature extraction; the benched ann_* and "
     "curation entries dominate the same Arrow-batch path"),
    (r"^(graph_degree|ann_ivf_index)_",
     "covered by the benched graph_triangles/pagerank (edge induction + "
     "degree agg is their prefix) and ann_recall (same IVF/LSH eval "
     "shape; the index build's MLlib fit is measured in its unit test)"),
]
CFG = ScanConfig(max_rows=-1)
CFG_APPROX = ScanConfig(max_rows=-1, approx=True)


def profile_query(table: str, cfg: ScanConfig = CFG):
    def run(spark, sf_dir):
        from whiterrabbit_spark.io import read_parquet_table

        df = read_parquet_table(spark, sf_dir, table)
        summary, _ = profile_table(df, cfg, table_name=table)
        return summary

    return run


def freq_query(table: str):
    def run(spark, sf_dir):
        from whiterrabbit_spark.io import read_parquet_table

        df = read_parquet_table(spark, sf_dir, table)
        return value_frequencies(df, cfg=CFG)

    return run


def main() -> None:
    spark = get_spark(app_name="wrs-bench", cpus=CPUS)
    queries, _ = build_registry()

    bench: dict[str, object] = {
        "profile_lineitem": profile_query("lineitem"),
        "profile_lineitem_approx": profile_query("lineitem", CFG_APPROX),
        "profile_orders": profile_query("orders"),
        "profile_events": profile_query("events"),
        "freq_lineitem": freq_query("lineitem"),
        "freq_orders": freq_query("orders"),
        "dedup_minhash_lsh": queries["dedup_minhash_lsh_documents"],
        "dedup_simhash": queries["dedup_simhash_documents"],
        "dedup_embedding_cosine": queries["dedup_embedding_cosine_embeddings"],
        "ann_cosine_topk": queries["ann_cosine_topk_embeddings"],
        "ann_hyperplane_lsh": queries["ann_hyperplane_lsh_embeddings"],
        "text_stats": queries["text_stats_documents"],
        "curation_pipeline": queries["curation_pipeline_documents"],
        "sessionize": queries["sessionize_events"],
        "events_hourly_rollup": queries["events_hourly_rollup"],
        # added later in round 1 (absent from earlier BENCH_r records;
        # BASELINE.md documents their bands separately)
        "line_dedup": queries["line_dedup_documents"],
        # round 2: the scale-path embedding near-dup (banded hyperplane
        # LSH, no O(n^2) block replication)
        "hyperplane_near_pairs": queries["hyperplane_near_pairs_embeddings"],
        # round 4: LSH pairs -> clusters -> keep-best argmax composite
        "embedding_keep_best": queries["embedding_keep_best_embeddings"],
        # round 2 additions: WindowGroupLimit cap, full-outer snapshot
        # diff, map-only heuristic filters, histogram-derived quantile ops
        "cap_per_source": queries["cap_per_source_documents"],
        "table_diff": queries["table_diff_orders"],
        "heuristic_filters": queries["heuristic_filters_documents"],
        "equi_depth_hist": queries["equi_depth_hist_lineitem"],
        "key_skew": queries["key_skew_orders"],
        "script_profile": queries["script_profile_documents"],
        "robust_scale": queries["robust_scale_lineitem"],
        "ecdf": queries["ecdf_orders"],
        "bigram_perplexity": queries["bigram_perplexity_documents"],
        "pack_manifest": queries["pack_manifest_documents"],
        "ks_drift": queries["ks_drift_orders"],
        "ecdf_attach": queries["ecdf_attach_orders"],
        "grouped_freq": queries["grouped_freq_documents"],
        "spearman_corr": queries["spearman_corr_lineitem"],
        "dup_ngram_stats": queries["dup_ngram_stats_documents"],
        "unigram_perplexity": queries["unigram_perplexity_documents"],
        "pmi_collocations": queries["pmi_collocations_documents"],
        "vocab_coverage": queries["vocab_coverage_documents"],
        # round-2 second wave: regression/association/shape profiling,
        # SCD2 interval build, dense resample, learned classifier
        "grouped_ols": queries["grouped_ols_lineitem"],
        "benford": queries["benford_lineitem"],
        "sequence_gaps": queries["sequence_gaps_orders"],
        "mask_profile": queries["mask_profile_customer"],
        "resample_fill": queries["resample_fill_events"],
        "scd2_history": queries["scd2_history_orders"],
        "quality_classifier": queries["quality_classifier_documents"],
        "incremental_profile": queries["incremental_profile_lineitem"],
        "keep_best_dedup": queries["keep_best_dedup_documents"],
        "hist2d": queries["hist2d_lineitem"],
        "join_cardinality": queries["join_cardinality_orders_customer"],
        "chi2_drift": queries["chi2_drift_orders"],
        "temporal_split": queries["temporal_split_events"],
        "link_records": queries["link_records_customer"],
        "bpe_learn": queries["bpe_learn_documents"],
        "containment_pairs": queries["containment_pairs_documents"],
        # round 3: the temporal/join family (oracle-green since r2 but
        # previously absent from the bench workload — VERDICT r2 #7)
        "asof_join": queries["asof_join_events"],
        "star_rollup": queries["star_rollup_revenue"],
        "funnel": queries["funnel_events"],
        "event_pivot": queries["event_pivot_events"],
        "moving_stats": queries["moving_stats_events"],
        "range_join": queries["range_join_events"],
        # round-3 additions: streaming state-store dedup throughput, the
        # 64-dim centroid aggregation, and the per-lang tokenizer report
        "streaming_dedup": queries["streaming_dedup_events"],
        "centroid_dispersion": queries["centroid_dispersion_embeddings"],
        "tokenizer_fertility": queries["tokenizer_fertility_documents"],
        # round-3 batch 2: map-only intra-doc scrub, window attribution,
        # histogram-rank U test, per-dim quantization fold, partial-Gram
        # PCA collect
        "span_dedup": queries["span_dedup_documents"],
        "attribution": queries["attribution_events"],
        "mannwhitney": queries["mannwhitney_orders"],
        "quantize_error": queries["quantize_error_embeddings"],
        "embedding_pca": queries["embedding_pca_embeddings"],
        "heavy_hitters": queries["heavy_hitters_events"],
        "join_discovery": queries["join_discovery_customer_orders"],
        "k_anonymity": queries["k_anonymity_customer"],
        "binned_mi": queries["binned_mi_lineitem"],
        "session_paths": queries["session_paths_events"],
        "cusum_changepoint": queries["cusum_changepoint_events"],
        "boilerplate_lines": queries["boilerplate_lines_documents"],
        "cross_source_dups": queries["cross_source_dups_documents"],
        "grouped_trimmed_mean": queries["grouped_trimmed_mean_lineitem"],
        "item_associations": queries["item_associations_events"],
        "lifetime_survival": queries["lifetime_survival_events"],
        "whiten_embeddings": queries["whiten_embeddings_embeddings"],
        "tpch_q1": queries["tpch_q1_lineitem"],
        "tpch_q3": queries["tpch_q3_pricing"],
        "gini": queries["gini_lineitem"],
        "theil_index": queries["theil_index_orders"],
        "hurst_exponent": queries["hurst_exponent_events"],
        "rfm_segments": queries["rfm_segments_orders"],
        "skyline": queries["skyline_lineitem"],
        "twap": queries["twap_events"],
        "rolling_corr": queries["rolling_corr_events"],
        "var_es": queries["var_es_orders"],
        "generalization_advisor": queries["generalization_advisor_customer"],
        "spearman_matrix": queries["spearman_matrix_lineitem"],
        "mi_ranking": queries["mi_ranking_orders"],
        "qq_drift": queries["qq_drift_orders"],
        "tpch_q6": queries["tpch_q6_lineitem"],
        "running_zscore": queries["running_zscore_events"],
        "graph_triangles": queries["graph_triangles_lineitem"],
        "pagerank": queries["pagerank_lineitem"],
        "ann_recall": queries["ann_recall_embeddings"],
        "bootstrap_ci": queries["bootstrap_ci_orders"],
        "ab_test": queries["ab_test_orders"],
        "zipf_fit": queries["zipf_fit_documents"],
        "term_burstiness": queries["term_burstiness_documents"],
        "acf": queries["acf_events"],
        "neyman_allocation": queries["neyman_allocation_lineitem"],
        # round-3 fourth wave: the TPC-H-shaped join family (semi/anti,
        # snowflake, conditional ratio, HAVING-subquery) — join topology
        # coverage the q1/q3/q6 trio lacked
        "tpch_q4": queries["tpch_q4_semijoin"],
        "tpch_q5": queries["tpch_q5_regional"],
        "tpch_q7": queries["tpch_q7_nation_volume"],
        "tpch_q10": queries["tpch_q10_returns"],
        "tpch_q14": queries["tpch_q14_promo"],
        "tpch_q15": queries["tpch_q15_top_supplier"],
        "tpch_q18": queries["tpch_q18_large_orders"],
        "tpch_q22": queries["tpch_q22_antijoin"],
        "tpch_q2": queries["tpch_q2_min_cost_supplier"],
        "tpch_q8": queries["tpch_q8_market_share"],
        "tpch_q9": queries["tpch_q9_product_profit"],
        "tpch_q11": queries["tpch_q11_important_stock"],
        "tpch_q12": queries["tpch_q12_late_lines"],
        "tpch_q13": queries["tpch_q13_order_distribution"],
        "tpch_q16": queries["tpch_q16_supplier_count"],
        "tpch_q17": queries["tpch_q17_small_quantity"],
        "tpch_q19": queries["tpch_q19_disjunctive"],
        "tpch_q20": queries["tpch_q20_promo_suppliers"],
        "tpch_q21": queries["tpch_q21_waiting_orders"],
        # round-3 fifth wave: concentration/series/sketch/sparse-cosine
        "pareto": queries["pareto_concentration_orders"],
        "rolling_distinct": queries["rolling_distinct_users_events"],
        "ewma": queries["ewma_events"],
        "token_cosine": queries["token_cosine_pairs_documents"],
        "segment_overlap": queries["segment_overlap_events"],
        "table_checksum": queries["table_checksum_orders"],
        "cdc_apply": queries["cdc_apply_orders"],
        "theil_sen": queries["theil_sen_events"],
        "negative_sampling": queries["negative_sampling_documents"],
        "srm_check": queries["srm_check_customer"],
        "streaming_active_users": queries["streaming_active_users_events"],
        "matryoshka_eval": queries["matryoshka_eval_embeddings"],
        "ship_delay": queries["ship_delay_orders"],
        "minhash_recall": queries["minhash_recall_documents"],
        "layout_prune": queries["layout_prune_lineitem"],
        "balanced_sample": queries["balanced_sample_documents"],
        "zorder_layout": queries["zorder_layout_lineitem"],
        "woe": queries["woe_orders"],
        "target_encode": queries["target_encode_orders"],
        "blocking_report": queries["blocking_report_customer"],
        "km_survival": queries["km_survival_events"],
        "impute": queries["impute_lineitem"],
        "merge_intervals": queries["merge_intervals_orders"],
        "streaming_sliding_rate": queries["streaming_sliding_rate_events"],
        "rolling_distinct_hll": queries["rolling_distinct_hll_events"],
        "nearest_centroid": queries["nearest_centroid_embeddings"],
        "neyman_sample": queries["neyman_sample_lineitem"],
        "lateness_profile": queries["lateness_profile_events"],
        "wilson_ci": queries["wilson_ci_orders"],
        "concurrency_profile": queries["concurrency_profile_events"],
        "rank_movers": queries["rank_movers_events"],
        "apdex": queries["apdex_events"],
        "embedding_drift": queries["embedding_drift_embeddings"],
        "forecast_eval": queries["forecast_eval_events"],
        "lang_id_eval": queries["lang_id_eval_documents"],
        "dow_outliers": queries["dow_outliers_events"],
        "grouped_theil_sen": queries["grouped_theil_sen_events"],
        "jsd_drift": queries["jsd_drift_orders"],
        "cuped": queries["cuped_orders"],
        "calibration": queries["calibration_documents"],
        "adamic_adar": queries["adamic_adar_lineitem"],
        "funnel_timing": queries["funnel_timing_events"],
        "cms_heavy_hitters": queries["cms_heavy_hitters_events"],
        "kruskal_wallis": queries["kruskal_wallis_lineitem"],
        "levene": queries["levene_lineitem"],
        "interarrival": queries["interarrival_events"],
        "bot_score": queries["bot_score_events"],
        "heaps_law": queries["heaps_law_documents"],
        "bm25_search": queries["bm25_search_documents"],
        "hard_negatives": queries["hard_negatives_embeddings"],
        "rrf_hybrid": queries["rrf_hybrid_documents"],
        "simpson": queries["simpson_orders"],
        "retrieval_eval": queries["retrieval_eval_documents"],
        "variant_props_rollup": queries["variant_props_rollup_events"],
        "pysource_synth": queries["pysource_synth_rollup"],
        "udtf_trigrams": queries["udtf_trigrams_documents"],
        "drift_attribution": queries["drift_attribution_orders"],
        "file_report": queries["file_report_tables"],
        "l_diversity": queries["l_diversity_customer"],
        "t_closeness": queries["t_closeness_customer"],
        "activity_streaks": queries["activity_streaks_events"],
        "episode_pairs": queries["episode_pairs_events"],
        "weighted_median": queries["weighted_median_lineitem"],
        "conformal": queries["conformal_lineitem"],
        "deletion_preview": queries["deletion_preview_tables"],
        "qte": queries["qte_orders"],
        "mde": queries["mde_orders"],
        "eb_rates": queries["eb_rates_orders"],
        "seasonality_strength": queries["seasonality_strength_events"],
        # round 5: cross-document exact-substring family (Lee et al.
        # detection pass — hashed k-gram catalog + coverage rollup)
        "dup_spans": queries["dup_spans_documents"],
        "dup_span_coverage": queries["dup_span_coverage_documents"],
        # round 6: the removal pass consuming that catalog
        "substring_scrub": queries["substring_scrub_documents"],
        # round 6: recall@5-vs-n_probe curve, one scoring pass
        "ann_ivf_tuning": queries["ann_ivf_tuning_embeddings"],
        # round 6: training-vs-benchmark n-gram decontamination audit
        "decontamination": queries["decontamination_documents"],
        "encoding_artifacts": queries["encoding_artifacts_documents"],
        "attribution_decay": queries["attribution_decay_events"],
        "percentile_bands": queries["percentile_bands_events"],
        "nzv_screen": queries["nzv_screen_lineitem"],
    }

    # Warm the JVM/codegen, parquet-reader, and Python-worker paths once so
    # measured times reflect steady state, not first-job classloading:
    # limit-1 reads touch footers + the vectorized reader; the tiny
    # mapInPandas spawns the Arrow Python worker pool (reused by the
    # GEMM/minhash queries — cold spawn costs 5-15 s on a throttled VM and
    # is a per-session constant, not per-query work).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    from whiterrabbit_spark.io import read_parquet_table

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        read_parquet_table(spark, SF_DIR, t).limit(1).collect()

    def measure(fn) -> float:
        # Measurement-bug fix (r8, documented in OPTIMIZATION_r08.md):
        # several operators persist() intermediates for within-query
        # reuse, and Spark's CacheManager matches a LATER trial's
        # identical logical plan against the leaked cache entry — so
        # the second pass of a query was partially served from the
        # first pass's cache instead of computing from parquet
        # (measured: graph_triangles 1.3 s cache-served vs 5.6 s
        # honest). Clearing the cache BEFORE the timer keeps every
        # timed trial computing from the inputs; within-trial persists
        # (the legitimate reuse) are unaffected.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count() if hasattr(df, "count") else len(df)
        assert n >= 0
        return round(time.perf_counter() - t0, 3)

    # Two passes, keep the per-query minimum: single-shot numbers on this
    # shared-host VM carry multi-second hypervisor noise (BASELINE.md —
    # steady-state minima are the comparable figures).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    times: dict[str, float] = {}
    trials: dict[str, list[float]] = {}
    for _ in range(runs):
        for name, fn in bench.items():
            el = measure(fn)
            trials.setdefault(name, []).append(el)
            times[name] = min(times.get(name, el), el)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Mechanical round-over-round comparison (VERDICT r1 #9): per-query
    # baselines live in BENCH_BASELINE.json — prior-round repo-best plus
    # the BASELINE.md reference band.
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    try:
        with open(base_path) as fh:
            base = json.load(fh)
    except (OSError, ValueError):
        base = None

    # Noise-vs-regression separation (VERDICT r4 #5): in r4, 9 queries
    # exceeded the documented noise ceiling with ZERO code change —
    # two passes don't reliably dodge hypervisor stalls on this host.
    # Any query whose min still sits above 1.4x its repo-best gets up
    # to 3 extra trials (keep min); only a ratio that SURVIVES retries
    # is a candidate regression. Retry counts ship in the artifact so
    # the record distinguishes "was noisy, converged" from "real".
    retries: dict[str, int] = {}
    if base and base.get("sf") == sf_val:
        retry_ceiling = float(
            os.environ.get("SPARK_GRAFT_RETRY_RATIO", "1.4")
        )
        for name, fn in bench.items():
            ent = base["queries"].get(name)
            best = (ent or {}).get("best_s") or 0
            if best <= 0:
                continue
            extra = 0
            while times[name] / best > retry_ceiling and extra < 3:
                el = measure(fn)
                trials[name].append(el)
                times[name] = min(times[name], el)
                extra += 1
            if extra:
                retries[name] = extra

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "runs_per_query": runs,
        "retries": retries,
        # Per-query trial MEDIANS (ADVICE r5): the retry pass gives a
        # flagged query up to 5 chances at one lucky fast run — the min
        # alone can hide a genuine regression that "converged" on a
        # single outlier trial. The median over all trials keeps it
        # visible in the artifact.
        "trial_medians": {
            q: round(sorted(ts)[len(ts) // 2], 3)
            if len(ts) % 2
            else round((sorted(ts)[len(ts) // 2 - 1] + sorted(ts)[len(ts) // 2]) / 2, 3)
            for q, ts in trials.items()
        },
        "sf": sf_val,
    }

    # Emit the ratio vs repo-best for every query the baseline file
    # knows; after the retry pass, a ratio still past 1.4 is a
    # regression candidate, not noise. The file is only rewritten when
    # SPARK_GRAFT_UPDATE_BASELINE=1 (records new bests, keeps bands).
    if base and base.get("sf") == out["sf"]:
        ratios = {
            q: round(t / base["queries"][q]["best_s"], 2)
            for q, t in times.items()
            if q in base["queries"] and base["queries"][q]["best_s"] > 0
        }
        out["vs_repo_best"] = ratios
        if ratios:
            import math

            out["vs_repo_best_geomean"] = round(
                math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios)), 3
            )
        # Band-relative verdict (VERDICT r6 #7): vs_repo_best alone
        # false-alarms under uniform host drift (r6's 1.255 geomean
        # lift with zero code change). The driver's actual contract
        # anchor is the absolute BASELINE.md band, so record per query
        # where the measured time sits relative to it: "below" /
        # "in_band" / a ratio >1.0 of time over the band's upper edge.
        # Queries without a band (the post-baseline extensions) report
        # vs the 2x-of-repo-best contract bound instead.
        vs_band: dict[str, object] = {}
        band_ratios: list[float] = []
        for q, t in times.items():
            ent = base["queries"].get(q) or {}
            band = ent.get("baseline_band_s")
            if band:
                lo, hi = float(band[0]), float(band[1])
                if t < lo:
                    vs_band[q] = "below"
                elif t <= hi:
                    vs_band[q] = "in_band"
                else:
                    vs_band[q] = round(t / hi, 2)
                band_ratios.append(max(t / hi, 1e-9))
            elif ent.get("best_s"):
                bound = 2.0 * float(ent["best_s"])
                vs_band[q] = (
                    "in_2x_bound" if t <= bound else round(t / bound, 2)
                )
        out["vs_band"] = vs_band
        if band_ratios:
            import math

            out["vs_band_geomean"] = round(
                math.exp(
                    sum(math.log(r) for r in band_ratios)
                    / len(band_ratios)
                ),
                3,
            )
        if os.environ.get("SPARK_GRAFT_UPDATE_BASELINE") == "1":
            for q, t in times.items():
                ent = base["queries"].setdefault(
                    q, {"baseline_band_s": None, "best_s": t, "best_round": None}
                )
                if t < ent["best_s"]:
                    ent["best_s"] = t
            with open(base_path, "w") as fh:
                json.dump(base, fh, indent=1)

    # VERDICT r3 #8: the driver records only the tail of stdout, which
    # truncates the per-query seconds for large workloads. Persist the
    # full result JSON alongside the repo so every round's numbers are
    # auditable regardless of stdout capture limits.
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_OUT.json"
    )
    try:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    except OSError:
        pass

    # The PRINTED line is the driver's capture surface and its tail
    # buffer truncated a ~40 KB full-detail line in r7 (VERDICT r8 #5):
    # print only the contract keys ({metric, value, unit, queries, sf}
    # + run count); the audit detail (retries, trial medians, vs_repo
    # ratios, band verdicts) lives in BENCH_OUT.json above.
    slim = {
        k: out[k]
        for k in ("metric", "value", "unit", "queries", "runs_per_query", "sf")
    }
    print(json.dumps(slim))
    spark.stop()


if __name__ == "__main__":
    main()
