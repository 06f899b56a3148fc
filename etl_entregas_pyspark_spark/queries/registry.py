"""Registry plumbing for the query corpus."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: Optional[str]  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = "") -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


# The driver's CORRECTNESS gate checks the first 50 queries in the order
# ``queries()`` yields them. Round 1 proved the relational/events/text/
# similarity/sketches battery green but left the flagship pipeline and the
# newest LLM-pipeline operators outside the window. This list pins the
# queries that still need (or just regained) driver verification to the
# front; everything else follows in registration order, so the window is
# always "all unproven queries + as many previously-proven as fit".
_PRIORITY = [
    # --- round-6 window ------------------------------------------------
    # (a) NEW this round (registered later in r6; unregistered names are
    # filtered out, so this list is forward-safe).
    "q150_bucketed_dedup_chain",
    "q151_stream_upsert_sink",
    "q152_setjoin_prefix_filter",
    "q153_sliding_distinct",
    "q154_calibration_bins",
    "q155_psi_drift",
    "q156_feature_matrix",
    "q157_negative_sampling",
    "q158_containment_join",
    "q159_linear_attribution",
    "q160_interval_overlap_join",
    "q161_proportional_allocation",
    "q162_bfs_levels",
    "q163_weighted_sample_noreplace",
    "q164_category_entropy",
    "q165_ab_proportion_test",
    "q166_golden_record",
    "q167_pmi_cooccurrence",
    "q168_geo_distance_join",
    "q169_hierarchy_rollup",
    "q170_rolling_corr",
    "q171_link_prediction",
    "q172_clamped_running_sum",
    # (b) the 7 round-5 operators with no driver row yet.
    "q143_fk_integrity",
    "q144_decay_score",
    "q145_count_min_sketch",
    "q146_last_touch_attribution",
    "q147_distinct_n",
    "q148_rrf_fusion",
    "q149_seasonal_anomaly",
    # (c) q26 yielded its r5 slot to q142; its newest row is round 1.
    "q26_math_funcs",
    # (d) the 42 queries whose newest driver row dates to round 3
    # (stale-green rotation — r4 proved rot is real). Any that overflow
    # the 50-query window roll to the round-7 rotation; all 147 are
    # locally re-proven each round by tools/check_correctness.py at
    # sf0.01 AND sf0.1 (recorded in COVERAGE.md).
    "q27_conditional_agg",
    "q29_pivot",
    "q33_events_json",
    "q37_from_json",
    "q39_scalar_subquery",
    "q40_text_stats",
    "q43_langid_heuristic",
    "q49_posexplode",
    "q57_multimodal_decode",
    "q62_dedup_components",
    "q63_deterministic_split",
    "q64_decontamination",
    "q65_statistical_moments",
    "q66_chunking",
    "q67_stratified_sample",
    "q68_int8_quantization",
    "q69_trailing_range_window",
    "q70_gap_fill_forward",
    "q71_alto_valor_flag",
    "q72_dedup_materialize",
    "q73_ivf_search",
    "q74_unpivot",
    "q75_kmeans_step",
    "q76_grouping_sets",
    "q77_edit_distance_pairs",
    "q78_tfidf_top_terms",
    "q79_salted_aggregate",
    "q80_latest_per_key",
    "q81_reconciliation",
    "q82_sequence_packing",
    "q84_funnel",
    "q85_repetition_profile",
    "q86_mixture_weights",
    "q87_expectation_audit",
    "q88_corpus_filter",
    "q89_heavy_hitters",
    "q90_denylist_scrub",
    "q91_exists_decorrelated",
    "q92_length_histogram",
    "q94_scd2_intervals",
    "q95_partial_merge",
    "q100_incremental_dedup",
]


def _ordered() -> list[str]:
    prio = list(dict.fromkeys(n for n in _PRIORITY if n in REGISTRY))
    rest = [n for n in REGISTRY if n not in set(prio)]
    return prio + rest


def all_queries() -> dict[str, SparkQuery]:
    return {name: REGISTRY[name].spark for name in _ordered()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
