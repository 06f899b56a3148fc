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
    # --- round-7 window ------------------------------------------------
    # (a) NEW this round (forward-safe: unregistered names are filtered).
    "q173_link_prediction_capped",
    "q174_sliding_distinct_bucketed",
    "q175_stream_sliding_distinct",
    "q176_hll_sketch_rollup",
    "q177_jl_projection_topk",
    "q178_group_split",
    "q179_hard_negative_mining",
    "q180_contamination_score",
    "q181_balanced_resample",
    "q182_semdedup",
    "q183_phash_near_dup",
    "q184_rolling_psi",
    "q185_compaction_planner",
    "q186_cohens_kappa",
    "q187_merkle_partition_diff",
    "q188_pretrain_funnel",
    "q189_sketch_calibration",
    "q190_stratified_kfold",
    "q191_label_noise",
    "q192_lsh_recall_audit",
    "q193_epoch_shuffle",
    "q194_link_prediction_adaptive",
    "q195_source_overlap_matrix",
    "q196_semdedup_scaled",
    # (b) the 23 queries whose newest driver row dates to round 3 —
    # the last stale-green cohort (newest-row histogram after r6:
    # r6=50, r5=50, r4=47, r3=23). Retiring these makes every registry
    # query's newest driver row ≤3 rounds old.
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
    # (c) fill the remaining window slots with the stalest round-4 rows
    # (47 total; the rest roll to the round-8 rotation). Flagships q60/
    # q61 lead, then registration order.
    "q60_entregas_pipeline",
    "q61_entregas_quality_metrics",
    "q34_approx_distinct",
    "q35_approx_quantiles",
    "q38_array_funcs",
    "q58_asof_join",
    "q59_range_join",
    "q83_sessionization",
    "q93_dedup_pipeline",
    "q96_map_funcs",
    "q97_explode_outer",
    "q98_cohort_retention",
    "q99_rfm_segments",
    "q101_ohlc_bars",
    "q102_rolling_zscore",
    "q103_bigram_counts",
    "q104_cdc_apply",
    "q105_per_key_sample",
    "q106_kmeans_loop",
    "q107_skew_split_join",
    "q108_twap",
    "q109_minmax_scale",
    "q110_boilerplate_score",
    "q111_cluster_canonical",
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
