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
    # --- round-9 window ------------------------------------------------
    # (a) NEW this round (forward-safe: unregistered names are filtered).
    "q199_semdedup_auto",
    "q200_label_noise_auto",
    "q201_stream_disordered_tumbling",
    "q202_span_dup_profile",
    "q203_incremental_lsh_probe",
    "q204_source_divergence",
    "q205_join_skew_plan",
    "q206_tokenizer_fertility",
    "q207_centroid_drift",
    # (b) the whole 46-query cohort whose newest green driver row dates
    # to round 5 (newest-row histogram after r8: r8=50, r7=50, r6=50,
    # r5=46 — recomputed from CORRECTNESS_r0*.json, not COVERAGE.md).
    # Retiring these plus (a) makes every query's newest row ≤3 rounds
    # old again (r6 floor).
    "q04_order_priority",
    "q05_region_revenue",
    "q07_left_join_counts",
    "q08_anti_join",
    "q09_semi_join",
    "q10_full_outer",
    "q11_broadcast_brand",
    "q131_global_index",
    "q133_interval_islands",
    "q136_chisq_drift",
    "q138_auc_rank",
    "q139_ks_drift",
    "q13_cube",
    "q140_split_gain",
    "q141_bigram_perplexity",
    "q142_country_filter",
    "q14_window_topn",
    "q15_window_running",
    "q16_window_lag",
    "q17_window_rank_ntile",
    "q18_topk_orders",
    "q19_set_ops",
    "q20_distinct",
    "q21_string_funcs",
    "q22_date_funcs",
    "q23_null_handling",
    "q24_case_buckets",
    "q25_map_lookup",
    "q28_having",
    "q30_events_tumbling",
    "q31_events_sliding",
    "q32_events_session",
    "q36_exact_percentiles",
    "q41_lang_profile",
    "q42_fingerprint_dedup",
    "q44_quality_score",
    "q45_word_jaccard_pairs",
    "q46_regex_tokens",
    "q47_rolling_fingerprint",
    "q50_vector_norms",
    "q51_cosine_topk",
    # (c) r10-window head: the two operators registered after the 50-slot
    # r9 window filled (locally hash-proven at sf0.01 AND sf0.1 in r9),
    # then the five r5-stale rows the 9 in-window r9 registrations
    # displaced.
    "q208_pps_sample_audit",
    "q209_zipf_slope",
    "q52_knn_label_vote",
    "q53_minhash_near_dup",
    "q54_simhash",
    "q55_ivf_assign",
    "q56_cosine_near_dup",
    # (c) fill the last window slot with the first of the r6 cohort.
    "q143_fk_integrity",
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
