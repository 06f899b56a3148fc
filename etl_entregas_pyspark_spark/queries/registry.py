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
# On-change-only tier (r10 VERDICT #2): demo baselines that exist to
# re-prove scaling laws already recorded in SCALE.md (their production
# twins q194/q196/q197 stay in rotation). They keep their registration,
# oracle, and pytest coverage, but are NOT re-enqueued for driver rows
# unless their code changes — shrinking the active rotation cycle.
_ON_CHANGE_ONLY = {
    "q171_link_prediction",
    "q182_semdedup",
    "q191_label_noise",
}

# The demo tier is exactly the set of registered queries MANUALLY omitted
# from _PRIORITY; the assert below (checked at import time, so every pytest
# and driver run trips it) keeps the set and the list from silently
# drifting apart (r11 ADVICE #4).

_PRIORITY = [
    # --- round-12 window (the r11 VERDICT #1 rotation plan) -------------
    # (a) NEW this round: IVF governance parity with the band index —
    # deletion propagation (r11 VERDICT #2) and the live-maintained
    # membership probe (r11 VERDICT #3), hash-green locally at
    # sf0.001/sf0.01/sf0.1 (COVERAGE.md round-12 section).
    "q227_ivf_deletion_propagation",
    "q228_live_ivf_probe",
    # (b) the r7-cohort tail (age 4 — the oldest evidence in the
    # registry; the 26-row head of that cohort re-proved in r11),
    # name-order, minus the on-change-only demos q182/q191.
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
    # (c) the oldest r8-cohort rows (age 3), name-order; 26 fit. The
    # cohort's remainder (q124_hourly_churn ... q99_rfm_segments, 24
    # rows) heads the r13 window together with whatever r12 registers
    # late.
    "q01_pricing_summary",
    "q03_top_orders",
    "q06_global_agg",
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
    "q112_winsorize",
    "q113_debounce_dedup",
    "q114_user_paths",
    "q115_pagerank",
    "q116_pii_redaction",
    "q117_vocab_coverage",
    "q118_basket_pairs",
    "q119_benford_audit",
    "q120_transition_matrix",
    "q121_mad_outliers",
    "q122_group_ols",
    "q123_weighted_sample",
]

assert _ON_CHANGE_ONLY.isdisjoint(_PRIORITY), (
    "on-change-only demo queries must not be enqueued for driver rows: "
    f"{sorted(_ON_CHANGE_ONLY.intersection(_PRIORITY))}"
)


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
