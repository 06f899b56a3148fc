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
    "q60_entregas_pipeline",
    "q61_entregas_quality_metrics",
    "q71_alto_valor_flag",
    "q57_multimodal_decode",
    "q58_asof_join",
    "q59_range_join",
    "q62_dedup_components",
    "q29_pivot",
    "q37_from_json",
    "q38_array_funcs",
    "q39_scalar_subquery",
    "q49_posexplode",
    "q63_deterministic_split",
    "q64_decontamination",
    "q66_chunking",
    "q67_stratified_sample",
    "q69_trailing_range_window",
    "q70_gap_fill_forward",
    "q65_statistical_moments",
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
    "q83_sessionization",
    "q84_funnel",
    "q85_repetition_profile",
    "q86_mixture_weights",
    "q87_expectation_audit",
    "q88_corpus_filter",
    "q89_heavy_hitters",
    "q90_denylist_scrub",
    "q91_exists_decorrelated",
    "q92_length_histogram",
    "q93_dedup_pipeline",
    "q94_scd2_intervals",
    "q95_partial_merge",
    "q98_cohort_retention",
    "q100_incremental_dedup",
    # round-1 hash-fails, re-verify after the CAST(... AS BIGINT) oracle fix
    "q27_conditional_agg",
    "q33_events_json",
    "q40_text_stats",
    "q43_langid_heuristic",
    "q68_int8_quantization",
    # positions 51+ — outside the 50-query driver window this round by
    # design (strong local evidence; first in line for the next round)
    "q96_map_funcs",
    "q97_explode_outer",
    "q99_rfm_segments",
]


def _ordered() -> list[str]:
    prio = [n for n in _PRIORITY if n in REGISTRY]
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
