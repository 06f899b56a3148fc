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
    # --- round-8 window ------------------------------------------------
    # (a) NEW this round (forward-safe: unregistered names are filtered).
    "q197_label_noise_scaled",
    "q198_triangles_adaptive_support",
    # (b) the 44 queries whose newest driver row dates to round 4 — the
    # whole remaining stale cohort (newest-row histogram after r7:
    # r7=50, r6=50, r5=50, r4=44). Retiring these makes every registry
    # query's newest driver row ≤3 rounds old again (r5 floor).
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
    "q124_hourly_churn",
    "q125_inverted_index",
    "q126_copurchase_triangles",
    "q127_quantile_bucketize",
    "q128_bm25_scoring",
    "q129_multimodal_embed",
    "q130_zorder_layout",
    "q132_bloom_semi_join",
    "q134_pareto_skyline",
    "q135_power_iteration",
    "q137_association_rules",
    # (c) fill the remaining window slots with the now-stalest round-5
    # rows (relational flagships first).
    "q01_pricing_summary",
    "q03_top_orders",
    "q06_global_agg",
    "q12_rollup",
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
