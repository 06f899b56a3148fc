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
    # --- round-5 window: the re-verification rotation ------------------
    # r4 was 50/50 green, but 43 queries' newest rows date to round 1
    # while round 4's diff touched their modules (VERDICT r4: stale-green
    # rot is real — q58/q59/q83 were green in r2-era code and red in r3).
    # This window = (a) the 3 queries whose code changed this round,
    # (b) all 43 round-1-stale queries, (c) the 4 new round-5 operators.
    # The 42 round-3-stale queries are the PLANNED ROUND-6 WINDOW; this
    # round they are locally re-proven by a full-registry
    # tools/check_correctness.py run (recorded in COVERAGE.md).
    # (a) changed this round: island tie-break, lazy global ids, NULLIF.
    "q131_global_index",
    "q133_interval_islands",
    "q136_chisq_drift",
    # (b) round-1-stale, in registration order.
    "q01_pricing_summary",
    "q06_global_agg",
    "q28_having",
    "q12_rollup",
    "q13_cube",
    "q03_top_orders",
    "q04_order_priority",
    "q05_region_revenue",
    "q07_left_join_counts",
    "q08_anti_join",
    "q09_semi_join",
    "q10_full_outer",
    "q11_broadcast_brand",
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
    # q26_math_funcs yields its slot to q142 (the r4 VERDICT's P6 gap —
    # a new query needs its FIRST row more than a stale-green needs a
    # refresh); q26 leads the round-6 window instead.
    "q50_vector_norms",
    "q51_cosine_topk",
    "q52_knn_label_vote",
    "q53_minhash_near_dup",
    "q54_simhash",
    "q55_ivf_assign",
    "q30_events_tumbling",
    "q31_events_sliding",
    "q32_events_session",
    "q41_lang_profile",
    "q42_fingerprint_dedup",
    "q44_quality_score",
    "q45_word_jaccard_pairs",
    "q36_exact_percentiles",
    "q46_regex_tokens",
    "q47_rolling_fingerprint",
    "q56_cosine_near_dup",
    # (c) new in round 5 (registered later this round; names not yet in
    # REGISTRY are filtered out, so this list is forward-safe).
    "q138_auc_rank",
    "q139_ks_drift",
    "q140_split_gain",
    "q141_bigram_perplexity",
    "q142_country_filter",
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
