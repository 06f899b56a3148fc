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
    # --- round-13 window (the r12 VERDICT #2 rotation plan) -------------
    # (a) NEW this round: the three instruments closing the IVF
    # lifecycle — deletion propagation RACING live ingest (q229, the
    # scrub→resume interleaving the r12 race fix documents), the nprobe
    # recall/cost sweep over the persisted inverted file (q230), the
    # centroid refresh + migration audit (q231, the retrain step) — plus
    # the SQ8 quantized-scan + exact-rescore probe (q232, FAISS's
    # IVF-SQ8+refine over the persisted inverted file) and the LSH
    # band-plan sweep (q233, q230's tuning instrument for the text
    # index), the refresh APPLY (q234 — the corpus re-bucketed into
    # a NEW persisted inverted file under q231's refreshed centroids,
    # probe-proven against a from-scratch oracle), and the band
    # RE-PLAN (q235 — persisted 12-int signature store, re-banded
    # 6x2 with zero re-shingling, candidate-sized verify), and the SQ8
    # shortlist-depth sweep (q236 — recall/cost per rescore budget
    # against the full-precision probe, q232's tuning instrument). All
    # hash-green locally at sf0.001/sf0.01/sf0.1 (COVERAGE.md,
    # "Verification freshness (rounds 12-13)" round-13 bullets).
    "q229_ivf_scrub_under_ingest",
    "q230_ivf_nprobe_sweep",
    "q231_ivf_centroid_refresh",
    "q232_ivf_sq8_rescore",
    "q233_lsh_band_plan_sweep",
    "q234_ivf_refresh_apply",
    "q235_lsh_replan_from_signatures",
    "q236_sq8_shortlist_sweep",
    # (b) the r8-cohort remainder (age 4 after the r12 rotation — the
    # oldest evidence in the registry; exactly the age-4 row set in
    # COVERAGE.md's regenerated freshness histogram), name-order.
    "q124_hourly_churn",
    "q125_inverted_index",
    "q126_copurchase_triangles",
    "q127_quantile_bucketize",
    "q128_bm25_scoring",
    "q129_multimodal_embed",
    "q12_rollup",
    "q130_zorder_layout",
    "q132_bloom_semi_join",
    "q134_pareto_skyline",
    "q135_power_iteration",
    "q137_association_rules",
    "q197_label_noise_scaled",
    "q198_triangles_adaptive_support",
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
    # (c) backfill to 50 from the r9 cohort (age 3), name-order; 18 fit
    # after the late q232–q236 registrations (the names below the
    # 50-cut stay listed so the r14 head is explicit). The cohort's
    # remainder (q16_window_lag ... q51_cosine_topk, 32 rows) heads the
    # r14 window together with whatever r14 registers.
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
    "q199_semdedup_auto",
    "q19_set_ops",
]

# checked at import time so every pytest and driver run trips it; an
# explicit raise, not an assert, so `python -O` cannot strip the guard
# (r12 ADVICE #4)
if not _ON_CHANGE_ONLY.isdisjoint(_PRIORITY):
    raise ValueError(
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
