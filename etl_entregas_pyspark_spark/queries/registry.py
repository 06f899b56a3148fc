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
    # --- round-14 window (the r13 registry plan executed: new r14
    # registrations first, then the full r9-cohort remainder — the
    # oldest evidence in the registry after the r13 rotation — then
    # backfill to 50 from the r10 cohort) ------------------------------
    # (a) NEW this round: the LSH band-bucket size VALVE proven at the
    # driver gate on a degenerate replica corpus (q237 — the workload
    # class r13 VERDICT weak #2 said would OOM the un-valved pair grid;
    # the oracle mirrors the derived-cap + dup-class-star semantics so
    # both engines must agree on cap, valved bucket count, and pair
    # set), the derived IVF centroid count (q238 — C = f(corpus)
    # model state, cross-engine formula sync), and the un-valved demo
    # baseline (q239 — prices the valve; enters the demo tier once its
    # first driver row lands), plus the PQ/ADC family (q240 — product
    # quantization search: 4-bit-per-subspace codes, per-query LUT,
    # vectors never enter the scan; q241 — its k_factor rescore-budget
    # sweep against brute-force truth), and the session-2 batch: the
    # IVF-PQ composition (q242 — residual PQ codes persisted per
    # centroid partition, both prunings composed; q243 — its
    # frozen-codebook ingest proven at the probe; q245 — its forget
    # probe), the four-engine ANN decision matrix (q244), and
    # index-derived semantic decontamination (q246).
    "q237_lsh_bucket_valve",
    "q238_ivf_centroid_plan",
    "q239_lsh_valve_off_demo",
    "q240_pq_adc_search",
    "q241_pq_shortlist_sweep",
    "q242_ivfpq_search",
    "q243_ivfpq_ingest_probe",
    "q244_ann_engine_matrix",
    "q245_ivfpq_forget_probe",
    "q246_semantic_decontamination",
    "q247_length_bucket_plan",
    # (b) the r9-cohort remainder (age 5 — exactly the last=r9 rows in
    # the CORRECTNESS_r1..r13 union, minus the on-change-only demos),
    # name-order.
    "q16_window_lag",
    "q17_window_rank_ntile",
    "q18_topk_orders",
    "q199_semdedup_auto",
    "q19_set_ops",
    "q200_label_noise_auto",
    "q201_stream_disordered_tumbling",
    "q202_span_dup_profile",
    "q203_incremental_lsh_probe",
    "q204_source_divergence",
    "q205_join_skew_plan",
    "q206_tokenizer_fertility",
    "q207_centroid_drift",
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
    # (c) backfill to 50 from the r10 cohort (age 4), name-order; with
    # the session-2 registrations the r14 head grew to ELEVEN new rows
    # (q237–q247), so only 7 of these fit the 50-cut — the cut lands
    # after q149_seasonal_anomaly, and q150_bucketed_dedup_chain …
    # q160_interval_overlap_join below it spill to the r15 head (the
    # r10 cohort's remainder q156 … q99 continues there).
    "q143_fk_integrity",
    "q144_decay_score",
    "q145_count_min_sketch",
    "q146_last_touch_attribution",
    "q147_distinct_n",
    "q148_rrf_fusion",
    "q149_seasonal_anomaly",
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
