"""Registry contract + fast oracle differential pass at sf0.001.

The heavyweight full run lives in tools/check_correctness.py (sf0.01);
this keeps a representative subset inside `pytest tests/` so the suite
alone proves the oracle contract end-to-end.
"""

import duckdb
import pytest

from etl_entregas_pyspark_spark import queries as q
from tests.conftest import SF_DIR

from tools.check_correctness import TABLES, canon_rows

SUBSET = [
    "q01_pricing_summary",
    "q05_region_revenue",
    "q14_window_topn",
    "q19_set_ops",
    "q30_events_tumbling",
    "q42_fingerprint_dedup",
    "q51_cosine_topk",
    "q53_minhash_near_dup",
    "q57_multimodal_decode",
    "q58_asof_join",
    "q59_range_join",
    "q63_deterministic_split",
    "q65_statistical_moments",
    "q60_entregas_pipeline",
    "q61_entregas_quality_metrics",
    "q71_alto_valor_flag",
    "q72_dedup_materialize",
    "q73_ivf_search",
    "q76_grouping_sets",
    "q78_tfidf_top_terms",
    "q82_sequence_packing",
    "q83_sessionization",
    "q85_repetition_profile",
    "q87_expectation_audit",
    "q88_corpus_filter",
    "q90_denylist_scrub",
    "q91_exists_decorrelated",
    "q93_dedup_pipeline",
    "q94_scd2_intervals",
    "q95_partial_merge",
    "q96_map_funcs",
    "q98_cohort_retention",
    "q99_rfm_segments",
    "q100_incremental_dedup",
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
    "q131_global_index",
    "q132_bloom_semi_join",
    "q133_interval_islands",
    "q134_pareto_skyline",
    "q135_power_iteration",
    "q136_chisq_drift",
    "q137_association_rules",
    "q202_span_dup_profile",
    "q203_incremental_lsh_probe",
]


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_registry_complete():
    assert len(q.REGISTRY) >= 45
    # every entry has a spark callable; oracle SQL for all but declared rows-only
    for name, spec in q.REGISTRY.items():
        assert callable(spec.spark), name
    assert set(SUBSET) <= set(q.REGISTRY)


def test_entry_contract():
    import __spark_entry__ as entry

    qs = entry.queries()
    osql = entry.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) == len(q.REGISTRY)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_match(spark, oracle, name):
    spec = q.REGISTRY[name]
    sdf = spec.spark(spark, SF_DIR)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = oracle.sql(spec.oracle)
    d_cols, d_rows = [d[0] for d in res.description], res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(d_cols, d_rows)


def test_no_complex_output_columns(spark):
    """The driver's canonicalizer sorts result columns with pandas, which
    cannot hash array/map/struct cells (q38/q96/q125 crashed rounds 2-3
    on this). Guard the WHOLE registry: every query's output schema must
    be scalar-only — serialize arrays with array_join/to_json instead."""
    bad = {}
    for name, spec in sorted(q.REGISTRY.items()):
        sdf = spec.spark(spark, SF_DIR)
        complex_cols = [
            f.name
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed output columns: {bad}"
