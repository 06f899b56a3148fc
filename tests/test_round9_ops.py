"""Round-9 operators: the sqrt(n) IVF rule as model state (q199/q200).
The DuckDB oracles pin cross-engine values; these tests pin the
derivation itself — derived_k == ceil(sqrt(n)) at two scale points —
and that the auto plans are EXACTLY the fixed-K plans run at that K
(the derived valve changes where K comes from, not what it computes)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
def test_derived_k_equals_ceil_sqrt_n(spark, sf):
    """derived_k must equal ceil(sqrt(n)) at both scale points — the
    knob tracks corpus size with no constant anywhere in the plan."""
    from etl_entregas_pyspark_spark.queries.similarity import (
        q199_semdedup_auto,
        q200_label_noise_auto,
    )

    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    want_k = math.ceil(math.sqrt(n))
    ks = {r.derived_k for r in q199_semdedup_auto(spark, sf).select("derived_k").distinct().collect()}
    assert ks == {want_k}
    ks200 = {r.derived_k for r in q200_label_noise_auto(spark, sf).select("derived_k").distinct().collect()}
    assert ks200 <= {want_k}  # == when any row is flagged; empty flag set allowed


def test_auto_semdedup_is_fixed_k_at_derived_k(spark, sf_dir):
    """q199 == semdedup_prune(n_centroids=ceil(sqrt(n))): the derived
    valve only moves where K comes from."""
    from etl_entregas_pyspark_spark.queries.similarity import (
        q199_semdedup_auto,
        semdedup_prune,
    )

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    k = math.ceil(math.sqrt(n))
    cols = ["centroid_id", "n_members", "n_dropped", "kept_probe"]
    auto = _rows_set(q199_semdedup_auto(spark, sf_dir).select(*cols), cols)
    fixed = _rows_set(semdedup_prune(spark, sf_dir, n_centroids=k).select(*cols), cols)
    assert auto == fixed and len(auto) == k


def test_auto_label_noise_is_fixed_k_at_derived_k(spark, sf_dir):
    """q200's flag set == label_noise_flags(n_centroids=ceil(sqrt(n)))."""
    from etl_entregas_pyspark_spark.queries.similarity import (
        label_noise_flags,
        q200_label_noise_auto,
    )

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    k = math.ceil(math.sqrt(n))
    cols = ["vec_id", "label", "predicted_label", "n_votes"]
    auto = _rows_set(q200_label_noise_auto(spark, sf_dir).select(*cols), cols)
    fixed = _rows_set(label_noise_flags(spark, sf_dir, n_centroids=k).select(*cols), cols)
    assert auto == fixed


def test_derived_k_is_model_state_not_driver_state(spark, sf_dir):
    """The K derivation must live in the plan: no collect() anywhere —
    the 1-row K frame appears as a broadcast join input, and the physical
    plan carries the count->ceil(sqrt) aggregation itself."""
    from etl_entregas_pyspark_spark.queries.similarity import q199_semdedup_auto

    import re

    plan = q199_semdedup_auto(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # the centroid cutoff compares against the broadcast k_auto COLUMN,
    # not a folded literal — proof the K never touched the driver
    assert re.search(r"vec_id#\d+L? < k_auto#\d+L?", plan)
    assert "BroadcastExchange" in plan
    # and the K frame is the 1-row global aggregate, built in-plan
    assert re.search(r"HashAggregate\(keys=\[\], functions=\[count\(1\)\], output=\[k_auto#\d+", plan)
