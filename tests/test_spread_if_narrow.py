"""spread_if_narrow: the split-aware replacement for the repo-wide
``.repartition(defaultParallelism, keys)``-after-read idiom (r15 VERDICT #1).

Contract under test:
- a SINGLE-split scan (every testdata parquet: one row group) still gets
  the spreading exchange, so local plans are unchanged;
- a scan that already arrives with >= defaultParallelism/2 partitions is
  returned AS-IS — no Exchange node is added, because at production scale
  that exchange is a full extra pass over the base table;
- results are identical either way (repartition never changes rows).
"""

import os

from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.relational import spread_if_narrow


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def _plan(df) -> str:
    # pre-execution physical plan (covers the AQE-wrapped initial plan)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_single_split_scan_still_spreads(spark, tmp_path):
    src = os.path.join(str(tmp_path), "narrow.parquet")
    spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    ).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    assert df.rdd.getNumPartitions() == 1
    out = spread_if_narrow(df, "doc_id")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    assert "Exchange hashpartitioning(doc_id" in _plan(out)
    assert out.count() == 1000


def test_wide_scan_skips_the_exchange(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    src = os.path.join(str(tmp_path), "wide.parquet")
    spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    ).repartition(target).write.parquet(src)
    df = spark.read.parquet(src)
    assert df.rdd.getNumPartitions() >= target / 2
    out = spread_if_narrow(df, "doc_id")
    # identical object: no exchange, no plan change at all
    assert out is df
    assert "Exchange" not in _plan(out)
    assert out.count() == 1000


def test_half_parallelism_input_is_wide_enough(spark, tmp_path):
    # gaining <2x parallelism never repays a full shuffle of the input:
    # an input at ceil(target/2) partitions is left alone
    target = spark.sparkContext.defaultParallelism
    half = max(1, (target + 1) // 2)
    src = os.path.join(str(tmp_path), "half.parquet")
    spark.range(0, 1000).select(F.col("id").alias("doc_id")).repartition(
        half
    ).write.parquet(src)
    df = spark.read.parquet(src)
    if df.rdd.getNumPartitions() * 2 >= target:
        assert spread_if_narrow(df, "doc_id") is df


def test_explicit_target_cap(spark, tmp_path):
    # Arrow-boundary sites cap their spread at the Python-worker budget
    src = os.path.join(str(tmp_path), "cap.parquet")
    spark.range(0, 100).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    out = spread_if_narrow(df, target=3)
    assert out.rdd.getNumPartitions() == 3
    wide = df.repartition(4)
    assert spread_if_narrow(wide, target=3) is wide
