"""Bucketed-write co-location: identically bucketed tables must join with
ZERO exchanges (the 100 TB fact-fact join strategy in SCALE.md)."""

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.io.writers import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, path=str(base / "o"))
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, path=str(base / "l"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle_exchange(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    # force the sort-merge path (locally the tables are broadcast-sized;
    # at the design scale both sides are far beyond any broadcast budget)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_orders).join(spark.table(t_lineitem), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_shuffled(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    bucketed = (
        spark.table(t_orders)
        .join(spark.table(t_lineitem), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_dedup_reps_join_saves_exchange(spark, sf_dir, tmp_path):
    """q150's corpus-side join contract: the doc_id-bucketed documents
    table feeds the reps-selection join with NO exchange above its scan —
    the same join over plain parquet needs one more Exchange. (The grp
    side always shuffles: it is the derived distinct-content summary.)"""
    from etl_entregas_pyspark_spark.io.writers import write_bucketed

    spark.sql("DROP TABLE IF EXISTS b_docs_test")
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_bucketed(raw, "b_docs_test", ["doc_id"], 8,
                   path=str(tmp_path / "docs"), sort_cols=["doc_id"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def reps_plan(docs):
            grp = (
                docs.select("doc_id", F.md5(F.lower(F.col("text"))).alias("fp"))
                .groupBy("fp")
                .agg(F.min("doc_id").alias("rep_id"))
            )
            reps = docs.join(grp.select(F.col("rep_id").alias("doc_id")), "doc_id")
            return reps._jdf.queryExecution().executedPlan().toString()

        bucketed = reps_plan(spark.table("b_docs_test"))
        plain = reps_plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_docs_test")
    assert "Bucketed: true" in bucketed
    n_bucketed = bucketed.count("Exchange hashpartitioning")
    n_plain = plain.count("Exchange hashpartitioning")
    assert n_bucketed == n_plain - 1, (n_bucketed, n_plain, bucketed[:2000])
