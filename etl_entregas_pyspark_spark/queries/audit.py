"""Declarative data-quality expectation audit (Deequ/Great-Expectations
style), the warehouse-grade generalization of the reference's quality
ladder (reference ``src/etl_entregas.py:128-169`` counts nulls /
invalid types / duplicates while cleaning; an expectation audit states
the contract up front and verifies the whole table in one pass).

Every check is folded into a single global aggregate (plus one
key-grouped aggregate for the uniqueness check), so the audit costs one
scan + one partial-aggregated exchange regardless of table size; the
check fan-out happens AFTER aggregation on a one-row frame via
``stack`` — no per-check scans, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, _rnd_sql, rnd


@register(
    "q87_expectation_audit",
    f"""
    WITH m AS (
        SELECT COUNT(*) AS n,
               COUNT(l_orderkey) AS n_ok,
               MIN(l_quantity) AS min_q,
               MAX(l_quantity) AS max_q,
               CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_flag,
               MIN(l_extendedprice) AS min_price
        FROM lineitem
    ), d AS (
        SELECT CAST(SUM(c - 1) AS BIGINT) AS n_dup
        FROM (SELECT COUNT(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    )
    SELECT * FROM (
        SELECT 'completeness_l_orderkey' AS check_name,
               {_rnd_sql('CAST(n_ok AS DOUBLE) / n', 6)} AS value,
               n_ok = n AS passed FROM m
        UNION ALL
        SELECT 'range_l_quantity_1_50', CAST(max_q AS DOUBLE),
               min_q >= 1 AND max_q <= 50 FROM m
        UNION ALL
        SELECT 'domain_l_returnflag', CAST(n_bad_flag AS DOUBLE),
               n_bad_flag = 0 FROM m
        UNION ALL
        SELECT 'unique_orderkey_linenumber', CAST(n_dup AS DOUBLE),
               n_dup = 0 FROM d
        UNION ALL
        SELECT 'non_negative_l_extendedprice', min_price,
               min_price >= 0.0 FROM m
    )
    """,
    doc="single-pass expectation audit over lineitem: completeness, "
    "numeric range, categorical domain, composite-key uniqueness, "
    "non-negativity — five declared contracts verified with ONE table "
    "scan folded into a global aggregate (uniqueness adds one "
    "key-grouped aggregate whose exchange carries pre-combined "
    "(key, count) rows). The five result rows are stacked from the "
    "one-row metric frames, so check count never multiplies scan count.",
)
def q87_expectation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count("*").alias("n"),
        F.count("l_orderkey").alias("n_ok"),
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).cast("bigint").alias("n_bad_flag"),
        F.min("l_extendedprice").alias("min_price"),
    )
    d = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") - 1).cast("bigint").alias("n_dup"))
    )
    one = m.crossJoin(F.broadcast(d)).select(
        "*", rnd(F.col("n_ok").cast("double") / F.col("n"), 6).alias("completeness")
    )
    return one.select(
        F.expr(
            """stack(5,
            'completeness_l_orderkey', completeness, n_ok = n,
            'range_l_quantity_1_50', CAST(max_q AS DOUBLE),
                min_q >= 1 AND max_q <= 50,
            'domain_l_returnflag', CAST(n_bad_flag AS DOUBLE), n_bad_flag = 0,
            'unique_orderkey_linenumber', CAST(n_dup AS DOUBLE), n_dup = 0,
            'non_negative_l_extendedprice', min_price, min_price >= 0.0d
            ) AS (check_name, value, passed)"""
        )
    )
