"""Time-series operators (hypertable-style): range-frame trailing windows
and gap-filling with forward-fill — the rollup/regularization surface a
telemetry pipeline needs, all pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_entregas_pyspark_spark.queries.events import E
from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.queries.relational import T, _dsum_sql, dsum


@register(
    "q69_trailing_range_window",
    f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 10000.0 AS spend_30d,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL '30 days' PRECEDING AND CURRENT ROW
           ) AS n_orders_30d
    FROM orders
    """,
    doc="trailing 30-day RANGE window per customer (event-time frame, not "
    "row-count): rolling spend and order count — quantized sum keeps the "
    "rolling total deterministic",
)
def q69_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    # RANGE frames need a numeric ordering key: seconds since epoch
    day_s = 86400
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * day_s, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(F.floor(F.col("o_totalprice") * 10000.0).cast("long")).over(w).cast("double")
            / 10000.0
        ).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@register(
    "q70_gap_fill_forward",
    """
    WITH bounds AS (
        SELECT user_id,
               date_trunc('hour', MIN(ts)) AS first_h,
               date_trunc('hour', MAX(ts)) AS last_h
        FROM events WHERE user_id < 20 GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(generate_series(first_h, last_h, INTERVAL '1 hour')) AS hour_start
        FROM bounds
    ), hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS hour_value
        FROM events WHERE user_id < 20 GROUP BY 1, 2
    )
    SELECT g.user_id, g.hour_start,
           COALESCE(h.n_events, 0) AS n_events,
           last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour_start = h.hour_start
    """,
    doc="gap filling + forward fill: densify each user's hourly series over "
    "its own [min, max] span (sequence+explode grid, left join, "
    "last-ignorenulls carry-forward) — the regularization step before any "
    "rolling model feature",
)
def q70_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir).filter(F.col("user_id") < 20)
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("first_h"),
        F.date_trunc("hour", F.max("ts")).alias("last_h"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("first_h", "last_h", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    hourly = e.groupBy("user_id", hour.alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.floor(F.col("value") * 1000000.0).cast("long")).cast("double") / 1000000.0
        ).alias("hour_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            "hour_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )
