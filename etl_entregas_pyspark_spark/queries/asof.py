"""As-of join — the canonical "operator Spark lacks" implemented as a
composition of built-ins (union + tagged ordering + last-ignorenulls
window), exactly the pattern SURVEY §2.11 prescribes for custom operators:
no UDF, no mapPartitions, one shuffle on the join key.

Semantics: for every purchase event, the latest click of the same user
with ``click.ts`` strictly before ``purchase.ts`` (ties on ts broken by
sorting purchases before clicks, so an equal-timestamp click never
matches; among candidate clicks the winner is max(ts, event_id) —
fully deterministic, which a native ASOF JOIN does not guarantee under
duplicate timestamps).

Scale: the union is partitioned by user_id once; window state is a single
running struct per partition — linear, no point-in-time self-join blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_entregas_pyspark_spark.queries.events import E
from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.timeutil import epoch_us


@register(
    "q58_asof_join",
    """
    WITH u AS (
        SELECT user_id, ts, event_id, 0 AS kind FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, event_id, 1 AS kind FROM events WHERE event_type = 'click'
    ), m AS (
        SELECT user_id, ts, event_id, kind,
               last_value(CASE WHEN kind = 1 THEN struct_pack(cts := ts, cid := event_id) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lastclick
        FROM u
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           lastclick.cid AS click_id, lastclick.cts AS click_ts,
           epoch_us(ts) - epoch_us(lastclick.cts) AS gap_us
    FROM m WHERE kind = 0
    """,
    doc="as-of join: latest strictly-prior click per purchase (union + "
    "tagged ordering + last-ignorenulls window — deterministic under "
    "duplicate timestamps, single shuffle)",
)
def q58_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    u = purchases.unionAll(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastclick = F.last(
        F.when(F.col("kind") == 1, F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid"))),
        ignorenulls=True,
    ).over(w)
    return (
        u.select("user_id", "ts", "event_id", "kind", lastclick.alias("lastclick"))
        .filter(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("lastclick.cid").alias("click_id"),
            F.col("lastclick.cts").alias("click_ts"),
            (epoch_us("ts") - epoch_us("lastclick.cts")).alias("gap_us"),
        )
    )
