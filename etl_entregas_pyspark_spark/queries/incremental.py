"""q151 — incremental CDC fold: the upsert sink's merge applied over
time-sliced chunks of the change log, value-checked against q104's
single-pass snapshot.

q104 proves the MERGE *semantics* (one batch recompute); this proves the
MERGE *mechanism a streaming sink actually runs*: the same
``merge_snapshot`` fold that ``streaming/upsert_sink.py`` executes per
micro-batch, applied here over four deterministic time slices. Both paths
share one implementation, so the DuckDB oracle on this query transitively
checks the live ``foreachBatch`` sink's arithmetic; the live path itself
(epoch fencing, versioned store, re-delivery no-op) is equivalence-tested
in ``tests/test_upsert_sink.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.events import E
from etl_entregas_pyspark_spark.queries.registry import register
from etl_entregas_pyspark_spark.streaming.upsert_sink import (
    merge_snapshot,
    snapshot_view,
)

# dayofmonth slice upper bounds — four uneven chunks, so chunk boundaries
# do not align with any window the data was generated over
_SLICES = [8, 15, 23, 31]


@register(
    "q151_stream_upsert_sink",
    """
    WITH log AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM events
    ), ranked AS (
        SELECT user_id, op, value, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
        FROM log
    )
    SELECT user_id, value AS current_value, ts AS updated_at, n_ops
    FROM ranked WHERE rn = 1 AND op = 'U'
    """,
    doc="the streaming upsert sink's merge-by-key fold, run incrementally "
    "over four time-sliced chunks of the event change log ('error' rows "
    "are DELETE tombstones, the rest upserts) and REQUIRED to reproduce "
    "q104's single-pass snapshot exactly — same oracle SQL. Per chunk: "
    "collapse to the last op per key by (ts, event_id), full-outer merge "
    "into the store keeping the (ts, event_id) winner, accumulate "
    "lifetime op counts; tombstoned keys stay with live=false so their "
    "history survives re-inserts. Each fold round is localCheckpoint-ed "
    "(constant lineage depth, like q62's propagation). This is "
    "Delta/Hudi MERGE INTO expressed as pure relational folds — the "
    "exactly-once foreachBatch sink in streaming/upsert_sink.py runs "
    "THIS code per micro-batch against a versioned, epoch-fenced "
    "parquet store. Plan per round: one key shuffle for the in-chunk "
    "collapse, reused by the merge join (same partitioning); at scale "
    "the store is bucketed on the key (q150's layout) so snapshot bytes "
    "never move.",
)
def q151_stream_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = E(spark, sf_dir)
    log = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    store: DataFrame | None = None
    lo = 0
    for hi in _SLICES:
        chunk = log.filter(
            (F.dayofmonth("ts") > lo) & (F.dayofmonth("ts") <= hi)
        )
        store = merge_snapshot(store, chunk).localCheckpoint()
        lo = hi
    return snapshot_view(store)


# ---------------------------------------------------------------------------
# q175 — the LIVE sliding-distinct stream, driver-checked end to end
# ---------------------------------------------------------------------------


@register(
    "q175_stream_sliding_distinct",
    """
    SELECT event_id, event_type, ts,
           CAST(COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY ts
               RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_active_users
    FROM events
    """,
    doc="the LIVE streaming concurrency metric, not a batch twin: the "
    "events table is replayed as four time-ordered micro-batches "
    "(dayofmonth slices, q151's chunking, paced by file mod-times) "
    "through a real readStream -> applyInPandasWithState "
    "(streaming_sliding_distinct) -> memory-sink query, and the emitted "
    "per-event trailing-1h DISTINCT-user counts must hash-match the "
    "same windowed COUNT(DISTINCT) oracle as q153/q174 — the state "
    "store (per type: users active within one lookback of the newest "
    "instant, pruned as time advances) must therefore carry the count "
    "EXACTLY across every trigger boundary. Complements q153 (batch "
    "interval sweep) and q174 (bucketed prefix sum) with the third "
    "execution mode a production metric needs: incremental, per-event, "
    "state ∝ active users. Arrow-batched stateful stage, whitelisted "
    "like the multimodal queries (Spark has no JVM-side per-event "
    "distinct-count-over-frame primitive to express this).",
)
def q175_stream_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import os
    import shutil
    import tempfile
    import time

    from etl_entregas_pyspark_spark.streaming.stateful import (
        streaming_sliding_distinct,
    )
    from etl_entregas_pyspark_spark.streaming.streams import read_event_stream

    src = tempfile.mkdtemp(prefix="q175_replay_")
    sink = "q175_sliding_distinct"
    try:
        e = E(spark, sf_dir)
        base_mtime = time.time()
        lo = 0
        for i, hi in enumerate(_SLICES):
            chunk = e.filter(
                (F.dayofmonth("ts") > lo) & (F.dayofmonth("ts") <= hi)
            )
            stage = os.path.join(src, f"_stage{i}")
            chunk.coalesce(1).write.mode("overwrite").parquet(stage)
            part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            dst = os.path.join(src, f"slice{i}.parquet")
            os.rename(part, dst)
            # FileStreamSource orders by modification time: stamp slices
            # with strictly increasing mtimes instead of sleeping
            os.utime(dst, (base_mtime + i, base_mtime + i))
            shutil.rmtree(stage, ignore_errors=True)
            lo = hi
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = (
            streaming_sliding_distinct(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # materialize off the transient memory sink so the returned frame
        # survives the next invocation's queryName reuse
        return spark.table(sink).localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)
