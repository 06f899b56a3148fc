"""Out-of-order live replay (r7 verdict #4): deliver slices containing
events OLDER than the current watermark across trigger boundaries and
prove the state carries correctness under disorder — the scenario
watermarks exist for. STREAMING.md's state reports show *eviction*;
these tests show *admission/drop exactness*:

- the watermarked tumbling aggregation ADMITS late-within-watermark rows
  (they land in their true windows) and DROPS late-beyond-watermark rows
  (finalized windows never change), matching a batch recompute over
  exactly the admitted multiset;
- ``dropDuplicatesWithinWatermark`` keeps exactly-once under BOTH
  mechanisms: in-horizon re-deliveries die against dedup state,
  behind-horizon re-deliveries die as late rows — and genuinely new
  late-within-watermark events still emit exactly once;
- the ``applyInPandasWithState`` sliding-distinct operator, fronted by
  its documented watermark guard, survives a beyond-watermark slice
  (dropped before the state store) and arbitrary disorder WITHIN each
  micro-batch (its contract: per-key time-ordered triggers, unordered
  rows inside a trigger), emitting counts that match an independent
  pandas recompute over the admitted events.

Spark's split-watermark semantics (SPARK-42376, public behavior since
3.4): micro-batch N filters LATE rows with the watermark in effect
during batch N-1 (i.e. computed at the end of batch N-2), while state
EVICTION uses the batch-N-1 end watermark. The late slice therefore
arrives two triggers after the watermark-advancing slice — exactly how
a real out-of-order source would straggle — and the bulk is split in
two so the lagging late-filter watermark has caught up when it lands.

All replays are mtime-paced single-file triggers (q175's harness shape),
so "trigger boundary" is deterministic, not sleep-based.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.events import E
from etl_entregas_pyspark_spark.streaming import (
    dedup_stream,
    read_event_stream,
    start_memory_sink,
    tumbling_counts_stream,
)

_COLS = ["event_id", "user_id", "event_type", "ts", "value"]


def _write_slices(spark, out_dir: str, slices) -> None:
    """Write each slice DataFrame as ONE parquet file whose mtime encodes
    its delivery order (FileStreamSource triggers by mod time)."""
    import time

    base = time.time()
    for i, df in enumerate(slices):
        stage = os.path.join(out_dir, f"_stage{i}")
        df.select(*_COLS).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"slice{i}.parquet")
        os.rename(part, dst)
        os.utime(dst, (base + i, base + i))
        shutil.rmtree(stage, ignore_errors=True)


@pytest.fixture(scope="module")
def disorder(spark, sf_dir):
    """The shared disordered cut of the events table: A (days 1-10),
    B1/B2 (days 21-25 / 26-30 — the bulk, delivered before C in two
    triggers so the lagging late-filter watermark has passed C when it
    lands), C (days 11-20 — beyond-watermark late), and B2's max ts for
    building within-watermark late slices."""
    e = E(spark, sf_dir).localCheckpoint()
    a = e.filter(F.dayofmonth("ts") <= 10)
    b1 = e.filter((F.dayofmonth("ts") > 20) & (F.dayofmonth("ts") <= 25))
    b2 = e.filter(F.dayofmonth("ts") > 25)
    c = e.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20))
    max_b = b2.agg(F.max("ts")).collect()[0][0]
    return a, b1, b2, c, max_b


def test_tumbling_agg_admits_within_wm_drops_beyond_wm(spark, disorder):
    a, b1, b2, c, max_b = disorder
    # D: genuinely NEW late rows (fresh event_ids) inside the last 30
    # minutes of B2 — behind the max event time, but within the 1h
    # watermark when delivered two triggers later. They must be
    # ADMITTED into their true (already-open) windows.
    d = (
        b2.filter(F.col("ts") > F.lit(max_b) - F.expr("INTERVAL 30 MINUTES"))
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )
    assert d.count() > 0
    # E/E2: far-future sentinels. E drags the watermark past every
    # A/B/D window; E2 (one more trigger) makes that watermark the
    # EVICTION watermark, so append mode flushes them deterministically
    # without relying on no-data micro-batch timing.
    def _sentinel(days: int):
        return b2.orderBy(F.col("ts").desc()).limit(1).select(
            (F.col("event_id") + 20_000_000 + days).alias("event_id"),
            "user_id",
            "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            "value",
        )

    src = tempfile.mkdtemp(prefix="disorder_tumble_")
    sent1 = _sentinel(10)
    try:
        _write_slices(spark, src, [a, b1, b2, c, d, sent1, _sentinel(20)])
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = start_memory_sink(
            tumbling_counts_stream(stream, watermark="1 hour"),
            "disorder_tumble_sink",
            output_mode="append",
        )
        q.processAllAvailable()
        q.stop()
        # late-row drops actually happened in the C trigger (batch 3) —
        # the counter sits above the partial aggregate, so it counts
        # dropped (window, type) cells, not raw rows
        dropped = {
            p["batchId"]: p["stateOperators"][0]["numRowsDroppedByWatermark"]
            for p in q.recentProgress
            if p["stateOperators"]
        }
        assert dropped.get(3, 0) > 0 and c.count() > 0
        assert all(v == 0 for b, v in dropped.items() if b != 3)
        got = {
            (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
            for r in spark.table("disorder_tumble_sink").collect()
        }
        # expected: batch aggregation over EXACTLY the admitted multiset
        # A ∪ B ∪ D ∪ sentinel1 — C dropped as late; sentinel1's window
        # is flushed by sentinel2's watermark advance, while sentinel2's
        # own window is still open at shutdown and never emits
        admitted = (
            a.select(*_COLS)
            .unionAll(b1.select(*_COLS))
            .unionAll(b2.select(*_COLS))
            .unionAll(d.select(*_COLS))
            .unionAll(sent1.select(*_COLS))
        )
        want = {
            (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
            for r in admitted.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
            .collect()
        }
        assert got == want
        # the admission actually bit: D's windows differ from what A∪B
        # alone would have produced
        ab_only = {
            (r.window_start, r.event_type): r.n_events
            for r in a.unionAll(b1)
            .unionAll(b2)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n_events",
            )
            .collect()
        }
        assert any(ab_only.get(k) != v[0] for k, v in got.items())
        # ... and the drop bit too: C's days contributed zero windows
        assert not any(10 < k[0].day <= 20 for k in got)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_dedup_within_watermark_exactly_once_under_disorder(spark, disorder):
    a, b1, b2, c, max_b = disorder
    # R1: re-delivery of A rows AFTER the watermark passed them — must
    # die as late rows (the state that knew them may be long evicted).
    r1 = a.limit(40)
    # R2: re-delivery of B2's freshest rows — within the horizon, so
    # the dedup STATE itself must kill them.
    r2 = b2.filter(F.col("ts") > F.lit(max_b) - F.expr("INTERVAL 30 MINUTES"))
    # D: genuinely new late-but-within-watermark events — exactly once.
    d = r2.withColumn("event_id", F.col("event_id") + 10_000_000)
    assert r2.count() > 0
    src = tempfile.mkdtemp(prefix="disorder_dedup_")
    try:
        _write_slices(spark, src, [a, b1, b2, r1, r2, d])
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = start_memory_sink(
            dedup_stream(stream, watermark="1 hour"),
            "disorder_dedup_sink",
            output_mode="append",
        )
        q.processAllAvailable()
        q.stop()
        emitted = spark.table("disorder_dedup_sink")
        counts = {
            r.event_id: r.n
            for r in emitted.groupBy("event_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert counts and max(counts.values()) == 1  # exactly-once, everywhere
        want_ids = {
            r.event_id for r in a.unionAll(b1).unionAll(b2).unionAll(d).collect()
        }
        assert set(counts) == want_ids
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_sliding_distinct_guarded_by_watermark_under_disorder(spark, disorder):
    from etl_entregas_pyspark_spark.streaming.stateful import (
        streaming_sliding_distinct,
    )

    a, b1, b2, c, _ = disorder
    # jumble rows WITHIN each slice (the operator's contract allows any
    # intra-trigger order — it sorts by (ts, event_id) per batch)
    a_j = a.orderBy(F.md5(F.col("event_id").cast("string")))
    b1_j = b1.orderBy(F.md5(F.col("event_id").cast("string")))
    b2_j = b2.orderBy(F.md5(F.col("event_id").cast("string")))
    src = tempfile.mkdtemp(prefix="disorder_sliding_")
    try:
        _write_slices(spark, src, [a_j, b1_j, b2_j, c])
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        # the documented "watermark buffer in front": Spark does NOT
        # late-filter rows for arbitrary stateful ops, so the guard is
        # an upstream watermarked stateful stage — the dedup operator
        # doubles as the late-row gate (and exactly-once layer), which
        # is precisely the production front a change-log source needs
        guarded = dedup_stream(stream, watermark="1 hour")
        q = (
            streaming_sliding_distinct(guarded)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("disorder_sliding_sink")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            r.event_id: r.n_active_users
            for r in spark.table("disorder_sliding_sink").collect()
        }
        # independent pandas recompute over EXACTLY the admitted events
        # (A ∪ B): per event, distinct users of its type whose latest
        # event so far (time order, same-instant arrivals first) lies in
        # the trailing hour
        pdf = (
            a.unionAll(b1)
            .unionAll(b2)
            .select("event_id", "user_id", "event_type", "ts")
            .toPandas()
            .sort_values(["ts", "event_id"])
        )
        want = {}
        for _etype, grp in pdf.groupby("event_type"):
            last: dict[int, int] = {}
            recs = [
                (int(r.ts.value // 1000), int(r.event_id), int(r.user_id))
                for r in grp.itertuples(index=False)
            ]
            i, n = 0, len(recs)
            while i < n:
                t = recs[i][0]
                j = i
                while j < n and recs[j][0] == t:
                    last[recs[j][2]] = t
                    j += 1
                last = {
                    u: ts for u, ts in last.items() if ts >= t - 3600 * 1_000_000
                }
                for k in range(i, j):
                    want[recs[k][1]] = len(last)
                i = j
        assert got == want
        # the guard dropped the C slice before it could touch state
        c_ids = {r.event_id for r in c.select("event_id").collect()}
        assert c_ids and not (set(got) & c_ids)
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_enriched_agg_correct_under_disorder(spark, sf_dir, disorder):
    """q255's stream-STATIC enrichment under the shared disordered cut:
    the broadcast dimension join must not disturb watermark semantics —
    beyond-watermark rows drop, within-watermark late rows land in their
    true (window, segment) cells, and the emitted rows equal a batch
    recompute of the enrichment over exactly the admitted multiset."""
    from etl_entregas_pyspark_spark.streaming import enriched_counts_stream

    a, b1, b2, c, max_b = disorder
    d = (
        b2.filter(F.col("ts") > F.lit(max_b) - F.expr("INTERVAL 30 MINUTES"))
        .withColumn("event_id", F.col("event_id") + 10_000_000)
    )

    def _sentinel(days: int):
        return b2.orderBy(F.col("ts").desc()).limit(1).select(
            (F.col("event_id") + 20_000_000 + days).alias("event_id"),
            "user_id",
            "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            "value",
        )

    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    src = tempfile.mkdtemp(prefix="disorder_enrich_")
    sent1 = _sentinel(10)
    try:
        _write_slices(spark, src, [a, b1, b2, c, d, sent1, _sentinel(20)])
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        q = start_memory_sink(
            enriched_counts_stream(stream, dim, watermark="1 hour", exact_scale=6),
            "disorder_enrich_sink",
            output_mode="append",
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r.window_start, r.segment): (r.n_events, r.total_value)
            for r in spark.table("disorder_enrich_sink").collect()
        }
        admitted = (
            a.select(*_COLS)
            .unionAll(b1.select(*_COLS))
            .unionAll(b2.select(*_COLS))
            .unionAll(d.select(*_COLS))
            .unionAll(sent1.select(*_COLS))
        )
        qscale = float(10 ** 6)
        want = {
            (r.window_start, r.segment): (r.n_events, r.total_value)
            for r in admitted.join(F.broadcast(dim), "user_id")
            .groupBy(F.window("ts", "1 hour"), "segment")
            .agg(
                F.count("*").alias("n_events"),
                (
                    F.sum(F.floor(F.col("value") * F.lit(qscale)).cast("long")).cast("double")
                    / F.lit(qscale)
                ).alias("total_value"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                "segment",
                "n_events",
                "total_value",
            )
            .collect()
        }
        assert got == want and len(got) > 0
        # the drop bit: C's days contributed zero (window, segment) cells
        assert not any(10 < k[0].day <= 20 for k in got)
    finally:
        shutil.rmtree(src, ignore_errors=True)
