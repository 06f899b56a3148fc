"""Round-12 operators and advisory fixes.

Covers, as they land this round:
- the empty-micro-batch fix in ``upsert_batch_bucketed`` (r11 ADVICE #1:
  foreachBatch may deliver empty batches; the bucketed merge used to
  raise on ``repartition(0)``),
- the ``_ON_CHANGE_ONLY`` / ``_PRIORITY`` disjointness assert (ADVICE #4).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.streaming.upsert_sink import (
    _read_pointer,
    read_bucketed_snapshot,
    snapshot_view,
    upsert_batch_bucketed,
)


def _log(spark, sf_dir, n=24):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
        .orderBy("event_id")
        .limit(n)
    )


def _rows(df):
    return sorted(
        (r.user_id, round(r.current_value, 6), r.n_ops) for r in df.collect()
    )


class TestEmptyMicroBatch:
    def test_empty_batch_fences_epoch_without_touching_store(
        self, spark, sf_dir, tmp_path
    ):
        snap = str(tmp_path / "snap")
        batch0 = _log(spark, sf_dir).localCheckpoint()
        assert upsert_batch_bucketed(batch0, 0, snap) is True
        ptr0 = _read_pointer(snap)
        before = _rows(snapshot_view(read_bucketed_snapshot(spark, snap)))

        empty = batch0.filter(F.lit(False))
        # must not raise (repartition(0) used to), and must COMMIT epoch 1
        assert upsert_batch_bucketed(empty, 1, snap) is True
        ptr1 = _read_pointer(snap)
        assert ptr1["epoch"] == 1
        assert ptr1["version"] == ptr0["version"]  # no new version dirs
        assert ptr1["buckets"] == ptr0["buckets"]  # manifest unchanged
        assert _rows(snapshot_view(read_bucketed_snapshot(spark, snap))) == before
        # no stray staging/bucket dirs appeared
        assert not any(
            e.startswith("_staging") for e in os.listdir(snap)
        )

        # the fenced empty epoch is a no-op on re-delivery
        assert upsert_batch_bucketed(empty, 1, snap) is False
        # and the stream continues: a later non-empty epoch still applies
        batch2 = _log(spark, sf_dir, n=48).subtract(batch0).localCheckpoint()
        assert batch2.count() > 0
        assert upsert_batch_bucketed(batch2, 2, snap) is True
        assert _read_pointer(snap)["epoch"] == 2
        after = _rows(snapshot_view(read_bucketed_snapshot(spark, snap)))
        assert after != before


class TestRegistryDemoTier:
    def test_on_change_only_disjoint_from_priority(self):
        from etl_entregas_pyspark_spark.queries.registry import (
            _ON_CHANGE_ONLY,
            _PRIORITY,
        )

        assert _ON_CHANGE_ONLY.isdisjoint(_PRIORITY)
