"""Live maintenance of the standing LSH band index (r9 VERDICT #8): the
streaming sink's epoch-fenced appends must converge to EXACTLY the table
the one-shot batch build writes, on a time-sliced replay of the same
corpus — closing the loop from live ingest to q210's standing-corpus
probe. Plus the exactly-once and routing guarantees the equivalence hash
cannot localize: re-delivered epochs are no-ops, uncommitted epochs are
invisible to readers, and candidate-level routing keeps verbatim
re-crawls out of the index."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_entregas_pyspark_spark.queries.lsh_index import (
    band_signatures,
    ensure_band_index,
)
from etl_entregas_pyspark_spark.queries.similarity import _BATCH_MOD
from etl_entregas_pyspark_spark.streaming.upsert_sink import (
    band_index_batch,
    read_band_index,
    start_band_index_sink,
)

DOCS_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % _BATCH_MOD != 0)
        .select("doc_id", "text")
    )


def _write_doc_slices(spark, out_dir, slices):
    base = time.time()
    for i, df in enumerate(slices):
        stage = os.path.join(out_dir, f"_stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(out_dir, f"slice{i}.parquet")
        os.rename(part, dst)
        os.utime(dst, (base + i, base + i))
        shutil.rmtree(stage, ignore_errors=True)


def _index_rows(spark, index_dir):
    df = read_band_index(spark, index_dir)
    assert df is not None
    return sorted(
        (r["doc_id"], r["band_id"], r["band_hash"]) for r in df.collect()
    )


def test_live_sink_converges_to_batch_built_index(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir).localCheckpoint()
    # three uneven slices partitioning the corpus exactly once
    slices = [
        corpus.filter(F.col("doc_id") % 9 < 3),
        corpus.filter((F.col("doc_id") % 9 >= 3) & (F.col("doc_id") % 9 < 7)),
        corpus.filter(F.col("doc_id") % 9 >= 7),
    ]
    src = str(tmp_path / "doc_slices")
    os.makedirs(src)
    _write_doc_slices(spark, src, slices)
    index_dir = str(tmp_path / "band_index")
    q = start_band_index_sink(
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        index_dir,
        str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    live = _index_rows(spark, index_dir)
    batch_path = ensure_band_index(spark, sf_dir)
    want = sorted(
        (r["doc_id"], r["band_id"], r["band_hash"])
        for r in spark.read.parquet(batch_path).collect()
    )
    assert live == want and len(live) > 0


def test_redelivered_epoch_appends_nothing(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir).limit(40).localCheckpoint()
    index_dir = str(tmp_path / "idx")
    assert band_index_batch(corpus, 0, index_dir) is True
    before = _index_rows(spark, index_dir)
    assert band_index_batch(corpus, 0, index_dir) is False  # re-delivery
    assert _index_rows(spark, index_dir) == before


def test_uncommitted_epoch_invisible_until_recommit(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir).localCheckpoint()
    first = corpus.limit(30)
    index_dir = str(tmp_path / "idx")
    assert band_index_batch(first, 0, index_dir)
    before = _index_rows(spark, index_dir)
    # simulate a crash between the epoch write and the pointer swing
    second = corpus.subtract(first).limit(20)
    band_signatures(second).write.mode("overwrite").parquet(
        os.path.join(index_dir, "epoch=1")
    )
    assert _index_rows(spark, index_dir) == before  # reader fences it out
    # recovery re-delivers epoch 1: overwrite + commit makes it visible
    assert band_index_batch(second, 1, index_dir)
    after = _index_rows(spark, index_dir)
    assert len(after) > len(before)


def test_route_dups_keeps_recrawls_out(spark, sf_dir, tmp_path):
    corpus = _corpus(spark, sf_dir).localCheckpoint()
    first = corpus.limit(30).localCheckpoint()
    index_dir = str(tmp_path / "idx")
    assert band_index_batch(first, 0, index_dir, route_dups=True)
    before = _index_rows(spark, index_dir)
    # epoch 1 re-crawls the same texts under fresh doc_ids: every doc
    # collides with the committed index and must be dropped
    recrawl = first.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    assert band_index_batch(recrawl, 1, index_dir, route_dups=True)
    assert _index_rows(spark, index_dir) == before
    # in-batch duplicate: two fresh copies of one NOT-yet-indexed text so
    # only the in-batch rule fires -> the smaller id wins
    fresh = corpus.subtract(first).limit(1)
    dup = fresh.select(
        (F.col("doc_id") + F.lit(20_000_001)).alias("doc_id"), "text"
    ).union(
        fresh.select(
            (F.col("doc_id") + F.lit(20_000_002)).alias("doc_id"), "text"
        )
    )
    assert band_index_batch(dup, 2, index_dir, route_dups=True)
    after = read_band_index(spark, index_dir)
    new_docs = sorted(
        r["doc_id"]
        for r in after.filter(F.col("doc_id") >= 20_000_000)
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert new_docs == [
        fresh.collect()[0]["doc_id"] + 20_000_001
    ]  # the smaller of the two copies


def test_compaction_preserves_rows_and_survives_crashes(spark, sf_dir, tmp_path):
    """Compaction folds the epoch directories into one base with the exact
    same row set; an absorbed epoch dir lingering after a crash
    mid-cleanup is fenced out by base_through_epoch; appends after
    compaction land next to the base and read as the union."""
    import shutil

    from etl_entregas_pyspark_spark.streaming.upsert_sink import (
        compact_band_index,
    )

    corpus = _corpus(spark, sf_dir).localCheckpoint()
    s0 = corpus.filter(F.col("doc_id") % 9 < 3)
    s1 = corpus.filter((F.col("doc_id") % 9 >= 3) & (F.col("doc_id") % 9 < 7))
    s2 = corpus.filter(F.col("doc_id") % 9 >= 7)
    index_dir = str(tmp_path / "idx")
    assert band_index_batch(s0, 0, index_dir)
    assert band_index_batch(s1, 1, index_dir)
    before = _index_rows(spark, index_dir)
    n = compact_band_index(spark, index_dir)
    assert n == len(before)
    assert _index_rows(spark, index_dir) == before
    assert not any(
        e.startswith("epoch=") for e in os.listdir(index_dir)
    )  # cleanup ran
    # crash mid-cleanup: resurrect an absorbed epoch dir — the reader
    # must fence it out (no double counting)
    band_signatures(s0).write.mode("overwrite").parquet(
        os.path.join(index_dir, "epoch=0")
    )
    assert _index_rows(spark, index_dir) == before
    shutil.rmtree(os.path.join(index_dir, "epoch=0"))
    # appends after compaction: union of base + new epoch
    assert band_index_batch(s2, 2, index_dir)
    after = _index_rows(spark, index_dir)
    assert len(after) > len(before)
    # and a SECOND compaction absorbs the new epoch + old base
    n2 = compact_band_index(spark, index_dir)
    assert n2 == len(after)
    assert _index_rows(spark, index_dir) == after
    dirs = [e for e in os.listdir(index_dir) if e.startswith(("base=", "epoch="))]
    assert dirs == ["base=v5"] or len(dirs) == 1  # exactly one base left
