"""Streaming equivalence: the Structured Streaming pipelines must produce
exactly the batch F.window results (the oracle-checked q30–q32 semantics)
once the whole input is processed."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.events import E
from etl_entregas_pyspark_spark.streaming import (
    read_event_stream,
    sessionized_stream,
    start_memory_sink,
    tumbling_counts_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Events parquet rewritten with micros timestamps in 4 files, so the
    file stream source has several micro-batches to chew through."""
    out = tempfile.mkdtemp(prefix="events_stream_")
    E(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _run_to_completion(stream_df, name):
    q = start_memory_sink(stream_df, name, output_mode="complete")
    q.processAllAvailable()
    q.stop()


def test_tumbling_stream_matches_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    _run_to_completion(tumbling_counts_stream(stream), "tumbling_sink")

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "total_value")
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in spark.table("tumbling_sink").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_session_stream_matches_batch(spark, events_dir):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    _run_to_completion(sessionized_stream(stream), "session_sink")

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("session_window.start").alias("session_start"), "n_events")
    )
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.table("session_sink").collect()
    }
    want = {(r.user_id, r.session_start): r.n_events for r in batch.collect()}
    assert got == want


def test_watermark_bounds_state(spark, events_dir):
    """Append-mode with a watermark emits only finalized windows — the
    state-bounding behavior that keeps the operator viable on an unbounded
    stream."""
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    agg = tumbling_counts_stream(stream, watermark="1 hour")
    q = start_memory_sink(agg, "wm_sink", output_mode="append")
    q.processAllAvailable()
    q.stop()
    emitted = spark.table("wm_sink")
    # every emitted window must be strictly older than max(ts) - watermark
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).collect()[0][0]
    for r in emitted.collect():
        assert r.window_start < max_ts


def test_stream_dedup_drops_redelivered_events(spark, events_dir, tmp_path_factory):
    """Duplicate the input files (simulated redelivery): the deduped stream
    must contain each event_id exactly once."""
    import shutil as _sh, glob, os
    dup_dir = str(tmp_path_factory.mktemp("events_dup"))
    for i, f in enumerate(glob.glob(f"{events_dir}/part-*.parquet")):
        _sh.copy(f, os.path.join(dup_dir, f"a{i}.parquet"))
        _sh.copy(f, os.path.join(dup_dir, f"b{i}.parquet"))  # redelivery

    from etl_entregas_pyspark_spark.streaming import dedup_stream
    stream = read_event_stream(spark, dup_dir, max_files_per_trigger=2)
    # watermark must cover the full replay horizon: files aren't
    # time-ordered here, so a short watermark would (correctly) drop
    # old-but-new events as late arrivals
    q = start_memory_sink(
        dedup_stream(stream, watermark="30 days"), "dedup_sink", output_mode="append"
    )
    q.processAllAvailable()
    q.stop()

    emitted = spark.table("dedup_sink")
    n_unique = spark.read.parquet(events_dir).select("event_id").distinct().count()
    assert emitted.count() == n_unique
    assert emitted.select("event_id").distinct().count() == n_unique


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Two watermarked streams joined on user + trailing time range must
    produce exactly the batch join's pairs once both streams drain."""
    from etl_entregas_pyspark_spark.streaming import stream_stream_join

    left = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    right = read_event_stream(spark, events_dir, max_files_per_trigger=2)
    q = start_memory_sink(
        stream_stream_join(left, right), "ssj_sink", output_mode="append"
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.l_id, r.r_id) for r in spark.table("ssj_sink").select("l_id", "r_id").collect()
    }

    batch = spark.read.parquet(events_dir)
    l = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("l_user"), F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts")
    )
    r = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"), F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts")
    )
    want = {
        (row.l_id, row.r_id)
        for row in l.join(
            r,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("r_ts") < F.col("l_ts")),
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_enriched_stream_matches_batch_twin(spark, events_dir, sf_dir):
    """q255's live form: stream-static broadcast enrichment + windowed
    aggregation over a real readStream equals the registered batch twin
    once the input drains — including a mid-replay outcome-identical
    path (the static side re-resolves per micro-batch)."""
    from etl_entregas_pyspark_spark.queries.events import (
        q255_stream_static_enrich,
    )
    from etl_entregas_pyspark_spark.streaming import enriched_counts_stream

    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    # exact_scale matches the batch twin's dsum quantization, so the
    # comparison is exact rather than float-noise-tolerant
    _run_to_completion(
        enriched_counts_stream(stream, dim, exact_scale=6), "enriched_sink"
    )
    got = {
        (r.window_start, r.segment): (r.n_events, round(r.total_value, 6))
        for r in spark.table("enriched_sink").collect()
    }
    want = {
        (r.window_start, r.segment): (r.n_events, round(r.total_value, 6))
        for r in q255_stream_static_enrich(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


@pytest.fixture(scope="module")
def docs_dir(spark, sf_dir):
    """Documents parquet rewritten in 4 files so the admission gate sees
    several micro-batches."""
    out = tempfile.mkdtemp(prefix="docs_stream_")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_admission_ledger_matches_batch_twin_and_is_exactly_once(
    spark, docs_dir, sf_dir
):
    """q263's live form: the per-source admission ledger accumulated
    across micro-batches equals the registered batch twin once the
    stream drains, and a re-delivered epoch is a no-op (exactly-once)."""
    from etl_entregas_pyspark_spark.queries.datasplit import (
        _BENCH_DOCS,
        _gram_stream,
        q263_admission_ledger,
    )
    from etl_entregas_pyspark_spark.streaming import (
        admission_batch,
        read_admission_ledger,
        start_admission_sink,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench_grams = (
        _gram_stream(docs.filter(F.col("doc_id") < _BENCH_DOCS))
        .select("gram")
        .distinct()
        .localCheckpoint()
    )
    ledger_dir = tempfile.mkdtemp(prefix="admission_ledger_")
    ckpt = tempfile.mkdtemp(prefix="admission_ckpt_")
    try:
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(docs_dir)
            .filter(F.col("doc_id") >= _BENCH_DOCS)
        )
        q = start_admission_sink(stream, bench_grams, ledger_dir, ckpt)
        q.processAllAvailable()
        q.stop()
        got = {
            r.source: (r.n_docs, r.n_quarantined)
            for r in read_admission_ledger(spark, ledger_dir).collect()
        }
        want = {
            r.source: (r.n_docs, r.n_quarantined)
            for r in q263_admission_ledger(spark, sf_dir).collect()
        }
        assert got == want and len(got) > 0
        # exactly-once: re-delivering an already-committed epoch must be
        # skipped and leave the ledger byte-identical
        batch = docs.filter(F.col("doc_id") >= _BENCH_DOCS)
        assert admission_batch(batch, 0, bench_grams, ledger_dir) is False
        again = {
            r.source: (r.n_docs, r.n_quarantined)
            for r in read_admission_ledger(spark, ledger_dir).collect()
        }
        assert again == want
    finally:
        shutil.rmtree(ledger_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
