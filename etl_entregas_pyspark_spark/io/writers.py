"""Sinks.

The reference's sink collects the whole dataset to the driver and loops
``toPandas().to_csv`` per partition key (``src/etl_entregas.py:469-518``) —
a driver-memory cliff at scale (SURVEY §4.3). Here the write is fully
distributed: ``partitionBy`` produces identical Hive-style
``fecha_proceso=<v>/`` directories with zero driver data movement, at any
number of keys and any data size.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    base_path: str,
    partition_cols: list[str] | None = None,
    fmt: str = "csv",
    mode: str = "overwrite",
    header: bool = True,
    cluster: bool = True,
) -> None:
    """``cluster=True`` hash-repartitions on the partition keys before the
    write, so each output directory gets files from only the tasks owning
    that key instead of one file per (task × key) — without it a 200-task
    stage writing 1000 keys emits up to 200k small files. AQE coalescing
    still caps the per-key file count when a key is small."""
    if cluster and partition_cols:
        df = df.repartition(*[df[c] for c in partition_cols])
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if fmt == "csv":
        writer.option("header", str(header).lower()).csv(base_path)
    elif fmt == "parquet":
        writer.parquet(base_path)
    elif fmt == "json":
        writer.json(base_path)
    elif fmt == "orc":
        writer.orc(base_path)
    else:
        raise ValueError(f"unsupported sink format: {fmt!r}")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    fmt: str = "parquet",
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table write (``bucketBy`` requires the table catalog, not a
    bare path). Two tables bucketed identically on their join key join
    WITHOUT a shuffle — at 100 TB that removes the dominant exchange from
    every fact-fact join that repeats the key (see SCALE.md, Joins).
    Sorted buckets additionally drop the sort from sort-merge joins."""
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_metrics_json(metrics: Mapping[str, Any], path: str) -> None:
    """Driver-side metrics JSON (reference ``main.py:233-238``)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(dict(metrics), indent=2, default=str))
