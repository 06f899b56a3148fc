"""IVF-PQ growth ladder: probe wall + index bytes as the corpus grows.

Replicates sf0.1's embeddings R× with shifted vec_ids (original rows
keep their ids, so the vec_id<C seed-centroid and 8..16 query
conventions hold; derived C grows with n per ivf_centroid_count),
writes the layout as a testdata-shaped dir, builds BOTH persisted
indexes on it (`ensure_ivf_index` full-precision+SQ8 and
`ensure_ivfpq_index` codes-only), and measures per rung:

  - q223 probe wall (full-precision partition-pruned scan),
  - q242 probe wall (partition-pruned codes-only ADC scan + rescore),
  - candidate-file bytes each probe's admission CAN read (parquet
    footer sums: vec_id+embedding vs vec_id+codes),
  - derived C and the probed-partition row fraction.

Prints one JSON line; recorded in SCALE.md ("Round-14 session 2").

Usage: python tools/ivfpq_ladder.py [replicas [replicas ...]]  (default 1 64 256)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_STRIDE = 10_000_000


def _column_kb(root: str) -> dict[str, float]:
    import pyarrow.parquet as pq

    tot: dict[str, float] = {}
    for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                top = c.path_in_schema.split(".")[0]
                tot[top] = tot.get(top, 0.0) + c.total_compressed_size
    return {k: round(v / 1024, 1) for k, v in tot.items()}


def _rung(spark: SparkSession, replicas: int) -> dict:
    from etl_entregas_pyspark_spark.queries.ivf_index import (
        ensure_ivf_index,
        ensure_ivfpq_index,
        q223_ivf_probe_persisted,
        q242_ivfpq_search,
    )
    from etl_entregas_pyspark_spark.queries.similarity import (
        ivf_centroid_count,
    )

    out_dir = tempfile.mkdtemp(prefix=f"ivfpq_ladder_{replicas}x_")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    # replica id-shifts must not collide with source ids — a SRC larger
    # than the stride would silently alias vec_ids across replicas and
    # corrupt every downstream count (r15 ADVICE #4)
    src_max = e.agg(F.max("vec_id")).first()[0]
    if src_max >= KEY_STRIDE:
        raise SystemExit(
            f"max(vec_id)={src_max} >= KEY_STRIDE={KEY_STRIDE}: raise the stride"
        )
    rep = spark.range(replicas).select(F.col("id").alias("r"))
    (
        e.crossJoin(rep)
        .select(
            (F.col("vec_id") + F.col("r") * KEY_STRIDE).alias("vec_id"),
            "embedding",
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )
    n = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
    row: dict = {"replicas": replicas, "n_vectors": n, "derived_c": ivf_centroid_count(n)}

    t0 = time.time()
    idx_full = ensure_ivf_index(spark, out_dir)
    row["build_full_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    idx_pq = ensure_ivfpq_index(spark, out_dir)
    row["build_pq_s"] = round(time.time() - t0, 1)

    kb_full = _column_kb(os.path.join(idx_full, "cand"))
    kb_pq = _column_kb(os.path.join(idx_pq, "cand"))
    row["full_scan_kb"] = round(
        kb_full.get("vec_id", 0) + kb_full.get("embedding", 0), 1
    )
    row["sq8_scan_kb"] = round(
        kb_full.get("vec_id", 0) + kb_full.get("codes", 0), 1
    )
    row["pq_scan_kb"] = round(kb_pq.get("vec_id", 0) + kb_pq.get("codes", 0), 1)

    t0 = time.time()
    n223 = q223_ivf_probe_persisted(spark, out_dir).count()
    row["q223_wall_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    n242 = q242_ivfpq_search(spark, out_dir).count()
    row["q242_wall_s"] = round(time.time() - t0, 2)
    row["rows_223"], row["rows_242"] = n223, n242

    # probed fraction: rows in the probed partitions / corpus
    from etl_entregas_pyspark_spark.queries.ivf_index import _ivfpq_admission

    probes, scored = _ivfpq_admission(spark, out_dir)
    probed_pairs = scored.count()
    # derive the denominator from the layout itself instead of baking in
    # the 8-query window and 16 reserved seed rows (r15 ADVICE #4): the
    # query set is whatever _ivfpq_admission actually probed, the corpus
    # is the written layout's vec_id >= 16 slice (the index convention)
    n_q = probes.select("query_id").distinct().count()
    n_corpus = (
        spark.read.parquet(f"{out_dir}/embeddings.parquet")
        .filter(F.col("vec_id") >= 16)
        .count()
    )
    row["scan_frac"] = round(probed_pairs / (n_q * n_corpus), 4)
    shutil.rmtree(out_dir, ignore_errors=True)
    return row


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1, 64, 256]
    spark = (
        SparkSession.builder.appName("ivfpq-ladder")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = [_rung(spark, r) for r in rungs]
    print(json.dumps({"ladder": out}))
    spark.stop()


if __name__ == "__main__":
    main()
