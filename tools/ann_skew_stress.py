"""ANN probe-path skew stress: what happens to the q73 IVF probe when one
centroid bucket goes HOT (real corpora are never balanced — a dominant
content cluster can own most of the inverted file).

Builds a replicated embedding set (default 256× sf0.1 = 512k vectors) in
two layouts:
  - balanced: replicas keep the original spread across the 8 centroids;
  - skewed:   ~90% of vectors are pulled toward centroid 0's position
              (new = c0 + 0.01·old, elementwise), so one bucket holds
              ~90% of the corpus.

Then ranks probe candidates top-k per query two ways:
  - window:  q73's row_number() over (query_id) — one partition per
             query; a query probing the hot bucket sorts ~90% of the
             corpus in one task. AQE does NOT split window exchanges
             (skew handling covers sort-merge joins only), so this is
             the shape that cliffs.
  - salted:  two-stage top-k — partial top-k per (query_id, salt mod 32)
             via sort_array(collect_list(struct))[1:k] (map-side
             combinable), then the tiny 32·k-per-query merge through the
             same window. Identical results, bounded task size.

Prints one JSON line with bucket histograms, wall times, and an
equality check between the two rankings. Recorded in SCALE.md
("ANN probe under centroid skew").

Usage: python tools/ann_skew_stress.py [replicas=256]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SRC = "/root/testdata/sf0.1"
KEY_STRIDE = 100_000_000
_TOPK = 5
_NPROBE = 2
_SALTS = 32


def _build(spark: SparkSession, replicas: int, skewed: bool) -> DataFrame:
    from etl_entregas_pyspark_spark.queries.similarity import ivf_centroids

    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    c0 = [
        float(x)
        for x in ivf_centroids(e).filter(F.col("centroid_id") == 0).collect()[0].c_emb
    ]
    rep = spark.range(replicas).select(F.col("id").alias("r"))
    out = e.crossJoin(rep).select(
        (F.col("vec_id") + F.col("r") * KEY_STRIDE).alias("vec_id"),
        "embedding",
    )
    if skewed:
        lit_c0 = F.array(*[F.lit(x) for x in c0])
        pulled = F.transform(
            F.zip_with(lit_c0, F.col("embedding"), lambda c, x: c + x * F.lit(0.01)),
            lambda x: x.cast("float"),
        )
        out = out.select(
            "vec_id",
            F.when(F.col("vec_id") % 10 != 0, pulled)
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    return out.repartition(64, "vec_id").localCheckpoint()


def _scored(spark: SparkSession, vecs: DataFrame) -> tuple[DataFrame, dict]:
    from etl_entregas_pyspark_spark.queries.similarity import (
        dot,
        ivf_assign,
        ivf_centroids,
        sq_norm,
    )

    base = spark.read.parquet(f"{SRC}/embeddings.parquet")
    cent = ivf_centroids(base)  # the 8 fixed reference centroids
    cand = ivf_assign(vecs.filter(F.col("vec_id") >= 16), cent, 1).drop("d2")
    hist = {
        str(r.centroid_id): r.n
        for r in cand.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    probes = (
        ivf_assign(
            base.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)),
            cent,
            _NPROBE,
        )
        .drop("d2")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "centroid_id",
        )
    )
    cos = dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(sq_norm(F.col("q_emb"))) * F.sqrt(sq_norm(F.col("embedding")))
    )
    scored = cand.join(F.broadcast(probes), "centroid_id").select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    return scored, hist


def _rank_window(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.select("*", F.row_number().over(w).alias("rank")).filter(
        F.col("rank") <= _TOPK
    )


def _rank_salted(scored: DataFrame) -> DataFrame:
    # struct(cosine DESC, -neighbor ASC): sort_array desc on the struct
    # gives exactly the window's (cosine desc, neighbor_id asc) order
    item = F.struct(
        F.col("cosine").alias("c"), (-F.col("neighbor_id")).alias("nn")
    )
    partial = (
        scored.withColumn("salt", F.pmod(F.col("neighbor_id"), F.lit(_SALTS)))
        .groupBy("query_id", "salt")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(item), asc=False), 1, _TOPK
            ).alias("top")
        )
    )
    merged = partial.select(
        "query_id", F.explode("top").alias("t")
    ).select(
        "query_id",
        (-F.col("t.nn")).alias("neighbor_id"),
        F.col("t.c").alias("cosine"),
    )
    return _rank_window(merged)


def _run(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    spark = (
        SparkSession.builder.appName("ann-skew-stress")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {"replicas": replicas, "layouts": {}}
    for label in ("balanced", "skewed"):
        vecs = _build(spark, replicas, skewed=(label == "skewed"))
        scored, hist = _scored(spark, vecs)
        total = sum(hist.values())
        times = {}
        for variant, fn in (("window", _rank_window), ("salted", _rank_salted)):
            fn(scored).write.format("noop").mode("overwrite").save()  # warm
            times[variant] = min(_run(fn(scored)) for _ in range(2))
        a = {
            (r.query_id, r.rank): r.neighbor_id
            for r in _rank_window(scored).collect()
        }
        b = {
            (r.query_id, r.rank): r.neighbor_id
            for r in _rank_salted(scored).collect()
        }
        rec["layouts"][label] = {
            "n_vectors": total,
            "max_bucket_share": round(max(hist.values()) / total, 3),
            "wall_sec": times,
            "rankings_equal": a == b,
        }
        vecs.unpersist()
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
