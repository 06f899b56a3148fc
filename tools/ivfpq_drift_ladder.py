"""IVF-PQ drift-and-recovery ladder: inject embedding drift into the
arriving slice, watch q248's audit flag it, run q249's refresh, and
measure what the retrain buys back.

Per rung (a per-dimension shift DELTA applied to the arrived slice,
vec_id % 5 == 0 of the corpus — q243's batch convention):

  - audit_ratio: mean of q248's per-subspace drift_ratio (frozen
    codebook; ~1 at delta=0, grows with drift — the retrain trigger),
  - qerr_arrived frozen vs refreshed: the arrived epoch's mean residual
    quantization error under the frozen codebook vs after q249's one
    Lloyd step (the error the refresh exists to remove),
  - recall@3 of the REGISTERED q242 (frozen) and q249 (refreshed)
    probes against the brute-force truth on the same drifted layout —
    the user-visible number that degrades silently and recovers.

Prints one JSON line; recorded in SCALE.md ("Round 15").

Usage: python tools/ivfpq_drift_ladder.py [--clustered] [delta ...]
       (default deltas 0 0.25 0.5; --clustered sharpens the fixture into
        per-label clusters first — the recipe behind SCALE.md r15's 9.18
        audit reading)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _recall(approx_rows, truth: set) -> float:
    hits = sum(1 for r in approx_rows if (r.query_id, r.neighbor_id) in truth)
    return round(hits / max(1, len(truth)), 4)


def _arrived_qerr(spark: SparkSession, sf_dir: str, idx_root: str) -> float:
    """Mean residual quantization error of the ARRIVED slice under the
    artifacts at ``idx_root`` (frozen or refreshed — same layout)."""
    from etl_entregas_pyspark_spark.queries.ivf_index import (
        _PQ_SUB,
        _VEC_BATCH_MOD,
    )

    cent = spark.read.parquet(os.path.join(idx_root, "centroids"))
    cb = spark.read.parquet(os.path.join(idx_root, "codebook"))
    stored = (
        spark.read.parquet(os.path.join(idx_root, "cand"))
        .filter(F.col("vec_id") % _VEC_BATCH_MOD == 0)
        .select(
            "vec_id",
            F.col("centroid_id").cast("long").alias("centroid_id"),
            "codes",
        )
    )
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rv = F.zip_with(
        "embedding", "c_emb", lambda x, y: x.cast("double") - y.cast("double")
    )
    resid = (
        stored.join(e, "vec_id")
        .join(F.broadcast(cent), "centroid_id")
        .select("vec_id", "codes", rv.alias("rv"))
    )
    sub = resid.select(
        F.posexplode(F.col("codes").cast("array<int>")).alias("m", "k"), "rv"
    ).select(
        "m", "k", F.expr(f"slice(rv, m * {_PQ_SUB} + 1, {_PQ_SUB})").alias("sv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cw", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return round(
        sub.join(F.broadcast(cb), ["m", "k"]).agg(F.avg(d2)).first()[0], 6
    )


def _rung(spark: SparkSession, delta: float, clustered: bool = False) -> dict:
    from etl_entregas_pyspark_spark.queries.ivf_index import (
        _IVF_TOPK,
        _VEC_BATCH_MOD,
        ensure_ivfpq_index,
        ensure_refreshed_ivfpq_index,
        q242_ivfpq_search,
        q248_ivfpq_drift_audit,
        q249_ivfpq_refresh_apply,
    )
    from etl_entregas_pyspark_spark.queries.similarity import dot, sq_norm
    from pyspark.sql.window import Window

    out_dir = tempfile.mkdtemp(prefix=f"ivfpq_drift_{delta}_")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    if clustered:
        # --clustered: sharpen the fixture into per-label clusters
        # (label l spikes dims [8l..8l+8), isotropic noise shrunk 4x)
        # BEFORE injecting drift — residuals then carry real structure,
        # which is where the audit's contrast is sharpest (SCALE.md r15
        # records ratio 9.18 at delta 0.5 vs 1.61 isotropic)
        lab = F.col("label")
        e = e.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: (
                    x * 0.25
                    + F.when(
                        (i >= lab * 8) & (i < lab * 8 + 8), F.lit(1.0)
                    ).otherwise(F.lit(0.0))
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
    drifted = F.when(
        (F.col("vec_id") >= 16) & (F.col("vec_id") % _VEC_BATCH_MOD == 0),
        F.transform("embedding", lambda x: (x + F.lit(float(delta))).cast("float")),
    ).otherwise(F.col("embedding"))
    e.select("vec_id", drifted.alias("embedding"), "label").repartition(
        32
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    audit = q248_ivfpq_drift_audit(spark, out_dir).collect()
    ratio = round(sum(r.drift_ratio for r in audit) / len(audit), 4)

    # brute-force truth on the drifted layout
    ed = spark.read.parquet(f"{out_dir}/embeddings.parquet")
    corpus = ed.filter(F.col("vec_id") >= 16)
    qset = ed.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
    cos = dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(sq_norm(F.col("q_emb"))) * F.sqrt(sq_norm(F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in (
            corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
            .crossJoin(
                F.broadcast(
                    qset.select(
                        F.col("vec_id").alias("query_id"),
                        F.col("embedding").alias("q_emb"),
                    )
                )
            )
            .select("query_id", "neighbor_id", cos.alias("cosine"))
            .select("*", F.row_number().over(w).alias("xr"))
            .filter(F.col("xr") <= _IVF_TOPK)
            .collect()
        )
    }
    frozen_rows = q242_ivfpq_search(spark, out_dir).collect()
    refreshed_rows = q249_ivfpq_refresh_apply(spark, out_dir).collect()
    rung = {
        "delta": delta,
        "audit_ratio": ratio,
        "qerr_arrived_frozen": _arrived_qerr(
            spark, out_dir, ensure_ivfpq_index(spark, out_dir)
        ),
        "qerr_arrived_refreshed": _arrived_qerr(
            spark, out_dir, ensure_refreshed_ivfpq_index(spark, out_dir)
        ),
        "recall_frozen": _recall(frozen_rows, truth),
        "recall_refreshed": _recall(refreshed_rows, truth),
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    return rung


def main() -> None:
    clustered = "--clustered" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--clustered"]
    deltas = [float(a) for a in args] or [0.0, 0.25, 0.5]
    spark = (
        SparkSession.builder.appName("ivfpq-drift-ladder")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = [_rung(spark, d, clustered=clustered) for d in deltas]
    print(json.dumps({"drift_ladder": out, "clustered": clustered}))
    spark.stop()


if __name__ == "__main__":
    main()
