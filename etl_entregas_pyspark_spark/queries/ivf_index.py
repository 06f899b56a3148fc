"""q223 — the PERSISTED IVF inverted file: the vector-side twin of q210.

q73's ANN search has the right probe SHAPE (queries broadcast into a
centroid_id equi-join) but both its index sides — the centroids and the
candidate assignments — are recomputed from ``embeddings`` on every run.
At 100 TB the inverted file is a TABLE written once at ingest (FAISS's
IVF layout expressed as a parquet partition grid), and a probe touches
ONLY the partitions its nprobe buckets name: nothing corpus-sized is
re-assigned, and partition pruning keeps the scan at ~nprobe/C of the
corpus.

- ``ensure_ivf_index`` lays the layout down once per (session, sf_dir):
  the 8 centroids as a broadcastable side table and the candidate
  corpus's nearest-centroid assignment written ``partitionBy(
  centroid_id)`` — bucket = physical partition, the claim q73's
  docstring makes ("bucket = partition key at write time") now actually
  materialized and probed.
- ``q223_ivf_probe_persisted`` assigns the fresh query batch against the
  PERSISTED centroids, resolves the probed bucket ids (a ≤ C-row
  model-state pull, the q75/q207 centroid-frame discipline), reads only
  those ``centroid_id=`` partitions, and ranks — output and oracle are
  identical to q73, so the driver row proves persisted-vs-recompute
  equivalence exactly the way q210 proves it for the LSH band index.

The reference has no vector surface at all (SURVEY §2.11 north-star);
this closes the standing-index story for BOTH similarity families:
LSH/text (q210/q211/q221/q222) and IVF/embedding (q55/q73/q215/q223).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_entregas_pyspark_spark.queries.registry import REGISTRY, register
from etl_entregas_pyspark_spark.queries.relational import T
from etl_entregas_pyspark_spark.queries.similarity import (
    _IVF_TOPK,
    _NPROBE,
    dot,
    ivf_assign,
    ivf_centroids,
    sq_norm,
)

# test hook: (re)build count per index path — probes must never rebuild
IVF_INDEX_BUILDS: dict[str, int] = {}


def _ivf_index_path(spark: SparkSession, sf_dir: str) -> str:
    app_id = re.sub(r"[^A-Za-z0-9_]", "_", spark.sparkContext.applicationId)
    tag = re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.rstrip("/"))
    return os.path.join(tempfile.gettempdir(), f"ivf_index_{app_id}_{tag}")


def ensure_ivf_index(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> str:
    """Write the IVF inverted file once; return its root.

    Layout: ``centroids/`` (centroid_id, c_emb — the broadcastable side)
    and ``cand/centroid_id=<b>/`` (vec_id, embedding per bucket — one
    physical partition per inverted list). Idempotent per (session,
    sf_dir): gated on the candidate table's _SUCCESS marker, written
    LAST so a half-built index is rebuilt, never probed."""
    path = _ivf_index_path(spark, sf_dir)
    if not force and os.path.exists(
        os.path.join(path, "cand", "_SUCCESS")
    ):
        return path
    e = T(spark, sf_dir, "embeddings")
    cent = ivf_centroids(e)
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    (
        ivf_assign(e.filter(F.col("vec_id") >= 16), cent, keep=1)
        .drop("d2")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(os.path.join(path, "cand"))
    )
    IVF_INDEX_BUILDS[path] = IVF_INDEX_BUILDS.get(path, 0) + 1
    return path


@register(
    "q223_ivf_probe_persisted",
    REGISTRY["q73_ivf_search"].oracle,
    doc="q73's IVF ANN search with BOTH index sides read from the "
    "PERSISTED inverted file (ensure_ivf_index — centroids + "
    "partitionBy(centroid_id) candidate lists, written once per "
    "session/scale): the query batch is assigned fresh against the "
    "saved centroids (it is new data), the probed bucket ids resolve "
    "via a <= C-row model-state pull, and the candidate scan reads "
    "ONLY those centroid_id= partitions — static partition pruning, "
    "so per-probe cost is ~nprobe/C of the corpus with zero "
    "re-assignment. Output and oracle are identical to q73 (same "
    "top-k, same tie-breaks), so the two driver rows prove "
    "persisted-vs-recompute equivalence for the vector index exactly "
    "as q210/q203 prove it for the LSH band index; "
    "tests/test_round11_ops.py additionally pins result equality, "
    "index reuse across runs, the physical bucket layout, and the "
    "partition-pruned scan in the executed plan. Scale: the inverted "
    "file is the FAISS-IVF layout as a parquet partition grid — at "
    "100 TB the probe reads a handful of bucket partitions, and index "
    "maintenance is an append to the arriving vectors' buckets (the "
    "band-index epoch discipline applies unchanged).",
)
def q223_ivf_probe_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = ensure_ivf_index(spark, sf_dir)
    cent = spark.read.parquet(os.path.join(idx, "centroids"))
    e = T(spark, sf_dir, "embeddings")
    probes = (
        ivf_assign(
            e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16)),
            cent,
            _NPROBE,
        )
        .drop("d2")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            "centroid_id",
        )
        .localCheckpoint()
    )
    # <= C-row model-state pull: which inverted lists to open
    buckets = [
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    ]
    cand = spark.read.parquet(os.path.join(idx, "cand")).filter(
        F.col("centroid_id").isin(buckets)
    )
    cos = dot(F.col("q_emb"), F.col("embedding")) / (
        F.sqrt(sq_norm(F.col("q_emb"))) * F.sqrt(sq_norm(F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.join(F.broadcast(probes), "centroid_id")
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
        )
        .select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= _IVF_TOPK)
    )
