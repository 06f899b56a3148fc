"""ANN engine-chooser growth ladder: q250's decision as the corpus grows.

Replicates sf0.1's embeddings R× with shifted vec_ids (ivfpq_ladder's
layout recipe: originals keep their ids so the seed/query conventions
hold), writes a testdata-shaped dir, and runs the REGISTERED
q250_ann_engine_choice on it per rung — the chosen engine, every
engine's admission footprint vs the declared serving budget, and the
measured recall column the choice consumed. The claim under test is the
FLIP: at small n every engine fits and the fidelity tie-break picks
full precision; one decade up the float footprint crosses the budget
and int8 wins; another decade and only the PQ engines fit.

Prints one JSON line; recorded in SCALE.md ("Round 15").

Usage: python tools/ann_chooser_ladder.py [replicas ...]  (default 1 64 256)
"""

from __future__ import annotations

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


def _rung(spark: SparkSession, replicas: int) -> dict:
    from etl_entregas_pyspark_spark.queries.ivf_index import (
        _ANN_BUDGET_BYTES,
        q250_ann_engine_choice,
    )

    out_dir = tempfile.mkdtemp(prefix=f"ann_chooser_{replicas}x_")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
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
    t0 = time.time()
    rows = q250_ann_engine_choice(spark, out_dir).collect()
    wall = round(time.time() - t0, 1)
    chosen = [r.engine for r in rows if r.chosen == 1]
    rung = {
        "replicas": replicas,
        "n_vectors": rows[0].n_vectors,
        "budget_bytes": _ANN_BUDGET_BYTES,
        "chosen": chosen[0] if chosen else None,
        "wall_s": wall,
        "engines": {
            r.engine: {
                "index_bytes": r.index_bytes,
                "fits": int(r.fits_budget),
                "recall": round(r.recall_at_k, 4),
            }
            for r in rows
        },
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    return rung


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [1, 64, 256]
    spark = (
        SparkSession.builder.appName("ann-chooser-ladder")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = [_rung(spark, r) for r in rungs]
    print(json.dumps({"chooser_ladder": out}))
    spark.stop()


if __name__ == "__main__":
    main()
