"""Isolated per-query timing: one session, warm-up, then N timed noop-sink
passes per named query (all steady-state, min and all samples printed).

Usage: python tools/isolate.py q216_stream_disordered_join [more...] [--passes=3]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = 3
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        else:
            names.append(a)
    spark = (
        SparkSession.builder.appName("isolate")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_entregas_pyspark_spark import queries as q

    out = {}
    for name in names:
        spec = q.REGISTRY[name]
        samples = []
        for i in range(passes + 1):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if i > 0:  # pass 0 is warm-up
                samples.append(dt)
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()  # bench.py's ContextCleaner hygiene
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
