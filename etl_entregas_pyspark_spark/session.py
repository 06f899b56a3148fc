"""SparkSession construction from config (reference ``src/etl_entregas.py:64-78``
shape: app name + master + arbitrary ``spark.*`` key/values), with
scale-oriented defaults the reference lacks:

- AQE on (runtime coalescing, skew-join splitting) — essential at 100 TB.
- UTC session timezone so timestamp semantics are cluster-invariant and
  match the DuckDB correctness oracle.
- Arrow enabled for any pandas-interop path (vectorized UDF batches).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import SparkSession

SCALE_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128m split targets keep scan partitions executor-memory-friendly; at
    # 100 TB this yields ~800k input splits which Spark schedules fine.
    "spark.sql.files.maxPartitionBytes": "134217728",
}


def build_session(config: Mapping[str, Any] | None = None) -> SparkSession:
    spark_cfg: Mapping[str, Any] = (config or {}).get("spark", {})
    builder = (
        SparkSession.builder.appName(str(spark_cfg.get("app_name", "etl_entregas_pyspark_spark")))
        .master(str(spark_cfg.get("master", "local[*]")))
    )
    merged = dict(SCALE_DEFAULTS)
    merged.update({str(k): str(v) for k, v in (spark_cfg.get("configs") or {}).items()})
    for key, value in merged.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    level = spark_cfg.get("log_level")
    if level:
        spark.sparkContext.setLogLevel(str(level))
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Runtime-settable conf for deterministic, oracle-comparable output on a
    session we did not build (the driver hands us one). Timezone pins the
    few session-tz-sensitive casts; AQE/Arrow are free performance on the
    driver's session and never change results."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
