"""Dump .explain('formatted') for named queries to plans/<outdir>/<name>_<tag>.txt.

Usage: python tools/plan_for.py <tag> <query> [more...]   (tag: before|after)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PLAN_OUT_DIR (default plans/r15)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("PLAN_OUT_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"))
    tag, names = sys.argv[1], sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.appName("plan_for")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_entregas_pyspark_spark import queries as q

    for name in names:
        df = q.REGISTRY[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
