"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry
(etl_entregas_pyspark_spark.queries) — one entry per operator capability
from SURVEY.md §2 plus the north-star dedup/similarity/text surface, each
paired with the DuckDB oracle SQL it must hash-match.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_entregas_pyspark_spark import queries as q  # noqa: E402
from etl_entregas_pyspark_spark.session import tune_for_oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q60 is the reference's whole raison d'être (src/etl_entregas.py:92-518
    re-expressed as one declarative plan): CSV-grade quality ladder →
    filters → 28-column business projection."""
    tune_for_oracle(spark)
    return q.REGISTRY["q60_entregas_pipeline"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in q.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return q.all_oracle_sql()
