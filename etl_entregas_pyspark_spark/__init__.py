"""etl_entregas_pyspark_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the capabilities of the
reference ETL (estuardosc/etl-entregas-pyspark): configurable data-quality
rules, parametric filters, a derived-column expression library, partitioned
sinks and single-pass run metrics — generalized into composable DataFrame
operators, plus large-scale extensions (relational query corpus,
deduplication, similarity search, text analysis, multimodal columns,
structured streaming).

Design stance (SURVEY.md §7): declare logical plans with the DataFrame API,
let Catalyst/Tungsten pick physical strategies, zero custom Catalyst rules,
zero row-at-a-time Python UDFs on hot paths.
"""

from etl_entregas_pyspark_spark.config import deep_merge, load_config
from etl_entregas_pyspark_spark.session import build_session
from etl_entregas_pyspark_spark.operators.pipeline import EntregasPipeline
from etl_entregas_pyspark_spark.operators.skew import salted_aggregate, salted_broadcast_left
from etl_entregas_pyspark_spark.multimodal import decode_media, media_stats, sample_frames

__all__ = [
    "deep_merge",
    "load_config",
    "build_session",
    "EntregasPipeline",
    "salted_aggregate",
    "salted_broadcast_left",
    "decode_media",
    "media_stats",
    "sample_frames",
]

__version__ = "0.1.0"
