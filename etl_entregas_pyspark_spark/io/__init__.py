from etl_entregas_pyspark_spark.io.readers import (
    read_csv_raw,
    read_parquet,
    read_table,
    load_star_schema,
)
from etl_entregas_pyspark_spark.io.writers import (
    write_partitioned,
    write_metrics_json,
)

__all__ = [
    "read_csv_raw",
    "read_parquet",
    "read_table",
    "load_star_schema",
    "write_partitioned",
    "write_metrics_json",
]
