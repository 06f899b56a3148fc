from etl_entregas_pyspark_spark.operators.pipeline import EntregasPipeline

__all__ = ["EntregasPipeline"]
