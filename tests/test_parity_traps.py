"""Explicit tests for every parity trap in SURVEY §7 — the behaviors that
are easy to "fix" into incorrectness."""

import pytest
from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.operators import derive, filters


@pytest.fixture(scope="module")
def one_row(spark):
    def make(fecha="20250114", ruta="919885", precio="10.5", cantidad="2.0", unidad="CS"):
        return spark.createDataFrame(
            [("GT", fecha, "67053596", ruta, "ZPRE", "AA004003", precio, cantidad, unidad)],
            ["pais", "fecha_proceso", "transporte", "ruta", "tipo_entrega",
             "material", "precio", "cantidad", "unidad"],
        )
    return make


CONFIG = {
    "business_rules": {
        "units_conversion": {"CS": 20, "ST": 1},
        "delivery_types": {"routine": ["ZPRE", "ZVE1"], "bonus": ["Z04", "Z05"]},
    },
    "country_names": {"GT": "Guatemala"},
}


def _derive_one(df):
    return derive.derive_all(df, CONFIG).collect()[0]


class TestSurvey7Traps:
    def test_trap2_lexicographic_date_filter_is_string_compare(self, one_row):
        """§7.2: the range filter must compare strings, not dates — a
        malformed-but-in-range string passes."""
        df = one_row(fecha="20250230")  # Feb 30 — invalid as a date
        out = df.filter(filters.date_range_filter("fecha_proceso", "20250101", "20250630"))
        assert out.count() == 1  # a date-typed filter would NULL it out

    def test_trap3_dayofweek_spark_semantics(self, one_row):
        """§7.3: 2025-01-14 is a Tuesday → Spark dayofweek=3, name Martes
        (the reference's comment claims 1=Monday; behavior wins)."""
        row = _derive_one(one_row(fecha="20250114"))
        assert row.dia_semana == 3
        assert row.nombre_dia_semana == "Martes"

    def test_trap3_sunday_and_accents(self, one_row):
        row = _derive_one(one_row(fecha="20250112"))  # Sunday
        assert row.dia_semana == 1 and row.nombre_dia_semana == "Domingo"
        row = _derive_one(one_row(fecha="20250115"))  # Wednesday
        assert row.nombre_dia_semana == "Miércoles"
        row = _derive_one(one_row(fecha="20250118"))  # Saturday
        assert row.nombre_dia_semana == "Sábado"

    def test_trap4_scientific_notation_to_double(self, one_row):
        """§7.4: '0E-18' parses to double 0.0; flags fire."""
        row = _derive_one(one_row(precio="0E-18"))
        assert row.precio == 0.0
        assert row.es_bonificacion_gratuita is True

    def test_trap4_half_up_rounding(self, one_row):
        """§7.4: Spark round is HALF_UP on the shortest repr: 2.5*8.10=20.25
        stays 20.25; 0.125*1 ST rounds precio_total to 0.13 not 0.12."""
        row = _derive_one(one_row(precio="0.125", cantidad="1.0", unidad="ST"))
        assert row.precio_total == 0.13

    def test_trap5_map_miss_yields_null(self, spark):
        df = spark.createDataFrame(
            [("XX", "20250114", "1", "919885", "ZPRE", "M", "1.0", "1.0", "ST")],
            ["pais", "fecha_proceso", "transporte", "ruta", "tipo_entrega",
             "material", "precio", "cantidad", "unidad"],
        )
        row = derive.derive_all(df, CONFIG).collect()[0]
        assert row.nombre_pais is None

    def test_trap5_region_nd_only_when_ruta_null(self, spark):
        schema = ", ".join(
            f"{c} string"
            for c in ["pais", "fecha_proceso", "transporte", "ruta", "tipo_entrega",
                      "material", "precio", "cantidad", "unidad"]
        )
        df = spark.createDataFrame(
            [("GT", "20250114", "1", None, "ZPRE", "M", "1.0", "1.0", "ST")],
            schema,
        )
        row = derive.derive_all(df, CONFIG).collect()[0]
        assert row.codigo_region == "ND"

    def test_unit_conversion_and_buckets(self, one_row):
        """F2/F16/F17 boundaries: CS×20; dia 14 → MEDIADOS; qty 40 → MEDIO."""
        row = _derive_one(one_row(precio="10.5", cantidad="2.0", unidad="CS"))
        assert row.cantidad_unidades == 40.0
        assert row.rango_volumen == "MEDIO"
        assert row.periodo_mes == "MEDIADOS_MES"
        assert row.precio_total == 420.0
        assert row.precio_por_unidad == round(10.5 / 40.0, 4)

    def test_bucket_boundaries(self, one_row):
        assert _derive_one(one_row(cantidad="1.0", unidad="CS")).rango_volumen == "BAJO"  # 20
        assert _derive_one(one_row(cantidad="25.0", unidad="CS")).rango_volumen == "ALTO"  # 500
        assert _derive_one(one_row(cantidad="25.05", unidad="CS")).rango_volumen == "MUY_ALTO"  # 501
        assert _derive_one(one_row(fecha="20250110")).periodo_mes == "INICIO_MES"
        assert _derive_one(one_row(fecha="20250121")).periodo_mes == "FIN_MES"

    def test_guarded_ratio_zero_qty(self, one_row):
        """F8: qty 0 → precio_por_unidad 0, not NULL/error (ANSI-safe)."""
        row = _derive_one(one_row(cantidad="0.0", unidad="ST"))
        assert row.precio_por_unidad == 0.0


class TestGoldenPartitionCounts:
    def test_per_partition_rows(self, spark, tmp_path):
        """BASELINE per-partition distribution over the golden CSV:
        the 123 output rows split across the 6 dates exactly as published
        (docs/data_flow_diagram.md:367-384)."""
        from etl_entregas_pyspark_spark.config import load_config
        from etl_entregas_pyspark_spark.operators.pipeline import EntregasPipeline
        from tests.conftest import REFERENCE_CSV

        cfg = load_config(dotlist=[
            f"paths.input_file={REFERENCE_CSV}",
            f"paths.output_base={tmp_path}/out",
        ])
        pipe = EntregasPipeline(spark, cfg)
        cleaned, _ = pipe.apply_data_quality(pipe.extract())
        final = pipe.standardize_columns(pipe.transform(pipe.apply_filters(cleaned)))
        counts = {
            r.fecha_proceso: r.n
            for r in final.groupBy("fecha_proceso").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == 123
        assert len(counts) == 6
