"""Standardization / final projection (reference ``standardize_columns`` +
final select, ``src/etl_entregas.py:393-461``).

Parity quirk preserved (SURVEY §7.8): renames apply only when the source
column exists, and the final select keeps only columns that exist — schema
drift is tolerated silently, not an error.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 29 columns in the reference's exact order (src/etl_entregas.py:412-455;
# the docs header says "28 columnas" but the code selects 29 — behavior is
# the spec).
OUTPUT_COLUMNS = [
    # geographic
    "codigo_pais",
    "nombre_pais",
    "codigo_region",
    # temporal
    "fecha_proceso",
    "anio_proceso",
    "trimestre",
    "mes_proceso",
    "semana_del_anio",
    "dia_proceso",
    "dia_semana",
    "nombre_dia_semana",
    "periodo_mes",
    # transport
    "id_transporte",
    "id_ruta",
    # product
    "codigo_material",
    # delivery type
    "codigo_tipo_entrega",
    "categoria_entrega",
    "es_entrega_rutina",
    "es_entrega_bonificacion",
    # quantities
    "cantidad_original",
    "unidad_original",
    "cantidad_unidades",
    "rango_volumen",
    # prices
    "precio_unitario",
    "precio_por_unidad",
    "precio_total",
    "es_bonificacion_gratuita",
    "es_alto_valor",
    # metadata
    "fecha_procesamiento_etl",
]


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P10 — config-driven renames, skipping absent sources."""
    effective = {old: new for old, new in mapping.items() if old in df.columns and old != new}
    return df.withColumnsRenamed(effective) if effective else df


def select_existing(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """P8 — fixed-order projection intersected with existing columns."""
    present = [c for c in columns if c in df.columns]
    return df.select(*[F.col(c) for c in present])


def standardize(df: DataFrame, config) -> DataFrame:
    mapping = config.get("output_schema", {}).get("column_mapping", {})
    return select_existing(rename_columns(df, mapping), OUTPUT_COLUMNS)
