"""Parametric filters (reference ``apply_filters``,
``src/etl_entregas.py:178-207``).

Parity trap (SURVEY §7.2): the date-range filter is a LEXICOGRAPHIC string
comparison over fixed-width ``yyyyMMdd`` — correct only because the format
is fixed width; do not "fix" it to date types. Both predicates are plain
Column expressions, so Catalyst pushes them into the source scan.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_range_filter(column: str, start: str, end: str) -> Column:
    """P5 — inclusive string-range predicate on yyyyMMdd."""
    col = F.col(column)
    return (col >= F.lit(start)) & (col <= F.lit(end))


def country_filter(column: str, country: str) -> Column:
    """P6 — case-normalized equality."""
    return F.upper(F.col(column)) == F.lit(country.upper())


def apply_filters(df: DataFrame, config: Mapping[str, Any]) -> DataFrame:
    filters = config.get("filters", {})
    out = df
    start, end = filters.get("start_date"), filters.get("end_date")
    if start and end:
        out = out.filter(date_range_filter("fecha_proceso", str(start), str(end)))
    country = filters.get("country")
    if country:
        out = out.filter(country_filter("pais", str(country)))
    return out
