"""Timezone-proof epoch arithmetic.

The driver's parquet testdata stores naive timestamps; Spark 4 reads them
as TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled`` defaults
true) and ``unix_micros`` rejects NTZ input outright
(DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE). Casting NTZ→LTZ first would
re-admit ``unix_micros`` but makes the value depend on the session
timezone — a correctness hazard on a session we didn't build.

``epoch_us`` instead measures wall-clock micros from the NTZ epoch with
``timestamp_diff`` — pure calendar arithmetic, no timezone involved, so it
is bitwise-identical to DuckDB's ``epoch_us(ts)`` under ANY session
timezone, and accepts TIMESTAMP, TIMESTAMP_NTZ and DATE alike (everything
funnels through one NTZ cast; LTZ/DATE casts resolve via the session tz,
which our sessions pin to UTC — session.py SCALE_DEFAULTS / tune_for_oracle).
Codegen cost is identical to unix_micros: one subtraction, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 00:00:00 (wall clock, tz-free)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.expr(_EPOCH_NTZ),
        c.cast("timestamp_ntz"),
    )


def epoch_us_sql(expr: str) -> str:
    """The same computation as a Spark SQL fragment (for F.expr strings)."""
    return f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, CAST(({expr}) AS TIMESTAMP_NTZ))"
