"""Round-14 operator tests.

Part 1 — the SQ8 codes column persisted in the IVF inverted file (r13
VERDICT weak #1): the oracle hash gate proves q232/q236's VALUES are
unchanged; these pin the PLAN properties the fix exists for — the
admission stage's parquet scan of the inverted file reads (vec_id,
centroid_id, codes) and never the float column, and the persisted codes
are bit-identical to inline quantization (so admissions can never drift
from the q68 quantizer contract).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.queries.ivf_index import (
    ensure_ivf_index,
    q232_ivf_sq8_rescore,
    q236_sq8_shortlist_sweep,
)
from etl_entregas_pyspark_spark.queries.similarity import q8_codes
from tests.conftest import SF_DIR


def _scan_read_schemas(df, location_substr: str) -> list[str]:
    """ReadSchema strings of every parquet Scan node whose Location
    mentions ``location_substr``, parsed from the formatted plan."""
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = jdf.queryExecution().explainString(mode)
    schemas = []
    # formatted mode lists one "(n) Scan parquet" block per source with
    # Location: and ReadSchema: lines
    for block in re.split(r"\n\n", plan):
        if "Scan parquet" not in block:
            continue
        loc = re.search(r"Location:.*", block)
        rs = re.search(r"ReadSchema: (.*)", block)
        if loc and rs and location_substr in loc.group(0):
            schemas.append(rs.group(1))
    return schemas


class TestSq8CodesPersisted:
    def test_q232_admission_scan_never_reads_floats(self, spark):
        """EVERY scan of the inverted file in q232's plan is codes-only:
        the float column enters via the base embeddings table for the
        shortlist rescore, never via the index."""
        ensure_ivf_index(spark, SF_DIR)
        df = q232_ivf_sq8_rescore(spark, SF_DIR)
        schemas = _scan_read_schemas(df, "ivf_index_")
        assert schemas, "no inverted-file scan found in q232's plan"
        for rs in schemas:
            assert "embedding" not in rs, f"index scan reads floats: {rs}"
            assert "codes" in rs, f"index scan misses codes: {rs}"

    def test_q236_admission_stage_is_codes_only(self, spark):
        """The shared admission stage (pre-checkpoint, the plan q236's
        rescore consumes) scans the inverted file codes-only."""
        from etl_entregas_pyspark_spark.queries.ivf_index import (
            _SQ8_SWEEP_DEPTHS,
            _sq8_admission,
        )

        _, shortpool = _sq8_admission(spark, SF_DIR, max(_SQ8_SWEEP_DEPTHS))
        schemas = _scan_read_schemas(shortpool, "ivf_index_")
        assert schemas, "no inverted-file scan found in the admission plan"
        for rs in schemas:
            assert "embedding" not in rs, f"admission scan reads floats: {rs}"
            assert "codes" in rs, f"admission scan misses codes: {rs}"

    def test_q236_truth_arm_reads_floats_not_codes(self, spark):
        """The final q236 plan's remaining inverted-file scan is the
        declared full-precision truth arm (the admission stage sits
        behind a checkpoint): it reads embedding and never codes."""
        ensure_ivf_index(spark, SF_DIR)
        df = q236_sq8_shortlist_sweep(spark, SF_DIR)
        schemas = _scan_read_schemas(df, "ivf_index_")
        assert schemas, "no inverted-file scan found in q236's plan"
        for rs in schemas:
            assert "embedding" in rs and "codes" not in rs, rs

    def test_persisted_codes_bit_identical_to_inline_quantizer(self, spark):
        """The array<tinyint> column round-trips exactly: for every
        indexed vector, persisted codes == q8_codes(embedding)."""
        idx = ensure_ivf_index(spark, SF_DIR)
        cand = spark.read.parquet(os.path.join(idx, "cand")).select(
            "vec_id", F.col("codes").cast("array<long>").alias("stored")
        )
        e = (
            spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
            .select("vec_id", q8_codes(F.col("embedding")).alias("fresh"))
        )
        joined = cand.join(e, "vec_id")
        n = joined.count()
        assert n > 0
        n_equal = joined.filter(F.col("stored") == F.col("fresh")).count()
        assert n_equal == n

    def test_codes_column_is_int8(self, spark):
        idx = ensure_ivf_index(spark, SF_DIR)
        schema = spark.read.parquet(os.path.join(idx, "cand")).schema
        codes = next(f for f in schema.fields if f.name == "codes")
        assert codes.dataType.simpleString() == "array<tinyint>"

    def test_q236_n_rescored_counts_actual_fan_rows(self, spark):
        """n_rescored is the ACTUAL rescore fan (r13 ADVICE #3): never
        more than n_queries x shortlist, monotone in the budget, and
        consistent with per-query candidate availability."""
        rows = {
            r["shortlist"]: r
            for r in q236_sq8_shortlist_sweep(spark, SF_DIR).collect()
        }
        prev = 0
        for depth in sorted(rows):
            r = rows[depth]
            assert r["n_rescored"] <= r["n_queries"] * depth
            assert r["n_rescored"] >= prev
            prev = r["n_rescored"]
