"""Regression tests for round-1 advisor findings: q66 tail-token coverage
and dotlist overrides of not-yet-present flat Spark conf keys."""

from pyspark.sql import functions as F

from etl_entregas_pyspark_spark.config import apply_dotlist, load_config
from etl_entregas_pyspark_spark.queries.datasplit import (
    _CHUNK,
    _STRIDE,
    q66_chunking,
)
from tests.conftest import SF_DIR


class TestDotlistFlatKeys:
    def test_new_flat_spark_conf_key_stays_flat(self):
        """A conf key absent from the defaults must become a flat entry in
        spark.configs, never a nested dict that stringifies to garbage."""
        cfg = load_config(dotlist=["spark.configs.spark.executor.memory=8g"])
        assert cfg["spark"]["configs"]["spark.executor.memory"] == "8g"
        assert "spark" not in cfg["spark"]["configs"] or not isinstance(
            cfg["spark"]["configs"].get("spark"), dict
        )

    def test_existing_flat_key_still_updates(self):
        cfg = load_config(dotlist=["spark.configs.spark.sql.shuffle.partitions=64"])
        assert cfg["spark"]["configs"]["spark.sql.shuffle.partitions"] == 64

    def test_non_flat_paths_still_nest(self):
        out = apply_dotlist({"a": {"b": 1}}, ["a.c.d=2"])
        assert out["a"]["c"]["d"] == 2


class TestChunkCoverage:
    def test_every_token_in_some_chunk(self, spark):
        """CEIL chunk count: the union of chunk windows must cover every
        token of every document — the final (possibly partial) window
        reaches the last token even when (len - CHUNK) % STRIDE != 0."""
        out = q66_chunking(spark, SF_DIR).collect()
        lens = {
            r.doc_id: r.n
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 300)
            .select("doc_id", F.size(F.split("text", " ")).alias("n"))
            .collect()
        }
        covered_to = {}
        for r in out:
            end = r.chunk_id * _STRIDE + len(r.chunk_text.split(" "))
            covered_to[r.doc_id] = max(covered_to.get(r.doc_id, 0), end)
        assert set(covered_to) == set(lens)
        for doc_id, n in lens.items():
            assert covered_to[doc_id] == n, f"doc {doc_id}: covered {covered_to[doc_id]} of {n}"
        # at least one doc exercises the partial-tail case
        assert any((n - _CHUNK) > 0 and (n - _CHUNK) % _STRIDE for n in lens.values())
