"""Registry-wide physical-plan lint: the scale anti-patterns that never
show up at sf0.001 but kill a 1000-executor run are asserted ABSENT for
every registered query, so a regression in any future plan fails CI, not
the cluster.

Checked properties:
- no `CartesianProduct` anywhere (crossJoins must broadcast — all of
  ours are 1-row stat frames);
- no row-at-a-time Python (`BatchEvalPython`); Arrow-batched Python
  (`ArrowEvalPython`/`MapInPandas`/`FlatMapGroupsInPandas`) is allowed
  only in the multimodal decode queries, which exist to exercise it;
- no single-partition window (empty PARTITION BY) outside an explicit
  whitelist of model-state-sized frames.
"""

from __future__ import annotations

import re

import pytest

from etl_entregas_pyspark_spark import queries as q
from tests.conftest import SF_DIR

# Arrow-batched Python stages are the POINT of the multimodal queries.
_ARROW_PYTHON_OK = {
    "q57_multimodal_decode",
    "q129_multimodal_embed",
    "q183_phash_near_dup",  # Arrow perceptual-hash stage (blob -> 8 bytes)
}

# Queries allowed a window with empty PARTITION BY: each one windows a
# frame whose size is MODEL STATE (bucket/bin/centroid/count domains),
# not data — documented in the query docstring / SCALE.md.
_GLOBAL_WINDOW_OK = {
    "q17_window_rank_ntile",     # ntile/percent_rank battery: the global
                                 # rank IS the operator under test; q71 is
                                 # the documented windowless scale path
    "q131_global_index",         # offset prefix-sum over <= 16 bucket-
                                 # count rows — model state, not data
    "q134_pareto_skyline",       # global merge phase over local-pruned
                                 # survivors (size-insensitive by design)
    "q148_rrf_fusion",           # row_number over two 30-row top-k
                                 # frames (each arm ends in a distributed
                                 # TakeOrderedAndProject first)
}


def _plan(spark, name: str) -> str:
    df = q.REGISTRY[name].spark(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    return {name: _plan(spark, name) for name in q.REGISTRY}


def test_no_cartesian_product(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"cartesian products in: {bad}"


def test_no_row_at_a_time_python(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDFs in: {bad}"


def test_arrow_python_only_in_multimodal(plans):
    arrow = re.compile(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas")
    bad = [
        n for n, p in plans.items()
        if arrow.search(p) and n not in _ARROW_PYTHON_OK
    ]
    assert not bad, f"unexpected Python stages in: {bad}"


def test_no_undocumented_global_window(plans):
    """A Window whose spec has no partition columns sorts the WHOLE input
    in one task — the classic scale cliff. The formatted spec lists
    partition exprs first; if the very first argument already carries a
    sort direction, the partition list is empty."""

    def has_global_window(p: str) -> bool:
        for m in re.finditer(r"windowspecdefinition\(", p):
            seg = p[m.start(): m.start() + 200]
            head = seg.split(",", 1)[0]
            if " ASC" in head or " DESC" in head:
                return True
        return False

    bad = [
        n for n, p in plans.items()
        if has_global_window(p) and n not in _GLOBAL_WINDOW_OK
    ]
    assert not bad, f"undocumented single-partition windows in: {bad}"
