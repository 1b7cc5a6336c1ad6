"""connected_components: convergence and correctness on adversarial
shapes — a long chain (max diameter, exercises pointer jumping), a dense
blob, isolated vertices, and label-minimality.

Every shape runs through BOTH physical paths: the driver union-find
fast path (edge list under DRIVER_CC_MAX_EDGES) and the distributed
min-label propagation (forced by shrinking the threshold to 0) — the
two must be indistinguishable from the result side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.operators import graph
from open_rust_timeseries_db_spark.operators.graph import connected_components


@pytest.fixture(params=["union_find", "propagation"])
def _cc(spark, request, monkeypatch):
    if request.param == "propagation":
        monkeypatch.setattr(graph, "DRIVER_CC_MAX_EDGES", -1)

    def run(spark, nodes, edges):
        ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
        edf = spark.createDataFrame(edges or [(None, None)], "a bigint, b bigint")
        if not edges:
            edf = edf.filter(F.col("a").isNotNull())
        out = connected_components(ndf, edf)
        return dict((r["node"], r["label"]) for r in out.collect())

    return run


def test_chain_collapses_to_min(spark, _cc):
    # 0-1-2-...-19: diameter 19; pointer jumping must still converge
    # well inside max_iter and label everything 0.
    nodes = list(range(20))
    edges = [(i, i + 1) for i in range(19)]
    assert _cc(spark, nodes, edges) == {n: 0 for n in nodes}


def test_components_and_singletons(spark, _cc):
    nodes = [1, 2, 3, 10, 11, 42]
    edges = [(2, 3), (1, 2), (10, 11)]
    got = _cc(spark, nodes, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 42: 42}


def test_dense_blob_one_round(spark, _cc):
    nodes = list(range(5, 12))
    edges = [(a, b) for a in nodes for b in nodes if a < b]
    assert _cc(spark, nodes, edges) == {n: 5 for n in nodes}


def test_no_edges_all_singletons(spark, _cc):
    nodes = [7, 8, 9]
    assert _cc(spark, nodes, []) == {7: 7, 8: 8, 9: 9}
