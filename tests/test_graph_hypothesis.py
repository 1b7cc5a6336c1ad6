"""Hypothesis property for connected components on random graphs.

test_graph.py pins adversarial shapes; this draws arbitrary edge sets
over a small vertex universe and checks BOTH physical paths (driver
union-find and forced distributed min-label propagation) against an
independent pure-Python union-find — the strongest form of the
"two paths are indistinguishable" claim the dedup-cluster family
rests on.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from open_rust_timeseries_db_spark.operators import graph
from open_rust_timeseries_db_spark.operators.graph import connected_components

_N = 12
_edge = st.tuples(
    st.integers(min_value=0, max_value=_N - 1),
    st.integers(min_value=0, max_value=_N - 1),
)


def _naive_cc(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {}
    for v in range(n):
        r = find(v)
        roots.setdefault(r, []).append(v)
    return {v: min(members) for members in roots.values() for v in members}


def _run(spark, edges):
    ndf = spark.createDataFrame([(v,) for v in range(_N)], "node bigint")
    edf = spark.createDataFrame(edges or [(None, None)], "a bigint, b bigint")
    if not edges:
        edf = edf.filter(F.col("a").isNotNull())
    out = connected_components(ndf, edf)
    return {r["node"]: r["label"] for r in out.collect()}


@settings(max_examples=12, deadline=None)
@given(edges=st.lists(_edge, max_size=20))
def test_driver_union_find_matches_naive(spark, edges):
    assert _run(spark, edges) == _naive_cc(_N, edges)


@settings(max_examples=8, deadline=None)
@given(edges=st.lists(_edge, max_size=20))
def test_distributed_propagation_matches_naive(spark, edges):
    # Patched manually (not via the monkeypatch fixture): hypothesis
    # reuses function-scoped fixtures across examples and flags them.
    saved = graph.DRIVER_CC_MAX_EDGES
    graph.DRIVER_CC_MAX_EDGES = -1
    try:
        assert _run(spark, edges) == _naive_cc(_N, edges)
    finally:
        graph.DRIVER_CC_MAX_EDGES = saved
