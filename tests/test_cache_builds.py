"""The bench's cache-build phase must actually cover the shared tables.

If a query materializes a session-cached artifact the build phase does
not list, its "cold" bench line silently absorbs a build again (the
round-3 mis-attribution the phase exists to fix). Contract: after all
builders run, the cache-heavy queries plan WITHOUT adding new ckpt
cache entries and without collect-memo misses.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with suite style)

import open_rust_timeseries_db_spark.functions.text_kernels as tk
from open_rust_timeseries_db_spark.queries import all_queries
from open_rust_timeseries_db_spark.queries.cache_builds import cache_builders
from tests.conftest import SF_DIR

# The queries whose plans hang off shared session artifacts.
CACHE_HEAVY = [
    "q_lm_score",
    "q_ngram_lm_bigrams",
    "q_repetition_ratio",
    "q_tfidf_topterms",
    "q_bm25_rank",
    "q_token_diversity",
    "q_dedup_near",
    "q_minhash_jaccard",
    "q_ngram_jaccard",
    "q_simhash",
    "q_winnow_neardup",
    "q_winnowing_fp",
    "q_contamination",
    "q_ann_ivf",
    "q_kmeans_update",
    "q_semantic_dedup",
    # fingerprint-census consumers (round 9):
    "q_dedup_apply",
    "q_fingerprint",
    "q_ann_recall",
    "q_ngram_lm_bigrams",
]


def test_cache_builders_cover_query_artifacts(spark):
    specs = all_queries()
    builders = cache_builders(spark, SF_DIR)
    rows = {name: build() for name, build in builders.items()}
    assert all(n >= 0 for n in rows.values())

    n_entries = len(tk._CKPT_CACHE)
    for name in CACHE_HEAVY:
        specs[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    assert len(tk._CKPT_CACHE) == n_entries, (
        "a cache-heavy query materialized a session artifact the build "
        "phase does not list: "
        f"{sorted(k[3:] for k in list(tk._CKPT_CACHE)[-(len(tk._CKPT_CACHE) - n_entries):])}"
    )


def _snapshot_ckpt_state():
    return (
        dict(tk._CKPT_CACHE),
        {k: set(v) for k, v in tk._CKPT_CHILDREN.items()},
        dict(tk._CKPT_PARENT),
    )


def _restore_ckpt_state(snap):
    cache, children, parent = snap
    tk._CKPT_CACHE.clear()
    tk._CKPT_CACHE.update(cache)
    tk._CKPT_CHILDREN.clear()
    tk._CKPT_CHILDREN.update(children)
    tk._CKPT_PARENT.clear()
    tk._CKPT_PARENT.update(parent)


def test_parent_eviction_cascades_to_derived_children(spark, monkeypatch):
    # Evicting a persisted parent must also drop its persist=False
    # children: a surviving child is a memoized view over unpersisted
    # blocks that silently recomputes the full kernel pipeline per
    # action (round-6 ADVICE low).
    snap = _snapshot_ckpt_state()
    try:
        tk._CKPT_CACHE.clear()
        tk._CKPT_CHILDREN.clear()
        tk._CKPT_PARENT.clear()
        monkeypatch.setattr(tk, "_CKPT_CACHE_MAX", 3)
        src = spark.range(100)
        par = tk._cached_ckpt(src, src.selectExpr("id"), ("par",))
        tk._cached_ckpt(
            src, par.filter("id > 2"), ("child",), persist=False, parent=par
        )
        # Registration + hits keep the parent at least as fresh as the
        # child, so plain LRU pressure always takes the child first —
        # the cascade is the backstop for direct/forced eviction.
        tk._evict_ckpt_key(par._orts_ckpt_key)
        tails = {k[3:] for k in tk._CKPT_CACHE}
        assert ("par",) not in tails
        assert ("child",) not in tails
        assert not tk._CKPT_PARENT and not tk._CKPT_CHILDREN
    finally:
        _restore_ckpt_state(snap)


def test_child_hit_keeps_parent_fresh(spark, monkeypatch):
    # A hit on a derived view is a hit on its parent's blocks: the
    # parent must not be the LRU victim while the child is hot.
    snap = _snapshot_ckpt_state()
    try:
        tk._CKPT_CACHE.clear()
        tk._CKPT_CHILDREN.clear()
        tk._CKPT_PARENT.clear()
        monkeypatch.setattr(tk, "_CKPT_CACHE_MAX", 3)
        src = spark.range(100)
        par = tk._cached_ckpt(src, src.selectExpr("id"), ("par",))
        tk._cached_ckpt(
            src, par.filter("id > 2"), ("child",), persist=False, parent=par
        )
        tk._cached_ckpt(src, src.selectExpr("id + 1 AS x"), ("d0",))
        # Child HIT touches the parent; the next insert must evict d0
        # (now the stalest untouched entry), not the parent.
        tk._cached_ckpt(
            src, par.filter("id > 2"), ("child",), persist=False, parent=par
        )
        tk._cached_ckpt(src, src.selectExpr("id + 2 AS x"), ("d1",))
        tails = {k[3:] for k in tk._CKPT_CACHE}
        assert ("par",) in tails and ("child",) in tails
        assert ("d0",) not in tails
    finally:
        _restore_ckpt_state(snap)
