"""Persisted intermediates must not accumulate across declared
queries in a long-lived session (round-2 VERDICT wrong #3)."""

from __future__ import annotations


def n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_query_boundary_releases_tracked_caches(spark):
    """Running several persist-using queries back to back must not
    grow the persistent-RDD set: each query's entry releases the
    previous query's tracked caches."""
    import babylon_data_loader_spark.queries as q
    from babylon_data_loader_spark.functions.cache import release_tracked

    q.load_all()
    sf = "/root/testdata/sf0.001"
    release_tracked()
    baseline = n_cached(spark)
    # q_near_dup_pairs and q_dedup_clusters both persist intermediates
    for name in ("q_near_dup_pairs", "q_dedup_clusters", "q_near_dup_pairs"):
        q.QUERIES[name](spark, sf).collect()
    # releases happened at each boundary: at most ONE query's tracked
    # caches (the last one's) remain
    assert n_cached(spark) - baseline <= 3
    release_tracked()
    assert n_cached(spark) <= baseline


def test_release_tracked_idempotent(spark):
    from babylon_data_loader_spark.functions.cache import (
        persist_tracked,
        release_tracked,
    )

    df = persist_tracked(spark.range(10))
    df.count()
    assert release_tracked() == 1
    assert release_tracked() == 0
