"""Unpersist discipline (operators/caching.py): build-then-probe caches
are tracked and released at the next query build, so a sequential
catalog run never accumulates InMemoryRelations across queries."""

from __future__ import annotations

import pytest

from big_data_virus_analysis_spark.operators.caching import (
    release_tracked_caches,
    tracked_cache,
)
from big_data_virus_analysis_spark.plans.catalog import CATALOG, queries

from conftest import SF_DIR

#: pair-generator / index-building queries that cache an intermediate
#: frame for a self-join probe — the exact leak sites VERDICT r03 named
CACHING_QUERIES = [
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dedup_ngram_jaccard",
    "fingerprint_overlap_pairs",
    "semantic_dedup_pairs",
    "dedup_incremental_batch",
]


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


@pytest.mark.parametrize("name", CACHING_QUERIES)
def test_release_empties_cache_manager(spark, name):
    """Each caching query registers its caches; an explicit release after
    the consuming action leaves the session's CacheManager empty."""
    spark.catalog.clearCache()
    release_tracked_caches()
    df = CATALOG[name].spark(spark, SF_DIR)
    assert df.count() >= 0  # consume
    released = release_tracked_caches()
    assert released >= 1, f"{name} no longer registers its cache"
    assert _cache_manager_empty(spark)


def test_next_query_build_releases_predecessors(spark):
    """The queries() surface is self-cleaning: building query N releases
    query N-1's tracked caches, so a driver/bench loop holds at most one
    query's caches."""
    spark.catalog.clearCache()
    release_tracked_caches()
    qs = queries()
    first = qs["minhash_lsh_pairs"](spark, SF_DIR)
    assert first.count() > 0
    assert not _cache_manager_empty(spark)  # cache alive while consumed
    # building the next query releases the minhash signature cache ...
    second = qs["simhash_pairs"](spark, SF_DIR)
    assert second.count() > 0
    # ... and releasing after the last consumption empties the manager
    release_tracked_caches()
    assert _cache_manager_empty(spark)


def test_tracked_cache_is_reusable_after_release(spark):
    """Releasing is safe mid-lineage: a released frame just recomputes."""
    df = tracked_cache(spark.range(100))
    assert df.count() == 100
    assert release_tracked_caches() == 1
    assert df.count() == 100  # recomputes fine after unpersist


def test_first_window_is_all_exact_oracle():
    """The driver's correctness gate samples the first 50 queries();
    every slot must carry an exact DuckDB oracle (rows-only entries
    live after the window — see catalog._finalize_order)."""
    names = list(CATALOG)[:50]
    assert len(names) == 50
    missing = [n for n in names if CATALOG[n].oracle is None]
    assert missing == []
