"""Tracked-cache registry: release() drops exactly one handle; the
quiescent-point drain releases the rest; both leave the JVM block
manager clean."""

from __future__ import annotations

from hogflare_spark.functions import caching


def test_release_drops_one_tracked_handle(spark):
    a = caching.cached(spark.range(10))
    b = caching.cached(spark.range(20))
    a.count(), b.count()
    assert caching.release(a) is True
    assert caching.release(a) is False  # already gone from the registry
    assert a.storageLevel.useMemory is False
    assert b.storageLevel.useMemory is True  # untouched
    assert caching.unpersist_all() == 1  # only b remained tracked
    assert b.storageLevel.useMemory is False


def test_release_untracked_frame_is_a_noop(spark):
    df = spark.range(5).cache()
    try:
        assert caching.release(df) is False
        assert df.storageLevel.useMemory is True
    finally:
        df.unpersist()
