"""Deferred-cache pool contract (cache.py): scoped release + thread
safety.  The boundary sweep must free exactly what the package
registered — never a host application's own persists/checkpoints — and
the pool bookkeeping must survive concurrent registration/release."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark import cache


def _persistent_ids(spark):
    ids = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().keysIterator()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_release_spares_host_application_caches(spark):
    """A user's own df.persist() and df.localCheckpoint() must survive
    release_deferred: only package-registered storage is swept (the
    r04-ADVICE session-global-sweep fix)."""
    spark.catalog.clearCache()
    cache.release_deferred(spark)

    before_user = _persistent_ids(spark)
    user_persist = spark.range(100).withColumn("x", F.col("id") * 2).persist()
    user_persist.count()  # materialize the user's cache
    user_ckpt = spark.range(50).localCheckpoint()
    assert user_ckpt.count() == 50
    outside = _persistent_ids(spark)
    assert outside - before_user  # both live

    ours_df = spark.range(10).withColumn("y", F.col("id") + 1)
    cache.deferred_persist(ours_df).count()
    ours_ckpt = cache.tracked_local_checkpoint(spark.range(20))
    assert ours_ckpt.count() == 20

    cache.release_deferred(spark)
    # ours are gone, the user's storage is exactly as before
    assert _persistent_ids(spark) == outside
    assert user_persist.storageLevel.useMemory
    # the user's truncated-lineage checkpoint still COLLECTS (a global
    # sweep would have made this fail permanently)
    assert user_ckpt.count() == 50
    assert user_persist.count() == 100

    # test cleanup: drop the "user" storage by raw id so later tests
    # (which assert zero persistent RDDs) start clean
    user_persist.unpersist(blocking=True)
    leftover = _persistent_ids(spark) - before_user
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().valuesIterator()
    while it.hasNext():
        rdd = it.next()
        if rdd.id() in leftover:
            rdd.unpersist(True)
    assert _persistent_ids(spark) == before_user


def test_tracked_checkpoint_storage_released_at_boundary(spark):
    """tracked_local_checkpoint ids are swept by query_boundary when a
    DIFFERENT query starts; same-name reps keep their storage."""
    spark.catalog.clearCache()
    cache.release_deferred(spark)
    base = _persistent_ids(spark)

    cache.query_boundary(spark, "qA")
    cache.tracked_local_checkpoint(spark.range(30)).count()
    assert _persistent_ids(spark) - base  # checkpoint storage live

    cache.query_boundary(spark, "qA")  # same query: kept
    assert _persistent_ids(spark) - base

    cache.query_boundary(spark, "qB")  # different query: swept
    assert _persistent_ids(spark) == base


def test_pool_bookkeeping_is_thread_safe(spark):
    """Concurrent deferred_persist/query_boundary from several threads
    must not corrupt the pool: no exceptions, and a final boundary
    leaves zero package-tracked storage (the module-lock contract;
    boundary SEMANTICS stay sequential — see cache.py docstring)."""
    spark.catalog.clearCache()
    cache.release_deferred(spark)
    errors = []

    def worker(tag):
        try:
            for i in range(8):
                cache.query_boundary(spark, f"q-{tag}-{i % 3}")
                df = cache.deferred_persist(spark.range(5 + i))
                df.count()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    cache.query_boundary(spark, "final-sweep")
    cache.release_deferred(spark)
    assert not cache._PENDING and not cache._TRACKED_RDD_IDS


def test_sparkless_release_keeps_tracked_ids_for_a_later_sweep(spark):
    """release_deferred() without spark cannot free raw-RDD
    localCheckpoint storage (it lives outside the CacheManager), so it
    must LEAVE those ids registered — dropping them would strand the
    blocks until session death.  A later sweeping call reclaims them."""
    from etl_pulumi_aws_snowflake_spark import cache

    df = cache.tracked_local_checkpoint(spark.range(100).toDF("n"))
    df.count()
    with cache._LOCK:
        tracked_before = set(cache._TRACKED_RDD_IDS)
    assert tracked_before, "checkpoint ids were registered"

    cache.release_deferred()  # sparkless: releases only plain persists
    with cache._LOCK:
        assert set(cache._TRACKED_RDD_IDS) == tracked_before

    assert cache.release_deferred(spark) >= len(tracked_before)
    with cache._LOCK:
        assert not cache._TRACKED_RDD_IDS


def test_scoped_release_frees_only_in_scope_persists(spark):
    """cache.scoped_release releases exactly the deferred persists
    registered inside the block (the per-microbatch form of the
    boundary sweep, ADVICE r10) — persists registered BEFORE the scope
    stay pooled for the next boundary sweep."""
    spark.catalog.clearCache()
    cache.release_deferred(spark)

    outer = cache.deferred_persist(spark.range(50).toDF("n"))
    outer.count()
    with cache._LOCK:
        assert len(cache._PENDING) == 1

    with cache.scoped_release():
        inner = cache.deferred_persist(spark.range(60).toDF("m"))
        inner.count()
        assert inner.storageLevel.useMemory
        with cache._LOCK:
            assert len(cache._PENDING) == 2

    # inner released, outer untouched (still cached AND still pooled)
    assert not inner.storageLevel.useMemory
    assert outer.storageLevel.useMemory
    with cache._LOCK:
        assert [id(df) for df, _ in cache._PENDING] == [id(outer)]
    cache.release_deferred(spark)
    assert not outer.storageLevel.useMemory


def test_scoped_release_spares_other_threads_registrations(spark):
    """A persist registered by ANOTHER thread while a scope is open is
    neither released nor dropped from the pool (ADVICE r11: the old
    id-snapshot swept anything any thread registered during the block
    — a concurrent host query or second stream lost its persists).
    The scope's own registration is still swept."""
    import threading

    spark.catalog.clearCache()
    cache.release_deferred(spark)

    other: list = []

    def host_thread():
        df = cache.deferred_persist(spark.range(40).toDF("h"))
        df.count()
        other.append(df)

    with cache.scoped_release():
        mine = cache.deferred_persist(spark.range(30).toDF("m"))
        mine.count()
        t = threading.Thread(target=host_thread)
        t.start()
        t.join()

    assert not mine.storageLevel.useMemory  # own registration swept
    assert other[0].storageLevel.useMemory  # other thread's spared...
    with cache._LOCK:  # ...and still pooled for the boundary sweep
        assert [id(df) for df, _ in cache._PENDING] == [id(other[0])]
    cache.release_deferred(spark)
    assert not other[0].storageLevel.useMemory


def test_scoped_release_leaves_tracked_checkpoints_alone(spark):
    """A tracked localCheckpoint created inside the scope must NOT be
    swept by scoped_release (a swept checkpoint cannot recompute); it
    stays registered for the eventual boundary sweep."""
    spark.catalog.clearCache()
    cache.release_deferred(spark)

    with cache.scoped_release():
        df = cache.tracked_local_checkpoint(spark.range(70).toDF("n"))
        df.count()
        with cache._LOCK:
            tracked = set(cache._TRACKED_RDD_IDS)
        assert tracked

    with cache._LOCK:
        assert set(cache._TRACKED_RDD_IDS) == tracked
    assert df.count() == 70  # blocks still alive
    cache.release_deferred(spark)


def test_scoped_release_shared_object_keeps_other_threads_pool_entry(spark):
    """Review r12: when ANOTHER thread registers the SAME DataFrame
    object during a scope, the scope's exit sweeps only ITS OWN entry
    — the other thread's registration stays pooled for the boundary
    sweep (the shared cache entry is object-level and does get
    released, but a released persist recomputes; a dropped pool entry
    would leak the re-persist forever)."""
    import threading

    spark.catalog.clearCache()
    cache.release_deferred(spark)

    shared = spark.range(25).toDF("s")

    def host_thread():
        cache.deferred_persist(shared)

    with cache.scoped_release():
        cache.deferred_persist(shared)
        shared.count()
        t = threading.Thread(target=host_thread)
        t.start()
        t.join()
        with cache._LOCK:
            assert len(cache._PENDING) == 2

    with cache._LOCK:  # the other thread's entry survived the sweep
        assert [id(df) for df, _ in cache._PENDING] == [id(shared)]
    cache.release_deferred(spark)
