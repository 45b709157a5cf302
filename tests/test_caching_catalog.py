"""CachingCatalog TTL wrapper (reference core/.../CachingCatalog.java;
cache-enabled / cache.expiration-interval-ms from
CatalogProperties.java:42-66)."""

from pyspark.sql import types as T

from iceberg_spark.catalogs import CachingCatalog


def _schema():
    return T.StructType([T.StructField("id", T.LongType()),
                         T.StructField("v", T.StringType())])


def test_load_table_cached_until_ttl(catalog, spark):
    cc = CachingCatalog(catalog, expiration_interval_ms=-1)
    t0 = cc.create_table("db.cc1", _schema())
    a = cc.load_table("db.cc1")
    b = cc.load_table("db.cc1")
    assert a is b  # same object until expiry
    assert t0 is not a  # create invalidates; next load repopulates
    # refresh always goes to storage, cache or not
    df = spark.createDataFrame([(1, "x")], _schema())
    a.append(df)
    assert cc.load_table("db.cc1") is a  # still cached (stale by design)
    assert a.refresh().to_df().count() == 1


def test_ttl_expiry_and_invalidation(catalog, spark):
    cc = CachingCatalog(catalog, expiration_interval_ms=60_000)
    cc.create_table("db.cc2", _schema())
    a = cc.load_table("db.cc2")
    # simulate clock advance past the TTL
    base = cc._clock
    cc._clock = lambda: base() + 61.0
    b = cc.load_table("db.cc2")
    assert b is not a
    # mutations through the wrapper invalidate eagerly
    cc.rename_table("db.cc2", "db.cc2b")
    c = cc.load_table("db.cc2b")
    assert c is not b
    cc.drop_table("db.cc2b")
    assert not cc.table_exists("db.cc2b")  # passthrough


def test_wrap_honors_properties(catalog):
    assert CachingCatalog.wrap(catalog, {"cache-enabled": "false"}) is catalog
    assert CachingCatalog.wrap(
        catalog, {"cache.expiration-interval-ms": 0}) is catalog
    w = CachingCatalog.wrap(catalog, {})
    assert isinstance(w, CachingCatalog)
    w2 = CachingCatalog.wrap(catalog, {"cache.expiration-interval-ms": -1})
    assert isinstance(w2, CachingCatalog) and w2._ttl < 0


def test_register_table_invalidates(catalog, spark, tmp_path):
    """reference CachingCatalog.registerTable: re-registering an
    identifier must evict the cached stale Table immediately, not at
    TTL."""
    from iceberg_spark.sources.iceberg import export_reference_metadata

    cc = CachingCatalog(catalog, expiration_interval_ms=-1)
    t = cc.create_table("db.cc_src", _schema())
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], _schema()))
    mpath = export_reference_metadata(t.refresh(), str(tmp_path / "exp"))

    cc.create_table("db.cc_reg", _schema())
    stale = cc.load_table("db.cc_reg")
    assert stale.to_df().count() == 0
    # drop only through the DELEGATE — the wrapper must not rely on the
    # drop's invalidation; register_table alone has to evict
    catalog.drop_table("db.cc_reg")
    cc.register_table("db.cc_reg", mpath)
    fresh = cc.load_table("db.cc_reg")
    assert fresh is not stale
    assert fresh.to_df().count() == 2


def test_register_table_existing_identifier_raises(catalog, spark,
                                                   tmp_path):
    from iceberg_spark.sources.iceberg import export_reference_metadata

    t = catalog.create_table("db.reg_dup", _schema())
    t.append(spark.createDataFrame([(1, "x")], _schema()))
    mpath = export_reference_metadata(t.refresh(), str(tmp_path / "e"))
    import pytest as _pt

    with _pt.raises(ValueError, match="exists"):
        catalog.register_table("db.reg_dup", mpath)
