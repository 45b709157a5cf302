"""FileIO abstraction (io.py — api/.../io/FileIO.java:37 surface):
the metadata layer must run identically whether the warehouse is a
plain local path (LocalFileIO) or a scheme-prefixed URI served by the
JVM Hadoop FileSystem (HadoopFileIO) — the object-storage code path,
proven here on file:// URIs where both backends reach the same disk."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.io import (HadoopFileIO, LocalFileIO, resolve_io,
                              strip_scheme)
from iceberg_spark.metadata import CommitFailedException
from iceberg_spark.table import Catalog


@pytest.fixture()
def hcat(spark, tmp_path):
    """Directory catalog whose warehouse is a file:// URI — every
    metadata read/write/CAS goes through HadoopFileIO."""
    return Catalog(spark, f"file://{tmp_path}/wh")


def test_resolve_io_by_scheme(spark, tmp_path):
    assert isinstance(resolve_io(str(tmp_path)), LocalFileIO)
    assert isinstance(resolve_io(f"file://{tmp_path}"), HadoopFileIO)
    assert isinstance(resolve_io(f"hdfs://nn/{tmp_path}"), HadoopFileIO)
    assert strip_scheme("file:///a/b") == "/a/b"
    assert strip_scheme("file:/a/b") == "/a/b"
    assert strip_scheme("s3a://bkt/a") == "s3a://bkt/a"


def test_fileio_primitives_parity(spark, tmp_path):
    """Both backends implement identical semantics for the primitives
    the metadata layer depends on (atomic CAS above all)."""
    for base in (f"{tmp_path}/l", f"file://{tmp_path}/h"):
        io = resolve_io(base)
        io.mkdirs(base)
        io.write_bytes(f"{base}/a", b"x")
        assert io.read_bytes(f"{base}/a") == b"x"
        io.write_atomic(f"{base}/v1", b"{}")
        with pytest.raises(FileExistsError):
            io.write_atomic(f"{base}/v1", b"{}")
        assert sorted(io.list(base)) == ["a", "v1"]
        with pytest.raises(FileExistsError):
            io.rename(f"{base}/a", f"{base}/v1")
        io.rename(f"{base}/a", f"{base}/b")
        io.delete_file(f"{base}/b")
        assert not io.exists(f"{base}/b")


def test_scheme_prefixed_table_lifecycle(hcat, spark):
    """create → append → MoR delete → update → compact → expire →
    orphan cleanup, all on a file:// warehouse: the full metadata write
    surface through HadoopFileIO."""
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 4).alias("grp"),
        (F.col("id") * 2.0).alias("v"))
    t = hcat.create_table("db.ht", df.schema, partition_by=["grp"])
    assert t.location.startswith("file://")
    t.append(df)
    assert t.refresh().to_df().count() == 100

    # partition pruning still plans through the scheme'd manifests
    plan = t.scan(filter=col("grp") == 1).plan_files()
    assert 0 < len(plan.files) < len(t.scan().plan_files().files)

    # MoR positional delete + scan merge
    t.delete_where(col("id") < 10, mode="merge-on-read")
    t = t.refresh()
    assert t.to_df().count() == 90
    assert t.to_df().where(F.col("id") < 10).count() == 0

    # copy-on-write update
    t.update(col("id") == 50, {"v": 999.0})
    t = t.refresh()
    assert t.to_df().where(F.col("v") == 999.0).count() == 1

    # compaction rewrites data + manifests under the scheme'd location
    from iceberg_spark.maintenance import (expire_snapshots,
                                           remove_orphan_files,
                                           rewrite_data_files)

    res = rewrite_data_files(t, min_input_files=1)
    t = t.refresh()
    assert t.to_df().count() == 90
    assert res["rewritten_files"] >= 1

    # snapshot expiry deletes unreachable files through the FileIO
    n_before = len(t.snapshots())
    expire_snapshots(t, older_than_ms=int(1e18), retain_last=1)
    t = t.refresh()
    assert len(t.snapshots()) < n_before
    assert t.to_df().count() == 90

    # orphan cleanup walks the scheme'd tree; a planted orphan dies
    orphan = os.path.join(strip_scheme(t.location), "data",
                          "orphan-file.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    old = os.path.getmtime(orphan) - 7 * 86400
    os.utime(orphan, (old, old))
    import time as _time

    removed = remove_orphan_files(
        t, older_than_ms=int((_time.time() - 3600) * 1000))
    assert any(p.endswith("orphan-file.parquet") for p in removed)
    assert t.refresh().to_df().count() == 90


def test_scheme_prefixed_commit_cas(hcat, spark):
    """The version CAS holds behind HadoopFileIO: double-commit on the
    same base version must fail (rename-no-clobber semantics)."""
    df = spark.range(0, 5).select("id")
    t = hcat.create_table("db.cas", df.schema)
    t.append(df)
    meta = t.metadata
    with pytest.raises(CommitFailedException):
        t.ops.commit(1, meta)  # v2 exists already


def test_scheme_prefixed_catalog_namespace_ops(hcat, spark):
    hcat.create_namespace("nsx")
    assert hcat.namespace_exists("nsx")
    hcat.update_namespace_properties("nsx", {"owner": "ops"}, [])
    assert hcat.namespace_properties("nsx") == {"owner": "ops"}
    df = spark.range(0, 3).select("id")
    hcat.create_table("nsx.t1", df.schema).append(df)
    assert hcat.list_tables("nsx") == ["nsx.t1"]
    assert "nsx" in hcat.list_namespaces()
    # directory-catalog rename moves the table dir (absolute data paths
    # inside keep pointing at the old location — the reference's
    # HadoopCatalog refuses rename outright for the same reason, so only
    # the registry effect is asserted here)
    hcat.rename_table("nsx.t1", "nsx.t2")
    assert hcat.list_tables("nsx") == ["nsx.t2"]
    assert hcat.drop_table("nsx.t2")
    hcat.drop_namespace("nsx")
    assert not hcat.namespace_exists("nsx")
