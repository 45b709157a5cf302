"""Location providers (reference LocationProviders.java):
`write.object-storage.enabled` entropy-prefixed data paths and
`write.data.path` external data roots, through write/scan/row-op/
maintenance lifecycles."""

import os
import re

from pyspark.sql import functions as F

from iceberg_spark.expressions import col
from iceberg_spark.locations import data_roots, entropy_dirs, new_data_dir
from iceberg_spark.table import Catalog


def test_entropy_dirs_shape_and_determinism():
    d = entropy_dirs("part-0001.parquet")
    assert re.fullmatch(r"[01]{4}/[01]{4}/[01]{4}/[01]{8}", d)
    assert entropy_dirs("part-0001.parquet") == d
    assert entropy_dirs("part-0002.parquet") != d  # spread


def test_object_storage_layout_lifecycle(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(30).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("grp"))
    t = cat.create_table("db.objs", df.schema, partition_by=["grp"],
                         properties={"write.object-storage.enabled": "true"})
    t.append(df)
    t = cat.load_table("db.objs")
    files = [e.file.file_path for e in t.scan().plan_files().files]
    assert files
    data_root = os.path.join(t.location, "data")
    for p in files:
        rel = os.path.relpath(p, data_root)
        # entropy prefix: 4 binary dirs before the batch dir
        assert re.match(r"[01]{4}/[01]{4}/[01]{4}/[01]{8}/", rel), rel
    # full row-op + compaction lifecycle under the hashed layout
    t.delete_where(col("id") < 5, mode="merge-on-read")
    t = cat.load_table("db.objs")
    assert t.to_df().count() == 25
    from iceberg_spark.maintenance import (remove_orphan_files,
                                           rewrite_data_files)

    rewrite_data_files(t)
    t = cat.load_table("db.objs")
    assert t.to_df().count() == 25
    # drop untracked strays under an entropy prefix AND the plain root:
    # the orphan walk must descend hashed dirs and find both
    stray1 = os.path.join(t.location, "data", "0101", "0011", "1100",
                          "10101010", "stray.parquet")
    stray2 = os.path.join(t.location, "data", "stray-top.parquet")
    os.makedirs(os.path.dirname(stray1), exist_ok=True)
    for s in (stray1, stray2):
        with open(s, "wb") as fh:
            fh.write(b"junk")
    orphans = remove_orphan_files(t, older_than_ms=2**62, dry_run=True)
    assert {stray1, stray2} <= set(orphans)
    removed = remove_orphan_files(t, older_than_ms=2**62)
    assert sorted(removed) == sorted(orphans)
    assert not os.path.exists(stray1) and not os.path.exists(stray2)
    assert t.refresh().to_df().count() == 25


def test_write_data_path_external_root(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    ext = str(tmp_path / "bucket-data")
    df = spark.range(10).select(F.col("id"))
    t = cat.create_table("db.ext", df.schema,
                         properties={"write.data.path": ext})
    t.append(df)
    t = cat.load_table("db.ext")
    files = [e.file.file_path for e in t.scan().plan_files().files]
    assert files and all(p.startswith(ext) for p in files)
    assert t.to_df().count() == 10
    assert set(data_roots(t)) == {os.path.join(t.location, "data"), ext}
    # orphan cleanup walks the external root too
    t.append(df.withColumn("id", F.col("id") + 10))
    t = cat.load_table("db.ext")
    from iceberg_spark.maintenance import rewrite_data_files, \
        remove_orphan_files

    rewrite_data_files(t, min_input_files=2)
    t = cat.load_table("db.ext")
    # untracked strays under BOTH roots (default <location>/data and the
    # external write.data.path) — the walk must cover each
    stray_ext = os.path.join(ext, "stray-ext.parquet")
    stray_def = os.path.join(t.location, "data", "stray-def.parquet")
    os.makedirs(os.path.dirname(stray_def), exist_ok=True)
    for s in (stray_ext, stray_def):
        with open(s, "wb") as fh:
            fh.write(b"junk")
    orphans = remove_orphan_files(t, older_than_ms=2**62, dry_run=True)
    assert {stray_ext, stray_def} <= set(orphans)
    remove_orphan_files(t, older_than_ms=2**62)
    assert not os.path.exists(stray_ext) and not os.path.exists(stray_def)
    assert t.refresh().to_df().count() == 20


def test_new_data_dir_plain_default(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.range(3).select(F.col("id"))
    t = cat.create_table("db.plain", df.schema)
    d = new_data_dir(t)
    root = os.path.join(t.location, "data")
    assert d.startswith(root)
    # no entropy prefix without write.object-storage.enabled: the batch
    # dir sits DIRECTLY under <location>/data
    assert "/" not in os.path.relpath(d, root)
