"""Location providers — where new data files land.

Reference core/src/main/java/org/apache/iceberg/LocationProviders.java:
DefaultLocationProvider writes under `write.data.path` (falling back to
`<table-location>/data`); ObjectStoreLocationProvider
(`write.object-storage.enabled=true`) additionally prefixes paths with
a binary-string HASH of the file name so object-store keys spread
across prefix ranges — S3-style stores rate-limit per key prefix, and
a sequential `data/part-0001..` layout funnels a 1000-executor write
into one throttled prefix. The hash shape is the reference's exactly
(ObjectStoreLocationProvider.computeHash/dirsFromHash): murmur3_32 of
the name, last 20 bits as a binary string, split `1001/1001/1001/
10011001` (3 dirs of 4 bits + the remaining 8) — bounded directory
fanout keeps orphan-file listing efficient.

Engine granularity note: Spark's native parquet writer names its own
task files, so entropy applies to the engine's per-WRITE-BATCH
directory (each append/compaction group gets its own hashed prefix —
executor-parallel writes of one job still share it); the engine-named
writers (encrypted data files, delete files, DVs) could carry per-file
entropy but use the same batch-dir convention for one orphan-walk
layout.
"""

from __future__ import annotations

import os
import uuid as _uuid

from .murmur3 import hash_string

DATA_PATH_PROP = "write.data.path"  # TableProperties.WRITE_DATA_LOCATION
OBJECT_STORAGE_PROP = "write.object-storage.enabled"

_HASH_BITS = 20
_DIR_LEN = 4
_DIR_DEPTH = 3


def entropy_dirs(name: str) -> str:
    """murmur3_32(name) -> '1001/1001/1001/10011001' (reference
    dirsFromHash shape)."""
    h = hash_string(name) & 0xFFFFFFFF
    bits = format(h, "032b")[-_HASH_BITS:]
    parts = [bits[i:i + _DIR_LEN] for i in range(0, _DIR_DEPTH * _DIR_LEN,
                                                 _DIR_LEN)]
    parts.append(bits[_DIR_DEPTH * _DIR_LEN:])
    return "/".join(parts)


def data_roots(table) -> list:
    """All roots that may hold the table's data files (orphan walks must
    cover both the default root and a configured write.data.path)."""
    default = os.path.join(table.location, "data")
    custom = table.metadata.properties.get(DATA_PATH_PROP)
    roots = [default]
    if custom and custom.rstrip("/") != default.rstrip("/"):
        roots.append(custom.rstrip("/"))
    return roots


def new_data_dir(table, prefix: str = "") -> str:
    """A fresh directory for one write batch, under the configured data
    root, entropy-prefixed when object-storage layout is enabled."""
    props = table.metadata.properties
    root = (props.get(DATA_PATH_PROP) or "").rstrip("/") \
        or os.path.join(table.location, "data")
    name = f"{prefix}{_uuid.uuid4().hex}"
    if str(props.get(OBJECT_STORAGE_PROP, "false")).lower() == "true":
        return os.path.join(root, entropy_dirs(name), name)
    return os.path.join(root, name)
