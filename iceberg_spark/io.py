"""Pluggable file IO for the metadata layer.

Mirrors the reference's FileIO abstraction
(api/src/main/java/org/apache/iceberg/io/FileIO.java:37 —
newInputFile / newOutputFile / deleteFile), which is what lets the
same table code run on HDFS, S3, GCS, and Azure
(aws/.../s3/S3FileIO.java:94, core/.../hadoop/HadoopFileIO.java).
A 100 TB deployment lives on object storage; nothing in the engine's
metadata path may assume `os.*` works on the warehouse.

Two implementations, chosen per-path by scheme:

* ``LocalFileIO`` — plain paths (and a fallback). Direct os calls,
  byte-identical to the engine's historical behavior, zero overhead.
* ``HadoopFileIO`` — any scheme-prefixed path (``file://``,
  ``hdfs://``, ``s3a://``, ``gs://``, ``abfs://`` …). Drives Spark's
  own JVM ``org.apache.hadoop.fs.FileSystem`` through the py4j
  gateway, so every filesystem Spark can reach works with NO new
  Python dependencies, and credentials/conf come from the same
  ``hadoopConfiguration`` Spark's data-file IO uses.

Data files never come through here: Spark reads and writes them with
its native Hadoop FS integration. This module carries the
Python-side metadata traffic — metadata.json versions and their CAS,
parquet manifests/manifest-lists, Puffin blobs, Avro import files,
version hints, view/namespace registries — which is small per object
but correctness-critical.

Commit CAS semantics per implementation (HadoopTableOperations,
core/.../hadoop/HadoopTableOperations.java):
* local — write temp, ``os.link`` temp → target (atomic
  fail-if-exists), unlink temp;
* hadoop — write temp, ``FileSystem.rename`` temp → target (HDFS
  rename does not replace an existing destination; on S3A this is
  the documented non-atomic caveat that the reference shares — use a
  real catalog for object-store commit arbitration).
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid
from typing import Iterator, Optional
from urllib.parse import unquote, urlparse

_SCHEME_RE = None


def _scheme(path: str) -> str:
    """'' for plain paths, else the URI scheme ('file', 's3a', ...)."""
    # fast path: absolute/relative posix path (the overwhelming default)
    if path.startswith("/") or ":" not in path.split("/", 1)[0]:
        return ""
    return urlparse(path).scheme


def strip_scheme(path: str) -> str:
    """file:-family URI -> plain local path; other paths unchanged.
    Used where local-path and file:-URI spellings of the SAME file must
    compare equal (manifest entries vs Spark's _metadata.file_path)."""
    if path.startswith("file:"):
        u = urlparse(path)
        return unquote(u.path)
    return path


def uri_encoding_invariant(path: str) -> bool:
    """True when the path prints IDENTICALLY in Spark's percent-encoded
    `_metadata.file_path` URI spelling — i.e. no character needs
    escaping. The overwhelmingly common case (uuid file names under
    ascii warehouse dirs), and the license for the cheap comparison
    path below."""
    from urllib.parse import quote

    return quote(path, safe="/:") == path


def decode_spark_path_col(c, paths=None):
    """Column twin of strip_scheme for Spark's `_metadata.file_path`:
    the reader reports a percent-ENCODED URI (a space in a partition
    value prints %20, a literal %% prints %25, '+' stays raw), while
    manifests store RAW paths — comparing the two without decoding
    silently misses every file under a value-with-space partition dir
    (MoR deletes would leave those rows alive). url_decode is
    form-decoding ('+' -> space), so literal plus signs are pre-escaped
    to %2B first; then the file: scheme normalizes to a plain path.

    `paths`: the exhaustive candidate set the column can hold. When
    every one is invariant under URI encoding, the per-row decode
    (regexp + url_decode — measured 2-3x a narrow MoR scan at 10%%
    deletes) collapses to the plain scheme-strip."""
    from pyspark.sql import functions as F

    if paths is not None and all(uri_encoding_invariant(p) for p in paths):
        return F.regexp_replace(c, "^file:/+", "/")
    return F.regexp_replace(
        F.url_decode(F.regexp_replace(c, r"\+", "%2B")),
        "^file:/+", "/")


class InputFile:
    """api/.../io/InputFile.java surface."""

    def __init__(self, io: "FileIO", path: str):
        self.io = io
        self.location = path

    def exists(self) -> bool:
        return self.io.exists(self.location)

    def length(self) -> int:
        return self.io.size(self.location)

    def read(self) -> bytes:
        return self.io.read_bytes(self.location)


class OutputFile:
    """api/.../io/OutputFile.java surface: create() fails if the file
    exists (the object-store-safe primitive); createOrOverwrite
    replaces."""

    def __init__(self, io: "FileIO", path: str):
        self.io = io
        self.location = path

    def create(self, data: bytes):
        self.io.write_atomic(self.location, data)

    def create_or_overwrite(self, data: bytes):
        self.io.write_bytes(self.location, data)


class FileIO:
    """Base surface. Callers hold one per table location (resolve_io)."""

    def new_input(self, path: str) -> InputFile:
        return InputFile(self, path)

    def new_output(self, path: str) -> OutputFile:
        return OutputFile(self, path)

    # -- primitive operations (implemented per backend) ----------------------
    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes):
        raise NotImplementedError

    def write_atomic(self, path: str, data: bytes):
        """Publish `data` at `path` with atomic visibility, failing with
        FileExistsError when the target already exists — the version-file
        CAS underneath every commit."""
        raise NotImplementedError

    def delete_file(self, path: str):
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def is_dir(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime(self, path: str):
        """Modification time in epoch seconds, None if unstattable."""
        raise NotImplementedError

    def list(self, path: str) -> list:
        """Basenames of the direct children of a directory ([] if the
        directory does not exist)."""
        raise NotImplementedError

    def walk_files(self, path: str) -> Iterator[str]:
        """All file paths under `path`, recursively, full paths."""
        raise NotImplementedError

    def walk_file_status(self, path: str):
        """(path, mtime_seconds|None) for every file under `path`."""
        raise NotImplementedError

    def mkdirs(self, path: str):
        raise NotImplementedError

    def rename(self, src: str, dst: str):
        """Move src to dst; raises FileExistsError if dst exists."""
        raise NotImplementedError

    def delete_dir(self, path: str):
        raise NotImplementedError

    # -- text conveniences ----------------------------------------------------
    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode("utf-8")

    def write_text(self, path: str, text: str):
        self.write_bytes(path, text.encode("utf-8"))


class LocalFileIO(FileIO):
    """Direct os/shutil calls; accepts plain paths (and tolerates
    file:-scheme spellings by stripping them)."""

    @staticmethod
    def _p(path: str) -> str:
        return strip_scheme(path)

    def read_bytes(self, path: str) -> bytes:
        with open(self._p(path), "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes):
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    def write_atomic(self, path: str, data: bytes):
        p = self._p(path)
        d = os.path.dirname(p)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{_uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, p)  # atomic fail-if-exists
        finally:
            os.unlink(tmp)

    def delete_file(self, path: str):
        os.unlink(self._p(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))

    def size(self, path: str) -> int:
        return os.path.getsize(self._p(path))

    def mtime(self, path: str):
        try:
            return os.path.getmtime(self._p(path))
        except OSError:
            return None

    def list(self, path: str) -> list:
        p = self._p(path)
        return os.listdir(p) if os.path.isdir(p) else []

    def walk_files(self, path: str) -> Iterator[str]:
        for root, _dirs, files in os.walk(self._p(path)):
            for fn in files:
                yield os.path.join(root, fn)

    def walk_file_status(self, path: str):
        for p in self.walk_files(path):
            try:
                yield p, os.path.getmtime(p)
            except OSError:
                yield p, None

    def mkdirs(self, path: str):
        os.makedirs(self._p(path), exist_ok=True)

    def rename(self, src: str, dst: str):
        s, d = self._p(src), self._p(dst)
        if os.path.exists(d):
            raise FileExistsError(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        os.rename(s, d)

    def delete_dir(self, path: str):
        shutil.rmtree(self._p(path), ignore_errors=True)


class HadoopFileIO(FileIO):
    """JVM org.apache.hadoop.fs.FileSystem via the py4j gateway —
    core/.../hadoop/HadoopFileIO.java without leaving Spark's process.
    One instance per SparkSession; FileSystem objects are cached per
    (scheme, authority) by Hadoop itself."""

    def __init__(self, spark, conf_overrides: dict = None):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        if conf_overrides:
            # clone, then overlay: vended credentials must configure THIS
            # FileIO only, never mutate the shared session conf
            conf = self._jvm.org.apache.hadoop.conf.Configuration(
                self._conf)
            for k, v in conf_overrides.items():
                conf.set(str(k), str(v))
            self._conf = conf

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p):
        return p.getFileSystem(self._conf)

    @staticmethod
    def _is_missing(err) -> bool:
        s = str(err)
        return ("FileNotFoundException" in s
                or "PathNotFoundException" in s
                or "does not exist" in s)

    def read_bytes(self, path: str) -> bytes:
        p = self._path(path)
        try:
            stream = self._fs(p).open(p)
        except Exception as e:  # Py4JJavaError
            if self._is_missing(e):
                raise FileNotFoundError(path) from None
            raise
        try:
            bos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, bos, 1 << 16, False)
            return bytes(bos.toByteArray())
        finally:
            stream.close()

    def _write(self, path: str, data: bytes, overwrite: bool):
        p = self._path(path)
        out = self._fs(p).create(p, overwrite)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def write_bytes(self, path: str, data: bytes):
        self._write(path, data, True)

    def write_atomic(self, path: str, data: bytes):
        p = self._path(path)
        fs = self._fs(p)
        parent = p.getParent()
        tmp = self._jvm.org.apache.hadoop.fs.Path(
            parent, f".tmp-{_uuid.uuid4().hex}")
        self._write(tmp.toString(), data, True)
        # HDFS/local rename does NOT replace an existing destination —
        # the HadoopTableOperations commit primitive
        if not fs.rename(tmp, p):
            fs.delete(tmp, False)
            raise FileExistsError(path)

    def delete_file(self, path: str):
        p = self._path(path)
        if not self._fs(p).delete(p, False):
            raise FileNotFoundError(path)

    def exists(self, path: str) -> bool:
        p = self._path(path)
        return self._fs(p).exists(p)

    def is_dir(self, path: str) -> bool:
        p = self._path(path)
        fs = self._fs(p)
        return fs.exists(p) and fs.getFileStatus(p).isDirectory()

    def size(self, path: str) -> int:
        p = self._path(path)
        return self._fs(p).getFileStatus(p).getLen()

    def mtime(self, path: str):
        p = self._path(path)
        try:
            return self._fs(p).getFileStatus(p)                 .getModificationTime() / 1000.0
        except Exception:
            return None

    def list(self, path: str) -> list:
        p = self._path(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return []
        return [st.getPath().getName() for st in fs.listStatus(p)]

    def walk_files(self, path: str) -> Iterator[str]:
        for p, _m in self.walk_file_status(path):
            yield p

    def walk_file_status(self, path: str):
        p = self._path(path)
        fs = self._fs(p)
        if not fs.exists(p):
            return
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            yield (st.getPath().toString(),
                   st.getModificationTime() / 1000.0)

    def mkdirs(self, path: str):
        p = self._path(path)
        self._fs(p).mkdirs(p)

    def rename(self, src: str, dst: str):
        s, d = self._path(src), self._path(dst)
        fs = self._fs(s)
        if fs.exists(d):
            raise FileExistsError(dst)
        fs.mkdirs(d.getParent())
        if not fs.rename(s, d):
            raise OSError(f"rename failed: {src} -> {dst}")

    def delete_dir(self, path: str):
        p = self._path(path)
        self._fs(p).delete(p, True)


class ArrowFileIO(FileIO):
    """pyarrow.fs-backed IO — the EXECUTOR-side fallback. Python workers
    have no py4j gateway, so scheme-prefixed paths reached inside
    mapInPandas tasks (deletion-vector Puffin writes, bulk deletes) use
    pyarrow's built-in filesystems (S3/GCS/local) instead. Driver-side
    code prefers HadoopFileIO, which shares Spark's credentials/conf."""

    @staticmethod
    def _fs(path: str):
        import pyarrow.fs as pafs

        # hadoop spellings pyarrow doesn't know -> its s3 implementation
        for alias in ("s3a://", "s3n://"):
            if path.startswith(alias):
                path = "s3://" + path[len(alias):]
        return pafs.FileSystem.from_uri(path)

    def read_bytes(self, path: str) -> bytes:
        fs, rel = self._fs(path)
        with fs.open_input_stream(rel) as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes):
        fs, rel = self._fs(path)
        import posixpath

        fs.create_dir(posixpath.dirname(rel), recursive=True)
        with fs.open_output_stream(rel) as f:
            f.write(data)

    def delete_file(self, path: str):
        fs, rel = self._fs(path)
        fs.delete_file(rel)

    def exists(self, path: str) -> bool:
        import pyarrow.fs as pafs

        fs, rel = self._fs(path)
        return fs.get_file_info(rel).type != pafs.FileType.NotFound

    def size(self, path: str) -> int:
        fs, rel = self._fs(path)
        return fs.get_file_info(rel).size


_LOCAL = LocalFileIO()
_ARROW = ArrowFileIO()
_HADOOP: dict = {}  # id(sparkContext) -> HadoopFileIO


# vended storage credentials (REST loadTable `storage-credentials`,
# open-api/rest-catalog-open-api.yaml): per-prefix FileIO configuration a
# catalog hands the client so it can reach storage WITHOUT ambient
# credentials — the reference maps these into FileIO construction
# properties (S3FileIO access keys etc.); the engine analog overlays
# them onto a per-prefix Hadoop Configuration clone.
_VENDED_CONF: dict = {}  # prefix -> {conf key: value}


def register_vended_conf(prefix: str, conf: dict):
    """Record vended FileIO config for every path under `prefix`.
    Merging is per-key, newest wins (credential refresh semantics)."""
    cur = _VENDED_CONF.setdefault(prefix, {})
    cur.update({str(k): str(v) for k, v in (conf or {}).items()})


def _at_boundary(path: str, prefix: str) -> bool:
    # a prefix must end at itself or a '/' boundary: credentials vended
    # for .../tables/t1 must NOT leak onto the sibling .../tables/t10
    p = prefix.rstrip("/")
    return path == p or path.startswith(p + "/")


def vended_conf_for(path: str) -> dict:
    merged: dict = {}
    sp = strip_scheme(path)
    for prefix in sorted(_VENDED_CONF):  # longest prefix applied last
        if _at_boundary(path, prefix) \
                or _at_boundary(sp, strip_scheme(prefix)):
            merged.update(_VENDED_CONF[prefix])
    return merged


def apply_vended_credentials(load_result: dict):
    """Map a REST loadTable response's `storage-credentials` into client
    state: `encryption.key.<id>` entries register table master keys
    (the engine's decryption-credential analog of vended object-store
    keys); everything else overlays the prefix's FileIO configuration.
    Returns the number of credential entries applied."""
    n = 0
    for cred in load_result.get("storage-credentials", []) or []:
        prefix = cred.get("prefix") or ""
        fs_conf = {}
        for k, v in (cred.get("config") or {}).items():
            if k.startswith("encryption.key."):
                from .parquet_crypto import register_key

                register_key(k[len("encryption.key."):], v)
            else:
                fs_conf[k] = v
            n += 1
        if fs_conf:
            register_vended_conf(prefix, fs_conf)
    return n


def resolve_io(path: str, spark=None) -> FileIO:
    """FileIO for `path` by scheme: plain paths stay on the zero-overhead
    local implementation; ANY scheme (including file://) routes through
    the Hadoop FileSystem, so a scheme-prefixed warehouse exercises the
    exact code path an s3a:// or hdfs:// deployment runs. Paths under a
    vended-credentials prefix get a dedicated FileIO configured with the
    vended entries (cached per session + config)."""
    if _scheme(path) == "":
        return _LOCAL
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            # no JVM gateway (executor task or pure-python context):
            # file: is plain local; other schemes go through pyarrow.fs
            if path.startswith("file:"):
                return _LOCAL
            return _ARROW
    vended = vended_conf_for(path) if _VENDED_CONF else {}
    if vended:
        key = (id(spark.sparkContext),
               tuple(sorted(vended.items())))
        io = _HADOOP.get(key)
        if io is None:
            io = _HADOOP[key] = HadoopFileIO(spark,
                                             conf_overrides=vended)
        return io
    key = id(spark.sparkContext)
    io = _HADOOP.get(key)
    if io is None:
        io = _HADOOP[key] = HadoopFileIO(spark)
    return io


# -- module-level conveniences (resolve per call) ----------------------------

def read_bytes(path: str) -> bytes:
    return resolve_io(path).read_bytes(path)


def read_text(path: str) -> str:
    return resolve_io(path).read_text(path)


def write_bytes(path: str, data: bytes):
    resolve_io(path).write_bytes(path, data)


def write_text(path: str, text: str):
    resolve_io(path).write_text(path, text)


def exists(path: str) -> bool:
    return resolve_io(path).exists(path)


def delete_file(path: str):
    resolve_io(path).delete_file(path)


def read_parquet(path: str, **kw):
    """pyarrow parquet read through the path's FileIO: plain local paths
    go straight to pyarrow (mmap'd, zero copies added); scheme-prefixed
    paths fetch bytes through the FileIO and parse in memory — metadata
    parquet (manifests, stats) is small by construction."""
    import pyarrow.parquet as pq

    io = resolve_io(path)
    if io is _LOCAL:
        return pq.read_table(strip_scheme(path), **kw)
    import pyarrow as pa

    return pq.read_table(pa.BufferReader(io.read_bytes(path)), **kw)


def read_parquet_schema(path: str):
    import pyarrow.parquet as pq

    io = resolve_io(path)
    if io is _LOCAL:
        return pq.read_schema(strip_scheme(path))
    import pyarrow as pa

    return pq.read_schema(pa.BufferReader(io.read_bytes(path)))


def write_parquet(table, path: str, compression: str = "zstd") -> int:
    """pyarrow parquet write through the path's FileIO; returns the
    written length (manifest metadata wants it)."""
    import pyarrow.parquet as pq

    io = resolve_io(path)
    if io is _LOCAL:
        p = strip_scheme(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        pq.write_table(table, p, compression=compression)
        return os.path.getsize(p)
    import io as _pyio

    buf = _pyio.BytesIO()
    pq.write_table(table, buf, compression=compression)
    data = buf.getvalue()
    io.write_bytes(path, data)
    return len(data)


def parquet_file(path: str):
    """pq.ParquetFile through the path's FileIO (footer/metadata reads)."""
    import pyarrow.parquet as pq

    io = resolve_io(path)
    if io is _LOCAL:
        return pq.ParquetFile(strip_scheme(path))
    import pyarrow as pa

    return pq.ParquetFile(pa.BufferReader(io.read_bytes(path)))


def file_size(path: str) -> int:
    io = resolve_io(path)
    if io is _LOCAL:
        return os.path.getsize(strip_scheme(path))
    return io.size(path)


def copy_tree(src: str, dst: str):
    """Recursive copy across FileIOs (table registration by copy). Both
    local -> shutil; otherwise stream file-by-file through the IOs."""
    sio, dio = resolve_io(src), resolve_io(dst)
    if sio is _LOCAL and dio is _LOCAL:
        s, d = strip_scheme(src), strip_scheme(dst)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copytree(s, d)
        return
    base = src.rstrip("/")
    for f in sio.walk_files(base):
        rel = strip_scheme(f)[len(strip_scheme(base)):].lstrip("/")
        dio.write_bytes(os.path.join(dst, rel), sio.read_bytes(f))
