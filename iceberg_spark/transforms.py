"""Partition transforms — identity, bucket[N], truncate[W], year/month/day/hour, void.

Reference: api/src/main/java/org/apache/iceberg/transforms/Transforms.java:36,
Bucket.java:39, Truncate.java, Timestamps.java, Dates.java; spec
format/spec.md:568-621 (transforms) and format/spec.md:1050 (partition
predicate projection), format/spec.md:1613 (Appendix B bucket hash).

Each transform provides:
  result_type(src)   - partition value type
  apply(value)       - driver-side Python evaluation (literals, summaries)
  spark_col(col,src) - Spark Column computing the transform on the write path
  monotonic          - whether order-preserving (enables range projection)
Projection of row predicates onto partition predicates (the core of hidden
partitioning) lives in expressions.py and uses these properties.
"""

from __future__ import annotations

import datetime as _dt
import re
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .murmur3 import (hash_bytes, hash_bytes_vec, hash_decimal_unscaled,
                      hash_long, hash_long_vec, hash_string)

_EPOCH = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)

_LONG_LAYOUT = {"int", "long", "date", "time", "timestamp", "timestamp_ntz"}


def _micros_col(col, src):
    """Exact epoch-micros Column. TIMESTAMP is an instant — unix_micros is
    timezone-free. TIMESTAMP_NTZ must NOT route through a timestamp cast
    (that re-interprets wall time in spark.sql.session.timeZone, so a
    library caller with a non-UTC session would get partition values that
    disagree with the Python-side transform eval); instead micros come
    from wall-clock fields, which are timezone-independent on NTZ."""
    if src == "timestamp_ntz":
        days = F.datediff(col.cast("date"), F.lit("1970-01-01")).cast("long")
        secs = (F.hour(col) * F.lit(3600) + F.minute(col) * F.lit(60)
                + F.second(col)).cast("long")
        frac = F.date_format(col, "SSSSSS").cast("long")
        return days * F.lit(86_400_000_000) + secs * F.lit(1_000_000) + frac
    # exact integer micros (double epoch-seconds truncates at us precision)
    return F.unix_micros(col.cast("timestamp"))


def _to_micros(v: Any) -> int:
    """Python datetime/date -> microseconds since epoch (naive, UTC session)."""
    if isinstance(v, _dt.datetime):
        return (v - _EPOCH) // _dt.timedelta(microseconds=1)
    if isinstance(v, _dt.date):
        return ((v - _EPOCH_DATE).days) * 86_400_000_000
    return int(v)


def _to_days(v: Any) -> int:
    if isinstance(v, _dt.datetime):
        return (v.date() - _EPOCH_DATE).days
    if isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days
    return int(v)


class Transform:
    name: str = "?"
    monotonic: bool = False
    preserves_nullity: bool = True  # null -> null, non-null -> non-null

    def result_type(self, src: str) -> str:
        raise NotImplementedError

    def apply(self, v: Any, src: str) -> Any:
        raise NotImplementedError

    def spark_col(self, col: Column, src: str) -> Column:
        raise NotImplementedError

    def can_transform(self, src: str) -> bool:
        try:
            self.result_type(src)
            return True
        except Exception:
            return False

    def to_str(self) -> str:
        return self.name

    def __repr__(self):
        return self.to_str()

    def __eq__(self, other):
        return isinstance(other, Transform) and self.to_str() == other.to_str()

    def __hash__(self):
        return hash(self.to_str())


class Identity(Transform):
    name = "identity"
    monotonic = True

    def result_type(self, src: str) -> str:
        return src

    def apply(self, v, src):
        return v

    def spark_col(self, col, src):
        return col


@dataclass(eq=False)
class Bucket(Transform):
    """(murmur3_x86_32(v) & MaxInt) % N — bit-exact per spec Appendix B."""

    n: int
    name = "bucket"
    monotonic = False

    def to_str(self):
        return f"bucket[{self.n}]"

    def result_type(self, src: str) -> str:
        if src in _LONG_LAYOUT or src in ("string", "uuid", "binary") or src.startswith(
            ("decimal", "fixed")
        ):
            return "int"
        raise ValueError(f"cannot bucket type {src}")

    def hash_value(self, v: Any, src: str) -> int:
        if src in _LONG_LAYOUT:
            if src in ("timestamp", "timestamp_ntz"):
                v = _to_micros(v)
            elif src == "date":
                v = _to_days(v)
            return hash_long(int(v))
        if src == "string":
            return hash_string(str(v))
        if src == "uuid":
            # spec Appendix B [4]: uuids hash as their 16 big-endian
            # bytes (test vector f79c3e09-… -> 1488055340), NOT as the
            # utf-8 of the string form
            import uuid as _uuid

            return hash_bytes(_uuid.UUID(str(v)).bytes)
        if src == "binary" or src.startswith("fixed"):
            return hash_bytes(bytes(v))
        if src.startswith("decimal"):
            m = re.match(r"decimal\((\d+),\s*(\d+)\)", src)
            scale = int(m.group(2))
            from decimal import Decimal

            unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
            return hash_decimal_unscaled(unscaled)
        raise ValueError(f"cannot bucket type {src}")

    def apply(self, v, src):
        if v is None:
            return None
        return (self.hash_value(v, src) & 0x7FFFFFFF) % self.n

    def spark_col(self, col, src):
        n = self.n
        if src in _LONG_LAYOUT:
            # numpy-vectorized murmur3 over the 8-byte long layout
            if src in ("timestamp", "timestamp_ntz"):
                col = _micros_col(col, src)
            elif src == "date":
                col = F.datediff(col, F.lit("1970-01-01")).cast("long")
            else:
                col = col.cast("long")

            @F.pandas_udf(T.IntegerType())
            def _bucket_long(s: pd.Series) -> pd.Series:
                mask = s.notna()
                out = pd.Series(np.zeros(len(s), dtype="float64"), index=s.index)
                if mask.any():
                    h = hash_long_vec(s[mask].to_numpy(dtype="int64"))
                    out[mask] = (h.astype(np.int64) & 0x7FFFFFFF) % n
                out[~mask] = np.nan
                return out.astype("Int32").astype("object").where(mask, None).astype("Int32")

            return _bucket_long(col)

        # string/uuid/binary/fixed: hash straight off the Arrow buffers
        # (offsets + packed bytes) with murmur3.hash_bytes_vec — zero
        # per-row Python, same numpy-pass shape as the long layout. A
        # 100 TB write into a string-bucketed spec hashes at memory
        # bandwidth instead of paying a Python call per row.
        if src == "uuid":
            # spec Appendix B [4]: hash the 16 big-endian uuid bytes —
            # unhex(strip dashes) lowers JVM-side, then the binary
            # branch hashes the fixed-width bytes vectorized
            col = F.unhex(F.regexp_replace(col.cast("string"), "-", ""))
            src = "binary"
        pa_type = "binary" if (src == "binary"
                               or src.startswith("fixed")) else "string"

        @F.pandas_udf(T.IntegerType())
        def _bucket_var(s: pd.Series) -> pd.Series:
            import pyarrow as pa

            arr = pa.Array.from_pandas(
                s, type=pa.binary() if pa_type == "binary" else pa.string())
            bufs = arr.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int32,
                                 count=len(arr) + 1,
                                 offset=arr.offset * 4).astype(np.int64)
            data = (np.frombuffer(bufs[2], dtype=np.uint8)
                    if bufs[2] is not None
                    else np.zeros(0, dtype=np.uint8))
            h = hash_bytes_vec(data, offs)
            bucket = (h.astype(np.int64) & 0x7FFFFFFF) % n
            out = pd.array(bucket, dtype="Int32")
            nulls = arr.is_null().to_numpy(zero_copy_only=False)
            if nulls.any():
                out[nulls] = pd.NA
            return pd.Series(out)

        return _bucket_var(col)


@dataclass(eq=False)
class Truncate(Transform):
    """truncate[W]: ints floor to W-multiples; strings/binary take W-prefix.

    Reference: api/.../transforms/Truncate.java; order-preserving, so range
    predicates project through it.
    """

    width: int
    name = "truncate"
    monotonic = True

    def to_str(self):
        return f"truncate[{self.width}]"

    def result_type(self, src: str) -> str:
        if src in ("int", "long", "string", "binary") or src.startswith("decimal"):
            return src
        raise ValueError(f"cannot truncate type {src}")

    def apply(self, v, src):
        if v is None:
            return None
        w = self.width
        if src in ("int", "long"):
            return int(v) - (int(v) % w if int(v) % w >= 0 else int(v) % w)  # py % is floor
        if src == "string":
            return str(v)[:w]
        if src == "binary":
            return bytes(v)[:w]
        if src.startswith("decimal"):
            from decimal import Decimal

            m = re.match(r"decimal\((\d+),\s*(\d+)\)", src)
            scale = int(m.group(2))
            unscaled = int(Decimal(v).scaleb(scale).to_integral_value())
            trunc = unscaled - (unscaled % w)
            return Decimal(trunc).scaleb(-scale)
        raise ValueError(src)

    def spark_col(self, col, src):
        w = self.width
        if src in ("int", "long"):
            # floor-mod for negatives: v - ((v % w) + w) % w
            return col - (((col % w) + w) % w)
        if src == "string":
            return F.substring(col, 1, w)
        if src == "binary":
            return F.expr(f"substring({col._jc.toString()}, 1, {w})") if False else F.substring(col, 1, w)
        if src.startswith("decimal"):
            m = re.match(r"decimal\((\d+),\s*(\d+)\)", src)
            scale = int(m.group(2))
            unscaled = (col * (10**scale)).cast("long")
            t = unscaled - (((unscaled % w) + w) % w)
            return (t / (10**scale)).cast(f"decimal({m.group(1)},{scale})")
        raise ValueError(src)


@dataclass(eq=False)
class TimeTransform(Transform):
    """year/month/day/hour: timestamps/dates -> int offset from 1970.

    Reference: api/.../transforms/Timestamps.java, Dates.java; spec
    format/spec.md:568. day also accepts `date`; hour only timestamps.
    Monotonic -> range predicates project.
    """

    granularity: str  # year|month|day|hour
    monotonic = True

    def to_str(self):
        return self.granularity

    @property
    def name(self):
        return self.granularity

    def result_type(self, src: str) -> str:
        if src == "date" and self.granularity in ("year", "month", "day"):
            return "int" if self.granularity != "day" else "date"
        if src in ("timestamp", "timestamp_ntz"):
            return "date" if self.granularity == "day" else "int"
        raise ValueError(f"cannot apply {self.granularity} to {src}")

    def apply(self, v, src):
        if v is None:
            return None
        if isinstance(v, str):
            v = (
                _dt.datetime.fromisoformat(v)
                if src.startswith("timestamp")
                else _dt.date.fromisoformat(v)
            )
        if isinstance(v, _dt.datetime):
            d = v.date()
        elif isinstance(v, _dt.date):
            d = v
        else:  # epoch micros
            d = (_EPOCH + _dt.timedelta(microseconds=int(v))).date()
            v = _EPOCH + _dt.timedelta(microseconds=int(v))
        g = self.granularity
        if g == "year":
            return d.year - 1970
        if g == "month":
            return (d.year - 1970) * 12 + (d.month - 1)
        if g == "day":
            return d  # stored as date per spec v3+ (human-readable)
        if g == "hour":
            return _to_micros(v) // 3_600_000_000
        raise ValueError(g)

    def spark_col(self, col, src):
        g = self.granularity
        if g == "year":
            return (F.year(col) - 1970).cast("int")
        if g == "month":
            return ((F.year(col) - 1970) * 12 + F.month(col) - 1).cast("int")
        if g == "day":
            return F.to_date(col)
        if g == "hour":
            return F.floor(
                _micros_col(col, src) / F.lit(3_600_000_000)).cast("int")
        raise ValueError(g)


class Void(Transform):
    """Always null — used to drop a partition field. Reference VoidTransform.java."""

    name = "void"
    preserves_nullity = False

    def result_type(self, src):
        return src

    def apply(self, v, src):
        return None

    def spark_col(self, col, src):
        return F.lit(None)


# Spark SQL type strings for variant_get target types
_SPARK_TYPE_STR = {
    "int": "int", "long": "bigint", "float": "float", "double": "double",
    "string": "string", "boolean": "boolean", "date": "date",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp_ntz",
}


@dataclass(frozen=True)
class VariantExtract(Transform):
    """extract(path, type): typed access into a v3 `variant` column.

    Reference api/src/main/java/org/apache/iceberg/expressions/
    UnboundExtract.java and format/spec.md:243. Variant paths carry no
    column statistics, so every metadata evaluator treats extract
    predicates as might-match (pruning no-op); the data-level filter
    lowers to Spark's variant_get, which vectorizes JVM-side.
    """

    path: str  # e.g. "$.a.b" or "$.tags[0]"
    type: str = "string"

    name = "extract"
    monotonic = False
    preserves_nullity = False  # a missing path yields null

    def __repr__(self):
        return f"extract[{self.path} as {self.type}]"

    def result_type(self, src: str) -> str:
        return self.type

    def can_transform(self, src: str) -> bool:
        return src == "variant"

    def apply(self, v: Any, src: str) -> Any:
        """Driver-side eval (row Evaluator): walk the path over a parsed
        JSON value / VariantVal and coerce to the target type."""
        if v is None:
            return None
        import json

        if hasattr(v, "toPython"):  # pyspark VariantVal
            v = v.toPython()
        elif isinstance(v, (str, bytes)):
            try:
                v = json.loads(v)
            except Exception:
                return None
        cur = v
        for step in re.findall(r"\.([A-Za-z_][\w]*)|\[(\d+)\]",
                               self.path.lstrip("$")):
            key, idx = step
            try:
                cur = cur[key] if key else cur[int(idx)]
            except (KeyError, IndexError, TypeError):
                return None
        if cur is None:
            return None
        try:
            if self.type in ("int", "long"):
                return int(cur)
            if self.type in ("float", "double"):
                return float(cur)
            if self.type == "string":
                return cur if isinstance(cur, str) else json.dumps(cur)
            if self.type == "boolean":
                return bool(cur)
        except (TypeError, ValueError):
            return None
        return cur

    def spark_col(self, col: Column, src: str) -> Column:
        return F.variant_get(col, self.path,
                             _SPARK_TYPE_STR.get(self.type, self.type))


_TRANSFORM_RE = re.compile(r"^(\w+)(?:\[(\d+)\])?$")


def parse_transform(s: str) -> Transform:
    s = s.strip()
    m = _TRANSFORM_RE.match(s)
    if not m:
        # also accept call-style: bucket(16), truncate(4)
        m2 = re.match(r"^(\w+)\((\d+)\)$", s)
        if m2:
            m = m2
        else:
            raise ValueError(f"bad transform: {s}")
    name, arg = m.group(1), m.group(2)
    if name == "identity":
        return Identity()
    if name == "bucket":
        return Bucket(int(arg))
    if name == "truncate":
        return Truncate(int(arg))
    if name in ("year", "years"):
        return TimeTransform("year")
    if name in ("month", "months"):
        return TimeTransform("month")
    if name in ("day", "days", "date"):
        return TimeTransform("day")
    if name in ("hour", "hours", "date_hour"):
        return TimeTransform("hour")
    if name == "void":
        return Void()
    raise ValueError(f"unknown transform: {name}")
