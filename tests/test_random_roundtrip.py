"""Random-data write/read round-trips through the engine across the type
matrix (SURVEY §5.3 — the reference's RandomData.java write-read equality
per format). Values are generated seeded, appended through the table
layer, and read back via scan; every cell must survive bit-exact."""

import datetime as dt
import random
from decimal import Decimal

import pytest
from pyspark.sql import types as T


def _gen(rng, n):
    rows = []
    for i in range(n):
        def maybe(v):
            return None if rng.random() < 0.15 else v

        rows.append((
            i,
            maybe(rng.choice([True, False])),
            maybe(rng.randint(-2**31, 2**31 - 1)),
            maybe(rng.randint(-2**62, 2**62)),
            maybe(rng.choice([float("nan"), rng.uniform(-1e6, 1e6)])),
            maybe(Decimal(rng.randint(-10**8, 10**8)) / 100),
            maybe(dt.date(1970, 1, 1) + dt.timedelta(days=rng.randint(-30000, 30000))),
            maybe(dt.datetime(2020, 1, 1)
                  + dt.timedelta(seconds=rng.randint(-10**8, 10**8),
                                 microseconds=rng.randint(0, 999999))),
            maybe("".join(rng.choice("aZ9 🎈\t,") for _ in range(rng.randint(0, 20)))),
            maybe(bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 16)))),
            maybe([rng.randint(-100, 100) for _ in range(rng.randint(0, 4))]),
            maybe({"k%d" % j: rng.randint(0, 9) for j in range(rng.randint(0, 3))}),
            maybe((rng.randint(0, 100), maybe("s%d" % rng.randint(0, 9)))),
        ))
    return rows


SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("b", T.BooleanType()),
    T.StructField("i", T.IntegerType()),
    T.StructField("l", T.LongType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("dec", T.DecimalType(12, 2)),
    T.StructField("dt", T.DateType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("s", T.StringType()),
    T.StructField("bin", T.BinaryType()),
    T.StructField("arr", T.ArrayType(T.LongType())),
    T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
    T.StructField("st", T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("bb", T.StringType()),
    ])),
])


def _norm(v):
    if isinstance(v, float):
        return ("nan",) if v != v else round(v, 9)
    if isinstance(v, dict):
        return tuple(sorted(v.items()))
    if isinstance(v, list):
        return tuple(v)
    if hasattr(v, "asDict"):  # Row
        return tuple(v)
    return v


@pytest.mark.parametrize("seed", [11, 12])
def test_random_roundtrip_full_type_matrix(catalog, spark, seed):
    rng = random.Random(seed)
    rows = _gen(rng, 120)
    df = spark.createDataFrame(rows, SCHEMA)
    t = catalog.create_table(f"db.rt_{seed}", SCHEMA)
    t.append(df)
    got = sorted((tuple(_norm(v) for v in r)
                  for r in t.to_df().collect()), key=lambda r: r[0])
    want = sorted((tuple(_norm(v) for v in r)
                   for r in df.collect()), key=lambda r: r[0])
    assert got == want


@pytest.mark.parametrize("seed", [13])
def test_random_roundtrip_survives_rewrite(catalog, spark, seed):
    """Same equality after a binpack rewrite — compaction must not alter
    any value of any type."""
    from iceberg_spark.maintenance import rewrite_data_files

    rng = random.Random(seed)
    t = catalog.create_table(f"db.rtc_{seed}", SCHEMA)
    all_rows = []
    for chunk in range(3):
        rows = _gen(rng, 40)
        rows = [(r[0] + chunk * 1000,) + r[1:] for r in rows]
        all_rows += rows
        t.append(spark.createDataFrame(rows, SCHEMA).coalesce(1))
    t = t.refresh()
    rewrite_data_files(t, strategy="binpack")
    t = t.refresh()
    got = sorted((tuple(_norm(v) for v in r)
                  for r in t.to_df().collect()), key=lambda r: r[0])
    want = sorted((tuple(_norm(v) for v in r)
                   for r in spark.createDataFrame(all_rows, SCHEMA).collect()),
                  key=lambda r: r[0])
    assert got == want
