"""Differential check mirroring the driver's t2 gate: every workloads entry
runs on Spark (through the engine) AND on DuckDB; row counts + sorted values
must agree."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    import datetime as dt
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, float):
        return round(v, 6)
    return v


def _rows_to_set(cols, rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    df = qfn(spark, SF_DIR)
    cols = sorted(df.columns)
    spark_rows = [[r[c] for c in cols] for r in df.collect()]
    if sql is None:
        assert len(spark_rows) >= 0
        return
    con = _duck(SF_DIR)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    assert sorted(duck_cols) == cols, f"column mismatch: {sorted(duck_cols)} vs {cols}"
    duck_rows = [[r[duck_cols.index(c)] for c in cols] for r in res.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sset, dset = _rows_to_set(cols, spark_rows), _rows_to_set(cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(sset, dset)
        if not all(_close(x, y) for x, y in zip(a, b))
    ]
    assert not mismatches, f"value mismatches (first 3): {mismatches[:3]}"
    # The driver's value hash is type-sensitive: DuckDB HUGEINT (e.g. SUM of
    # ints) lands in pandas as float64 and stringifies as "56.0" vs Spark's
    # "56". Catch int-vs-float divergence here so it never reaches the gate.
    duck_pdf = con.execute(sql).df()
    spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    INTS = {"bigint", "int", "smallint", "tinyint"}
    FLOATS = {"double", "float"}
    for c in duck_cols:
        st = spark_types[c]
        dk = duck_pdf[c].dtype.kind
        if st in INTS | FLOATS and dk in "if":
            assert (dk == "f") == (st in FLOATS), (
                f"dtype kind mismatch on {c}: duck={duck_pdf[c].dtype} "
                f"spark={st} — cast the oracle (HUGEINT?) or the query"
            )


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-6)
    return a == b
