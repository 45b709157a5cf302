"""Differential testing of row-level ops (SURVEY §5.4: correctness is
differential — same operation, CoW vs MoR vs plain-DataFrame expectation,
the reference's TestCopyOnWrite*/TestMergeOnRead* mode matrix).

Random predicates over the supplier fixture: DELETE and UPDATE applied
copy-on-write and merge-on-read must leave byte-identical table contents,
both equal to the filter/projection computed directly on the source."""

import random

import pytest
from pyspark.sql import functions as F

from iceberg_spark import expressions as E
from iceberg_spark.expressions import col
from tests.conftest import SF_DIR


def _src(spark):
    return (spark.read.parquet(f"{SF_DIR}/supplier.parquet")
            .select("s_suppkey", "s_nationkey", "s_acctbal", "s_name"))


def _fresh(catalog, spark, name):
    df = _src(spark)
    t = catalog.create_table(f"db.{name}", df.schema)
    t.append(df)
    return t


def _rows(t):
    return sorted(tuple(r) for r in t.to_df()
                  .select("s_suppkey", "s_nationkey", "s_acctbal", "s_name")
                  .collect())


def _rand_preds(seed, n=6):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        kind = rng.choice(["key_range", "nation", "bal", "combo", "none", "all"])
        if kind == "key_range":
            lo = rng.randint(0, 200)
            e = (col("s_suppkey") >= lo) & (col("s_suppkey") < lo + rng.randint(1, 80))
            out.append((e, None))
        elif kind == "nation":
            k = rng.randint(0, 24)
            out.append((col("s_nationkey") == k, None))
        elif kind == "bal":
            v = rng.uniform(-500, 5000)
            out.append((col("s_acctbal") > v, None))
        elif kind == "combo":
            k = rng.randint(0, 24)
            v = rng.uniform(-500, 5000)
            out.append((E.and_(col("s_nationkey") >= k, col("s_acctbal") <= v), None))
        elif kind == "none":
            out.append((col("s_suppkey") < -1, None))
        else:
            out.append((col("s_suppkey") >= 0, None))
    return [e for e, _ in out]


def _spark_cond(t, e):
    return E.to_spark(E.bind(E.rewrite_not(e), t.schema))


@pytest.mark.parametrize("seed", [1, 2])
def test_delete_cow_equals_mor_equals_filter(catalog, spark, seed):
    for i, pred in enumerate(_rand_preds(seed)):
        ca = _fresh(catalog, spark, f"dcow_{seed}_{i}")
        cb = _fresh(catalog, spark, f"dmor_{seed}_{i}")
        ca.delete_where(pred, mode="copy-on-write")
        cb.delete_where(pred, mode="merge-on-read")
        want = sorted(tuple(r) for r in _src(spark)
                      .filter(~_spark_cond(ca, pred)).collect())
        assert _rows(ca.refresh()) == want, f"CoW delete diverged: {pred}"
        assert _rows(cb.refresh()) == want, f"MoR delete diverged: {pred}"


@pytest.mark.parametrize("seed", [3])
def test_update_cow_equals_mor_equals_projection(catalog, spark, seed):
    assignments = {"s_acctbal": "s_acctbal + 1000.0"}
    for i, pred in enumerate(_rand_preds(seed, n=4)):
        ca = _fresh(catalog, spark, f"ucow_{seed}_{i}")
        cb = _fresh(catalog, spark, f"umor_{seed}_{i}")
        ca.update(pred, assignments, mode="copy-on-write")
        cb.update(pred, assignments, mode="merge-on-read")
        cnd = _spark_cond(ca, pred)
        want = sorted(tuple(r) for r in _src(spark).select(
            "s_suppkey", "s_nationkey",
            F.when(cnd, F.col("s_acctbal") + 1000.0)
            .otherwise(F.col("s_acctbal")).alias("s_acctbal"),
            "s_name").collect())
        assert _rows(ca.refresh()) == want, f"CoW update diverged: {pred}"
        assert _rows(cb.refresh()) == want, f"MoR update diverged: {pred}"


def test_interleaved_deletes_converge(catalog, spark):
    """Sequential deletes under alternating modes end at the same state as
    one combined filter (delete-over-delete correctness: later MoR
    deletes must apply on top of earlier delete files)."""
    t = _fresh(catalog, spark, "interleave")
    p1 = col("s_nationkey") == 3
    p2 = col("s_acctbal") > 4000.0
    p3 = col("s_suppkey").isin(*range(0, 300, 7))
    t.delete_where(p1, mode="merge-on-read")
    t = t.refresh()
    t.delete_where(p2, mode="copy-on-write")
    t = t.refresh()
    t.delete_where(p3, mode="merge-on-read")
    t = t.refresh()
    want = sorted(tuple(r) for r in _src(spark)
                  .filter(~(F.col("s_nationkey") == 3))
                  .filter(~(F.col("s_acctbal") > 4000.0))
                  .filter(~F.col("s_suppkey").isin(list(range(0, 300, 7)))).collect())
    assert _rows(t) == want


def test_delete_null_predicate_rows_survive(catalog, spark):
    """SQL DELETE semantics: rows where the predicate evaluates NULL do
    NOT match and must survive — both CoW and MoR (regression: the CoW
    keep-filter was a bare ~pred, NULL for those rows, silently
    dropping them)."""
    from iceberg_spark import expressions as E

    df = spark.range(0, 100).selectExpr(
        "id", "case when id % 10 = 0 then null else id end as v")
    for name, mode in (("db.nulldel_cow", "copy-on-write"),
                       ("db.nulldel_mor", "merge-on-read")):
        t = catalog.create_table(name, df.schema)
        t.append(df)
        t = catalog.load_table(name)
        t.delete_where(E.col("v") >= 0, mode=mode)
        t = catalog.load_table(name)
        got = sorted(r.id for r in t.to_df().select("id").collect())
        assert got == list(range(0, 100, 10)), (name, got)
