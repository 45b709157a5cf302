"""Property-based soundness of the metrics evaluators (SURVEY §5.3:
randomized differential testing, the reference's TestInclusiveMetrics-
Evaluator / TestStrictMetricsEvaluator analog, driven by hypothesis).

The two properties that make pruning safe:
  * inclusive says SKIP  => no row in the file matches   (false skip =
    silent data loss — the worst bug class an engine can have)
  * strict says ALL      => every row matches            (false ALL =
    wrong metadata-only deletes)

Each example writes real parquet (pyarrow), derives stats through the
production collect_data_file path (footer stats, NaN handling), and
cross-checks random predicate trees against row-by-row evaluation.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

from iceberg_spark import expressions as E
from iceberg_spark.expressions import col
from iceberg_spark.manifests import collect_data_file
from iceberg_spark.schema import NestedField, Schema
from iceberg_spark.table import _build_spec

SCHEMA = Schema((
    NestedField(1, "k", "long"),
    NestedField(2, "v", "double"),
    NestedField(3, "s", "string"),
))
SPEC = _build_spec(SCHEMA, None)

longs = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
doubles = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
)
strings = st.one_of(st.none(), st.sampled_from(["", "a", "ab", "abc", "zz", "🎈x"]))

rows_strategy = st.lists(
    st.tuples(longs, doubles, strings), min_size=1, max_size=20)


def _leaf(draw):
    c = draw(st.sampled_from(["k", "v", "s"]))
    kind = draw(st.sampled_from(
        ["lt", "le", "gt", "ge", "eq", "in", "null", "notnull", "nan"]))
    if kind == "null":
        return col(c).is_null()
    if kind == "notnull":
        return col(c).not_null()
    if kind == "nan":
        return col("v").is_nan() if hasattr(col("v"), "is_nan") \
            else col(c).not_null()
    if c == "k":
        lit = draw(st.integers(min_value=-1000, max_value=1000))
    elif c == "v":
        lit = draw(st.floats(min_value=-100.0, max_value=100.0,
                             allow_nan=False))
    else:
        lit = draw(st.sampled_from(["", "a", "ab", "abc", "zz"]))
    if kind == "lt":
        return col(c) < lit
    if kind == "le":
        return col(c) <= lit
    if kind == "gt":
        return col(c) > lit
    if kind == "ge":
        return col(c) >= lit
    if kind == "eq":
        return col(c) == lit
    if c == "k":
        vs = draw(st.lists(st.integers(min_value=-1000, max_value=1000),
                           min_size=1, max_size=3))
    elif c == "v":
        vs = draw(st.lists(st.floats(min_value=-100.0, max_value=100.0,
                                     allow_nan=False),
                           min_size=1, max_size=3))
    else:
        vs = draw(st.lists(st.sampled_from(["", "a", "ab", "zz"]),
                           min_size=1, max_size=3))
    return col(c).isin(*vs)


@st.composite
def predicates(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return _leaf(draw)
    op = draw(st.sampled_from(["and", "or", "not"]))
    if op == "not":
        return E.not_(draw(predicates(depth=depth - 1)))
    a = draw(predicates(depth=depth - 1))
    b = draw(predicates(depth=depth - 1))
    return E.and_(a, b) if op == "and" else E.or_(a, b)


def _write(tmpdir, rows):
    path = os.path.join(tmpdir, f"f{abs(hash(tuple(rows)))}.parquet")
    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.float64()),
        "s": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(tbl, path)
    return path


def _row_matches(bound, rows):
    return [E.evaluate(bound, {"k": r[0], "v": r[1], "s": r[2]})
            for r in rows]


@settings(max_examples=150, deadline=None)
@given(rows=rows_strategy, pred=predicates())
def test_inclusive_never_skips_matching_rows(tmp_path_factory, rows, pred):
    tmpdir = str(tmp_path_factory.mktemp("metrics"))
    path = _write(tmpdir, rows)
    f = collect_data_file(path, SCHEMA, SPEC)
    fs = E.FileStats(f.record_count, f.stats)
    bound = E.bind(E.rewrite_not(pred), SCHEMA)
    if not E.inclusive_metrics_eval(bound, fs):
        matches = _row_matches(bound, rows)
        assert not any(matches), (
            f"inclusive evaluator skipped a file containing a matching row; "
            f"pred={E.to_sanitized_string(bound)} rows={rows} stats={f.stats}")


@settings(max_examples=150, deadline=None)
@given(rows=rows_strategy, pred=predicates())
def test_strict_all_means_all(tmp_path_factory, rows, pred):
    tmpdir = str(tmp_path_factory.mktemp("metrics"))
    path = _write(tmpdir, rows)
    f = collect_data_file(path, SCHEMA, SPEC)
    fs = E.FileStats(f.record_count, f.stats)
    bound = E.bind(E.rewrite_not(pred), SCHEMA)
    if E.strict_metrics_eval(bound, fs):
        matches = _row_matches(bound, rows)
        assert all(matches), (
            f"strict evaluator claimed all rows match but one does not; "
            f"pred={E.to_sanitized_string(bound)} rows={rows} stats={f.stats}")


# ---------------------------------------------------------------------------
# randomized Python-vs-Spark transform agreement (partition routing and
# metadata pruning both depend on the two implementations being identical)
# ---------------------------------------------------------------------------


def test_transforms_python_matches_spark_on_random_values(spark):
    import datetime as dt
    import random

    from pyspark.sql import functions as F
    from iceberg_spark.transforms import Bucket, TimeTransform, Truncate

    rng = random.Random(20260814)
    n = 400
    longs_ = [rng.randint(-2**40, 2**40) for _ in range(n)]
    strs_ = ["".join(rng.choice("abcxyz🎈 0") for _ in range(rng.randint(0, 12)))
             for _ in range(n)]
    dates_ = [dt.date(1970, 1, 1) + dt.timedelta(days=rng.randint(-20000, 40000))
              for _ in range(n)]
    tss_ = [dt.datetime(2000, 1, 1) + dt.timedelta(
        seconds=rng.randint(-10**9, 10**9),
        microseconds=rng.randint(0, 999999)) for _ in range(n)]

    cases = [
        (Bucket(16), longs_, "long", "long"),
        (Bucket(64), strs_, "string", "string"),
        (Bucket(32), dates_, "date", "date"),
        (Bucket(32), tss_, "timestamp_ntz", "timestamp_ntz"),
        (Truncate(10), longs_, "long", "long"),
        (Truncate(3), strs_, "string", "string"),
        (TimeTransform("day"), dates_, "date", "date"),
        (TimeTransform("month"), tss_, "timestamp_ntz", "timestamp_ntz"),
        (TimeTransform("hour"), tss_, "timestamp_ntz", "timestamp_ntz"),
    ]
    for tr, vals, src, spark_type in cases:
        py = [tr.apply(v, src) for v in vals]
        df = spark.createDataFrame([(v,) for v in vals], f"c {spark_type}")
        got = [r.t for r in df.select(
            tr.spark_col(F.col("c"), src).alias("t")).collect()]
        assert got == py, f"{tr} on {src}: spark != python"
