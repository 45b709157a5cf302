"""Randomized concurrent-writer differential: two table handles with
random staleness interleave appends, CoW/MoR deletes, MoR updates, and
compactions. Every operation either commits with exactly its
planned-snapshot semantics (the model applies the op to the rows the
STALE handle could see) or aborts with ValidationException leaving the
table untouched — after every step the scan must equal the model.
This drives the isolation-level machinery (writes.SnapshotProducer
_validate_concurrent) through interleavings no single-writer test
produces; the model would diverge on any lost delete or resurrected
row."""

import random

import pytest
from pyspark.sql import types as T
from pyspark.sql import functions as F  # noqa: F401

from iceberg_spark.expressions import col
from iceberg_spark.table import Catalog
from iceberg_spark.writes import ValidationException

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("grp", T.IntegerType()),
    T.StructField("val", T.LongType()),
])


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [(i, g, v) for (i, (g, v)) in rows], SCHEMA)


def _scan_rows(t):
    return sorted(tuple(r) for r in t.to_df().collect())


def _model_rows(model):
    return sorted((i, g, v) for i, (g, v) in model.items())


@pytest.mark.parametrize("seed", [101, 211])
def test_random_concurrent_writers(spark, tmp_path, seed):
    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / f"cw{seed}"))
    name = f"db.concurrent_{seed}"
    t0 = cat.create_table(name, SCHEMA)
    model = {}
    next_id = 0

    def fresh():
        return cat.load_table(name)

    def batch(n):
        nonlocal next_id
        out = {}
        for _ in range(n):
            out[next_id] = (rng.randint(0, 3), rng.randint(-50, 50))
            next_id += 1
        return out

    b = batch(30)
    t0.append(_rows_df(spark, sorted(b.items())))
    model.update(b)

    # two writers; each remembers the MODEL at its last refresh, i.e.
    # what its (possibly stale) metadata can see
    handles = [fresh(), fresh()]
    views = [dict(model), dict(model)]
    aborted = committed = 0

    for step in range(14):
        i = rng.randrange(2)
        if rng.random() < 0.3:  # random refresh
            handles[i] = fresh()
            views[i] = dict(model)
        h, view = handles[i], views[i]
        op = rng.choice(["append", "del_mor", "del_cow", "upd_mor",
                         "compact"])
        try:
            if op == "append":
                nb = batch(rng.randint(2, 8))
                h.append(_rows_df(spark, sorted(nb.items())))
                model.update(nb)
            elif op in ("del_mor", "del_cow"):
                g = rng.randint(0, 3)
                lo = rng.randint(-50, 30)
                mode = ("merge-on-read" if op == "del_mor"
                        else "copy-on-write")
                h.delete_where((col("grp") == g) & (col("val") >= lo),
                               mode=mode)
                # planned-snapshot semantics: only rows the stale handle
                # could see are deleted
                for k in [k for k, (gg, vv) in view.items()
                          if gg == g and vv >= lo]:
                    model.pop(k, None)
            elif op == "upd_mor":
                g = rng.randint(0, 3)
                h.update(col("grp") == g, {"val": "val + 1000"},
                         mode="merge-on-read")
                for k, (gg, vv) in view.items():
                    if gg == g and k in model:
                        model[k] = (gg, vv + 1000)
            elif op == "compact":
                from iceberg_spark.maintenance import rewrite_data_files

                rewrite_data_files(h, min_input_files=2)
            committed += 1
            # a successful commit refreshed the handle onto the new head
            views[i] = dict(model)
        except ValidationException:
            aborted += 1
            # aborted: nothing changed; the handle keeps its stale view
            handles[i] = h
        got = _scan_rows(fresh())
        want = _model_rows(model)
        assert got == want, (
            f"seed={seed} diverged at step {step} op={op} "
            f"(committed={committed} aborted={aborted})")

    # the interleavings must actually exercise both outcomes
    # (measured: seed 101 -> 10 commits / 4 aborts, 211 -> 11 / 3)
    assert committed >= 5, f"seed={seed}: too few commits ({committed})"
    assert aborted >= 1, f"seed={seed}: no conflict was ever detected"
