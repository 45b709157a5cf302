#!/usr/bin/env python
"""Extra-seed randomized lifecycle sweep across table configurations.

Runs the tests/test_random_lifecycle.py differential (random
append/delete/update/merge/compact/expire/evolve-spec sequences checked
against a Python dict model) over MORE seeds and config combinations
than the committed pytest parametrization — a cheap way to buy
confidence after write-plane changes without growing the suite's
runtime.

Usage: python scripts/lifecycle_sweep.py [n_seeds]   (default 6)
Exit code 0 = every sweep PASSed.
"""
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tests")

from pyspark.sql import SparkSession  # noqa: E402

CONFIGS = [
    (False, {"write.delete.granularity": "file"}),
    (True, {}),
    (False, {}),
    (True, {"write.metadata.use-relative-paths": "true"}),
    (False, {"write.delete.granularity": "file",
             "write.summary.partition-limit": "10"}),
    (True, {"write.delete.granularity": "file"}),  # property ignored by DVs
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    import test_random_lifecycle as TRL

    from iceberg_spark.table import Catalog

    failures = 0
    for i in range(n):
        seed = 1000 + 17 * i
        use_dv, extra = CONFIGS[i % len(CONFIGS)]
        cat = Catalog(spark, tempfile.mkdtemp(prefix="lifecycle_sweep_"))
        t, model, steps = TRL._apply_random_lifecycle(
            cat, spark, seed, use_dv, extra_props=extra or None)
        ok = TRL._scan_rows(t) == TRL._model_rows(model)
        print(f"seed={seed} dv={use_dv} extra={sorted(extra)} "
              f"steps={steps} {'PASS' if ok else 'FAIL'}")
        failures += 0 if ok else 1
    print(f"{n - failures}/{n} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
