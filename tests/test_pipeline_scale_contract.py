"""Pin the minhash output-identity contract in the pipeline scale
harness (scripts/bench_pipeline_scale.py): the df-cap in
dedup_minhash_lsh is semantics-bearing on adversarial inputs, so the
harness must FAIL — not warn — when out_rows shift at any fixture
scale. (r13 verdict, next-round item 9.)"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_pipeline_scale import (  # noqa: E402
    EXPECTED_OUT_ROWS,
    identity_fails,
)


def _results(minhash_rows):
    return {"dedup_minhash_lsh": {
        str(s): {"sec": 1.0, "shuffle_bytes": 0, "out_rows": n}
        for s, n in minhash_rows.items()}}


def test_pinned_values_pass():
    assert identity_fails(_results(EXPECTED_OUT_ROWS["dedup_minhash_lsh"])) \
        == []


def test_recall_loss_fails():
    # the r13 v2-fixture measurement: the df-cap cost recall at 10x
    # (16,211 -> 12,875) — exactly the shift this gate must catch
    rows = dict(EXPECTED_OUT_ROWS["dedup_minhash_lsh"])
    rows[10] = 12875
    fails = identity_fails(_results(rows))
    assert len(fails) == 1 and "x10" in fails[0]


def test_missing_scale_does_not_crash():
    # a partial run (e.g. interrupted before x100) gates only on the
    # scales it measured
    rows = {1: EXPECTED_OUT_ROWS["dedup_minhash_lsh"][1]}
    assert identity_fails(_results(rows)) == []


def test_minhash_contract_is_pinned():
    # the exact pinned values, so a harness edit cannot silently retune
    assert EXPECTED_OUT_ROWS["dedup_minhash_lsh"] == {
        1: 1600, 10: 16211, 100: 162302}
