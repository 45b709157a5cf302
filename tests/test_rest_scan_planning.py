"""REST server-side scan planning (reference
core/.../rest/requests/PlanTableScanRequestParser.java,
responses/PlanTableScanResponseParser.java, RESTFileScanTaskParser.java,
ResourcePaths.java:44-48): POST plan -> completed inline tasks or
submitted + plan-id -> GET plan/{id} -> POST tasks per shard."""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from iceberg_spark import expressions as E
from iceberg_spark import rest_scan_planning as rsp
from iceberg_spark.rest_catalog import serve


def _req(port, path, body=None, method="POST"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read() or b"{}")


@pytest.fixture()
def server(catalog, spark):
    df = spark.range(0, 400).select(
        "id", (F.col("id") % 4).alias("grp"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"))
    t = catalog.create_table("db.plan_t", df.schema, partition_by=["grp"])
    t.append(df)
    srv, port = serve(catalog)
    yield catalog, port
    srv.shutdown()


def test_expression_json_roundtrip():
    e = E.and_((E.col("a") > 5) | E.col("b").isin(1, 2),
               E.not_(E.col("c").is_null()),
               E.col("s").startswith("x"))
    j = rsp.expr_to_rest_json(e)
    back = rsp.expr_from_rest_json(j)
    assert rsp.expr_to_rest_json(back) == j
    # spec op names are kebab-case
    assert json.dumps(j).count("lt-eq") + json.dumps(j).count("gt") >= 1
    # transform terms
    tj = rsp.expr_to_rest_json(E.transform_col("bucket(4)", "id") == 2)
    assert tj["term"] == {"type": "transform", "transform": "bucket[4]",
                          "term": "id"}
    assert rsp.expr_to_rest_json(rsp.expr_from_rest_json(tj)) == tj
    # constants
    assert rsp.expr_from_rest_json(True) is E.ALWAYS_TRUE
    with pytest.raises(ValueError):
        rsp.expr_from_rest_json({"type": "starts-with-ish", "term": "x",
                                 "value": 1})


def test_plan_completed_with_partition_pruning(server):
    _cat, port = server
    st, res = _req(port, "/v1/namespaces/db/tables/plan_t/plan", {
        "filter": {"type": "eq", "term": "grp", "value": 2},
        "select": ["id", "v"], "case-sensitive": True})
    assert st == 200 and res["status"] == "completed"
    tasks = res["file-scan-tasks"]
    st2, res2 = _req(port, "/v1/namespaces/db/tables/plan_t/plan", {})
    assert res2["status"] == "completed"
    assert 0 < len(tasks) < len(res2["file-scan-tasks"])
    for task in tasks:
        df = task["data-file"]
        assert df["content"] == "data"
        assert df["file-format"] == "parquet"
        assert df["partition"] == [2]  # spec-field-order array
        assert df["record-count"] > 0
        # conservative residual: the request filter itself
        assert task["residual-filter"] == {"type": "eq", "term": "grp",
                                           "value": 2}
    # unfiltered plan carries no residual
    assert "residual-filter" not in res2["file-scan-tasks"][0]


def test_plan_attaches_deletes_to_matching_tasks_only(server, catalog):
    _cat, port = server
    t = catalog.load_table("db.plan_t")
    t.delete_where((E.col("grp") == 1) & (E.col("id") < 50),
                   mode="merge-on-read")
    st, res = _req(port, "/v1/namespaces/db/tables/plan_t/plan", {})
    assert st == 200 and res["status"] == "completed"
    dels = res.get("delete-files", [])
    assert len(dels) >= 1
    assert all(d["content"] == "position-deletes" for d in dels)
    with_refs = [task for task in res["file-scan-tasks"]
                 if task.get("delete-file-references")]
    assert with_refs, "no task references the delete file"
    for task in with_refs:
        # the delete was partition-scoped to grp=1
        assert task["data-file"]["partition"] == [1]
        for i in task["delete-file-references"]:
            assert dels[i]["content"] == "position-deletes"
    # grp!=1 tasks reference nothing
    for task in res["file-scan-tasks"]:
        if task["data-file"]["partition"] != [1]:
            assert "delete-file-references" not in task


def test_plan_sharded_fetch_and_cancel(server, monkeypatch):
    _cat, port = server
    monkeypatch.setattr(rsp, "PLAN_SHARD_TASKS", 1)
    st, res = _req(port, "/v1/namespaces/db/tables/plan_t/plan", {})
    assert st == 200 and res["status"] == "submitted"
    pid = res["plan-id"]
    assert "file-scan-tasks" not in res
    st, fetched = _req(port, f"/v1/namespaces/db/tables/plan_t/plan/{pid}",
                       method="GET")
    assert st == 200 and fetched["status"] == "completed"
    shards = fetched["plan-tasks"]
    assert len(shards) > 1
    all_paths = set()
    for tok in shards:
        st, shard = _req(port, "/v1/namespaces/db/tables/plan_t/tasks",
                         {"plan-task": tok})
        assert st == 200
        assert len(shard["file-scan-tasks"]) == 1
        all_paths.update(task["data-file"]["file-path"]
                         for task in shard["file-scan-tasks"])
    monkeypatch.setattr(rsp, "PLAN_SHARD_TASKS", 10_000)
    _st, inline = _req(port, "/v1/namespaces/db/tables/plan_t/plan", {})
    assert all_paths == {task["data-file"]["file-path"]
                         for task in inline["file-scan-tasks"]}
    # cancel: GET answers cancelled, task fetch 404s
    st, _ = _req(port, f"/v1/namespaces/db/tables/plan_t/plan/{pid}",
                 method="DELETE")
    assert st == 204
    _st, after = _req(port, f"/v1/namespaces/db/tables/plan_t/plan/{pid}",
                      method="GET")
    assert after["status"] == "cancelled"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/plan_t/tasks",
             {"plan-task": shards[0]})
    assert ei.value.code == 404


def test_plan_incremental_appends(server, catalog, spark):
    _cat, port = server
    t = catalog.load_table("db.plan_t")
    start = t.current_snapshot().snapshot_id
    df = spark.range(1000, 1050).select(
        "id", (F.col("id") % 4).alias("grp"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"))
    t.append(df)
    t = t.refresh()
    end = t.current_snapshot().snapshot_id
    st, res = _req(port, "/v1/namespaces/db/tables/plan_t/plan", {
        "start-snapshot-id": start, "end-snapshot-id": end})
    assert st == 200 and res["status"] == "completed"
    n_inc = sum(task["data-file"]["record-count"]
                for task in res["file-scan-tasks"])
    assert n_inc == 50


def test_plan_errors(server):
    _cat, port = server
    for body, code in (
            ({"filter": None}, 400),
            ({"snapshot-id": 1, "start-snapshot-id": 1,
              "end-snapshot-id": 2}, 400),
            ({"start-snapshot-id": 5}, 400)):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(port, "/v1/namespaces/db/tables/plan_t/plan", body)
        assert ei.value.code == code, body
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/nope/plan", {})
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/plan_t/plan/deadbeef",
             method="GET")
    assert ei.value.code == 404
