"""REST catalog adapter: the open-api surface external tooling uses to
discover, load, and COMMIT tables. loadTable serves REFERENCE-shaped
metadata (Avro manifests via export); the write surface validates
requirements and replays client-written Avro manifest lists into engine
commits. The "client" here hand-writes spec-shaped Avro, standing in for
a genuine Iceberg REST client."""

import json
import os
import urllib.error
import urllib.request
import uuid

import pytest
from pyspark.sql import functions as F

from iceberg_spark.rest_catalog import serve


@pytest.fixture()
def server(catalog, spark):
    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("grp"))
    t = catalog.create_table("db.rest_t", df.schema)
    t.append(df)
    srv, port = serve(catalog)
    yield catalog, port
    srv.shutdown()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return r.status, json.loads(r.read() or b"{}")


def test_config_namespaces_tables(server):
    _cat, port = server
    st, cfg = _get(port, "/v1/config")
    assert st == 200 and "defaults" in cfg
    st, ns = _get(port, "/v1/namespaces")
    assert st == 200 and ["db"] in ns["namespaces"]
    st, tbls = _get(port, "/v1/namespaces/db/tables")
    assert st == 200
    assert {"namespace": ["db"], "name": "rest_t"} in tbls["identifiers"]


def test_load_table_serves_reference_metadata(server, catalog, tmp_path):
    _cat, port = server
    st, res = _get(port, "/v1/namespaces/db/tables/rest_t")
    assert st == 200
    md = res["metadata"]
    assert md["format-version"] in (2, 3)
    ml = md["snapshots"][0]["manifest-list"]
    assert ml.endswith(".avro")
    # the served metadata-location is a genuine Iceberg table: our own
    # importer (standing in for a reference client) reads it back
    from iceberg_spark.sources.iceberg import snapshot_iceberg_table

    t2, n, _ = snapshot_iceberg_table(
        catalog, res["metadata-location"], "db.rest_back")
    assert t2.to_df().count() == 40


def test_errors(server):
    _cat, port = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/namespaces/db/tables/nope")
    assert ei.value.code == 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/namespaces/db/tables/rest_t",
        method="PUT", data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 405


# -- write surface ----------------------------------------------------------

def _req(port, path, body=None, method="POST"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read() or b"{}")


_SCHEMA_JSON = {
    "type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "string"}]}


def test_create_namespace_and_table(server, catalog):
    _cat, port = server
    st, res = _req(port, "/v1/namespaces", {"namespace": ["db2"]})
    assert st == 200 and res["namespace"] == ["db2"]
    with pytest.raises(urllib.error.HTTPError) as ei:  # duplicate -> 409
        _req(port, "/v1/namespaces", {"namespace": ["db2"]})
    assert ei.value.code == 409

    st, res = _req(port, "/v1/namespaces/db2/tables", {
        "name": "created", "schema": _SCHEMA_JSON,
        "properties": {"owner": "rest-client"}})
    assert st == 200
    assert res["metadata"]["schemas"][0]["fields"][0]["name"] == "id"
    t = catalog.load_table("db2.created")
    assert t.properties.get("owner") == "rest-client"
    assert [f.name for f in t.schema.fields] == ["id", "v"]


def _client_append(port, catalog, ident, n_rows, base_md):
    """Simulate a reference REST client: write a parquet data file +
    spec-shaped Avro manifest and manifest list (full state = prior
    manifests + the new one), return the CommitTableRequest body."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_spark.avro_file import read_avro, write_avro
    from iceberg_spark.sources.iceberg_fixture import (
        MANIFEST_LIST_SCHEMA, manifest_entry_schema)

    t = catalog.load_table(ident)
    data_dir = os.path.join(t.location, "data")
    os.makedirs(data_dir, exist_ok=True)
    dpath = os.path.join(data_dir, f"rest-{uuid.uuid4().hex}.parquet")
    pq.write_table(pa.table({
        "id": pa.array(range(1000, 1000 + n_rows), pa.int64()),
        "grp": pa.array([9] * n_rows, pa.int64())}), dpath)

    base_sid = base_md["refs"]["main"]["snapshot-id"]
    new_seq = base_md["last-sequence-number"] + 1
    new_sid = 4400000000000000000 + new_seq
    mdir = os.path.join(t.location, "metadata")
    entry_schema = manifest_entry_schema([])
    mpath = os.path.join(mdir, f"{uuid.uuid4().hex}-m0.avro")
    write_avro(mpath, entry_schema, [{
        "status": 1, "snapshot_id": new_sid,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": {
            "content": 0, "file_path": dpath, "file_format": "PARQUET",
            "partition": {}, "record_count": n_rows,
            "file_size_in_bytes": os.path.getsize(dpath),
            "column_sizes": None, "value_counts": None,
            "null_value_counts": None, "lower_bounds": None,
            "upper_bounds": None, "split_offsets": None,
            "equality_ids": None, "sort_order_id": None,
            "referenced_data_file": None, "content_offset": None,
            "content_size_in_bytes": None}}],
        {"schema": json.dumps(base_md["schemas"][0]),
         "schema-id": "0", "partition-spec": "[]",
         "partition-spec-id": "0", "format-version": "2",
         "content": "data"}, codec="deflate")

    cur_snap = next(s for s in base_md["snapshots"]
                    if s["snapshot-id"] == base_sid)
    _, _, prior = read_avro(cur_snap["manifest-list"])
    rows = list(prior) + [{
        "manifest_path": mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0,
        "sequence_number": new_seq, "min_sequence_number": new_seq,
        "added_snapshot_id": new_sid, "added_files_count": 1,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": n_rows, "existing_rows_count": 0,
        "deleted_rows_count": 0, "partitions": None}]
    ml_path = os.path.join(
        mdir, f"snap-{new_sid}-1-{uuid.uuid4().hex}.avro")
    write_avro(ml_path, MANIFEST_LIST_SCHEMA, rows,
               {"format-version": "2"}, codec="deflate")
    snap = {"snapshot-id": new_sid, "parent-snapshot-id": base_sid,
            "sequence-number": new_seq, "timestamp-ms": 1700000123456,
            "summary": {"operation": "append"},
            "manifest-list": ml_path, "schema-id": 0}
    return {
        "requirements": [{"type": "assert-ref-snapshot-id", "ref": "main",
                          "snapshot-id": base_sid}],
        "updates": [{"action": "add-snapshot", "snapshot": snap},
                    {"action": "set-snapshot-ref", "ref-name": "main",
                     "type": "branch", "snapshot-id": new_sid}]}, new_sid


def test_rest_commit_append(server, catalog):
    _cat, port = server
    _st, res = _get(port, "/v1/namespaces/db/tables/rest_t")
    md = res["metadata"]
    # export preserves engine identity: served ref == engine snapshot id
    t = catalog.load_table("db.rest_t")
    assert md["refs"]["main"]["snapshot-id"] == \
        t.current_snapshot().snapshot_id
    assert md["table-uuid"] == t.metadata.table_uuid

    body, new_sid = _client_append(port, catalog, "db.rest_t", 7, md)
    st, res2 = _req(port, "/v1/namespaces/db/tables/rest_t", body)
    assert st == 200
    assert res2["metadata"]["refs"]["main"]["snapshot-id"] == new_sid

    t = catalog.load_table("db.rest_t")
    assert t.current_snapshot().snapshot_id == new_sid
    assert t.to_df().count() == 47
    assert t.to_df().where(F.col("id") >= 1000).count() == 7
    # incremental read sees ONLY the appended file
    inc = t.changes(from_snapshot_id=md["refs"]["main"]["snapshot-id"])
    assert inc.where(F.col("_change_type") == "INSERT").count() == 7

    # a second commit against the now-stale base -> 409 CommitFailed
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "requirements": [{"type": "assert-ref-snapshot-id",
                              "ref": "main",
                              "snapshot-id": md["refs"]["main"][
                                  "snapshot-id"]}],
            "updates": []})
    assert ei.value.code == 409
    assert "CommitFailed" in json.loads(ei.value.read())["error"]["type"]


def test_rest_commit_properties_and_uuid_requirement(server, catalog):
    _cat, port = server
    t = catalog.load_table("db.rest_t")
    st, _res = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "requirements": [{"type": "assert-table-uuid",
                          "uuid": t.metadata.table_uuid}],
        "updates": [{"action": "set-properties",
                     "updates": {"history.expire.max-snapshot-age-ms":
                                 "604800000"}}]})
    assert st == 200
    t = catalog.load_table("db.rest_t")
    assert t.properties["history.expire.max-snapshot-age-ms"] == \
        "604800000"
    st, _res = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "updates": [{"action": "remove-properties",
                     "removals": ["history.expire.max-snapshot-age-ms"]}]})
    assert st == 200
    t = catalog.load_table("db.rest_t")
    assert "history.expire.max-snapshot-age-ms" not in t.properties
    with pytest.raises(urllib.error.HTTPError) as ei:  # wrong uuid -> 409
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "requirements": [{"type": "assert-table-uuid",
                              "uuid": "not-the-uuid"}],
            "updates": []})
    assert ei.value.code == 409
    with pytest.raises(urllib.error.HTTPError) as ei:  # unknown action
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "updates": [{"action": "upgrade-format-version",
                         "format-version": 9}]})
    assert ei.value.code == 400


def test_rest_rename_and_drop(server, catalog, spark):
    _cat, port = server
    df = spark.range(0, 5).select("id")
    catalog.create_table("db.rest_tmp", df.schema).append(df)
    st, _ = _req(port, "/v1/tables/rename", {
        "source": {"namespace": ["db"], "name": "rest_tmp"},
        "destination": {"namespace": ["db"], "name": "rest_tmp2"}})
    assert st == 200
    assert catalog.table_exists("db.rest_tmp2")
    assert not catalog.table_exists("db.rest_tmp")
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_tmp2",
                 method="DELETE")
    assert st == 204
    assert not catalog.table_exists("db.rest_tmp2")
    with pytest.raises(urllib.error.HTTPError) as ei:  # non-empty ns
        _req(port, "/v1/namespaces/db", method="DELETE")
    assert ei.value.code == 409


def test_rest_commit_schema_and_spec_evolution(server, catalog):
    """A REST client ALTERs the table: add-schema/set-current-schema add
    a column; add-spec/set-default-spec switch to identity partitioning.
    Engine reads and subsequent engine writes see both."""
    _cat, port = server
    t = catalog.load_table("db.rest_t")
    new_schema = {
        "type": "struct", "schema-id": 1, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "grp", "required": False, "type": "long"},
            {"id": 3, "name": "note", "required": False,
             "type": "string"}]}
    new_spec = {"spec-id": 1, "fields": [
        {"name": "grp", "transform": "identity", "source-id": 2,
         "field-id": 1000}]}
    st, res = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "requirements": [{"type": "assert-table-uuid",
                          "uuid": t.metadata.table_uuid}],
        "updates": [
            {"action": "add-schema", "schema": new_schema},
            {"action": "set-current-schema", "schema-id": -1},
            {"action": "add-spec", "spec": new_spec},
            {"action": "set-default-spec", "spec-id": -1}]})
    assert st == 200
    t = catalog.load_table("db.rest_t")
    assert [f.name for f in t.schema.fields] == ["id", "grp", "note"]
    assert t.metadata.current_schema_id == 1
    assert t.metadata.default_spec_id == 1
    assert [pf.name for pf in t.spec.fields] == ["grp"]
    # old rows read with the new column null
    rows = t.to_df().where(F.col("note").isNull()).count()
    assert rows == 40
    # engine write under the evolved schema+spec still works
    df = t.spark.range(100, 104).select(
        "id", (F.col("id") % 4).alias("grp"),
        F.lit("x").alias("note"))
    t.append(df)
    t = t.refresh()
    assert t.to_df().count() == 44
    from iceberg_spark.expressions import col
    plan = t.scan(filter=col("grp") == 0).plan_files()
    assert len(plan.files) < len(t.scan().plan_files().files)


def test_rest_sort_order_update_and_stats_export(server, catalog,
                                                 tmp_path):
    _cat, port = server
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "updates": [
            {"action": "add-sort-order", "sort-order": {
                "order-id": 1, "fields": [
                    {"source-id": 1, "transform": "identity",
                     "direction": "desc", "null-order": "nulls-first"}]}},
            {"action": "set-default-sort-order", "sort-order-id": -1}]})
    assert st == 200
    t = catalog.load_table("db.rest_t")
    assert t.metadata.default_sort_order_id == 1
    so = t.metadata.sort_orders[-1]
    assert (so.fields[0].source_name, so.fields[0].direction) == \
        ("id", "desc")

    # exported metadata carries the sort order and the table's stats file
    t.compute_table_stats(columns=["id"])
    t = t.refresh()
    from iceberg_spark.sources.iceberg import export_reference_metadata

    dest = str(tmp_path / "exp_sorted")
    mpath = export_reference_metadata(t, dest)
    md = json.load(open(mpath))
    assert md["default-sort-order-id"] == 1
    assert md["sort-orders"][-1]["fields"][0] == {
        "source-id": 1, "transform": "identity", "direction": "desc",
        "null-order": "nulls-first"}
    assert len(md["statistics"]) == 1
    assert md["statistics"][0]["snapshot-id"] == \
        t.current_snapshot().snapshot_id
    assert os.path.exists(md["statistics"][0]["statistics-path"])


def test_rest_remove_snapshot_ref(server, catalog):
    _cat, port = server
    t = catalog.load_table("db.rest_t")
    sid = t.current_snapshot().snapshot_id
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "updates": [{"action": "set-snapshot-ref", "ref-name": "audit",
                     "type": "tag", "snapshot-id": sid}]})
    assert st == 200
    assert "audit" in catalog.load_table("db.rest_t").refs()
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "updates": [{"action": "remove-snapshot-ref",
                     "ref-name": "audit"}]})
    assert st == 200
    assert "audit" not in catalog.load_table("db.rest_t").refs()


def test_rest_views(server, catalog):
    _cat, port = server
    st, res = _req(port, "/v1/namespaces/db/views", {
        "name": "v_sum",
        "view-version": {
            "version-id": 1, "timestamp-ms": 0, "schema-id": 0,
            "summary": {}, "default-namespace": ["db"],
            "representations": [{
                "type": "sql", "dialect": "spark",
                "sql": "SELECT grp, COUNT(*) AS n FROM db.rest_t "
                       "GROUP BY grp"}]},
        "properties": {"comment": "by-rest"}})
    assert st == 200
    assert res["metadata"]["current-version-id"] == 1

    st, lst = _get(port, "/v1/namespaces/db/views")
    assert {"namespace": ["db"], "name": "v_sum"} in lst["identifiers"]
    st, res = _get(port, "/v1/namespaces/db/views/v_sum")
    assert res["metadata"]["versions"][0]["representations"][0][
        "sql"].startswith("SELECT grp")
    # the engine's SQL layer resolves the REST-created view
    rows = catalog.sql("SELECT * FROM db.v_sum ORDER BY grp").collect()
    assert [r["n"] for r in rows] == [10, 10, 10, 10]

    # replace over REST: add-view-version + set-current-view-version(-1)
    st, res = _req(port, "/v1/namespaces/db/views/v_sum", {
        "updates": [
            {"action": "add-view-version", "view-version": {
                "version-id": 2, "timestamp-ms": 0, "schema-id": 0,
                "summary": {}, "default-namespace": ["db"],
                "representations": [{
                    "type": "sql", "dialect": "spark",
                    "sql": "SELECT COUNT(*) AS total FROM db.rest_t"}]}},
            {"action": "set-current-view-version",
             "view-version-id": -1}]})
    assert st == 200
    assert res["metadata"]["current-version-id"] == 2
    assert len(res["metadata"]["versions"]) == 2
    rows = catalog.sql("SELECT * FROM db.v_sum").collect()
    assert rows[0]["total"] == 40

    st, _ = _req(port, "/v1/namespaces/db/views/v_sum", method="DELETE")
    assert st == 204
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/namespaces/db/views/v_sum")
    assert ei.value.code == 404


def test_rest_extra_requirements_and_metrics(server, catalog):
    _cat, port = server
    t = catalog.load_table("db.rest_t")
    m = t.metadata
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "requirements": [
            {"type": "assert-current-schema-id",
             "current-schema-id": m.current_schema_id},
            {"type": "assert-default-spec-id",
             "default-spec-id": m.default_spec_id},
            {"type": "assert-last-assigned-field-id",
             "last-assigned-field-id": m.last_column_id},
            {"type": "assert-default-sort-order-id",
             "default-sort-order-id": m.default_sort_order_id}],
        "updates": []})
    assert st == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "requirements": [{"type": "assert-current-schema-id",
                              "current-schema-id": 99}],
            "updates": []})
    assert ei.value.code == 409
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t/metrics",
                 {"report-type": "scan-report"})
    assert st == 204


def test_rest_list_pagination(server, catalog, spark):
    _cat, port = server
    df = spark.range(0, 3).select("id")
    for i in range(4):
        catalog.create_table(f"db.pg{i}", df.schema)
    st, p1 = _get(port, "/v1/namespaces/db/tables?pageSize=3")
    assert st == 200 and len(p1["identifiers"]) == 3
    tok = p1["next-page-token"]
    st, p2 = _get(port,
                  f"/v1/namespaces/db/tables?pageSize=3&pageToken={tok}")
    assert st == 200
    names = {i["name"] for i in p1["identifiers"] + p2["identifiers"]}
    assert {f"pg{i}" for i in range(4)} <= names
    assert "next-page-token" not in p2


def test_rest_sequential_client_commits(server, catalog):
    """Five REST commits in sequence, each built from the PREVIOUS
    loadTable response (whose manifest list includes earlier
    client-written manifests): exercises export -> client append ->
    replay -> re-export as an iterated loop."""
    _cat, port = server
    total = 40
    for i in range(5):
        _st, res = _get(port, "/v1/namespaces/db/tables/rest_t")
        body, new_sid = _client_append(port, catalog, "db.rest_t",
                                       3 + i, res["metadata"])
        st, res2 = _req(port, "/v1/namespaces/db/tables/rest_t", body)
        assert st == 200
        assert res2["metadata"]["refs"]["main"]["snapshot-id"] == new_sid
        total += 3 + i
    t = catalog.load_table("db.rest_t")
    assert t.to_df().count() == total
    # snapshot chain: base + 5 client commits, parents linked in order
    snaps = t.snapshots()
    assert len(snaps) == 6
    for a, b in zip(snaps, snaps[1:]):
        assert b.parent_snapshot_id == a.snapshot_id
    # incremental read across the whole client window
    inc = t.changes(from_snapshot_id=snaps[0].snapshot_id)
    assert inc.where(F.col("_change_type") == "INSERT").count() == \
        total - 40


def test_rest_namespace_properties(server, catalog):
    _cat, port = server
    st, res = _req(port, "/v1/namespaces/db/properties", {
        "updates": {"owner": "ops", "tier": "gold"}})
    assert st == 200
    assert res["updated"] == ["owner", "tier"]
    st, res = _get(port, "/v1/namespaces/db")
    assert res["properties"] == {"owner": "ops", "tier": "gold"}
    st, res = _req(port, "/v1/namespaces/db/properties", {
        "updates": {"tier": "silver"}, "removals": ["owner", "ghost"]})
    assert res["updated"] == ["tier"]
    assert res["removed"] == ["owner"]
    assert res["missing"] == ["ghost"]
    st, res = _get(port, "/v1/namespaces/db")
    assert res["properties"] == {"tier": "silver"}
    # same key in updates AND removals -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/properties", {
            "updates": {"k": "v"}, "removals": ["k"]})
    assert ei.value.code == 400
    # unknown namespace -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/nope/properties", {"updates": {"a": "b"}})
    assert ei.value.code == 404


def test_rest_register_table(server, catalog, tmp_path):
    from iceberg_spark.sources.iceberg import export_reference_metadata

    _cat, port = server
    t = catalog.load_table("db.rest_t")
    mpath = export_reference_metadata(t, str(tmp_path / "refexp"))
    st, res = _req(port, "/v1/namespaces/db/register", {
        "name": "adopted", "metadata-location": mpath})
    assert st == 200
    assert res["metadata-location"]
    adopted = catalog.load_table("db.adopted")
    assert adopted.to_df().count() == 40
    # duplicate register -> 409
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/register", {
            "name": "adopted", "metadata-location": mpath})
    assert ei.value.code == 409
    # bogus location -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/register", {
            "name": "ghost", "metadata-location": str(tmp_path / "nope")})
    assert ei.value.code == 404


def test_rest_rename_view(server, catalog):
    from iceberg_spark.views import load_view

    _cat, port = server
    _req(port, "/v1/namespaces/db/views", {
        "name": "v_orig", "view-version": {
            "version-id": 1, "representations": [
                {"type": "sql", "sql": "SELECT 1 AS one",
                 "dialect": "spark"}]}})
    st, _ = _req(port, "/v1/views/rename", {
        "source": {"namespace": ["db"], "name": "v_orig"},
        "destination": {"namespace": ["db"], "name": "v_new"}})
    assert st == 200
    assert load_view(catalog, "db.v_orig") is None
    vm = load_view(catalog, "db.v_new")
    assert vm is not None and vm.identifier == "db.v_new"
    assert "SELECT 1" in vm.sql
    with pytest.raises(urllib.error.HTTPError) as ei:  # gone -> 404
        _req(port, "/v1/views/rename", {
            "source": {"namespace": ["db"], "name": "v_orig"},
            "destination": {"namespace": ["db"], "name": "v2"}})
    assert ei.value.code == 404


def test_rest_commit_transaction(server, catalog):
    _cat, port = server
    df = catalog.spark.range(0, 5).select(
        "id", (F.col("id") % 2).alias("grp"))
    t2 = catalog.create_table("db.rest_t2", df.schema)
    t2.append(df)
    t1 = catalog.load_table("db.rest_t")
    sid1 = t1.current_snapshot().snapshot_id
    sid2 = t2.current_snapshot().snapshot_id

    # both requirements hold -> both tables updated, 204
    st, _ = _req(port, "/v1/transactions/commit", {
        "table-changes": [
            {"identifier": {"namespace": ["db"], "name": "rest_t"},
             "requirements": [{"type": "assert-ref-snapshot-id",
                               "ref": "main", "snapshot-id": sid1}],
             "updates": [{"action": "set-properties",
                          "updates": {"txn": "1"}}]},
            {"identifier": {"namespace": ["db"], "name": "rest_t2"},
             "requirements": [{"type": "assert-ref-snapshot-id",
                               "ref": "main", "snapshot-id": sid2}],
             "updates": [{"action": "set-properties",
                          "updates": {"txn": "1"}}]},
        ]})
    assert st == 204
    assert catalog.load_table("db.rest_t").properties["txn"] == "1"
    assert catalog.load_table("db.rest_t2").properties["txn"] == "1"

    # second table's requirement fails -> 409, NEITHER table changes
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/transactions/commit", {
            "table-changes": [
                {"identifier": {"namespace": ["db"], "name": "rest_t"},
                 "updates": [{"action": "set-properties",
                              "updates": {"txn": "2"}}]},
                {"identifier": {"namespace": ["db"], "name": "rest_t2"},
                 "requirements": [{"type": "assert-ref-snapshot-id",
                                   "ref": "main", "snapshot-id": -1}],
                 "updates": [{"action": "set-properties",
                              "updates": {"txn": "2"}}]},
            ]})
    assert ei.value.code == 409
    assert catalog.load_table("db.rest_t").properties["txn"] == "1"
    assert catalog.load_table("db.rest_t2").properties["txn"] == "1"


def test_rest_list_namespaces_parent(server, catalog):
    _cat, port = server
    catalog.create_namespace("db.child1", exists_ok=True)
    catalog.create_namespace("db.child2", exists_ok=True)
    catalog.create_namespace("db.child1.grand", exists_ok=True)
    st, res = _get(port, "/v1/namespaces?parent=db")
    assert st == 200
    assert res["namespaces"] == [["db", "child1"], ["db", "child2"]]
    st, res = _get(port, "/v1/namespaces?parent=db%1Fchild1")
    assert res["namespaces"] == [["db", "child1", "grand"]]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/namespaces?parent=nope")
    assert ei.value.code == 404


def test_rest_malformed_bodies_are_400(server):
    _cat, port = server
    # createTable without a schema -> 400, not 500
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables", {"name": "broken"})
    assert ei.value.code == 400
    # invalid JSON -> 400
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/namespaces", method="POST",
        data=b"{not json", headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    # rename without destination -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/tables/rename",
             {"source": {"namespace": ["db"], "name": "rest_t"}})
    assert ei.value.code == 400


def test_rest_stage_create_and_commit(server, catalog):
    _cat, port = server
    # stage: no table lands in the catalog
    st, res = _req(port, "/v1/namespaces/db/tables", {
        "name": "staged_t", "schema": _SCHEMA_JSON, "stage-create": True,
        "properties": {"origin": "staged"}})
    assert st == 200
    assert res["metadata"]["snapshots"] == []
    assert not catalog.table_exists("db.staged_t")
    with pytest.raises(urllib.error.HTTPError) as ei:  # loadTable -> 404
        _get(port, "/v1/namespaces/db/tables/staged_t")
    assert ei.value.code == 404
    # commit with assert-create materializes it
    st, res = _req(port, "/v1/namespaces/db/tables/staged_t", {
        "requirements": [{"type": "assert-create"}],
        "updates": [{"action": "set-properties",
                     "updates": {"committed": "yes"}}]})
    assert st == 200
    t = catalog.load_table("db.staged_t")
    assert t.properties["origin"] == "staged"
    assert t.properties["committed"] == "yes"
    assert [f.name for f in t.schema.fields] == ["id", "v"]
    # a second assert-create commit now fails: the table exists
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/staged_t", {
            "requirements": [{"type": "assert-create"}], "updates": []})
    assert ei.value.code == 409


def test_rest_stage_create_requirement_conflicts(server, catalog):
    _cat, port = server
    _req(port, "/v1/namespaces/db/tables", {
        "name": "staged_u", "schema": _SCHEMA_JSON, "stage-create": True})
    # non-create requirements cannot hold against a staged (metadata-less)
    # table
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/staged_u", {
            "requirements": [{"type": "assert-ref-snapshot-id",
                              "ref": "main", "snapshot-id": 1}],
            "updates": []})
    assert ei.value.code == 409
    assert not catalog.table_exists("db.staged_u")


def test_rest_commit_is_atomic(server, catalog):
    """A CommitTableRequest whose LATER update fails publishes NOTHING:
    all updates build one new metadata and land in a single swap
    (CatalogHandlers.commit), so an early schema update never leaks when
    a subsequent add-snapshot is rejected."""
    _cat, port = server
    t = catalog.load_table("db.rest_t")
    v_before = t.ops.current_version()
    dup_sid = t.current_snapshot().snapshot_id  # already committed
    _st, res = _get(port, "/v1/namespaces/db/tables/rest_t")
    ml = res["metadata"]["snapshots"][0]["manifest-list"]
    new_schema = {
        "type": "struct", "schema-id": 5, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "grp", "required": False, "type": "long"},
            {"id": 9, "name": "leak", "required": False,
             "type": "string"}]}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "updates": [
                {"action": "add-schema", "schema": new_schema},
                {"action": "set-current-schema", "schema-id": -1},
                {"action": "add-snapshot", "snapshot": {
                    "snapshot-id": dup_sid, "timestamp-ms": 1,
                    "manifest-list": ml, "summary":
                        {"operation": "append"}}}]})
    assert ei.value.code == 400
    t = catalog.load_table("db.rest_t")
    # nothing landed: schema, version, and snapshot count all unchanged
    assert [f.name for f in t.schema.fields] == ["id", "grp"]
    assert t.ops.current_version() == v_before
    assert not any(s.schema_id == 5 for s in t.metadata.schemas)
    # a clean retry of a VALID commit still works (no poisoned state)
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "updates": [{"action": "set-properties",
                     "updates": {"retry.ok": "1"}}]})
    assert st == 200
    assert catalog.load_table("db.rest_t").properties["retry.ok"] == "1"


def test_rest_views_list_missing_namespace_404(server):
    _cat, port = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/namespaces/no_such_ns/views")
    assert ei.value.code == 404
    assert "NoSuchNamespace" in json.loads(
        ei.value.read())["error"]["type"]


def test_rest_lazy_snapshot_loading(server, catalog):
    """loadTable?snapshots=refs serves only ref-reachable snapshots
    (RESTSessionCatalog snapshot-loading-mode): huge-history tables
    don't ship their whole snapshot list per load; snapshots=all (and
    the default) still return full history."""
    t = catalog.load_table("db.rest_t")
    for i in range(3):  # grow history beyond the ref heads
        t.append(t.spark.range(500 + i, 501 + i).selectExpr(
            "id", "id % 4 AS grp"))
        t = t.refresh()
    t.manage_snapshots().create_tag("keep", t.snapshots()[1].snapshot_id)
    t = t.refresh()
    n_all = len(t.snapshots())
    assert n_all >= 4
    _cat, port = server
    st, full = _get(port, "/v1/namespaces/db/tables/rest_t")
    assert st == 200
    assert len(full["metadata"]["snapshots"]) == n_all
    st, lazy = _get(port,
                    "/v1/namespaces/db/tables/rest_t?snapshots=refs")
    assert st == 200
    served = {s["snapshot-id"] for s in lazy["metadata"]["snapshots"]}
    heads = {r["snapshot-id"]
             for r in lazy["metadata"]["refs"].values()}
    assert served == heads and len(served) < n_all
    # log trimmed consistently; refs intact for requirement building
    assert all(e["snapshot-id"] in served
               for e in lazy["metadata"]["snapshot-log"])
    st, full2 = _get(port,
                     "/v1/namespaces/db/tables/rest_t?snapshots=all")
    assert len(full2["metadata"]["snapshots"]) == n_all
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/namespaces/db/tables/rest_t?snapshots=bogus")
    assert ei.value.code == 400


def test_rest_oauth2_token_flow(catalog, spark):
    """OAuth2 surface (rest-catalog-open-api.yaml securitySchemes): a
    credentialed server 401s every catalog endpoint until the client
    trades client_credentials for a bearer token at /v1/oauth/tokens."""
    from urllib.parse import urlencode

    from iceberg_spark.rest_catalog import serve

    df = spark.range(0, 5).select("id")
    catalog.create_table("db.auth_t", df.schema).append(df)
    srv, port = serve(catalog, credential="trino:s3cr3t")
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:  # no token
            _get(port, "/v1/namespaces/db/tables/auth_t")
        assert ei.value.code == 401
        assert "NotAuthorized" in json.loads(
            ei.value.read())["error"]["type"]

        def token_req(body):
            return urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/oauth/tokens",
                method="POST", data=urlencode(body).encode(),
                headers={"Content-Type":
                         "application/x-www-form-urlencoded"})

        with pytest.raises(urllib.error.HTTPError) as ei:  # bad secret
            urllib.request.urlopen(token_req(
                {"grant_type": "client_credentials",
                 "client_id": "trino", "client_secret": "wrong"}))
        assert ei.value.code == 401
        assert json.loads(ei.value.read())["error"] == "invalid_client"

        with urllib.request.urlopen(token_req(
                {"grant_type": "client_credentials",
                 "client_id": "trino",
                 "client_secret": "s3cr3t"})) as r:
            tok = json.loads(r.read())
        assert tok["token_type"] == "bearer" and tok["access_token"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/namespaces/db/tables/auth_t",
            headers={"Authorization": f"Bearer {tok['access_token']}"})
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        assert res["metadata"]["refs"]["main"]["snapshot-id"]

        # unauthenticated servers stay open (the default surface)
        srv2, port2 = serve(catalog)
        try:
            st, _ = _get(port2, "/v1/namespaces/db/tables/auth_t")
            assert st == 200
        finally:
            srv2.shutdown()
    finally:
        srv.shutdown()


def _client_encrypted_append(port, cat, master, ident, n_rows):
    """Stand-in for an external REST client committing a snapshot whose
    manifest LIST (and manifest) are AES GCM Streams keyed through a
    client-built `encryption-keys` chain wrapped by the SHARED KMS key
    (EncryptionUtil.encryptManifestListKeyMetadata shape). Returns the
    CommitTableRequest body and the new snapshot id."""
    import base64
    import secrets
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_spark.avro_file import read_avro_bytes, write_avro
    from iceberg_spark.encryption import (StandardTableKeys,
                                          aes_gcm_decrypt,
                                          aes_gcm_encrypt,
                                          decrypt_stream,
                                          encode_standard_key_metadata,
                                          encrypt_stream)
    from iceberg_spark.sources.iceberg_fixture import (
        MANIFEST_LIST_SCHEMA, manifest_entry_schema)

    st, res = _get(port, f"/v1/namespaces/db/tables/{ident.split('.')[1]}")
    assert st == 200
    md = res["metadata"]
    base_sid = md["refs"]["main"]["snapshot-id"]
    new_seq = md["last-sequence-number"] + 1
    new_sid = 4500000000000000000 + new_seq

    def kms_unwrap(wrapped, kid):
        try:
            return aes_gcm_decrypt(master, wrapped,
                                   (kid or "").encode("utf-8"))
        except ValueError:
            return aes_gcm_decrypt(master, wrapped, b"")

    # prior live state: decrypt the served (encrypted) manifest list
    tk = StandardTableKeys(md.get("encryption-keys") or [], kms_unwrap)
    cur_snap = next(s for s in md["snapshots"]
                    if s["snapshot-id"] == base_sid)
    lkey0, laad0 = tk.manifest_list_key(cur_snap["key-id"])
    raw = open(cur_snap["manifest-list"], "rb").read()
    _, _, prior = read_avro_bytes(decrypt_stream(raw, lkey0, laad0),
                                  cur_snap["manifest-list"])

    t = cat.load_table(ident)
    data_dir = os.path.join(t.location, "data")
    os.makedirs(data_dir, exist_ok=True)
    dpath = os.path.join(data_dir, f"enc-rest-{uuid.uuid4().hex}.parquet")
    pq.write_table(pa.table({
        "id": pa.array(range(2000, 2000 + n_rows), pa.int64()),
        "grp": pa.array([8] * n_rows, pa.int64())}), dpath)

    mdir = os.path.join(t.location, "metadata")
    entry_schema = manifest_entry_schema([])
    mpath = os.path.join(mdir, f"{uuid.uuid4().hex}-m0.avro")
    write_avro(mpath, entry_schema, [{
        "status": 1, "snapshot_id": new_sid,
        "sequence_number": None, "file_sequence_number": None,
        "data_file": {
            "content": 0, "file_path": dpath, "file_format": "PARQUET",
            "partition": {}, "record_count": n_rows,
            "file_size_in_bytes": os.path.getsize(dpath),
            "column_sizes": None, "value_counts": None,
            "null_value_counts": None, "lower_bounds": None,
            "upper_bounds": None, "key_metadata": None,
            "split_offsets": None, "equality_ids": None,
            "sort_order_id": None, "referenced_data_file": None,
            "content_offset": None, "content_size_in_bytes": None}}],
        {"schema": json.dumps(md["schemas"][0]),
         "schema-id": "0", "partition-spec": "[]",
         "partition-spec-id": "0", "format-version": "3",
         "content": "data"}, codec="deflate")
    # encrypt the manifest as a whole-file GCM stream; its
    # StandardKeyMetadata rides the list entry (fid 519)
    mkey, maad = secrets.token_bytes(16), secrets.token_bytes(16)
    mraw = open(mpath, "rb").read()
    open(mpath, "wb").write(encrypt_stream(mraw, mkey, maad))

    ml_schema = {**MANIFEST_LIST_SCHEMA,
                 "fields": MANIFEST_LIST_SCHEMA["fields"] + [
                     {"name": "key_metadata", "type": ["null", "bytes"],
                      "default": None, "field-id": 519}]}
    rows = [dict(r) for r in prior] + [{
        "manifest_path": mpath,
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0, "content": 0,
        "sequence_number": new_seq, "min_sequence_number": new_seq,
        "added_snapshot_id": new_sid, "added_files_count": 1,
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": n_rows, "existing_rows_count": 0,
        "deleted_rows_count": 0, "partitions": None,
        "key_metadata": encode_standard_key_metadata(
            mkey, maad, os.path.getsize(mpath))}]
    for r in rows:
        r.setdefault("key_metadata", None)
    ml_path = os.path.join(
        mdir, f"snap-{new_sid}-1-{uuid.uuid4().hex}.avro")
    write_avro(ml_path, ml_schema, rows, {"format-version": "3"},
               codec="deflate")
    # encrypt the manifest LIST; chain its key: SKM(list key) under a
    # fresh KEK (AAD = KEY_TIMESTAMP), KEK wrapped by the shared KMS key
    # with the client's convention (empty AAD — exercises the server's
    # dual-convention unwrap)
    lkey, laad = secrets.token_bytes(16), secrets.token_bytes(16)
    lraw = open(ml_path, "rb").read()
    enc_list = encrypt_stream(lraw, lkey, laad)
    open(ml_path, "wb").write(enc_list)
    kek, kek_id = secrets.token_bytes(16), f"kek-{uuid.uuid4().hex}"
    ts = str(int(_time.time() * 1000))
    ml_id = f"ml-{uuid.uuid4().hex}"
    kek_entry = {
        "key-id": kek_id,
        "encrypted-key-metadata": base64.b64encode(
            aes_gcm_encrypt(master, kek, b"")).decode("ascii"),
        "encrypted-by-id": "kms:client",
        "properties": {"KEY_TIMESTAMP": ts}}
    ml_entry = {
        "key-id": ml_id,
        "encrypted-key-metadata": base64.b64encode(
            aes_gcm_encrypt(kek, encode_standard_key_metadata(
                lkey, laad, len(enc_list)), ts.encode("utf-8")))
        .decode("ascii"),
        "encrypted-by-id": kek_id}

    snap = {"snapshot-id": new_sid, "parent-snapshot-id": base_sid,
            "sequence-number": new_seq, "timestamp-ms": 1700000456789,
            "summary": {"operation": "append"},
            "manifest-list": ml_path, "schema-id": 0,
            "key-id": ml_id}
    return {
        "requirements": [{"type": "assert-ref-snapshot-id", "ref": "main",
                          "snapshot-id": base_sid}],
        "updates": [
            {"action": "add-encryption-key", "encryption-key": kek_entry},
            {"action": "add-encryption-key", "encryption-key": ml_entry},
            {"action": "add-snapshot", "snapshot": snap},
            {"action": "set-snapshot-ref", "ref-name": "main",
             "type": "branch", "snapshot-id": new_sid}]}, new_sid


def test_rest_commit_encrypted_snapshot(spark, tmp_path):
    """External-style encrypted commit round-trips: the client adds its
    KEK chain via add-encryption-key updates and commits a snapshot
    whose manifest list/manifest are GCM streams; the server (holding
    the table's metadata_key) unwraps, replays, and the table reads the
    union. A server WITHOUT the key refuses with the narrowed
    foreign-KMS error."""
    from iceberg_spark.encryption import MAGIC
    from iceberg_spark.table import Catalog

    master = bytes(range(48, 64))
    cat = Catalog(spark, str(tmp_path / "encwh"), metadata_key=master)
    df = spark.range(0, 40).select("id", (F.col("id") % 4).alias("grp"))
    t = cat.create_table("db.enc_rest", df.schema)
    t.append(df)
    srv, port = serve(cat)
    try:
        body, new_sid = _client_encrypted_append(
            port, cat, master, "db.enc_rest", 7)
        st, res = _req(port, "/v1/namespaces/db/tables/enc_rest", body)
        assert st == 200
        assert res["metadata"]["refs"]["main"]["snapshot-id"] == new_sid
        t = cat.load_table("db.enc_rest")
        assert t.current_snapshot().snapshot_id == new_sid
        assert t.to_df().count() == 47
        assert t.to_df().where(F.col("id") >= 2000).count() == 7
        # the replayed commit's OWN metadata stays encrypted (the shadow
        # ops carry the table's metadata_key through the REST swap)
        mdir = os.path.join(t.location, "metadata")
        for f in os.listdir(mdir):
            if f.endswith(".avro") or f.endswith(".parquet"):
                assert open(os.path.join(mdir, f), "rb").read(4) == MAGIC, f
    finally:
        srv.shutdown()


def test_rest_encrypted_commit_refused_without_key(spark, tmp_path):
    """The structured refusal narrows to truly-foreign KMS: a server
    that does NOT hold the table's KMS key 400s an encrypted
    add-snapshot with guidance."""
    from iceberg_spark.table import Catalog

    master = bytes(range(48, 64))
    cat = Catalog(spark, str(tmp_path / "encwh2"), metadata_key=master)
    df = spark.range(0, 10).select("id", (F.col("id") % 4).alias("grp"))
    t = cat.create_table("db.enc_rest2", df.schema)
    t.append(df)
    srv, port = serve(cat)
    try:
        body, _sid = _client_encrypted_append(
            port, cat, master, "db.enc_rest2", 3)
    finally:
        srv.shutdown()
    # same table served WITHOUT the key: loadTable of encrypted trees
    # needs the key, so serve a keyless catalog and hit the commit path
    cat2 = Catalog(spark, str(tmp_path / "encwh2"))
    cat2.metadata_key = None
    srv2, port2 = serve(cat2)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _req(port2, "/v1/namespaces/db/tables/enc_rest2", body)
        err = json.loads(ei.value.read())["error"]
        assert ei.value.code in (400, 500)
        assert "KMS" in err["message"] or "metadata_key" in err["message"]
    finally:
        srv2.shutdown()


def test_rest_load_table_raw_dek_without_key_is_422(spark, tmp_path):
    """loadTable over an imported raw-DEK table in a catalog WITHOUT a
    metadata_key: serving the reference layout would require plaintext
    manifests carrying the raw file keys — the endpoint answers a clean
    422 instead of leaking or 500ing."""
    import secrets

    from iceberg_spark import jvm_crypto as JC
    from iceberg_spark.encryption import (aes_gcm_decrypt,
                                          encode_standard_key_metadata)
    from iceberg_spark.sources.iceberg import snapshot_iceberg_table
    from iceberg_spark.sources.iceberg_fixture import write_reference_table
    from iceberg_spark.table import Catalog

    if not JC.available(spark):
        pytest.skip("JVM crypto unavailable")
    master = bytes(range(48, 64))
    root = str(tmp_path / "src")
    os.makedirs(os.path.join(root, "data"))
    dek, aad = secrets.token_bytes(16), secrets.token_bytes(8)
    dest = os.path.join(root, "data", "e.parquet")
    tmp = str(tmp_path / "w")
    (spark.range(10).coalesce(1).write
     .options(**JC.raw_writer_options(dek, aad)).parquet(tmp))
    import glob as _glob

    os.rename(_glob.glob(os.path.join(tmp, "*.parquet"))[0], dest)
    write_reference_table(
        root,
        {"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"}]},
        [{"path": dest, "record_count": 10,
          "file_size": os.path.getsize(dest), "seq": 1,
          "key_metadata": encode_standard_key_metadata(
              dek, aad, os.path.getsize(dest))}],
        format_version=3, encryption_key=master)
    cat = Catalog(spark, str(tmp_path / "wh"))  # NO metadata_key
    # explicit opt-in: this test WANTS the degenerate raw-DEK-in-plain-
    # catalog state to prove the REST endpoint answers 422, not 500
    snapshot_iceberg_table(
        cat, root, "db.rawrest",
        kms_unwrap=lambda w, k: aes_gcm_decrypt(master, w, b""),
        allow_plaintext_key_metadata=True)
    srv, port = serve(cat)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/v1/namespaces/db/tables/rawrest")
        assert ei.value.code == 422
        err = json.loads(ei.value.read())["error"]
        assert "leak" in err["message"] or "encryption_key" in err["message"]
    finally:
        srv.shutdown()


def test_rest_remove_encryption_key(spark, tmp_path):
    """remove-encryption-key deletes a chain entry; add+remove in one
    request leaves metadata unchanged."""
    from iceberg_spark.table import Catalog

    master = bytes(range(48, 64))
    cat = Catalog(spark, str(tmp_path / "wh"), metadata_key=master)
    df = spark.range(0, 10).selectExpr("id")
    t = cat.create_table("db.enc_keys", df.schema)
    t.append(df)
    srv, port = serve(cat)
    try:
        before = {k["key-id"]
                  for k in cat.load_table("db.enc_keys")
                  .metadata.encryption_keys}
        body = {"requirements": [], "updates": [
            {"action": "add-encryption-key", "encryption-key": {
                "key-id": "tmp-key",
                "encrypted-key-metadata": "AAAA",
                "encrypted-by-id": "kms:x"}},
            {"action": "remove-encryption-key", "key-id": "tmp-key"}]}
        st, _res = _req(port, "/v1/namespaces/db/tables/enc_keys", body)
        assert st == 200
        after = {k["key-id"]
                 for k in cat.load_table("db.enc_keys")
                 .metadata.encryption_keys}
        assert after == before
    finally:
        srv.shutdown()


def test_load_table_incremental_export_reuse(spark, tmp_path):
    """REST loadTable re-exports O(new snapshots), not O(history): the
    previous export tree's immutable per-snapshot manifests HARDLINK
    into the new tree (deterministic names), superseded trees GC down
    to current+previous, and the reused tree re-imports exactly."""
    import glob

    from iceberg_spark.rest_catalog import _load_table_result
    from iceberg_spark.sources.iceberg import register_iceberg_table
    from iceberg_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.range(0, 120).selectExpr("id", "id % 3 as g")
    t = cat.create_table("db.increxp", df.schema)
    for i in range(5):
        t.append(df.filter(f"id % 5 = {i}"))
        t = cat.load_table("db.increxp")
        res = _load_table_result(cat, "db.increxp")
    base = os.path.join(t.location, "metadata-export")
    dirs = sorted(d for d in os.listdir(base) if d.startswith("h"))
    assert len(dirs) <= 2, dirs  # GC: current + previous only
    cur = os.path.join(base, f"h{t.current_snapshot().snapshot_id}",
                       "metadata")
    mans = glob.glob(os.path.join(cur, "snap*-m0.avro"))
    assert len(mans) == 5
    linked = sum(1 for m in mans if os.stat(m).st_nlink >= 2)
    assert linked >= 3, [os.stat(m).st_nlink for m in mans]
    cat2 = Catalog(spark, str(tmp_path / "wh2"))
    t2, n_snaps, _ = register_iceberg_table(
        cat2, os.path.dirname(cur), "db.increxp_rt")
    assert n_snaps == 5
    got = sorted(r.id for r in t2.to_df().select("id").collect())
    assert got == list(range(120))


def test_rest_remove_schemas_and_specs(server, catalog):
    """A REST client running expire-snapshots cleanExpiredMetadata commits
    remove-schemas / remove-partition-specs actions
    (core/.../MetadataUpdateParser.java:60-61,132-135). The server prunes
    the named ids but refuses to drop the current schema / default spec."""
    _cat, port = server
    t = catalog.load_table("db.rest_t")
    new_schema = {
        "type": "struct", "schema-id": 1, "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "grp", "required": False, "type": "long"},
            {"id": 3, "name": "note", "required": False,
             "type": "string"}]}
    new_spec = {"spec-id": 1, "fields": [
        {"name": "grp", "transform": "identity", "source-id": 2,
         "field-id": 1000}]}
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "requirements": [],
        "updates": [
            {"action": "add-schema", "schema": new_schema},
            {"action": "set-current-schema", "schema-id": -1},
            {"action": "add-spec", "spec": new_spec},
            {"action": "set-default-spec", "spec-id": -1}]})
    assert st == 200
    t = catalog.load_table("db.rest_t")
    assert len(t.metadata.schemas) == 2
    assert len(t.metadata.partition_specs) == 2
    # while the pre-evolution snapshot is retained, the server REFUSES to
    # drop the ids it still references (it re-derives reachability itself)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "requirements": [],
            "updates": [{"action": "remove-schemas", "schema-ids": [0]}]})
    assert ei.value.code == 400
    # rewrite every live file under the new schema+spec and expire the
    # old snapshots so the originals become truly unreachable
    df = t.spark.range(0, 40).select(
        "id", (F.col("id") % 4).alias("grp"), F.lit("x").alias("note"))
    t.overwrite(df)
    t = t.refresh()
    import time as _time

    t.expire_snapshots(older_than_ms=int(_time.time() * 1000) + 1000,
                       retain_last=1)
    # dropping the now-unreachable originals (schema 0 / spec 0) succeeds
    st, _ = _req(port, "/v1/namespaces/db/tables/rest_t", {
        "requirements": [],
        "updates": [
            {"action": "remove-schemas", "schema-ids": [0]},
            {"action": "remove-partition-specs", "spec-ids": [0]}]})
    assert st == 200
    t = catalog.load_table("db.rest_t")
    assert [s.schema_id for s in t.metadata.schemas] == [1]
    assert [s.spec_id for s in t.metadata.partition_specs] == [1]
    assert t.to_df().count() == 40  # table still reads
    # the current schema / default spec are immovable -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "requirements": [],
            "updates": [{"action": "remove-schemas", "schema-ids": [1]}]})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/v1/namespaces/db/tables/rest_t", {
            "requirements": [],
            "updates": [{"action": "remove-partition-specs",
                         "spec-ids": [1]}]})
    assert ei.value.code == 400


def test_rest_load_table_etag_304(server, catalog, spark):
    """loadTable ETag / If-None-Match (open-api: 304 Not Modified when
    the client's tag is current; distinct tags per snapshots mode;
    commit invalidates)."""
    _cat, port = server
    url = f"http://127.0.0.1:{port}/v1/namespaces/db/tables/rest_t"
    with urllib.request.urlopen(url) as r:
        assert r.status == 200
        etag = r.headers.get("ETag")
        assert etag
    # revalidation with the current tag -> 304, empty body
    req = urllib.request.Request(url, headers={"If-None-Match": etag})
    try:
        with urllib.request.urlopen(req) as r:
            status, body = r.status, r.read()
    except urllib.error.HTTPError as e:  # urllib may surface 304 as error
        status, body = e.code, e.read()
    assert status == 304 and body == b""
    # snapshots=refs is a DIFFERENT representation -> different tag
    with urllib.request.urlopen(url + "?snapshots=refs") as r:
        assert r.status == 200
        assert r.headers.get("ETag") != etag
    # a commit bumps the metadata version -> old tag no longer matches
    t = catalog.load_table("db.rest_t")
    df = spark.range(40, 50).select("id", (F.col("id") % 4).alias("grp"))
    t.append(df)
    req = urllib.request.Request(url, headers={"If-None-Match": etag})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers.get("ETag") not in (None, etag)


def test_load_table_vends_storage_credentials(catalog, spark, tmp_path):
    """open-api LoadTableResult storage-credentials: an encrypted
    table's loadTable response vends its master key (the engine's
    decryption-credential analog of vended object-store keys); a client
    with NO ambient credentials fails to read, applies the vended
    credentials, and reads successfully."""
    from iceberg_spark import parquet_crypto as PC
    from iceberg_spark.io import apply_vended_credentials

    from iceberg_spark.rest_catalog import _storage_credentials

    kid, key = "vend-key", bytes(range(16, 32))
    PC.register_key(kid, key)
    df = spark.range(0, 25).select("id")
    t = catalog.create_table("db.vended_enc", df.schema, properties={
        "encryption.key-id": kid})
    t.append(df)

    # the loadTable response payload for an engine-encrypted table
    # cannot be exported by reference (documented refusal — the
    # reference cannot unwrap engine parquet-kms key metadata), so the
    # vended-credentials section is exercised at the builder level with
    # the exact response shape; the end-to-end HTTP path is covered by
    # test_vended_fs_config_reaches_fileio below.
    res = {"storage-credentials":
           _storage_credentials(catalog, "db.vended_enc", t)}
    creds = res["storage-credentials"]
    assert creds and creds[0]["prefix"] == t.location
    assert creds[0]["config"][f"encryption.key.{kid}"] == key.hex()

    # keyless client: the scan must refuse loudly...
    PC.unregister_key(kid)
    t2 = catalog.load_table("db.vended_enc")
    with pytest.raises(Exception, match="key"):
        t2.to_df().collect()
    # ...until the vended credentials are applied
    assert apply_vended_credentials(res) == 1
    try:
        assert t2.to_df().count() == 25
    finally:
        PC.unregister_key(kid)


def test_vended_fs_config_reaches_fileio(catalog, spark):
    """Non-key vended entries overlay the FileIO configuration for
    paths under the vended prefix only — the session Hadoop conf stays
    untouched (S3FileIO-style per-table credentials, locally expressed
    as Hadoop conf keys)."""
    from iceberg_spark import io as _io
    from iceberg_spark.io import apply_vended_credentials, resolve_io

    df = spark.range(0, 5).select("id")
    t = catalog.create_table("db.vended_fs", df.schema, properties={
        "vended.credential.fs.vendtest.access.key": "AKIA-TEST"})
    t.append(df)
    srv, port = serve(catalog)
    try:
        st, res = _get(port, "/v1/namespaces/db/tables/vended_fs")
        assert st == 200
        assert res["storage-credentials"][0]["config"][
            "fs.vendtest.access.key"] == "AKIA-TEST"
        applied = apply_vended_credentials(res)
        assert applied == 1
        under = resolve_io("file://" + t.location + "/data/x.parquet",
                           spark)
        assert under._conf.get("fs.vendtest.access.key") == "AKIA-TEST"
        outside = resolve_io("file:///somewhere/else.parquet", spark)
        assert outside._conf.get("fs.vendtest.access.key") is None
        assert (spark._jsc.hadoopConfiguration()
                .get("fs.vendtest.access.key") is None)
    finally:
        srv.shutdown()
        _io._VENDED_CONF.clear()
