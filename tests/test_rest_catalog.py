"""Read-only REST catalog adapter: the open-api surface external tooling
uses to discover and load tables. loadTable serves REFERENCE-shaped
metadata (Avro manifests via export), so a genuine Iceberg client — here
simulated by our own importer consuming the served metadata-location —
can read engine tables over HTTP discovery."""

import json
import urllib.request

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


def test_errors_and_read_only(server):
    _cat, port = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(port, "/v1/namespaces/db/tables/nope")
    assert ei.value.code == 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/namespaces/db/tables", method="POST",
        data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 405
