"""Workload registry: named queries exercising the engine + DuckDB oracles.

Each entry: name -> (query_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
The driver runs the Spark query AND the oracle on the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings) and hash-compares values — column names must match,
so every computed column is aliased identically on both sides.

Engine-backed queries ingest the testdata into iceberg_spark tables
(metadata-only add_files where possible, append where a rewrite is needed)
in a per-process temp warehouse, then run through table.scan() — so the
correctness gate covers the metadata/commit/scan machinery, not just Spark
SQL.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import expressions as E
from .expressions import col
from .sources.testdata import load_table
from .table import Catalog, Table

_STATE: dict = {}


def _warehouse(spark: SparkSession) -> Catalog:
    if "catalog" not in _STATE:
        wh = tempfile.mkdtemp(prefix="iceberg_spark_wh_")
        # SPARK_GRAFT_FILEIO=hadoop runs the ENTIRE registry with the
        # warehouse behind the JVM Hadoop FileSystem (io.HadoopFileIO) —
        # the object-store code path, exercised end-to-end on a file: URI
        if os.environ.get("SPARK_GRAFT_FILEIO", "").lower() == "hadoop":
            wh = "file://" + wh
        _STATE["catalog"] = Catalog(spark, wh)
    return _STATE["catalog"]


def _ensure_conf(spark: SparkSession):
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # right-size shuffles for the bench scales (driver sessions default
        # to 200 partitions; AQE coalesces but the floor matters on small SF)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass


def _sf_key(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def engine_table(spark: SparkSession, sf_dir: str, name: str,
                 partition_by=None, fresh: bool = False, properties=None) -> Table:
    """Load a testdata table into the engine (cached per process+sf).

    Unpartitioned tables ingest metadata-only via add_files (no rewrite);
    partitioned ones (or type-converted ones like events) go through append.
    """
    _ensure_conf(spark)
    cat = _warehouse(spark)
    ident = f"{_sf_key(sf_dir)}.{name}" + ("_p" if partition_by else "")
    if fresh:
        import uuid

        ident = f"{ident}_{uuid.uuid4().hex[:8]}"
    elif cat.table_exists(ident):
        return cat.load_table(ident)
    df = load_table(spark, sf_dir, name)
    t = cat.create_table(ident, df.schema, partition_by=partition_by,
                         properties=properties)
    needs_rewrite = partition_by is not None or name == "events"
    if needs_rewrite:
        t.append(df)
    else:
        t.add_files(os.path.join(sf_dir, f"{name}.parquet"))
    return t


def _ldf(spark, sf_dir, name) -> DataFrame:
    """Engine-scan DataFrame for a testdata table."""
    return engine_table(spark, sf_dir, name).to_df()


# ---------------------------------------------------------------------------
# analytics queries (TPC-H-style, through the engine's table layer)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=col("l_shipdate") <= "1998-09-02T00:00:00"
    ).df()
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                      * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q6_revenue(spark, sf_dir):
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=E.and_(
            col("l_shipdate") >= "1994-01-01T00:00:00",
            col("l_shipdate") < "1995-01-01T00:00:00",
            col("l_discount") >= 0.05,
            col("l_discount") <= 0.07,
            col("l_quantity") < 24,
        )
    ).df()
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q3_shipping_priority(spark, sf_dir):
    cust = _ldf(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = engine_table(spark, sf_dir, "orders").scan(
        filter=col("o_orderdate") < "1995-03-15T00:00:00"
    ).df()
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=col("l_shipdate") > "1995-03-15T00:00:00"
    ).df()
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    return j


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark, sf_dir):
    region = _ldf(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _ldf(spark, sf_dir, "nation")
    cust = _ldf(spark, sf_dir, "customer")
    supp = _ldf(spark, sf_dir, "supplier")
    orders = engine_table(spark, sf_dir, "orders").scan(
        filter=E.and_(col("o_orderdate") >= "1996-01-01T00:00:00",
                      col("o_orderdate") < "1997-01-01T00:00:00")
    ).df()
    li = _ldf(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )
    return j


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def events_type_agg(spark, sf_dir):
    ev = _ldf(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"),
             F.countDistinct("user_id").alias("users"))
        .orderBy("event_type")
    )


EVENTS_AGG_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value,
       COUNT(DISTINCT user_id) AS users
FROM events GROUP BY event_type ORDER BY event_type
"""


def scan_prune_day(spark, sf_dir):
    """Hidden partitioning: day(ts) partitioned engine table, pruned scan."""
    t = engine_table(spark, sf_dir, "events", partition_by=["day(ts)"])
    import datetime as dt

    df = t.scan(filter=col("ts") < dt.datetime(2024, 1, 4)).df()
    return (df.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
              .orderBy("event_type"))


SCAN_PRUNE_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# write-algebra queries (time travel / delete / update / merge round-trips)
# ---------------------------------------------------------------------------


def time_travel_scan(spark, sf_dir):
    """Append evens then odds; scan the first snapshot (time travel)."""
    key = ("tt", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"tt_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema)
        t.append(df.filter(F.col("o_orderkey") % 2 == 0))
        s1 = t.current_snapshot().snapshot_id
        t.append(df.filter(F.col("o_orderkey") % 2 == 1))
        _STATE[key] = (ident, s1)
    ident, s1 = _STATE[key]
    t = _warehouse(spark).load_table(ident)
    return (t.scan(snapshot_id=s1).df()
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


TIME_TRAVEL_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 2 = 0
"""


def delete_cow_scan(spark, sf_dir):
    key = ("delcow", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"delcow_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "lineitem")
        t = cat.create_table(ident, df.schema)
        t.append(df)
        t.delete_where(E.and_(col("l_returnflag") == "R", col("l_quantity") < 10))
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty")))


DELETE_COW_SQL = """
SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total_price,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem WHERE NOT (l_returnflag = 'R' AND l_quantity < 10)
"""


def delete_mor_scan(spark, sf_dir):
    """Merge-on-read delete: position-delete files applied at read."""
    key = ("delmor", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"delmor_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema,
                             properties={"write.delete.mode": "merge-on-read"})
        t.append(df)
        # ~10% of rows position-deleted (lowest decile of the key range) —
        # the IcebergSourceDeleteBenchmark shape BASELINE.md target 3
        # compares against; partial-file match keeps it on the pos-delete
        # path rather than a metadata-only drop
        thr = df.agg(F.max("o_orderkey")).collect()[0][0] // 10
        t.delete_where(col("o_orderkey") <= thr, mode="merge-on-read")
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


DELETE_MOR_SQL = """
SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_orderkey > (SELECT MAX(o_orderkey) // 10 FROM orders)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def delete_mor_file_scan(spark, sf_dir):
    """MoR delete under `write.delete.granularity=file` (reference
    core/.../deletes/DeleteGranularity.java FILE): one position-delete
    file per touched data file with `referenced_data_file` recorded, so
    planning attaches deletes EXACTLY — a scan of one data file never
    reads another file's delete rows."""
    key = ("delmorfile", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"delmorfile_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema, properties={
            "write.delete.mode": "merge-on-read",
            "write.delete.granularity": "file"})
        # several data files so the per-file fanout is visible
        t.append(df.repartition(8))
        thr = df.agg(F.max("o_orderkey")).collect()[0][0] // 10
        t.delete_where(col("o_orderkey") <= thr, mode="merge-on-read")
        t = t.refresh()
        plan = t.scan().plan_files()
        assert plan.pos_deletes and all(
            d.file.referenced_data_file for d in plan.pos_deletes), \
            "file granularity must record referenced_data_file"
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


def update_scan(spark, sf_dir):
    key = ("upd", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"upd_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "customer")
        t = cat.create_table(ident, df.schema)
        t.append(df)
        t.update(col("c_mktsegment") == "BUILDING",
                 {"c_acctbal": F.round(F.col("c_acctbal") * 1.1, 2)})
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("c_acctbal"), 2).alias("bal"))
            .orderBy("c_mktsegment"))


UPDATE_SQL = """
SELECT c_mktsegment, COUNT(*) AS n,
       ROUND(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                      THEN ROUND(c_acctbal * 1.1, 2) ELSE c_acctbal END), 2) AS bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def merge_upsert_scan(spark, sf_dir):
    key = ("merge", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"merge_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema)
        t.append(df.filter(F.col("o_orderkey") % 2 == 0))
        src = (df.filter(F.col("o_orderkey") % 3 == 0)
                 .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2)))
        (t.merge(src, on=["o_orderkey"])
           .when_matched_update(set=None)
           .when_not_matched_insert(values=None)
           .execute())
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total")))


MERGE_SQL = """
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
     source AS (SELECT o_orderkey, ROUND(o_totalprice * 2, 2) AS o_totalprice
                FROM orders WHERE o_orderkey % 3 = 0)
SELECT COUNT(*) AS n, ROUND(SUM(price), 2) AS total FROM (
  SELECT COALESCE(s.o_totalprice, t.o_totalprice) AS price
  FROM target t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  SELECT s.o_totalprice AS price
  FROM source s LEFT JOIN target t ON t.o_orderkey = s.o_orderkey
  WHERE t.o_orderkey IS NULL
)
"""


def variant_extract_scan(spark, sf_dir):
    """v3 variant column + typed extract(path, type) through the scan layer
    (reference api/.../expressions/UnboundExtract.java, format/spec.md:243):
    documents get a JSON metadata variant; the scan filters on
    extract('$.len','long') and aggregates by extract('$.cat','int')."""
    key = ("variant", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"variant_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        docs = load_table(spark, sf_dir, "documents")
        df = docs.select(
            "doc_id",
            F.parse_json(F.concat(
                F.lit('{"len": '), F.length("text").cast("string"),
                F.lit(', "cat": '), (F.col("doc_id") % 5).cast("string"),
                F.lit('}'))).alias("meta"))
        t = cat.create_table(ident, df.schema)
        t.append(df)
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    sc = t.scan(filter=E.extract("meta", "$.len", "long") > 300)
    return (sc.df()
            .groupBy(F.variant_get("meta", "$.cat", "int").alias("cat"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.variant_get("meta", "$.len", "bigint"))
                 .alias("total_len"))
            .orderBy("cat"))


VARIANT_EXTRACT_SQL = """
SELECT CAST(doc_id % 5 AS INTEGER) AS cat, COUNT(*) AS n,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len
FROM documents WHERE LENGTH(text) > 300
GROUP BY 1 ORDER BY cat
"""


def variant_shredded_scan(spark, sf_dir):
    """Variant SHREDDING on write (reference parquet/.../
    VariantShreddingAnalyzer.java, VariantShreddingFunction.java,
    ParquetVariantVisitor.java): `write.variant.shred.meta` declares
    extract() paths that materialize as typed companion parquet columns;
    their per-file min/max land in manifests under synthetic field ids
    (manifests._stats_schema_fields), and extract(path) predicates prune
    FILES at plan time (expressions.bind resolves the shredded term,
    inclusive_metrics_eval uses its bounds). The fixture writes doc_id-
    clustered files so `$.key > hi` planning must skip most of them —
    asserted, not assumed."""
    key = ("variant_shred", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"variant_shred_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        docs = load_table(spark, sf_dir, "documents")
        df = docs.select(
            "doc_id",
            F.parse_json(F.concat(
                F.lit('{"len": '), F.length("text").cast("string"),
                F.lit(', "key": '), F.col("doc_id").cast("string"),
                F.lit('}'))).alias("meta"))
        t = cat.create_table(ident, df.schema, properties={
            "write.variant.shred.meta": "$.len:long;$.key:long"})
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        step = mx // 4 + 1
        for lo in range(0, mx + 1, step):  # doc_id-clustered files
            t.append(df.filter((F.col("doc_id") >= lo)
                               & (F.col("doc_id") < lo + step)))
        t = cat.load_table(ident)
        hi = mx - mx // 8  # top ~eighth of the key domain
        plan = t.scan(
            filter=E.extract("meta", "$.key", "long") >= hi).plan_files()
        total = len(t.scan().plan_files().files)
        assert 0 < len(plan.files) < total, (
            f"shredded variant predicate must skip files: "
            f"{len(plan.files)}/{total}")
        _STATE[key] = (ident, hi)
    ident, hi = _STATE[key]
    t = _warehouse(spark).load_table(ident)
    sc = t.scan(filter=E.extract("meta", "$.key", "long") >= hi)
    return (sc.df()
            .groupBy((F.variant_get("meta", "$.key", "bigint") % 7)
                     .alias("k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.variant_get("meta", "$.len", "bigint"))
                 .alias("total_len"))
            .orderBy("k"))


def variant_shredded_typed_value_scan(spark, sf_dir):
    """Variant shredding under the SPEC-PHYSICAL write layout
    (`write.variant.shred.layout=typed_value` — the typed_value group
    the reference's ParquetVariantVisitor.java writes, produced by
    Spark's native shredding writer): no engine companion columns in the
    files, companion STATS still land in manifests via the variant_get
    metrics aggregation, and extract() predicates still FILE-prune —
    asserted. Same query and oracle as the companion-layout twin, so
    the two layouts are differentially checked against each other
    through DuckDB."""
    key = ("variant_shred_tv", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"variant_shred_tv_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        docs = load_table(spark, sf_dir, "documents")
        df = docs.select(
            "doc_id",
            F.parse_json(F.concat(
                F.lit('{"len": '), F.length("text").cast("string"),
                F.lit(', "key": '), F.col("doc_id").cast("string"),
                F.lit('}'))).alias("meta"))
        t = cat.create_table(ident, df.schema, properties={
            "write.variant.shred.meta": "$.len:long;$.key:long",
            "write.variant.shred.layout": "typed_value"})
        mx = docs.agg(F.max("doc_id")).collect()[0][0]
        step = mx // 4 + 1
        for lo in range(0, mx + 1, step):  # doc_id-clustered files
            t.append(df.filter((F.col("doc_id") >= lo)
                               & (F.col("doc_id") < lo + step)))
        t = cat.load_table(ident)
        from .variant_shred import jvm_parquet_schema

        f0 = t.scan().plan_files().files[0].file
        phys = jvm_parquet_schema(spark, f0.file_path)
        assert "typed_value" in phys and "_shred_f" not in phys, \
            "typed_value layout must write spec-physical shredded files"
        hi = mx - mx // 8
        plan = t.scan(
            filter=E.extract("meta", "$.key", "long") >= hi).plan_files()
        total = len(t.scan().plan_files().files)
        assert 0 < len(plan.files) < total, (
            f"shredded variant predicate must skip files: "
            f"{len(plan.files)}/{total}")
        _STATE[key] = (ident, hi)
    ident, hi = _STATE[key]
    t = _warehouse(spark).load_table(ident)
    sc = t.scan(filter=E.extract("meta", "$.key", "long") >= hi)
    return (sc.df()
            .groupBy((F.variant_get("meta", "$.key", "bigint") % 7)
                     .alias("k"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.variant_get("meta", "$.len", "bigint"))
                 .alias("total_len"))
            .orderBy("k"))


# oracle derives hi = max - max/8 the same way (integer division)
VARIANT_SHREDDED_SQL = """
WITH b AS (SELECT MAX(doc_id) AS mx FROM documents)
SELECT CAST(doc_id % 7 AS BIGINT) AS k, COUNT(*) AS n,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len
FROM documents, b
WHERE doc_id >= b.mx - b.mx // 8
GROUP BY 1 ORDER BY k
"""


def geo_bbox_scan(spark, sf_dir):
    """v3 geometry column end-to-end (Types.java:574, geospatial/
    GeospatialPredicateEvaluators.java): events get deterministic lon/lat
    points encoded as WKB, the table is written range-clustered by lon so
    file bounding boxes are narrow, and the scan filters with an
    ST_INTERSECTS bbox predicate — file pruning from the WKB-point bounds
    in the manifests, residual bbox test in an Arrow-batched UDF."""
    from .geo import st_bbox, st_point

    key = ("geo", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"geo_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        from .schema import NestedField, Schema

        ev = load_table(spark, sf_dir, "events")
        df = (ev.select(
                "event_id",
                ((F.col("user_id") * 7) % 360 - 180).cast("double").alias("x"),
                ((F.col("event_id") * 13) % 180 - 90).cast("double").alias("y"))
              .repartitionByRange(8, "x").sortWithinPartitions("x")
              .select("event_id", st_point("x", "y").alias("geom")))
        schema = Schema((NestedField(1, "event_id", "long", True),
                         NestedField(2, "geom", "geometry", False)))
        t = cat.create_table(ident, schema)
        t.append(df)
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    scan = t.scan(filter=E.st_intersects("geom", (-60.0, -30.0, 20.0, 45.0)))
    box = scan.df().select("event_id", st_bbox("geom").alias("b"))
    return (box.select("event_id", F.col("b.xmin").alias("x"),
                       F.col("b.ymin").alias("y"))
               .orderBy("event_id"))


GEO_BBOX_SQL = """
SELECT event_id,
       CAST((user_id * 7) % 360 - 180 AS DOUBLE) AS x,
       CAST((event_id * 13) % 180 - 90 AS DOUBLE) AS y
FROM events
WHERE ((user_id * 7) % 360 - 180) BETWEEN -60 AND 20
  AND ((event_id * 13) % 180 - 90) BETWEEN -30 AND 45
ORDER BY event_id
"""


def geo_exact_scan(spark, sf_dir):
    """EXACT geospatial predicate (geo.py ray cast; the optional layer
    above the reference's bbox-only metadata eval,
    api/.../geospatial/GeospatialPredicateEvaluators.java): the same
    x-clustered WKB-point table as geo_bbox_scan, filtered with
    ST_INTERSECTS_POLY against a DIAMOND polygon — point-in-polygon is
    evaluated exactly row-level (not the bbox superset), and file-level
    pruning runs the exact rectangle-vs-polygon test on manifest bounds.
    The diamond |x+20.5|+|y-10.5| <= 40 has half-integer offsets so
    integer-grid points never sit ON the boundary — the oracle is pure
    arithmetic (this container has no DuckDB spatial extension; the
    predicate itself is exact either way). The plan must prune: a
    diamond covers half its bbox, and the corner files of the x-range
    miss it."""
    from .geo import st_bbox

    key = ("geo_exact", _sf_key(sf_dir))
    if key not in _STATE:
        # reuse geo_bbox_scan's table fixture
        geo_bbox_scan(spark, sf_dir)
        _STATE[key] = _STATE[("geo", _sf_key(sf_dir))]
    t = _warehouse(spark).load_table(_STATE[key])
    ring = [(-60.5, 10.5), (-20.5, 50.5), (19.5, 10.5), (-20.5, -29.5)]
    scan = t.scan(filter=E.st_intersects_polygon("geom", ring))
    total = len(t.scan().plan_files().files)
    kept = len(scan.plan_files().files)
    # kept == 0 is legitimate at tiny SFs (a handful of points, none in
    # the diamond); what must NEVER happen is a full-keep plan
    assert kept < total, \
        f"polygon predicate must prune x-clustered files: {kept}/{total}"
    box = scan.df().select("event_id", st_bbox("geom").alias("b"))
    return (box.select("event_id", F.col("b.xmin").alias("x"),
                       F.col("b.ymin").alias("y"))
               .orderBy("event_id"))


GEO_EXACT_SQL = """
SELECT event_id,
       CAST((user_id * 7) % 360 - 180 AS DOUBLE) AS x,
       CAST((event_id * 13) % 180 - 90 AS DOUBLE) AS y
FROM events
WHERE ABS(((user_id * 7) % 360 - 180) + 20.5)
    + ABS(((event_id * 13) % 180 - 90) - 10.5) <= 40
ORDER BY event_id
"""


def geo_exact_poly_scan(spark, sf_dir):
    """EXACT geospatial predicate over a POLYGON column (geo.py
    geometry_intersects_polygon — the non-POINT exact path: segment
    intersection + hole-aware containment, beyond the reference's
    bbox-only metadata eval): events become axis-aligned SQUARES
    (half-width 3.25) centered on the deterministic grid, x-clustered so
    file bboxes stay narrow, filtered with ST_INTERSECTS_POLY against
    the same diamond. The L1 distance from a square to the diamond
    center is separable — max(0,|cx+20.5|-3.25)+max(0,|cy-10.5|-3.25) —
    so the oracle is pure arithmetic, and the quarter-integer offsets
    can never tie the radius 40 exactly. A square near the diamond's
    bbox CORNER intersects the bbox but not the diamond, so this result
    differs from any bbox shortcut — the exactness is what's checked."""
    from .geo import st_square

    key = ("geo_poly", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"geo_poly_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        from .schema import NestedField, Schema

        ev = load_table(spark, sf_dir, "events")
        df = (ev.select(
                "event_id",
                ((F.col("user_id") * 7) % 360 - 180).cast("double").alias("x"),
                ((F.col("event_id") * 13) % 180 - 90).cast("double").alias("y"))
              .repartitionByRange(8, "x").sortWithinPartitions("x")
              .select("event_id", st_square("x", "y", 3.25).alias("geom")))
        schema = Schema((NestedField(1, "event_id", "long", True),
                         NestedField(2, "geom", "geometry", False)))
        t = cat.create_table(ident, schema)
        t.append(df)
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    ring = [(-60.5, 10.5), (-20.5, 50.5), (19.5, 10.5), (-20.5, -29.5)]
    scan = t.scan(filter=E.st_intersects_polygon("geom", ring))
    total = len(t.scan().plan_files().files)
    kept = len(scan.plan_files().files)
    assert kept < total, \
        f"polygon predicate must prune x-clustered files: {kept}/{total}"
    from .geo import st_bbox

    box = scan.df().select("event_id", st_bbox("geom").alias("b"))
    return (box.select("event_id",
                       (F.col("b.xmin") + 3.25).alias("x"),
                       (F.col("b.ymin") + 3.25).alias("y"))
               .orderBy("event_id"))


GEO_EXACT_POLY_SQL = """
SELECT event_id,
       CAST((user_id * 7) % 360 - 180 AS DOUBLE) AS x,
       CAST((event_id * 13) % 180 - 90 AS DOUBLE) AS y
FROM events
WHERE GREATEST(ABS(((user_id * 7) % 360 - 180) + 20.5) - 3.25, 0)
    + GREATEST(ABS(((event_id * 13) % 180 - 90) - 10.5) - 3.25, 0) <= 40
ORDER BY event_id
"""


def geo_exact_geography_scan(spark, sf_dir):
    """EXACT great-circle predicate on a v3 GEOGRAPHY column (geo.py
    spherical kernel — parity-PLUS: the reference's own evaluators are
    bbox-only for geography, api/.../geospatial/
    GeospatialPredicateEvaluators.java): the deterministic lon/lat point
    grid on a geography column, filtered with ST_INTERSECTS_POLY
    against a wide spherical TRIANGLE whose geodesic edges bulge ~15°
    poleward past their planar chords — grid rows between chord and
    geodesic decide DIFFERENTLY than any planar evaluation, which is
    what's checked. The oracle is exact spherical algebra in plain SQL:
    a point is inside the (convex, CCW) spherical triangle iff it lies
    on the positive side of all three edge great-circle planes, whose
    unit-vector normals are inlined constants; minimum |plane·point|
    margin over the whole integer grid is 7e-6, nine orders above
    double noise. File pruning runs on the polygon's spherical bbox
    (wrap-aware lon, apex-exact lat range) against the manifests' WKB
    point bounds."""
    from .geo import st_bbox, st_point

    key = ("geo_geog", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"geo_geog_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        from .schema import NestedField, Schema

        ev = load_table(spark, sf_dir, "events")
        df = (ev.select(
                "event_id",
                ((F.col("user_id") * 7) % 360 - 180).cast("double").alias("x"),
                ((F.col("event_id") * 13) % 180 - 90).cast("double").alias("y"))
              .repartitionByRange(8, "x").sortWithinPartitions("x")
              .select("event_id", st_point("x", "y").alias("geog")))
        schema = Schema((NestedField(1, "event_id", "long", True),
                         NestedField(2, "geog", "geography", False)))
        t = cat.create_table(ident, schema)
        t.append(df)
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    tri = [(-100.37, 5.73), (20.41, 11.19), (-40.11, 69.57)]
    scan = t.scan(filter=E.st_intersects_polygon("geog", tri))
    total = len(t.scan().plan_files().files)
    kept = len(scan.plan_files().files)
    # the triangle's lon span [-100.4, 20.4] misses the east/west files
    # of the x-clustered layout; a full-keep plan means the spherical
    # bbox prune is dead
    assert kept < total, \
        f"geography polygon predicate must prune: {kept}/{total}"
    box = scan.df().select("event_id", st_bbox("geog").alias("b"))
    return (box.select("event_id", F.col("b.xmin").alias("x"),
                       F.col("b.ymin").alias("y"))
               .orderBy("event_id"))


# edge-plane unit normals n_i = V_i x V_{i+1} of the CCW spherical
# triangle above (computed once, inlined; interior = all three dots > 0)
GEO_EXACT_GEOGRAPHY_SQL = """
WITH pts AS (
  SELECT event_id,
         CAST((user_id * 7) % 360 - 180 AS DOUBLE) AS x,
         CAST((event_id * 13) % 180 - 90 AS DOUBLE) AS y
  FROM events
), xyz AS (
  SELECT event_id, x, y,
         COS(RADIANS(y)) * COS(RADIANS(x)) AS px,
         COS(RADIANS(y)) * SIN(RADIANS(x)) AS py,
         SIN(RADIANS(y)) AS pz
  FROM pts
)
SELECT event_id, x, y
FROM xyz
WHERE (-0.22409557351177967) * px + 0.12655157209257567 * py
      + 0.8385943957157947 * pz > 0
  AND 0.36422926637922665 * px + (-0.8097642522044081) * py
      + (-0.29809190571621985) * pz > 0
  AND 0.8947340285761325 * px + (-0.19449303441012472) * py
      + (-0.30157170913532116) * pz > 0
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def _pipeline_registry():
    from .pipeline import REGISTRY as PIPELINE_REGISTRY

    return PIPELINE_REGISTRY


def sql_q6_revenue(spark, sf_dir):
    """TPC-H q6 driven through the SQL veneer (sql.SqlEngine): CREATE via
    metadata-only add_files, then a delegated SELECT with engine-table
    resolution — exercises the §2.M/§2.N SQL surface end-to-end."""
    cat = _warehouse(spark)
    ident = f"sqlns.lineitem_{_sf_key(sf_dir).replace('.', '_')}"
    if not cat.table_exists(ident):
        df = load_table(spark, sf_dir, "lineitem")
        t = cat.create_table(ident, df.schema)
        t.add_files(os.path.join(sf_dir, "lineitem.parquet"))
    return cat.sql(
        f"SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
        f"FROM {ident} "
        f"WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' "
        f"AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00' "
        f"AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")


def upsert_eq_scan(spark, sf_dir):
    """Equality-delete upsert (no target read, row_ops.equality_upsert):
    replace every o_orderkey % 3 == 0 row with a doubled price and read
    back — exercises eq-delete write, sequence scoping, and the keyed
    anti-join at scan."""
    key = ("equpsert", _sf_key(sf_dir))
    if key not in _STATE:
        cat = _warehouse(spark)
        ident = f"equpsert_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema)
        t.append(df)
        batch = (df.filter(F.col("o_orderkey") % 3 == 0)
                   .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2)))
        t.upsert(batch, keys=["o_orderkey"])
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total")))


UPSERT_EQ_SQL = """
SELECT COUNT(*) AS n,
       ROUND(SUM(CASE WHEN o_orderkey % 3 = 0
                      THEN ROUND(o_totalprice * 2, 2)
                      ELSE o_totalprice END), 2) AS total
FROM orders
"""


def eq_delete_scan(spark, sf_dir):
    """Pure equality-delete MoR read on a NON-key column: every delete
    postdates all data, so the scan takes the uniform fast path — one
    hash anti-join on the key columns, no per-row sequence scoping
    (reference IcebergSourceParquetEqDeleteBenchmark shape)."""
    key = ("eqdel", _sf_key(sf_dir))
    if key not in _STATE:
        from .row_ops import write_equality_deletes
        from .writes import RowDelta

        cat = _warehouse(spark)
        ident = f"eqdel_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema)
        t.append(df)
        keys = (df.select("o_custkey").distinct()
                .filter(F.col("o_custkey") % 10 == 0))
        eq_files = write_equality_deletes(t, keys, ["o_custkey"])
        RowDelta(t, [], eq_files).commit()
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    return (t.to_df().groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


EQ_DELETE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_custkey % 10 != 0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def eq_probe_scan(spark, sf_dir):
    """Equality-delete MoR read through the LARGE-set fast path (r12):
    one third of the PK domain equality-deleted — above the 4096-key
    isin cap at sf0.01+, so the scan applies the delete set as one
    compiled StaticInvoke binary-search node (jvm_probe.py,
    SortedSetProbe.java) instead of an anti-join. Asserts the join-free
    plan whenever the probe path is in play; correctness is
    oracle-checked either way (smaller SFs legitimately take isin)."""
    key = ("eqprobe", _sf_key(sf_dir))
    if key not in _STATE:
        from .row_ops import write_equality_deletes
        from .writes import RowDelta

        cat = _warehouse(spark)
        ident = f"eqprobe_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "orders")
        t = cat.create_table(ident, df.schema)
        t.append(df)
        keys = (df.select("o_orderkey").distinct()
                .filter(F.col("o_orderkey") % 3 == 0))
        eq_files = write_equality_deletes(t, keys, ["o_orderkey"])
        RowDelta(t, [], eq_files).commit()
        _STATE[key] = ident
    t = _warehouse(spark).load_table(_STATE[key])
    df = t.to_df()
    from . import jvm_probe
    from .scan import EQ_DELETE_MAX_LITERAL_KEYS

    nkeys = sum(d.file.record_count or 0
                for d in t.scan().plan_files().eq_deletes)
    if nkeys > EQ_DELETE_MAX_LITERAL_KEYS and jvm_probe.available(spark):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, "large eq set must take the probe path"
    return (df.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total"))
            .orderBy("o_orderpriority"))


EQ_PROBE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 3 != 0
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def rest_vended_credentials_scan(spark, sf_dir):
    """REST loadTable storage-credentials end-to-end (open-api
    LoadTableResult, r12): the server vends per-prefix FileIO config
    declared on the table; the client applies it and reads. Asserts the
    vended entry arrived over HTTP, landed on the prefix-scoped FileIO
    conf clone, and left the shared session conf untouched — then scans
    the table through the engine (the data read itself is what the
    oracle checks)."""
    key = ("vendcred", _sf_key(sf_dir))
    cat = _warehouse(spark)
    if key not in _STATE:
        ident = f"db.vendcred_{_sf_key(sf_dir)}"
        if cat.table_exists(ident):
            cat.drop_table(ident)
        df = load_table(spark, sf_dir, "nation")
        t = cat.create_table(ident, df.schema, properties={
            "vended.credential.fs.vendcheck.marker": "vended-ok"})
        t.append(df)
        _STATE[key] = ident
    import json as _json
    import urllib.request

    from . import io as _io
    from .rest_catalog import serve

    ident = _STATE[key]
    srv, port = serve(cat)
    try:
        ns, name = ident.rsplit(".", 1)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/namespaces/{ns}"
                f"/tables/{name}") as r:
            res = _json.loads(r.read())
    finally:
        srv.shutdown()
    t = cat.load_table(ident)
    creds = res["storage-credentials"]
    assert creds[0]["prefix"] == t.location, creds
    assert creds[0]["config"]["fs.vendcheck.marker"] == "vended-ok"
    assert _io.apply_vended_credentials(res) == 1
    try:
        vio = _io.resolve_io("file://" + t.location + "/data/x", spark)
        assert vio._conf.get("fs.vendcheck.marker") == "vended-ok"
        assert (spark._jsc.hadoopConfiguration()
                .get("fs.vendcheck.marker") is None)
        return (t.to_df()
                .select("n_nationkey", "n_name", "n_regionkey")
                .orderBy("n_nationkey"))
    finally:
        _io._VENDED_CONF.pop(t.location, None)


REST_VENDED_SQL = """
SELECT n_nationkey, n_name, n_regionkey
FROM nation ORDER BY n_nationkey
"""


REGISTRY = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "sql_q6_revenue": (sql_q6_revenue, Q6_SQL),
    "upsert_eq_scan": (upsert_eq_scan, UPSERT_EQ_SQL),
    "eq_delete_scan": (eq_delete_scan, EQ_DELETE_SQL),
    "eq_probe_scan": (eq_probe_scan, EQ_PROBE_SQL),
    "rest_vended_credentials_scan": (rest_vended_credentials_scan,
                                     REST_VENDED_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "q6_revenue": (q6_revenue, Q6_SQL),
    "events_type_agg": (events_type_agg, EVENTS_AGG_SQL),
    "scan_prune_day": (scan_prune_day, SCAN_PRUNE_SQL),
    "time_travel_scan": (time_travel_scan, TIME_TRAVEL_SQL),
    "delete_cow_scan": (delete_cow_scan, DELETE_COW_SQL),
    "delete_mor_scan": (delete_mor_scan, DELETE_MOR_SQL),
    "delete_mor_file_scan": (delete_mor_file_scan, DELETE_MOR_SQL),
    "update_scan": (update_scan, UPDATE_SQL),
    "merge_upsert_scan": (merge_upsert_scan, MERGE_SQL),
    "variant_extract_scan": (variant_extract_scan, VARIANT_EXTRACT_SQL),
    "variant_shredded_scan": (variant_shredded_scan, VARIANT_SHREDDED_SQL),
    "variant_shredded_typed_value_scan": (
        variant_shredded_typed_value_scan, VARIANT_SHREDDED_SQL),
    "geo_bbox_scan": (geo_bbox_scan, GEO_BBOX_SQL),
    "geo_exact_scan": (geo_exact_scan, GEO_EXACT_SQL),
    "geo_exact_poly_scan": (geo_exact_poly_scan, GEO_EXACT_POLY_SQL),
    "geo_exact_geography_scan": (geo_exact_geography_scan,
                                 GEO_EXACT_GEOGRAPHY_SQL),
}


def _full_registry():
    from .workloads_analytics import REGISTRY as ANALYTICS_REGISTRY
    from .workloads_lifecycle import REGISTRY as LIFECYCLE_REGISTRY

    # insertion order = the driver's sampling order. r14 rotation: the
    # r13 optimization round rewrote the shared scan/metadata tiers the
    # MoR delete scans, SPJ joins and maintenance/lifecycle entries run
    # through (single-relation position-probe read, eq-delete
    # literal->probe crossover, SPJ layout memo, entries-plan memo, LRU
    # relation cache) in the SAME round its rotation moved those paths
    # out of the driver's ~50-entry oracle sample — so r14 leads with
    # exactly those paths (per the r13 verdict's "Next round" item 3):
    # the MoR/eq/DV delete scans, SPJ, then the maintenance/metadata-
    # tier lifecycle entries, then the encrypted/variant scan tier.
    # TPC-H + analytics + pipeline (driver-confirmed r13) rotate to the
    # back. Keys are disjoint across the four registries (asserted), so
    # order only affects sampling, never which implementation wins.
    front_r14 = (
        # MoR delete / eq-delete family (scan.py changes #4 and #8)
        "delete_mor_scan", "delete_mor_file_scan", "eq_delete_scan",
        "eq_probe_scan", "upsert_eq_scan", "delete_cow_scan",
        "update_scan", "merge_upsert_scan", "time_travel_scan",
        # DV read/rewrite paths + SPJ (layout memo)
        "native_dv_delete_scan", "pos_delete_rewrite_dv_scan",
        "iceberg_import_dv_scan", "spj_join_scan",
        # maintenance / metadata-tier lifecycle (entries-plan memo,
        # dry-run dedup shape, DV write width)
        "expire_snapshots_scan", "expire_clean_metadata_scan",
        "orphan_cleanup_scan", "rewrite_manifests_scan",
        "compaction_scan", "auto_compaction_scan", "zorder_scan",
        "merge_append_scan", "dynamic_overwrite_scan",
        "branch_write_scan", "rollback_cherrypick_scan",
        "changelog_agg_scan", "transaction_scan", "rtas_scan",
        "metadata_partitions_scan", "metadata_files_scan",
        "partition_stats_scan", "table_stats_ndv_scan",
        "stats_ndv_roundtrip_scan", "rewrite_table_path_scan",
        "rewrite_table_path_encrypted_scan", "delta_snapshot_scan",
        "runtime_filter_scan", "lineage_scan", "relocated_table_scan",
        # encrypted / variant scan tier (relation cache, decode widths)
        "variant_extract_scan", "variant_shredded_scan",
        "variant_shredded_typed_value_scan", "data_encryption_scan",
        "encrypted_manifests_scan", "metadata_encryption_scan",
        "rest_vended_credentials_scan", "rest_plan_scan",
        "schema_evolution_scan", "spec_evolution_scan",
        "object_storage_scan", "metrics_modes_scan",
    )
    pipeline = _pipeline_registry()
    merged = {}
    for other in (ANALYTICS_REGISTRY, REGISTRY, LIFECYCLE_REGISTRY,
                  pipeline):
        dup = set(merged) & set(other)
        assert not dup, f"duplicate registry keys: {dup}"
        merged.update(other)
    missing = [k for k in front_r14 if k not in merged]
    assert not missing, f"front_r14 names not in any registry: {missing}"
    reg = {k: merged[k] for k in front_r14}
    reg.update(LIFECYCLE_REGISTRY)
    reg.update(REGISTRY)
    reg.update(ANALYTICS_REGISTRY)
    reg.update(pipeline)
    reg.update(merged)
    return reg


def queries():
    return {name: fn for name, (fn, _sql) in _full_registry().items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in _full_registry().items()
            if sql is not None}
