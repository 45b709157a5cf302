"""Extended analytics workloads: TPC-H-adapted joins/subqueries, window
functions, sessionization, rollup/cube, and an as-of join — all running
through the engine's table layer with DuckDB oracles.

Query shapes the reference delegates to Spark (SURVEY.md §2.E/2.G/2.H):
semi/anti joins, correlated aggregates, top-k per group, running
windows, grouping sets. Implementations stay declarative (DataFrame API
-> Catalyst chooses broadcast vs SMJ, partial aggs, AQE re-plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .workloads import _ldf, engine_table
from .expressions import col as ecol
from . import expressions as E


def _epoch_s(name):
    """Fractional epoch seconds for TIMESTAMP or TIMESTAMP_NTZ columns.

    Spark 4 forbids a direct NTZ->numeric cast; routing through TIMESTAMP
    (a no-op for tz-aware columns, UTC interpretation for NTZ under the
    engine's UTC session) matches DuckDB epoch(ts) exactly, fraction
    included."""
    return F.col(name).cast("timestamp").cast("double")


# ---------------------------------------------------------------------------
# TPC-H adaptations
# ---------------------------------------------------------------------------


def q4_order_priority(spark, sf_dir):
    """EXISTS semi-join: orders (one quarter) with any late-shipped item."""
    orders = engine_table(spark, sf_dir, "orders").scan(
        filter=E.and_(ecol("o_orderdate") >= "1996-01-01T00:00:00",
                      ecol("o_orderdate") < "1996-04-01T00:00:00")
    ).df()
    li = _ldf(spark, sf_dir, "lineitem")
    sel = orders.join(
        li, (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate), "left_semi"
    )
    return (
        sel.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q10_returned_items(spark, sf_dir):
    """Top 20 customers by returned-item revenue in one quarter."""
    orders = engine_table(spark, sf_dir, "orders").scan(
        filter=E.and_(ecol("o_orderdate") >= "1995-10-01T00:00:00",
                      ecol("o_orderdate") < "1996-01-01T00:00:00")
    ).df()
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=ecol("l_returnflag") == "R"
    ).df()
    cust = _ldf(spark, sf_dir, "customer")
    nation = _ldf(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q13_customer_distribution(spark, sf_dir):
    """Left outer join + two-level aggregation (order-count histogram)."""
    cust = _ldf(spark, sf_dir, "customer")
    orders = _ldf(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue(spark, sf_dir):
    """Conditional aggregation: promo revenue share for one month."""
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=E.and_(ecol("l_shipdate") >= "1995-09-01T00:00:00",
                      ecol("l_shipdate") < "1995-10-01T00:00:00")
    ).df()
    part = _ldf(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev), 4).alias("promo_revenue_pct"))
    )


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4)
         AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


def q17_small_quantity(spark, sf_dir):
    """Correlated aggregate: items below half their part's average qty."""
    li = _ldf(spark, sf_dir, "lineitem")
    part = _ldf(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    part_avg = (
        li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
WITH part_avg AS (
  SELECT l_partkey, AVG(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'SMALL'
JOIN part_avg pa ON pa.l_partkey = l.l_partkey
WHERE l.l_quantity < 0.5 * pa.avg_qty
"""


def q18_large_volume(spark, sf_dir):
    """Having-filtered aggregate join: orders with total quantity > 300."""
    li = _ldf(spark, sf_dir, "lineitem")
    orders = _ldf(spark, sf_dir, "orders")
    cust = _ldf(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50
"""


def q19_discounted_revenue(spark, sf_dir):
    """Disjunctive multi-predicate join (OR of brand/size/qty ranges)."""
    li = _ldf(spark, sf_dir, "lineitem")
    part = _ldf(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c1 = ((F.col("p_type") == "PROMO") & F.col("l_quantity").between(1, 15)
          & F.col("p_size").between(1, 10))
    c2 = ((F.col("p_type") == "SMALL") & F.col("l_quantity").between(10, 25)
          & F.col("p_size").between(1, 20))
    c3 = ((F.col("p_type") == "LARGE") & F.col("l_quantity").between(20, 35))
    return j.filter(c1 | c2 | c3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue"))


Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, part
WHERE l_partkey = p_partkey AND (
      (p_type = 'PROMO' AND l_quantity BETWEEN 1 AND 15
       AND p_size BETWEEN 1 AND 10)
   OR (p_type = 'SMALL' AND l_quantity BETWEEN 10 AND 25
       AND p_size BETWEEN 1 AND 20)
   OR (p_type = 'LARGE' AND l_quantity BETWEEN 20 AND 35))
"""


# ---------------------------------------------------------------------------
# window functions / sessionization
# ---------------------------------------------------------------------------


def win_top3_orders_per_cust(spark, sf_dir):
    """Top-k per group: 3 priciest orders per customer (custkey < 100)."""
    orders = _ldf(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


WIN_TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders WHERE o_custkey < 100
) WHERE rn <= 3 ORDER BY o_custkey, rn
"""


def win_running_user_value(spark, sf_dir):
    """Running sum + lag gap per user over the event stream (users < 30)."""
    ev = _ldf(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select(
            "event_id", "user_id",
            F.round(F.sum("value").over(run), 2).alias("run_value"),
            F.round(
                _epoch_s("ts") - F.lag(_epoch_s("ts")).over(w), 3
            ).alias("gap_s"),
        )
        .orderBy("user_id", "event_id")
    )


WIN_RUNNING_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS run_value,
       ROUND(epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id),
             3) AS gap_s
FROM events WHERE user_id < 30 ORDER BY user_id, event_id
"""


def sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): session count and
    events-per-session per user (users < 30). The cumulative-sum-of-
    new-session-flags pattern is the scalable equivalent of
    session_window for batch data."""
    ev = _ldf(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = ev.select(
        "user_id", "ts", "event_id",
        F.sum(
            F.when(
                _epoch_s("ts") - F.lag(_epoch_s("ts")).over(w) > 1800, 1
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sess_id"),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            (F.max("sess_id") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE user_id < 30
),
sess AS (
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM flagged
)
SELECT user_id,
       CAST(MAX(sess_id) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------


def rollup_lineitem(spark, sf_dir):
    li = _ldf(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n", "total",
        )
        .orderBy("returnflag", "linestatus")
    )


ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS total
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def cube_events_day(spark, sf_dir):
    ev = _ldf(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        ev.select("event_type", day.alias("day"), "value")
        .cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n", "v",
        )
        .orderBy("event_type", "day")
    )


CUBE_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS v
FROM events GROUP BY CUBE (event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_last_click(spark, sf_dir):
    """As-of join (not native in Spark; SURVEY.md §2.E): for each purchase
    the most recent prior click of the same user, via the union+window
    pattern — one shuffle on user_id, no range join explosion."""
    ev = _ldf(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    tagged = ev.select(
        "event_id", "user_id", "ts", "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = tagged.withColumn("last_click_ts", F.max("click_ts").over(w))
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
        .orderBy("event_id")
    )


ASOF_SQL = """
WITH tagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE user_id < 50
),
enriched AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_ts
  FROM tagged
)
SELECT event_id, user_id, ts, last_click_ts FROM enriched
WHERE event_type = 'purchase' ORDER BY event_id
"""


def funnel_conversion(spark, sf_dir):
    """Ordered funnel (view -> click -> purchase): per user the earliest
    view, the earliest click strictly after it, the earliest purchase
    strictly after that; then one-row conversion counts per stage. The
    per-user step times are ONE hash aggregation with conditional MINs
    (no self-joins, no window) — the shape that survives a billion-user
    events table: cost is a single user-keyed shuffle of pre-aggregated
    rows."""
    ev = _ldf(spark, sf_dir, "events")
    per_user = (ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .alias("t_view")))
    # step 2/3 need "after the previous step": re-aggregate with the
    # previous step's time joined back (broadcast — per-user rows only)
    clicks = (ev.filter(F.col("event_type") == "click")
              .join(per_user, "user_id")
              .filter(F.col("ts") > F.col("t_view"))
              .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    steps2 = per_user.join(clicks, "user_id", "left")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .join(steps2.filter(F.col("t_click").isNotNull()),
                       "user_id")
                 .filter(F.col("ts") > F.col("t_click"))
                 .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    funnel = steps2.join(purchases, "user_id", "left")
    return funnel.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"))


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS n_view,
       COUNT(t_click) AS n_click_after_view,
       COUNT(t_purchase) AS n_purchase_after_click
FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
"""


# ---------------------------------------------------------------------------
# time-range (interval) self-join — binned, never per-user cartesian
# ---------------------------------------------------------------------------

RJ_WINDOW_US = 3_600 * 1_000_000  # pair window: 0 < tb - ta <= 1 hour
RJ_VALUE_SCALE = 64  # power-of-two: floor(value*64) is IEEE-exact


def range_join_event_pairs(spark, sf_dir):
    """Time-range self-join (interval join; Spark has no native one): all
    ordered pairs of events by the same user within one hour, aggregated
    per event-type pair with the later event's quantized value mass.

    Scale shape — the standard interval-join binning: both sides bucket
    into window-width time bins; the EARLIER side duplicates into its own
    and the next bin, so every qualifying pair co-locates in exactly one
    (user_id, bin) hash-join bucket and the exact range predicate runs
    bucket-locally. Work is O(pairs per bucket) — never the per-user
    cross join Catalyst would pick for the naive inequality join — and
    the 2x explode is independent of corpus size. Timestamps compare as
    integer microseconds (unix_micros vs epoch_us) so the window boundary
    is cross-engine exact; value mass is floor(value*64) int64 sums."""
    ev = _ldf(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * RJ_VALUE_SCALE).cast("long").alias("qv"))
    binned = ev.withColumn("bin", F.floor(F.col("us") / RJ_WINDOW_US))
    early = binned.select(
        F.col("user_id").alias("u"), F.col("us").alias("us_a"),
        F.col("event_type").alias("type_a"),
        F.explode(F.array(F.col("bin"), F.col("bin") + 1)).alias("jbin"))
    late = binned.select(
        F.col("user_id").alias("u"), F.col("us").alias("us_b"),
        F.col("event_type").alias("type_b"), "qv",
        F.col("bin").alias("jbin"))
    pairs = early.join(late, ["u", "jbin"]).filter(
        (F.col("us_b") > F.col("us_a"))
        & (F.col("us_b") <= F.col("us_a") + F.lit(RJ_WINDOW_US)))
    return (pairs.groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("qv").cast("long").alias("late_value_mass"))
            .orderBy("type_a", "type_b"))


RANGE_JOIN_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         CAST(FLOOR(value * {RJ_VALUE_SCALE}) AS BIGINT) AS qv
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_pairs, CAST(SUM(b.qv) AS BIGINT) AS late_value_mass
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.us > a.us AND b.us <= a.us + {RJ_WINDOW_US}
GROUP BY a.event_type, b.event_type ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# metadata-only aggregate pushdown
# ---------------------------------------------------------------------------


def agg_pushdown_stats(spark, sf_dir):
    """COUNT/MIN/MAX answered purely from manifest stats (no data read)
    on the day-partitioned events table with a day-aligned filter —
    the strict projection makes every planned file exact."""
    import datetime as dt

    t = engine_table(spark, sf_dir, "events", partition_by=["day(ts)"])
    res = t.aggregate_pushdown(
        [("count_star", None), ("min", "value"), ("max", "value"),
         ("count", "user_id")],
        filter=ecol("ts") < dt.datetime(2024, 1, 8),
    )
    assert res is not None, "aggregate pushdown unexpectedly bailed"
    return spark.createDataFrame(
        [(
            res[("count_star", None)],
            res[("min", "value")],
            res[("max", "value")],
            res[("count", "user_id")],
        )],
        "n_rows bigint, min_value double, max_value double, n_users_vals bigint",
    )


AGG_PUSHDOWN_SQL = """
SELECT COUNT(*) AS n_rows,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       COUNT(user_id) AS n_users_vals
FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
"""


def q7_volume_shipping(spark, sf_dir):
    """Revenue between two nations by ship year (TPC-H q7; testdata has no
    n_comment so nations are the synthetic NATION_* names)."""
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=E.and_(ecol("l_shipdate") >= "1996-01-01T00:00:00",
                      ecol("l_shipdate") < "1998-01-01T00:00:00")
    ).df()
    supp = _ldf(spark, sf_dir, "supplier")
    orders = _ldf(spark, sf_dir, "orders")
    cust = _ldf(spark, sf_dir, "customer")
    nat = _ldf(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    j = (li.join(supp, li.l_suppkey == supp.s_suppkey)
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
           .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
           .filter(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                   | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark, sf_dir):
    """NATION_3 suppliers' market share of ECONOMY parts sold to EUROPE
    customers, by order year (TPC-H q8 adapted to testdata columns)."""
    li = _ldf(spark, sf_dir, "lineitem")
    part = engine_table(spark, sf_dir, "part").scan(
        filter=ecol("p_type") == "ECONOMY").df()
    supp = _ldf(spark, sf_dir, "supplier")
    orders = engine_table(spark, sf_dir, "orders").scan(
        filter=E.and_(ecol("o_orderdate") >= "1996-01-01T00:00:00",
                      ecol("o_orderdate") < "1998-01-01T00:00:00")
    ).df()
    cust = _ldf(spark, sf_dir, "customer")
    nat = _ldf(spark, sf_dir, "nation")
    region = _ldf(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
           .join(supp, li.l_suppkey == supp.s_suppkey)
           .join(orders, li.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
           .join(F.broadcast(region), F.col("c_rk") == F.col("r_regionkey"))
           .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (j.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"),
                     F.col("supp_nation"))
            .groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                      .otherwise(F.lit(0.0))) / F.sum("volume"), 4).alias("mkt_share"))
            .orderBy("o_year"))


Q8_SQL = """
SELECT YEAR(o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_year ORDER BY o_year
"""


def q15_top_supplier(spark, sf_dir):
    """Supplier(s) with maximum revenue over one quarter (TPC-H q15; the
    revenue view is a subquery, the max is a broadcast scalar)."""
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=E.and_(ecol("l_shipdate") >= "1996-01-01T00:00:00",
                      ecol("l_shipdate") < "1996-04-01T00:00:00")
    ).df()
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
             .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = _ldf(spark, sf_dir, "supplier")
    return (rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
            .join(supp, rev.supplier_no == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q21_suppliers_who_kept_waiting(spark, sf_dir):
    """Suppliers whose item shipped late on multi-supplier 'F' orders where
    every other supplier shipped on time (TPC-H q21 adapted: testdata has
    no commit/receipt dates, lateness = l_shipdate > o_orderdate)."""
    orders = engine_table(spark, sf_dir, "orders").scan(
        filter=ecol("o_orderstatus") == "F").df()
    li = _ldf(spark, sf_dir, "lineitem")
    supp = _ldf(spark, sf_dir, "supplier")
    # single pass over lineitem instead of the textbook triple self-join:
    # EXISTS(other supplier) == n_supp >= 2; NOT EXISTS(other late
    # supplier) == the order's late rows all belong to one supplier
    # (n_late_supp == 1). One shuffle for the per-order rollup, one for
    # the late-row join — lineitem is scanned once less at 100 TB.
    tagged = (li.join(orders.select("o_orderkey", "o_orderdate"),
                      li.l_orderkey == F.col("o_orderkey"))
              .withColumn("late", F.col("l_shipdate") > F.col("o_orderdate")))
    per_order = (tagged.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(F.when(F.col("late"), F.col("l_suppkey")))
                      .alias("n_late_supp")))
    cand = (tagged.filter(F.col("late"))
            .join(per_order.filter((F.col("n_supp") >= 2)
                                   & (F.col("n_late_supp") == 1)),
                  "l_orderkey", "left_semi"))
    return (cand.join(supp, cand.l_suppkey == supp.s_suppkey)
            .groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name").limit(20))


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


def q22_global_sales_opportunity(spark, sf_dir):
    """Well-funded, low-activity customers by 'country code' (TPC-H q22
    adapted to testdata: code = c_nationkey % 5, no phone column; every
    synthetic customer has orders, so 'no orders' becomes 'fewer than 6
    orders' to keep the anti-join-shaped correlation non-vacuous)."""
    cust = engine_table(spark, sf_dir, "customer").to_df()
    orders = _ldf(spark, sf_dir, "orders")
    codes = cust.withColumn("cntrycode", (F.col("c_nationkey") % 5).cast("int")) \
                .filter(F.col("cntrycode").isin(0, 1, 2))
    avg_bal = codes.filter(F.col("c_acctbal") > 0.0) \
                   .agg(F.round(F.avg("c_acctbal"), 2).alias("ab"))
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    rich = codes.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
    low = (rich.join(oc, rich.c_custkey == oc.o_custkey, "left")
           .filter(F.coalesce(F.col("n_orders"), F.lit(0)) < 6))
    return (low.groupBy("cntrycode")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("cntrycode"))


Q22_SQL = """
WITH oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer LEFT JOIN oc ON o_custkey = c_custkey
WHERE c_nationkey % 5 IN (0, 1, 2)
  AND c_acctbal > (SELECT ROUND(AVG(c_acctbal), 2) FROM customer
                   WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (0, 1, 2))
  AND COALESCE(n_orders, 0) < 6
GROUP BY cntrycode ORDER BY cntrycode
"""


def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H q2 shape (correlated scalar subquery with aggregate): the
    minimum-unit-cost supplier per part within one region. Testdata has no
    partsupp, so lineitem unit price stands in for ps_supplycost. The
    correlated `cost = (SELECT MIN(cost) ... same part)` decorrelates to a
    per-part window min — one shuffle, no re-scan of the scoped set."""
    ps = (_ldf(spark, sf_dir, "lineitem")
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"),
                             2)).alias("cost")))
    part = _ldf(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "SMALL"))
    supp = _ldf(spark, sf_dir, "supplier")
    nat = _ldf(spark, sf_dir, "nation")
    reg = _ldf(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    scoped = (ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
              .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
              .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
              .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey))
    w = Window.partitionBy("p_partkey")
    return (scoped.withColumn("min_cost", F.min("cost").over(w))
            .filter(F.col("cost") == F.col("min_cost"))
            .select("s_name", "n_name", "p_partkey", "p_name",
                    F.round("s_acctbal", 2).alias("s_acctbal"), "cost")
            .orderBy("p_partkey", "s_name"))


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(ROUND(l_extendedprice / l_quantity, 2)) AS cost
  FROM lineitem GROUP BY 1, 2
),
scoped AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, cost
  FROM ps
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE' AND p_size < 10 AND p_type = 'SMALL'
)
SELECT s_name, n_name, p_partkey, p_name, ROUND(s_acctbal, 2) AS s_acctbal,
       cost
FROM scoped s1
WHERE cost = (SELECT MIN(cost) FROM scoped s2
              WHERE s2.p_partkey = s1.p_partkey)
ORDER BY p_partkey, s_name
"""


def q9_product_type_profit(spark, sf_dir):
    """TPC-H q9 shape: five-way join profit rollup by nation and year.
    Part supply cost is adapted to 0.5 * p_retailprice (no partsupp)."""
    li = _ldf(spark, sf_dir, "lineitem")
    part = _ldf(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _ldf(spark, sf_dir, "supplier")
    nat = _ldf(spark, sf_dir, "nation")
    orders = _ldf(spark, sf_dir, "orders")
    # per-row floor-half-up to integer cents, then an exact integer sum:
    # double partial aggregation is order-dependent, and per-row ROUND tie
    # conventions differ between engines — floor(x*100+0.5) is the same
    # IEEE op on the same double everywhere
    amount = F.floor(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))
         - 0.5 * F.col("p_retailprice") * F.col("l_quantity")) * 100
        + F.lit(0.5))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").alias("o_year"),
                    amount.alias("amount"))
            .groupBy("nation", "o_year")
            .agg((F.sum("amount") / 100.0).alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)
                       - 0.5 * p_retailprice * l_quantity) * 100 + 0.5)
                AS BIGINT)) / 100.0 AS sum_profit
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark, sf_dir):
    """TPC-H q11 shape: HAVING on a sum vs a scalar-subquery fraction of
    the scoped total. The threshold compares quantity sums (integral
    doubles — exact in any summation order, so Spark's partial aggregation
    and DuckDB's single pass agree bit-for-bit at the boundary)."""
    li = _ldf(spark, sf_dir, "lineitem")
    supp = _ldf(spark, sf_dir, "supplier")
    nat = _ldf(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    scope = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
             .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
             .select("l_partkey", "l_quantity", "l_extendedprice"))
    total = scope.agg((0.002 * F.sum("l_quantity")).alias("thr"))
    return (scope.groupBy("l_partkey")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("value"),
                 F.sum("l_quantity").alias("qty"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("qty") > F.col("thr"))
            .select(F.col("l_partkey").alias("partkey"), "value")
            .orderBy(F.desc("value"), "partkey"))


Q11_SQL = """
WITH scope AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS partkey, ROUND(SUM(l_extendedprice), 2) AS value
FROM scope
GROUP BY l_partkey
HAVING SUM(l_quantity) > (SELECT 0.002 * SUM(l_quantity) FROM scope)
ORDER BY value DESC, partkey
"""


def q12_shipmode_priority(spark, sf_dir):
    """TPC-H q12 shape: priority-class CASE counts per category over a
    one-year ship window (l_returnflag stands in for l_shipmode)."""
    li = engine_table(spark, sf_dir, "lineitem").scan(
        filter=E.and_(ecol("l_shipdate") >= "1997-01-01T00:00:00",
                      ecol("l_shipdate") < "1998-01-01T00:00:00")).df()
    orders = _ldf(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("l_returnflag").alias("flag"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
            .orderBy("flag"))


Q12_SQL = """
SELECT l_returnflag AS flag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H q16 shape: NOT IN subquery + COUNT(DISTINCT) per part attrs.
    'Complaint' suppliers are adapted to s_acctbal < 100; NOT IN is the
    null-free case, so it lowers to a broadcast anti-join."""
    ps = (_ldf(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    part = _ldf(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30))
    bad = (_ldf(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 100).select("s_suppkey"))
    return (ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey,
                    "left_anti")
            .join(F.broadcast(part), ps.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


Q16_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (5, 10, 15, 20, 25, 30)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_stock_suppliers(spark, sf_dir):
    """TPC-H q20 shape: nested IN subqueries with a correlated aggregate
    threshold — suppliers shipping >15% of a small-part's total volume,
    restricted to one region. Quantity sums are integral doubles, so the
    share comparison is order-independent on both engines."""
    li = _ldf(spark, sf_dir, "lineitem")
    small = (_ldf(spark, sf_dir, "part")
             .filter(F.col("p_name").like("small%")).select("p_partkey"))
    scoped = li.join(F.broadcast(small), li.l_partkey == small.p_partkey,
                     "left_semi")
    per_supp = (scoped.groupBy("l_partkey", "l_suppkey")
                .agg(F.sum("l_quantity").alias("supp_qty")))
    per_part = (scoped.groupBy("l_partkey")
                .agg((0.15 * F.sum("l_quantity")).alias("part_thr")))
    heavy = (per_supp.join(per_part, "l_partkey")
             .filter(F.col("supp_qty") > F.col("part_thr"))
             .select("l_suppkey").distinct())
    nat = (_ldf(spark, sf_dir, "nation")
           .filter(F.col("n_regionkey") == 2).select("n_nationkey"))
    supp = _ldf(spark, sf_dir, "supplier")
    return (supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey,
                      "left_semi")
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey,
                  "left_semi")
            .select("s_suppkey", "s_name").orderBy("s_suppkey"))


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem l1
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 0.15 * (SELECT SUM(l_quantity) FROM lineitem l2
                                   WHERE l2.l_partkey = l1.l_partkey)
)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
ORDER BY s_suppkey
"""


REGISTRY = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q9_product_type_profit": (q9_product_type_profit, Q9_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q12_shipmode_priority": (q12_shipmode_priority, Q12_SQL),
    "q16_supplier_part_counts": (q16_supplier_part_counts, Q16_SQL),
    "q20_excess_stock_suppliers": (q20_excess_stock_suppliers, Q20_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q21_suppliers_who_kept_waiting": (q21_suppliers_who_kept_waiting, Q21_SQL),
    "q22_global_sales_opportunity": (q22_global_sales_opportunity, Q22_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q18_large_volume": (q18_large_volume, Q18_SQL),
    "q19_discounted_revenue": (q19_discounted_revenue, Q19_SQL),
    "win_top3_orders_per_cust": (win_top3_orders_per_cust, WIN_TOP3_SQL),
    "win_running_user_value": (win_running_user_value, WIN_RUNNING_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
    "rollup_lineitem": (rollup_lineitem, ROLLUP_SQL),
    "cube_events_day": (cube_events_day, CUBE_SQL),
    "asof_last_click": (asof_last_click, ASOF_SQL),
    "funnel_conversion": (funnel_conversion, FUNNEL_SQL),
    "range_join_event_pairs": (range_join_event_pairs, RANGE_JOIN_SQL),
    "agg_pushdown_stats": (agg_pushdown_stats, AGG_PUSHDOWN_SQL),
}
