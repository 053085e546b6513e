"""Relational query suite over the testdata star schema.

The reference delegates all relational machinery to its host engine
(SURVEY.md §2.4); in this port the host engine is Spark SQL/Catalyst, and
this module demonstrates that the full relational surface (scan, filter,
projection, join, aggregate, window) is covered with plans that hold at
scale:

  * every query is declarative DataFrame API → Catalyst applies predicate
    pushdown, column pruning and join reordering (verified via
    ``tests/test_plans.py``);
  * small dimension tables are explicitly ``broadcast()``ed so the big
    fact-table joins never shuffle the fact side by join key;
  * floating-point aggregates are rounded at the output boundary so
    results are stable across summation orders (and comparable with the
    DuckDB oracle).

Each entry is ``(fn(spark, sf_dir) -> DataFrame, oracle_sql or None)``;
column names/aliases match the oracle exactly (driver hash-compares).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table


_DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2))"
_DEC_DISC = "CAST(1 - l_discount AS DECIMAL(18,2))"
_DEC_TAX = "CAST(1 + l_tax AS DECIMAL(18,2))"
_DEC_SUM_QTY = "CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)"
_DEC_SUM_BASE = f"CAST(round(SUM({_DEC_PRICE}), 2) AS DOUBLE)"
_DEC_SUM_DISC = f"CAST(round(SUM({_DEC_PRICE} * {_DEC_DISC}), 2) AS DOUBLE)"
_DEC_SUM_CHARGE = f"CAST(round(SUM({_DEC_PRICE} * {_DEC_DISC} * {_DEC_TAX}), 2) AS DOUBLE)"
_DEC_AVG_QTY = "CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*), 4) AS DOUBLE)"
_DEC_AVG_PRICE = f"CAST(round(SUM({_DEC_PRICE}) / COUNT(*), 4) AS DOUBLE)"
_DEC_AVG_DISC = "CAST(round(SUM(CAST(l_discount AS DECIMAL(18,2))) / COUNT(*), 6) AS DOUBLE)"
_DEC_REVENUE = f"CAST(round(SUM({_DEC_PRICE} * {_DEC_DISC}), 2) AS DOUBLE)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem (scan → filter →
    partial-agg → final agg; no join, no python)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money aggregates use exact DECIMAL arithmetic so results are
            # independent of summation order (bit-identical to the DuckDB
            # oracle); cast to DOUBLE only at the output boundary
            F.expr(_DEC_SUM_QTY).alias("sum_qty"),
            F.expr(_DEC_SUM_BASE).alias("sum_base_price"),
            F.expr(_DEC_SUM_DISC).alias("sum_disc_price"),
            F.expr(_DEC_SUM_CHARGE).alias("sum_charge"),
            F.expr(_DEC_AVG_QTY).alias("avg_qty"),
            F.expr(_DEC_AVG_PRICE).alias("avg_price"),
            F.expr(_DEC_AVG_DISC).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(18,2)), 2)::DOUBLE AS sum_base_price,
       round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(18,2)), 2)::DOUBLE AS sum_disc_price,
       round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(18,2) * (1 + l_tax)::DECIMAL(18,2)), 2)::DOUBLE AS sum_charge,
       round(sum(l_quantity::DECIMAL(18,2)) / count(*), 4)::DOUBLE AS avg_qty,
       round(sum(l_extendedprice::DECIMAL(18,2)) / count(*), 4)::DOUBLE AS avg_price,
       round(sum(l_discount::DECIMAL(18,2)) / count(*), 6)::DOUBLE AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⨝ orders ⨝ lineitem with aggregation — the classic
    fact-to-fact join; customer is broadcast, orders/lineitem co-shuffle
    on orderkey once."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .where(F.col("o_orderdate") < F.lit("1998-03-15"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_DEC_REVENUE).alias("revenue"))
        .where(F.col("revenue") > 100000)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


Q3_ORACLE = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       revenue
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(18,2)), 2)::DOUBLE AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  GROUP BY 1, 2, 3
)
WHERE revenue > 100000
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join rolled up by nation: dimensions broadcast, single
    shuffle for the final aggregation."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation),
            (cust.c_nationkey == nation.n_nationkey)
            & (supp.s_nationkey == nation.n_nationkey),
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.expr(_DEC_REVENUE).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


Q5_ORACLE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice::DECIMAL(18,2) * (1 - l_discount)::DECIMAL(18,2)), 2)::DOUBLE AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders by totalprice per customer, with
    deterministic (price, orderkey) tie-breaking."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


TOP_ORDERS_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
)
WHERE rank <= 3
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation over the events stream table (the batch
    twin of the structured-streaming windowed aggregation in
    ``lsh_spark.streaming``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr('CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)')
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_HOURLY_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value::DECIMAL(18,2)), 2)::DOUBLE AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session per user
    (lag + cumulative sum over an event-time window), then session-level
    rollup.  The scalable pattern: one shuffle on user_id, everything else
    window-local."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    sessions = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.col("ts").cast("double") - F.col("prev_ts").cast("double")
                    > 1800
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr('CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)')
        .alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


EVENTS_SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts, value,
         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*) AS n_events,
       round(sum(value::DECIMAL(18,2)), 2)::DOUBLE AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM numbered
GROUP BY 1, 2
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_ORACLE),
    "q3_shipping_priority": (q3_shipping_priority, Q3_ORACLE),
    "q5_region_revenue": (q5_region_revenue, Q5_ORACLE),
    "top_orders_per_customer": (top_orders_per_customer, TOP_ORDERS_ORACLE),
    "events_hourly": (events_hourly, EVENTS_HOURLY_ORACLE),
    "events_sessionize": (events_sessionize, EVENTS_SESSIONIZE_ORACLE),
}


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join (TPC-H Q4 shape): orders with at least one
    late-shipping lineitem, counted by priority.  left_semi keeps the
    orders side lean — no fact-fact row explosion."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.where(F.col("l_shipdate") > F.lit("1999-01-01")).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
)
GROUP BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers that never ordered (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over the part dimension incl. exact median (Spark
    ``percentile`` == DuckDB ``quantile_cont``: both exact interpolated)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr("CAST(round(SUM(CAST(p_retailprice AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .alias("total_price"),
            F.round(F.expr("percentile(p_size, 0.5)"), 4).alias("median_size"),
            F.max("p_size").alias("max_size"),
        )
    )


PART_BRAND_STATS_ORACLE = """
SELECT p_brand,
       count(*) AS n_parts,
       round(sum(p_retailprice::DECIMAL(18,2)), 2)::DOUBLE AS total_price,
       round(quantile_cont(p_size, 0.5), 4) AS median_size,
       max(p_size) AS max_size
FROM part
GROUP BY p_brand
"""


def supplier_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (region, nation) of supplier account balances —
    hierarchical aggregates in one pass (GROUPING SETS machinery)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.expr("CAST(round(SUM(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .alias("total_acctbal"),
        )
    )


SUPPLIER_NATION_ROLLUP_ORACLE = """
SELECT r_name, n_name,
       count(*) AS n_suppliers,
       round(sum(s_acctbal::DECIMAL(18,2)), 2)::DOUBLE AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def high_value_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: customers with any order EXCEPT customers whose max
    order is below the global average order value (intersect/except path)."""
    orders = load_table(spark, sf_dir, "orders")
    cust_any = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    # the comparison value must be summation-order independent (a float avg
    # varies in the last ulp with partitioning): exact decimal sum / count
    avg_val = orders.agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*)")
        .alias("v")).first().v
    low_max = (
        orders.groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("mx"))
        .where(F.col("mx").cast("decimal(18,2)") < F.lit(avg_val))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust_any.exceptAll(low_max)


HIGH_VALUE_ORDER_CUSTOMERS_ORACLE = """
WITH avg_val AS (
  SELECT sum(o_totalprice::DECIMAL(18,2)) / count(*) AS v FROM orders),
any_c AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
low_max AS (
  SELECT o_custkey AS c_custkey
  FROM orders GROUP BY o_custkey
  HAVING max(o_totalprice)::DECIMAL(18,2) < (SELECT v FROM avg_val)
)
SELECT c_custkey FROM any_c
EXCEPT ALL
SELECT c_custkey FROM low_max
"""


def event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style distribution: distinct users + event share per type
    (exact countDistinct; share = ratio of bigint counts)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    agged = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    # the grand total is the sum of the (tiny) grouped counts — an
    # unpartitioned window over |event_type| rows, not a second full scan
    # of the fact table as a driver-side ev.count() would be
    total = F.sum("n_events").over(Window.partitionBy())
    return agged.withColumn(
        "share", F.round(F.col("n_events") / total, 6))


EVENT_TYPE_DISTRIBUTION_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(count(*) / (SELECT count(*) * 1.0 FROM events), 6) AS share
FROM events
GROUP BY event_type
"""


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload parsing: the events ``props`` column is a
    JSON string; ``from_json`` with an explicit schema parses it
    JVM-side (one pass, no Python), then a bucketed rollup aggregates
    the extracted field.  At scale the explicit schema is what keeps
    this a single projection — schema inference over JSON would scan
    the data twice."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT")["k"].alias("k"),
    )
    return (
        parsed.withColumn("k_bucket", F.floor(F.col("k") / 10).cast("int"))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVENTS_PROPS_STATS_ORACLE = """
WITH parsed AS (
  SELECT event_type, json_extract(props, '$.k')::INT AS k FROM events
)
SELECT event_type, (k // 10)::INT AS k_bucket,
       count(*) AS n_events,
       sum(k)::BIGINT AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM parsed
GROUP BY 1, 2
"""


QUERIES.update({
    "events_props_stats": (events_props_stats, EVENTS_PROPS_STATS_ORACLE),
    "q4_order_priority": (q4_order_priority, Q4_ORACLE),
    "customers_without_orders": (customers_without_orders,
                                 CUSTOMERS_WITHOUT_ORDERS_ORACLE),
    "part_brand_stats": (part_brand_stats, PART_BRAND_STATS_ORACLE),
    "supplier_nation_rollup": (supplier_nation_rollup,
                               SUPPLIER_NATION_ROLLUP_ORACLE),
    "high_value_order_customers": (high_value_order_customers,
                                   HIGH_VALUE_ORDER_CUSTOMERS_ORACLE),
    "event_type_distribution": (event_type_distribution,
                                EVENT_TYPE_DISTRIBUTION_ORACLE),
})


def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join query: each purchase event paired with the user's most
    recent prior (or simultaneous) click.  Oracle: DuckDB's native
    ASOF LEFT JOIN — the Spark side is the union-sort composition in
    ``operators.asof`` (single shuffle on user_id)."""
    from .asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("value").alias("click_value"))
    joined = asof_join(
        purchases, clicks, by="user_id", on="ts",
        right_cols=["click_event_id", "click_value"], suffix="")
    return joined.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value", "click_event_id", "click_value",
    )


ASOF_ORACLE = """
SELECT p.user_id, p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       p.value,
       c.event_id AS click_event_id,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


QUERIES["asof_purchase_last_click"] = (asof_purchase_last_click, ASOF_ORACLE)


def errors_with_nearby_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join query: for each error event, how many click events the
    same user produced within ±30 minutes (time-bucket join — hash join
    over ≤3 buckets per row, not a per-key nested loop).  Oracle: plain
    range-predicate join in DuckDB (counts are exact ints)."""
    from .rangejoin import range_join_seconds

    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    pairs = range_join_seconds(
        errors, clicks, by="user_id", left_ts="ts", right_ts="click_ts",
        window_seconds=1800)
    return (
        errors.join(
            pairs.groupBy("error_id")
            .agg(F.count(F.lit(1)).alias("n_nearby_clicks")),
            on="error_id", how="left")
        .select(
            "user_id", "error_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks"))
    )


RANGE_JOIN_ORACLE = """
WITH errors AS (
  SELECT user_id, event_id AS error_id, ts FROM events
  WHERE event_type = 'error'),
clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click')
SELECT e.user_id, e.error_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       count(c.click_ts) AS n_nearby_clicks
FROM errors e
LEFT JOIN clicks c
  ON e.user_id = c.user_id
 AND abs(epoch(e.ts) - epoch(c.click_ts)) <= 1800
GROUP BY 1, 2, 3
"""


def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k terms: explode tokens (lateral view), count per
    (lang, term), rank within lang — all integer arithmetic, exact oracle.
    The classic corpus-statistics shape (one explode, one agg shuffle)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), "\\s+"))
        .alias("term"),
    ).where(F.col("term") != "")
    counts = terms.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("lang", "term", "n", "rank")
    )


TOP_TERMS_ORACLE = """
WITH terms AS (
  SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')) AS term
  FROM documents
),
counts AS (
  SELECT lang, term, count(*) AS n FROM terms WHERE term != ''
  GROUP BY 1, 2
)
SELECT lang, term, n, rank FROM (
  SELECT lang, term, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, term ASC)
           AS rank
  FROM counts
)
WHERE rank <= 10
"""


QUERIES["errors_with_nearby_clicks"] = (
    errors_with_nearby_clicks, RANGE_JOIN_ORACLE)
QUERIES["top_terms_per_lang"] = (top_terms_per_lang, TOP_TERMS_ORACLE)


# ---------------------------------------------------------------------------
# round-4 additions (registered AFTER the streaming families so earlier
# registry positions — and their driver-row history — stay stable)
# ---------------------------------------------------------------------------

from pyspark.sql.window import Window

QUERIES_LATE: dict = {}


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-minimum query over the tables this lake
    has (no partsupp): for every small part (``p_size < 15``), the
    supplier(s) whose lineitem achieved the LOWEST extended price for
    that part — i.e. ``WHERE price = (SELECT min(price) ... WHERE
    l_partkey = p_partkey)`` decorrelated into a window minimum.

    Scale shape: part is filtered then broadcast; the window partitions
    by ``l_partkey`` over the already part-pruned join output, so the one
    shuffle is keyed by partkey (no correlated re-scan per row — the
    subquery form would rescan lineitem per part on a naive engine);
    supplier/nation are broadcast dims."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") < 15)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    priced = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("p_partkey", "p_brand", "l_suppkey",
                F.col("l_extendedprice").cast("decimal(18,2)")
                .alias("__price"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        priced.withColumn("__min_price", F.min("__price").over(w))
        .where(F.col("__price") == F.col("__min_price"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey", "p_brand", "s_name",
            F.col("n_name").alias("supplier_nation"),
            F.col("__min_price").cast("double").alias("min_price"),
        )
    )


MIN_COST_SUPPLIER_ORACLE = """
WITH priced AS (
  SELECT p.p_partkey, p.p_brand, l.l_suppkey,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_size < 15
),
m AS (
  SELECT *, min(price) OVER (PARTITION BY p_partkey) AS min_p
  FROM priced
)
SELECT m.p_partkey, m.p_brand, s.s_name,
       n.n_name AS supplier_nation,
       CAST(m.min_p AS DOUBLE) AS min_price
FROM m
JOIN supplier s ON m.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE m.price = m.min_p
"""

QUERIES_LATE["min_cost_supplier"] = (min_cost_supplier,
                                     MIN_COST_SUPPLIER_ORACLE)


def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped "large orders" query: orders whose total lineitem
    quantity exceeds 250, with their customer — the aggregate-then-
    semi-join-back pattern (``HAVING`` feeding an ``IN`` subquery).

    Scale shape: the qualifying-order set is produced by ONE lineitem
    hash-aggregate (map-side partial combine does most of the work); the
    join back to orders is keyed on orderkey and customer is a broadcast
    dim — no repeated scan of lineitem for the IN-list."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .alias("__qty"))
        .where(F.col("__qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double")
            .alias("o_totalprice"),
            F.col("__qty").cast("double").alias("total_qty"),
        )
    )


LARGE_QTY_ORDERS_ORACLE = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING qty > 250
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       CAST(big.qty AS DOUBLE) AS total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""

QUERIES_LATE["large_quantity_orders"] = (large_quantity_orders,
                                         LARGE_QTY_ORDERS_ORACLE)


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel analytics: users who completed
    view → click → purchase IN ORDER — each stage's timestamp is the
    FIRST occurrence strictly after the previous stage (the standard
    ordered-funnel semantics, not mere presence of all three types).

    Scale shape: three conditional min-aggregates keyed by user_id, each
    chained through an equi-join on user_id — every stage is one
    partial-combined hash aggregate plus a co-keyed join, so the whole
    funnel re-uses a single user_id partitioning and never sorts or
    windows the raw event stream."""
    ev = load_table(spark, sf_dir, "events")
    t1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("__t_view"))
    )
    t2 = (
        ev.where(F.col("event_type") == "click")
        .join(t1, on="user_id")
        .where(F.col("ts") > F.col("__t_view"))
        .groupBy("user_id")
        .agg(F.first("__t_view").alias("__t_view"),
             F.min("ts").alias("__t_click"))
    )
    t3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(t2, on="user_id")
        .where(F.col("ts") > F.col("__t_click"))
        .groupBy("user_id")
        .agg(F.first("__t_view").alias("__t_view"),
             F.first("__t_click").alias("__t_click"),
             F.min("ts").alias("__t_purchase"))
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return t3.select(
        "user_id",
        F.date_format("__t_view", fmt).alias("first_view"),
        F.date_format("__t_click", fmt).alias("first_click_after_view"),
        F.date_format("__t_purchase", fmt).alias("first_purchase_after_click"),
    )


EVENTS_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, any_value(t1.t_view) AS t_view, min(e.ts) AS t_click
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, any_value(t2.t_view) AS t_view,
         any_value(t2.t_click) AS t_click, min(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
  GROUP BY e.user_id
)
SELECT user_id,
       strftime(t_view, '%Y-%m-%d %H:%M:%S') AS first_view,
       strftime(t_click, '%Y-%m-%d %H:%M:%S') AS first_click_after_view,
       strftime(t_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase_after_click
FROM t3
"""

QUERIES_LATE["events_funnel"] = (events_funnel, EVENTS_FUNNEL_ORACLE)


def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (crosstab): per user, event counts spread across one column
    per event type plus that user's total value.  The pivot values are
    enumerated explicitly — with them Spark plans ONE aggregate pass
    (conditional counts), without them it must first scan for the
    distinct values (an extra job before the real one)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    totals = ev.groupBy("user_id").agg(
        F.expr("CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)")
        .alias("total_value"))
    out_cols = [F.coalesce(F.col(t), F.lit(0)).cast("bigint")
                .alias(f"n_{t}") for t in types]
    return piv.join(totals, on="user_id").select(
        "user_id", *out_cols, "total_value")


EVENTS_TYPE_PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS total_value
FROM events GROUP BY user_id
"""

QUERIES_LATE["events_type_pivot"] = (events_type_pivot,
                                     EVENTS_TYPE_PIVOT_ORACLE)


def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (full grouping-sets lattice) over returnflag × linestatus:
    every combination including both margins and the grand total, with
    GROUPING markers distinguishing real NULLs from subtotal rows.  One
    expand+aggregate pass — the grouping-sets expansion happens map-side,
    so the shuffle carries each input row once per lattice level but
    never re-scans the source."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            # grouping() must be evaluated inside the cube aggregate
            # (Spark rejects it in a later projection)
            F.grouping("l_returnflag").cast("int").alias("g_returnflag"),
            F.grouping("l_linestatus").cast("int").alias("g_linestatus"),
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2)"
                   " AS DOUBLE)").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "g_returnflag", "g_linestatus", "n_rows", "sum_qty",
        )
    )


LINEITEM_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, '<all>') AS returnflag,
       coalesce(l_linestatus, '<all>') AS linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_returnflag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_linestatus,
       count(*) AS n_rows,
       CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

QUERIES_LATE["lineitem_cube"] = (lineitem_cube, LINEITEM_CUBE_ORACLE)


def events_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-retention analytics: users grouped by the ISO week of their
    FIRST event (the cohort), counted per (cohort, weeks-since-cohort)
    activity cell — the classic retention triangle.

    Scale shape: one user-keyed aggregate finds first-event times, the
    events stream joins it on the SAME user_id key (the aggregate's
    partitioning is reused — no second full shuffle of events beyond the
    join), and the retention cells come from a map-side-combinable
    count-distinct aggregate over (cohort_week, week_offset)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("__first_ts"))
    joined = ev.join(firsts, on="user_id")
    cohort = F.date_trunc("week", F.col("__first_ts"))
    week = F.date_trunc("week", F.col("ts"))
    return (
        joined.select(
            F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(week, cohort) / 7).cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


EVENTS_WEEKLY_COHORTS_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1
)
SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
       (date_diff('day', date_trunc('week', f.first_ts),
                  date_trunc('week', e.ts)) // 7)::INT AS week_offset,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN firsts f USING (user_id)
GROUP BY 1, 2
"""

QUERIES_LATE["events_weekly_cohorts"] = (events_weekly_cohorts,
                                         EVENTS_WEEKLY_COHORTS_ORACLE)


def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer-order histogram: orders per customer
    (excluding the low-priority band), INCLUDING zero-order customers,
    rolled into a (order_count → customer count) distribution.

    Scale shape: the per-customer counts come from ONE orders aggregate
    (map-side combine), which is then outer-joined to the customer keys —
    never the other way around (joining raw orders to customers first
    would shuffle the fact table wider than needed); the final histogram
    aggregate is tiny."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.where(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey").agg(F.count("*").alias("__n"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


CUSTOMER_ORDER_COUNTS_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n FROM orders
  WHERE o_orderpriority <> '5-LOW' GROUP BY 1
),
counts AS (
  SELECT coalesce(p.n, 0) AS c_count
  FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
)
SELECT c_count, count(*) AS custdist FROM counts GROUP BY 1
"""

QUERIES_LATE["customer_order_counts"] = (customer_order_counts,
                                         CUSTOMER_ORDER_COUNTS_ORACLE)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast-revenue change: single scan, tight
    filter, one exact-DECIMAL aggregate — the canonical
    predicate-pushdown query (every filter reaches the parquet scan;
    no join, no shuffle beyond the scalar agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(
            "CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)"
        ).alias("revenue"))
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice::DECIMAL(18,2)
                 * l_discount::DECIMAL(18,2)), 2)::DOUBLE AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

QUERIES_LATE["q6_forecast_revenue"] = (q6_forecast_revenue, Q6_ORACLE)


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo-revenue share: lineitem ⨝ part (the part
    side is dimension-sized → broadcast), one month of shipments, the
    PROMO share of discounted revenue.  Both DECIMAL sums are exact;
    the ratio is taken in DOUBLE of the exact sums (decimal÷decimal
    scale rules differ between engines; double division of identical
    operands is bit-deterministic), rounded to 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = ("CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(1 - l_discount AS DECIMAL(18,2))")
    joined = (
        li.where((F.col("l_shipdate") >= F.lit("1996-03-01"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01")))
        .join(F.broadcast(part),
              F.col("l_partkey") == F.col("p_partkey"))
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.expr(f"CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' "
                     f"THEN {disc} ELSE CAST(0 AS DECIMAL(18,2)) END)"
                     f" AS DOUBLE)")
            / F.expr(f"CAST(SUM({disc}) AS DOUBLE)"),
            6,
        ).alias("promo_revenue_pct"))


Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice::DECIMAL(18,2)
                              * (1 - l_discount)::DECIMAL(18,2)
                         ELSE 0::DECIMAL(18,2) END)::DOUBLE
             / sum(l_extendedprice::DECIMAL(18,2)
                   * (1 - l_discount)::DECIMAL(18,2))::DOUBLE,
             6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""

QUERIES_LATE["q14_promo_revenue"] = (q14_promo_revenue, Q14_ORACLE)


def supplier_revenue_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier revenue computed through the EXPLICIT
    skew-salting path (``plans.skew.salted_join``): the fact side
    scatters across 8 salt replicas of the supplier dimension, so a
    power-law-hot supplier key splits into 8 partitions instead of one
    straggler — the manual fix for skew regimes AQE's sort-merge-only
    splitting can't reach.  The DECIMAL revenue aggregate is exact, so
    the oracle (a plain unsalted join) pins that salting never changes
    WHAT is computed — only the partition layout."""
    from ..plans.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"),
        F.expr("CAST(l_extendedprice AS DECIMAL(18,2))"
               " * CAST(1 - l_discount AS DECIMAL(18,2))").alias("__rev"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    joined = salted_join(li, supp, ["s_suppkey"], salt_buckets=8)
    return (
        joined.join(F.broadcast(nation),
                    joined.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.expr("CAST(round(SUM(__rev), 2) AS DOUBLE)")
             .alias("revenue"))
    )


SUPPLIER_REVENUE_SALTED_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount)::DECIMAL(18,2)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""

QUERIES_LATE["supplier_revenue_salted"] = (supplier_revenue_salted,
                                           SUPPLIER_REVENUE_SALTED_ORACLE)


def order_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed quantiles of order value per priority class
    (Spark's ``percentile`` exact aggregate vs DuckDB ``quantile_cont``
    — both the standard linear interpolation at rank ``p·(n−1)``;
    results round to 4dp at the output boundary, the money-ratio
    convention).  At 100 TB the deployment shape is
    ``approx_percentile`` (t-digest sketch, bounded memory, no exact
    oracle twin) — this gate query pins the exact form the sketch is
    judged against."""
    orders = load_table(spark, sf_dir, "orders")
    qs = {"q25": 0.25, "q50": 0.5, "q75": 0.75, "q99": 0.99}
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *[F.round(F.expr(f"percentile(o_totalprice, {p})"), 4)
              .alias(name) for name, p in qs.items()],
        )
    )


ORDER_VALUE_QUANTILES_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(quantile_cont(o_totalprice, 0.25), 4) AS q25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS q50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS q75,
       round(quantile_cont(o_totalprice, 0.99), 4) AS q99
FROM orders
GROUP BY o_orderpriority
"""

QUERIES_LATE["order_value_quantiles"] = (order_value_quantiles,
                                         ORDER_VALUE_QUANTILES_ORACLE)


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: quarterly revenue per supplier,
    keep every supplier whose revenue equals the global maximum — the
    scalar-max correlated subquery decorrelated to a 1-row broadcast
    crossJoin (never a global sort or single-partition window).  The
    DECIMAL revenue is exact, so max-equality is well-defined."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01")))
        .groupBy("l_suppkey")
        .agg(F.expr("SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * CAST(1 - l_discount AS DECIMAL(18,2)))")
             .alias("__rev"))
    )
    top = rev.agg(F.max("__rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("__rev") == F.col("__max_rev"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.expr("CAST(round(__rev, 2) AS DOUBLE)")
                .alias("total_revenue"))
    )


Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(18,2)) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(r, 2)::DOUBLE AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT max(r) FROM rev)
"""

QUERIES_LATE["q15_top_supplier"] = (q15_top_supplier, Q15_ORACLE)


# ---------------------------------------------------------------------------
# round-8 TPC-H ports over the simplified schemas (no partsupp /
# commit-receipt dates / shipmode-container columns in the testdata, so
# q7/q8/q10 port classically and q19/q22 keep their join/predicate
# SHAPE with the available columns).  Money discipline throughout:
# DECIMAL(18,2) element casts, exact decimal SUM (summation-order
# independent), round → DOUBLE only at the output boundary.
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.
    Dimensions (supplier+nation, customer+nation) broadcast onto the
    lineitem ⨝ orders fact join; the OR'd nation pair filter runs
    post-join in-plan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("__sn_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("__cn_key"),
                       F.col("n_name").alias("cust_nation"))
    sn = supp.join(F.broadcast(n1), supp.s_nationkey == F.col("__sn_key"))
    cn = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("__cn_key"))
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.where((F.col("l_shipdate") >= F.lit("1995-01-01"))
                 & (F.col("l_shipdate") <= F.lit("1996-12-31")))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(F.broadcast(cn), orders.o_custkey == cn.c_custkey)
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(_DEC_REVENUE).alias("revenue"))
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2)::DOUBLE AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate)::INT AS l_year,
         l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(18,2) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00'
)
GROUP BY 1, 2, 3
"""

QUERIES_LATE["q7_volume_shipping"] = (q7_volume_shipping, Q7_ORACLE)


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of ASIA's PROMO-part order volume by
    year — the conditional-aggregate ratio over a 7-table star; every
    dimension broadcasts, the two fact tables co-shuffle once.  Both
    sums stay exact DECIMAL; the share divides their rounded DOUBLE
    images (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    n1 = (nation.join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                      nation.n_regionkey == F.col("r_regionkey"))
          .select(F.col("n_nationkey").alias("__mkt_key")))
    n2 = nation.select(F.col("n_nationkey").alias("__sup_key"),
                       F.col("n_name").alias("__sup_nation"))
    vol = "CAST(round(SUM(CASE WHEN __sup_nation = 'NATION_5' THEN " \
          f"{_DEC_PRICE} * {_DEC_DISC} ELSE CAST(0 AS DECIMAL(18,2)) END)" \
          ", 2) AS DOUBLE)"
    tot = f"CAST(round(SUM({_DEC_PRICE} * {_DEC_DISC}), 2) AS DOUBLE)"
    return (
        li.join(F.broadcast(part.where(F.col("p_type") == "PROMO")),
                li.l_partkey == part.p_partkey)
        .join(orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31"))),
            li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("__mkt_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("__sup_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.expr(vol).alias("__num"), F.expr(tot).alias("__den"))
        .select("o_year",
                F.round(F.col("__num") / F.col("__den"), 6)
                .alias("mkt_share"))
    )


Q8_ORACLE = """
SELECT o_year,
       round(round(sum(CASE WHEN sup_nation = 'NATION_5'
                            THEN volume
                            ELSE 0::DECIMAL(18,2) END), 2)::DOUBLE
             / round(sum(volume), 2)::DOUBLE, 6) AS mkt_share
FROM (
  SELECT year(o_orderdate)::INT AS o_year,
         l_extendedprice::DECIMAL(18,2)
           * (1 - l_discount)::DECIMAL(18,2) AS volume,
         n2.n_name AS sup_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
)
GROUP BY o_year
"""

QUERIES_LATE["q8_market_share"] = (q8_market_share, Q8_ORACLE)


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter.  LIMIT-with-ties is made deterministic the repo way: rank
    by (exact-decimal revenue DESC, c_custkey ASC) and keep rank <= 20."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders.where(
            (F.col("o_orderdate") >= F.lit("1995-10-01"))
            & (F.col("o_orderdate") < F.lit("1996-01-01"))),
            li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation),
              cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(f"SUM({_DEC_PRICE} * {_DEC_DISC})").alias("revenue_dec"))
    )
    # distributed TakeOrdered instead of a global single-partition
    # window: orderBy + limit keeps the top-20 selection parallel.  Rank
    # on the EXACT decimal sum (the oracle's row_number key) and round
    # to 2dp only in the output projection — ranking on the rounded
    # DOUBLE could pick a different customer when two exact revenues
    # straddling the rank-20 boundary round to the same 2dp value.
    return (
        rev.orderBy(F.col("revenue_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.expr("CAST(round(revenue_dec, 2) AS DOUBLE)").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         round(sum(l_extendedprice::DECIMAL(18,2)
                   * (1 - l_discount)::DECIMAL(18,2)), 2)::DOUBLE AS revenue,
         row_number() OVER (
           ORDER BY sum(l_extendedprice::DECIMAL(18,2)
                        * (1 - l_discount)::DECIMAL(18,2)) DESC,
                    c_custkey ASC) AS r
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
WHERE r <= 20
"""

QUERIES_LATE["q10_returned_items"] = (q10_returned_items, Q10_ORACLE)


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's SHAPE with the available columns (the testdata has no
    container/shipmode): one scalar revenue over an OR of three
    (brand, size-range, quantity-range) brackets — the classic
    pushdown-unfriendly disjunction the optimizer must evaluate
    post-join without turning the broadcast join into a cross product."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#2")
         & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#15")
           & F.col("p_size").between(5, 25)
           & F.col("l_quantity").between(5, 40))
        | ((F.col("p_brand") == "Brand#19")
           & F.col("p_size").between(10, 50)
           & F.col("l_quantity").between(10, 60))
    )
    return joined.where(bracket).agg(F.expr(_DEC_REVENUE).alias("revenue"))


Q19_ORACLE = """
SELECT round(sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount)::DECIMAL(18,2)), 2)::DOUBLE AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 5 AND 25
       AND l_quantity BETWEEN 5 AND 40)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 50
       AND l_quantity BETWEEN 10 AND 60)
"""

QUERIES_LATE["q19_bracket_revenue"] = (q19_bracket_revenue, Q19_ORACLE)


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's SHAPE over nations (the testdata has no phone
    country codes): customers above the average positive account
    balance with NO orders, rolled up per nation.  The scalar threshold
    stays inside the job as a broadcast 1-row cross join (the
    plan-construction-zero-jobs rule); the no-orders test is a
    shuffle-free broadcast anti-join only if orders were small — here
    it is the honest left-anti shuffle join on custkey."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    thr = (
        cust.where(F.col("c_acctbal") > 0)
        .agg((F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)")
              / F.count(F.lit(1))).alias("__thr"))
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("__thr"))
        .join(orders.select(F.col("o_custkey").alias("c_custkey")),
              "c_custkey", "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_custs"),
             F.expr("CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) "
                    "AS DOUBLE)").alias("total_acctbal"))
    )


Q22_ORACLE = """
WITH thr AS (
  SELECT sum(c_acctbal::DECIMAL(18,2))::DOUBLE / count(*) AS t
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, count(*)::BIGINT AS n_custs,
       round(sum(c_acctbal::DECIMAL(18,2)), 2)::DOUBLE AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN thr
WHERE c_acctbal > thr.t
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""

QUERIES_LATE["q22_sales_opportunity"] = (q22_sales_opportunity, Q22_ORACLE)


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, INCLUDING
    zero-order customers (the left-outer is the point of the query).
    Shape (ref behavior: host-engine relational suite): customer
    LEFT JOIN orders → per-customer count → count-of-counts.

    100 TB plan: the first aggregate shuffles bare (custkey) pairs;
    the second groups the per-customer counts — cardinality = number
    of customers, then number of distinct counts.  No payload columns
    ever shuffle."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_ORACLE = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_custkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

QUERIES_LATE["q13_customer_distribution"] = (q13_customer_distribution,
                                             Q13_ORACLE)


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape: yearly-average revenue lost to small-quantity
    orders of one brand — lineitem rows whose quantity is below 20% of
    that part's average quantity.  The classic correlated scalar
    subquery, planned Spark-first as a per-part aggregate broadcast
    back onto the fact scan (one lineitem pass computes BOTH the
    per-part averages and the candidate rows; AQE broadcasts the tiny
    filtered-part aggregate).

    Exactness: the per-part average quantity is SUM(DECIMAL)::DOUBLE /
    COUNT (the q22 idiom — DuckDB's DECIMAL '/' degrades to double);
    the final sum is exact DECIMAL rounded once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#2").select("p_partkey")
    cand = li.join(F.broadcast(brand_parts),
                   li.l_partkey == brand_parts.p_partkey)
    avg_qty = (
        cand.groupBy("l_partkey")
        .agg(F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
                    " / COUNT(*)").alias("__avg_qty"))
    )
    return (
        cand.join(F.broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(F.expr(
            "CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)"
            " AS DOUBLE)").alias("avg_yearly"))
    )


Q17_ORACLE = """
WITH cand AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
),
avg_qty AS (
  SELECT l_partkey,
         sum(l_quantity::DECIMAL(18,2))::DOUBLE / count(*) AS aq
  FROM cand GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice::DECIMAL(18,2)) / 7.0, 2)::DOUBLE
         AS avg_yearly
FROM cand JOIN avg_qty USING (l_partkey)
WHERE l_quantity < 0.2 * aq
"""

QUERIES_LATE["q17_small_quantity_revenue"] = (q17_small_quantity_revenue,
                                              Q17_ORACLE)


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with any order whose total quantity exceeds
    a threshold, top-100 by (o_totalprice DESC, o_orderdate ASC) —
    deterministic ties on o_orderkey.

    100 TB plan: the HAVING aggregate shuffles bare (orderkey,
    quantity) pairs with map-side partial sums; only qualifying order
    keys (tiny) join back — broadcast — onto orders/customer; the
    top-100 is a distributed TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr("CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) "
                    "AS DOUBLE)").alias("total_qty"))
        .where(F.col("total_qty") > 270.0)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").cast("string")
                .alias("o_orderdate"),
                "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
                 F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity::DECIMAL(18,2)), 2)::DOUBLE > 270.0
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""

QUERIES_LATE["q18_large_volume_customers"] = (q18_large_volume_customers,
                                              Q18_ORACLE)


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9's SHAPE with the available columns (the testdata has no
    partsupp, so supply cost is p_retailprice·quantity): per-nation,
    per-year profit over parts whose name matches the color filter.
    Shape: the three dimensions (part, supplier, nation) broadcast; the
    one honest shuffle is lineitem ⨝ orders on orderkey; money stays in
    exact DECIMAL until the final round."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part.where(F.col("p_name").contains("red"))),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation),
              supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.expr(
            "CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(1 - l_discount AS DECIMAL(18,2))"
            " - CAST(p_retailprice AS DECIMAL(18,2))"
            " * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)")
            .alias("profit"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       round(sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount)::DECIMAL(18,2)
                 - p_retailprice::DECIMAL(18,2)
                 * l_quantity::DECIMAL(18,2)), 2)::DOUBLE AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""

QUERIES_LATE["q9_profit_by_nation_year"] = (q9_profit_by_nation_year,
                                            Q9_ORACLE)


def q12_late_shipment_priority(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q12's SHAPE with the available columns (no shipmode /
    commit / receipt dates): lineitems shipped more than 90 days after
    their order date, bucketed by linestatus, split into high-priority
    (1-URGENT / 2-HIGH) vs lower-priority order counts.  One shuffle
    join on orderkey; pure integer counts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY 1
"""

QUERIES_LATE["q12_late_shipment_priority"] = (q12_late_shipment_priority,
                                              Q12_ORACLE)


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16's SHAPE with the available columns (no partsupp — the
    distinct (l_partkey, l_suppkey) pairs of lineitem are the bridge;
    no complaint text — suppliers with negative acctbal are the
    excluded set): distinct supplier count per (brand, type, size)
    excluding one brand.  The exclusion list broadcasts as an
    anti-join; the bridge dedup and the count-distinct share one
    shuffle on partkey after the broadcast part join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    bridge = li.select("l_partkey", "l_suppkey").distinct()
    excluded = supplier.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey"))
    return (
        bridge.join(F.broadcast(excluded), on="l_suppkey", how="left_anti")
        .join(F.broadcast(part.where(F.col("p_brand") != "Brand#2")),
              bridge.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long")
             .alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge
JOIN part ON l_partkey = p_partkey
WHERE p_brand != 'Brand#2'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""

QUERIES_LATE["q16_supplier_part_counts"] = (q16_supplier_part_counts,
                                            Q16_ORACLE)


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's SHAPE with the available columns (late = shipped
    more than 60 days after the order date): per supplier, the number
    of multi-supplier orders where THAT supplier was the only late
    one.  The exists / not-exists nest is expressed as per-order
    supplier counts (n_suppliers >= 2, n_late == 1) — equivalent and
    one aggregation pass each over the deduped (orderkey, suppkey)
    pairs instead of two correlated joins; supplier names broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    n_all = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"))
    late_pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey").distinct()
    )
    n_late = late_pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_late"))
    return (
        late_pairs
        .join(n_all, on="l_orderkey")
        .join(n_late, on="l_orderkey")
        .where((F.col("__n_supp") >= 2) & (F.col("__n_late") == 1))
        .join(F.broadcast(supplier),
              late_pairs.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


Q21_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
n_all AS (
  SELECT l_orderkey, count(*) AS n_supp FROM pairs GROUP BY 1
),
late_pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
),
n_late AS (
  SELECT l_orderkey, count(*) AS n_late FROM late_pairs GROUP BY 1
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM late_pairs
JOIN n_all USING (l_orderkey)
JOIN n_late USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1
"""

QUERIES_LATE["q21_waiting_suppliers"] = (q21_waiting_suppliers, Q21_ORACLE)


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's SHAPE with the available columns (this lake has no
    partsupp, so "inventory value" is the shipped value
    Σ quantity·extendedprice): parts whose value, over suppliers of one
    nation, exceeds 1.2× the mean per-part value — the classic
    HAVING-against-a-scalar-subquery, decorrelated Spark-first.

    100 TB plan: nation→supplier is a broadcast dim filter on the fact
    scan; ONE shuffle builds the per-part exact-DECIMAL sums; the
    global total and part count come from a second aggregate over the
    (parts-sized) per-part frame and broadcast back as a 1-row
    crossJoin — no correlated rescan, no second fact pass.  The
    threshold compare runs in DOUBLE of the exact DECIMAL sums with ONE
    literal op order (total·1.2/n_parts) replayed by the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nat_supp = (
        supp.join(F.broadcast(nation.where(F.col("n_name") == "NATION_7")),
                  supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey"))
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2))"
                    " * CAST(l_extendedprice AS DECIMAL(18,2)))")
             .alias("__val")))
    totals = F.broadcast(per_part.agg(
        F.expr("CAST(SUM(__val) AS DOUBLE)").alias("__total"),
        F.count(F.lit(1)).alias("__np")))
    return (
        per_part.crossJoin(totals)
        .where(F.expr("CAST(__val AS DOUBLE)"
                      " > CAST(__total AS DOUBLE) * 1.2 / __np"))
        .select(F.col("l_partkey").alias("p_partkey"),
                F.expr("CAST(round(__val, 2) AS DOUBLE)")
                .alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("p_partkey").asc())
    )


Q11_ORACLE = """
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
),
per_part AS (
  SELECT l_partkey,
         sum(l_quantity::DECIMAL(18,2) * l_extendedprice::DECIMAL(18,2))
           AS val
  FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey
),
t AS (SELECT sum(val)::DOUBLE AS total, count(*) AS np FROM per_part)
SELECT l_partkey AS p_partkey, round(val, 2)::DOUBLE AS part_value
FROM per_part, t
WHERE val::DOUBLE > total::DOUBLE * 1.2 / np
ORDER BY part_value DESC, p_partkey ASC
"""

QUERIES_LATE["q11_important_parts"] = (q11_important_parts, Q11_ORACLE)


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's SHAPE with the available columns (no partsupp
    availqty, so "excess" is temporal concentration: a supplier shipped
    MORE of a part in 1996 than in all other years combined): suppliers
    with at least one such small-part concentration, with the count of
    qualifying parts.  Q20's nested IN/EXISTS chain, decorrelated into
    one conditional aggregate.

    100 TB plan: the p_name prefix filter broadcasts onto the fact
    scan; ONE shuffle builds per-(supplier, part) exact-DECIMAL
    quantity sums with the 1996 share as a map-side conditional sum
    (no second fact pass, no correlated subquery); the qualifying-part
    count aggregates the (supplier, part)-sized frame and the supplier
    names broadcast onto the tiny result.  The excess compare is
    integer-exact in DECIMAL (2·qty_1996 > qty_total)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    small = part.where(F.col("p_name").startswith("small")) \
        .select("p_partkey")
    sp = (
        li.join(F.broadcast(small), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.expr("SUM(CAST(l_quantity AS DECIMAL(18,2)))")
            .alias("__qty_all"),
            F.expr("SUM(CASE WHEN l_shipdate >= TIMESTAMP'1996-01-01'"
                   " AND l_shipdate < TIMESTAMP'1997-01-01'"
                   " THEN CAST(l_quantity AS DECIMAL(18,2))"
                   " ELSE CAST(0 AS DECIMAL(18,2)) END)")
            .alias("__qty_1996")))
    excess = (
        sp.where(F.expr("__qty_1996 * 2 > __qty_all"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_excess_parts")))
    return (
        excess.join(F.broadcast(supp),
                    excess.l_suppkey == supp.s_suppkey)
        .select(F.col("s_suppkey"), F.col("s_name"), "n_excess_parts")
        .orderBy(F.col("n_excess_parts").desc(), F.col("s_suppkey").asc())
    )


Q20_ORACLE = """
WITH small AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
),
sp AS (
  SELECT l_suppkey, l_partkey,
         sum(l_quantity::DECIMAL(18,2)) AS qty_all,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
                  THEN l_quantity::DECIMAL(18,2)
                  ELSE 0::DECIMAL(18,2) END) AS qty_1996
  FROM lineitem JOIN small ON l_partkey = p_partkey
  GROUP BY 1, 2
),
excess AS (
  SELECT l_suppkey, count(*)::BIGINT AS n_excess_parts
  FROM sp WHERE qty_1996 * 2 > qty_all
  GROUP BY 1
)
SELECT s_suppkey, s_name, n_excess_parts
FROM excess JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_excess_parts DESC, s_suppkey ASC
"""

QUERIES_LATE["q20_excess_shippers"] = (q20_excess_shippers, Q20_ORACLE)


def events_user_rolling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event rolling activity features — how many events this user
    produced in the preceding 15 minutes / 1 hour (inclusive of the
    current event): the classic time-decayed feature-engineering shape
    (fraud velocity checks, rate limiting, engagement features).

    Scale shape: BOTH range frames share one (user_id, ts) window
    ordering, so the plan pays ONE shuffle + ONE sort for two features;
    the frame arithmetic is integer microseconds (``unix_micros`` ==
    DuckDB ``epoch_us``, exact — never float epoch seconds, whose
    cast-rounding differs between engines).  Partitioning by user is
    the natural bound: no user's history sits in more than one task,
    and no task sees more than one user's span."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = (Window.partitionBy("user_id").orderBy(us.cast("long")))
    w15 = base.rangeBetween(-15 * 60 * 1_000_000, Window.currentRow)
    w1h = base.rangeBetween(-3600 * 1_000_000, Window.currentRow)
    return ev.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w15).alias("n_15m"),
        F.count(F.lit(1)).over(w1h).alias("n_1h"),
    )


EVENTS_ROLLING_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 900000000 PRECEDING AND CURRENT ROW
                     )::BIGINT AS n_15m,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
                     )::BIGINT AS n_1h
FROM events
"""

QUERIES_LATE["events_user_rolling_counts"] = (events_user_rolling_counts,
                                              EVENTS_ROLLING_ORACLE)


def asof_click_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of query (time-to-convert attribution): each click
    paired with the user's NEXT purchase at-or-after it, plus the gap in
    whole seconds.  Oracle: DuckDB's native ASOF LEFT JOIN with the
    ``<=`` comparison; the Spark side is the flipped union-sort
    composition (``operators.asof.asof_join_forward`` — one shuffle +
    sort per user, no range join).  The gap is integer microseconds
    DIV 1e6 — exact on both engines, never float epoch math."""
    from .asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
        F.col("ts").alias("purchase_ts"))
    joined = asof_join_forward(
        clicks, purchases, by="user_id", on="ts",
        right_cols=["purchase_event_id", "purchase_value", "purchase_ts"],
        suffix="")
    return joined.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "purchase_event_id", "purchase_value",
        F.when(
            F.col("purchase_event_id").isNotNull(),
            F.expr("(unix_micros(purchase_ts) - unix_micros(ts)) "
                   "DIV 1000000"),
        ).alias("secs_to_purchase"),
    )


ASOF_FORWARD_ORACLE = """
SELECT c.user_id, c.event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       p.event_id AS purchase_event_id,
       p.value AS purchase_value,
       CASE WHEN p.event_id IS NOT NULL
            THEN (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 END
         AS secs_to_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""

QUERIES_LATE["asof_click_next_purchase"] = (asof_click_next_purchase,
                                            ASOF_FORWARD_ORACLE)


def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS lattice — the third grouping construct
    next to rollup and CUBE: per (returnflag, linestatus), per
    returnflag, and grand total in ONE aggregate pass (Spark expands
    sets inside a single Aggregate; no self-union of scans), with
    GROUPING markers disambiguating NULL-as-total from NULL-as-value."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls",
                "n_rows", "sum_qty")
    )


GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag)::INT AS g_rf,
       GROUPING(l_linestatus)::INT AS g_ls,
       count(*)::BIGINT AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""

QUERIES_LATE["lineitem_grouping_sets"] = (lineitem_grouping_sets,
                                          GROUPING_SETS_ORACLE)


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnostic over the events stream: per
    event_type, the user_id key-frequency distribution — the report a
    pipeline operator reads before choosing salting/AQE-skew settings
    for a user-keyed shuffle.

    Integer-exact by construction: counts are BIGINTs, the percentile
    boundaries ride the Spark ``percentile`` == DuckDB
    ``quantile_cont`` bit-equality (probe-verified for
    ``curriculum_stages``), and ``top_share`` is ONE double division
    of two exact integers (same IEEE op in both engines, 6dp-rounded
    in-plan per the pair-similarity idiom).

    Scale shape: groupBy (event_type, user_id) aggregates map-side;
    the per-type fold is over the distinct-key frame (bounded by the
    key vocabulary, far smaller than the stream); no windows, no
    sorts — the percentile is an aggregate, not a global order."""
    ev = load_table(spark, sf_dir, "events")
    per_key = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return (
        per_key.groupBy("event_type")
        .agg(
            F.sum("__cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("__cnt").cast("long").alias("max_key_rows"),
            F.expr("percentile(__cnt, 0.5)").alias("p50_key_rows"),
            F.expr("percentile(__cnt, 0.99)").alias("p99_key_rows"),
            F.round(F.max("__cnt").cast("double")
                    / F.sum("__cnt").cast("double"), 6)
            .alias("top_share"),
        )
    )


KEY_SKEW_ORACLE = """
WITH per_key AS (
  SELECT event_type, user_id, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       sum(cnt)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_keys,
       max(cnt)::BIGINT AS max_key_rows,
       quantile_cont(cnt, 0.5) AS p50_key_rows,
       quantile_cont(cnt, 0.99) AS p99_key_rows,
       round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
         AS top_share
FROM per_key
GROUP BY event_type
"""

QUERIES_LATE["key_skew_report"] = (key_skew_report, KEY_SKEW_ORACLE)


def events_hourly_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window traffic-anomaly detection: per (event_type,
    hour), compare the hour's event count against the trailing 24
    OBSERVED hours (rows frame — a missing hour contributes nothing,
    so the baseline is activity-weighted) and flag hours at > 2× the
    trailing mean.

    Integer-exact spike test: ``is_spike = cnt·n > 2·s`` compares
    BIGINTs only — no float enters the decision; the reported ratio is
    ONE double expression (cnt·n / s) of exact integers, 6dp-rounded,
    replayed in the identical op order by the oracle.  Hours with
    fewer than 12 trailing observations are warm-up and excluded (also
    the divide-guard: n ≥ 12 ⇒ s ≥ 12).

    Scale shape: one map-side-combinable (type, hour) aggregate, then
    a per-type window over the HOURLY frame — the window input is
    |types| × |hours| (time-bounded, thousands of rows per year), not
    the event stream; no global sort."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    return spikes_from_hourly(hourly)


def spikes_from_hourly(hourly: DataFrame) -> DataFrame:
    """Trailing-window stage of :func:`events_hourly_spikes`, shared
    with the streaming twin (which feeds summed per-batch partials):
    input ``(event_type, hour, n_events)``, one row per observed
    hour."""
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(-24, -1))
    trail = hourly.select(
        "event_type", "hour", "n_events",
        F.count(F.lit(1)).over(w).cast("long").alias("trail_n"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long")
        .alias("trail_sum"))
    return (
        trail.where(F.col("trail_n") >= 12)
        .select(
            "event_type", "hour", "n_events", "trail_n", "trail_sum",
            F.round((F.col("n_events").cast("double")
                     * F.col("trail_n").cast("double"))
                    / F.col("trail_sum").cast("double"), 6)
            .alias("ratio_to_trailing_mean"),
            (F.col("n_events") * F.col("trail_n")
             > F.lit(2) * F.col("trail_sum")).alias("is_spike"))
    )


EVENTS_SPIKES_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2
),
trail AS (
  SELECT event_type, hour, n_events,
         count(*) OVER w::BIGINT AS trail_n,
         coalesce(sum(n_events) OVER w, 0)::BIGINT AS trail_sum
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n_events, trail_n, trail_sum,
       round((CAST(n_events AS DOUBLE) * CAST(trail_n AS DOUBLE))
             / CAST(trail_sum AS DOUBLE), 6) AS ratio_to_trailing_mean,
       (n_events * trail_n > 2 * trail_sum) AS is_spike
FROM trail
WHERE trail_n >= 12
"""

QUERIES_LATE["events_hourly_spikes"] = (events_hourly_spikes,
                                        EVENTS_SPIKES_ORACLE)


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey 3-step paths: per user, events ordered by
    (ts, event_id) — the deterministic total order both engines share —
    each event starts a path ``a>b>c`` with its two successors inside
    the same user; paths counted globally, top 20 by (count desc, path
    asc).

    Scale shape: ONE shuffle+sort per user partition feeds both lead()
    frames (same window spec), the path counts aggregate map-side, and
    the global top-k plans as TakeOrdered — never a full sort of the
    path vocabulary."""
    return path_trigrams_df(load_table(spark, sf_dir, "events"))


def path_trigrams_df(ev: DataFrame, k: int = 20) -> DataFrame:
    """DataFrame-level core of :func:`event_path_trigrams` — exposed so
    the scale sweeps drive the exact gate plan on replicated frames."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    paths = (
        ev.select(
            "user_id",
            F.col("event_type").alias("__a"),
            F.lead("event_type", 1).over(w).alias("__b"),
            F.lead("event_type", 2).over(w).alias("__c"))
        .where(F.col("__b").isNotNull() & F.col("__c").isNotNull())
        .select(F.concat_ws(">", "__a", "__b", "__c").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )
    return paths.orderBy(F.col("n_paths").desc(),
                         F.col("path").asc()).limit(k)


EVENT_PATHS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS a,
         lead(event_type, 1) OVER w AS b,
         lead(event_type, 2) OVER w AS c
  FROM events
  -- epoch_us: DuckDB sees the parquet nanos, Spark's decode truncates
  -- to micros — ordering on epoch_us ties at the SAME granularity so
  -- event_id breaks ties identically in both engines
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC,
               event_id ASC)
),
paths AS (
  SELECT a || '>' || b || '>' || c AS path, count(*)::BIGINT AS n_paths
  FROM seq WHERE b IS NOT NULL AND c IS NOT NULL
  GROUP BY 1
)
SELECT path, n_paths FROM paths
ORDER BY n_paths DESC, path ASC LIMIT 20
"""

QUERIES_LATE["event_path_trigrams"] = (event_path_trigrams,
                                       EVENT_PATHS_ORACLE)
