"""Declared query registry: the engine's operator inventory exercised on the
driver fixture tables, each with a DuckDB-oracle SQL twin.

Every entry is REGISTRY[name] = (spark_fn, oracle_sql_or_None). The spark_fn
builds the DataFrame through the engine's operator library; the oracle is
ANSI SQL DuckDB runs on the same parquet views. Column names/aliases match
exactly (the driver sorts columns by name and value-hashes).

Float determinism: doubles are summed through DECIMAL casts then cast back
to DOUBLE, so partial-aggregation order (Spark) vs sequential order
(DuckDB) cannot produce differing bits — see BASELINE.md correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ncpi_whistler_spark.catalog import load_table
from ncpi_whistler_spark.functions import harmonize as H
from ncpi_whistler_spark.operators.aggregators import aggregate_columns, explode_aggregated
from ncpi_whistler_spark.operators.harmonize import harmonize
from ncpi_whistler_spark.operators.nest import embed, group_to_nested
from ncpi_whistler_spark.operators.profiling import count_summary, profile_columns
from ncpi_whistler_spark.operators.relational import (
    anti_join,
    semi_join,
    sequential_codes,
    top_k_per_group,
)
from ncpi_whistler_spark.sources.harmony import ConceptMap

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def query(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _dsum(col, scale: str = "DECIMAL(18,2)") -> F.Column:
    """Order-insensitive exact double sum: cast to decimal, sum, back to
    double. Identical bits under any partial-aggregation schedule."""
    return F.sum(F.expr(col).cast(scale)).cast("double")


# =========================================================================
# Relational core (TPC-H-style; exercises scan/filter/agg/join pushdown)
# =========================================================================


@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-class aggregation over the fact table. Catalyst pushes the
    shipdate filter into the parquet scan; map-side partial aggregation
    means the shuffle carries ~|groups| rows per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum("l_extendedprice * (1 - l_discount)", "DECIMAL(24,6)").alias("sum_disc_price"),
            _dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "DECIMAL(24,6)").alias("sum_charge"),
            (_dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_group_nested_orders",
    """
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys_csv
    FROM orders
    GROUP BY o_custkey
    """,
)
def q02_group_nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 group-to-nested-content: orders nested per customer; projected
    back to comparable scalars (size + deterministic key list)."""
    orders = load_table(spark, sf_dir, "orders")
    nested = group_to_nested(orders, "o_custkey", content_name="content")
    return nested.select(
        "o_custkey",
        F.size("content").cast("long").alias("n_orders"),
        F.array_join(
            F.transform(
                F.array_sort(F.transform("content", lambda r: r["o_orderkey"])),
                lambda k: k.cast("string"),
            ),
            ",",
        ).alias("orderkeys_csv"),
    )


@query(
    "q03_embed_customer_orders",
    """
    WITH nested AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name,
           COALESCE(n.n_orders, 0) AS n_orders,
           COALESCE(n.total_spent, 0.0) AS total_spent
    FROM customer c LEFT JOIN nested n ON c.c_custkey = n.o_custkey
    """,
)
def q03_embed_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 embed: child orders nested into customers via broadcast left
    join, then folded back to scalars with a deterministic decimal fold
    over the (sorted) embedded array — all JVM higher-order functions."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice")
    )
    e = embed(customer, orders, "c_custkey", "orders", tag_table_name=False)
    total = F.expr(
        "CAST(aggregate(orders, CAST(0 AS DECIMAL(32,2)), (acc, x) -> "
        "CAST(acc + CAST(x.o_totalprice AS DECIMAL(18,2)) AS DECIMAL(32,2))) AS DOUBLE)"
    )
    return e.select(
        "c_custkey",
        "c_name",
        F.size("orders").cast("long").alias("n_orders"),
        total.alias("total_spent"),
    )


@query(
    "q04_measure_pivot",
    """
    WITH long AS (
      SELECT 'quantity' AS code, l_quantity AS value FROM lineitem
      UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'discount', l_discount FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    )
    SELECT code, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM long GROUP BY code
    """,
)
def q04_measure_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 aggregators: wide measure columns folded to
    ``measures: [{code, value}]`` by plan-time regex classification, then
    exploded long and aggregated — the engine's wide→long pivot."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    )
    agg = aggregate_columns(
        li,
        {"measures": r"^l_(quantity|extendedprice|discount|tax)$"},
        splitter="_",
        drop_missing=False,
    )
    long = explode_aggregated(agg, "measures", keys=["l_orderkey", "l_linenumber"])
    return long.groupBy("code").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


@query(
    "q05_harmonize_returnflag",
    """
    WITH cm(local_code, text, code, display, system) AS (
      VALUES ('A', 'Accepted', 'accepted', 'Accepted return', 'http://example.org/cs/returnflag'),
             ('R', 'Returned', 'returned', 'Returned to supplier', 'http://example.org/cs/returnflag'),
             ('N', 'NoReturn', 'none', 'No return', 'http://example.org/cs/returnflag')
    )
    SELECT cm.code AS harmonized_code, cm.display AS harmonized_display,
           cm.text AS local_text, COUNT(*) AS n
    FROM lineitem JOIN cm ON lineitem.l_returnflag = cm.local_code
    GROUP BY 1, 2, 3
    """,
)
def q05_harmonize_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/H1–H6: broadcast ConceptMap harmonization of a fact column; the
    query extracts first-mapped code/display (H3/H4) and the self display
    (H6) then aggregates. Fact side never shuffles for the lookup."""
    li = load_table(spark, sf_dir, "lineitem")
    cm = ConceptMap.from_rows(
        spark,
        [
            ("A", "Accepted", "l_returnflag", "accepted", "Accepted return", "http://example.org/cs/returnflag"),
            ("R", "Returned", "l_returnflag", "returned", "Returned to supplier", "http://example.org/cs/returnflag"),
            ("N", "NoReturn", "l_returnflag", "none", "No return", "http://example.org/cs/returnflag"),
        ],
    )
    h = harmonize(li, "l_returnflag", "l_returnflag", cm)
    first = H.harmonize_mapped_first("codings")
    return (
        h.select(
            first["code"].alias("harmonized_code"),
            first["display"].alias("harmonized_display"),
            H.harmonized_local_display("codings").alias("local_text"),
        )
        .groupBy("harmonized_code", "harmonized_display", "local_text")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q06_topk_orders_per_customer",
    """
    SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q06_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 top-k per group (window group-limit pushdown keeps k rows per
    partition through the sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    ).select("o_custkey", F.col("rn").cast("long").alias("rn"), "o_orderkey", "o_totalprice")


@query(
    "q07_running_totals",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS order_seq,
           LAG(o_orderkey) OVER w AS prev_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q07_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows (absent in the reference, SURVEY §2.5): running
    decimal-exact spend + lag over a per-customer event order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "q08_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q08_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (the reference's unresolved-reference miss-set shape,
    wstlr/load.py:264-286)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(customer, orders, ["c_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q09_parts_with_lineitems",
    """
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    GROUP BY p_brand
    """,
)
def q09_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join + aggregate."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return (
        semi_join(part, li, ["p_partkey"])
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@query(
    "q10_rollup_returns",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q10_rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (absent in the reference; Catalyst expands to a single
    grouping-sets aggregation, one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("l_extendedprice").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue",
        )
    )


@query(
    "q11_sequential_codes",
    """
    SELECT p_partkey,
           printf('%s%06d', lower(replace(p_brand, '#', '_')),
                  ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey)) AS code
    FROM part
    """,
)
def q11_sequential_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 sequential code generator, distributed-safe (explicit total
    order replaces the reference's mutable counter,
    wstlr/dd/dd_from_fhir.py:17-21)."""
    part = load_table(spark, sf_dir, "part")
    prefix = F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit("_")))
    return sequential_codes(
        part, ["p_brand"], [F.col("p_partkey").asc()], prefix
    ).select("p_partkey", "code")


@query(
    "q12_count_summary",
    """
    SELECT o_orderstatus, o_orderpriority, n, pct FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
             ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct
      FROM orders GROUP BY o_orderstatus, o_orderpriority)
    """,
)
def q12_count_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 module-summary analog: counts + percent-of-total
    (wstlr/module_summary.py:9-41)."""
    orders = load_table(spark, sf_dir, "orders")
    return count_summary(orders, ["o_orderstatus", "o_orderpriority"])


@query(
    "q13_profile_part",
    """
    WITH p AS (SELECT * FROM part)
    SELECT 'p_brand' AS variable, COUNT(*) AS n, COUNT(DISTINCT p_brand) AS n_distinct,
           SUM(CASE WHEN p_brand IS NULL THEN 1 ELSE 0 END) AS n_null,
           MIN(TRY_CAST(p_brand AS DOUBLE)) AS min_num, MAX(TRY_CAST(p_brand AS DOUBLE)) AS max_num
    FROM p
    UNION ALL
    SELECT 'p_retailprice', COUNT(*), COUNT(DISTINCT p_retailprice),
           SUM(CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END),
           MIN(TRY_CAST(p_retailprice AS DOUBLE)), MAX(TRY_CAST(p_retailprice AS DOUBLE))
    FROM p
    UNION ALL
    SELECT 'p_size', COUNT(*), COUNT(DISTINCT p_size),
           SUM(CASE WHEN p_size IS NULL THEN 1 ELSE 0 END),
           MIN(TRY_CAST(p_size AS DOUBLE)), MAX(TRY_CAST(p_size AS DOUBLE))
    FROM p
    """,
)
def q13_profile_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 profiling: per-variable stats with the stringly-typed numeric
    guard (wstlr/dd/dd_from_fhir.py:41-54)."""
    part = load_table(spark, sf_dir, "part")
    return profile_columns(part, ["p_brand", "p_retailprice", "p_size"])


@query(
    "q14_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    """,
)
def q14_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filters reach the scans; the
    customer→orders join broadcasts the filtered customer side."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "DECIMAL(24,6)").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q15_nation_revenue",
    """
    SELECT n_name, r_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
    FROM region, nation, supplier, lineitem
    WHERE r_regionkey = n_regionkey AND n_nationkey = s_nationkey
      AND s_suppkey = l_suppkey
    GROUP BY n_name, r_name
    """,
)
def q15_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join — every dimension broadcast, the fact
    table streams through one stage with zero fact-side shuffle before
    the final aggregation."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(_dsum("l_extendedprice * (1 - l_discount)", "DECIMAL(24,6)").alias("revenue"))
    )


@query(
    "q16_order_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q16_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: filtered EXISTS as a semi join."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        how="left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q17_setops_customers",
    """
    SELECT c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def q17_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (absent in reference): customers active in both
    halves of the order history."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    early = o.where(F.col("o_orderdate") < cut).select(F.col("o_custkey").alias("c_custkey"))
    late = o.where(F.col("o_orderdate") >= cut).select(F.col("o_custkey").alias("c_custkey"))
    return early.intersect(late)


@query(
    "q18_events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q18_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over the event stream table — the
    batch twin of the streaming path (streaming/windows.py uses the same
    F.window grouping with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("value").alias("sum_value"),
        )
    )


@query(
    "q19_sessionize",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q19_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative sum —
    the batch twin of session_window streaming. Single shuffle on
    user_id shared by both windows and the final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(w2))
    return sessions.groupBy("user_id").agg(
        F.count_distinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def names() -> list[str]:
    return list(REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}
