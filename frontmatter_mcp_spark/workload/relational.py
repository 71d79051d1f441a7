"""Relational SQL surface — SURVEY.md §2.B coverage over the sf tables.

The reference delegates this entire surface to DuckDB (ADR-0003 promises
"WHERE, GROUP BY, JOIN, etc."); our engine delegates it to Spark SQL /
Catalyst. Each query here pins one category of that contract (filters,
aggregates, joins of every flavor, windows, set ops, rollup/cube, pivots,
subqueries, as-of joins, sessionization) and carries a DuckDB oracle.

Scale notes: dimension tables (region/nation/supplier/part/customer at
these SFs) are explicitly broadcast; fact-fact joins shuffle on their
keys and rely on AQE for skew; aggregations are expressed so Catalyst
plans partial (map-side) aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from frontmatter_mcp_spark.tables import load_table
from frontmatter_mcp_spark.workload.registry import register


def _dsum(col: Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM of a double column: cast each value to DECIMAL,
    sum exactly, return DOUBLE. Bit-identical across engines/parallelism."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def _fmt(col: Column | str) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


# ---------------------------------------------------------------------------
# q01 — TPC-H Q1 pricing summary: wide aggregate, partial+final hash agg
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 flavor: groupBy 2 keys, 7 aggregates over ~600k rows at sf0.1",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price", scale=6),
            _dsum(charge, "sum_charge", scale=6),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — ORDER BY ... LIMIT (top-k -> TakeOrderedAndProject, no full sort)
# ---------------------------------------------------------------------------
@register(
    "q02_top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="global top-k: Spark plans TakeOrderedAndProject (no full shuffle sort)",
)
def q02_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            _fmt("o_orderdate").alias("order_date"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q03 — TPC-H Q3 shipping priority: fact-fact join + agg + top-k
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q3 flavor: selective dim filter, two joins, agg, top-k",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    # customer is the small side at any SF (150 rows per 6k lineitem) -> broadcast;
    # orders|x|lineitem is the fact-fact join and shuffles on the order key.
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        joined.groupBy(
            "l_orderkey",
            _fmt("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=6))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q04 — EXISTS subquery (left-semi join) + count by group
# ---------------------------------------------------------------------------
@register(
    "q04_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
    doc="EXISTS -> left-semi join, then hash agg (TPC-H Q4 flavor)",
)
def q04_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q05 — snowflake join chain with broadcast dims (TPC-H Q5 flavor)
# ---------------------------------------------------------------------------
@register(
    "q05_region_revenue",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="snowflake chain region->nation->customer->orders->lineitem, broadcast dims",
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", scale=6),
            F.count("*").alias("n_lineitems"),
        )
    )


# ---------------------------------------------------------------------------
# q06 — TPC-H Q6: pure scan + filter + single agg (pushdown showcase)
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: filters push to parquet scan, single global aggregate",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", scale=6),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — ranking window: top-3 orders per customer
# ---------------------------------------------------------------------------
@register(
    "q07_top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
    doc="per-group top-k via row_number window (single shuffle on the partition key)",
)
def q07_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# q08 — analytic windows: running sum + lag per customer
# ---------------------------------------------------------------------------
@register(
    "q08_running_totals",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    """,
    doc="running aggregate frame + lag over one window shuffle",
)
def q08_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        _fmt("o_orderdate").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


# ---------------------------------------------------------------------------
# q09 — set operations: INTERSECT and EXCEPT
# ---------------------------------------------------------------------------
@register(
    "q09_customer_setops",
    """
    WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
         y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
    SELECT o_custkey, 'both' AS cohort FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT o_custkey, 'only_1995' AS cohort FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    """,
    doc="INTERSECT / EXCEPT / UNION ALL cohorts",
)
def q09_customer_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def year_custs(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp_ntz"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year_custs(1995), year_custs(1996)
    both = y95.intersect(y96).withColumn("cohort", F.lit("both"))
    only95 = y95.exceptAll(y96).distinct().withColumn("cohort", F.lit("only_1995"))
    return both.unionAll(only95)


# ---------------------------------------------------------------------------
# q10 — ROLLUP hierarchy totals
# ---------------------------------------------------------------------------
@register(
    "q10_rollup_quantity",
    """
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="GROUP BY ROLLUP: subtotal + grand-total rows",
)
def q10_rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"), F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# q11 — COUNT(DISTINCT) per group (expand + two-phase agg in Spark)
# ---------------------------------------------------------------------------
@register(
    "q11_distinct_parts",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="multi COUNT(DISTINCT): Catalyst expands to partial distinct aggs",
)
def q11_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q12 — scalar string functions (all codegen'd, no UDF)
# ---------------------------------------------------------------------------
@register(
    "q12_part_strings",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_type) AS type_upper,
           substr(p_name, 1, 5) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_num,
           replace(p_name, ' ', '_') AS name_snake,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    WHERE p_name LIKE '%o%'
    """,
    doc="string scalar surface: lower/upper/substr/length/regexp_extract/replace/concat/LIKE",
)
def q12_part_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%o%")).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


# ---------------------------------------------------------------------------
# q13 — date functions + monthly aggregation
# ---------------------------------------------------------------------------
@register(
    "q13_monthly_orders",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monthly_total
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY 1, 2
    """,
    doc="temporal bucketing: year/month extraction + agg",
)
def q13_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") != "P")
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(F.col("o_totalprice"), "monthly_total"),
        )
    )


# ---------------------------------------------------------------------------
# q14 — JSON extraction + TRY_CAST over events.props
# ---------------------------------------------------------------------------
@register(
    "q14_json_events",
    """
    SELECT CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS INT) / 10.0) AS INT) AS k_bucket,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="semi-structured: JSON path extraction + TRY_CAST (B10/B13 flavor)",
)
def q14_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return (
        e.withColumn("k_int", k)
        .filter(F.col("k_int").isNotNull())
        .groupBy(
            # floor() on both sides: DuckDB CAST(double AS INT) rounds,
            # Spark truncates — floor first makes them agree
            F.floor(F.col("k_int") / 10).cast("int").alias("k_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            _dsum(F.col("value"), "total_value", scale=6),
        )
    )


# ---------------------------------------------------------------------------
# q15 — explode/UNNEST path: word frequencies over documents
# ---------------------------------------------------------------------------
@register(
    "q15_word_counts",
    """
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
    doc="UNNEST/explode surface (B11): split -> explode -> agg -> top-k",
)
def q15_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ", -1)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q16 — correlated scalar subquery: orders well above customer average
# ---------------------------------------------------------------------------
@register(
    "q16_above_avg_orders",
    """
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc="correlated scalar subquery -> Catalyst decorrelates to join+agg",
)
def q16_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double") / F.count("*")).alias(
            "avg_price"
        )
    )
    return (
        o.join(avg.withColumnRenamed("o_custkey", "ck"), o.o_custkey == F.col("ck"))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey")
    )


# ---------------------------------------------------------------------------
# q17 — anti join: customers with no orders in a window
# ---------------------------------------------------------------------------
@register(
    "q17_inactive_customers",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    )
    """,
    doc="NOT EXISTS -> left-anti join",
)
def q17_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# q18 — as-of join: last click at-or-before each purchase, per user.
# Spark has no ASOF JOIN; the scalable pattern is union + ordered window
# (one shuffle on user_id, no per-key loop). Oracle uses DuckDB's native
# ASOF LEFT JOIN — two genuinely different engines, same semantics.
# ---------------------------------------------------------------------------
@register(
    "q18_asof_click_purchase",
    """
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="as-of join via union+window in Spark vs native ASOF JOIN in DuckDB",
)
def q18_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    tagged = e.select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # clicks sort before purchases at equal ts (is_purchase asc) so an
    # equal-timestamp click is visible to the purchase (ASOF >= semantics)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", fmt).alias("purchase_ts"),
            F.date_format("last_click_ts", fmt).alias("last_click_ts"),
        )
    )


# ---------------------------------------------------------------------------
# q19 — sessionization (batch): 30-minute inactivity gap per user
# ---------------------------------------------------------------------------
@register(
    "q19_sessionization",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id,
             SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start
    FROM s GROUP BY user_id, session_id
    """,
    doc="sessionization via lag + gap + running sum (two windows, one shuffle)",
)
def q19_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    sessions = (
        e.withColumn(
            "is_new_session",
            F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    return sessions.groupBy("user_id", F.col("session_id").cast("int").alias("session_id")).agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
    )


# ---------------------------------------------------------------------------
# q20 — pivot: event_type counts per user bucket
# ---------------------------------------------------------------------------
@register(
    "q20_event_pivot",
    """
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY 1
    """,
    doc="pivot wide: groupBy().pivot() in Spark, FILTER aggregates in the oracle",
)
def q20_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", kinds)
        .count()
    )
    return pivoted.select(
        "user_bucket",
        *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds],
    )


# ---------------------------------------------------------------------------
# q21 — CUBE over two dimensions
# ---------------------------------------------------------------------------
@register(
    "q21_cube_events",
    """
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(CAST(FLOOR(hour(ts) / 6.0) AS INT), -1) AS day_quarter,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(FLOOR(hour(ts) / 6.0) AS INT))
    """,
    doc="GROUP BY CUBE: all grouping-set combinations",
)
def q21_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    quarter = F.floor(F.hour("ts") / 6).cast("int")
    return (
        e.withColumn("dq", quarter)
        .cube("event_type", "dq")
        .agg(F.count("*").alias("n"), _dsum(F.col("value"), "total_value", scale=6))
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("dq", F.lit(-1)).alias("day_quarter"),
            "n",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q23 — GROUPING SETS (explicit set list, distinct from rollup/cube)
# ---------------------------------------------------------------------------
@register(
    "q23_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, '<any>') AS returnflag,
           COALESCE(l_linestatus, '<any>') AS linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUP BY GROUPING SETS with an explicit set list",
)
def q23_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q23")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<any>') AS returnflag,
               COALESCE(l_linestatus, '<any>') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_q23
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# q24 — exact interpolated percentiles per group
# ---------------------------------------------------------------------------
@register(
    "q24_quantity_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact continuous percentiles (Spark percentile == DuckDB quantile_cont; "
    "quartile fractions are exact binary so interpolation matches bit-for-bit)",
)
def q24_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# q25 — date arithmetic surface
# ---------------------------------------------------------------------------
@register(
    "q25_date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_1995,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS order_week,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow  -- DuckDB: Sunday=0; Spark: Sunday=1
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    doc="temporal scalar surface: datediff/date_trunc/last_day/interval add/dayofweek",
)
def q25_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_1995"),
        _fmt(F.date_trunc("week", "o_orderdate")).alias("order_week"),
        _fmt(F.last_day(F.col("o_orderdate").cast("date"))).alias("month_end"),
        _fmt(F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
    )


# ---------------------------------------------------------------------------
# q28 — HAVING against a scalar subquery (TPC-H Q11 flavor)
# ---------------------------------------------------------------------------
@register(
    "q28_having_subquery",
    """
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
           (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.002 FROM lineitem)
    """,
    doc="HAVING filtered by a scalar subquery over the same fact table "
    "(two aggregations, the global one broadcast as a literal)",
)
def q28_having_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q28")
    return spark.sql(
        """
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        FROM lineitem_q28
        GROUP BY l_partkey
        HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
               (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.002 FROM lineitem_q28)
        """
    )


# ---------------------------------------------------------------------------
# q29 — groupwise minimum via join-back (TPC-H Q2 flavor)
# ---------------------------------------------------------------------------
@register(
    "q29_cheapest_part_per_brand",
    """
    SELECT p.p_brand, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    JOIN (SELECT p_brand, MIN(p_retailprice) AS min_price FROM part GROUP BY p_brand) m
      ON p.p_brand = m.p_brand AND p.p_retailprice = m.min_price
    """,
    doc="groupwise-min join-back (correlated-min pattern, TPC-H Q2 flavor)",
)
def q29_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    m = p.groupBy(F.col("p_brand").alias("mb")).agg(F.min("p_retailprice").alias("min_price"))
    return p.join(
        F.broadcast(m),
        (p.p_brand == F.col("mb")) & (p.p_retailprice == F.col("min_price")),
    ).select("p_brand", "p_partkey", "p_name", "p_retailprice")


# ---------------------------------------------------------------------------
# q26 — CDC/MERGE emulation: SCD1 upsert of latest-order facts into a dim
# ---------------------------------------------------------------------------
@register(
    "q26_cdc_upsert",
    """
    WITH changes AS (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           ch.o_orderkey AS last_orderkey,
           ch.o_totalprice AS last_totalprice,
           strftime(ch.o_orderdate, '%Y-%m-%d') AS last_orderdate
    FROM customer c
    LEFT JOIN (SELECT * FROM changes WHERE rn = 1) ch
      ON ch.o_custkey = c.c_custkey
    """,
    doc="MERGE-style SCD1 upsert emulated with dedup-latest + outer join "
    "(the Delta-less CDC pattern: anti-join + union == left join here)",
)
def q26_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    latest = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
            _fmt("o_orderdate").alias("last_orderdate"),
        )
    )
    return c.join(latest, c.c_custkey == latest.o_custkey, "left").select(
        "c_custkey", "c_name", "c_mktsegment", "last_orderkey", "last_totalprice", "last_orderdate"
    )


# ---------------------------------------------------------------------------
# q27 — approximate aggregates under a bounded-error oracle. Sketch values
# differ per engine by design, so they cannot hash-match a DuckDB run —
# instead the EXACT counterparts (row count, COUNT(DISTINCT)) are emitted
# and cross-checked, and the sketches are asserted against their published
# error bounds as booleans: HLL within 5x the requested rsd, approx median
# inside the exact [0.49, 0.51] rank window (100x the 1/accuracy rank
# guarantee). Both engines agree on the exact columns; the booleans are
# TRUE on the oracle side and computed on the Spark side, so a sketch
# drifting out of bound hash-mismatches and turns the row red.
# ---------------------------------------------------------------------------
_HLL_RSD = 0.02


@register(
    "q27_approx_stats",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_partkey) AS n_distinct_parts,
           TRUE AS hll_within_5rsd,
           TRUE AS median_within_rank_window
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HLL) + percentile_approx: the constant-memory "
    "sketch path for 100 TB cardinality/quantile estimation — verified by a "
    "bounded-error oracle (exact values hash-checked cross-engine, sketches "
    "asserted within their published error bounds as booleans)",
)
def q27_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The median check counts the approx value's actual rank (one extra
    # scan against a 6-row broadcast) instead of computing exact
    # per-group percentiles — a full sort per group that measured ~6x
    # the cost of the rest of the query at sf0.1. Rank-counting is pure
    # codegen and scales as a map + partial count at any corpus size.
    l = load_table(spark, sf_dir, "lineitem")
    # NOT pinned: a review suggested the rank branch's pruned copy of g
    # defeats exchange reuse, but measurement says otherwise — pinning
    # measured 6.8s vs 1.6s unpinned at sf0.1 (the persist adds a
    # materialization barrier where the unpinned plan overlaps both
    # consumers' stages). Measured evidence beats plan-shape intuition.
    g = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_partkey").alias("n_distinct_parts"),
        F.approx_count_distinct("l_partkey", rsd=_HLL_RSD).alias("__approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("__approx_median"),
    )
    rank = (
        l.join(
            F.broadcast(g.select("l_returnflag", "__approx_median")), "l_returnflag"
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") <= F.col("__approx_median")).cast("long")
            ).alias("__rank_of_median")
        )
    )
    within_rsd = (
        F.abs(F.col("__approx_parts") - F.col("n_distinct_parts"))
        <= F.lit(5 * _HLL_RSD) * F.col("n_distinct_parts")
    )
    rank_frac = F.col("__rank_of_median") / F.col("n_rows")
    within_rank = rank_frac.between(F.lit(0.49), F.lit(0.51))
    return g.join(F.broadcast(rank), "l_returnflag").select(
        "l_returnflag",
        "n_rows",
        "n_distinct_parts",
        within_rsd.alias("hll_within_5rsd"),
        within_rank.alias("median_within_rank_window"),
    )


# ---------------------------------------------------------------------------
# q46 — ordered group concatenation (string_agg / listagg family)
# ---------------------------------------------------------------------------
@register(
    "q46_group_concat",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
    doc="group concatenation with a deterministic (sorted-distinct) order",
)
def q46_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# q47 — correlated EXISTS with an aggregate inside (TPC-H Q21 flavor)
# ---------------------------------------------------------------------------
@register(
    "q47_exists_with_agg",
    """
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_big_items
    FROM supplier s
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    WHERE l.l_quantity > 40
      AND EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'
      )
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="join + correlated EXISTS (left-semi) + aggregate (TPC-H Q21 flavor)",
)
def q47_exists_with_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        l.join(o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_big_items"))
    )


# ---------------------------------------------------------------------------
# q22 — full outer join with null-handling
# ---------------------------------------------------------------------------
@register(
    "q22_supplier_customer_nations",
    """
    WITH sn AS (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1),
         cn AS (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1)
    SELECT COALESCE(sn.s_nationkey, cn.c_nationkey) AS nationkey,
           COALESCE(sn.n_suppliers, 0) AS n_suppliers,
           COALESCE(cn.n_customers, 0) AS n_customers
    FROM sn FULL OUTER JOIN cn ON sn.s_nationkey = cn.c_nationkey
    """,
    doc="FULL OUTER join of two pre-aggregates",
)
def q22_supplier_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers")
    )
    c = load_table(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers")
    )
    return (
        s.join(c, s.s_nationkey == c.c_nationkey, "full_outer")
        .select(
            F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# q65 — TPC-H Q7 flavor: volume shipping between nation pairs
# ---------------------------------------------------------------------------
@register(
    "q65_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 flavor: 6-way join (2 fact, 4 broadcast dims), revenue "
    "between distinct nation pairs per ship year",
)
def q65_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_dsum(vol, "revenue", 6))
    )


# ---------------------------------------------------------------------------
# q66 — TPC-H Q8 flavor: national market share inside one region
# ---------------------------------------------------------------------------
@register(
    "q66_market_share",
    """
    SELECT l_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_dec ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(vol_dec) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS l_year,
             n1.n_name AS supp_nation,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS vol_dec
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    GROUP BY 1
    """,
    doc="TPC-H Q8 flavor: one nation's share of a region's revenue per "
    "year - conditional decimal sums, one exact division at the end",
)
def q66_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    vol_dec = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    base = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("c_rk") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("l_year"),
            F.col("supp_nation"),
            vol_dec.alias("vol_dec"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return base.groupBy("l_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol_dec")).otherwise(zero)).cast("double")
            / F.sum("vol_dec").cast("double")
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q67 — TPC-H Q15 flavor: top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------
@register(
    "q67_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 flavor: CTE revenue view + scalar-subquery max filter "
    "(Catalyst plans the scalar as a broadcast exchange, no second scan "
    "thanks to exchange reuse)",
)
def q67_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(_dsum(vol, "total_revenue", 6))
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    return (
        F.broadcast(s)
        .join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(top), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q68 — TPC-H Q20 flavor: IN-subquery with HAVING (semi join on an agg)
# ---------------------------------------------------------------------------
@register(
    "q68_bulk_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'STANDARD'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > CAST(2900 AS DECIMAL(18,2))
    )
    """,
    doc="TPC-H Q20 flavor: IN over an aggregated subquery -> left-semi "
    "join against the HAVING'd aggregate",
)
def q68_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    heavy = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty") > F.lit(2900).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    return s.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# q69 — TPC-H Q22 flavor: rich customers with no orders, by nation
# ---------------------------------------------------------------------------
@register(
    "q69_rich_inactive_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    doc="TPC-H Q22 flavor: scalar-subquery threshold + NOT EXISTS anti "
    "join, grouped by nation",
)
def q69_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("a")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q72 — gap-filled hourly resample (time-series spine + zero fill)
# ---------------------------------------------------------------------------
@register(
    "q72_gapfill_hourly",
    """
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM bounds
    ),
    hourly AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1
    )
    SELECT strftime(s.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(h.n, 0) AS n,
           COALESCE(h.total_value, 0.0) AS total_value
    FROM spine s LEFT JOIN hourly h ON h.hour = s.hour
    """,
    doc="hypertable-style gap-filled resample: generated hourly spine "
    "LEFT JOIN the bucketed aggregate, empty buckets zero-filled - the "
    "spine is sequence()-exploded from one aggregated row, never "
    "driver-materialized",
)
def q72_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n"),
        _dsum(F.col("value"), "total_value", 6),
    )
    return (
        spine.join(hourly, "hour", "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q89 — event-rate spike detection (trailing-window z-score)
# ---------------------------------------------------------------------------
# mean/variance from exact BIGINT window sums (s, ss) with an identical
# double-arithmetic sequence on both engines: mean = s/c, var = ss/c -
# mean*mean, z = (n - mean)/sqrt(var) — every intermediate is the same
# IEEE op on the same bits, so even the var > 0 guard agrees
_SPIKE_MIN_HISTORY = 12
_SPIKE_Z = 2.0


@register(
    "q89_event_spikes",
    f"""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    win AS (
      SELECT event_type, hour, n,
             COUNT(n) OVER tw AS c, SUM(n) OVER tw AS s, SUM(n * n) OVER tw AS ss
      FROM hourly
      WINDOW tw AS (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type, hour, n, c,
             CAST(ss AS DOUBLE) / CAST(c AS DOUBLE)
               - (CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) AS var,
             (CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(c AS DOUBLE))
               / sqrt(CAST(ss AS DOUBLE) / CAST(c AS DOUBLE)
                      - (CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(c AS DOUBLE))) AS z
      FROM win WHERE c >= {_SPIKE_MIN_HISTORY}
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, n, round(z, 6) AS z
    FROM scored WHERE var > 0 AND z >= {_SPIKE_Z}
    """,
    doc="rate-spike monitor: hourly counts per event type scored against a "
    "trailing 24h window z-score (exact integer window sums; one shuffle "
    "shared by the aggregate and the window) — flags hours whose volume "
    "sits >= 2 sigma above trailing behavior",
)
def q89_event_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    tw = W.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    c = F.count("n").over(tw)
    s = F.sum("n").over(tw)
    ss = F.sum(F.col("n") * F.col("n")).over(tw)
    mean = s.cast("double") / c.cast("double")
    var = ss.cast("double") / c.cast("double") - mean * mean
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        hourly.select(
            "event_type",
            "hour",
            "n",
            c.alias("c"),
            var.alias("var"),
            z.alias("z"),
        )
        .filter((F.col("c") >= _SPIKE_MIN_HISTORY) & (F.col("var") > 0) & (F.col("z") >= _SPIKE_Z))
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n",
            F.round("z", 6).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# q73 — day-cohort retention matrix (distinct users per cohort x offset)
# ---------------------------------------------------------------------------
@register(
    "q73_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
      FROM events GROUP BY 1
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(datediff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS INT) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
    doc="retention cohorts: users bucketed by first-seen day, distinct "
    "active users per (cohort, day offset); the firsts aggregate "
    "shuffles once on user_id and joins back on the same key",
)
def q73_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    return (
        e.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# q74 — ordered funnel: signup -> first click after -> first purchase after
# ---------------------------------------------------------------------------
@register(
    "q74_event_funnel",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS click_ts
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS purchase_ts
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after
    """,
    doc="ordered funnel in ONE pass: partition events by user, running "
    "MIN(signup ts) then running MIN(qualifying click ts) over the same "
    "(user, ts RANGE) window — a click/purchase at time t qualifies iff "
    "t > the stage-(k-1) running min, which equals the per-user GLOBAL "
    "stage min whenever that min is <= t (and is NULL/irrelevant "
    "otherwise), so the per-row test reproduces the oracle's "
    "join-on-global-min semantics exactly. One exchange of the three "
    "relevant event types replaces the r08 shape's three events scans "
    "plus two join shuffles (BENCH_r08's one >2x flag); the follow-up "
    "groupBy(user_id) reuses the window's partitioning (no shuffle) and "
    "per-row state is O(1) running mins — scale-safe at 100 TB",
)
def q74_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    # RANGE frame (default for an ordered window aggregate) includes ties
    # at the current ts; the strict > below then rejects same-instant
    # stage transitions, matching the oracle's e.ts > s.signup_ts.
    w = Window.partitionBy("user_id").orderBy("ts")
    signup_min = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    staged = e.withColumn(
        "click_q_ts",
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > signup_min),
            F.col("ts"),
        ),
    )
    click_min = F.min("click_q_ts").over(w)
    staged = staged.withColumn(
        "purchase_q",
        (F.col("event_type") == "purchase") & (F.col("ts") > click_min),
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("event_type") == "signup").alias("has_signup"),
        F.max(F.col("click_q_ts").isNotNull()).alias("has_click"),
        F.max("purchase_q").alias("has_purchase"),
    )
    return per_user.agg(
        F.count_if("has_signup").alias("n_signup"),
        F.count_if("has_click").alias("n_click_after"),
        F.count_if("has_purchase").alias("n_purchase_after"),
    )


# ---------------------------------------------------------------------------
# q78 — two-phase salted aggregation over skewed keys
# ---------------------------------------------------------------------------
@register(
    "q78_salted_aggregation",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           MIN(event_id) AS first_id,
           MAX(event_id) AS last_id
    FROM events GROUP BY 1
    """,
    doc="skew pattern: 5 hot keys aggregated via an explicit salt "
    "(hash(event_id) % 8) -> partial per (key, salt) -> final per key; "
    "the result is salt-invariant (decimal sums are order-free), which "
    "is exactly why the oracle can be the plain GROUP BY",
)
def q78_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from frontmatter_mcp_spark.operators.sampling import hash_bucket

    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("_salt", hash_bucket(F.col("event_id"), 8))
        .groupBy("event_type", "_salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
            F.min("event_id").alias("pmin"),
            F.max("event_id").alias("pmax"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
        F.min("pmin").alias("first_id"),
        F.max("pmax").alias("last_id"),
    )


# ---------------------------------------------------------------------------
# q312 — TPC-H Q9 flavor (product-type profit by nation and year):
# the fixture has no partsupp, so unit cost is proxied by
# 0.8 * p_retailprice — the SHAPE is Q9's: a part-name filter fanned
# through lineitem, joined to supplier -> nation, profit aggregated
# per (nation, year). Money stays DECIMAL end to end.
# ---------------------------------------------------------------------------
@register(
    "q312_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                    - CAST(p.p_retailprice AS DECIMAL(18,4))
                      * CAST(0.8 AS DECIMAL(8,4))
                      * CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%green%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 flavor: profit on 'green' parts per supplier nation "
    "and ship year — part-name filter pushed to the part scan, part/"
    "supplier/nation all broadcastable dims around the lineitem fact, "
    "money arithmetic fully DECIMAL (exact, order-free) with one "
    "final double cast; unit cost proxied at 0.8*retailprice since "
    "the fixture carries no partsupp (stated). The many-dim star "
    "shape Q3/Q5 (q03/q05) don't exercise with an expression filter",
)
def q312_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%green%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (1 - F.col("l_discount").cast("decimal(18,4)"))
        - F.col("p_retailprice").cast("decimal(18,4)")
        * F.lit(0.8).cast("decimal(8,4)")
        * F.col("l_quantity").cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q313 — TPC-H Q11 flavor (important stock): part types whose total
# lineitem value exceeds a fixed fraction of the GLOBAL total — the
# group-vs-global-threshold shape (a correlated HAVING against a
# one-row aggregate) that Q11 exercises and no other flavor here does.
# ---------------------------------------------------------------------------
@register(
    "q313_important_part_types",
    """
    WITH v AS (
      SELECT p.p_type,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(28,4))
               AS value
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(value) AS DECIMAL(28,4)) AS total FROM v)
    SELECT v.p_type, CAST(v.value AS DOUBLE) AS value,
           ROUND(CAST(v.value AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
             AS share
    FROM v CROSS JOIN t
    WHERE v.value * 50 > t.total
    ORDER BY v.value DESC, v.p_type
    """,
    doc="TPC-H Q11 flavor: part types holding more than 1/50 of total "
    "lineitem value — per-type DECIMAL-exact value sums filtered "
    "against a one-row broadcast global total via the exact integer-"
    "scaled comparison value*50 > total (no float threshold). The "
    "group-vs-global-threshold shape; one fact scan + broadcast dim + "
    "one-row crossjoin",
)
def q313_important_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    v = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_type")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("decimal(28,4)")
            .alias("value")
        )
    )
    t = v.agg(F.sum("value").cast("decimal(28,4)").alias("total"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("value") * 50 > F.col("total"))
        .select(
            "p_type",
            F.col("value").cast("double").alias("value"),
            F.round(
                F.col("value").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.col("value").desc(), "p_type")
    )


# ---------------------------------------------------------------------------
# q330 — TPC-H Q10 flavor (returned-item reporting): revenue lost to
# returns per customer, the fact-fact-dim join with a selective fact
# filter + top-k that Q3 (q03) runs without the returns dimension.
# ---------------------------------------------------------------------------
@register(
    "q330_returned_item_revenue",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 flavor: top-20 customers by revenue on RETURNED "
    "items (l_returnflag = 'R' pushed to the lineitem scan), "
    "customer/nation broadcast around the orders-lineitem fact join, "
    "DECIMAL-exact money, TakeOrderedAndProject top-k under the "
    "(revenue desc, custkey) total order",
)
def q330_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q331 — TPC-H Q12 flavor (shipping-latency priority audit): the
# fixture has no l_shipmode, so the Q12 GROUP key is the ship LATENCY
# band (days from order to ship, 30-day buckets) — counting urgent
# vs non-urgent orders per band, Q12's exact CASE-count shape.
# ---------------------------------------------------------------------------
@register(
    "q331_ship_latency_priority",
    """
    SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) // 30 AS INT)
             AS latency_band,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q12 flavor: urgent-vs-other order counts per 30-day "
    "ship-latency band (the fixture carries no shipmode; the latency "
    "bucket is the operationally equivalent key — is the priority "
    "class actually shipped faster?). Integer floor-division banding, "
    "CASE-sum counts, one fact-fact join",
)
def q331_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(
            F.expr("datediff(day, o_orderdate, l_shipdate) div 30")
            .cast("int")
            .alias("latency_band")
        )
        .agg(
            F.sum(hi.cast("int")).cast("long").alias("high_line_count"),
            F.sum((~hi).cast("int")).cast("long").alias("low_line_count"),
        )
        .orderBy("latency_band")
    )


# ---------------------------------------------------------------------------
# q332 — TPC-H Q13 flavor (customer order-count distribution): how
# many customers placed 0, 1, 2, ... orders — the LEFT join + double
# aggregation whose zero bucket every inner-join formulation silently
# drops.
# ---------------------------------------------------------------------------
@register(
    "q332_customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 flavor: the customer order-count histogram via LEFT "
    "join + COUNT(orderkey) (zero-order customers kept — the bucket "
    "an inner join silently drops) + a second aggregation over the "
    "counts. Two shuffles, both partial-agg friendly",
)
def q332_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# q333 — TPC-H Q14 flavor (promo revenue share): the CASE-sum-over-sum
# percentage per ship month — promo part types' share of revenue,
# DECIMAL-exact on both legs of the ratio.
# ---------------------------------------------------------------------------
@register(
    "q333_promo_revenue_share",
    """
    SELECT strftime(time_bucket(INTERVAL '1 month', l.l_shipdate), '%Y-%m')
             AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS promo_revenue,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS total_revenue,
           ROUND(100e0 *
             CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                    AS DOUBLE), 6) AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    ORDER BY 1
    """,
    doc="TPC-H Q14 flavor: promo part types' revenue share per ship "
    "month — the conditional-sum-over-sum percentage with BOTH legs "
    "DECIMAL-exact before the one double division; part is a "
    "broadcast dim on the lineitem fact",
)
def q333_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "ship_month"
            )
        )
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            F.round(
                100.0 * F.col("promo_revenue") / F.col("total_revenue"), 6
            ).alias("promo_pct"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# q334 — TPC-H Q16 flavor (supplier diversity per part class): the
# fixture has no partsupp, so the part-supplier relation is DERIVED
# from lineitem (who actually shipped the part) — distinct supplier
# counts per (brand, type, size band), one brand excluded, Q16's
# COUNT(DISTINCT) + NOT-filter shape.
# ---------------------------------------------------------------------------
@register(
    "q334_supplier_part_diversity",
    """
    SELECT p.p_brand, p.p_type,
           CAST((p.p_size - 1) // 10 AS INT) AS size_band,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, size_band
    """,
    doc="TPC-H Q16 flavor: distinct suppliers per (brand, type, "
    "size-decade band) with one brand excluded — the part-supplier "
    "relation derived from lineitem since the fixture has no partsupp "
    "(stated). COUNT(DISTINCT) expands to the two-phase distinct "
    "aggregate; the brand filter pushes to the broadcast part dim",
)
def q334_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#45")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(
            "p_brand",
            "p_type",
            F.expr("(p_size - 1) div 10").cast("int").alias("size_band"),
        )
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "size_band"
        )
    )


# ---------------------------------------------------------------------------
# q335 — TPC-H Q17 flavor (small-quantity revenue): revenue locked in
# orders below 20% of a part's average order quantity — the
# correlated-average filter, exact via the integer cross-
# multiplication qty * 5 * n_part < sum_qty_part (quantities are
# integral; no float average ever exists).
# ---------------------------------------------------------------------------
@register(
    "q335_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7
             AS avg_yearly
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * pq.n < pq.sq
    """,
    doc="TPC-H Q17 flavor: revenue in lineitems below 20% of their "
    "part's average order quantity, divided by 7 (the Q17 'yearly "
    "loss' convention) — the correlated average becomes the exact "
    "integer cross-multiplication qty*5*n < sum_qty (fixture "
    "quantities are integral), so no float average exists; the "
    "per-part stats join back on the part key (partial-agg + one "
    "shuffle)",
)
def q335_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    pq = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sq"),
        F.count("*").cast("long").alias("n"),
    )
    l2 = l.select(
        F.col("l_partkey").alias("pk"), "l_quantity", "l_extendedprice"
    )
    return (
        l2.join(pq, l2["pk"] == pq["l_partkey"])
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("n") < F.col("sq")
        )
        .agg(
            F.count("*").cast("long").alias("n_small_lines"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                    "double"
                )
                / 7
            ).alias("avg_yearly"),
        )
    )


# ---------------------------------------------------------------------------
# q336 — TPC-H Q18 flavor (large-volume orders): customers whose
# orders aggregate more than 250 quantity units — the HAVING-driven
# semi-join into a second aggregate.
# ---------------------------------------------------------------------------
@register(
    "q336_large_volume_orders",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           b.qty AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 flavor: top-20 large-volume orders (order quantity "
    "sum > 250 via HAVING on the exact integer sum), joined back "
    "through orders to customers — the aggregate-then-semi-join shape "
    "with a TakeOrderedAndProject top-k under (totalprice desc, "
    "orderkey)",
)
def q336_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
        .filter(F.col("qty") > 250)
    )
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("qty").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q337 — TPC-H Q19 flavor (disjunctive predicate revenue): revenue
# under an OR of three (brand-class, quantity-range, size-range)
# conjunctions — the predicate shape that exercises CNF conversion /
# partial pushdown in the optimizer.
# ---------------------------------------------------------------------------
@register(
    "q337_disjunctive_revenue",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand LIKE 'Brand#1%' AND l.l_quantity <= 15
           AND p.p_size <= 10)
       OR (p.p_brand LIKE 'Brand#2%' AND l.l_quantity BETWEEN 10 AND 25
           AND p.p_size <= 20)
       OR (p.p_brand LIKE 'Brand#3%' AND l.l_quantity >= 25
           AND p.p_size <= 30)
    """,
    doc="TPC-H Q19 flavor: revenue under a disjunction of three "
    "(brand-class, quantity-range, size-range) conjunctions — the OR-"
    "of-ANDs predicate that exercises CNF conversion and partial "
    "pushdown (the size/brand legs can reach the part scan, the "
    "quantity legs the lineitem scan). DECIMAL-exact money, one "
    "broadcast join",
)
def q337_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            F.col("p_brand").like("Brand#1%")
            & (F.col("l_quantity") <= 15)
            & (F.col("p_size") <= 10)
        )
        | (
            F.col("p_brand").like("Brand#2%")
            & F.col("l_quantity").between(10, 25)
            & (F.col("p_size") <= 20)
        )
        | (
            F.col("p_brand").like("Brand#3%")
            & (F.col("l_quantity") >= 25)
            & (F.col("p_size") <= 30)
        )
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        1 - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )
