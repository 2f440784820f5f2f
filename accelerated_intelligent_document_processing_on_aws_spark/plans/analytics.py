"""Analytics SQL surface (SURVEY.md §2.E): the query shapes the
reference's analytics agent issues over its reporting tables
(``lib/idp_common_pkg/idp_common/agents/analytics/agent.py:90-246``,
``docs/reporting-database.md:260-380``), restated over the fixture
star schema, each with a DuckDB oracle twin.

Cross-engine parity rules used throughout this module:
- every aggregate is ROUNDED (sum→2..4 dp, avg/ratio→4 dp) so
  accumulation-order float noise can't flip the value hash;
- integer outputs are cast to BIGINT on both sides;
- dates are emitted as 'yyyy-MM-dd' strings on both sides;
- top-k always carries a deterministic tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table as _t

# each entry: name -> (spark_callable, duckdb_sql | None)
ENTRIES: dict = {}


def q(name: str, sql: str | None):
    def deco(fn):
        ENTRIES[name] = (fn, sql)
        return fn

    return deco


# -- TPC-H Q1 shape: the canonical wide aggregate ---------------------------
@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# -- count distinct + partition filter (agent.py:230-232) -------------------
@q(
    "count_distinct_filtered",
    """
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def count_distinct_filtered(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# -- group-by sum (cost query, agent.py:235-238) ----------------------------
@q(
    "sum_by_context",
    """
    SELECT event_type, ROUND(SUM(value), 4) AS total_value, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def sum_by_context(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.round(F.sum("value"), 4).alias("total_value"), F.count(F.lit(1)).alias("n"))
    )


# -- join + avg (agent.py:241-245); broadcast the small dim -----------------
@q(
    "join_avg_by_segment",
    """
    SELECT c.c_mktsegment, ROUND(AVG(o.o_totalprice), 4) AS avg_price,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_avg_by_segment(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# -- conditional aggregation / pivot (reporting-database.md:277-291) --------
@q(
    "conditional_agg_pivot",
    """
    SELECT user_id % 10 AS user_bucket,
           ROUND(SUM(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 4) AS click_value,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4) AS purchase_value,
           ROUND(SUM(CASE WHEN event_type = 'error'    THEN value ELSE 0 END), 4) AS error_value
    FROM events GROUP BY user_id % 10
    """,
)
def conditional_agg_pivot(spark, sf_dir):
    e = _t(spark, sf_dir, "events")

    def cond(t):
        return F.round(
            F.sum(F.when(F.col("event_type") == t, F.col("value")).otherwise(0.0)), 4
        )

    return e.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        cond("click").alias("click_value"),
        cond("purchase").alias("purchase_value"),
        cond("error").alias("error_value"),
    )


# -- bucketed CASE + avg of boolean (reporting-database.md:294-316) ---------
@q(
    "confidence_band_accuracy",
    """
    SELECT CASE WHEN l_discount >= 0.08 THEN 'high'
                WHEN l_discount >= 0.04 THEN 'medium'
                ELSE 'low' END AS discount_band,
           ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 4) AS return_rate,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def confidence_band_accuracy(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") >= 0.08, "high")
        .when(F.col("l_discount") >= 0.04, "medium")
        .otherwise("low")
    )
    return li.groupBy(band.alias("discount_band")).agg(
        F.round(F.avg(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)), 4).alias(
            "return_rate"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# -- join with ratio aggregate (reporting-database.md:319-334) --------------
@q(
    "ratio_by_priority",
    """
    SELECT o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice) / SUM(l.l_quantity), 4) AS price_per_unit
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def ratio_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias(
                "price_per_unit"
            )
        )
    )


# -- top-k with deterministic tiebreak (reporting-database.md:262-274) ------
@q(
    "topk_customers_by_spend",
    """
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total_spend
    FROM orders GROUP BY o_custkey
    ORDER BY SUM(o_totalprice) DESC, o_custkey ASC LIMIT 10
    """,
)
def topk_customers_by_spend(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.sum("o_totalprice").alias("_raw"),
        )
        .orderBy(F.desc("_raw"), F.asc("o_custkey"))
        .limit(10)
        .drop("_raw")
    )


# -- string function surface (agent.py:157-165) ------------------------------
@q(
    "string_functions",
    """
    SELECT p_partkey,
           LOWER(p_name)                          AS name_lower,
           UPPER(p_brand)                         AS brand_upper,
           SUBSTRING(p_type, 1, 4)                AS type_prefix,
           CAST(LENGTH(p_name) AS BIGINT)         AS name_len,
           CONCAT(p_brand, ':', p_type)           AS brand_type,
           TRIM(CONCAT(' ', p_name, ' '))         AS trimmed,
           (p_name LIKE '%red%')                  AS has_red,
           regexp_matches(p_name, 'bolt|gear')    AS is_hardware,
           CAST(STRPOS(p_name, 'e') AS BIGINT)    AS first_e
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.col("p_name").like("%red%").alias("has_red"),
        F.col("p_name").rlike("bolt|gear").alias("is_hardware"),
        F.locate("e", F.col("p_name")).cast("long").alias("first_e"),
    )


# -- date function surface (agent.py:173-177) --------------------------------
@q(
    "date_functions",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                    AS order_date,
           CAST(year(o_orderdate) AS BIGINT)                    AS order_year,
           CAST(month(o_orderdate) AS BIGINT)                   AS order_month,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')  AS due_date
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def date_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


# -- anti join: checkpoint-resume shape (SURVEY.md §2.A DynamoDB cache) ------
@q(
    "anti_join_resume",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_resume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


# -- semi join ----------------------------------------------------------------
@q(
    "semi_join_active",
    """
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def semi_join_active(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


# -- union of shards (SURVEY.md §2 gaps: union) -------------------------------
@q(
    "union_shards",
    """
    SELECT l_returnflag, COUNT(*) AS n FROM (
      SELECT l_returnflag FROM lineitem WHERE l_shipdate <  TIMESTAMP '1997-01-01'
      UNION ALL
      SELECT l_returnflag FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    ) GROUP BY l_returnflag
    """,
)
def union_shards(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp")
    a = li.where(F.col("l_shipdate") < cut).select("l_returnflag")
    b = li.where(F.col("l_shipdate") >= cut).select("l_returnflag")
    return a.unionByName(b).groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


# -- context windows: lag/lead (classification/service.py:364-480 analog) ----
@q(
    "window_lag_lead",
    """
    SELECT event_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           ROUND(COALESCE(lag(value) OVER w, 0.0), 4) AS prev_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.round(F.coalesce(F.lag("value").over(w), F.lit(0.0)), 4).alias("prev_value"),
    )


# -- gaps-and-islands sessionization (the BIO segmentation shape, §2.C) ------
@q(
    "gaps_islands_sessions",
    """
    SELECT user_id, CAST(SUM(flag) AS BIGINT) AS n_islands, COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <> event_type
                  THEN 1 ELSE 0 END AS flag
      FROM events
    ) GROUP BY user_id
    """,
)
def gaps_islands_sessions(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flag = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    return (
        e.select("user_id", flag.alias("flag"))
        .groupBy("user_id")
        .agg(F.sum("flag").cast("long").alias("n_islands"), F.count(F.lit(1)).alias("n_events"))
    )


# -- majority vote with earliest tie-break (classification:2002-2094) --------
@q(
    "majority_vote_mode",
    """
    SELECT user_id, event_type AS majority_type FROM (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, first_ts ASC, event_type ASC) AS rk
      FROM (SELECT user_id, event_type, COUNT(*) AS n, MIN(ts) AS first_ts
            FROM events GROUP BY user_id, event_type)
    ) WHERE rk = 1
    """,
)
def majority_vote_mode(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    votes = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.min("ts").alias("first_ts")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n"), F.asc("first_ts"), F.asc("event_type")
    )
    return (
        votes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("majority_type"))
    )


# -- per-turn ordinals (page strategy, classification:2096-2136) --------------
@q(
    "row_number_ordinals",
    """
    SELECT event_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
             AS ordinal
    FROM events
    """,
)
def row_number_ordinals(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select("event_id", F.row_number().over(w).cast("long").alias("ordinal"))


# -- min-normalized indices (extraction/service.py:571-603) -------------------
@q(
    "min_normalized_index",
    """
    SELECT o_orderkey,
           CAST(o_orderkey - MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS BIGINT)
             AS key_offset
    FROM orders
    """,
)
def min_normalized_index(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        (F.col("o_orderkey") - F.min("o_orderkey").over(w)).cast("long").alias("key_offset"),
    )


# -- sequence + explode (holistic segment ranges, classification:2647-2687) ---
@q(
    "sequence_explode_ranges",
    """
    SELECT n_nationkey, CAST(unnest(generate_series(0, n_nationkey % 3)) AS BIGINT) AS i
    FROM nation
    """,
)
def sequence_explode_ranges(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.explode(
            F.sequence(F.lit(0), F.col("n_nationkey") % 3).cast("array<long>")
        ).alias("i"),
    )


# -- broadcast cost-model join (save_reporting_data.py:841-1067) --------------
@q(
    "cost_model_broadcast",
    """
    SELECT e.event_type, ROUND(SUM(e.value * p.unit_cost), 6) AS estimated_cost
    FROM events e
    JOIN (VALUES ('click', 0.0001), ('view', 0.00005), ('purchase', 0.002),
                 ('signup', 0.001), ('error', 0.0)) AS p(event_type, unit_cost)
      ON e.event_type = p.event_type
    GROUP BY e.event_type
    """,
)
def cost_model_broadcast(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    pricing = spark.createDataFrame(
        [
            ("click", 0.0001),
            ("view", 0.00005),
            ("purchase", 0.002),
            ("signup", 0.001),
            ("error", 0.0),
        ],
        "event_type string, unit_cost double",
    )
    return (
        e.join(F.broadcast(pricing), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.sum(F.col("value") * F.col("unit_cost")), 6).alias("estimated_cost"))
    )


# -- MAX-not-SUM agg discipline (agent.py:212) --------------------------------
@q(
    "agg_discipline_max_per_doc",
    """
    SELECT o_orderstatus,
           CAST(MAX(n_items) AS BIGINT) AS max_items_per_order,
           ROUND(SUM(order_total), 2)   AS total_price
    FROM (
      SELECT o.o_orderstatus, o.o_orderkey,
             COUNT(l.l_linenumber) AS n_items, MAX(o.o_totalprice) AS order_total
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderstatus, o.o_orderkey
    ) GROUP BY o_orderstatus
    """,
)
def agg_discipline_max_per_doc(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus", "o_orderkey")
        .agg(
            F.count("l_linenumber").alias("n_items"),
            F.max("o_totalprice").alias("order_total"),
        )
    )
    return per_order.groupBy("o_orderstatus").agg(
        F.max("n_items").cast("long").alias("max_items_per_order"),
        F.round(F.sum("order_total"), 2).alias("total_price"),
    )


# -- multi-way broadcast star join (dims chained like the reference's
#    Glue-table joins in docs/reporting-database.md:319-334) -----------------
@q(
    "star_join_regional_sales",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           ROUND(SUM(o.o_totalprice), 2) AS total_sales,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def star_join_regional_sales(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# -- supplier-side join with conditional agg ---------------------------------
@q(
    "supplier_lineitem_rollup",
    """
    SELECT s.s_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returned
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def supplier_lineitem_rollup(spark, sf_dir):
    """Revenue accumulates as DECIMAL(18,4): at sf1 the per-supplier
    double sum (~10^6 rows, ~3×10^8 magnitude) diverged between engines
    in the 9th significant digit from accumulation order alone (r7 sf1
    sweep find); decimal addition is exact and order-independent —
    also the only correct choice when 1000 executors produce partial
    aggregates in nondeterministic order."""
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,4)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
        )
    )


# -- grouping sets family (beyond the reference, which lacks them — §2 gaps;
#    standard warehouse surface so the engine carries them anyway) ----------
@q(
    "rollup_sales",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_extendedprice), 2) AS revenue
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_sales(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
        )
    )


@q(
    "cube_order_stats",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


# -- TPC-H Q3 shape: shipping priority (join + filter + topk) ---------------
@q(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    c = F.broadcast(
        _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(rev, 2).alias("revenue"), rev.alias("_raw"))
        .orderBy(F.desc("_raw"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# -- TPC-H Q5 shape: star join over region/nation -----------------------------
@q(
    "q5_regional_volume",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def q5_regional_volume(spark, sf_dir):
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# -- scalar subquery: each order vs the global average ------------------------
@q(
    "price_vs_global_avg",
    """
    SELECT o_orderkey,
           ROUND(o_totalprice / (SELECT AVG(o_totalprice) FROM orders), 6)
             AS price_ratio
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def price_vs_global_avg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    avg = o.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        o.where(F.col("o_orderkey") % 100 == 0)
        .crossJoin(F.broadcast(avg))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") / F.col("_avg"), 6).alias("price_ratio"),
        )
    )


# -- TPC-H Q7 shape: nation-pair trade volume (two independent dim chains
#    meeting at the fact — exercises join reordering + double broadcast) ----
@q(
    "q7_nation_volume",
    """
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS volume,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name < nc.n_name
    GROUP BY ns.n_name, nc.n_name
    """,
)
def q7_nation_volume(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    ns = F.broadcast(_t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = F.broadcast(_t(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(ns, F.col("s_nationkey") == F.col("s_nk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        # revenue terms have exactly 4 decimals, so per-row ROUND to integer
        # ten-thousandths + BIGINT sum is order- and engine-independent (a
        # double SUM + ROUND(,2) straddled a .005 boundary vs DuckDB here)
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    ).cast("long")
                ).cast("double")
                / 10000.0
            ).alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# -- TPC-H Q10 shape: top returned-item customers (rank on rounded revenue,
#    deterministic custkey tiebreak — cross-engine-stable top-k) ------------
@q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, revenue FROM (
      SELECT c.c_custkey, c.c_name,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name
    ) ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# -- TPC-H Q14 shape: promo revenue share (conditional agg ratio) ------------
@q(
    "q14_promo_share",
    """
    SELECT ROUND(100.0 *
             SUM(CASE WHEN p.p_type = 'PROMO'
                      THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q14_promo_share(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# -- TPC-H Q17 shape: small-quantity parts (correlated subquery decorrelated
#    into an agg self-join — Catalyst and DuckDB both plan it this way) ------
@q(
    "q17_small_quantity",
    """
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_limit
    """,
)
def q17_small_quantity(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    lim = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    ).withColumnRenamed("l_partkey", "pk")
    return (
        li.join(lim, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# -- event-time sessionization (gap > 30 min starts a new session) -----------
@q(
    "sessionize_time_gap",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS INT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_time_gap(spark, sf_dir):
    """Event-time sessionization: a >30-minute silence starts a new
    session — the time-gap twin of the class-change gaps-and-islands
    used for BIO sections (one shuffle on the session key, no UDF)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | (F.unix_timestamp(F.col("ts")) - F.unix_timestamp(prev_ts) > 1800),
        1,
    ).otherwise(0)
    running = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("session_id", F.sum(new_s).over(running).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").cast("long").alias("first_event"),
        )
    )


# -- TPC-H Q18 shape: large-volume customers (HAVING on a grouped sum,
#    then a semi-style join back to the detail) ------------------------------
@q(
    "q18_large_orders",
    """
    SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: the HAVING subquery becomes an aggregated
    semi-join (big-side aggregate first, THEN the dimension joins — the
    filter shrinks lineitem before any wide join; customer broadcasts)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


# -- TPC-H Q21 shape: suppliers who kept waiting orders (EXISTS + NOT EXISTS
#    on the same detail table → semi + anti joins) ---------------------------
@q(
    "q21_waiting_supplier",
    """
    WITH l AS (
      SELECT li.l_orderkey, li.l_suppkey,
             li.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN l l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (EXISTS + NOT EXISTS on the same detail table;
    'late' = shipped > 60 days after order date — the synthetic schema
    carries l_shipdate, not receipt/commit dates).  EXISTS pairs become
    ONE per-order aggregate (distinct suppliers overall and among late
    lines) instead of two correlated re-scans: the order qualifies for
    l1 iff it has >1 distinct supplier and exactly one late supplier
    (l1's own, since l1 is late)."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l = li.join(
        o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias("late"),
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "_n_late_supp"
        ),
    )
    l1 = l.where(F.col("late")).select("l_orderkey", "l_suppkey")
    return (
        l1.join(per_order, "l_orderkey")
        .where((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# -- TPC-H Q8 shape: national market share (two role-joins of nation) --------
@q(
    "q8_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_8' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey  = l.l_partkey
      JOIN supplier s ON s.s_suppkey  = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey  = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey  = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) GROUP BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share) — faithful: the synthetic schema
    has every table Q8 touches (reference analytics surface:
    agents/analytics/agent.py Athena SQL).  The two ROLE-joins of
    ``nation`` (customer's nation → region filter; supplier's nation →
    share numerator) are distinct broadcast aliases; all five dims
    broadcast so lineitem→orders is the only shuffle-sized join, and
    the share is one hash aggregate over year."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO"))
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    r = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(r, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_8", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


# -- TPC-H Q9 shape: profit by supplier nation and year ----------------------
@q(
    "q9_nation_profit",
    """
    SELECT nation, o_year,
           CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
               - 0.2 * p.p_retailprice * l.l_quantity AS DECIMAL(18,4))
               AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey  = l.l_partkey
      JOIN supplier s ON s.s_suppkey  = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) GROUP BY nation, o_year
    """,
)
def q9_nation_profit(spark, sf_dir):
    """TPC-H Q9 SHAPE (product-type profit by nation/year).  The
    synthetic schema has no ``partsupp`` table, so the supply-cost term
    ``ps_supplycost * l_quantity`` is stood in by
    ``0.2 * p_retailprice * l_quantity`` (a per-part cost from the part
    dim) — the PLAN is Q9's (name-filtered part broadcast into the fact
    scan, supplier→nation rollup, two-key aggregate); only the cost
    constant differs.  Per-row amounts are cast to DECIMAL(18,4) before
    summing: a double sum with subtractive cancellation is
    order-dependent and landed a fixture group on a half-cent rounding
    boundary (255551.405 — Spark and DuckDB rounded opposite ways);
    decimal accumulation is exact and order-independent in both
    engines, which is also the right answer on a 1000-executor cluster
    where partial-aggregate order is nondeterministic."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    o = _t(spark, sf_dir, "orders")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.2 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


# -- TPC-H Q16 shape: supplier count per part attribute ----------------------
@q(
    "q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 SHAPE (supplier count per part attribute).  No
    ``partsupp`` table in the synthetic schema, so lineitem serves as
    the part↔supplier bridge (distinct suppliers that actually shipped
    the part), and the reference's comment-based "complaint supplier"
    exclusion becomes an acctbal predicate — same anti-join + distinct
    aggregate plan.  The NOT IN's excluded-supplier set is a broadcast
    anti-join; brand/type/size predicates push into the part dim before
    it broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
        )
    )
    bad = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# -- TPC-H Q20 shape: suppliers with dominant shipped share ------------------
@q(
    "q20_excess_suppliers",
    """
    WITH sp AS (
      SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'large%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
    ), ptot AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM sp GROUP BY l_partkey
    )
    SELECT s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_acctbal > 1000
      AND s.s_suppkey IN (
        SELECT sp.l_suppkey FROM sp
        JOIN ptot ON ptot.l_partkey = sp.l_partkey
        WHERE sp.qty > 0.2 * ptot.total_qty
      )
    """,
)
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 SHAPE (suppliers holding excess stock of name-filtered
    parts).  ``partsupp.ps_availqty`` doesn't exist in the synthetic
    schema, so the correlated threshold compares each supplier's shipped
    quantity of a part against 20% of that part's corpus-wide shipped
    total — preserving Q20's nested-aggregate + semi-join-chain plan
    (part name filter → per-(supp,part) aggregate → per-part reflux
    join → supplier semi-join with a pushed supplier predicate)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part").where(F.col("p_name").like("large%"))
    )
    sp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ptot = sp.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    qualifying = (
        sp.join(ptot, "l_partkey")
        .where(F.col("qty") > 0.2 * F.col("total_qty"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 1000)
    return (
        s.join(qualifying, "s_suppkey", "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


# -- derived partsupp bridge (completes the TPC-H battery: Q2 / Q11) ---------
#
# The synthetic star schema carries no ``partsupp`` table, so Q2 and
# Q11 — the two queries whose SEMANTICS (not just a term) live on that
# bridge — were previously inexpressible.  Rather than weaken their
# shapes, the bridge is DERIVED deterministically from the part and
# supplier dims with the repo's cross-engine md5-bucket idiom
# (Spark ``conv(substring(md5(x),1,8),16,10)`` ==
# DuckDB ``CAST('0x'||substr(md5(x),1,8) AS BIGINT)``): each part gets
# 4 pseudo-random supplier slots (TPC-H's ps-per-part fanout),
# deduplicated, and per-(part,supplier) supply cost / availqty are
# integer md5 buckets.  Costs stay in integer CENTS through every
# comparison and aggregate — the min-cost equality (Q2) and the
# value-threshold (Q11) are exact integer arithmetic in both engines,
# so no rounding boundary can flip a row.  The same derivation text is
# inlined as a CTE in both oracles.

_PS_SQL = """
    WITH psk AS (
      SELECT DISTINCT p_partkey AS ps_partkey,
             CAST('0x'||substr(md5('ps'||CAST(p_partkey AS VARCHAR)||'#'||CAST(j AS VARCHAR)),1,8) AS BIGINT)
               % (SELECT COUNT(*) FROM supplier) AS ps_suppkey
      FROM part, (SELECT UNNEST([0,1,2,3]) AS j) js
    ), partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             100 + CAST('0x'||substr(md5('sc'||CAST(ps_partkey AS VARCHAR)||':'||CAST(ps_suppkey AS VARCHAR)),1,8) AS BIGINT) % 100000 AS ps_supplycost_cents,
             1 + CAST('0x'||substr(md5('aq'||CAST(ps_partkey AS VARCHAR)||':'||CAST(ps_suppkey AS VARCHAR)),1,8) AS BIGINT) % 9999 AS ps_availqty
      FROM psk
    )
"""


def _md5b(col):
    """Non-negative 32-bit md5 bucket, identical across engines."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp bridge: 4 supplier slots per part
    (md5-bucketed mod supplier count, deduplicated), integer-cents
    supply cost and integer availqty per (part, supplier).  The
    supplier count rides in as a broadcast 1-row aggregate (the TF-IDF
    corpus-size pattern), so the derivation is dim-only work — at
    10^12-row fact scale this never touches a fact table."""

    def key(tag, a, sep, b):
        return F.concat(
            F.lit(tag), a.cast("string"), F.lit(sep), b.cast("string")
        )

    part = _t(spark, sf_dir, "part").select("p_partkey")
    scount = (
        _t(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).alias("s_count"))
    )
    psk = (
        part.crossJoin(F.broadcast(scount))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("j"),
            "s_count",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                _md5b(key("ps", F.col("p_partkey"), "#", F.col("j")))
                % F.col("s_count")
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    return psk.select(
        "ps_partkey",
        "ps_suppkey",
        (
            F.lit(100)
            + _md5b(key("sc", F.col("ps_partkey"), ":", F.col("ps_suppkey")))
            % 100000
        ).alias("ps_supplycost_cents"),
        (
            F.lit(1)
            + _md5b(key("aq", F.col("ps_partkey"), ":", F.col("ps_suppkey")))
            % 9999
        ).alias("ps_availqty"),
    )


# -- TPC-H Q2: minimum-cost supplier per part within a region ----------------
@q(
    "q2_min_cost_supplier",
    _PS_SQL
    + """
    , eu AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents,
             s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), flt AS (
      SELECT eu.*, p.p_brand,
             MIN(eu.ps_supplycost_cents) OVER (PARTITION BY eu.ps_partkey) AS min_cost
      FROM eu JOIN part p ON p.p_partkey = eu.ps_partkey
      WHERE p.p_size <= 15 AND p.p_type = 'ECONOMY'
    )
    SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey, p_brand,
           CAST(ps_supplycost_cents AS DOUBLE)/100.0 AS supplycost
    FROM flt WHERE ps_supplycost_cents = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 (min-cost supplier per part in a region) over the
    derived partsupp bridge — the correlated MIN subquery becomes a
    per-part window min with an exact integer-cents equality filter.
    All four dims broadcast; the ORDER BY key (acctbal desc, nation,
    supplier, part) is a total order, so the LIMIT 100 is
    deterministic.  Reference analog: the analytics agent's
    min-per-group lookup shapes (agents/analytics/agent.py:90-246)."""
    ps = derived_partsupp(spark, sf_dir)
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey", "p_brand")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
        .where(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            (F.col("ps_supplycost_cents").cast("double") / 100.0).alias(
                "supplycost"
            ),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# -- TPC-H Q11: important stock value per part within a region ---------------
@q(
    "q11_important_stock",
    _PS_SQL
    + """
    , eu AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), agg AS (
      SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
      FROM eu GROUP BY ps_partkey
    )
    SELECT ps_partkey, value_cents FROM agg
    WHERE value_cents * (SELECT COUNT(*) FROM agg)
          > 2 * (SELECT SUM(value_cents) FROM agg)
    ORDER BY value_cents DESC, ps_partkey
    """,
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 (parts whose regional stock value exceeds a global
    threshold) over the derived partsupp bridge.  TPC-H's
    SF-dependent fraction becomes scale-free: keep parts whose value
    exceeds 2x the mean — compared as ``value*count > 2*total`` in
    exact integer arithmetic (no division, no float boundary).  The
    global (total, count) rides back in as a broadcast 1-row
    aggregate, preserving Q11's nested-aggregate HAVING shape."""
    ps = derived_partsupp(spark, sf_dir)
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    agg = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
        )
        .groupBy("ps_partkey")
        .agg(F.sum("v").alias("value_cents"))
    )
    tot = agg.agg(
        F.sum("value_cents").alias("total"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * F.col("cnt") > 2 * F.col("total"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
    )


# -- exact percentiles / median (score-distribution reporting) ---------------
@q(
    "percentile_scores",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_scores(spark, sf_dir):
    """EXACT percentile aggregates (Spark 4 ``percentile`` — continuous
    interpolation, same definition as DuckDB ``quantile_cont``) — the
    score-distribution reporting shape (confidence/price percentiles
    per class).  Exact, so hash-comparable cross-engine; the approx
    sketch (``percentile_approx``) is the >10^9-rows-per-group scale
    path with the same call shape."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# -- built-in session windows (vs the manual gaps-and-islands twin) ----------
@q(
    "session_window_agg",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
)
def session_window_agg(spark, sf_dir):
    """Spark's BUILT-IN ``session_window`` (dynamic gap sessions as a
    grouping expression — the same operator Structured Streaming uses
    for stateful session aggregation) cross-checked against the manual
    lag/running-sum sessionization the oracle states: same sessions,
    same counts.  One shuffle; session merge happens inside the
    aggregation operator, no window function needed."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(
                F.to_utc_timestamp(F.col("session_window.start"), "UTC")
            ).alias("session_start_us"),
            "n_events",
        )
    )


# -- VARIANT semi-structured path (Spark 4): parse once, extract binary ------
@q(
    "variant_props_rollup",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS k_total,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS k_present,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
    FROM events GROUP BY event_type
    """,
)
def variant_props_rollup(spark, sf_dir):
    """Semi-structured props through Spark 4's VARIANT type
    (``parse_json`` once → binary-encoded ``variant_get`` extracts) —
    at 100 TB this is the schema-free column strategy: one parse at
    ingest, typed sub-field access after, no per-query string
    re-parsing (the ``get_json_object`` path this engine also carries
    re-tokenizes the JSON text per call).  The oracle states the plain
    JSON-extract semantics."""
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("k_total"),
            F.count(k).cast("bigint").alias("k_present"),
            F.max(k).cast("int").alias("k_max"),
        )
    )


# ===========================================================================
# Round-4 battery: the remaining TPC-H shapes expressible over this fixture
# star schema (no partsupp / shipmode / commitdate columns exist, so each
# query keeps the SHAPE — the join/agg/subquery structure Catalyst must
# optimize — with predicates restated over available columns), plus sketch
# and grouping-set surfaces.
# ===========================================================================


# -- TPC-H Q4 shape: EXISTS against the detail table → semi join ------------
@q(
    "q4_priority_late_exists",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_late_exists(spark, sf_dir):
    """TPC-H Q4 shape (EXISTS decorrelated to a left-semi join).  The
    correlated ship-after-order predicate rides INTO the join condition
    so the semi join dedupes per order before the aggregate — at scale
    the semi join shuffles (orderkey, orderdate) only, never the full
    lineitem row, and the agg is a 5-group map-side combine."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# -- TPC-H Q6 shape: pure scan-side filter + single-row aggregate -----------
@q(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: every predicate is scan-pushable (shipdate range
    + discount band + quantity cap), then ONE partial+final aggregate —
    zero shuffle beyond the single-row exchange.  The canonical 'does
    the filter reach the parquet scan' probe."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


# -- TPC-H Q12 shape: join + CASE bucket aggregate --------------------------
@q(
    "q12_returnflag_case_buckets",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l.l_returnflag
    """,
)
def q12_returnflag_case_buckets(spark, sf_dir):
    """TPC-H Q12 shape (shipmode → returnflag): detail-side filter
    first, one orderkey join, CASE buckets fold into two conditional
    sums in a single 3-group aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


# -- TPC-H Q13 shape: outer join + count, then a distribution ----------------
@q(
    "q13_custdist",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_custdist(spark, sf_dir):
    """TPC-H Q13 shape: the filtered predicate lives IN the outer-join
    condition (customers with zero qualifying orders must still appear
    with c_count=0), then a second tiny aggregate over the counts.
    At scale: orders pre-aggregates per custkey BEFORE the outer join
    (count-then-join beats join-then-count — the join input shrinks
    from |orders| to |custkeys|), and the distribution agg is a
    few-hundred-group map-side combine."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("_n"))
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left_outer")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
    )


# -- TPC-H Q15 shape: aggregate, then join back to its own max ---------------
@q(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) AS total_rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev_e4 AS DOUBLE) / 10000.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev_e4 = (SELECT MAX(total_rev_e4) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (view + max-of-aggregate): revenue per supplier
    computed ONCE, the scalar max broadcast back against it (no
    re-aggregation), supplier dim broadcast.  Revenue is summed in
    exact integer ten-thousandths (the q7 pattern) so the max
    comparison and the hash are float-order-proof."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
            .cast("bigint")
        ).alias("total_rev_e4")
    )
    mx = rev.agg(F.max("total_rev_e4").alias("_mx"))
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev_e4") == F.col("_mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev_e4").cast("double") / 10000.0).alias("total_revenue"),
        )
    )


# -- TPC-H Q19 shape: disjunction of conjunctive blocks over a dim join ------
@q(
    "q19_disjunctive_predicates",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-AND blocks mixing both join sides.  The
    part-only disjunct (brand+size) is pre-applied to the broadcast dim
    — Catalyst can't split a mixed OR across the join itself, so the
    manual dim prefilter is the scale lever (part shrinks before
    broadcast; the residual mixed predicate runs post-join)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    dim_ok = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    full = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p.where(dim_ok)), li.l_partkey == F.col("p_partkey"))
        .where(full)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


# -- TPC-H Q22 shape: scalar avg subquery + anti join + substring buckets ----
@q(
    "q22_idle_customers",
    """
    SELECT SUBSTR(c.c_name, LENGTH(c.c_name), 1) AS name_bucket,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY SUBSTR(c.c_name, LENGTH(c.c_name), 1)
    """,
)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: broadcast scalar average (positive balances
    only), NOT EXISTS as a left-anti join against DISTINCT custkeys
    (the distinct shrinks the anti probe from |orders| rows to
    |custkeys|), then a ~10-group bucket aggregate on a name
    suffix."""
    c = _t(spark, sf_dir, "customer")
    avg_pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    ordered = (
        _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(ordered, c.c_custkey == ordered.o_custkey, "left_anti")
        .groupBy(
            F.substring(F.col("c_name"), -1, 1).alias("name_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# -- HLL sketch surface: approx distinct with a verifiable error bound -------
@q(
    "approx_distinct_hll",
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_hll(spark, sf_dir):
    """HLL++ approximate distinct (``approx_count_distinct``, rsd=0.01)
    checked against the exact count in the same plan.  The sketch is
    the 100 TB path: mergeable fixed-size state, no per-group hash set
    — COUNT(DISTINCT) at 10^12 rows shuffles every distinct value,
    HLL++ shuffles 2^p registers per group.  The oracle pins the exact
    count; ``approx_ok`` (|approx−exact| ≤ max(3, 2%·exact)) makes the
    sketch's error bound itself the checked value."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").cast("bigint").alias("exact_custs"),
            F.approx_count_distinct("o_custkey", 0.01).alias("_approx"),
        )
        .select(
            "o_orderpriority",
            "exact_custs",
            (
                F.abs(F.col("_approx") - F.col("exact_custs"))
                <= F.greatest(F.lit(3.0), 0.02 * F.col("exact_custs"))
            ).alias("approx_ok"),
        )
    )


# -- GROUPING SETS with grouping_id (beyond rollup/cube) ---------------------
@q(
    "grouping_sets_metrics",
    """
    SELECT COALESCE(o_orderstatus, '<all>')   AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderpriority), ())
    """,
)
def grouping_sets_metrics(spark, sf_dir):
    """Explicit GROUPING SETS (a non-prefix set rollup/cube can't
    express: (status,priority), (priority), ()) with ``grouping_id``
    disambiguating NULL-as-all from NULL-as-value.  One Expand + one
    aggregate — the same single-shuffle plan as rollup."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


# -- time-RANGE rolling window (interval frame, not row frame) ---------------
@q(
    "rolling_range_window",
    """
    SELECT event_id,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
           ), 6) AS avg_10m,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_10m
    FROM events WHERE user_id % 50 = 0
    """,
)
def rolling_range_window(spark, sf_dir):
    """Time-RANGE rolling aggregate: the frame is an INTERVAL over event
    time, not a row count — uneven event spacing means a row frame is
    semantically wrong for 'last 10 minutes'.  Spark expresses it as a
    rangeBetween window on epoch seconds (one user_id shuffle, sorted
    once, both aggregates share the frame)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, 0)
    )
    return e.select(
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_10m"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_10m"),
    )


# -- MERGE / upsert latest-wins semantics (CDC compaction analog) ------------
@q(
    "upsert_latest_events",
    """
    SELECT user_id, event_type,
           CAST(event_id AS BIGINT) AS event_id,
           ROUND(value, 4) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id % 100 = 0
    ) WHERE rn = 1
    """,
)
def upsert_latest_events(spark, sf_dir):
    """Latest-wins upsert compaction — the batch analog of Iceberg
    ``MERGE INTO``/CDC dedup: one row per (user_id, event_type), the
    newest by (ts, event_id) wins.  One key shuffle + row_number; at
    10^12 rows this is the standard snapshot-compaction plan (AQE
    handles hot keys; the deterministic event_id tiebreak makes the
    result partitioning-invariant)."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").where(F.col("user_id") % 100 == 0)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").cast("bigint").alias("event_id"),
            F.round("value", 4).alias("value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        )
    )


# -- explicit salted join vs its plain-join semantics ------------------------
@q(
    "salted_join_hot_key",
    """
    WITH dim AS (
      SELECT event_type, ROUND(AVG(value), 4) AS type_avg
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, ROUND(e.value, 4) AS value, d.type_avg
    FROM events e JOIN dim d ON e.event_type = d.event_type
    WHERE e.user_id % 200 = 0
    """,
)
def salted_join_hot_key(spark, sf_dir):
    """The explicit skew-join utility under the driver's hash check:
    ``salted_join`` (deterministic row-hash salt on the fact side,
    explode-replicated dim side) must equal the plain join exactly.
    event_type has ~4 distinct values over millions of events — the
    textbook hot-key join AQE only fixes after a bad shuffle; salting
    fixes it in the plan."""
    from ..operators.skewjoin import salted_join

    e = _t(spark, sf_dir, "events").where(F.col("user_id") % 200 == 0)
    dim = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 4).alias("type_avg"))
    )
    return salted_join(e, dim, "event_type", salt=8, how="inner").select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        "type_avg",
    )


# -- multiset set-ops: EXCEPT ALL / INTERSECT (shard reconciliation) ---------
@q(
    "except_intersect_shards",
    """
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0),
         b AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0)
    SELECT 'only_a' AS side, CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
    GROUP BY o_custkey
    UNION ALL
    SELECT 'common' AS side, CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
    GROUP BY o_custkey
    """,
)
def except_intersect_shards(spark, sf_dir):
    """Multiset reconciliation between two shard exports: EXCEPT ALL
    keeps per-row multiplicity (a key appearing 3× in a and 1× in b
    survives 2×) — the correct semantics for row-count drift detection,
    where DISTINCT-based EXCEPT would hide partial loss.  Both set-ops
    plan as a single hash aggregate over a union with count
    differencing — one shuffle each."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderkey") % 3 == 0).select("o_custkey")
    b = o.where(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    only_a = (
        a.exceptAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("only_a").alias("side"), F.col("o_custkey").cast("bigint"), "n")
    )
    common = (
        a.intersectAll(b)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("common").alias("side"), F.col("o_custkey").cast("bigint"), "n")
    )
    return only_a.unionAll(common)


# -- DataSketches HLL: per-shard sketches merged at read (the stored-
#    sketch workflow) --------------------------------------------------------
@q(
    "hll_sketch_merge_shards",
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS merged_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def hll_sketch_merge_shards(spark, sf_dir):
    """The stored-sketch pattern at 100 TB: every shard keeps an HLL
    sketch column (Apache DataSketches, ``hll_sketch_agg``); a reader
    UNIONS the shard sketches (``hll_union_agg``) instead of
    re-scanning raw values — distinct-count queries touch kilobytes of
    sketch instead of the fact table.  Here: sketches built per
    (priority, orderkey%8) shard, merged per priority, and the merged
    estimate must sit within the sketch's published error of the exact
    count (``merged_ok``) — merge-correctness itself is the checked
    value, the HLL ``approx_ok`` pattern."""
    o = _t(spark, sf_dir, "orders")
    shard_sketches = (
        o.groupBy("o_orderpriority", (F.col("o_orderkey") % 8).alias("_shard"))
        .agg(F.expr("hll_sketch_agg(CAST(o_custkey AS STRING))").alias("_sk"))
    )
    merged = shard_sketches.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(_sk))").alias("_est")
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_custs")
    )
    return (
        exact.join(merged, "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_custs",
            (
                F.abs(F.col("_est") - F.col("exact_custs"))
                <= F.greatest(F.lit(3.0), 0.03 * F.col("exact_custs"))
            ).alias("merged_ok"),
        )
    )
