"""Window / analytic / set-op / scalar-function query suite.

Covers the reference surface beyond TPC-H joins+aggs: window functions
(ref python/datafusion/functions/__init__.py:6553-7053, expr.py:1570
Window builder), grouping sets / rollup / cube (expr.py:1737-1860), set
operations (dataframe.py:1289-1420), distinct_on (dataframe.py:1420),
unnest/explode (dataframe.py:1741), scalar string/date/math functions
(§2.8 of SURVEY.md), and JSON access (functions/spark.py:997).

Every query is paired with a DuckDB oracle; aliases match exactly.
All computation is built-in-function / codegen-friendly — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _us(c: str):
    """Epoch microseconds for a timestamp column. The testdata stores
    naive (TIMESTAMP_NTZ) values, which Spark's ``unix_micros`` rejects;
    the cast reinterprets them in the session zone — pinned UTC
    (session.py) — so it is exact, and matches DuckDB's ``epoch_us``
    over the same naive parquet values."""
    return F.unix_micros(F.col(c).cast("timestamp"))


# --------------------------------------------------------------------------
# Window: top-3 most recent events per user (row_number over desc order).
# ref window fns: functions/__init__.py:6702 (row_number)
def evt_topk_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "rn")
    )


EVT_TOPK_SQL = """
SELECT user_id, event_id, event_type, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# Window: running revenue per user (unbounded-preceding frame sum) plus
# lead/lag gap to the previous event — one scan, one window partition.
# ref: aggregates over windows functions.rs:773-816; lead/lag
# functions/__init__.py:6553,6629. (Merged evt_running_sum + evt_gaps:
# same source and window key, so a single gate exercises both.)
def evt_running_gaps(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev_us = F.lag(_us("ts")).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(wsum), 2).alias("running_value"),
        (_us("ts") - prev_us).alias("gap_us"),
    )


EVT_RUNNING_GAPS_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


# --------------------------------------------------------------------------
# Sessionization: 30-min-gap sessions per user, then per-user session stats.
# Pure window composition — the Structured Streaming analogue is
# session_window(); this is the batch form that scales (two window passes
# over one hash partition by user_id, no Python).
def evt_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _us("ts") - F.lag(_us("ts")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    # No final global sort: the rollup is per-user (output grows with the
    # data), a total order over it is presentational only, and the gate
    # compares order-insensitively. Dropping it removes a RangePartitioning
    # exchange + boundary-sampling job; the groupBy itself reuses the
    # window's hash(user_id) partitioning, so the whole query is one
    # shuffle end-to-end.
    return sess.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


EVT_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM sess GROUP BY user_id
"""


# --------------------------------------------------------------------------
# distinct_on: latest event per user (Postgres DISTINCT ON emulation —
# ref dataframe.py:1420 distinct_on).
def evt_distinct_on(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


EVT_DISTINCT_ON_SQL = """
SELECT user_id, event_id, event_type, value
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns (groupBy().pivot()).
def evt_pivot(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .orderBy("user_id")
    )


EVT_PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS "click",
       count(*) FILTER (WHERE event_type = 'view')     AS "view",
       count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
       count(*) FILTER (WHERE event_type = 'signup')   AS "signup",
       count(*) FILTER (WHERE event_type = 'error')    AS "error"
FROM events GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Time bucketing (date_bin/date_trunc — ref functions/__init__.py:2752,2788).
def evt_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            # round the sum first: inputs are 2-decimal, so round(sum,2) is
            # exact and the subsequent division is bit-identical cross-engine
            F.round(F.round(F.sum("value"), 2) / F.count("*"), 4).alias("avg_value"),
        )
        .orderBy("hour_bucket")
    )


EVT_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour_bucket, count(*) AS n_events,
       round(round(sum(value), 2) / count(*), 4) AS avg_value
FROM events GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# JSON extraction (ref functions/spark.py:997 json_tuple / str_to_map).
def evt_json(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.when(k > 50, 1)).alias("n_big_k"))
        .orderBy("event_type")
    )


EVT_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_big_k
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# ROLLUP (ref expr.py:1737 GroupingSet.rollup).
def agg_grouping_multi(spark, sf_dir):
    """ROLLUP + CUBE + GROUPING SETS (+ grouping() indicator) in one gate.

    ref expr.py:1737 (GroupingSet.rollup), :1790 (cube), :1841 (grouping
    sets), functions/__init__.py:5222 (grouping). The three multi-
    dimensional grouping forms are tag-unioned into a common
    (mode, k1, k2, n, val) shape so a single driver row certifies all of
    them; rows compare order-insensitively so the union order is free.
    """
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    roll = (
        orders.rollup(F.year("o_orderdate").alias("o_year"), F.col("o_orderstatus"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("val"),
        )
        .select(
            F.lit("rollup").alias("mode"),
            F.col("o_year").cast("string").alias("k1"),
            F.col("o_orderstatus").alias("k2"),
            "n",
            "val",
        )
    )
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("val"),
        )
        .select(
            F.lit("cube").alias("mode"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "n",
            "val",
        )
    )
    orders.createOrReplaceTempView("orders")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS mode, o_orderstatus AS k1, o_orderpriority AS k2,
               count(*) AS n,
               CAST(grouping(o_orderstatus) * 10 + grouping(o_orderpriority)
                    AS DOUBLE) AS val
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )
    return roll.union(cube).union(gsets)


AGG_GROUPING_MULTI_SQL = """
SELECT 'rollup' AS mode,
       CAST(CAST(year(o_orderdate) AS INTEGER) AS VARCHAR) AS k1,
       o_orderstatus AS k2, count(*) AS n, round(sum(o_totalprice), 2) AS val
FROM orders
GROUP BY ROLLUP (CAST(year(o_orderdate) AS INTEGER), o_orderstatus)
UNION ALL
SELECT 'cube', l_returnflag, l_linestatus, count(*), round(sum(l_quantity), 2)
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'gsets', o_orderstatus, o_orderpriority, count(*),
       CAST(grouping(o_orderstatus) * 10 + grouping(o_orderpriority) AS DOUBLE)
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# Statistical aggregates (ref functions/__init__.py:5655-5821,5328).
def agg_stats(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 3).alias("sd_qty"),
            F.round(F.var_pop("l_discount"), 6).alias("varp_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
            F.round(F.avg("l_tax"), 4).alias("avg_tax"),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 3)            AS sd_qty,
       round(var_pop(l_discount), 6)                AS varp_disc,
       round(corr(l_quantity, l_extendedprice), 4)  AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
       round(avg(l_tax), 4)                         AS avg_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# DISTINCT + FILTER aggregate modifiers (ref expr.py:1020-1056 builder).
def agg_distinct_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_quantity"))).alias(
                "qty_high_disc"
            ),
            F.round(
                F.sum_distinct(F.col("l_quantity")),
                2,
            ).alias("sum_distinct_qty"),
        )
        .orderBy("l_linestatus")
    )


AGG_DISTINCT_FILTER_SQL = """
SELECT l_linestatus,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS qty_high_disc,
       round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# Exact percentiles / median (ref functions/__init__.py:5105 percentile_cont,
# 5363 median).
def agg_percentiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("p50_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90_price"),
            F.round(F.median("l_quantity"), 2).alias("med_qty"),
        )
        .orderBy("l_returnflag")
    )


AGG_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50_price,
       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price,
       round(quantile_cont(l_quantity, 0.5), 2)      AS med_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Ordered string_agg / array_agg(order_by=) (ref functions/__init__.py:7054
# string_agg, 872 array_agg; order-sensitive rewrite documented SURVEY §7.3).
def agg_string_agg(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


AGG_STRING_AGG_SQL = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


# --------------------------------------------------------------------------
# Ordered aggregates with a DESCENDING STRING key — exercises the
# comparator-based _ordered_values path (unary-minus negation cannot order
# non-numeric keys; VERDICT r1 "what's wrong" #2). Routed through this
# package's own functions module, not raw pyspark.
def agg_string_agg_desc(spark, sf_dir):
    from .api.expr import col as dcol
    from .api.functions import first_value, string_agg

    nation = _t(spark, sf_dir, "nation")
    ob = [dcol("n_name").sort(ascending=False)]
    return (
        nation.groupBy("n_regionkey")
        .agg(
            string_agg(dcol("n_name"), ",", order_by=ob).expr.alias("nations_desc"),
            first_value(dcol("n_name"), order_by=ob).expr.alias("top_name"),
        )
        .orderBy("n_regionkey")
    )


AGG_STRING_AGG_DESC_SQL = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name DESC) AS nations_desc,
       max(n_name) AS top_name
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""


# --------------------------------------------------------------------------
# LIKE/ILIKE with a custom escape character (ref expr/like.rs escape_char;
# Expr.like(escape=) rewrites to Spark's backslash escape).
def fn_like_escape(spark, sf_dir):
    from .api.expr import Expr

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    s = F.concat(F.lit("100%_"), F.col("p_name"))
    df = p.select("p_partkey", s.alias("s"))
    return df.select(
        "p_partkey",
        Expr(F.col("s")).like("100!%!_%", escape="!").expr.alias("m1"),
        Expr(F.col("s")).like("100!%X%", escape="!").expr.alias("m2"),
        Expr(F.col("s")).ilike("100!%!_%", escape="!").expr.alias("m3"),
    ).orderBy("p_partkey")


FN_LIKE_ESCAPE_SQL = """
SELECT p_partkey,
       ('100%_' || p_name) LIKE '100!%!_%' ESCAPE '!' AS m1,
       ('100%_' || p_name) LIKE '100!%X%' ESCAPE '!' AS m2,
       ('100%_' || p_name) ILIKE '100!%!_%' ESCAPE '!' AS m3
FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# Set operations (ref dataframe.py:1289-1420).
def setop_union_multi(spark, sf_dir):
    """UNION-distinct + union_by_name (reordered columns) in one gate.

    ref dataframe.py:1289 (union distinct=True), :1388 (union_by_name).
    The two results tag-union into (part, k, v); rows compare
    order-insensitively. (Merged setop_union + setop_union_by_name.)
    """
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    uni = (
        cust.select(F.col("c_nationkey").alias("k"))
        .union(supp.select(F.col("s_nationkey").alias("k")))
        .distinct()
        .select(
            F.lit("union").alias("part"),
            F.col("k").cast("long").alias("k"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    a = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal")
    ).filter(F.col("id") <= 50)
    b = supp.select(
        F.col("s_acctbal").alias("bal"), F.col("s_suppkey").alias("id")
    ).filter(F.col("id") <= 50)
    byname = (
        a.unionByName(b)
        .groupBy()
        .agg(F.count("*").alias("k"), F.round(F.sum("bal"), 2).alias("v"))
        .select(F.lit("byname").alias("part"), F.col("k").cast("long"), "v")
    )
    return uni.union(byname)


SETOP_UNION_MULTI_SQL = """
SELECT 'union' AS part, CAST(nationkey AS BIGINT) AS k, CAST(NULL AS DOUBLE) AS v
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
) t
UNION ALL
SELECT 'byname', count(*), round(sum(bal), 2) FROM (
  SELECT c_custkey AS id, c_acctbal AS bal FROM customer WHERE c_custkey <= 50
  UNION ALL BY NAME
  SELECT s_acctbal AS bal, s_suppkey AS id FROM supplier WHERE s_suppkey <= 50
) u
"""


def setop_intersect(spark, sf_dir):
    hi = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return hi.intersect(supp).orderBy("nationkey")


SETOP_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def setop_except(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp.distinct()).groupBy("nationkey").agg(
        F.count("*").alias("n")
    ).orderBy("nationkey")


SETOP_EXCEPT_SQL = """
SELECT nationkey, count(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
) t GROUP BY nationkey ORDER BY nationkey
"""


# --------------------------------------------------------------------------
# Scalar string functions (ref §2.8 string inventory).
def fn_strings(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return cust.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("up"),
        F.lower(F.col("c_mktsegment")).alias("lo"),
        F.length(F.col("c_name")).alias("len"),
        F.substring(F.col("c_name"), 1, 8).alias("prefix"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.regexp_replace(F.col("c_name"), "[0-9]+", "#").alias("densed"),
        F.reverse(F.col("c_mktsegment")).alias("rev"),
        F.md5(F.col("c_name")).alias("h"),
        F.sha2(F.col("c_name"), 256).alias("h_sha256"),
    ).orderBy("c_custkey")


FN_STRINGS_SQL = """
SELECT c_custkey,
       upper(c_name)                          AS up,
       lower(c_mktsegment)                    AS lo,
       CAST(length(c_name) AS INTEGER)        AS len,
       substring(c_name, 1, 8)                AS prefix,
       concat_ws('|', c_mktsegment, c_name)   AS joined,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS densed,
       reverse(c_mktsegment)                  AS rev,
       md5(c_name)                            AS h,
       sha256(c_name)                         AS h_sha256
FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey
"""


# --------------------------------------------------------------------------
# Date/time functions (ref §2.8 datetime inventory).
def fn_datetime(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("ym"),
            F.dayofweek(F.col("o_orderdate")).alias("dow"),
            F.col("o_totalprice"),
        )
        .groupBy("ym")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.when(F.col("dow") == 1, 1)).alias("n_sunday"),
        )
        .orderBy("ym")
    )


FN_DATETIME_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
       round(sum(o_totalprice), 2) AS total,
       count(CASE WHEN dayofweek(o_orderdate) = 0 THEN 1 END) AS n_sunday
FROM orders GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Math functions + CASE/cast (ref §2.8 math inventory; expr.py CaseBuilder).
def fn_math_case(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    bucket = (
        F.when(F.col("l_extendedprice") < 10000, "low")
        .when(F.col("l_extendedprice") < 40000, "mid")
        .otherwise("high")
    )
    return (
        li.select(
            bucket.alias("bucket"),
            F.round(F.sqrt(F.col("l_extendedprice")), 4).alias("sq"),
            F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("lg"),
            F.ceil(F.col("l_quantity")).alias("cq"),
            F.floor(F.col("l_discount") * 100).alias("fd"),
            F.abs(F.col("l_tax") - 0.05).alias("ab"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("sq"), 2).alias("sum_sqrt"),
            F.round(F.sum("lg"), 2).alias("sum_log"),
            F.sum("cq").alias("sum_ceil"),
            F.sum("fd").alias("sum_floor"),
            F.round(F.sum("ab"), 4).alias("sum_abs"),
        )
        .orderBy("bucket")
    )


FN_MATH_CASE_SQL = """
SELECT CASE WHEN l_extendedprice < 10000 THEN 'low'
            WHEN l_extendedprice < 40000 THEN 'mid'
            ELSE 'high' END AS bucket,
       count(*) AS n,
       round(sum(round(sqrt(l_extendedprice), 4)), 2)   AS sum_sqrt,
       round(sum(round(ln(l_extendedprice + 1.0), 6)), 2) AS sum_log,
       CAST(sum(CAST(ceil(l_quantity) AS BIGINT)) AS BIGINT)        AS sum_ceil,
       CAST(sum(CAST(floor(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_floor,
       round(sum(abs(l_tax - 0.05)), 4)                 AS sum_abs
FROM lineitem WHERE l_orderkey <= 2000
GROUP BY 1 ORDER BY bucket
"""


# --------------------------------------------------------------------------
# Window frames: rows-frame moving sum + range-frame cumulative count
# (ref WindowFrame expr.py:1594; units rows|range).
def win_frames(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    wrows = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    wrange = W.partitionBy("user_id").orderBy("event_id").rangeBetween(-100, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(wrows), 2).alias("moving3"),
        F.count("*").over(wrange).alias("in_range100"),
    )


WIN_FRAMES_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving3,
       count(*) OVER (PARTITION BY user_id ORDER BY event_id
                      RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS in_range100
FROM events
"""


# --------------------------------------------------------------------------
# GROUPS window frames (ref expr.py:1594-1638 WindowFrame units='groups';
# crates/core/src/expr/window.rs:194-228). Spark has no GROUPS unit — the
# wrapper emulates it exactly with dense_rank + a RANGE frame over the
# rank (api/dataframe.py _resolve_groups_frames); DuckDB executes GROUPS
# BETWEEN natively, so the oracle certifies the emulation bit-for-bit.
def win_groups_frame(spark, sf_dir):
    from .api.dataframe import DataFrame as DFWrap
    from .api.expr import Expr, Window as DFWindow, WindowFrame
    from .api.functions import col as dfcol

    ev = _t(spark, sf_dir, "events")
    day = Expr(F.col("ts").cast("date"))
    prev1 = DFWindow(
        partition_by=[dfcol("user_id")],
        order_by=[day.sort()],
        window_frame=WindowFrame("groups", 1, 0),
    )
    # bounds must be explicit for groups (ref WindowFrame: "If unit
    # type is groups, this parameter must be set")
    running = DFWindow(
        partition_by=[dfcol("user_id")],
        order_by=[day.sort()],
        window_frame=WindowFrame("groups", 2, 0),
    )
    step = DFWrap(ev).select(
        dfcol("user_id"),
        dfcol("event_id"),
        Expr(F.sum("value")).over(prev1).alias("g_sum_raw"),
        Expr(F.count(F.lit(1))).over(running).alias("g_cnt"),
    )
    out = step.select(
        dfcol("user_id"),
        dfcol("event_id"),
        Expr(F.round(F.col("g_sum_raw"), 2)).alias("g_sum"),
        dfcol("g_cnt"),
    )
    return out.df


# The container's DuckDB predates GROUPS-frame support, so the oracle
# derives GROUPS semantics independently from first principles: a peer
# group here is one (user, day), so GROUPS 1 PRECEDING..CURRENT is the
# current day-group's sum plus the previous day-group's (lag over the
# per-day rollup), and the unbounded-groups count is the running per-day
# count — a formulation structurally different from the wrapper's
# dense_rank+RANGE rewrite, certifying it rather than mirroring it.
WIN_GROUPS_FRAME_SQL = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         sum(value) AS day_sum, count(*) AS day_cnt
  FROM events GROUP BY 1, 2
), dd AS (
  SELECT user_id, day,
         day_sum + coalesce(lag(day_sum) OVER (PARTITION BY user_id ORDER BY day), 0) AS gsum,
         CAST(sum(day_cnt) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS gcnt
  FROM d
)
SELECT e.user_id, e.event_id, round(dd.gsum, 2) AS g_sum, dd.gcnt AS g_cnt
FROM events e JOIN dd ON e.user_id = dd.user_id AND CAST(e.ts AS DATE) = dd.day
"""


# --------------------------------------------------------------------------
# Ranking family over per-user totals (ref functions/__init__.py:6702-7053).
def win_rank_value(spark, sf_dir):
    """Ranking family + first/last/nth value functions in one gate.

    ref functions/__init__.py:6702-7053 (rank family), :6193
    (first/last/nth_value). Two granularities (per-user totals for the
    rank family; per-event rows for the value functions) tag-unioned
    into a common padded shape — rows compare order-insensitively.
    (Merged win_rank_family + win_value_fns.)
    """
    ev = _t(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total"))
    wr = W.orderBy(F.desc("total"), F.asc("user_id"))
    ranks = totals.select(
        F.lit("rank").alias("part"),
        "user_id",
        F.lit(None).cast("long").alias("event_id"),
        "total",
        F.rank().over(wr).alias("rnk"),
        F.dense_rank().over(wr).alias("drnk"),
        F.round(F.percent_rank().over(wr), 6).alias("prnk"),
        F.round(F.cume_dist().over(wr), 6).alias("cdist"),
        F.ntile(4).over(wr).alias("quartile"),
        F.lit(None).cast("string").alias("first_type"),
        F.lit(None).cast("string").alias("last_type"),
        F.lit(None).cast("string").alias("second_type"),
    )
    wv = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    values = ev.select(
        F.lit("value").alias("part"),
        "user_id",
        "event_id",
        F.lit(None).cast("double").alias("total"),
        F.lit(None).cast("int").alias("rnk"),
        F.lit(None).cast("int").alias("drnk"),
        F.lit(None).cast("double").alias("prnk"),
        F.lit(None).cast("double").alias("cdist"),
        F.lit(None).cast("int").alias("quartile"),
        F.first("event_type").over(wv).alias("first_type"),
        F.last("event_type").over(wv).alias("last_type"),
        F.nth_value("event_type", 2).over(wv).alias("second_type"),
    )
    return ranks.union(values)


WIN_RANK_VALUE_SQL = """
WITH totals AS (
  SELECT user_id, round(sum(value), 2) AS total FROM events GROUP BY user_id
)
SELECT 'rank' AS part, user_id, CAST(NULL AS BIGINT) AS event_id, total,
       CAST(rank() OVER w AS INTEGER)        AS rnk,
       CAST(dense_rank() OVER w AS INTEGER)  AS drnk,
       round(percent_rank() OVER w, 6)       AS prnk,
       round(cume_dist() OVER w, 6)          AS cdist,
       CAST(ntile(4) OVER w AS INTEGER)      AS quartile,
       CAST(NULL AS VARCHAR) AS first_type,
       CAST(NULL AS VARCHAR) AS last_type,
       CAST(NULL AS VARCHAR) AS second_type
FROM totals
WINDOW w AS (ORDER BY total DESC, user_id ASC)
UNION ALL
SELECT 'value', user_id, event_id, CAST(NULL AS DOUBLE),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER),
       first_value(event_type) OVER w2,
       last_value(event_type)  OVER w2,
       nth_value(event_type, 2) OVER w2
FROM events
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --------------------------------------------------------------------------
# Regression aggregates (ref functions/__init__.py:5822-6192).
def agg_regr(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 2).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_avgx(y, x), 4).alias("avgx"),
            F.round(F.regr_avgy(y, x), 2).alias("avgy"),
        )
        .orderBy("l_linestatus")
    )


AGG_REGR_SQL = """
SELECT l_linestatus,
       round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
       round(regr_avgx(l_extendedprice, l_quantity), 4)      AS avgx,
       round(regr_avgy(l_extendedprice, l_quantity), 2)      AS avgy
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


# --------------------------------------------------------------------------
# Full outer join with coalesced keys + cross join in one gate (merged
# join_full_outer + join_cross; ref dataframe.py:1050 how='full',
# cross_join). Results tag-unioned into (part, k, a, b); rows compare
# order-insensitively.
def join_outer_cross(spark, sf_dir):
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
        .filter(F.col("nationkey") < 10)
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
        .filter(F.col("nationkey") >= 5)
    )
    outer = (
        cust.join(supp, ["nationkey"], "full")
        .select(
            F.lit("outer").alias("part"),
            F.col("nationkey").cast("string").alias("k"),
            F.coalesce("n_cust", F.lit(0)).alias("a"),
            F.coalesce("n_supp", F.lit(0)).alias("b"),
        )
    )
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cross = (
        region.crossJoin(nation)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            F.lit("cross").alias("part"),
            F.col("r_name").alias("k"),
            F.col("n_pairs").alias("a"),
            F.lit(None).cast("long").alias("b"),
        )
    )
    return outer.union(cross)


JOIN_OUTER_CROSS_SQL = """
SELECT 'outer' AS part, CAST(COALESCE(c.nationkey, s.nationkey) AS VARCHAR) AS k,
       COALESCE(n_cust, 0) AS a, COALESCE(n_supp, 0) AS b
FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer
      GROUP BY 1 HAVING c_nationkey < 10) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier
      GROUP BY 1 HAVING s_nationkey >= 5) s
USING (nationkey)
UNION ALL
SELECT 'cross', r_name, count(*), CAST(NULL AS BIGINT)
FROM region CROSS JOIN nation
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# Conditional functions (ref functions/__init__.py:422-1627).
def fn_conditional(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        orders.select(
            F.coalesce(status_or_null, F.lit("OPEN")).alias("status2"),
            F.nvl2(status_or_null, F.lit("closed"), F.lit("open")).alias("oc"),
            F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("gp"),
            F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("lp"),
        )
        .groupBy("status2", "oc")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("gp"), 2).alias("sum_gp"),
            F.round(F.sum("lp"), 2).alias("sum_lp"),
        )
        .orderBy("status2", "oc")
    )


FN_CONDITIONAL_SQL = """
SELECT COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
       CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 'closed' ELSE 'open' END AS oc,
       count(*) AS n,
       round(sum(greatest(o_totalprice, 100000.0)), 2) AS sum_gp,
       round(sum(least(o_totalprice, 100000.0)), 2) AS sum_lp
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Array functions over split text (ref §2.8 array inventory).
def fn_array_ops(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    uniq = F.array_distinct(words)
    return (
        docs.select(
            "doc_id",
            F.size(words).cast("long").alias("n_words"),
            F.size(uniq).cast("long").alias("n_uniq"),
            F.element_at(F.array_sort(uniq), 1).alias("first_word"),
            F.element_at(F.array_sort(uniq), -1).alias("last_word"),
            F.array_contains(words, "spark").alias("has_spark"),
            F.array_join(F.slice(F.array_sort(uniq), 1, 3), "|").alias("top3"),
        )
        .filter(F.col("doc_id") < 50)
        .orderBy("doc_id")
    )


FN_ARRAY_OPS_SQL = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS words,
         list_distinct(list_filter(string_split(text, ' '), x -> x != '')) AS uniq
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(uniq) AS BIGINT)  AS n_uniq,
       list_sort(uniq)[1]  AS first_word,
       list_sort(uniq)[-1] AS last_word,
       list_contains(words, 'spark') AS has_spark,
       array_to_string(list_sort(uniq)[1:3], '|') AS top3
FROM w ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# date_bin: 15-minute origin-aligned buckets (ref functions/__init__.py:2788)
# — epoch arithmetic form, identical to api.functions.date_bin.
def evt_date_bin(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    secs = 900
    binned = F.timestamp_seconds((F.unix_timestamp(F.col("ts")) / secs).cast("long") * secs)
    return (
        ev.groupBy(binned.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
        .limit(200)
    )


EVT_DATE_BIN_SQL = """
SELECT CAST(to_timestamp((epoch_us(ts) // 1000000 // 900) * 900) AS TIMESTAMP) AS bucket,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY 1 LIMIT 200
"""


# --------------------------------------------------------------------------
# Bitwise operators + epoch conversions in one events scan (merged
# fn_bits + fn_epoch — same source table and sort key; sha2/md5 moved
# into fn_strings). ref functions/spark.py:342-417 bit family,
# :861-913 unix_* family.
def fn_bits_epoch(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    x = F.col("event_id")
    y = F.col("user_id")
    return ev.select(
        "event_id",
        x.bitwiseAND(y).alias("b_and"),
        x.bitwiseOR(y).alias("b_or"),
        x.bitwiseXOR(y).alias("b_xor"),
        F.shiftleft(x, 3).alias("shl"),
        F.shiftright(x, 2).alias("shr"),
        F.bit_count(x).alias("nbits"),
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("es"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ems"),
        _us("ts").alias("eus"),
        F.unix_date(F.col("ts").cast("date")).alias("ed"),
    ).orderBy("event_id")


FN_BITS_EPOCH_SQL = """
SELECT event_id,
       event_id & user_id AS b_and,
       event_id | user_id AS b_or,
       xor(event_id, user_id) AS b_xor,
       CAST(event_id << 3 AS BIGINT) AS shl,
       CAST(event_id >> 2 AS BIGINT) AS shr,
       CAST(bit_count(event_id) AS INTEGER) AS nbits,
       epoch_us(ts) // 1000000 AS es,
       epoch_ms(ts) AS ems,
       epoch_us(ts) AS eus,
       CAST(date_diff('day', DATE '1970-01-01', ts::DATE) AS INTEGER) AS ed
FROM events WHERE event_id < 500 ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Weighted percentile (ref functions/__init__.py
# approx_percentile_cont_with_weight): Spark's exact percentile-with-
# frequency vs DuckDB quantile over weight-exploded rows.
def agg_weighted_pct(spark, sf_dir):
    from .api.expr import Expr
    from .api.functions import approx_percentile_cont_with_weight

    li = _t(spark, sf_dir, "lineitem")
    wp = approx_percentile_cont_with_weight(
        Expr(F.col("l_extendedprice")), Expr(F.col("l_quantity")), 0.5
    ).expr
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wp, 2).alias("wp50"))
        .orderBy("l_returnflag")
    )


AGG_WEIGHTED_PCT_SQL = """
SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 2) AS wp50
FROM (SELECT l_returnflag, l_extendedprice,
             unnest(generate_series(1, CAST(l_quantity AS INT)))
      FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# TIME-of-day emulation (ref functions/__init__.py:2450 to_time, 2851
# make_time; SURVEY §1.3: Spark has no TIME type — times anchor at the
# epoch day). Gated through string round-trips so both engines compare
# wall-clock semantics, not storage types.
def fn_time(spark, sf_dir):
    from .api.expr import Expr
    from .api.functions import make_time, to_time
    from .api.spark_functions import time_trunc

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    hhmmss = F.date_format(F.col("ts"), "HH:mm:ss")
    parsed = to_time(Expr(hhmmss)).expr
    made = make_time(
        Expr(F.hour(F.col("ts"))), Expr(F.minute(F.col("ts"))), Expr(F.lit(0))
    ).expr
    return ev.select(
        "event_id",
        hhmmss.alias("hhmmss"),
        F.date_format(time_trunc("hour", Expr(parsed)).expr, "HH:mm:ss").alias("hr"),
        F.date_format(made, "HH:mm:ss").alias("made"),
    ).orderBy("event_id")


FN_TIME_SQL = """
SELECT event_id,
       strftime(ts, '%H:%M:%S') AS hhmmss,
       strftime(date_trunc('hour', ts), '%H:%M:%S') AS hr,
       CAST(make_time(hour(ts), minute(ts), 0) AS VARCHAR) AS made
FROM events WHERE event_id < 100 ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Recursive CTE (ref: DataFusion supports WITH RECURSIVE; Spark 4.0+ does
# natively too — previously documented-deferred in SURVEY §7.3, now live).
def sql_recursive_cte(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    nation.createOrReplaceTempView("nation_rcte")
    return spark.sql(
        """
        WITH RECURSIVE seq(n) AS (
          SELECT 0 UNION ALL SELECT n + 1 FROM seq WHERE n < 24
        )
        SELECT CAST(n AS INT) AS n_nationkey, n_name
        FROM seq JOIN nation_rcte ON n = n_nationkey
        ORDER BY n_nationkey
        """
    )


SQL_RECURSIVE_CTE_SQL = """
WITH RECURSIVE seq(n) AS (
  SELECT 0 UNION ALL SELECT n + 1 FROM seq WHERE n < 24
)
SELECT CAST(n AS INT) AS n_nationkey, n_name
FROM seq JOIN nation ON n = n_nationkey
ORDER BY n_nationkey
"""


# --------------------------------------------------------------------------
# Approximate aggregates (HLL / t-digest) — engine-specific sketches, so the
# oracle gates on exact values plus Spark-side tolerance checks: the query
# emits the EXACT aggregates alongside booleans asserting the sketch is
# within tolerance (HLL rsd=0.01 checked at 5%; percentile_approx default
# accuracy checked at 1%). DuckDB recomputes the exact values and expects
# every tolerance flag true. (ref functions/__init__.py:4926 approx_distinct,
# 4958 approx_median, 4982 approx_percentile_cont)
def agg_approx(spark, sf_dir):
    # The distinct and percentile families aggregate SEPARATELY and
    # join on the 3-row group key: countDistinct's planner rewrite
    # Expands the input (x2 rows), and pushing every percentile /
    # QuantileSummaries buffer through that expanded SortAggregate
    # measured 90.7 s at sf0.1 vs 6.0 s for this split+broadcast-join
    # form — same results, and a real plan lesson for 100 TB (keep
    # heavy typed-imperative buffers out of distinct-rewritten aggs).
    # Both percentiles share one buffer via the array form.
    li = _t(spark, sf_dir, "lineitem")
    d = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("apx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    p = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.99))
        ).alias("apx_p"),
        F.expr("percentile(l_extendedprice, array(0.5D, 0.99D))").alias("x_p"),
    )
    a = d.join(p, "l_returnflag")
    return a.select(
        "l_returnflag",
        "exact_parts",
        (F.abs(F.col("apx_parts") - F.col("exact_parts")) / F.col("exact_parts") < 0.05).alias("parts_ok"),
        (F.abs(F.col("apx_p")[0] - F.col("x_p")[0]) / F.col("x_p")[0] < 0.01).alias("p50_ok"),
        (F.abs(F.col("apx_p")[1] - F.col("x_p")[1]) / F.col("x_p")[1] < 0.01).alias("p99_ok"),
    ).orderBy("l_returnflag")


AGG_APPROX_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS parts_ok,
       TRUE AS p50_ok,
       TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# As-of join (last-touch attribution): each purchase matched to the same
# user's most recent prior click. operators/temporal.py union+window form
# — one shuffle on user_id, no range join. Oracle: DuckDB's NATIVE `ASOF
# LEFT JOIN` (independent implementation of the same semantics).
def evt_asof_attribution(spark, sf_dir):
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    j = asof_join(purchases, clicks, on="ts", by="user_id")
    return j.select(
        "event_id",
        "user_id",
        F.col("r_event_id").alias("click_id"),
        F.col("r_value").alias("click_value"),
        (_us("ts") - _us("r_ts")).alias("gap_us"),
    ).orderBy("event_id")


EVT_ASOF_SQL = """
SELECT p.event_id, p.user_id, c.event_id AS click_id, c.value AS click_value,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


# --------------------------------------------------------------------------
# Range join (views in the 30 minutes before each purchase): bucketed
# equi-join from operators/temporal.py — left explodes into covered time
# buckets, right maps to exactly one, so no per-key cross product.
def evt_range_join(spark, sf_dir):
    from .operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    rj = range_join(
        purchases,
        views,
        by="user_id",
        on="ts",
        lower=F.expr("INTERVAL -30 MINUTES"),
        upper=F.expr("INTERVAL 0 SECONDS"),
        bucket="30 minutes",
    )
    return (
        rj.groupBy("event_id", "user_id")
        .agg(
            F.count("*").alias("n_views"),
            F.round(F.sum("r_value"), 2).alias("sum_view_value"),
        )
        .orderBy("event_id")
    )


EVT_RANGE_JOIN_SQL = """
SELECT p.event_id, p.user_id, count(*) AS n_views,
       round(sum(v.value), 2) AS sum_view_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id
 AND epoch_us(v.ts) >= epoch_us(p.ts) - 1800000000
 AND epoch_us(v.ts) <= epoch_us(p.ts)
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""


# --------------------------------------------------------------------------
# Time-series gap fill (TimescaleDB time_bucket_gapfill + locf shape,
# operators/gapfill.py): hourly avg(value) per event_type, every hour in
# each type's observed span materialized, gaps carried forward. Oracle
# rebuilds dense axes with range()/UNNEST and an IGNORE NULLS window.
def evt_gapfill(spark, sf_dir):
    from .operators.gapfill import bucket_aggregate, gapfill

    ev = _t(spark, sf_dir, "events")
    sparse = bucket_aggregate(
        ev, ["event_type"], "ts", {"v": F.avg("value")}, stride="1 hour"
    )
    filled = gapfill(sparse, ["event_type"], ["v"], stride="1 hour", method="locf")
    return filled.select(
        "event_type",
        "bucket",
        F.round("v", 4).alias("v_locf"),
        "is_gap",
    ).orderBy("event_type", "bucket")


EVT_GAPFILL_SQL = """
WITH sparse AS (
  SELECT event_type, CAST((epoch_us(ts) // 1000000 // 3600) * 3600 AS BIGINT) AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, min(bucket) lo, max(bucket) hi FROM sparse GROUP BY 1
), dense AS (
  SELECT b.event_type, CAST(u.t AS BIGINT) AS bucket
  FROM b, UNNEST(range(b.lo, b.hi + 3600, 3600)) AS u(t)
), j AS (
  SELECT d.event_type, d.bucket, s.v, s.v IS NULL AS is_gap
  FROM dense d LEFT JOIN sparse s USING (event_type, bucket)
)
SELECT event_type, bucket,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v_locf,
       is_gap
FROM j ORDER BY event_type, bucket
"""


# --------------------------------------------------------------------------
# Native session_window (the batch form of Structured Streaming's session
# windows): per-user 30-min-gap sessions via the built-in operator.
# Semantics note: session_window merges an event iff it lands strictly
# before prev_ts + gap, so the oracle breaks on diff >= gap (the manual
# evt_sessionize gate uses the > convention — both are valid
# sessionizations; this gate pins the BUILT-IN operator's rule).
def evt_session_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy(w.alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


EVT_SESSION_WINDOW_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# --------------------------------------------------------------------------
# Weighted PageRank over the event-type transition graph
# (operators/graph.py): per-user consecutive-event edges, 3 fixed
# iterations with dangling-mass redistribution. The oracle unrolls the
# exact same update in SQL — independently derived, same arithmetic.
def evt_pagerank(spark, sf_dir):
    from .operators.graph import pagerank, transition_edges

    ev = _t(spark, sf_dir, "events")
    edges = transition_edges(ev)
    pr = pagerank(edges, num_iters=3, damping=0.85, weight="weight")
    return pr.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


def _pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    parts = [
        """
WITH e AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS w FROM (
    SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events) t WHERE dst IS NOT NULL GROUP BY src, dst
), ow AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
tr AS (SELECT e.src, e.dst, e.w / ow.ow AS p FROM e JOIN ow USING (src)),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(iters):
        parts.append(
            f""",
d{i} AS (SELECT COALESCE(sum(rank), 0) AS dang FROM r{i}
         WHERE node NOT IN (SELECT src FROM tr)),
c{i} AS (SELECT tr.dst AS node, sum(r{i}.rank * tr.p) AS c
         FROM r{i} JOIN tr ON r{i}.node = tr.src GROUP BY tr.dst),
r{i + 1} AS (SELECT nodes.node,
         {1 - damping} / (SELECT n FROM nn)
         + {damping} * (COALESCE(c{i}.c, 0) + (SELECT dang FROM d{i}) / (SELECT n FROM nn)) AS rank
         FROM nodes LEFT JOIN c{i} USING (node))"""
        )
    parts.append(
        f"\nSELECT node, round(rank, 6) AS rank FROM r{iters} ORDER BY node"
    )
    return "".join(parts)


EVT_PAGERANK_SQL = _pagerank_sql()


# --------------------------------------------------------------------------
# Ordered funnel view → click → purchase: per-step filtered min-aggs, all
# co-partitioned by user (no per-user history sort). Oracle replays the
# same iterative earliest-after-previous logic in CTEs.
def evt_funnel(spark, sf_dir):
    from .operators.funnel import funnel, funnel_summary

    ev = _t(spark, sf_dir, "events")
    return funnel_summary(
        funnel(
            ev,
            ["view", "click", "purchase"],
            within=F.expr("INTERVAL 12 HOURS"),
        )
    )


EVT_FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, min(ts) AS t1 FROM events e JOIN s0 USING (user_id)
  WHERE event_type = 'click' AND ts > t0 AND ts <= t0 + INTERVAL 12 HOUR
  GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(ts) AS t2
  FROM events e JOIN s1 USING (user_id) JOIN s0 USING (user_id)
  WHERE event_type = 'purchase' AND ts > t1 AND ts <= t0 + INTERVAL 12 HOUR
  GROUP BY 1
),
per_user AS (
  SELECT s0.user_id,
         1 + (t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT AS steps_completed
  FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
)
SELECT steps_completed::INT AS steps_completed, count(*) AS n_users
FROM per_user GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Cohort retention triangle: distinct (user, day) first — the only pass
# over raw events — then first-day cohorts and per-offset active counts.
def evt_retention(spark, sf_dir):
    from .operators.funnel import retention_cohorts

    ev = _t(spark, sf_dir, "events")
    return retention_cohorts(ev)


EVT_RETENTION_SQL = """
WITH days AS (SELECT DISTINCT user_id, ts::DATE AS d FROM events),
first AS (SELECT user_id, min(d) AS cohort FROM days GROUP BY 1)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
       date_diff('day', cohort, d)::INT AS day_offset,
       count(*) AS n_users
FROM days JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Plan → SQL unparser round-trip (ref unparser.py:27-80 plan_to_sql).
# Builds TPC-H q3 as a DataFrame pipeline, unparses the Catalyst analyzed
# plan back to SQL text, and executes THAT SQL — certified against the
# original q3 oracle, so the driver row proves unparse(plan) is
# semantically the same query, not just syntactically plausible.
def sql_unparse_roundtrip(spark, sf_dir):
    from .api.substrait import Unparser
    from .suite_tpch import TPCH_QUERIES

    df = TPCH_QUERIES["tpch_q3"][0](spark, sf_dir)
    sql = Unparser().plan_to_sql(df)
    return spark.sql(sql)


def _tpch_q3_oracle() -> str:
    from .suite_tpch import TPCH_QUERIES

    return TPCH_QUERIES["tpch_q3"][1]


# --------------------------------------------------------------------------
# Substrait consume (ref substrait.py:86-188): SQL → Substrait plan →
# protobuf wire bytes → decode → consume back to a DataFrame pipeline.
# The driver row certifies the CONSUMED plan's results against DuckDB
# running the original SQL — i.e. the whole produce/encode/decode/consume
# chain preserves semantics, not just structure. Integer aggregates keep
# the comparison exact.
def substrait_consume(spark, sf_dir):
    from .api import substrait as ss
    from .plans.substrait_plan import consume

    _t(spark, sf_dir, "events").createOrReplaceTempView("events")
    sql = (
        "SELECT user_id, count(*) AS n_events, min(event_id) AS min_event, "
        "max(event_id) AS max_event FROM events WHERE event_id > 100 "
        "GROUP BY user_id"
    )
    data = ss.Serde.serialize_bytes(sql, spark)
    plan = ss.Serde.deserialize_bytes(data)
    return consume(spark, plan.plan_internal)


SUBSTRAIT_CONSUME_SQL = """
SELECT user_id, count(*) AS n_events, min(event_id) AS min_event,
       max(event_id) AS max_event
FROM events WHERE event_id > 100 GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Skew mitigation gates (operators/skew.py). AQE's skew handling splits
# oversized partitions, but one hot KEY still serializes a reducer at
# 100 TB; salting is the fix and must be RESULT-INVARIANT — the oracles
# are the plain unsalted GROUP BY / JOIN, so any row the salt rewrite
# duplicates, drops, or mis-combines is a red driver row. Doubles are
# made order-independent by exact integer cents (values are 2-decimal).
def evt_salted_agg(spark, sf_dir):
    """Two-phase (salted) aggregation over events: phase 1 groups on
    (event_type, salt-of-row) across 8 reducer slots, phase 2 combines
    partials — same result as the single-phase GROUP BY, but a hot key's
    reduce work fans out 8-way."""
    from .operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("bigint")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "sum_cents": ("sum", "cents"),
            "max_cents": ("max", "cents"),
            "min_event": ("min", "event_id"),
        },
        salt_buckets=8,
    )
    return out.select(
        "event_type", "n_events", "sum_cents", "max_cents", "min_event"
    ).orderBy("event_type")


EVT_SALTED_AGG_SQL = """
SELECT event_type,
       count(event_id) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       max(CAST(round(value * 100) AS BIGINT)) AS max_cents,
       min(event_id) AS min_event
FROM events GROUP BY event_type ORDER BY event_type
"""


def evt_salted_join(spark, sf_dir):
    """Hybrid salted join: the hottest event_type joins on
    (key, salt) with the dim side exploded 8-way, the cold keys join
    normally, and the union must equal the plain join — counts per type
    prove no row was duplicated or lost by the hot/cold split."""
    from .operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.count("*").alias("type_n"), F.min("event_id").alias("type_min_id")
    )
    hot = dim.orderBy(F.desc("type_n"), "event_type").limit(1)
    joined = salted_join(ev, dim, ["event_type"], salt_buckets=8, only_keys=hot)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n_joined"),
            F.max("type_n").alias("type_n"),
            F.min("type_min_id").alias("type_min_id"),
            F.min("event_id").alias("min_event"),
        )
        .orderBy("event_type")
    )


EVT_SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT event_type, count(*) AS type_n, min(event_id) AS type_min_id
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_joined,
       CAST(max(d.type_n) AS BIGINT) AS type_n,
       min(d.type_min_id) AS type_min_id,
       min(e.event_id) AS min_event
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
"""


ANALYTICS_QUERIES: dict[str, tuple] = {
    "evt_salted_agg": (evt_salted_agg, EVT_SALTED_AGG_SQL),
    "evt_salted_join": (evt_salted_join, EVT_SALTED_JOIN_SQL),
    "sql_unparse_roundtrip": (sql_unparse_roundtrip, _tpch_q3_oracle()),
    "substrait_consume": (substrait_consume, SUBSTRAIT_CONSUME_SQL),
    "evt_funnel": (evt_funnel, EVT_FUNNEL_SQL),
    "evt_retention": (evt_retention, EVT_RETENTION_SQL),
    "evt_asof_attribution": (evt_asof_attribution, EVT_ASOF_SQL),
    "evt_range_join": (evt_range_join, EVT_RANGE_JOIN_SQL),
    "evt_gapfill": (evt_gapfill, EVT_GAPFILL_SQL),
    "evt_pagerank": (evt_pagerank, EVT_PAGERANK_SQL),
    "evt_session_window": (evt_session_window, EVT_SESSION_WINDOW_SQL),
    "evt_date_bin": (evt_date_bin, EVT_DATE_BIN_SQL),
    "fn_bits_epoch": (fn_bits_epoch, FN_BITS_EPOCH_SQL),
    "agg_approx": (agg_approx, AGG_APPROX_SQL),
    "win_frames": (win_frames, WIN_FRAMES_SQL),
    "win_groups_frame": (win_groups_frame, WIN_GROUPS_FRAME_SQL),
    "win_rank_value": (win_rank_value, WIN_RANK_VALUE_SQL),
    "agg_regr": (agg_regr, AGG_REGR_SQL),
    "join_outer_cross": (join_outer_cross, JOIN_OUTER_CROSS_SQL),
    "fn_conditional": (fn_conditional, FN_CONDITIONAL_SQL),
    "fn_array_ops": (fn_array_ops, FN_ARRAY_OPS_SQL),
    "evt_topk_per_user": (evt_topk_per_user, EVT_TOPK_SQL),
    "evt_running_gaps": (evt_running_gaps, EVT_RUNNING_GAPS_SQL),
    "evt_sessionize": (evt_sessionize, EVT_SESSIONIZE_SQL),
    "evt_distinct_on": (evt_distinct_on, EVT_DISTINCT_ON_SQL),
    "evt_pivot": (evt_pivot, EVT_PIVOT_SQL),
    "evt_hourly": (evt_hourly, EVT_HOURLY_SQL),
    "evt_json": (evt_json, EVT_JSON_SQL),
    "agg_grouping_multi": (agg_grouping_multi, AGG_GROUPING_MULTI_SQL),
    "agg_stats": (agg_stats, AGG_STATS_SQL),
    "agg_distinct_filter": (agg_distinct_filter, AGG_DISTINCT_FILTER_SQL),
    "agg_percentiles": (agg_percentiles, AGG_PERCENTILES_SQL),
    "agg_string_agg": (agg_string_agg, AGG_STRING_AGG_SQL),
    "agg_string_agg_desc": (agg_string_agg_desc, AGG_STRING_AGG_DESC_SQL),
    "fn_like_escape": (fn_like_escape, FN_LIKE_ESCAPE_SQL),
    "sql_recursive_cte": (sql_recursive_cte, SQL_RECURSIVE_CTE_SQL),
    "agg_weighted_pct": (agg_weighted_pct, AGG_WEIGHTED_PCT_SQL),
    "fn_time": (fn_time, FN_TIME_SQL),
    "setop_union_multi": (setop_union_multi, SETOP_UNION_MULTI_SQL),
    "setop_intersect": (setop_intersect, SETOP_INTERSECT_SQL),
    "setop_except": (setop_except, SETOP_EXCEPT_SQL),
    "fn_strings": (fn_strings, FN_STRINGS_SQL),
    "fn_datetime": (fn_datetime, FN_DATETIME_SQL),
    "fn_math_case": (fn_math_case, FN_MATH_CASE_SQL),
}
