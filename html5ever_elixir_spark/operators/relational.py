"""Pipeline-mandated relational operators (SURVEY.md §2.B): scans with
pushdown, filter/project, broadcast joins, aggregations, windows,
sort/top-k — expressed declaratively so Catalyst plans them (pushdown,
partial aggregation, broadcast selection, AQE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# -- aggregation: pricing summary (TPC-H Q1 shape over lineitem) --------------

def pricing_summary(li: DataFrame) -> DataFrame:
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money sums rounded to cents: double summation order differs
            # across engines, so raw sums can disagree in the last ulp
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# -- broadcast join: revenue by nation (customer ⋈ orders ⋈ nation) -----------

def revenue_by_nation(orders: DataFrame, customer: DataFrame, nation: DataFrame):
    """Star join: the FIXED-cardinality dim (nation, 25 rows at every
    TPC-H scale) is explicitly broadcast; customer GROWS with scale
    factor, so its join carries no hint — AQE broadcasts it at test
    scale from runtime stats and falls back to a skew-free shuffle
    join when it outgrows the limit (forcing it would OOM at 100 TB —
    the decontaminate-broadcast lesson applied to the relational
    layer)."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


ORACLE_REVENUE_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name ASC
"""


# -- window: latest event per user (the warc_ts dedup pattern) -----------------

def latest_event_per_user(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


ORACLE_LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# -- sort / top-k ------------------------------------------------------------------

def topk_largest_docs(docs: DataFrame, k: int = 100) -> DataFrame:
    return (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .select("doc_id", "n_chars", "source")
        .limit(k)
    )


def oracle_topk_docs_sql(k: int = 100) -> str:
    return (
        "SELECT doc_id, n_chars, source FROM documents "
        f"ORDER BY n_chars DESC, doc_id ASC LIMIT {k}"
    )


# -- multi-way star join (lineitem ⋈ supplier ⋈ nation ⋈ region ⋈ part) -------------

def supplier_volume_by_nation(li, supplier, nation, region, part):
    """5-table star: revenue by supplier nation within one region for a
    part-name family. Fixed-cardinality dims (nation 25 / region 5 rows
    at ANY scale) are hinted broadcast; scale-growing dims (supplier,
    part) are left to AQE so the plan stays safe at 100 TB. The fact
    table shuffles only for the final aggregation (Catalyst reorders
    the dim joins)."""
    return (
        # supplier/part grow with SF (no hint — AQE decides); nation and
        # region are fixed 25/5 rows at ANY scale (hint is always right)
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where((F.col("r_name") == "ASIA") & F.col("p_name").contains("a"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


ORACLE_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_name LIKE '%a%'
GROUP BY n_name ORDER BY revenue DESC, n_name ASC
"""


# -- filter/project with pushdown ---------------------------------------------------

def filter_project_docs(docs: DataFrame) -> DataFrame:
    return (
        docs.where((F.col("lang") == "en") & (F.col("n_chars") > 100))
        .select("doc_id", "source", "n_chars")
    )


ORACLE_FILTER_SQL = (
    "SELECT doc_id, source, n_chars FROM documents "
    "WHERE lang = 'en' AND n_chars > 100"
)


# -- event sessionization (window + agg over time) ------------------------------------

def event_type_stats(events: DataFrame) -> DataFrame:
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENT_STATS_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value,
       round(avg(value), 6) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""
