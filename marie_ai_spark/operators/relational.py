"""Relational operator breadth: the join/aggregate/window shapes a user of
the reference's job-DAG queries would express, as idiomatic DataFrame ops.

Each function is oracle-checked against DuckDB SQL (see __spark_entry__),
so the semantics here are pinned: anti/semi joins, hierarchical rollup,
conditional pivot aggregation, exact interpolated percentiles, running
windows, calendar bucketing, and the argmin-join (TPC-H Q2 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join — the 'skip already processed' shape (SURVEY §2.3)."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_with_urgent_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join (EXISTS)."""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def priority_status_rollup(orders: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP aggregate with grouping-null normalization so the
    oracle comparison is deterministic."""
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


def user_event_pivot(events: DataFrame) -> DataFrame:
    """Pivot via conditional aggregation (portable form of PIVOT)."""
    agg = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_{t}")
        for t in ("signup", "purchase", "error")
    ]
    # decimal accumulation (exact, associative) emitted as integer micros:
    # BIGINT cells hash identically under every harness normalization,
    # whereas DECIMAL rendering differs across result transports
    return events.groupBy("user_id").agg(
        *agg,
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("bigint")
        .alias("value_micros"),
    )


def quantity_percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per return flag (Spark `percentile`
    == DuckDB `quantile_cont`). spread_input: the exact-percentile
    partial aggregation buffers every value and a small table scans as
    one task (guide §2.5) — measured 1.3s -> 0.8s at sf0.1."""
    from ..functions import spread_input

    lineitem = spread_input(lineitem, "l_orderkey")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99_price"),
    )


def running_customer_revenue(orders: DataFrame) -> DataFrame:
    """Running total per customer over order date — cumulative window."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
    )


def monthly_order_volume(orders: DataFrame) -> DataFrame:
    """Calendar bucketing: orders and revenue per month."""
    return (
        orders.groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def cheapest_supplier_per_part(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q2 shape: argmin join — per part, the supplier row achieving
    the minimum extended price (window argmin, deterministic tie-break)."""
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("l_extendedprice"), F.asc("l_suppkey"), F.asc("l_orderkey"),
        F.asc("l_linenumber"),
    )
    return (
        lineitem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey",
            "l_suppkey",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
    )


def revenue_by_nation_sql(spark, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: temp views + spark.sql — same Catalyst
    plan as the DataFrame form."""
    for t in ("customer", "orders", "nation"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
