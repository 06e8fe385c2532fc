"""Unit tests for relational operators on tiny hand-checked inputs."""

from __future__ import annotations

import datetime as dt

from flink_kmeans_clustering_spark.operators.relational import (
    customer_status_sets,
    late_order_priority,
    parts_without_bulk_sales,
    pricing_summary,
)


def test_pricing_summary_decimal_exact(spark):
    li = spark.createDataFrame(
        [
            (1, 10.0, 100.0, 0.1, 0.05, "N", "O", dt.datetime(1996, 1, 1)),
            (2, 20.0, 200.0, 0.0, 0.10, "N", "O", dt.datetime(1996, 1, 2)),
            (3, 5.0, 50.0, 0.5, 0.00, "R", "F", dt.datetime(2002, 1, 1)),  # cut off
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    [row] = pricing_summary(li, cutoff="2001-09-01").collect()
    assert (row["l_returnflag"], row["l_linestatus"]) == ("N", "O")
    assert row["sum_qty"] == 30.0
    assert row["sum_base_price"] == 300.0
    # 100*0.9 + 200*1.0 = 290 ; charge: 90*1.05 + 200*1.1 = 314.5
    assert row["sum_disc_price"] == 290.0
    assert row["sum_charge"] == 314.5
    assert row["avg_qty"] == 15.0 and row["count_order"] == 2


def test_late_order_priority_semi_join_counts_once(spark):
    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", dt.datetime(1996, 1, 10)),
            (2, "5-LOW", dt.datetime(1996, 2, 1)),
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # two late lineitems for order 1 -> still counted once (semi join)
            (1, dt.datetime(1996, 6, 1)),
            (1, dt.datetime(1996, 7, 1)),
            (2, dt.datetime(1996, 2, 15)),  # on time
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {
        r["o_orderpriority"]: r["order_count"]
        for r in late_order_priority(
            orders, li, date_from="1996-01-01", date_to="1996-04-01", late_days=90
        ).collect()
    }
    assert out == {"1-URGENT": 1}


def test_anti_join_parts(spark):
    part = spark.createDataFrame(
        [(1, "bolt"), (2, "nut")], "p_partkey long, p_name string"
    )
    li = spark.createDataFrame(
        [(1, 50.0), (2, 10.0)], "l_partkey long, l_quantity double"
    )
    out = parts_without_bulk_sales(part, li, min_qty=49.0).collect()
    assert [(r["p_partkey"], r["p_name"]) for r in out] == [(2, "nut")]


def test_customer_status_sets(spark):
    orders = spark.createDataFrame(
        [(1, "F"), (1, "O"), (2, "F"), (2, "F"), (3, "O")],
        "o_custkey long, o_orderstatus string",
    )
    out = {(r["custkey"], r["tag"]) for r in customer_status_sets(orders).collect()}
    assert out == {(1, "both"), (2, "f_only")}
