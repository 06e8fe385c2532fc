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


def test_customer_order_distribution_counts_zero_customers(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        customer_order_distribution,
    )

    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1, "5-LOW"), (11, 1, "5-LOW"), (12, 2, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    out = {
        r["c_count"]: r["custdist"]
        for r in customer_order_distribution(cust, orders).collect()
    }
    # customer 1 -> 2 orders; customers 2 (only excluded priority) and 3 -> 0
    assert out == {2: 1, 0: 2}


def test_large_quantity_orders_having_and_topk(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        large_quantity_orders,
    )
    import datetime as dt

    cust = spark.createDataFrame([(1, "alice")], "c_custkey long, c_name string")
    orders = spark.createDataFrame(
        [
            (10, 1, 500.0, dt.datetime(1996, 1, 1)),
            (11, 1, 900.0, dt.datetime(1996, 2, 1)),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(10, 200.0), (10, 100.0), (11, 100.0)],
        "l_orderkey long, l_quantity double",
    )
    out = large_quantity_orders(cust, orders, li, min_total_qty=250.0).collect()
    assert [(r["o_orderkey"], r["sum_qty"]) for r in out] == [(10, 300.0)]
    assert out[0]["o_orderdate"] == "1996-01-01"


def test_nation_trade_volume_excludes_same_nation(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        nation_trade_volume,
    )
    import datetime as dt

    nation = spark.createDataFrame(
        [(1, "FRANCE"), (2, "GERMANY")], "n_nationkey int, n_name string"
    )
    cust = spark.createDataFrame([(1, 1), (2, 2)], "c_custkey long, c_nationkey int")
    supp = spark.createDataFrame([(7, 2)], "s_suppkey long, s_nationkey int")
    orders = spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [
            # German supplier -> French customer: counted
            (10, 7, 100.0, 0.1, dt.datetime(1996, 5, 1)),
            # German supplier -> German customer: same nation, excluded
            (11, 7, 999.0, 0.0, dt.datetime(1996, 6, 1)),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    out = nation_trade_volume(nation, cust, supp, orders, li).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["supp_nation"], r["cust_nation"], r["l_year"]) == (
        "GERMANY", "FRANCE", 1996,
    )
    assert r["revenue"] == 90.0


def test_monthly_order_ranks_functions_agree(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        monthly_order_ranks,
    )
    import datetime as dt

    orders = spark.createDataFrame(
        [
            (1, 300.0, dt.datetime(1996, 1, 5)),
            (2, 200.0, dt.datetime(1996, 1, 6)),
            (3, 200.0, dt.datetime(1996, 1, 7)),
            (4, 100.0, dt.datetime(1996, 2, 1)),
        ],
        "o_orderkey long, o_totalprice double, o_orderdate timestamp",
    )
    rows = {r["o_orderkey"]: r for r in monthly_order_ranks(orders, k=5).collect()}
    assert rows[1]["rnk"] == 1 and rows[1]["prev_price"] is None
    # price tie: orderkey breaks it -> both rank 2,3 (rank over a total order)
    assert (rows[2]["rnk"], rows[3]["rnk"]) == (2, 3)
    assert rows[4]["month"] == "1996-02" and rows[4]["rnk"] == 1


def test_daily_revenue_delta_lag(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        daily_revenue_delta,
    )
    import datetime as dt

    li = spark.createDataFrame(
        [
            (100.0, 0.0, dt.datetime(1996, 1, 1)),
            (250.0, 0.2, dt.datetime(1996, 1, 2)),
        ],
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    rows = sorted(daily_revenue_delta(li).collect(), key=lambda r: r["ship_day"])
    assert rows[0]["delta_vs_prev_day"] is None
    assert rows[1]["revenue"] == 200.0
    assert rows[1]["delta_vs_prev_day"] == 100.0


def test_stats_by_flag_moments(spark):
    from flink_kmeans_clustering_spark.operators.relational import stats_by_flag

    li = spark.createDataFrame(
        [("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 6.0), ("B", 5.0, 1.0)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    rows = {r["l_returnflag"]: r for r in stats_by_flag(li).collect()}
    # perfectly linear A: corr 1, slope 2, intercept 0
    assert rows["A"]["n"] == 3
    assert rows["A"]["corr_qty_price"] == 1.0
    assert rows["A"]["slope_price_on_qty"] == 2.0
    assert rows["A"]["icept_price_on_qty"] == 0.0
    # single-row group: sample moments undefined -> NULL, not crash
    assert rows["B"]["std_qty"] is None


def test_grouping_sets_matches_manual_union(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        revenue_grouping_sets,
    )
    from flink_kmeans_clustering_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    got = revenue_grouping_sets(
        load_table(spark, "lineitem", SF_SMOKE),
        load_table(spark, "orders", SF_SMOKE),
        load_table(spark, "customer", SF_SMOKE),
        load_table(spark, "nation", SF_SMOKE),
        load_table(spark, "region", SF_SMOKE),
    ).collect()
    by_gid = {}
    for r in got:
        by_gid.setdefault(r["gid"], []).append(r)
    # gid 0 = (region, nation) detail; 1 = per-region; 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1
    total = by_gid[3][0]
    assert total["region"] == "ALL" and total["nation"] == "ALL"
    # each level must re-aggregate to the same grand total
    for gid in (0, 1):
        assert sum(r["n_items"] for r in by_gid[gid]) == total["n_items"]
        assert abs(sum(r["revenue"] for r in by_gid[gid]) - total["revenue"]) < 1e-3


def test_profile_columns_counts_nulls_and_formats(spark):
    from flink_kmeans_clustering_spark.operators.relational import profile_columns
    import datetime as dt

    li = spark.createDataFrame(
        [
            (1.0, 10.5, 0.1, "A", dt.datetime(1996, 1, 1, 12, 30)),
            (2.0, None, 0.1, "R", dt.datetime(1997, 6, 2)),
            (2.0, 20.0, None, None, None),
        ],
        "l_quantity double, l_extendedprice double, l_discount double,"
        " l_returnflag string, l_shipdate timestamp",
    )
    rows = {r["col_name"]: r for r in profile_columns(li).collect()}
    assert rows["l_quantity"]["n_distinct"] == 2
    assert rows["l_extendedprice"]["n_nulls"] == 1
    assert rows["l_extendedprice"]["n_rows"] == 2  # count() skips NULLs
    assert rows["l_quantity"]["min_s"] == "1.000000"  # printf-stable render
    assert rows["l_shipdate"]["min_s"] == "1996-01-01 12:30:00"
    assert rows["l_returnflag"]["max_s"] == "R"


def test_upsert_three_merge_arms(spark):
    from flink_kmeans_clustering_spark.operators.relational import (
        upsert_customer_balances,
    )

    cust = spark.createDataFrame(
        [(1, "alice", 100.0, "AUTO"), (2, "bob", 50.0, "HOME")],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(1, 10.0), (1, 2.5), (3, 7.0)], "o_custkey long, o_totalprice double"
    )
    rows = {r["c_custkey"]: r for r in upsert_customer_balances(cust, orders).collect()}
    assert rows[1]["new_acctbal"] == 112.5 and rows[1]["n_orders"] == 2  # UPDATE
    assert rows[2]["new_acctbal"] == 50.0 and rows[2]["n_orders"] == 0   # keep
    assert rows[3]["c_name"] == "UNKNOWN" and rows[3]["new_acctbal"] == 7.0  # INSERT


def test_synth_partsupp_contract(spark):
    """4 distinct suppliers per part, value ranges, and partitioning
    independence (row-local derivation => identical under reshuffle)."""
    from pyspark.sql import functions as F
    from flink_kmeans_clustering_spark.operators.relational import synth_partsupp

    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    supplier = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    ps = synth_partsupp(part, supplier)
    n_part = part.count()
    assert ps.count() == 4 * n_part
    per = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n")
    )
    assert per.filter(F.col("n") != 4).count() == 0
    rng = ps.agg(
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_supplycost"), F.max("ps_supplycost"),
        F.min("ps_suppkey"), F.max("ps_suppkey"),
    ).first()
    assert 1 <= rng[0] and rng[1] <= 9999
    assert 1.0 <= rng[2] and rng[3] <= 999.99
    assert 0 <= rng[4] and rng[5] < supplier.count()
    again = synth_partsupp(part.repartition(7), supplier)
    assert ps.exceptAll(again).count() == 0
    assert again.exceptAll(ps).count() == 0


def test_synth_shipping_contract(spark):
    """Enrichment ranges, mode domain, and partitioning independence."""
    from pyspark.sql import functions as F
    from flink_kmeans_clustering_spark.operators.relational import (
        SHIP_MODES,
        synth_shipping,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    s = synth_shipping(li)
    assert s.count() == li.count()
    modes = {r["l_shipmode"] for r in s.select("l_shipmode").distinct().collect()}
    assert modes <= set(SHIP_MODES)
    rng = s.select(
        F.min(F.datediff("l_commitdate", F.col("l_shipdate").cast("date"))),
        F.max(F.datediff("l_commitdate", F.col("l_shipdate").cast("date"))),
        F.min(F.datediff("l_receiptdate", F.col("l_shipdate").cast("date"))),
        F.max(F.datediff("l_receiptdate", F.col("l_shipdate").cast("date"))),
    ).first()
    assert -30 <= rng[0] and rng[1] <= 30
    assert 1 <= rng[2] and rng[3] <= 30
    again = synth_shipping(li.repartition(7))
    assert s.exceptAll(again).count() == 0
    assert again.exceptAll(s).count() == 0


def test_validate_expectations_counts_and_verdicts(spark):
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.relational import (
        validate_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5), (1, None, -1), (2, "b", 5)],
        "id long, s string, v long",
    )
    out = {
        r["constraint"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in validate_expectations(
            df,
            [
                ("not_null(s)", F.col("s").isNull()),
                ("nonneg(v)", F.col("v") < 0),
            ],
            unique_cols=("id",),
        ).collect()
    }
    assert out == {
        "not_null(s)": (3, 1, False),
        "nonneg(v)": (3, 1, False),
        "unique(id)": (3, 1, False),
    }


def test_validate_expectations_all_pass(spark):
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.relational import (
        validate_expectations,
    )

    df = spark.createDataFrame([(1,), (2,)], "id long")
    rows = validate_expectations(
        df, [("not_null(id)", F.col("id").isNull())], unique_cols=("id",)
    ).collect()
    assert all(r["passed"] for r in rows)
