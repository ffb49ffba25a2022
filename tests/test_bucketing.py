"""Bucketed co-located join: the no-shuffle witness (SURVEY §2.2)."""

from __future__ import annotations

import pytest

from aw3d30_parquet_spark.operators.bucketing import bucketed_equi_join, write_bucketed
from aw3d30_parquet_spark.plans import count_node, formatted_plan
from aw3d30_parquet_spark.session import register_views

SF = "/root/testdata/sf0.001"


def test_bucketed_join_eliminates_shuffle(spark):
    register_views(spark, SF)
    orders = spark.table("orders")
    customer = spark.table("customer")
    write_bucketed(orders, "orders_bucketed", "o_custkey", buckets=8)
    write_bucketed(customer, "customer_bucketed", "c_custkey", buckets=8)

    # force the non-broadcast path so the shuffle question is real
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_equi_join(
            spark, "orders_bucketed", "customer_bucketed", "o_custkey", "c_custkey"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert count_node(joined, "Exchange") == 0  # co-located: no shuffle

        # identical join over the unbucketed views shuffles both sides
        plain = orders.join(
            customer, orders.o_custkey == customer.c_custkey, "inner"
        )
        assert count_node(plain, "Exchange") == 2

        # and the result matches the plain join
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_b01_driver_query_join_is_shuffle_free(spark):
    """The registered b01 query: the fact-fact join itself contributes
    ZERO Exchange — the only shuffles in the whole plan are the
    post-join rollup (hash agg) and the final orderBy, i.e. exactly
    the two an already-co-located join leaves behind."""
    from aw3d30_parquet_spark.operators.bucketing import bucketed_fact_join

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_fact_join(spark, SF)
        plan = formatted_plan(df)
        assert "SortMergeJoin" in plan
        assert count_node(df, "Exchange") == 2  # agg + sort only
        # and it is not vacuous: the same join over the raw views pays
        # two more Exchanges (one per side)
        orders = spark.table("orders")
        lineitem = spark.table("lineitem")
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey, "inner"
        )
        assert count_node(plain, "Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_b02_dpp_subquery_on_fact_scan(spark):
    """b02: the executed plan must carry a dynamicpruning expression —
    the runtime dim result injected into the partitioned fact scan's
    partition filters — and never a cartesian product."""
    from aw3d30_parquet_spark.operators.bucketing import dpp_month_join

    df = dpp_month_join(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "CartesianProduct" not in plan
    # the dynamic filter must sit in the scan's PARTITION filters on
    # the partition column (plan toString truncates paths, so assert
    # on the filter line, not the directory name)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any(
        "ship_month" in ln and "dynamicpruning" in ln for ln in pf
    ), pf
