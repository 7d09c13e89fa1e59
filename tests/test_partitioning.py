"""Skew/co-location utilities: salted join result parity, bucketed
join exchange elimination, repartition reuse.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.functions.partitioning import (
    repartition_for,
    salted_join,
    write_bucketed,
)
from pinterest_data_pipeline6_spark.plans.checks import executed_plan, final_plan
from pinterest_data_pipeline6_spark.sources.readers import table
from tests.conftest import df_to_sorted_rows

SF = "/root/testdata/sf0.01"


def test_salted_join_matches_plain_join(spark):
    orders = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey", "inner")
    salted = salted_join(orders, customer, "o_custkey", n_salts=8)
    assert df_to_sorted_rows(salted) == df_to_sorted_rows(plain)


def test_salted_join_is_deterministic(spark):
    orders = table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    a = salted_join(orders, customer, "o_custkey").count()
    b = salted_join(orders, customer, "o_custkey").count()
    assert a == b == orders.join(customer, "o_custkey").count()


def test_bucketed_join_has_no_exchange(spark):
    """With broadcast off (the 100 TB fact-fact case — neither side
    fits), identically-bucketed tables sort-merge join with ZERO
    exchanges: the bucket layout IS the shuffle, paid once at write."""
    orders = table(spark, SF, "orders")
    lineitem = table(spark, SF, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"),
        "b_lineitem",
        "l_orderkey",
        8,
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        expected = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_repartition_reuse_single_exchange(spark):
    li = repartition_for(table(spark, SF, "lineitem"), ["l_orderkey"], 8)
    agg1 = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    # the groupBy reuses the explicit hash partitioning: exactly the one
    # user-requested exchange appears, none added for the aggregate
    # (final_plan text includes the Initial Plan section — strip it)
    plan = final_plan(agg1).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan
