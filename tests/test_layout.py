"""Bucketed co-located joins and skew salting (plans/layout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark import plans
from tscd_datalake_adapter_spark.plans.layout import salted_join, write_bucketed
from tscd_datalake_adapter_spark.sources import load_table

import pytest

pytestmark = pytest.mark.smoke


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bucketed", ["l_orderkey"], 8
    )
    a = spark.table("li_bucketed")
    b = spark.table("o_bucketed")
    # Disable broadcast so the join would otherwise shuffle.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "l_orderkey")
        plan = plans.formatted_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # Bucketed co-location: no Exchange on either side of the join.
        assert "Exchange hashpartitioning" not in plan
        # and the result is right
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_salted_join_correctness(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = li.join(s, "s_suppkey").groupBy("s_suppkey").count()
    salted = salted_join(li, s, "s_suppkey", n_salts=4).groupBy("s_suppkey").count()
    assert sorted(tuple(r) for r in plain.collect()) == sorted(
        tuple(r) for r in salted.collect()
    )
