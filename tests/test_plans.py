"""Physical-plan property tests (SURVEY.md §4.2): pushdown, pruning,
broadcast, top-k — the 100 TB contract, checked on the actual plans."""

from __future__ import annotations

from tscd_datalake_adapter_spark import plans
from tscd_datalake_adapter_spark.operators.relational import (
    customers_per_region,
    exists_probe,
    local_supplier_volume,
    pricing_summary,
    revenue_forecast,
    topk_orders_global,
)


def test_q6_filters_push_to_scan(spark, sf_dir):
    df = revenue_forecast(spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed and "l_quantity" in pushed and "l_discount" in pushed


def test_q1_prunes_columns(spark, sf_dir):
    df = pricing_summary(spark, sf_dir)
    cols = plans.read_schema_columns(df)
    assert cols, "no ReadSchema found"
    # only the 7 needed columns are read, not all 12 of lineitem
    assert set(cols) <= {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }


def test_dimension_joins_broadcast(spark, sf_dir):
    assert plans.has_broadcast_join(customers_per_region(spark, sf_dir))
    assert plans.has_broadcast_join(local_supplier_volume(spark, sf_dir))


def test_topk_uses_take_ordered(spark, sf_dir):
    assert plans.has_take_ordered(topk_orders_global(spark, sf_dir))


def test_exists_probe_pushes_key(spark, sf_dir):
    pushed = " ".join(plans.pushed_filters(exists_probe(spark, sf_dir)))
    assert "o_orderkey" in pushed


def test_codegen_present(spark, sf_dir):
    assert plans.codegen_stage_count(pricing_summary(spark, sf_dir)) >= 1
