"""Export-tier invariants beyond the oracle gate (test_oracle_parity
covers cell-exact parity for every registered query): id contiguity and
equivalence to the single-window form, fact-cardinality preservation of
the point-in-time join, ECDF monotonicity, shard-plan completeness, and
the plan shapes (broadcast offset table, no nested-loop PIT join, no
unpartitioned window over base rows)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark import plans
from tscd_datalake_adapter_spark.operators.export import (
    assign_stable_row_ids,
    balanced_shard_export_plan,
    ecdf_normalize_quality,
    stable_row_ids,
)
from tscd_datalake_adapter_spark.operators.history import pit_scd2_feature_join
from tscd_datalake_adapter_spark.sources import load_table


def test_stable_row_ids_contiguous_and_equal_to_global_window(spark, sf_dir):
    """The distributed two-phase assignment must equal row_number() over a
    global sort exactly — every id, not just the registered sample."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    got = {
        r.o_orderkey: r.rid
        for r in assign_stable_row_ids(o, "o_orderkey").collect()
    }
    keys = sorted(got)
    assert [got[k] for k in keys] == list(range(len(keys)))


def test_stable_row_ids_bucket_width_irrelevant(spark, sf_dir):
    """Ids are a function of the key order alone; the bucket width is a
    physical knob (partition sizing), never a semantic one."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    a = assign_stable_row_ids(o, "o_orderkey", 4096).collect()
    b = assign_stable_row_ids(o, "o_orderkey", 257).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stable_row_ids_plan_shape(spark, sf_dir):
    df = stable_row_ids(spark, sf_dir)
    plan = plans.formatted_plan(df)
    assert "BroadcastHashJoin" in plan  # offset table broadcast, not shuffled
    assert plans.unpartitioned_windows_over_unaggregated_input(df) == []


def test_pit_join_preserves_fact_cardinality(spark, sf_dir):
    """Half-open SCD2 intervals partition time per user: LEFT JOIN output
    rows == purchase rows, with no duplication and no drop."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    n_purchases = e.where(F.col("event_type") == "purchase").count()
    out = pit_scd2_feature_join(spark, sf_dir)
    assert out.count() == n_purchases
    assert (
        out.groupBy("event_id").count().where(F.col("count") > 1).count() == 0
    )


def test_pit_join_is_equi_keyed_not_nested_loop(spark, sf_dir):
    plan = plans.formatted_plan(pit_scd2_feature_join(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pit_join_state_is_past_only(spark, sf_dir):
    """Training-serving leakage check: the joined state's valid_from must
    be <= the purchase timestamp (never a later state)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_state = (
        e.where(F.col("event_type") != "purchase")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("first_ts"))
    )
    out = pit_scd2_feature_join(spark, sf_dir)
    early = (
        out.join(first_state, "user_id")
        .where(
            (F.col("state_at_purchase") == "<none>")
            & (F.col("purchase_ts") >= F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        )
        .count()
    )
    assert early == 0  # '<none>' only for purchases before the first state


def test_ecdf_monotone_and_bounded(spark, sf_dir):
    rows = ecdf_normalize_quality(spark, sf_dir).collect()
    assert rows
    by_chars = sorted((r.n_chars, r.ecdf_q) for r in rows)
    qs = [q for _, q in by_chars]
    assert all(a <= b for a, b in zip(qs, qs[1:]))
    assert all(0.0 < q <= 1.0 for q in qs)


def test_shard_plan_complete_and_accounts_for_corpus(spark, sf_dir):
    rows = balanced_shard_export_plan(spark, sf_dir).collect()
    assert [r.shard for r in rows] == list(range(16))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
