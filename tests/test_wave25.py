"""Wave-25 invariants: Bloom no-false-negatives + FP-rate theory band,
snapshot diff conservation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def test_bloom_pruning_guarantees(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.sketches import (
        _BPJ_BITS,
        _BPJ_K,
        bloom_pruned_join_count,
    )

    r = bloom_pruned_join_count(spark, sf_dir).collect()[0]
    # NO false negatives: every true key is kept -> rows_kept >= rows_exact
    assert r.n_keys_kept >= r.n_keys_true
    assert r.rows_kept >= r.rows_exact
    assert r.n_keys_kept - r.n_keys_true == r.n_false_pos
    # theory band: fp ~ (1 - e^{-kn/m})^k; allow a generous factor
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    n = o.select("o_orderkey").distinct().count()
    p = (1 - math.exp(-_BPJ_K * n / _BPJ_BITS)) ** _BPJ_K
    assert r.false_pos_rate <= max(4 * p, 0.02)
    assert 0.0 <= r.prune_fraction <= 1.0


def test_snapshot_diff_conserves_keys(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.history import (
        snapshot_diff_cdc,
    )

    rows = {r.op: r.n for r in snapshot_diff_cdc(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    keys = [r.o_orderkey for r in o.select("o_orderkey").collect()]
    v1 = {k for k in keys if k % 50 != 0}
    v2 = {k for k in keys if k % 41 != 0}
    assert rows.get("insert", 0) == len(v2 - v1)
    assert rows.get("delete", 0) == len(v1 - v2)
    both = v1 & v2
    updates = {k for k in both if k % 37 == 0}
    assert rows.get("update", 0) == len(updates)
    assert rows.get("unchanged", 0) == len(both) - len(updates)
    assert sum(rows.values()) == len(v1 | v2)
