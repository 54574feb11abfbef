"""Behavior tests for the sketch + analytics operators (round 4).

The parity suite already verifies every registered query cell-for-cell
against DuckDB; these tests pin the STRUCTURAL guarantees the docstrings
claim (one-sided CM error, Bloom no-false-negatives, HLL error bounds,
EWMA fold semantics, planted-near-dup recall) that an oracle match alone
would not distinguish from coincidence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators.analytics import (
    anomaly_zscore_daily,
    dq_expectations_orders,
    ewma_user_value,
    median_ship_delay_histogram,
    temporal_split_embargo,
)
from tscd_datalake_adapter_spark.operators.sketches import (
    bloom_probe_decontamination,
    countmin_heavy_hitters,
    hll_distinct_tokens,
)
from tscd_datalake_adapter_spark.operators.similarity import (
    embedding_cosine_near_dup_lsh,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_countmin_is_one_sided(spark, sf_dir):
    """CM estimates NEVER undercount (min over d counters each >= truth)."""
    rows = countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cm_estimate >= r.true_count
        assert r.overcount == r.cm_estimate - r.true_count >= 0


def test_hll_error_within_bounds(spark, sf_dir):
    """HLL with m=256 has theoretical sigma ~= 1.04/sqrt(256) = 6.5%;
    require < 4 sigma. Also both estimator branches must be exercised:
    unigram cardinality is far below m (linear counting), bigram far
    above the 2.5m cutoff (raw estimator)."""
    rows = {r.unit: r for r in hll_distinct_tokens(spark, sf_dir).collect()}
    assert set(rows) == {"unigram", "bigram"}
    for r in rows.values():
        assert r.rel_error < 0.26, f"{r.unit}: rel_error {r.rel_error}"
    assert rows["unigram"].n_zero > 0  # linear-counting branch
    assert rows["bigram"].n_exact > 2.5 * 256  # raw-estimator branch


def test_bloom_never_false_negative(spark, sf_dir):
    """Every truly-blocked token must be flagged: n_flagged >= n_true per
    source, and false positives are exactly flagged - true."""
    for r in bloom_probe_decontamination(spark, sf_dir).collect():
        assert r.n_flagged >= r.n_true
        assert r.n_false_pos == r.n_flagged - r.n_true
        assert 0 <= r.n_false_pos <= r.n_probed


def test_ewma_fold_matches_reference(spark, sf_dir):
    """The grouped-map EWMA equals a driver-side recomputation of the same
    ordered fold for a few users."""
    got = {r.user_id: r for r in ewma_user_value(spark, sf_dir).collect()}
    e = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") < 5) & F.col("value").isNotNull())
        .select("user_id", "value", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(e, key=lambda r: (r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(float(r.value))
    for uid, vals in by_user.items():
        s = vals[0]
        for x in vals[1:]:
            s = s * 0.75 + x * 0.25
        assert got[uid].n_events == len(vals)
        assert got[uid].ewma == round(s, 6)


def test_anomaly_zscore_shape(spark, sf_dir):
    """Anomaly rows only appear after a full 7-day history, and the flag
    agrees with the reported z-score."""
    rows = anomaly_zscore_daily(spark, sf_dir).collect()
    assert rows, "fixture spans a month of events; expect scored days"
    for r in rows:
        assert r.is_anomaly == (abs(r.zscore) > 2.0)
        assert r.day >= "2024-01-08"  # first 7 days are history only


def test_median_histogram_is_exact(spark, sf_dir):
    """p50/p90 from the bounded histogram equal percentile_disc computed
    directly over the joined delays."""
    import duckdb

    got = {
        r.returnflag: r
        for r in median_ship_delay_histogram(spark, sf_dir).collect()
    }
    want = duckdb.sql(
        f"""
        SELECT l.l_returnflag AS rf,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY
                 datediff('day', o.o_orderdate, l.l_shipdate)) AS p50,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY
                 datediff('day', o.o_orderdate, l.l_shipdate)) AS p90
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
        """
    ).fetchall()
    for rf, p50, p90 in want:
        assert got[rf].p50_delay == p50
        assert got[rf].p90_delay == p90


def test_temporal_split_no_leakage(spark, sf_dir):
    rows = {r.split: r for r in temporal_split_embargo(spark, sf_dir).collect()}
    assert set(rows) == {"train", "test", "embargo"}
    assert rows["train"].max_ts < "2024-01-20"
    assert rows["test"].min_ts >= "2024-01-22"
    assert "2024-01-20" <= rows["embargo"].min_ts
    assert rows["embargo"].max_ts < "2024-01-22"


def test_dq_expectations_cover_fixture(spark, sf_dir):
    rows = {r.expectation: r for r in dq_expectations_orders(spark, sf_dir).collect()}
    assert len(rows) == 5
    # fixture orders are clean on keys; all expectations checked over all rows
    assert rows["orderkey_not_null"].passed
    assert rows["orderkey_unique"].passed
    n = {r.n_rows for r in rows.values()}
    assert len(n) == 1 and n.pop() > 0


def test_embedding_near_dup_recall_on_planted(spark, sf_dir):
    """Every planted twin pair (i, i+100000) for i < 25 must be found by
    the LSH candidate path — recall 1.0 at cosine ~0.9999 — and nothing
    else qualifies on this fixture (max organic cosine ~0.51)."""
    rows = embedding_cosine_near_dup_lsh(spark, sf_dir).collect()
    pairs = {(r.vec_a, r.vec_b) for r in rows}
    expected = {(i, i + 100000) for i in range(25)}
    assert pairs == expected
    for r in rows:
        assert r.cos >= 0.99
