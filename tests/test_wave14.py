"""Wave-14 invariants beyond oracle parity: novelty saturation curve,
DiD internal consistency vs its own cell means, and run-length probe
arithmetic/bounds."""

from __future__ import annotations

from tscd_datalake_adapter_spark.operators.analytics import did_event_effect
from tscd_datalake_adapter_spark.operators.io import storage_run_length_probe
from tscd_datalake_adapter_spark.operators.mining import (
    trigram_novelty_daily,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_trigram_novelty_saturates(spark, sf_dir):
    rows = sorted(
        trigram_novelty_daily(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    # everything is novel on the first observed day
    assert rows[0].novelty_rate == 1.0
    assert rows[0].n_novel == rows[0].n_distinct_trigrams
    for r in rows:
        assert 0.0 <= r.novelty_rate <= 1.0
        assert r.n_novel <= r.n_distinct_trigrams
    # novel counts over all days partition the global distinct-trigram set
    total_novel = sum(r.n_novel for r in rows)
    late = rows[len(rows) // 2 :]
    early = rows[: len(rows) // 2]
    # saturation: the late half is on average less novel than the early half
    avg = lambda xs: sum(x.novelty_rate for x in xs) / len(xs)
    assert avg(late) < avg(early)
    assert total_novel >= rows[0].n_distinct_trigrams


def test_did_internally_consistent(spark, sf_dir):
    r = did_event_effect(spark, sf_dir).collect()[0]
    expect = (r.mean_treated_post - r.mean_treated_pre) - (
        r.mean_control_post - r.mean_control_pre
    )
    assert abs(r.did_estimate - expect) < 2e-6
    n = load_table(spark, sf_dir, "events").count()
    assert (
        r.n_control_pre + r.n_control_post + r.n_treated_pre + r.n_treated_post
        == n
    )


def test_run_length_probe_arithmetic(spark, sf_dir):
    rows = storage_run_length_probe(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "lineitem").count()
    assert {r.column_name for r in rows} == {"l_returnflag", "l_linestatus"}
    for r in rows:
        assert r.n_rows == n
        assert 1 <= r.n_runs <= r.n_rows
        assert abs(r.avg_run_length - round(r.n_rows / r.n_runs, 6)) < 1e-9
        assert r.dict_friendly == (r.n_distinct <= 1000)
        assert r.rle_friendly == (r.n_rows / r.n_runs >= 2.0)
        # enum columns: runs must beat one-per-row by construction chance
        assert r.n_distinct <= 3
