"""Wave-8 invariants beyond the oracle gate: bootstrap weight-law and CI
sanity, corr-matrix agreement with Spark's native estimator, seasonal
decomposition reassembly, ER score/threshold consistency, and WAV frame
energies re-derived via the stdlib ``wave`` module (independent decoder)."""

from __future__ import annotations

import io
import wave as wave_mod

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark import plans
from tscd_datalake_adapter_spark.operators.analytics import (
    feature_corr_matrix,
    poisson_bootstrap_ci,
    seasonal_decompose_daily,
)
from tscd_datalake_adapter_spark.operators.mlprep import er_match_scores
from tscd_datalake_adapter_spark.operators.multimodal import (
    _FRAME_LEN,
    _wav_payload,
    wav_frame_energy,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    row = poisson_bootstrap_ci(spark, sf_dir).collect()[0]
    assert row.n_replicas == 100
    assert row.ci_lo_p05 <= row.boot_median <= row.ci_hi_p95
    assert row.ci_lo_p05 <= row.point_mean <= row.ci_hi_p95
    # CI width must be a small fraction of the mean at n≈1500 rows
    assert (row.ci_hi_p95 - row.ci_lo_p05) < 0.2 * row.point_mean


def test_corr_matrix_matches_native_estimator(spark, sf_dir):
    """The decimal-moment derivation must agree with Spark's own float
    ``corr`` to float tolerance (the decimal path exists for cross-engine
    bit-stability, not to compute something different)."""
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        (r.feature_x, r.feature_y): r.corr
        for r in feature_corr_matrix(spark, sf_dir).collect()
    }
    assert len(got) == 6
    for (a, b), v in got.items():
        native = li.agg(F.corr(a, b)).collect()[0][0]
        assert abs(v - native) < 1e-6, (a, b, v, native)


def test_seasonal_decomposition_reassembles(spark, sf_dir):
    """total == trend + seasonal + remainder (to rounding) wherever the
    trend is defined — the defining identity of additive decomposition."""
    rows = seasonal_decompose_daily(spark, sf_dir).collect()
    assert rows
    interior = [r for r in rows if r.trend is not None]
    assert len(interior) >= len(rows) - 6  # only 3 edge days per side lack trend
    for r in interior:
        assert abs(r.total - (r.trend + r.seasonal + r.remainder)) < 5e-6


def test_er_scores_consistent_with_threshold(spark):
    # sf0.001's 150 customers yield no blocked pair within 500 cents per
    # nation; the pair population the scorer ranks needs sf0.01.
    rows = er_match_scores(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r.is_match == (r.score >= 18)
        assert r.diff_cents <= 500
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_er_match_plan_is_blocked_equi_join(spark, sf_dir):
    plan = plans.formatted_plan(er_match_scores(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_wav_frame_energy_matches_stdlib_decoder(spark, sf_dir):
    """Re-derive every frame energy through the stdlib ``wave`` module —
    a decoder the repo did not write — so the repo's RIFF walk and the
    oracle's closed form are BOTH checked against a third implementation."""
    got = {
        (r.doc_id, r.frame_id): r.energy
        for r in wav_frame_energy(spark, sf_dir).collect()
    }
    assert got
    expected = {}
    for doc_id in range(60):
        if doc_id % 3 != 1:
            continue
        with wave_mod.open(io.BytesIO(_wav_payload(doc_id))) as w:
            assert w.getsampwidth() == 1
            samples = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.uint8
            )
        k = samples.size // _FRAME_LEN
        dev = (samples[: k * _FRAME_LEN].astype(np.int64) - 128).reshape(
            k, _FRAME_LEN
        )
        for f, e in enumerate((dev * dev).sum(axis=1)):
            expected[(doc_id, f)] = int(e)
    assert got == expected
