"""Wave-13 invariants beyond oracle parity: Markov stationary vector
recomputed by independent Python power iteration, IRLS betas re-derived
with numpy from raw features, and linear gap-fill recomputed per user."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators.analytics import (
    logistic_regression_returnflag,
)
from tscd_datalake_adapter_spark.operators.history import (
    event_transition_matrix,
    gap_fill_interpolate_daily,
    markov_stationary_distribution,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_markov_stationary_matches_python_power_iteration(spark, sf_dir):
    rows = markov_stationary_distribution(spark, sf_dir).collect()
    total = sum(r.pi_stationary for r in rows)
    assert abs(total - 1.0) < 1e-4
    tm = event_transition_matrix(spark, sf_dir).collect()
    states = sorted({r.prev for r in tm})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    P = np.zeros((k, k))
    for r in tm:
        if r.curr in idx:
            P[idx[r.prev], idx[r.curr]] = round(
                r.n / sum(x.n for x in tm if x.prev == r.prev), 12
            )
    pi = np.full(k, round(1.0 / k, 9))
    for _ in range(5):
        nxt = pi @ P
        pi = np.round(nxt / nxt.sum(), 9)
    for r in rows:
        assert abs(r.pi_stationary - round(pi[idx[r.state]], 6)) < 1e-5


def test_logreg_betas_match_numpy_irls(spark, sf_dir):
    row = logistic_regression_returnflag(spark, sf_dir).collect()[0]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.when(F.col("l_returnflag") == "R", 1.0)
            .otherwise(0.0)
            .alias("y"),
            (F.col("l_quantity") / 50.0).alias("x1"),
            (F.col("l_discount") * 10.0).alias("x2"),
        )
        .collect()
    )
    y = np.array([r.y for r in li])
    X = np.column_stack(
        [np.ones(len(li)), [r.x1 for r in li], [r.x2 for r in li]]
    )
    assert row.n_rows == len(li)
    beta = np.zeros(3)
    for _ in range(2):
        z = X @ beta
        p = 1.0 / (1.0 + np.exp(-z))
        w = p * (1.0 - p)
        A = X.T @ (X * w[:, None])
        g = X.T @ (y - p)
        beta = np.round(beta + np.linalg.solve(A, g), 9)
    assert abs(row.beta_intercept - round(beta[0], 6)) < 1e-4
    assert abs(row.beta_quantity - round(beta[1], 6)) < 1e-4
    assert abs(row.beta_discount - round(beta[2], 6)) < 1e-4
    # Newton from beta=0 must improve the log-likelihood over the null model
    ll_null = float(len(li)) * math.log(0.5)
    z = X @ beta
    ll = float(np.sum(y * z - np.log1p(np.exp(z))))
    assert ll > ll_null


def test_gap_fill_interpolation_matches_python(spark, sf_dir):
    rows = {r.user_id: r for r in gap_fill_interpolate_daily(spark, sf_dir).collect()}
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 100)
        .select("user_id", F.to_date("ts").alias("d"), "ts", "value")
        .collect()
    )
    by_user = defaultdict(dict)
    for r in e:
        cur = by_user[r.user_id].get(r.d)
        if cur is None or r.ts > cur[0] or (r.ts == cur[0] and r.value > cur[1]):
            by_user[r.user_id][r.d] = (r.ts, r.value)
    checked = 0
    for uid, daymap in list(by_user.items())[:10]:
        days = sorted(daymap)
        d0, d1 = days[0], days[-1]
        n_days = (d1 - d0).days + 1
        obs = {d: v for d, (_, v) in daymap.items()}
        total = 0.0
        import datetime

        prev_d = None
        for off in range(n_days):
            d = d0 + datetime.timedelta(days=off)
            if d in obs:
                fv = obs[d]
                prev_d = d
            else:
                nxt = next(x for x in days if x > d)
                span = (nxt - prev_d).days
                fv = obs[prev_d] + (obs[nxt] - obs[prev_d]) * (
                    (d - prev_d).days / span
                )
            total += round(fv, 6)
        got = rows[uid]
        assert got.n_days == n_days
        assert got.n_observed == len(days)
        assert got.n_interpolated == n_days - len(days)
        assert abs(got.checksum - round(total, 6)) < 1e-3
        checked += 1
    assert checked > 0
