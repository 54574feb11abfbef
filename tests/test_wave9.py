"""Wave-9 checks via INDEPENDENT implementations (not the shared SQL
structure the oracle mirrors): numpy lstsq for the OLS solve, and a
pure-Python Kneser-Ney model for the bigram LM — plus the LM's defining
sum-to-one property, which neither the driver hash nor the oracle states."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from tscd_datalake_adapter_spark.operators.analytics import (
    ols_regression_coeffs,
)
from tscd_datalake_adapter_spark.operators.text import kneser_ney_bigram_lm
from tscd_datalake_adapter_spark.sources import load_table


def _py_kn_model(texts):
    bg = Counter()
    for t in texts:
        toks = [x for x in t.split(" ") if x != ""]
        bg.update(zip(toks, toks[1:]))
    c1, n_follow, n_prec = Counter(), Counter(), Counter()
    for (w1, w2), c in bg.items():
        c1[w1] += c
        n_follow[w1] += 1
        n_prec[w2] += 1
    t_total = float(len(bg))

    def p_kn(w1, w2):
        return max(bg[(w1, w2)] - 0.75, 0) / c1[w1] + (
            0.75 * n_follow[w1] / c1[w1]
        ) * (n_prec[w2] / t_total)

    return bg, c1, n_prec, p_kn


def test_kn_bigram_matches_python_model(spark, sf_dir):
    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    bg, _c1, _n_prec, p_kn = _py_kn_model(texts)
    rows = kneser_ney_bigram_lm(spark, sf_dir).collect()
    assert len(rows) == 30
    expected_top = sorted(
        ((c, w1, w2) for (w1, w2), c in bg.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:30]
    assert [(r.c, r.w1, r.w2) for r in rows] == expected_top
    for r in rows:
        assert abs(r.p_kn - p_kn(r.w1, r.w2)) < 5e-6


def test_kn_bigram_distribution_sums_to_one(spark, sf_dir):
    """Σ_w2 p_KN(w2|w1) == 1 for every context — the property that makes
    the estimate a probability model at all (and the one a wrong
    continuation-mass normalizer silently breaks)."""
    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    bg, c1, _n_prec, p_kn = _py_kn_model(texts)
    by_w1 = defaultdict(list)
    for w1, w2 in bg:
        by_w1[w1].append(w2)
    checked = 0
    for w1 in sorted(by_w1, key=lambda w: -c1[w])[:20]:
        # full conditional support = observed continuations PLUS the
        # smoothed mass spread over unseen types: sum over the whole
        # vocabulary of continuation types
        total = sum(p_kn(w1, w2) for w2 in _n_prec_keys(bg))
        assert abs(total - 1.0) < 1e-9, (w1, total)
        checked += 1
    assert checked == 20


def _n_prec_keys(bg):
    return {w2 for _w1, w2 in bg}


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    x = np.array([[1.0, r.l_quantity, r.l_discount] for r in li])
    y = np.array([r.l_extendedprice for r in li])
    beta, *_ = np.linalg.lstsq(x, y, rcond=None)
    pred = x @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    row = ols_regression_coeffs(spark, sf_dir).collect()[0]
    assert row.n == len(li)
    assert abs(row.beta0 - beta[0]) < 1e-4
    assert abs(row.beta_quantity - beta[1]) < 1e-5
    assert abs(row.beta_discount - beta[2]) < 1e-4
    assert abs(row.r2 - r2) < 1e-6
