"""Wave-22 invariants: AP vs sklearn-style recompute, gains monotonicity,
KS vs scipy-style recompute, stump vs brute-force split search."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def _scored_orders(spark, sf_dir):
    return [
        (math.floor(r.o_totalprice / 1000.0),
         1 if r.o_orderstatus == "F" else 0,
         r.o_orderstatus,
         r.o_totalprice)
        for r in load_table(spark, sf_dir, "orders").collect()
    ]


def test_average_precision_matches_recompute(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import (
        average_precision_eval,
    )

    row = average_precision_eval(spark, sf_dir).collect()[0]
    data = _scored_orders(spark, sf_dir)
    hist = collections.Counter()
    pos = collections.Counter()
    for s, y, _, _ in data:
        hist[s] += 1
        pos[s] += y
    cn = cp = 0
    ap = 0.0
    for s in sorted(hist, reverse=True):
        cn += hist[s]
        cp += pos[s]
        ap += pos[s] * (cp / cn)
    npos = sum(pos.values())
    assert row.npos == npos and row.ntot == len(data)
    assert abs(row.average_precision - ap / npos) < 1e-5
    assert row.average_precision >= row.baseline_prevalence - 0.05


def test_lift_gains_monotone(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import lift_gain_deciles

    rows = sorted(lift_gain_deciles(spark, sf_dir).collect(),
                  key=lambda r: r.decile)
    for a, b in zip(rows, rows[1:]):
        assert a.cum_targeted < b.cum_targeted
        assert a.cum_captured <= b.cum_captured
        assert a.gain <= b.gain
    assert abs(rows[-1].gain - 1.0) < 1e-9  # last decile captures all
    assert abs(rows[-1].lift - 1.0) < 1e-9


def test_ks_matches_recompute(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        ks_test_two_sample,
    )

    row = ks_test_two_sample(spark, sf_dir).collect()[0]
    data = _scored_orders(spark, sf_dir)
    f = sorted(math.floor(p) for _, _, st, p in data if st == "F")
    o = sorted(math.floor(p) for _, _, st, p in data if st == "O")
    vals = sorted(set(f) | set(o))
    import bisect

    d = max(
        abs(bisect.bisect_right(f, v) / len(f)
            - bisect.bisect_right(o, v) / len(o))
        for v in vals
    )
    assert row.nf == len(f) and row.no == len(o)
    assert abs(row.d_stat - round(d, 6)) < 1e-6
    crit = 1.358 * math.sqrt((len(f) + len(o)) / (len(f) * len(o)))
    assert row.reject_h0 == (d > crit)


def test_stump_is_brute_force_optimal(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        decision_stump_train,
    )

    row = decision_stump_train(spark, sf_dir).collect()[0]
    data = _scored_orders(spark, sf_dir)
    hist = collections.Counter()
    pos = collections.Counter()
    for s, y, _, _ in data:
        hist[s] += 1
        pos[s] += y
    nt = sum(hist.values())
    pt = sum(pos.values())
    best = None
    cn = cp = 0
    for s in sorted(hist):
        cn += hist[s]
        cp += pos[s]
        if cn == nt:
            break
        nl, pl, nr, pr = cn, cp, nt - cn, pt - cp
        g = (nl - (pl * pl + (nl - pl) ** 2) / nl) + (
            nr - (pr * pr + (nr - pr) ** 2) / nr
        )
        if best is None or (round(g, 12), s) < best[:2]:
            best = (round(g, 12), s, nl, pl)
    g, s, nl, pl = best
    assert row.split_bin == s
    assert row.n_left == nl and row.pos_left == pl
    assert abs(row.weighted_gini - round(g / nt, 6)) < 1e-9
    assert 0.5 <= row.train_accuracy <= 1.0
