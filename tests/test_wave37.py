"""Wave-37 invariants: Croston fold vs an independent Python model, PACF
vs a numpy Durbin-Levinson, local clustering coefficient vs brute force
over the materialized edge list."""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import h60
from tscd_datalake_adapter_spark.sources import load_table


def test_croston_matches_python_fold(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        croston_intermittent_forecast,
    )

    daily = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias(
                "day_idx"
            ),
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("q"))
        .where(h60(F.concat(F.lit("croston:"), F.col("day"))) % 3 == 0)
        .orderBy("day_idx")
        .collect()
    )
    series = [(r.day_idx, r.q) for r in daily][:40]
    assert len(series) >= 2, "fixture must provide an interval"
    z = float(series[0][1])
    p = None
    for (d_prev, _), (d, q) in zip(series, series[1:]):
        i = float(d - d_prev)
        p = i if p is None else 0.2 * i + 0.8 * p
        z = 0.2 * q + 0.8 * z
    r = croston_intermittent_forecast(spark, sf_dir).collect()[0]
    assert r.n_demand_days == len(series)
    assert abs(r.croston_size - z) < 1e-6
    assert abs(r.croston_interval - p) < 1e-6
    assert abs(r.forecast_per_day - z / p) < 1e-6


def test_pacf_matches_numpy_durbin_levinson(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        pacf_daily_events,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("y"))
        .orderBy("d")
        .collect()
    )
    y = np.array([r.y for r in rows], dtype=float)
    n = len(y)
    m = y.mean()
    c = [((y[: n - k] - m) * (y[k:] - m)).sum() for k in range(4)]
    r_ = [c[k] / c[0] for k in range(4)]
    phi11 = r_[1]
    phi22 = (r_[2] - r_[1] ** 2) / (1 - r_[1] ** 2)
    phi21 = phi11 - phi22 * phi11
    phi33 = (r_[3] - phi21 * r_[2] - phi22 * r_[1]) / (
        1 - phi21 * r_[1] - phi22 * r_[2]
    )
    got = pacf_daily_events(spark, sf_dir).collect()[0]
    assert got.n_days == n
    assert abs(got.pacf1 - phi11) < 1e-6
    assert abs(got.pacf2 - phi22) < 1e-6
    assert abs(got.pacf3 - phi33) < 1e-6
    # PACF values are correlations
    for v in (got.pacf1, got.pacf2, got.pacf3):
        assert -1.0 <= v <= 1.0


def test_lcc_matches_bruteforce_graph(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.text import (
        local_clustering_coefficient,
    )

    dt = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr("filter(split(text, ' '), x -> x != '')")
                )
            ).alias("tok"),
        )
        .distinct()
        .collect()
    )
    docs: dict[int, set[str]] = {}
    for r in dt:
        docs.setdefault(r.doc_id, set()).add(r.tok)
    from collections import Counter

    pair_docs: Counter = Counter()
    for toks in docs.values():
        for a, b in itertools.combinations(sorted(toks), 2):
            pair_docs[(a, b)] += 1
    edges = {p for p, w in pair_docs.items() if w >= 100}
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lcc = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(
            1
            for a, b in itertools.combinations(sorted(nbrs), 2)
            if (a, b) in edges
        )
        lcc[v] = (d, t, round(2 * t / (d * (d - 1)), 6))
    expect = sorted(
        ((v, *s) for v, s in lcc.items()),
        key=lambda r: (-r[3], r[0]),
    )[:20]
    got = [
        (r.tok, r.degree, r.n_triangles, r.lcc)
        for r in local_clustering_coefficient(spark, sf_dir).collect()
    ]
    assert got == [(v, d, t, c) for v, d, t, c in expect]
