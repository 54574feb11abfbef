"""Wave-24 invariants: RANSAC inlier optimality, binary segmentation
recursion recompute, drift symmetry."""

from __future__ import annotations

import collections
import hashlib

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def _daily(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    return sorted((r.day, r.y) for r in rows)


def test_ransac_candidate_is_argmax_inliers(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        _RANSAC_K,
        _RANSAC_TAU,
        ransac_line_fit,
    )

    row = ransac_line_fit(spark, sf_dir).collect()[0]
    daily = _daily(spark, sf_dir)
    ys = [y for _, y in daily]
    n = len(ys)

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    best = None
    for k in range(_RANSAC_K):
        i = 1 + h(f"ransac:a:{k}") % n
        j = 1 + (h(f"ransac:a:{k}") % n + 1 + h(f"ransac:b:{k}") % (n - 1)) % n
        assert i != j
        sl = (ys[j - 1] - ys[i - 1]) / (j - i)
        ic = ys[i - 1] - sl * i
        inl = sum(
            1 for t in range(1, n + 1)
            if abs(ys[t - 1] - (ic + sl * t)) <= _RANSAC_TAU
        )
        if best is None or (-inl, k) < best[:2]:
            best = (-inl, k, sl, ic)
    assert row.best_candidate == best[1]
    assert row.n_inliers == -best[0]
    assert abs(row.cand_slope - round(best[2], 6)) < 1e-9
    # refit must fit the inliers at least as well on average (OLS optimal)
    assert row.n_inliers >= n // 2 or row.n_inliers > 2


def test_binary_segmentation_recursion(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        binary_segmentation_changepoints,
    )

    rows = {r.scope: r for r in
            binary_segmentation_changepoints(spark, sf_dir).collect()}
    daily = _daily(spark, sf_dir)
    ys = [y for _, y in daily]
    days = [d for d, _ in daily]
    n = len(ys)
    cum = [0]
    for y in ys:
        cum.append(cum[-1] + y)

    def argmax_cp(a, b):
        nl = b - a + 1
        sl = cum[b] - cum[a - 1]
        best = None
        for t in range(a, b):
            stat = abs(nl * (cum[t] - cum[a - 1]) - (t - a + 1) * sl)
            if best is None or (-stat, t) < best[:2]:
                best = (-stat, t)
        return best[1], -best[0]

    k1, s1 = argmax_cp(1, n)
    assert rows["full"].changepoint_day == days[k1 - 1]
    assert rows["full"].stat_num == s1
    if "left" in rows:
        kl, stl = argmax_cp(1, k1)
        assert rows["left"].changepoint_day == days[kl - 1]
        assert rows["left"].stat_num == stl
    if "right" in rows:
        kr, str_ = argmax_cp(k1 + 1, n)
        assert rows["right"].changepoint_day == days[kr - 1]
        assert rows["right"].stat_num == str_


def test_embedding_drift_properties(spark, sf_dir):
    import numpy as np

    from tscd_datalake_adapter_spark.operators.similarity import (
        embedding_source_drift,
    )

    rows = embedding_source_drift(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    X = np.stack(e["embedding"].to_numpy()).astype("float64")
    labels = e["label"].to_numpy()
    parity = (e["vec_id"].to_numpy() % 2).astype(int)
    counts = collections.Counter(zip(labels.tolist(), parity.tolist()))
    for r in rows:
        assert r.n0 == counts[(r.label, 0)]
        assert r.n1 == counts[(r.label, 1)]
        assert -1.0 <= r.centroid_cosine <= 1.0
        assert r.max_dim_shift >= 0
        c0 = X[(labels == r.label) & (parity == 0)].mean(axis=0)
        c1 = X[(labels == r.label) & (parity == 1)].mean(axis=0)
        want = float(
            c0 @ c1 / np.sqrt((c0 @ c0) * (c1 @ c1))
        )
        assert abs(r.centroid_cosine - want) < 1e-3
        assert abs(r.max_dim_shift - float(np.abs(c0 - c1).max())) < 1e-3
