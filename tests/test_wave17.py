"""Wave-17 invariants beyond oracle parity: independent Python/numpy
recomputation of AUC, PCA loadings, silhouette, JL ratios, CF cosines,
calibration Brier, and forget-cascade count conservation."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def test_roc_auc_matches_scipy_style_mannwhitney(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import roc_auc_eval

    rows = {r.grp: r for r in roc_auc_eval(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderstatus"
    ).collect()
    scores = [math.floor(r.o_totalprice / 1000.0) for r in o]
    ys = [1 if r.o_orderstatus == "F" else 0 for r in o]
    # average-rank Mann-Whitney by hand
    import collections

    def auc(sc, yy):
        by = collections.Counter(sc)
        ranks = {}
        cum = 0
        for s in sorted(by):
            ranks[s] = cum + (by[s] + 1) / 2.0
            cum += by[s]
        npos = sum(yy)
        nneg = len(yy) - npos
        r = sum(ranks[s] for s, y in zip(sc, yy) if y == 1)
        return (r - npos * (npos + 1) / 2.0) / (npos * nneg)

    assert abs(rows["ALL"].auc - round(auc(scores, ys), 6)) < 1e-6
    for grp in set(r.o_orderpriority for r in o):
        sub = [(s, y) for s, y, g in zip(scores, ys,
                                         [r.o_orderpriority for r in o])
               if g == grp]
        want = auc([s for s, _ in sub], [y for _, y in sub])
        assert abs(rows[grp].auc - round(want, 6)) < 1e-6


def test_pca_matches_numpy_eigh(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        _PCA_COLS,
        pca_top_component_power,
    )

    rows = {r.feature: r for r in pca_top_component_power(spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "l_revenue"
            ),
        )
        .toPandas()
    )
    c = np.corrcoef(li[_PCA_COLS].to_numpy().T)
    vals, vecs = np.linalg.eigh(c)
    v = vecs[:, -1]
    if v.sum() < 0:
        v = -v
    got = np.array([rows[f].loading for f in _PCA_COLS])
    assert np.allclose(got, v, atol=1e-3), (got, v)
    assert abs(rows[_PCA_COLS[0]].eigenvalue - vals[-1]) < 1e-3


def test_silhouette_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.similarity import (
        clustering_silhouette_eval,
    )

    rows = {r.label: r for r in clustering_silhouette_eval(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    X = np.stack(e["embedding"].to_numpy()).astype("float64")
    labels = e["label"].to_numpy()
    cents = {l: X[labels == l].mean(axis=0) for l in np.unique(labels)}
    sils = []
    for x, l in zip(X, labels):
        a = np.linalg.norm(x - cents[l])
        b = min(np.linalg.norm(x - cents[m]) for m in cents if m != l)
        sils.append((b - a) / max(a, b))
    assert abs(rows[-1].mean_silhouette - float(np.mean(sils))) < 1e-3
    assert rows[-1].n == len(X)
    assert sum(rows[l].n for l in rows if l >= 0) == len(X)


def test_jl_distortion_concentrates(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.similarity import (
        _JL_SLICE,
        _jl_signs,
        jl_projection_distortion,
    )

    rows = jl_projection_distortion(spark, sf_dir).collect()
    n_total = rows[0].n_total
    assert n_total > 1000
    mean_ratio = rows[0].mean_ratio
    assert 0.7 < mean_ratio < 1.3  # JL: ratios concentrate near 1
    # recompute with numpy: mean over all pairs of the projected/original
    # squared-distance ratio must land near the engine's answer
    e = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _JL_SLICE)
        .orderBy("vec_id")
        .toPandas()
    )
    X = np.stack(e["embedding"].to_numpy()).astype("float64")
    S = np.array(_jl_signs(), dtype="float64")
    Y = (X @ S.T) / 4.0
    ratios = []
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            d0 = ((X[i] - X[j]) ** 2).sum()
            if d0 > 1e-9:
                ratios.append(((Y[i] - Y[j]) ** 2).sum() / d0)
    assert abs(mean_ratio - float(np.mean(ratios))) < 1e-3
    assert n_total == len(ratios)


def test_item_item_cosine_brute_force(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import (
        item_item_cosine_recs,
    )

    rows = item_item_cosine_recs(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(rows[i].cos >= rows[i + 1].cos for i in range(len(rows) - 1))
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 1000)
    l = load_table(spark, sf_dir, "lineitem")
    r = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .count()
        .collect()
    )
    import collections

    baskets = collections.defaultdict(dict)
    for row in r:
        baskets[row.o_custkey][row.l_partkey] = row["count"]
    baskets = {c: b for c, b in baskets.items() if len(b) <= 50}
    norms = collections.defaultdict(int)
    dots = collections.defaultdict(int)
    common = collections.defaultdict(int)
    for b in baskets.values():
        for p, rp in b.items():
            norms[p] += rp * rp
        ps = sorted(b)
        for i, p in enumerate(ps):
            for q in ps[i + 1:]:
                dots[(p, q)] += b[p] * b[q]
                common[(p, q)] += 1
    for row in rows:
        k = (row.part_a, row.part_b)
        assert common[k] == row.n_common >= 2
        assert dots[k] == row.dotsum
        want = dots[k] / math.sqrt(norms[row.part_a] * norms[row.part_b])
        assert abs(row.cos - round(want, 6)) < 1e-9


def test_calibration_brier_recompute(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import (
        calibration_reliability_bins,
    )

    rows = calibration_reliability_bins(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").collect()
    ps, ys = [], []
    for r in o:
        z = (r.o_totalprice - 150000.0) / 100000.0
        ps.append(round(1.0 / (1.0 + math.exp(-z)), 12))
        ys.append(1 if r.o_orderstatus == "F" else 0)
    brier = sum((p - y) ** 2 for p, y in zip(ps, ys)) / len(ps)
    assert abs(rows[0].brier - brier) < 1e-5
    assert sum(r.n for r in rows) == len(ps)
    # per-bin mean_pred must sit inside the bin's nominal range
    for r in rows:
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 + (0.01 if r.bin == 9 else 0)
        assert lo - 1e-9 <= r.mean_pred <= hi + 1e-9


def test_forget_cascade_conserves_counts(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import (
        forget_user_cascade_audit,
    )

    rows = {r.table_name: r for r in forget_user_cascade_audit(spark, sf_dir).collect()}
    for t in ("customer", "orders", "lineitem", "events"):
        df = load_table(spark, sf_dir, t)
        assert rows[t].n_forgotten + rows[t].n_retained == df.count()
    # transitivity: forgotten lineitem rows belong to forgotten customers'
    # orders only
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    want = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("o_custkey") % 97 == 0)
        .count()
    )
    assert rows["lineitem"].n_forgotten == want
