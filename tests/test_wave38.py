"""Wave-38 invariants: minimax isotonic fit == an independent Python PAVA,
subsequence support == brute-force enumeration, tf-idf pair cosine ==
numpy dense computation over the capped vocabulary."""

from __future__ import annotations

import itertools
import math

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def _pava(y: list[float], w: list[float]) -> list[float]:
    """Weighted pool-adjacent-violators (the sequential algorithm the
    minimax query must reproduce)."""
    blocks = [[yi * wi, wi, 1] for yi, wi in zip(y, w)]  # [sum, weight, n]
    out: list[list[float]] = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] * out[-1][1] > out[-1][0] * out[-2][1]:
            s2, w2, n2 = out.pop()
            s1, w1, n1 = out.pop()
            out.append([s1 + s2, w1 + w2, n1 + n2])
    fit: list[float] = []
    for s, wt, n in out:
        fit.extend([s / wt] * n)
    return fit


def test_isotonic_matches_pava(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import (
        isotonic_calibration_bins,
    )

    rows = isotonic_calibration_bins(spark, sf_dir).collect()
    y = [r.u / r.n for r in rows]
    w = [float(r.n) for r in rows]
    fit = _pava(y, w)
    for r, f in zip(rows, fit):
        assert abs(r.iso_rate - round(f, 6)) < 1e-9
    # monotone nondecreasing by construction
    iso = [r.iso_rate for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))


def test_prefixspan_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mining import (
        prefixspan_topk_patterns,
    )

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 300)
        .select("user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    sessions: dict[tuple, list[str]] = {}
    last_ts: dict[int, int] = {}
    sess_no: dict[int, int] = {}
    for r in e:
        us = int(r.user_id)
        t = int(r.ts.timestamp() * 1_000_000)
        if us not in last_ts or t - last_ts[us] > 30 * 60 * 1_000_000:
            sess_no[us] = sess_no.get(us, 0) + 1
        last_ts[us] = t
        sessions.setdefault((us, sess_no[us]), []).append(r.event_type)
    support: dict[str, set] = {}
    for key, types in sessions.items():
        head = types[:8]
        for c in itertools.combinations(head, 3):
            support.setdefault(">".join(c), set()).add(key)
    counts = sorted(
        ((p, len(s)) for p, s in support.items()),
        key=lambda x: (-x[1], x[0]),
    )[:15]
    got = [
        (r.pattern, r.support)
        for r in prefixspan_topk_patterns(spark, sf_dir).collect()
    ]
    assert got == counts


def test_tfidf_cosine_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.text import (
        tfidf_cosine_pairs_topk,
    )

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 120)
        .collect()
    }
    n_docs = len(docs)
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for did, text in docs.items():
        toks = [t for t in text.split(" ") if t]
        cnt: dict[str, int] = {}
        for t in toks:
            cnt[t] = cnt.get(t, 0) + 1
        tf[did] = cnt
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    vocab = sorted(t for t, d in df.items() if d <= 90)
    idx = {t: i for i, t in enumerate(vocab)}
    m = np.zeros((n_docs, len(vocab)))
    ids = sorted(docs)
    for row, did in enumerate(ids):
        for t, c in tf[did].items():
            if t in idx:
                m[row, idx[t]] = c * math.log(n_docs / df[t])
    norms = np.sqrt((m**2).sum(1))
    best: list[tuple[float, int, int]] = []
    for i in range(n_docs):
        for j in range(i + 1, n_docs):
            if norms[i] == 0 or norms[j] == 0:
                continue
            cos = float(m[i] @ m[j] / (norms[i] * norms[j]))
            best.append((round(cos, 6), ids[i], ids[j]))
    best.sort(key=lambda x: (-x[0], x[1], x[2]))
    got = [
        (r.cosine, r.doc_a, r.doc_b)
        for r in tfidf_cosine_pairs_topk(spark, sf_dir).collect()
    ]
    for (gc, ga, gb), (ec, ea, eb) in zip(got, best[:20]):
        assert (ga, gb) == (ea, eb)
        assert abs(gc - ec) < 1e-5


def test_cuped_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        cuped_variance_reduction,
    )

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") < 300)
        .select("user_id", "event_type", "ts", "value")
        .collect()
    )
    import datetime

    split = datetime.datetime(2024, 1, 16)
    xs: dict[int, int] = {}
    ys: dict[int, float] = {}
    for r in e:
        u = int(r.user_id)
        xs.setdefault(u, 0)
        ys.setdefault(u, 0.0)
        if r.event_type == "view" and r.ts < split:
            xs[u] += 1
        if r.event_type == "purchase" and r.ts >= split:
            ys[u] += r.value
    users = sorted(xs)
    x = np.array([xs[u] for u in users], dtype=float)
    y = np.array([round(ys[u], 6) for u in users], dtype=float)
    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    y_adj = y - theta * (x - x.mean())
    r = cuped_variance_reduction(spark, sf_dir).collect()[0]
    assert r.n_users == len(users)
    assert abs(r.theta - theta) < 1e-4
    assert abs(r.var_y - np.var(y, ddof=1)) < 1e-3
    assert abs(r.var_y_adj - np.var(y_adj, ddof=1)) < 1e-3
    assert 0.0 <= r.variance_reduction <= 1.0
    assert r.var_y_adj <= r.var_y + 1e-9


def test_jackknife_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        jackknife_ratio_by_nation,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_nationkey", "o_totalprice")
        .collect()
    )
    from collections import defaultdict

    t_i = defaultdict(float)
    n_i = defaultdict(int)
    for r in rows:
        t_i[r.c_nationkey] += r.o_totalprice
        n_i[r.c_nationkey] += 1
    t = sum(t_i.values())
    n = sum(n_i.values())
    g = len(t_i)
    thetas = [(t - t_i[k]) / (n - n_i[k]) for k in sorted(t_i)]
    theta_dot = sum(thetas) / g
    ssd = sum((th - theta_dot) ** 2 for th in thetas)
    se = math.sqrt((g - 1) / g * ssd)
    r = jackknife_ratio_by_nation(spark, sf_dir).collect()[0]
    assert r.n_groups == g and r.n_orders == n
    assert abs(r.theta - t / n) < 1e-3
    assert abs(r.theta_jack_mean - theta_dot) < 1e-3
    assert abs(r.jack_se - se) < 1e-4


def test_image_clusters_pair_both_sides(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.multimodal import (
        image_dedup_clusters,
    )

    rows = image_dedup_clusters(spark, sf_dir).collect()
    assert rows, "must emit clusters"
    # member counts conserve and sizes are sorted
    sizes = [r.n_members for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    for r in rows:
        assert r.n_members == r.n_clean + r.n_perturbed
        # the cluster label is the minimum uid, so it's a member — the
        # top cluster must be multi-member (planted twins guarantee pairs)
    assert rows[0].n_members >= 2
