"""Wave-18 invariants beyond oracle parity: ARI recomputed from a Python
contingency build, RAKE scores recomputed per the paper's formula, and the
Holt backtest recomputed from raw monthly counts."""

from __future__ import annotations

import collections
import math
import re

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def test_cluster_label_ari_matches_python(spark, sf_dir):
    import numpy as np

    from tscd_datalake_adapter_spark.operators.similarity import (
        _lsh_plane_matrix,
        cluster_label_ari,
    )

    row = cluster_label_ari(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    X = np.stack(e["embedding"].to_numpy()).astype("float64")
    planes = _lsh_plane_matrix(1, 6)
    # mirror the fold: per-plane dot then sign (matmul is fine here — the
    # test needs the same bucket, not the same bits of the dot)
    buckets = ((X @ planes.T) >= 0.0) @ (1 << np.arange(6))
    cont = collections.Counter(zip(buckets.tolist(), e["label"].tolist()))
    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    s_ij = sum(c2(v) for v in cont.values())
    a = collections.Counter()
    b = collections.Counter()
    for (cl, lb), v in cont.items():
        a[cl] += v
        b[lb] += v
    s_a = sum(c2(v) for v in a.values())
    s_b = sum(c2(v) for v in b.values())
    n = len(e)
    exp = s_a * s_b / c2(n)
    ari = (s_ij - exp) / ((s_a + s_b) / 2 - exp)
    assert row.n == n and row.s_ij == s_ij
    assert row.s_a == s_a and row.s_b == s_b
    assert abs(row.ari - round(ari, 6)) < 1e-9
    assert -1.0 <= row.ari <= 1.0


def test_rake_scores_match_paper_formula(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.text import (
        STOPWORDS,
        rake_keyword_extraction,
    )

    rows = rake_keyword_extraction(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(
        rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1)
    )
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .collect()
    }
    # full Python RAKE over the same slice
    freq = collections.Counter()
    deg = collections.Counter()
    phrases = []
    for did, text in docs.items():
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        run = []
        for t in toks + [None]:
            if t is None or t in STOPWORDS:
                if run:
                    phrases.append((did, tuple(run)))
                    for w in run:
                        freq[w] += 1
                        deg[w] += len(run)
                    run = []
            else:
                run.append(t)
    # mirror dec_sum: each round-12 term is cast to DECIMAL(·,6)
    # (HALF_UP) before the order-free exact sum
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")
    want = {}
    for did, ws in phrases:
        score = sum(
            Decimal(repr(round(deg[w] / freq[w], 12))).quantize(
                q6, rounding=ROUND_HALF_UP
            )
            for w in ws
        )
        want[(did, " ".join(ws))] = float(score)
    for r in rows:
        assert math.isclose(
            want[(r.doc_id, r.phrase)], r.score, abs_tol=1e-6
        )
        assert r.n_words == len(r.phrase.split(" "))
    # the returned rows really are the global top by score
    top20 = sorted(want.values(), reverse=True)[:20]
    assert sorted((r.score for r in rows), reverse=True) == top20


def test_holt_forecast_matches_recomputation(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        holt_linear_forecast_eval,
    )

    rows = holt_linear_forecast_eval(spark, sf_dir).collect()
    assert len(rows) == 12
    monthly = sorted(
        (r.month, r.y)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("y"))
        .collect()
    )
    ys = [float(y) for _, y in monthly]
    l, b = ys[0], ys[1] - ys[0]
    f_by_month = {}
    for t in range(1, len(ys)):
        f = l + b
        l_new = 0.5 * ys[t] + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
        f_by_month[monthly[t][0]] = f
    for r in rows:
        assert r.forecast == round(f_by_month[r.month], 6) + 0.0
        assert abs(r.abs_err - abs(r.actual - f_by_month[r.month])) < 1e-6
    mae = sum(round(abs(r.actual - f_by_month[r.month]), 12) for r in rows) / 12
    assert abs(rows[0].mae - mae) < 1e-6
