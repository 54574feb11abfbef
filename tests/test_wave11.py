"""Wave-11 invariants beyond oracle parity: Theil-Sen recomputed with an
independent Python model, BH step-up internal consistency, k-anonymity
conservation laws, Flesch formula recomputed on a synthetic document,
matryoshka energy monotonicity, and dataset-card totals cross-checked
against direct scans."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators.analytics import (
    bh_fdr_event_metrics,
    theil_sen_daily_trend,
)
from tscd_datalake_adapter_spark.operators.mlprep import k_anonymity_audit
from tscd_datalake_adapter_spark.operators.pipeline import (
    dataset_card_summary,
)
from tscd_datalake_adapter_spark.operators.similarity import (
    matryoshka_truncation_eval,
)
from tscd_datalake_adapter_spark.operators.text import (
    flesch_readability_by_lang,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_theil_sen_matches_python_model(spark, sf_dir):
    row = theil_sen_daily_trend(spark, sf_dir).collect()[0]
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("idx")
        )
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0.0).cast("decimal(20,6)")
                ),
                6,
            )
            .cast("double")
            .alias("v")
        )
        .collect()
    )
    pts = sorted((r.idx, r.v) for r in daily)
    slopes = sorted(
        round((v2 - v1) / (i2 - i1), 12)
        for a, (i1, v1) in enumerate(pts)
        for (i2, v2) in pts[a + 1 :]
    )
    assert row.n_days == len(pts)
    assert row.n_pairs == len(slopes)
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert abs(row.ts_slope - round(med, 6)) < 1e-9
    resid = sorted(round(v - med * i, 12) for i, v in pts)
    assert abs(
        row.ts_intercept - round(resid[(len(resid) + 1) // 2 - 1], 6)
    ) < 1e-9


def test_bh_step_up_internally_consistent(spark, sf_dir):
    rows = theirs = bh_fdr_event_metrics(spark, sf_dir).collect()
    assert rows, "metric sweep must produce at least one event_type"
    m = len(rows)
    # p-values sorted by rank; z -> p mapping monotone decreasing in |z|
    ps = [r.p_approx for r in sorted(rows, key=lambda r: r.p_rank)]
    assert ps == sorted(ps)
    for r in rows:
        assert 0.0 <= r.p_approx <= 1.0
        expect = round(2.0 / (1.0 + math.exp(1.702 * abs(r.welch_z))), 6)
        assert abs(r.p_approx - expect) < 1e-5
    kstar = max(
        (r.p_rank for r in theirs if r.p_approx * m <= 0.10 * r.p_rank),
        default=0,
    )
    for r in rows:
        assert r.bh_significant_10 == (r.p_rank <= kstar)


def test_k_anonymity_conservation(spark, sf_dir):
    rows = k_anonymity_audit(spark, sf_dir).collect()
    c = load_table(spark, sf_dir, "customer")
    n_combos = (
        c.select(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).alias("b"),
        )
        .distinct()
        .count()
    )
    assert sum(r.n_combos for r in rows) == n_combos
    for r in rows:
        assert r.n_risky_combos <= r.n_combos
        assert r.min_group_size <= r.max_group_size
        # every risky combo has at most 4 members
        assert r.n_exposed_rows <= 4 * r.n_risky_combos


def test_flesch_formula_on_synthetic_doc(spark):
    txt = "The cat sat on the mat. It was happy!"
    df = spark.createDataFrame([(1, txt, "en", "s", len(txt))],
                               "doc_id long, text string, lang string,"
                               " source string, n_chars long")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        # reuse the other tables from nothing — query only reads documents
        row = flesch_readability_by_lang(spark, d).collect()[0]
    w, s = 9, 2
    syl = 0
    prev = False
    for ch in txt.lower():
        v = ch in "aeiouy"
        if v and not prev:
            syl += 1
        prev = v
    fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    assert row.n_docs == 1
    assert abs(row.avg_words_per_sentence - round(w / s, 6)) < 1e-9
    assert abs(row.avg_syllables_per_word - round(syl / w, 6)) < 1e-9
    assert abs(row.avg_flesch - round(fre, 6)) < 1e-6


def test_matryoshka_energy_monotone(spark, sf_dir):
    rows = sorted(
        matryoshka_truncation_eval(spark, sf_dir).collect(),
        key=lambda r: r.trunc_dim,
    )
    assert [r.trunc_dim for r in rows] == [8, 16, 32]
    n = load_table(spark, sf_dir, "embeddings").count()
    for r in rows:
        assert r.n_vecs == n
        assert 0.0 <= r.min_cos_retained <= r.avg_cos_retained <= 1.0
        assert 0.0 <= r.frac_ge_090 <= 1.0
    # keeping more dimensions never loses energy
    assert rows[0].avg_cos_retained <= rows[1].avg_cos_retained
    assert rows[1].avg_cos_retained <= rows[2].avg_cos_retained
    assert rows[0].frac_ge_090 <= rows[2].frac_ge_090


def test_dataset_card_totals_match_direct_scan(spark, sf_dir):
    rows = dataset_card_summary(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    assert len(rows) == d.select("source").distinct().count()
    tok_total = d.select(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.coalesce("text", F.lit("")), " "),
                    lambda x: x != "",
                )
            ).cast("long")
        )
    ).collect()[0][0]
    assert sum(r.total_tokens for r in rows) == tok_total
    for r in rows:
        assert 0.0 <= r.dup_rate < 1.0
        assert 0.0 <= r.avg_alpha_ratio <= 1.0
        assert r.n_distinct_texts <= r.n_docs
