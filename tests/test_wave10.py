"""Wave-10 invariants: NB classifier sanity (coverage + self-eval
accuracy), Welch z re-derived in Python from the per-user metric, and the
Kaplan-Meier curve's defining monotonicity/range properties."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import h60
from tscd_datalake_adapter_spark.operators.analytics import ab_test_zscore
from tscd_datalake_adapter_spark.operators.history import (
    kaplan_meier_sessions,
)
from tscd_datalake_adapter_spark.operators.text import (
    naive_bayes_lang_confusion,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_nb_confusion_covers_corpus_and_separates(spark, sf_dir):
    rows = naive_bayes_lang_confusion(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    correct = sum(r.n for r in rows if r.true_lang == r.pred_lang)
    # the fixture languages share one vocabulary (lang is nearly
    # text-independent), so self-accuracy is far from 1.0 — but a trained
    # model must still beat the majority-class baseline
    majority = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert correct > majority


def test_ab_test_welch_z_matches_python(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.select(
            "user_id",
            (
                h60(F.concat(F.lit("ab:"), F.col("user_id").cast("string")))
                % 2
            ).alias("arm"),
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(0.0)
            .alias("pv"),
        )
        .groupBy("user_id", "arm")
        .agg(F.round(F.sum("pv"), 6).alias("total"))
        .collect()
    )
    groups = defaultdict(list)
    for r in per_user:
        groups[r.arm].append(r.total)
    m = {a: sum(v) / len(v) for a, v in groups.items()}
    var = {
        a: sum((x - m[a]) ** 2 for x in v) / (len(v) - 1)
        for a, v in groups.items()
    }
    z = (m[1] - m[0]) / math.sqrt(
        var[0] / len(groups[0]) + var[1] / len(groups[1])
    )
    row = ab_test_zscore(spark, sf_dir).collect()[0]
    assert row.n_control == len(groups[0])
    assert row.n_treatment == len(groups[1])
    assert abs(row.welch_z - z) < 1e-4
    assert row.significant_05 == (abs(z) > 1.959964)


def test_km_curve_is_a_survival_function(spark, sf_dir):
    rows = kaplan_meier_sessions(spark, sf_dir).collect()
    assert rows
    ts = [r.t_minutes for r in rows]
    assert ts == sorted(ts)
    surv = [r.survival for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:]))  # non-increasing
    risks = [r.n_risk for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:]))
    for r in rows:
        assert r.n_deaths >= 1
        assert r.n_deaths <= r.n_risk
        if r.survival > 0:
            # survival is rounded to 6dp, so its log may differ from
            # log_survival by up to 0.5e-6 / survival (relative error)
            assert (
                abs(math.log(r.survival) - r.log_survival)
                < 6e-7 / r.survival + 1e-9
            )
