"""Wave-16 invariants beyond oracle parity: Heaps curve monotonicity and
fit recompute, and threshold-sweep nesting (tighter tau ⊆ looser tau,
counts recomputed from the exact pair helper)."""

from __future__ import annotations

import math

from tscd_datalake_adapter_spark.operators.dedup import (
    dedup_threshold_sweep,
    distinct_tokens,
    jaccard_pairs_prefix_filtered,
)
from tscd_datalake_adapter_spark.operators.text import vocab_growth_heaps_law
from tscd_datalake_adapter_spark.sources import load_table
from pyspark.sql import functions as F


def test_vocab_growth_monotone_and_fit(spark, sf_dir):
    rows = sorted(
        vocab_growth_heaps_law(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs <= b.n_docs
        assert a.vocab_size <= b.vocab_size
    # the fit is shared across rows and reproduces from the curve points
    xs = [round(math.log(r.n_docs), 12) for r in rows if r.vocab_size > 0]
    ys = [round(math.log(r.vocab_size), 12) for r in rows if r.vocab_size > 0]
    n = len(xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    lnk = (sy - beta * sx) / n
    assert abs(rows[0].heaps_beta - (round(beta, 6) + 0.0)) < 1e-6
    assert abs(rows[0].heaps_k - round(math.exp(lnk), 6)) < 1e-4
    assert len({(r.heaps_beta, r.heaps_k) for r in rows}) == 1


def test_threshold_sweep_nests(spark, sf_dir):
    rows = {r.tau: r for r in dedup_threshold_sweep(spark, sf_dir).collect()}
    assert set(rows) == {"0.70", "0.80", "0.90"}
    # tighter thresholds keep subsets of looser ones
    assert rows["0.90"].n_pairs <= rows["0.80"].n_pairs <= rows["0.70"].n_pairs
    assert (
        rows["0.90"].n_docs_dup
        <= rows["0.80"].n_docs_dup
        <= rows["0.70"].n_docs_dup
    )
    # counts agree with the exact pair helper applied directly
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pairs = jaccard_pairs_prefix_filtered(distinct_tokens(d), 0.7).collect()
    for tau_s, tau in (("0.70", 0.70), ("0.80", 0.80), ("0.90", 0.90)):
        hit = [p for p in pairs if p.jaccard >= tau]
        docs = {p.doc_a for p in hit} | {p.doc_b for p in hit}
        assert rows[tau_s].n_pairs == len(hit)
        assert rows[tau_s].n_docs_dup == len(docs)
