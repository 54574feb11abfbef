"""Wave-12 invariants beyond oracle parity: degree-histogram conservation,
cross-entropy recomputed independently (and Gibbs' inequality), range-
partition mass conservation, and DFT magnitudes checked against numpy's
FFT."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators.export import (
    range_partition_balance,
)
from tscd_datalake_adapter_spark.operators.multimodal import (
    wav_dft_band_magnitudes,
)
from tscd_datalake_adapter_spark.operators.text import (
    cross_entropy_between_sources,
    graph_degree_distribution,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_degree_distribution_conserves_nodes(spark, sf_dir):
    rows = graph_degree_distribution(spark, sf_dir).collect()
    assert rows, "the >=100-doc co-occurrence graph must be non-empty"
    buckets = [r.degree_le for r in rows]
    assert buckets == sorted(buckets)
    for r in rows:
        assert 1 <= r.min_degree <= r.max_degree <= r.degree_le
        # bucket lower edge: strictly above the previous power of two
        assert r.min_degree > r.degree_le // 2 or r.degree_le == 1
    # node count equals the triangle query's node universe
    from tscd_datalake_adapter_spark.operators.text import (
        token_graph_triangles,
    )

    n_nodes = token_graph_triangles(spark, sf_dir).collect()[0].n_nodes
    assert sum(r.n_tokens for r in rows) == n_nodes


def test_cross_entropy_matches_python_and_gibbs(spark, sf_dir):
    rows = cross_entropy_between_sources(spark, sf_dir).collect()
    srcs = {r.src_a for r in rows} | {r.src_b for r in rows}
    s = len(srcs)
    assert len(rows) == s * (s - 1)
    assert all(r.cross_entropy > 0 for r in rows)

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    cnt: dict[str, Counter] = {}
    for r in docs:
        cnt.setdefault(r.source, Counter()).update(
            t for t in (r.text or "").split(" ") if t != ""
        )
    vocab = set()
    for c in cnt.values():
        vocab.update(c)
    v = len(vocab)
    pair = next(iter(sorted((r.src_a, r.src_b) for r in rows)))
    sa, sb = pair
    ca, cb = cnt[sa], cnt[sb]
    ta, tb = sum(ca.values()), sum(cb.values())
    ce = -sum(
        (c / ta) * math.log((cb.get(w, 0) + 1.0) / (tb + v))
        for w, c in ca.items()
    )
    got = next(
        r.cross_entropy for r in rows if (r.src_a, r.src_b) == (sa, sb)
    )
    assert abs(got - ce) < 1e-4
    # Gibbs: predicting A under any other source's smoothed LM is never
    # better than A's own smoothed LM
    self_ce = -sum(
        (c / ta) * math.log((ca.get(w, 0) + 1.0) / (ta + v))
        for w, c in ca.items()
    )
    assert got >= self_ce - 1e-6


def test_range_partition_conserves_mass(spark, sf_dir):
    rows = range_partition_balance(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_rows for r in rows) == total
    assert {r.partition_id for r in rows} <= set(range(1, 17))
    # a 3% sample's exact percentiles keep ranges within sane balance
    assert max(r.balance_ratio for r in rows) < 3.0
    ratio_sum = sum(r.balance_ratio for r in rows)
    assert abs(ratio_sum - 16.0) < 0.01


def test_wav_dft_matches_numpy_fft(spark, sf_dir):
    rows = wav_dft_band_magnitudes(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "audio docs must decode"
    for doc_id, rs in list(by_doc.items())[:5]:
        n = rs[0].n_samples
        dev = np.array(
            [((11 * doc_id + 5 * i) % 256) - 128 for i in range(n)],
            dtype=np.float64,
        )
        spec = np.fft.fft(dev)
        for r in sorted(rs, key=lambda x: x.band):
            assert abs(r.magnitude - abs(spec[r.band])) < 1e-4
            assert abs(r.re - spec[r.band].real) < 1e-4
            assert abs(r.im - spec[r.band].imag) < 1e-4
