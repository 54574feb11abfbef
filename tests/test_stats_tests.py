"""Independent-formula verification of the statistical-test wave: each
query's statistic is recomputed in plain Python/numpy from the same fixture
rows (the repo's "vs an independent model" pattern — the DuckDB oracle in
test_oracle_parity proves cross-engine exactness; these tests prove the
FORMULA is the textbook one)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def _daily(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        _daily_events,
    )

    rows = _daily_events(spark, sf_dir).collect()
    xs = np.array([r.x for r in rows], dtype=float)
    ys = np.array([r.y for r in rows], dtype=float)
    return xs, ys


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    i = 0
    sv = v[order]
    while i < len(v):
        j = i
        while j < len(v) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # avg of ranks i+1..j
        i = j
    return ranks


def test_spearman_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        spearman_corr_daily,
    )

    xs, ys = _daily(spark, sf_dir)
    rx, ry = _avg_ranks(xs), _avg_ranks(ys)
    expected = np.corrcoef(rx, ry)[0, 1]
    r = spearman_corr_daily(spark, sf_dir).collect()[0]
    assert r.n_days == len(xs)
    assert abs(r.spearman_rho - expected) < 1e-6


def test_kendall_tau_b_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        kendall_tau_daily,
    )

    xs, ys = _daily(spark, sf_dir)
    n = len(xs)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = np.sign(xs[j] - xs[i])
            sy = np.sign(ys[j] - ys[i])
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    expected = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    r = kendall_tau_daily(spark, sf_dir).collect()[0]
    assert (r.concordant, r.discordant) == (c, d)
    assert abs(r.kendall_tau_b - expected) < 1e-6


def test_mann_whitney_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        mann_whitney_u_segments,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(
            F.floor("c_acctbal").cast("long").alias("v"), "c_mktsegment"
        )
        .collect()
    )
    va = np.array(
        [r.v for r in cust if r.c_mktsegment == "BUILDING"], dtype=float
    )
    vb = np.array(
        [r.v for r in cust if r.c_mktsegment == "AUTOMOBILE"], dtype=float
    )
    allv = np.concatenate([va, vb])
    ranks = _avg_ranks(allv)
    ra = ranks[: len(va)].sum()
    na, nb = len(va), len(vb)
    u_a = ra - na * (na + 1) / 2.0
    # tie correction over the pooled value histogram
    _, counts = np.unique(allv, return_counts=True)
    tie = float((counts.astype(np.int64) ** 3 - counts).sum())
    nn = na + nb
    var = na * nb / 12.0 * ((nn + 1) - tie / (nn * (nn - 1)))
    z = (u_a - na * nb / 2.0) / math.sqrt(var)
    r = mann_whitney_u_segments(spark, sf_dir).collect()[0]
    assert (r.n_building, r.n_automobile) == (na, nb)
    assert r.two_u_a == int(round(2 * u_a))
    assert abs(r.z_score - z) < 1e-6


def test_mcnemar_discordant_cells_consistent(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        mcnemar_langid_classifiers,
    )

    r = mcnemar_langid_classifiers(spark, sf_dir).collect()[0]
    # the discordant cells decompose the accuracy difference exactly
    assert r.a_correct - r.b_correct == r.only_a - r.only_b
    assert 0 <= r.only_a and 0 <= r.only_b
    assert r.only_a + r.only_b <= r.n_docs
    if r.only_a + r.only_b:
        expected = (r.only_a - r.only_b) ** 2 / (r.only_a + r.only_b)
        assert abs(r.mcnemar_chi2 - expected) < 1e-6
    else:
        assert r.mcnemar_chi2 == 0.0


def test_cramers_v_matches_pandas_contingency(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        cramers_v_priority_segment,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pdf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .toPandas()
    )
    ct = pdf.groupby(["c_mktsegment", "o_orderpriority"]).size().unstack(
        fill_value=0
    )
    obs = ct.to_numpy(dtype=float)
    n = obs.sum()
    e = obs.sum(1, keepdims=True) @ obs.sum(0, keepdims=True) / n
    chi2 = ((obs - e) ** 2 / e).sum()
    v = math.sqrt(chi2 / (n * min(obs.shape[0] - 1, obs.shape[1] - 1)))
    r = cramers_v_priority_segment(spark, sf_dir).collect()[0]
    assert r.n_orders == int(n)
    assert abs(r.chi2 - chi2) < 1e-4
    assert abs(r.cramers_v - v) < 1e-6
    assert 0.0 <= r.cramers_v <= 1.0


def test_t_closeness_emd_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        t_closeness_emd_audit,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nat"),
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bin"),
        )
        .collect()
    )
    nat_name = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    bins = sorted({r.bin for r in cust})
    m = len(bins)
    n_tot = len(cust)
    emds = {}
    for nat in {r.bin for r in []} | {r.nat for r in cust}:
        grp = [r.bin for r in cust if r.nat == nat]
        ng = len(grp)
        s = 0.0
        cg = cgl = 0
        for b in bins:
            cg += sum(1 for x in grp if x == b)
            cgl += sum(1 for r in cust if r.bin == b)
            s += abs(cg / ng - cgl / n_tot)
        emds[nat_name[nat]] = s / (m - 1)
    rows = t_closeness_emd_audit(spark, sf_dir).collect()
    assert len(rows) == min(10, len(emds))
    for r in rows:
        assert abs(r.emd - emds[r.nation]) < 1e-6
    # the returned rows are the top-10 by emd
    top = sorted(emds.values(), reverse=True)[: len(rows)]
    got = [r.emd for r in rows]
    assert got == sorted(got, reverse=True)
    assert abs(got[0] - top[0]) < 1e-6


def test_recursive_hierarchy_invariants(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.hierarchy import (
        recursive_part_hierarchy_rollup,
    )

    rows = recursive_part_hierarchy_rollup(spark, sf_dir).collect()
    n_parts = load_table(spark, sf_dir, "part").count()
    by_node = {r.node: r for r in rows}
    # root subsumes every part; the recursion reached it from every key
    assert by_node[0].subtree_parts == n_parts
    # parent subtree counts dominate child subtree counts
    for r in rows:
        parent = r.node // 10
        if r.node > 0 and parent in by_node:
            p = by_node[parent]
            assert p.subtree_parts >= r.subtree_parts
            assert p.subtree_height >= r.subtree_height
            assert p.subtree_retail >= r.subtree_retail - 1e-6


def test_image_phash_band_blocking_lossless(spark, sf_dir):
    """Brute-force every uid pair's exact Hamming distance from decoded
    payload hashes; the band-blocked query must return EXACTLY the pairs
    at distance <= 3 (pigeonhole: 4 bands make the <=3 gate lossless)."""
    import itertools

    from tscd_datalake_adapter_spark.operators.multimodal import (
        _png_pixels,
        image_phash_near_dup,
        png_encode,
        png_decode,
    )

    doc_ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 0))
        .select("doc_id")
        .collect()
    ]

    def ahash(did: int, pert: int) -> int:
        px = _png_pixels(did).copy()
        if pert:
            w, h = px.shape[1], px.shape[0]
            px[(did * 5) % h, (did * 3) % w] = (
                int(px[(did * 5) % h, (did * 3) % w]) + 128
            ) % 256
        arr = png_decode(png_encode(px))
        h_, w_ = arr.shape
        xi = (np.arange(8) * w_) // 8
        yj = (np.arange(8) * h_) // 8
        flat = arr[yj[None, :], xi[:, None]].astype(np.int64).reshape(-1)
        s = int(flat.sum())
        bits = (64 * flat >= s).astype(np.int64)
        # Python ints: bit 63 overflows np.int64 to a negative hash
        return sum(int(b) << k for k, b in enumerate(bits))

    hashes = {}
    for did in doc_ids:
        hashes[2 * did] = ahash(did, 0)
        hashes[2 * did + 1] = ahash(did, 1)
    expected = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r.uid_a, r.uid_b): r.hamming
        for r in image_phash_near_dup(spark, sf_dir).collect()
    }
    assert got == expected
