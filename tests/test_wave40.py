"""Wave-40 invariants: Hill estimator vs a direct numpy computation, CvM
vs brute force over raw values, ALS ridge solve vs numpy lstsq-with-ridge
per user."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def test_hill_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        hill_tail_index,
    )

    v = np.array(
        [
            r.o_totalprice
            for r in load_table(spark, sf_dir, "orders")
            .select("o_totalprice")
            .collect()
        ]
    )
    top = np.sort(v)[::-1][:101]
    x_ref = top.min()
    # Conventional Hill: k = 100 fixed; ties with X_(k+1) add ln(1)=0.
    k = len(top) - 1
    alpha = k / sum(math.log(x / x_ref) for x in top[:k])
    r = hill_tail_index(spark, sf_dir).collect()[0]
    assert r.k == k
    assert abs(r.x_ref - x_ref) < 1e-6
    assert abs(r.hill_alpha - alpha) < 1e-5


def test_cvm_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        cramer_von_mises_segments,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(
            F.floor("c_acctbal").cast("long").alias("v"), "c_mktsegment"
        )
        .collect()
    )
    a = sorted(r.v for r in cust if r.c_mktsegment == "BUILDING")
    b = sorted(r.v for r in cust if r.c_mktsegment == "AUTOMOBILE")
    na, nb = len(a), len(b)
    pooled = sorted(a + b)
    t = 0.0
    for x in pooled:  # one term per OBSERVATION (weights = multiplicity)
        fa = sum(1 for y in a if y <= x) / na
        fb = sum(1 for y in b if y <= x) / nb
        t += (fa - fb) ** 2
    t *= na * nb / (na + nb) ** 2
    r = cramer_von_mises_segments(spark, sf_dir).collect()[0]
    assert (r.n_building, r.n_automobile) == (na, nb)
    assert abs(r.t_cvm - t) < 1e-6


def test_als_matches_numpy_ridge(spark, sf_dir):
    from tscd_datalake_adapter_spark.functions import h60
    from tscd_datalake_adapter_spark.operators.mlprep import (
        als_user_factors_step,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("u"),
            F.col("l_quantity").cast("long").alias("q"),
            (
                h60(F.concat(F.lit("alsf1:"), F.col("l_partkey").cast("string")))
                % 2001
                - 1000
            ).alias("ix1"),
            (
                h60(F.concat(F.lit("alsf2:"), F.col("l_partkey").cast("string")))
                % 2001
                - 1000
            ).alias("ix2"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.u, []).append((r.ix1 / 1000, r.ix2 / 1000, r.q))
    got = {
        r.custkey: r for r in als_user_factors_step(spark, sf_dir).collect()
    }
    lam = 1e-3
    for ck, row in got.items():
        fs = by_user[ck]
        fmat = np.array([[f1, f2] for f1, f2, _ in fs])
        rv = np.array([q for _, _, q in fs], dtype=float)
        a = fmat.T @ fmat + lam * np.eye(2)
        u = np.linalg.solve(a, fmat.T @ rv)
        assert abs(row.u1 - u[0]) < 1e-4
        assert abs(row.u2 - u[1]) < 1e-4
        assert row.n_items == len(fs)


def test_permutation_test_properties(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        permutation_test_signflip,
    )

    r = permutation_test_signflip(spark, sf_dir).collect()[0]
    assert r.n_perm == 199
    # valid Monte-Carlo p-value bounds: 1/(B+1) <= p <= 1
    assert 1 / 200 <= r.p_value <= 1.0
    assert abs(r.p_value - (1 + r.n_ge) / 200) < 1e-9
    assert 0 <= r.n_ge <= r.n_perm


def test_g_test_matches_python(spark, sf_dir):
    import collections

    from tscd_datalake_adapter_spark.operators.text import (
        g_test_keyness_topk,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "text")
        .collect()
    )
    a_cnt: collections.Counter = collections.Counter()
    b_cnt: collections.Counter = collections.Counter()
    for r in docs:
        toks = [t for t in r.text.split(" ") if t]
        (a_cnt if r.lang == "en" else b_cnt).update(toks)
    ta = sum(a_cnt.values())
    tb = sum(b_cnt.values())
    n = ta + tb
    expected = {}
    for tok in set(a_cnt) | set(b_cnt):
        a, b = a_cnt[tok], b_cnt[tok]
        if a + b < 50:
            continue
        c2, d2 = ta - a, tb - b
        r1, r2 = a + b, c2 + d2
        g = 0.0
        for o, rt, ct in ((a, r1, ta), (b, r1, tb), (c2, r2, ta), (d2, r2, tb)):
            if o:
                g += round(o * math.log(o / (rt * ct / n)), 12)
        expected[tok] = round(2 * g, 6)
    got = {
        r.tok: r.g_stat for r in g_test_keyness_topk(spark, sf_dir).collect()
    }
    for tok, g in got.items():
        assert abs(g - expected[tok]) < 1e-6
        assert g >= -1e-9  # LLR statistic is nonnegative
    # top-20 really are the largest
    floor_g = min(got.values())
    bigger = [t for t, g in expected.items() if g > floor_g + 1e-9]
    assert len(bigger) <= 20


def test_wav_zcr_matches_formula(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.multimodal import (
        wav_zero_crossing_features,
    )

    rows = wav_zero_crossing_features(spark, sf_dir).collect()
    assert rows
    for r in rows[:10]:
        did = r.doc_id
        nvals = 50 + did % 20
        s = [((11 * did + 5 * i) % 256) - 128 for i in range(nvals)]
        zc = sum(1 for x, y in zip(s, s[1:]) if x * y < 0)
        energy = sum(x * x for x in s)
        assert r.n_samples == nvals
        assert r.zero_crossings == zc
        assert r.energy == energy
        assert r.peak == max(abs(x) for x in s)
        assert abs(r.rms - math.sqrt(energy / nvals)) < 1e-6


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_randomized_response_exact_mechanism(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.pipeline import (
        randomized_response_debias,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type")
        .collect()
    )
    n = len(ev)
    n_true = sum(1 for r in ev if r.event_type == "purchase")
    n_rep = 0
    for r in ev:
        truth = 1 if r.event_type == "purchase" else 0
        if _h60(f"rr1:{r.event_id}") % 3 != 0:
            n_rep += truth
        else:
            n_rep += _h60(f"rr2:{r.event_id}") % 2
    got = randomized_response_debias(spark, sf_dir).collect()[0]
    assert (got.n, got.n_true, got.n_reported) == (n, n_true, n_rep)
    assert abs(got.debiased_rate - (1.5 * n_rep / n - 0.25)) < 1e-6
    # debiasing brings the estimate near truth (mechanism noise is
    # bounded: |err| <= |1.5(obs - E[obs])| + 0 with obs within the
    # deterministic draw; just require better than the raw perturbed gap)
    raw_gap = abs(got.reported_rate - got.true_rate)
    assert abs(got.estimate_error) <= raw_gap + 0.05


def test_jsd_matches_python_and_bounds(spark, sf_dir):
    from collections import Counter

    from tscd_datalake_adapter_spark.operators.text import (
        jsd_source_divergence_topk,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    cnt: dict[str, Counter] = {}
    for r in docs:
        cnt.setdefault(r.source, Counter()).update(
            t for t in r.text.split(" ") if t
        )
    tots = {s: sum(c.values()) for s, c in cnt.items()}
    vocab = set().union(*cnt.values())

    def jsd(sa: str, sb: str) -> float:
        t = 0.0
        for tok in vocab:
            ca, cb = cnt[sa][tok], cnt[sb][tok]
            ta, tb = tots[sa], tots[sb]
            if ca:
                t += round(
                    (ca / ta) * math.log(2 * ca * tb / (ca * tb + cb * ta)),
                    12,
                )
            if cb:
                t += round(
                    (cb / tb) * math.log(2 * cb * ta / (ca * tb + cb * ta)),
                    12,
                )
        return round(t / 2, 6)

    got = jsd_source_divergence_topk(spark, sf_dir).collect()
    for r in got:
        expected = jsd(r.src_a, r.src_b)
        assert abs(r.jsd_nats - expected) < 1e-6
        assert -1e-9 <= r.jsd_nats <= math.log(2) + 1e-9


def test_nelson_aalen_consistency(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.history import (
        kaplan_meier_sessions,
        nelson_aalen_hazard,
    )

    na = nelson_aalen_hazard(spark, sf_dir).collect()
    km = {r.t_minutes: r for r in kaplan_meier_sessions(spark, sf_dir).collect()}
    assert na
    # same event-time table as KM (risk sets and death counts agree)
    for r in na:
        k = km[r.t_minutes]
        assert (r.n_risk, r.n_deaths) == (k.n_risk, k.n_deaths)
    # cumulative hazard is nondecreasing, and H >= -ln(S) pointwise
    # (ln(1-x) <= -x), with equality only as d/n -> 0
    hs = [r.cum_hazard for r in na]
    assert hs == sorted(hs)
    for r in na:
        k = km[r.t_minutes]
        if k.survival > 0:
            assert r.cum_hazard <= -math.log(k.survival) + 1e-6


def test_anova_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        anova_oneway_segments,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    groups: dict[str, list[float]] = {}
    for r in cust:
        groups.setdefault(r.c_mktsegment, []).append(r.c_acctbal)
    allv = np.array([v for g in groups.values() for v in g])
    m = allv.mean()
    ssb = sum(len(g) * (np.mean(g) - m) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    r = anova_oneway_segments(spark, sf_dir).collect()[0]
    assert (r.n_groups, r.n_customers) == (k, n)
    assert abs(r.ss_between - ssb) < 1e-2
    assert abs(r.ss_within - ssw) < 1e-1
    assert abs(r.f_stat - f) < 1e-5
    assert abs(r.eta_squared - ssb / (ssb + ssw)) < 1e-6


def test_kruskal_wallis_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        kruskal_wallis_segments,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.floor("c_acctbal").cast("long").alias("v"), "c_mktsegment"
        )
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in cust:
        groups.setdefault(r.c_mktsegment, []).append(r.v)
    allv = np.array([v for g in groups.values() for v in g], dtype=float)
    order = np.argsort(allv, kind="stable")
    rk = np.empty(len(allv))
    i = 0
    sv = allv[order]
    while i < len(allv):
        j = i
        while j < len(allv) and sv[j] == sv[i]:
            j += 1
        rk[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(allv)
    h = 0.0
    pos = 0
    for g in groups.values():
        rg = rk[pos : pos + len(g)].sum()
        h += rg * rg / len(g)
        pos += len(g)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(allv, return_counts=True)
    tie = float((counts.astype(np.int64) ** 3 - counts).sum())
    h_adj = h / (1 - tie / (n**3 - n))
    r = kruskal_wallis_segments(spark, sf_dir).collect()[0]
    assert r.n_customers == n
    assert abs(r.h_stat - h) < 1e-5
    assert abs(r.h_stat_tie_adj - h_adj) < 1e-5


def test_benford_gof_matches_python(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        _BENFORD_P,
        benford_gof_chi2,
    )

    vals = [
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders").collect()
        if r.o_totalprice >= 1
    ]
    from collections import Counter

    digs = Counter(int(str(int(v))[0]) for v in vals)
    n = sum(digs.values())
    chi2 = sum(
        (digs.get(d, 0) - n * float(p)) ** 2 / (n * float(p))
        for d, p in _BENFORD_P.items()
    )
    r = benford_gof_chi2(spark, sf_dir).collect()[0]
    assert r.n_orders == n
    assert abs(r.chi2_gof - chi2) < 1e-4
    assert r.reject_benford_05 == (chi2 > 15.507)


def test_moods_median_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        moods_median_test_segments,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.floor("c_acctbal").cast("long").alias("v"), "c_mktsegment")
        .collect()
    )
    vals = sorted(r.v for r in cust)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median, rank (n+1) DIV 2
    groups: dict[str, list[int]] = {}
    for r in cust:
        groups.setdefault(r.c_mktsegment, []).append(r.v)
    ta = sum(1 for v in vals if v > med)
    # Pearson chi2 straight from the k×2 observed/expected table — no
    # shared closed form with the implementation under test.
    chi2 = 0.0
    for g in groups.values():
        ng, ag = len(g), sum(1 for v in g if v > med)
        for obs, col_total in ((ag, ta), (ng - ag, n - ta)):
            exp = ng * col_total / n
            chi2 += (obs - exp) ** 2 / exp
    r = moods_median_test_segments(spark, sf_dir).collect()[0]
    assert r.pooled_median == med
    assert abs(r.chi2_median_test - chi2) < 1e-5


def test_cochran_q_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        WORD_PROFILES,
        cochran_q_classifiers,
    )
    from tscd_datalake_adapter_spark.operators.text import LANG_PROFILES

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 200)
        .select("lang", "text")
        .collect()
    )

    def pred(profiles, text):
        scores = {
            lg: sum(text.count(ng) * w for ng, w in profiles[lg])
            for lg in ("en", "de", "es", "fr")
        }
        if scores["en"] >= max(scores["de"], scores["es"], scores["fr"]):
            return "en"
        if scores["de"] >= max(scores["es"], scores["fr"]):
            return "de"
        return "es" if scores["es"] >= scores["fr"] else "fr"

    xs = []
    for row in docs:
        xa = int(pred(LANG_PROFILES, row.text) == row.lang)
        xb = int(pred(WORD_PROFILES, row.text) == row.lang)
        xc = int(row.lang == "en")
        xs.append((xa, xb, xc))
    ga = sum(x[0] for x in xs)
    gb = sum(x[1] for x in xs)
    gc = sum(x[2] for x in xs)
    sl = sum(sum(x) for x in xs)
    sl2 = sum(sum(x) ** 2 for x in xs)
    q = (
        0.0
        if 3 * sl - sl2 == 0
        else 2.0 * (3 * (ga**2 + gb**2 + gc**2) - sl**2) / (3 * sl - sl2)
    )
    r = cochran_q_classifiers(spark, sf_dir).collect()[0]
    assert (r.correct_bigram, r.correct_marker, r.correct_majority) == (
        ga,
        gb,
        gc,
    )
    assert abs(r.cochran_q - q) < 1e-6
    assert r.cochran_q >= 0


def test_durbin_watson_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        _daily_events,
        durbin_watson_daily,
    )

    rows = sorted(
        _daily_events(spark, sf_dir).collect(), key=lambda r: r.idx
    )
    t = np.array([r.idx for r in rows], dtype=float)
    y = np.array([r.y for r in rows], dtype=float)
    beta, alpha = np.polyfit(t, y, 1)
    e = y - alpha - beta * t
    dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e**2).sum())
    r = durbin_watson_daily(spark, sf_dir).collect()[0]
    assert r.n_days == len(rows)
    assert abs(r.ols_slope - beta) < 1e-4
    assert abs(r.durbin_watson - dw) < 1e-5
    assert 0.0 <= r.durbin_watson <= 4.0


def test_tukey_hsd_matches_numpy(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        tukey_hsd_segments,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_acctbal")
        .collect()
    )
    groups: dict[str, list[float]] = {}
    for r in cust:
        groups.setdefault(r.c_mktsegment, []).append(r.c_acctbal)
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    msw = ssw / (n - k)
    got = {
        (r.seg_a, r.seg_b): (r.mean_diff, r.tukey_q)
        for r in tukey_hsd_segments(spark, sf_dir).collect()
    }
    assert len(got) == k * (k - 1) // 2
    for (sa, sb), (md, q) in got.items():
        diff = np.mean(groups[sa]) - np.mean(groups[sb])
        expect_q = diff / math.sqrt(
            msw / 2 * (1 / len(groups[sa]) + 1 / len(groups[sb]))
        )
        assert abs(md - diff) < 1e-4
        assert abs(q - expect_q) < 1e-4


def test_brown_forsythe_matches_bruteforce(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.stats_tests import (
        brown_forsythe_levene,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.floor("c_acctbal").cast("long").alias("v"), "c_mktsegment")
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in cust:
        groups.setdefault(r.c_mktsegment, []).append(r.v)
    zs = []
    zg = {}
    for seg, g in groups.items():
        sv = sorted(g)
        med = sv[(len(sv) + 1) // 2 - 1]  # lower median, same rank rule
        z = [abs(v - med) for v in g]
        zg[seg] = z
        zs.extend(z)
    n, k = len(zs), len(groups)
    zbar = sum(zs) / n
    ssb = sum(len(z) * (sum(z) / len(z) - zbar) ** 2 for z in zg.values())
    ssw = sum(
        sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zg.values()
    )
    w = (ssb / (k - 1)) / (ssw / (n - k))
    r = brown_forsythe_levene(spark, sf_dir).collect()[0]
    assert (r.n_groups, r.n_customers) == (k, n)
    assert abs(r.levene_w - w) < 1e-5


def test_friedman_matches_bruteforce(spark, sf_dir):
    from collections import defaultdict

    from tscd_datalake_adapter_spark.operators.stats_tests import (
        friedman_test_event_types,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    by_day = defaultdict(dict)
    for r in rows:
        by_day[r.day][r.event_type] = r.c
    rsum: dict[str, float] = defaultdict(float)
    for counts in by_day.values():
        vals = np.array(sorted(counts.values()), dtype=float)
        for et, c in counts.items():
            lo = int((vals < c).sum())
            ties = int((vals == c).sum())
            rsum[et] += lo + (ties + 1) / 2.0
    n = len(by_day)
    k = len(rsum)
    chi2 = 12.0 / (n * k * (k + 1)) * sum(v * v for v in rsum.values()) - 3 * n * (k + 1)
    r = friedman_test_event_types(spark, sf_dir).collect()[0]
    assert (r.n_days, r.n_treatments) == (n, k)
    assert abs(r.friedman_chi2 - chi2) < 1e-5
