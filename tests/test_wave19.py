"""Wave-19 invariants: zone-map layout ordering, IPS recompute, SPRT
crossing recompute, IVF audit consistency with the quantizer."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def test_zone_map_date_layout_dominates(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.io import (
        zone_map_skipping_audit,
    )

    rows = {r.layout: r for r in zone_map_skipping_audit(spark, sf_dir).collect()}
    dc, io_ = rows["date_clustered"], rows["insertion_order"]
    # month-clustered buckets: every probe skips all buckets but its own
    n_m = dc.n_buckets
    assert dc.n_probes == n_m
    assert abs(dc.skip_fraction - (1 - 1 / n_m)) < 1e-6
    # insertion order: wide ship-date ranges per bucket -> skips almost
    # nothing relative to the clustered layout
    assert io_.skip_fraction < dc.skip_fraction / 2
    assert 0.0 <= io_.row_skip_fraction <= io_.skip_fraction + 1e-9


def test_ips_matches_python_replay(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mlprep import (
        offline_policy_ips_eval,
    )

    row = offline_policy_ips_eval(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").collect()
    num = den = 0.0
    matched = 0
    for r in ev:
        p1m = 700 if r.user_id % 2 == 0 else 300
        h = int(
            hashlib.md5(f"pol:{r.event_id}".encode()).hexdigest()[:15], 16
        ) % 1000
        a = 1 if h < p1m else 0
        pm = p1m if a == 1 else 1000 - p1m
        pi_a = 1 if r.user_id % 3 == 0 else 0
        if a == pi_a:
            matched += 1
            reward = round(r.value * 100) if r.event_type == "purchase" else 0
            num += round(reward / (pm / 1000.0), 12)
            den += round(1.0 / (pm / 1000.0), 12)
    assert row.n == len(ev) and row.n_matched == matched
    assert abs(row.ips_value_cents - num / len(ev)) < 1e-3
    assert abs(row.snips_value_cents - num / den) < 1e-3


def test_sprt_crossing_matches_python(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.analytics import (
        sprt_sequential_ab,
    )

    rows = sorted(sprt_sequential_ab(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    ev = load_table(spark, sf_dir, "events").collect()
    import collections

    daily = collections.defaultdict(lambda: [0, 0])
    for r in ev:
        d = r.ts.strftime("%Y-%m-%d")
        daily[d][0] += 1
        daily[d][1] += 1 if r.event_type == "purchase" else 0
    cum = 0.0
    first = ""
    lp, ln_ = math.log(0.3 / 0.2), math.log(0.7 / 0.8)
    for d in sorted(daily):
        n, p = daily[d]
        cum += round(p * lp + (n - p) * ln_, 12)
        dec = (
            "accept_h1" if cum >= math.log(19)
            else "accept_h0" if cum <= -math.log(19)
            else "continue"
        )
        if dec != "continue" and not first:
            first = d
    by_day = {r.day: r for r in rows}
    assert abs(by_day[max(daily)].cum_llr - round(cum, 6)) < 1e-6
    assert rows[0].first_decision_day == first
    # monotone consistency: decision matches the sign of the bound test
    for r in rows:
        if r.decision == "accept_h1":
            assert r.cum_llr >= math.log(19) - 1e-6
        elif r.decision == "accept_h0":
            assert r.cum_llr <= -math.log(19) + 1e-6


def test_ivf_audit_matches_assignment(spark, sf_dir):
    import numpy as np

    from tscd_datalake_adapter_spark.operators.similarity import (
        IVF_NPROBE,
        IVF_PLANES,
        _ivf_plane_components,
        ivf_list_balance_audit,
    )

    row = ivf_list_balance_audit(spark, sf_dir).collect()[0]
    e = load_table(spark, sf_dir, "embeddings").toPandas()
    X = np.stack(e["embedding"].to_numpy()).astype("float64")
    cells = np.zeros(len(X), dtype=np.int64)
    for p in range(IVF_PLANES):
        plane = np.array(_ivf_plane_components(p))
        cells |= ((X @ plane) >= 0).astype(np.int64) << p
    import collections

    sizes = sorted(collections.Counter(cells.tolist()).values(), reverse=True)
    assert row.n_lists == len(sizes)
    assert row.n_vectors == len(X)
    assert row.max_list == sizes[0] and row.min_list == sizes[-1]
    assert row.worst_probe_scan == sum(sizes[:IVF_NPROBE])
    assert abs(
        row.imbalance - round(sizes[0] / (len(X) / len(sizes)), 6)
    ) < 1e-6
