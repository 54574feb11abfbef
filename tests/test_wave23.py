"""Wave-23 invariants: burst decoding vs brute-force Viterbi, file audit
consistency."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table


def test_burst_viterbi_is_optimal(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.mining import (
        burst_detection_viterbi,
    )

    rows = sorted(burst_detection_viterbi(spark, sf_dir).collect(),
                  key=lambda r: r.day)
    ks = [r.n_events for r in rows]
    n = len(ks)
    r0 = sum(ks) / n
    r1 = 2.0 * r0
    lr0, lr1 = round(math.log(r0), 12), round(math.log(r1), 12)
    gamma = 3.0

    def cost(states):
        c = 0.0
        prev = 0
        for k, s in zip(ks, states):
            c += round((r1 - k * lr1) if s else (r0 - k * lr0), 12)
            if s == 1 and prev == 0:
                c += gamma
            prev = s
        return c

    got = tuple(r.burst for r in rows)
    got_cost = cost(got)
    assert abs(rows[0].total_cost - round(got_cost, 6)) < 1e-6
    if n <= 18:  # brute force every path
        best = min(cost(p) for p in itertools.product((0, 1), repeat=n))
        assert abs(got_cost - best) < 1e-9
    else:  # exhaustive around the decoded path: single-bit flips never win
        for i in range(n):
            flipped = list(got)
            flipped[i] ^= 1
            assert cost(tuple(flipped)) >= got_cost - 1e-9
    # burst days really are higher-count days on average
    if any(got) and not all(got):
        b = [k for k, s in zip(ks, got) if s]
        q = [k for k, s in zip(ks, got) if not s]
        assert sum(b) / len(b) > sum(q) / len(q)


def test_file_metadata_audit_consistent(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.io import file_metadata_audit

    rows = file_metadata_audit(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    assert sum(r.n_rows for r in rows) == li.count()
    assert all(r.file_name.endswith(".parquet") for r in rows)
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).first()
    assert min(r.min_orderkey for r in rows) == lo
    assert max(r.max_orderkey for r in rows) == hi
