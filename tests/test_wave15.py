"""Wave-15 invariants beyond oracle parity: advisor byte model recomputed
from raw lengths, entropy bounds + Python recompute, cross-source dup
rate recomputed with a Counter."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators.analytics import (
    activity_entropy_per_user,
)
from tscd_datalake_adapter_spark.operators.dedup import cross_source_dup_rate
from tscd_datalake_adapter_spark.operators.io import (
    shuffle_partition_advisor,
)
from tscd_datalake_adapter_spark.sources import load_table


def test_advisor_byte_model_matches_direct_sum(spark, sf_dir):
    rows = {r.table_name: r for r in shuffle_partition_advisor(spark, sf_dir).collect()}
    assert set(rows) == {"orders", "lineitem", "events"}
    e = load_table(spark, sf_dir, "events")
    n = e.count()
    str_bytes = e.select(
        F.sum(
            F.length(F.coalesce("event_type", F.lit("")))
            + F.length(F.coalesce("props", F.lit("")))
        )
    ).collect()[0][0]
    expect = n * (4 * 8 + 2 * 4) + str_bytes
    r = rows["events"]
    assert r.n_rows == n
    assert r.est_bytes == expect
    assert r.recommended_shuffle_partitions == max(
        1, math.ceil(expect / 134217728.0)
    )
    assert r.est_bytes_per_row == math.ceil(expect / n)


def test_activity_entropy_bounds_and_python(spark, sf_dir):
    rows = activity_entropy_per_user(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == min(20, n_users)
    ents = [r.entropy for r in rows]
    assert ents == sorted(ents, reverse=True)
    top = rows[0]
    assert 0.0 <= top.entropy <= math.log(top.n_types) + 1e-9
    per_type = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") == top.user_id)
        .groupBy("event_type")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in per_type)
    ent = sum(
        round(-(c / n) * math.log(c / n), 12)
        for c in (r["count"] for r in per_type)
    )
    assert top.n_events == n
    assert top.n_types == len(per_type)
    assert abs(top.entropy - round(ent, 6)) < 1e-6


def test_cross_source_dup_rate_matches_counter(spark, sf_dir):
    rows = {r.source: r for r in cross_source_dup_rate(spark, sf_dir).collect()}
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    sha_sources = defaultdict(set)
    per_source = Counter()
    for r in docs:
        sha_sources[r.text or ""].add(r.source)
        per_source[r.source] += 1
    for src, r in rows.items():
        assert r.n_docs == per_source[src]
        cross = sum(
            1
            for d in docs
            if d.source == src and len(sha_sources[d.text or ""]) > 1
        )
        assert r.n_cross_source_dups == cross
        assert abs(r.cross_dup_rate - round(cross / r.n_docs, 6)) < 1e-9
