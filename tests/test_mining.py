"""Mining-wave invariants beyond the oracle gate (tests/test_oracle_parity
covers cell-exact parity for every registered query): blocking losslessness
by brute-force equivalence, plan shapes, and planted-corpus semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark import plans
from tscd_datalake_adapter_spark.operators.mining import (
    GEO_PAIR_D,
    _geo_points,
    geo_closest_pairs,
    ngram_dup_stats,
    session_path_topk,
    skyline_pareto_parts,
)


def test_geo_grid_blocking_is_lossless(spark, sf_dir):
    """The 3x3 cell-probe join must find EXACTLY the pairs an all-pairs
    scan finds within GEO_PAIR_D — blocking is a plan optimization, never
    a recall trade. Brute force over the same synthetic points (bounded
    slice, fine at test scale)."""
    pts = _geo_points(spark, sf_dir, 20_000).collect()
    d2max = GEO_PAIR_D * GEO_PAIR_D
    brute = sorted(
        (
            (a.x - b.x) ** 2 + (a.y - b.y) ** 2,
            min(a.event_id, b.event_id),
            max(a.event_id, b.event_id),
        )
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if (a.x - b.x) ** 2 + (a.y - b.y) ** 2 <= d2max
    )[:20]
    got = [
        (r.d2, r.id_a, r.id_b) for r in geo_closest_pairs(spark, sf_dir).collect()
    ]
    assert got == brute


def test_geo_closest_pairs_plan_is_equi_join(spark, sf_dir):
    """The pair join must be a hash/SMJ equi-join on the cell key — never
    a nested-loop/cartesian all-pairs plan."""
    plan = plans.formatted_plan(geo_closest_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_skyline_matches_bruteforce_dominance(spark, sf_dir):
    """The window-based 2D skyline must equal the quadratic dominance
    definition exactly (including duplicate-point and tie handling)."""
    rows = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_partkey") < 2000)
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    def dominated(a):
        return any(
            b.p_retailprice <= a.p_retailprice
            and b.p_size >= a.p_size
            and (b.p_retailprice < a.p_retailprice or b.p_size > a.p_size)
            for b in rows
        )
    brute = sorted(
        (r.p_retailprice, r.p_partkey, r.p_size) for r in rows if not dominated(r)
    )
    got = [
        (r.p_retailprice, r.p_partkey, r.p_size)
        for r in skyline_pareto_parts(spark, sf_dir).collect()
    ]
    assert got == brute


def test_skyline_has_no_quadratic_join(spark, sf_dir):
    plan = plans.formatted_plan(skyline_pareto_parts(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_dup_stats_planted_spans(spark):
    """Two docs sharing one 8-token span, a third sharing nothing: the
    sharers count exactly the planted window's grams as duplicated, the
    loner counts zero."""
    span = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            # 12 tokens: positions 1..5 start 8-grams; the span occupies
            # tokens 3..10, so exactly ONE gram (start 3) is the full span.
            (0, "a0 a1 " + span + " a2 a3"),
            (1, "b0 b1 " + span + " b2 b3"),
            (2, " ".join(f"c{i}" for i in range(12))),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_dup_stats(docs).collect()}
    assert set(got) == {0, 1, 2}  # doc 3 has < 8 tokens -> no rows
    for d in (0, 1):
        assert got[d].n_grams == 5
        assert got[d].n_dup_grams == 1
        assert got[d].dup_frac == pytest.approx(0.2)
    assert got[2].n_grams == 5 and got[2].n_dup_grams == 0


def test_session_paths_cover_all_sessions(spark, sf_dir):
    """Path counts are bounded by the session universe of the
    independently-verified sessionizer (same slice, same gap rule), every
    path has 1-5 hops, and the top-k ordering contract holds."""
    from tscd_datalake_adapter_spark.operators.history import (
        sessionize_events_batch,
    )

    sess = (
        sessionize_events_batch(spark, sf_dir)
        .where(F.col("user_id") < 300)
        .agg(F.sum("n_sessions").alias("n"))
        .collect()[0]
        .n
    )
    rows = session_path_topk(spark, sf_dir).collect()
    assert sum(r.n_sessions for r in rows) <= sess
    assert all(1 <= len(r.path.split(">")) <= 5 for r in rows)
    assert rows == sorted(rows, key=lambda r: (-r.n_sessions, r.path))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_geo_blocking_randomized_equivalence(spark, seed):
    """Grid blocking must equal all-pairs on RANDOM point sets too — not
    just the fixture's hash-derived layout. Dense ranges force many
    cross-cell pairs (the boundary cases the 3x3 probe exists for)."""
    import random

    rnd = random.Random(seed)
    d = 1000
    pts = [
        (i, rnd.randrange(0, 20 * d), rnd.randrange(0, 20 * d))
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, "event_id long, x long, y long")
    from tscd_datalake_adapter_spark.operators.mining import geo_block_pairs

    got = sorted(
        (r.id_a, r.id_b, r.d2) for r in geo_block_pairs(df, d).collect()
    )
    brute = sorted(
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= d * d
    )
    assert got == brute and got, f"seed={seed}"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pareto_frontier_randomized_dominance(spark, seed):
    """Window-based skyline == quadratic dominance on random data with
    heavy duplicates (equal costs, equal gains, fully equal rows — the
    tie cases the strictness clause governs)."""
    import random

    rnd = random.Random(seed)
    rows = [
        (i, float(rnd.randrange(0, 15)), rnd.randrange(0, 15))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, cost double, gain long")
    from tscd_datalake_adapter_spark.operators.mining import pareto_frontier_2d

    got = sorted(
        (r.id, r.cost, r.gain)
        for r in pareto_frontier_2d(df, "cost", "gain").collect()
    )

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in rows
        )

    brute = sorted((r[0], r[1], r[2]) for r in rows if not dominated(r))
    assert got == brute and got, f"seed={seed}"
