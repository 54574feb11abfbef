"""Edge-case pins for the as-of join family (operators/asof.py).

The oracle parity suite already proves every registered as-of query
hash-exact on the fixture; these tests pin the SEMANTIC corner cases a
fixture may not exercise: inclusive equal-timestamp matching, the
direction-specific tie rules, empty/missing right sides, and that the
plan stays a single union+window (no nested-loop join).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators.asof import asof_join


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )


TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _sec(s):
    return TS + dt.timedelta(seconds=s)


def test_asof_backward_inclusive_and_tie_max_id(spark):
    left = _df(spark, [(1, _sec(10), 100)])
    # two right rows exactly AT the left ts: inclusive match, max id wins
    right = _df(spark, [(1, _sec(10), 7), (1, _sec(10), 9), (1, _sec(11), 11)])
    out = asof_join(
        left, right, on="ts", by="user_id", left_id="event_id",
        right_id="event_id",
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_event_id"] == 9  # not 11 (future), not 7 (tie->max)


def test_asof_forward_inclusive_and_tie_min_id(spark):
    left = _df(spark, [(1, _sec(10), 100)])
    right = _df(spark, [(1, _sec(10), 7), (1, _sec(10), 9), (1, _sec(9), 5)])
    out = asof_join(
        left, right, on="ts", by="user_id", left_id="event_id",
        right_id="event_id", direction="forward",
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_event_id"] == 7  # not 5 (past), not 9 (tie->min)


def test_asof_no_match_yields_null_and_keeps_left(spark):
    left = _df(spark, [(1, _sec(10), 100), (2, _sec(10), 200)])
    right = _df(spark, [(1, _sec(20), 7)])  # only future, only user 1
    back = {r["event_id"]: r["asof_event_id"] for r in asof_join(
        left, right, on="ts", by="user_id", left_id="event_id",
        right_id="event_id",
    ).collect()}
    assert back == {100: None, 200: None}
    fwd = {r["event_id"]: r["asof_event_id"] for r in asof_join(
        left, right, on="ts", by="user_id", left_id="event_id",
        right_id="event_id", direction="forward",
    ).collect()}
    assert fwd == {100: 7, 200: None}


def test_asof_rejects_unknown_direction(spark):
    import pytest

    left = _df(spark, [(1, _sec(0), 1)])
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, left, on="ts", by="user_id", left_id="event_id",
            right_id="event_id", direction="nearest",
        )


def test_asof_plan_is_single_window_no_nested_loop(spark, sf_dir):
    from tscd_datalake_adapter_spark import plans
    from tscd_datalake_adapter_spark.operators.asof import (
        asof_join_nearest,
        asof_join_purchase_view,
    )

    for fn in (asof_join_purchase_view, asof_join_nearest):
        p = plans.formatted_plan(fn(spark, sf_dir))
        assert "BroadcastNestedLoop" not in p
        assert "CartesianProduct" not in p


def test_asof_matches_bruteforce_on_random_histories(spark):
    """Property-style pin (seeded random, no hypothesis-Spark session
    interplay): on random per-user event histories with DUPLICATE
    timestamps, both as-of directions must equal an independent
    brute-force Python model (backward: max (ts,id) with ts<=t; forward:
    min (ts,id') with ts>=t, id' compared ascending)."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        left_rows, right_rows = [], []
        lid = rid = 0
        for user in range(6):
            for _ in range(rng.randint(0, 8)):
                lid += 1
                left_rows.append((user, _sec(rng.randint(0, 20)), lid))
            for _ in range(rng.randint(0, 8)):
                rid += 1
                right_rows.append((user, _sec(rng.randint(0, 20)), 1000 + rid))
        if not left_rows or not right_rows:
            continue
        left = _df(spark, left_rows)
        right = _df(spark, right_rows)

        def expect(direction):
            out = {}
            for (u, t, i) in left_rows:
                cands = [
                    (rt, ri)
                    for (ru, rt, ri) in right_rows
                    if ru == u
                    and (rt <= t if direction == "backward" else rt >= t)
                ]
                if not cands:
                    out[i] = None
                elif direction == "backward":
                    out[i] = max(cands)[1]
                else:
                    out[i] = min(cands, key=lambda c: (c[0], c[1]))[1]
            return out

        for direction in ("backward", "forward"):
            got = {
                r["event_id"]: r["asof_event_id"]
                for r in asof_join(
                    left, right, on="ts", by="user_id",
                    left_id="event_id", right_id="event_id",
                    direction=direction,
                ).collect()
            }
            assert got == expect(direction), f"seed={seed} {direction}"


def test_asof_null_timestamps_are_inert(spark):
    """NULL-`on` guards: a NULL-ts right row must never be carried as a
    match (it would sort NULLS-FIRST into the 'most recent' slot), and a
    NULL-ts left row survives with NULL match columns in BOTH
    directions."""
    left = _df(spark, [(1, _sec(10), 100), (1, None, 101)])
    right = _df(spark, [(1, None, 7), (1, _sec(5), 8)])
    for direction, want in (("backward", 8), ("forward", None)):
        got = {
            r["event_id"]: r["asof_event_id"]
            for r in asof_join(
                left, right, on="ts", by="user_id",
                left_id="event_id", right_id="event_id",
                direction=direction,
            ).collect()
        }
        assert got == {100: want, 101: None}, direction
