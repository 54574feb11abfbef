"""Registry-rotation tests: the driver's 50-slot CORRECTNESS window must be
spent on queries that can still produce new signal."""

from __future__ import annotations

from tscd_datalake_adapter_spark.operators import load_all
from tscd_datalake_adapter_spark.operators._rotation import (
    _R1_GREEN,
    VERIFIED,
    _correctness_rows,
    _greens_from_correctness_files,
    _recorded_without_error,
)


def test_greens_parsed_from_correctness_files():
    g = _greens_from_correctness_files()
    # r1's recorded greens must all be discovered from CORRECTNESS_r01.json
    assert set(_R1_GREEN) <= g
    # invariant (round-independent): a name whose recorded rows are ALL
    # errored has produced no usable signal — it must be in neither the
    # verified set nor the recorded set.  (A later round turning such a name
    # green removes it from errored_only, so this never goes stale.)
    by_name: dict[str, list[dict]] = {}
    for name, row in _correctness_rows():
        by_name.setdefault(name, []).append(row)
    errored_only = {
        name
        for name, rows in by_name.items()
        if all(r.get("err") is not None for r in rows)
    }
    assert not (errored_only & g)
    assert not (errored_only & _recorded_without_error())


def test_rotation_tiers_are_ordered():
    """All signal-capable queries (tier 0/1) precede deferred ones (tier 2)
    which precede spent ones (tier 3), regardless of how many of each exist
    — stable across future rounds."""
    registry = load_all()
    names = list(registry.keys())
    recorded = _recorded_without_error()

    def tier(name):
        spec = registry[name]
        if spec.oracle is not None:
            if name in VERIFIED:
                return 3
            return 2 if spec.defer else 0
        if name in recorded:
            return 3
        return 2 if spec.defer else 1

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "rotation must order tier 0 < 1 < 2 < 3"
    # oracle-less queries never sit ahead of oracle-backed unverified ones
    if 0 in tiers and 1 in tiers:
        assert tiers.index(1) > max(i for i, t in enumerate(tiers) if t == 0)
    # deferred additions must never displace undeferred never-verified ones
    if 2 in tiers:
        first_deferred = tiers.index(2)
        assert all(t != 0 and t != 1 for t in tiers[first_deferred:])


def test_rotation_preserves_registry_contents():
    from tscd_datalake_adapter_spark.operators import REGISTRY

    rotated = load_all()
    assert set(rotated.keys()) == set(REGISTRY.keys())
    assert len(rotated) == len(REGISTRY)
