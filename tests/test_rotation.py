"""Registry-rotation tests: the driver's 50-slot CORRECTNESS window must be
spent on queries that have never had a green driver row."""

from __future__ import annotations

from tscd_datalake_adapter_spark.operators import load_all
from tscd_datalake_adapter_spark.operators._rotation import (
    _R1_GREEN,
    VERIFIED,
    _greens_from_correctness_files,
)


def test_greens_parsed_from_correctness_files():
    g = _greens_from_correctness_files()
    # r1's recorded greens must all be discovered from CORRECTNESS_r01.json
    assert set(_R1_GREEN) <= g
    # the one errored row must not be treated as verified
    assert "media_feature_extract" not in g


def test_front_window_is_all_unverified():
    names = list(load_all().keys())
    front, back = names[:50], names[50:]
    assert not (set(front) & VERIFIED), "verified query wasting a front slot"
    # every verified query sits behind the window
    assert VERIFIED <= set(back)


def test_rotation_preserves_registry_contents():
    from tscd_datalake_adapter_spark.operators import REGISTRY

    rotated = load_all()
    assert set(rotated.keys()) == set(REGISTRY.keys())
    assert len(rotated) == len(REGISTRY)
