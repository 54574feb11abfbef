"""Session-factory config semantics (reference R14/R15, ``Main.java:29-36,
71-91,171-184``): default-if-blank env lookups, int fallback on unparseable,
and the S3A gate that must stay off unless an endpoint is configured."""

from __future__ import annotations

from tscd_datalake_adapter_spark.session import env, int_env, resolve_conf

import pytest

pytestmark = pytest.mark.smoke


def test_env_default_if_blank(monkeypatch):
    monkeypatch.delenv("TSCD_X", raising=False)
    assert env("TSCD_X", "d") == "d"
    monkeypatch.setenv("TSCD_X", "")
    assert env("TSCD_X", "d") == "d"  # blank == unset (Main.java:171-178)
    monkeypatch.setenv("TSCD_X", "   ")
    assert env("TSCD_X", "d") == "d"
    monkeypatch.setenv("TSCD_X", "  v  ")
    assert env("TSCD_X", "d") == "v"  # trimmed


def test_int_env_fallback_on_unparseable(monkeypatch):
    monkeypatch.setenv("TSCD_N", "not-a-number")
    assert int_env("TSCD_N", 7) == 7  # Main.java:180-184 semantics
    monkeypatch.setenv("TSCD_N", "12")
    assert int_env("TSCD_N", 7) == 12


def test_s3a_gate_off_without_endpoint(monkeypatch):
    monkeypatch.delenv("S3_ENDPOINT_URL", raising=False)
    c = resolve_conf()
    assert not any(k.startswith("spark.hadoop.fs.s3a") for k in c)
    # determinism confs always present
    assert c["spark.sql.session.timeZone"] == "UTC"
    assert c["spark.sql.adaptive.enabled"] == "true"


def test_s3a_gate_on_with_endpoint(monkeypatch):
    monkeypatch.setenv("S3_ENDPOINT_URL", "http://localhost:4566")
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    c = resolve_conf()
    assert c["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:4566"
    # path-style forced (the reference's LocalStack requirement)
    assert c["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert c["spark.hadoop.fs.s3a.access.key"] == "test"  # default-if-blank


def test_explicit_conf_wins(monkeypatch):
    monkeypatch.setenv("SPARK_SHUFFLE_PARTITIONS", "64")
    c = resolve_conf({"spark.sql.shuffle.partitions": "8"})
    assert c["spark.sql.shuffle.partitions"] == "8"  # explicit > env > base
    monkeypatch.delenv("SPARK_SHUFFLE_PARTITIONS", raising=False)
    assert resolve_conf()["spark.sql.shuffle.partitions"] == "32"
