"""Oracle-differential gate (SURVEY.md §5.2 item 2), run at sf0.001 for
speed — the driver runs the same comparison at sf0.01 via __spark_entry__.

Each registered query's Spark result must match its DuckDB oracle exactly
(row count, column names, values) after normalization. Exact cell equality is
stricter than the driver's value-hash, so passing here implies passing there.
"""

from __future__ import annotations

import duckdb
import pytest

import scripts.parity_check as pc
from tscd_datalake_adapter_spark.operators import load_all
from tscd_datalake_adapter_spark.sources import TABLE_NAMES

REGISTRY = load_all()
ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]
WEAK_NAMES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _assert_all_scalar(df, name):
    """Driver canonicalizers lexsort rows pandas-side; an array/map/struct
    cell is unhashable there and errors the row (r1 media_feature_extract,
    r2 array_functions). Decimal/binary are banned too: they surface as
    pandas object cells whose hash differs from the oracle's float/str even
    when values compare equal, so pytest's ``==`` parity would mask a
    driver hash mismatch. Every REGISTERED output must be plain
    numeric/string/bool/date."""
    import pyspark.sql.types as T

    banned = (T.ArrayType, T.MapType, T.StructType, T.DecimalType, T.BinaryType)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, banned
        ), f"{name}: registered output column {f.name} is {f.dataType}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    sp = spec.fn(spark, sf_dir)
    _assert_all_scalar(sp, name)
    spdf = sp.toPandas()
    opdf = duck.execute(spec.oracle).df()
    scols, srows = pc._to_rows(spdf)
    ocols, orows = pc._to_rows(opdf)
    assert scols == ocols, f"{name}: column names differ: {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row counts differ"
    for i, (a, b) in enumerate(zip(srows, orows)):
        assert a == b, f"{name}: first diff at sorted row {i}:\n {a}\n {b}"


def _smoke_sample() -> list[str]:
    """One oracle-backed query per operators module — the smoke tier's
    parity cross-section (rotation may vary which query represents a
    module round-to-round; any one exercises the module's import path,
    fixture wiring, and an end-to-end Spark-vs-DuckDB comparison)."""
    seen: dict[str, str] = {}
    for n, s in REGISTRY.items():
        if s.oracle is None:
            continue
        seen.setdefault(s.fn.__module__, n)
    return sorted(seen.values())


@pytest.mark.smoke
@pytest.mark.parametrize("name", _smoke_sample())
def test_smoke_query_matches_oracle(spark, sf_dir, duck, name):
    test_query_matches_oracle(spark, sf_dir, duck, name)


@pytest.mark.parametrize("name", WEAK_NAMES)
def test_weak_query_runs(spark, sf_dir, name):
    """Non-SQL-expressible operators: at minimum they run and return rows."""
    df = REGISTRY[name].fn(spark, sf_dir)
    _assert_all_scalar(df, name)
    assert df.count() >= 0
