"""Tests for the custom Python DataSource (Spark 4 DataSource API):
spark.read.format('gutenberg') over file:// fixtures — one InputPartition
per book, quarantine rows for fetch failures and marker-less books."""

from __future__ import annotations

import pytest

from tests.conftest import BOOK_NO_END, BOOK_UNICODE, BOOK_V1, BOOK_V2
from tscd_datalake_adapter_spark.lake.gutenberg import split_book
from tscd_datalake_adapter_spark.sources.gutenberg_datasource import (
    GutenbergDataSource,
)


@pytest.fixture()
def gutenberg_tree(tmp_path):
    books = {84: BOOK_V1, 1342: BOOK_V2, 7: BOOK_UNICODE, 99: BOOK_NO_END}
    root = tmp_path / "gut"
    for bid, txt in books.items():
        d = root / str(bid)
        d.mkdir(parents=True)
        (d / f"pg{bid}.txt").write_text(txt, encoding="utf-8")
    return root


def test_gutenberg_datasource_reads_splits_and_quarantines(
    spark, gutenberg_tree
):
    spark.dataSource.register(GutenbergDataSource)
    df = (
        spark.read.format("gutenberg")
        .option("ids", "84,1342,7,99,12345")  # 12345 does not exist
        .option("base_url", f"file://{gutenberg_tree}")
        .load()
    )
    # one input partition per book id
    assert df.rdd.getNumPartitions() == 5
    rows = {r.book_id: r for r in df.collect()}
    assert set(rows) == {84, 1342, 7, 99, 12345}
    # ok rows carry the EXACT reference split semantics
    for bid, txt in ((84, BOOK_V1), (1342, BOOK_V2), (7, BOOK_UNICODE)):
        ref = split_book(txt)
        assert rows[bid].ok
        assert rows[bid].header == ref.header
        assert rows[bid].body == ref.body
        assert rows[bid].n_chars == len(ref.body)
        assert rows[bid].error is None
    # marker-less book -> quarantine row, reference error message shape
    assert not rows[99].ok and "markers" in rows[99].error
    # missing file -> quarantine row, not a task failure
    assert not rows[12345].ok and rows[12345].error
    # and the result is an ordinary DataFrame: filter + agg compose
    n_ok = df.where("ok").count()
    assert n_ok == 3


def test_gutenberg_datasource_requires_ids(spark, gutenberg_tree):
    spark.dataSource.register(GutenbergDataSource)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError, ValueError)):
        (
            spark.read.format("gutenberg")
            .option("base_url", f"file://{gutenberg_tree}")
            .load()
            .collect()
        )
