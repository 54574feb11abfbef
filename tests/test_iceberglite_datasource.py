"""The iceberglite STREAMING SOURCE: micro-batches from an iceberg_lite
table with sequence-number offsets — the format twin of the deltalite
source (tests mirror tests/test_deltalite_datasource.py)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F  # noqa: F401

from tscd_datalake_adapter_spark.sources import load_table
from tscd_datalake_adapter_spark.sources.iceberg_lite import write_iceberg
from tscd_datalake_adapter_spark.sources.iceberglite_datasource import (
    IcebergLiteStreamDataSource,
)


def _register(spark):
    try:
        spark.dataSource.register(IcebergLiteStreamDataSource)
    except Exception as e:
        assert "already" in str(e).lower() or "exists" in str(e).lower()


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_iceberglite_stream_consumes_snapshots_incrementally(
    spark, sf_dir, tmp_path
):
    """Snapshots land as micro-batch increments; identity partition
    values arrive typed from the hive path; restart from the checkpoint
    consumes only the post-stop snapshot — exactly once."""
    _register(spark)
    path = str(tmp_path / "t")
    src = _orders(spark, sf_dir)
    write_iceberg(src.where("o_orderkey < 300"), path, mode="append",
                  partition_by=("o_orderstatus",))
    write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 700"),
        path, mode="append",
    )

    out_dir = str(tmp_path / "out")
    ckpt = tempfile.mkdtemp(prefix="iceberglite_ckpt_")
    q = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 700").count()
    # two distinct snapshots stamped; partition column typed from path
    assert got.select("_snapshot_id").distinct().count() == 2
    expect = {
        (r["o_orderstatus"], r["n"])
        for r in src.where("o_orderkey < 700")
        .groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert {
        (r["o_orderstatus"], r["n"])
        for r in got.groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    } == expect

    # restart: only the new snapshot is consumed
    write_iceberg(
        src.where("o_orderkey >= 700 AND o_orderkey < 1000"),
        path, mode="append",
    )
    q2 = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 1000").count()
    assert got.select("_snapshot_id").distinct().count() == 3


def test_iceberglite_stream_rejects_rewrites_unless_opted(
    spark, sf_dir, tmp_path
):
    """A rewrite snapshot fails the stream; skip_non_append (or an
    operations filter) skips it — the INGEST-feed pattern."""
    _register(spark)
    path = str(tmp_path / "t")
    src = _orders(spark, sf_dir)
    write_iceberg(src.where("o_orderkey < 300"), path, mode="append",
                  operation="INGEST")
    write_iceberg(src.limit(5), path, mode="overwrite", operation="MERGE")
    write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 600"),
        path, mode="append", operation="INGEST",
    )

    q = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("noop")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="il_ckpt_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    with pytest.raises(Exception, match="not an append"):
        q.processAllAvailable()
        q.awaitTermination(5)
    q.stop()

    out_dir = str(tmp_path / "out")
    q2 = (
        spark.readStream.format("iceberglite")
        .option("path", path)
        .option("operations", "INGEST")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="il_ckpt2_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 600").count()
    assert got.select("_snapshot_id").distinct().count() == 2


def test_iceberglite_stream_fails_on_expired_unconsumed_snapshots(
    spark, sf_dir, tmp_path
):
    """r10 ADVICE: sequence numbers in (start, end] whose snapshots were
    removed by expire_snapshots between micro-batches must FAIL the
    stream, not silently yield nothing — the source is advertised as
    exactly-once, like the deltalite twin's missing-version raise."""
    from tscd_datalake_adapter_spark.sources.iceberg_lite import (
        expire_snapshots,
    )

    _register(spark)
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = tempfile.mkdtemp(prefix="il_ckpt_exp_")
    src = _orders(spark, sf_dir)
    write_iceberg(src.where("o_orderkey < 300"), path, mode="append")

    q = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out_dir).count() == src.where(
        "o_orderkey < 300"
    ).count()

    # two appends the stream never saw; expiry removes the first of them
    write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 600"),
        path, mode="append",
    )
    write_iceberg(
        src.where("o_orderkey >= 600 AND o_orderkey < 900"),
        path, mode="append",
    )
    expire_snapshots(path, keep_last=1)

    q2 = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    with pytest.raises(Exception, match="expired by expire_snapshots"):
        q2.processAllAvailable()
        q2.awaitTermination(5)
    q2.stop()
    # nothing partial landed: the lost increment was refused, not skipped
    assert spark.read.parquet(out_dir).count() == src.where(
        "o_orderkey < 300"
    ).count()


def test_cross_format_replication_iceberg_to_delta(spark, sf_dir, tmp_path):
    """r11 (r10 verdict item 3): the REVERSE capstone — an ICEBERG table
    streams into a DELTA target with end-to-end exactly-once:
    sequence-number offsets on the read side, the delta txn-action
    watermark on the write side. Initial sync, checkpoint catch-up
    across restart with an interleaved maintenance rewrite (skipped via
    the operations filter), and an idle re-run all land every row
    exactly once."""
    import os as _os

    from tscd_datalake_adapter_spark.sources.delta_lite import (
        last_txn_version,
        read_delta,
        table_history,
    )
    from tscd_datalake_adapter_spark.streaming.jobs import (
        run_cross_format_replication_stream,
    )

    src_tbl = str(tmp_path / "src")
    tgt_tbl = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    src = _orders(spark, sf_dir)
    write_iceberg(src.where("o_orderkey < 300"), src_tbl, mode="append",
                  operation="INGEST")
    write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 700"),
        src_tbl, mode="append", operation="INGEST",
    )

    out = run_cross_format_replication_stream(
        spark, src_tbl, ckpt, tgt_tbl,
        operations=("INGEST",),
        source_format="iceberg", target_format="delta",
    )
    assert out.count() == src.where("o_orderkey < 700").count()
    assert all(
        h["operation"] == "STREAMING UPDATE"
        for h in table_history(tgt_tbl)
    )

    # catch-up after new source commits + an interleaved maintenance
    # rewrite (filtered out — must not break the resume)
    write_iceberg(src.limit(5), src_tbl, mode="overwrite",
                  operation="MERGE")
    write_iceberg(
        src.where("o_orderkey >= 700 AND o_orderkey < 1000"),
        src_tbl, mode="append", operation="INGEST",
    )
    out = run_cross_format_replication_stream(
        spark, src_tbl, ckpt, tgt_tbl,
        operations=("INGEST",),
        source_format="iceberg", target_format="delta",
    )
    assert out.count() == src.where("o_orderkey < 1000").count()
    # rows survive the format hop cell-for-cell
    a = sorted(tuple(r) for r in read_delta(spark, tgt_tbl).collect())
    b = sorted(
        tuple(r) for r in src.where("o_orderkey < 1000").collect()
    )
    assert a == b

    # idle re-run: txn watermark stands, nothing duplicated
    app_id = f"iceberg-to-delta:{_os.path.abspath(src_tbl)}"
    wm = last_txn_version(tgt_tbl, app_id)
    assert wm is not None
    out = run_cross_format_replication_stream(
        spark, src_tbl, ckpt, tgt_tbl,
        operations=("INGEST",),
        source_format="iceberg", target_format="delta",
    )
    assert out.count() == src.where("o_orderkey < 1000").count()
    assert last_txn_version(tgt_tbl, app_id) == wm

    # unsupported direction pairs refuse loudly
    with pytest.raises(ValueError, match="cross-format"):
        run_cross_format_replication_stream(
            spark, src_tbl, ckpt, tgt_tbl,
            source_format="iceberg", target_format="iceberg",
        )


def test_iceberglite_stream_fails_on_mid_stream_schema_evolution(
    spark, sf_dir, tmp_path
):
    """r11 (r10 verdict item 5, format twin): a snapshot in range whose
    schema-id resolves to an evolved schema fails the stream loudly —
    even under skip_non_append — never silently misaligns rows."""
    _register(spark)
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    src = _orders(spark, sf_dir)
    write_iceberg(src.where("o_orderkey < 300"), path, mode="append")

    q = (
        spark.readStream.format("iceberglite")
        .option("path", path)
        .option("skip_non_append", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="il_ckpt_se_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()

    write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 600")
        .withColumnRenamed("o_totalprice", "price"),
        path,
        mode="overwrite",
    )
    with pytest.raises(Exception, match="evolved schema"):
        q.processAllAvailable()
        q.awaitTermination(5)
    q.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where("o_orderkey < 300").count()


def test_iceberglite_stream_vs_mor_delete(spark, sf_dir, tmp_path):
    """r11 interplay pin: a MERGE-ON-READ delete snapshot in range is a
    NON-append (summary mode merge-on-read-delete) — the unfiltered
    stream fails loudly on it; skip_non_append keeps the append-only
    feed flowing (already-streamed rows stay streamed; the delete is a
    downstream concern, documented MOR semantics for append feeds)."""
    from tscd_datalake_adapter_spark.sources.iceberg_lite import (
        delete_iceberg,
    )

    _register(spark)
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    src = _orders(spark, sf_dir)
    write_iceberg(src.where("o_orderkey < 300"), path, mode="append")
    delete_iceberg(
        spark, path, "o_orderkey < 50", strategy="merge-on-read"
    )
    write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 600"),
        path, mode="append",
    )

    q = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("noop")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="il_ckpt_mor_")
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    with pytest.raises(Exception, match="not an append"):
        q.processAllAvailable()
        q.awaitTermination(5)
    q.stop()

    q2 = (
        spark.readStream.format("iceberglite")
        .option("path", path)
        .option("skip_non_append", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="il_ckpt_mor2_"),
        )
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out_dir)
    # append-only feed semantics: both append snapshots' FULL row sets
    # flow (the MOR delete is table-read semantics, not feed semantics)
    assert got.count() == src.where("o_orderkey < 600").count()


def test_iceberglite_stream_skips_rolled_back_snapshots(
    spark, sf_dir, tmp_path
):
    """r11 review fix: a snapshot rolled back OUT of the lineage must
    never reach the stream as a phantom append — it is skipped (its
    rows were never emitted), later appends flow, and expiring the
    abandoned snapshot does not brick the stream. The incremental batch
    reader refuses a rolled-back from-snapshot explicitly."""
    from tscd_datalake_adapter_spark.sources.iceberg_lite import (
        expire_snapshots,
        read_iceberg_incremental,
        rollback_iceberg,
    )

    _register(spark)
    path = str(tmp_path / "t")
    out_dir = str(tmp_path / "out")
    ckpt = tempfile.mkdtemp(prefix="il_ckpt_rb_")
    src = _orders(spark, sf_dir)
    s1 = write_iceberg(src.where("o_orderkey < 300"), path, mode="append")

    q = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # an append the stream never saw gets rolled back; a fresh append
    # follows on the restored lineage
    s2 = write_iceberg(
        src.where("o_orderkey >= 300 AND o_orderkey < 600"),
        path, mode="append",
    )
    rollback_iceberg(path, s1)
    write_iceberg(
        src.where("o_orderkey >= 600 AND o_orderkey < 900"),
        path, mode="append",
    )

    q2 = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out_dir)
    # s2's rows (the rolled-back branch) never appear; s3's do
    assert got.where(
        "o_orderkey >= 300 AND o_orderkey < 600"
    ).count() == 0
    assert got.count() == src.where(
        "o_orderkey < 300 OR (o_orderkey >= 600 AND o_orderkey < 900)"
    ).count()

    # the incremental batch reader names the lineage problem
    with pytest.raises(ValueError, match="lineage"):
        read_iceberg_incremental(spark, path, s2)

    # expiring the abandoned snapshot must not brick the stream
    expire_snapshots(path, keep_last=1)
    write_iceberg(
        src.where("o_orderkey >= 900 AND o_orderkey < 1000"),
        path, mode="append",
    )
    q3 = (
        spark.readStream.format("iceberglite").option("path", path).load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q3.processAllAvailable()
    q3.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == src.where(
        "o_orderkey < 300 OR (o_orderkey >= 600 AND o_orderkey < 1000)"
    ).count()
