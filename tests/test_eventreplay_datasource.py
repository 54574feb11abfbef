"""The custom STREAMING DataSource (eventreplay): deterministic
micro-batch replay of the events table through the Spark 4 Python
DataSource streaming protocol, verified against batch aggregation."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.sources import load_table
from tscd_datalake_adapter_spark.sources.eventreplay_datasource import (
    EventReplayDataSource,
)


def test_eventreplay_stream_matches_batch(spark, sf_dir):
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception as e:  # already registered by a prior test run
        assert "already" in str(e).lower()
    stream = (
        spark.readStream.format("eventreplay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batch_rows", "300")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
    )
    ckpt = tempfile.mkdtemp(prefix="eventreplay_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("eventreplay_smoke")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_type: (r.n, float(r.total))
        for r in spark.sql("SELECT * FROM eventreplay_smoke").collect()
    }
    expected = {
        r.event_type: (r.n, float(r.total))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
        )
        .collect()
    }
    assert got == expected
    # several micro-batches actually ran: 1000 rows / 300 per batch
    progress = q.recentProgress
    assert len(progress) >= 2 or sum(
        p["numInputRows"] > 0 for p in progress
    ) >= 2
