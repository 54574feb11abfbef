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

def test_eventreplay_partitioned_stream_matches_batch(spark, sf_dir):
    """mode=partitioned: same end-to-end result through the executor-side
    DataSourceStreamReader — reads fan out as InputPartitions (rows_per_task
    75 → 4 tasks per 300-row batch) instead of driver prefetch."""
    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception as e:
        assert "already" in str(e).lower()
    stream = (
        spark.readStream.format("eventreplay")
        .option("path", f"{sf_dir}/events.parquet")
        .option("batch_rows", "300")
        .option("rows_per_task", "75")
        .option("mode", "partitioned")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("total"),
    )
    ckpt = tempfile.mkdtemp(prefix="eventreplay_part_ckpt_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("eventreplay_part_smoke")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.event_type: (r.n, float(r.total))
        for r in spark.sql("SELECT * FROM eventreplay_part_smoke").collect()
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
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(progress) >= 2, "expected multiple micro-batches"


def test_eventreplay_partitioned_batch_sequence_identical_to_simple(sf_dir):
    """Protocol-level pin (no Spark session needed): driving the offset
    protocol of both readers by hand yields the IDENTICAL per-batch row
    sequence — the partitioned form is a drop-in executor-scale variant,
    not a semantics change."""
    from tscd_datalake_adapter_spark.sources.eventreplay_datasource import (
        EventReplayReader,
        EventReplayStreamReader,
    )

    path = f"{sf_dir}/events.parquet"
    opts = {"path": path, "batch_rows": "300", "rows_per_task": "64"}
    simple = EventReplayReader(opts)
    part = EventReplayStreamReader(opts)

    simple_batches = []
    off = simple.initialOffset()
    while True:
        it, end = simple.read(off)
        rows = list(it)
        if not rows:
            break
        simple_batches.append(rows)
        off = end

    part_batches = []
    start = part.initialOffset()
    while True:
        end = part.latestOffset()
        if end["pos"] == start["pos"]:
            break
        parts = part.partitions(start, end)
        assert len(parts) >= 2, "batch did not fan out into multiple tasks"
        rows = [row for p in parts for row in part.read(p)]
        part_batches.append(rows)
        part.commit(end)
        start = end

    assert len(simple_batches) == len(part_batches)
    for a, b in zip(simple_batches, part_batches):
        assert a == b


def test_eventreplay_partitioned_read_prunes_row_groups(sf_dir, tmp_path):
    """read() touches only the row groups overlapping its slice, and the
    per-slice sorted guard raises on an unsorted file."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    from tscd_datalake_adapter_spark.sources.eventreplay_datasource import (
        EventReplayPartition,
        EventReplayStreamReader,
    )

    t0 = datetime(2024, 1, 1)
    n = 100
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([t0 + timedelta(seconds=i) for i in range(n)]),
            "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)]),
        }
    )
    sorted_path = str(tmp_path / "sorted.parquet")
    pq.write_table(tbl, sorted_path, row_group_size=10)  # 10 row groups

    rdr = EventReplayStreamReader({"path": sorted_path, "batch_rows": "40"})
    # slice [25, 35) overlaps exactly row groups 2 and 3
    rows = list(rdr.read(EventReplayPartition(sorted_path, 25, 35, True)))
    assert [r[0] for r in rows] == list(range(25, 35))

    # unsorted file → loud failure, not silent reorder
    perm = list(range(n))
    perm[3], perm[4] = perm[4], perm[3]
    unsorted = tbl.take(pa.array(perm))
    unsorted_path = str(tmp_path / "unsorted.parquet")
    pq.write_table(unsorted, unsorted_path, row_group_size=10)
    import pytest

    with pytest.raises(ValueError, match="not sorted"):
        list(rdr.read(EventReplayPartition(unsorted_path, 0, 10, True)))


def test_eventreplay_frontier_survives_reader_restart(sf_dir, tmp_path):
    """Protocol-level pin of the sidecar commit log: a fresh reader object
    (simulated driver restart) adopts the committed frontier, so its first
    latestOffset() CONTINUES instead of restarting at 0 — the offset that
    would otherwise land behind Spark's WAL-restored start offset and
    re-emit committed rows."""
    from tscd_datalake_adapter_spark.sources.eventreplay_datasource import (
        EventReplayStreamReader,
    )

    opts = {
        "path": f"{sf_dir}/events.parquet",
        "batch_rows": "300",
        "frontier_dir": str(tmp_path / "frontier"),
    }
    r1 = EventReplayStreamReader(opts)
    start = r1.initialOffset()
    first = []
    for _ in range(2):  # two committed batches
        end = r1.latestOffset()
        for p in r1.partitions(start, end):
            first.extend(r1.read(p))
        r1.commit(end)
        start = end
    assert start == {"pos": 600}

    # restart: a brand-new reader object over the same frontier_dir
    r2 = EventReplayStreamReader(opts)
    nxt = r2.latestOffset()
    assert nxt == {"pos": 900}, "restarted reader must resume, not replay"
    resumed = [row for p in r2.partitions(start, nxt) for row in r2.read(p)]
    assert [r[0] for r in resumed] and not (
        set(r[0] for r in resumed) & set(r[0] for r in first)
    ), "resumed batch re-emitted committed rows"

    # an uncommitted WAL replay (engine calls partitions with offsets ahead
    # of the commit log) still adopts the replayed end — monotone frontier
    r3 = EventReplayStreamReader(opts)
    replay = [
        row
        for p in r3.partitions({"pos": 600}, {"pos": 900})
        for row in r3.read(p)
    ]
    assert replay == resumed, "partitions(start, end) must be pure"
    # frontier advanced past the replayed end, capped at the file's total
    assert r3.latestOffset() == {"pos": 1000}


def test_eventreplay_partitioned_restart_is_exactly_once(spark, sf_dir, tmp_path):
    """Live job: stop mid-stream, restart from the SAME checkpoint dir and
    frontier_dir, and pin the parquet sink's full row multiset equal to the
    batch twin — exactly once, no replay-from-zero duplicates."""
    import time

    try:
        spark.dataSource.register(EventReplayDataSource)
    except Exception as e:
        assert "already" in str(e).lower()

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    frontier = str(tmp_path / "frontier")

    def start_query():
        return (
            spark.readStream.format("eventreplay")
            .option("path", f"{sf_dir}/events.parquet")
            .option("batch_rows", "100")
            .option("rows_per_task", "50")
            .option("mode", "partitioned")
            .option("frontier_dir", frontier)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )

    q = start_query()
    # stop after at least one committed batch, ideally mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if done:
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(30)

    n_before = spark.read.parquet(sink).count()
    total = load_table(spark, sf_dir, "events").count()
    assert n_before >= 1

    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)

    got = (
        spark.read.parquet(sink)
        .groupBy("event_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert got == 0, "restart re-emitted committed rows (duplicates)"
    final = spark.read.parquet(sink).select("event_id").distinct().count()
    assert final == total, f"missing rows after restart: {final} != {total}"
    # and values survive end-to-end: full multiset equality vs the table
    sums = spark.read.parquet(sink).agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("s")
    ).collect()[0]["s"]
    expected = load_table(spark, sf_dir, "events").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("s")
    ).collect()[0]["s"]
    assert sums == expected


def test_eventreplay_frontier_commit_log_corruption_falls_back(sf_dir, tmp_path):
    """A torn/corrupt sidecar commit log must degrade to frontier 0 (full
    deterministic replay — the pre-r7 behavior), never crash the reader."""
    import os

    from tscd_datalake_adapter_spark.sources.eventreplay_datasource import (
        EventReplayStreamReader,
    )

    fdir = tmp_path / "frontier"
    os.makedirs(fdir)
    opts = {
        "path": f"{sf_dir}/events.parquet",
        "batch_rows": "300",
        "frontier_dir": str(fdir),
    }
    for payload in ("", "{not json", '{"wrong_key": 3}', '{"pos": "x"}'):
        (fdir / "eventreplay-commit.json").write_text(payload)
        r = EventReplayStreamReader(opts)
        assert r.latestOffset() == {"pos": 300}, payload

    # a valid log written through commit() round-trips
    r = EventReplayStreamReader(opts)
    r.commit({"pos": 600})
    assert EventReplayStreamReader(opts).latestOffset() == {"pos": 900}
