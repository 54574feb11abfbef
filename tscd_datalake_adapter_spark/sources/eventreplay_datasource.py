"""Custom Python STREAMING DataSource (Spark 4 DataSource API):
``eventreplay`` — replays a parquet events table as a deterministic
micro-batch stream.

    spark.dataSource.register(EventReplayDataSource)
    stream = (spark.readStream.format("eventreplay")
              .option("path", f"{sf_dir}/events.parquet")
              .option("batch_rows", "500")
              .load())

Rows are emitted in (ts, event_id) order, ``batch_rows`` per micro-batch,
with the offset = the count of rows already emitted — so every run
replays the identical batch sequence (the deterministic-replay property
the file-based stagers provide by file boundaries, here provided by the
source protocol itself, with exactly-once delivery via
``readBetweenOffsets`` replay on recovery).

Two reader forms behind one format name:

- default: ``SimpleDataSourceStreamReader`` — rows are prefetched on the
  DRIVER (the engine's prefetch-cache wrapper), the right tool for
  bounded-rate replay and tests. Exactly-once recovery comes from
  ``readBetweenOffsets`` replay.
- ``.option("mode", "partitioned")``: the production-shape
  ``DataSourceStreamReader`` — each micro-batch's offset range is split
  into ``rows_per_task``-sized :class:`InputPartition` s and the reads
  run in EXECUTOR tasks (row-group-pruned parquet reads; the driver only
  touches file METADATA). Requires the file to be (ts, event_id)-sorted
  in file order — true of the events fixtures and of any time-partitioned
  event log a lake writer produces; each task cheaply asserts its slice
  is sorted so a violation fails loudly instead of reordering the replay.
  Batch sequence is IDENTICAL to the simple reader's (same offset
  arithmetic, same order), pinned by test. Restart contract: on a cold
  restart against an existing checkpoint, Spark restores start offsets
  from its OWN offset WAL and does NOT call ``initialOffset`` — it goes
  straight to ``latestOffset``, so a frontier living only in reader
  memory would restart at 0, hand the engine an end offset BEHIND the
  restored start, and re-emit committed rows (duplicates). The reader
  therefore persists its committed frontier to a sidecar commit log:
  pass ``.option("frontier_dir", dir)`` (use a subdirectory next to the
  sink/checkpoint) and every ``commit(end)`` atomically records the
  offset; a restarted reader adopts it before the first ``latestOffset``,
  so the stream RESUMES exactly-once instead of replaying from zero
  (pinned live by ``tests/test_eventreplay_datasource.py``). Uncommitted
  WAL batches replay exactly as before (``partitions(start, end)`` is
  pure and adopts the replayed end offset). Without the option the
  frontier is in-memory only, as a pure replay source.

Trigger caveat discovered here: Python micro-batch streams do NOT support
Trigger.AvailableNow (Spark falls back to one batch) — drive them with a
processingTime trigger + ``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


class EventReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self._path = options.get("path")
        self._batch_rows = int(options.get("batch_rows", "500"))
        self._rows = None

    def _load(self):
        if self._rows is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                self._path,
                columns=[
                    "event_id",
                    "ts",
                    "user_id",
                    "event_type",
                    "value",
                ],
            )
            data = t.to_pylist()
            data.sort(key=lambda r: (r["ts"], r["event_id"]))
            self._rows = [
                (
                    r["event_id"],
                    r["ts"],
                    r["user_id"],
                    r["event_type"],
                    r["value"],
                )
                for r in data
            ]
        return self._rows

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        rows = self._load()
        pos = int(start["pos"])
        end = min(pos + self._batch_rows, len(rows))
        return iter(rows[pos:end]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        rows = self._load()
        return iter(rows[int(start["pos"]) : int(end["pos"])])


_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value"]


class EventReplayPartition(InputPartition):
    """One executor task's slice of a micro-batch: global row positions
    [start, end) in file order. Plain picklable attributes only."""

    def __init__(self, path: str, start: int, end: int, check_sorted: bool):
        self.path = path
        self.start = start
        self.end = end
        self.check_sorted = check_sorted


class EventReplayStreamReader(DataSourceStreamReader):
    """Partition-based reader: offsets advance ``batch_rows`` per trigger;
    ``partitions(start, end)`` fans the range out as fixed-size row slices
    and ``read`` runs on executors, reading ONLY the parquet row groups
    overlapping its slice (the driver reads metadata, never data)."""

    def __init__(self, options):
        self._path = options.get("path")
        self._batch_rows = int(options.get("batch_rows", "500"))
        rpt = int(options.get("rows_per_task", "0"))
        self._rows_per_task = rpt or max(1, -(-self._batch_rows // 4))
        self._check_sorted = (
            options.get("check_sorted", "true").lower() == "true"
        )
        self._total_cache: int | None = None
        # Restart-safe resume: adopt the sidecar commit log's offset (if
        # configured and present) so the first latestOffset() after a
        # driver restart continues from the committed frontier instead
        # of 0 — see the module docstring's restart contract.
        self._frontier_dir = options.get("frontier_dir")
        self._frontier = self._read_committed_frontier()

    def _commit_log_path(self) -> str:
        import os

        return os.path.join(self._frontier_dir, "eventreplay-commit.json")

    def _read_committed_frontier(self) -> int:
        if not self._frontier_dir:
            return 0
        import json

        try:
            with open(self._commit_log_path(), encoding="utf-8") as f:
                return int(json.load(f)["pos"])
        except (OSError, ValueError, KeyError):
            return 0

    def _write_committed_frontier(self, pos: int) -> None:
        import json
        import os

        os.makedirs(self._frontier_dir, exist_ok=True)
        path = self._commit_log_path()
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"pos": pos}, f)
        os.replace(tmp, path)  # atomic on POSIX: never a torn commit log

    def _total(self) -> int:
        if self._total_cache is None:
            import pyarrow.parquet as pq

            self._total_cache = pq.ParquetFile(self._path).metadata.num_rows
        return self._total_cache

    def initialOffset(self):
        return {"pos": 0}

    def latestOffset(self):
        self._frontier = min(self._frontier + self._batch_rows, self._total())
        return {"pos": self._frontier}

    def partitions(self, start, end):
        s, e = int(start["pos"]), int(end["pos"])
        # WAL replay after restart enters here with offsets ahead of the
        # in-memory frontier — adopt them so latestOffset stays monotone.
        self._frontier = max(self._frontier, e)
        parts = []
        p = s
        while p < e:
            q = min(p + self._rows_per_task, e)
            parts.append(
                EventReplayPartition(self._path, p, q, self._check_sorted)
            )
            p = q
        return parts

    def read(self, partition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        md = f.metadata
        # Row-group pruning: find the groups overlapping [start, end) from
        # metadata, then read just those — at 100 TB each task touches a
        # bounded byte range, never the whole file.
        groups = []
        base = None
        row0 = 0
        for i in range(md.num_row_groups):
            n = md.row_group(i).num_rows
            if row0 + n > partition.start and row0 < partition.end:
                if base is None:
                    base = row0
                groups.append(i)
            row0 += n
        if not groups:
            return iter(())
        t = f.read_row_groups(groups, columns=_COLUMNS)
        lo = partition.start - base
        t = t.slice(lo, partition.end - partition.start)
        rows = t.to_pylist()
        if partition.check_sorted:
            keys = [(r["ts"], r["event_id"]) for r in rows]
            if keys != sorted(keys):
                raise ValueError(
                    "eventreplay partitioned mode requires a "
                    "(ts, event_id)-sorted file; slice "
                    f"[{partition.start}, {partition.end}) is not sorted"
                )
        return iter(
            (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
            for r in rows
        )

    def commit(self, end):
        self._frontier = max(self._frontier, int(end["pos"]))
        if self._frontier_dir:
            self._write_committed_frontier(self._frontier)


class EventReplayDataSource(DataSource):
    @classmethod
    def name(cls):
        return "eventreplay"

    def schema(self):
        return SCHEMA

    def streamReader(self, schema):
        # Spark probes streamReader() first and falls back to
        # simpleStreamReader() on PySparkNotImplementedError
        # (pyspark/sql/datasource_internal.py::_streamReader) — raising
        # here unless mode=partitioned keeps BOTH forms selectable by
        # option under the one format name.
        if self.options.get("mode", "simple").lower() == "partitioned":
            return EventReplayStreamReader(self.options)
        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED",
            messageParameters={"feature": "streamReader (use mode=partitioned)"},
        )

    def simpleStreamReader(self, schema):
        return EventReplayReader(self.options)
