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

Implementation notes: this uses ``SimpleDataSourceStreamReader`` — reads
happen on the DRIVER, which is the right tool for bounded-rate replay and
tests; a production-scale source would implement the partition-based
``DataSourceStreamReader`` so each offset range fans out to executor
tasks (the same registry exposes it; the batch ``gutenberg`` source shows
the per-partition pattern). Trigger caveat discovered here:
Python micro-batch streams do NOT support Trigger.AvailableNow (Spark
falls back to one batch) — drive them with a processingTime trigger +
``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
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


class EventReplayDataSource(DataSource):
    @classmethod
    def name(cls):
        return "eventreplay"

    def schema(self):
        return SCHEMA

    def simpleStreamReader(self, schema):
        return EventReplayReader(self.options)
