"""Custom Python DataSource (Spark 4 DataSource API): ``gutenberg``.

The reference's ingestion fetch (``IngestionService.java:46`` fetch →
``IngestionService.java:108-132`` marker split) re-expressed as a
FIRST-CLASS Spark table source instead of a driver-side loop:

    spark.dataSource.register(GutenbergDataSource)
    df = (spark.read.format("gutenberg")
          .option("ids", "84,1342")                # book ids
          .option("base_url", "file:///fixtures")  # default: gutenberg.org
          .load())
    # => (book_id long, ok boolean, header string, body string,
    #     n_chars long, error string)

Why a DataSource and not a UDF pipeline: the source declares ONE
InputPartition PER BOOK, so Spark schedules each fetch+split as its own
task — fetch parallelism comes from the scheduler (executor-distributed,
retry-per-task, locality-free) instead of from hand-rolled threading, and
the result is an ordinary DataFrame that joins/filters/writes like any
other table. Failed fetches or marker-less books become ``ok = false``
rows with the error message, never task failures — the quarantine
contract of the lake's JSON reader applied to remote content.

``base_url`` keeps the source testable offline: tests point it at
``file://`` fixtures; the default is the reference's public URL scheme
(the option value replaces the scheme+host+path prefix, with the same
``/<id>/pg<id>.txt`` suffix the reference derives).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("book_id", LongType()),
        StructField("ok", BooleanType()),
        StructField("header", StringType()),
        StructField("body", StringType()),
        StructField("n_chars", LongType()),
        StructField("error", StringType()),
    ]
)


class _BookPartition(InputPartition):
    def __init__(self, book_id: int, url: str):
        self.book_id = book_id
        self.url = url


class GutenbergReader(DataSourceReader):
    def __init__(self, options):
        self.ids = [
            int(x)
            for x in str(options.get("ids", "")).split(",")
            if str(x).strip()
        ]
        if not self.ids:
            raise ValueError("gutenberg source requires option 'ids'")
        self.base_url = options.get("base_url")
        self.timeout = float(options.get("timeout", "20"))

    def _url(self, book_id: int) -> str:
        if self.base_url:
            return f"{self.base_url.rstrip('/')}/{book_id}/pg{book_id}.txt"
        from tscd_datalake_adapter_spark.lake.gutenberg import gutenberg_url

        return gutenberg_url(book_id)

    def partitions(self):
        # one partition per book: each fetch+split is its own Spark task
        return [_BookPartition(i, self._url(i)) for i in self.ids]

    def read(self, partition):
        import urllib.request

        from tscd_datalake_adapter_spark.lake.gutenberg import split_book

        try:
            with urllib.request.urlopen(
                partition.url, timeout=self.timeout
            ) as resp:
                txt = resp.read().decode("utf-8", errors="replace")
        except Exception as exc:  # noqa: BLE001 — quarantine, don't fail task
            yield (partition.book_id, False, None, None, None, str(exc)[:500])
            return
        res = split_book(txt)
        if not res.ok:
            yield (
                partition.book_id,
                False,
                None,
                None,
                None,
                f"gutenberg markers missing/mis-ordered for {partition.book_id}",
            )
            return
        yield (
            partition.book_id,
            True,
            res.header,
            res.body,
            len(res.body),
            None,
        )


class GutenbergDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gutenberg"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return GutenbergReader(self.options)
