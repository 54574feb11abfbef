"""Drive the lake adapter end-to-end through the public package API,
including a DuckDB cross-engine readback of the parquet lake Spark wrote."""

import datetime as dt
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tscd_datalake_adapter_spark import get_spark
from tscd_datalake_adapter_spark.lake import LakeAdapter
from tscd_datalake_adapter_spark.lake.api import IngestApi

BOOK = (
    "Title page of Moby Dick\n"
    "*** START OF THE PROJECT GUTENBERG EBOOK MOBY DICK ***\n"
    "Call me Ishmael.\n"
    "*** END OF THE PROJECT GUTENBERG EBOOK MOBY DICK ***\ntrailer\n"
)


def main() -> int:
    lake_root = tempfile.mkdtemp(prefix="drive_lake_")
    spark = get_spark("drive-lake-demo", master="local[4]")
    lake = LakeAdapter(spark, os.path.join(lake_root, "lake"))
    api = IngestApi(lake)
    ts = dt.datetime(2026, 8, 13, 14, 30)

    print("ingest:", json.dumps(api.ingest(84, BOOK, ts)))
    print("status found:", json.dumps(api.status(84)))
    print("status missing:", json.dumps(api.status(9999)))
    print("list:", json.dumps(api.list()))
    print("health:", json.dumps(api.health()))
    print("probe invalid id:", json.dumps(api.ingest("84abc", BOOK)))
    print("probe zero id:", json.dumps(api.status(0)))
    print("probe bad book:", json.dumps(api.ingest(85, "not a gutenberg file")))
    print("dup ingest:", json.dumps(api.ingest(84, BOOK, ts))[:80])
    listing = api.list()
    print("list after dup:", json.dumps(listing))
    assert listing["books"] == [84], listing

    import duckdb

    rows = duckdb.sql(
        "SELECT book_id, substr(body, 1, 30) AS b FROM read_parquet('"
        + lake.lake_root
        + "/*/*/*.parquet', hive_partitioning=true) ORDER BY book_id"
    ).fetchall()
    print("duckdb reads lake:", rows)
    assert len(rows) == 2 and all(r[0] == 84 for r in rows), rows
    spark.stop()
    print("DRIVE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
