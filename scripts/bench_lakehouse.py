"""Lakehouse throughput bench: the reference's operation surface at bulk
scale, on both in-repo table formats.

The reference ingests ONE book per HTTP request (driver-side fetch, two
sequential putObject calls). This bench measures what the engine does
with the same surface at 50k books (sf1 documents as Gutenberg-framed
texts): distributed bulk ingest (split + write + log commit), listBooks,
exists (hit + miss), a 10% MERGE, partition OPTIMIZE, and the
newest-version read — on backend=delta and backend=iceberg. Emits one
JSON line with per-op seconds and ingest rows/sec.

Usage: python scripts/bench_lakehouse.py [sf_dir] (default .stress/sf1,
falling back to /root/testdata/sf0.1)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_probe_median  # noqa: E402


def main() -> int:
    default = "/root/repo/.stress/sf1"
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else (
        default if os.path.isdir(default) else "/root/testdata/sf0.1"
    )

    from pyspark.sql import functions as F

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.lake import LakeAdapter
    from tscd_datalake_adapter_spark.sources import load_table

    spark = get_spark(
        "tscd-lakehouse-bench",
        master="local[32]",
        conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    nl = F.lit("\n")
    raw = F.concat(
        F.lit("Header"),
        nl,
        F.lit("*** START OF THE PROJECT GUTENBERG EBOOK D ***"),
        nl,
        F.col("text"),
        nl,
        F.lit("*** END OF THE PROJECT GUTENBERG EBOOK D ***"),
    )
    raw_df = d.select(
        (F.col("doc_id") + 1).alias("book_id"), raw.alias("raw")
    )
    updates = (
        d.select((F.col("doc_id") + 1).alias("book_id"))
        .where(F.col("book_id") % 10 == 0)
        .select(
            "book_id",
            F.lit("h").alias("header"),
            F.lit("updated").alias("body"),
        )
    )
    ts1 = dt.datetime(2026, 1, 1, 12, 0, 0)
    ts2 = dt.datetime(2026, 1, 2, 12, 0, 0)

    probe_pre = _cpu_probe_median()
    results: dict[str, dict] = {}
    for backend in ("delta", "iceberg"):
        root = tempfile.mkdtemp(prefix=f"lakebench_{backend}_")
        lake = LakeAdapter(spark, os.path.join(root, "lake"), backend=backend)
        ops: dict[str, float] = {}

        t0 = time.time()
        failed = lake.ingest_raw_df(raw_df, ts1)
        ops["bulk_ingest_sec"] = round(time.time() - t0, 3)
        assert failed == 0, f"{failed} split failures"

        t0 = time.time()
        books = lake.list_books()
        ops["list_books_sec"] = round(time.time() - t0, 3)
        assert len(books) == n_docs

        t0 = time.time()
        assert lake.exists(books[len(books) // 2])
        ops["exists_hit_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        assert not lake.exists(10_000_000)
        ops["exists_miss_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        lake.merge_books(updates, ts2)
        ops["merge_10pct_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        n_rows = lake.compact("20260102", "12", target_files=4)
        ops["compact_sec"] = round(time.time() - t0, 3)
        assert n_rows == n_docs // 10

        t0 = time.time()
        n_latest = lake.read_latest().count()
        ops["read_latest_sec"] = round(time.time() - t0, 3)
        assert n_latest == n_docs

        ops["ingest_books_per_sec"] = round(
            n_docs / ops["bulk_ingest_sec"], 1
        )
        results[backend] = ops
        shutil.rmtree(root, ignore_errors=True)
        print(f"{backend}: {ops}", file=sys.stderr)
    probe_post = _cpu_probe_median()

    print(
        json.dumps(
            {
                "metric": "lakehouse_surface_throughput",
                "sf_dir": sf_dir,
                "n_books": n_docs,
                "backends": results,
                "cpu_probe_sec_pre": probe_pre,
                "cpu_probe_sec_post": probe_post,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
