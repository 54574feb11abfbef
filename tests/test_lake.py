"""Lake-adapter round-trip tests (SURVEY.md §5.2 item 3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.lake import LakeAdapter
from tscd_datalake_adapter_spark.lake.adapter import BOOK_SCHEMA, InvalidBookId
from tscd_datalake_adapter_spark.lake.api import IngestApi

pytestmark = pytest.mark.smoke

TS = dt.datetime(2026, 8, 13, 14, 30, 0)
TS2 = dt.datetime(2026, 8, 14, 9, 0, 0)


@pytest.fixture()
def lake(spark, tmp_path):
    return LakeAdapter(spark, str(tmp_path / "lake"))


def test_ingest_list_exists_roundtrip(lake, book_dir):
    results = lake.ingest_files(
        sorted(str(p) for p in book_dir.iterdir()), TS
    )
    assert all(r["status"] == "ingested" for r in results)
    assert lake.list_books() == [11, 22, 33]
    assert lake.exists(22)
    assert not lake.exists(999)
    # Re-read schema equality on names+types (SURVEY.md §5.2 item 3);
    # nullability flags are owned by the parquet reader, not the contract.
    got = [(f.name, f.dataType) for f in lake.read().schema.fields]
    want = [(f.name, f.dataType) for f in BOOK_SCHEMA.fields]
    assert got == want


def test_partition_layout(lake, book_dir):
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS)
    import os

    part = os.path.join(lake.lake_root, "ingest_date=20260813", "ingest_hour=14")
    assert os.path.isdir(part)
    row = (
        lake.read()
        .where(F.col("book_id") == 11)
        .select("ingest_date", "ingest_hour", "header", "body")
        .first()
    )
    assert (row.ingest_date, row.ingest_hour) == ("20260813", "14")
    assert row.body.startswith("MOBY DICK ***")


def test_duplicate_ingest_idempotent_listing(lake, book_dir):
    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths, TS)
    lake.ingest_files(paths, TS2)  # same ids, different partition
    # Both partition paths exist; list/exists report each id once
    # (FIXTURES.md §F2 duplicate-ingest case).
    assert lake.list_books() == [11, 22, 33]
    assert lake.read().where(F.col("book_id") == 11).count() == 2
    assert lake.exists(11)


def test_empty_lake(lake):
    assert lake.list_books() == []
    assert not lake.exists(1)


def test_invalid_book_id(lake):
    for bad in ("abc", 0, -5, None, "1.5"):
        with pytest.raises(InvalidBookId):
            lake.exists(bad)


def test_relative_path_for(lake):
    # R7 shape: datalake/{yyyyMMdd}/{HH}/{id} (S3DatalakeStorage.java:121-124).
    assert lake.relative_path_for(7, TS) == "datalake/20260813/14/7"


def test_distributed_bulk_ingest(lake, spark, book_dir):
    from tests.conftest import BOOK_NO_END, BOOK_V1, BOOK_V2

    raw = spark.createDataFrame(
        [(1, BOOK_V1), (2, BOOK_V2), (3, BOOK_NO_END)],
        "book_id long, raw string",
    )
    failed = lake.ingest_raw_df(raw, TS)
    assert failed == 1  # the unparseable book is dropped, counted
    assert lake.list_books() == [1, 2]


def test_compaction(lake, book_dir, spark):
    import glob

    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths, TS)  # 3 separate commits → ≥3 files
    part_glob = f"{lake.lake_root}/ingest_date=20260813/ingest_hour=14/*.parquet"
    assert len(glob.glob(part_glob)) >= 3
    before = sorted(tuple(r) for r in lake.read().collect())

    n = lake.compact("20260813", "14", target_files=1)
    assert n == 3
    assert len(glob.glob(part_glob)) == 1  # small files merged
    after = sorted(tuple(r) for r in lake.read().collect())
    assert before == after  # data byte-identical
    assert lake.list_books() == [11, 22, 33]

    # missing partition: observed 0 rows, empty dynamic overwrite is a
    # no-op — nothing deleted elsewhere (round-5 one-pass compact)
    assert lake.compact("19990101", "03") == 0
    assert sorted(tuple(r) for r in lake.read().collect()) == after


def test_approx_percentile_bounds(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.relational_extra import (
        approx_percentiles_by_status,
    )

    for r in approx_percentiles_by_status(spark, sf_dir).collect():
        assert abs(r.approx_median - r.exact_median) <= 0.02 * abs(r.exact_median)
        assert abs(r.approx_p90 - r.exact_p90) <= 0.02 * abs(r.exact_p90)


def test_approx_count_distinct_bounds(spark, sf_dir):
    from tscd_datalake_adapter_spark.operators.relational_extra import (
        approx_count_distinct_custkeys,
    )

    for r in approx_count_distinct_custkeys(spark, sf_dir).collect():
        # rsd=0.02 → generous 10% acceptance band
        assert abs(r.approx_customers - r.exact_customers) <= max(
            3, 0.1 * r.exact_customers
        )


def test_retention_expire(lake, book_dir):
    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths, TS)   # 20260813
    lake.ingest_files(paths, TS2)  # 20260814
    assert lake.expire("20260814") == 1  # drops only the 0813 partition
    assert lake.read().select("ingest_date").distinct().collect()[0][0] == "20260814"
    assert lake.list_books() == [11, 22, 33]  # newer copies survive
    assert lake.expire("20260813") == 0  # nothing older left


@pytest.mark.parametrize("backend", ["delta", "iceberg"])
def test_read_as_of_after_maintenance_purge(spark, tmp_path, book_dir, backend):
    """ADVICE r9 (medium): maintenance commits (compact/expire) are
    stamped at the NEWEST INGEST time, not the wall clock — otherwise
    read_as_of for any cutoff in (last-ingest-stamp, wall-clock-now)
    resolves to a pre-maintenance version whose files the purge just
    deleted: a scan crash on delta, a silently EMPTY lake on iceberg
    (expire_snapshots trims the snapshot-log)."""
    lake = LakeAdapter(spark, str(tmp_path / f"mlake_{backend}"), backend=backend)
    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths, TS)

    # compact purges the replaced small files; a cutoff 1 min after the
    # last ingest (but well before the wall-clock maintenance run) must
    # resolve to the surviving compacted snapshot
    lake.compact("20260813", "14", target_files=1)
    as_of = lake.read_as_of(TS + dt.timedelta(minutes=1))
    assert sorted(r.book_id for r in as_of.collect()) == [11, 22, 33]

    # expire drops the 0813 partition and purges its files; a cutoff
    # just after the newest ingest must still see the surviving 0814 rows
    lake.ingest_files(paths, TS2)
    lake.expire("20260814")
    as_of2 = lake.read_as_of(TS2 + dt.timedelta(minutes=1))
    rows = as_of2.select("book_id", "ingest_date").collect()
    assert sorted(r.book_id for r in rows) == [11, 22, 33]
    assert {r.ingest_date for r in rows} == {"20260814"}


@pytest.mark.parametrize("backend", ["delta", "iceberg"])
def test_books_ingested_since_change_feed(
    spark, tmp_path, book_dir, backend
):
    """r10 change-feed over the reference surface: poll the books
    appended by INGEST commits after a saved log position — maintenance
    rewrites (MERGE) in between are skipped, not re-surfaced."""
    lake = LakeAdapter(spark, str(tmp_path / f"clake_{backend}"), backend=backend)
    paths = sorted(str(p) for p in book_dir.iterdir())
    assert lake.log_position() is None
    assert lake.books_ingested_since(None).count() == 0

    lake.ingest_files(paths, TS)  # books 11, 22, 33
    pos = lake.log_position()
    assert pos is not None
    # everything from the beginning
    assert sorted(
        r.book_id for r in lake.books_ingested_since(None).collect()
    ) == [11, 22, 33]
    # nothing new yet at the saved cursor
    assert lake.books_ingested_since(pos).count() == 0

    # a MERGE (rewrite) between polls is NOT new data
    updates = spark.createDataFrame(
        [(22, "h", "merged body")],
        "book_id long, header string, body string",
    )
    lake.merge_books(updates, TS2, purge=False)
    assert lake.books_ingested_since(pos).count() == 0

    # new ingests after the cursor surface exactly once, with the full
    # row contract
    from tests.conftest import BOOK_V1

    lake.ingest_text(44, BOOK_V1, TS2)
    got = lake.books_ingested_since(pos)
    assert [f.name for f in got.schema.fields] == [
        f.name for f in lake.read().schema.fields
    ]
    rows = got.collect()
    assert [r.book_id for r in rows] == [44]
    assert rows[0].ingest_date == "20260814"


def test_merge_upsert(lake, book_dir, spark):
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS)
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS2)
    assert lake.read().where(F.col("book_id") == 22).count() == 2

    updates = spark.createDataFrame(
        [(22, "new header", "new body"), (44, "h44", "b44")],
        "book_id long, header string, body string",
    )
    ts3 = dt.datetime(2026, 8, 15, 10, 0, 0)
    lake.merge_books(updates, ts3)

    # updated book: exactly one row, the new version, in the merge partition
    rows = lake.read().where(F.col("book_id") == 22).collect()
    assert len(rows) == 1
    assert rows[0].body == "new body" and rows[0].ingest_date == "20260815"
    # inserted book appears; untouched books unchanged (both versions intact)
    assert lake.read().where(F.col("book_id") == 44).count() == 1
    assert lake.read().where(F.col("book_id") == 11).count() == 2
    assert lake.list_books() == [11, 22, 33, 44]


def test_merge_physically_drops_fully_superseded_partition(
    lake, book_dir, spark
):
    """A partition whose EVERY row is updated away must physically
    disappear (the r6 documented caveat, closed in r7): dynamic partition
    overwrite alone would skip the now-empty partition; merge_books now
    observes the surviving partition set during the rewrite and drops the
    rest partition-level. read_latest output is unchanged by the delete."""
    import os

    # book 55 alone in its own partition; 11/22/33 together in another
    lake.ingest_text(
        55,
        "Header 55\n*** START OF THE PROJECT GUTENBERG EBOOK X ***\n"
        "old body\n*** END OF THE PROJECT GUTENBERG EBOOK X ***\n",
        TS,
    )
    assert lake.exists(55)
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS2)

    solo_part = os.path.join(
        lake.lake_root, "ingest_date=20260813", "ingest_hour=14"
    )
    assert os.path.isdir(solo_part)

    updates = spark.createDataFrame(
        [(55, "h55", "new body")], "book_id long, header string, body string"
    )
    ts3 = dt.datetime(2026, 8, 15, 10, 0, 0)
    lake.merge_books(updates, ts3)

    # the fully-superseded partition is physically gone (day dir pruned too)
    assert not os.path.isdir(solo_part)
    assert not os.path.isdir(os.path.dirname(solo_part))
    # the other partition survives untouched; merge partition holds the new row
    rows = lake.read().where(F.col("book_id") == 55).collect()
    assert len(rows) == 1
    assert rows[0].body == "new body" and rows[0].ingest_date == "20260815"
    latest = lake.read_latest()
    assert latest.count() == 4
    by_id = {r.book_id: r for r in latest.collect()}
    assert by_id[55].body == "new body"
    assert by_id[11].ingest_date == TS2.strftime("%Y%m%d")
    assert lake.list_books() == [11, 22, 33, 55]


def test_read_latest_resolves_superseded_versions(lake, book_dir, spark):
    """read_latest() must show exactly one (the newest) version per book even
    when merge_books leaves stale physical rows behind (its documented
    partition-overwrite caveat)."""
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS)
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS2)

    updates = spark.createDataFrame(
        [(22, "new header", "new body")], "book_id long, header string, body string"
    )
    lake.merge_books(updates, dt.datetime(2026, 8, 15, 10, 0, 0))

    latest = lake.read_latest()
    assert latest.count() == 3  # one row per book, every book still listed
    by_id = {r.book_id: r for r in latest.collect()}
    assert by_id[22].body == "new body" and by_id[22].ingest_date == "20260815"
    # un-merged books resolve to their newest ingest (TS2 partition)
    assert by_id[11].ingest_date == TS2.strftime("%Y%m%d")
    assert by_id[33].ingest_date == TS2.strftime("%Y%m%d")


def test_read_as_of_time_travel(lake, book_dir, spark):
    """read_as_of(ts) reconstructs the lake at ts: versions newer than the
    cutoff are invisible, versions at/before it resolve to the newest one,
    and books born after the cutoff are absent entirely."""
    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths[:2], TS)  # books 11, 22 on day 1
    lake.ingest_files(paths, TS2)  # all three re-ingested on day 2

    as_of_day1 = lake.read_as_of(dt.datetime(2026, 8, 13, 23, 0, 0))
    got = {(r.book_id, r.ingest_date) for r in as_of_day1.collect()}
    assert got == {(11, "20260813"), (22, "20260813")}  # book 33 not yet born

    as_of_now = lake.read_as_of(dt.datetime(2026, 8, 20, 0, 0, 0))
    got2 = {(r.book_id, r.ingest_date) for r in as_of_now.collect()}
    assert got2 == {(11, "20260814"), (22, "20260814"), (33, "20260814")}

    # cutoff exactly at TS includes the TS ingest (<=, not <)
    assert {r.book_id for r in lake.read_as_of(TS).collect()} == {11, 22}


def test_read_as_of_tz_aware_consistency(lake, book_dir):
    """A tz-aware ingest timestamp and a tz-aware cutoff must land on the
    same (UTC) clock: a book ingested at 10:00+02:00 is visible as of
    11:00+02:00 — regression test for comparing UTC cutoffs against
    wall-clock stored timestamps."""
    tz2 = dt.timezone(dt.timedelta(hours=2))
    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths[:1], dt.datetime(2026, 8, 13, 10, 0, 0, tzinfo=tz2))

    visible = lake.read_as_of(dt.datetime(2026, 8, 13, 11, 0, 0, tzinfo=tz2))
    assert {r.book_id for r in visible.collect()} == {11}
    # stored ingest_ts is naive UTC (08:00), partition agrees
    row = lake.read().first()
    assert row.ingest_ts == dt.datetime(2026, 8, 13, 8, 0, 0)
    assert (row.ingest_date, row.ingest_hour) == ("20260813", "08")
    # a cutoff before the ingest (in UTC terms) hides it
    empty = lake.read_as_of(dt.datetime(2026, 8, 13, 9, 30, 0, tzinfo=tz2))
    assert empty.count() == 0


def test_distributed_url_fetch_ingest(lake, book_dir, spark):
    """Executor-parallel R1: fetch via urllib INSIDE mapInPandas workers
    (file:// URLs — same urllib code path as https, offline), then the
    distributed split/write. Bad URLs become error rows, not exceptions;
    unparseable books count as split failures; good books land in the lake."""
    urls = sorted(
        (int(p.name.split("_")[1].split(".")[0]), p.as_uri())
        for p in book_dir.iterdir()
    )
    urls.append((999, (book_dir / "missing.txt").as_uri()))  # fetch failure
    urls_df = spark.createDataFrame(urls, "book_id long, url string")

    fetched = lake.fetch_urls_distributed(urls_df)
    by_id = {r.book_id: r for r in fetched.collect()}
    assert by_id[999].raw is None and "fetch failed" in by_id[999].error
    assert by_id[11].error is None and "MOBY DICK" in by_id[11].raw

    stats = lake.ingest_urls(urls_df, TS)
    assert stats["fetch_failed"] == 1
    assert stats["split_failed"] == 0
    assert lake.list_books() == [11, 22, 33]
    row = lake.read().where(F.col("book_id") == 11).first()
    assert row.body.startswith("MOBY DICK ***")


def test_wholetext_dir_ingest(lake, book_dir):
    # Distributed R1 test mode: spark.read.text(wholetext) over book files.
    failed = lake.ingest_text_dir(str(book_dir / "*.txt"), TS)
    assert failed == 0
    assert lake.list_books() == [11, 22, 33]
    body = (
        lake.read().where(F.col("book_id") == 33).select("body").first().body
    )
    assert body.startswith("白鯨 🐋 ***")  # unicode + title-tail parity


def test_api_shapes(lake, book_dir):
    from tests.conftest import BOOK_V1

    api = IngestApi(lake)
    res = api.ingest(41, BOOK_V1, TS)
    assert res["status"] == "ingested"
    assert res["path"] == "datalake/20260813/14/41"
    assert res["date"] == "20260813" and res["hour"] == "14"

    assert api.status(41)["status"] == "available"
    assert api.status(404)["status"] == "not_found"
    assert api.status("x")["error"]["code"] == "invalid_book_id"
    assert api.ingest("x", BOOK_V1)["error"]["code"] == "invalid_book_id"
    assert api.ingest(5, "no markers")["error"]["code"] == "download_failed"

    listing = api.list()
    assert listing["count"] == 1 and listing["books"] == [41]
    assert api.health()["status"] == "ok"

    # the DELETE route (r11): erase, idempotent re-delete, bad id
    res = api.delete(41)
    assert res["status"] == "deleted" and res["deleted_rows"] == 1
    assert api.status(41)["status"] == "not_found"
    assert api.list()["count"] == 0
    assert api.delete(41)["status"] == "not_found"
    assert api.delete("x")["error"]["code"] == "invalid_book_id"
    # idempotent even on a lake no ingest ever touched (no table yet)
    empty = IngestApi(LakeAdapter(lake.spark, str(book_dir) + "_void"))
    assert empty.delete(7)["status"] == "not_found"


def test_lake_log_history_and_stray_file_invisibility(
    lake, book_dir, spark
):
    """The delta-backed lake (r9): every mutation is a logged commit —
    history() names them — and a stray parquet file dropped into the lake
    directory (a crashed writer, a manual copy) is INVISIBLE to reads,
    the read contract the plain-parquet layout could not give."""
    import glob
    import os
    import shutil

    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths, TS)
    ops = [h["operation"] for h in lake.history()]
    assert ops == ["INGEST", "INGEST", "INGEST"]

    # plant a stray copy of a committed data file in the same partition
    part_dir = os.path.join(
        lake.lake_root, "ingest_date=20260813", "ingest_hour=14"
    )
    some_file = glob.glob(os.path.join(part_dir, "*.parquet"))[0]
    shutil.copy(some_file, os.path.join(part_dir, "part-stray.parquet"))
    assert lake.read().count() == 3  # not 4: the stray is unlogged
    assert lake.list_books() == [11, 22, 33]

    n = lake.compact("20260813", "14", target_files=1)
    assert n == 3  # the compaction rewrote the LOGGED rows only
    ops = [h["operation"] for h in lake.history()]
    assert ops[-1] == "OPTIMIZE"


def test_merge_without_purge_keeps_time_travel(lake, book_dir, spark):
    """merge_books(purge=False) retains the tombstoned files, so log time
    travel to the pre-merge state still works — the choice the plain
    layout never had (its superseded rows were garbage, not a version)."""
    lake.ingest_files(sorted(str(p) for p in book_dir.iterdir()), TS)
    updates = spark.createDataFrame(
        [(22, "new header", "new body")],
        "book_id long, header string, body string",
    )
    ts3 = dt.datetime(2026, 8, 15, 10, 0, 0)
    lake.merge_books(updates, ts3, purge=False)

    # post-merge state: one row for 22, the new version
    rows = lake.read().where(F.col("book_id") == 22).collect()
    assert len(rows) == 1 and rows[0].body == "new body"
    # pre-merge cutoff reconstructs the ORIGINAL row through the log
    old = lake.read_as_of(dt.datetime(2026, 8, 14, 0, 0, 0))
    by_id = {r.book_id: r for r in old.collect()}
    assert by_id[22].ingest_date == "20260813"
    assert "new body" not in by_id[22].body


def test_parquet_fallback_backend(spark, tmp_path, book_dir):
    """backend="parquet" keeps the pre-round-9 log-free layout working:
    ingest/list/merge/read_as_of round-trip, and responses carry the
    fallback's backend label."""
    lake = LakeAdapter(spark, str(tmp_path / "plake"), backend="parquet")
    res = lake.ingest_files(
        sorted(str(p) for p in book_dir.iterdir()), TS
    )
    assert all(r["backend"] == "spark-parquet" for r in res)
    assert lake.list_books() == [11, 22, 33]
    import os

    assert not os.path.isdir(os.path.join(lake.lake_root, "_delta_log"))
    as_of = lake.read_as_of(dt.datetime(2026, 8, 13, 23, 0, 0))
    assert {r.book_id for r in as_of.collect()} == {11, 22, 33}
    updates = spark.createDataFrame(
        [(22, "h", "b2"), (44, "h44", "b44")],
        "book_id long, header string, body string",
    )
    lake.merge_books(updates, TS2)
    assert lake.list_books() == [11, 22, 33, 44]
    assert (
        lake.read().where(F.col("book_id") == 22).first().body == "b2"
    )
    with pytest.raises(NotImplementedError):
        lake.history()


def test_lake_write_carries_bloom_filter(spark, tmp_path):
    """The lake's book_id bloom filter must physically land in the files:
    writing identical data with the adapter's options must be measurably
    larger than a plain write (the bloom bitmap; pyarrow in this env does
    not expose bloom metadata, so size is the observable)."""
    import glob
    import os

    from tscd_datalake_adapter_spark.sources import load_table

    df = (
        load_table(spark, "/root/testdata/sf0.01", "orders")
        .selectExpr("o_orderkey AS book_id")
        .coalesce(1)
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.write.mode("overwrite").parquet(plain)
    (
        df.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#book_id", "true")
        .option("parquet.bloom.filter.expected.ndv#book_id", "100000")
        .parquet(bloomed)
    )

    def total(path):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(f"{path}/*.parquet")
        )

    assert total(bloomed) > total(plain) + 10_000, (
        f"bloom={total(bloomed)} plain={total(plain)}: no bloom bitmap written"
    )
    # and the lookup answers stay correct through the bloomed files
    back = spark.read.parquet(bloomed)
    assert back.where("book_id = 1").count() == 1
    assert back.where("book_id = -5").count() == 0


def test_lake_auto_checkpoint_bounds_log_replay(spark, tmp_path, book_dir):
    """Ingest-heavy lakes auto-checkpoint every N commits (r9): with
    checkpoint_every=4, the 4th commit writes a classic checkpoint +
    _last_checkpoint, reads resume from it, and time travel through the
    retained JSON commits still works."""
    import os

    from tests.conftest import BOOK_V1

    lake = LakeAdapter(
        spark, str(tmp_path / "cplake"), checkpoint_every=4
    )
    for i in range(1, 6):
        lake.ingest_text(
            i, BOOK_V1, dt.datetime(2026, 8, 13, 10 + i, 0, 0)
        )
    log = os.path.join(lake.lake_root, "_delta_log")
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))
    assert os.path.exists(
        os.path.join(log, f"{4:020d}.checkpoint.parquet")
    )  # fires when the version number reaches the stride (v4 = commit 5)
    assert lake.list_books() == [1, 2, 3, 4, 5]
    as_of = lake.read_as_of(dt.datetime(2026, 8, 13, 12, 30, 0))
    assert {r.book_id for r in as_of.collect()} == {1, 2}


def test_iceberg_backend_full_lifecycle(spark, tmp_path, book_dir):
    """The whole reference surface on backend="iceberg" (r9): ingest →
    exists/list → duplicate versions → merge (fully-superseded partition
    physically dropped after snapshot expiry) → compact → read_as_of
    time travel through the snapshot log → expire retention. Same
    operations, same answers as the delta backend — the adapter is
    format-agnostic."""
    import glob
    import os

    lake = LakeAdapter(spark, str(tmp_path / "ilake"), backend="iceberg")
    assert lake.list_books() == []
    res = lake.ingest_files(
        sorted(str(p) for p in book_dir.iterdir()), TS
    )
    assert all(r["backend"] == "spark-iceberg" for r in res)
    assert lake.list_books() == [11, 22, 33]
    assert lake.exists(22) and not lake.exists(999)

    # r10: the iceberg backend partitions NATIVELY by
    # day(ingest_ts)/hour(ingest_ts) — transform hive dirs on disk, and
    # the spec pins the transforms (not pre-derived string columns)
    assert os.path.isdir(
        os.path.join(
            lake.lake_root,
            "data",
            "ingest_ts_day=2026-08-13",
            "ingest_ts_hour=2026-08-13-14",
        )
    )
    from tscd_datalake_adapter_spark.sources.iceberg_lite import (
        load_metadata,
    )

    spec = load_metadata(lake.lake_root)["partition-specs"][0]["fields"]
    assert [(f["name"], f["transform"]) for f in spec] == [
        ("ingest_ts_day", "day"),
        ("ingest_ts_hour", "hour"),
    ]

    # time travel BEFORE later writes: snapshot-log resolution
    assert lake.read_as_of(
        dt.datetime(2026, 8, 13, 10, 0, 0)
    ).count() == 0
    assert {
        r.book_id for r in lake.read_as_of(TS).collect()
    } == {11, 22, 33}

    # duplicate ingest in another partition; read_latest resolves
    lake.ingest_files(
        sorted(str(p) for p in book_dir.iterdir()), TS2
    )
    assert lake.read().where(F.col("book_id") == 11).count() == 2
    assert lake.read_latest().count() == 3
    ops = [h["operation"] for h in lake.history()]
    assert ops == ["INGEST"] * 6

    # merge: book 11 fully superseded out of nothing; 44 inserted
    updates = spark.createDataFrame(
        [(22, "h", "merged body"), (44, "h44", "b44")],
        "book_id long, header string, body string",
    )
    ts3 = dt.datetime(2026, 8, 15, 10, 0, 0)
    lake.merge_books(updates, ts3)
    assert lake.list_books() == [11, 22, 33, 44]
    rows = lake.read().where(F.col("book_id") == 22).collect()
    assert len(rows) == 1 and rows[0].body == "merged body"
    # merge purge expired old snapshots: physical files of replaced
    # partitions are gone from disk
    n_files_before = len(
        glob.glob(
            os.path.join(lake.lake_root, "data", "**", "*.parquet"),
            recursive=True,
        )
    )
    assert n_files_before == len(set(lake.read().inputFiles()))

    # compact the merge partition down to one file
    n = lake.compact("20260815", "10", target_files=1)
    assert n == 2  # books 22 (merged) + 44 (inserted)
    assert lake.compact("19990101", "03") == 0  # absent: no commit
    ops = [h["operation"] for h in lake.history()]
    assert ops[-1] == "OPTIMIZE"

    # expire everything before the merge day: old partitions drop
    assert lake.expire("20260815") == 2  # the 0813 + 0814 days
    assert lake.list_books() == [22, 44]  # 11/33 lived only pre-merge
    assert lake.read().count() == 2
    # vacuum is snapshot expiry on iceberg
    assert lake.vacuum() == []  # maintenance already expired snapshots


@pytest.mark.parametrize("backend", ["delta", "iceberg"])
def test_erase_book_row_level_both_backends(
    spark, tmp_path, book_dir, backend
):
    """r11 (r10 verdict item 1): GDPR-style row-level erasure on BOTH
    table-format backends — bounds-pruned copy-on-write delete; with
    physical=True the erased bytes are physically unlinked (vacuum /
    snapshot expiry), after which no version serves the book."""
    import glob as _glob
    import os as _os

    lake = LakeAdapter(
        spark, str(tmp_path / f"elake_{backend}"), backend=backend
    )
    paths = sorted(str(p) for p in book_dir.iterdir())
    lake.ingest_files(paths, TS)
    assert lake.list_books() == [11, 22, 33]

    res = lake.erase_book(22)
    assert res["deleted_rows"] == 1
    assert res["backend"] == f"spark-{backend}"
    # single-book ingest files carry exact min==max book_id stats, so
    # the rewrite touches exactly the one file holding book 22
    assert res["rewritten_files"] == 1
    assert lake.list_books() == [11, 33]
    assert not lake.exists(22)
    # the other books' rows are untouched cell-for-cell
    rows = {r.book_id: r.body for r in lake.read().collect()}
    assert set(rows) == {11, 33}

    # idempotent: erasing again deletes nothing and commits nothing
    hist_len = len(lake.history())
    res2 = lake.erase_book(22)
    assert res2["deleted_rows"] == 0
    assert len(lake.history()) == hist_len

    # physical erase: after vacuum/expiry, NO parquet under the lake
    # contains the erased book (the actual GDPR contract)
    lake.ingest_files([str(book_dir / "book_22.txt")], TS2)
    res3 = lake.erase_book(22, physical=True)
    assert res3["deleted_rows"] == 1 and res3["erased_files"] >= 1
    assert lake.list_books() == [11, 33]
    remaining = set()
    for p in _glob.glob(
        _os.path.join(lake.lake_root, "**", "*.parquet"), recursive=True
    ):
        if "_delta_log" in p:
            continue
        remaining |= {
            r.book_id
            for r in spark.read.parquet(p).select("book_id").collect()
        }
    assert 22 not in remaining
    assert {11, 33} <= remaining

    bad = LakeAdapter(
        spark, str(tmp_path / "plake_e"), backend="parquet"
    )
    with pytest.raises(NotImplementedError, match="table-format"):
        bad.erase_book(22)
    with pytest.raises(InvalidBookId):
        lake.erase_book("nope")
