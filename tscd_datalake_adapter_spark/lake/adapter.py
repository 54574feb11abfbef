"""Lakehouse adapter — reference R1, R4, R5, R6, R7.

The reference stores each ingested book as two text objects under
``{prefix}datalake/{yyyyMMdd}/{HH}/{id}.{part}.txt`` (``S3DatalakeStorage
.java:145-150``) and answers ``exists``/``listBooks`` with O(total-objects)
paginated key scans (``S3DatalakeStorage.java:64-119``). Here the lake is a
Hive-partitioned parquet dataset:

    <root>/ingest_date=<yyyyMMdd>/ingest_hour=<HH>/part-*.parquet

with one row per book: ``(book_id, header, body, ingest_ts)``. Differences
from the reference, all deliberate (SURVEY.md §1.1):

- UTC partition values (the reference uses server-local wall clock,
  ``Main.java:105``).
- No accidental ``datalakedatalake/`` double prefix
  (``S3DatalakeStorage.java:146``).
- The header+body pair is committed atomically (one row, one committer
  transaction) — the reference's two sequential putObject calls can leave a
  body-only book visible (SURVEY.md §3.1 step 7).

Since round 9 the default backend is the ``sources.delta_lite``
transaction log (the open Delta protocol, implemented in-repo): every
write is a logged commit, reads replay the log (stray/half-written files
are invisible), ``read_as_of`` is log time travel, and MERGE can
physically drop fully-superseded partitions — the caveat the plain-parquet
layout carried since round 5. ``backend="parquet"`` keeps the original
log-free layout (same directory shape, max-``ingest_ts`` conventions) as
a fallback; both backends pass the same test suite except where physical
deletion semantics differ (documented per method).

Scale notes (100 TB): the write path appends and never lists the whole lake
(the delta commit lists only its own staged files); ``exists`` is a
filter+limit-1 whose predicate pushes into the parquet scan (min/max
row-group pruning + bloom filter on ``book_id``); ``list_books`` is the
scan→project→distinct→sort pipeline (reference R6) executed as a 2-phase
distributed hash aggregate with only the ``book_id`` column read. No
operator collects more than its result to the driver; the transaction log
itself is metadata-scale (bytes per file, bounded by checkpoints).
"""

from __future__ import annotations

import datetime as dt
import os
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tscd_datalake_adapter_spark.lake.gutenberg import gutenberg_url, split_book

BOOK_SCHEMA = T.StructType(
    [
        T.StructField("book_id", T.LongType(), False),
        T.StructField("header", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("ingest_ts", T.TimestampType(), False),
        T.StructField("ingest_date", T.StringType(), False),
        T.StructField("ingest_hour", T.StringType(), False),
    ]
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("book_id", T.LongType(), False),
        T.StructField("raw", T.StringType(), True),
    ]
)


class InvalidBookId(ValueError):
    """Reference error code ``invalid_book_id`` (``Main.java:147-160``)."""


class IngestFailed(RuntimeError):
    """Reference error code ``download_failed`` (``Main.java:100-103``)."""


def validate_book_id(book_id: object) -> int:
    """Positive-int validation, semantics of ``Main.java:147-160``."""
    try:
        v = int(str(book_id))
    except (TypeError, ValueError) as exc:
        raise InvalidBookId(f"book_id must be an integer: {book_id!r}") from exc
    if v <= 0:
        raise InvalidBookId(f"book_id must be > 0: {v}")
    return v


def naive_utc(ts: dt.datetime) -> dt.datetime:
    """Normalize to naive UTC — the lake's single timestamp convention.

    Partition values AND the stored ``ingest_ts`` both use this, so a
    tz-aware ingest timestamp and a tz-aware ``read_as_of`` cutoff land on
    the same clock; a naive input is taken as already-UTC."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return ts


def partition_values(ts: dt.datetime) -> tuple[str, str]:
    """(yyyyMMdd, HH) partition values (``S3DatalakeStorage.java:21-22``), UTC."""
    ts = naive_utc(ts)
    return ts.strftime("%Y%m%d"), ts.strftime("%H")


_BLOOM_OPTIONS = {
    "parquet.bloom.filter.enabled#book_id": "true",
    "parquet.bloom.filter.expected.ndv#book_id": "100000",
}

_PARTITION_COLS = ("ingest_date", "ingest_hour")

# iceberg backend (r10, verdict item 3): NATIVE temporal transforms on
# the single ingest_ts column — the spec's layout for a time-partitioned
# lake — instead of pre-derived string partition columns.
# ingest_date/ingest_hour remain ordinary DATA columns (the row contract
# is backend-agnostic); only the partition SPEC differs:
# day(ingest_ts), hour(ingest_ts), hive dirs
# ingest_ts_day=2026-08-13/ingest_ts_hour=2026-08-13-14/.
_ICEBERG_TRANSFORMS = ("day(ingest_ts)", "hour(ingest_ts)")

_EPOCH_DAY = dt.date(1970, 1, 1)


def _transform_ordinals(day: str, hour: str) -> tuple[int, int]:
    """(day-ordinal, hour-ordinal) ints for the lake's (yyyyMMdd, HH)
    partition strings — the iceberg spec's transformed partition
    values (days / hours since 1970-01-01 UTC)."""
    d = dt.datetime.strptime(day, "%Y%m%d").date()
    day_ord = (d - _EPOCH_DAY).days
    return day_ord, day_ord * 24 + int(hour)


def _iceberg_parts(parts: list[dict]) -> list[dict]:
    """Adapter-surface partition dicts (ingest_date/ingest_hour strings)
    → transformed spec-field dicts for iceberg replace_partitions."""
    out = []
    for p in parts:
        day_ord, hour_ord = _transform_ordinals(
            p["ingest_date"], p["ingest_hour"]
        )
        out.append(
            {"ingest_ts_day": day_ord, "ingest_ts_hour": hour_ord}
        )
    return out


def _ts_ms(ts: dt.datetime) -> int:
    return int(
        naive_utc(ts).replace(tzinfo=dt.timezone.utc).timestamp() * 1000
    )


class LakeAdapter:
    """Spark-backed book lake with the reference's operation surface.

    ``backend="delta"`` (default) runs every mutation through the
    ``sources.delta_lite`` transaction log; ``backend="iceberg"`` runs
    the same operations through the ``sources.iceberg_lite`` table
    format (snapshots + Avro manifests) — the whole reference surface is
    format-agnostic behind this class; ``backend="parquet"`` is the
    pre-round-9 log-free layout, kept as a fallback."""

    def __init__(
        self,
        spark: SparkSession,
        lake_root: str,
        backend: str = "delta",
        checkpoint_every: int = 32,
    ):
        if backend not in ("delta", "iceberg", "parquet"):
            raise ValueError(f"unsupported backend {backend!r}")
        self.spark = spark
        self.lake_root = lake_root
        self.backend = backend
        self.backend_label = f"spark-{backend}"
        # every single-book ingest is one log commit, so an ingest-heavy
        # lake would otherwise replay thousands of JSON files per read;
        # a classic checkpoint every N commits bounds replay to one
        # parquet footer + <N commits (log files are kept — time travel
        # is unaffected). 0 disables.
        self.checkpoint_every = checkpoint_every

    def _maybe_checkpoint(self, version: int) -> None:
        if (
            self.backend == "delta"
            and self.checkpoint_every
            and version > 0
            and version % self.checkpoint_every == 0
        ):
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                checkpoint_delta,
            )

            checkpoint_delta(self.lake_root)
        # iceberg needs no checkpoint: metadata.json is already a
        # compact snapshot; its growth axis (the snapshot list) is
        # trimmed by vacuum()/expire_snapshots, the format's maintenance.

    def _ingest_single_row_fast(
        self,
        bid: int,
        header: str | None,
        body: str | None,
        ts: dt.datetime,
        day: str,
        hour: str,
    ) -> None:
        """One-row ingest without a Spark job: pyarrow writes the parquet
        file (exact BOOK_SCHEMA arrow types, so reads are
        indistinguishable from Spark-written files) into its hive
        directory under a commit-uuid name, then the table format's
        metadata-only commit (``delta_lite.commit_files`` /
        ``iceberg_lite.commit_snapshot``) publishes it. Single-row files
        carry exact min=max footer stats, so ``exists`` row-group pruning
        works without the bloom filter the Spark write path adds."""
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = {
            "book_id": pa.array([bid], pa.int64()),
            "header": pa.array([header], pa.string()),
            "body": pa.array([body], pa.string()),
            "ingest_ts": pa.array([naive_utc(ts)], pa.timestamp("us")),
        }
        if self.backend == "delta":
            # identity partition columns live in the PATH, not the file
            data_root = self.lake_root
            seg = (f"ingest_date={day}", f"ingest_hour={hour}")
        else:
            # transform layout (r10): the path carries the DERIVED
            # day/hour spells; ingest_date/ingest_hour are ordinary data
            # columns and must be IN the file
            cols["ingest_date"] = pa.array([day], pa.string())
            cols["ingest_hour"] = pa.array([hour], pa.string())
            data_root = os.path.join(self.lake_root, "data")
            iso = f"{day[0:4]}-{day[4:6]}-{day[6:8]}"
            seg = (
                f"ingest_ts_day={iso}",
                f"ingest_ts_hour={iso}-{hour}",
            )
        table = pa.table(cols)
        part_dir = os.path.join(data_root, *seg)
        os.makedirs(part_dir, exist_ok=True)
        commit_uuid = _uuid.uuid4().hex
        name = f"part-00000-{commit_uuid}.parquet"
        tmp = os.path.join(part_dir, f"._{commit_uuid}.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(part_dir, name))
        rel = os.path.join(*seg, name)
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                commit_files,
            )

            version = commit_files(
                self.lake_root,
                [rel],
                BOOK_SCHEMA,
                mode="append",
                partition_by=_PARTITION_COLS,
                commit_timestamp_ms=_ts_ms(ts),
                operation="INGEST",
                _commit_uuid=commit_uuid,
            )
            self._maybe_checkpoint(version)
        else:
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                commit_snapshot,
            )

            commit_snapshot(
                self.lake_root,
                [rel],
                BOOK_SCHEMA,
                mode="append",
                partition_transforms=_ICEBERG_TRANSFORMS,
                commit_timestamp_ms=_ts_ms(ts),
                operation="INGEST",
                _commit_uuid=commit_uuid,
            )

    # -- format dispatch (delta / iceberg) ------------------------------------

    def _fmt_append(self, df: DataFrame, ts: dt.datetime) -> None:
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                write_delta,
            )

            version = write_delta(
                df,
                self.lake_root,
                mode="append",
                partition_by=_PARTITION_COLS,
                writer_options=_BLOOM_OPTIONS,
                commit_timestamp_ms=_ts_ms(ts),
                operation="INGEST",
            )
            self._maybe_checkpoint(version)
        else:
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                write_iceberg,
            )

            write_iceberg(
                df,
                self.lake_root,
                mode="append",
                partition_transforms=_ICEBERG_TRANSFORMS,
                writer_options=_BLOOM_OPTIONS,
                commit_timestamp_ms=_ts_ms(ts),
                operation="INGEST",
            )

    def _fmt_replace_partitions(
        self,
        df: DataFrame,
        parts: list[dict],
        ts_ms: int,
        operation: str,
        purge: bool,
    ) -> None:
        """One partition-scoped overwrite commit; with ``purge`` the
        files referenced only by pre-commit versions are physically
        deleted (delta: targeted purge of this commit's tombstones;
        iceberg: snapshot expiry to the new snapshot)."""
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                purge_removed,
                write_delta,
            )

            version = write_delta(
                df,
                self.lake_root,
                mode="overwrite",
                partition_by=_PARTITION_COLS,
                replace_partitions=parts,
                writer_options=_BLOOM_OPTIONS,
                commit_timestamp_ms=ts_ms,
                operation=operation,
            )
            if purge:
                purge_removed(self.lake_root, version)
            self._maybe_checkpoint(version)
        else:
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                expire_snapshots,
                write_iceberg,
            )

            write_iceberg(
                df,
                self.lake_root,
                mode="overwrite",
                partition_transforms=_ICEBERG_TRANSFORMS,
                replace_partitions=_iceberg_parts(parts),
                writer_options=_BLOOM_OPTIONS,
                commit_timestamp_ms=ts_ms,
                operation=operation,
            )
            if purge:
                expire_snapshots(self.lake_root, keep_last=1)

    def _maintenance_ts_ms(self) -> int:
        """Commit stamp for maintenance commits (compact/expire): the MAX
        caller timestamp already in the log — i.e. the newest ingest time
        — NOT the wall clock. Adapter ingests stamp commits with ingest
        time, and ``read_as_of`` travels on that timeline; a wall-clock
        maintenance stamp would leave a window (last-ingest-stamp, now)
        in which ``read_as_of`` resolves to a PRE-maintenance version
        whose files the purge just deleted (delta: scan crash; iceberg:
        trimmed snapshot-log → silently empty lake). Stamping maintenance
        at the newest ingest time makes every cutoff >= that time resolve
        to the surviving post-maintenance snapshot (timestamp travel is
        last-match on ties). Falls back to the wall clock on an empty
        log (no timeline to join)."""
        import time as _time

        stamps: list[int] = []
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                table_history,
            )

            stamps = [
                h["timestamp"]
                for h in table_history(self.lake_root)
                if h["timestamp"] is not None
            ]
        elif self.backend == "iceberg":
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                snapshots,
            )

            stamps = [s["timestamp_ms"] for s in snapshots(self.lake_root)]
        return max(stamps) if stamps else int(_time.time() * 1000)

    def _fmt_partition_tuples(self) -> set[tuple[str, str]]:
        """(ingest_date, ingest_hour) tuples with live files, from the
        format's metadata (no data read)."""
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                _replay,
            )

            state = _replay(self.lake_root, None)
            return {
                (
                    add["partitionValues"]["ingest_date"],
                    add["partitionValues"]["ingest_hour"],
                )
                for add in state["files"].values()
            }
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            _snapshot_by_id,
            _snapshot_files,
            load_metadata,
        )

        meta = load_metadata(self.lake_root)
        if meta["current-snapshot-id"] == -1:
            return set()
        snap = _snapshot_by_id(meta, meta["current-snapshot-id"])
        out = set()
        for f in _snapshot_files(meta, snap):
            # transformed ordinals back to the adapter's (yyyyMMdd, HH)
            day_ord = f["partition"]["ingest_ts_day"]
            hour_ord = f["partition"]["ingest_ts_hour"]
            d = _EPOCH_DAY + dt.timedelta(days=day_ord)
            out.add((d.strftime("%Y%m%d"), f"{hour_ord % 24:02d}"))
        return out

    # -- write path (R2 + R4) ------------------------------------------------

    def ingest_text(self, book_id: object, raw_text: str, ts: dt.datetime) -> dict:
        """Split one raw book and append it to the lake (reference R9 minus
        the HTTP fetch; fetch variants below).

        Raises :class:`InvalidBookId` / :class:`IngestFailed` with the
        reference's error taxonomy instead of swallowing to booleans
        (``IngestionService.java:74-76`` — an observed defect, not parity).
        """
        bid = validate_book_id(book_id)
        res = split_book(raw_text)
        if not res.ok:
            raise IngestFailed(f"gutenberg markers missing/mis-ordered for {bid}")
        day, hour = partition_values(ts)
        if self.backend != "parquet":
            # metadata-scale fast path: ONE row does not need a Spark
            # job — write the parquet file driver-side (pyarrow) into
            # its hive directory and commit it through the table format
            # (delta log commit / iceberg snapshot). At the reference's
            # one-request-per-book ingest rate this is the difference
            # between ~2.5 ms and a full cluster round-trip per
            # POST /ingest/{id}; bulk paths (ingest_raw_df) stay fully
            # distributed.
            self._ingest_single_row_fast(
                bid, res.header, res.body, ts, day, hour
            )
        else:
            row = [(bid, res.header, res.body, naive_utc(ts), day, hour)]
            df = self.spark.createDataFrame(row, BOOK_SCHEMA)
            self._write(df, ts)
        return {
            "book_id": bid,
            "status": "ingested",
            "path": self.relative_path_for(bid, ts),
            "date": day,
            "hour": hour,
            "backend": self.backend_label,
        }

    def ingest_raw_df(self, raw_df: DataFrame, ts: dt.datetime) -> int:
        """Distributed bulk ingest: split many raw books on executors.

        ``raw_df`` has schema ``(book_id long, raw string)``. The marker split
        runs as an Arrow-batched ``mapInPandas`` over the exact same pure
        function as the single-book path, so semantics cannot drift. Books
        that fail to parse are dropped (counted in the return value), matching
        the reference's fail-to-false behavior per book.

        This is the 100 TB path: fetch/stage elsewhere, split+write here with
        no driver materialization.
        """
        day, hour = partition_values(ts)
        ts_naive = naive_utc(ts)

        def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {
                    "book_id": [],
                    "header": [],
                    "body": [],
                    "ingest_ts": [],
                    "ingest_date": [],
                    "ingest_hour": [],
                }
                for bid, raw in zip(pdf["book_id"], pdf["raw"]):
                    res = split_book(raw if raw is not None else "")
                    if not res.ok:
                        continue
                    out["book_id"].append(bid)
                    out["header"].append(res.header)
                    out["body"].append(res.body)
                    out["ingest_ts"].append(ts_naive)
                    out["ingest_date"].append(day)
                    out["ingest_hour"].append(hour)
                pdf_out = pd.DataFrame(out)
                # Pin dtypes so empty batches don't infer float64 (Arrow
                # cannot cast that to timestamp/string).
                pdf_out = pdf_out.astype(
                    {"book_id": "int64", "ingest_ts": "datetime64[us]"}
                )
                yield pdf_out

        # Both counts ride the write job itself via observed metrics — one
        # row count above the split, one below. A single pass over the data
        # (no re-scan of raw_df, no re-read of the target partition), and
        # correct under concurrent ingests into the same partition because
        # nothing is derived from shared lake state.
        from pyspark.sql import Observation

        obs_in = Observation("ingest_raw_in")
        obs_out = Observation("ingest_raw_out")
        raw_counted = raw_df.observe(obs_in, F.count(F.lit(1)).alias("n"))
        split_df = raw_counted.mapInPandas(_split, schema=BOOK_SCHEMA).observe(
            obs_out, F.count(F.lit(1)).alias("n")
        )
        self._write(split_df, ts)
        before = obs_in.get["n"]
        written = obs_out.get["n"]
        return before - min(before, written)

    def ingest_text_dir(self, path_glob: str, ts: dt.datetime) -> int:
        """Distributed whole-file ingest (reference R1's test mode,
        SURVEY.md §2.1: 'read local fixture files via spark.read.text(...,
        wholetext=True)'): each ``book_<id>.txt`` becomes one row, ids parsed
        from file names executor-side, then the bulk split/write path runs.
        Returns the number of files that failed to parse."""
        # NB: wholetext must be the .text() kwarg — .option("wholetext") is
        # silently ignored by the text source.
        raw = (
            self.spark.read.text(path_glob, wholetext=True)
            .select(
                F.regexp_extract(
                    F.input_file_name(), r"book_(\d+)\.txt", 1
                )
                .cast("long")
                .alias("book_id"),
                F.col("value").alias("raw"),
            )
            .where(F.col("book_id").isNotNull() & (F.col("book_id") > 0))
        )
        return self.ingest_raw_df(raw, ts)

    def fetch_urls_distributed(
        self, urls_df: DataFrame, timeout: float = 30.0
    ) -> DataFrame:
        """Executor-parallel fetch (reference R1's scale form, SURVEY.md §2.2:
        'udf/mapInPandas doing urllib calls inside executors for parallel
        fetch at scale' — ``IngestionService.java:26-30,43-52`` does one
        driver-side GET per book; at 100 TB the fetch itself must fan out).

        ``urls_df`` has schema ``(book_id long, url string)``. Each Arrow
        batch is fetched inside the Python worker with urllib (the
        reference's 30s read timeout), so fetch parallelism equals task
        parallelism and raw payloads are born distributed — never collected
        to the driver. Returns ``(book_id, raw, error)`` with exactly one of
        raw/error null per row: failures are data, not exceptions, matching
        the reference's per-book fail-soft behavior.

        Tests drive this offline via ``file://`` URLs (urllib handles the
        scheme identically); production uses :func:`gutenberg_url`.
        """
        out_schema = T.StructType(
            [
                T.StructField("book_id", T.LongType(), False),
                T.StructField("raw", T.StringType(), True),
                T.StructField("error", T.StringType(), True),
            ]
        )

        def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import http.client
            import urllib.request

            for pdf in batches:
                ids, raws, errs = [], [], []
                for bid, url in zip(pdf["book_id"], pdf["url"]):
                    ids.append(int(bid))
                    try:
                        req = urllib.request.Request(
                            str(url), headers={"User-Agent": "TAHS-Ingestion/1.0"}
                        )
                        with urllib.request.urlopen(req, timeout=timeout) as resp:
                            status = getattr(resp, "status", 200)
                            if status and status != 200:
                                raise OSError(f"HTTP {status}")
                            raws.append(resp.read().decode("utf-8"))
                            errs.append(None)
                    # HTTPException covers mid-body failures (IncompleteRead,
                    # BadStatusLine) that are not OSErrors — a flaky origin
                    # must yield an error ROW, never a task failure.
                    except (
                        OSError,
                        ValueError,
                        UnicodeDecodeError,
                        http.client.HTTPException,
                    ) as exc:
                        raws.append(None)
                        errs.append(f"fetch failed: {exc!r}")
                yield pd.DataFrame(
                    {"book_id": pd.array(ids, dtype="int64"), "raw": raws, "error": errs}
                )

        return urls_df.mapInPandas(_fetch, schema=out_schema)

    def ingest_urls(
        self, urls_df: DataFrame, ts: dt.datetime, timeout: float = 30.0
    ) -> dict:
        """Fully-distributed R1 pipeline: fetch → split → stage → lake write,
        all executor-side (fetch via :meth:`fetch_urls_distributed`, split+
        write via :meth:`ingest_raw_df`). Returns per-stage failure counts.
        The fetched frame is cached for the duration: it feeds both the
        failure count and the write, and re-fetching on recompute would be
        both slow and non-idempotent against a live origin."""
        fetched = self.fetch_urls_distributed(urls_df, timeout=timeout).cache()
        try:
            n_fetch_failed = fetched.where(F.col("error").isNotNull()).count()
            ok = fetched.where(F.col("error").isNull()).select("book_id", "raw")
            n_split_failed = self.ingest_raw_df(ok, ts)
        finally:
            fetched.unpersist()
        return {
            "fetch_failed": n_fetch_failed,
            "split_failed": n_split_failed,
            "backend": self.backend_label,
        }

    def fetch_and_ingest(self, book_id: object, ts: dt.datetime | None = None) -> dict:
        """Driver-side fetch (reference R1: GET gutenberg.org, 10s/30s
        timeouts) then :meth:`ingest_text`. Network-dependent; tests use
        :meth:`ingest_text` on local fixture texts instead (SURVEY.md §7
        non-goals)."""
        import urllib.request

        bid = validate_book_id(book_id)
        req = urllib.request.Request(
            gutenberg_url(bid), headers={"User-Agent": "TAHS-Ingestion/1.0"}
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                if resp.status != 200:
                    raise IngestFailed(f"HTTP {resp.status} for {bid}")
                raw = resp.read().decode("utf-8")
        except OSError as exc:
            raise IngestFailed(f"fetch failed for {bid}: {exc}") from exc
        return self.ingest_text(bid, raw, ts or dt.datetime.now(dt.timezone.utc))

    def _write(self, df: DataFrame, ts: dt.datetime) -> None:
        """Append with a parquet bloom filter on ``book_id``: min/max
        row-group stats can't prune point lookups when ids are scattered
        across the insert order (every row group spans most of the id
        domain), but a bloom filter answers "id definitely absent" per row
        group regardless of layout — at 100 TB, :meth:`exists` then touches
        footer bytes instead of data pages for the no-hit case (the
        reference instead paid a full O(objects) key scan,
        ``S3DatalakeStorage.java:64-86``).

        On the delta backend the append is a logged commit whose caller
        timestamp is the INGEST time — the stamp :meth:`read_as_of`
        resolves versions against."""
        if self.backend != "parquet":
            self._fmt_append(df, ts)
            return
        writer = df.write.mode("append")
        for k, v in _BLOOM_OPTIONS.items():
            writer = writer.option(k, v)
        writer.partitionBy(*_PARTITION_COLS).parquet(self.lake_root)

    # -- read path (R5 + R6 + R7) --------------------------------------------

    def read(self) -> DataFrame:
        """The whole lake as a DataFrame (partition columns read as
        strings). Delta backend: log replay — only COMMITTED files are
        visible (a crashed writer's stray parquet cannot surface); an
        uncreated lake reads as the empty book table."""
        if self.backend != "parquet":
            if self._empty():
                return self.spark.createDataFrame([], BOOK_SCHEMA)
            if self.backend == "delta":
                from tscd_datalake_adapter_spark.sources.delta_lite import (
                    read_delta,
                )

                return read_delta(self.spark, self.lake_root)
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                read_iceberg,
            )

            return read_iceberg(self.spark, self.lake_root)
        return (
            self.spark.read.option("basePath", self.lake_root)
            .schema(BOOK_SCHEMA)
            .parquet(self.lake_root)
        )

    @staticmethod
    def _newest_version_per_book(df: DataFrame) -> DataFrame:
        """One row per ``book_id`` — newest by ``ingest_ts`` (ties broken by
        partition values, newest first). The single version-resolution rule
        shared by :meth:`read_latest` and :meth:`read_as_of`; one window
        shuffle keyed on ``book_id``."""
        from pyspark.sql import Window

        w = Window.partitionBy("book_id").orderBy(
            F.col("ingest_ts").desc(),
            F.col("ingest_date").desc(),
            F.col("ingest_hour").desc(),
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def read_latest(self) -> DataFrame:
        """The newest-version-per-book view. Plain APPENDS of the same id
        legitimately coexist as multiple versions on BOTH backends (the
        reference's duplicate-ingest behavior), so content queries that
        want one row per book read this. On the delta backend MERGE
        removes superseded rows transactionally, so only append-created
        duplicates remain; on the parquet fallback a crashed merge can
        additionally leave superseded rows, which this view also resolves.
        At 100 TB this is one window shuffle keyed on ``book_id``."""
        return self._newest_version_per_book(self.read())

    def read_as_of(self, ts: dt.datetime) -> DataFrame:
        """Time-travel read: the lake as it stood at ``ts`` — for each book,
        the newest version with ``ingest_ts <= ts``; books first ingested
        after ``ts`` are absent.

        Delta backend: resolved through the TRANSACTION LOG (r8 verdict
        item 1) — the snapshot version is the latest commit whose caller
        timestamp (the ingest time every adapter write stamps into its
        commit) is <= the cutoff, so commits after the cutoff contribute
        NO FILES to the scan at all; the ``ingest_ts`` cutoff filter and
        the newest-version window then resolve rows within the snapshot
        (exact under backdated out-of-order ingests too, where version
        resolution alone would over-include the backdated commit's
        prefix). Parquet backend: the pre-round-9 convention — partition
        filter prunes the scan, same filter+window on top."""
        ts = naive_utc(ts)
        day, _ = partition_values(ts)
        if self.backend != "parquet":
            if self._empty():
                return self.spark.createDataFrame([], BOOK_SCHEMA)
            if self.backend == "delta":
                from tscd_datalake_adapter_spark.sources.delta_lite import (
                    read_delta,
                    version_as_of,
                )

                v = version_as_of(
                    self.lake_root, _ts_ms(ts), field="timestamp"
                )
                if v is None:
                    return self.spark.createDataFrame([], BOOK_SCHEMA)
                snapshot = read_delta(
                    self.spark, self.lake_root, version=v
                )
            else:
                from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                    read_iceberg,
                )

                try:
                    snapshot = read_iceberg(
                        self.spark,
                        self.lake_root,
                        as_of_timestamp_ms=_ts_ms(ts),
                    )
                except ValueError:  # cutoff predates the first commit
                    return self.spark.createDataFrame([], BOOK_SCHEMA)
            return self._newest_version_per_book(
                snapshot.where(F.col("ingest_ts") <= F.lit(ts))
            )
        return self._newest_version_per_book(
            self.read()
            # partition-level prune first (scan-time), exact cutoff second
            .where(F.col("ingest_date") <= F.lit(day))
            .where(F.col("ingest_ts") <= F.lit(ts))
        )

    def _empty(self) -> bool:
        if self.backend == "delta":
            return not os.path.isdir(
                os.path.join(self.lake_root, "_delta_log")
            )
        if self.backend == "iceberg":
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                _current_version,
            )

            return _current_version(self.lake_root) is None
        return not os.path.isdir(self.lake_root)

    def exists(self, book_id: object) -> bool:
        """Reference R5 (``S3DatalakeStorage.java:64-86``) done right: the
        reference pays an O(total objects) sequential key scan; here the
        ``book_id = ?`` predicate pushes into the parquet scan (row-group
        min/max pruning) and ``LIMIT 1`` short-circuits."""
        bid = validate_book_id(book_id)
        if self._empty():
            return False
        return (
            self.read().where(F.col("book_id") == bid).limit(1).count() > 0
        )

    def list_books(self) -> list[int]:
        """Reference R6 (``S3DatalakeStorage.java:89-119``): scan → project →
        distinct → ascending sort, as a 2-phase distributed aggregate that
        reads only the ``book_id`` column."""
        if self._empty():
            return []
        rows = (
            self.read()
            .select("book_id")
            .distinct()
            .orderBy("book_id")
            .collect()
        )
        return [r.book_id for r in rows]

    def relative_path_for(self, book_id: object, ts: dt.datetime) -> str:
        """Reference R7 (``S3DatalakeStorage.java:121-124,142-150``):
        ``datalake/{yyyyMMdd}/{HH}/{id}`` — response-display only (the
        reference's version matches no stored key either; SURVEY.md §1.1)."""
        bid = validate_book_id(book_id)
        day, hour = partition_values(ts)
        return f"datalake/{day}/{hour}/{bid}"

    # -- upsert (MERGE) ------------------------------------------------------

    def merge_books(
        self, updates: DataFrame, ts: dt.datetime, purge: bool = True
    ) -> None:
        """MERGE/upsert on the lake: every existing row of an updated
        ``book_id`` is removed and replaced by the new version in the ``ts``
        partition (delete-and-insert, the Delta MERGE semantic).

        ``updates`` has schema ``(book_id long, header string, body string)``.
        Fully declarative — no driver-side id collection: affected partitions
        are discovered by join; untouched partitions are never read or
        written.

        Delta backend (default since r9): ONE partition-scoped overwrite
        commit (``replace_partitions`` — the connector's replaceWhere):
        the affected partitions' files are tombstoned, the merged rows'
        files added, atomically; a partition whose every row is updated
        away simply gets no new files and is thereby DROPPED — the exact
        semantics the plain-parquet layout could only approximate with a
        post-write directory delete (the r5–r8 documented caveat, now
        closed). ``purge=True`` physically unlinks the tombstoned files
        right after the commit (the targeted vacuum); pass ``purge=False``
        to retain them for time travel to pre-merge versions.

        Parquet backend: the pre-round-9 dynamic-partition-overwrite +
        observed-survivor-set directory delete (kept verbatim as the
        fallback; its crash window degrades to superseded rows that
        :meth:`read_latest` still resolves correctly).
        """
        day, hour = partition_values(ts)
        ts_naive = naive_utc(ts)
        lake = self.read()
        ids = updates.select("book_id").distinct()
        affected = (
            lake.join(F.broadcast(ids), "book_id")
            .select("ingest_date", "ingest_hour")
            .distinct()
        )
        # the affected-partition list is metadata-scale (bounded by the
        # lake's partition count, never by row count) — collect it once and
        # feed the literal back so the rewrite job doesn't re-derive it
        part_rows = {
            (r["ingest_date"], r["ingest_hour"]) for r in affected.collect()
        }
        part_rows.add((day, hour))
        # r12 (guide §6): the affected-partition restriction is a LITERAL
        # disjunction of (date, hour) conjuncts, not a broadcast join —
        # literals PUSH DOWN into the scan (hive partition pruning), so
        # the rewrite job physically reads only the affected partitions
        # (the docstring's "untouched partitions are never read" promise,
        # which the old join form only delivered post-scan), and the
        # per-commit broadcast-build job for the 2-column partition list
        # is gone. The predicate's size is metadata-scale (bounded by the
        # lake's affected-partition count, same bound as the collect
        # above).
        part_pred = F.lit(False)
        for pd_, ph_ in sorted(part_rows):
            part_pred = part_pred | (
                (F.col("ingest_date") == pd_) & (F.col("ingest_hour") == ph_)
            )
        keep = lake.where(part_pred).join(
            F.broadcast(ids), "book_id", "left_anti"
        )
        new_rows = updates.select(
            "book_id",
            "header",
            "body",
            F.lit(ts_naive).cast("timestamp").alias("ingest_ts"),
            F.lit(day).alias("ingest_date"),
            F.lit(hour).alias("ingest_hour"),
        )
        cols = [f.name for f in BOOK_SCHEMA.fields]
        out = keep.select(*cols).unionByName(new_rows.select(*cols))

        if self.backend != "parquet":
            self._fmt_replace_partitions(
                out,
                [
                    {"ingest_date": d, "ingest_hour": h}
                    for d, h in sorted(part_rows)
                ],
                _ts_ms(ts),
                "MERGE",
                purge,
            )
            return

        from pyspark.sql import Observation

        obs = Observation("merge_surviving_parts")
        observed = out.observe(
            obs,
            F.collect_set(
                F.struct("ingest_date", "ingest_hour")
            ).alias("parts"),
        )
        prev = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                observed.write.mode("overwrite")
                .partitionBy("ingest_date", "ingest_hour")
                .parquet(self.lake_root)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        survivors = {
            (p["ingest_date"], p["ingest_hour"]) for p in obs.get["parts"]
        }
        for pd, ph in sorted(part_rows - survivors):
            self._drop_partition_dir(pd, ph)

    def _drop_partition_dir(self, ingest_date: str, ingest_hour: str) -> None:
        """Partition-level physical delete (``expire``'s primitive, one
        partition): remove ``ingest_date=D/ingest_hour=H`` and, if that
        leaves the day directory empty, the day directory too."""
        import shutil

        day_dir = os.path.join(self.lake_root, f"ingest_date={ingest_date}")
        hour_dir = os.path.join(day_dir, f"ingest_hour={ingest_hour}")
        if os.path.isdir(hour_dir):
            shutil.rmtree(hour_dir)
        if os.path.isdir(day_dir) and not os.listdir(day_dir):
            os.rmdir(day_dir)

    # -- maintenance ---------------------------------------------------------

    def compact(self, ingest_date: str, ingest_hour: str, target_files: int = 1) -> int:
        """Small-file compaction for one partition (the lake-maintenance op
        every append-only ingest lake needs at scale: each single-book ingest
        commits its own file; queries want few large files).

        Rewrites the partition into ``target_files`` files via dynamic
        partition overwrite — other partitions are untouched, and the swap is
        committer-atomic. Returns the row count of the compacted partition,
        observed DURING the rewrite (Observation API, the same one-pass
        pattern as ``ingest_raw_df``) — one read of the partition, not a
        separate ``count()`` pass, and no race window between counting and
        rewriting under concurrent ingests. An empty/missing partition
        yields an empty write, which dynamic overwrite treats as a no-op
        (no partitions in the data → nothing replaced).
        """
        from pyspark.sql import Observation

        obs = Observation("compact_rows")
        part_df = (
            self.read()
            .where(F.col("ingest_date") == ingest_date)
            .where(F.col("ingest_hour") == ingest_hour)
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        if self.backend != "parquet":
            # OPTIMIZE as a replace-partition commit: old files replaced
            # + purged, the coalesced file added, atomically. An absent
            # partition (no live files) is a no-op WITHOUT a commit.
            if self._empty():
                return 0
            if (
                ingest_date,
                ingest_hour,
            ) not in self._fmt_partition_tuples():
                return 0
            self._fmt_replace_partitions(
                part_df.coalesce(target_files),
                [
                    {
                        "ingest_date": ingest_date,
                        "ingest_hour": ingest_hour,
                    }
                ],
                # stamped at the newest ingest time, not the wall clock
                # (ADVICE r9): see _maintenance_ts_ms
                self._maintenance_ts_ms(),
                "OPTIMIZE",
                purge=True,
            )
            return int(obs.get["n"])
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                part_df.coalesce(target_files)
                .write.mode("overwrite")
                .partitionBy("ingest_date", "ingest_hour")
                .parquet(self.lake_root)
            )
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return int(obs.get["n"])

    def expire(self, before_date: str) -> int:
        """Retention: drop whole partitions with ``ingest_date`` strictly
        before ``before_date`` (``yyyyMMdd``). Returns the number of DAY
        partitions removed.

        Delta backend: one remove-only commit (an empty write replacing
        exactly the expired partitions) followed by a physical purge —
        readers of the latest version never see a partial delete. Parquet
        backend: direct partition-directory deletes (the only safe
        physical delete on a log-free lake)."""
        import shutil

        if self._empty():
            return 0
        if self.backend != "parquet":
            expired = {
                (d, h)
                for d, h in self._fmt_partition_tuples()
                if d < before_date
            }
            if not expired:
                return 0
            self._fmt_replace_partitions(
                self.spark.createDataFrame([], BOOK_SCHEMA),
                [
                    {"ingest_date": d, "ingest_hour": h}
                    for d, h in sorted(expired)
                ],
                # stamped at the newest ingest time, not the wall clock
                # (ADVICE r9): see _maintenance_ts_ms
                self._maintenance_ts_ms(),
                "EXPIRE",
                purge=True,
            )
            return len({d for d, _ in expired})
        removed = 0
        for entry in sorted(os.listdir(self.lake_root)):
            if not entry.startswith("ingest_date="):
                continue
            if entry.split("=", 1)[1] < before_date:
                shutil.rmtree(os.path.join(self.lake_root, entry))
                removed += 1
        return removed

    def log_position(self) -> int | None:
        """Opaque resume cursor for :meth:`books_ingested_since` — the
        newest commit the log currently holds (delta: latest version;
        iceberg: current snapshot id). None on an empty lake (= "from
        the beginning")."""
        if self.backend == "parquet":
            raise NotImplementedError(
                "log_position() requires a table-format backend"
            )
        if self._empty():
            return None
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                _existing_versions,
                _last_checkpoint_version,
            )

            vs = _existing_versions(self.lake_root)
            cp = _last_checkpoint_version(self.lake_root)
            return max(vs[-1] if vs else -1, cp if cp is not None else -1)
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            load_metadata,
        )

        sid = load_metadata(self.lake_root)["current-snapshot-id"]
        return None if sid == -1 else sid

    def books_ingested_since(self, position: int | None) -> DataFrame:
        """Change-feed poll over the reference surface: the book rows
        appended by INGEST commits AFTER ``position`` (a prior
        :meth:`log_position`; None = everything) — the consumer pattern
        the reference's one-book-per-request ingestion naturally feeds
        ("give me the books that arrived since my last poll"), at the
        cost of the increment, never a rescan. Maintenance commits
        (MERGE/OPTIMIZE/EXPIRE) rewrite surviving rows; they are NOT new
        books and are skipped by the operation filter. Uniform
        BOOK_SCHEMA columns across backends."""
        if self.backend == "parquet":
            raise NotImplementedError(
                "books_ingested_since() requires a table-format backend "
                "(the parquet layout has no commit log to resume from)"
            )
        cols = [f.name for f in BOOK_SCHEMA.fields]
        if self._empty():
            return self.spark.createDataFrame([], BOOK_SCHEMA)
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                read_delta_changes,
            )

            start = 0 if position is None else int(position) + 1
            if start > self.log_position():
                return self.spark.createDataFrame([], BOOK_SCHEMA)
            return read_delta_changes(
                self.spark,
                self.lake_root,
                start,
                operations=("INGEST",),
            ).select(*cols)
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            read_iceberg_incremental,
        )

        return read_iceberg_incremental(
            self.spark,
            self.lake_root,
            position,
            operations=("INGEST",),
            skip_non_append=True,
        ).select(*cols)

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY of the lake's transaction log (delta backend
        only): one record per commit with operation and counts."""
        if self.backend == "parquet":
            raise NotImplementedError(
                "history() requires a table-format backend (the parquet "
                "layout has no transaction log)"
            )
        if self._empty():
            return []
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                table_history,
            )

            return table_history(self.lake_root)
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            snapshots,
        )

        return snapshots(self.lake_root)

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Physically delete data files referenced only by versions older
        than the newest ``retain_versions`` (delta backend only) — the
        retention cleanup that pairs with log time travel."""
        if self.backend == "parquet":
            raise NotImplementedError(
                "vacuum() requires a table-format backend; the parquet "
                "layout deletes partition directories directly (expire)"
            )
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                vacuum_delta,
            )

            return vacuum_delta(
                self.lake_root, retain_versions=retain_versions
            )
        from tscd_datalake_adapter_spark.sources.iceberg_lite import (
            expire_snapshots,
        )

        return expire_snapshots(self.lake_root, keep_last=retain_versions)

    def erase_book(self, book_id: object, physical: bool = False) -> dict:
        """Row-level GDPR-style erasure: delete EVERY row of ``book_id``
        from the lake, on both table-format backends, as one commit
        (r11; delta via :func:`delta_lite.delete_delta`, iceberg via
        :func:`iceberg_lite.delete_iceberg` — both bounds-pruned
        copy-on-write, so only files whose book_id range covers the
        target are rewritten; single-book ingest files carry exact
        min==max stats, making this a one-file rewrite in the common
        layout).

        The delete alone keeps pre-delete versions readable (time
        travel); ``physical=True`` additionally runs the retention
        cleanup (:meth:`vacuum` with ``retain_versions=1``) so the
        erased bytes are physically unlinked — the actual GDPR contract.

        Returns ``{"book_id", "deleted_rows", "rewritten_files",
        "erased_files", "backend"}``."""
        bid = validate_book_id(book_id)
        if self.backend == "parquet":
            raise NotImplementedError(
                "erase_book() requires a table-format backend; the "
                "parquet layout can only drop whole partition "
                "directories (expire)"
            )
        if self.backend == "delta":
            from tscd_datalake_adapter_spark.sources.delta_lite import (
                delete_delta,
            )

            res = delete_delta(
                self.spark, self.lake_root, f"book_id = {bid}"
            )
        else:
            from tscd_datalake_adapter_spark.sources.iceberg_lite import (
                delete_iceberg,
            )

            res = delete_iceberg(
                self.spark, self.lake_root, f"book_id = {bid}"
            )
        erased: list[str] = []
        if physical and res["deleted_rows"]:
            erased = self.vacuum(retain_versions=1)
        return {
            "book_id": bid,
            "deleted_rows": res["deleted_rows"],
            "rewritten_files": res["rewritten_files"],
            "erased_files": len(erased),
            "backend": self.backend_label,
        }

    # -- convenience for tests ----------------------------------------------

    def ingest_files(self, paths: Iterable[str], ts: dt.datetime) -> list[dict]:
        """Ingest local ``book_<id>.txt`` fixture files (FIXTURES.md §F2)."""
        out = []
        for p in paths:
            name = os.path.basename(p)
            bid = int(name.replace("book_", "").replace(".txt", ""))
            with open(p, encoding="utf-8") as fh:
                out.append(self.ingest_text(bid, fh.read(), ts))
        return out
