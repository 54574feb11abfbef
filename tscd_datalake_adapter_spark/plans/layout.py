"""Physical-layout strategies for 100 TB joins (SURVEY.md scale notes):
bucketed co-located joins and skew salting.

These are the two levers when a fact-fact join's shuffle becomes the
bottleneck: pre-bucket both sides on the join key so the join needs **no
exchange at all**, or salt a skewed key so one hot value fans out across
tasks (complementing AQE's automatic skew splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int = 16
) -> None:
    """Persist a table bucketed (and sorted) by the join key. Two tables
    bucketed identically join with zero shuffle — Spark reads matching
    buckets pairwise. This is the lakehouse answer to repeated big joins on
    one key (e.g. lineitem ⋈ orders on orderkey, every day, at 100 TB).

    Idempotent against catalog/filesystem drift: with an in-memory catalog
    a previous process's managed-table DIRECTORY can outlive its catalog
    entry, and ``saveAsTable`` then fails with LOCATION_ALREADY_EXISTS —
    so the table is dropped first and, when the location can be derived
    unambiguously (unqualified name, current database ``default`` — the
    only case whose warehouse path is ``<warehouse>/<table>``), any
    orphaned directory is deleted too. For qualified names or non-default
    databases the cleanup is skipped rather than guessed: deleting a
    mis-derived path could destroy another table's data."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if "." not in table_name and spark.catalog.currentDatabase() == "default":
        wh = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table_name.lower()}")
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(p, True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: explode the (small-ish) right side into
    ``n_salts`` copies and spread the left side's hot keys across salted
    partitions. Use when one key holds a disproportionate share of rows and
    AQE's skew split isn't enough (e.g. the null-key or default-value hub).

    Cost model: right side is replicated ``n_salts``× — choose the smaller
    side as ``right``; the left side gains a uniform random salt, so the
    shuffle on (key, salt) has no hot partition."""
    left_s = left.withColumn("_salt", (F.monotonically_increasing_id() % n_salts))
    right_s = right.crossJoin(
        right.sparkSession.range(n_salts).select(F.col("id").alias("_salt"))
    )
    joined = left_s.join(right_s, [key, "_salt"], how)
    return joined.drop("_salt")


def zorder_value(col_a: str, col_b: str, bits: int = 4):
    """Z-order (Morton) index of two pre-bucketed non-negative int columns:
    interleave the low ``bits`` bits of each. Pure Spark SQL expression (one
    ``aggregate`` over a bit sequence — JVM-side, codegen'd, no UDF)."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> "
        f"acc + shiftleft(cast(shiftright({col_a}, i) & 1 as bigint), 2 * i)"
        f"    + shiftleft(cast(shiftright({col_b}, i) & 1 as bigint), 2 * i + 1))"
    )


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    path: str,
    n_files: int = 16,
    bits: int = 4,
) -> None:
    """Write ``df`` clustered on the Z-order curve of two columns, so BOTH
    columns get effective min/max file skipping — the multi-dimensional
    clustering a date/hour directory layout (reference
    ``S3DatalakeStorage.java:145-150``) cannot give.

    Each column is rank-bucketed to 2^bits via ``ntile`` (value-distribution
    invariant), the buckets are Morton-interleaved, and the data is
    range-partitioned + sorted on the curve index: points close in (a, b)
    land in the same files, so every file covers a small rectangle of the
    2-D space. A filter on EITHER column then prunes most files from their
    footer stats, where linear sorting only serves its leading column.
    Delta/Iceberg ``OPTIMIZE ZORDER BY`` is this exact construction.

    ``bits`` should give each file a handful of curve cells — finer curves
    (bits=16 → 4G cells) fragment the grid far below file granularity and
    WORSEN per-file min/max tightness. Measured here across SFs: bits=4
    (256 cells, ~16 files) skips 10-11/16 files on a 3% slice of either
    dimension where the linear layout skips 0; bits>=8 degrades to ~8.

    One caveat at 100 TB: the two ``ntile`` windows are global sorts of the
    key projection. Swap in approx-quantile bucket boundaries (computed on a
    sample, applied map-side) when the key columns themselves are too big to
    window-sort; the curve semantics are unchanged.
    """
    n = 1 << bits
    from pyspark.sql import Window

    # secondary key makes ntile deterministic under ties
    wa = Window.orderBy(col_a, col_b)
    wb = Window.orderBy(col_b, col_a)
    (
        df.withColumn("_ba", F.ntile(n).over(wa) - 1)
        .withColumn("_bb", F.ntile(n).over(wb) - 1)
        .withColumn("_z", zorder_value("_ba", "_bb", bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_ba", "_bb", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )
