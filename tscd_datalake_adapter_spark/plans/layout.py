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
    ``aggregate`` over a bit sequence — JVM-side, codegen'd, no UDF).

    CAUTION when composing: this references each input ``bits`` times
    (once per loop iteration at runtime), and Catalyst's project
    collapsing INLINES upstream column expressions at every reference —
    feeding it columns that are themselves expensive expressions
    multiplies their per-row cost by ``bits`` (measured 4x on the r10
    sf10 decade). :func:`zorder_write` therefore uses the
    single-reference LUT form (:func:`_morton_lut_expr`) instead."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, i) -> "
        f"acc + shiftleft(cast(shiftright({col_a}, i) & 1 as bigint), 2 * i)"
        f"    + shiftleft(cast(shiftright({col_b}, i) & 1 as bigint), 2 * i + 1))"
    )


def _morton_lut_expr(col_a: str, col_b: str, bits: int):
    """Morton index via a 4^bits-entry literal lookup array — references
    each input exactly ONCE, so Catalyst's projection inlining cannot
    multiply the cost of expensive upstream bucket expressions. 4^4=256
    entries at the default bits=4; guarded to bits<=6 (4096)."""
    if bits > 6:
        raise ValueError("morton LUT supports bits <= 6; use zorder_value")
    n = 1 << bits

    def interleave(a: int, b: int) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    lut = [interleave(a, b) for a in range(n) for b in range(n)]
    arr = "array(" + ",".join(str(v) for v in lut) + ")"
    # element_at is 1-based
    return F.expr(f"element_at({arr}, {col_a} * {n} + {col_b} + 1)")


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

    Bucketing strategy (r10, after the sf10 stress decade measured the
    ntile-only form at exactly-linear-but-big): ADAPTIVE.

    - Small inputs (row count <= 4M) keep the original ``ntile``
      windows — exact equal-size rank buckets. Global window sorts,
      but of an input that comfortably fits one task; and exact buckets
      matter most exactly here, where heavy key TIES would collapse
      quantile buckets (tied rows all count the same cuts) and coarsen
      the curve grid.
    - Large NUMERIC inputs bucket through APPROX-QUANTILE boundaries —
      one ``approxQuantile`` sketch pass per column (2^bits-1 cut
      points, driver-sized) applied MAP-SIDE as a codegen'd aggregate
      over the cut array. NO global window sort of the data remains;
      the only full sort is the final ``repartitionByRange`` on the
      curve index, which the write needs anyway. Measured on the r10
      sf10 decade: the zorder demo query went 129.8s -> 14.4s.
    - Large NON-numeric key columns (strings/dates) keep the ntile
      window (approxQuantile is numeric-only) — acceptable because
      z-ordering is an offline layout op; cluster on a numeric
      surrogate if a string sort column outgrows a single task.

    COMPOSITION GOTCHA worth remembering: the Morton index must
    reference each bucket column exactly ONCE (``_morton_lut_expr``) —
    Catalyst's project collapsing inlines the bucket expression at
    every reference, so the loop form multiplied the per-row CASE
    cascade cost by ``bits`` (this, not the sorts, was most of the
    first quantile attempt's 41s at sf1).
    """
    (
        zorder_cluster(df, col_a, col_b, n_files=n_files, bits=bits)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_cluster(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 4,
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The clustering HALF of :func:`zorder_write` (r10 factor-out):
    returns ``df`` range-partitioned + sorted on the Morton curve of the
    two columns, helper columns dropped — one output file per partition
    when written. Reused by :func:`zorder_write` (plain parquet) and by
    ``delta_lite.optimize_zorder`` (atomic logged rewrite). Strategy and
    gotchas documented on :func:`zorder_write`.

    ``partition_cols`` (r11): z-order WITHIN hive partitions — the
    partition columns LEAD the range key, so every range slice holds one
    partition's contiguous z-span and a partitioned write keeps each
    file a small (a, b) rectangle inside its own directory. Still ONE
    distributed pass and one shuffle: the range partitioner allocates
    slices proportional to actual partition sizes (a per-partition loop
    would instead pay a full job per partition). ``n_files`` stays the
    TOTAL slice count across partitions. Bucket boundaries are computed
    globally — monotone binning keeps per-file min/max tight within any
    partition; only file-size balance would gain from per-partition
    quantiles, which the size-proportional range split already covers."""
    n = 1 << bits
    from pyspark.sql import types as T

    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    types = {f.name: f.dataType for f in df.schema.fields}
    # parquet count(*) is footer-metadata-scale, not a data read
    small = df.count() <= 4_000_000

    def bucket_col(col: str):
        if not small and isinstance(types[col], numeric):
            # 2^bits-1 interior quantile cuts; bucket = #cuts below the
            # value (monotone, so per-file min/max stay tight); error
            # << bucket width keeps buckets near-equal-sized
            cuts = df.stat.approxQuantile(
                col, [i / n for i in range(1, n)], 1.0 / (64 * n)
            )
            arr = "array(" + ",".join(repr(float(c)) for c in cuts) + ")"
            return F.expr(
                f"aggregate({arr}, 0, (acc, c) -> "
                f"acc + CASE WHEN {col} > c THEN 1 ELSE 0 END)"
            )
        from pyspark.sql import Window

        other = next(c for c in (col_a, col_b) if c != col)
        return F.ntile(n).over(Window.orderBy(col, other)) - 1

    range_key = [*partition_cols, "_z"]
    return (
        df.withColumn("_ba", bucket_col(col_a))
        .withColumn("_bb", bucket_col(col_b))
        # LUT form: _ba/_bb referenced once each, so project collapsing
        # can't multiply the bucket CASE-cascade cost (see zorder_value)
        .withColumn("_z", _morton_lut_expr("_ba", "_bb", bits))
        .repartitionByRange(n_files, *range_key)
        .sortWithinPartitions(*range_key)
        .drop("_ba", "_bb", "_z")
    )
