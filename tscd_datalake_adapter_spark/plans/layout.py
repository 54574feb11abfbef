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
    one key (e.g. lineitem ⋈ orders on orderkey, every day, at 100 TB)."""
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
