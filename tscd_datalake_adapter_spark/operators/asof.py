"""As-of join — the time-series operator Spark SQL lacks natively
(SURVEY.md §4.2 custom-operator tier; driver north-star names it).

``asof_join(left, right, on, by)`` attaches to each left row the most recent
right row with ``right.ts <= left.ts`` within the same ``by`` key, with a
deterministic (ts, tiebreak-id) ordering.

Implementation is the union+window technique, not a range join: tag both
sides, sort within each ``by`` key by (ts, side, id), and carry the last seen
right row forward with ``last(..., ignorenulls)``. One shuffle on the key,
O(n log n) in the partition — no candidate-pair blow-up, which is what makes
it hold at 100 TB where an inequality join would quadratically explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    left_id: str,
    right_id: str,
    right_payload: tuple[str, ...] = (),
) -> DataFrame:
    """Generic as-of join. For each left row: the right row with the
    greatest ``(on, right_id)`` such that ``right.on <= left.on`` and keys
    match. Right-side columns come back prefixed ``asof_``."""
    lt = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"), F.col(left_id).alias("_lid"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in (right_id, *right_payload)],
    )
    rt = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.lit(None).cast(left.schema[left_id].dataType).alias("_lid"),
        *[F.col(c).alias(f"_r_{c}") for c in (right_id, *right_payload)],
    )
    unioned = lt.unionByName(rt)
    # Right rows sort before left rows at equal ts (side 0 < 1): <= semantics.
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col("_side"), F.col(f"_r_{right_id}"), F.col("_lid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        by,
        on,
        "_side",
        "_lid",
        *[
            F.last(
                F.when(F.col("_side") == 0, F.col(f"_r_{c}")), ignorenulls=True
            )
            .over(w)
            .alias(f"asof_{c}")
            for c in (right_id, *right_payload)
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        F.col(by),
        F.col(on),
        F.col("_lid").alias(left_id),
        *[F.col(f"asof_{c}") for c in (right_id, *right_payload)],
    )


@register(
    "asof_join_purchase_view",
    tags=("join", "streaming"),
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           v.event_id AS asof_view_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS seconds_since_view
    FROM events p
    LEFT JOIN LATERAL (
        SELECT event_id, ts FROM events v
        WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
        ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
    ) v ON TRUE
    WHERE p.event_type = 'purchase'
    ORDER BY p.user_id, purchase_id
    """,
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join on the events stream: each purchase matched to the user's
    most recent view at-or-before it (ties → max event_id). The oracle is a
    deterministic lateral top-1 subquery; the Spark side never materializes
    candidate pairs."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases,
        views,
        on="ts",
        by="user_id",
        left_id="event_id",
        right_id="event_id",
        right_payload=("view_ts",),
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("asof_event_id").alias("asof_view_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_view_ts"))
        .cast("long")
        .alias("seconds_since_view"),
    ).orderBy("user_id", "purchase_id")
