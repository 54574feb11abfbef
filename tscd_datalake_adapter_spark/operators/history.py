"""Event-history operators: SCD Type-2 dimension build and batch
sessionization (lakehouse change-tracking block; complements the streaming
session window in ``streaming/batch_twins.py`` and the MERGE upsert in
``lake/adapter.py``).

The reference keeps only latest-state rows (``S3DatalakeStorage.java:32-150``
overwrites by partition path); these operators add the standard history
shapes a warehouse derives FROM such a change stream. Every window here is
partitioned by the entity key, so state stays distributed at 100 TB — no
global windows (cf. ``plans.unpartitioned_windows_over_unaggregated_input``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "scd2_user_event_history",
    tags=("history",),
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, ts, event_id FROM events WHERE user_id < 50
    ),
    marked AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM e
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id FROM marked
        WHERE prev IS NULL OR prev != event_type
    ),
    hist AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts
        FROM changes
    )
    SELECT user_id, state,
           strftime(ts, '{_TS_FMT_DUCK}') AS valid_from,
           coalesce(strftime(next_ts, '{_TS_FMT_DUCK}'), '9999-12-31')
               AS valid_to,
           CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS BIGINT)
               AS is_current
    FROM hist ORDER BY user_id, valid_from
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build from a change stream: per user, collapse
    consecutive repeats of the tracked attribute (event_type), then stamp
    each surviving state with ``valid_from`` / ``valid_to`` (lead of the
    next change; open-ended rows marked current). This is the standard
    kimball-style history derivation a lakehouse runs over CDC feeds.

    Scale shape: two windows, BOTH partitioned by user_id — per-entity
    history never crosses partitions, so the operator scales with the
    number of users, not total events. Timestamps leave as formatted
    strings (determinism recipe)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    hist = changes.withColumn("next_ts", F.lead("ts").over(w))
    return hist.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", _TS_FMT_SPARK).alias("valid_from"),
        F.coalesce(
            F.date_format("next_ts", _TS_FMT_SPARK), F.lit("9999-12-31")
        ).alias("valid_to"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0).cast("long").alias(
            "is_current"
        ),
    ).orderBy("user_id", "valid_from")


@register(
    "sessionize_events_batch",
    tags=("history",),
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id FROM events WHERE user_id < 200
    ),
    g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM g
    ),
    sess AS (
        SELECT user_id, session_no,
               CAST(count(*) AS BIGINT) AS n_events,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        FROM s GROUP BY user_id, session_no
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(n_events) AS BIGINT) AS longest_session_events,
           CAST(sum(dur_us) AS BIGINT) AS total_active_us
    FROM sess GROUP BY user_id ORDER BY user_id
    """,
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-minute inactivity gap): mark
    session starts with a lag() comparison, number sessions with a running
    sum, aggregate per session then per user. The batch twin of the
    streaming ``session_window`` — same gap semantics, point-in-time over
    the full history.

    Scale shape: both windows partitioned by user_id (per-entity,
    distributed); the two aggregations shuffle on (user_id, session_no)
    and user_id — keys that partition evenly unless one user dominates the
    event stream. Durations are exact integer microseconds."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = e.select("user_id", "ts", "event_id").withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > 30 * 60 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    s = g.withColumn("session_no", F.sum("is_new").over(run))
    sess = s.groupBy("user_id", "session_no").agg(
        F.count("*").cast("long").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dur_us"
        ),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.max("n_events").cast("long").alias("longest_session_events"),
            F.sum("dur_us").cast("long").alias("total_active_us"),
        )
        .orderBy("user_id")
    )
