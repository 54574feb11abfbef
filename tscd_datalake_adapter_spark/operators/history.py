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


@register(
    "retention_cohorts",
    tags=("history",),
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CAST(strftime(date_trunc('week', ts), '%Y-%m-%d')
                   AS VARCHAR)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id,
               CAST(strftime(date_trunc('week', ts), '%Y-%m-%d') AS VARCHAR)
                   AS active_week
        FROM events
    )
    SELECT f.cohort_week, a.active_week,
           CAST(count(*) AS BIGINT) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted in
    every week they were active — the standard growth-analytics triangle.

    Scale shape: one groupBy(user_id) min-aggregate for cohorts, one
    distinct over (user, week) — both shuffle on user_id and partial-
    aggregate map-side; the final matrix is |weeks|² cells regardless of
    event volume. Weeks leave as formatted date strings (Spark and DuckDB
    both truncate to Monday)."""
    e = load_table(spark, sf_dir, "events")
    week = F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
    firsts = e.select("user_id", week.alias("w")).groupBy("user_id").agg(
        F.min("w").alias("cohort_week")
    )
    activity = e.select("user_id", week.alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_week", "active_week")
    )


@register(
    "last_touch_attribution",
    tags=("history",),
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
        FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, event_id AS view_id, ts AS v_ts
        FROM events WHERE event_type = 'view'
    ),
    latest AS (
        SELECT p.user_id, p.purchase_id, p.value,
               max(epoch_us(v.v_ts)) AS mt
        FROM purchases p JOIN views v
          ON p.user_id = v.user_id
         AND v.v_ts <= p.p_ts
         AND v.v_ts >= p.p_ts - INTERVAL 7 DAY
        GROUP BY p.user_id, p.purchase_id, p.value
    ),
    touched AS (
        SELECT l.user_id, l.purchase_id, l.value,
               max(v.view_id) AS attributed_view
        FROM latest l JOIN views v
          ON v.user_id = l.user_id AND epoch_us(v.v_ts) = l.mt
        GROUP BY l.user_id, l.purchase_id, l.value
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_attributed,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents,
           CAST(max(attributed_view) AS BIGINT) AS max_view_id
    FROM touched GROUP BY user_id ORDER BY user_id
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest view by the
    same user within a 7-day lookback — the marketing-analytics sibling of
    the as-of join, here as a bounded range join + ``max_by`` argmax (no
    window over the joined stream, no pair blow-up beyond the lookback).

    Scale shape: the join shuffles on user_id; the 7-day bound keeps
    per-user pair counts proportional to activity density, and the argmax
    folds map-side. Money leaves as exact integer cents."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    # Two-step portable argmax (DuckDB 1.0's max_by cannot take a tuple
    # sort key): latest view timestamp per purchase, then the max view_id
    # at that timestamp — deterministic under ts ties on both engines.
    latest = (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (
                F.unix_micros("v_ts")
                >= F.unix_micros("p_ts") - 7 * 24 * 3600 * 1_000_000
            ),
        )
        .groupBy("user_id", "purchase_id", "value")
        .agg(F.max(F.unix_micros("v_ts")).alias("mt"))
    )
    touched = (
        latest.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.unix_micros("v_ts") == F.col("mt")),
        )
        .groupBy("user_id", "purchase_id", "value")
        .agg(F.max("view_id").alias("attributed_view"))
    )
    return (
        touched.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_attributed"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("value_cents"),
            F.max("attributed_view").cast("long").alias("max_view_id"),
        )
        .orderBy("user_id")
    )
