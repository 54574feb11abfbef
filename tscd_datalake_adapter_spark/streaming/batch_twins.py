"""Streaming operators in batch-twin form (SURVEY.md §2.2 streaming block).

DuckDB cannot run a stream, so every streaming operator has a batch query
with identical semantics that the oracle checks; :mod:`jobs` then runs the
same logic live over ``readStream`` (availableNow trigger) and tests assert
the live result equals the batch twin.

Window-bucket equivalences used in the oracles:
- tumbling 10m: start = floor(epoch/600)·600 — exactly Spark's ``window(ts,
  '10 minutes')`` start.
- sliding 10m/5m: each event belongs to starts {floor(epoch/300)·300,
  that − 300} — exactly Spark's two windows per event.
- session 5m gap: Spark starts a new session when ts − prev_ts ≥ gap (window
  end is exclusive); the twin reproduces it with lag + a running session
  counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import dec_sum, oracle_dec_sum
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def tumbling_agg(events: DataFrame) -> DataFrame:
    """The shared tumbling-window aggregation used by both the batch twin and
    the live streaming job (single definition — semantics cannot drift)."""
    return (
        events.groupBy(
            F.window("ts", "10 minutes").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), dec_sum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling_window",
    headline=True,
    tags=("streaming",),
    oracle=f"""
    SELECT strftime(TIMESTAMP '1970-01-01'
               + to_seconds(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)),
               '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n_events,
           {oracle_dec_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window counts+sums per event type. Live form in
    :func:`tscd_datalake_adapter_spark.streaming.jobs.run_tumbling_stream`."""
    return tumbling_agg(_events(spark, sf_dir)).orderBy(
        "window_start", "event_type"
    )


@register(
    "stream_sliding_window",
    tags=("streaming",),
    oracle=f"""
    WITH expanded AS (
        SELECT strftime(TIMESTAMP '1970-01-01' + to_seconds(
                   CAST(floor(epoch(ts) / 300) * 300 - s.i * 300 AS BIGINT)),
                   '{TS_FMT_DUCK}') AS window_start,
               event_type, value
        FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) s
    )
    SELECT window_start, event_type,
           count(*) AS n_events,
           {oracle_dec_sum('value')} AS total_value
    FROM expanded GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): every event lands in
    exactly two windows; Spark's ``window(ts, len, slide)`` expands them."""
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), dec_sum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_session_window",
    tags=("streaming",),
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
               AS session_end,
           count(*) AS n_events,
           {oracle_dec_sum('value')} AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute gap per user, via Spark's native
    ``session_window`` (merge-on-gap); the oracle reproduces the merge with
    lag + running counter. Session end = last event + gap (exclusive)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.col("user_id"), F.session_window("ts", "5 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"), dec_sum("value").alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_end"
            ),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "stream_watermark_filter",
    tags=("streaming",),
    oracle=f"""
    SELECT event_type, count(*) AS n_recent,
           {oracle_dec_sum('value')} AS total_value
    FROM events
    WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics in batch form: drop events older than
    max(event time) − 7 days — the same cutoff a ``withWatermark('ts',
    '7 days')`` stream would apply to late data (live demo in jobs.py)."""
    e = _events(spark, sf_dir)
    cutoff = e.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    return (
        e.join(F.broadcast(cutoff))
        .where(F.col("ts") > F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_recent"), dec_sum("value").alias("total_value"))
        .orderBy("event_type")
    )


@register(
    "hypertable_rollup",
    tags=("streaming", "agg"),
    oracle=f"""
    WITH buckets AS (
        SELECT event_type, value,
               strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_b,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_b,
               strftime(TIMESTAMP '1970-01-01'
                   + to_seconds(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)),
                   '%Y-%m-%d %H:%M:%S') AS min10_b
        FROM events
    )
    SELECT CASE WHEN min10_b IS NOT NULL THEN '10min'
                WHEN hour_b IS NOT NULL THEN 'hour'
                ELSE 'day' END AS granularity,
           coalesce(min10_b, hour_b, day_b) AS bucket,
           event_type,
           count(*) AS n,
           {oracle_dec_sum('value')} AS total_value
    FROM buckets
    GROUP BY GROUPING SETS ((day_b, event_type), (hour_b, event_type),
                            (min10_b, event_type))
    ORDER BY granularity, bucket, event_type
    """,
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup (the TimescaleDB
    continuous-aggregate shape, SURVEY.md §4.2 custom-operator tier): one
    pass over events producing 10-minute, hourly, and daily aggregates via
    GROUPING SETS — Spark expands each row into the three grouping branches
    map-side, so the shuffle carries pre-combined partials per (bucket,
    type), not three scans."""
    from tscd_datalake_adapter_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH buckets AS (
            SELECT event_type, value,
                   date_format(date_trunc('day', ts), 'yyyy-MM-dd HH:mm:ss')
                       AS day_b,
                   date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')
                       AS hour_b,
                   date_format(window(ts, '10 minutes').start,
                               'yyyy-MM-dd HH:mm:ss') AS min10_b
            FROM events
        )
        SELECT CASE WHEN min10_b IS NOT NULL THEN '10min'
                    WHEN hour_b IS NOT NULL THEN 'hour'
                    ELSE 'day' END AS granularity,
               coalesce(min10_b, hour_b, day_b) AS bucket,
               event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        FROM buckets
        GROUP BY GROUPING SETS ((day_b, event_type), (hour_b, event_type),
                                (min10_b, event_type))
        ORDER BY granularity, bucket, event_type
        """
    )


@register(
    "event_funnel",
    tags=("streaming", "agg"),
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_viewed,
           CAST(sum(CASE WHEN first_view IS NOT NULL
                          AND first_click > first_view THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked_after_view,
           CAST(sum(CASE WHEN first_view IS NOT NULL
                          AND first_click > first_view
                          AND first_purchase > first_click THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM per_user
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click→purchase funnel: conditional-min event times per user,
    strict ordering between stages, one global rollup. The per-user
    aggregation is a single shuffle on user_id; the funnel predicate is
    post-aggregation arithmetic."""
    e = _events(spark, sf_dir)
    fmin = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        fmin("view").alias("first_view"),
        fmin("click").alias("first_click"),
        fmin("purchase").alias("first_purchase"),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    converted = clicked & (F.col("first_purchase") > F.col("first_click"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(clicked.cast("long")).alias("n_clicked_after_view"),
        F.sum(converted.cast("long")).alias("n_converted"),
    )


@register(
    "stream_dedup_events",
    tags=("streaming",),
    oracle="""
    SELECT event_type, count(*) AS n_unique
    FROM (
        SELECT DISTINCT * FROM (
            SELECT * FROM events UNION ALL SELECT * FROM events
        )
    )
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup's batch twin: exactly-once semantics over an
    at-least-once (duplicated) feed via dropDuplicates on event_id. The live
    form is ``dropDuplicates(['event_id'])`` + watermark (jobs.py)."""
    e = _events(spark, sf_dir)
    feed = e.unionByName(e)  # simulate at-least-once delivery
    return (
        feed.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unique"))
        .orderBy("event_type")
    )


def view_purchase_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Shared view→purchase attribution join (batch twin AND live stream-
    stream join use this single definition): a purchase is attributed to
    every view by the same user in the preceding 30 minutes.

    The time-bound predicate is what makes this joinable as two STREAMS:
    it bounds how long either side's state must be retained (Spark derives
    state eviction from watermark + constraint — see
    ``jobs.run_stream_stream_join``). An unbounded stream-stream equi-join
    would accumulate state forever at 100 TB/day.
    """
    v = views.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") < F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )


@register(
    "stream_stream_join",
    tags=("streaming", "join"),
    oracle=f"""
    SELECT v.user_id, count(*) AS n_pairs,
           {oracle_dec_sum('p.value')} AS attributed_value
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id, ts, value FROM events
          WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts < v.ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id ORDER BY v.user_id
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked stream-stream interval join: per user,
    how many view→purchase attributions (30-minute window) and their value.
    Live form in :func:`jobs.run_stream_stream_join` (both sides
    watermarked; the interval predicate bounds join state)."""
    e = _events(spark, sf_dir)
    pairs = view_purchase_pairs(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "purchase"),
    )
    return (
        pairs.groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            dec_sum("p_value").alias("attributed_value"),
        )
        .orderBy("user_id")
    )


def windowed_topk(events: DataFrame, k: int = 3) -> DataFrame:
    """Shared top-k-per-window logic (batch twin AND live serving job use
    this one definition): tumbling 10-minute aggregation ranked within each
    window by (n_events DESC, event_type) — the deterministic tiebreak —
    keeping the top ``k`` event types. The rank window is partitioned by
    window_start over the AGGREGATE, so its input is bounded by
    windows × event types at any corpus scale."""
    agg = tumbling_agg(events)
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .select("window_start", "event_type", "n_events", "total_value", "rk")
    )


@register(
    "stream_windowed_topk",
    tags=("streaming",),
    oracle=f"""
    WITH agg AS (
        SELECT strftime(TIMESTAMP '1970-01-01'
                   + to_seconds(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)),
                   '{TS_FMT_DUCK}') AS window_start,
               event_type,
               count(*) AS n_events,
               {oracle_dec_sum('value')} AS total_value
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, n_events, total_value,
               CAST(row_number() OVER (PARTITION BY window_start
                    ORDER BY n_events DESC, event_type) AS BIGINT) AS rk
        FROM agg
    )
    SELECT window_start, event_type, n_events, total_value, rk
    FROM ranked WHERE rk <= 3 ORDER BY window_start, rk
    """,
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-now: top-3 event types per tumbling 10-minute window — the
    maintained-leaderboard streaming shape. Live form in
    :func:`tscd_datalake_adapter_spark.streaming.jobs.run_windowed_topk_stream`,
    where each trigger re-ranks the windowed state in ``foreachBatch`` and
    atomically overwrites the serving table (rank-over-state cannot be
    expressed inside a streaming query plan — windows over streaming aggs
    are unsupported — so the serving-layer rewrite IS the production
    pattern). Tests assert live == this twin."""
    return windowed_topk(_events(spark, sf_dir)).orderBy("window_start", "rk")


def anomaly_scores(e: DataFrame) -> DataFrame:
    """Per-event prior-window z-scores: for each event, z against the mean/
    std of all SAME-TYPE events strictly earlier in (ts, event_id) order,
    scored once >= 30 priors exist. Shared by the registered batch query
    and the live streaming job's test twin.

    Integer-cents cumulative sums keep the prior stats exact and
    order-free; mean/var/σ derive from them with fixed-formula double ops
    (population variance; sqrt is IEEE-exact). At 100 TB the cents²
    running sum approaches int64 bounds around ~10¹⁸ — promote the s2
    accumulator to decimal(38,0) there; the fixture stays far below."""
    cents = F.round(F.col("value") * 100.0, 0).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = e.select("event_id", "event_type", "ts", cents.alias("cents"))
    pri = base.select(
        "event_id",
        "event_type",
        "cents",
        F.coalesce(F.count("cents").over(w), F.lit(0)).alias("n_prior"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(w), F.lit(0))
        .alias("s2"),
    )
    n = F.col("n_prior").cast("double")
    mean = F.col("s").cast("double") / n
    # operand order mirrors the oracle text: s promotes to double BEFORE
    # the multiply (exact anyway below 2^53, but identical is identical)
    var = (F.col("s2") - F.col("s").cast("double") * F.col("s") / n) / n
    return pri.where(F.col("n_prior") >= 30).select(
        "event_id",
        "event_type",
        "cents",
        F.when(
            F.sqrt(var) > 0,
            F.round((F.col("cents") - mean) / F.sqrt(var), 6),
        ).alias("z"),
    )


_ANOMALY_ORACLE_SCORES = """
    WITH base AS (
        SELECT event_id, event_type,
               CAST(round(value * 100.0, 0) AS BIGINT) AS cents, ts
        FROM events
    ),
    pri AS (
        SELECT event_id, event_type, cents,
               COALESCE(count(cents) OVER w, 0) AS n_prior,
               COALESCE(sum(cents) OVER w, 0) AS s,
               COALESCE(sum(cents * cents) OVER w, 0) AS s2
        FROM base
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
        SELECT event_id, event_type, cents,
               CASE WHEN sqrt((s2 - CAST(s AS DOUBLE) * s / n_prior)
                              / n_prior) > 0
                    THEN round((cents - CAST(s AS DOUBLE) / n_prior)
                               / sqrt((s2 - CAST(s AS DOUBLE) * s / n_prior)
                                      / n_prior), 6)
               END AS z
        FROM pri WHERE n_prior >= 30
    )
"""


@register(
    "stream_anomaly_zscore",
    tags=("streaming", "analytics"),
    defer=True,
    oracle=_ANOMALY_ORACLE_SCORES
    + """
    SELECT event_id, event_type, cents, z
    FROM scored WHERE abs(z) > 3.0
    ORDER BY event_type, event_id
    """,
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online anomaly detection, batch twin: events whose value sits more
    than 3σ from the running mean of all prior same-type events (>= 30
    priors) — the metric-guardrail job a streaming ingest pipeline runs to
    quarantine corrupt feeds. Live form:
    :func:`tscd_datalake_adapter_spark.streaming.jobs.run_anomaly_stream`
    (applyInPandasWithState; pytest pins live final state == this twin).

    Scale shape: one cumulative window per event_type partition (no global
    window), integer-exact prefix sums, output bounded by the anomaly
    rate."""
    return (
        anomaly_scores(_events(spark, sf_dir))
        .where(F.abs(F.col("z")) > 3.0)
        .orderBy("event_type", "event_id")
    )
