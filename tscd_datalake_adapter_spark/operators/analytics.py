"""Time-series / monitoring / data-quality analytics (events + TPC-H star).

Production-pipeline shapes that sit beside the LLM operators: trailing-
window anomaly scores, grouped-map EWMA smoothing, exact grouped medians
via bounded value histograms, pivot (wide) aggregation, decimal-exact
correlation, binned interval-overlap joins, leakage-safe temporal splits,
and a data-quality expectation suite. Every query is DuckDB-oracle-exact;
determinism recipes per docstring (integer-derived statistics wherever a
float fold would be partition-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    oracle_dec_sum,
    dec_sum,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "anomaly_zscore_daily",
    tags=("events", "analytics"),
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, day, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s1,
               sum(c * c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s2,
               count(c) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n
        FROM daily
    )
    SELECT event_type, day, c AS n_events,
           round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
                 / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE) / 7.0) / 6.0), 6) AS zscore,
           CASE WHEN abs((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
                 / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s1 AS DOUBLE) / 7.0) / 6.0)) > 2.0
                THEN true ELSE false END AS is_anomaly
    FROM w
    WHERE n = 7
      AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
           * CAST(s1 AS DOUBLE) / 7.0) > 0
    ORDER BY event_type, day
    """,
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: per event type, each day's count
    is z-scored against the mean/stddev of the PRECEDING 7 days (the frame
    excludes the current row, so a spike can't mask itself). |z| > 2 flags
    an anomaly — the standard metrics-monitoring shape.

    Determinism: the window statistics are INTEGER sums (s1 = Σc,
    s2 = Σc²) over the frame; mean and sample variance are derived from
    them in double with identical operand order in both engines — no
    engine-native ``stddev`` whose accumulation order could differ.
    Scale: the window runs over the (event_type, day) AGGREGATE — bounded
    by types × days, never by raw event volume — so the per-partition sort
    is trivial at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("c"))
    frame = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(frame).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(frame).alias("s2"),
        F.count("c").over(frame).alias("n"),
    )
    mean = F.col("s1").cast("double") / 7.0
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / 7.0
    ) / 6.0
    z = (F.col("c").cast("double") - mean) / F.sqrt(var)
    return (
        w.where((F.col("n") == 7) & (var * 6.0 > 0))
        .select(
            "event_type",
            "day",
            F.col("c").alias("n_events"),
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ewma_user_value",
    tags=("events", "analytics", "udf"),
    oracle=f"""
    WITH seq AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v, ts, event_id
        FROM events WHERE user_id < 40 AND value IS NOT NULL
    ),
    folded AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               list_reduce(list(v ORDER BY ts, event_id),
                           (a, x) -> a * 0.75 + x * 0.25) AS ewma,
               last(v ORDER BY ts, event_id) AS last_value
        FROM seq GROUP BY user_id
    )
    SELECT user_id, n_events,
           round(ewma, 6) AS ewma,
           round(last_value, 6) AS last_value
    FROM folded ORDER BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha = 0.25) of event values — the grouped-map
    stateful-fold shape: ``applyInPandas`` streams each user's ordered
    history through a Python fold s := 0.75·s + 0.25·x (seeded with the
    first value), the canonical pattern for per-entity recursions that
    window frames cannot express (each output depends on ALL priors).

    Cross-engine exactness: DuckDB's ``list_reduce`` performs the IDENTICAL
    left fold over the identical (ts, event_id)-ordered doubles — same
    multiply/add sequence, same IEEE rounding — so even this iterative
    float recursion sits in the exact gate. Scale: state is one double per
    user; groups are hash-distributed by user_id, the same shuffle any
    per-entity aggregation pays. 100 TB caveat: a single user's history
    must fit one Arrow batch group — bound it with history windows in a
    real deployment."""
    import pandas as pd

    e = (
        load_table(spark, sf_dir, "events")
        .where((F.col("user_id") < 40) & F.col("value").isNotNull())
        .select("user_id", F.col("value").cast("double").alias("v"),
                "ts", "event_id")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        vals = pdf["v"].tolist()
        s = vals[0]
        for x in vals[1:]:
            s = s * 0.75 + x * 0.25
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(vals)],
                "ewma": [round(s, 6)],
                "last_value": [round(vals[-1], 6)],
            }
        )

    return (
        e.groupBy("user_id")
        .applyInPandas(
            fold,
            "user_id long, n_events long, ewma double, last_value double",
        )
        .orderBy("user_id")
    )


@register(
    "median_ship_delay_histogram",
    tags=("tpch", "analytics"),
    oracle="""
    WITH delays AS (
        SELECT l.l_returnflag AS returnflag,
               CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hist AS (
        SELECT returnflag, delay_days, CAST(count(*) AS BIGINT) AS cnt
        FROM delays GROUP BY 1, 2
    ),
    cum AS (
        SELECT returnflag, delay_days, cnt,
               sum(cnt) OVER (PARTITION BY returnflag ORDER BY delay_days
                              ROWS UNBOUNDED PRECEDING) AS cum_cnt,
               sum(cnt) OVER (PARTITION BY returnflag) AS n
        FROM hist
    )
    SELECT returnflag,
           CAST(min(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum_cnt * 2 >= n THEN delay_days END)
                AS BIGINT) AS p50_delay,
           CAST(min(CASE WHEN cum_cnt * 10 >= 9 * n THEN delay_days END)
                AS BIGINT) AS p90_delay
    FROM cum GROUP BY returnflag ORDER BY returnflag
    """,
)
def median_ship_delay_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped p50/p90 of order→ship delay via the bounded-value-
    histogram pattern (``length_percentile_filter``'s grouped sibling):
    aggregate counts per (group, integer day-delay), then walk the
    cumulative histogram — percentile_disc semantics (smallest value with
    cum_count ≥ ⌈p·n⌉, expressed integer-only as cum·2 ≥ n / cum·10 ≥ 9n).

    Scale: exact percentiles without ``percentile()``'s buffer-every-value
    aggregation state — the shuffle is (groups × distinct day-delays),
    bounded by the delay value domain (~5k days) regardless of row count;
    each window partition is one group's bounded histogram."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delays = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_returnflag").alias("returnflag"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("delay_days"),
    )
    hist = delays.groupBy("returnflag", "delay_days").agg(
        F.count("*").alias("cnt")
    )
    wcum = (
        Window.partitionBy("returnflag")
        .orderBy("delay_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("returnflag")
    cum = hist.select(
        "returnflag",
        "delay_days",
        F.sum("cnt").over(wcum).alias("cum_cnt"),
        F.sum("cnt").over(wall).alias("n"),
    )
    return (
        cum.groupBy("returnflag")
        .agg(
            F.min("n").cast("long").alias("n"),
            F.min(
                F.when(
                    F.col("cum_cnt") * 2 >= F.col("n"), F.col("delay_days")
                )
            )
            .cast("long")
            .alias("p50_delay"),
            F.min(
                F.when(
                    F.col("cum_cnt") * 10 >= 9 * F.col("n"),
                    F.col("delay_days"),
                )
            )
            .cast("long")
            .alias("p90_delay"),
        )
        .orderBy("returnflag")
    )


@register(
    "pivot_status_revenue",
    tags=("tpch", "analytics"),
    oracle=f"""
    SELECT l_returnflag,
           {oracle_dec_sum(
               "CASE WHEN l_linestatus = 'F' "
               "THEN l_extendedprice * (1 - l_discount) END")} AS rev_f,
           {oracle_dec_sum(
               "CASE WHEN l_linestatus = 'O' "
               "THEN l_extendedprice * (1 - l_discount) END")} AS rev_o,
           CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END)
                AS BIGINT) AS n_f,
           CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END)
                AS BIGINT) AS n_o
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long → wide): revenue and row counts per returnflag, spread
    across linestatus columns. The pivot VALUES are declared explicitly
    (['F', 'O']) — omitting them makes Spark run a distinct-values
    collection job at plan time, a hidden driver round-trip this registry
    bans. Decimal-exact money sums; the oracle is the equivalent
    conditional aggregation (what Catalyst lowers pivot to)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            dec_sum(rev).alias("rev"),
            # count(lit(1)): Spark disallows count(*) inside PIVOT aggs
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.col("F_rev").alias("rev_f"),
        F.col("O_rev").alias("rev_o"),
        F.col("F_n").alias("n_f"),
        F.col("O_n").alias("n_o"),
    ).orderBy("l_returnflag")


@register(
    "corr_quantity_price",
    tags=("tpch", "analytics"),
    oracle=f"""
    WITH s AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               {oracle_dec_sum('l_quantity')} AS sx,
               {oracle_dec_sum('l_extendedprice')} AS sy,
               {oracle_dec_sum('l_quantity * l_quantity')} AS sxx,
               {oracle_dec_sum('l_extendedprice * l_extendedprice')} AS syy,
               {oracle_dec_sum('l_quantity * l_extendedprice')} AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * (n - 1.0)), 6)
               AS covar_samp_qty_price
    FROM s ORDER BY l_returnflag
    """,
)
def corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance of quantity vs price per
    returnflag — computed from five DECIMAL-EXACT sums (Σx, Σy, Σx², Σy²,
    Σxy) rather than engine-native ``corr``/``covar_samp``, whose
    co-moment accumulation order differs between engines and across
    partition counts. The derived doubles see identical operands in an
    identical order, so the result is bit-stable at any parallelism —
    the same reasoning as ``functions.dec_var_samp``. One map-side partial
    agg + a 3-row shuffle; scale-flat."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        dec_sum(x).alias("sx"),
        dec_sum(y).alias("sy"),
        dec_sum(x * x).alias("sxx"),
        dec_sum(y * y).alias("syy"),
        dec_sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    cov_num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round(
            cov_num
            / F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr_qty_price"),
        F.round(cov_num / (n * (n - F.lit(1.0))), 6).alias(
            "covar_samp_qty_price"
        ),
    ).orderBy("l_returnflag")


@register(
    "orders_in_flight_by_month",
    tags=("tpch", "analytics"),
    oracle="""
    WITH iv AS (
        SELECT l.l_orderkey, l.l_linenumber,
               date_trunc('month', o.o_orderdate) AS m0,
               date_trunc('month', l.l_shipdate) AS m1
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    ),
    exploded AS (
        SELECT strftime(unnest(generate_series(m0, m1, INTERVAL 1 MONTH)),
                        '%Y-%m') AS month
        FROM iv
    )
    SELECT month, CAST(count(*) AS BIGINT) AS n_in_flight
    FROM exploded GROUP BY month ORDER BY month
    """,
)
def orders_in_flight_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap aggregation via BINNING: each line item is "in
    flight" from order month to ship month; exploding the bounded month
    sequence turns the interval-overlap join (how many intervals cover
    month X?) into a plain groupBy — the same rewrite as
    ``range_join_binned``, here for the temporal-overlap shape.

    Scale: the explode factor is the interval length in months (bounded by
    business rules, not data size), after which everything is one
    hash aggregation on a low-cardinality month key — versus the
    nested-loop month×interval theta join a naive formulation plans.
    Intervals with ship < order (synthetic fixture noise) are excluded
    explicitly so the month sequence is always non-empty and forward."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.trunc(F.col("o_orderdate").cast("date"), "MM").alias("m0"),
            F.trunc(F.col("l_shipdate").cast("date"), "MM").alias("m1"),
        )
    )
    months = iv.select(
        F.explode(
            F.expr("sequence(m0, m1, interval 1 month)")
        ).alias("m")
    )
    return (
        months.groupBy(F.date_format("m", "yyyy-MM").alias("month"))
        .agg(F.count("*").cast("long").alias("n_in_flight"))
        .orderBy("month")
    )


@register(
    "temporal_split_embargo",
    tags=("events", "analytics"),
    oracle=f"""
    WITH tagged AS (
        SELECT CASE
                 WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                 WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'test'
                 ELSE 'embargo'
               END AS split,
               user_id, ts
        FROM events
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           strftime(min(ts), '{_TS_FMT_DUCK}') AS min_ts,
           strftime(max(ts), '{_TS_FMT_DUCK}') AS max_ts
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe temporal train/test split with an embargo gap: train on
    events before T−2d, test on events after T, and DROP the 2-day embargo
    band between them (events whose effects straddle the boundary — the
    standard guard against temporal leakage in forecasting/backtest
    pipelines, complementing ``domain_grouped_split``'s entity-level
    leakage guard). Pure predicate tagging — map-side, zero shuffle before
    the summary aggregation, trivially partition-prunable when the lake is
    date-partitioned."""
    e = load_table(spark, sf_dir, "events")
    split = (
        F.when(F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"),
               "train")
        .when(F.col("ts") >= F.lit("2024-01-22 00:00:00").cast("timestamp"),
              "test")
        .otherwise("embargo")
    )
    return (
        e.select(split.alias("split"), "user_id", "ts")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("min_ts"),
            F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("max_ts"),
        )
        .orderBy("split")
    )


@register(
    "dq_expectations_orders",
    tags=("tpch", "analytics"),
    oracle="""
    WITH checks AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) - count(o_orderkey) AS BIGINT) AS key_nulls,
            CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
                 AS BIGINT) AS key_dupes,
            CAST(sum(CASE WHEN o_totalprice <= 0
                            OR o_totalprice > 1000000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS price_range,
            CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                          THEN 1 ELSE 0 END) AS BIGINT) AS status_enum,
            CAST(count(*) - count(o_orderdate) AS BIGINT) AS date_nulls
        FROM orders
    )
    SELECT e.expectation, e.n_violations, c.n_rows,
           CASE WHEN e.n_violations = 0 THEN true ELSE false END AS passed
    FROM checks c, (
        SELECT 'orderkey_not_null' AS expectation,
               key_nulls AS n_violations FROM checks
        UNION ALL SELECT 'orderkey_unique', key_dupes FROM checks
        UNION ALL SELECT 'totalprice_in_range', price_range FROM checks
        UNION ALL SELECT 'status_in_enum', status_enum FROM checks
        UNION ALL SELECT 'orderdate_not_null', date_nulls FROM checks
    ) e
    ORDER BY e.expectation
    """,
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Deequ/Great-Expectations shape):
    declared constraints — key non-null + unique, price range, status
    enum, date non-null — verified in ONE aggregation pass whose counters
    all ride the same map-side partial agg, then unpivoted to one row per
    expectation. At 100 TB this is the pattern that matters: N checks =
    one scan, not N scans; uniqueness is the only counter that needs a
    distinct (its shuffle is the key column, unavoidable for exactness)."""
    o = load_table(spark, sf_dir, "orders")
    checks = o.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("o_orderkey")).alias("key_nulls"),
        (F.count("o_orderkey") - F.countDistinct("o_orderkey")).alias(
            "key_dupes"
        ),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 1_000_000),
                1,
            ).otherwise(0)
        ).alias("price_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("status_enum"),
        (F.count("*") - F.count("o_orderdate")).alias("date_nulls"),
    )
    stacked = checks.select(
        "n_rows",
        F.expr(
            "stack(5,"
            " 'orderkey_not_null', key_nulls,"
            " 'orderkey_unique', key_dupes,"
            " 'totalprice_in_range', price_range,"
            " 'status_in_enum', status_enum,"
            " 'orderdate_not_null', date_nulls)"
            " AS (expectation, n_violations)"
        ),
    )
    return stacked.select(
        "expectation",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("expectation")


@register(
    "mad_outlier_days",
    tags=("tpch", "analytics"),
    oracle="""
    WITH delays AS (
        SELECT CAST(datediff('day', o.o_orderdate, l.l_shipdate)
                    AS BIGINT) AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    hist AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt
             FROM delays GROUP BY d),
    cum AS (
        SELECT d, cnt,
               sum(cnt) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                   AS cum_cnt,
               sum(cnt) OVER () AS n
        FROM hist
    ),
    med AS (
        SELECT CAST(min(CASE WHEN cum_cnt * 2 >= n THEN d END)
                    AS BIGINT) AS median,
               CAST(min(n) AS BIGINT) AS n
        FROM cum
    ),
    dev_hist AS (
        SELECT abs(h.d - m.median) AS dev, CAST(sum(h.cnt) AS BIGINT) AS cnt
        FROM hist h CROSS JOIN med m GROUP BY 1
    ),
    dev_cum AS (
        SELECT dev, cnt,
               sum(cnt) OVER (ORDER BY dev ROWS UNBOUNDED PRECEDING)
                   AS cum_cnt,
               sum(cnt) OVER () AS n
        FROM dev_hist
    ),
    mad AS (
        SELECT CAST(min(CASE WHEN cum_cnt * 2 >= n THEN dev END)
                    AS BIGINT) AS mad
        FROM dev_cum
    )
    SELECT m.median, a.mad, m.n AS n_total,
           CAST(coalesce((SELECT sum(h.cnt) FROM hist h
                          WHERE abs(h.d - m.median) > 5 * a.mad), 0)
                AS BIGINT) AS n_outliers
    FROM med m CROSS JOIN mad a
    """,
)
def mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by Median Absolute Deviation: median and
    MAD of the order→ship day delay via TWO bounded-value-histogram passes
    (the exact-percentile pattern, reused: the deviation domain is as
    bounded as the delay domain), then count delays beyond 5·MAD — the
    robust alternative to z-scores when the distribution has heavy tails
    (a handful of extreme delays cannot drag the threshold the way they
    drag a mean/stddev).

    Scale: the raw data is touched once (histogram aggregation keyed on
    the integer day-delay); every subsequent pass — deviation histogram,
    MAD walk, outlier count — runs over the bounded histogram with the
    1-row median/MAD broadcast back. All integer arithmetic end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delays = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("d")
    )
    hist = delays.groupBy("d").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.select(
        "d",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum_cnt"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = cum.agg(
        F.min(F.when(F.col("cum_cnt") * 2 >= F.col("n"), F.col("d")))
        .cast("long")
        .alias("median"),
        F.min("n").cast("long").alias("n"),
    )
    dev_hist = (
        hist.crossJoin(F.broadcast(med))
        .groupBy(F.abs(F.col("d") - F.col("median")).alias("dev"))
        .agg(F.sum("cnt").alias("cnt"))
    )
    wdev = Window.orderBy("dev").rowsBetween(Window.unboundedPreceding, 0)
    dev_cum = dev_hist.select(
        "dev",
        F.sum("cnt").over(wdev).alias("cum_cnt"),
        F.sum("cnt").over(Window.partitionBy()).alias("dn"),
    )
    mad = dev_cum.agg(
        F.min(F.when(F.col("cum_cnt") * 2 >= F.col("dn"), F.col("dev")))
        .cast("long")
        .alias("mad")
    )
    outliers = (
        hist.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .where(F.abs(F.col("d") - F.col("median")) > 5 * F.col("mad"))
        .agg(F.sum("cnt").cast("long").alias("n_outliers"))
    )
    return (
        med.crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(outliers))
        .select(
            "median",
            "mad",
            F.col("n").alias("n_total"),
            F.coalesce("n_outliers", F.lit(0)).cast("long").alias("n_outliers"),
        )
    )
