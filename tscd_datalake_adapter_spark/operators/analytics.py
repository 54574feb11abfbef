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


@register(
    "longest_purchase_streak",
    tags=("events", "analytics"),
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE event_type = 'purchase' AND user_id < 60
    ),
    grouped AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INTEGER) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, island, CAST(count(*) AS BIGINT) AS len,
               min(d) AS start_d
        FROM grouped GROUP BY user_id, island
    ),
    best AS (
        SELECT user_id, len, start_d,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, start_d) AS rk
        FROM streaks
    )
    SELECT user_id, len AS streak_days,
           strftime(start_d, '%Y-%m-%d') AS streak_start
    FROM best WHERE rk = 1 ORDER BY user_id
    """,
)
def longest_purchase_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE calendar
    days with at least one purchase, via the classic date-minus-row_number
    island key (consecutive dates share a constant difference from their
    per-user rank). Ties on length resolve to the earliest streak.

    Scale: both windows are partitioned by user_id over the per-user
    distinct-day set (bounded by the calendar, not event volume); the
    island groupBy rides the same hash distribution."""
    e = (
        load_table(spark, sf_dir, "events")
        .where((F.col("event_type") == "purchase") & (F.col("user_id") < 60))
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    wdays = Window.partitionBy("user_id").orderBy("d")
    grouped = e.select(
        "user_id",
        "d",
        F.date_sub(
            F.col("d"), F.row_number().over(wdays)
        ).alias("island"),
    )
    streaks = grouped.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len"), F.min("d").alias("start_d")
    )
    wbest = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start_d")
    )
    return (
        streaks.withColumn("rk", F.row_number().over(wbest))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("len").alias("streak_days"),
            F.date_format("start_d", "yyyy-MM-dd").alias("streak_start"),
        )
        .orderBy("user_id")
    )


@register(
    "top_event_trigrams_by_session",
    tags=("events", "analytics"),
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id < 80
    ),
    marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN prev_ts IS NULL
                         OR epoch(ts) - epoch(prev_ts) >= 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM seq
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS session_id
        FROM marked
    ),
    withnext AS (
        SELECT user_id, session_id, event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id, session_id
                                         ORDER BY ts, event_id) AS e2,
               lead(event_type, 2) OVER (PARTITION BY user_id, session_id
                                         ORDER BY ts, event_id) AS e3
        FROM sessions
    )
    SELECT concat(event_type, '>', e2, '>', e3) AS path,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM withnext WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n_occurrences DESC, path LIMIT 15
    """,
)
def top_event_trigrams_by_session(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Behavioral path mining: the most common 3-step event sequences
    WITHIN a session (30-minute-gap sessionization, same rule as
    ``sessionize_events_batch``) — trigrams never span a session boundary,
    which is what separates this from a naive per-user lead() and is the
    property the oracle pins. The product-analytics "top user journeys"
    report.

    Scale: sessionization + lead windows are all partitioned by user (and
    session) — per-entity state; the final path count is a low-cardinality
    aggregation (|event_types|^3 keys max)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 80)
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(wseq).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(wseq))
                >= 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            wseq.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    wsess = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    withnext = sessions.select(
        "event_type",
        F.lead("event_type", 1).over(wsess).alias("e2"),
        F.lead("event_type", 2).over(wsess).alias("e3"),
    )
    return (
        withnext.where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(15)
    )


@register(
    "dow_seasonality_profile",
    tags=("events", "analytics"),
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    dow AS (
        SELECT d, c, dayofweek(d) AS dw FROM daily
    ),
    profile AS (
        SELECT dw,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(c) AS BIGINT) AS total,
               round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS mean_events
        FROM dow GROUP BY dw
    ),
    overall AS (
        SELECT round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS grand_mean
        FROM daily
    )
    SELECT CAST(p.dw AS BIGINT) AS day_of_week, p.n_days, p.total,
           p.mean_events,
           round(p.mean_events / o.grand_mean, 6) AS seasonal_index
    FROM profile p CROSS JOIN overall o
    ORDER BY day_of_week
    """,
)
def dow_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile: mean daily event volume per
    weekday and its seasonal index (ratio to the grand daily mean) — the
    first decomposition step of any traffic forecast. Integer sums
    end-to-end (counts), divisions on identical operands; the grand mean
    arrives by broadcast 1-row aggregate. DuckDB ``dayofweek`` (0=Sunday)
    differs from Spark ``dayofweek`` (1=Sunday), reconciled by shifting
    Spark's value down one. Bounded output (7 rows) from one daily
    aggregation."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").alias("c")
    )
    dow = daily.select(
        (F.dayofweek("d") - 1).alias("dw"), "c"
    )
    profile = dow.groupBy("dw").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("total"),
        F.round(F.sum("c").cast("double") / F.count("*"), 6).alias(
            "mean_events"
        ),
    )
    overall = daily.agg(
        F.round(F.sum("c").cast("double") / F.count("*"), 6).alias(
            "grand_mean"
        )
    )
    return (
        profile.crossJoin(F.broadcast(overall))
        .select(
            F.col("dw").cast("long").alias("day_of_week"),
            "n_days",
            "total",
            "mean_events",
            F.round(F.col("mean_events") / F.col("grand_mean"), 6).alias(
                "seasonal_index"
            ),
        )
        .orderBy("day_of_week")
    )


@register(
    "rfm_segmentation",
    tags=("events", "analytics"),
    oracle="""
    WITH ref AS (SELECT max(ts) AS ref_ts FROM events),
    purch AS (
        SELECT user_id,
               CAST(datediff('day', max(ts), (SELECT ref_ts FROM ref))
                    AS BIGINT) AS recency,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(round(sum(CAST(value AS DECIMAL(38, 6))) * 100, 0)
                    AS BIGINT) AS monetary_cents
        FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
        GROUP BY user_id
    ),
    metrics AS (
        SELECT 'r' AS m, recency AS v FROM purch
        UNION ALL SELECT 'f', frequency FROM purch
        UNION ALL SELECT 'm', monetary_cents FROM purch
    ),
    hist AS (SELECT m, v, CAST(count(*) AS BIGINT) AS cnt
             FROM metrics GROUP BY m, v),
    cum AS (
        SELECT m, v, cnt,
               sum(cnt) OVER (PARTITION BY m ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cum_cnt,
               sum(cnt) OVER (PARTITION BY m) AS n
        FROM hist
    ),
    cuts AS (
        SELECT m,
               min(CASE WHEN cum_cnt * 3 >= n THEN v END) AS t1,
               min(CASE WHEN cum_cnt * 3 >= 2 * n THEN v END) AS t2
        FROM cum GROUP BY m
    ),
    wide AS (
        SELECT max(CASE WHEN m = 'r' THEN t1 END) AS r1,
               max(CASE WHEN m = 'r' THEN t2 END) AS r2,
               max(CASE WHEN m = 'f' THEN t1 END) AS f1,
               max(CASE WHEN m = 'f' THEN t2 END) AS f2,
               max(CASE WHEN m = 'm' THEN t1 END) AS m1,
               max(CASE WHEN m = 'm' THEN t2 END) AS m2
        FROM cuts
    ),
    bucketed AS (
        SELECT p.user_id,
               CASE WHEN p.recency <= w.r1 THEN 1
                    WHEN p.recency <= w.r2 THEN 2 ELSE 3 END AS r_b,
               CASE WHEN p.frequency <= w.f1 THEN 1
                    WHEN p.frequency <= w.f2 THEN 2 ELSE 3 END AS f_b,
               CASE WHEN p.monetary_cents <= w.m1 THEN 1
                    WHEN p.monetary_cents <= w.m2 THEN 2 ELSE 3 END AS m_b,
               p.monetary_cents
        FROM purch p CROSS JOIN wide w
    )
    SELECT concat(CAST(r_b AS VARCHAR), '-', CAST(f_b AS VARCHAR), '-',
                  CAST(m_b AS VARCHAR)) AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(monetary_cents) AS BIGINT) AS total_cents
    FROM bucketed GROUP BY 1 ORDER BY segment
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per purchasing user, Recency (days since
    last purchase vs corpus max ts), Frequency (purchase count), Monetary
    (decimal-exact cent sum); each metric is cut into EXACT terciles via
    the bounded-value-histogram percentile pattern (stacked long so one
    histogram pass serves all three metrics), and users are bucketed into
    the 27 possible r-f-m segments with counts and value totals — the
    standard CRM segmentation, leakage-free and rerun-stable.

    Scale: one purchase aggregation keyed on user; the tercile machinery
    runs over metric HISTOGRAMS (distinct values, not users); cutoffs
    (6 scalars) broadcast back. Bucket index 1 = lowest metric value, so
    1-x-x recency is the MOST recent tier — interpretation, not math."""
    e = load_table(spark, sf_dir, "events")
    ref = e.agg(F.max("ts").alias("ref_ts"))
    purch = (
        e.where((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").cast("long").alias("frequency"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")) * 100, 0)
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.datediff(F.col("ref_ts"), F.col("last_ts"))
            .cast("long")
            .alias("recency"),
            "frequency",
            "monetary_cents",
        )
    )
    metrics = (
        purch.select(F.lit("r").alias("m"), F.col("recency").alias("v"))
        .unionByName(
            purch.select(F.lit("f").alias("m"), F.col("frequency").alias("v"))
        )
        .unionByName(
            purch.select(
                F.lit("m").alias("m"), F.col("monetary_cents").alias("v")
            )
        )
    )
    hist = metrics.groupBy("m", "v").agg(F.count("*").alias("cnt"))
    wcum = (
        Window.partitionBy("m")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "m",
        "v",
        F.sum("cnt").over(wcum).alias("cum_cnt"),
        F.sum("cnt").over(Window.partitionBy("m")).alias("n"),
    )
    cuts = cum.groupBy("m").agg(
        F.min(F.when(F.col("cum_cnt") * 3 >= F.col("n"), F.col("v"))).alias(
            "t1"
        ),
        F.min(
            F.when(F.col("cum_cnt") * 3 >= 2 * F.col("n"), F.col("v"))
        ).alias("t2"),
    )
    wide = cuts.groupBy().agg(
        F.max(F.when(F.col("m") == "r", F.col("t1"))).alias("r1"),
        F.max(F.when(F.col("m") == "r", F.col("t2"))).alias("r2"),
        F.max(F.when(F.col("m") == "f", F.col("t1"))).alias("f1"),
        F.max(F.when(F.col("m") == "f", F.col("t2"))).alias("f2"),
        F.max(F.when(F.col("m") == "m", F.col("t1"))).alias("m1"),
        F.max(F.when(F.col("m") == "m", F.col("t2"))).alias("m2"),
    )
    tier = lambda v, t1, t2: (  # noqa: E731
        F.when(F.col(v) <= F.col(t1), 1)
        .when(F.col(v) <= F.col(t2), 2)
        .otherwise(3)
    )
    bucketed = purch.crossJoin(F.broadcast(wide)).select(
        "user_id",
        "monetary_cents",
        tier("recency", "r1", "r2").alias("r_b"),
        tier("frequency", "f1", "f2").alias("f_b"),
        tier("monetary_cents", "m1", "m2").alias("m_b"),
    )
    return (
        bucketed.select(
            F.concat_ws(
                "-",
                F.col("r_b").cast("string"),
                F.col("f_b").cast("string"),
                F.col("m_b").cast("string"),
            ).alias("segment"),
            "monetary_cents",
        )
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("monetary_cents").cast("long").alias("total_cents"),
        )
        .orderBy("segment")
    )


@register(
    "benford_first_digit",
    tags=("tpch", "analytics"),
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM counts)
    SELECT c.d AS first_digit, c.n,
           round(CAST(c.n AS DOUBLE) / t.total, 6) AS observed_freq,
           round(log10(1.0 + 1.0 / c.d), 6) AS benford_freq,
           round(CAST(c.n AS DOUBLE) / t.total
                 - log10(1.0 + 1.0 / c.d), 6) AS deviation
    FROM counts c CROSS JOIN tot t ORDER BY first_digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals: observed leading-
    digit frequencies vs the log10(1 + 1/d) expectation — the classic
    anomaly/fraud screen for financial magnitude columns. String-extracted
    first digit (integer-exact), one bounded aggregation (9 rows), total
    via broadcast 1-row crossJoin; the only float math is division and
    log10 on identical operands."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").cast("long").alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            "n",
            F.round(obs, 6).alias("observed_freq"),
            F.round(ben, 6).alias("benford_freq"),
            F.round(obs - ben, 6).alias("deviation"),
        )
        .orderBy("first_digit")
    )


@register(
    "revenue_share_within_region",
    tags=("tpch", "analytics"),
    oracle=f"""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               {oracle_dec_sum('o.o_totalprice')} AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
               AS share_in_region,
           CAST(row_number() OVER (PARTITION BY region
                ORDER BY revenue DESC, nation) AS BIGINT) AS rank_in_region
    FROM rev ORDER BY region, rank_in_region
    """,
)
def revenue_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue plus
    its in-region rank — the BI staple missing from the frame-aggregate
    family (the share window has NO frame: it is the partition total).
    Runs over the (region, nation) AGGREGATE (25 rows at any scale), so
    the share window is trivially bounded; revenue sums are decimal-exact
    before the one share division. Broadcast dimension joins throughout."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(dec_sum("o_totalprice").alias("revenue"))
    )
    wshare = Window.partitionBy("region")
    wrank = Window.partitionBy("region").orderBy(
        F.col("revenue").desc(), F.col("nation")
    )
    return rev.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(
            F.col("revenue") / F.sum("revenue").over(wshare), 6
        ).alias("share_in_region"),
        F.row_number().over(wrank).cast("long").alias("rank_in_region"),
    ).orderBy("region", "rank_in_region")


@register(
    "cumulative_unique_users",
    tags=("events", "analytics"),
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    per_day AS (
        SELECT first_day, CAST(count(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY first_day
    )
    SELECT strftime(first_day, '%Y-%m-%d') AS day, n_new,
           CAST(sum(n_new) OVER (ORDER BY first_day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM per_day ORDER BY day
    """,
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-user growth curve: the streaming-unfriendly
    "distinct count to date" rewritten as first-seen-day attribution (one
    groupBy(user) for first_day, one bounded daily aggregate, one running
    sum over the CALENDAR) — the standard rewrite that turns an
    O(days × users) repeated-distinct into two linear aggregations. The
    running-sum window orders the per-day aggregate, bounded by the
    calendar at any scale."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    per_day = firsts.groupBy("first_day").agg(
        F.count("*").cast("long").alias("n_new")
    )
    wrun = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_day.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "n_new",
        F.sum("n_new").over(wrun).cast("long").alias("cumulative_users"),
    ).orderBy("day")
