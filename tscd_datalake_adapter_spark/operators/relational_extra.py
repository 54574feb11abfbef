"""Inventory completion queries (SURVEY.md §2.2 audit round): right outer
join, first/last window analytics, approx_count_distinct, embedding-cosine
near-duplicate pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.operators.similarity import cosine
from tscd_datalake_adapter_spark.sources import load_table


@register(
    "right_outer_join_parts",
    tags=("join",),
    oracle="""
    SELECT p.p_partkey, p.p_name,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lineitems
    FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_partkey < 100
    GROUP BY p.p_partkey, p.p_name
    ORDER BY p.p_partkey
    """,
)
def right_outer_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every part keeps a row even with zero lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 100)
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
        .orderBy("p_partkey")
    )


@register(
    "window_first_last",
    tags=("window",),
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS last_price,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last analytic functions over per-customer order history (last
    over the full-frame window, the standard gotcha handled explicitly)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.count("*").over(Window.partitionBy("o_custkey")).cast("long").alias(
            "n_orders"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "approx_count_distinct_custkeys",
    tags=("agg",),
    # Weak oracle by design: approx_* is excluded from hash-matching
    # (BASELINE.md determinism rules). The unit test checks the estimate is
    # within HLL++ rsd bounds of the exact count.
)
def approx_count_distinct_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct: the sketch path for 100 TB
    cardinalities (exact countDistinct shuffles every key; the sketch is a
    fixed-size mergeable state)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    ).orderBy("o_orderstatus")


@register(
    "lake_path_derivation",
    tags=("ingest",),
    oracle="""
    SELECT o_orderkey,
           'datalake/' || strftime(o_orderdate, '%Y%m%d') || '/'
               || strftime(o_orderdate, '%H') || '/'
               || CAST(o_orderkey AS VARCHAR) AS rel_path,
           strftime(o_orderdate, '%Y%m%d') AS ingest_date,
           strftime(o_orderdate, '%H') AS ingest_hour
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
)
def lake_path_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R7 (`relativePathFor`, ``S3DatalakeStorage.java:121-124,
    142-150``) as a declarative expression: ``datalake/{yyyyMMdd}/{HH}/{id}``
    derived with date_format + concat_ws — the partition-value derivation the
    lake write path uses, inside the oracle gate."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    day = F.date_format("o_orderdate", "yyyyMMdd")
    hour = F.date_format("o_orderdate", "HH")
    return o.select(
        "o_orderkey",
        F.concat_ws(
            "/", F.lit("datalake"), day, hour, F.col("o_orderkey").cast("string")
        ).alias("rel_path"),
        day.alias("ingest_date"),
        hour.alias("ingest_hour"),
    ).orderBy("o_orderkey")


@register(
    "percentiles_by_status",
    tags=("agg",),
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
           round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``: same (1-h)·a + h·b interpolation on the same sorted
    doubles → bit-identical). At 100 TB the sketch form
    (``percentile_approx``) replaces this; the exact form is the oracle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90_price"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "data_quality_audit",
    tags=("agg", "io"),
    oracle="""
    SELECT 'lineitem_orphan_orders' AS check_name,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_orphan_customers',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_null_keys',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_orderkey IS NULL OR l_partkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_bad_discount',
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'orders_bad_status',
           CAST((SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT)
    ORDER BY check_name
    """,
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion suite over the lake tables: referential
    integrity (anti-joins), null keys, domain violations — the audit every
    ingest pipeline runs before publishing a partition. Each check is a
    count the optimizer collapses to a semi/anti join or a pushed filter."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    # Row-local checks on the same table fold into ONE conditional
    # aggregation pass (then unpivot via stack); only the referential
    # checks need their own join pass — and the orders-side RI check
    # rides the same pass as orders' domain check through a left join
    # (NULL build side = orphan). Audited r7: 6 scans -> 4 (lineitem
    # anti-join + lineitem filter pass + orders join pass + customer).
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731

    li_orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("lineitem_orphan_orders").alias("check_name"),
            "n_violations",
        )
    )
    li_rowlocal = li.agg(
        cnt(F.col("l_orderkey").isNull() | F.col("l_partkey").isNull()).alias(
            "n_null"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "n_disc"
        ),
    ).select(
        F.expr(
            "stack(2, 'lineitem_null_keys', n_null,"
            " 'lineitem_bad_discount', n_disc)"
        ).alias("check_name", "n_violations")
    )
    o_checks = (
        o.join(
            c.select(F.col("c_custkey").alias("ck")),
            o.o_custkey == F.col("ck"),
            "left",
        )
        .agg(
            cnt(F.col("ck").isNull()).alias("n_orphan"),
            cnt(~F.col("o_orderstatus").isin("F", "O", "P")).alias("n_bad"),
        )
        .select(
            F.expr(
                "stack(2, 'orders_orphan_customers', n_orphan,"
                " 'orders_bad_status', n_bad)"
            ).alias("check_name", "n_violations")
        )
    )
    return (
        li_orphans.unionByName(li_rowlocal)
        .unionByName(o_checks)
        .orderBy("check_name")
    )


@register(
    "latest_order_per_customer",
    tags=("agg",),
    oracle="""
    SELECT o_custkey,
           CAST(max_by(o_orderkey, epoch(o_orderdate) * 10000000 + o_orderkey)
                AS BIGINT) AS latest_orderkey,
           strftime(max(o_orderdate), '%Y-%m-%d') AS latest_orderdate,
           count(*) AS n_orders
    FROM orders WHERE o_custkey < 200
    GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation (max_by): the latest order per customer without a
    window — one aggregate pass instead of sort+row_number. The ordering key
    folds the orderkey in as a tiebreak so the argmax is unique."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    sort_key = F.expr(
        "unix_timestamp(o_orderdate) * 10000000 + o_orderkey"
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", sort_key).cast("long").alias("latest_orderkey"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias(
                "latest_orderdate"
            ),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@register(
    "multiset_ops",
    tags=("set",),
    oracle="""
    SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'N'
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    )
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'N'
        INTERSECT ALL
        SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    )
    ORDER BY op
    """,
)
def multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops (exceptAll / intersectAll): duplicate-preserving
    semantics, the bag algebra the distinct variants can't express."""
    from tscd_datalake_adapter_spark.functions import persist_corpus

    li = load_table(spark, sf_dir, "lineitem")
    # both set-ops consume both sides — cache each filtered projection so
    # lineitem scans once per side, not once per side per op (audited r7:
    # 4 scans -> 2). persist: the key streams grow with the data.
    n = persist_corpus(
        li.where(F.col("l_returnflag") == "N").select("l_suppkey")
    )
    r = persist_corpus(
        li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    )
    ex = n.exceptAll(r).agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    inter = n.intersectAll(r).agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    return ex.unionByName(inter).orderBy("op")


@register(
    "quality_histogram",
    tags=("agg", "llm"),
    oracle=f"""
    WITH scored AS (
        SELECT round(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0), 6)
                   AS len_score
        FROM documents
    )
    SELECT CAST(floor(len_score * 10) AS BIGINT) AS bucket,
           count(*) AS n_docs
    FROM scored GROUP BY 1 ORDER BY bucket
    """,
)
def quality_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram by fixed-width bucketing (floor(score·10)) — the
    aggregation shape of corpus-quality dashboards."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    score = F.round(F.least(F.size(toks).cast("double") / 50.0, F.lit(1.0)), 6)
    return (
        d.select(F.floor(score * 10).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("bucket")
    )


@register(
    "pivot_status_by_segment",
    tags=("agg",),
    oracle="""
    SELECT c.c_mktsegment,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot(): order counts per segment pivoted into one column
    per status. Pivot values are declared explicitly (F/O/P) so Spark skips
    the extra distinct-values job — the scale-correct form."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count("o_orderkey"))
        .orderBy("c_mktsegment")
    )


@register(
    "rolling_active_users",
    tags=("agg", "streaming"),
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
    FROM days d
    JOIN events e
      ON CAST(e.ts AS DATE) BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day ORDER BY day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. Distinct-over-range
    can't ride a window frame, so it's a day-grid range join (the day grid is
    tiny and broadcast; the join fans each event into ≤7 day buckets — at
    100 TB this is the standard dedup-then-fan-out: distinct (day,user)
    first, then the 7-day expansion, keeping the join input minimal)."""
    from tscd_datalake_adapter_spark.functions import persist_corpus

    e = load_table(spark, sf_dir, "events")
    # per-user-day = corpus-volume and consumed twice (the fan-out join
    # side and the day grid) — persist so events scans once
    day_user = persist_corpus(
        e.select(F.col("ts").cast("date").alias("eday"), "user_id").distinct()
    )
    days = day_user.select(F.col("eday").alias("day")).distinct()
    return (
        F.broadcast(days)
        .join(
            day_user,
            (F.col("eday") >= F.date_sub(F.col("day"), 6))
            & (F.col("eday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "active_users_7d"
        )
        .orderBy("day")
    )


@register(
    "approx_percentiles_by_status",
    tags=("agg",),
    # Weak oracle by design: approx_percentile is a sketch (excluded from
    # hash-matching); unit test bounds it against the exact percentiles.
)
def approx_percentiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (t-digest-style sketch): the mergeable fixed-size
    state that replaces exact sorts at 100 TB. Output pairs the sketch
    estimate with the exact value so drift is observable."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias(
                "approx_median"
            ),
            F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias(
                "approx_p90"
            ),
            F.expr("percentile(o_totalprice, 0.9)").alias("exact_p90"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "embedding_cosine_near_dup",
    tags=("llm", "dedup", "similarity"),
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 150),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.v, b.v)
                     / sqrt(list_dot_product(a.v, a.v)
                            * list_dot_product(b.v, b.v)), 6) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.5
    ORDER BY vec_a, vec_b
    """,
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine ≥ 0.5) over a bounded id
    slice — the exact twin that pins the LSH variant's semantics. At corpus
    scale the same predicate runs post-LSH-bucketing instead of post-crossJoin.
    """
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= 0.5)
        .orderBy("vec_a", "vec_b")
    )


@register(
    "pipe_syntax_returnflag_rollup",
    tags=("relational", "sql"),
    defer=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pipe_syntax_returnflag_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The discounted-revenue rollup written in Spark 4's SQL PIPE syntax
    (``|>`` stages: WHERE → AGGREGATE...GROUP BY → SELECT → ORDER BY) —
    the linear-dataflow SQL dialect. Same Catalyst plan as the
    equivalent nested SELECT (pipe stages are sugar, not a different
    executor), which the matching classic-SQL oracle verifies; money
    folds through the repo's DECIMAL(38,6) overflow-safe sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM {li}
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n_items,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(38,6))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items,
                  round(revenue, 6) AS revenue
        |> ORDER BY l_returnflag, l_linestatus
        """,
        li=li,
    )


@register(
    "collation_case_insensitive_group",
    tags=("relational", "sql"),
    defer=True,
    oracle="""
    WITH mixed AS (
        SELECT CASE
                 WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                 WHEN c_custkey % 3 = 1 THEN c_mktsegment
                 ELSE upper(substr(c_mktsegment, 1, 1))
                      || lower(substr(c_mktsegment, 2, 100))
               END AS seg
        FROM customer
    )
    SELECT lower(seg) AS seg_norm,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
    FROM mixed GROUP BY lower(seg) ORDER BY seg_norm
    """,
)
def collation_case_insensitive_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 4 COLLATION: grouping under ``COLLATE UTF8_LCASE`` merges
    case variants WITHOUT rewriting every expression through lower() —
    the engine-level answer to case-insensitive business keys. The
    fixture segments are single-case, so the query first derives three
    deterministic case variants per row; the collated group then
    reunifies them. The group representative under a collation is
    engine-chosen, so the output key is normalized with lower() — the
    pinned semantics are the GROUPING (counts merge) plus the variant
    count per collated group.

    Scale shape: one map-side-combined groupBy on the collated key —
    identical shuffle shape to any string groupBy."""
    c = load_table(spark, sf_dir, "customer")
    mixed = c.select(
        F.when(
            F.col("c_custkey") % 3 == 0, F.lower("c_mktsegment")
        )
        .when(F.col("c_custkey") % 3 == 1, F.col("c_mktsegment"))
        .otherwise(F.initcap(F.lower("c_mktsegment")))
        .alias("seg")
    )
    collated = mixed.select(
        F.expr("seg COLLATE UTF8_LCASE").alias("segc"), F.col("seg")
    )
    return (
        collated.groupBy("segc")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("seg").cast("long").alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("segc").cast("string")).alias("seg_norm"),
            "n",
            "n_case_variants",
        )
        .orderBy("seg_norm")
    )


@register(
    "sql_sugar_groupall_lateral_alias",
    tags=("relational", "sql"),
    defer=True,
    oracle="""
    WITH base AS (
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                   AS qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, n, qty,
           round(qty / n, 6) AS avg_qty,
           round(round(qty / n, 6) * 2.0, 6) AS double_avg_qty
    FROM base ORDER BY l_returnflag, l_linestatus, n, qty
    """,
)
def sql_sugar_groupall_lateral_alias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 3.4/4 SQL ergonomics pinned against a classic-SQL oracle:
    ``GROUP BY ALL`` (group on every non-aggregate select item) +
    ``ORDER BY ALL`` in the aggregate stage, then LATERAL COLUMN ALIAS
    references (``avg_qty`` consumed by ``double_avg_qty`` in the same
    SELECT) in the projection stage. (Referencing a lateral alias inside
    GROUP BY ALL itself is still unsupported — kept as two stages.)
    Same Catalyst plan as the explicit forms; sugar only."""
    li = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        WITH base AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                       AS qty
            FROM {li} GROUP BY ALL
        )
        SELECT l_returnflag, l_linestatus, n, qty,
               round(qty / n, 6) AS avg_qty,
               round(avg_qty * 2.0, 6) AS double_avg_qty
        FROM base ORDER BY ALL
        """,
        li=li,
    )


@register(
    "window_nth_value_frames",
    tags=("relational", "window"),
    defer=True,
    oracle="""
    SELECT o_custkey, o_orderkey,
           nth_value(o_totalprice, 2) OVER w AS second_order_price,
           first_value(o_orderkey) OVER w AS first_key,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
               AS n_orders
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_nth_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` over a running frame — the analytic-window member the
    lag/lead/first/last family left out: each order row sees its
    customer's SECOND-ever order price once (and only once) that order
    has entered the frame, NULL before — positional access into the
    frame, not the partition. Ordered by (date, key) so ties are
    deterministic cross-engine.

    Scale shape: per-customer windows — the partitioned-window class; no
    global window anywhere."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_order_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.count("*")
        .over(Window.partitionBy("o_custkey"))
        .cast("long")
        .alias("n_orders"),
    ).orderBy("o_custkey", "o_orderkey")
