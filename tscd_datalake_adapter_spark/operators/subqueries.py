"""Subqueries and additional TPC-H query shapes (SURVEY.md §2.2 widening).

Catalyst decorrelates all of these into joins/aggregates — no manual
rewriting. Each shape is a classic TPC-H pattern re-expressed on the fixture
schema with the engine's determinism recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import (
    dec_avg,
    dec_sum,
    oracle_dec_avg,
    oracle_dec_sum,
)
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table, register_views


@register(
    "scalar_subquery_above_avg",
    tags=("subquery",),
    oracle=f"""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT {oracle_dec_avg('o_totalprice')} FROM orders)
    ORDER BY o_orderkey
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders pricier than 2× the mean. The
    threshold aggregate is a broadcast single-row join — one extra pass over
    orders, no shuffle of the fact side."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(
            F.broadcast(o.agg((2 * dec_avg("o_totalprice")).alias("threshold")))
        )
        .where(F.col("o_totalprice") > F.col("threshold"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy("o_orderkey")
    )


@register(
    "correlated_exists_urgent",
    tags=("subquery",),
    oracle="""
    SELECT o.o_orderkey
    FROM orders o
    WHERE o.o_orderpriority = '1-URGENT'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    ORDER BY o.o_orderkey
    """,
)
def correlated_exists_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape), via SQL so Catalyst's subquery
    decorrelation is exercised (it plans a left-semi join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey
        FROM orders o
        WHERE o.o_orderpriority = '1-URGENT'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        ORDER BY o.o_orderkey
        """
    )


@register(
    "in_subquery_big_parts",
    tags=("subquery",),
    oracle=f"""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey
        HAVING {oracle_dec_sum('l_quantity')} > 400
    )
    ORDER BY p_partkey
    """,
)
def in_subquery_big_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with a HAVING aggregate (TPC-H Q18 shape)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem
            GROUP BY l_partkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 400
        )
        ORDER BY p_partkey
        """
    )


@register(
    "correlated_scalar_avg_qty",
    tags=("subquery",),
    oracle=f"""
    SELECT l.l_partkey,
           {oracle_dec_sum('l.l_extendedprice')} AS small_qty_revenue
    FROM lineitem l
    WHERE l.l_quantity < 0.5 * (
        SELECT {oracle_dec_avg('l2.l_quantity')}
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    HAVING count(*) >= 3
    ORDER BY l.l_partkey
    """,
)
def correlated_scalar_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery (TPC-H Q17 shape): lineitems
    below half their part's average quantity."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_partkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS small_qty_revenue
        FROM lineitem l
        WHERE l.l_quantity < 0.5 * (
            SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                   / count(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
        HAVING count(*) >= 3
        ORDER BY l.l_partkey
        """
    )


@register(
    "conditional_agg_shipmodes",
    tags=("agg",),
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def conditional_agg_shipmodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional (CASE-guarded) counting inside an agg."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    hot = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hot, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hot, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "promo_revenue_ratio",
    tags=("agg",),
    oracle=f"""
    SELECT round(
        100.0 * {oracle_dec_sum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
        / {oracle_dec_sum('l_extendedprice * (1 - l_discount)')}, 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio over lineitem⋈part.
    Part scales with SF — no forced broadcast; AQE picks the strategy."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(100.0 * dec_sum(promo_rev) / dec_sum(rev), 6).alias("promo_pct")
    )


@register(
    "grouping_sets_sql",
    tags=("agg",),
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(CAST(year(l_shipdate) AS VARCHAR), 'ALL') AS ship_year,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
    ORDER BY returnflag, ship_year
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via spark.sql (rollup/cube's general form)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(CAST(year(l_shipdate) AS STRING), 'ALL') AS ship_year,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (year(l_shipdate)), ())
        ORDER BY returnflag, ship_year
        """
    )


@register(
    "not_in_suppliers",
    tags=("subquery", "set"),
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey NOT IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_returnflag = 'A' AND l_quantity > 49 AND l_discount > 0.05
    )
    ORDER BY s_suppkey
    """,
)
def not_in_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN anti-join shape (TPC-H Q16 flavor), planned as a REGULAR
    left-anti join — Spark's native NOT IN plan is a null-aware anti-join
    (NAAJ) whose only physical strategy is broadcasting the subquery side
    (no threshold saves you, and the build grows with the supplier
    dimension), so at 100 TB the scale-safe plan is this rewrite.

    NOT IN's three-valued NULL semantics are reproduced exactly, not
    assumed away, so the rewrite is valid for ANY input (not just the
    NULL-free fixture):

    - probe key NULL        → ``NULL NOT IN (non-empty set)`` is never
      TRUE → handled by the ``s_suppkey IS NOT NULL`` branch;
    - any build key NULL    → the whole predicate is never TRUE
      → gated by the 1-row ``n_nulls = 0`` scalar;
    - build set EMPTY       → ``NOT IN ()`` is TRUE for every probe row
      (even NULL keys) → the ``n_build = 0`` branch keeps everything
      (the anti join against an empty side already kept all rows).

    The 1-row stats scalar rides a broadcast nested loop of exactly one
    row (bounded by construction); the anti join itself is a plain
    equi-join Catalyst can shuffle OR broadcast by size — the NAAJ form
    stays registered as ``not_in_suppliers_naaj_sql`` for the SQL-surface
    demo. Pinned NAAJ-free in tests/test_plans.py."""
    from tscd_datalake_adapter_spark.sources import load_table

    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    build = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_returnflag") == "A")
            & (F.col("l_quantity") > 49)
            & (F.col("l_discount") > 0.05)
        )
        .select("l_suppkey")
    )
    stats = build.agg(
        F.count(F.lit(1)).alias("n_build"),
        F.count_if(F.col("l_suppkey").isNull()).alias("n_nulls"),
    )
    keys = build.where(F.col("l_suppkey").isNotNull()).distinct()
    return (
        supplier.join(
            keys, supplier.s_suppkey == keys.l_suppkey, "left_anti"
        )
        .crossJoin(F.broadcast(stats))
        .where(
            (F.col("n_build") == 0)
            | ((F.col("n_nulls") == 0) & F.col("s_suppkey").isNotNull())
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "not_in_suppliers_naaj_sql",
    tags=("subquery", "set", "sql-demo"),
    defer=True,
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey NOT IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_returnflag = 'A' AND l_quantity > 49 AND l_discount > 0.05
    )
    ORDER BY s_suppkey
    """,
)
def not_in_suppliers_naaj_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal SQL NOT IN surface (API-parity demo): Spark plans this
    as a null-aware anti-join whose build side is broadcast
    UNCONDITIONALLY — no non-broadcast NAAJ strategy exists. The DISTINCT
    inside the subquery is load-bearing (it shrinks the build from
    |filtered lineitem| to |distinct suppliers|; set membership ⇒
    identical result), but the build still grows with the supplier
    dimension — the scale-safe primary plan is the provable-null-safety
    rewrite in :func:`not_in_suppliers`."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey NOT IN (
            SELECT DISTINCT l_suppkey FROM lineitem
            WHERE l_returnflag = 'A' AND l_quantity > 49 AND l_discount > 0.05
        )
        ORDER BY s_suppkey
        """
    )


@register(
    "top_customers_by_phone_prefix",
    tags=("subquery",),
    oracle=f"""
    SELECT substr(c_name, 10, 2) AS name_bucket,
           count(*) AS n_customers,
           {oracle_dec_sum('c_acctbal')} AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT {oracle_dec_avg('c_acctbal')}
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
    GROUP BY substr(c_name, 10, 2)
    ORDER BY name_bucket
    """,
)
def top_customers_by_phone_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance-above-average customers with no
    orders, bucketed by a name substring (the fixture's analogue of the
    phone-country-code bucket)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT substring(c_name, 10, 2) AS name_bucket,
               count(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                                  / count(c_acctbal)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
        GROUP BY substring(c_name, 10, 2)
        ORDER BY name_bucket
        """
    )
