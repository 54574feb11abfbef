"""Source/sink round-trip operators (SURVEY.md §2.2 scans/sinks block).

Each query exercises a real write→read cycle in a fresh temp directory and
produces a result the DuckDB oracle can verify from the original parquet —
so format fidelity (csv/json/partitioned parquet) and the lake adapter's
ingest→list pipeline are inside the hash-checked gate, not just unit tests.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import dec_sum, oracle_dec_sum
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"tscd_{prefix}_")


@register(
    "csv_roundtrip_agg",
    tags=("io",),
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n,
           {oracle_dec_sum('o_totalprice')} AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → CSV (header, explicit schema on re-read) → aggregate. Doubles
    survive CSV because Spark writes round-trippable repr and reads it back
    to the identical bits."""
    path = _tmp("csv")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.option("header", "true")
        .schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .csv(path)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dec_sum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


@register(
    "json_roundtrip_agg",
    tags=("io",),
    oracle=f"""
    SELECT event_type, count(*) AS n,
           {oracle_dec_sum('value')} AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → re-read with explicit schema → aggregate."""
    path = _tmp("json")
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    e.write.mode("overwrite").json(path)
    back = spark.read.schema("event_id long, event_type string, value double").json(
        path
    )
    return (
        back.groupBy("event_type")
        .agg(F.count("*").alias("n"), dec_sum("value").alias("total_value"))
        .orderBy("event_type")
    )


@register(
    "partitioned_write_pruned_read",
    tags=("io",),
    oracle="""
    SELECT CAST(month(o_orderdate) AS BIGINT) AS mo, count(*) AS n
    FROM orders WHERE year(o_orderdate) = 1997
    GROUP BY 1 ORDER BY mo
    """,
)
def partitioned_write_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference R4 write + R5 pruned read: write orders partitioned by
    order year, read back with a partition filter (only the 1997 directory is
    scanned — ``PartitionFilters`` in explain), count by month."""
    path = _tmp("part")
    o = load_table(spark, sf_dir, "orders")
    o.withColumn("order_year", F.year("o_orderdate")).write.mode(
        "overwrite"
    ).partitionBy("order_year").parquet(path)
    back = spark.read.parquet(path).where(F.col("order_year") == 1997)
    return (
        back.groupBy(F.month("o_orderdate").cast("long").alias("mo"))
        .agg(F.count("*").alias("n"))
        .orderBy("mo")
    )


@register(
    "lake_ingest_list_books",
    tags=("io", "ingest"),
    oracle="""
    SELECT DISTINCT CAST(doc_id + 1 AS BIGINT) AS book_id
    FROM documents WHERE doc_id < 20
    ORDER BY book_id
    """,
)
def lake_ingest_list_books(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole lifecycle inside the oracle gate: frame 20
    documents as Gutenberg books, bulk-ingest them through the distributed
    split path (R1+R2+R4), then answer ``listBooks`` (R6) from the written
    lake. The oracle knows the expected id set algebraically."""
    from tscd_datalake_adapter_spark.lake.adapter import LakeAdapter

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    nl = F.lit("\n")
    raw = F.concat(
        F.lit("Header for "),
        F.col("doc_id").cast("string"),
        nl,
        F.lit("*** START OF THE PROJECT GUTENBERG EBOOK D ***"),
        nl,
        F.col("text"),
        nl,
        F.lit("*** END OF THE PROJECT GUTENBERG EBOOK D ***"),
    )
    raw_df = d.select((F.col("doc_id") + 1).alias("book_id"), raw.alias("raw"))
    lake = LakeAdapter(spark, _tmp("lake") + "/lake")
    lake.ingest_raw_df(raw_df, dt.datetime(2026, 1, 1, 12, 0, 0))
    return (
        lake.read().select("book_id").distinct().orderBy("book_id")
    )


@register(
    "orc_roundtrip_agg",
    tags=("io",),
    oracle=f"""
    SELECT l_returnflag, count(*) AS n,
           {oracle_dec_sum('l_extendedprice')} AS total
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC → re-read → aggregate. ORC is the third columnar
    format of the adapter surface (after parquet and the text formats);
    doubles and timestamps round-trip losslessly, which the oracle checks
    from the ORIGINAL parquet — so this hashes the whole write/read cycle,
    not just the aggregate."""
    path = _tmp("orc")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dec_sum("l_extendedprice").alias("total"))
        .orderBy("l_returnflag")
    )


@register(
    "zorder_clustered_read",
    tags=("io", "layout"),
    oracle=f"""
    SELECT o_orderstatus, count(*) AS n,
           {oracle_dec_sum('o_totalprice')} AS total
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 300
      AND o_totalprice < 150000.0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def zorder_clustered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → Z-order-clustered parquet (Morton curve on custkey ×
    totalprice, ``plans.layout.zorder_write``) → 2-D-selective read-back →
    aggregate. The oracle checks content fidelity of the re-layout; the
    clustering quality itself (files skipped per dimension, measured from
    parquet footers) is pinned in ``tests/test_plans.py``."""
    from tscd_datalake_adapter_spark.plans.layout import zorder_write

    path = _tmp("zorder")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    zorder_write(o, "o_custkey", "o_totalprice", path)
    back = spark.read.parquet(path).where(
        F.col("o_custkey").between(100, 300) & (F.col("o_totalprice") < 150000.0)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dec_sum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


@register(
    "bucketed_join_agg",
    tags=("io", "layout"),
    oracle=f"""
    SELECT c_mktsegment, count(*) AS n,
           {oracle_dec_sum('o_totalprice')} AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-pruned co-located join: write both join sides bucketed+sorted
    by the join key (``bucketBy`` tables), then join bucket-to-bucket —
    Spark plans a SortMergeJoin with ZERO shuffle exchanges because matching
    bucket files are already co-partitioned on disk. At 100 TB this is THE
    lever for repeated big-big joins: pay the layout cost once at write
    time, skip the join shuffle on every subsequent query (the zero-Exchange
    property is pinned in tests/test_layout.py).

    The oracle is the plain parquet join — bucketing must be invisible to
    results. (At fixture scale AQE may still choose a broadcast join over
    the bucketed SMJ — also correct; the zero-Exchange SMJ property itself
    is pinned with broadcasts disabled in tests/test_layout.py.)
    """
    import hashlib

    from tscd_datalake_adapter_spark.plans.layout import write_bucketed

    # Deterministic per-sf_dir names (Python hash() is PYTHONHASHSEED-
    # randomized per process — it would mint fresh table names every run
    # and mode("overwrite") would never reclaim the old copies).
    uid = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    t_o, t_c = f"b_orders_{uid}", f"b_customer_{uid}"
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        t_o,
        ("o_custkey",),
        n_buckets=8,
    )
    write_bucketed(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        t_c,
        ("c_custkey",),
        n_buckets=8,
    )
    o, c = spark.table(t_o), spark.table(t_c)
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), dec_sum("o_totalprice").alias("total"))
        .orderBy("c_mktsegment")
    )


@register(
    "salted_join_agg",
    tags=("io", "layout"),
    oracle=f"""
    SELECT n_name, count(*) AS n,
           {oracle_dec_sum('c_acctbal')} AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join as a registered, oracle-checked query: the
    build side is replicated across ``n_salts`` salt values and the probe
    side salted uniformly, so a pathologically hot key (the null-key or
    default-value hub every real fact table has) spreads over ``n_salts``
    partitions instead of melting one executor. The salt is internal —
    results must be IDENTICAL to the plain join, which is exactly what the
    oracle asserts. (Broadcast is disabled for the salted join so the
    mechanism itself, not a broadcast rewrite, is what executes.)
    """
    from tscd_datalake_adapter_spark.plans.layout import salted_join

    c = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    # merge hint on the probe side only: it survives to the salted equi-join
    # and keeps AQE from broadcasting the replicated build side, while the
    # build side's internal crossJoin (no equi keys) stays hint-free.
    joined = salted_join(c.hint("merge"), n, "c_nationkey")
    return (
        joined.groupBy("n_name")
        .agg(F.count("*").alias("n"), dec_sum("c_acctbal").alias("total_bal"))
        .orderBy("n_name")
    )


@register(
    "schema_evolution_merged_read",
    tags=("io",),
    oracle="""
    SELECT coalesce(CASE WHEN o_orderkey % 3 = 0 THEN NULL
                         ELSE o_orderpriority END, '<absent>') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS total
    FROM orders GROUP BY 1 ORDER BY priority
    """,
)
def schema_evolution_merged_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through a physical write + mergeSchema read
    (SURVEY §2.2 'schema evolution', promoted from test-only to hard
    signal): an old-schema file (orderkey, totalprice) and a new-schema
    file (+ o_orderpriority) land in the same dataset; the merged read
    must union the schemas and null-fill the legacy rows. The aggregate
    over the merged frame is checked against the oracle's algebraic
    statement of the same split over the source table — if the merge
    dropped rows, mis-null-filled, or mis-aligned columns by position,
    the counts or decimal totals diverge.

    Scale note: mergeSchema costs a footer read per file at planning
    time; production lakes pin the merged schema in a catalog instead —
    the read path exercised here is the migration-window behavior."""
    path = _tmp("evolve")
    o = load_table(spark, sf_dir, "orders")
    o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(f"{path}/v1")
    o.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{path}/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/v1", f"{path}/v2"
    )
    return (
        merged.groupBy(
            F.coalesce("o_orderpriority", F.lit("<absent>")).alias("priority")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("priority")
    )
