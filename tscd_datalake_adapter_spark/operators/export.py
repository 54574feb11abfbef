"""Export / indexing operators: the "ship a training set" tier.

Three primitives a 100-TB corpus export needs that are easy to get wrong
at scale, each implemented in its shuffle-safe form and oracle-checked:

- ``stable_row_ids`` — global contiguous sequence numbers WITHOUT the
  classic scale-killer (``row_number() OVER (ORDER BY ...)`` with an empty
  partition spec moves the whole table to one partition). Two-phase:
  fixed-width key-range buckets -> per-bucket counts -> tiny cumulative
  offset table (broadcast) -> per-bucket row_number + offset.
- ``balanced_shard_export_plan`` — deterministic shard assignment
  (h60-hash mod N, partition-invariant) with a per-shard balance audit,
  the planning query behind ``df.write`` of N balanced output shards.
- ``ecdf_normalize_quality`` — corpus-wide quantile normalization of a
  per-document feature via a binned ECDF: bin counts -> tiny cumulative
  table -> broadcast join back. The naive form (``percent_rank()`` over
  the whole corpus) is a global window over base rows; this form's only
  global window runs over the aggregated bin table.

Beyond-reference scope (the reference's surface is ingestion only:
``IngestionService.java:40-140``); these belong to the LLM-training-data
tier the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tscd_datalake_adapter_spark.functions import h60, oracle_h60
from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table

ROW_ID_BUCKET = 4096
N_SHARDS = 16
ECDF_BIN = 64


def assign_stable_row_ids(
    df: DataFrame, key: str, bucket_width: int = ROW_ID_BUCKET
) -> DataFrame:
    """Add ``rid``: global contiguous 0-based ids ordered by ``key`` (a
    unique numeric column), without a single-partition window. See
    ``stable_row_ids`` for the distributed derivation; ids are
    partition-invariant because the buckets are fixed key ranges, not
    sampled ``repartitionByRange`` boundaries."""
    b = df.withColumn("__bucket", F.expr(f"{key} div {bucket_width}"))
    counts = b.groupBy("__bucket").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offsets = counts.withColumn(
        "__offset", F.sum("__n").over(w_off) - F.col("__n")
    ).drop("__n")
    w_in = Window.partitionBy("__bucket").orderBy(key)
    return (
        b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "rid",
            (F.col("__offset") + F.row_number().over(w_in) - F.lit(1)).cast(
                "long"
            ),
        )
        .drop("__bucket", "__offset")
    )


@register(
    "stable_row_ids",
    tags=("export", "scale"),
    oracle="""
    WITH ids AS (
        SELECT o_orderkey,
               CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT)
                   AS rid
        FROM orders
    )
    SELECT rid, o_orderkey FROM ids
    WHERE o_orderkey % 100 = 0 ORDER BY rid
    """,
)
def stable_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global contiguous 0-based ids ordered by a unique key, scale-safely.

    The textbook ``row_number() OVER (ORDER BY o_orderkey)`` plans a
    single-partition window over the whole table — the exact pattern
    ``plans.unpartitioned_windows_over_unaggregated_input`` exists to
    catch. The distributed equivalence used here:

    1. ``bucket = o_orderkey div 4096`` — fixed-width, order-preserving,
       deterministic (no sampled range boundaries, unlike
       ``repartitionByRange``, so ids are partition-invariant).
    2. per-bucket counts (map-side partial agg, tiny result),
    3. cumulative offsets over the bucket table (global window, but over
       an AGGREGATED frame — bounded by key-domain/4096 rows),
    4. broadcast the offset table back; ``rid = offset + row_number
       WITHIN bucket - 1`` (window partitioned by bucket).

    Only a key-range sample is emitted so the driver compare stays small;
    every emitted rid must equal the oracle's global row_number, which
    fails if any bucket's offset or intra-bucket order is off."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    ids = assign_stable_row_ids(o, "o_orderkey")
    return (
        ids.where(F.col("o_orderkey") % 100 == 0)
        .select("rid", "o_orderkey")
        .orderBy("rid")
    )


@register(
    "balanced_shard_export_plan",
    tags=("export", "scale"),
    oracle=f"""
    WITH s AS (
        SELECT {oracle_h60("'shard:' || doc_id")} % {N_SHARDS} AS shard,
               n_chars
        FROM documents
    ),
    a AS (
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM s GROUP BY shard
    )
    SELECT shard, n_docs, total_chars,
           round(n_docs / (sum(n_docs) OVER ()), 6) AS share
    FROM a ORDER BY shard
    """,
)
def balanced_shard_export_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic export sharding + balance audit: assign each document
    to ``h60('shard:'||doc_id) mod 16`` and report per-shard doc counts,
    byte volume, and share of the corpus. This is the dry-run behind
    ``df.repartition(N, shard_col).write`` — content-hash assignment is
    partition-invariant and reproducible across runs/engines (unlike
    ``monotonically_increasing_id``-derived schemes), and the share
    column is the skew check that decides whether N needs re-picking.

    Scale shape: one map-side-combined aggregation to 16 rows; the share
    window runs over the aggregated 16-row frame."""
    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        F.pmod(
            h60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(N_SHARDS),
        ).alias("shard"),
        "n_chars",
    )
    a = s.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return a.select(
        "shard",
        "n_docs",
        "total_chars",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w_all), 6).alias(
            "share"
        ),
    ).orderBy("shard")


@register(
    "ecdf_normalize_quality",
    tags=("export", "scale"),
    oracle=f"""
    WITH b AS (
        SELECT n_chars // {ECDF_BIN} AS bin, count(*) AS n
        FROM documents GROUP BY 1
    ),
    c AS (
        SELECT bin, sum(n) OVER (ORDER BY bin) AS cum FROM b
    ),
    t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM documents)
    SELECT d.doc_id, d.n_chars,
           round(c.cum / t.total, 6) AS ecdf_q
    FROM documents d
    JOIN c ON (d.n_chars // {ECDF_BIN}) = c.bin
    CROSS JOIN t
    WHERE d.doc_id % 7 = 0
    ORDER BY d.doc_id
    """,
)
def ecdf_normalize_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global quantile normalization of ``n_chars`` without a
    corpus-global window: quantize the feature to 64-char bins, aggregate
    bin counts (tiny), take the running total over the bin table (global
    window over an AGGREGATED frame — bounded by the value domain), and
    broadcast-join the per-bin ECDF back onto documents. Each document
    gets ``P(n_chars' <= ceil_bin(n_chars))`` — the standard feature
    transform before mixing quality signals on incomparable scales.

    The ECDF is computed over the FULL corpus; only a doc_id sample is
    emitted for the driver compare. ``percent_rank() OVER (ORDER BY
    n_chars)`` would give the per-row exact rank but plans the whole
    corpus into one partition; the binned form trades <=1-bin resolution
    for a plan with no unbounded shuffle-to-one."""
    from tscd_datalake_adapter_spark.functions import checkpoint_bounded

    d = load_table(spark, sf_dir, "documents")
    # the bin histogram is value-domain bounded and feeds BOTH the running
    # total and the corpus count (total = Σ bin counts — no third scan of
    # documents; the range_partition_balance pattern)
    bins = checkpoint_bounded(
        d.groupBy(F.expr(f"n_chars div {ECDF_BIN}").alias("bin")).agg(
            F.count("*").alias("n")
        ),
        bound="one row per 64-char n_chars bin",
    )
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = bins.withColumn("cum", F.sum("n").over(w_cum)).drop("n")
    tot = bins.agg(F.sum("n").cast("double").alias("total"))
    sample = d.where(F.col("doc_id") % 7 == 0).withColumn(
        "bin", F.expr(f"n_chars div {ECDF_BIN}")
    )
    return (
        sample.join(F.broadcast(cdf), "bin")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_chars",
            F.round(F.col("cum") / F.col("total"), 6).alias("ecdf_q"),
        )
        .orderBy("doc_id")
    )


@register(
    "range_partition_balance",
    tags=("export", "layout"),
    defer=True,
    oracle=f"""
    WITH smp AS (
        SELECT o_totalprice AS p
        FROM orders
        WHERE {oracle_h60("'rp:' || o_orderkey")} % 100 < 3
    ),
    hist AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM smp GROUP BY p),
    ranked AS (
        SELECT p, c,
               sum(c) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER () AS n
        FROM hist
    ),
    bounds AS (
        SELECT i.i, r.p AS b
        FROM (SELECT unnest(range(1, 16)) AS i) i
        JOIN ranked r ON r.cum - r.c < (i.i * r.n) // 16
                     AND (i.i * r.n) // 16 <= r.cum
    ),
    ivals AS (
        SELECT i AS pid,
               lag(b) OVER (ORDER BY i) AS lo,
               b AS hi
        FROM bounds
        UNION ALL
        SELECT 16, max(b), NULL FROM bounds
    ),
    assigned AS (
        SELECT v.pid, CAST(count(*) AS BIGINT) AS n_rows
        FROM orders o
        JOIN ivals v
          ON (v.lo IS NULL OR o.o_totalprice > v.lo)
         AND (v.hi IS NULL OR o.o_totalprice <= v.hi)
        GROUP BY v.pid
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders)
    SELECT CAST(a.pid AS BIGINT) AS partition_id, a.n_rows,
           round(a.n_rows * 16.0 / t.t, 6) AS balance_ratio
    FROM assigned a CROSS JOIN tot t
    ORDER BY partition_id
    """,
)
def range_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner planning audit — the global-sort primitive: pick
    16 partition boundaries from a deterministic 3% hash sample's exact
    sample-percentiles (rank (i·n) DIV 16), then measure how many real
    rows each (lo, hi] range receives and its balance ratio (1.0 =
    perfectly even). This is what ``orderBy`` does internally at scale
    (RangePartitioner reservoir sample → boundaries); making it a
    registered query turns "would the 100 TB sort be balanced?" into an
    auditable artifact, the same move as ``join_key_skew_audit`` for
    shuffle keys.

    Scale shape: the sample is a pushed-down filter (h60 mod — no
    shuffle); boundary ranks are read off a per-VALUE histogram of the
    sample (the ``length_percentile_filter`` exact-percentile pattern:
    the cumulative-count window runs over the aggregated value domain,
    never sample rows — rank R lives at the value whose cumulative range
    covers it); the assignment is a 16-row BROADCAST interval join
    against the fact table (one pass, no repartition of orders)."""
    o = load_table(spark, sf_dir, "orders")
    smp = o.where(
        h60(F.concat(F.lit("rp:"), F.col("o_orderkey").cast("string"))) % 100
        < 3
    ).select(F.col("o_totalprice").alias("p"))
    hist = smp.groupBy("p").agg(F.count("*").cast("long").alias("c"))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = hist.select(
        "p",
        "c",
        F.sum("c")
        .over(
            Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    idx = spark.range(1, 16).select(F.col("id").alias("i"))
    rk = F.floor((F.col("i") * F.col("n")) / 16).cast("long")
    from tscd_datalake_adapter_spark.functions import checkpoint_bounded

    bounds = checkpoint_bounded(
        idx.join(
            ranked,
            (F.col("cum") - F.col("c") < rk) & (rk <= F.col("cum")),
        ).select("i", F.col("p").alias("b")),
        bound="15 boundary rows (one per internal partition edge)",
    )  # consumed by BOTH ivals branches — uncut, each re-ran the sample pass
    ivals = (
        bounds.select(
            F.col("i").alias("pid"),
            F.lag("b").over(Window.orderBy("i")).alias("lo"),
            F.col("b").alias("hi"),
        )
        .unionByName(
            bounds.agg(
                F.lit(16).alias("pid"),
                F.max("b").alias("lo"),
                F.lit(None).cast("double").alias("hi"),
            )
        )
    )
    assigned = (
        o.join(
            F.broadcast(ivals),
            (F.col("lo").isNull() | (F.col("o_totalprice") > F.col("lo")))
            & (F.col("hi").isNull() | (F.col("o_totalprice") <= F.col("hi"))),
        )
        .groupBy("pid")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    # the 16 intervals PARTITION the value domain, so the total is the sum
    # of the interval counts — a window over the 16-row aggregate, not a
    # fourth scan of orders (audited r7: 4 scans -> 2, sample + fact)
    return (
        assigned.select(
            F.col("pid").cast("long").alias("partition_id"),
            "n_rows",
            F.round(
                F.col("n_rows") * 16.0 / F.sum("n_rows").over(w_all), 6
            ).alias("balance_ratio"),
        )
        .orderBy("partition_id")
    )
