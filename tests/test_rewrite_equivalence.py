"""Equivalence pins for the round-6 plan rewrites: each optimized form is
asserted EQUAL to its straightforward (pre-rewrite) formulation on
deterministic synthetic data — so the rewrites stay refactors, never
semantic changes. Complements the DuckDB oracles (which pin against a
second engine) with an in-engine old-vs-new check on inputs the fixtures
don't cover (ties, empty groups, boundary buckets)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _docs_df(spark, n=40, seed=7):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60))))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_60agg_matches_explode_form(spark):
    """The one-groupBy 60-conditional-aggregate SimHash must equal the
    original tokens x 60-bit-position explode + per-bit shuffle form."""
    from tscd_datalake_adapter_spark.functions import h60
    from tscd_datalake_adapter_spark.operators.dedup import simhash_of

    docs = _docs_df(spark)
    new = {r.doc_id: r.simhash for r in simhash_of(docs).collect()}

    tok_counts = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", h60("tok"))
    )
    bits = tok_counts.select(
        "doc_id",
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
    ).withColumn(
        "contrib",
        F.when(
            F.expr("shiftright(h, cast(bit as int)) & 1") == 1, F.col("cnt")
        ).otherwise(-F.col("cnt")),
    )
    per_bit = bits.groupBy("doc_id", "bit").agg(F.sum("contrib").alias("s"))
    old = {
        r.doc_id: r.simhash
        for r in per_bit.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0,
                    F.expr("shiftleft(cast(1 as bigint), cast(bit as int))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
        .collect()
    }
    assert new == old


def test_two_level_cumulative_matches_single_window(spark):
    """weighted_median's blocked prefix sum must give the same cumulative
    counts (hence the same median) as the single per-flag window,
    including ties on cell values and block-boundary cells."""
    rng = random.Random(11)
    rows = [
        (rng.choice("ABC"), rng.randint(0, 5_000_000), rng.randint(1, 9))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "flag string, cents long, w long")
    hist = (
        df.groupBy("flag", "cents")
        .agg(F.sum("w").cast("long").alias("w"))
        .withColumn("coarse", F.expr("cents DIV 1000000"))
    )
    # single-window reference
    wc = Window.partitionBy("flag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = {
        (r.flag, r.cents): r.c
        for r in hist.select(
            "flag", "cents", F.sum("w").over(wc).alias("c")
        ).collect()
    }
    # blocked form (the weighted_median_by_flag shape)
    wf = Window.partitionBy("flag", "coarse").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fine = hist.select(
        "flag", "coarse", "cents", F.sum("w").over(wf).alias("cw")
    )
    wb = Window.partitionBy("flag").orderBy("coarse").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = (
        hist.groupBy("flag", "coarse")
        .agg(F.sum("w").cast("long").alias("bw"))
        .select(
            "flag",
            "coarse",
            F.coalesce(F.sum("bw").over(wb), F.lit(0)).alias("off"),
        )
    )
    got = {
        (r.flag, r.cents): r.c
        for r in fine.join(off, ["flag", "coarse"])
        .select("flag", "cents", (F.col("cw") + F.col("off")).alias("c"))
        .collect()
    }
    assert got == ref


def test_histogram_derived_moments_match_row_level(spark):
    """Brown-Forsythe's cell-weighted deviation moments (n_v-weighted over
    the (seg, v) histogram) must equal the raw per-row aggregation."""
    rng = random.Random(23)
    rows = [
        (rng.choice(("X", "Y")), rng.randint(-50, 50)) for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "seg string, v long")
    med = {"X": 3, "Y": -2}  # any fixed per-group reference points
    meddf = spark.createDataFrame(list(med.items()), "seg string, med long")

    raw = {
        r.seg: (r.ng, r.sz, r.sz2)
        for r in df.join(meddf, "seg")
        .select("seg", F.abs(F.col("v") - F.col("med")).alias("z"))
        .groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("ng"),
            F.sum("z").cast("long").alias("sz"),
            F.sum(F.col("z") * F.col("z")).cast("long").alias("sz2"),
        )
        .collect()
    }
    hist = df.groupBy("seg", "v").agg(F.count("*").cast("long").alias("n_v"))
    cells = {
        r.seg: (r.ng, r.sz, r.sz2)
        for r in hist.join(meddf, "seg")
        .select("seg", "n_v", F.abs(F.col("v") - F.col("med")).alias("z"))
        .groupBy("seg")
        .agg(
            F.sum("n_v").cast("long").alias("ng"),
            F.sum(F.col("n_v") * F.col("z")).cast("long").alias("sz"),
            F.sum(F.col("n_v") * F.col("z") * F.col("z"))
            .cast("long")
            .alias("sz2"),
        )
        .collect()
    }
    assert cells == raw


def test_spread_is_identity_when_already_split(spark):
    """The spread() scale guard: a frame whose partition count already
    meets the session parallelism must come back UNCHANGED (same plan, no
    round-robin exchange) — on a well-split cluster scan the helper is a
    literal no-op, not a full-table shuffle."""
    from tscd_datalake_adapter_spark.functions import spread

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, numPartitions=target + 2)
    assert spread(wide) is wide

    narrow = spark.range(0, 1000, 1, numPartitions=1)
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == target
    # and values survive the round-robin untouched
    assert sorted(r.id for r in out.collect()) == list(range(1000))
