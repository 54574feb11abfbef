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

    # post-shuffle frame: the guard must refuse — the plan already has an
    # Exchange, and reading .rdd there would materialize AQE query stages
    # (real jobs) with a pre-AQE count that can differ from the executed
    # one. spread() returns the frame untouched without touching .rdd.
    shuffled = (
        spark.range(0, 1000, 1, numPartitions=4)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
    )
    assert "Exchange" in shuffled._jdf.queryExecution().executedPlan().toString()
    assert spread(shuffled) is shuffled


def test_hbos_grouping_sets_matches_separate_histograms(spark):
    """The ONE GROUPING SETS pass behind hbos_outlier_scores must yield
    bit-identical histograms and total to four separate groupBys + a
    count, on synthetic data with empty-ish and skewed feature values."""
    import random

    rng = random.Random(11)
    rows = [
        (
            i,
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
            rng.choice(["F", "O"]),
            rng.randint(0, 5),
            rng.randint(1, 12),
        )
        for i in range(500)
    ]
    b = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_orderstatus string,"
        " price_bucket long, mth long",
    )
    hh = b.groupingSets(
        [
            [],
            [F.col("price_bucket")],
            [F.col("o_orderpriority")],
            [F.col("o_orderstatus")],
            [F.col("mth")],
        ],
        "price_bucket",
        "o_orderpriority",
        "o_orderstatus",
        "mth",
    ).agg(
        F.count("*").cast("long").alias("c"),
        F.grouping_id().cast("long").alias("gid"),
    )
    got = {
        15: {"n": r["c"] for r in hh.where(F.col("gid") == 15).collect()},
        7: {r["price_bucket"]: r["c"] for r in hh.where(F.col("gid") == 7).collect()},
        11: {r["o_orderpriority"]: r["c"] for r in hh.where(F.col("gid") == 11).collect()},
        13: {r["o_orderstatus"]: r["c"] for r in hh.where(F.col("gid") == 13).collect()},
        14: {r["mth"]: r["c"] for r in hh.where(F.col("gid") == 14).collect()},
    }
    assert got[15] == {"n": 500}
    assert got[7] == {
        r["price_bucket"]: r["c"]
        for r in b.groupBy("price_bucket").agg(F.count("*").cast("long").alias("c")).collect()
    }
    assert got[11] == {
        r["o_orderpriority"]: r["c"]
        for r in b.groupBy("o_orderpriority").agg(F.count("*").cast("long").alias("c")).collect()
    }
    assert got[13] == {
        r["o_orderstatus"]: r["c"]
        for r in b.groupBy("o_orderstatus").agg(F.count("*").cast("long").alias("c")).collect()
    }
    assert got[14] == {
        r["mth"]: r["c"]
        for r in b.groupBy("mth").agg(F.count("*").cast("long").alias("c")).collect()
    }


def test_fd_audit_tagged_explode_matches_per_candidate_loop(spark):
    """functional_dependency_audit's single-plan form (GROUPING SETS +
    explode-tagged candidates) must equal the straightforward
    one-aggregation-per-candidate loop, on synthetic data with exact FDs,
    near-FDs, ties, and NULL-free key candidates."""
    import random

    from tscd_datalake_adapter_spark.operators.mlprep import _FD_CANDIDATES

    rng = random.Random(23)
    rows = [
        (i, rng.randint(0, 6), rng.choice(["A", "B", "C"]))
        for i in range(300)
    ]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string"
    )

    # straightforward loop (the pre-rewrite formulation)
    expected = {}
    for lhs, rhs in _FD_CANDIDATES:
        pair = c.groupBy(lhs, rhs).agg(F.count("*").alias("val_n"))
        grp = pair.groupBy(lhs).agg(
            F.sum("val_n").cast("long").alias("grp_n"),
            F.max("val_n").cast("long").alias("grp_max"),
        )
        r = grp.agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("grp_n").cast("long").alias("n_rows"),
            (F.sum("grp_n") - F.sum("grp_max")).cast("long").alias("n_violations"),
        ).collect()[0]
        expected[f"{lhs} -> {rhs}"] = (r.n_keys, r.n_rows, r.n_violations)

    # the shipped single-plan form, replicated inline on the same frame
    all_cols = ("c_nationkey", "c_mktsegment", "c_custkey")
    sets = []
    for lhs, rhs in _FD_CANDIDATES:
        key = frozenset((lhs, rhs))
        if key not in [frozenset(s) for s in sets]:
            sets.append(tuple(col for col in all_cols if col in key))

    def gid_of(colset):
        return sum(
            1 << (len(all_cols) - 1 - i)
            for i, col in enumerate(all_cols)
            if col not in colset
        )

    pairs = c.groupingSets(
        [[F.col(col) for col in s] for s in sets], *all_cols
    ).agg(
        F.count("*").alias("val_n"),
        F.grouping_id().cast("long").alias("gid"),
    )
    cand_structs = [
        F.when(
            F.col("gid") == gid_of(frozenset((lhs, rhs))),
            F.struct(
                F.lit(f"{lhs} -> {rhs}").alias("dependency"),
                F.col(lhs).cast("string").alias("lhs_val"),
            ),
        )
        for lhs, rhs in _FD_CANDIDATES
    ]
    tagged = pairs.select(
        "val_n",
        F.explode(F.filter(F.array(*cand_structs), lambda s: s.isNotNull())).alias("cand"),
    ).select("val_n", "cand.dependency", "cand.lhs_val")
    grp = tagged.groupBy("dependency", "lhs_val").agg(
        F.sum("val_n").cast("long").alias("grp_n"),
        F.max("val_n").cast("long").alias("grp_max"),
    )
    got = {
        r.dependency: (r.n_keys, r.n_rows, r.n_violations)
        for r in grp.groupBy("dependency")
        .agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("grp_n").cast("long").alias("n_rows"),
            (F.sum("grp_n") - F.sum("grp_max")).cast("long").alias("n_violations"),
        )
        .collect()
    }
    assert got == expected
