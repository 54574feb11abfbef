"""Scale-stress bench: run the headline set plus the most expensive
registry queries at BOTH sf0.1 and a 10x local sf1 fixture
(scripts/gen_stress_fixture.py) in one session, and report per-query
scaling ratios (r8 verdict item 7).

Interpretation: the fixture grows 10x, so a linear operator should show a
ratio well under ~10 (fixed per-query overheads — session, planning,
shuffle setup — amortize), and anything much beyond 10x is a super-linear
constant factor hiding behind small data. Queries that are
SIZE-INDEPENDENT by construction (bounded slices, fixed iteration tables)
legitimately ratio near 1. Both scale runs happen back-to-back in one
process, so machine-state drift cancels out of the ratio; the absolute
numbers also carry the median-of-5 CPU probes.

Round 10 (r9 verdict item 5): when an sf10 fixture exists
(``scripts/gen_stress_fixture.py --scale 10``; env
``SPARK_GRAFT_STRESS10_DIR``, default ``.stress/sf10``), the headline
set plus the three steepest sf1 ratios (``STEEP3``) also run at sf10 —
one more decade tells whether those curves flatten (linear-dominant,
fine) or compound (a hidden super-linear term).

Usage: python scripts/bench_stress.py [--out BENCH_STRESS_rN.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_probe_median  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_STRESS_DIR", "/root/repo/.stress/sf1")
SF10 = os.environ.get(
    "SPARK_GRAFT_STRESS10_DIR", "/root/repo/.stress/sf10"
)

# the three steepest sf1/sf0.1 ratios from BENCH_STRESS_r09 — the
# queries whose next decade (sf10) decides linear vs super-linear
STEEP3 = [
    "naive_bayes_lang_confusion",
    "zorder_clustered_read",
    "poisson_bootstrap_ci",
]

# r11 (r10 verdict item 7): the 10 most expensive registry queries per
# BENCH_FAMILIES_r10 also get the sf10 decade — the bounded-iteration /
# construction-amortization arguments their docstrings make are now
# measured across two decades, not asserted
TOP10_SF10 = [
    "iceberg_lite_transform_pruning",
    "croston_intermittent_forecast",
    "logistic_regression_returnflag",
    "pq_adc_topk",
    "markov_removal_attribution",
    "image_dedup_clusters",
    "iceberg_lite_partitions_meta",
    "lake_merge_books_log",
    "fuzzy_dedup_keep_longest",
    "pca_top_component_power",
]

# the 15 most expensive registry queries per BENCH_FAMILIES_r08
TOP15 = [
    "logistic_regression_returnflag",
    "croston_intermittent_forecast",
    "markov_removal_attribution",
    "naive_bayes_lang_confusion",
    "poisson_bootstrap_ci",
    "pq_adc_topk",
    "image_dedup_clusters",
    "pca_top_component_power",
    "fuzzy_dedup_keep_longest",
    "market_basket_lift_topk",
    "corr_quantity_price",
    "zorder_clustered_read",
    "dedup_clusters",
    "mad_outlier_days",
    "approx_count_distinct_custkeys",
]


def main() -> int:
    out_path = "BENCH_STRESS_r11.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.operators import load_all

    spark = get_spark(
        "tscd-stress",
        master="local[32]",
        conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    names = [n for n, s in registry.items() if s.headline]
    for extra in (TOP15, TOP10_SF10):
        names += [n for n in extra if n in registry and n not in names]

    have_sf10 = os.path.isdir(SF10)
    headline_names = {n for n, s in registry.items() if s.headline}

    probe_pre = _cpu_probe_median()
    results: dict[str, dict] = {}
    for name in names:
        fn = registry[name].fn
        row: dict = {}
        tiers = [("sf0.1", SF01), ("sf1", SF1)]
        if have_sf10 and (
            name in headline_names
            or name in STEEP3
            or name in TOP10_SF10
        ):
            tiers.append(("sf10", SF10))
        for label, sf_dir in tiers:
            times = []
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.time() - t0)
            row[label] = round(min(times), 3)
        row["ratio"] = (
            round(row["sf1"] / row["sf0.1"], 2) if row["sf0.1"] > 0 else None
        )
        if "sf10" in row and row["sf1"] > 0:
            # the second decade's ratio: ~first-decade ratio → linear
            # (constant per-decade factor); much larger → compounding
            row["ratio10"] = round(row["sf10"] / row["sf1"], 2)
        results[name] = row
        print(f"{name}: {row}", file=sys.stderr)
    probe_post = _cpu_probe_median()

    doc = {
        "metric": "stress_scaling_sf1_over_sf0.1",
        "n_queries": len(results),
        "sf1_dir": SF1,
        "sf10_dir": SF10 if have_sf10 else None,
        "worst_ratio10": sorted(
            (
                (r["ratio10"], n)
                for n, r in results.items()
                if "ratio10" in r
            ),
            reverse=True,
        )[:8],
        "cpu_probe_sec_pre": probe_pre,
        "cpu_probe_sec_post": probe_post,
        "total_sf0.1": round(sum(r["sf0.1"] for r in results.values()), 3),
        "total_sf1": round(sum(r["sf1"] for r in results.values()), 3),
        "queries": results,
        "worst_ratios": sorted(
            ((r["ratio"], n) for n, r in results.items()),
            reverse=True,
        )[:8],
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in (
        "metric", "n_queries", "total_sf0.1", "total_sf1",
        "cpu_probe_sec_pre", "cpu_probe_sec_post", "worst_ratios",
        "worst_ratio10",
    )}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
