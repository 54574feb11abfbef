"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Each query is materialized with a noop-format write — full execution of the
plan on the cluster, nothing collected to the driver — which is the honest
cost of the query at scale (toPandas would bottleneck on the driver and
measure Arrow serialization instead of the engine).

Noise hardening (round 5): min-of-THREE per query, and the JSON carries a
parallel ``queries_p2`` map with each query's SECOND-best time — when a
co-tenant load spike inflates a run, best≈p2 means the number is stable
while best≪p2 flags the measurement itself as noisy, diagnosable from the
recorded JSON alone. Round 9: the CPU probe is a median-of-5 stamped both
BEFORE and AFTER the run (``cpu_probe_sec_pre/post``; ``cpu_probe_sec`` is
their mean, feeding ``value_probe_adjusted``) — a single sample was noisy
enough to flip round-over-round conclusions (r8 verdict).

``python bench.py --families`` runs the SECOND tier instead: every
registered query (not just headline), grouped into per-module families,
min-of-2, same noop-sink protocol — so a cost regression in the long tail
can't hide behind the headline set. Emits one JSON line with family
subtotals and per-query timings, plus the same second-best
(``queries_p2`` / ``families_p2``) and CPU-probe noise diagnostics as
headline mode, so family numbers are comparable round-over-round before
anyone chases a phantom regression.

Execution order is PINNED (round 10): both tiers run queries sorted by
name (families additionally grouped by module, families themselves
sorted) — identical across runs and rounds, so per-query
round-over-round deltas are no longer confounded by rotation-driven
registry order and JVM-warmup position (r9 verdict item 7). Compare
``spark_probe_sec_post`` to post, not pre, when normalizing.

Throttle defense (round 12, additions-only): headline mode stamps
``throttle_suspect`` (Spark probe pre/post diverging >4x — beyond the
~2.5-2.8x tiered-compilation warmup a healthy box shows) and, when
suspected, re-runs every query ONCE after the run ("bookend" pass),
folding the extra rep into the min; the pre-bookend mins are kept in
``queries_prepass``. This is the defense against the r11 failure mode: a
host throttle at run start poisoned all three back-to-back reps of the
early-alphabet queries and faked a 0.51 geomean "regression".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Reference single-thread probe for cross-round normalization: the r6
# driver box's recorded cpu_probe_sec (the first round both probes landed
# in BENCH_r*.json). value_probe_adjusted = value * PROBE_REF_SEC / probe
# — i.e., "what this run's total would read on the r6 driver box" — so
# round-over-round comparisons stop needing manual probe division (two
# judges re-derived it by hand; r7 verdict item 6).
PROBE_REF_SEC = 0.655


def _probe_adjusted(value: float, probe: float) -> float:
    return round(value * PROBE_REF_SEC / probe, 3) if probe > 0 else value


def _cpu_probe() -> float:
    """Seconds for a fixed pure-Python loop — a machine-speed calibration
    stamped into every bench JSON. Round-over-round bench comparisons
    divide by this first: a uniform query slowdown accompanied by a
    proportionally slower probe is host contention (the r4 driver-bench
    mystery), not a plan regression."""
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.time() - t0, 3)


def _cpu_probe_median(n: int = 5) -> float:
    """Median of ``n`` probe samples (r8 verdict item 3): a SINGLE sample
    proved noisy enough to flip round-over-round conclusions (r8's
    families read was −15% raw vs +12% single-probe-adjusted — the probe
    variance, not the queries). The bench stamps a median-of-5 BEFORE and
    AFTER the run and adjusts by their mean, so a mid-run host-speed
    shift is visible in the recorded JSON itself (pre ≉ post)."""
    samples = sorted(_cpu_probe() for _ in range(n))
    return samples[n // 2]


def _probe_work(_):
    x = 0
    for i in range(6_000_000):
        x += i
    return x


def _cpu_probe_parallel(n_procs: int = 16) -> float:
    """Wall seconds for n_procs fork-parallel copies of a fixed loop —
    the MULTI-core calibration (processes, not threads: the GIL would
    serialize threads and measure nothing new). The single-thread probe
    missed the r5 intra-day finding: two idle runs of identical headline
    code differed by a uniform 1.28x while the 1-thread probe moved <2%
    — socket-level throttling/co-scheduling is visible only under
    concurrency. Compare bench JSONs via BOTH probes."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.get_context("fork").Pool(n_procs) as pool:
        pool.map(_probe_work, range(n_procs))
    return round(time.time() - t0, 3)


def _spark_probe(spark, runs: int = 3) -> float:
    """Min-of-N seconds for a fixed JVM-side job (range-sum over 200M
    rows, whole-stage codegen, all cores) — the engine-side machine
    calibration. The r9 lesson: the pure-Python probe and the JVM
    throttle DIFFERENTLY on this host (python probe 0.83→2.5 while
    Spark queries moved ~1.4x), so cross-round comparisons need the
    probe that runs where the queries run. The first execution is run
    and DISCARDED (whole-stage-codegen JIT dominates it — measured 3.6
    cold vs ~0.2 after one run), but tiered compilation keeps improving
    the job for ~8 iterations, so the PRE stamp always reads somewhat
    high; compare rounds POST-to-POST (the post probe runs after
    hundreds of queries, i.e. at C2 steady state)."""
    times = []
    for i in range(runs + 1):
        t0 = time.time()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        if i > 0:
            times.append(time.time() - t0)
    return round(min(times), 3)


def _timings(spark, sf_dir, specs, runs):
    """{name: sorted [t_1 <= t_2 <= ...]} over `runs` noop-sink executions."""
    out = {}
    for name, spec in specs.items():
        times = []
        for _ in range(runs):
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.time() - t0)
        out[name] = sorted(times)
    return out


def _sf_val(sf_dir):
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        return float(sf)
    except ValueError:
        return sf


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    families_mode = "--families" in sys.argv[1:]

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.operators import load_all

    spark = get_spark(
        "tscd-bench",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    probe_pre = _cpu_probe_median()
    spark_probe_pre = _spark_probe(spark)

    if families_mode:
        by_family: dict[str, dict] = {}
        # name-sorted within each family: pinned execution order (r9
        # verdict item 7), so per-query deltas are position-comparable
        # across rounds regardless of registry rotation
        for name in sorted(registry):
            spec = registry[name]
            fam = spec.fn.__module__.rsplit(".", 1)[-1]
            by_family.setdefault(fam, {})[name] = spec
        # warm once
        first = next(iter(registry.values()))
        first.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        from tscd_datalake_adapter_spark.operators import is_construction

        families: dict[str, float] = {}
        families_p2: dict[str, float] = {}
        families_build: dict[str, float] = {}
        queries: dict[str, float] = {}
        queries_p2: dict[str, float] = {}
        construction_names: list[str] = []
        for fam in sorted(by_family):
            t = _timings(spark, sf_dir, by_family[fam], runs=2)
            build = 0.0
            for name, times in t.items():
                queries[name] = round(times[0], 3)
                queries_p2[name] = round(times[1], 3)
                if is_construction(by_family[fam][name]):
                    construction_names.append(name)
                    build += times[0]
            families[fam] = round(sum(ts[0] for ts in t.values()), 3)
            families_p2[fam] = round(sum(ts[1] for ts in t.values()), 3)
            # build-vs-read split (r11, r10 verdict item 6): subtotal of
            # construction-inclusive queries (their time contains demo
            # writes), so read-path regressions aren't chased through
            # write-path noise; families_read = families - families_build
            families_build[fam] = round(build, 3)
        probe_post = _cpu_probe_median()
        spark_probe_post = _spark_probe(spark)
        probe = round((probe_pre + probe_post) / 2, 3)
        total = round(sum(families.values()), 3)
        result = {
            "metric": "all_queries_total_runtime",
            "value": total,
            "value_probe_adjusted": _probe_adjusted(total, probe),
            "probe_ref_sec": PROBE_REF_SEC,
            "unit": "sec",
            "families": families,
            "families_p2": families_p2,
            "families_build": families_build,
            "families_read": {
                f: round(families[f] - families_build[f], 3)
                for f in families
            },
            "construction_queries": sorted(construction_names),
            "queries": queries,
            "queries_p2": queries_p2,
            "n_queries": len(queries),
            "cpu_probe_sec": probe,
            "cpu_probe_sec_pre": probe_pre,
            "cpu_probe_sec_post": probe_post,
            "spark_probe_sec_pre": spark_probe_pre,
            "spark_probe_sec_post": spark_probe_post,
            "cpu_probe_parallel_sec": _cpu_probe_parallel(),
            "sf": _sf_val(sf_dir),
        }
        print(json.dumps(result))
        spark.stop()
        return 0

    # PINNED execution order (r9 verdict item 7): the registry's order is
    # rotation-driven and reshuffles every round, so registry-ordered
    # runs confounded per-query round-over-round deltas with JVM-warmup
    # position. Sorted-by-name is identical across runs and rounds; the
    # warm-up query is therefore fixed too.
    headline = {
        n: registry[n]
        for n in sorted(n for n, s in registry.items() if s.headline)
    }

    # warm the JVM/codegen paths once so timings measure steady-state
    next(iter(headline.values())).fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    t = _timings(spark, sf_dir, headline, runs=3)

    probe_post = _cpu_probe_median()
    spark_probe_post = _spark_probe(spark)

    # Throttle defense (r11 verdict item 1, additions-only): min-of-3 runs
    # each query's reps BACK-TO-BACK, so a host slowdown that recovers
    # mid-run poisons all three reps of the early-order queries (r11's
    # driver run: 6.7x at position 0 decaying to 1.0x by position 17,
    # diagnosed from the probes alone). The JVM probe always reads
    # somewhat high pre-run (tiered-compilation warmup: ~2.5-2.8x on a
    # HEALTHY box, r10/r12 records), so the suspect threshold is 4x; the
    # poisoned r11 run read 7.5x. When suspected, every query gets ONE
    # bookend re-run after the probes confirm recovery, and `queries`
    # takes the min over all four reps — the pre-bookend values stay in
    # `queries_prepass` so both readings are in the artifact.
    throttle_suspect = (
        spark_probe_post > 0 and spark_probe_pre / spark_probe_post > 4.0
    )
    prepass = None
    if throttle_suspect:
        prepass = {name: round(times[0], 3) for name, times in t.items()}
        t2 = _timings(spark, sf_dir, headline, runs=1)
        t = {
            name: sorted(times + t2[name]) for name, times in t.items()
        }

    timings = {name: round(times[0], 3) for name, times in t.items()}
    second_best = {name: round(times[1], 3) for name, times in t.items()}
    probe = round((probe_pre + probe_post) / 2, 3)
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "value_probe_adjusted": _probe_adjusted(total, probe),
        "probe_ref_sec": PROBE_REF_SEC,
        "unit": "sec",
        "queries": timings,
        "queries_p2": second_best,
        "throttle_suspect": throttle_suspect,
        "cpu_probe_sec": probe,
        "cpu_probe_sec_pre": probe_pre,
        "cpu_probe_sec_post": probe_post,
        "spark_probe_sec_pre": spark_probe_pre,
        "spark_probe_sec_post": spark_probe_post,
        "cpu_probe_parallel_sec": _cpu_probe_parallel(),
        "sf": _sf_val(sf_dir),
    }
    if prepass is not None:
        result["queries_prepass"] = prepass
        result["spark_probe_sec_bookend"] = _spark_probe(spark)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
