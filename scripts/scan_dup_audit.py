"""Audit every registered query for DUPLICATE EXECUTED SCANS of the same
parquet table — the smell of a DataFrame consumed by multiple branches
without a cache/checkpoint.

Modes:
  default      — plan-only (fast): counts scan Locations in the pre-AQE
                 formatted plan. OVERCOUNTS: identical subtrees feeding
                 identical exchanges (e.g. self-joins) are deduplicated by
                 AQE's ReusedExchange at runtime, and persist_corpus caches
                 inline their lineage per reference.
  --executed   — runs each query to a noop sink, then counts scans by
                 WALKING the post-AQE plan tree (plans.executed_scan_counts):
                 ReusedExchange/ReusedSubquery count zero, each persist
                 cache entry's internal scans count ONCE (a cache
                 materializes once) — remaining duplicates are REAL
                 re-executions of lineage.
  --full       — like --executed, but accounts EVERY SQL execution the
                 query triggers (plans.executed_scan_counts_full): the
                 operator fn runs INSIDE the measured window, so scans
                 inside eager localCheckpoint / cache-build jobs at
                 construction time count too — the blind spot that hid
                 the markov/pagerank/image_dedup per-union-arm
                 re-executions from --executed (NOTES r7 §11). The cache
                 is cleared per query so shared cached intermediates
                 don't mask a query's own build scans. Counts here are
                 TOTAL executed scans per table (a single-pass query
                 reads 1), so the flag threshold is also >1.
  --names a,b  — restrict to a comma-separated query subset.
  --slowest N  — restrict to the N most expensive queries of the last
                 FULL --executed sweep (which records per-query wall time
                 to .scan_audit_times.json at the repo root) — the
                 per-commit tier the r6 verdict asked for: ~2 min on the
                 slowest-20 instead of ~13 min on all 380; run the full
                 sweep once per round to refresh the record.

Legitimate duplicates still exist in --executed mode (branches that
aggregate the same table differently genuinely need two passes unless a
checkpoint is worth the materialization); the output is a review
worklist ranked by scan count, not a verdict.
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scan_tables(plan_str: str) -> Counter:
    tables: Counter = Counter()
    for ln in plan_str.splitlines():
        if "Location" in ln and "parquet" in ln:
            tables[ln.rstrip("]").rsplit("/", 1)[-1]] += 1
    return tables


TIMES_PATH = os.path.join(REPO, ".scan_audit_times.json")


def _slowest_names(n: int) -> list[str]:
    if not os.path.exists(TIMES_PATH):
        raise SystemExit(
            "--slowest needs a prior full '--executed' sweep (it records "
            f"per-query seconds to {TIMES_PATH})"
        )
    with open(TIMES_PATH) as f:
        qs = json.load(f)
    return [
        name
        for name, _ in sorted(
            qs.items(), key=lambda kv: kv[1], reverse=True
        )[:n]
    ]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    argv = sys.argv[1:]
    executed = "--executed" in argv
    full = "--full" in argv
    only: set[str] | None = None
    if "--names" in argv:
        only = set(argv[argv.index("--names") + 1].split(","))
    if "--slowest" in argv:
        only = set(_slowest_names(int(argv[argv.index("--slowest") + 1])))

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.operators import load_all
    from tscd_datalake_adapter_spark.plans import (
        executed_scan_counts,
        executed_scan_counts_full,
        formatted_plan,
    )

    spark = get_spark(
        "tscd-scan-audit",
        master="local[8]",
        conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    import time

    flagged = 0
    audited = 0
    times: dict[str, float] = {}
    full_record: dict[str, dict] = {}
    for name, spec in sorted(registry.items()):
        if only is not None and name not in only:
            continue
        audited += 1
        try:
            t0 = time.time()
            if full:
                spark.catalog.clearCache()
                tables = Counter(
                    executed_scan_counts_full(
                        lambda s=spec: s.fn(spark, sf_dir)
                    )
                )
            else:
                df = spec.fn(spark, sf_dir)
                if executed:
                    df.write.format("noop").mode("overwrite").save()
                    tables = Counter(executed_scan_counts(df))
                else:
                    tables = _scan_tables(formatted_plan(df))
            times[name] = round(time.time() - t0, 3)
        except Exception as exc:
            print(f"SKIP {name}: {type(exc).__name__}")
            continue
        dups = {t: n for t, n in tables.items() if n > 1}
        if full:
            full_record[name] = dict(tables)
        if dups:
            flagged += 1
            print(f"DUP  {name}: {dups}")
    print(
        f"\n{flagged} of {audited} audited queries with duplicate same-table scans"
    )
    if (executed or full) and only is None:  # sweep: refresh timing record
        with open(TIMES_PATH, "w") as f:
            json.dump(times, f, indent=1, sort_keys=True)
        print(f"wrote per-query seconds to {TIMES_PATH}")
    if full:  # record the construction-inclusive census (merge subsets)
        path = os.path.join(REPO, ".scan_audit_full.json")
        merged: dict[str, dict] = {}
        if only is not None and os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged.update(full_record)
        with open(path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote construction-inclusive scan counts to {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
