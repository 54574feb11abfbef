"""Audit every registered query for DUPLICATE EXECUTED SCANS of the same
parquet table — the smell of a DataFrame consumed by multiple branches
without a checkpoint.

Two modes:
  default      — plan-only (fast): counts scan Locations in the pre-AQE
                 formatted plan. OVERCOUNTS: identical subtrees feeding
                 identical exchanges (e.g. self-joins) are deduplicated by
                 AQE's ReusedExchange at runtime.
  --executed   — runs each query to a noop sink, then reads the POST-AQE
                 final plan: ReusedExchange/ReusedSubquery subtrees print
                 as references, so remaining duplicate scans are REAL
                 re-executions of the lineage.

Legitimate duplicates still exist in --executed mode (branches that
aggregate the same table differently genuinely need two passes unless a
checkpoint is worth the materialization); the output is a review
worklist ranked by scan count, not a verdict.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_tables(plan_str: str) -> Counter:
    tables: Counter = Counter()
    for ln in plan_str.splitlines():
        if "Location" in ln and "parquet" in ln:
            tables[ln.rstrip("]").rsplit("/", 1)[-1]] += 1
    return tables


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    executed = "--executed" in sys.argv[1:]

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.operators import load_all
    from tscd_datalake_adapter_spark.plans import formatted_plan

    spark = get_spark(
        "tscd-scan-audit",
        master="local[8]",
        conf={"spark.sql.shuffle.partitions": "8"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    flagged = 0
    for name, spec in sorted(registry.items()):
        try:
            df = spec.fn(spark, sf_dir)
            if executed:
                df.write.format("noop").mode("overwrite").save()
                p = df._jdf.queryExecution().executedPlan().toString()
            else:
                p = formatted_plan(df)
        except Exception as exc:
            print(f"SKIP {name}: {type(exc).__name__}")
            continue
        dups = {t: n for t, n in _scan_tables(p).items() if n > 1}
        if dups:
            flagged += 1
            print(f"DUP  {name}: {dups}")
    print(f"\n{flagged} queries with duplicate same-table scans")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
