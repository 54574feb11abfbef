"""Snapshot `.explain("formatted")` output for named queries into
plans/r12/<query>_<tag>.txt (optimization-round evidence artifacts).

Usage: python scripts/plan_snapshot.py <tag> query1 query2 ...
       python scripts/plan_snapshot.py <tag> --headline
       python scripts/plan_snapshot.py <tag> --top N   (slowest N from the
                                                        latest families bench)

Plans are captured at sf0.1 (the bench scale) so AQE thresholds and scan
statistics match what the bench actually executes.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def _slowest(registry, k: int) -> list[str]:
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # numeric round sort (r11 ADVICE): the corpus mixes zero-padded
    # (r05..r08) and unpadded (r10, r11) round numbers, so a lexicographic
    # sorted()[-1] would silently pick the wrong "latest" bench for an
    # unpadded single-digit round or round >= 100
    files = sorted(
        glob.glob(os.path.join(root, "BENCH_FAMILIES_r*.json")),
        key=lambda p: int(
            re.search(r"BENCH_FAMILIES_r0*(\d+)\.json$", p).group(1)
        ),
    )
    if not files:
        return []
    with open(files[-1]) as fh:
        data = json.load(fh)
    data = data.get("parsed", data)
    ranked = sorted(data.get("queries", {}).items(), key=lambda kv: -kv[1])
    return [n for n, _ in ranked[:k] if n in registry]


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.operators import load_all

    spark = get_spark("plan-snapshot", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    expanded: list[str] = []
    i = 0
    while i < len(names):
        if names[i] == "--headline":
            expanded.extend(
                sorted(n for n, s in registry.items() if s.headline)
            )
        elif names[i] == "--top":
            i += 1
            expanded.extend(_slowest(registry, int(names[i])))
        else:
            expanded.append(names[i])
        i += 1

    os.makedirs(OUT_DIR, exist_ok=True)
    seen = set()
    for name in expanded:
        if name in seen:
            continue
        seen.add(name)
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
