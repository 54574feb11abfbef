"""Time individual registry queries (min-of-N noop-sink runs).

Usage: python scripts/time_query.py [-n RUNS] query1 query2 ...
Prints one line per query: name, min, all runs. Same protocol as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tscd_datalake_adapter_spark import get_spark
    from tscd_datalake_adapter_spark.operators import load_all

    spark = get_spark(
        "tscd-time-query",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # warm the JVM once on the first requested query
    registry[args[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args:
        spec = registry[name]
        times = []
        for _ in range(runs):
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.time() - t0, 3))
        print(f"{name:45s} min={min(times):6.3f}  runs={times}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
