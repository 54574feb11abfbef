"""Run the full pytest suite as N sharded worker processes (the VERDICT r6
item 4 wall-time cut; pytest-xdist is not installed in this environment and
installs are forbidden, so this is the equivalent built from the pieces
available).

Each worker is a separate ``python -m pytest tests/`` process with:

- ``TEST_SHARD=i/N`` — conftest's ``pytest_collection_modifyitems`` keeps
  only items whose crc32(nodeid) % N == i, so the N shards partition the
  full collection exactly (no overlap, no gaps);
- its own Spark session (``SPARK_GRAFT_TEST_CPUS`` threads each; default
  sized so N workers together use the machine) and its own
  ``SPARK_GRAFT_WAREHOUSE_DIR`` so concurrent ``saveAsTable`` calls never
  share a filesystem path (moto already binds port 0; every other test
  resource is tmp_path-scoped).

Usage: python scripts/run_suite_parallel.py [-n WORKERS] [-- extra pytest args]
Exit code: 0 iff every worker exits 0. Per-worker tails are printed on
failure; full logs land in /tmp/suite_shard_<i>.log.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=4)
    ap.add_argument("--cpus-per-worker", type=int, default=0)
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    n = args.workers
    cpus = args.cpus_per_worker or max(2, (os.cpu_count() or 8) // n)
    procs = []
    t0 = time.time()
    for i in range(n):
        env = dict(os.environ)
        env["TEST_SHARD"] = f"{i}/{n}"
        env["SPARK_GRAFT_TEST_CPUS"] = str(cpus)
        env["SPARK_GRAFT_WAREHOUSE_DIR"] = tempfile.mkdtemp(
            prefix=f"suite_wh_{i}_"
        )
        log = open(f"/tmp/suite_shard_{i}.log", "w")
        procs.append(
            (
                i,
                subprocess.Popen(
                    [
                        sys.executable,
                        "-m",
                        "pytest",
                        "tests/",
                        "-q",
                        "-p",
                        "no:cacheprovider",
                        *args.pytest_args,
                    ],
                    cwd=REPO,
                    env=env,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                ),
                log,
            )
        )

    failed = False
    totals = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    for i, p, log in procs:
        rc = p.wait()
        log.close()
        tail = open(f"/tmp/suite_shard_{i}.log").read()
        summary = tail.strip().splitlines()[-1] if tail.strip() else "(empty)"
        print(f"shard {i}/{len(procs)} rc={rc}: {summary}")
        for key in totals:
            m = re.search(rf"(\d+) {key}", summary)
            if m:
                totals[key] += int(m.group(1))
        if rc != 0:
            failed = True
            print("".join(tail.splitlines(keepends=True)[-30:]))
    dt = time.time() - t0
    print(
        f"TOTAL: {totals['passed']} passed, {totals['failed']} failed, "
        f"{totals['skipped']} skipped, {totals['error']} error "
        f"in {dt:.0f}s across {len(procs)} workers"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
