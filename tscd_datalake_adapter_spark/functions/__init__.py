"""Cross-engine-deterministic expression helpers.

The oracle gate (SURVEY.md §2.2 determinism rules) hash-compares Spark results
against DuckDB. Per-row double arithmetic is bit-identical across engines
(IEEE 754), but *aggregation* over doubles is order-dependent. These helpers
make aggregates exact and therefore engine-independent:

- ``dec_sum`` — sum through ``decimal(38,6)`` (exact, associative), cast back
  to double. The matching oracle form is
  ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``.
- ``dec_avg`` — exact decimal sum divided by count in double.
- ``dec_std`` / ``dec_var`` — sample std/variance from exact decimal moments
  (sum x, sum x²) so both engines do identical double arithmetic at the end.

At 100 TB these stay fully distributed: decimal sums are partial-aggregated
map-side exactly like double sums, with no extra shuffle.

Performance note (measured at sf0.1): decimal(38,6) aggregation costs ~2-3×
a plain double sum on the agg operator. A scaled-integer variant
(``sum(cast(round(x*1e6) as bigint))``) is ~2× faster and produces identical
values at fixture scale, but silently wraps past ~9.2e18 (≳1e12 rows of 1e6-
scaled values in one group) — an unacceptable failure mode at 100 TB, so the
overflow-safe decimal form is the default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dec_sum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dec_avg(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dec_var_samp(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(DEC)).cast("double")
    sx2 = F.sum((c * c).cast(DEC)).cast("double")
    return (sx2 - sx * sx / n) / (n - F.lit(1.0))


def dec_std_samp(col: Column | str) -> Column:
    return F.sqrt(dec_var_samp(col))


def oracle_dec_sum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def oracle_dec_avg(expr: str) -> str:
    return f"{oracle_dec_sum(expr)} / COUNT({expr})"


def oracle_dec_var_samp(expr: str) -> str:
    sx = oracle_dec_sum(expr)
    sx2 = oracle_dec_sum(f"({expr}) * ({expr})")
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return f"({sx2} - {sx} * {sx} / {n}) / ({n} - 1.0)"


def oracle_dec_std_samp(expr: str) -> str:
    return f"sqrt({oracle_dec_var_samp(expr)})"


def r6(col: Column) -> Column:
    """Round a double output to 6 decimals (determinism rule)."""
    return F.round(col, 6)


def r2(col: Column) -> Column:
    return F.round(col, 2)
