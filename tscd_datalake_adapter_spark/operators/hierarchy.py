"""Recursive-query operators (Spark 4 ``WITH RECURSIVE``).

Spark 4.1 ships native recursive CTEs (SPARK-24497), so hierarchy walks
that previously needed driver-side iteration (the ``dedup_clusters`` /
``token_graph_khop_bfs`` pattern) can now be declared in one SQL statement
and planned as a single DAG — the engine materializes each recursion step
and unions them, with the step count bounded by
``spark.sql.cteRecursionLevelLimit``. DuckDB's ``WITH RECURSIVE`` is the
natural oracle twin.

The fixture has no explicit parent column, so the hierarchy is derived:
``parent(k) = k DIV 10`` turns ``p_partkey`` into a decimal-digit tree
(depth ~ log10 of the key domain — 3 levels at sf0.001, 4 at sf0.01), the
same synthetic-but-deterministic trick the geo operators use for
coordinates. Recursion depth therefore grows logarithmically with scale:
at 100 TB a 12-digit key still terminates in 12 steps, and each step is a
narrow integer projection of the previous one — no step re-reads the base
table.

Reference parity note: the reference (giselabcruz/tscd-datalake-adapter)
has no recursive queries; this extends the engine the way its README's
"datalake adapter" framing implies a warehouse would (hierarchical
rollups over ingested dimensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tscd_datalake_adapter_spark.operators import register
from tscd_datalake_adapter_spark.sources import load_table


@register(
    "recursive_part_hierarchy_rollup",
    headline=True,
    tags=("relational", "recursive"),
    defer=True,
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT p_partkey AS pk, p_partkey AS node, 0 AS depth FROM part
        UNION ALL
        SELECT pk, node // 10, depth + 1 FROM anc WHERE node > 0
    )
    SELECT a.node AS node,
           CAST(count(*) AS BIGINT) AS subtree_parts,
           CAST(max(a.depth) AS BIGINT) AS subtree_height,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
               AS subtree_retail
    FROM anc a JOIN part p ON p.p_partkey = a.pk
    GROUP BY a.node
    ORDER BY subtree_parts DESC, node
    LIMIT 25
    """,
)
def recursive_part_hierarchy_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hierarchical subtree rollup via a native recursive CTE: every part's
    ancestor chain under ``parent(k) = k DIV 10`` (a derived decimal-digit
    tree), then per-ancestor descendant count, subtree height, and the
    decimal-exact retail-price rollup — the classic BOM-explosion /
    org-chart query shape, executed as one declarative plan instead of a
    driver-side convergence loop.

    Scale shape: the recursive step is a pure integer projection of the
    previous step's output (no join back to the base table inside the
    recursion), so step i carries exactly |part| rows and the recursion
    terminates in O(log10(maxkey)) steps. The single part join afterwards
    is an equi-join on the original key, and the final rollup groups on
    ``node`` with a TakeOrderedAndProject top-25. Money stays
    DECIMAL(38,6) through the shuffle (the repo-wide overflow-safe sum
    recipe)."""
    part = load_table(spark, sf_dir, "part")
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT p_partkey AS pk, p_partkey AS node, 0 AS depth
            FROM {part}
            UNION ALL
            SELECT pk, node DIV 10, depth + 1 FROM anc WHERE node > 0
        )
        SELECT a.node AS node,
               CAST(count(*) AS BIGINT) AS subtree_parts,
               CAST(max(a.depth) AS BIGINT) AS subtree_height,
               CAST(SUM(CAST(p.p_retailprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS subtree_retail
        FROM anc a JOIN {part} p ON p.p_partkey = a.pk
        GROUP BY a.node
        ORDER BY subtree_parts DESC, node
        LIMIT 25
        """,
        part=part,
    )
