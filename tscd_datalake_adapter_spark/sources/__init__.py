"""Sources & sinks (SURVEY.md §2.2 scans block).

Thin, schema-aware readers over the fixture tables plus generic
csv/json/text readers and partitioned writers. Delta/Iceberg formats are
feature-gated: the connector jars are not in this environment, so
``write_table(fmt="delta")`` raises a clear error unless the runtime has the
connector on the classpath.
"""

from tscd_datalake_adapter_spark.sources.tables import (
    TABLE_NAMES,
    ensure_engine_confs,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_text,
    recursion_row_budget,
    register_views,
    write_partitioned,
    write_table,
)

__all__ = [
    "TABLE_NAMES",
    "ensure_engine_confs",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_text",
    "recursion_row_budget",
    "register_views",
    "write_partitioned",
    "write_table",
]
