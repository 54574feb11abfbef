"""PySpark-native analytics engine with the capabilities of
giselabcruz/tscd-datalake-adapter, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a data-lake ingestion
microservice: fetch Gutenberg books, split header/body on markers, write to a
date/hour-partitioned object-store layout, and answer ``exists``/``list``
metadata queries. This package re-expresses that surface on the Spark
DataFrame API and extends it with the relational, streaming, and
LLM-data-pipeline operators declared in SURVEY.md §2.2, each designed for
100 TB scale (partition pruning, broadcast joins, no driver-side loops).
"""

from tscd_datalake_adapter_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
