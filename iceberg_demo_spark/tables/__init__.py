"""Snapshot-versioned table format ("glacier"): the PySpark-native
re-expression of the reference's Iceberg surface (SURVEY.md §2.9-2.13).

No JVM extension or external catalog: table state is JSON metadata over
parquet data files, all data movement is Spark DataFrame jobs, and every
metadata operation (time travel, branches, rollback, expire) is a
driver-side pointer swap — the same architecture Iceberg's hadoop catalog
uses, re-implemented at the Python layer.
"""

from iceberg_demo_spark.tables.catalog import Catalog
from iceberg_demo_spark.tables.format import (
    DataFile,
    DeleteFile,
    PartitionField,
    SchemaField,
    Snapshot,
    TableMetadata,
)
from iceberg_demo_spark.tables.table import Table
from iceberg_demo_spark.tables.writer import merge_into, write_to

__all__ = [
    "Catalog",
    "Table",
    "TableMetadata",
    "Snapshot",
    "DataFile",
    "DeleteFile",
    "SchemaField",
    "PartitionField",
    "write_to",
    "merge_into",
]
