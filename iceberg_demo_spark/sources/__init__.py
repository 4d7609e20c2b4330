from iceberg_demo_spark.sources.testdata import TPCH_TABLES, load_tables

__all__ = ["TPCH_TABLES", "load_tables"]
