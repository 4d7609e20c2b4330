"""iceberg_demo_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference repo (leejaywei/iceberg-demo): a snapshot-versioned lakehouse table
layer over Parquet, row-level DML, time travel, branches/tags, maintenance
procedures, materialized views with automatic query rewriting, read-only table
enforcement — plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten choose the
physical plan; Python-side logic is restricted to metadata management
(snapshots, manifests, MV catalog) which is driver-side and O(files), never
O(rows).
"""

from iceberg_demo_spark.session import get_spark, stop_spark


def engine(spark, warehouse: str):
    """Convenience constructor for the full engine facade."""
    from iceberg_demo_spark.engine import Engine

    return Engine(spark, warehouse)


__all__ = ["get_spark", "stop_spark", "engine"]
__version__ = "0.1.0"
