"""Materialized views with automatic query rewriting — the PySpark-native
re-implementation of the reference's spark-mv-plugin (SURVEY.md §2.12).

The plugin hooks Catalyst's post-hoc resolution; our engine rewrites at the
query-submission layer (engine.sql), which the reference itself validates as
the right stage: its rule also runs at analysis time, before optimization
(MaterializedViewExtensions.scala:27). The rewrite cascade, guard conditions
and roll-up semantics match the plugin's behavior test-for-test.
"""

from iceberg_demo_spark.mv.catalog import MaterializedView, MVCatalog
from iceberg_demo_spark.mv.manager import MVManager

__all__ = ["MVCatalog", "MaterializedView", "MVManager"]
