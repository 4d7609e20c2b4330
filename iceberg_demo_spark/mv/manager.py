"""MV lifecycle: CREATE / DROP / REFRESH [INCREMENTAL] / SHOW
(MaterializedViewCommands.scala:17-207 behaviors, Python-native).

Backing tables are stored in our snapshot-versioned table format under the
``mv`` namespace — refresh is an overwrite commit, so an MV's own history is
time-travelable for free (an improvement over the reference's plain
saveAsTable backing)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from iceberg_demo_spark.mv.catalog import MaterializedView, MVCatalog
from iceberg_demo_spark.mv.parser import parse_select, ParseError
from iceberg_demo_spark.tables.catalog import Catalog
from iceberg_demo_spark.tables.format import now_ms


class MVManager:
    def __init__(self, spark: SparkSession, table_catalog: Catalog,
                 mv_catalog: MVCatalog, rewriter=None):
        self.spark = spark
        self.table_catalog = table_catalog
        self.mv_catalog = mv_catalog
        self.rewriter = rewriter  # for the refresh-time disable guard

    def _backing_name(self, name: str) -> str:
        return f"mv.mv_backing_{name.lower().replace('.', '_')}"

    def backing_df(self, mv: MaterializedView) -> DataFrame:
        return self.table_catalog.load_table(mv.backing_table).to_df()

    def _run_query(self, query: str) -> DataFrame:
        """Run the defining query with rewriting disabled (the reference's
        thread-local guard, MaterializedViewOptimizationRule.scala:53)."""
        if self.rewriter is not None:
            self.rewriter.disable()
        try:
            return self.spark.sql(query)
        finally:
            if self.rewriter is not None:
                self.rewriter.enable()

    def _aliased(self, df: DataFrame, query: str) -> DataFrame:
        """Auto-alias unaliased aggregate/expression outputs so the backing
        parquet has legal, stable column names (``sum(amount)`` →
        ``sum_amount``)."""
        new = []
        for c in df.columns:
            if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
                new.append(c)
            else:
                s = re.sub(r"\W+", "_", c).strip("_") or "col"
                new.append(s)
        # dedup
        seen: dict[str, int] = {}
        out = []
        for c in new:
            if c in seen:
                seen[c] += 1
                out.append(f"{c}_{seen[c]}")
            else:
                seen[c] = 0
                out.append(c)
        return df.toDF(*out)

    def create(self, name: str, query: str, if_not_exists: bool = False) -> MaterializedView:
        if self.mv_catalog.exists(name):
            if if_not_exists:
                return self.mv_catalog.get(name)
            raise ValueError(f"Materialized view {name} already exists")
        df = self._aliased(self._run_query(query), query)
        backing = self._backing_name(name)
        if self.table_catalog.table_exists(backing):
            self.table_catalog.drop_table(backing, purge=True)
        t = self.table_catalog.create_table_as(backing, df)
        snap = t.metadata.current_snapshot()
        mv = MaterializedView(
            name=name,
            query=query.strip().rstrip(";"),
            backing_table=backing,
            last_refresh_ts=now_ms(),
            storage_format="parquet",
            storage_location=t.location,
            row_count=sum(f.records for f in snap.files) if snap else 0,
            size_in_bytes=sum(f.bytes for f in snap.files) if snap else 0,
        )
        self.mv_catalog.register(mv)
        return mv

    def drop(self, name: str, if_exists: bool = False) -> None:
        if not self.mv_catalog.exists(name):
            if if_exists:
                return
            raise ValueError(f"Materialized view {name} does not exist")
        mv = self.mv_catalog.drop(name)
        if self.table_catalog.table_exists(mv.backing_table):
            self.table_catalog.drop_table(mv.backing_table, purge=True)

    def refresh(self, name: str, incremental: bool = False) -> MaterializedView:
        """Full recompute; INCREMENTAL is accepted but falls back to full,
        exactly like the reference (MaterializedViewCommands.scala:150-177,
        docs/starrocks-mv-features.md:56-58). True incremental maintenance
        would consume the backing tables' changelog views."""
        mv = self.mv_catalog.get(name)
        if mv is None:
            raise ValueError(f"Materialized view {name} does not exist")
        df = self._aliased(self._run_query(mv.query), mv.query)
        t = self.table_catalog.load_table(mv.backing_table)
        t.overwrite_all(df)
        snap = t.metadata.current_snapshot()
        mv.last_refresh_ts = now_ms()
        mv.row_count = sum(f.records for f in snap.files) if snap else 0
        mv.size_in_bytes = sum(f.bytes for f in snap.files) if snap else 0
        self.mv_catalog.update(mv)
        return mv

    def show(self) -> DataFrame:
        """SHOW MATERIALIZED VIEWS — the reference's 8-column schema
        (MaterializedViewSuite.scala:258-265)."""
        rows = [
            (v.name, v.query, v.backing_table, v.last_refresh_ts,
             v.storage_format, v.storage_location, v.row_count, v.size_in_bytes)
            for v in self.mv_catalog.list_all()
        ]
        return self.spark.createDataFrame(
            rows,
            "name string, query string, backing_table string, last_refresh_ts bigint, "
            "storage_format string, storage_location string, row_count bigint, "
            "size_in_bytes bigint",
        )
