"""DataFrameWriterV2-style fluent writer (reference surface:
iceberg_it.py:1374-1410 create/replace/createOrReplace/append/
overwritePartitions, :1595-1638 overwrite(condition), :1640-1681
mergeSchema evolution).

Usage:
    write_to(catalog, "db.t", df).partitioned_by(("ts", "days")).create()
    write_to(catalog, "db.t", df).append()
    write_to(catalog, "db.t", df).option("mergeSchema", "true").append()
    write_to(catalog, "db.t", df).overwrite(F.col("level") == "INFO")
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from iceberg_demo_spark.tables.catalog import Catalog, NoSuchTableError
from iceberg_demo_spark.tables.format import MAIN_BRANCH
from iceberg_demo_spark.tables.table import Table


class WriteToBuilder:
    def __init__(self, catalog: Catalog, name: str, df: DataFrame):
        self.catalog = catalog
        self.name = name
        self.df = df
        self._partition_by: list[tuple] = []
        self._properties: dict[str, str] = {}
        self._options: dict[str, str] = {}
        self._branch = MAIN_BRANCH

    # -- builder -----------------------------------------------------------

    def partitioned_by(self, *specs) -> "WriteToBuilder":
        """specs: (source,) | (source, transform) | (source, transform, name)
        — mirrors partitionedBy(days(col), bucket(n, col), ...)."""
        self._partition_by = [s if isinstance(s, tuple) else (s,) for s in specs]
        return self

    def table_property(self, key: str, value: str) -> "WriteToBuilder":
        self._properties[key] = value
        return self

    def option(self, key: str, value: str) -> "WriteToBuilder":
        self._options[key.lower()] = value
        return self

    def to_branch(self, branch: str) -> "WriteToBuilder":
        self._branch = branch
        return self

    # -- actions (each = one atomic snapshot commit) -------------------------

    def create(self) -> Table:
        """CTAS; errors if the table exists (DFv2 .create())."""
        t = self.catalog.create_table_as(
            self.name, self.df, partition_by=self._partition_by or None,
            properties=self._properties or None,
        )
        return t

    def replace(self) -> Table:
        """RTAS; errors if missing (DFv2 .replace())."""
        return self.catalog.replace_table_as(self.name, self.df,
                                             properties=self._properties or None)

    def create_or_replace(self) -> Table:
        return self.catalog.replace_table_as(self.name, self.df,
                                             properties=self._properties or None,
                                             create_if_missing=True)

    def _load_for_write(self) -> Table:
        if not self.catalog.table_exists(self.name):
            raise NoSuchTableError(self.name)
        t = self.catalog.load_table(self.name)
        if self._merge_schema_requested():
            self._evolve_schema(t)
        return t

    def _merge_schema_requested(self) -> bool:
        # mergeSchema needs BOTH the option and the table property, exactly
        # like the reference (iceberg_it.py:1640-1681:
        # write.spark.accept-any-schema + .option("mergeSchema","true")).
        return (
            self._options.get("mergeschema", "").lower() == "true"
            or self._options.get("merge-schema", "").lower() == "true"
        )

    def _evolve_schema(self, t: Table) -> None:
        if t.properties.get("write.spark.accept-any-schema", "").lower() != "true":
            raise ValueError(
                f"mergeSchema requires table property write.spark.accept-any-schema "
                f"on {self.name}"
            )
        existing = {f.name.lower() for f in t.metadata.schema}
        for f in self.df.schema.fields:
            if f.name.lower() not in existing:
                t.add_column(f.name, f.dataType.simpleString())

    def append(self):
        return self._load_for_write().append(self.df, branch=self._branch)

    def overwrite_partitions(self):
        """Dynamic partition overwrite (DFv2 .overwritePartitions())."""
        return self._load_for_write().overwrite_dynamic(self.df, branch=self._branch)

    def overwrite(self, condition: str | Column):
        """Overwrite-by-filter (DFv2 .overwrite(cond))."""
        return self._load_for_write().overwrite_where(self.df, condition,
                                                      branch=self._branch)


def write_to(catalog: Catalog, name: str, df: DataFrame) -> WriteToBuilder:
    return WriteToBuilder(catalog, name, df)


class _WhenMatched:
    def __init__(self, builder: "MergeIntoBuilder", condition: str | None):
        self._b, self._cond = builder, condition

    def update(self, set_: dict) -> "MergeIntoBuilder":
        self._b._matched.append({"condition": self._cond, "action": "update", "set": set_})
        return self._b

    def update_all(self) -> "MergeIntoBuilder":
        """UPDATE SET * — every target column takes the same-named source
        column (docs/spark-writes.md:345)."""
        self._b._matched.append({"condition": self._cond, "action": "update", "set": None})
        return self._b

    def delete(self) -> "MergeIntoBuilder":
        self._b._matched.append({"condition": self._cond, "action": "delete"})
        return self._b


class _WhenNotMatched:
    def __init__(self, builder: "MergeIntoBuilder", condition: str | None):
        self._b, self._cond = builder, condition

    def insert(self, values: dict) -> "MergeIntoBuilder":
        self._b._not_matched.append({"condition": self._cond, "values": values})
        return self._b

    def insert_all(self) -> "MergeIntoBuilder":
        self._b._not_matched.append({"condition": self._cond, "values": None})
        return self._b


class _WhenNotMatchedBySource:
    def __init__(self, builder: "MergeIntoBuilder", condition: str | None):
        self._b, self._cond = builder, condition

    def update(self, set_: dict) -> "MergeIntoBuilder":
        self._b._nmbs.append({"condition": self._cond, "action": "update", "set": set_})
        return self._b

    def delete(self) -> "MergeIntoBuilder":
        self._b._nmbs.append({"condition": self._cond, "action": "delete"})
        return self._b


class MergeIntoBuilder:
    """Spark 4's ``df.mergeInto(table, cond)`` fluent API
    (docs/spark-writes.md:337-353) re-expressed over our Table.merge: the
    source frame is aliased ``s``, the target ``t``; clause order is
    preserved (first-match-wins, docs/spark-writes.md:77)."""

    def __init__(self, catalog: Catalog, name: str, source: DataFrame, on: str):
        self.catalog = catalog
        self.name = name
        self.source = source
        self.on = on
        self._matched: list[dict] = []
        self._not_matched: list[dict] = []
        self._nmbs: list[dict] = []
        self._branch = MAIN_BRANCH
        self._check_cardinality = True

    def when_matched(self, condition: str | None = None) -> _WhenMatched:
        return _WhenMatched(self, condition)

    def when_not_matched(self, condition: str | None = None) -> _WhenNotMatched:
        return _WhenNotMatched(self, condition)

    def when_not_matched_by_source(self, condition: str | None = None) -> _WhenNotMatchedBySource:
        return _WhenNotMatchedBySource(self, condition)

    def to_branch(self, branch: str) -> "MergeIntoBuilder":
        self._branch = branch
        return self

    def without_cardinality_check(self) -> "MergeIntoBuilder":
        self._check_cardinality = False
        return self

    def merge(self):
        """Execute: one atomic snapshot commit."""
        if not self.catalog.table_exists(self.name):
            raise NoSuchTableError(self.name)
        t = self.catalog.load_table(self.name)
        tcols = [f.name for f in t.metadata.schema]
        scols = set(self.source.columns)
        matched = [
            {**cl, "set": {c: f"s.{c}" for c in tcols if c in scols}}
            if cl.get("action") == "update" and cl.get("set") is None else cl
            for cl in self._matched
        ]
        return t.merge(
            self.source, on=self.on, matched=matched,
            not_matched=self._not_matched, not_matched_by_source=self._nmbs,
            branch=self._branch, check_cardinality=self._check_cardinality,
        )


def merge_into(catalog: Catalog, name: str, source: DataFrame, on: str) -> MergeIntoBuilder:
    return MergeIntoBuilder(catalog, name, source, on)
