"""Warehouse catalog: create/load/drop/rename tables, CTAS/RTAS, views.

Plays the role of the reference's SparkSessionCatalog+Hive metastore
(iceberg_it.py:27-39) with a directory-per-table layout:
``<warehouse>/<namespace>/<table>/{metadata,data}``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from iceberg_demo_spark.tables.format import (
    PartitionField,
    SchemaField,
    TableMetadata,
)
from iceberg_demo_spark.tables.table import Table, _parse_type


class NoSuchTableError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


class UnsupportedOperationError(Exception):
    """Operation the table format rejects by design (e.g. CREATE TABLE LIKE,
    which Iceberg does not support — iceberg_it.py:464-479)."""


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)
        # Logical (non-materialized) views: name -> SQL text, resolved lazily
        # against registered temp views (CREATE VIEW surface,
        # iceberg_it.py:398-420).
        self.views: dict[str, dict] = {}

    # -- table lifecycle ---------------------------------------------------

    def _location(self, name: str) -> str:
        parts = name.split(".")
        return os.path.join(self.warehouse, *parts)

    def table_exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._location(name), "metadata", "version-hint.text"))

    def create_table(
        self,
        name: str,
        schema: list[tuple] | str,
        partition_by: list[tuple] | None = None,
        properties: dict[str, str] | None = None,
        sort_order: list[dict] | None = None,
        if_not_exists: bool = False,
    ) -> Table:
        """schema: DDL string "id bigint not null, data string" or list of
        (name, type[, nullable[, comment]]); partition_by: list of
        (source, transform[, name]) — transforms per docs/spark-ddl.md:74-85."""
        if self.table_exists(name):
            if if_not_exists:
                return self.load_table(name)
            raise TableAlreadyExistsError(name)
        loc = self._location(name)
        md = TableMetadata(name, loc)
        fields = []
        if isinstance(schema, str):
            st = _parse_type(f"struct<{_ddl_to_struct(schema)}>")
            nn = _not_null_names(schema)
            for f in st.fields:
                fields.append((f.name, _normalize_type(f.dataType.simpleString()),
                               f.name.lower() not in nn, None))
        else:
            for item in schema:
                name_, type_ = item[0], _normalize_type(item[1])
                nullable = item[2] if len(item) > 2 else True
                comment = item[3] if len(item) > 3 else None
                fields.append((name_, type_, nullable, comment))
        md.schemas[0] = [
            SchemaField(i + 1, n, t, nu, c) for i, (n, t, nu, c) in enumerate(fields)
        ]
        md.last_field_id = len(fields)
        md.properties = dict(properties or {})
        md.properties.setdefault("format-version", "2")
        md.properties.setdefault("write.format.default", "parquet")
        for p in partition_by or []:
            source, transform = p[0], (p[1] if len(p) > 1 else "identity")
            pname = p[2] if len(p) > 2 else None
            from iceberg_demo_spark.tables.table import _default_partition_name

            md.partition_spec.append(
                PartitionField(pname or _default_partition_name(source, transform), source, transform)
            )
        md.sort_order = sort_order or []
        md.save()
        return Table(self.spark, md)

    def show_create_table(self, name: str) -> str:
        """SHOW CREATE TABLE text (docs/spark-ddl.md:658-687 surface)."""
        t = self.load_table(name)
        md = t.metadata
        cols = ",\n  ".join(
            f"{f.name} {f.type.upper()}{'' if f.nullable else ' NOT NULL'}"
            + (f" COMMENT '{f.comment}'" if f.comment else "")
            for f in md.schema
        )
        ddl = f"CREATE TABLE {name} (\n  {cols})\nUSING glacier"
        if md.partition_spec:
            parts = []
            for p in md.partition_spec:
                if p.transform == "identity":
                    parts.append(p.source)
                elif p.transform.startswith("bucket["):
                    parts.append(f"bucket({p.transform[7:-1]}, {p.source})")
                elif p.transform.startswith("truncate["):
                    parts.append(f"truncate({p.transform[9:-1]}, {p.source})")
                else:
                    parts.append(f"{p.transform}({p.source})")
            ddl += f"\nPARTITIONED BY ({', '.join(parts)})"
        ddl += f"\nLOCATION '{md.location}'"
        if md.properties:
            props = ",\n  ".join(
                f"'{k}' = '{v}'" for k, v in sorted(md.properties.items()))
            ddl += f"\nTBLPROPERTIES (\n  {props})"
        return ddl

    def describe_extended(self, name: str) -> DataFrame:
        """DESCRIBE EXTENDED-shaped result: columns, then # Detailed Table
        Information rows."""
        t = self.load_table(name)
        md = t.metadata
        rows = [(f.name, f.type, f.comment or "") for f in md.schema]
        rows.append(("", "", ""))
        rows.append(("# Detailed Table Information", "", ""))
        rows.append(("Name", name, ""))
        rows.append(("Location", md.location, ""))
        rows.append(("Provider", "glacier", ""))
        if md.partition_spec:
            rows.append(("Partition Spec",
                         ", ".join(f"{p.transform}({p.source})" for p in md.partition_spec), ""))
        if md.identifier_field_names:
            rows.append(("Identifier Fields", ", ".join(md.identifier_field_names), ""))
        rows.append(("Table Properties",
                     ", ".join(f"{k}={v}" for k, v in sorted(md.properties.items())), ""))
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, comment string")

    def create_table_like(self, name: str, source: str) -> None:
        """CREATE TABLE ... LIKE — rejected by design, matching Iceberg
        (the reference's negative test, iceberg_it.py:464-479)."""
        raise UnsupportedOperationError(
            f"CREATE TABLE {name} LIKE {source} is not supported; "
            f"use CREATE TABLE ... AS SELECT instead"
        )

    def create_table_as(self, name: str, df: DataFrame,
                        partition_by: list[tuple] | None = None,
                        properties: dict[str, str] | None = None) -> Table:
        """CTAS (iceberg_it.py:298-316)."""
        schema = [(f.name, f.dataType.simpleString(), f.nullable) for f in df.schema.fields]
        t = self.create_table(name, schema, partition_by, properties)
        t.append(df)
        return t

    def replace_table_as(self, name: str, df: DataFrame,
                         properties: dict[str, str] | None = None,
                         create_if_missing: bool = False) -> Table:
        """RTAS: new schema/data, but history and merged properties survive
        (docs/spark-ddl.md:107-132 — properties are MERGED, snapshots kept)."""
        if not self.table_exists(name):
            if create_if_missing:
                return self.create_table_as(name, df, properties=properties)
            raise NoSuchTableError(name)
        t = self.load_table(name)
        t.check_writable("REPLACE TABLE AS SELECT")
        md = t.metadata
        new_id = max(md.schemas) + 1
        base = md.last_field_id
        md.schemas[new_id] = [
            SchemaField(base + i + 1, f.name, f.dataType.simpleString(), f.nullable)
            for i, f in enumerate(df.schema.fields)
        ]
        md.last_field_id = base + len(df.schema.fields)
        md.current_schema_id = new_id
        md.properties.update(properties or {})
        md.save()
        t.overwrite_all(df)
        return t

    def load_table(self, name: str) -> Table:
        if not self.table_exists(name):
            raise NoSuchTableError(name)
        return Table(self.spark, TableMetadata.load(self._location(name)))

    def drop_table(self, name: str, purge: bool = False, if_exists: bool = False) -> None:
        """DROP TABLE removes the catalog entry (metadata); PURGE also deletes
        data (iceberg_it.py:335-340, docs/spark-ddl.md:134-157)."""
        if not self.table_exists(name):
            if if_exists:
                return
            raise NoSuchTableError(name)
        t = self.load_table(name)
        t.check_writable("DROP TABLE")
        loc = self._location(name)
        if purge:
            shutil.rmtree(loc, ignore_errors=True)
        else:
            shutil.rmtree(os.path.join(loc, "metadata"), ignore_errors=True)

    def rename_table(self, old: str, new: str) -> None:
        if not self.table_exists(old):
            raise NoSuchTableError(old)
        if self.table_exists(new):
            raise TableAlreadyExistsError(new)
        t = self.load_table(old)
        t.check_writable("ALTER TABLE RENAME TO")
        new_loc = self._location(new)
        os.makedirs(os.path.dirname(new_loc), exist_ok=True)
        os.rename(self._location(old), new_loc)
        md = TableMetadata.load(new_loc)
        md.name = new
        md.location = new_loc
        md.save()

    def create_database(self, namespace: str, if_not_exists: bool = False) -> None:
        """CREATE DATABASE (iceberg_it.py:185-187): namespaces are warehouse
        directories; creating one just materializes the directory so it
        lists before holding tables."""
        root = os.path.join(self.warehouse, *namespace.split("."))
        if os.path.isdir(root) and not if_not_exists:
            raise TableAlreadyExistsError(f"database {namespace}")
        os.makedirs(root, exist_ok=True)

    def list_databases(self) -> list[str]:
        """Top-level namespaces with at least a directory present."""
        if not os.path.isdir(self.warehouse):
            return []
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
            and not d.startswith("_") and not d.startswith(".")
        )

    def drop_database(self, namespace: str, cascade: bool = False,
                      purge: bool = False,
                      if_exists: bool = False) -> list[str] | None:
        """DROP DATABASE [IF EXISTS] [CASCADE]. A missing database errors
        unless ``if_exists``. Without cascade, a non-empty database is
        an error. With cascade, the read-only guard runs FIRST across every
        contained table — one read-only table blocks the whole drop, exactly
        like the reference's check rule
        (ReadOnlyTableCheckRule.scala:134-143). The namespace directory
        always leaves SHOW DATABASES on success and the name can be
        re-created; PURGE semantics mirror DROP TABLE's — without PURGE
        any surviving data files are preserved (the directory is moved
        aside to a hidden ``.dropped-*`` path outside the visible catalog
        tree), with PURGE everything is deleted."""
        root = os.path.join(self.warehouse, *namespace.split("."))
        if not os.path.isdir(root):
            if if_exists:
                return None
            raise NoSuchTableError(f"database {namespace}")
        tables = self.list_tables(namespace)
        if tables and not cascade:
            raise ValueError(f"database {namespace} is not empty; use cascade")
        if cascade:
            for name in tables:
                self.load_table(name).check_writable("DROP DATABASE CASCADE")
        for name in tables:
            self.drop_table(name, purge=purge)
        if purge or not any(fs for _, _, fs in os.walk(root)):
            # purged, or nothing survived the per-table drops (metadata
            # is already gone; an all-empty tree has nothing to preserve)
            shutil.rmtree(root, ignore_errors=True)
        else:
            # no PURGE: preserve surviving data files, but hide the
            # directory from list_databases (dot-prefixed dirs are
            # excluded) so the database is gone from the catalog's view
            base = os.path.join(self.warehouse, f".dropped-{namespace}")
            dest, i = base, 0
            while os.path.exists(dest):
                i += 1
                dest = f"{base}-{i}"
            os.replace(root, dest)
        return tables

    def list_tables(self, namespace: str | None = None) -> list[str]:
        root = os.path.join(self.warehouse, *(namespace.split(".") if namespace else []))
        out = []
        for dirpath, dirnames, filenames in os.walk(root):
            if os.path.basename(dirpath) == "metadata" and "version-hint.text" in filenames:
                rel = os.path.relpath(os.path.dirname(dirpath), self.warehouse)
                out.append(rel.replace(os.sep, "."))
                dirnames.clear()
        return sorted(out)

    # -- views -------------------------------------------------------------

    def create_view(self, name: str, sql: str, or_replace: bool = False,
                    if_not_exists: bool = False, properties: dict | None = None,
                    comment: str | None = None,
                    column_aliases: list[tuple[str, str | None]] | None = None) -> None:
        """CREATE [OR REPLACE] VIEW [IF NOT EXISTS] with optional
        TBLPROPERTIES, view comment, and a column-alias list
        ``[(alias, column_comment|None), ...]`` applied positionally over the
        defining query's output (iceberg_it.py:569-612 surface)."""
        if name in self.views and not or_replace:
            if if_not_exists:
                return
            raise TableAlreadyExistsError(f"view {name}")
        self.views[name] = {"sql": sql, "properties": dict(properties or {}),
                            "comment": comment,
                            "column_aliases": list(column_aliases or [])}

    def view_df(self, name: str) -> DataFrame:
        if name not in self.views:
            raise NoSuchTableError(f"view {name}")
        df = self.spark.sql(self.views[name]["sql"])
        aliases = self.views[name].get("column_aliases") or []
        if aliases:
            if len(aliases) != len(df.columns):
                raise ValueError(
                    f"view {name}: {len(aliases)} column aliases for "
                    f"{len(df.columns)} output columns")
            df = df.toDF(*[a for a, _c in aliases])
        return df

    def alter_view_properties(self, name: str, set_: dict | None = None,
                              unset: list[str] | None = None) -> None:
        if name not in self.views:
            raise NoSuchTableError(f"view {name}")
        self.views[name]["properties"].update(set_ or {})
        for k in unset or []:
            self.views[name]["properties"].pop(k, None)

    def drop_view(self, name: str, if_exists: bool = False) -> None:
        if name not in self.views:
            if if_exists:
                return
            raise NoSuchTableError(f"view {name}")
        del self.views[name]

    def list_views(self) -> list[str]:
        return sorted(self.views)


def _ddl_to_struct(ddl: str) -> str:
    # strip NOT NULL markers for StructType parsing; nullability re-attached
    import re

    return re.sub(r"\s+not\s+null", "", ddl, flags=re.IGNORECASE)


def _normalize_type(t: str) -> str:
    """char(n)/varchar(n) → string, the documented Iceberg conversion
    (docs/spark-getting-started.md:141-196; iceberg_it.py:1024-1052 asserts
    exactly this round-trip). Applied recursively via plain substitution so
    nested struct/array element types normalize too."""
    import re

    return re.sub(r"\b(?:var)?char\s*\(\s*\d+\s*\)", "string", t,
                  flags=re.IGNORECASE)


def _not_null_names(ddl: str) -> set[str]:
    import re

    out = set()
    for m in re.finditer(r"(\w+)\s+[\w<>,()\s]+?\s+not\s+null", ddl, flags=re.IGNORECASE):
        out.add(m.group(1).lower())
    return out
