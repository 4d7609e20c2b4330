"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers a named query builder and (when
SQL-expressible) a DuckDB oracle. ``__spark_entry__.py`` re-exports these.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is equivalent DuckDB SQL.

    Omit ``oracle`` for non-SQL-expressible operators (the driver then runs a
    weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side effects run.

    Import order IS registration order, and the driver evaluates ``queries()``
    in registration order — so the modules whose gates most need external
    verification (DML/time-travel/changelog/MV, temporal, skew, similarity)
    register first, followed by the LLM-pipeline operators, with the
    many-times-verified relational suite last.
    """
    from iceberg_demo_spark.operators import (  # noqa: F401
        table_ops,
        temporal,
        skew,
        similarity,
        multimodal,
        text,
        dedup,
        relational,
        sampling,
    )
