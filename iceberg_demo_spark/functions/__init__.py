"""Column helpers shared by the operator library.

Cross-engine determinism: float aggregates computed naively (SUM over
doubles) differ between Spark and DuckDB because summation order differs.
Per-row double arithmetic, however, is IEEE-754 identical in both engines.
So we cast each per-row double to DECIMAL(18,4) (deterministic: same input
bits → same decimal) and sum decimals exactly; the final value is identical
bit-for-bit across engines. ``dsum``/``davg`` implement this on the Spark
side; oracles use the matching ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS
DOUBLE)`` SQL.

At scale this costs nothing: decimal sums are still JVM-side whole-stage
codegen with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dsum", "davg", "cosine_sim", "dot", "l2norm"]


def dsum(expr: Column, scale: int = 2) -> Column:
    """Deterministic cross-engine SUM of a double expression (see module doc).

    Round the exact DECIMAL first, cast to double second: sums of 2-decimal
    inputs produce exact .xx50 ties that double cannot represent, and the
    two engines round the approximated double differently. Decimal rounding
    is half-away-from-zero in both.
    """
    return F.round(F.sum(expr.cast("decimal(18,4)")), scale).cast("double")


def davg(expr: Column, scale: int = 4) -> Column:
    """Deterministic cross-engine AVG: exact decimal sum / count."""
    return F.round(
        F.sum(expr.cast("decimal(18,4)")).cast("double") / F.count(expr), scale
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, JVM-side (no UDF).

    Sequential left-to-right fold — matches DuckDB's list_* evaluation order,
    so results are bit-identical when inputs are cast to double in both.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (built-ins only)."""
    return dot(a, b) / (l2norm(a) * l2norm(b))
