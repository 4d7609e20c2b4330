"""Local emulation of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor, then compares row counts and order-insensitive TYPED values.

Type discipline (calibrated against CORRECTNESS_r01): the driver's value
hash is computed from Arrow-materialized results, so DuckDB HUGEINT
(``SUM(<int>)`` → decimal128) fails against a Spark BIGINT even when the
numbers are equal, while int32-vs-int64 width differences pass. We
reproduce that by fetching the DuckDB side via Arrow (``rel.arrow()``,
which surfaces HUGEINT as ``Decimal``) and tagging every value with its
Python type class (bool/int/float/Decimal/str/date/datetime/bytes).
Floats are compared exactly — queries are expected to round in-query.

Usage:

    python tools/check_oracles.py [sf_dir] [name_filter ...]
    python tools/check_oracles.py [sf_dir] --window          # driver's first-50
    python tools/check_oracles.py [sf_dir] --emit OUT.json   # artifact mode

``--emit`` writes {name: {"status": pass|fail|rows, "rows": N, "secs": S}}
for every checked query — ORACLES_LOCAL_r{N}.json, the auditable record of
the full 100+-gate local run that the driver's 50-gate window can't cover.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
import time
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_demo_spark import registry
from iceberg_demo_spark.session import get_spark
from iceberg_demo_spark.sources import TPCH_TABLES

registry.load_all()


_TYPE_TAGS = (
    (bool, "bool"),
    (int, "int"),
    (float, "float"),
    (Decimal, "decimal"),
    (str, "str"),
    (bytes, "bytes"),
    (_dt.datetime, "datetime"),  # before date: datetime is a date subclass
    (_dt.date, "date"),
)


def _tag(v):
    """(type-class, value) pair mirroring the driver's type-sensitive hash."""
    if v is None:
        return ("null", None)
    for cls, tag in _TYPE_TAGS:
        if isinstance(v, cls):
            if tag == "float" and math.isnan(v):
                return ("float", "NaN")
            if tag == "datetime":
                # DuckDB Arrow yields tz-aware UTC TIMESTAMPTZ; Spark
                # collect() yields naive session-local (UTC per session.py)
                # datetimes — convert to UTC before stripping tzinfo so the
                # wall-clock values actually agree
                if v.tzinfo is not None:
                    v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return ("datetime", v)
            return (tag, v)
    return (type(v).__name__, v)


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_tag(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x[0], str(x[1])) for x in t))


def main() -> int:
    args = sys.argv[1:]
    emit_path = None
    if "--emit" in args:
        i = args.index("--emit")
        emit_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    name_filter = args[1:]
    if name_filter == ["--window"]:
        # emulate the driver's CORRECTNESS gate: exactly the first 50
        # registered queries, in registration order
        name_filter = list(registry.QUERIES)[:50]

    spark = get_spark("check_oracles")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    results: dict[str, dict] = {}

    def record(name, status, rows, t0):
        results[name] = {"status": status, "rows": rows,
                         "secs": round(time.time() - t0, 2)}

    from iceberg_demo_spark.cache import release_pins

    for name, fn in registry.QUERIES.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        release_pins()  # previous gate's residue must not color this one
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            record(name, "fail", 0, t0)
            continue
        spark_s = time.time() - t0

        oracle = registry.ORACLES.get(name)
        if oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]")
            if not srows:
                print(f"WARN {name}: rows-only query returned 0 rows")
            record(name, "rows", len(srows), t0)
            continue
        try:
            at = con.sql(oracle).arrow()
            dcols = list(at.schema.names)
            # positional extraction: a per-row dict would silently collapse
            # duplicate output column names onto one value
            dcol_vals = [c.to_pylist() for c in at.columns]
            drows = list(zip(*dcol_vals)) if dcol_vals and at.num_rows else []
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            record(name, "fail", len(srows), t0)
            continue

        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            failures.append(name)
            record(name, "fail", len(srows), t0)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            failures.append(name)
            record(name, "fail", len(srows), t0)
            continue
        sn = _normalize(srows, scols)
        dn = _normalize(drows, dcols)
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            failures.append(name)
            record(name, "fail", len(srows), t0)
            continue
        print(f"PASS {name}: {len(srows)} rows [{spark_s:.1f}s]")
        record(name, "pass", len(srows), t0)

    if emit_path:
        import json as _json

        with open(emit_path, "w") as fh:
            _json.dump(results, fh, indent=1, sort_keys=True)
        print(f"wrote {emit_path} ({len(results)} entries)")

    print()
    total = len([n for n in registry.QUERIES if not name_filter or any(f in n for f in name_filter)])
    print(f"{total - len(failures)}/{total} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
