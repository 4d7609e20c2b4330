"""Custom Python DataSource (Spark 4 extension point, round 7).

Demonstrates the `pyspark.sql.datasource` API — the sanctioned way to
teach Spark a format it doesn't ship: a newline-delimited-JSON reader
with

- **one InputPartition per file** (scan parallelism = file count, the
  same unit parquet uses),
- **filter pushdown** (`pushFilters`): equality on `source` and
  comparisons on `n_chars` are evaluated inside the reader, so
  non-matching rows never cross the Python→JVM boundary (the remaining
  filters are returned to Spark, which re-applies them),
- **Arrow RecordBatch output**: rows are decoded into columnar batches,
  not yielded tuple-at-a-time — the vectorized transfer path.

Scale posture: a Python datasource IS Python in the scan, so it will
never beat the native parquet reader — the point of the extension is
formats Spark lacks (proprietary logs, custom binary framing). The
design transfers: partition-per-file parallelism, pushdown before the
boundary, Arrow batches across it. For formats Spark DOES support,
convert-to-parquet-once remains the answer (sources/testdata.py).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_SCHEMA = ("doc_id bigint, source string, n_chars bigint, lang string")

#: rows per Arrow batch crossing the Python→JVM boundary
_BATCH_ROWS = 4096


def _list_jsonl_files(d: str) -> list:
    """The ONE filename predicate both readers share. The stream reader's
    offsets are positions in this sorted list, so batch and stream MUST
    see the identical file set — a predicate edited in only one copy
    would silently remap stream offsets."""
    return sorted(
        os.path.join(d, p) for p in os.listdir(d)
        if (p.startswith("part-") and ".json" in p) or p.endswith(".jsonl"))


def _read_jsonl_batches(paths, cols, admit=None):
    """Shared JSONL -> Arrow RecordBatch loop (batch + stream readers)."""
    import pyarrow as pa

    buf = [[] for _ in cols]

    def flush():
        batch = pa.RecordBatch.from_arrays(
            [pa.array(buf[i]) for i in range(len(cols))], names=cols)
        for b in buf:
            b.clear()
        return batch

    for path in paths:
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                rec = json.loads(line)
                if admit is not None and not admit(rec):
                    continue
                for i, c in enumerate(cols):
                    # .get: a key omitted from a JSONL record is NULL,
                    # same as an explicit null — never a KeyError crash
                    buf[i].append(rec.get(c))
                if len(buf[0]) >= _BATCH_ROWS:
                    yield flush()
    if buf[0]:
        yield flush()


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GlacierJsonlReader(DataSourceReader):
    def __init__(self, options, schema: StructType):
        self._dir = options["path"]
        self._fields = [f.name for f in schema.fields]
        self._pushed: list = []

    def pushFilters(self, filters):
        """Keep the filters this reader evaluates natively; hand back
        the rest. AND semantics: every kept filter is applied to every
        row inside read()."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("source",):
                self._pushed.append(("source", "==", f.value))
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual,
                                LessThan, LessThanOrEqual)) \
                    and f.attribute == ("n_chars",):
                op = {GreaterThan: ">", GreaterThanOrEqual: ">=",
                      LessThan: "<", LessThanOrEqual: "<="}[type(f)]
                self._pushed.append(("n_chars", op, f.value))
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        return [_JsonlPartition(p) for p in _list_jsonl_files(self._dir)]

    def _admit(self, rec) -> bool:
        for col, op, val in self._pushed:
            x = rec.get(col)
            if x is None:
                # SQL comparison semantics: NULL compared to anything is
                # not TRUE, so the row is filtered out — never a TypeError
                return False
            if op == "==" and not x == val:
                return False
            if op == ">" and not x > val:
                return False
            if op == ">=" and not x >= val:
                return False
            if op == "<" and not x < val:
                return False
            if op == "<=" and not x <= val:
                return False
        return True

    def read(self, partition: _JsonlPartition):
        yield from _read_jsonl_batches(
            [partition.path], self._fields, admit=self._admit)


class GlacierJsonlDataSource(DataSource):
    """``spark.read.format("glacier_jsonl").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "glacier_jsonl"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> GlacierJsonlReader:
        return GlacierJsonlReader(self.options, schema)

    def streamReader(self, schema: StructType) -> "GlacierJsonlStreamReader":
        return GlacierJsonlStreamReader(self.options, schema)


_REGISTERED = set()


def register_jsonl_source(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(GlacierJsonlDataSource)
        _REGISTERED.add(key)


def stage_jsonl_docs(spark, sf_dir: str, n_files: int = 4) -> str:
    """JSONL staging of the documents metadata columns — the 'foreign
    format' fixture the custom source exists to read (production data
    would already be on disk in its foreign format). Written by Spark's
    own distributed JSON writer (no driver-side row funnel); the file
    split is partitioner-chosen, which is fine — every consumer below
    is split-invariant. Reused per SF."""
    from iceberg_demo_spark.operators.layout import _sf_tag
    from iceberg_demo_spark.scratch import scratch_path
    from iceberg_demo_spark.sources import load_tables

    out = scratch_path(f"glacier_jsonl_{_sf_tag(sf_dir)}")
    if not os.path.exists(f"{out}/_SUCCESS"):
        (load_tables(spark, sf_dir, ("documents",))["documents"]
         .select("doc_id", "source", "n_chars", "lang")
         .repartition(n_files)
         .write.mode("overwrite").json(out))
    return out


# ---------------------------------------------------------------------------
# Streaming side of the extension point (round 8)
# ---------------------------------------------------------------------------

class _JsonlRangePartition(InputPartition):
    def __init__(self, paths: list):
        self.paths = paths


class GlacierJsonlStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the JSONL directory as an APPEND-ONLY log.

    Offsets are {"index": n, "upto": <name of file n-1>} — the count of
    files (in sorted-name order) already consumed plus the boundary
    filename; a micro-batch is the file range [start, end).
    Determinism/exactly-once contract: files are immutable once written
    and the log is append-only in NAME order, so any (start, end) range
    replays to the SAME rows. That contract is VALIDATED, not assumed:
    partitions() checks that the file at position start-1 still carries
    the checkpointed boundary name and raises if a late-arriving file
    sorted itself before the consumed range (which would silently remap
    count offsets into re-ingest + skip). partitions() returns one
    InputPartition per file, so scan parallelism inside a micro-batch
    matches the batch reader's unit."""

    def __init__(self, options, schema: StructType):
        self._dir = options["path"]
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"index": 0, "upto": ""}

    def latestOffset(self):
        files = _list_jsonl_files(self._dir)
        return {"index": len(files),
                "upto": os.path.basename(files[-1]) if files else ""}

    def partitions(self, start: dict, end: dict):
        files = _list_jsonl_files(self._dir)
        i = start["index"]
        # fail LOUDLY if the consumed prefix shifted under the offsets
        # ("upto" missing = offset written by the pre-guard format; the
        # count is then trusted as before, never silently reinterpreted)
        expect = start.get("upto")
        if i > 0 and expect:
            actual = os.path.basename(files[i - 1]) if i <= len(files) else None
            if actual != expect:
                raise RuntimeError(
                    f"glacier_jsonl stream: file order changed under the "
                    f"checkpoint — offset {i} was committed with boundary "
                    f"file {expect!r} but position {i - 1} now holds "
                    f"{actual!r}; a file was added before the consumed "
                    f"range (or removed from it), which would silently "
                    f"re-ingest and skip data. The log must be append-only "
                    f"in sorted-name order.")
        return [_JsonlRangePartition([p]) for p in files[i:end["index"]]]

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint; the source keeps no state
        pass

    def read(self, partition: _JsonlRangePartition):
        yield from _read_jsonl_batches(partition.paths, self._fields)
