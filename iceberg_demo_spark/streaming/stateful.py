"""Custom stateful streaming operators via ``applyInPandasWithState``
(Arrow-batched per-group state, the Structured Streaming extension point for
semantics the built-in windowed aggregations can't express).

North-star pipeline use: **streaming dedup** — when documents arrive
continuously, "first occurrence wins" needs memory of every key seen across
micro-batches; watermarked ``dropDuplicates`` forgets keys past the
watermark, while this operator's state lives until the stream is stopped
(bounded by key cardinality, the right trade for id-keyed corpora).

Scale notes: state is partitioned by group key across executors (state store
per shuffle partition); each micro-batch shuffles only that batch's rows.
``running_counts`` emits one row per touched key per batch — output volume
∝ distinct keys per batch, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Exactly-once-per-key pass-through: emits each key's FIRST row ever
    seen on the stream, drops every later duplicate (cross-micro-batch
    streaming dedup). Append output mode."""
    out_schema = stream_df.schema
    state_schema = "seen byte"

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            for _ in pdf_iter:  # drain: key already emitted
                pass
            return
        first = None
        for pdf in pdf_iter:
            if first is None and len(pdf) > 0:
                first = pdf.iloc[[0]]
        state.update((1,))
        if first is not None:
            yield first

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append",
                                GroupStateTimeout.NoTimeout)
    )


def running_counts(stream_df: DataFrame, key_col: str) -> DataFrame:
    """Running per-key row count across the whole stream: one updated
    (key, count) row per touched key per micro-batch. Update output mode."""
    import pandas as pd  # noqa: F401  (executor-side)

    key_field = stream_df.schema[key_col]
    out_schema = f"{key_col} {key_field.dataType.simpleString()}, n bigint"
    state_schema = "n bigint"

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        batch_n = sum(len(p) for p in pdf_iter)
        total = (state.get[0] if state.exists else 0) + batch_n
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "n": [total]})

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )
