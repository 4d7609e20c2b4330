"""Text-analysis + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_demo_spark import registry
from iceberg_demo_spark.operators.multimodal import (
    _fake_decode,
    decode_features,
    with_binary_payload,
)
from tests.conftest import SF_SMALL

registry.load_all()


def test_token_stats_counts_match_manual(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sample = docs.limit(5).collect()
    stats = {
        r["lang"]: r for r in registry.QUERIES["doc_token_stats"](spark, SF_SMALL).collect()
    }
    total_docs = sum(r["n_docs"] for r in stats.values())
    assert total_docs == docs.count()
    for r in sample:
        assert len(r["text"].split(" ")) >= 1


def test_langid_covers_all_docs(spark):
    rows = registry.QUERIES["doc_langid_confusion"](spark, SF_SMALL).collect()
    n = sum(r["n_docs"] for r in rows)
    assert n == spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert all(r["predicted"] in {"en", "es", "fr", "de", "und"} for r in rows)


def test_fake_decode_deterministic_and_raises_on_empty():
    w1, h1, c1 = _fake_decode(b"some image bytes")
    w2, h2, c2 = _fake_decode(b"some image bytes")
    assert (w1, h1, c1) == (w2, h2, c2)
    assert 64 <= w1 < 64 + 1024
    with pytest.raises(ValueError):
        _fake_decode(b"")


def test_decode_features_schema_and_rowcount(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    feats = decode_features(with_binary_payload(docs))
    assert set(feats.columns) == {
        "doc_id", "n_bytes", "fake_width", "fake_height", "checksum",
    }
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r["n_bytes"] > 0 for r in rows)


def test_payload_bytes_match_text_length(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(20)
    joined = (
        with_binary_payload(docs)
        .select("doc_id", F.octet_length("payload").alias("nb"), F.col("meta.n_bytes").alias("mb"))
        .collect()
    )
    assert all(r["nb"] == r["mb"] for r in joined)


def test_multimodal_resize_batch_shape(spark):
    from tests.conftest import SF_SMALL
    rows = registry.QUERIES["multimodal_resize"](spark, SF_SMALL).collect()[0]
    assert rows["n_images"] > 0
    assert rows["n_exact"] == rows["n_images"]  # every payload hit target size
    assert rows["total_resized_bytes"] == rows["n_images"] * (128 * 96 // 64)
