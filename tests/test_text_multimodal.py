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


# -- real image codec (pure-numpy PPM/BMP; PIL when available) --------------

def _gradient(h, w):
    import numpy as np
    r = (np.arange(h * w) % 256).reshape(h, w)
    g = (np.arange(h * w) * 7 % 256).reshape(h, w)
    b = (np.arange(h * w) * 13 % 256).reshape(h, w)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _bmp_bytes(arr):
    """Minimal uncompressed 24-bit bottom-up BMP encoder (test-side)."""
    import numpy as np
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = (b"BM" + (54 + len(pix)).to_bytes(4, "little") + b"\0\0\0\0"
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
              + b"\0" * 16)
    return header + pix


def test_ppm_roundtrip_pixel_exact():
    import numpy as np
    from iceberg_demo_spark.operators.multimodal import decode_image, encode_ppm

    arr = _gradient(5, 7)
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)


def test_bmp_decode_pixel_exact():
    import numpy as np
    from iceberg_demo_spark.operators.multimodal import decode_image

    arr = _gradient(4, 6)
    assert np.array_equal(decode_image(_bmp_bytes(arr)), arr)


def test_resize_nearest_matches_reference():
    import numpy as np
    from iceberg_demo_spark.operators.multimodal import resize_nearest

    arr = _gradient(8, 8)
    out = resize_nearest(arr, 4, 4)
    ref = arr[::2, ::2]  # 2x downscale picks rows/cols 0,2,4,6
    assert np.array_equal(out, ref)


def test_decode_unrecognized_raises():
    from iceberg_demo_spark.operators.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(b"definitely not an image")
    with pytest.raises(ValueError):
        decode_image(b"")


def test_spark_decode_and_resize_real_images(spark):
    """End-to-end through the mapInPandas plumbing: true dimensions out of
    decode, pixel-exact PPM out of resize."""
    import numpy as np
    from iceberg_demo_spark.operators.multimodal import (
        decode_features, decode_image, encode_ppm, resize_images)

    arr = _gradient(6, 10)
    rows = [(1, bytearray(encode_ppm(arr))),
            (2, bytearray(_bmp_bytes(arr)))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    feats = {r["doc_id"]: r for r in decode_features(df).collect()}
    assert feats[1]["fake_width"] == 10 and feats[1]["fake_height"] == 6
    assert feats[2]["fake_width"] == 10 and feats[2]["fake_height"] == 6
    assert feats[1]["checksum"] == int(arr.astype(np.uint64).sum())
    resized = {r["doc_id"]: bytes(r["resized"])
               for r in resize_images(df, 5, 3).collect()}
    ref = arr[(np.arange(3) * 6 // 3)[:, None], (np.arange(5) * 10 // 5)[None, :]]
    for doc in (1, 2):
        assert np.array_equal(decode_image(resized[doc]), ref)


# -- round-6 additions: BM25 retrieval + token entropy ----------------------

def test_bm25_matches_python_recompute(spark):
    import math
    from collections import Counter

    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    terms = ("dup", "spark", "merge")
    k1, b = 1.2, 0.75
    per_doc = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n = len(per_doc)
    avgdl = sum(len(t) for t in per_doc.values()) / n
    df = {
        q: sum(1 for toks in per_doc.values() if q in toks) for q in terms
    }
    scores = {}
    for did, toks in per_doc.items():
        tf = Counter(toks)
        s = 0.0
        for q in terms:
            if tf[q] == 0 or df[q] == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += (idf * tf[q] * (k1 + 1)
                  / (tf[q] + k1 * (1 - b + b * len(toks) / avgdl)))
        if s > 0:
            scores[did] = s
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = registry.QUERIES["doc_bm25_search"](spark, SF_SMALL).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert abs(r["bm25"] - s) < 1e-3


def test_token_entropy_matches_python_recompute(spark):
    import math
    from collections import Counter

    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "source", "text"
    ).collect()
    per_source: dict[str, list[float]] = {}
    for r in docs:
        tf = Counter(r["text"].split(" "))
        dl = sum(tf.values())
        h = math.log(dl) - sum(c * math.log(c) for c in tf.values()) / dl
        per_source.setdefault(r["source"], []).append(h)
    got = {
        r["source"]: r
        for r in registry.QUERIES["doc_token_entropy"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(per_source)
    for src, hs in per_source.items():
        row = got[src]
        assert row["n_docs"] == len(hs)
        assert abs(row["avg_entropy"] - sum(hs) / len(hs)) < 1e-4
        assert abs(row["min_entropy"] - min(hs)) < 1e-4
        assert abs(row["max_entropy"] - max(hs)) < 1e-4


def test_wav_codec_roundtrip_and_chunk_walking():
    """Round 7 audio codec: real RIFF synth/parse round-trip; the parser
    walks chunks (word-aligned) rather than assuming fixed offsets, and
    rejects non-WAV and non-16-bit-PCM payloads."""
    import struct

    import numpy as np
    import pytest as _pytest

    from iceberg_demo_spark.operators.multimodal import parse_wav, synth_wav

    for doc_id in (0, 7, 399, 400, 123456):
        rate, n, dur, peak, ssum = parse_wav(synth_wav(doc_id))
        assert rate == 8000
        assert n == 100 + (doc_id % 400)
        assert dur == n * 1000 // 8000
        samples = [((doc_id * 31 + i * 7) % 2048) - 1024 for i in range(n)]
        assert peak == max(abs(s) for s in samples)
        assert ssum == sum(samples)

    # an extra odd-sized chunk before fmt/data must be skipped (padded)
    pcm = np.array([5, -6, 7], dtype="<i2").tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # word pad
    body = junk + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert parse_wav(wav) == (8000, 3, 0, 7, 6)

    with _pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"NOTAWAVE" + b"\x00" * 64)
    bad_fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
    body = bad_fmt + b"data" + struct.pack("<I", 0)
    with _pytest.raises(ValueError, match="unsupported"):
        parse_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


def test_bigram_vocab_matches_pure_python(spark):
    """doc_bigram_vocab vs a pure-Python recompute at sf0.001: raw
    occurrence counts, per-doc spread, and the full deterministic
    (count DESC, bigram ASC) top-40 ordering."""
    from collections import Counter, defaultdict

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text").collect()
    occ: Counter = Counter()
    spread = defaultdict(set)
    for r in docs:
        tk = r["text"].split(" ")
        for i in range(len(tk) - 1):
            bg = tk[i] + " " + tk[i + 1]
            occ[bg] += 1
            spread[bg].add(r["doc_id"])
    expect = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    rows = registry.QUERIES["doc_bigram_vocab"](spark, SF_SMALL).collect()
    assert [(r["bigram"], r["n_occurrences"]) for r in rows] == expect
    for r in rows:
        assert r["n_docs"] == len(spread[r["bigram"]])


def test_lm_quality_matches_python_recompute(spark):
    """Exact integer recompute of the bigram-LM ppm scoring at sf0.001:
    train P(w2|w1) counts in pure Python, score every doc with the same
    integer-division pipeline, aggregate per (lang, source)."""
    from collections import Counter, defaultdict

    from iceberg_demo_spark.sources import load_tables

    docs = (load_tables(spark, SF_SMALL, ("documents",))["documents"]
            .select("doc_id", "lang", "source", "text").collect())
    c2: Counter = Counter()
    c1: Counter = Counter()
    doc_bgs = {}
    for d in docs:
        t = d.text.split(" ")
        bgs = list(zip(t, t[1:]))
        doc_bgs[d.doc_id] = (d.lang, d.source, bgs)
        for b in bgs:
            c2[b] += 1
            c1[b[0]] += 1
    groups = defaultdict(list)
    for lang, source, bgs in doc_bgs.values():
        if not bgs:
            continue
        s = sum((1_000_000 * c2[b]) // c1[b[0]] for b in bgs)
        groups[(lang, source)].append(s // len(bgs))
    expected = sorted(
        (lang, source, len(v), sum(v) // len(v), min(v), max(v))
        for (lang, source), v in groups.items())
    rows = registry.QUERIES["doc_lm_quality_score"](spark, SF_SMALL).collect()
    got = sorted((r.lang, r.source, r.n_docs, r.avg_ppm, r.min_ppm,
                  r.max_ppm) for r in rows)
    assert got == expected


def test_bm25_indexed_equals_relational_form(spark):
    """The persisted-postings probe returns the identical ranking to
    doc_bm25_search — the layout must not change the answer."""
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_MED
    a = QUERIES["doc_bm25_search"](spark, SF_MED).collect()
    b = QUERIES["doc_bm25_indexed"](spark, SF_MED).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _bpe_reference(word_freqs, rounds):
    """Batched reference BPE (round 10): per round, count pairs once,
    greedy-select up to _BPE_BATCH_K non-conflicting merges from the
    top-_BPE_POOL ranked pool (the trainer's exact rule, via
    _bpe_select), then apply them sequentially in selection order.
    Returns one row per merge: (round, sel_rank, a, b, cnt,
    symbols_after, vocab_after) with post-ROUND corpus stats."""
    from iceberg_demo_spark.operators.text import (
        _BPE_POOL, _BPE_ROUNDS, _bpe_select)

    assert rounds == _BPE_ROUNDS
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for rnd in range(1, rounds + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        ranked = sorted(((a, b, c) for (a, b), c in counts.items()),
                        key=lambda x: (-x[2], x[0], x[1]))[:_BPE_POOL]
        sel = _bpe_select(ranked)
        for a, b, _cnt in sel:
            for w in seqs:
                s, out, i = seqs[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        n_sym = sum(f * len(seqs[w]) for w, f in word_freqs.items())
        vocab = len({t for s in seqs.values() for t in s})
        for j, (a, b, cnt) in enumerate(sel):
            merges.append((rnd, j + 1, a, b, cnt, n_sym, vocab))
    return merges


def test_bpe_merges_match_batched_reference(spark):
    """The distributed batched trainer equals the pure-Python batched
    reference on the real corpus vocabulary, reaches the >=64-merge
    regime (VERDICT r9 #5), and merge_rank is the dense global
    ordinal."""
    from iceberg_demo_spark.operators.text import _BPE_ROUNDS
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_SMALL
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    wf = {}
    for r in docs:
        for tok in r["text"].split(" "):
            wf[tok] = wf.get(tok, 0) + 1
    want = _bpe_reference(wf, _BPE_ROUNDS)
    got = QUERIES["doc_bpe_merges"](spark, SF_SMALL).collect()
    assert [(r["round"], r["sel_rank"], r["a"], r["b"], r["cnt"],
             r["symbols_after"], r["vocab_after"]) for r in got] == want
    assert len(got) >= 64
    assert [r["merge_rank"] for r in got] == list(range(1, len(got) + 1))


def test_bpe_apply_handles_equal_symbol_runs(spark):
    """'aaaa' with winner (a,a) must merge greedily to [aa, aa];
    'aaa' to [aa, a] — the island-parity overlap semantics."""
    from iceberg_demo_spark.operators.text import _bpe_apply
    from pyspark.sql import functions as F
    rows = []
    for w in ("aaaa", "aaa", "baaab"):
        for i, ch in enumerate(w):
            rows.append((w, 1, i + 1, ch))
    df = spark.createDataFrame(rows, "tok string, f long, pos long, sym string")
    top = spark.createDataFrame([("a", "a")], "a string, b string")
    out = _bpe_apply(df, top).orderBy("tok", "pos").collect()
    by_tok = {}
    for r in out:
        by_tok.setdefault(r["tok"], []).append(r["sym"])
    assert by_tok["aaaa"] == ["aa", "aa"]
    assert by_tok["aaa"] == ["aa", "a"]
    assert by_tok["baaab"] == ["b", "aa", "a", "b"]


def test_bpe_encode_matches_reference_token_counts(spark):
    """Per-source post-BPE token totals equal the sequential reference
    encoding applied to every word occurrence."""
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_SMALL
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    wf = {}
    for r in docs:
        for tok in r["text"].split(" "):
            wf[tok] = wf.get(tok, 0) + 1
    from iceberg_demo_spark.operators.text import _BPE_ROUNDS
    merges = _bpe_reference(wf, _BPE_ROUNDS)
    # re-derive final sequences with the reference merges
    seqs = {w: list(w) for w in wf}
    for _rnd, _sr, a, b, *_ in merges:
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(s[i]); i += 1
            seqs[w] = out
    want = {}
    for r in docs:
        src = r["source"]
        agg = want.setdefault(src, [0, 0, 0])
        for tok in r["text"].split(" "):
            agg[0] += 1
            agg[1] += len(tok)
            agg[2] += len(seqs[tok])
    got = QUERIES["doc_bpe_encode"](spark, SF_SMALL).collect()
    for r in got:
        w = want[r["source"]]
        assert (r["n_words"], r["n_chars"], r["n_tokens"]) == tuple(w)
        assert r["tokens_per_char_bps"] == (10000 * w[2]) // w[1]


def test_scene_changes_match_pure_python(spark):
    """Frame signatures, cut counts and deltas equal a direct Python
    recompute of the 32-char frame stream."""
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_SMALL
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()}
    got = QUERIES["multimodal_scene_changes"](spark, SF_SMALL).collect()
    assert got
    for r in got:
        t = docs[r["doc_id"]]
        frames = [t[i:i + 32] for i in range(0, len(t), 32)]
        sigs = [sum(ord(c) for c in f) for f in frames]
        deltas = [abs(b - a) for a, b in zip(sigs, sigs[1:])]
        assert r["n_frames"] == len(frames)
        assert r["total_sig"] == sum(sigs)
        assert r["max_delta"] == (max(deltas) if deltas else 0)
        assert r["n_scene_changes"] == sum(1 for d in deltas if d > 64)


def test_bpe_packing_consistent_with_encode_totals(spark):
    """The packing gate's per-source token totals must equal the encode
    gate's n_tokens — the two consume the same trained vocabulary."""
    from iceberg_demo_spark.registry import QUERIES
    from tests.conftest import SF_SMALL
    enc = {r["source"]: r["n_tokens"] for r in
           QUERIES["doc_bpe_encode"](spark, SF_SMALL).collect()}
    pack = QUERIES["doc_bpe_packing"](spark, SF_SMALL).collect()
    assert pack
    for r in pack:
        assert r["total_tokens"] == enc[r["source"]]
        assert r["n_seqs"] == (r["total_tokens"] - 1) // 2048 + 1
