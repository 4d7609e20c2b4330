"""Property-based tests for the sketch tier and the BPE merge loop: the
distributed forms must equal their sequential definitions on ARBITRARY
generated inputs, not just the documents corpus. Mirrors the hypothesis
suites in test_mor.py / test_temporal_properties.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_demo_spark.operators.sketches import (
    _KMV_K, _KMV_M, kmv_estimate, kmv_sketch)
from iceberg_demo_spark.operators.text import _bpe_apply, _bpe_select

# values across the whole 52-bit domain, with small values (the sketch's
# business end) overrepresented
_vals = st.lists(
    st.one_of(st.integers(min_value=0, max_value=10_000),
              st.integers(min_value=0, max_value=_KMV_M - 1)),
    min_size=1, max_size=300, unique=True)


@given(a=_vals, b=_vals)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_merge_law_on_arbitrary_sets(spark, a, b):
    """k smallest of (bottom-k(A) ∪ bottom-k(B)) == bottom-k(A ∪ B)."""
    adf = spark.createDataFrame([("g", int(v)) for v in a], "g string, v long")
    bdf = spark.createDataFrame([("g", int(v)) for v in b], "g string, v long")
    merged = kmv_sketch(
        kmv_sketch(adf, "g", "v").unionByName(kmv_sketch(bdf, "g", "v")),
        "g", "v")
    want = sorted(set(a) | set(b))[:_KMV_K]
    assert sorted(r["v"] for r in merged.collect()) == want


@given(vks=st.lists(st.integers(min_value=1, max_value=_KMV_M),
                    min_size=1, max_size=30, unique=True))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_estimate_floor_equals_python_on_arbitrary_divisors(spark, vks):
    n_lit = (_KMV_K - 1) * _KMV_M
    df = spark.createDataFrame([(int(v),) for v in vks], "vk: bigint")
    got = df.select("vk", kmv_estimate(F.lit(_KMV_K), F.col("vk"))
                    .alias("e")).collect()
    for r in got:
        assert r["e"] == n_lit // r["vk"], r["vk"]


def _ref_merge(word: str, a: str, b: str) -> list[str]:
    s, out, i = list(word), [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


@given(words=st.lists(st.text(alphabet="ab", min_size=1, max_size=12),
                      min_size=1, max_size=8, unique=True),
       pair=st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_apply_equals_sequential_greedy_on_arbitrary_words(
        spark, words, pair):
    """The island-parity rewrite equals the sequential greedy merge for
    every word over a 2-symbol alphabet — the densest overlap regime
    (single-pair batch)."""
    rows = [(w, 1, i + 1, ch)
            for w in words for i, ch in enumerate(w)]
    df = spark.createDataFrame(
        rows, "tok string, f long, pos long, sym string")
    top = spark.createDataFrame([pair], "a string, b string")
    got: dict[str, list] = {}
    for r in _bpe_apply(df, top).orderBy("tok", "pos").collect():
        got.setdefault(r["tok"], []).append(r["sym"])
    for w in words:
        assert got[w] == _ref_merge(w, *pair), (w, pair)


def _ref_merge_syms(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_ALPHA = "abc"
_ALL_PAIRS = [(x, y) for x in _ALPHA for y in _ALPHA]


@given(words=st.lists(st.text(alphabet=_ALPHA, min_size=1, max_size=14),
                      min_size=1, max_size=10, unique=True),
       cand=st.permutations(_ALL_PAIRS))
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_batched_bpe_apply_equals_sequential_per_pair(spark, words, cand):
    """VERDICT r9 #5: a BATCH of merges passing the non-conflict filter
    (_bpe_select) applied in ONE island-parity pass equals applying the
    same merges SEQUENTIALLY one pair at a time, in selection order AND
    in reverse order (the constraint makes them commute) — the property
    that lets training accept 16 merges per corpus-count round."""
    sel = _bpe_select([(a, b, 1) for a, b in cand])
    rows = [(w, 1, i + 1, ch)
            for w in words for i, ch in enumerate(w)]
    df = spark.createDataFrame(
        rows, "tok string, f long, pos long, sym string")
    sel_df = spark.createDataFrame([(a, b) for a, b, _ in sel],
                                   "a string, b string")
    got: dict[str, list] = {}
    for r in _bpe_apply(df, sel_df).orderBy("tok", "pos").collect():
        got.setdefault(r["tok"], []).append(r["sym"])
    for w in words:
        ref = list(w)
        for a, b, _ in sel:
            ref = _ref_merge_syms(ref, a, b)
        assert got[w] == ref, (w, sel)
        rev = list(w)
        for a, b, _ in reversed(sel):
            rev = _ref_merge_syms(rev, a, b)
        assert rev == ref, (w, sel)
