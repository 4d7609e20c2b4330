"""Graph-operator tests: integer PageRank over the shared-window graph."""

from __future__ import annotations

from iceberg_demo_spark import registry
from tests.conftest import SF_SMALL

registry.load_all()


def test_pagerank_matches_pure_python(spark):
    """graph_doc_pagerank vs a pure-Python recompute at sf0.001: same
    edges (docs sharing a 64/32 window, both directions), same two
    integer fixed-point iterations, same (rank DESC, doc_id) top-20 —
    exact equality, including the rank values."""
    import hashlib
    from collections import defaultdict

    S = 1_000_000_000
    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "n_chars", "text").collect())
    by_hash = defaultdict(set)
    for r in docs:
        for s in range(1, max(r["n_chars"] - 63, 1) + 1, 32):
            h = hashlib.md5(r["text"][s - 1:s + 63].encode()).hexdigest()
            by_hash[h].add(r["doc_id"])
    nbrs = defaultdict(set)
    for ds in by_hash.values():
        for a in ds:
            for b in ds:
                if a != b:
                    nbrs[a].add(b)
    deg = {a: len(bs) for a, bs in nbrs.items()}
    rank = {a: S for a in deg}
    for _ in range(2):
        contrib = defaultdict(int)
        for a, bs in nbrs.items():
            share = rank[a] // deg[a]
            for b in bs:
                contrib[b] += share
        rank = {b: 15 * S // 100 + (85 * s) // 100
                for b, s in contrib.items()}
    exp = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["doc_id"], r["rank"])
           for r in registry.QUERIES["graph_doc_pagerank"](
               spark, SF_SMALL).collect()]
    assert got == exp and len(got) == 20
    # hubs must out-rank the floor a no-inbound node would get
    assert got[0][1] > 15 * S // 100
