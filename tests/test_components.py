"""Exact parity for distributed connected components vs a local
union-find over the same verified near-dup pairs."""

from __future__ import annotations

from dend_covid19_spark.operators.components import dedup_components
from dend_covid19_spark.operators.dedup import dedup_ngram_jaccard
from tests.conftest import SF_DIR


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component id = min member, which min-root union preserves
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b").collect()
    ]
    assert pairs, "fixture should contain verified near-dup pairs"
    want = _union_find(pairs)
    got = {
        r.doc_id: r.component for r in dedup_components(spark, SF_DIR).collect()
    }
    assert got == want
    canon = {
        r.doc_id for r in dedup_components(spark, SF_DIR).collect() if r.is_canonical
    }
    assert canon == set(want.values())


def test_prefix_filter_superset_of_lsh(spark):
    """Recall relationship the two candidate generators promise: prefix
    filtering is exhaustive for J >= tau (theorem), LSH banding is
    probabilistic — so every LSH-found verified pair must also be in the
    prefix-filter result, never the reverse."""
    from dend_covid19_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_prefix_filter_join,
    )
    from tests.conftest import SF_DIR

    lsh = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    pf = {
        (r.doc_a, r.doc_b)
        for r in dedup_prefix_filter_join(spark, SF_DIR).collect()
    }
    assert lsh <= pf, f"LSH found pairs the exact join missed: {lsh - pf}"
    assert pf, "prefix filter returned no pairs"
