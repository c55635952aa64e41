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
