"""Shared DuckDB oracle SQL builders for the near-dup pipeline.

Pure string composition over functions/hashing.py — NO imports from
plans/ or operators/, so any module (dedup operators, components,
corpus-level pipeline queries) can compose these CTEs at decoration time
without creating an import cycle through the query registry.
"""

from __future__ import annotations

from . import hashing as H


def duck_minhash_cte() -> str:
    """WITH-body producing (doc_id, shingles, sig) plus LSH band keys and
    deduped candidate pairs — the oracle twin of the Spark-side
    ``_minhash_sigs`` + banding in operators/dedup.py."""
    toks = H.duck_tokens("text")
    shingles = H.duck_shingles("toks")
    return f"""
tok AS (SELECT doc_id, {toks} AS toks FROM documents),
sh AS (SELECT doc_id, {shingles} AS shingles FROM tok),
hs AS (SELECT doc_id, shingles, {H.duck_shingle_hashes('shingles')} AS hs FROM sh),
sigs AS (SELECT doc_id, shingles, {H.duck_minhash_sig('hs')} AS sig FROM hs),
bands AS (
    SELECT doc_id, j.j AS band_id,
           md5(array_to_string(sig[j.j * {H.ROWS} + 1 : j.j * {H.ROWS} + {H.ROWS}], '-')) AS band_key
    FROM sigs CROSS JOIN (SELECT unnest(range(0, {H.BANDS})) AS j) j
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)"""


def duck_components_ctes() -> str:
    """WITH-body (requires the RECURSIVE keyword) extending the minhash
    CTEs with the exact-Jaccard verified pairs, symmetric edges, and the
    transitive closure reach(node, r): node reaches r iff node = r's
    origin or some edge (node, b) has reach(b, r). UNION-dedup bounds
    the recursion; min(r) per node is the component label."""
    return f"""{duck_minhash_cte()},
pairs AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.doc_a
    JOIN sigs sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.5
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.a, re.r FROM edges e JOIN reach re ON re.node = e.b
)"""
