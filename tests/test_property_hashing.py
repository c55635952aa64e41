"""Property-based cross-engine equivalence for the portable hashing layer
(functions/hashing.py): on *generated* texts — not just the fixed corpus —
Spark expressions and their DuckDB twins must produce identical shingles,
32-bit hashes, MinHash signatures, and SimHash fingerprints. A divergence
here would silently corrupt every dedup oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from dend_covid19_spark.functions import hashing as H

WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
TEXT = st.lists(WORD, min_size=1, max_size=40).map(" ".join)


def _spark_exprs(spark, texts):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    toks = H.spark_tokens("text")
    return (
        df.withColumn("h32", F.expr(H.spark_hash32("text")))
        .withColumn("shingles", F.expr(H.spark_shingles(toks)))
        .withColumn("hs", F.expr(H.spark_shingle_hashes("shingles")))
        .withColumn("sig", F.expr(H.spark_minhash_sig("hs")))
        .withColumn("th", F.expr(H.spark_token_hashes(toks)))
        .withColumn("simhash", F.expr(H.spark_simhash("th")))
        .select("text", "h32", "shingles", "sig", "simhash")
        .collect()
    )


def _duck_exprs(texts):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": texts}))
    toks = H.duck_tokens("text")
    sql = f"""
    WITH tok AS (SELECT text, {toks} AS toks FROM t),
    sh AS (SELECT text, toks, {H.duck_shingles('toks')} AS shingles FROM tok),
    hs AS (SELECT text, toks, shingles, {H.duck_shingle_hashes('shingles')} AS hs FROM sh),
    th AS (SELECT text, toks, shingles, hs, {H.duck_token_hashes('toks')} AS th FROM hs)
    SELECT text,
           {H.duck_hash32('text')} AS h32,
           shingles,
           {H.duck_minhash_sig('hs')} AS sig,
           {H.duck_simhash('th')} AS simhash
    FROM th
    """
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6, unique=True))
def test_hashing_layer_matches_duckdb(spark, texts):
    s = {r.text: (r.h32, tuple(r.shingles), tuple(r.sig), r.simhash) for r in _spark_exprs(spark, texts)}
    d = {t: (h, tuple(sh), tuple(sig), sim) for t, h, sh, sig, sim in _duck_exprs(texts)}
    assert s == d


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=20, deadline=None)
def test_morton_interleave_matches_reference(spark, pairs):
    """The z-order magic-mask spread must equal the bit-by-bit Morton
    reference for arbitrary 16-bit pairs, in BOTH dialects (Spark
    shiftleft() and DuckDB <<) — the expression zorder_layout_orders
    builds its curve from."""
    from dend_covid19_spark.operators.scale import _duck_shl, _morton2, _spark_shl

    def reference(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    want = [reference(x, y) for x, y in pairs]

    expr = _morton2("x", "y", _spark_shl)
    df = spark.createDataFrame(pairs, "x long, y long").selectExpr(f"{expr} AS z")
    got_spark = [r.z for r in df.collect()]
    assert got_spark == want

    con = duckdb.connect()
    dexpr = _morton2("x", "y", _duck_shl)
    # VALUES literals type as INTEGER; shift in BIGINT like the real op
    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {dexpr} FROM (SELECT CAST(xi AS BIGINT) AS x, "
            f"CAST(yi AS BIGINT) AS y FROM (VALUES {vals}) t(xi, yi)) s"
        ).fetchall()
    ]
    assert got_duck == want


@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=(2**63 - 1) // 325089),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None)
def test_ewma_integer_numerator_exact_at_boundary(spark, lag_rows):
    """The EWMA integer dot-product (plans/timeseries.py _EWMA_NUMER)
    must equal Python big-int arithmetic — and agree across engines —
    right up to its documented headroom cents < 2^63 / EWMA_DENOM
    (~2.8e13 cents = $2.8e11 daily revenue per type; the strategy
    generates at that bound). A silent int64 wrap here would flip the
    driver hash only at scales the driver never tests, which is exactly
    why the boundary gets its own property pin (r5 verdict item 6)."""
    from dend_covid19_spark.plans.timeseries import (
        _EWMA_NUMER,
        EWMA_COEFS,
        EWMA_DENOM,
    )

    assert EWMA_DENOM == 325089  # strategy bound above must track the constant
    want = [
        sum(c * v for c, v in zip(EWMA_COEFS, row)) for row in lag_rows
    ]
    assert all(w < 2**63 for w in want)  # the headroom claim itself

    schema = ", ".join(f"l{k} long" for k in range(8))
    df = spark.createDataFrame([tuple(r) for r in lag_rows], schema)
    got_spark = [r.n for r in df.selectExpr(f"{_EWMA_NUMER} AS n").collect()]
    assert got_spark == want

    con = duckdb.connect()
    con.register("lags", pd.DataFrame(
        {f"l{k}": [r[k] for r in lag_rows] for k in range(8)}
    ))
    got_duck = [
        r[0] for r in con.execute(f"SELECT {_EWMA_NUMER} FROM lags").fetchall()
    ]
    con.close()
    assert got_duck == want


# --- PPJoin filter soundness (r13) -------------------------------------------
# A pure-Python mirror of operators/dedup.py::_ppjoin_candidates over
# random small shingle universes: for EVERY pair with true Jaccard >=
# 1/2, the prefix theorem must produce a collision, the length filter
# must hold, and the position bound (m collisions + tails past the last
# collision under the global rarity order) must be >= the true overlap
# — i.e. the filters can never prune a qualifying pair, for any corpus
# Hypothesis can construct (including all-identical docs, disjoint
# docs, and singleton shingle sets).


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_ppjoin_filter_math_never_prunes_qualifying_pairs(docsets):
    # global rarity order: (document frequency, shingle value)
    from collections import Counter

    df = Counter()
    for s in docsets:
        df.update(s)
    order = {s: (df[s], s) for s in df}

    def ranked(doc):
        return sorted(doc, key=lambda s: order[s])

    def prefix(doc):
        n = len(doc)
        plen = n - (n + 1) // 2 + 1  # tau = 1/2
        return ranked(doc)[:plen]

    for i in range(len(docsets)):
        for j in range(i + 1, len(docsets)):
            a, b = docsets[i], docsets[j]
            inter = len(a & b)
            union = len(a | b)
            if inter / union < 0.5:
                continue  # only qualifying pairs carry guarantees
            na, nb = len(a), len(b)
            # length filter holds for every qualifying pair
            assert 2 * min(na, nb) >= max(na, nb)
            # prefix theorem: at least one collision inside both prefixes
            pa, pb = prefix(a), prefix(b)
            collisions = set(pa) & set(pb)
            assert collisions, (a, b)
            # position bound >= true overlap: m collisions + tails past
            # the LAST collision in each side's global order
            ra = {s: k + 1 for k, s in enumerate(ranked(a))}
            rb = {s: k + 1 for k, s in enumerate(ranked(b))}
            ia = max(ra[s] for s in collisions)
            jb = max(rb[s] for s in collisions)
            m = len(collisions)
            bound = m + min(na - ia, nb - jb)
            assert bound >= inter, (a, b, bound, inter)
            # alpha gate passes for qualifying pairs
            alpha = (na + nb + 2) // 3
            assert bound >= alpha or inter < alpha  # contrapositive safety
            assert inter >= alpha  # J >= 1/2 <=> O >= ceil((na+nb)/3)
            assert bound >= alpha
