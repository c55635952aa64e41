"""BPE train-loop invariants across the two rounds (value correctness
is oracle-checked; these pin the merge semantics)."""

from __future__ import annotations

from dend_covid19_spark.plans.textops import bpe_merge_round2, bpe_pair_counts

from conftest import SF_DIR


def test_round2_applied_the_round1_argmax(spark):
    """The merge rule carried in round two's output must be exactly the
    top pair of round one (count desc, pair asc — the declared total
    order)."""
    top1 = bpe_pair_counts(spark, SF_DIR).limit(1).collect()[0]
    expected_rule = top1.pair.replace("|", "")
    rows = bpe_merge_round2(spark, SF_DIR).collect()
    assert rows
    assert {r.merge_rule for r in rows} == {expected_rule}


def test_merged_pair_absent_from_round2(spark):
    """After a greedy leftmost merge of single-char pair (x, y), no
    literal adjacent x|y can survive in any word (every remaining
    occurrence would itself have been replaced) — so round two's pair
    distribution must not contain round one's argmax pair."""
    rows = bpe_merge_round2(spark, SF_DIR).collect()
    rule = rows[0].merge_rule
    merged_pair = f"{rule[0]}|{rule[1]}"
    assert merged_pair not in {r.pair for r in rows}


def test_round2_pairs_reference_merged_symbol(spark):
    """The point of the round: the merged symbol participates as a side
    of at least one top round-two pair at test scale."""
    rows = bpe_merge_round2(spark, SF_DIR).collect()
    rule = rows[0].merge_rule
    assert any(rule in r.pair.split("|") for r in rows)


def test_round4_rules_distinct_and_expanded(spark):
    """N-round trainer invariants: one rule per round, counts
    non-increasing is NOT required (later merges can beat earlier
    residuals) but every expanded rule must be sentinel-free base text,
    length >= 2, and all rules distinct (a repeated rule would mean the
    merge was never applied)."""
    from dend_covid19_spark.plans.textops import BPE_MERGE_ROUNDS, bpe_merge_round4

    rows = sorted(
        bpe_merge_round4(spark, SF_DIR).collect(), key=lambda r: r.merge_round
    )
    assert [r.merge_round for r in rows] == list(range(1, BPE_MERGE_ROUNDS + 1))
    rules = [r.merge_rule for r in rows]
    assert len(set(rules)) == len(rules)
    for rule in rules:
        assert len(rule) >= 2
        assert all(ord(ch) >= 32 for ch in rule), f"unexpanded sentinel in {rule!r}"


def test_collapse_guard_each_round(spark):
    """The descending-sequence guard, per round: a corpus where the hot
    pair collapses whole words to a single symbol must not fabricate
    pairs (Spark's sequence(1, 0) descends). 'ab' everywhere -> round 1
    merges a|b and drops the collapsed words; later rounds keep
    training on what remains instead of erroring or double-counting."""
    import duckdb as _duck

    from dend_covid19_spark.plans.textops import _bpe_rounds_oracle, bpe_merge_round4

    docs = [
        (i, "ab ab ab cd", "en", "synth", 11) for i in range(5)
    ] + [(99, "ab xy xy", "en", "synth", 8)]
    schema = "doc_id long, text string, lang string, source string, n_chars int"
    sdf = spark.createDataFrame(docs, schema)
    sdf.createOrReplaceTempView("__bpe_docs")
    # Spark side on the planted frame
    import dend_covid19_spark.plans.textops as T

    orig = T.load_table
    try:
        T.load_table = lambda s, name, sf: sdf if name == "documents" else orig(s, name, sf)
        got = {
            (r.merge_round, r.merge_rule, r.cnt)
            for r in bpe_merge_round4(spark, "ignored").collect()
        }
    finally:
        T.load_table = orig
    con = _duck.connect()
    import pandas as pd

    con.register(
        "documents",
        pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"]),
    )
    want = {tuple(t) for t in con.execute(_bpe_rounds_oracle()).fetchall()}
    assert got == want
    assert ("ab" in {r[1] for r in got})  # round 1 merged the hot pair


def test_encode_corpus_saves_symbols(spark):
    """Train->apply invariants: syms_after <= syms_before per source
    (replace never lengthens: 2 chars -> 1 sentinel), total savings > 0
    (the learned rules actually occur in the corpus), and the global
    saving equals the total occurrence count of all four applied rules."""
    from dend_covid19_spark.plans.textops import bpe_encode_corpus

    rows = bpe_encode_corpus(spark, SF_DIR).collect()
    assert rows
    assert all(r.syms_after <= r.syms_before for r in rows)
    assert sum(r.syms_before - r.syms_after for r in rows) > 0
