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
