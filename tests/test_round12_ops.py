"""Round-12 additions: the servable IVF multi-probe ANN index with its
PINNED recall floor (the r11 verdict's top perf-quality item), plus the
operators added later in the round. Each row gets oracle parity (the
driver's check, at the fixture SF) plus the invariants the oracle alone
can't pin."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by later tests)

from dend_covid19_spark.plans.registry import get_spec

from conftest import SF_DIR, assert_matches_oracle


def test_ivf_multiprobe_recall_oracle_parity(spark, duck):
    from dend_covid19_spark.operators.similarity import ann_ivf_multiprobe_recall

    assert_matches_oracle(
        ann_ivf_multiprobe_recall(spark, SF_DIR),
        duck,
        get_spec("ann_ivf_multiprobe_recall").oracle,
        "ann_ivf_multiprobe_recall",
    )


def test_ivf_multiprobe_recall_floor(spark):
    """The production-recall pin: mean recall@10 of the trained-codebook
    IVF index at nprobe=6 must clear 800000 ppm — the 'would we serve
    this index' bar the r11 verdict asked for (the sign-LSH audit row
    measures 0-10% on this corpus; this is the index that replaces it).
    Measured at design time: 920000 ppm at sf0.01, 840000 ppm at sf0.1."""
    from dend_covid19_spark.operators.similarity import (
        RECALL_K,
        RECALL_QUERY_IDS,
        ann_ivf_multiprobe_recall,
    )

    rows = ann_ivf_multiprobe_recall(spark, SF_DIR).collect()
    assert {r.query_id for r in rows} == set(RECALL_QUERY_IDS)
    total_hits = sum(r.n_hits for r in rows)
    mean_recall_ppm = total_hits * 1_000_000 // (RECALL_K * len(rows))
    assert mean_recall_ppm >= 800_000, f"recall floor broken: {mean_recall_ppm} ppm"
    for r in rows:
        assert 0 <= r.n_hits <= RECALL_K
        assert r.recall_ppm == r.n_hits * 1_000_000 // RECALL_K
        # the probe set must actually bound the scan: candidates are a
        # strict subset of the corpus (nprobe=6 of 16 cells)
        assert r.n_candidates < 500 * 0.8


def test_ivf_multiprobe_beats_single_bucket_lsh(spark):
    """The pairing that justifies two recall rows: the servable IVF
    index must strictly dominate the single-bucket sign-LSH audit row
    on total hits over the same panel."""
    from dend_covid19_spark.operators.similarity import (
        ann_ivf_multiprobe_recall,
        ann_recall_audit,
    )

    ivf = sum(r.n_hits for r in ann_ivf_multiprobe_recall(spark, SF_DIR).collect())
    lsh = sum(r.n_hits for r in ann_recall_audit(spark, SF_DIR).collect())
    assert ivf > lsh, (ivf, lsh)
