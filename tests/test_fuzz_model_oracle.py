"""Model-space fuzz of the inference stage (VERDICT r10 item 7): vary
the WEIGHTS, BIAS, and FEATURE set, re-derive the DuckDB oracle CTE
from the same randomized constants, and require the Spark forward pass
(JVM featurization + Arrow matmul UDF) to hash-match it.

The fixed-constant row (model_inference_annotator) proves one model;
this proves the CONSTRUCTION — in particular the argmax tie-break
convention (numpy first-max vs the oracle's ordered CASE), negative
and zero weights (zero weights are elided from the oracle's score
expression), and bias-only classes. Any divergence is a genuine
portability bug in duck_model_cte or the UDF.
"""

from __future__ import annotations

import random

import pytest

from dend_covid19_spark.functions import model as M
from tests.conftest import SF_DIR, assert_matches_oracle

# corpus tokens (quote-free, single words) the featurizer can count
_TOKEN_POOL = (
    "spark merge fast slow error customer order value window table scan "
    "join hash sort batch stream key row part line agg filter group the a"
).split()

SEEDS = (3, 17, 41)


def _random_model(rng: random.Random):
    n_feat = rng.randrange(3, 9)
    n_classes = rng.randrange(2, 5)
    features = rng.sample(_TOKEN_POOL, n_feat)
    # small ints incl. negatives and zeros; force one all-zero (bias
    # only) class row when possible to hit the elision path
    weights = [
        [rng.randrange(-3, 4) for _ in range(n_feat)] for _ in range(n_classes)
    ]
    if n_classes >= 3:
        weights[1] = [0] * n_feat
    bias = [rng.randrange(-2, 3) for _ in range(n_classes)]
    classes = [f"c{i}" for i in range(n_classes)]
    return features, classes, weights, bias


@pytest.mark.parametrize("seed", SEEDS)
def test_randomized_model_matches_rederived_oracle(spark, duck, monkeypatch, seed):
    rng = random.Random(seed)
    for _ in range(3):  # a few models per seed
        features, classes, weights, bias = _random_model(rng)
        monkeypatch.setattr(M, "MODEL_FEATURES", features)
        monkeypatch.setattr(M, "MODEL_CLASSES", classes)
        monkeypatch.setattr(M, "MODEL_WEIGHTS", weights)
        monkeypatch.setattr(M, "MODEL_BIAS", bias)

        from dend_covid19_spark.catalog import load_table

        docs = load_table(spark, "documents", SF_DIR)
        out = M.annotate_topic(docs).select("doc_id", "topic_label", "topic_score")
        oracle = (
            "WITH "
            + M.duck_model_cte()
            + "\nSELECT doc_id, topic_label, topic_score FROM mpred"
        )
        assert_matches_oracle(out, duck, oracle, name=f"model seed={seed}")


def test_tie_break_is_first_class_under_uniform_zero_model(spark, duck, monkeypatch):
    """The all-ties extreme: zero weights + equal bias score every class
    identically for every row, so EVERY row is an argmax tie — the
    convention (first class wins) must hold globally on both engines."""
    monkeypatch.setattr(M, "MODEL_FEATURES", ["spark", "merge"])
    monkeypatch.setattr(M, "MODEL_CLASSES", ["alpha", "beta", "gamma"])
    monkeypatch.setattr(M, "MODEL_WEIGHTS", [[0, 0], [0, 0], [0, 0]])
    monkeypatch.setattr(M, "MODEL_BIAS", [7, 7, 7])

    from dend_covid19_spark.catalog import load_table

    docs = load_table(spark, "documents", SF_DIR)
    out = M.annotate_topic(docs).select("doc_id", "topic_label", "topic_score")
    rows = out.collect()
    assert rows and all(r.topic_label == "alpha" and r.topic_score == 7 for r in rows)
    oracle = (
        "WITH "
        + M.duck_model_cte()
        + "\nSELECT doc_id, topic_label, topic_score FROM mpred"
    )
    assert_matches_oracle(out, duck, oracle, name="model all-ties")
