"""The linear-model annotator: forward-pass correctness, the numpy
first-max tie-break the oracle must mirror, and the JVM/Python split
(featurization never enters the UDF)."""

from __future__ import annotations

import numpy as np

from dend_covid19_spark.functions.model import (
    MODEL_BIAS,
    MODEL_CLASSES,
    MODEL_FEATURES,
    MODEL_WEIGHTS,
    annotate_topic,
    extract_features,
)


def _expected(text: str) -> tuple[str, int]:
    toks = text.split(" ")
    x = np.array([toks.count(t) for t in MODEL_FEATURES], dtype=np.int64)
    scores = np.asarray(MODEL_WEIGHTS) @ x + np.asarray(MODEL_BIAS)
    best = int(scores.argmax())
    return MODEL_CLASSES[best], int(scores[best])


def test_forward_pass_matches_numpy(spark):
    texts = [
        "spark merge spark fast value",
        "customer order order value the",
        "slow error error scan",
        "nothing matching at all",  # all-zero features -> bias decides
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.topic_label, r.topic_score)
        for r in annotate_topic(df).collect()
    }
    assert got == {i: _expected(t) for i, t in enumerate(texts)}


def test_tie_breaks_first_class_like_numpy(spark):
    # "spark value order" -> infra 3+1=4... craft an exact tie instead:
    # infra: spark(3)+value(1)=4 ; commerce: order(3)+value(2)+bias(1)...
    # use all-zero text: scores = bias = [0, 1, 0] -> commerce wins.
    # exact two-way tie: "merge merge customer" -> infra 4, commerce 3+1=4,
    # ops 0 -> first max is infra (index 0), numpy convention.
    df = spark.createDataFrame(
        [(1, "merge merge customer"), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.topic_label for r in annotate_topic(df).collect()}
    assert rows[1] == _expected("merge merge customer")[0] == "infra"
    assert rows[2] == "commerce"  # bias-only argmax


def test_featurization_stays_jvm_side(spark):
    """The feature counts must be codegen expressions, not Python: the
    featurized plan with the UDF column dropped contains no
    ArrowEvalPython / BatchEvalPython node."""
    df = spark.createDataFrame([(1, "spark")], "doc_id long, text string")
    plan = extract_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_file_backed_weights_match_closure_path(spark, tmp_path):
    """The executor-local-artifact variant must produce bit-identical
    predictions to the closure-pickled path — same forward pass, only
    the weight distribution mechanism differs."""
    from pyspark.sql import functions as F

    from dend_covid19_spark.functions.model import (
        model_predict,
        model_predict_from_file,
        save_weights,
    )

    path = save_weights(str(tmp_path / "model.json"))
    df = spark.createDataFrame(
        [
            (1, "spark merge spark fast value"),
            (2, "customer order order value the"),
            (3, "slow error error scan"),
        ],
        "doc_id long, text string",
    )
    feat = extract_features(df)
    a = feat.withColumn("p", model_predict()(F.col("features")))
    b = feat.withColumn("p", model_predict_from_file(path)(F.col("features")))
    rows_a = {(r.doc_id, r.p.label, r.p.score) for r in a.collect()}
    rows_b = {(r.doc_id, r.p.label, r.p.score) for r in b.collect()}
    assert rows_a == rows_b
