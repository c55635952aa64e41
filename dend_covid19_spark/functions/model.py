"""Model-based annotator: REAL vectorized model inference — fixed
weights, Arrow batches, numpy matmul — closing the r9 "model-based
annotator" gap honestly inside a container with no model runtime.

The reference's annotator is Spark NLP's
``PretrainedPipeline('analyze_sentiment')``
(/root/reference/airflow/dags/tasks/tweets.py:53-54): download weights,
run batched inference on executors. The lexicon scorer
(functions/annotator.py) covered the df->df *shape*; this module runs
the actual inference MECHANICS: a linear classifier whose integer
weight matrix ships to executors inside the UDF closure (pickled by
value — exactly how small-model weights ride along; big ones would use
``SparkContext.broadcast`` or an executor-local file, same plan), and
whose forward pass is one vectorized ``X @ W.T + b`` per Arrow batch —
no per-row Python.

The split of labor is the production pattern for featurized models:
  - feature extraction (token counts) stays JVM-side in codegen
    (``size(filter(split(...)))`` per feature) — the scan and filter
    pushdown are never blocked by Python;
  - only the dense math crosses into the pandas UDF, batch-at-a-time.

INTEGER weights + integer counts => integer scores, so the DuckDB
oracle can restate the whole forward pass (scores, argmax with
first-index tie-break — numpy's argmax convention) exactly, making
this a hash-verified inference stage, not a demo.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the "model": topic heads over token-count features. Tuned for the
# corpus vocabulary; any fixed integers verify the same way.
MODEL_FEATURES = [
    "spark", "merge", "fast", "slow", "error", "customer", "order", "value",
]
MODEL_CLASSES = ["infra", "commerce", "ops"]
MODEL_WEIGHTS = [
    [3, 2, 1, 0, 0, 0, 0, 1],  # infra
    [0, 0, 0, 0, 0, 3, 3, 2],  # commerce
    [1, 0, 2, 2, 3, 0, 0, 0],  # ops
]
MODEL_BIAS = [0, 1, 0]


def extract_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """JVM-side featurization: one codegen'd count per model feature,
    packed into an int array column — Python sees only dense vectors."""
    counts = [
        F.expr(f"size(filter(split({text_col}, ' '), t -> t = '{tok}'))")
        for tok in MODEL_FEATURES
    ]
    return df.withColumn("features", F.array(*counts))


def model_predict():
    """The inference UDF: Arrow batch of feature vectors -> one matmul
    against the closure-captured weights -> (label, score) struct per
    row. Self-contained closure (weights captured by value), so
    executors need no package import."""
    w = np.asarray(MODEL_WEIGHTS, dtype=np.int64)
    b = np.asarray(MODEL_BIAS, dtype=np.int64)
    classes = list(MODEL_CLASSES)

    @F.pandas_udf("label string, score bigint")
    def _predict(feats: pd.Series) -> pd.DataFrame:
        x = np.vstack(feats.to_numpy()).astype(np.int64)  # (n, n_feat)
        scores = x @ w.T + b  # (n, n_classes) — THE forward pass
        best = scores.argmax(axis=1)  # first max wins on ties
        return pd.DataFrame(
            {
                "label": [classes[i] for i in best],
                "score": scores[np.arange(len(best)), best],
            }
        )

    return _predict


# per-worker-process weight cache for file-backed inference: loaded at
# most once per (path, mtime) per Python worker, NOT per task — the
# discipline that matters when weights are GBs, not a 3x8 matrix
_WORKER_WEIGHTS: dict = {}


def save_weights(path: str) -> str:
    """Publish the model artifact (weights + bias + classes) to a file
    executors can load — the stand-in for 'weights on the lake /
    executor-local disk'. Returns the path."""
    import json as _json

    with open(path, "w") as fh:
        _json.dump(
            {
                "weights": MODEL_WEIGHTS,
                "bias": MODEL_BIAS,
                "classes": MODEL_CLASSES,
            },
            fh,
        )
    return path


def model_predict_from_file(weights_path: str):
    """The BIG-model variant of ``model_predict``: the UDF closure
    carries only the artifact PATH; each Python worker process loads
    the weights lazily on first batch and caches them keyed by
    (path, mtime) — one load per worker lifetime, not one pickle per
    task. This is how real checkpoint-sized weights reach executors
    (broadcast variables re-ship per job; executor-local/lake files +
    a worker cache don't). Same forward pass, bit-identical output to
    the closure path (pytest-pinned)."""

    @F.pandas_udf("label string, score bigint")
    def _predict(feats: pd.Series) -> pd.DataFrame:
        import json as _json
        import os as _os

        import numpy as _np
        import pandas as _pd

        key = (weights_path, _os.path.getmtime(weights_path))
        model = _WORKER_WEIGHTS.get(key)
        if model is None:
            with open(weights_path) as fh:
                obj = _json.load(fh)
            model = (
                _np.asarray(obj["weights"], dtype=_np.int64),
                _np.asarray(obj["bias"], dtype=_np.int64),
                list(obj["classes"]),
            )
            _WORKER_WEIGHTS.clear()  # one live artifact per worker
            _WORKER_WEIGHTS[key] = model
        w, b, classes = model
        x = _np.vstack(feats.to_numpy()).astype(_np.int64)
        scores = x @ w.T + b
        best = scores.argmax(axis=1)
        return _pd.DataFrame(
            {
                "label": [classes[i] for i in best],
                "score": scores[_np.arange(len(best)), best],
            }
        )

    return _predict


def annotate_topic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """df -> df with (topic_label, topic_score): featurize JVM-side,
    infer batch-wise in Python — the Spark NLP annotate() contract
    (appends columns, preserves partitioning, no shuffle)."""
    pred = model_predict()(F.col("features"))
    return (
        extract_features(df, text_col)
        .withColumn("_pred", pred)
        .withColumn("topic_label", F.col("_pred.label"))
        .withColumn("topic_score", F.col("_pred.score"))
        .drop("_pred", "features")
    )


def duck_model_cte(table: str = "documents", text_col: str = "text") -> str:
    """The forward pass restated for DuckDB from the SAME constants:
    per-class integer scores and numpy-convention argmax (first max
    wins). Single source of truth — weights change, oracle follows."""
    feat_cols = ", ".join(
        f"len(list_filter(string_split({text_col}, ' '), t -> t = '{tok}'))"
        f" AS f{i}"
        for i, tok in enumerate(MODEL_FEATURES)
    )
    score_cols = ", ".join(
        " + ".join(
            [f"{w}*f{j}" for j, w in enumerate(MODEL_WEIGHTS[c]) if w]
            + [str(MODEL_BIAS[c])]
        )
        + f" AS s{c}"
        for c in range(len(MODEL_CLASSES))
    )
    n = len(MODEL_CLASSES)
    label_case = "CASE " + " ".join(
        f"WHEN {' AND '.join(f's{c} >= s{o}' for o in range(n) if o != c)}"
        f" THEN '{MODEL_CLASSES[c]}'"
        for c in range(n - 1)
    ) + f" ELSE '{MODEL_CLASSES[n - 1]}' END"
    greatest = "greatest(" + ", ".join(f"s{c}" for c in range(n)) + ")"
    return f"""
mfeat AS (SELECT doc_id, {feat_cols} FROM {table}),
mscore AS (SELECT doc_id, {score_cols} FROM mfeat),
mpred AS (
    SELECT doc_id, {label_case} AS topic_label,
           CAST({greatest} AS BIGINT) AS topic_score
    FROM mscore
)"""
