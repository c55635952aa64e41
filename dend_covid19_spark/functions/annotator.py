"""Annotator stage (SURVEY.md U2): df -> df with appended annotation
columns — the *shape* of the reference's Spark NLP
``PretrainedPipeline('analyze_sentiment').annotate(df, 'full_text')``
(/root/reference/airflow/dags/tasks/tweets.py:53-54) without the model:
a deterministic lexicon scorer as an Arrow-vectorized pandas_udf.

Swap ``_LEXICON`` / ``score_text`` for a real model (or an inference
service call) without changing the plan: the stage contract is just
"appends columns, preserves partitioning, no shuffle"."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIVE = {"fast", "small", "value", "merge"}
_NEGATIVE = {"slow", "big", "error", "dup"}


def score_text(text: str) -> str:
    pos = neg = 0
    for t in text.split(" "):
        if t in _POSITIVE:
            pos += 1
        elif t in _NEGATIVE:
            neg += 1
    if pos > neg:
        return "positive"
    if neg > pos:
        return "negative"
    return "na"


def sentiment_label():
    """Build the Arrow-vectorized scoring UDF (built lazily — pandas_udf
    needs an active SparkSession to parse its return type).

    The UDF closure is deliberately self-contained: it captures the
    lexicon *data* (pickled by value) and defines the scorer inline,
    never referencing module-level functions — so executors that cannot
    import this package (different cwd/PYTHONPATH) still run it.
    """
    positive, negative = _POSITIVE, _NEGATIVE

    @F.pandas_udf("string")
    def _label(texts: pd.Series) -> pd.Series:
        def score(text: str) -> str:
            pos = neg = 0
            for t in text.split(" "):
                if t in positive:
                    pos += 1
                elif t in negative:
                    neg += 1
            if pos > neg:
                return "positive"
            if neg > pos:
                return "negative"
            return "na"

        return texts.map(score)

    return _label


def annotate_sentiment(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append an ``overall_sentiment`` column (tweets.py:56-59 analog)."""
    return df.withColumn("overall_sentiment", sentiment_label()(F.col(text_col)))
