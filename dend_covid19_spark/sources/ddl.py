"""DDL helpers (SURVEY.md S10/S11, O6): managed-table lifecycle via
spark.sql — the engine-side equivalent of the reference's
create_tables.sql / drop_tables.sql + reset_tables DAG
(/root/reference/airflow/dags/reset_tables.py:20-38)."""

from __future__ import annotations

from pyspark.sql import SparkSession

# The two serving tables of the reference, re-declared as Spark managed
# parquet tables (create_tables.sql:1-23). PK/NOT NULL are *checked* by
# operators/quality.py gates — Spark doesn't enforce constraints.
TWEETS_SENTIMENT_DDL = """
CREATE TABLE IF NOT EXISTS {db}tweets_sentiment (
    tweets_sentiment_id STRING,
    date TIMESTAMP,
    year SHORT, month SHORT, day SHORT,
    language STRING,
    positive_count INT, negative_count INT, na_count INT
) USING parquet
"""

MARKETS_VALUE_DDL = """
CREATE TABLE IF NOT EXISTS {db}markets_value (
    markets_value_id STRING,
    date TIMESTAMP,
    year SHORT, month SHORT, day SHORT,
    index STRING,
    value FLOAT
) USING parquet
"""

SERVING_TABLES = ("tweets_sentiment", "markets_value")


def create_serving_tables(spark: SparkSession, db_prefix: str = "") -> None:
    """S10: CREATE TABLE pair (reset_tables.py:27-32)."""
    spark.sql(TWEETS_SENTIMENT_DDL.format(db=db_prefix))
    spark.sql(MARKETS_VALUE_DDL.format(db=db_prefix))


def drop_serving_tables(spark: SparkSession, db_prefix: str = "") -> None:
    """S11: DROP TABLE pair (drop_tables.sql:1-3)."""
    for t in SERVING_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {db_prefix}{t}")


def reset_serving_tables(spark: SparkSession, db_prefix: str = "") -> None:
    """O6: idempotent drop+create (the reset_tables DAG as one call)."""
    drop_serving_tables(spark, db_prefix)
    create_serving_tables(spark, db_prefix)
