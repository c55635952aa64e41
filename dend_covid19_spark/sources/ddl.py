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


def _database_location(spark: SparkSession, db_prefix: str) -> str | None:
    """Filesystem location managed tables of ``db_prefix`` resolve under:
    the database's Location for an explicit db, else the session
    warehouse dir. None when the database itself doesn't exist yet
    (then there is nothing to orphan-scan)."""
    db = db_prefix.rstrip(".")
    if not db:
        return spark.conf.get("spark.sql.warehouse.dir")
    try:
        rows = spark.sql(f"DESCRIBE DATABASE {db}").collect()
    except Exception:
        return None
    for r in rows:
        if str(r[0]).strip().lower() == "location":
            return str(r[1])
    return None


def _clear_orphan_location(spark: SparkSession, db_prefix: str, table: str) -> bool:
    """Crash-recovery for the managed-table lifecycle: a session killed
    between CREATE and DROP leaves the table's data directory on disk
    while a FRESH metastore has no catalog entry for it — so
    ``DROP TABLE IF EXISTS`` no-ops and the next CREATE refuses with
    LOCATION_ALREADY_EXISTS. When the catalog does NOT know the table
    but its would-be location exists, delete the orphan directory via
    the Hadoop FS API (works for any supported filesystem, not just
    local). Returns True when an orphan was removed.

    The reference's reset_tables DAG is trivially re-runnable because
    Redshift owns both catalog and storage atomically
    (/root/reference/airflow/dags/reset_tables.py:20-38); Spark managed
    tables split them, so re-runnability needs this reconciliation."""
    if spark.catalog.tableExists(f"{db_prefix}{table}"):
        return False  # catalog knows it; DROP TABLE will clean up properly
    base = _database_location(spark, db_prefix)
    if not base:
        return False
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(base, table)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)
        return True
    return False


def create_serving_tables(spark: SparkSession, db_prefix: str = "") -> None:
    """S10: CREATE TABLE pair (reset_tables.py:27-32). Crash-idempotent:
    orphan data directories left by a killed prior session (on-disk but
    unknown to a fresh metastore) are reconciled away before CREATE."""
    for t in SERVING_TABLES:
        _clear_orphan_location(spark, db_prefix, t)
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
