"""dend_covid19_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``iamhatesz/dend-covid19``
(surveyed in /root/repo/SURVEY.md). The reference is an Airflow-orchestrated
ETL (Spark local-mode tweet sentiment + Quandl market values -> Redshift);
this engine expresses every one of its dataflow operators — and the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) — as declarative DataFrame/SQL plans that Catalyst can
optimize, designed to scale from local[32] tests to a 1000-executor
cluster.

Layout:
    session.py     SparkSession factory (UTC, Arrow, AQE)
    catalog.py     test-table catalog: explicit schemas, view registration
    pipeline.py    reference-parity ETL pipeline + quality gates (O1-O6)
    operators/     dedup, similarity, windowed/top-k, quality-gate operators
    functions/     text analysis + vector math column expressions
    sources/       readers/writers/DDL helpers (S1-S11)
    plans/         the query registry: queries() + DuckDB oracle twins
    streaming/     Structured Streaming re-expression of the daily batch
    multimodal/    binary-column plumbing (decode stubs, real Spark shapes)
"""

__version__ = "0.1.0"
