"""Reference-parity queries (SURVEY.md §2 operators S*, P*, J1, A*, F*, U*).

Each function re-expresses one (or a cluster) of the reference's dataflow
operators over the driver's test tables, with a DuckDB oracle twin.

Determinism conventions (see plans/registry.py docstring):
  - All test-data doubles are exact 2-decimal values (verified), so
    ``SUM`` goes through ``DECIMAL(18,2)`` / ``DECIMAL(18,6)`` per-row
    casts: the aggregation is exact integer arithmetic on both engines and
    immune to accumulation order. Final values come back as rounded
    DOUBLEs.
  - Dates surface as DATE; reference stored naive timestamps
    (/root/reference/sql/create_tables.sql:4,17) — DATE is the
    oracle-stable equivalent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def dsum(col: Column | str, scale: int = 2, out_round: int = 2) -> Column:
    """Order-insensitive exact SUM of a k-decimal double column.

    Casting each value to DECIMAL(18,k) is lossless for k-decimal data and
    makes the aggregate exact integer arithmetic — the same trick keeps
    100 TB sums reproducible across retries/partitionings, not just
    oracle-stable.

    The final rounding happens in DECIMAL space too (both engines round
    decimals half-away-from-zero), THEN casts to double. Rounding after
    the double cast is engine-dependent for exact half-way sums like
    307843.595: Spark rounds the shortest decimal repr (-> .60) while
    DuckDB rounds the binary double 307843.59499... (-> .59).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(18,{scale})")), out_round).cast("double")


def davg(col: str, scale: int = 2, out_round: int = 4) -> Column:
    """Exact round-half-away-from-zero average via integer arithmetic.

    The previous form (sum cast to double, divide, round in double) was
    engine-dependent at exact half-way quotients — fuzz seed 53 hit one:
    an avg_disc of exactly 0.05625 rounded 0.0563 in Spark (which
    HALF_UPs the double's shortest decimal repr) but 0.0562 in DuckDB
    (which rounds the binary value 0.056249999...). Same class as the
    dsum and frame-average lessons (SURVEY §10 items 2-3), now applied
    to the group average: with a = the exact sum in 10^-scale integer
    units and n = count, round-half-up(a·10^r / (n·10^scale)) computes
    as (2N + D) DIV (2D) in BIGINT, negatives mirrored (half-away-from-
    zero — matching both engines' decimal rounding). The only remaining
    double op divides an exact integer by 10^r — bit-identical
    everywhere. BIGINT bound: |sum|·10^(scale+r) < 2^63; lift to
    DECIMAL(38,0) beyond that."""
    p_in, p_out = 10**scale, 10**out_round
    a = f"CAST(sum(CAST({col} AS DECIMAL(18,{scale}))) * {p_in} AS BIGINT)"
    n_expr = f"(count(*) * {p_in})"
    num = f"({a} * {p_out})"
    scaled = (
        f"CASE WHEN {num} >= 0 THEN (2 * {num} + {n_expr}) DIV (2 * {n_expr}) "
        f"ELSE -((2 * -{num} + {n_expr}) DIV (2 * {n_expr})) END"
    )
    return F.expr(f"CAST({scaled} AS DOUBLE) / {p_out}")


def _sql_dsum(expr: str, scale: int = 2, out_round: int = 2) -> str:
    """DuckDB twin of dsum: decimal-space round, then double cast."""
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,{scale}))), {out_round}) AS DOUBLE)"


def _sql_davg(expr: str, scale: int = 2, out_round: int = 4) -> str:
    """DuckDB twin of davg: the identical integer rounding, // for DIV
    (both truncate on the non-negative operands the CASE guarantees)."""
    p_in, p_out = 10**scale, 10**out_round
    a = f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) * {p_in} AS BIGINT)"
    n_expr = f"(count(*) * {p_in})"
    num = f"({a} * {p_out})"
    scaled = (
        f"CASE WHEN {num} >= 0 THEN (2 * {num} + {n_expr}) // (2 * {n_expr}) "
        f"ELSE -((2 * -{num} + {n_expr}) // (2 * {n_expr})) END"
    )
    return f"CAST({scaled} AS DOUBLE) / {p_out}"


# ---------------------------------------------------------------------------
# Flagship (entry): the reference's README join re-expressed.
# tweets_sentiment (daily pivoted counts, tweets.py:62-77 A1+A2) JOIN
# markets_value (daily value series, market.py:21-42) ON date
# (/root/reference/README.md:63-66, J1) — here both daily series derive
# from the `events` stream: a per-day event-type pivot joined to a per-day
# purchase-value aggregate.
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
WITH counts AS (
    SELECT CAST(ts AS DATE) AS day,
           {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}_count" for t in EVENT_TYPES)}
    FROM events GROUP BY 1
), vals AS (
    SELECT CAST(ts AS DATE) AS day,
           {_sql_dsum('value')} AS purchase_value,
           count(*) AS purchase_count_check
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT c.day, {", ".join(f"c.{t}_count" for t in EVENT_TYPES)},
       v.purchase_value, v.purchase_count_check
FROM counts c JOIN vals v ON c.day = v.day
"""


@query("flagship_daily_join", oracle=_FLAGSHIP_ORACLE)
def flagship_daily_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + A1 + A2: daily event-type pivot ⋈ daily purchase-value series.

    Scale notes: both sides pre-aggregate to |days| rows *before* the join
    (partial aggregation map-side), so the join input is tiny regardless of
    raw volume; the small aggregate side is broadcast — no sort-merge
    shuffle of raw events ever happens.
    """
    ev = load_table(spark, "events", sf_dir)
    day = F.to_date("ts").alias("day")
    counts = (
        ev.groupBy(day)
        .pivot("event_type", EVENT_TYPES)
        .count()
        .select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_count") for t in EVENT_TYPES],
        )
    )
    vals = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(
            dsum("value").alias("purchase_value"),
            F.count(F.lit(1)).alias("purchase_count_check"),
        )
    )
    return counts.join(F.broadcast(vals), "day", "inner").select(
        "day",
        *[f"{t}_count" for t in EVENT_TYPES],
        "purchase_value",
        "purchase_count_check",
    )


# ---------------------------------------------------------------------------
# Scans / projections / filters (S1, P1, P2, P3)
# ---------------------------------------------------------------------------


@query(
    "doc_filter_project",
    oracle="""
SELECT doc_id, source, n_chars
FROM documents
WHERE lang = 'en' AND NOT text LIKE 'the %'
""",
)
def doc_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3: project + equality filter + negated prefix filter.

    Mirrors tweets.py:50-51 (`select('full_text').where(lang=='en')
    .where(~startswith('RT @'))`). Both predicates are native Catalyst
    expressions → pushed into the parquet scan (PushedFilters), and the
    scan reads only 4 columns (ReadSchema pruning).
    """
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.where(F.col("lang") == F.lit("en"))
        .where(~F.col("text").startswith("the "))
        .select("doc_id", "source", "n_chars")
    )


@query(
    "doc_derived_key",
    oracle="""
SELECT doc_id,
       printf('%s(%s)', source, lang) AS doc_key,
       upper(lang) AS lang_uc
FROM documents
""",
)
def doc_derived_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 + F6: derived surrogate-key column via format_string.

    Mirrors the `'{date}({index})'` id construction (market.py:35,
    tweets.py:67) — done as a column expression, not driver-side f-strings.
    """
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.format_string("%s(%s)", F.col("source"), F.col("lang")).alias("doc_key"),
        F.upper("lang").alias("lang_uc"),
    )


@query(
    "events_nested_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
""",
)
def events_nested_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 + F7: JSON decode + nested-field extraction + filter on it.

    Mirrors the struct-path access `analysed_tweets.sentiment.result`
    (tweets.py:59) and the implicit JSON decode of S1. `from_json` with an
    explicit schema keeps this JVM-side (no UDF).
    """
    ev = load_table(spark, "events", sf_dir)
    parsed = ev.withColumn("j", F.from_json("props", "k INT"))
    return parsed.select("event_id", F.col("j.k").alias("k")).where(F.col("k") >= 50)


# ---------------------------------------------------------------------------
# Aggregations (A1, A2, A3) and the UDF surface (U1)
# ---------------------------------------------------------------------------


@query(
    "events_groupby_count",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def events_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the sentiment-histogram group-by (tweets.py:62).

    Catalyst plans partial (map-side) + final hash aggregation — the
    shuffle moves |event_type| rows per task, not raw data.
    """
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


_DAILY_PIVOT_ORACLE = f"""
SELECT CAST(ts AS DATE) AS day,
       {", ".join(f"count(*) FILTER (WHERE event_type = '{t}') AS {t}_count" for t in EVENT_TYPES)}
FROM events GROUP BY 1
"""


@query("events_daily_pivot", oracle=_DAILY_PIVOT_ORACLE)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: native pivot with an explicit value list.

    Replaces the reference's collect-to-driver dict pivot
    (tweets.py:64-77) with one distributed plan; the explicit value list
    avoids the extra distinct scan AND the KeyError the reference hits
    when a class is absent (SURVEY.md §7 'mildly hard').
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"{t}_count") for t in EVENT_TYPES],
        )
    )


_MODE_ORACLE = """
WITH counts AS (
    SELECT user_id, event_type, count(*) AS cnt
    FROM events GROUP BY user_id, event_type
), ranked AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
    FROM counts
)
SELECT user_id, event_type AS modal_event_type FROM ranked WHERE rn = 1
"""


@query("events_mode_native", oracle=_MODE_ORACLE)
def events_mode_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 native: per-key modal value with deterministic tie-break.

    The reference reduces an array to its most-common element with a
    Python UDF (`Counter(col).most_common(1)`, tweets.py:56) whose
    tie-break is insertion-order — non-deterministic under shuffle. Here:
    count + row_number window, ties broken lexicographically. Stays fully
    JVM-side; the window partitions by user_id so it scales with keys.
    """
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(F.col("cnt").desc(), F.col("event_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_event_type"))
    )


@query("events_mode_udf", oracle=_MODE_ORACLE)
def events_mode_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/U1: the same modal reduction through the Arrow-vectorized UDF
    surface (collect_list → pandas_udf), kept semantically identical to
    the native variant (same oracle).

    This is the engine's U1 demo (tweets.py:56) — but as a `pandas_udf`
    (Arrow batches) rather than a row-at-a-time Python UDF, and with an
    explicit (count desc, value asc) tie-break so the result is
    independent of collect_list's nondeterministic ordering.
    """

    @F.pandas_udf("string")
    def modal(arrs: pd.Series) -> pd.Series:
        def pick(a):
            best = None
            counts: dict[str, int] = {}
            for v in a:
                counts[v] = counts.get(v, 0) + 1
            for v, c in counts.items():
                if best is None or c > best[0] or (c == best[0] and v < best[1]):
                    best = (c, v)
            return best[1]

        return arrs.map(pick)

    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.collect_list("event_type").alias("types"))
        .select("user_id", modal("types").alias("modal_event_type"))
    )


@query(
    "quality_gate_count",
    oracle="""
SELECT count(*) AS cnt
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-05' AND event_type = 'click'
""",
)
def quality_gate_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + P7: the data-quality existence check as a one-row aggregate.

    Mirrors `SELECT ... WHERE date = %s AND index = %s` + len(records)>=1
    (market.py:45-52, tweets.py:136-142). The engine's first-class gate
    helper lives in operators/quality.py; this query is its plan shape.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.where(
            (F.to_date("ts") == F.lit("2024-01-05").cast("date"))
            & (F.col("event_type") == "click")
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Scalar functions (F3, F4, F5, F8) over orders
# ---------------------------------------------------------------------------


@query(
    "orders_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(day(o_orderdate) AS INT) AS o_day,
       printf('%s(%s)', strftime(o_orderdate, '%Y-%m-%d'), o_orderstatus) AS order_key_str,
       round(coalesce(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END, 0.0), 2) AS finished_value
FROM orders
""",
)
def orders_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3+F4+F6+F8: date decomposition, formatted surrogate key, and
    nullable-value handling.

    Mirrors the year/month/day decomposition + `'{date}({index})'` key
    (market.py:31-36) and the None-when-missing value (market.py:26-27)
    re-expressed as CASE/coalesce column logic.
    """
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.format_string(
            "%s(%s)", F.date_format("o_orderdate", "yyyy-MM-dd"), F.col("o_orderstatus")
        ).alias("order_key_str"),
        F.round(
            F.coalesce(
                F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")),
                F.lit(0.0),
            ),
            2,
        ).alias("finished_value"),
    )
