"""Markov removal-effect attribution — the data-driven alternative to
last-touch/first-touch rules (Anderl et al. 2014's removal effect, the
model marketing stacks ship as "Markov attribution").

Model: each user's event sequence is a journey through channel states
(view/click/signup/error), truncated at the FIRST purchase (absorbing
CONV) or ending unconverted (absorbing NULL). Transition counts come
from consecutive-pair extraction over the (ts, event_id) total order —
the distributed part. A channel's attribution is its REMOVAL EFFECT:
how much the START->CONV absorption probability drops when every path
through that channel is redirected to NULL.

Exactness discipline: the absorption probabilities are computed by a
FIXED-count value iteration in pure integer ppb —
``p'(s) = (sum_t cnt(s,t) * p(t)) DIV total(s)`` with p(CONV) pinned to
1e9, p(NULL) and p(removed) pinned to 0 — so the sum is order-free
(integer addition is associative), the floor is the only rounding, and
both engines produce bit-identical trajectories by construction; there
is no float anywhere and no convergence tolerance to disagree about.
The DuckDB twin unrolls the same MARKOV_ITERS steps as a CTE chain
(the kmeans unrolled-Lloyd discipline).

Plan/scale: journey-pair extraction is one user-partitioned window
over the events scan (the sessionize shape); the transition matrix is
(|channels|+1) x (|channels|+2) <= 30 integers — a MODEL ARTIFACT the
driver may hold, exactly like the k-means codebook (operators/
kmeans.py): collect the 30 counts, iterate 16 times over 6 states in
microseconds, return channel-cardinality rows. At 100 TB the pair
extraction dominates and is embarrassingly partition-parallel per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import query

CHANNELS = ["click", "error", "signup", "view"]  # purchase -> absorbing CONV
MARKOV_ITERS = 16
PPB = 1_000_000_000


def _journey_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, cnt): consecutive-pair counts over purchase-truncated
    journeys, with START edges, CONV mapping, and NULL terminals."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    fw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    kept = ev.join(fp, "user_id", "left").where(
        F.col("fp").isNull() | (F.struct("ts", "event_id") <= F.col("fp"))
    )
    seq = (
        kept.withColumn(
            "src", F.coalesce(F.lag("event_type").over(fw), F.lit("START"))
        )
        .withColumn(
            "dst",
            F.when(F.col("event_type") == "purchase", "CONV").otherwise(
                F.col("event_type")
            ),
        )
        .withColumn(
            "rd",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
    )
    pairs = seq.select("src", "dst")
    terminal = seq.where(F.col("fp").isNull() & (F.col("rd") == 1)).select(
        F.col("event_type").alias("src"), F.lit("NULL").alias("dst")
    )
    return (
        pairs.unionByName(terminal)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _absorption_ppb(
    trans: list[tuple[str, str, int]], removed: str | None
) -> int:
    """START's CONV-absorption probability in ppb after exactly
    MARKOV_ITERS integer value-iteration steps — the arithmetic the
    DuckDB CTE chain restates verbatim."""
    totals: dict[str, int] = {}
    out: dict[str, list[tuple[str, int]]] = {}
    for src, dst, cnt in trans:
        totals[src] = totals.get(src, 0) + cnt
        out.setdefault(src, []).append((dst, cnt))
    states = set(totals) | {d for es in out.values() for d, _ in es}
    states |= {"START", "CONV", "NULL"}
    p = {s: PPB if s == "CONV" else 0 for s in states}
    for _ in range(MARKOV_ITERS):
        nxt = {}
        for s in states:
            if s == "CONV":
                nxt[s] = PPB
            elif s == "NULL" or s == removed:
                nxt[s] = 0
            elif s in totals:
                nxt[s] = sum(c * p[d] for d, c in out[s]) // totals[s]
            else:
                nxt[s] = 0
        p = nxt
    return p["START"]


def _duck_markov_oracle() -> str:
    chain = []
    for i in range(1, MARKOV_ITERS + 1):
        chain.append(
            f"""p{i} AS MATERIALIZED (
    SELECT pv.scenario, pv.state,
           CASE WHEN pv.state = 'CONV' THEN {PPB}
                WHEN pv.state = 'NULL' THEN 0
                WHEN pv.state = pv.scenario THEN 0
                ELSE coalesce(
                    (SELECT sum(t.cnt * pd.p) FROM trans t
                     JOIN p{i - 1} pd ON pd.scenario = pv.scenario
                                     AND pd.state = t.dst
                     WHERE t.src = pv.state)
                    // (SELECT tt.total FROM totals tt
                        WHERE tt.src = pv.state), 0)
           END AS p
    FROM p{i - 1} pv
)"""
        )
    scen = ", ".join(f"'{c}'" for c in ["none", *CHANNELS])
    return f"""
WITH fp AS (
    SELECT user_id, ts AS fts, event_id AS fid FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS r
        FROM events WHERE event_type = 'purchase'
    ) WHERE r = 1
),
kept AS MATERIALIZED (
    SELECT e.user_id, e.ts, e.event_id, e.event_type,
           (fp.user_id IS NOT NULL) AS has_p
    FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
    WHERE fp.user_id IS NULL
       OR e.ts < fp.fts OR (e.ts = fp.fts AND e.event_id <= fp.fid)
),
seq AS MATERIALIZED (
    SELECT user_id, has_p, event_type,
           coalesce(lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id),
                    'START') AS src,
           CASE WHEN event_type = 'purchase' THEN 'CONV'
                ELSE event_type END AS dst,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rd
    FROM kept
),
pairs AS (
    SELECT src, dst FROM seq
    UNION ALL
    SELECT event_type AS src, 'NULL' AS dst FROM seq WHERE NOT has_p AND rd = 1
),
trans AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1, 2),
totals AS MATERIALIZED (SELECT src, CAST(sum(cnt) AS BIGINT) AS total FROM trans GROUP BY 1),
states AS MATERIALIZED (
    SELECT DISTINCT state FROM (
        SELECT src AS state FROM trans
        UNION ALL SELECT dst FROM trans
        UNION ALL SELECT 'START' UNION ALL SELECT 'CONV' UNION ALL SELECT 'NULL'
    )
),
scenarios AS (SELECT unnest([{scen}]) AS removed),
p0 AS MATERIALIZED (
    SELECT s.removed AS scenario, st.state,
           CASE WHEN st.state = 'CONV' THEN {PPB} ELSE 0 END AS p
    FROM scenarios s CROSS JOIN states st
),
{", ".join(chain)},
eff AS (
    SELECT sc.removed AS channel,
           b.p AS base_conv_ppb,
           r.p AS removed_conv_ppb,
           b.p - r.p AS removal_effect_ppb
    FROM scenarios sc
    JOIN p{MARKOV_ITERS} b ON b.scenario = 'none' AND b.state = 'START'
    JOIN p{MARKOV_ITERS} r ON r.scenario = sc.removed AND r.state = 'START'
    WHERE sc.removed <> 'none'
),
te AS (SELECT sum(removal_effect_ppb) AS tot FROM eff)
SELECT eff.channel,
       CAST(eff.base_conv_ppb AS BIGINT) AS base_conv_ppb,
       CAST(eff.removed_conv_ppb AS BIGINT) AS removed_conv_ppb,
       CAST(eff.removal_effect_ppb AS BIGINT) AS removal_effect_ppb,
       CAST(CASE WHEN te.tot <= 0 THEN 0
                 ELSE eff.removal_effect_ppb * 1000000 // te.tot
            END AS BIGINT) AS attribution_ppm
FROM eff CROSS JOIN te
"""


@query("attribution_markov_removal", oracle=_duck_markov_oracle())
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution over purchase journeys: build
    the channel-transition matrix from every user's (ts, event_id)-
    ordered events truncated at first purchase, then for each channel
    report the conversion probability with and without it (paths
    through a removed channel fail), the removal effect, and the
    normalized attribution share — all in exact integer ppb/ppm via a
    fixed 16-step integer value iteration (see module docstring for why
    this is bit-identical across engines by construction).

    attribution_view_purchase answers "which view preceded this
    purchase" (last-touch); this answers "which channel CAUSES
    conversions to disappear when removed" — the counterfactual number
    budget allocation actually wants.

    Plan/scale: pair extraction is one user-partitioned window over the
    scan (sessionize shape, linear); the collected transition matrix is
    <= 30 integers — the kmeans-codebook model-artifact discipline —
    and the 6-state iteration is driver-side microseconds. Counts use
    BIGINT (cnt * ppb <= 1e14 per term at 1e5 events; lift to
    DECIMAL(38,0)/Python int beyond ~1e9 events, same expressions)."""
    trans = [
        (r.src, r.dst, r.cnt)
        for r in _journey_transitions(spark, sf_dir).collect()
    ]
    base = _absorption_ppb(trans, None)
    effects = {c: base - _absorption_ppb(trans, c) for c in CHANNELS}
    te = sum(effects.values())
    rows = [
        (
            c,
            base,
            base - effects[c],
            effects[c],
            (effects[c] * 1_000_000 // te) if te > 0 else 0,
        )
        for c in CHANNELS
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_ppb long, removed_conv_ppb long, "
        "removal_effect_ppb long, attribution_ppm long",
    )
