"""Capture .explain("formatted") output for named queries into plans/<round>/ ($SPARK_GRAFT_PLAN_ROUND, default r18).

Usage:
    python scripts/capture_plans.py before q1_pricing_summary pagerank_copurchase ...
    python scripts/capture_plans.py after  q1_pricing_summary ...

Writes plans/r17/<name>_<tag>.txt for each query. Uses the engine session
(same confs the bench uses) at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from dend_covid19_spark import plans
    from dend_covid19_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    reg = plans.all_queries()
    for name in names:
        df = reg[name](spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
