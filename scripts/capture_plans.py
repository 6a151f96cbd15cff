"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <out_dir> [query ...]

Only builds each query's DataFrame (some builders run preparatory Spark
jobs, e.g. encoding a temp table) and writes the formatted physical plan;
the query itself is not executed.  Streaming queries are excluded (their
builders RUN the stream).
"""
from __future__ import annotations

import os
import sys

SKIP = {"streaming_ingest_stats", "streaming_dedup_stats",
        "streaming_source_totals"}


def main() -> None:
    out_dir = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, fn in entry.queries().items():
        if name in SKIP or (only and name not in only):
            continue
        try:
            df = fn(spark, "/root/testdata/sf0.01")
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN ERROR: {e}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("PLAN ERROR") else "ERR")
    spark.stop()


if __name__ == "__main__":
    main()
