"""Benchmark: run every registry query at $SPARK_GRAFT_SF_DIR (default
sf0.1) and print ONE JSON line with total + per-query wall seconds.

Each query is forced end-to-end with a JVM-side noop sink (no Python
collect overhead in the measurement). The session uses the same config
block we would ship to a real cluster (AQE, broadcast threshold, UTC).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from muninn_avro_to_parquet_spark.queries import QUERIES
    from muninn_avro_to_parquet_spark.session import get_spark

    spark = get_spark(app_name="muninn_bench")
    # warm the JVM and the Python UDF worker pool once so per-query numbers
    # measure the queries, not process startup
    spark.range(1).collect()
    import pandas as pd  # noqa: F401

    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # best-of-N per query (default 2): the machine is shared, and a single
    # run can absorb a co-tenant CPU spike or a first-touch cache build;
    # the min is the steady-state cost of the plan itself
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
    timings: dict[str, float] = {}
    for name, entry in QUERIES.items():
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = entry.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
