"""Dump .explain("formatted") for named registry entries to plans/<round>/.

Usage: python tools/explain_queries.py <suffix> <name> [<name> ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<suffix>.txt (round defaults
to r16). SF dir from SPARK_GRAFT_SF_DIR (default sf0.1) — the bench's
scale, so plan shapes match the timed runs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muninn_avro_to_parquet_spark.session import get_spark
from muninn_avro_to_parquet_spark.queries import QUERIES

suffix = sys.argv[1]
names = sys.argv[2:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("explain")
out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
)
os.makedirs(out_dir, exist_ok=True)
for name in names:
    df = QUERIES[name].spark(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print("wrote", path, len(plan), "bytes", flush=True)
spark.stop()
