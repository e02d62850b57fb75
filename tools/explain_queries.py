"""Dump .explain("formatted") for named registry entries to plans/r15/.

Usage: python tools/explain_queries.py <suffix> <name> [<name> ...]
Writes plans/r15/<name>_<suffix>.txt. SF dir from SPARK_GRAFT_SF_DIR
(default sf0.1) — the bench's scale, so plan shapes match the timed runs.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from muninn_avro_to_parquet_spark.session import get_spark
from muninn_avro_to_parquet_spark.queries import QUERIES

suffix = sys.argv[1]
names = sys.argv[2:]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("explain-r15")
out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
os.makedirs(out_dir, exist_ok=True)
for name in names:
    df = QUERIES[name].spark(spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print("wrote", path, len(plan), "bytes", flush=True)
spark.stop()
