"""Dump .explain("formatted") for named queries to plans/<round>/.

Usage: python tools/capture_plans.py <suffix> q1 q2 ...
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default r15)
for each query. Pass ALL as the query list to dump every registered
query (the full-tail archive VERDICT_r14 #5/#8 asks for).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsphere_event_streaming_spark.registry import load_all  # noqa: E402
from vsphere_event_streaming_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    queries = load_all()
    if names == ["ALL"]:
        import bench

        names = list(bench.HEADLINE)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = queries[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        spark.catalog.clearCache()
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
