"""Dump `explain("formatted")` for named catalog queries to
plans/r21/<query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit alongside each change.

Run: PYTHONPATH=/root/repo python tools/dump_plans_r21.py <suffix> <query> [<query> ...]
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from utc_cuip_kafka_aws_connector_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r21"


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump_plans_r21")
    spark.sparkContext.setLogLevel("ERROR")
    from utc_cuip_kafka_aws_connector_spark.plans.catalog import CATALOG

    for name in names:
        df = CATALOG[name].builder(spark, SF)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(
            f"{name}: {plan.count('Exchange')} Exchange mentions, "
            f"{len(plan.splitlines())} lines -> {path}",
            flush=True,
        )


if __name__ == "__main__":
    main()
