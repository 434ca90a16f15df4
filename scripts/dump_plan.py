"""Dump .explain('formatted') for catalog queries to
plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt (default round: r14).

Usage: python scripts/dump_plan.py <tag> q161_mutual_nn [more queries...]

Runs each query's plan builder against $SPARK_GRAFT_SF_DIR (default sf0.1)
and writes the formatted physical plan. Iterative operators that
localCheckpoint() mid-build will execute their training/loop stages while
the plan is constructed; the dumped plan is the FINAL query plan the noop
sink executes (checkpointed intermediates appear as ExistingRDD scans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES
    from universal_aws_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="dump_plan", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(_REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        if n not in QUERIES:
            matches = [q for q in QUERIES if q.startswith(n)]
            if len(matches) != 1:
                print(f"unknown query {n!r}", file=sys.stderr)
                continue
            n = matches[0]
        df = QUERIES[n].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
