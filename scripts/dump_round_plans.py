"""Dump `.explain("formatted")` of named registry queries to
plans/<round>/<query>_<tag>.txt — the optimization-round evidence files
(the judge checks plan claims against these without running Spark).

Usage:
    python scripts/dump_round_plans.py r15 before [query ...]

With no query names, dumps the full bench set (HEADLINE + OPTIONAL from
bench.py).  Iterative/streaming queries whose result is driver-
materialized (connected components, streaming harnesses) have no single
batch plan; for those the dump records the plan of the value-producing
DataFrame where the registry fn returns one, and is skipped with a note
otherwise.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spreadsheet_etl_engine_spark import registry  # noqa: E402
from spreadsheet_etl_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench
        names = bench.HEADLINE + bench.OPTIONAL
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry.get(name).fn
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # pragma: no cover — evidence tooling
            plan = f"(no single batch plan: {type(exc).__name__}: {exc})\n"
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n{plan}\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
