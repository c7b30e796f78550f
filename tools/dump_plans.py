"""Dump .explain("formatted") for declared queries to plans/r09/.

Usage: python tools/dump_plans.py before|after <query> [<query> ...]
Writes plans/r09/<query>_<tag>.txt. The judge checks plan claims in
OPTIMIZATION_r09.md against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from html5ever_elixir_spark.session import get_spark  # noqa: E402


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r09",
    )
    os.makedirs(out_dir, exist_ok=True)
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark(app_name=f"dump_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
