#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to plans/<dir>/.

    python scripts/dump_plan.py r18 after query1 query2 ...

writes plans/r18/<query>_after.txt for each. Env: SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_segments_tutorial_spark.plans import all_queries
from clickhouse_segments_tutorial_spark.session import get_spark


def main() -> None:
    tag_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dumpplan", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag_dir)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name].spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
