#!/usr/bin/env python
"""Focused per-query timing: bench.py's methodology (shared session,
clearCache per sample, median of N timed runs after warmups) for an
arbitrary subset of registered queries. Usage:

    python scripts/measure_queries.py q1 q2 ... [--runs N] [--warm W]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_segments_tutorial_spark.plans import all_queries
from clickhouse_segments_tutorial_spark.session import get_spark
from clickhouse_segments_tutorial_spark.sources.catalog import DEFAULT_SF_DIR


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("measure", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = all_queries()
    for name in args.names:
        spec = qs[name]
        samples: list[float] = []
        for i in range(args.runs + args.warm):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"measure:{name}:{i}")
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            if i >= args.warm:
                samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(
            f"{name}: median {med:.3f}s of {[round(s, 3) for s in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
