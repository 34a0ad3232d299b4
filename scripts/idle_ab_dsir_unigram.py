#!/usr/bin/env python
"""One-off idle-host A/B for the r16 verdict's measurement flag: pin the
JIT-settled steady-state of dsir_weights_docs and unigram_pieces_docs
(byte-identical code since r12, yet 3.3-6.7 s across five rounds of
shared-host benches). 12 back-to-back samples each at sf0.1 after the
standard bench warmup; prints all samples + median + trimmed mean so
BASELINE.md can record an attributable steady-state number.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_segments_tutorial_spark.plans import all_queries
from clickhouse_segments_tutorial_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("idle-ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = all_queries()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in ("dsir_weights_docs", "unigram_pieces_docs"):
        # JIT/codegen warmup on the tiny sf, then 2 unmeasured full-size runs
        qs[name].spark(spark, warm_dir).collect()
        qs[name].spark(spark, sf_dir).collect()
        qs[name].spark(spark, sf_dir).collect()
    out = {}
    for name in ("dsir_weights_docs", "unigram_pieces_docs"):
        samples = []
        for _ in range(12):
            t0 = time.monotonic()
            qs[name].spark(spark, sf_dir).collect()
            samples.append(round(time.monotonic() - t0, 3))
        srt = sorted(samples)
        out[name] = {
            "samples": samples,
            "median": round(statistics.median(samples), 3),
            "trimmed_mean_8": round(statistics.mean(srt[2:-2]), 3),
            "min": srt[0],
            "max": srt[-1],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
