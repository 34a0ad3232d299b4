#!/usr/bin/env python
"""Phase-level profile of the stateful cascade queries (r18 item 3).

Runs segment_microbatch_members / segment_eventtime_members once (after a
warmup) with wall-clock timestamps around each cascade phase, and prints the
Spark job count + task count per phase via the status tracker. Usage:

    SPARK_GRAFT_CPUS=32 python scripts/profile_cascade.py [microbatch|eventtime|naive|idempotent]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_segments_tutorial_spark.plans import all_queries
from clickhouse_segments_tutorial_spark.session import get_spark

NAME = {
    "microbatch": "segment_microbatch_members",
    "eventtime": "segment_eventtime_members",
    "naive": "segment_naive_members",
    "idempotent": "segment_idempotent_members",
}[sys.argv[1] if len(sys.argv) > 1 else "microbatch"]


def main() -> None:
    spark = get_spark("profile", extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext
    spec = all_queries()[NAME]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # warmup
    spec.spark(spark, sf_dir).collect()
    spark.catalog.clearCache()

    # instrument the cascade phases by wrapping the hot helpers
    import clickhouse_segments_tutorial_spark.sources.writers as writers
    import clickhouse_segments_tutorial_spark.segmentation.micro_batch as mb

    phase_times: dict[str, float] = {}

    def timed(tag, fn):
        def wrap(*a, **k):
            t0 = time.perf_counter()
            try:
                return fn(*a, **k)
            finally:
                phase_times[tag] = phase_times.get(tag, 0.0) + (
                    time.perf_counter() - t0
                )

        return wrap

    orig_append = writers.append_clustered
    writers.append_clustered = timed("append_clustered", orig_append)
    mb.append_clustered = writers.append_clustered
    orig_finalize = mb.MicroBatchSegmenter._finalize
    mb.MicroBatchSegmenter._finalize = timed("finalize", orig_finalize)
    orig_state = mb.MicroBatchSegmenter._batch_state
    mb.MicroBatchSegmenter._batch_state = timed("batch_state(lazy)", orig_state)
    orig_retention = writers.apply_retention
    writers.apply_retention = timed("retention", orig_retention)
    mb.apply_retention = writers.apply_retention

    jobs_before = sc.statusTracker().getJobIdsForGroup(None)

    t0 = time.perf_counter()
    df = spec.spark(spark, sf_dir)
    t_build = time.perf_counter()
    rows = df.collect()
    t1 = time.perf_counter()

    writers.append_clustered = orig_append
    mb.append_clustered = orig_append
    mb.MicroBatchSegmenter._finalize = orig_finalize
    mb.MicroBatchSegmenter._batch_state = orig_state
    writers.apply_retention = orig_retention
    mb.apply_retention = orig_retention

    tracker = sc.statusTracker()
    job_ids = [j for j in tracker.getJobIdsForGroup(None) if j not in jobs_before]
    n_tasks = 0
    n_stages = 0
    for j in sorted(job_ids):
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                n_stages += 1
                n_tasks += si.numCompletedTasks

    print(f"query={NAME} cpus={os.environ.get('SPARK_GRAFT_CPUS')}")
    print(f"total={t1 - t0:.3f}s  build(driver-side, incl cascade)={t_build - t0:.3f}s  collect={t1 - t_build:.3f}s  rows={len(rows)}")
    print(f"jobs={len(job_ids)} stages(run)={n_stages} tasks={n_tasks}")
    for tag, s in sorted(phase_times.items()):
        print(f"  {tag}: {s:.3f}s")


if __name__ == "__main__":
    main()
