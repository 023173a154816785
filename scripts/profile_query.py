#!/usr/bin/env python
"""Per-stage profiling harness (guide §1): run one or more registered
queries end-to-end through the noop sink on a UI-enabled session, then
pull per-stage wall/metrics from the Spark status REST API so the time
can be attributed to scan / exchange / python / aggregate work instead
of guessed at. Usage:

    python scripts/profile_query.py <query> [<query> ...] [--sf DIR] [--runs N]

Prints, per query: total seconds per run, then the stage table of the
LAST run (stage name, duration, tasks, input/shuffle bytes).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multithreaded_mapreduce_spark.plans.caching import (  # noqa: E402
    release_result_memos,
    release_tracked,
)
from multithreaded_mapreduce_spark.plans.registry import all_queries  # noqa: E402
from multithreaded_mapreduce_spark.session import get_spark  # noqa: E402


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 2
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    qs = all_queries()
    # the bench's warmups so first-query numbers aren't JVM/codec noise
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["wordcount"].builder(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    for _codec_q in ("media_png_roundtrip", "media_jpeg_roundtrip"):
        qs[_codec_q].builder(spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
    from multithreaded_mapreduce_spark.operators.bucketing import ensure_bucketed_tables

    ensure_bucketed_tables(spark, sf_dir)

    for name in names:
        times = []
        for r in range(runs):
            release_tracked()
            release_result_memos()
            spark.catalog.clearCache()
            jobs_before = {j["jobId"] for j in _rest(spark, "jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}:run{r}")
            t0 = time.perf_counter()
            qs[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = time.perf_counter() - t0
            times.append(dt)
            spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: runs {['%.3f' % t for t in times]} (sf={sf_dir})")
        # stage table for the LAST run's jobs
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"jobs={len(jobs)} stages={len(stage_ids)}")
        rows = []
        for sid in stage_ids:
            try:
                st = _rest(spark, f"stages/{sid}")
            except Exception:
                continue
            for attempt in st:
                if attempt["status"] == "SKIPPED":
                    continue
                dur = (attempt.get("executorRunTime") or 0) / 1000.0
                rows.append(
                    (
                        dur,
                        sid,
                        attempt.get("numCompleteTasks") or attempt.get("numTasks"),
                        attempt.get("inputBytes", 0),
                        attempt.get("shuffleReadBytes", 0),
                        attempt.get("shuffleWriteBytes", 0),
                        (attempt.get("executorDeserializeTime") or 0) / 1000.0,
                        (attempt.get("name") or "")[:90],
                    )
                )
        rows.sort(reverse=True)
        print(
            f"{'exec_s':>8} {'stage':>5} {'tasks':>5} {'input':>10} "
            f"{'shRead':>10} {'shWrite':>10} {'deser_s':>7}  name"
        )
        for dur, sid, ntask, inb, srb, swb, des, nm in rows[:25]:
            print(
                f"{dur:8.2f} {sid:5d} {ntask:5d} {inb:10d} {srb:10d} "
                f"{swb:10d} {des:7.2f}  {nm}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
