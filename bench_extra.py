#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN
for driver measurement; everything exploratory lives here).

Modes:
  --profile [names...]   per-query noop-sink timing + per-query stage
                         breakdown (executorRunTime, shuffle bytes,
                         job/stage counts) via the status REST API.
  --explain [names...]   write .explain('formatted') for each query to
                         plans/r06/<name>_<tag>.txt (--tag before|after).
  --reps N               repeat the profile N times per query (min is
                         reported; first rep reported separately).

Uses the same session shape as bench.py main_default (local[$CPUS],
shuffle_partitions=$CPUS) with the UI enabled for stage metrics.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _stages(spark):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        return json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"))
    except Exception:
        return []


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = "explain" if "--explain" in sys.argv else "profile"
    tag = "before"
    consumed = set()
    if "--tag" in sys.argv:
        i = sys.argv.index("--tag")
        tag = sys.argv[i + 1]
        consumed.add(i + 1)
    reps = 1
    if "--reps" in sys.argv:
        i = sys.argv.index("--reps")
        reps = int(sys.argv[i + 1])
        consumed.add(i + 1)
    args = [a for i, a in enumerate(sys.argv) if i > 0
            and not a.startswith("--") and i not in consumed]

    from smaph_spark.session import get_spark

    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    import __spark_entry__  # noqa: F401
    from bench import HEADLINE, _warmup
    from smaph_spark.plans.star_queries import QUERIES

    names = args or HEADLINE

    if mode == "explain":
        outdir = os.path.join(REPO, "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        if "--nockpt" in sys.argv:
            # checkpoint-fronted queries (dd08/dd09/er04/er07 end in an
            # eager localCheckpoint) explain as an opaque ExistingRDD
            # scan; identity-patching localCheckpoint exposes the full
            # computation plan for the plans/r06 artifacts (explain
            # only — results are unchanged, just not pre-materialized)
            from pyspark.sql import DataFrame as _DF

            _DF.localCheckpoint = lambda self, eager=True: self
            try:  # Spark 4: the classic subclass overrides the base
                from pyspark.sql.classic.dataframe import DataFrame as _CDF

                _CDF.localCheckpoint = lambda self, eager=True: self
            except ImportError:
                pass
            tag = tag + "_full"
        for name in names:
            df = QUERIES[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(txt)
            print(f"wrote {name}_{tag}.txt ({len(txt)} bytes)")
        spark.stop()
        return

    _warmup(spark, sf_dir)
    out = {}
    for name in names:
        samples = []
        for rep in range(reps):
            spark.catalog.clearCache()
            sc = spark.sparkContext
            sc.setJobDescription(f"{name} rep{rep}")
            before = _stages(spark)
            before_ids = {(s["stageId"], s["attemptId"]) for s in before}
            t0 = time.time()
            df = QUERIES[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 2)
            after = _stages(spark)
            new = [s for s in after
                   if (s["stageId"], s["attemptId"]) not in before_ids]
            samples.append({
                "wall_s": wall,
                "n_stages": len(new),
                "task_sec": round(sum(s["executorRunTime"] for s in new) / 1e3, 1),
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1),
                "shuffle_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1),
                "input_mb": round(
                    sum(s.get("inputBytes", 0) for s in new) / 1e6, 1),
                "top_stages": sorted(
                    [
                        {
                            "id": s["stageId"],
                            "ms": s["executorRunTime"],
                            "tasks": s["numCompleteTasks"],
                            "name": s["name"].split("\n")[0][:90],
                        }
                        for s in new
                    ],
                    key=lambda x: -x["ms"],
                )[:8],
            })
            sc.setJobDescription(None)
        out[name] = {
            "wall_s": [s["wall_s"] for s in samples],
            "min_wall_s": min(s["wall_s"] for s in samples),
            "detail": samples[-1],
        }
        print(f"PROFILE {name} " + json.dumps(out[name]), flush=True)
    total_min = round(sum(v["min_wall_s"] for v in out.values()), 2)
    print(json.dumps({"profile_total_min_s": total_min, "sf": sf_dir,
                      "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
