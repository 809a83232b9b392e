"""Per-query stage-level measurement probe (guide §1: measure first).

Runs one or more inventory queries on a bench-identical session with the
UI enabled, then attributes wall time to Spark jobs/stages via the REST
API.  Also writes .explain("formatted") for each probed query.

Usage: python tools/probe_stages.py q1,q2,... [--reps N] [--plans-dir DIR]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    reps = 3
    plans_dir = None
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--plans-dir" in sys.argv:
        plans_dir = Path(sys.argv[sys.argv.index("--plans-dir") + 1])
        plans_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ys_wh_"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    qs = entry.queries()
    entry._ys(spark, sf_dir)
    spark.table("lineitem").count()
    for warm in ("m_grand_total", "tpch_q6"):
        try:
            qs[warm](spark, sf_dir).count()
        except Exception:  # noqa: BLE001
            pass

    def _clear() -> None:
        spark.catalog.clearCache()
        try:
            from yardstick_spark.llm import clear_dedup_caches

            clear_dedup_caches()
        except Exception:  # noqa: BLE001
            pass

    def _rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    for name in names:
        fn = qs[name]
        # warm rep (uncounted) then timed reps
        for rep in range(reps + 1):
            _clear()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001
                pass
            jobs_before = {j["jobId"] for j in _rest("/jobs")}
            spark.sparkContext.setJobDescription(f"{name}#rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.count()
            took = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            print(f"\n=== {name} rep{rep}: total {took:.3f}s "
                  f"(plan-build+eager {t_build:.3f}s)")
            if rep == 0:
                if plans_dir is not None:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted")
                    (plans_dir / f"{name}.txt").write_text(plan)
                continue
            jobs = [j for j in _rest("/jobs") if j["jobId"] not in jobs_before]
            jobs.sort(key=lambda j: j["jobId"])
            for j in jobs:
                dur = "?"
                if j.get("completionTime") and j.get("submissionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    st = datetime.strptime(j["submissionTime"], fmt)
                    en = datetime.strptime(j["completionTime"], fmt)
                    dur = f"{(en - st).total_seconds():7.3f}"
                print(f"  job {j['jobId']:4d} {dur}s tasks={j['numTasks']:4d} "
                      f"{(j.get('description') or j['name'])[:100]}")
            # stage-level breakdown for this rep's jobs
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = {s["stageId"]: s for s in _rest("/stages")
                      if s["stageId"] in stage_ids}
            for sid in stage_ids:
                s = stages.get(sid)
                if not s or s["status"] == "SKIPPED":
                    continue
                exec_ms = s.get("executorRunTime", 0)
                print(f"  stage {sid:4d} execRun={exec_ms/1000:7.2f}s "
                      f"tasks={s['numCompleteTasks']:4d} "
                      f"in={s.get('inputBytes',0)>>20}MB "
                      f"sh_r={s.get('shuffleReadBytes',0)>>10}KB "
                      f"sh_w={s.get('shuffleWriteBytes',0)>>10}KB "
                      f"{s['name'][:80]}")


if __name__ == "__main__":
    main()
