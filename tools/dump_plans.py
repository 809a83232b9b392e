"""Write .explain('formatted') for named inventory queries to a dir.

Usage: python tools/dump_plans.py q1,q2,... OUTDIR [SUFFIX]
Builds each query on a bench-identical session (construction-time jobs
such as driver gates do run) and dumps the formatted plan as
OUTDIR/<name><SUFFIX>.txt without executing the final action.
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.getcwd())


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    outdir = Path(sys.argv[2])
    suffix = sys.argv[3] if len(sys.argv) > 3 else ""
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ys_wh_"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    entry._ys(spark, sf_dir)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (outdir / f"{name}{suffix}.txt").write_text(plan)
            print(f"wrote {name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAILED {name}: {e}")
        try:
            spark.catalog.clearCache()
            from yardstick_spark.llm import clear_dedup_caches

            clear_dedup_caches()
        except Exception:  # noqa: BLE001
            pass


if __name__ == "__main__":
    main()
