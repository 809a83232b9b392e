"""Local replica of the driver's correctness gate: run every
`__spark_entry__.queries()` entry on Spark and its `oracle_sql()` twin on
DuckDB at sf0.01, compare row count, column names, and order-insensitive
values (column-name-sorted, like the driver's value hash).

Usage: python tests/oracle_diff.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            # -0.0 stays distinct from +0.0 — the driver's value hash
            # preserves the sign bit, and collapsing them here masked
            # a real mismatch for two rounds (emb_covariance)
            return "-0"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, int):
        return str(v)
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="",
                    help="also write per-query verdicts to this JSON "
                         "file (durable record of a full local sweep)")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ys_wh_"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entry.TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    n_pass = n_fail = n_rowsonly = 0
    verdicts: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, args.sf_dir)
            srows = sdf.collect()
            scols = [c.lower() for c in sdf.columns]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            verdicts[name] = {"status": "fail", "reason": "spark error"}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            verdicts[name] = {"status": "rows_only", "rows": len(srows)}
            n_rowsonly += 1
            continue
        try:
            res = con.sql(oracles[name])
            orows = res.fetchall()
            ocols = [c.lower() for c in res.columns]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            verdicts[name] = {"status": "fail", "reason": "duckdb error"}
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
            verdicts[name] = {"status": "fail", "reason": "columns"}
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows {len(srows)} != {len(orows)}")
            verdicts[name] = {"status": "fail", "reason": "row count"}
            n_fail += 1
            continue
        sn = normalize([[r[c] for c in sdf.columns] for r in srows], scols)
        on = normalize(orows, ocols)
        if sn != on:
            bad = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            verdicts[name] = {"status": "fail", "reason": "values"}
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        verdicts[name] = {"status": "pass", "rows": len(srows)}
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if args.out:
        import json

        Path(args.out).write_text(json.dumps(
            {"sf_dir": args.sf_dir,
             "summary": {"pass": n_pass, "fail": n_fail,
                         "rows_only": n_rowsonly},
             "queries": verdicts}, indent=1) + "\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
