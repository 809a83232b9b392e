"""Time the DuckDB oracle SQL per query at a given sf dir — the
baseline half of the BASELINE.md comparison (the Spark half is
bench.py).  Usage: python tests/duckdb_baseline.py [sf_dir] [only,csv]
Prints one JSON line {"queries": {name: ms}, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out: dict[str, float] = {}
    for name, sql in entry.oracle_sql().items():
        if only and name not in only:
            continue
        try:
            con.execute(sql).fetchall()  # warmup
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            out[name] = round((time.perf_counter() - t0) * 1000, 1)
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)
            out[name] = -1.0
    print(json.dumps({"queries": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
