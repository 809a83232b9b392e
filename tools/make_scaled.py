"""Build the N-x replicated measurement corpus under /tmp/sf{N}x.

Replicates the sf0.1 tables with id offsets (the protocol every
SCALING.md 10x row uses: 6M lineitem / 1.5M orders / 50k docs / 20k
vectors at N=10).  Identical parquet feeds both engines.

    python tools/make_scaled.py [N] [table,table,...] [dst_dir]

Defaults: N=10, tables=documents,embeddings,lineitem,orders,events,
dst=/tmp/sf{N}x.  Pass an explicit dst_dir when scaling a SUBSET for
a stress corpus (e.g. "10 part /tmp/sf10xpart") so the canonical
/tmp/sf{N}x full-corpus build is not overwritten.
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb

# Only PRIMARY keys shift (uniqueness across copies).  Foreign keys
# into tables that copy through unscaled (o_custkey -> customer,
# user_id -> the user dimension) must NOT shift, or every copy beyond
# i=0 dangles against the dimension — the scaled corpus instead fans
# each dimension row out n-fold, which is the realistic shape of a
# bigger fact table over a fixed dimension.  l_orderkey shifts in
# lockstep with o_orderkey (same offset, same copy index), so the
# lineitem<->orders join stays intact when both are scaled together.
_ID_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "part": ["p_partkey"],
}
_OFFSET = 10_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tables = (sys.argv[2].split(",") if len(sys.argv) > 2
              else list(_ID_COLS))
    src = Path("/root/testdata/sf0.1")
    dst = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(f"/tmp/sf{n}x")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        shifted = ", ".join(
            f"{c} + {{i}} * {_OFFSET} AS {c}" for c in _ID_COLS[t])
        others = con.sql(
            f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").columns
        keep = ", ".join(c for c in others if c not in _ID_COLS[t])
        parts = " UNION ALL ".join(
            f"SELECT {shifted.format(i=i)}, {keep} "
            f"FROM '{src}/{t}.parquet'" for i in range(n))
        con.sql(f"COPY ({parts}) TO '{dst}/{t}.parquet' "
                f"(FORMAT PARQUET)")
        print(t, con.sql(f"SELECT COUNT(*) FROM "
                         f"'{dst}/{t}.parquet'").fetchone()[0])
    # EVERY other source table copies through unscaled — _ys() view
    # registration needs the complete corpus, so scaling a subset
    # (e.g. "10 part") must still produce a directory every inventory
    # entry can run against
    for p in sorted(src.glob("*.parquet")):
        if p.stem not in tables:
            con.sql(f"COPY (SELECT * FROM '{p}') TO "
                    f"'{dst}/{p.stem}.parquet' (FORMAT PARQUET)")
    print("done:", dst)


if __name__ == "__main__":
    main()
