"""Z-order (Morton-code) data layout — multi-dimensional clustering for
scan pruning.

The range-sorted sink (`sources/write.py`) clusters one column, so
parquet row-group min/max stats prune scans filtered on THAT column
only.  A 100-TB table queried on two independent keys (e.g. customer
and date) needs both clustered at once: interleaving the bits of the
two keys into a single Morton code and range-sorting on it bounds the
per-file span of EVERY participating dimension to ~sqrt of the global
span (for 2 dims), so min/max pruning works for filters on either key.
Same idea as Delta/Iceberg Z-ORDER OPTIMIZE, built here from plain
Spark expressions.

Everything is integer bit arithmetic (`shiftright`/`&`/`shiftleft`)
that stays in whole-stage codegen — no UDFs — and is expressible
identically in ANSI SQL, so the DuckDB oracle can reproduce the key
bit-for-bit.

Scale notes:
* `zorder_key` is a pure per-row projection: no shuffle.
* `write_zordered` adds exactly one range-shuffle
  (`repartitionByRange`) — the same cost as a plain sorted write.
* Dimensions are first rank-normalized? No — deliberately NOT.  A
  production z-order wants rank-normalization when dimensions have
  wildly different cardinalities; that costs a distinct+window per
  dim.  Here each dim is min/width-normalized to `bits` via the
  caller-supplied (lo, hi) bounds, which is O(0) extra jobs.  Callers
  with unknown bounds can compute them with one cheap min/max agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _norm_expr(col: str, lo: int, hi: int, bits: int, intdiv: str) -> str:
    """Clamp `col` into [0, 2^bits) by affine scaling from [lo, hi].

    Uses the engine's INTEGER division operator (`intdiv`) — never
    float `/` + CAST, because Spark casts double→bigint by truncation
    while DuckDB casts by rounding, which would make the two engines
    disagree on boundary values.  Operands are non-negative once
    clamped, where trunc-div (Spark `div`) and floor-div (DuckDB `//`)
    agree."""
    span = max(hi - lo, 1)
    top = (1 << bits) - 1
    # (col - lo) * top is evaluated in int64: a span beyond
    # (2^63-1)/top (~1.4e14 at bits=16, e.g. an epoch-MICROS range)
    # would overflow SILENTLY and corrupt every Morton key.  Exact
    # integer arithmetic is the module's contract (bit-equal oracle),
    # so refuse instead of degrading to lossy double normalization —
    # callers with huge spans should pre-scale the column (micros ->
    # seconds) or lower `bits`.
    if span > (2 ** 63 - 1) // top:
        raise ValueError(
            f"zorder: span {span} of {col} * {top} overflows int64; "
            "pre-scale the column (e.g. epoch micros -> seconds) or "
            "reduce bits")
    return (
        f"least({top}, greatest(0, "
        f"((CAST({col} AS BIGINT) - {lo}) * {top}) {intdiv} {span}))"
    )


def zorder_key_sql(
    dims: list[tuple[str, int, int]],
    bits: int = 16,
    intdiv: str = "div",
    shl: str = "shiftleft",
    shr: str = "shiftright",
) -> str:
    """SQL expression string for the Morton interleave of `dims`
    (each a `(column, lo, hi)` triple), `bits` bits per dimension.

    Bit i of normalized dim d lands at position i*ndims + d, so the
    code is identical arithmetic on any engine with 64-bit integer
    shifts.  Defaults emit Spark SQL; pass `intdiv='//'`, `shl='<<'`
    (via the DuckDB-shaped wrapper below) for the DuckDB oracle.
    ndims*bits must be ≤ 63.
    """
    nd = len(dims)
    if nd * bits > 63:
        raise ValueError(f"{nd} dims x {bits} bits exceeds a signed int64")
    parts = []
    for d, (col, lo, hi) in enumerate(dims):
        norm = _norm_expr(col, lo, hi, bits, intdiv)
        for i in range(bits):
            if shl == "<<":
                parts.append(f"((({norm} >> {i}) & 1) << {i * nd + d})")
            else:
                parts.append(
                    f"({shl}({shr}({norm}, {i}) & 1, {i * nd + d}))"
                )
    return " + ".join(parts)


def zorder_key_sql_duckdb(
    dims: list[tuple[str, int, int]], bits: int = 16
) -> str:
    """Same Morton code in DuckDB syntax (`//` int-div, `<<`/`>>`
    shifts) — used to build the bit-exact SQL oracle."""
    return zorder_key_sql(dims, bits, intdiv="//", shl="<<", shr=">>")


def zorder_key(
    df: DataFrame,
    dims: list[tuple[str, int, int]],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Attach the Morton code as `out_col`.  Pure projection — stays in
    codegen, no shuffle, no UDF."""
    return df.withColumn(out_col, F.expr(zorder_key_sql(dims, bits)))


def zorder_bounds(df: DataFrame, cols: list[str]) -> list[tuple[str, int, int]]:
    """One min/max aggregate over `cols` → the (col, lo, hi) triples
    `zorder_key` needs.  Single map-combined scan; the 1-row result is
    collected (bounded driver state)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [(c, int(row[f"__lo_{c}"]), int(row[f"__hi_{c}"])) for c in cols]


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[tuple[str, int, int]],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-sorted parquet write clustered on the Morton code of
    `dims`: `repartitionByRange(zkey)` gives disjoint zkey ranges per
    file, `sortWithinPartitions` tightens row-group stats inside each.
    Result: min/max pruning fires for point/range filters on ANY of
    the interleaved dimensions, not just a single sort key.

    The zkey column is dropped before writing — it is a layout device,
    not data (recomputable from `dims`)."""
    keyed = zorder_key(df, dims, bits)
    part = (
        keyed.repartitionByRange(num_files, "zkey")
        if num_files
        else keyed.repartitionByRange("zkey")
    )
    (
        part.sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )
