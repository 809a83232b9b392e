"""Sinks: partitioned and bucketed parquet writers.

Partitioning prunes at read time (directory-level predicate pushdown);
bucketing pre-shuffles by join/agg keys so later equi-joins and groupBys
on the bucket columns skip the exchange entirely — the co-located-join
strategy for repeated large-table joins at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """Directory-partitioned parquet; readers prune partitions on
    `partition_cols` predicates without touching data files."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table (bucketing requires saveAsTable).  Joins
    and aggregations keyed on `bucket_cols` between tables with the same
    bucketing skip the shuffle (SortMergeJoin without Exchange)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_sorted(df: DataFrame, path: str, sort_cols: list[str],
                 mode: str = "overwrite",
                 target_files: int | None = None) -> None:
    """Range-sorted parquet layout: repartitionByRange on `sort_cols`
    (each output file covers a disjoint key range) + sortWithinPartitions
    (rows ordered inside each file), so every parquet row group carries
    tight min/max statistics on the sort keys.  Point/range predicates
    on those keys then skip whole files AND row groups at scan time —
    the third leg of the layout toolkit next to directory partitioning
    (low-cardinality keys) and bucketing (join keys): use range-sorting
    for high-cardinality range-filtered keys (timestamps, ids).

    One shuffle at write time buys every subsequent read's skipping;
    `target_files` caps output file count (defaults to the session's
    shuffle parallelism)."""
    cols = [df[c] for c in sort_cols]
    part = (df.repartitionByRange(target_files, *cols) if target_files
            else df.repartitionByRange(*cols))
    part.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def zorder_key_expr(norm_cols: list[str], bits: int = 16) -> str:
    """BIGINT Z-order (Morton) key interleaving the bits of
    already-normalized integer columns (each in [0, 2^bits)): column
    j contributes bit i to output position i*len(cols)+j.  Pure
    shift/or arithmetic — stays in whole-stage codegen."""
    n = len(norm_cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(norm_cols):
            src = i            # bit index in the normalized value
            dst = i * n + j    # bit index in the interleaved key
            terms.append(
                f"shiftleft(shiftright(CAST({c} AS BIGINT), {src}) & 1, "
                f"{dst})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 12, mode: str = "overwrite",
                   target_files: int | None = None) -> None:
    """Z-order-clustered parquet: rows are range-partitioned and sorted
    by a Morton interleave of `cols`, so each output file covers a
    TIGHT HYPER-RECTANGLE in the multi-column space — parquet min/max
    stats on EVERY clustered column then skip files/row groups for
    multi-dimensional box predicates, where a linear sort only ever
    prunes on its leading column.  The Delta OPTIMIZE ZORDER / Iceberg
    sort-order technique, expressed as plain Spark.

    Columns are normalized to [0, 2^bits) rank space via min/max
    scaling (one tiny pre-aggregation, broadcast as literals); the
    interleave is shift/or arithmetic in codegen.  `bits`=12 gives
    4096 distinct cells per dimension — plenty to separate files, and
    keeps the key within BIGINT for up to 5 columns.

    One write-time shuffle buys every subsequent read's multi-column
    skipping; the same trade as `write_sorted`, one dimension up."""
    from pyspark.sql import functions as F

    if not cols or len(cols) * bits > 62:
        raise ValueError("write_zordered: need cols with "
                         "len(cols) * bits <= 62")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    norm = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        rng = (mx - mn) if mx is not None and mn is not None else 0.0
        if rng and rng > 0:
            norm.append(
                f"least({top}, greatest(0, CAST(floor("
                f"(CAST({c} AS DOUBLE) - {mn!r}) / {rng!r} * {top + 1}) "
                f"AS BIGINT)))")
        else:
            norm.append("0")
    keyed = df.withColumn("__ys_z", F.expr(zorder_key_expr(norm, bits)))
    part = (keyed.repartitionByRange(target_files, "__ys_z")
            if target_files else keyed.repartitionByRange("__ys_z"))
    (part.sortWithinPartitions("__ys_z").drop("__ys_z")
     .write.mode(mode).parquet(path))


def compact_files(spark: SparkSession, path: str,
                  target_file_mb: int = 128,
                  sort_cols: list[str] | None = None,
                  target_files: int | None = None) -> dict:
    """Small-file compaction — the OPTIMIZE half of warehouse
    maintenance (Delta OPTIMIZE / Iceberg rewrite_data_files as plain
    Spark): rewrite a parquet directory into ceil(bytes/target) files,
    optionally restoring a range-sorted layout (`sort_cols`) so
    compaction and clustering happen in the same single shuffle.

    Streaming sinks and frequent small batch appends accrete thousands
    of KB-sized files; at 100 TB the resulting driver file-listing and
    per-file open costs dominate scans long before data volume does.
    Returns {"files_before", "files_in", "files_out", "bytes"} for the
    maintenance log.

    Swap semantics (honest version): the compacted output lands in a
    sibling temp dir first, then replaces the original via TWO
    directory renames (old -> `__compact_old`, tmp -> path) on the
    table's Hadoop FileSystem — HDFS/local renames are each atomic,
    but the pair is not: a reader listing the path exactly between
    them sees it briefly absent (not a mix of half-written files), and
    a crash between them leaves the data parked at `__compact_old`.
    Directory-swap without a transaction log cannot do better; tables
    needing concurrent-reader isolation belong in a manifest format
    (Delta/Iceberg).  A leftover `__compact_old` from a crashed run is
    detected and refused with recovery instructions rather than
    silently deleted.  Uses the Hadoop FileSystem API throughout, so
    any supported scheme (hdfs://, file://, s3a with its rename
    caveats) works — not just the local filesystem.  Row-level content
    is asserted identical in tests (modulo order when `sort_cols` is
    None)."""
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    parent = hpath.getParent()
    name = hpath.getName()
    bak = jvm.org.apache.hadoop.fs.Path(parent, name + "__compact_old")
    tmp = jvm.org.apache.hadoop.fs.Path(parent, name + "__compact_tmp")
    if fs.exists(bak):
        raise RuntimeError(
            f"compact_files: leftover {bak} from a crashed swap — "
            f"recover by renaming it back over {path} (if the table "
            "is missing) or deleting it (if the table is complete)")

    n_before, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            n_before += 1
            total += st.getLen()
    n_out = target_files or max(
        1, math.ceil(total / (max(1, target_file_mb) * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_cols:
        cols = [df[c] for c in sort_cols]
        (df.repartitionByRange(n_out, *cols)
         .sortWithinPartitions(*sort_cols)
         .write.mode("overwrite").parquet(str(tmp)))
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(str(tmp))
    if not fs.rename(hpath, bak):
        raise RuntimeError(f"compact_files: rename {path} -> {bak} failed")
    if not fs.rename(tmp, hpath):
        # put the original back before failing — no data loss window
        fs.rename(bak, hpath)
        raise RuntimeError(f"compact_files: rename {tmp} -> {path} failed")
    fs.delete(bak, True)
    n_after = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n_after += 1
    return {"files_before": n_before, "files_in": n_before,
            "files_out": n_after, "bytes": total}
