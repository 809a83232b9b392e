"""Shared persistence plumbing for the incremental index/store family
(BM25 dfs table, DSIR bucket counts, minhash signature store).

The stores rewrite small merged tables via a temp dataset + swap —
reading and overwriting the same parquet path in one plan is not safe.
The swap here is CRASH-RECOVERABLE: the live dataset renames ASIDE
before the temp dataset renames into place, so a crash at any point
leaves at least one complete copy on disk (`<dst>` or `<dst>_old`),
never a store with no table at all.  Hadoop FileSystem renames, not
local shutil: the store lives on whatever scheme the cluster uses
(hdfs://, file://, s3a with its rename caveats).
"""

from __future__ import annotations


def swap_dataset(spark, tmp_path: str, dst_path: str, what: str) -> None:
    """Move the freshly-written dataset at `tmp_path` into place at
    `dst_path`, keeping the previous copy recoverable throughout:

      1. delete any stale `<dst>_old` from an earlier crashed swap;
      2. rename live `<dst>` -> `<dst>_old`  (old copy still complete);
      3. rename `<tmp>` -> `<dst>`           (new copy now live);
      4. delete `<dst>_old`.

    Each rename is individually atomic on HDFS/posix; a crash between
    2 and 3 leaves the data at `<dst>_old` (restore = one rename), and
    a crash before 4 leaves both copies.  `what` names the store in
    error messages.  On object stores where rename is copy+delete
    (plain S3), the same ordering still guarantees one complete copy
    exists at all times."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dst_h = jvm.org.apache.hadoop.fs.Path(dst_path)
    tmp_h = jvm.org.apache.hadoop.fs.Path(tmp_path)
    old_h = jvm.org.apache.hadoop.fs.Path(dst_path + "_old")
    fs = dst_h.getFileSystem(conf)
    fs.delete(old_h, True)  # stale leftover from a crashed swap
    if fs.exists(dst_h) and not fs.rename(dst_h, old_h):
        raise RuntimeError(
            f"{what}: rename {dst_path} -> {dst_path}_old failed — "
            "live table untouched; rerun the update")
    if not fs.rename(tmp_h, dst_h):
        raise RuntimeError(
            f"{what}: rename {tmp_path} -> {dst_path} failed — "
            f"previous table preserved at {dst_path}_old; restore it "
            "with a rename and rerun the update")
    fs.delete(old_h, True)
