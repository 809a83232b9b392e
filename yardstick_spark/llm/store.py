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

      0. if `<dst>` is missing but `<dst>_old` exists (a previous swap
         died between its steps 2 and 3), restore `<dst>_old` ->
         `<dst>` — the swap self-heals instead of requiring a manual
         rename;
      1. delete any stale `<dst>_old` from an earlier crashed swap
         (only when `<dst>` itself is present, i.e. the leftover is
         genuinely stale);
      2. rename live `<dst>` -> `<dst>_old`  (old copy still complete);
      3. rename `<tmp>` -> `<dst>`           (new copy now live);
      4. delete `<dst>_old`.

    Each rename is individually atomic on HDFS/posix; a crash between
    2 and 3 leaves the data at `<dst>_old` (healed by step 0 on the
    next swap OR by any caller that read `<dst>` first — see
    `heal_dataset`), and a crash before 4 leaves both copies.
    `what` names the store in
    error messages.  On object stores where rename is copy+delete
    (plain S3), the same ordering still guarantees one complete copy
    exists at all times."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dst_h = jvm.org.apache.hadoop.fs.Path(dst_path)
    tmp_h = jvm.org.apache.hadoop.fs.Path(tmp_path)
    old_h = jvm.org.apache.hadoop.fs.Path(dst_path + "_old")
    fs = dst_h.getFileSystem(conf)
    # Self-heal a crash between steps 2 and 3 of a PREVIOUS swap: dst
    # missing but dst_old present means the old copy was renamed aside
    # and the process died before the new copy landed.  Restoring it
    # here (instead of deleting it as "stale") makes a naive rerun of
    # the calling update just work — its initial read of dst succeeds.
    if fs.exists(old_h) and not fs.exists(dst_h):
        if not fs.rename(old_h, dst_h):
            raise RuntimeError(
                f"{what}: crash recovery rename {dst_path}_old -> "
                f"{dst_path} failed — restore it manually and rerun")
    else:
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


def _hfs(spark, path: str):
    """(FileSystem, Path) for a store path via the session's Hadoop
    conf — one place so every helper resolves schemes identically."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def heal_dataset(spark, dst_path: str, what: str) -> None:
    """Read-time self-heal for a `swap_dataset` store: if `<dst>` is
    missing but `<dst>_old` exists (a swap died between rename-aside
    and rename-into-place), restore the old copy so the caller's read
    succeeds.  A no-op in every healthy state — callers invoke it
    unconditionally before reading an updatable store."""
    fs, dst_h = _hfs(spark, dst_path)
    old_h = spark._jvm.org.apache.hadoop.fs.Path(dst_path + "_old")
    if fs.exists(old_h) and not fs.exists(dst_h):
        if not fs.rename(old_h, dst_h):
            raise RuntimeError(
                f"{what}: crash recovery rename {dst_path}_old -> "
                f"{dst_path} failed — restore it manually and rerun")


def _dataset_exists(spark, path: str) -> bool:
    fs, p = _hfs(spark, path)
    return bool(fs.exists(p))


def delete_dataset(spark, path: str) -> None:
    """Recursive delete (no-op when absent), scheme-aware."""
    fs, p = _hfs(spark, path)
    fs.delete(p, True)


def rename_dataset(spark, src: str, dst: str, what: str) -> None:
    """Single atomic-on-HDFS/posix rename with a loud failure."""
    fs, src_h = _hfs(spark, src)
    dst_h = spark._jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(src_h, dst_h):
        raise RuntimeError(f"{what}: rename {src} -> {dst} failed")


def list_dataset_files(spark, path: str) -> list[str]:
    """Sorted relative paths of every data file under a dataset root
    (recursive), EXCLUDING in-flight commit-protocol `_temporary`
    trees — the stable listing a crash-rollback diff compares against.
    Empty list when the root does not exist."""
    fs, root = _hfs(spark, path)
    if not fs.exists(root):
        return []
    out = []
    root_uri = root.toUri().getPath()
    it = fs.listFiles(root, True)
    while it.hasNext():
        f = it.next().getPath().toUri().getPath()
        rel = f[len(root_uri):].lstrip("/")
        if "_temporary" not in rel.split("/"):
            out.append(rel)
    return sorted(out)


def delete_dataset_files(spark, path: str, keep: set[str],
                         what: str) -> int:
    """Delete every file under `path` whose root-relative path is NOT
    in `keep` (plus any `_temporary` commit debris) — the rollback
    half of an append-then-crash recovery.  Returns how many files
    were removed."""
    fs, root = _hfs(spark, path)
    if not fs.exists(root):
        return 0
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    root_uri = root.toUri().getPath()
    doomed = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        f = it.next().getPath().toUri().getPath()
        rel = f[len(root_uri):].lstrip("/")
        if "_temporary" in rel.split("/"):
            continue  # whole tree removed below
        if rel not in keep:
            doomed.append(f)
    for f in doomed:
        if not fs.delete(jvm_path(f), False):
            raise RuntimeError(f"{what}: rollback delete {f} failed")
    fs.delete(jvm_path(root_uri + "/_temporary"), True)
    return len(doomed)


def writer_stamp() -> dict:
    """pid + host fields a store writer folds into its pending marker,
    so a LATER writer can tell a crashed run (pid dead -> recover) from
    a live concurrent one (pid alive -> raise).  Best-effort and
    same-host only — across hosts the single-writer contract remains
    the caller's responsibility (there is no distributed lock here by
    design; these stores are driver-coordinated)."""
    import os
    import socket

    return {"pid": os.getpid(), "host": socket.gethostname()}


def raise_if_live_writer(pend: dict, what: str) -> None:
    """Loudly reject a concurrent update: if the pending marker was
    stamped by a DIFFERENT, still-alive process on this host, a second
    writer is mid-update and running recovery now would roll back its
    in-flight work (silent store corruption under the declared
    single-writer contract).  A dead pid (the normal crashed-writer
    case), a marker from another host, a legacy marker without a pid,
    or our own pid (same-process retry after an injected crash) all
    fall through to the existing recovery logic."""
    import os
    import socket

    pid, host = pend.get("pid"), pend.get("host")
    if not pid or host != socket.gethostname() or pid == os.getpid():
        return
    try:
        os.kill(pid, 0)
    except OSError:
        return  # process is gone: a crashed writer, recovery may run
    raise RuntimeError(
        f"{what}: another writer (pid {pid} on {host}) holds the "
        f"pending marker — this store is single-writer; wait for that "
        f"update to finish (or kill it) before retrying")
