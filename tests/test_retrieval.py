"""BM25 / RRF / hybrid retrieval unit tests (llm/retrieval.py)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_orders_by_relevance(spark):
    from yardstick_spark.llm import bm25_scores, clear_dedup_caches

    docs = _docs(spark, [
        (1, "spark spark spark join"),          # dense in query terms
        (2, "spark join filler filler filler filler filler filler"),
        (3, "completely unrelated words here"),
        (4, "spark"),
    ])
    got = bm25_scores(docs, "spark join", top_k=10).collect()
    clear_dedup_caches()
    ids = [r.doc_id for r in got]
    assert 3 not in ids, "doc with no query term must be excluded"
    assert ids[0] == 1, "term-dense short doc ranks first"
    assert got[0].rank == 1 and [r.rank for r in got] == list(
        range(1, len(got) + 1))
    # two-term doc beats one-term doc of similar length
    assert ids.index(2) < ids.index(4) or got[ids.index(2)].bm25 > 0


def test_bm25_null_and_empty_text_excluded(spark):
    from yardstick_spark.llm import bm25_scores, clear_dedup_caches

    docs = _docs(spark, [(1, "spark join"), (2, None), (3, ""),
                         (4, "   ")])
    got = bm25_scores(docs, "spark", top_k=10).collect()
    clear_dedup_caches()
    assert [r.doc_id for r in got] == [1]


def test_bm25_pretokenized_layout_bit_identical(spark):
    """The pre-tokenized corpus layout (tokenize_for_bm25 materialized
    once, tokens_col= at query time) must reproduce the scan path's
    (id, bm25, rank) exactly — the contract that lets a standing
    corpus drop the regex+split chain from every query."""
    from yardstick_spark.llm import (bm25_scores, clear_dedup_caches,
                                     tokenize_for_bm25)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    pre = tokenize_for_bm25(docs)
    a = bm25_scores(docs, "spark join window query", top_k=25).collect()
    clear_dedup_caches()
    b = bm25_scores(pre, "spark join window query", top_k=25,
                    tokens_col="tokens").collect()
    clear_dedup_caches()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_index_from_pretokenized_corpus_identical(spark, tmp_path):
    """An index built (and incrementally updated) from the
    pre-tokenized layout must search identically to one built from
    raw text — the layout composes with the whole index lifecycle."""
    from yardstick_spark.llm import (bm25_search_index, save_bm25_index,
                                     tokenize_for_bm25, update_bm25_index)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    pre = tokenize_for_bm25(docs)
    raw_p, tok_p = str(tmp_path / "raw"), str(tmp_path / "tok")
    save_bm25_index(docs, raw_p)
    save_bm25_index(pre.filter("doc_id % 3 != 0"), tok_p,
                    tokens_col="tokens")
    update_bm25_index(pre.filter("doc_id % 3 = 0"), tok_p,
                      tokens_col="tokens")
    q = "spark join window query"
    a = [tuple(r) for r in bm25_search_index(spark, raw_p, q,
                                             top_k=25).collect()]
    b = [tuple(r) for r in bm25_search_index(spark, tok_p, q,
                                             top_k=25).collect()]
    assert a == b


def test_bm25_pretokenized_null_and_empty_docs(spark):
    """NULL/empty/whitespace texts tokenize to NULL or empty arrays;
    the tokens_col path must exclude them exactly like the raw path
    (size(NULL) is NULL post-legacy, so dl/tf stay NULL -> score NULL
    -> filtered)."""
    from yardstick_spark.llm import (bm25_scores, clear_dedup_caches,
                                     tokenize_for_bm25)

    docs = _docs(spark, [(1, "spark join"), (2, None), (3, ""),
                         (4, "   "), (5, "spark")])
    pre = tokenize_for_bm25(docs)
    a = [tuple(r) for r in bm25_scores(docs, "spark", top_k=10).collect()]
    clear_dedup_caches()
    b = [tuple(r) for r in bm25_scores(pre, "spark", top_k=10,
                                       tokens_col="tokens").collect()]
    clear_dedup_caches()
    assert a == b and {r[0] for r in a} == {1, 5}


def test_bm25_rejects_empty_query(spark):
    from yardstick_spark.llm import bm25_scores

    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        bm25_scores(docs, "   ")


def test_bm25_matches_duckdb_formula(spark):
    """Value-level parity with the SQL twin on a corpus with repeated
    terms and length variance — the same check the driver's oracle
    gate runs, pinned locally."""
    import duckdb

    from yardstick_spark.llm import bm25_scores, bm25_sql, \
        clear_dedup_caches

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}delta epsilon "
                f"{'alpha ' * (i % 3)}") for i in range(40)]
    docs = _docs(spark, rows)
    got = [(r.doc_id, r.bm25, r.rank)
           for r in bm25_scores(docs, "alpha gamma", top_k=15).collect()]
    clear_dedup_caches()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(bm25_sql("alpha gamma", top_k=15)).fetchall()
    assert got == [(a, b, c) for a, b, c in want]


def test_bm25_plan_is_scan_plus_takeordered(spark, tmp_path):
    """The fixed-query BM25 never shuffles corpus-sized data: the doc
    scan is pruned to (id, text), top-k compiles to
    TakeOrderedAndProject, and no exchange carries the token arrays
    (only the 1-row stats agg, its broadcast, and the k-row rank
    window shuffle exist)."""
    from yardstick_spark.llm import bm25_scores, clear_dedup_caches

    p = str(tmp_path / "docs.parquet")
    _docs(spark, [(i, "spark join data " * (i % 7 + 1))
                  for i in range(100)]).write.parquet(p)
    docs = spark.read.parquet(p).select("doc_id", "text")
    df = bm25_scores(docs, "spark join", top_k=5)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    full = df._jdf.queryExecution().toString()
    scans = [ln for ln in full.splitlines() if "ReadSchema" in ln]
    assert scans and all("text" in ln and "doc_id" in ln for ln in scans)
    clear_dedup_caches()


def test_bm25_index_matches_scan_path_exactly(spark, tmp_path):
    """The persisted inverted index must reproduce bm25_scores
    bit-for-bit (same stats, query-order float fold) — the contract
    that lets ret_bm25_indexed share ret_bm25's oracle."""
    from yardstick_spark.llm import (bm25_scores, bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index)

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}delta epsilon "
                f"{'alpha ' * (i % 3)}") for i in range(60)] + [(99, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "bm25_idx")
    save_bm25_index(docs, p, buckets=8)
    got = [(r.doc_id, r.bm25, r.rank)
           for r in bm25_search_index(spark, p, "alpha gamma",
                                      top_k=20).collect()]
    want = [(r.doc_id, r.bm25, r.rank)
            for r in bm25_scores(docs, "alpha gamma",
                                 top_k=20).collect()]
    clear_dedup_caches()
    assert got == want


def test_bm25_index_partition_prunes(spark, tmp_path):
    """A query must read only its terms' bucket partitions: the scan
    carries a bucket PartitionFilter, and the files actually read are
    a strict subset of the index."""
    from pathlib import Path

    from yardstick_spark.llm import (bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index)

    docs = spark.createDataFrame(
        [(i, f"term{i % 50} common filler") for i in range(200)],
        "doc_id long, text string")
    p = str(tmp_path / "bm25_idx")
    save_bm25_index(docs, p, buckets=16)
    n_buckets = len(list((Path(p) / "postings").glob("bucket=*")))
    assert n_buckets > 2, "corpus should spread over several buckets"
    df = bm25_search_index(spark, p, "term3", top_k=5)
    df.collect()
    # inputFiles() lists the unfiltered relation, so assert on the
    # scan node: the bucket filter must land in PartitionFilters (file
    # pruning) and the term filter in PushedFilters (row-group pruning)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any("bucket" in ln for ln in scan), plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "bucket" in pf and pf.strip(), \
        f"bucket partition filter must be present, got: {pf!r}"
    assert "PushedFilters" in plan and "term" in plan
    clear_dedup_caches()


def test_bm25_index_incremental_equals_rebuild(spark, tmp_path):
    """update_bm25_index folds a new batch in O(batch): the updated
    index must score EXACTLY like a full rebuild over old∪new (same
    integer stats, same df sums, same postings) — and both equal the
    scan path."""
    from yardstick_spark.llm import (bm25_scores, bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index, update_bm25_index)

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}delta "
                f"{'alpha ' * (i % 3)}") for i in range(80)] + [(99, None)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    old = full.filter("doc_id < 50")
    new = full.filter("doc_id >= 50")

    inc = str(tmp_path / "inc_idx")
    save_bm25_index(old, inc, buckets=8)
    update_bm25_index(new, inc)
    reb = str(tmp_path / "reb_idx")
    save_bm25_index(full, reb, buckets=8)

    q = "alpha gamma"
    got_inc = [(r.doc_id, r.bm25, r.rank)
               for r in bm25_search_index(spark, inc, q,
                                          top_k=30).collect()]
    got_reb = [(r.doc_id, r.bm25, r.rank)
               for r in bm25_search_index(spark, reb, q,
                                          top_k=30).collect()]
    got_scan = [(r.doc_id, r.bm25, r.rank)
                for r in bm25_scores(full, q, top_k=30).collect()]
    clear_dedup_caches()
    assert got_inc == got_reb == got_scan


def test_swap_dataset_is_crash_recoverable(spark, tmp_path):
    """The rename-aside swap must (a) replace the live dataset, (b)
    clean up both the temp and the _old copy on success, (c) sweep a
    stale _old left by a previous crashed swap, and (d) install the
    temp even when no live dataset exists yet (first build)."""
    from yardstick_spark.llm.store import swap_dataset

    dst = str(tmp_path / "ds")
    # (d) first build: no live dataset
    spark.range(3).write.parquet(str(tmp_path / "t1"))
    swap_dataset(spark, str(tmp_path / "t1"), dst, "test")
    assert spark.read.parquet(dst).count() == 3
    assert not (tmp_path / "t1").exists()
    # (a)+(b) replace live; (c) stale _old from a "crashed" prior swap
    (tmp_path / "ds_old").mkdir()
    (tmp_path / "ds_old" / "junk").write_text("stale")
    spark.range(7).write.parquet(str(tmp_path / "t2"))
    swap_dataset(spark, str(tmp_path / "t2"), dst, "test")
    assert spark.read.parquet(dst).count() == 7
    assert not (tmp_path / "ds_old").exists()
    assert not (tmp_path / "t2").exists()


class _Boom(RuntimeError):
    pass


def _crash_on_call(real, n, after=True):
    """Wrap a callable so its n-th invocation raises — AFTER performing
    the real effect when `after` (simulating a crash just past the
    step), before it otherwise."""
    state = {"i": 0}

    def wrap(*a, **k):
        state["i"] += 1
        if state["i"] == n:
            if after:
                real(*a, **k)
            raise _Boom(f"injected crash at call {n}")
        return real(*a, **k)

    return wrap


_BM25_CRASH_POINTS = [
    # (which callable to sabotage, nth call, after-effect?)
    ("parquet", 1, False),   # crash after pending write, before append
    ("parquet", 1, True),    # crash after postings append
    ("parquet", 2, True),    # crash after dfs_tmp write
    ("rename", 1, True),     # crash after dfs -> dfs_old (mid-swap)
    ("rename", 2, True),     # crash after dfs_tmp -> dfs (pre-commit)
    ("replace", 1, False),   # crash just before the meta commit
    ("replace", 1, True),    # crash after meta commit, before cleanup
]


@pytest.mark.parametrize("target,nth,after", _BM25_CRASH_POINTS)
def test_bm25_update_crash_then_rerun(spark, tmp_path, monkeypatch,
                                      target, nth, after):
    """Kill update_bm25_index at every step boundary of its protocol,
    then rerun the SAME batch naively: the rerun must converge to
    exactly-once semantics (scores identical to a full rebuild and to
    the scan path — no double-counted postings or df), and a further
    rerun must be a no-op that leaves no pending/_old/_tmp residue."""
    import os as _os

    from pyspark.sql.readwriter import DataFrameWriter

    from yardstick_spark.llm import (bm25_scores, bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index, update_bm25_index)
    from yardstick_spark.llm import store as ysstore

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}delta "
                f"{'alpha ' * (i % 3)}") for i in range(80)] + [(99, None)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    old, new = full.filter("doc_id < 50"), full.filter("doc_id >= 50")
    inc = str(tmp_path / "inc_idx")
    save_bm25_index(old, inc, buckets=8)  # before any sabotage

    with monkeypatch.context() as m:
        if target == "parquet":
            m.setattr(DataFrameWriter, "parquet",
                      _crash_on_call(DataFrameWriter.parquet, nth,
                                     after))
        elif target == "rename":
            m.setattr(ysstore, "rename_dataset",
                      _crash_on_call(ysstore.rename_dataset, nth,
                                     after))
        else:
            m.setattr(_os, "replace",
                      _crash_on_call(_os.replace, nth, after))
        with pytest.raises(_Boom):
            update_bm25_index(new, inc)

    update_bm25_index(new, inc)  # naive rerun of the same batch
    update_bm25_index(new, inc)  # and again: applied-batch no-op

    reb = str(tmp_path / "reb_idx")
    save_bm25_index(full, reb, buckets=8)
    q = "alpha gamma"
    got_inc = [(r.doc_id, r.bm25, r.rank)
               for r in bm25_search_index(spark, inc, q,
                                          top_k=30).collect()]
    got_reb = [(r.doc_id, r.bm25, r.rank)
               for r in bm25_search_index(spark, reb, q,
                                          top_k=30).collect()]
    got_scan = [(r.doc_id, r.bm25, r.rank)
                for r in bm25_scores(full, q, top_k=30).collect()]
    clear_dedup_caches()
    assert got_inc == got_reb == got_scan
    assert not (tmp_path / "inc_idx" / "_bm25_pending.json").exists()
    assert not (tmp_path / "inc_idx" / "dfs_old").exists()
    assert not (tmp_path / "inc_idx" / "dfs_tmp").exists()


def test_bm25_crash_after_commit_then_different_batch(spark, tmp_path,
                                                      monkeypatch):
    """A crash BETWEEN the meta commit and residue cleanup leaves a
    pending marker for a batch that DID commit.  The next invocation
    with a DIFFERENT batch (not a retry) must clean the residue, NOT
    roll back — the old rollback deleted the committed batch's posting
    files and restored the pre-batch dfs while meta kept the committed
    n_docs/sum_dl, a silently inconsistent index (r10 ADVICE,
    retrieval.py:347)."""
    import os as _os

    from yardstick_spark.llm import (bm25_scores, bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index, update_bm25_index)

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}delta "
                f"{'alpha ' * (i % 3)}") for i in range(90)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    inc = str(tmp_path / "inc")
    save_bm25_index(full.filter("doc_id < 30"), inc, buckets=8)

    state = {"i": 0}
    real = _os.replace

    def crash_after_first(*a, **k):
        state["i"] += 1
        real(*a, **k)   # the meta commit lands
        if state["i"] == 1:
            raise _Boom("injected")

    with monkeypatch.context() as m:
        m.setattr(_os, "replace", crash_after_first)
        with pytest.raises(_Boom):
            update_bm25_index(
                full.filter("doc_id >= 30 and doc_id < 60"), inc)
    # DIFFERENT batch next — not a retry of the crashed one
    update_bm25_index(full.filter("doc_id >= 60"), inc)

    reb = str(tmp_path / "reb")
    save_bm25_index(full, reb, buckets=8)
    q = "alpha gamma"
    got = [(r.doc_id, r.bm25) for r in
           bm25_search_index(spark, inc, q, top_k=40).collect()]
    want = [(r.doc_id, r.bm25) for r in
            bm25_search_index(spark, reb, q, top_k=40).collect()]
    scan = [(r.doc_id, r.bm25) for r in
            bm25_scores(full, q, top_k=40).collect()]
    clear_dedup_caches()
    assert got == want == scan, "committed batch must survive"
    assert not (tmp_path / "inc" / "_bm25_pending.json").exists()
    assert not (tmp_path / "inc" / "dfs_old").exists()


def test_bm25_concurrent_writer_fails_loudly(spark, tmp_path):
    """Single-writer contract: a second update that finds a pending
    marker stamped by a LIVE process must raise instead of rolling
    back the in-flight writer's work; once that process is dead the
    marker is a normal crashed-writer residue and recovery proceeds."""
    import json
    import socket
    import subprocess
    import sys as _sys

    from yardstick_spark.llm import (bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index, update_bm25_index)
    from yardstick_spark.llm.store import list_dataset_files

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}") for i in range(60)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    inc = str(tmp_path / "inc")
    save_bm25_index(full.filter("doc_id < 30"), inc, buckets=8)
    # forge the marker another live writer would have left: its pid is
    # a real, running process that is NOT this one
    other = subprocess.Popen(
        [_sys.executable, "-c", "import time; time.sleep(300)"])
    pend = {"batch": "somebody-elses-batch",
            "postings_files": list_dataset_files(spark,
                                                 inc + "/postings"),
            "pid": other.pid, "host": socket.gethostname()}
    (tmp_path / "inc" / "_bm25_pending.json").write_text(
        json.dumps(pend))
    try:
        with pytest.raises(RuntimeError, match="single-writer"):
            update_bm25_index(full.filter("doc_id >= 30"), inc)
    finally:
        other.kill()
        other.wait()
    # writer is dead now -> the same marker reads as a crashed run and
    # the update recovers + applies normally
    update_bm25_index(full.filter("doc_id >= 30"), inc)
    reb = str(tmp_path / "reb")
    save_bm25_index(full, reb, buckets=8)
    got = [(r.doc_id, r.bm25) for r in
           bm25_search_index(spark, inc, "alpha gamma",
                             top_k=40).collect()]
    want = [(r.doc_id, r.bm25) for r in
            bm25_search_index(spark, reb, "alpha gamma",
                              top_k=40).collect()]
    clear_dedup_caches()
    assert got == want
    assert not (tmp_path / "inc" / "_bm25_pending.json").exists()


def test_bm25_update_distinct_batches_still_apply(spark, tmp_path):
    """The batch-id dedup must not eat a GENUINELY new batch: two
    different batches applied back-to-back both land (equals a full
    rebuild over all three parts)."""
    from yardstick_spark.llm import (bm25_search_index,
                                     clear_dedup_caches,
                                     save_bm25_index, update_bm25_index)

    rows = [(i, f"alpha beta {'gamma ' * (i % 5)}") for i in range(90)]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    inc = str(tmp_path / "inc")
    save_bm25_index(full.filter("doc_id < 30"), inc, buckets=8)
    update_bm25_index(full.filter("doc_id >= 30 and doc_id < 60"), inc)
    update_bm25_index(full.filter("doc_id >= 60"), inc)
    reb = str(tmp_path / "reb")
    save_bm25_index(full, reb, buckets=8)
    q = "alpha gamma"
    got = [(r.doc_id, r.bm25) for r in
           bm25_search_index(spark, inc, q, top_k=40).collect()]
    want = [(r.doc_id, r.bm25) for r in
            bm25_search_index(spark, reb, q, top_k=40).collect()]
    clear_dedup_caches()
    assert got == want


def test_heal_dataset_restores_renamed_aside_store(spark, tmp_path):
    """A swap that died between rename-aside and rename-into-place
    leaves only `<dst>_old`; heal_dataset restores it so a reader's
    (or rerunning updater's) initial read succeeds — and is a no-op
    in the healthy and both-copies states."""
    from yardstick_spark.llm.store import heal_dataset

    dst = str(tmp_path / "ds")
    spark.range(5).write.parquet(dst + "_old")  # crashed mid-swap
    heal_dataset(spark, dst, "test")
    assert spark.read.parquet(dst).count() == 5
    assert not (tmp_path / "ds_old").exists()
    heal_dataset(spark, dst, "test")  # healthy: no-op
    assert spark.read.parquet(dst).count() == 5
    spark.range(2).write.parquet(dst + "_old")  # both copies: keep dst
    heal_dataset(spark, dst, "test")
    assert spark.read.parquet(dst).count() == 5


def test_rrf_hand_computed(spark):
    from yardstick_spark.llm import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (10, 2), (40, 3)],
                              "doc_id long, rank int")
    got = {r.doc_id: (r.rrf, r.n_lists, r.rank)
           for r in rrf_fuse([a, b], top_k=10).collect()}
    # 10 and 20 tie exactly (same two contributions) -> id tiebreak
    assert got[10] == (round(1 / 61 + 1 / 62, 6), 2, 1)
    assert got[20] == (round(1 / 62 + 1 / 61, 6), 2, 2)
    assert got[30] == (round(1 / 63, 6), 1, 3)  # id tiebreak vs 40
    assert got[40] == (round(1 / 63, 6), 1, 4)


def test_rrf_three_lists_repartition_stable(spark):
    """With >= 3 lists a plain float SUM would fold in partition order;
    the sorted-array fold pins bit-identical rrf under any layout."""
    from yardstick_spark.llm import rrf_fuse

    lists = [
        spark.createDataFrame(
            [(d, r + 1) for r, d in enumerate(perm)],
            "doc_id long, rank int")
        for perm in ([1, 2, 3, 4], [3, 1, 4, 2], [2, 4, 1, 3])
    ]
    ref = None
    for n in (1, 2, 8):
        got = sorted(map(tuple, rrf_fuse(
            [df.repartition(n) for df in lists], top_k=10).collect()))
        if ref is None:
            ref = got
        else:
            assert got == ref


def test_rrf_requires_input(spark):
    from yardstick_spark.llm import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_semantic_decontaminate_verdicts_and_edge_cases(spark):
    """Nearest-benchmark verdicts: exact duplicate flagged, orthogonal
    doc not; ties on the rounded max take the SMALLEST bench id; NULL,
    ragged, and zero-norm corpus vectors are excluded (unknown content
    can't be declared contaminated); zero-norm benchmark rows drop out
    of the max."""
    from yardstick_spark.llm import semantic_decontaminate

    bench = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]),  # duplicate pair
         (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 0.0])],  # zero-norm
        "vec_id long, embedding array<float>")
    corpus = spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0]),       # == bench 0 and 1 (tie) -> 0
         (101, [0.0, 0.0, 5.0]),       # orthogonal to all
         (102, None),                  # NULL: excluded
         (103, [1.0, 0.0]),            # ragged: excluded
         (104, [0.0, 0.0, 0.0])],      # zero-norm: excluded
        "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in
           semantic_decontaminate(corpus, bench, threshold=0.9)
           .collect()}
    assert set(got) == {100, 101}
    assert got[100].bench_id == 0 and got[100].max_sim == 1.0 \
        and got[100].contaminated == 1
    assert got[101].max_sim == 0.0 and got[101].contaminated == 0


def test_semantic_decontaminate_plan_is_shuffle_free(spark, tmp_path):
    """The verdicts are produced map-side: ONE corpus scan feeding the
    Arrow-closure mapInPandas, ZERO exchanges anywhere in the plan
    (the relational formulation would inflate |benchmark|x through a
    cross-join exchange)."""
    from pyspark.sql import functions as F

    from yardstick_spark.llm import semantic_decontaminate

    p = str(tmp_path / "vecs.parquet")
    spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(200)],
        "vec_id long, embedding array<float>").write.parquet(p)
    emb = spark.read.parquet(p)
    df = semantic_decontaminate(emb.filter("vec_id >= 20"),
                                emb.filter("vec_id < 20"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_semantic_decontaminate_empty_benchmark(spark):
    from yardstick_spark.llm import semantic_decontaminate

    corpus = spark.createDataFrame([(1, [1.0, 2.0])],
                                   "vec_id long, embedding array<float>")
    bench = corpus.filter("vec_id < 0")
    assert semantic_decontaminate(corpus, bench).count() == 0


def test_retrieval_eval_hand_computed(spark):
    """recall = |res ∩ truth| / |truth|, mrr = 1/rank of the first
    relevant result, 0.0 when nothing relevant retrieved, and queries
    missing from results entirely still get a row (recall 0)."""
    from yardstick_spark.llm import retrieval_eval

    truth = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 3, 1), ("c", 4, 1)],
        "query_id string, neighbor_id long, rank int")
    res = spark.createDataFrame(
        [("a", 9, 1), ("a", 2, 2), ("a", 1, 3),   # hits at ranks 2, 3
         ("b", 8, 1), ("b", 7, 2)],               # no hit; c absent
        "query_id string, neighbor_id long, rank int")
    got = {r.query_id: r for r in retrieval_eval(res, truth).collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a.n_truth, a.n_results, a.hits) == (2, 3, 2)
    assert a.recall == 1.0 and a.mrr == 0.5
    b = got["b"]
    assert (b.n_truth, b.hits, b.recall, b.mrr) == (1, 0, 0.0, 0.0)
    c = got["c"]
    assert (c.n_results, c.recall, c.mrr) == (0, 0.0, 0.0)


def test_hybrid_search_fuses_both_legs(spark):
    from yardstick_spark.llm import clear_dedup_caches, hybrid_search

    docs = _docs(spark, [(i, ("spark join " * (i % 4)) or "noise word")
                         for i in range(30)])
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<float>")
    got = hybrid_search(docs, emb, "spark join", [4.0, 1.0, 2.0],
                        top_k=8, fetch_k=10).collect()
    clear_dedup_caches()
    assert 0 < len(got) <= 8
    assert all(r.n_lists in (1, 2) for r in got)
    assert any(r.n_lists == 2 for r in got), \
        "some doc should appear in both the lexical and dense lists"
    assert [r.rank for r in got] == list(range(1, len(got) + 1))
