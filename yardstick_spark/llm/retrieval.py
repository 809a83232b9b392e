"""Full-text and hybrid retrieval: Okapi BM25 scoring, reciprocal-rank
fusion, and a BM25+embedding hybrid search.

Greenfield Spark-first designs (no reference counterpart — the
reference engine has no retrieval surface): the 100 TB shapes are

* `bm25_scores` — for a FIXED small query (a handful of terms, the
  interactive-retrieval case) BM25 needs NO explode and NO wide
  shuffle: per-document term frequencies for the query terms are
  computed scan-side with array higher-order functions, corpus
  statistics (N, avgdl, per-term df) are ONE map-side-combined 1-row
  aggregate broadcast back over the scan, and top-k is Spark's
  distributed TakeOrderedAndProject.  Total cost: two passes over a
  pruned (id, tokens) projection — the second rides a cache barrier —
  and a k-row result.  Compare the classic inverted-index formulation
  (explode -> groupBy(term) -> join): that shuffles the whole posting
  list of every query term; this shuffles nothing but the final k rows.
* `rrf_fuse` — reciprocal-rank fusion over ALREADY-RANKED top-k lists.
  Inputs are bounded (each retriever emitted <= its own top-k), so the
  union + groupBy is trivially small; documented as such rather than
  pretending it needs a scale path.
* `hybrid_search` — BM25 lexical top-k fused with embedding-cosine
  top-k (the folded single-scan kNN from `similarity.py`), the
  standard first-stage retrieval stack for RAG-style pipelines.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

# same normalization every text operator here uses (llm/text.py _NORM)
_NORM = "regexp_replace(lower(trim({c})), '\\\\s+', ' ')"


def _query_terms(query: str) -> list[str]:
    """Driver-side twin of the scan-side normalization: lower, collapse
    whitespace, split — deduplicated, original order kept (the score is
    a sum over DISTINCT query terms, standard bag-of-words BM25)."""
    norm = re.sub(r"\s+", " ", query.lower().strip())
    seen: dict[str, None] = {}
    for t in norm.split(" "):
        if t:
            seen.setdefault(t, None)
    return list(seen)


def _bm25_contrib(tf: str, df: str, k1: float, b: float) -> str:
    """One query term's BM25 contribution — the EXACT expression both
    the scan path and the index path evaluate (n_docs BIGINT and avgdl
    DOUBLE must be columns: a non-integer SQL literal would type as
    DECIMAL and drift a ulp from the double arithmetic).  nullif
    guards the every-document-empty corpus (avgdl 0): ANSI Spark
    throws on the 0/0, NULL instead makes every score NULL → excluded,
    which is also what the DuckDB twin's NaN does under `bm25 > 0`;
    for any avgdl > 0 nullif is the identity, so bit-parity holds."""
    return (f"ln(1 + (n_docs - {df} + 0.5) / ({df} + 0.5))"
            f" * {tf} * {k1 + 1.0}"
            f" / ({tf} + {k1} * (1 - {b} + {b} * dl / nullif(avgdl, 0)))")


def tokenize_for_bm25(docs: DataFrame, text_col: str = "text",
                      tokens_col: str = "tokens") -> DataFrame:
    """Append the exact token array `bm25_scores` computes scan-side —
    the PRE-TOKENIZED corpus layout.  Materialize this once (parquet
    with an array<string> column) and pass `tokens_col=` to
    `bm25_scores`: scores are bit-identical (same normalization, same
    array) while the per-query cost drops the regex+split chain — the
    measured tokenization share of the 100x scan path.  The layout
    trade is the same as bucketed joins: pay one rewrite to delete the
    dominant per-query term from every future scan."""
    norm = _NORM.format(c=text_col)
    toks = f"filter(split({norm}, ' '), t -> t <> '')"
    return docs.withColumn(tokens_col, F.expr(toks))


def bm25_scores(docs: DataFrame, query: str, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
                top_k: int = 10, round_to: int = 6,
                tokens_col: str | None = None) -> DataFrame:
    """Okapi BM25 top-`top_k` documents for a literal query string.

    Returns (id_col, bm25, rank) ordered by (bm25 desc, id asc).

    score(d) = sum over distinct query terms t of
      idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene's
    non-negative variant), tf = occurrences of t in d, dl = |tokens of
    d|, avgdl = corpus mean dl, df = #docs containing t.  Documents
    matching no query term score 0 and are excluded.

    Scale shape: `tokens` is computed once per document scan-side; per
    query term, tf is an array `filter` over that token array (the
    query is small and LITERAL, so this is |q| lambda passes, not an
    explode).  The (id, dl, tf...) projection is cached — one slim row
    per document — the corpus statistics aggregate over it map-side
    into ONE row that broadcasts back via cross join, and the
    ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-partition
    heaps, driver merges n_partitions * k rows).  No shuffle ever
    carries document text or posting lists.

    `tokens_col`: name of a PRE-TOKENIZED array<string> column built
    with `tokenize_for_bm25` (or the identical expression) — skips the
    per-query regex+split chain entirely; scores are bit-identical by
    construction.  The caller owns the contract that the stored tokens
    match the normalization (lower, whitespace-collapse, no empties)."""
    from .dedup import _cache

    terms = _query_terms(query)
    if not terms:
        raise ValueError("query has no terms after normalization")
    norm = _NORM.format(c=text_col)
    toks = f"filter(split({norm}, ' '), t -> t <> '')"
    tk_src = F.col(tokens_col) if tokens_col is not None else F.expr(toks)
    # tokenize ONCE per row in its own projection: `tk` is referenced
    # |q|+1 times below, and CollapseProject keeps the boundary rather
    # than duplicate a non-cheap alias — inlining `toks` into every
    # column re-ran the regex+split per column (measured 5.5 s vs
    # 1.5 s for the 10x projection)
    per_doc = _cache(docs.select(
        F.col(id_col).alias("id"), tk_src.alias("tk")
    ).select(
        "id",
        F.expr("size(tk)").alias("dl"),
        *[
            F.expr(f"size(filter(tk, t -> t = '{t}'))").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    ))
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    contrib = " + ".join(
        _bm25_contrib(f"tf_{i}", f"df_{i}", k1, b)
        for i in range(len(terms))
    )
    scored = (
        per_doc.join(F.broadcast(stats))
        .withColumn("bm25", F.expr(f"round({contrib}, {round_to})"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("id"))
        .limit(top_k)
    )
    from pyspark.sql import Window

    # rank over the <= top_k surviving rows — bounded by construction,
    # so the unpartitioned window is a k-row driver-side formality
    w = Window.orderBy(F.col("bm25").desc(), F.col("id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select(F.col("id").alias(id_col), "bm25", "rank")


def bm25_sql(query: str, text_col: str = "text", id_col: str = "doc_id",
             table: str = "documents", k1: float = 1.2, b: float = 0.75,
             top_k: int = 10, round_to: int = 6) -> str:
    """ANSI-SQL twin of `bm25_scores` (the DuckDB oracle): identical
    tokenization, tf/df/avgdl statistics, and idf arithmetic, term by
    term in the same order so the float sum folds identically."""
    terms = _query_terms(query)
    norm = (f"regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')")
    toks = f"list_filter(string_split({norm}, ' '), t -> t <> '')"
    tf_cols = ", ".join(
        f"len(list_filter(tk, t -> t = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contrib = " + ".join(
        _bm25_contrib(f"tf_{i}", f"df_{i}", k1, b)
        for i in range(len(terms))
    )
    return f"""
        WITH tok AS (SELECT {id_col} AS id, {toks} AS tk FROM {table}),
        d AS (SELECT id, len(tk) AS dl, {tf_cols} FROM tok),
        s AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                     {df_cols} FROM d),
        scored AS (SELECT id, ROUND({contrib}, {round_to}) AS bm25
                   FROM d CROSS JOIN s)
        SELECT id AS {id_col}, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, id) AS INT)
                 AS rank
        FROM scored WHERE bm25 > 0
        ORDER BY bm25 DESC, id LIMIT {top_k}"""


def _bm25_batch_parts(docs: DataFrame, text_col: str, id_col: str,
                      buckets: int, tokens_col: str | None = None):
    """(postings, dfs, n_docs, sum_dl, batch_id) for one document
    batch — shared by the initial build and the incremental update.
    Statistics are EXACT INTEGERS (token total + doc count), so
    merging batches is plain addition and avgdl is derived at query
    time from the merged integers, bit-identical to what a full
    rebuild computes.  `tokens_col` consumes a pre-tokenized layout
    (`tokenize_for_bm25`) instead of re-running the regex chain.

    `batch_id` is a deterministic content fingerprint (row count +
    token total + order-independent sum of id hashes), computed inside
    the SAME stats action — zero extra scans.  `update_bm25_index`
    stamps it into the meta sidecar so a rerun of an already-applied
    batch is detected instead of double-appending postings."""
    norm = _NORM.format(c=text_col)
    toks = f"filter(split({norm}, ' '), t -> t <> '')"
    tk_src = (F.col(tokens_col) if tokens_col is not None
              else F.expr(toks))
    base = docs.select(F.col(id_col).alias("id"), tk_src.alias("tk"))
    from .dedup import _cache

    tf = _cache(
        base.select("id", F.expr("size(tk)").alias("dl"),
                    F.explode("tk").alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"),
                                     F.lit(buckets)).cast("int"))
    )
    dfs = tf.groupBy("bucket", "term").agg(F.count("*").alias("df"))
    stats = base.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.expr("size(tk)")), F.lit(0)).alias("sdl"),
        # order-independent fold of the id set: XOR of hashes never
        # overflows (a BIGINT sum would, under ANSI) and ids are
        # unique by the caller contract, so nothing cancels
        F.coalesce(F.expr("bit_xor(xxhash64(cast(id as string)))"),
                   F.lit(0)).alias("idh"),
    ).collect()[0]
    bid = f"{int(stats['n'])}:{int(stats['sdl'])}:{int(stats['idh'])}"
    return tf, dfs, int(stats["n"]), int(stats["sdl"]), bid


def save_bm25_index(docs: DataFrame, path: str, text_col: str = "text",
                    id_col: str = "doc_id", buckets: int = 64,
                    tokens_col: str | None = None) -> None:
    """Persist a BM25 inverted index as the build-once / query-many /
    APPEND-MANY production shape: `{path}/postings` holds (term, id,
    tf, dl) posting rows PARTITIONED BY term-hash bucket, `{path}/dfs`
    holds the (term, df) document frequencies (same partitioning, tiny
    — one row per distinct term), and `_bm25_meta.json` carries exact
    integer corpus statistics (n_docs, sum_dl).

    df lives in its own table, NOT denormalized onto postings: an
    incremental batch changes df for every term it touches, and a
    small rewrite of `dfs` beats rewriting corpus-sized postings
    (which stay append-only — see `update_bm25_index`).  dl IS
    denormalized (a document's length never changes).  Partitioning
    both tables by `pmod(xxhash64(term), buckets)` turns every query
    into a partition-PRUNED scan of ≤ |q| buckets; each bucket is
    repartitioned to one task before the write (the small-file
    problem is the classic partitioned-index killer).

    n_docs counts every row (NULL-text docs included) and avgdl is
    derived at query time as sum_dl/n_docs — matching `bm25_scores`
    exactly, so index-path scores are bit-identical to the scan path."""
    import json
    from pathlib import Path

    tf, dfs, n, sdl, _ = _bm25_batch_parts(docs, text_col, id_col,
                                           buckets, tokens_col)
    post = tf.select("term", "id", "tf", "dl", "bucket")
    (post.repartition(F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(str(Path(path) / "postings")))
    (dfs.repartition(F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(str(Path(path) / "dfs")))
    # schemas ride the sidecar so probes never infer: an index whose
    # corpus produced zero postings (all NULL/empty docs) writes no
    # part files, and schema inference on the empty dataset would fail
    Path(path, "_bm25_meta.json").write_text(json.dumps(
        {"buckets": buckets, "n_docs": n, "sum_dl": sdl,
         "postings_schema": post.schema.json(),
         "dfs_schema": dfs.schema.json()}))


def update_bm25_index(new_docs: DataFrame, path: str,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      tokens_col: str | None = None) -> None:
    """Fold a batch of NEW documents into a `save_bm25_index` dataset
    — O(batch) work, never a corpus rebuild: the batch's posting rows
    APPEND into their bucket partitions, the (tiny) df table is
    re-summed and rewritten, and the integer corpus statistics add up.
    A subsequent `bm25_search_index` scores exactly what a full
    rebuild over old∪new would — pinned by
    tests/test_retrieval.py::test_bm25_index_incremental_equals_rebuild.

    Caller contract (same as the incremental dedup stores): batches
    contain only UNSEEN doc ids — re-ingesting a doc would split its
    tf across duplicate posting rows.

    CRASH SAFETY — the update is idempotent; rerunning the same batch
    after a crash at ANY point converges to exactly-once semantics:

      1. the batch's content fingerprint (`_bm25_batch_parts` bid) is
         compared against `last_batch` in the meta sidecar — a rerun
         of a FULLY applied batch is a no-op (plus residue cleanup);
      2. a `_bm25_pending.json` marker (bid + the pre-append postings
         file listing) is written BEFORE any mutation.  A rerun that
         finds a pending marker first ROLLS BACK the half-applied
         batch: appended posting files (= files not in the recorded
         listing) are deleted, a half-swapped dfs is restored from
         dfs_old, dfs_tmp is removed;
      3. the dfs swap keeps `dfs_old` until AFTER the meta commit
         (unlike the generic `store.swap_dataset`), so rollback can
         always restore the pre-batch dfs;
      4. the meta sidecar (now carrying `last_batch`) commits via
         write-to-temp + atomic rename; it is the commit point —
         before it the rerun rolls back, after it the rerun no-ops.
    Pinned by tests/test_retrieval.py::test_bm25_update_crash_* which
    kill the update between every pair of steps and rerun."""
    import json
    import os
    from pathlib import Path

    from .store import (_dataset_exists, delete_dataset,
                        delete_dataset_files, list_dataset_files,
                        raise_if_live_writer, rename_dataset,
                        writer_stamp)

    meta_p = Path(path, "_bm25_meta.json")
    pend_p = Path(path, "_bm25_pending.json")
    meta = json.loads(meta_p.read_text())
    if pend_p.exists():
        # single-writer contract: refuse to recover over a LIVE writer
        raise_if_live_writer(json.loads(pend_p.read_text()),
                             "update_bm25_index")
    buckets = meta["buckets"]
    tf, new_dfs, n, sdl, bid = _bm25_batch_parts(
        new_docs, text_col, id_col, buckets, tokens_col)
    spark = new_docs.sparkSession
    post_p = str(Path(path) / "postings")
    dfs_p = str(Path(path) / "dfs")
    tmp_p = str(Path(path) / "dfs_tmp")
    if meta.get("last_batch") == bid:
        # batch fully applied by a previous run that crashed after the
        # meta commit — clean the residue and return
        delete_dataset(spark, dfs_p + "_old")
        delete_dataset(spark, tmp_p)
        pend_p.unlink(missing_ok=True)
        return
    if pend_p.exists():
        pend = json.loads(pend_p.read_text())
        if pend.get("batch") == meta.get("last_batch"):
            # the marked batch DID reach its meta commit (the crash was
            # between commit and residue cleanup) and a DIFFERENT batch
            # is now being applied: the index is consistent — clean the
            # residue, never roll back a committed batch
            delete_dataset(spark, dfs_p + "_old")
            delete_dataset(spark, tmp_p)
            pend_p.unlink()
        else:
            # a previous update (this batch or another) died mid-apply
            # before its meta commit: roll it back completely
            # dfs_old exists only between the rename-aside and the meta
            # commit; whatever sits at dfs then (nothing mid-swap, the
            # NEW merged table post-swap) must yield to the pre-batch
            # copy
            fs_old = dfs_p + "_old"
            if _dataset_exists(spark, fs_old):
                delete_dataset(spark, dfs_p)
                rename_dataset(spark, fs_old, dfs_p,
                               "update_bm25_index")
            delete_dataset_files(spark, post_p,
                                 set(pend["postings_files"]),
                                 "update_bm25_index")
            delete_dataset(spark, tmp_p)
            pend_p.unlink()
    # stage: record the batch id and the pre-append postings listing;
    # everything after this line is covered by rollback-on-rerun
    pend_p.write_text(json.dumps(
        {"batch": bid,
         "postings_files": list_dataset_files(spark, post_p),
         **writer_stamp()}))
    post = tf.select("term", "id", "tf", "dl", "bucket")
    (post.repartition(F.col("bucket"))
     .write.mode("append").partitionBy("bucket").parquet(post_p))
    old_dfs = spark.read
    if "dfs_schema" in meta:  # sidecar schema: empty-index safe
        from pyspark.sql.types import StructType

        old_dfs = old_dfs.schema(StructType.fromJson(
            json.loads(meta["dfs_schema"])))
    merged = (
        old_dfs.parquet(dfs_p)
        .select("bucket", "term", "df")
        .unionByName(new_dfs.select("bucket", "term", "df"))
        .groupBy("bucket", "term").agg(F.sum("df").alias("df"))
    )
    # the df table is one row per distinct term — rewrite via a temp
    # dataset + rename-aside swap (reading and overwriting the same
    # parquet path in one plan is not safe), inlined here instead of
    # store.swap_dataset because dfs_old must OUTLIVE the swap until
    # the meta commit below
    (merged.repartition(F.col("bucket"))
     .write.mode("overwrite").partitionBy("bucket").parquet(tmp_p))
    rename_dataset(spark, dfs_p, dfs_p + "_old", "update_bm25_index")
    rename_dataset(spark, tmp_p, dfs_p, "update_bm25_index")
    # commit point: meta carries the applied batch id; atomic rename
    meta_tmp = Path(path, "_bm25_meta.json.tmp")
    meta_tmp.write_text(json.dumps(
        {"buckets": buckets, "n_docs": meta["n_docs"] + n,
         "sum_dl": meta["sum_dl"] + sdl,
         "postings_schema": post.schema.json(),
         "dfs_schema": new_dfs.schema.json(),
         "last_batch": bid}))
    os.replace(meta_tmp, meta_p)
    delete_dataset(spark, dfs_p + "_old")
    pend_p.unlink()


def bm25_search_index(spark, path: str, query: str,
                      id_col: str = "doc_id", k1: float = 1.2,
                      b: float = 0.75, top_k: int = 10,
                      round_to: int = 6) -> DataFrame:
    """BM25 top-k against a `save_bm25_index` dataset — bit-identical
    scores to `bm25_scores` over the original corpus, reading ONLY the
    query terms' posting partitions.

    The probed bucket ids (≤ |q|, computed with the same xxhash64 the
    build used — one bounded collect, like the LSH index probe) become
    a partition-pruning filter; the term IN filter is pushed into the
    surviving files.  Scoring folds per-term contributions in QUERY
    ORDER via a term→contribution map (a groupBy float sum would fold
    in partition order and could drift a ulp from the scan path), so
    index and scan paths agree bit-for-bit, rank for rank."""
    import json
    from pathlib import Path

    meta = json.loads(Path(path, "_bm25_meta.json").read_text())
    from .store import heal_dataset

    heal_dataset(spark, str(Path(path) / "dfs"), "bm25_search_index")
    terms = _query_terms(query)
    if not terms:
        raise ValueError("query has no terms after normalization")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    tb = {r.term: r.b for r in tdf.select(
        "term", F.pmod(F.xxhash64("term"),
                       F.lit(meta["buckets"])).cast("int").alias("b")
    ).collect()}
    bsel = sorted(set(tb.values()))

    def _read(sub: str, schema_key: str):
        r = spark.read
        if schema_key in meta:  # sidecar schema: empty-index safe
            from pyspark.sql.types import StructType

            r = r.schema(StructType.fromJson(
                json.loads(meta[schema_key])))
        return r.parquet(str(Path(path) / sub))

    post = _read("postings", "postings_schema").filter(
        F.col("bucket").isin(bsel) & F.col("term").isin(terms))
    dfs = _read("dfs", "dfs_schema").filter(
        F.col("bucket").isin(bsel) & F.col("term").isin(terms)
    ).select("term", "df")
    # avgdl derives from the exact integer stats the way bm25_scores
    # computes it (double division of the same integers); both stats
    # ride as typed columns, never interpolated literals — a
    # non-integer SQL literal types as DECIMAL and would drift a ulp
    # from the scan path's double arithmetic (caught by the oracle)
    per_term = post.join(F.broadcast(dfs), "term").withColumn(
        "n_docs", F.lit(int(meta["n_docs"])).cast("bigint")
    ).withColumn(
        "avgdl",
        F.lit(int(meta["sum_dl"])).cast("double")
        / F.lit(int(meta["n_docs"])).cast("bigint"),
    ).select("id", "term",
             F.expr(_bm25_contrib("tf", "df", k1, b)).alias("c"))
    # fixed-order fold over the term→contribution map: identical float
    # association to bm25_scores' literal sum
    msum = " + ".join(
        f"coalesce(element_at(m, '{t}'), 0D)" for t in terms)
    scored = (
        per_term.groupBy("id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("term", "c"))).alias("m"))
        .withColumn("bm25", F.expr(f"round({msum}, {round_to})"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col("id"))
        .limit(top_k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col("id"))
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select(F.col("id").alias(id_col), "bm25", "rank")


def rrf_fuse(rankings: Sequence[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k: int = 60,
             top_k: int = 10, round_to: int = 6) -> DataFrame:
    """Reciprocal-rank fusion of already-ranked retrieval lists:
    rrf(d) = sum over lists of 1 / (k + rank_of_d) for the lists that
    contain d.  Returns (id_col, rrf, n_lists, rank).

    Every input is some retriever's top-k output, so the union is
    bounded by sum of the lists' sizes — a few hundred rows however
    large the corpus is.  The groupBy and the final rank window are
    driver-scale formalities on that bounded set; nothing here ever
    touches corpus-sized data (the retrievers already did).

    Determinism: a doc's contributions are summed over a SORTED array
    fold, not a partition-ordered float sum — with three or more lists
    a plain SUM's association order follows row placement and can
    drift a ulp between runs (two contributions are safe by
    commutativity alone, but the operator accepts N).  The per-doc
    array is at most |rankings| elements, so the sorted fold costs
    nothing."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col)
                           .cast("double"))).alias("contrib"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy("id")
        .agg(
            F.expr(
                "round(aggregate(array_sort(collect_list(contrib)), "
                f"0D, (a, x) -> a + x), {round_to})"
            ).alias("rrf"),
            F.count("*").cast("int").alias("n_lists"),
        )
        .orderBy(F.col("rrf").desc(), F.col("id"))
        .limit(top_k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf").desc(), F.col("id"))
    return fused.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select(F.col("id").alias(id_col), "rrf", "n_lists", "rank")


def hybrid_search(docs: DataFrame, embeddings: DataFrame, query: str,
                  query_vec: list[float], top_k: int = 10,
                  fetch_k: int = 20, rrf_k: int = 60,
                  text_col: str = "text", id_col: str = "doc_id",
                  vec_id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """First-stage hybrid retrieval: BM25 lexical top-`fetch_k` fused
    with embedding-cosine top-`fetch_k` by reciprocal rank, top-`top_k`
    returned as (id_col, rrf, n_lists, rank).

    The lexical leg is `bm25_scores` (scan-side tf, no shuffle); the
    dense leg is the folded single-scan kNN (`brute_force_knn`,
    strategy='fold': the query vector rides the Arrow closure, only
    n_partitions * k candidate rows ever shuffle).  Fusion sees two
    <= fetch_k row lists.  `embeddings` ids must share the document id
    space (vec_id == doc_id in the test corpus)."""
    from .similarity import brute_force_knn

    lex = bm25_scores(docs, query, text_col=text_col, id_col=id_col,
                      top_k=fetch_k)
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(-1, [float(x) for x in query_vec])],
        f"{vec_id_col} long, {vec_col} array<double>",
    ).select(F.col(vec_id_col),
             F.col(vec_col).cast("array<float>").alias(vec_col))
    dense = (
        brute_force_knn(embeddings, qdf, k=fetch_k, id_col=vec_id_col,
                        vec_col=vec_col)
        .select(F.col("neighbor_id").alias(id_col), "rank")
    )
    return rrf_fuse([lex, dense], id_col=id_col, k=rrf_k, top_k=top_k)


def retrieval_eval(results: DataFrame, truth: DataFrame,
                   query_col: str = "query_id",
                   id_col: str = "neighbor_id", rank_col: str = "rank",
                   round_to: int = 6) -> DataFrame:
    """Per-query retrieval quality of `results` against a ground-truth
    ranking `truth` (e.g. an ANN retriever vs brute force): one row
    per truth query — (query_col, n_truth, n_results, hits, recall,
    mrr).  recall = |results ∩ truth| / |truth|; mrr = 1/rank of the
    FIRST relevant result (0.0 when nothing relevant was retrieved).

    Both inputs are per-query top-k lists — |queries| × k rows however
    large the corpus — so the two joins here are uniform-key exchanges
    over bounded data; the expensive part of an evaluation is the
    retrievers upstream, not this."""
    t = truth.select(F.col(query_col).alias("q"),
                     F.col(id_col).alias("d"))
    tcnt = t.groupBy("q").agg(F.count("*").alias("n_truth"))
    r = results.select(F.col(query_col).alias("q"),
                       F.col(id_col).alias("d"),
                       F.col(rank_col).alias("rk"))
    rcnt = r.groupBy("q").agg(F.count("*").alias("n_results"))
    hits = (
        r.join(t, ["q", "d"])
        .groupBy("q")
        .agg(F.count("*").alias("hits"), F.min("rk").alias("first_hit"))
    )
    return (
        tcnt.join(rcnt, "q", "left").join(hits, "q", "left")
        .select(
            F.col("q").alias(query_col),
            "n_truth",
            F.coalesce("n_results", F.lit(0)).cast("long")
            .alias("n_results"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.expr(f"round(CAST(coalesce(hits, 0) AS DOUBLE) / n_truth,"
                   f" {round_to})").alias("recall"),
            F.expr(f"round(coalesce(CAST(1 AS DOUBLE) / first_hit, 0D),"
                   f" {round_to})").alias("mrr"),
        )
    )
