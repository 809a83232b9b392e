"""Streaming statistics maintenance: incremental covariance / Gram
state over an embedding stream.

The covariance sufficient statistics (Sxy, Sx, Sy, n per (d, i, j))
are EXACTLY mergeable — batch partials just add — so a stream
maintains the same state `llm.pca.covariance_matrix` derives in one
batch pass, with no approximation and no watermark: the state is the
d(d+1)/2-row moment table, independent of how many rows ever streamed.
This is the streaming half of drift monitoring: a nightly PCA
(`pca_components`) reads the maintained moments instead of rescanning
the corpus.

foreachBatch (not a stateful operator) on purpose: the merge is a
d^2-bounded groupBy-sum against a tiny parquet state table, the same
pattern as `ingest.start_scd2_ingest` — Spark's incremental engine
would buffer per-key state for a global aggregate anyway, and the
explicit table is readable by any batch session mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_moment_tables(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sum two covariance sufficient-statistic tables
    (d, i, j, sxy, sx, sy, n) — the mergeability `covariance_matrix`'s
    partials already rely on, exposed for state maintenance."""
    return (
        a.unionByName(b)
        .groupBy("d", "i", "j")
        .agg(F.sum("sxy").alias("sxy"), F.sum("sx").alias("sx"),
             F.sum("sy").alias("sy"), F.sum("n").alias("n"))
    )


def covariance_from_moments(moments: DataFrame,
                            round_to: int | None = 6) -> DataFrame:
    """(i, j, cov) from a maintained moment table — identical
    arithmetic to `llm.pca.covariance_matrix`'s final assembly,
    including the dominant-dimension broadcast pick."""
    best = F.broadcast(
        moments.filter((F.col("i") == 0) & (F.col("j") == 0))
        .orderBy(F.col("n").desc(), F.col("d").desc())
        .limit(1)
        .select("d")
    )
    cov = (F.col("sxy") / F.col("n")
           - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")))
    if round_to is not None:
        cov = F.round(cov, round_to)
    return moments.join(best, "d").select("i", "j", cov.alias("cov"))


def _batch_moments(batch_df: DataFrame, vec_col: str) -> DataFrame:
    """One micro-batch's sufficient statistics, reusing the SAME
    partition-Gram kernel as the batch operator (bit-identical merge
    semantics by construction)."""
    from ..llm.pca import _COV_PARTIAL_SCHEMA  # noqa: F401
    from ..llm import pca as _pca
    from ..llm.similarity import _as_double

    # reuse covariance_matrix's mapInPandas partial by calling through
    # the module's private kernel path: build the same projected frame
    # and merge groupBy it performs pre-assembly
    parts = (
        batch_df.select(F.expr(_as_double(vec_col)).alias("v"))
        .filter(F.col("v").isNotNull() & (F.size("v") > 0))
        .mapInPandas(_pca._cov_partial_fn(), schema=_pca._COV_PARTIAL_SCHEMA)
    )
    return parts.groupBy("d", "i", "j").agg(
        F.sum("sxy").alias("sxy"), F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"), F.sum("n").alias("n"),
    )


def start_covariance_stream(new_vecs: DataFrame, spark, state_path: str,
                            vec_col: str = "embedding",
                            **stream_opts):
    """Maintain covariance sufficient statistics over a vector stream:
    each micro-batch's partials merge into the parquet moment table at
    `state_path` (d^2-bounded read-merge-overwrite — the state never
    grows with stream length).  Read the current covariance any time
    with `covariance_from_moments(spark.read.parquet(state_path))`;
    stream-equals-batch is asserted in tests/test_sinks_stateful.py.
    Returns the started StreamingQuery."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch = _batch_moments(batch_df, vec_col)
        try:
            prev = spark.read.parquet(state_path)
            merged = merge_moment_tables(prev, batch)
        except Exception:  # noqa: BLE001 — first batch: no state yet
            merged = batch
        # materialize BEFORE overwriting the table being read
        rows = merged.collect()  # d(d+1)/2 rows per dim — driver-safe
        spark.createDataFrame(rows, schema=merged.schema) \
            .write.mode("overwrite").parquet(state_path)

    return (new_vecs.writeStream.foreachBatch(_process)
            .options(**stream_opts).start())
