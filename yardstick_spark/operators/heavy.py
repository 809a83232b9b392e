"""Exact distributed heavy hitters with bounded shuffle.

The naive top-k-terms query (``GROUP BY term ORDER BY n DESC LIMIT
k``) shuffles EVERY distinct term — at 100 TB a trillion-row shuffle
for an answer of 20 rows.  This operator is the classic two-pass
exact heavy-hitter scheme built from mergeable Misra-Gries summaries
(Agarwal et al., "Mergeable Summaries", PODS'12):

1. **Sketch pass** — one Arrow ``mapInPandas`` scan keeps a
   Misra-Gries summary of ``capacity`` counters per partition
   (vectorized: per-batch ``value_counts`` merged into the summary,
   then PRUNE subtracts the (capacity+1)-th largest counter from all
   and accumulates it as that partition's error bound).  Output is at
   most ``capacity`` (term, lower-bound) rows plus one error row per
   partition — the shuffle is O(partitions x capacity), independent
   of the data's cardinality.
2. **Candidate selection** — merged lower bounds give a threshold
   T = k-th largest SUM(wlow); with E = SUM(per-partition error), any
   term with wlow + E < T provably cannot be in the top k, and any
   term absent from every summary has true count <= E.  The candidate
   set is therefore tiny (near k for skewed data).
3. **Exact pass** — a second scan semi-joins the broadcast candidate
   list and counts exactly; the final ORDER BY n DESC, term LIMIT k is
   EXACT, not approximate, whenever E < T.

If E >= T the sketch was too small to certify exactness (adversarially
flat distributions); the operator then raises with the remedy (larger
``capacity``) rather than returning silently-approximate counts.
Real term distributions are zipfian, where modest capacities certify
easily.  The two driver-side collects are both bounded: one k-row
threshold probe and one candidate list already proven broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mg_merge_prune(acc, vc, m: int):
    """MERGE then PRUNE of two Misra-Gries summaries (Agarwal et al.):
    counter-wise add, then subtract the (m+1)-th largest counter from
    everything and drop non-positive entries.  Returns (summary,
    subtracted) — `subtracted` is the increment to the summary's
    cumulative error bound.  Both inputs are pandas term->count
    Series; exact inputs (value_counts) are summaries with zero error.
    """
    if not vc.empty:
        acc = vc if acc.empty else acc.add(vc, fill_value=0)
    if len(acc) <= m:
        return acc, 0
    acc = acc.sort_values(ascending=False)
    sub = int(acc.iloc[m])
    acc = (acc.iloc[:m] - sub).astype("int64")
    return acc[acc > 0], sub


def heavy_hitters(df: DataFrame, col: str, k: int = 10,
                  capacity: int | None = None) -> DataFrame:
    """Exact top-``k`` most frequent values of ``df[col]`` (NULLs
    ignored), returned as (term, n) ordered by n DESC, term ASC.
    ``capacity`` is the per-partition Misra-Gries size (default
    ``max(64, 32*k)``); raises ValueError when the capacity cannot
    certify an exact answer for this data."""
    import pandas as pd

    m = capacity or max(64, 32 * k)

    def sketch(batches):
        acc = pd.Series(dtype="int64")
        err = 0
        for pdf in batches:
            vc = pdf["term"].dropna().value_counts()
            acc, sub = mg_merge_prune(acc, vc, m)
            err += sub
        out = pd.DataFrame({"term": acc.index.astype(str),
                            "wlow": acc.values.astype("int64"),
                            "err": 0})
        out = pd.concat([out, pd.DataFrame(
            {"term": [None], "wlow": [0], "err": [err]})])
        yield out

    terms = df.select(F.col(col).cast("string").alias("term"))
    sk = terms.mapInPandas(
        sketch, "term STRING, wlow BIGINT, err BIGINT")
    # cache: the summary feeds the error total, the threshold probe
    # and the candidate filter — three jobs over O(parts*m) rows
    sk = sk.localCheckpoint(eager=False)

    e_total = sk.agg(F.sum("err")).first()[0] or 0
    merged = (sk.filter(F.col("term").isNotNull())
              .groupBy("term").agg(F.sum("wlow").alias("wlow")))
    top = merged.orderBy(F.desc("wlow"), "term").limit(k).collect()
    if not top:
        if e_total == 0:  # genuinely empty input
            return terms.limit(0).select(
                "term", F.lit(0).cast("bigint").alias("n"))
        raise ValueError(
            f"heavy_hitters: every counter pruned to zero (error bound "
            f"{e_total}); capacity={m} is far too small for this "
            f"distribution — raise capacity (or fall back to a full "
            f"groupBy)")
    thresh = top[-1]["wlow"]
    if e_total >= thresh:
        raise ValueError(
            f"heavy_hitters: error bound {e_total} >= k-th lower bound "
            f"{thresh}; capacity={m} cannot certify an exact top-{k} "
            f"for this distribution — raise capacity (or fall back to "
            f"a full groupBy)")
    cand = merged.filter(F.col("wlow") + F.lit(e_total) >= F.lit(thresh))
    exact = (terms.join(F.broadcast(cand.select("term")), "term",
                        "leftsemi")
             .groupBy("term").agg(F.count(F.lit(1)).alias("n")))
    return exact.orderBy(F.desc("n"), "term").limit(k)
