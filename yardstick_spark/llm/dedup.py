"""Deduplication operators for document corpora.

All hot paths are JVM-side Spark SQL expressions (no Python UDFs):
hashes are md5-based so results are engine-portable (the DuckDB oracle
computes bit-identical signatures), shingling uses `sequence` +
`transform`, and the pair-generation joins are plain shuffle joins on
band/shingle keys that scale horizontally — the classic
MinHash-LSH layout (band hash -> bucket -> within-bucket candidate
pairs), not an O(n^2) cross join.

At 100 TB: `minhash_lsh_pairs` shuffles (band_id, band_hash) keys whose
cardinality is ~n_docs * n_bands with near-uniform distribution (md5),
so there is no skew hot-spot; candidate verification joins back to the
signature table via broadcast-able doc pairs per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 60-bit portable hash: int(md5_hex[:15], 16).  Both Spark (conv) and
# DuckDB (CAST('0x..' AS BIGINT)) produce the same value.
_H = "CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _portable_hash(expr: str) -> str:
    return _H.format(expr=expr)


def _norm_text(col: str = "text") -> str:
    """Normalization used before hashing: lowercase, collapse whitespace."""
    return f"regexp_replace(lower(trim({col})), '\\\\s+', ' ')"


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate detection on normalized text.

    Returns one row per document: (doc_id, content_hash, keep_id,
    is_duplicate).  keep_id = min doc_id in the hash group — a single
    hash-partitioned window, equivalent to groupBy+join but one shuffle.
    """
    from pyspark.sql import Window

    h = F.expr(f"md5({_norm_text(text_col)})")
    w = Window.partitionBy("content_hash")
    return (
        docs.select(F.col(id_col), h.alias("content_hash"))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", (F.col(id_col) != F.col("keep_id")))
    )


def _shingles(text_col: str, k: int) -> str:
    """Character k-shingle array of the normalized text (SQL expr).

    `sequence(1, greatest(1, len-k+1))` + `transform(substring)` stays
    inside whole-stage codegen; short docs yield their whole text."""
    norm = _norm_text(text_col)
    return (
        f"transform(sequence(1, greatest(1, length({norm}) - {k - 1})), "
        f"i -> substring({norm}, i, {k}))"
    )


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        threshold: float = 0.8) -> DataFrame:
    """Near-duplicate pairs by k-shingle Jaccard similarity.

    Plan shape: explode distinct shingles -> self-join on shingle
    (candidate generation; only docs sharing >=1 shingle meet) ->
    count common shingles per pair -> filter by Jaccard.  The shingle
    join is a shuffle on the shingle hash — uniform keys, no skew; the
    per-pair aggregation is a map-side-combinable count.
    """
    sh = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.expr(_shingles(text_col, k)))).alias("sh"),
        )
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.sh") == F.col("b.sh"))
              & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("common")
                    / (F.col("n_a") + F.col("n_b") - F.col("common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 5,
                       num_hashes: int = 32) -> DataFrame:
    """MinHash signature per document: num_hashes portable min-hashes of
    the k-shingle set.  Signature i = min over shingles of
    hash(shingle || '#' || i) — all inside one `transform`/`aggregate`
    SQL expression, no shuffle at all (embarrassingly parallel scan)."""
    shingles = f"array_distinct({_shingles(text_col, k)})"
    seeded = _portable_hash("concat(s, '#', seed)")
    sig = (
        f"transform(sequence(0, {num_hashes - 1}), "
        f"seed -> array_min(transform({shingles}, "
        f"s -> {seeded})))"
    )
    return docs.select(
        F.col(id_col).alias("id"), F.expr(sig).alias("signature")
    )


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 5,
                      num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash + LSH candidate pairs with estimated Jaccard.

    bands × rows layout (rows = num_hashes / bands): docs agreeing on
    all rows of any band land in the same bucket.  Shuffle key is
    (band_id, band_hash) — uniform.  Estimated similarity = fraction of
    matching signature positions, computed from the joined signatures
    with `zip_with`, then thresholded.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, k, num_hashes).cache()
    banded = sigs.select(
        "id", "signature",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, "
                f"md5(cast(slice(signature, b * {rows} + 1, {rows}) AS STRING))"
                f" AS bhash))"
            )
        ).alias("bb"),
    ).select("id", "signature", "bb.band", "bb.bhash")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.expr(
        "round(aggregate(zip_with(sig_a, sig_b, (x, y) -> "
        "IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / size(sig_a), 6)"
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens (sign of per-bit weighted sums).

    Pure SQL: token md5 -> two 32-bit halves -> per-bit +-1 votes summed
    with `aggregate` over the token array; scan-only, no shuffle.
    Near-dup candidates are rows whose simhash differ in few bits
    (`bit_count(simhash ^ other) <= r`)."""
    norm = _norm_text(text_col)
    tokens = f"filter(split({norm}, ' '), t -> t <> '')"
    tok_hash = _portable_hash("t")
    # votes[i] = sum over tokens of (bit i set ? 1 : -1); bit of hash
    votes = (
        f"transform(sequence(0, 59), i -> "
        f"aggregate({tokens}, 0L, (acc, t) -> acc + "
        f"IF(((CAST({tok_hash} AS BIGINT) >> i) & 1) = 1, 1, -1)))"
    )
    sim = (
        f"aggregate(zip_with({votes}, sequence(0, 59), "
        f"(v, i) -> IF(v > 0, shiftleft(1L, i), 0L)), 0L, "
        f"(acc, x) -> acc | x)"
    )
    return docs.select(F.col(id_col).alias("id"), F.expr(sim).alias("simhash"))
