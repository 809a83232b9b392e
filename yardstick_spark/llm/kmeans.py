"""Deterministic k-means over embedding columns (SemDeDup-style topic
clustering) plus cluster-balanced sampling.

Lloyd's algorithm with every floating-point hazard removed so results
are bit-identical across partitionings AND engines (the
`covariance_matrix` determinism contract):

- coordinates snap once to the 1e-6 integer grid, so distances are
  exact BIGINT sums (order-independent, no float accumulation);
- seeds are md5-bucket representatives (the min-id vector of each of
  the k id-hash buckets), not RNG draws;
- centroid updates round the integer-sum / count mean back onto the
  grid with round-half-away-from-zero, identical in Spark and DuckDB;
- argmin ties break to the smaller cell id.

Scale shape: each Lloyd iteration is ONE corpus scan (the centroid
table is a <=k-row SQL literal — the `ivf.assign_cells` trick, folded
by Catalyst into whole-stage codegen, no join) plus one k-row
aggregate collected to the driver.  The corpus never shuffles at
vector grain; the only shuffle per iteration carries k * dim partial
sums per partition.  `iters` is fixed (no convergence collect), so the
whole fit is `iters + 1` scans over a cached quantized projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_QUANT = 1_000_000  # 1e-6 coordinate grid, shared with the oracle SQL

# literal-centroid ceiling: k above this would bloat the generated SQL
# (and a >256-way kmeans should use IVF's Arrow matmul path instead)
_MAX_K = 256


def _quantized(vecs: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, xq) with xq = coordinates snapped to the integer grid;
    NULL/empty vectors are excluded (they can neither seed nor be
    assigned — same policy as `ivf.seed_centroids`)."""
    from .dedup import _spread  # single-file inputs must not pin 1 core

    xq = (f"transform(CAST({vec_col} AS ARRAY<DOUBLE>), "
          f"x -> CAST(round(x * {_QUANT}.0D) AS BIGINT))")
    return (
        _spread(vecs)
        .select(F.col(id_col).alias("id"), F.expr(xq).alias("xq"))
        .filter(F.col("xq").isNotNull() & (F.size("xq") > 0))
    )


def _cent_literal(cents: list[tuple[int, list[int]]]) -> str:
    """The centroid table as a SQL array-of-structs literal."""
    rows = ", ".join(
        f"struct({cell} AS cell, array({', '.join(f'{x}L' for x in c)}) AS c)"
        for cell, c in cents
    )
    return f"array({rows})"


def _assign(vq: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """(id, xq, cell, dist_q): nearest centroid by exact integer
    squared L2, ties to the smaller cell id."""
    best = (
        f"array_sort(transform({_cent_literal(cents)}, s -> struct("
        f"aggregate(zip_with(xq, s.c, (x, y) -> (x - y) * (x - y)), "
        f"0L, (a, b) -> a + b) AS d, s.cell AS cell)))[0]"
    )
    return vq.withColumn("__b", F.expr(best)).select(
        "id", "xq",
        F.col("__b.cell").alias("cell"),
        F.col("__b.d").alias("dist_q"),
    )


def kmeans_assign(vecs: DataFrame, k: int = 8, iters: int = 3,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Fit k-means with `iters` Lloyd updates and return the final
    assignment (id_col, cell, dist_q) — dist_q is the exact integer
    squared distance on the 1e-6 grid (grid units squared).

    Empty cells drop out of later iterations (standard Lloyd empty-
    cluster handling), so fewer than k cells may appear.  Ragged
    corpora: vectors shorter than a centroid zip to the shorter
    length; callers with mixed dims should pre-filter (the testdata
    corpus is fixed-dim)."""
    if k > _MAX_K:
        raise ValueError(f"k={k} exceeds the literal-centroid ceiling "
                         f"{_MAX_K}; use the IVF Arrow path for wide k")
    from .dedup import _cache  # shared registry, clear_dedup_caches()

    vq = _cache(_quantized(vecs, vec_col, id_col))
    # farthest-first seeding (Gonzalez 1985): seed 0 is the min-id
    # vector; each next seed maximizes its exact integer distance to
    # the chosen set (ties to the smaller id).  Deterministic, covers
    # well-separated blobs by construction (md5-bucket representatives
    # routinely leave blobs seedless — Lloyd cannot recover from
    # that), and costs k - 1 extra scans, each a per-partition
    # TakeOrdered(1) over the cached quantized projection.
    first = vq.orderBy("id").select("xq").limit(1).collect()
    if not first:
        return vq.select(F.col("id").alias(id_col),
                         F.lit(None).cast("int").alias("cell"),
                         F.lit(None).cast("bigint").alias("dist_q"))
    cents = [(0, [int(x) for x in first[0]["xq"]])]
    for s in range(1, k):
        dmin = (
            f"array_min(transform({_cent_literal(cents)}, s -> "
            f"aggregate(zip_with(xq, s.c, (x, y) -> (x - y) * (x - y)), "
            f"0L, (a, b) -> a + b)))"
        )
        nxt = (
            vq.select("id", "xq", F.expr(dmin).alias("__d"))
            .orderBy(F.col("__d").desc(), "id").limit(1).collect()
        )
        cents.append((s, [int(x) for x in nxt[0]["xq"]]))
    cents.sort()
    for _ in range(iters):
        assigned = _assign(vq, cents)
        dim = len(cents[0][1])
        mean_cols = [
            F.expr(f"CAST(round(sum(element_at(xq, {d + 1})) "
                   f"/ CAST(count(1) AS DOUBLE)) AS BIGINT)").alias(f"c{d}")
            for d in range(dim)
        ]
        rows = assigned.groupBy("cell").agg(*mean_cols).collect()
        cents = sorted((int(r["cell"]), [int(r[f"c{d}"]) for d in range(dim)])
                       for r in rows)
    return (
        _assign(vq, cents)
        .select(F.col("id").alias(id_col),
                F.col("cell").cast("int").alias("cell"), "dist_q")
    )


def cluster_balanced_sample(vecs: DataFrame, k: int = 8, iters: int = 3,
                            per_cell: int = 10,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            seed: int = 42) -> DataFrame:
    """Topic-balanced selection: k-means the corpus, then keep
    `per_cell` deterministic md5-uniform winners per cluster — the
    "cluster then sample uniformly within clusters" diversity
    heuristic that keeps a pretraining mix from being swamped by the
    densest topic.

    Returns (id_col, cell, rn).  Scale shape: kmeans' scans plus one
    cell-grain window — per-cell top-n, never a global sort."""
    assigned = kmeans_assign(vecs, k=k, iters=iters, vec_col=vec_col,
                             id_col=id_col)
    key = (f"CAST(conv(substring(md5(concat('{seed}:', "
           f"CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    w = Window.partitionBy("cell").orderBy(F.expr(key), F.col(id_col))
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_cell)
        .select(id_col, "cell", "rn")
    )
