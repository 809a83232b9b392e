"""Product quantization (PQ) — subspace codebooks + asymmetric-distance
search, the faiss IVF-PQ memory shape expressed Spark-first.

Scalar quantization (quantize.py) compresses 4x; PQ compresses to
m * log2(ks) BITS per vector (m=8, ks=16 -> 4 bytes for a 64-dim
float32 vector: 64x) — the representation that makes 100 TB of
embeddings searchable from memory.  Search is asymmetric distance
computation (ADC, Jegou et al. TPAMI 2011): the query stays exact, a
per-query lookup table of query-to-centroid distances is built once
(m * ks entries), and each database vector's approximate distance is m
table lookups summed.

Like `ivf.seed_centroids`, the codebook here is SEEDED, not k-means
trained: for each subspace s, vector ids bucket by a portable md5 hash
of f"{s}:{id}" into ks cells and the min-id vector of each cell donates
its subspace slice as that cell's centroid.  Closed-form — no FP
iteration — so a DuckDB oracle derives the identical codebook and codes
bit-for-bit.  A learned codebook drops in by replacing `pq_codebook`
(encode/search are codebook-agnostic); recall of the seeded book is
property-gated in tests, not assumed.

100 TB design:
- `pq_codebook` is one groupBy-min over ids per subspace (map-side
  combined, m * ks result rows) plus a join back for the donor rows.
- `pq_encode` is SCAN-ONLY: the m * ks * (d/m) codebook floats become
  SQL literals in an argmin expression per subspace (1k literals at
  m=8, ks=16, d=64 — far below the 16k-literal Janino blowup the IVF
  centroid path hit, which is why ks is gated at 64 here).  No
  shuffle, no Python; codes travel as array<int>.
- `pq_knn` broadcasts the query-side LUT (q * m * ks rows) against ONE
  scan of the (id, sub, code) explosion; the per-pair work is a hash
  probe + sum, and the top-k is the same map-side WindowGroupLimit as
  every other kNN in the package.

Distances are ROUND()ed (6 dp) before argmin/rank so Spark's
sequential `aggregate` fold and DuckDB's list_sum agree bit-for-bit;
ties break to the lower code / id on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import _as_double

# literal-tree gate: m * ks * sub_dim doubles are inlined into the
# encode expression; 64 codes x 16 sub_dim = 1024 literals per sub is
# fine, but a 4k-code book would re-create ivf.py's codegen blowup
_MAX_LITERAL_CODES = 64


def _hash_cell(sub: int, id_col: str, ks: int) -> str:
    """Portable md5 bucket of f"{sub}:{id}" — same derivation family as
    ivf.seed_centroids, so DuckDB reproduces it verbatim."""
    return (
        f"pmod(CAST(conv(substring(md5(concat('{sub}', ':', "
        f"CAST({id_col} AS STRING))), 1, 15), 16, 10) AS BIGINT), {ks})"
    )


def pq_codebook(corpus: DataFrame, m: int = 8, ks: int = 16,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Seeded codebook: (sub, code, centroid array<double> of d/m).

    Per subspace, ids hash into ks cells; each cell's min-id vector
    donates its subspace slice.  Cells that catch no vector (possible
    when ks approaches the corpus size) simply have no row — encode
    argmins over the codes that exist."""
    clean = corpus.filter(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(F.col(id_col).alias("id"),
             F.expr(_as_double(vec_col)).alias("arr"))
    dim_row = clean.select(F.size("arr").alias("d")).limit(1).collect()
    if not dim_row:
        raise ValueError("pq_codebook: empty corpus")
    d = dim_row[0]["d"]
    if d % m != 0:
        raise ValueError(f"pq_codebook: dim {d} not divisible by m={m}")
    sub_dim = d // m
    subs = None
    for s in range(m):
        cell = (
            clean.select("id", F.expr(_hash_cell(s, "id", ks)).alias("code"))
            .groupBy("code").agg(F.min("id").alias("id"))
            .withColumn("sub", F.lit(s))
        )
        subs = cell if subs is None else subs.unionByName(cell)
    return (
        subs.join(clean, "id")
        .select(
            "sub", "code",
            F.expr(f"slice(arr, sub * {sub_dim} + 1, {sub_dim})")
            .alias("centroid"),
        )
    )


def _codebook_rows(codebook: DataFrame) -> tuple[int, int, dict]:
    """Collect the (m*ks)-row codebook to the driver: returns
    (m, sub_dim, {(sub, code): [floats]}).  Bounded by the codebook
    size, never the corpus."""
    rows = codebook.collect()
    if not rows:
        raise ValueError("empty codebook")
    book = {(r["sub"], r["code"]): [float(x) for x in r["centroid"]]
            for r in rows}
    m = max(s for s, _ in book) + 1
    sub_dim = len(next(iter(book.values())))
    return m, sub_dim, book


def pq_encode(corpus: DataFrame, codebook: DataFrame,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id_col, codes array<int> length m): per subspace, the code of
    the nearest centroid by squared L2 on the subspace slice, distance
    rounded to 6 dp, ties to the lower code (array_position returns
    the FIRST minimum).  Scan-only: the codebook is inlined as SQL
    literals (gated), so encoding is pure codegen — no join, no
    shuffle, no Python."""
    m, sub_dim, book = _codebook_rows(codebook)
    n_codes = max(c for _, c in book) + 1
    if n_codes > _MAX_LITERAL_CODES:
        raise ValueError(
            f"pq_encode: ks={n_codes} > {_MAX_LITERAL_CODES} literal gate "
            "(re-create ivf.py's Arrow path if you need wider books)")
    v = _as_double(vec_col)
    sub_exprs = []
    for s in range(m):
        cents = []
        for c in range(n_codes):
            cent = book.get((s, c))
            if cent is None:
                continue  # empty cell: unreachable code
            arr = "array(" + ", ".join(repr(x) + "D" for x in cent) + ")"
            cents.append((c, arr))
        codes_arr = "array(" + ", ".join(str(c) for c, _ in cents) + ")"
        cent_mat = "array(" + ", ".join(a for _, a in cents) + ")"
        sq = (
            f"aggregate(zip_with(slice({v}, {s * sub_dim} + 1, {sub_dim}), "
            "cc, (x, y) -> (x - y) * (x - y)), 0D, (acc, t) -> acc + t)"
        )
        dists = f"transform({cent_mat}, cc -> round({sq}, 6))"
        sub_exprs.append(
            f"element_at({codes_arr}, CAST(array_position({dists}, "
            f"array_min({dists})) AS INT))"
        )
    codes = "array(" + ", ".join(sub_exprs) + ")"
    return corpus.select(
        F.col(id_col), F.expr(codes).alias("codes"))


def pq_knn(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
           k: int = 10, id_col: str = "vec_id",
           vec_col: str = "embedding",
           round_to: int = 6) -> DataFrame:
    """Asymmetric-distance top-k: (query_id, neighbor_id, adist, rank),
    adist = sum over subspaces of ||q_sub - centroid(code_sub)||².

    The LUT (query x sub x code -> partial distance) is queries x
    codebook — both small — and BROADCASTS against one scan of the
    exploded (id, sub, code) table; the groupBy that sums m partials
    per (query, vector) is map-side combined, and the final top-k is a
    rank window whose input is k-bounded per task (WindowGroupLimit).
    The corpus side carries CODES ONLY — never vectors — which is the
    entire point of PQ at 100 TB."""
    m, sub_dim, _ = _codebook_rows(codebook)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(_as_double(vec_col)).alias("qv"),
    )
    lut = (
        q.crossJoin(F.broadcast(codebook))
        .select(
            "query_id", "sub", "code",
            F.round(
                F.expr(
                    f"aggregate(zip_with(slice(qv, sub * {sub_dim} + 1, "
                    f"{sub_dim}), centroid, (x, y) -> (x - y) * (x - y)), "
                    "0D, (acc, t) -> acc + t)"),
                round_to,
            ).alias("pdist"),
        )
    )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode("codes").alias("sub", "code"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id"))
    return (
        exploded.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("pdist"), round_to).alias("adist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
