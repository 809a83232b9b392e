"""Near-duplicate cluster resolution: pair lists -> per-document
verdicts.

`minhash_lsh_pairs` / `ngram_jaccard_pairs` emit (id_a, id_b) edges;
a real dedup pipeline needs the per-document verdict — which cluster a
doc belongs to and whether it is the canonical copy to keep.  That is
connected components over the pair graph, computed here with iterative
min-label propagation on DataFrames:

  label(v) <- min(label(v), min over neighbors label(u))

repeated until a fixed point.  Each round is one shuffle join on the
(symmetrized) edge list, with map-side combined min aggregation; rounds
needed = component diameter, which for near-dup clusters is small (a
cluster is near-clique by construction — every member pairs with most
others through shared bands/shingles).  Label arrays never ride the
shuffle: rows are (node, label) pairs only.

At 100 TB: lineage is truncated every round with localCheckpoint so the
plan does not grow with iterations (swap for reliable checkpointing on
a cluster with an HDFS/S3 checkpoint dir); convergence is detected with
one count per round over the changed-label set.  The alternating
large-star/small-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) halves round count on high-diameter
graphs; plain propagation is preferred here for the near-clique dedup
regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(pairs: DataFrame, src_col: str = "id_a",
                         dst_col: str = "id_b",
                         max_iter: int = 25,
                         local_threshold: int = 1_000_000) -> DataFrame:
    """Resolve an undirected edge list to components.

    Returns (id, cluster_id) for every node that appears in `pairs`,
    where cluster_id is the minimum node id in the component (a stable,
    order-independent canonical representative).

    The near-dup pair graph is normally a vanishing fraction of the
    corpus (it holds only documents with a duplicate), so below
    `local_threshold` edges the components are resolved with a
    driver-side union-find over the collected edge list — microseconds
    of CPU versus several iterative shuffle rounds.  Larger graphs (or
    local_threshold=0) take the distributed min-label-propagation path.
    The gate is ONE bounded limit-collect against the localCheckpoint
    materialization the distributed path needs anyway (collect at most
    threshold+1 rows and bail when the limit is hit) — not a count job
    followed by a second collect job; the saved driver round is pure
    fixed cost on every verdict-layer consumer.
    """
    # materialize the pair list ONCE up front: nodes/edges construction
    # references it several times (src ∪ dst, both directions, self
    # loops) and would otherwise re-run the whole upstream candidate
    # pipeline per reference (measured 8.7s -> 2.1s edge build at sf0.1)
    edges_fwd = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    edge_rows = (edges_fwd.limit(local_threshold + 1).collect()
                 if local_threshold else None)
    if edge_rows is not None and len(edge_rows) <= local_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in edge_rows:
            ra, rb = find(row["src"]), find(row["dst"])
            if ra != rb:  # union by min id keeps the canonical label
                parent[max(ra, rb)] = min(ra, rb)
        members = {x for r in edge_rows for x in (r["src"], r["dst"])}
        rows = [(x, find(x)) for x in sorted(members)]
        # schema follows the input id type (string ids work the same
        # here as on the distributed path below)
        from pyspark.sql.types import StructField, StructType

        id_type = edges_fwd.schema["src"].dataType
        return pairs.sparkSession.createDataFrame(
            rows,
            StructType([StructField("id", id_type),
                        StructField("cluster_id", id_type)]),
        )
    nodes = (
        edges_fwd.select(F.col("src").alias("id"))
        .union(edges_fwd.select(F.col("dst").alias("id")))
        .distinct()
    )
    # symmetrized edges PLUS a self-loop per node: min over in-neighbors
    # of (edges ∪ self) is exactly least(own label, neighbor minimum),
    # so each round is ONE join + ONE aggregation — no per-round left
    # join to merge the old label back in.  Pre-partitioned by the join
    # key so only the (small) label table reshuffles each round.
    # localCheckpoint (not just cache) so the upstream pair pipeline's
    # lineage is truncated ONCE — otherwise every round's plan embeds
    # the full minhash/LSH logical plan and per-round analysis time
    # dwarfs the actual tiny-shuffle work (measured 15s -> 5s at sf0.1)
    edges = (
        edges_fwd.union(
            edges_fwd.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))
        )
        .union(nodes.select(F.col("id").alias("src"),
                            F.col("id").alias("dst")))
        .distinct()
        .repartition("dst")
        .localCheckpoint()
    )
    labels = nodes.withColumn("label", F.col("id")).localCheckpoint()
    # convergence via a label-sum signature: labels only ever decrease
    # (min includes self), so an unchanged SUM(label) is exactly a fixed
    # point — one map-combined scalar agg per round instead of an extra
    # join + count.  DECIMAL(38,0) so a 10^9-node * 10^18-id corpus
    # cannot overflow the signature.
    prev_sig = None
    for _ in range(max_iter):
        # propagate: label(v) <- min over (self ∪ neighbors) labels
        prop = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .select(F.col("src").alias("id"), "label")
        )
        # pointer-jump: label(v) <- label(label(v)).  Halves the
        # remaining distance to the component minimum every round, so a
        # diameter-d chain converges in O(log d) rounds instead of d —
        # without it a 100-link near-dup chain would exhaust max_iter.
        labels = (
            prop.alias("v")
            .join(prop.select(F.col("id").alias("pid"),
                              F.col("label").alias("plabel")).alias("p"),
                  F.col("v.label") == F.col("p.pid"))
            .select(F.col("v.id").alias("id"),
                    F.least("v.label", "p.plabel").alias("label"))
            .localCheckpoint()  # truncate lineage each round
        )
        sig = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_assign(docs: DataFrame, pairs: DataFrame,
                 id_col: str = "doc_id", src_col: str = "id_a",
                 dst_col: str = "id_b") -> DataFrame:
    """Per-document dedup verdict from a near-dup pair list.

    Returns (doc_id, cluster_id, keep): cluster_id is the component's
    minimum doc id (docs in no pair are their own singleton cluster);
    keep marks the canonical copy — filter on it to drop near-dups.

    The component table only holds docs that appear in a pair — a small
    fraction of the corpus — so the join back to `docs` is
    broadcast-able at any corpus size where the duplicate set fits an
    executor; AQE decides (no forced hint).
    """
    comp = connected_components(pairs, src_col, dst_col)
    return (
        docs.select(F.col(id_col))
        .join(comp, F.col(id_col) == comp.id, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )


def dedup_source_matrix(docs: DataFrame, pairs: DataFrame,
                        source_col: str = "source",
                        id_col: str = "doc_id",
                        src_col: str = "id_a",
                        dst_col: str = "id_b") -> DataFrame:
    """Cross-source duplication matrix — which sources copy from each
    other: every near-dup pair attributed to its (source, source)
    cell, sources ordered alphabetically within the cell so the
    matrix is symmetric-upper.  Returns
    (source_a, source_b, n_pairs, share) with share = cell / total,
    ordered by n_pairs desc then names.  The standard corpus-forensics
    table for choosing which feed to de-prioritize.

    Scale shape: the pair list is the (small, duplicates-only) output
    of a bounded candidate generator; the two id→source lookups are
    joins against a two-column projection of the corpus — AQE
    broadcasts the PAIR side both times, so corpus rows never
    shuffle; the matrix aggregate is |sources|² rows at most."""
    lk = docs.select(F.col(id_col).alias("__id"),
                     F.col(source_col).alias("__src"))
    attributed = (
        pairs.select(F.col(src_col).alias("__a"),
                     F.col(dst_col).alias("__b"))
        .join(lk.withColumnRenamed("__src", "__sa"),
              F.col("__a") == F.col("__id")).drop("__id")
        .join(lk.withColumnRenamed("__src", "__sb"),
              F.col("__b") == F.col("__id")).drop("__id")
        .select(F.least("__sa", "__sb").alias("source_a"),
                F.greatest("__sa", "__sb").alias("source_b"))
    )
    cells = attributed.groupBy("source_a", "source_b").agg(
        F.count("*").alias("n_pairs"))
    total = cells.select(F.sum("n_pairs").alias("__tot"))
    return (
        cells.join(F.broadcast(total))
        .select("source_a", "source_b", "n_pairs",
                F.round(F.col("n_pairs") / F.col("__tot"), 6)
                .alias("share"))
    )


def dedup_survivorship(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       source_col: str = "source",
                       size_col: str = "n_chars") -> DataFrame:
    """Entity-resolution survivorship: one merged record per near-dup
    cluster — the metadata a production dedup KEEPS from the records
    it drops.  Returns (cluster_id, keep_id, n_members, sources,
    max_size, total_size): keeper = min id (matching `dedup_assign`),
    `sources` = comma-joined sorted distinct source values (provenance
    union), sizes aggregated across the family.  Singletons appear as
    1-member clusters, so the output is a complete canonical corpus
    directory.

    Same scale shape as `dedup_assign` plus one cluster-keyed
    aggregation; the collected-set state per group is bounded by the
    number of DISTINCT sources in a family, not its member count."""
    comp = connected_components(pairs)
    assigned = (
        docs.select(F.col(id_col), F.col(source_col).alias("__src"),
                    F.col(size_col).alias("__sz"))
        .join(comp, F.col(id_col) == comp.id, "left")
        .select(
            id_col, "__src", "__sz",
            F.coalesce(F.col("cluster_id"), F.col(id_col))
            .alias("cluster_id"),
        )
    )
    return assigned.groupBy("cluster_id").agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_members"),
        F.concat_ws(",", F.sort_array(F.collect_set("__src")))
        .alias("sources"),
        F.max("__sz").alias("max_size"),
        F.sum("__sz").cast("long").alias("total_size"),
    )


def dedup_keep_best(docs: DataFrame, pairs: DataFrame,
                    score_col: str, id_col: str = "doc_id",
                    src_col: str = "id_a",
                    dst_col: str = "id_b") -> DataFrame:
    """`dedup_assign` with a QUALITY-based canonical choice: within
    each near-dup cluster, keep the member with the highest
    `score_col` (ties to the lower id) instead of the minimum id —
    production dedup keeps the longest / highest-quality family
    member, not an arbitrary one.  Returns
    (doc_id, cluster_id, score, keep).

    Same scale shape as `dedup_assign` (duplicates-only component
    table, AQE-broadcastable join) plus one cluster-keyed rank window
    whose partitions are single dup families — Spark executes the
    keep flag's rank as a map-side partial WindowGroupLimit-style
    pass over tiny groups."""
    from pyspark.sql import Window

    comp = connected_components(pairs, src_col, dst_col)
    assigned = (
        docs.select(F.col(id_col), F.col(score_col).alias("score"))
        .join(comp, F.col(id_col) == comp.id, "left")
        .select(
            id_col, "score",
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        assigned.withColumn("keep", F.row_number().over(w) == 1)
        .select(id_col, "cluster_id", "score", "keep")
    )
