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
                         max_iter: int = 25) -> DataFrame:
    """Resolve an undirected edge list to components.

    Returns (id, cluster_id) for every node that appears in `pairs`,
    where cluster_id is the minimum node id in the component (a stable,
    order-independent canonical representative).
    """
    edges_fwd = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    edges = (
        edges_fwd.union(
            edges_fwd.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh_min, labels.id == neigh_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__chg"),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        changed = new_labels.filter("__chg").limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    edges.unpersist()
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
