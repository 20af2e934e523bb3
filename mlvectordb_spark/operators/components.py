"""Connected components over candidate-duplicate pairs.

Near-dup detection emits PAIRS; a curation pipeline needs CLUSTERS — every
document labeled with a canonical group id so one survivor per group can be
kept. Duplicate relations chain (A~B, B~C but not A~C), so the grouping is
the connected components of the pair graph.

Algorithm: min-label propagation to fixpoint — each node repeatedly adopts
the smallest component id among itself and its neighbors. Iterations are
plain hash-partitioned joins/aggregations (no driver-side graph state);
`localCheckpoint` truncates lineage each round so plans stay bounded. The
iteration count is the graph diameter, and duplicate-cluster graphs are
shallow (near-cliques), so convergence is a handful of rounds in practice;
`max_iter` bounds the worst case. (The large-star/small-star optimization
— Kiveris et al., "Connected Components in MapReduce and Beyond" — drops
the bound to O(log n) rounds; unnecessary at duplicate-cluster depths.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node in the undirected `edges` graph with the minimum
    node id reachable from it. Returns (id, component).

    Only nodes appearing in at least one edge are labeled — callers join
    the result back to the corpus and treat misses as singletons (their
    component is their own id), which keeps the propagation state
    proportional to the duplicate set, not the corpus.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # pre-partition on the per-round join key: localCheckpoint preserves
    # the hash partitioning, so the static edge table is shuffled ONCE for
    # the whole iteration, not once per round. LAZY — materialized by the
    # first round's convergence count, the same job that materializes the
    # seed and round-1 labels (guide §1.2: the eager forms paid three
    # driver job round trips before the first real work).
    sym = sym.distinct().repartition(F.col("b")).localCheckpoint(eager=False)

    # seed with min(id, min-neighbor) — exactly what propagation round 1
    # would compute, so a clique-shaped graph (the common duplicate-cluster
    # case) converges after a single confirming round
    comp = (
        sym.groupBy("a")
        .agg(F.least(F.first("a"), F.min("b")).alias("component"))
        .select(F.col("a").alias("id"), "component")
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(comp, sym.b == comp.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry old + new labels in ONE checkpointed frame: the convergence
        # check becomes a scan of materialized blocks instead of a second
        # join against the previous state. The checkpoint is lazy and the
        # count below is its materializing action — labels + convergence in
        # ONE job per round instead of two.
        new_full = (
            comp.join(neighbor_min, comp.id == neighbor_min.a, "left")
            .select(
                comp.id,
                comp.component.alias("old"),
                F.least(
                    comp.component,
                    F.coalesce(neighbor_min.nbr_component, comp.component),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_full.filter(F.col("component") != F.col("old")).count()
        comp = new_full.drop("old")
        if changed == 0:
            break
    return comp


def dedup_cluster_assignment(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Pairs → (doc, cluster): connected components with the min doc id as
    the canonical cluster id. Keep rows where doc == cluster (one survivor
    per duplicate group) and drop the rest — the last stage of a dedup
    pipeline."""
    comp = connected_components(pairs, src=id_a, dst=id_b, max_iter=max_iter)
    return comp.select(F.col("id").alias("doc_id"), F.col("component").alias("cluster"))


def keep_best_per_cluster(
    clusters: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivor selection with a QUALITY policy: for each duplicate
    cluster, keep the single highest-quality member (ties broken by min
    id) instead of `dedup_cluster_assignment`'s numerically-first doc —
    the survivor rule a production corpus actually wants (when near-dups
    differ by truncation or boilerplate, keep the best copy, cf. the
    cluster-representative choice in RefinedWeb/SlimPajama-style
    pipelines). Returns one row per cluster: (cluster, keep_id, quality).

    Scale shape: `clusters` is proportional to the duplicate set (not the
    corpus); the docs join brings in only clustered members, and the
    argmax is ONE groupBy(cluster) with a map-side partial max over a
    (quality, -id) struct — no window, no sort. The struct max is
    deterministic under quality ties because -id strictly orders members.
    """
    from mlvectordb_spark.functions import text as TX

    scored = clusters.join(
        docs.select(
            F.col(id_col), TX.quality_score(F.col(text_col)).alias("__q")
        ),
        id_col,
    )
    return (
        scored.groupBy("cluster")
        .agg(
            F.max(
                F.struct(
                    F.col("__q").alias("q"),
                    (-F.col(id_col)).alias("negid"),
                )
            ).alias("m")
        )
        .select(
            "cluster",
            (-F.col("m.negid")).cast("bigint").alias("keep_id"),
            F.col("m.q").alias("quality"),
        )
    )
