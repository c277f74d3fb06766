"""Connected components over a pair/edge table — dedup clustering.

Near-duplicate detection emits PAIRS; the set a real pipeline needs is
CLUSTERS (transitive closure): if A≈B and B≈C, then {A,B,C} is one
group and exactly one survives. Greedy pair-dropping ("drop doc_b of
every pair") can cascade wrongly through chains; component-min labels
cannot.

Algorithm: iterative min-label propagation (the simple, shuffle-
friendly core of large-star/small-star):
  label(v) ← min(label(v), min over neighbors u of label(u))
repeated to fixpoint. Each iteration is one join + one aggregate —
two shuffles on the node id — and converges in O(component diameter)
iterations (dup clusters are shallow; boilerplate stars converge in
2). Labels persist per iteration and the previous iteration is
unpersisted, so lineage stays bounded (at cluster scale, checkpoint
every ~10 iterations to truncate it fully).

The declared query (queries/text.py::q_dedup_clusters) verifies the
whole thing against a DuckDB RECURSIVE CTE computing the same
closure — an exact cross-engine check of an iterative distributed
algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) — component = min node id reachable via edges.

    `nodes` lists every vertex (isolated ones keep their own id);
    `edges` is undirected (each pair listed once is enough).
    """
    sym = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionAll(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).persist()
    labels.count()  # materialize iteration 0
    for _ in range(max_iterations):
        # neighbor-label candidates: edge (a,b) offers label(a) to b
        cand = (
            sym.join(labels, sym.a == labels.id)
            .select(F.col("b").alias("id"), "component")
        )
        new_labels = (
            labels.select("id", "component")
            .unionAll(cand)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .persist()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "old"), on="id"
            )
            .filter(F.col("component") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels
