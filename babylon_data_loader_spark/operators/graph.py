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
2). The symmetrized edge table is persisted ONCE up front (it feeds
every iteration's join; recomputing its lineage — often an LSH
candidate pipeline — per iteration would dominate). Labels persist
per iteration, the previous iteration is unpersisted, and the
convergence check rides the SAME action that materializes the new
labels (the old label is carried through the aggregate, so no extra
join or second count per iteration). At cluster scale, checkpoint
every ~10 iterations to truncate lineage fully.

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
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            )
        )
        .persist()  # reused by every iteration's join; released below
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).persist()
    labels.count()  # materialize iteration 0
    comp_type = dict(labels.dtypes)["component"]
    persisted = labels  # the cached frame backing `labels`
    try:
        for _ in range(max_iterations):
            # neighbor-label candidates: edge (a,b) offers label(a) to b
            cand = sym.join(labels, sym.a == labels.id).select(
                F.col("b").alias("id"),
                "component",
                F.lit(None).cast(comp_type).alias("own"),
            )
            # Carry each node's previous label ("own") through the
            # aggregate: convergence = no node where min(candidate)
            # beats its own label — checked on the same persisted
            # result that becomes the next iteration's input, so one
            # action per iteration and no label-vs-label join.
            new_full = (
                labels.select(
                    "id", "component", F.col("component").alias("own")
                )
                .unionAll(cand)
                .groupBy("id")
                .agg(
                    F.min("component").alias("component"),
                    F.min("own").alias("own"),
                )
                .persist()
            )
            changed = new_full.filter(
                F.col("component") < F.col("own")
            ).count()
            persisted.unpersist()
            persisted = new_full
            labels = new_full.select("id", "component")
            if changed == 0:
                break
    finally:
        sym.unpersist()
    # The final labels stay cached for the caller's consumption and
    # are released at the next declared-query boundary.
    from babylon_data_loader_spark.functions.cache import track

    track(persisted)
    return labels
