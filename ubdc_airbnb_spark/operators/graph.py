"""Connected components over a pair graph (north-star dedup): resolve
near-duplicate PAIRS (LSH / SimHash / embedding candidates) into
CLUSTERS, so "keep one canonical doc per duplicate set" is one join
away.

Algorithm: min-label propagation — every node starts labeled with its
own id; each round a node adopts the minimum label in its neighborhood;
fixpoint = every node carries the minimum id of its component. Each
round is one shuffle-on-key join + groupBy (all set-based); rounds
needed = graph diameter, and near-dup clusters are shallow (pairs share
a sketch bucket), so convergence is a handful of rounds. The loop is a
driver loop of set-based steps with ``localCheckpoint`` per round to
sever lineage — the quadtree-BFS pattern. At extreme diameters switch
to large-star/small-star (same primitive, O(log n) rounds).

Oracle: DuckDB replays the fixpoint with a recursive CTE
(`ns_dedup_components`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``nodes``; component = min node
    id in the connected component (singletons keep their own id).

    ``edges`` may be directed/deduplicated — it is symmetrized here.
    Raises if the fixpoint is not reached within ``max_iter`` rounds
    (i.e. diameter > max_iter): no silently-wrong output.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
