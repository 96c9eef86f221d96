"""Iterative graph operators: connected components by min-label propagation.

Near-dup PAIRS are not enough to deduplicate a corpus: near-duplication is
transitive in practice (A≈B≈C), so the unit of removal is the connected
COMPONENT of the similarity graph, keeping one canonical document per
component. Components need iteration — the canonical example of an
algorithm outside SQL's (and the DuckDB oracle's) reach, so the registry
entry is rows-only and correctness is pinned against a driver-side
union-find in tests.

Each iteration is pure DataFrame algebra (two joins + an aggregation); the
driver loop only checks a single convergence scalar per round. Labels
converge in O(diameter) rounds — near-dup graphs are unions of small
cliques, so 2-3 rounds in practice. Per-round ``localCheckpoint`` truncates
the lineage (iterative plans otherwise grow exponentially and overwhelm the
optimizer — the classic iterative-Spark pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    the minimum node id reachable from the node. Deterministic."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # each node's candidate label: min over self and neighbors' labels
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "comp")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # truncate lineage between iterations
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


def canonical_docs(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """One row per similarity component: (component, n_members). The
    component id IS the canonical (minimum) doc id to keep."""
    comps = connected_components(edges, src, dst)
    return comps.groupBy("comp").agg(F.count("*").alias("n_members"))
