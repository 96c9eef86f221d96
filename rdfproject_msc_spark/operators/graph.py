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


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    src_id: int | None = None,
    dst_id: int | None = None,
    max_iter: int = 50,
    seed_set: DataFrame | None = None,
) -> DataFrame:
    """DISTINCT reachability pairs (src, dst) over ≥1-step directed paths —
    the relation behind SPARQL's OneOrMorePath `p+` (§9.1; arbitrary-length
    paths are duplicate-free per the §18.4 ALP algorithm, hence a SET of
    pairs, not the BGP multiset).

    Unbounded form: semi-naive iteration — only the FRONTIER (pairs new in
    the last round) joins the edge relation each round, new pairs are
    anti-joined against the accumulated set, and ``localCheckpoint``
    truncates lineage per round. O(graph diameter) rounds, scalar-only
    driver traffic (one emptiness probe per round).

    Seeded form (a constant endpoint): BFS over NODES from the constant —
    state is the reached-node set, never pairs, so a bounded neighborhood
    of a 100 TB graph is explored instead of the full closure. This is the
    form a real query almost always takes (`:order_7 :linked+ ?x`).

    Set-seeded form (``seed_set``, a DataFrame with node column ``n``):
    the pair iteration starts from only the edges whose SOURCE is in the
    set — the result is the closure restricted to sources in the set,
    with per-source pairs intact (unlike the scalar BFS, which tracks
    nodes). Work is bounded by the subgraph reachable FROM the set; the
    composite-path planner uses this to seed a `p*`/`p+` sequence member
    from the frontier of the members before it.

    Raises after ``max_iter`` rounds rather than returning a silently
    incomplete closure.
    """
    e = edges.select(F.col(src).alias("cs"), F.col(dst).alias("co")).distinct()

    if seed_set is not None and src_id is None and dst_id is None:
        e = e.localCheckpoint()
        reach = (
            seed_set.select(F.col("n").alias("cs"))
            .distinct()
            .join(e, "cs")
            .select("cs", "co")
            .localCheckpoint()
        )
        frontier = reach
        e2s = e.select(F.col("cs").alias("m"), F.col("co").alias("co2"))
        for _ in range(max_iter):
            nxt = (
                frontier.join(e2s, frontier["co"] == e2s["m"])
                .select("cs", F.col("co2").alias("co"))
                .distinct()
                .join(reach, ["cs", "co"], "left_anti")
                .localCheckpoint()
            )
            if not nxt.take(1):
                return reach
            reach = reach.unionByName(nxt).localCheckpoint()
            frontier = nxt
        raise RuntimeError(
            f"transitive_closure: not converged after {max_iter} rounds"
        )

    if src_id is not None or dst_id is not None:
        fwd = src_id is not None
        seed = src_id if fwd else dst_id
        here, there = ("cs", "co") if fwd else ("co", "cs")
        e = e.localCheckpoint()
        frontier = (
            e.filter(F.col(here) == F.lit(seed))
            .select(F.col(there).alias("n"))
            .distinct()
            .localCheckpoint()
        )
        reached = frontier
        for _ in range(max_iter):
            if not frontier.take(1):
                break
            frontier = (
                frontier.join(e, frontier["n"] == e[here])
                .select(F.col(there).alias("n"))
                .distinct()
                .join(reached, "n", "left_anti")
                .localCheckpoint()
            )
            reached = reached.unionByName(frontier).localCheckpoint()
        else:
            if frontier.take(1):
                raise RuntimeError(
                    f"transitive_closure: not converged after {max_iter} rounds"
                )
        pairs = reached.select(
            F.lit(seed).cast("long").alias(here),
            F.col("n").alias(there),
        ).select("cs", "co")
        if fwd and dst_id is not None:
            pairs = pairs.filter(F.col("co") == F.lit(dst_id))
        return pairs

    reach = e.localCheckpoint()
    frontier = reach
    e2 = e.select(F.col("cs").alias("m"), F.col("co").alias("co2"))
    for _ in range(max_iter):
        nxt = (
            frontier.join(e2, frontier["co"] == e2["m"])
            .select("cs", F.col("co2").alias("co"))
            .distinct()
            .join(reach, ["cs", "co"], "left_anti")
            .localCheckpoint()
        )
        if not nxt.take(1):
            return reach
        reach = reach.unionByName(nxt).localCheckpoint()
        frontier = nxt
    raise RuntimeError(
        f"transitive_closure: not converged after {max_iter} rounds"
    )


def pagerank(
    edges: DataFrame,
    src: str = "s",
    dst: str = "o",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Deterministic PageRank over an edge relation → (node, rank).

    The canonical iterative-Spark workload, expressed as pure DataFrame
    algebra: per iteration one join (rank → out-edges) and one aggregation
    (contributions by destination), plus the §dangling-mass correction —
    nodes without out-edges redistribute their rank uniformly (computed as
    a one-row aggregate, never a cartesian). Fixed iteration count, no
    RNG, stable float summation order via groupBy-sum — re-runs agree to
    float precision, and a numpy power-iteration twin pins the math in
    tests.

    Scale shape: ranks and edges shuffle on node ids only (8-byte keys);
    ``localCheckpoint`` per iteration truncates the exponentially growing
    lineage (the classic iterative pitfall). Rank mass is conserved at
    1.0 every iteration — asserted cheaply by the tests, a drift tripwire
    for edge-case regressions (dangling nodes, self-loops)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, "node", "left")
        # dangling mass: total rank on nodes with no out-edges (one scalar)
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("deg").isNotNull()).withColumnRenamed(
                    "node", "u"
                ),
                "u",
            )
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
