"""Graph algorithms over edge-list DataFrames.

Companion to the connected-components operators in
:mod:`cdc_system_spark.operators.dedup` (min-label propagation and
Kiveris star contraction): the same bounded-round driver-loop pattern,
applied to weighted influence instead of reachability. Reference scope
note: the reference system (cdc_system.py) has no graph surface; this
exists for the similarity-graph curation path (rank documents by
centrality in the near-dup/kNN graph to pick representative survivors,
the PageRank-survivor variant of SemDeDup's keep-first rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_system_spark.functions.portable import dsum


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.8,
    src: str = "src",
    dst: str = "dst",
    decimals: int = 6,
    seeds: list[int] | None = None,
) -> DataFrame:
    """Fixed-round power-iteration PageRank over a directed edge list.
    Returns (node, rank) for every node appearing as source or target.

    Engine-exact by construction, so a SQL oracle can reproduce it
    bit-for-bit: every per-iteration quantity is rounded to
    ``decimals`` (contributions before the sum, ranks after), and the
    in-neighbor sum is decimal-accumulated (:func:`dsum`) — order-
    insensitive, partitioning-independent. Fixed ``iters`` (not
    convergence-tested) keeps the oracle expressible as chained CTEs;
    rank ordering stabilizes in a handful of rounds on the near-clique
    similarity graphs this is for.

    The default ``damping=0.8`` is a cross-engine determinism choice,
    not a tuning choice: per-round ranks are exact multiples of
    ``10^-decimals``, and ``0.85 · k·10⁻⁶`` lands EXACTLY on the
    6-decimal half-way boundary for every ``k ≡ 10 (mod 20)`` (~5% of
    nodes), where Spark's exact-binary HALF_UP and a SQL engine's
    multiply-then-round double path tip on representation noise
    (measured: 3/500 nodes flip at the 6th decimal with 0.85). With
    0.8, ``8k mod 10`` is always even — no per-node product can reach
    the boundary, so the comparison is exact by construction. (The
    contribution term ``r/deg`` is boundary-free for odd ``deg`` and
    for the kNN graph's uniform ``deg = k``; even out-degrees can
    graze it — pick ``decimals`` odd/even-aware there if it matters.)

    Scale shape: per round, ONE shuffle keyed on the target node (the
    contribution aggregation) plus a rank-table join keyed on the
    source — both move node/edge-sized frames (k·N edges for a kNN
    graph), never the corpus. The only driver-side values are the node
    count (one scalar) and the loop counter; ``localCheckpoint`` per
    round keeps plans flat, exactly like ``duplicate_clusters``.
    Dangling nodes (no out-edges) contribute nothing — their mass
    leaks, the standard simplification for ranking-only use.

    ``seeds`` switches to PERSONALIZED PageRank (random-walk-with-
    restart): initial mass and the teleport term concentrate on the
    seed set instead of spreading uniformly — "what's similar to THESE
    documents, transitively" (seed-expansion retrieval, cluster
    growing around known-good exemplars). Seeds are model parameters
    (a literal id list, like the centroid ids elsewhere), so the same
    chained-CTE oracle form still applies.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("deg")
    )
    if seeds is None:
        n = nodes.count()  # one scalar — the only driver-side probe
        base_col = F.lit((1.0 - damping) / n)
        init = F.lit(1.0 / n)
    else:
        if not seeds:
            raise ValueError("seeds must be non-empty when given")
        k = len(set(seeds))
        is_seed = F.col("node").isin([int(x) for x in set(seeds)])
        base_col = F.when(is_seed, F.lit((1.0 - damping) / k)).otherwise(
            F.lit(0.0)
        )
        init = F.when(is_seed, F.lit(1.0 / k)).otherwise(F.lit(0.0))
    # out-degree folded into the node table ONCE: each round's
    # contribution join then touches a single rank table instead of
    # (ranks ⋈ outdeg) per round — one join per round removed, same
    # values (deg is per-node constant; a node appearing as source
    # always has a non-null deg, so r/deg is untouched; dangling
    # nodes' null deg is never read)
    nodes_deg = nodes.join(outdeg, "node", "left").localCheckpoint(
        eager=False
    )
    ranks = nodes_deg.select(
        "node", "deg", F.round(init, decimals).alias("r")
    )
    for _ in range(iters):
        contribs = e.join(ranks, e["s"] == ranks["node"]).select(
            F.col("d").alias("node"),
            F.round(F.col("r") / F.col("deg"), decimals).alias("c"),
        )
        sums = contribs.groupBy("node").agg(dsum("c", "sc"))
        ranks = (
            nodes_deg.join(sums, "node", "left")
            .select(
                "node",
                "deg",
                F.round(
                    base_col
                    + F.lit(damping) * F.coalesce(F.col("sc"), F.lit(0.0)),
                    decimals,
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.col("r").alias("rank"))


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by synchronous min-label propagation over an
    UNDIRECTED view of the edge list: ``(node, community)`` after
    ``iters`` fixed rounds — the cheap community pass for near-dup /
    similarity graphs when connected components are too coarse to
    inspect (LPA communities expose internal structure; the dedup CC
    operators answer only reachability).

    Deterministic by construction — no random tie-breaks (classic LPA's
    nemesis): each round every node adopts the most FREQUENT label
    among its neighbors and itself, ties broken toward the SMALLER
    label, all updates synchronous. Fixed rounds keep it engine-exact
    and oracle-expressible as chained CTEs; on the shallow near-clique
    graphs this package builds, labels stabilize in 2-3 rounds.

    Scale shape: per round one label-table join keyed on the node and
    one (node, label)-keyed count aggregation — edge-sized frames only,
    map-side combinable; ``localCheckpoint`` per round keeps plans flat
    (the :func:`pagerank` / ``duplicate_clusters`` discipline).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    for _ in range(iters):
        nbr = (
            und.join(
                labels.withColumnRenamed("node", "b"), "b"
            )
            .select(F.col("a").alias("node"), "community")
        )
        votes = (
            nbr.union(labels.select("node", "community"))
            .groupBy("node", "community")
            .agg(F.count("*").alias("_n"))
        )
        best = votes.groupBy("node").agg(
            F.max(
                F.struct(
                    F.col("_n"),
                    (-F.col("community")).alias("_neg"),
                )
            ).alias("_b")
        )
        labels = best.select(
            "node", (-F.col("_b._neg")).alias("community")
        ).localCheckpoint(eager=False)
    return labels


def community_profile(
    labels: DataFrame,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-community diagnostics over a labeling (e.g.
    :func:`label_propagation` output) and the edge list that produced
    it: ``(community, n_nodes, n_internal, n_external, cohesion)``
    where internal edges join two same-community endpoints, external
    edges cross (counted for BOTH incident communities), and
    ``cohesion = internal / (internal + external)`` — the quality
    readout that separates real communities (cohesion → 1) from
    artifacts of the round budget. Each edge row is counted once as
    given (pass a deduplicated undirected list for undirected
    semantics).

    Scale shape: two node-keyed label joins on the edge list, then
    community-keyed map-side-combinable counts — edge-sized frames
    only, like every pass in this module.
    """
    la = labels.select(F.col("node").alias(src), F.col("community").alias("_ca"))
    lb = labels.select(F.col("node").alias(dst), F.col("community").alias("_cb"))
    e = edges.select(src, dst).join(la, src).join(lb, dst)
    internal = (
        e.filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("community"))
        .agg(F.count("*").cast("long").alias("n_internal"))
    )
    cross = e.filter(F.col("_ca") != F.col("_cb"))
    external = (
        cross.select(F.col("_ca").alias("community"))
        .union(cross.select(F.col("_cb").alias("community")))
        .groupBy("community")
        .agg(F.count("*").cast("long").alias("n_external"))
    )
    nodes = labels.groupBy("community").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    out = (
        nodes.join(internal, "community", "left")
        .join(external, "community", "left")
        .select(
            "community",
            "n_nodes",
            F.coalesce("n_internal", F.lit(0)).alias("n_internal"),
            F.coalesce("n_external", F.lit(0)).alias("n_external"),
        )
    )
    denom = F.col("n_internal") + F.col("n_external")
    return out.withColumn(
        "cohesion",
        F.when(denom > 0, F.round(F.col("n_internal") / denom, 6)).otherwise(
            F.lit(None).cast("double")
        ),
    )
