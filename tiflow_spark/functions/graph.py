"""Distributed connected components for duplicate-cluster resolution.

Near-dup operators (minhash/simhash/jaccard/embedding) emit PAIRS; turning
the pair graph into keep/drop decisions needs its connected components —
the analogue of the compactor picking one winner per key, lifted to the
transitive closure of "is a near-duplicate of".

Algorithm: hash-min label propagation (the BSP classic; Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — their CC-MR
baseline): every node starts labeled with itself, and each round every node
takes the min label over itself and its neighbors. Rounds = graph diameter;
duplicate clusters are near-cliques (diameter ≲ 3), so this converges in
2-4 rounds in practice — cheaper per round than star-contraction and with
strictly smaller shuffles (labels are (node, long), never adjacency lists).

Scale shape per round: one shuffle join of edges⋈labels on node id + one
map-side-combined min-aggregate. Convergence is detected via the sum of all
labels (monotonically decreasing, integer-exact) — one tiny agg per round,
no driver-side diffing of label tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_union_find(rows, spark, node_type) -> DataFrame:
    """Union-find with path compression over a collected edge list; label =
    min node id per component. O(E α(E)) on the driver — used only below
    ``driver_threshold`` edges, where one collect beats diameter-many
    shuffle rounds (same cutover logic as a broadcast join: tiny side →
    ship it, not shuffle it)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        u, v = r["u"], r["v"]
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min so the root IS the min label (ids are orderable)
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
            parent.setdefault(lo, lo)
        else:
            parent.setdefault(ru, ru)
    out = [(n, find(n)) for n in parent]
    from pyspark.sql.types import StructField, StructType

    schema = StructType([
        StructField("node", node_type), StructField("cluster_id", node_type),
    ])
    return spark.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id = the
    minimum node id in the node's connected component.

    When the (deduped, symmetric) edge list has ≤ ``driver_threshold``
    edges it is collected and solved with union-find on the driver: after
    LSH blocking the duplicate-pair graph is orders of magnitude smaller
    than the corpus (its size was just computed anyway for the convergence
    bookkeeping), and one collect of (long, long) pairs replaces
    diameter-many join+agg shuffle rounds — the broadcast-side cutover,
    applied to graphs. At 1M edges the collect is ~16 MB. Above the
    threshold the distributed hash-min label propagation runs unchanged;
    both paths produce identical output (min-label components).

    Raises RuntimeError if not converged after ``max_iter`` rounds (a
    diameter-``max_iter`` duplicate graph means the threshold is far too
    loose — fail loudly rather than emit partial clusters).
    """
    a, b = F.col(a_col).alias("u"), F.col(b_col).alias("v")
    # symmetric edge list, deduped (pair emitters guarantee a < b, but CC
    # needs both directions). PERSISTED: the loop re-reads it every round,
    # and without the cache each round would re-execute the entire upstream
    # pair-generation pipeline — the one legitimate cache in this codebase's
    # batch paths (iterative reuse, the textbook persist() case).
    edges = (
        pairs.select(a, b).union(pairs.select(b.alias("u"), a.alias("v")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()  # materializes the persist either way
    if n_edges <= driver_threshold:
        try:
            return _driver_union_find(
                edges.collect(), pairs.sparkSession,
                edges.schema["u"].dataType,
            )
        finally:
            edges.unpersist()
    labels = (
        edges.groupBy("u")
        .agg(F.least(F.min("v"), F.col("u")).alias("lbl"))
        .select(F.col("u").alias("node"), "lbl")
    )
    prev_sum = None
    prev_cached = None
    try:
        for i in range(max_iter):
            # propagate: each node takes min(own label, neighbors' labels)
            neighbor_lbl = (
                edges.join(labels, edges["v"] == labels["node"])
                .select(F.col("u").alias("node"), "lbl")
            )
            labels = (
                labels.union(neighbor_lbl)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
                .persist()
            )
            cur_sum = labels.agg(  # materializes the persist
                F.sum("lbl").alias("s"), F.count("*").alias("n")
            ).collect()[0]
            # persist caches the DATA but keeps the cumulative LOGICAL plan,
            # which doubles per round (labels feeds both the join and the
            # union) and blows up Catalyst past ~15 rounds; an eager
            # localCheckpoint every few rounds truncates the plan while the
            # explicit per-round unpersist keeps block storage at one live
            # copy (checkpoint copies are bounded at max_iter/6). Local (not
            # reliable) checkpointing is the right trade: losing an executor
            # mid-CC just reruns the clustering job.
            is_checkpoint = i % 6 == 5
            if is_checkpoint:
                cp = labels.localCheckpoint(eager=True)
                labels.unpersist()  # cp's storage is independent
                labels = cp
            if prev_cached is not None:
                # never unpersist a checkpointed round: its lineage is
                # truncated, so evicted partitions could not be recomputed
                df, was_cp = prev_cached
                if not was_cp:
                    df.unpersist()
            prev_cached = (labels, is_checkpoint)
            key = (cur_sum["s"], cur_sum["n"])
            if key == prev_sum:  # labels only decrease → equal sum = fixpoint
                break
            prev_sum = key
        else:
            raise RuntimeError(
                f"connected_components: no convergence in {max_iter} rounds — "
                "pair graph has extreme diameter; tighten the dedup threshold"
            )
    finally:
        edges.unpersist()
    return labels.select("node", F.col("lbl").alias("cluster_id"))


def resolve_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Keep/drop decision per document: every doc joins its component
    (singletons form their own), cluster_id = min doc id in the component,
    keeper = the doc that IS the min. Output:
    (doc_id, cluster_id, cluster_size, is_keeper)."""
    cc = connected_components(pairs, a_col, b_col)
    assigned = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(cc, F.col("doc_id") == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        assigned.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
        )
    )
