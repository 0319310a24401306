"""Similarity search over an embedding column (array<float>).

- ``cosine_expr``: pure-SQL double-precision cosine (zip_with + aggregate) —
  JVM-side, bit-identical to an explicit left-to-right sum in any engine.
- ``brute_force_topk``: exact top-k for a (small, broadcast) query set — the
  correctness baseline. Cost O(|queries| × |corpus|); the query side must be
  broadcastable.
- ``ivf_topk``: the scale path — an IVF index: corpus partitioned into coarse
  cells (inverted lists); a query probes only its nearest cell(s), so the
  scan is |corpus| / n_cells per probe. Cells here come from the stored
  cluster id (``label``); ``ivf_centroids`` derives the centroid table that a
  real assignment step would use (broadcast, tiny).

At 100 TB the IVF layout maps to a table *bucketed by cell id*: a probe is a
partition-pruned scan + per-cell top-k (no global shuffle; only the final
k-row-per-query heap merge crosses partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_expr(da: Column, db: Column) -> Column:
    """Left-to-right dot product of two double-array columns."""
    return F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(da: Column) -> Column:
    """sqrt(sum x²) of a double-array column — the per-vector factor of
    cosine. Hoist it to a per-row projection ahead of any join that scores
    many pairs per vector: one aggregate per VECTOR instead of two per PAIR
    (the pair expression keeps only the dot), with bit-identical results
    since the hoisted subtree is unchanged."""
    return F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    """Double-precision cosine similarity of two float-array columns.

    Element order of the sums is left-to-right in both zip_with/aggregate and
    any sequential re-implementation — deterministic and engine-portable."""
    da = a.cast("array<double>")
    db = b.cast("array<double>")
    return dot_expr(da, db) / (norm_expr(da) * norm_expr(db))


def _with_vec(df: DataFrame, keep: list, src: str = "embedding",
              demb: str = "_demb", norm: str = "_norm") -> DataFrame:
    """Project ``keep`` plus the cast double vector and its hoisted norm."""
    out = df.select(*keep, F.col(src).cast("array<double>").alias(demb))
    return out.withColumn(norm, norm_expr(F.col(demb)))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Rank by (rounded cosine desc, neighbor_id asc): rounding first makes the
    ordering stable across engines/parallelism even at near-ties."""
    q = F.broadcast(
        _with_vec(queries, [F.col("vec_id").alias("query_id")],
                  demb="_qdemb", norm="_qnorm")
    )
    c = _with_vec(corpus, ["vec_id"])
    scored = (
        q.join(c, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot_expr(F.col("_qdemb"), F.col("_demb"))
                / (F.col("_qnorm") * F.col("_norm")), 6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cos")
    )


def ivf_centroids(emb: DataFrame, cell_col: str = "label") -> DataFrame:
    """Per-cell mean vector (the coarse quantizer's codebook): posexplode →
    per-(cell, dim) mean → re-assemble ordered array. Output is n_cells rows
    — always broadcastable."""
    per_dim = (
        emb.select(cell_col, F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"))
        .groupBy(cell_col, "dim")
        .agg(F.avg("v").alias("m"))
    )
    return (
        per_dim.groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select(cell_col, F.expr("transform(dm, x -> x.m)").alias("centroid"))
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """Coarse-quantizer assignment: each vector's ``nprobe`` nearest cells
    by cosine against the broadcast codebook (the step a fresh, unlabeled
    vector needs before any IVF probe). Output: (id, cell, probe_rank);
    probe_rank 1 is the home cell. Codebook is n_cells rows — broadcast;
    the scan side never shuffles."""
    c = F.broadcast(
        _with_vec(centroids, [F.col(cell_col).alias("cell")], src="centroid",
                  demb="_cdemb", norm="_cnorm")
    )
    v = _with_vec(vectors, [id_col])
    scored = v.crossJoin(c).select(
        F.col(id_col),
        "cell",
        F.round(
            dot_expr(F.col("_demb"), F.col("_cdemb"))
            / (F.col("_norm") * F.col("_cnorm")), 6,
        ).alias("_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cos"), F.asc("cell"))
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(id_col, "cell", F.col("probe_rank").cast("int"))
    )


def ivf_topk_fresh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    cell_col: str = "label",
) -> DataFrame:
    """IVF ANN for FRESH query vectors (no stored cell): assign each query
    to its ``nprobe`` nearest centroids, then search only those inverted
    lists. nprobe > 1 recovers most of the recall probe-1 loses at the cost
    of nprobe/n_cells of the corpus per query — the standard IVF knob.

    The codebook is materialized once (n_cells rows — control-plane-sized,
    like the schema registry): inlining its aggregation subtree into every
    downstream broadcast branch would re-run it per job and bloat planning.
    """
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(r[cell_col], [float(x) for x in r["centroid"]])
         for r in ivf_centroids(corpus, cell_col).collect()],
        f"{cell_col} int, centroid array<double>",
    )
    probes = assign_cells(
        queries.select("vec_id", "embedding"), cents, nprobe=nprobe,
        cell_col=cell_col,
    )
    q = F.broadcast(
        _with_vec(queries, [F.col("vec_id").alias("query_id")],
                  demb="_qdemb", norm="_qnorm")
        .join(probes.withColumnRenamed("vec_id", "query_id"), "query_id")
    )
    c = _with_vec(corpus, ["vec_id", cell_col])
    scored = (
        q.join(
            c,
            (F.col(cell_col) == F.col("cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot_expr(F.col("_qdemb"), F.col("_demb"))
                / (F.col("_qnorm") * F.col("_norm")), 6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cos")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 10,
    max_iter: int = 10,
    id_col: str = "vec_id",
    init_sample: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's k-means over an embedding column — the
    codebook-training step for IVF / embedding-dedup blocking on a corpus
    with NO stored labels.

    Init: farthest-first traversal (Gonzalez 2-approx) over a bounded
    deterministic sample — the ``init_sample`` lowest-id vectors, collected
    once (one TakeOrdered job, ≤ sample×dim doubles on the driver) and
    swept in numpy. Seed = lowest id, then repeatedly take the sample
    vector with the smallest max-cosine (rounded to 6 dp, ties by lowest
    id) to the chosen set. Init cost is independent of corpus size; on a
    corpus at/below the sample bound it picks exactly the seeds the
    full-corpus traversal would. Iterate: broadcast codebook → assign by
    cosine → per-(cell, dim) mean (two map-side-combined aggregates) until
    the assignment signature is stable. Same persist-per-round pattern as
    connected_components. Returns (assignments(id, cell), centroids).
    """
    import numpy as np

    vecs = emb.select(F.col(id_col), F.col("embedding")).persist()
    # ---- farthest-first init on the lowest-id sample (driver-side numpy)
    sample = vecs.orderBy(id_col).limit(max(init_sample, k)).collect()
    V = np.array([list(r["embedding"]) for r in sample], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    norms[norms == 0] = 1.0
    Vn = V / norms[:, None]
    chosen = [(0, [float(x) for x in V[0]])]
    nearest = np.round(Vn @ Vn[0], 6)  # max cosine to the chosen set
    for i in range(1, k):
        j = int(np.argmin(nearest))  # first occurrence = lowest id (sorted)
        chosen.append((i, [float(x) for x in V[j]]))
        nearest = np.maximum(nearest, np.round(Vn @ Vn[j], 6))
    centroids = vecs.sparkSession.createDataFrame(
        chosen, "cell int, centroid array<double>"
    )
    # ---- Lloyd iterations
    assigned = None
    prev_sig = None
    prev_cached = None
    for _ in range(max_iter):
        assigned = assign_cells(
            vecs, centroids, nprobe=1, id_col=id_col, cell_col="cell"
        ).select(id_col, "cell").persist()
        sig = assigned.agg(
            F.sum(F.col(id_col) * (F.col("cell") + 1)).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0]
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = assigned
        key = (sig["s"], sig["n"])
        if key == prev_sig:
            break
        prev_sig = key
        per_dim = (
            vecs.join(assigned, id_col)
            .select("cell", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.avg("v").alias("m"))
        )
        centroids = (
            per_dim.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell", F.expr("transform(dm, x -> x.m)").alias("centroid"))
        )
    vecs.unpersist()
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, cell_col: str = "label"
) -> DataFrame:
    """IVF probe-1 ANN: each query searches only the inverted list of its own
    cell. With stored cluster ids the assignment is exact (probe the cell the
    vector belongs to); a fresh query vector would first argmax against the
    ``ivf_centroids`` codebook (broadcast) to pick its cell.

    Returns the same shape as brute_force_topk; recall < 1 by construction
    when a true neighbor lives in another cell — the classic IVF trade."""
    q = F.broadcast(
        _with_vec(
            queries,
            [F.col("vec_id").alias("query_id"), F.col(cell_col).alias("q_cell")],
            demb="_qdemb", norm="_qnorm",
        )
    )
    c = _with_vec(corpus, ["vec_id", cell_col])
    scored = (
        q.join(
            c,
            (F.col(cell_col) == F.col("q_cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot_expr(F.col("_qdemb"), F.col("_demb"))
                / (F.col("_qnorm") * F.col("_norm")), 6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cos")
    )
