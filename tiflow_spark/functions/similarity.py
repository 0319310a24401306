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


def cosine_expr(a: Column, b: Column) -> Column:
    """Double-precision cosine similarity of two float-array columns.

    Element order of the sums is left-to-right in both zip_with/aggregate and
    any sequential re-implementation — deterministic and engine-portable."""
    da = a.cast("array<double>")
    db = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    Rank by (rounded cosine desc, neighbor_id asc): rounding first makes the
    ordering stable across engines/parallelism even at near-ties."""
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
    )
    scored = (
        q.join(corpus, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
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
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col(cell_col).alias("q_cell"),
        )
    )
    scored = (
        q.join(
            corpus,
            (F.col(cell_col) == F.col("q_cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cos")
    )
