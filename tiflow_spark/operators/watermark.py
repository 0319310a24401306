"""Resolved-ts frontier, barrier selection, watermark cut (SURVEY.md §2.1/2.6).

The reference tracks a per-span min-frontier over region resolved-ts
(cdc/puller/frontier/frontier.go:26-70) and cuts buffered txns at the
resolved-ts with a binary search (cdc/sink/common/common.go:104-153). Here the
frontier is a two-level aggregation (per-partition max → global min) and the
cut is a pushed-down predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.model import OP_RESOLVED


def resolved_barriers(
    log: DataFrame, after_ts: int, max_barriers: int | None = None
) -> list[int]:
    """Distinct in-band resolved-ts watermarks above the checkpoint, ordered.

    These are the epoch boundaries: everything with commit_ts <= barrier is
    complete (cdc/model/kv.go:32 OpTypeResolved semantics). The result is
    tiny (one per resolved interval) — safe to collect on the driver, which
    plays the owner's barrier bookkeeping role (cdc/owner/changefeed.go:456).
    """
    rows = (
        log.filter((F.col("op") == OP_RESOLVED) & (F.col("commit_ts") > after_ts))
        .select("commit_ts")
        .distinct()
        .orderBy("commit_ts")
    )
    if max_barriers is not None:
        rows = rows.limit(max_barriers)
    return [r[0] for r in rows.collect()]


def watermark_cut(df: DataFrame, low_ts: int, high_ts: int) -> DataFrame:
    """Epoch slice: events strictly above the checkpoint (dedupe on resume,
    dm/syncer/checkpoint.go:611-631 IsOlderThanTablePoint) and at or below
    the barrier (cdc/sink/common/common.go:104-153). Both predicates push
    down to parquet row-group stats — old log segments are never read."""
    return df.filter((F.col("commit_ts") > low_ts) & (F.col("commit_ts") <= high_ts))


def partition_frontier(
    df: DataFrame, partition_col: str = "partition_hint", ts_col: str = "commit_ts"
) -> DataFrame:
    """Per-partition progress + global frontier: each source partition's max
    applied ts; the changefeed's resolved-ts is the min over them
    (cdc/puller/puller.go:198-225; cdc/processor/processor.go:801-860).

    Returns one row per partition: (partition, max_ts, frontier_ts) where
    frontier_ts is the global min of max_ts — computed with a two-level agg,
    no window over the whole stream.
    """
    per_part = df.groupBy(F.col(partition_col).alias("partition")).agg(
        F.max(ts_col).alias("max_ts"), F.count("*").alias("applied_events")
    )
    frontier = per_part.agg(F.min("max_ts").alias("frontier_ts"))
    return per_part.crossJoin(F.broadcast(frontier))
