"""Skew handling: salted repartition for hot keys (SURVEY.md §2.10 P3, §4).

The reference rebalances only at whole-table granularity
(cdc/owner/scheduler_v1.go:332-357) and has no hot-key answer; the north rule
requires one. Two mechanisms here:

1. ``salted_repartition`` — spread a hot partition-key's rows over S salt
   buckets. The salt must be derived from columns *within* the full primary
   key (turn_idx here), never from arbitrary entropy: a single key's history
   must stay in one partition or per-key ordering breaks (SURVEY.md §7 hard
   part 4).
2. The LWW fold itself is an algebraic aggregate (map-side combine), so a hot
   key reduces to one row per input partition before any shuffle — see
   operators/compactor.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    hot_col: str,
    within_key_cols: list[str],
    num_partitions: int,
    salt_buckets: int = 8,
) -> DataFrame:
    """Repartition on (hot_col, salt) where salt = hash(within-key cols) % S.

    Rows of one hot ``hot_col`` value spread over ``salt_buckets`` partitions,
    but every full key (hot_col + within_key_cols) still lands in exactly one
    partition, preserving per-key grouping/order guarantees.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in within_key_cols]), F.lit(salt_buckets)
    )
    return df.repartition(num_partitions, F.col(hot_col), salt)
