"""Continuous data validator (SURVEY.md §5: dm/syncer/data_validator.go:72-196).

DM's validator tails the binlog and re-checks row counts + content digests
of replicated tables against the upstream. Here that becomes one shuffle-
light aggregate: a per-bucket ``(row_count, content_checksum)`` pair over a
canonical row encoding. Upstream and downstream run the same aggregate and
compare the tiny (n_buckets-row) results — at 100 TB the comparison payload
is kilobytes while the scan parallelizes fully, and the sum-based checksum
is order-invariant so any partitioning gives the same digest.

The row digest is the portable md5-derived 16-bit family from
``tiflow_spark.functions.hashing`` so an independent ANSI engine (the DuckDB
oracle) reproduces it bit-exactly; the collision budget is fine for drift
*detection* (any single-row divergence flips count or sum with prob
~1-2^-16 per bucket, and buckets localize the diff for repair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.functions.hashing import md5_bucket


def row_digest(cols: list[str]) -> Column:
    """Canonical per-row digest: 16-bit value from md5 over a '|'-joined
    string encoding of the identity+content columns (null-safe: nulls encode
    as the empty string, distinct from 'None')."""
    enc = F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])
    h = F.md5(enc)
    return F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))


def table_checksums(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    n_buckets: int = 16,
) -> DataFrame:
    """Per-bucket validation summary: bucket = hash(key) % n_buckets,
    row count and order-invariant content checksum. One map-side-combined
    aggregate; output is n_buckets rows regardless of input size."""
    return (
        df.select(
            md5_bucket(F.col(key_col), n_buckets).alias("bucket"),
            row_digest([key_col, *content_cols]).alias("digest"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("digest").alias("checksum"),
        )
    )
