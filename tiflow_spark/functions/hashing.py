"""Portable deterministic hashing expressions.

Two hash families coexist in the engine:

- ``xxhash64`` (tiflow_spark.lake.bucket_expr) — the fast JVM-side hash used
  for real bucket routing; chosen for throughput, not portability.
- the md5-derived expressions here — bit-identical between Spark SQL and any
  ANSI engine with ``md5`` (the DuckDB oracle), used wherever a query's
  result must be independently re-computable (dedup signatures, dispatch
  demos, fingerprints).

All are pure column expressions: JVM-side, whole-stage-codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(col: Column, num_buckets: int) -> Column:
    """Deterministic bucket id from the first two bytes of md5 — portable
    across engines (ascii/substr/md5 are ANSI-stable), uniform enough for
    dispatch demos. Mirrors the reference's key-hash worker dispatch
    (dm/syncer/dml_worker.go:135-139 GenHashKey % workerCount)."""
    h = F.md5(col.cast("string"))
    b = F.ascii(F.substring(h, 1, 1)) * 256 + F.ascii(F.substring(h, 2, 1))
    return F.pmod(b, F.lit(num_buckets))


def seeded_md5(col: Column, seed: int) -> Column:
    """Family of independent hash functions h_seed(x) = md5(seed || ':' || x).

    Min over a set of these hex strings is a valid MinHash (the hex strings
    order lexicographically == order over 128-bit values)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col))
