"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship changefeed LWW replay on sf0.001.
- ``queries()``: one callable per implemented operator family
  (SURVEY.md §2 CDC operators over the ``events`` stream reinterpreted as a
  changefeed, plus the training-data pipeline: dedup / ANN / text analysis /
  multimodal plumbing).
- ``oracle_sql()``: bit-exact DuckDB re-computation for every query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: changefeed LWW replay (compactor → MERGE input) on sf0.001."""
    from tiflow_spark.queries import cdc_lww_replay

    return cdc_lww_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tiflow_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tiflow_spark.oracles import ORACLES

    return dict(ORACLES)
