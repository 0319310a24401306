from tiflow_spark.operators.compactor import compact_changes, lww_fold, split_updates
from tiflow_spark.operators.filters import (
    expr_filter,
    ignore_start_ts_filter,
    op_class_filter,
    table_filter,
)
from tiflow_spark.operators.watermark import (
    partition_frontier,
    resolved_barriers,
    watermark_cut,
)
from tiflow_spark.operators.salting import salted_repartition

__all__ = [
    "compact_changes",
    "lww_fold",
    "split_updates",
    "expr_filter",
    "ignore_start_ts_filter",
    "op_class_filter",
    "table_filter",
    "partition_frontier",
    "resolved_barriers",
    "watermark_cut",
    "salted_repartition",
]
