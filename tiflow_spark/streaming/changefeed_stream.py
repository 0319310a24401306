"""Structured Streaming front-end (SURVEY.md §2.15, §7 step 7).

``readStream`` tails the changefeed log directory (file source — new log
segments appear as the upstream appends them, exactly how TiCDC tails new
binlog/redo segments) and ``foreachBatch`` feeds each micro-batch through
the SAME epoch apply as the batch replay loop:

    micro-batch  == epoch          (tumbling window = trigger interval,
                                    cdc/processor/pipeline/table.go:205 tick)
    batch max ts == resolved-ts    (watermark; in-band R rows are dropped —
                                    the trigger boundary plays their role)
    exactly-once == at-least-once file source + epoch-fenced idempotent
                    MERGE — the reference's own formula (SURVEY.md §2.15);
                    Spark's checkpointLocation replays a failed batch, and
                    the fence turns the replay into a no-op.

Late/duplicate data: events at or below the committed checkpoint are dropped
by the same ``commit_ts > checkpoint`` guard the batch path uses
(dm/syncer/checkpoint.go:611-631 IsOlderThanTablePoint).

Backpressure: ``maxFilesPerTrigger`` bounds per-epoch volume — the flow
control quota of cdc/sink/common/flow_control.go:142-229 expressed as a
source option instead of an engine mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiflow_spark.engine import ChangefeedEngine, EpochStats
from tiflow_spark.model import CHANGE_EVENT_SCHEMA, OP_RESOLVED


class StreamingChangefeed:
    """Continuous tail of a changefeed log directory into a LakeTable."""

    def __init__(self, engine: ChangefeedEngine, checkpoint_dir: str,
                 max_files_per_trigger: int | None = None):
        self.engine = engine
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.epochs: list[EpochStats] = []

    # ------------------------------------------------------------- internals
    def _apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        manifest = self.engine.table.current_manifest()
        if manifest is None:
            raise FileNotFoundError("target not bootstrapped")
        chk = manifest["checkpoint_ts"]
        # dedupe vs checkpoint (file-source replay after failure) + drop
        # in-band watermarks (the trigger boundary is the barrier here)
        events = batch.filter(
            (F.col("commit_ts") > chk) & (F.col("op") != OP_RESOLVED)
        )
        hi = events.agg(F.max("commit_ts")).collect()[0][0]
        if hi is None:
            return  # batch contained nothing new
        st = self.engine.apply_slice(spark, events, manifest, barrier_ts=int(hi))
        self.epochs.append(st)

    # ------------------------------------------------------------------- api
    def start(self, spark: SparkSession, trigger_seconds: float | None = None,
              available_now: bool = False):
        reader = (
            spark.readStream.schema(CHANGE_EVENT_SCHEMA)
            .format("parquet")
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.load(self.engine.log_path)
        writer = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()

    def run_available(self, spark: SparkSession):
        """Process everything currently in the log, then stop (the
        streaming twin of ChangefeedEngine.run)."""
        q = self.start(spark, available_now=True)
        q.awaitTermination()
        return self.epochs
