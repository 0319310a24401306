"""MQ sink (K4): Kafka-semantics changefeed egress against a file topic.

The reference's MQ sink (cdc/sink/mq.go:55-220 + mq_flush_worker.go) routes
each event to a (topic, partition) via a dispatcher, encodes it with a
pluggable codec, flushes on resolved-ts, and broadcasts the checkpoint to
EVERY partition so consumers on any partition learn the global watermark.
This module reproduces those semantics with a directory standing in for the
topic (the sandbox has no Kafka broker; a real deployment swaps the
``write`` call for ``df.write.format("kafka")`` — the dispatch, ordering,
codec, and checkpoint logic are identical):

- partition  = index-value dispatcher: portable md5 hash of the key columns
  mod partition count (cdc/sink/dispatcher/partition/index_value.go:36-56);
- offset     = dense per-partition sequence in canonical event order,
  continued across epochs (per-partition tail offsets live in the topic
  manifest — the Kafka log-end-offset analogue);
- flush unit = one epoch (resolved-ts barrier), appended as one segment
  directory per epoch: ``<topic>/epoch=<N>/partition=<P>/*.json``;
- checkpoint = after the data rows, one control message per partition
  carrying the barrier ts (cdc/sink/mq.go:136-166 flushes row batches then
  broadcasts the checkpoint event to all partitions);
- exactly-once: the epoch segment is fenced by the topic manifest exactly
  like the lake table's commit — re-writing an applied epoch is a no-op.

Scale shape: ONE shuffle on the partition id (what any Kafka producer
round-trip needs anyway), a per-partition window for offsets (partition
count is the parallelism unit — the window partitions by it, so no global
sort), and a partitioned write.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tiflow_spark.functions.hashing import md5_bucket
from tiflow_spark.model import event_order_cols


def mq_dispatch(df: DataFrame, key_cols, n_partitions: int) -> DataFrame:
    """Index-value partition dispatch: same key → same partition, portable
    md5 hash (the DuckDB oracle recomputes it bit-exactly)."""
    key_cols = list(key_cols)
    key = F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols])
    return df.withColumn("partition", md5_bucket(key, n_partitions))


class FileMQSink:
    def __init__(self, path: str, key_cols=("conv_id", "turn_idx"),
                 n_partitions: int = 4):
        self.path = path
        self.key_cols = list(key_cols)
        self.n_partitions = n_partitions
        self._manifest = os.path.join(path, "_TOPIC")

    # ---------------------------------------------------------- manifest
    def topic_state(self) -> dict:
        if not os.path.exists(self._manifest):
            return {"epoch": 0, "offsets": {str(p): 0 for p in range(self.n_partitions)}}
        with open(self._manifest) as f:
            return json.load(f)

    def _commit_state(self, state: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._manifest + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest)

    # ------------------------------------------------------------- write
    def write_epoch(
        self,
        events: DataFrame,
        epoch: int,
        barrier_ts: int,
        envelope_col: str = "envelope",
    ) -> bool:
        """Append one epoch's events (already cut to the barrier) as an
        offset-ordered segment + per-partition checkpoint messages.
        ``events`` must carry the key columns and an ``envelope_col`` with
        the codec output (any cdc_encode_* shape). Returns False when the
        epoch was already published (fence)."""
        state = self.topic_state()
        if state["epoch"] >= epoch:
            return False
        spark = events.sparkSession
        dispatched = mq_dispatch(events, self.key_cols, self.n_partitions)
        w = Window.partitionBy("partition").orderBy(*event_order_cols())
        base = F.create_map(
            *[
                x
                for p, off in state["offsets"].items()
                for x in (F.lit(int(p)), F.lit(off))
            ]
        )
        msgs = dispatched.select(
            "partition",
            (F.row_number().over(w) - 1 + base[F.col("partition")]).alias("offset"),
            F.lit("row").alias("kind"),
            F.col(envelope_col).alias("value"),
        )
        out = os.path.join(self.path, f"epoch={epoch:06d}")
        msgs.repartition("partition").write.partitionBy("partition").mode(
            "overwrite"  # replay of a crashed attempt overwrites its orphan
        ).json(out)

        # per-partition tail offsets from this epoch's counts (tiny collect)
        counts = {
            str(r["partition"]): r["n"]
            for r in msgs.groupBy("partition").agg(F.count("*").alias("n")).collect()
        }
        offsets = {
            p: state["offsets"][p] + counts.get(p, 0) for p in state["offsets"]
        }
        # checkpoint broadcast: one control message per partition, AFTER the
        # data rows (its offset = new tail), carrying the global barrier
        ck_rows = [
            (int(p), offsets[p], "checkpoint", json.dumps({"resolved_ts": barrier_ts}))
            for p in offsets
        ]
        spark.createDataFrame(
            ck_rows, "partition int, offset long, kind string, value string"
        ).repartition(1).write.partitionBy("partition").mode("append").json(out)
        offsets = {p: offsets[p] + 1 for p in offsets}

        self._commit_state({"epoch": epoch, "offsets": offsets, "barrier_ts": barrier_ts})
        return True

    # -------------------------------------------------------------- read
    def read_topic(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            "offset long, kind string, value string"
        ).option("basePath", self.path).json(os.path.join(self.path, "epoch=*"))
