"""tiflow_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Reproduces the semantics of the reference engine (pingcap/tiflow: TiCDC + DM,
see /root/reference and SURVEY.md) re-expressed Spark-first:

- changefeed replay of I/U/D events over conversation transcripts,
- resolved-ts barrier ordering (epoch micro-batches),
- key-partitioned last-writer-wins MERGE into a snapshot-isolated lake table
  keyed (conv_id, turn_idx),
- online schema evolution through a versioned, field-id-based schema registry,
- epoch-fenced exactly-once commits,
- salted repartitioning for hot keys,
- checkpoint resumability with per-partition lineage.

Not a port: the reference's goroutine/channel/actor machinery maps onto Spark
partitions, shuffles and deterministic micro-epoch batch jobs.
"""

__version__ = "0.1.0"
