from tiflow_spark.sinks.mq import FileMQSink, mq_dispatch  # noqa: F401
