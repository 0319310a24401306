"""Structured Streaming front-end for the changefeed engine."""

from tiflow_spark.streaming.changefeed_stream import StreamingChangefeed

__all__ = ["StreamingChangefeed"]
