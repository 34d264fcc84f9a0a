"""Structured Streaming entry points for the CDC engine."""

from pipeline_spark.streaming.replay import replay_stream

__all__ = ["replay_stream"]
