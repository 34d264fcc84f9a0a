"""Structured Streaming entry points for the CDC engine."""

from pipeline_spark.streaming.replay import replay_stream
from pipeline_spark.streaming.socket_source import ChangeStreamServer, read_socket_changes

__all__ = ["replay_stream", "ChangeStreamServer", "read_socket_changes"]
