from pipeline_spark.sources.jsonl import (
    jsonl_change_schema,
    normalize_enveloped,
    read_jsonl_changes,
    write_change_stream_jsonl,
)

__all__ = ["read_jsonl_changes", "normalize_enveloped", "write_change_stream_jsonl", "jsonl_change_schema"]
