from pipeline_spark.sources.container import (
    read_container_changes,
    read_lz4_changes,
    read_tar_lines,
)
from pipeline_spark.sources.jsonl import (
    jsonl_change_schema,
    normalize_enveloped,
    read_jsonl_changes,
    write_change_stream_jsonl,
)
from pipeline_spark.sources.lz4codec import decompress_frame, maybe_decompress
from pipeline_spark.sources.yamlsrc import read_yaml_changes

__all__ = [
    "read_jsonl_changes",
    "normalize_enveloped",
    "write_change_stream_jsonl",
    "jsonl_change_schema",
    "read_container_changes",
    "read_lz4_changes",
    "read_tar_lines",
    "read_yaml_changes",
    "decompress_frame",
    "maybe_decompress",
]
