"""Live network feeder + socket streaming source (the real-time leg of
S6).

The reference runs a localhost HTTP feeder whose producer BLOCKS when
the pipeline's input queue is full (``af/fastpath/fastpath/
localhttpfeeder.py:29-46`` — backpressure by bounded queue). The
Spark-native equivalent:

* a threaded TCP feeder (:func:`serve_change_stream`) that writes
  enveloped JSONL lines with ``sendall`` — when Spark's receiver stops
  draining, the kernel socket buffer fills and the producer blocks, the
  same bounded-buffer backpressure with zero custom code;
* ``spark.readStream.format("socket")`` → the SAME
  :func:`~pipeline_spark.sources.jsonl.normalize_enveloped` column
  expressions as the file/container paths (one parser for every
  transport) → ``foreachBatch`` merge into the lake table.

Scale note: Spark's socket source is single-receiver (driver-attached) —
it demos the live-tail semantics and the shared normalization; a
production deployment fronts the stream with a partitioned log (Kafka
source), which swaps only the ``format()`` call. The micro-batch knob on
the file path (``maxFilesPerTrigger``) has no socket analogue; batch
size there follows the trigger interval.
"""

from __future__ import annotations

import base64
import json
import socket
import threading

from pyspark.sql import DataFrame, SparkSession

from pipeline_spark.sources.jsonl import normalize_enveloped


class ChangeStreamServer:
    """Serves a deterministic datagen stream as enveloped JSONL over TCP.

    ``sendall`` on a connected socket gives producer-side backpressure:
    when the consumer stalls, the send buffer fills and the feeder thread
    blocks instead of dropping or buffering unboundedly."""

    def __init__(self, spec, host: str = "127.0.0.1", port: int = 0):
        self.spec = spec
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(1)
        self.host, self.port = self._srv.getsockname()
        self._thread: threading.Thread | None = None
        self.lines_sent = 0

    def _payload_lines(self) -> list[bytes]:
        from pipeline_spark.datagen import generate_epoch

        lines = []
        for e in range(self.spec.n_epochs):
            for row in generate_epoch(self.spec, e).itertuples(index=False):
                rec = {
                    "op": row.op,
                    "url": row.url,
                    "warc_ts": None
                    if row.warc_ts is None or str(row.warc_ts) == "NaT"
                    else f"{row.warc_ts:%Y-%m-%d %H:%M:%S.%f}",
                    "html_b64": None
                    if row.html is None
                    else base64.b64encode(row.html).decode("ascii"),
                    "lang": row.lang,
                    "epoch": int(row.epoch),
                    "offset": int(row.offset),
                }
                lines.append(
                    (json.dumps({"format": "json", "content": rec}) + "\n").encode()
                )
        return lines

    def start(self) -> "ChangeStreamServer":
        lines = self._payload_lines()

        def serve() -> None:
            conn, _ = self._srv.accept()
            try:
                for ln in lines:
                    conn.sendall(ln)  # blocks when the consumer falls behind
                    self.lines_sent += 1
            except (BrokenPipeError, ConnectionResetError):
                pass
            finally:
                try:
                    # half-close: signal EOF but keep draining so the
                    # receiver reads everything already sent
                    conn.shutdown(socket.SHUT_WR)
                except OSError:
                    pass

        self._thread = threading.Thread(target=serve, daemon=True)
        self._thread.start()
        return self

    def close(self) -> None:
        self._srv.close()


def read_socket_changes(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Live-tail a TCP line feed into normalized change records — the
    same envelope normalization as the jsonl/container/file paths."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return normalize_enveloped(lines, "value", keep_extra=False)
