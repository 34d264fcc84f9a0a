"""S6 live feeder: TCP socket source → shared envelope normalization →
foreachBatch merge, with producer-side backpressure via the kernel
socket buffer (reference: localhttpfeeder.py:29-46's bounded queue)."""

import time

from pipeline_spark.datagen import StreamSpec, generate_epoch, lww_oracle
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.lake import LakeTable
from pipeline_spark.streaming.replay import fill_text
from pipeline_spark.streaming.socket_source import ChangeStreamServer, read_socket_changes
from tests.test_lake_merge import PAGE_SCHEMA, as_pandas_state, assert_state_equal


def test_socket_live_tail_replays_to_oracle(spark, tmp_path):
    spec = StreamSpec(n_events=1_500, n_urls=100, n_epochs=2)
    server = ChangeStreamServer(spec).start()
    t = LakeTable.create(spark, str(tmp_path / "pages"), PAGE_SCHEMA, n_buckets=4)

    changes = read_socket_changes(spark, server.host, server.port)

    def apply(batch_df, batch_id):
        t.merge(batch_df, post_merge=fill_text, broadcast_winners=True)

    q = (
        changes.writeStream.foreachBatch(apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
        expected = lww_oracle(pdfs, extract_text_py)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if t.read().count() == len(expected):
                break
            time.sleep(1)
        assert_state_equal(as_pandas_state(t), expected)
        # the feeder pushed every line (sendall never dropped under
        # backpressure)
        n_lines = sum(len(p) for p in pdfs)
        assert server.lines_sent == n_lines
    finally:
        q.stop()
        server.close()
