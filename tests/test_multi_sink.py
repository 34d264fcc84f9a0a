"""K2 secondary upsert target: one change stream applied to TWO lake
tables (pages keyed by url, domains keyed by extracted domain) inside one
foreachBatch, each with its own fence — replaying the stream is a no-op
for both (multi-sink exactly-once)."""

import pandas as pd
from pyspark.sql import functions as F

from pipeline_spark.datagen import SPARK_DDL, StreamSpec, generate_epoch, lww_oracle, write_change_stream
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.lake import LakeTable
from pipeline_spark.streaming.replay import fill_text
from tests.test_lake_merge import PAGE_SCHEMA, as_pandas_state, assert_state_equal


def _domains_oracle(pdfs):
    """Winner per domain by (warc_ts, epoch, offset); delete-winners excluded."""
    state = {}
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            if r.url is None or pd.isna(r.warc_ts):
                continue
            dom = r.url.split("/")[2]
            k = (r.warc_ts, r.epoch, r.offset)
            if dom not in state or k > state[dom][0]:
                state[dom] = (k, r.op, r.lang)
    return {d: (k[0], lang) for d, (k, op, lang) in state.items() if op != "D"}


def test_one_stream_two_upsert_targets_exactly_once(spark, tmp_path):
    spec = StreamSpec(n_events=4_000, n_urls=200, n_epochs=2)
    stream = str(tmp_path / "stream")
    write_change_stream(stream, spec)

    pages = LakeTable.create(spark, str(tmp_path / "pages"), PAGE_SCHEMA, n_buckets=8)
    domains = LakeTable.create(
        spark,
        str(tmp_path / "domains"),
        [("domain", "string"), ("warc_ts", "timestamp"), ("lang", "string")],
        key="domain",
        version_col="warc_ts",
        n_buckets=4,
    )

    def apply_batch(batch_df, batch_id):
        pages.merge(batch_df, fence=("dual", batch_id), post_merge=fill_text)
        dom = batch_df.select(
            "op",
            F.parse_url(F.col("url"), F.lit("HOST")).alias("domain"),
            "warc_ts",
            "lang",
            "epoch",
            "offset",
        )
        domains.merge(dom, fence=("dual", batch_id))

    def run(checkpoint):
        q = (
            spark.readStream.schema(SPARK_DDL)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(stream)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ck1"))
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    assert_state_equal(as_pandas_state(pages), lww_oracle(pdfs, extract_text_py))
    got_dom = {r["domain"]: (r["warc_ts"], r["lang"]) for r in domains.read().collect()}
    exp_dom = {d: (pd.Timestamp(ts).to_pydatetime(), lang) for d, (ts, lang) in _domains_oracle(pdfs).items()}
    assert got_dom == exp_dom

    # replay from a FRESH checkpoint: both tables fence every batch out
    vp, vd = pages.current_version(), domains.current_version()
    run(str(tmp_path / "ck2"))
    assert pages.current_version() == vp and domains.current_version() == vd
