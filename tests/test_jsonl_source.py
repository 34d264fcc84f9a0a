"""JSONL ingest path: envelope unwrap, permissive parse, base64 payloads,
stray-key fold — and the gate that matters: a jsonl replay reproduces the
parquet replay's final table state bit-for-bit."""

import pandas as pd
from pyspark.sql import functions as F

from pipeline_spark.datagen import StreamSpec, generate_epoch, lww_oracle
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.lake import LakeTable
from pipeline_spark.sources import read_jsonl_changes, write_change_stream_jsonl
from pipeline_spark.streaming.replay import fill_text
from tests.test_lake_merge import PAGE_SCHEMA, as_pandas_state, assert_state_equal


def test_jsonl_replay_matches_parquet_final_state(spark, tmp_path):
    spec = StreamSpec(n_events=4_000, n_urls=200, n_epochs=2)
    write_change_stream_jsonl(str(tmp_path / "stream"), spec, extra_keys=True)

    t = LakeTable.create(spark, str(tmp_path / "pages"), PAGE_SCHEMA, n_buckets=8)
    df = read_jsonl_changes(spark, str(tmp_path / "stream") + "/*/*.jsonl").drop("extra")
    t.merge(df, post_merge=fill_text)

    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_jsonl_stray_key_fold_and_malformed_lines(spark, tmp_path):
    spec = StreamSpec(n_events=400, n_urls=50, n_epochs=1)
    write_change_stream_jsonl(str(tmp_path / "s2"), spec, extra_keys=True)
    # plant a malformed line and a no-envelope line
    p = str(tmp_path / "s2" / "ep-0000" / "part-00000.jsonl")
    with open(p, "a") as f:
        f.write("this is not json at all\n")
        f.write('{"format": "json"}\n')

    df = read_jsonl_changes(spark, p)
    rows = df.collect()
    pdf = generate_epoch(spec, 0)
    assert len(rows) == len(pdf) + 2  # malformed lines surface as null records
    n_null = sum(1 for r in rows if r["op"] is None and r["url"] is None)
    n_invalid_gen = int(pdf["url"].isna().sum())  # datagen nulls url only on some invalids
    assert n_null >= 2
    strays = [r["extra"] for r in rows if r["extra"]]
    assert strays and all("debug_note" in s for s in strays)
    # every 7th record carries the stray key
    assert len(strays) == (len(pdf) + 6) // 7
    # base64 → binary round trip is byte-exact
    by_offset = {(r["epoch"], r["offset"]): r for r in rows if r["offset"] is not None}
    for row in pdf.itertuples(index=False):
        if row.html is not None:
            got = by_offset[(row.epoch, row.offset)]["html"]
            assert bytes(got) == row.html


def test_jsonl_timestamps_match_parquet(spark, tmp_path):
    """Microsecond timestamps must survive the string round trip."""
    spec = StreamSpec(n_events=200, n_urls=30, n_epochs=1)
    write_change_stream_jsonl(str(tmp_path / "s3"), spec)
    df = read_jsonl_changes(spark, str(tmp_path / "s3") + "/*/*.jsonl")
    pdf = generate_epoch(spec, 0)
    got = {r["offset"]: r["warc_ts"] for r in df.collect() if r["offset"] is not None}
    for row in pdf.itertuples(index=False):
        exp = None if pd.isna(row.warc_ts) else row.warc_ts.to_pydatetime()
        assert got[row.offset] == exp, (row.offset, got[row.offset], exp)


def test_tar_container_replay_matches_jsonl(spark, tmp_path):
    """S4 container path: tar.gz-of-jsonl replay produces the identical
    final state as the plain jsonl replay (and the LWW oracle)."""
    from pipeline_spark.datagen import StreamSpec
    from pipeline_spark.sources.container import read_container_changes, write_change_stream_tar

    spec = StreamSpec(n_events=3_000, n_urls=150, n_epochs=2)
    write_change_stream_tar(str(tmp_path / "cans"), spec, gz=True)

    t = LakeTable.create(spark, str(tmp_path / "cpages"), PAGE_SCHEMA, n_buckets=8)
    df = read_container_changes(spark, str(tmp_path / "cans"))
    t.merge(df, post_merge=fill_text)

    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_tar_plain_and_line_counts(spark, tmp_path):
    from pipeline_spark.datagen import StreamSpec, generate_epoch
    from pipeline_spark.sources.container import read_tar_lines, write_change_stream_tar

    spec = StreamSpec(n_events=600, n_urls=60, n_epochs=2)
    write_change_stream_tar(str(tmp_path / "cans2"), spec, gz=False)
    lines = read_tar_lines(spark, str(tmp_path / "cans2"))
    n_exp = sum(len(generate_epoch(spec, e)) for e in range(spec.n_epochs))
    assert lines.count() == n_exp
    assert lines.select("src_container").distinct().count() == spec.n_epochs


def test_yaml_blob_replay_and_broken_frames(spark, tmp_path):
    """S5: ---framed YAML blobs parse per-frame with skip-and-count on
    broken frames; the replay state equals the LWW oracle."""
    from pipeline_spark.datagen import StreamSpec
    from pipeline_spark.sources.yamlsrc import read_yaml_changes, write_change_stream_yaml

    spec = StreamSpec(n_events=1_000, n_urls=80, n_epochs=2)
    write_change_stream_yaml(str(tmp_path / "yblobs"), spec, broken_every=50)

    df = read_yaml_changes(spark, str(tmp_path / "yblobs"))
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    n_rows = sum(len(p) for p in pdfs)
    n_broken = df.agg({"_broken": "sum"}).collect()[0][0]
    assert df.count() == n_rows  # every good frame parsed
    assert n_broken == sum((len(p) + 49) // 50 for p in pdfs)  # every planted junk frame counted

    t = LakeTable.create(spark, str(tmp_path / "ypages"), PAGE_SCHEMA, n_buckets=4)
    t.merge(df.drop("_broken"), post_merge=fill_text)
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_yaml_frame_splitter_tolerates_junk(spark):
    from pipeline_spark.sources.yamlsrc import split_yaml_frames

    blob = b"leading junk\n---\na: 1\n---\nb: 2\nmore: x\n---\n\xff\xfebroken bytes\n---\nc: 3"
    frames = split_yaml_frames(blob)
    assert len(frames) == 5  # junk prefix kept as a frame for the parser to reject
    assert frames[2] == "b: 2\nmore: x\n"
    assert frames[4] == "c: 3"
