"""LZ4 container ingest (the .lz4 leg of S4) and the pure-Python codec
behind it: xxHash32 vectors, block/frame round trips, corruption
detection, legacy frames — then the gate that matters: a .tar.lz4 /
.jsonl.lz4 / .yml.lz4 replay reproduces the parquet replay's final state
bit-for-bit (reference legacy-can handling: s3feeder.py:56-110)."""

import random
import struct

import pytest

from pipeline_spark.datagen import StreamSpec, generate_epoch, lww_oracle
from pipeline_spark.extraction import extract_text_py
from pipeline_spark.lake import LakeTable
from pipeline_spark.sources.lz4codec import (
    LZ4Error,
    _decompress_frame_py,
    compress_block,
    compress_frame,
    decompress_block,
    decompress_frame,
    is_lz4,
    maybe_decompress,
    xxh32,
)
from pipeline_spark.streaming.replay import fill_text
from tests.test_lake_merge import PAGE_SCHEMA, as_pandas_state, assert_state_equal


def test_xxh32_known_vectors():
    # public vectors from the xxHash reference implementation
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"", seed=1) == 0x0B2CB792
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Hello World") == 0xB1FD16EE


def test_block_round_trip_shapes():
    random.seed(7)
    cases = [
        b"",
        b"x",
        b"abcd" * 80,  # short-period matches
        bytes(random.getrandbits(8) for _ in range(5000)),  # incompressible
        b"the quick brown fox " * 500,
        b"A" * 100_000,  # offset-1 overlap copy
        bytes(random.getrandbits(8) for _ in range(300)) * 40,  # long matches
    ]
    for c in cases:
        assert decompress_block(compress_block(c)) == c


def test_frame_round_trip_and_multi_block():
    data = b"".join(
        f"line {i} with some repeated content repeated content\n".encode()
        for i in range(5000)
    )
    fr = compress_frame(data, block_size=16384)
    assert is_lz4(fr) and not is_lz4(data)
    assert _decompress_frame_py(fr) == data
    assert decompress_frame(fr) == data
    assert maybe_decompress(fr) == data
    assert maybe_decompress(data) == data  # pass-through on plain bytes
    assert len(fr) < len(data) // 2  # actually compresses


def test_frame_concatenated_and_skippable():
    skip = struct.pack("<II", 0x184D2A50, 3) + b"pad"
    cat = compress_frame(b"first|") + skip + compress_frame(b"second")
    assert _decompress_frame_py(cat) == b"first|second"


def test_legacy_frame():
    body = b"legacy can content " * 300
    blk = compress_block(body)
    legacy = struct.pack("<I", 0x184C2102) + struct.pack("<I", len(blk)) + blk
    assert _decompress_frame_py(legacy) == body


def test_corruption_detected():
    fr = bytearray(compress_frame(b"guarded by a content checksum"))
    fr[-1] ^= 0xFF
    with pytest.raises(LZ4Error):
        _decompress_frame_py(bytes(fr))
    with pytest.raises(LZ4Error):
        decompress_block(b"\xf0")  # truncated literal run


def test_block_and_frame_property_round_trip():
    """Property: every byte string round-trips through block and frame
    codecs (random data, repetitive data, and structured mixes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    blobs = st.one_of(
        st.binary(max_size=4096),
        # repetitive inputs exercise match emission + overlap copies
        st.tuples(st.binary(min_size=1, max_size=64), st.integers(1, 200)).map(
            lambda t: t[0] * t[1]
        ),
        st.lists(st.binary(max_size=32), max_size=64).map(b"|".join),
    )

    @given(blobs)
    @settings(max_examples=300, deadline=None)
    def check(data):
        assert decompress_block(compress_block(data)) == data
        assert _decompress_frame_py(compress_frame(data, block_size=1024)) == data

    check()


def test_tar_lz4_replay_matches_oracle(spark, tmp_path):
    """.tar.lz4 legacy cans replay to the exact LWW oracle state."""
    from pipeline_spark.sources.container import read_container_changes, write_change_stream_tar

    spec = StreamSpec(n_events=3_000, n_urls=150, n_epochs=2)
    write_change_stream_tar(str(tmp_path / "cans"), spec, codec="lz4")

    t = LakeTable.create(spark, str(tmp_path / "pages"), PAGE_SCHEMA, n_buckets=8)
    t.merge(read_container_changes(spark, str(tmp_path / "cans")), post_merge=fill_text)

    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    assert_state_equal(as_pandas_state(t), lww_oracle(pdfs, extract_text_py))


def test_jsonl_lz4_matches_plain_jsonl(spark, tmp_path):
    """.jsonl.lz4 cans decode to the identical record set as plain jsonl."""
    from pipeline_spark.sources.container import read_lz4_changes, write_change_stream_jsonl_lz4
    from pipeline_spark.sources.jsonl import read_jsonl_changes, write_change_stream_jsonl

    spec = StreamSpec(n_events=1_000, n_urls=80, n_epochs=2)
    write_change_stream_jsonl(str(tmp_path / "plain"), spec)
    write_change_stream_jsonl_lz4(str(tmp_path / "lzcans"), spec)

    a = read_jsonl_changes(spark, str(tmp_path / "plain") + "/*/*.jsonl").drop("extra")
    b = read_lz4_changes(spark, str(tmp_path / "lzcans"))
    cols = [c for c in a.columns]
    key = lambda r: tuple(repr(v) for v in r)  # None-safe total order
    assert sorted(map(tuple, a.select(cols).collect()), key=key) == sorted(
        map(tuple, b.select(cols).collect()), key=key
    )


def test_yaml_lz4_replay(spark, tmp_path):
    """.yml.lz4 blobs parse through the sniffing decoder, broken frames
    still counted."""
    from pipeline_spark.sources.yamlsrc import read_yaml_changes, write_change_stream_yaml

    spec = StreamSpec(n_events=800, n_urls=60, n_epochs=2)
    write_change_stream_yaml(str(tmp_path / "yblobs"), spec, broken_every=40, lz4=True)

    df = read_yaml_changes(spark, str(tmp_path / "yblobs"))
    pdfs = [generate_epoch(spec, e) for e in range(spec.n_epochs)]
    assert df.count() == sum(len(p) for p in pdfs)
    assert df.agg({"_broken": "sum"}).collect()[0][0] == sum(
        (len(p) + 39) // 40 for p in pdfs
    )


def test_native_dispatch_legacy_bypasses_and_errors_fall_back(monkeypatch):
    """ADVICE r3: a cluster image that ships python-lz4 must still read
    legacy cans — legacy/skippable magic routes straight to the Python
    decoder (native never consulted), and a native failure on a
    standard-magic payload retries pure-Python instead of raising."""
    import sys
    import types

    calls = {"n": 0}

    def boom(data):
        calls["n"] += 1
        raise RuntimeError("native codec rejects this payload")

    fake_frame = types.ModuleType("lz4.frame")
    fake_frame.decompress = boom
    fake_pkg = types.ModuleType("lz4")
    fake_pkg.frame = fake_frame
    monkeypatch.setitem(sys.modules, "lz4", fake_pkg)
    monkeypatch.setitem(sys.modules, "lz4.frame", fake_frame)

    body = b"payload for dispatch test " * 200
    blk = compress_block(body)
    legacy = struct.pack("<I", 0x184C2102) + struct.pack("<I", len(blk)) + blk
    assert decompress_frame(legacy) == body
    assert calls["n"] == 0  # legacy magic: native codec never consulted

    std = compress_frame(body)
    assert decompress_frame(std) == body  # native raised → pure-Python retry
    assert calls["n"] == 1


# ---------------------------------------------------------- property tests

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=20_000))
def test_frame_roundtrip_property(data):
    """compress_frame → decompress_frame is identity for ANY bytes."""
    assert decompress_frame(compress_frame(data)) == data


@settings(max_examples=40, deadline=None)
@given(
    st.binary(min_size=0, max_size=8_000),
    st.integers(min_value=16, max_value=4096),
    st.booleans(),
)
def test_frame_roundtrip_any_block_size(data, block_size, csum):
    assert decompress_frame(compress_frame(data, block_size=block_size, content_checksum=csum)) == data


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=3_000), min_size=1, max_size=4))
def test_concatenated_frames_property(parts):
    """Concatenated frames decode to the concatenated payloads (the
    multi-can file shape); skippable frames interleaved anywhere are
    ignored."""
    skippable = struct.pack("<II", 0x184D2A50, 4) + b"\x00\x00\x00\x00"
    blob = skippable + skippable.join(compress_frame(p) for p in parts)
    assert decompress_frame(blob) == b"".join(parts)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=10_000))
def test_block_roundtrip_property(data):
    assert decompress_block(compress_block(data)) == data
