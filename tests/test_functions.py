"""Golden unit tests for the scalar column helpers (SURVEY §2.3/§2.9) —
each previously relied on indirect coverage only."""

from datetime import datetime

from pyspark.sql import functions as F

from pipeline_spark.functions import (
    bool_tf,
    canonicalize,
    clamp_future,
    extract_domain,
    flag_wrong_date,
    knuth_unit,
    parse_asn,
    parse_ts,
)
from pipeline_spark.operators.scoring import make_scores, scores_to_json


def test_parse_asn_and_bool_tf(spark):
    df = spark.createDataFrame([("AS123", True), ("AS7", False)], "asn string, b boolean")
    got = df.select(parse_asn(F.col("asn")).alias("a"), bool_tf(F.col("b")).alias("t")).collect()
    assert [(r["a"], r["t"]) for r in got] == [(123, "t"), (7, "f")]


def test_parse_ts_roundtrip(spark):
    df = spark.createDataFrame([("2024-03-05 06:07:08",)], "s string")
    got = df.select(parse_ts(F.col("s")).alias("ts")).collect()[0]["ts"]
    assert got == datetime(2024, 3, 5, 6, 7, 8)


def test_flag_wrong_date_and_clamp_future(spark):
    rows = [
        (datetime(2024, 1, 1, 2, 0), datetime(2024, 1, 1, 0, 0)),   # 2h ahead → flagged
        (datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 0, 0)),  # 30min ahead → ok
        (datetime(2022, 1, 1), datetime(2024, 1, 1)),               # >1y stale → flagged
    ]
    df = spark.createDataFrame(rows, "ts timestamp, recv timestamp")
    got = [r[0] for r in df.select(flag_wrong_date(F.col("ts"), F.col("recv"))).collect()]
    assert got == [True, False, True]
    clamped = [r[0] for r in df.select(clamp_future(F.col("ts"), F.col("recv"))).collect()]
    # anything ahead of the pinned 'now' clamps down to it
    assert clamped == [datetime(2024, 1, 1), datetime(2024, 1, 1), datetime(2022, 1, 1)]


def test_extract_domain(spark):
    df = spark.createDataFrame([("https://a.example.com/x/y?z=1",)], "u string")
    assert df.select(extract_domain(F.col("u"))).collect()[0][0] == "a.example.com"


def test_canonicalize_passthrough_and_nullout(spark):
    df = spark.createDataFrame([("click",), ("weird",)], "t string")
    m = {"click": "web_click"}
    keep = [r[0] for r in df.select(canonicalize(F.col("t"), m)).collect()]
    drop = [r[0] for r in df.select(canonicalize(F.col("t"), m, keep_unknown=False)).collect()]
    assert keep == ["web_click", "weird"]
    assert drop == ["web_click", None]


def test_knuth_unit_deterministic_and_bounded(spark):
    got = [r[0] for r in spark.range(0, 1000).select(knuth_unit(F.col("id"))).collect()]
    assert all(0.0 <= u < 1.0 for u in got)
    again = [r[0] for r in spark.range(0, 1000).select(knuth_unit(F.col("id"))).collect()]
    assert got == again


def test_scores_to_json_golden(spark):
    df = spark.createDataFrame([(1,)], "i int")
    s = make_scores(F.lit(1).cast("double"), F.lit(0).cast("double"), F.lit("match"))
    got = df.select(scores_to_json(s)).collect()[0][0]
    assert got == '{"blocking":1.0,"accuracy":0.0,"msg":"match"}'


def test_version_key_never_truncates_and_matches_literal(spark):
    """ADVICE r3: lpad truncated >5-digit segments while the literal side
    (zfill) never does — the two encodings must agree byte-for-byte so
    version-gate comparisons can't silently mis-order."""
    from pipeline_spark.operators.scoring import _version_key_literal, version_key

    versions = ["0.2.2", "1.23.456", "4.123456.7", "123456", "10.0"]
    df = spark.createDataFrame([(v,) for v in versions], "v string")
    got = [r[0] for r in df.select(version_key(F.col("v"))).collect()]
    assert got == [_version_key_literal(v) for v in versions]
    # the documented <100000 range still orders correctly
    assert _version_key_literal("0.9.9") < _version_key_literal("0.10.0")
    k = {v: g for v, g in zip(versions, got)}
    assert k["0.2.2"] < k["1.23.456"]


def test_response_check_scorer_null_array_is_unscorable_blocked(spark):
    """ADVICE r3: a NULL responses array (missing test_keys section) must
    behave like the empty array — blocking 1, accuracy 0 — not yield a
    NULL scores struct that drops out of downstream threshold filters."""
    from pipeline_spark.operators.scoring import response_check_scorer

    schema = "responses array<struct<code:int, server:string>>"
    df = spark.createDataFrame([(None,), ([],), ([(200, "ECAcc x")],)], schema)
    rows = df.select(response_check_scorer(F.col("responses")).alias("s")).collect()
    null_arr, empty_arr, ok = (r["s"] for r in rows)
    assert null_arr == empty_arr  # NULL array ≡ empty array
    assert (null_arr["blocking"], null_arr["accuracy"], null_arr["msg"]) == (1.0, 0.0, "no requests")
    assert (ok["blocking"], ok["accuracy"]) == (0.0, 1.0)


def test_version_key_orders_like_tuples_property():
    """For segments < 100000 (the documented range) the encoded string
    order must equal numeric tuple order — property-checked Python-side
    (the column expression mirrors this encoding byte-for-byte, covered
    by test_version_key_never_truncates_and_matches_literal)."""
    from hypothesis import given, settings, strategies as st

    from pipeline_spark.operators.scoring import _version_key_literal

    seg = st.integers(min_value=0, max_value=99_999)
    ver = st.lists(seg, min_size=1, max_size=4)

    @settings(max_examples=200, deadline=None)
    @given(ver, ver)
    def check(a, b):
        sa, sb = ".".join(map(str, a)), ".".join(map(str, b))
        ka, kb = _version_key_literal(sa), _version_key_literal(sb)
        # same-length version lists: string order == numeric order
        if len(a) == len(b):
            assert (ka < kb) == (tuple(a) < tuple(b)), (sa, sb)
        # equality always corresponds
        assert (ka == kb) == (a == b)

    check()


def test_parse_extra_conf_passthrough_spec():
    from pipeline_spark.session import parse_extra_conf

    assert parse_extra_conf("") == {}
    assert parse_extra_conf("a=1") == {"a": "1"}
    # trailing/duplicate separators, whitespace, '=' inside the value,
    # and malformed segments (no '=' / empty key) are all tolerated
    assert parse_extra_conf(" a = 1 ; b=x=y ;; c ; =z ;") == {"a": "1", "b": "x=y"}
