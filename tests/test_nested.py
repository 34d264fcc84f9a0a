"""Nested/array operator tests (SURVEY §2.3 P11/P15/P16, §2.6 A5/A6)."""

from pyspark.sql import functions as F

from pipeline_spark.operators.nested import (
    endpoint_tally,
    nested_max,
    normalize_headers,
    parse_dns_answers,
    reorder_requests,
)


def test_normalize_headers(spark):
    df = spark.createDataFrame(
        [([("Content-Type", ["text/html", "ignored"]), ("X-Foo", ["bar"])],)],
        "pairs array<struct<name string, values array<string>>>",
    )
    out = df.select(normalize_headers(F.col("pairs")).alias("h")).collect()[0]["h"]
    assert out == {"content-type": "text/html", "x-foo": "bar"}


def test_parse_dns_answers(spark):
    df = spark.createDataFrame(
        [(["ttl 300 type A 1.2.3.4", "ttl 60 type CNAME host.example"],)],
        "answers array<string>",
    )
    out = df.select(parse_dns_answers(F.col("answers")).alias("a")).collect()[0]["a"]
    assert out[0]["ttl"] == 300 and out[0]["rtype"] == "A" and out[0]["address"] == "1.2.3.4"
    assert out[1]["ttl"] == 60 and out[1]["rtype"] == "CNAME" and out[1]["address"] == ""


def test_endpoint_tally_and_nested_max(spark):
    df = spark.createDataFrame(
        [([{"status": "ok", "tid": 3}, {"status": "fail", "tid": 9}, {"status": "ok", "tid": 1}],)],
        "evs array<struct<status string, tid int>>",
    )
    row = df.select(
        endpoint_tally(F.col("evs"), lambda e: e["status"] == "ok").alias("n_ok"),
        nested_max(F.col("evs"), "tid").alias("max_tid"),
    ).collect()[0]
    assert row["n_ok"] == 2 and row["max_tid"] == 9


def test_reorder_requests_stable(spark):
    df = spark.createDataFrame(
        [([{"kind": "tor", "i": 1}, {"kind": "exp", "i": 2}, {"kind": "exp", "i": 3}, {"kind": "tor", "i": 4}],)],
        "reqs array<struct<kind string, i int>>",
    )
    out = df.select(
        reorder_requests(F.col("reqs"), lambda r: r["kind"] == "exp").alias("r")
    ).collect()[0]["r"]
    assert [x["i"] for x in out] == [2, 3, 1, 4]  # primaries first, stable


def test_envelope_unwrap(spark):
    from pipeline_spark.operators.nested import envelope_unwrap

    rows = [("json", '{"a": 1, "b": "x"}'), ("yaml", "a: 1"), ("json", "not json")]
    df = spark.createDataFrame(rows, "fmt string, content string")
    out = df.select(
        envelope_unwrap(F.col("content"), F.col("fmt"), "a int, b string").alias("rec")
    ).collect()
    assert out[0]["rec"]["a"] == 1 and out[0]["rec"]["b"] == "x"
    assert out[1]["rec"] is None  # non-json formats surface as NULL struct
    assert out[2]["rec"] == (None, None)  # permissive: unparsable → null fields


def test_response_length(spark):
    from pipeline_spark.operators.nested import response_length

    rows = [
        ({"content-length": "123"}, "short"),
        ({}, "body of 15 chars" [:15]),
        ({"content-length": "oops"}, "xyz"),
    ]
    df = spark.createDataFrame(rows, "headers map<string,string>, body string")
    got = [r[0] for r in df.select(response_length(F.struct("headers", "body"))).collect()]
    assert got == [123, 15, 3]  # header wins; falls back to body length


def test_legacy_report_id(spark):
    from pipeline_spark.functions import legacy_report_id_udf

    df = spark.createDataFrame(
        [("20240101T000000Z", b"hdr"), ("20240101T000000Z", b"hdr"), ("20240101T000000Z", None)],
        "t string, h binary",
    )
    got = [r[0] for r in df.select(legacy_report_id_udf("t", "h")).collect()]
    assert got[0] == got[1] and got[0].startswith("20240101T000000Z_")
    suffix = got[0].split("_", 1)[1]
    assert len(suffix) == 50 and suffix.isalpha() and suffix.isupper()
    assert got[2] is None
