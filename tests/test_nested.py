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
