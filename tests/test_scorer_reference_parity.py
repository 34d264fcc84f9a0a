"""Scorer parity pinned to the REFERENCE's own published unit-test
expectations (af/fastpath/fastpath/tests/test_unit.py) — not just our
DuckDB oracles. Each case reconstructs the behavioral content of a
reference fixture in our column schema and asserts the exact
blocking/accuracy values the reference test asserts.

Covered here:
* meek / meek2 / meek3 (test_unit.py:489-527; scorer core.py:1154-1194):
  non-200 → 1.0; all 200 + "ECAcc " Server → 0.0; a 200 with a foreign
  Server adds 0.5; empty requests → blocked AND unscorable.
* signal_022 (test_unit.py:548-559; scorer core.py:1344-1378): status
  "ok" on a post-gate version → blocking 0; plus the version-gate
  unusable branch (ooni/probe#2344 patch semantics).
"""

from pyspark.sql import functions as F

from pipeline_spark.operators.scoring import response_check_scorer, status_gate_scorer

RESP_SCHEMA = "responses array<struct<code:int, server:string>>"


def _score(spark, rows, schema, scorer):
    df = spark.createDataFrame(rows, schema)
    return [r["s"] for r in df.select(scorer.alias("s")).collect()]


def test_meek_trio_matches_reference_expectations(spark):
    rows = [
        ([(403, "CloudFront")],),          # "meek": non-200 response
        ([(200, "ECAcc (mil/6CA5)")],),    # "meek2": fronted OK
        ([(200, "nginx/1.10")],),          # "meek3": 200 via foreign server
        ([],),                             # empty requests
    ]
    meek, meek2, meek3, empty = _score(
        spark, rows, RESP_SCHEMA, response_check_scorer(F.col("responses"))
    )
    assert meek["blocking"] == 1.0           # test_unit.py:489-500
    assert meek2["blocking"] == 0.0          # test_unit.py:502-513
    assert meek3["blocking"] == 0.5          # test_unit.py:515-527
    assert (empty["blocking"], empty["accuracy"]) == (1.0, 0.0)  # core.py:1162-1166


def test_signal_status_and_version_gate_match_reference(spark):
    schema = "status string, failure string, ver string, after_cutoff boolean"
    rows = [
        ("ok", None, "0.2.2", True),    # signal_022 fixture → blocking 0
        ("blocked", None, "0.2.2", True),
        ("ok", None, "0.2.0", True),    # old probe after backend change → unusable
        ("ok", None, "0.2.0", False),   # old probe BEFORE the change → still scored
        ("ok", "eof_error", "0.2.2", True),  # hard failure → unusable
    ]
    scorer = status_gate_scorer(
        F.col("status"),
        F.col("failure").isNotNull(),
        version_col=F.col("ver"),
        min_version="0.2.1",
        cutoff_gate=F.col("after_cutoff"),
    )
    ok, blocked, gated, pre_cutoff, failed = _score(spark, rows, schema, scorer)
    assert (ok["blocking"], ok["accuracy"]) == (0.0, 1.0)        # test_unit.py:548-559
    assert (blocked["blocking"], blocked["accuracy"]) == (1.0, 1.0)
    assert gated["accuracy"] == 0.0                              # core.py:1358-1366 gate
    assert (pre_cutoff["blocking"], pre_cutoff["accuracy"]) == (0.0, 1.0)
    assert failed["accuracy"] == 0.0


def test_zip_compare_null_lists_behave_like_empty(spark):
    """A NULL sent/received list must act like the reference's missing
    key (coalesced to []): both effectively empty → unusable; one NULL
    side with data on the other → no mismatch within the empty zipped
    prefix, scored reachable — never NULL scores, never a negative
    slice length."""
    from pipeline_spark.operators.scoring import zip_compare_scorer

    schema = "sent array<string>, received array<string>"
    rows = [
        (None, None),
        (None, ["GET /"]),
        (["GET /"], ["GET /"]),
        (["GET /"], ["MANGLED"]),
        ([], []),
    ]
    df = spark.createDataFrame(rows, schema)
    s = [r["s"] for r in df.select(
        zip_compare_scorer(F.col("sent"), F.col("received")).alias("s")).collect()]
    both_null, one_null, match, differ, both_empty = s
    assert (both_null["blocking"], both_null["accuracy"]) == (0.0, 0.0)
    assert both_null == both_empty
    assert (one_null["blocking"], one_null["accuracy"]) == (0.0, 1.0)
    assert (match["blocking"], match["accuracy"]) == (0.0, 1.0)
    assert (differ["blocking"], differ["accuracy"]) == (1.0, 1.0)


def test_header_set_compare_null_requests_unusable(spark):
    """http_header_field_manipulation with requests:null / absent keys →
    scores_failed (reference test_unit.py:248-269): a NULL observed set
    must be unusable (accuracy 0), never NULL or negative blocking."""
    from pipeline_spark.operators.scoring import set_compare_scorer

    df = spark.createDataFrame([(None,), (["a", "b"],)], "got array<string>")
    nulls, ok = [r["s"] for r in df.select(
        set_compare_scorer(["a", "b"], F.col("got")).alias("s")).collect()]
    assert (nulls["blocking"], nulls["accuracy"], nulls["msg"]) == (0.0, 0.0, "missing")
    assert (ok["blocking"], ok["accuracy"], ok["msg"]) == (0.0, 1.0, "match")


def test_tor_and_riseupvpn_match_reference_expectations(spark):
    """tor fixture (test_unit.py:443-454): 3 targets, zero failures →
    blocking 0, scored. riseupvpn fixture (test_unit.py:473-486):
    api_status blocked + ca_cert_status false → blocking 1."""
    from pipeline_spark.operators.scoring import flag_count_scorer, tally_ratio_scorer

    df = spark.createDataFrame([([None, None, None],)], "failures array<string>")
    tor = df.select(
        tally_ratio_scorer(F.col("failures"), lambda f: f.isNotNull()).alias("s")
    ).collect()[0]["s"]
    assert (tor["blocking"], tor["accuracy"]) == (0.0, 1.0)

    r = spark.createDataFrame(
        [("blocked", False, None, None)],
        "api_status string, ca_cert_status boolean, obfs4 string, openvpn string",
    )
    rise = r.select(
        flag_count_scorer(
            [],
            [
                F.col("api_status") == "blocked",
                F.col("ca_cert_status").eqNullSafe(F.lit(False)),
                F.col("obfs4") == "blocked",
                F.col("openvpn") == "blocked",
            ],
            weight=1.0,
        ).alias("s")
    ).collect()[0]["s"]
    assert rise["blocking"] == 1.0
