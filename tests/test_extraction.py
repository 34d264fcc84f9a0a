"""Byte-identity of the Arrow-vectorized extraction vs the pure-Python
reference (the golden-invariant strategy of reference
tests/test_functional_normalize.py:170-217)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline_spark.datagen import StreamSpec, generate_epoch
from pipeline_spark.extraction import extract_text_py, with_extracted_text

EDGES = [
    None,
    b"",
    b"\xff\xfe<p>invalid prefix</p>",
    b"<p>nul\x00inside\x00</p>",
    b"<p>ok &amp; fine &lt;tag&gt;</p>",
    "<p>unicode é中文</p>".encode(),
    b"<script>var x = '<p>not text</p>';</script><p>after</p>",
    b"<!-- note --><P CLASS='x'>upper\ttab</P>\n\n\n\n<p>gap</p>",
    b"\x80\x81\x82",
    b"<style>p{a:1}</style>real <b>bold</b> text",
    b"a" * 2_000_000,
    b"<p>" + b"word " * 100_000 + b"</p>",
    b"line1\n   \n\n\n\nline2",
    b"&nbsp;&apos;x&quot;",
]


def test_pure_python_reference_values():
    assert extract_text_py(None) is None
    assert extract_text_py(b"") == ""
    assert extract_text_py(b"<p>ok &amp; fine &lt;tag&gt;</p>") == "ok & fine <tag>"
    assert extract_text_py(b"<p>nul\x00inside\x00</p>") == "nulinside"
    # invalid bytes survive as backslash escapes, never raise
    assert "\\xff" in extract_text_py(b"\xff\xfe<p>x</p>")
    assert extract_text_py(b"<script>var a=1;</script><p>after</p>") == "after"


def test_udf_byte_identical_on_edges(spark):
    pdf = pd.DataFrame({"id": range(len(EDGES)), "html": EDGES})
    df = spark.createDataFrame(pdf, schema="id long, html binary")
    got = {r["id"]: r["text"] for r in with_extracted_text(df).collect()}
    for i, b in enumerate(EDGES):
        exp = extract_text_py(b)
        assert got[i] == exp, f"row {i}: {got[i]!r} != {exp!r}"


@pytest.mark.parametrize("epoch", [0, 1])
def test_udf_byte_identical_on_generated_stream(spark, epoch):
    """~2.5k generated events incl. crafted edge cases — full-corpus hash."""
    pdf = generate_epoch(StreamSpec(n_events=5_000, n_urls=300, n_epochs=2), epoch)
    df = spark.createDataFrame(pdf[["offset", "html"]], schema="offset long, html binary")
    rows = with_extracted_text(df).select("offset", "text").collect()
    got = {r["offset"]: r["text"] for r in rows}

    h_ref, h_got = hashlib.sha256(), hashlib.sha256()
    for off in sorted(got):
        raw = pdf.loc[pdf["offset"] == off, "html"].iloc[0]
        exp = extract_text_py(raw)
        for h, v in ((h_ref, exp), (h_got, got[off])):
            h.update(b"\x00" if v is None else v.encode("utf-8", "surrogateescape"))
    assert h_ref.hexdigest() == h_got.hexdigest()


def test_stays_vectorized(spark):
    """The plan must contain an ArrowEvalPython stage (pandas UDF), never
    a row-at-a-time BatchEvalPython."""
    df = spark.createDataFrame(pd.DataFrame({"html": [b"<p>x</p>"]}), schema="html binary")
    plan = with_extracted_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
