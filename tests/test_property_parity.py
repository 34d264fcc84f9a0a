"""Property-based invariants (hypothesis) for the two kernels whose
correctness everything else leans on:

* extraction: the Arrow-vectorized twin (`_extract_series`) must be
  byte-identical to the pure-Python reference (`extract_text_py`) on
  ARBITRARY input — the golden fixture pins ~200 curated cases, this
  pins the equivalence itself on adversarial random bytes (invalid
  UTF-8, NULs, half-open tags, entity fragments).
* LWW reduction: `lww_latest` (and its salted two-level variant) must
  equal a pure-Python dict reduce for every input whose order struct is
  a total order — the associativity/commutativity argument in
  operators/lww.py, checked by example instead of asserted.

Reference semantics: ClickHouse ReplacingMergeTree keep-newest
(af/fastpath/fastpath/db.py:82-84) and normalize_body
(af/fastpath/fastpath/normalize.py:173-189).
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from pipeline_spark.extraction import _extract_series, extract_text_py

# Adversarial HTML-ish fragments: raw bytes (often invalid UTF-8), plus
# text over an alphabet dense in the pipeline's trigger characters so
# tags / entities / whitespace runs / NULs actually occur.
_HTMLISH = st.text(
    alphabet="<>/ab &;nbspamltquo#39\n\t\r\x00!--scriptyle=\"'",
    max_size=120,
).map(lambda s: s.encode("utf-8", "surrogatepass"))
_FRAGMENT = st.one_of(st.binary(max_size=100), _HTMLISH)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(st.none(), _FRAGMENT), min_size=1, max_size=6))
def test_vectorized_twin_is_byte_identical_on_random_bytes(batch):
    out = _extract_series(pd.Series(batch, dtype=object)).tolist()
    for raw, got in zip(batch, out):
        want = extract_text_py(raw)
        if want is None:
            assert got is None or pd.isna(got), (raw, got)
        else:
            assert got == want, (raw, got, want)


@settings(max_examples=300, deadline=None)
@given(_FRAGMENT)
def test_extracted_text_invariants(raw):
    out = extract_text_py(raw)
    assert out is not None
    assert "\x00" not in out  # NUL strip (normalize.py:177 semantics)
    assert out == out.strip()  # always stripped
    assert "\n\n\n" not in out  # blank-line cap survives entity sub
    # entity substitution runs last and can only produce single spaces,
    # so the only multi-space runs come from &nbsp; sequences
    assert "\t\t" not in out


# --- LWW property (Spark) -------------------------------------------------

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key: few values → collisions
        st.integers(min_value=0, max_value=3),  # v1: ties likely
        st.integers(min_value=0, max_value=3),  # v2: ties likely
        st.integers(min_value=-100, max_value=100),  # payload
    ),
    min_size=1,
    max_size=24,
)


def _python_lww(rows):
    """Pure-Python keep-max reduce over the (v1, v2, rid) total order."""
    best = {}
    for rid, (k, v1, v2, payload) in enumerate(rows):
        cand = ((v1, v2, rid), payload)
        if k not in best or cand[0] > best[k][0]:
            best[k] = cand
    return {(k, o[0], o[1], o[2], p) for k, (o, p) in best.items()}


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_ROWS)
def test_lww_latest_matches_python_reduce_and_salting_is_transparent(spark, rows):
    from pipeline_spark.operators.lww import lww_latest

    # rid makes (v1, v2, rid) a total order — the documented precondition
    # (ties only between identical rows); without it max_by may pick
    # either of two equal-order rows and no oracle exists.
    data = [(k, v1, v2, rid, payload) for rid, (k, v1, v2, payload) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v1 int, v2 int, rid int, payload int")
    want = _python_lww(rows)
    got = {
        (r["k"], r["v1"], r["v2"], r["rid"], r["payload"])
        for r in lww_latest(df, "k", ["v1", "v2", "rid"]).collect()
    }
    assert got == want
    salted = {
        (r["k"], r["v1"], r["v2"], r["rid"], r["payload"])
        for r in lww_latest(df, "k", ["v1", "v2", "rid"], salt_buckets=4).collect()
    }
    assert salted == want
