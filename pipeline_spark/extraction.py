"""HTML → text extraction: the per-row invariant stage.

Semantics follow the reference's body normalization (reference
``af/fastpath/fastpath/normalize.py:173-189`` — ``normalize_str`` /
``normalize_body``: bytes are decoded as UTF-8 with ``backslashreplace``
and NUL bytes stripped), extended with the tag-strip / entity-unescape /
whitespace-fold steps a web-text pipeline needs.

Two implementations with byte-identical output:

* :func:`extract_text_py` — the pure-Python row-wise reference. Used by the
  oracle and the golden fixture; NEVER used in a Spark plan.
* :func:`extract_text_udf` — an Arrow-vectorized ``pandas_udf``. The decode
  step is a per-element map over the Arrow batch (Python has no vectorized
  ``backslashreplace`` decoder); every regex stage after it runs through
  pandas' vectorized C string kernels. One Arrow round-trip per 10k-row
  batch, no per-row serialization.

Byte-identity holds by construction: both paths share the same compiled
regex pipeline (:data:`_PIPELINE`), applied in the same order, and the
golden-fixture test (tests/test_extraction.py) pins ~200 curated edge cases
(invalid UTF-8, embedded NULs, empty body, >1 MiB body).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Entity map kept deliberately small and explicit: the invariant is "this
# exact function", not "whatever html.unescape does in this stdlib version".
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))

# Ordered regex pipeline applied after decode. Each stage is (pattern,
# replacement). Stages are fused where order-independent so each row is
# copied as few times as possible (every pass reallocates the string):
# script/style blocks, comments and bare tags are one alternation — at any
# '<' the block branches are tried before the generic tag, which is
# exactly the sequential-pass semantics.
_PIPELINE: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"\x00"), ""),  # NUL strip — normalize.py:177 semantics
    (re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->|<[^>]*>"), " "),
    (re.compile(r"[ \t\r\f\v]*\n[ \t\r\f\v]*"), "\n"),  # fold blanks around newlines
    (re.compile(r"[ \t\f\v]{2,}"), " "),  # collapse runs of spaces/tabs
    (re.compile(r"\n{3,}"), "\n\n"),  # cap blank lines
]


def _entity_sub(s: str) -> str:
    return _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], s)


def extract_text_py(html: bytes | None) -> str | None:
    """Pure-Python reference extraction (row-wise; oracle/golden only)."""
    if html is None:
        return None
    s = html.decode("utf-8", "backslashreplace")
    for pat, repl in _PIPELINE:
        s = pat.sub(repl, s)
    s = _entity_sub(s)
    return s.strip()


def _extract_series(html: pd.Series) -> pd.Series:
    # Decode: per-element (no vectorized backslashreplace exists) but inside
    # one Arrow batch — no per-row Python UDF serialization.
    s = html.map(lambda b: b.decode("utf-8", "backslashreplace") if b is not None else None)
    for pat, repl in _PIPELINE:
        s = s.str.replace(pat, repl, regex=True)
    # NaN (pandas' null marker after .str ops) must stay null, not become "nan"
    s = s.map(lambda x: _entity_sub(x) if isinstance(x, str) else None)
    return s.str.strip()


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized extraction UDF: ``binary html → string text``."""
    return _extract_series(html)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text"):
    """Attach the extracted-text column to a DataFrame of pages."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
