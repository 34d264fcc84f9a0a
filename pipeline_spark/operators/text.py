"""Text analysis operators for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting.

Everything here is pure Spark column expressions (JVM-side, whole-stage
codegen): no Python in the hot path. Each operator has a DuckDB-expressible
definition so the driver's oracle can check it exactly (the same discipline
as the reference's golden-value unit tests, tests/test_unit.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword dictionaries — the n-gram-heuristic analog.
# Deliberately small and explicit so SQL oracles can mirror them verbatim.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une"],
    "es": ["el", "la", "de", "que", "los", "es", "un", "una"],
}

# BPE-ish tokenizer regex: words / numbers / single punctuation marks
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

import string as _string

#: every char of the [A-Za-z0-9\s] class, for translate()-based counting
#: (Java \s = [ \t\n\x0B\f\r])
_ALNUM_WS = _string.ascii_letters + _string.digits + " \t\n\x0b\x0c\r"


def words(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def stopword_hits(text: Column, lang: str) -> Column:
    sw = STOPWORDS[lang]
    return F.size(F.filter(words(text), lambda w: w.isin(*sw)))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language whose stopword dictionary hits
    the most tokens; ties broken by fixed precedence en>de>fr>es; no hits →
    'zz' (the unknown sentinel, reference probe_cc 'ZZ' core.py:1585)."""
    scores = {lang: stopword_hits(text, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("zz")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def token_count(text: Column) -> Column:
    """BPE-ish token count via the regex tokenizer (JVM regexp, no UDF).
    ``regexp_count`` (r6) counts the same non-overlapping matches as
    ``size(regexp_extract_all(...))`` without materializing the match
    array (one allocation-free scan instead of array-of-strings + size)."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-scoring features: lengths, ratios, flags.

    r6: the word-array pipeline (``split`` → ``filter`` → per-element
    higher-order lambdas, interpreted per word and re-evaluated per
    consumer expression) is replaced by single-pass ``regexp_count``
    scans with EXACTLY equal values:

    * ``n_words``: non-empty tokens of ``split(lower(t), '\\s+')`` are
      precisely the ``\\S+`` runs of ``t`` — counting runs needs no array;
    * ``avg_word_len`` numerator: the summed length of those lowercased
      tokens equals the non-whitespace char count —
      ``length(translate(t, ' \\t\\n\\x0b\\x0c\\r', ''))``, a regex-free
      char map over exactly Java's ``\\s`` set (``lower`` is length-
      preserving on this corpus — generator emits ASCII; the DuckDB
      oracle twin pins equality at the checked SFs);
    * ``n_punct`` / ``n_tokens``: match COUNTS, not match arrays.

    ``stopword_ratio`` keeps the exact word-array definition (its token
    identity can't be a bare count); Catalyst prunes it for consumers
    that don't select it."""
    t = F.col(text_col)
    n_words = F.regexp_count(t, F.lit(r"\S+"))
    n_chars = F.length(t)
    # deleting every [A-Za-z0-9\s] char leaves exactly the punct chars —
    # the count of '[^A-Za-z0-9\s]' matches as one regex-free char map
    n_punct = F.length(F.translate(t, _ALNUM_WS, ""))
    sum_word_len = F.length(F.translate(t, " \t\n\x0b\x0c\r", ""))
    sw_hits = sum((stopword_hits(t, lang) for lang in STOPWORDS), F.lit(0))
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_measured", n_chars)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, sum_word_len / n_words).otherwise(F.lit(None).cast("double")),
        )
        .withColumn("punct_ratio", F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)))
        .withColumn("stopword_ratio", F.when(n_words > 0, sw_hits / n_words).otherwise(F.lit(0.0)))
        .withColumn("n_tokens", token_count(t))
    )


def quality_flag(df: DataFrame) -> DataFrame:
    """Keep/drop quality gate over the features (a data-quality discard
    filter in the spirit of reference core.py:1580-1593)."""
    keep = (
        (F.col("n_words") >= 5)
        & (F.col("avg_word_len") >= 2.0)
        & (F.col("avg_word_len") <= 14.0)
        & (F.col("punct_ratio") <= 0.3)
    )
    return df.withColumn("quality_keep", keep)


def doc_fingerprint(text: Column) -> Column:
    """Rolling polynomial fingerprint over whitespace tokens:
    fold(h = (h*31 + len(tok)*17 + ascii(first_char)) mod 2^31).
    Pure integer arithmetic → identical in Spark and DuckDB."""
    return F.aggregate(
        words(text),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(acc * 31 + F.length(tok) * 17 + F.ascii(F.substring(tok, 1, 1)), F.lit(2147483647)),
    )


# ------------------------------------------------------- SQL oracle mirrors

def stopword_sql(col: str, lang: str) -> str:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(list_filter(string_split(regexp_replace(lower({col}), '\\s+', ' ', 'g'), ' '), "
        f"w -> w <> ''), w -> w IN ({sw})))"
    )


def lang_id_sql(col: str) -> str:
    scores = {lang: stopword_sql(col, lang) for lang in STOPWORDS}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    expr = "'zz'"
    for lang in reversed(list(STOPWORDS)):
        expr = f"CASE WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return expr
