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
    """BPE-ish token count via the regex tokenizer (JVM regexp, no UDF)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-scoring features: lengths, ratios, flags."""
    t = F.col(text_col)
    w = words(t)
    n_words = F.size(w)
    n_chars = F.length(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    sw_hits = sum((stopword_hits(t, lang) for lang in STOPWORDS), F.lit(0))
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_measured", n_chars)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x)) / n_words).otherwise(F.lit(None).cast("double")),
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
