"""Text-analysis operators (JVM-side Column expressions; no Python UDFs).

Every function returns a Column so Catalyst folds it into whole-stage
codegen; each has an ANSI/DuckDB-SQL twin in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]

# marker words per language for the n-gram/marker language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "los", "es", "una"],
}


def tokens(col) -> Column:
    """Whitespace tokens of trimmed text; empty text -> empty array."""
    c = F.trim(col)
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+")
    )


def token_count(col) -> Column:
    return F.size(tokens(col)).alias("token_count")


def char_count(col) -> Column:
    return F.length(col)


def punct_ratio(col) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct / total)


def stopword_ratio(col) -> Column:
    toks = tokens(F.lower(col))
    n = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(n == 0, F.lit(0.0)).otherwise(stop / n)


def avg_token_len(col) -> Column:
    toks = tokens(col)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n)


def quality_score(col) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards stopword
    presence and moderate token length, penalizes punctuation soup.
    score = clamp(0.4*min(sw*5,1) + 0.4*min(ntok/100,1) + 0.2*(1-punct*4), 0, 1)"""
    sw = stopword_ratio(col)
    ntok = F.size(tokens(col)).cast("double")
    pr = punct_ratio(col)
    raw = (
        0.4 * F.least(sw * 5.0, F.lit(1.0))
        + 0.4 * F.least(ntok / 100.0, F.lit(1.0))
        + 0.2 * (1.0 - F.least(pr * 4.0, F.lit(1.0)))
    )
    return F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0))


def lang_score(col, lang: str) -> Column:
    toks = tokens(F.lower(col))
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(col) -> Column:
    """Marker-word language ID: argmax of per-language marker counts,
    ties resolved in en > de > fr > es order; all-zero -> 'und'."""
    scores = {lang: lang_score(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of lowercased whitespace-normalized text
    (identical to DuckDB md5 on the same normalization)."""
    norm = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(norm)
