"""Text-analysis functions for the documents pipeline (SURVEY.md §2.4).

All pure Spark column expressions (codegen'd, no Python): tokenization,
shingling, language-marker scoring, fingerprinting. These feed the
LLM-data-pipeline queries in queries/text.py and queries/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword-marker lists for the n-gram-free language-ID heuristic: the
# guess is argmax over marker-hit counts with deterministic precedence
# (en > de > es > fr > unknown on ties).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit"),
    "es": ("el", "la", "de", "que", "los", "una", "con"),
    "fr": ("le", "la", "les", "et", "un", "une", "dans"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "and", "of", "to", "in", "is", "a", "for", "on", "with",
)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda t: t != F.lit(""))


def tokens_expr(col: str = "text") -> str:
    """Spark-SQL string form of :func:`tokens` — for selectExpr-built
    plans (each Python-side lambda HOF costs several py4j round trips
    of plan-build latency; one parsed SQL string costs none)."""
    return f"filter(split({col}, ' '), t -> t != '')"


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are in the marker set -> BIGINT."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def marker_hits_expr(toks: str, markers: tuple[str, ...]) -> str:
    """Spark-SQL string form of :func:`marker_hits` (t IN (...) is
    equivalent to array_contains for the non-null string tokens the
    tokenizer emits). Marker strings are escaped — contractions like
    "don't" are routine in stopword lists, and the Column form this
    mirrors accepted any string via F.lit. Quotes are escaped by
    DOUBLING ('' ) rather than backslashing: '' parses identically
    whether spark.sql.parser.escapedStringLiterals is false (the
    default) or true (the legacy mode, under which \\' would be read
    as a literal backslash + unterminated string). Backslashes are
    still doubled for the default parser; a marker containing a
    literal backslash (none of ours do) would read back doubled under
    the legacy conf — parseable, just a different value."""
    def q(m: str) -> str:
        return "'" + m.replace("\\", "\\\\").replace("'", "''") + "'"

    lst = ", ".join(q(m) for m in markers)
    return f"CAST(size(filter({toks}, t -> t IN ({lst}))) AS BIGINT)"


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles of a token array (space-joined strings).

    Built by zipping n shifted slices of the array pairwise — every
    lambda touches only its own elements. (An earlier index-based
    formulation called ``element_at(toks, i+j)`` inside the lambda,
    which re-evaluates the full ``toks`` expression subtree per element:
    passing ``tokens(text)`` there made shingling O(len^2) string work
    per document. Callers should still pass a materialized column, not
    an expression, so ``toks`` is a cheap attribute reference.)
    """
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    out = F.slice(toks, 1, k)
    for j in range(1, n):
        shifted = F.slice(toks, 1 + j, k)
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return out


def fingerprint(text: Column | str) -> Column:
    """Canonical-form document fingerprint: md5 of lower(trimmed text)
    with whitespace collapsed. Identical hex in Spark and DuckDB."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))
