"""Text analysis building blocks: tokenize, shingle, stopwords, quality.

Every helper has a Spark form (Column expressions — codegen, no UDF) and a
DuckDB-SQL twin so the text operators stay oracle-checkable. The Spark and
SQL forms are maintained together; keep them in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language-ID
# heuristic. Deliberately small and frozen: the operator's shape (set
# overlap scoring) is the point, not lexical completeness.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "los", "por"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "ein"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "que", "pour"),
}

TOKEN_SPLIT_RE = "[^a-z0-9]+"
# BPE-ish surface tokenization: word pieces or single non-space symbols.
BPE_TOKEN_RE = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens (array<string>), empties removed."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        f" x -> x <> '')"
    )


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-word shingles as space-joined strings (array<string>).

    Documents shorter than n tokens produce an empty array.
    """
    return F.when(
        F.size(tokens_col) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
            lambda i: F.array_join(F.slice(tokens_col, i, n), " "),
        )
    )


def word_shingles_sql(tokens_expr: str, n: int = 3) -> str:
    return (
        f"CASE WHEN len({tokens_expr}) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len({tokens_expr}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' ')) END"
    )


def stopword_count(tokens_col: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(
        F.filter(tokens_col, lambda t: t.isin(*words))
    )


def stopword_count_sql(tokens_expr: str, lang: str) -> str:
    lit = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter({tokens_expr}, x -> list_contains([{lit}], x)))"
    )
