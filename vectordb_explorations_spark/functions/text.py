"""Shared text primitives used by multiple operators — ONE definition so
the tokenizer contract cannot silently fork between the BM25 channel, the
hashing-trick featurizer, and their DuckDB oracle twins."""

from __future__ import annotations

from pyspark.sql import functions as F

# DuckDB twin of the expression below (keep in lockstep):
#   list_filter(string_split(lower(text), ' '), t -> t <> '')
TOKENS_SQL = "list_filter(string_split(lower({col}), ' '), t -> t <> '')"


def whitespace_tokens(col: str = "text"):
    """Whitespace tokens of lower(col), empties dropped."""
    return F.filter(F.split(F.lower(F.col(col)), " "),
                    lambda t: t != F.lit(""))
