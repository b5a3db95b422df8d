"""Text column expressions — tokenization, n-grams, normalization.

The reference's entire string-function surface is the single-space
WordCount tokenizer (/root/reference/Worker.cc:143-162). That tokenizer
is reproduced exactly here (`tokenize(mode="reference")`), including its
empty-token quirk (SURVEY.md Q1), plus the saner variants an actual
pipeline wants. Everything is a pure Column expression — JVM-side,
whole-stage-codegen friendly; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: matches the reference tokenizer domain: split on a single space char
REFERENCE_DELIMITER = " "


def tokens(text: Column | str, mode: str = "simple") -> Column:
    """Array of tokens for ``text``.

    Modes:
      * ``reference`` — split on the literal single space, KEEP empty
        tokens produced by consecutive spaces, like the C++ loop at
        /root/reference/Worker.cc:150-155 (SURVEY.md Q1 "faithful").
        Note the C++ also drops an empty *trailing* token; apply that
        filter at the call site when exact parity matters.
      * ``simple`` — split on runs of whitespace, drop empties (sane
        default; what every query here uses unless stated).
      * ``word`` — lowercase word characters only (punctuation-robust).
    """
    col = F.col(text) if isinstance(text, str) else text
    if mode == "reference":
        return F.split(col, REFERENCE_DELIMITER)
    if mode == "simple":
        return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))
    if mode == "word":
        return F.filter(
            F.split(F.lower(col), r"[^a-z0-9']+"), lambda t: t != F.lit("")
        )
    raise ValueError(f"unknown tokenize mode {mode!r}")


def explode_words(df, text_col: str = "text", mode: str = "simple", out: str = "word"):
    """DataFrame of one row per token (the reference's Map stage)."""
    return df.select(F.explode(tokens(text_col, mode)).alias(out))


def char_ngrams(text: Column | str, n: int) -> Column:
    """Array of character n-grams (shingles) of ``text``.

    Pure expression: sequence of start offsets → substring. Used by
    MinHash/SimHash shingling. Empty array when len(text) < n.
    """
    col = F.col(text) if isinstance(text, str) else text
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, so guard short strings.
    return F.when(
        F.length(col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(col) - F.lit(n - 1)),
            lambda i: col.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """Array of word n-grams from a token array (joined with ``sep``)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.concat_ws(sep, F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def first_char_bucket(word: Column | str, num_buckets: int) -> Column:
    """The reference's partitioner as a safe expression.

    Reference: ``(word[0]-'A') % num_reducer`` with C++ truncating ``%``
    (/root/reference/Worker.cc:164-172) — undefined behavior for first
    chars < 'A' (SURVEY.md Q2). Rebuilt with ``pmod`` so every input is
    in-range; identical on the reference's valid domain.
    """
    col = F.col(word) if isinstance(word, str) else word
    return F.pmod(F.ascii(F.substring(col, 1, 1)) - F.lit(65), F.lit(num_buckets))
