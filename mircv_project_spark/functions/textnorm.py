"""JVM-side (Catalyst) text normalization for the pipeline operators.

The dedup / text-analysis / fingerprint operators normalize text with
the T1-T5 subset of the reference tokenizer (HTML strip, punct strip,
lowercase, single-space split, drop empty / >=64-byte / non-ASCII
tokens) expressed as pure column expressions — whole-stage-codegen'd,
no Python in the hot path.  The same expression is restated in DuckDB
SQL (oracle.py) for the correctness gate.

T6 (run-collapse) and Java trim are excluded here by design: these
operators define their own normalization (they are new capabilities,
not reference parity), and the SQL-expressible subset keeps every one
of them oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
NON_ASCII = r"[^\x00-\x7F]"


def tokens_col(text: Column) -> Column:
    """text -> array<string> of normalized tokens (T1-T5, JVM-side)."""
    cleaned = F.lower(
        F.regexp_replace(
            F.regexp_replace(text, "<[^>]+>", " "), PUNCT_CLASS, " "
        )
    )
    return F.filter(
        F.split(cleaned, " "),
        lambda t: (t != "")
        & (F.length(t) < 64)
        & ~t.rlike(NON_ASCII),
    )


def grams_col(tokens: Column, n: int) -> Column:
    """tokens -> array<string> of word n-grams IN ORDER, duplicates
    kept (the occurrence stream; `shingles_col` is its distinct set).
    Docs with fewer than n tokens produce an empty array.

    The short-doc branch must be explicit: sequence(1, 0) DESCENDS
    ([1, 0]), it is not empty, and element_at past the array end is an
    ANSI error — so the gram expression only ever evaluates when
    size(tokens) >= n."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j).cast("int")) for j in range(n)]
        ),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(tokens) >= n, grams).otherwise(empty)


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """tokens -> array<string> of distinct word n-gram shingles.
    Docs with fewer than n tokens produce no shingles."""
    return F.array_distinct(grams_col(tokens, n))


def hash60_col(s: Column) -> Column:
    """Deterministic 60-bit integer hash of a string, identically
    computable in DuckDB: first 15 hex chars of md5 parsed as int.
    (Spark conv() and DuckDB '0x...'::UBIGINT agree on 60 bits, safely
    inside BIGINT range.)"""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
