"""Guards for the two tokenizer rules the DuckDB oracle omits (T6
run-collapse needs regex backreferences; Java trim of control chars):
both must be NO-OPS on the driver's documents corpus at every SF, or
the oracle SQL stops being exact (see mircv_project_spark/oracle.py)."""

import re

import duckdb
import pytest

from mircv_project_spark.functions.tokenizer import tokenize

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
RUN3 = re.compile(r"([^0-9])\1\1")
CTRL = re.compile(r"[\x00-\x1f]")


@pytest.mark.parametrize("sf_dir", SFS)
def test_corpus_free_of_t6_and_trim_cases(sf_dir):
    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    assert rows
    for (text,) in rows:
        assert not RUN3.search(text), f"3+ run in corpus: {text[:80]!r}"
        assert not CTRL.search(text), f"control char in corpus: {text[:80]!r}"


def test_query_set_free_of_t6_and_trim_cases():
    from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET

    for _, text in QUERY_SET + CONJ_QUERY_SET:
        assert not RUN3.search(text)
        assert not CTRL.search(text)
        # and the full pipeline agrees with the SQL-expressible subset:
        # lower+split+filters only (no collapse/trim effect)
        toks = tokenize(text, parse=False)
        naive = [
            t
            for t in re.sub(r"[!-/:-@\[-`{-~]", " ", re.sub("<[^>]+>", " ", text))
            .lower()
            .split(" ")
            if t and t.isascii() and len(t) < 64
        ]
        assert toks == naive


@pytest.mark.parametrize("sf_dir", SFS)
def test_parsed_fixture_covers_corpus(sf_dir):
    """The parsed-mode oracle joins tests/fixtures/parsed_tokens.parquet
    on md5(text); every non-blank corpus text at every SF must have its
    parsed tokens in the fixture (texts whose parse is EMPTY are allowed
    to be absent — the LEFT JOIN restates them as doc_len 0), and the
    fixture rows must equal what the live tokenizer produces.
    Regenerate with scripts/gen_parsed_fixture.py on any drift."""
    import hashlib
    import os
    from collections import Counter

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "parsed_tokens.parquet"
    )
    fx = {}
    for h, term, tf in duckdb.sql(
        f"SELECT text_md5, term, tf FROM read_parquet('{fixture}')"
    ).fetchall():
        fx.setdefault(h, {})[term] = tf
    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE text IS NOT NULL AND trim(text) <> ''"
    ).fetchall()
    assert rows
    for (text,) in rows:
        want = dict(Counter(tokenize(text, parse=True)))
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        got = fx.get(h, {})
        assert got == want, f"fixture drift for text {text[:60]!r}"
