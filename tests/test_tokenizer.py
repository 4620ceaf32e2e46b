"""Tokenizer parity tests.

Golden fixtures (tests/fixtures/tokgold_*.txt) were produced by running
the reference engine's own ``Parser.getTokens`` (via the bundled class in
/root/reference/indexer.jar — harness source in fixtures/TokGold.java.txt)
over 737 texts covering every rule T1-T8, including the full sf0.01
documents corpus.  Our tokenizer must match token-for-token.
"""

import pathlib

import pandas as pd
import pytest

from mircv_project_spark.functions.porter import stem
from mircv_project_spark.functions.tokenizer import (
    doc_terms_series,
    tokenize,
    tokenize_series,
)

FIX = pathlib.Path(__file__).parent / "fixtures"
SEP = chr(1)  # separator used by the TokGold harness


def _load_golden(parse: bool):
    texts = [
        line.rstrip("\n").replace("\\n", "\n").replace("\\t", "\t")
        for line in (FIX / "toktexts.txt").open(encoding="utf-8")
    ]
    name = "tokgold_parse.txt" if parse else "tokgold_noparse.txt"
    golden = [
        line.rstrip("\n").split(SEP) if line.rstrip("\n") else []
        for line in (FIX / name).open(encoding="utf-8")
    ]
    assert len(texts) == len(golden)
    return texts, golden


@pytest.mark.parametrize("parse", [False, True])
def test_scalar_matches_reference_golden(parse):
    texts, golden = _load_golden(parse)
    for text, want in zip(texts, golden):
        assert tokenize(text, parse) == want, repr(text)


@pytest.mark.parametrize("parse", [False, True])
def test_vectorized_matches_scalar(parse):
    texts, _ = _load_golden(parse)
    got = tokenize_series(pd.Series(texts), parse)
    for i, text in enumerate(texts):
        assert got.iloc[i] == tokenize(text, parse), repr(text)


@pytest.mark.parametrize("parse", [False, True])
def test_doc_terms_matches_scalar_counts(parse):
    texts, _ = _load_golden(parse)
    got = doc_terms_series(pd.Series(texts), parse)
    for i, text in enumerate(texts):
        toks = tokenize(text, parse)
        want = {}
        for t in toks:
            want[t] = want.get(t, 0) + 1
        rec = {d["term"]: d["tf"] for d in got.iloc[i]}
        assert rec == want, repr(text)
        # doc_len (reference InvertedIndex.java:59-63) == sum of tfs
        assert sum(rec.values()) == len(toks)


def test_porter_golden():
    """4,521 golden (word, stem) pairs from the reference's bundled
    ca.rmen PorterStemmer (fixtures/porter_golden.tsv)."""
    n = 0
    for line in (FIX / "porter_golden.tsv").open(encoding="utf-8"):
        word, want = line.rstrip("\n").split("\t")
        assert stem(word) == want, word
        n += 1
    assert n == 4521


def test_edge_semantics():
    # T6: digits never collapsed, letters capped at 2, len<=2 untouched
    assert tokenize("cooool 1000 aaa111aaa zz", False) == ["cool", "1000", "aa111aa", "zz"]
    # T4: 63-byte token kept (then run-collapsed by T6), 64-byte dropped
    # (length check precedes collapse: a 64-byte run is dropped, not shortened)
    assert tokenize("y" * 63 + " " + "z" * 64, False) == ["yy"]
    assert tokenize("xy" * 31 + "x", False) == ["xy" * 31 + "x"]  # 63 chars, no runs
    # T5: non-ASCII dropped entirely (not transliterated)
    assert tokenize("café ok", False) == ["ok"]
    # T3: split on single space only; empties from runs of spaces dropped
    assert tokenize("a  b", False) == ["a", "b"]
    # empty / None
    assert tokenize("", False) == []
    assert tokenize(None, False) == []
    # T7 before T8: stopword check on unstemmed token
    # "this" is a stopword -> removed; "running" stems to "run"
    assert tokenize("this running", True) == ["run"]
