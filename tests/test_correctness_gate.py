"""Local replica of the driver's correctness gate: every queries() entry
with an oracle_sql() is run on Spark AND DuckDB and compared
order-insensitively (row count, columns, values)."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMALL, assert_frames_match, duck_run

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_SMALL)
    ddf = duck_run(ORACLES[name], SF_SMALL)
    assert_frames_match(sdf, ddf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", ["bm25_topk_parsed", "tfidf_topk_parsed"])
def test_parsed_mode_runs(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() > 0
