#!/usr/bin/env python
"""Generate the parsed-token fixture parquet that gives the parsed-mode
retrieval gates (bm25_topk_parsed / tfidf_topk_parsed) a full DuckDB
value-hash oracle.

DuckDB's Porter ``stem()`` lives in the fts extension, which cannot be
downloaded in this sandbox — so the oracle cannot re-derive stopword+
Porter tokens in SQL.  Instead we materialize the parsed tokens ONCE
here with the engine's own scalar tokenizer (functions/tokenizer.py,
whose semantics are pinned byte-for-byte against the reference jars'
bundled classes by tests/fixtures/tokgold_* / porter_golden), keyed by
md5(text).  The oracle SQL then joins the live ``documents`` view to
this fixture on md5(text) — sf-agnostic, because parsed tokens are a
pure function of the text and the fixture covers every text at every
driver SF (sf0.001 / sf0.01 / sf0.1).

Run from the repo root:  python scripts/gen_parsed_fixture.py
Writes tests/fixtures/parsed_tokens.parquet (committed).
"""

from __future__ import annotations

import hashlib
import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mircv_project_spark.functions.tokenizer import tokenize  # noqa: E402

SF_DIRS = [f"/root/testdata/sf{sf}" for sf in ("0.001", "0.01", "0.1")]
OUT = os.path.join(REPO, "tests", "fixtures", "parsed_tokens.parquet")


def main() -> None:
    import duckdb

    con = duckdb.connect()
    texts: set[str] = set()
    for d in SF_DIRS:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        for (t,) in con.sql(
            f"SELECT DISTINCT text FROM read_parquet('{p}') WHERE text IS NOT NULL"
        ).fetchall():
            texts.add(t)

    md5s, terms, tfs = [], [], []
    for text in sorted(texts):  # deterministic row order
        h = hashlib.md5(text.encode("utf-8")).hexdigest()
        for term, tf in sorted(Counter(tokenize(text, parse=True)).items()):
            md5s.append(h)
            terms.append(term)
            tfs.append(tf)

    table = pa.table(
        {
            "text_md5": pa.array(md5s, pa.string()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows over {len(texts)} texts")


if __name__ == "__main__":
    main()
