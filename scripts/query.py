#!/usr/bin/env python
"""Query CLI — the engine's ``query_processor.jar`` equivalent
(reference: ``queryProcessor/QueryProcessorMain.java``): batch TREC
evaluation over a
query TSV, single ad-hoc queries, or — with neither flag — the
reference's interactive stdin REPL (QueryProcessorMain.java:49-84);
'+'-prefixed queries run conjunctive (QueryProcessorMain.java:60-61).

    spark-submit --py-files dist/mircv_project_spark.zip scripts/query.py \
        --index /path/to/index --queries queries.tsv --standard bm25 -k 10

Output: TREC lines ``qid Q0 docno rank score STANDARD``
(QueryProcessorMain.java:112-118).  Batch mode sorts each query's
tokens alphabetically and forces disjunctive evaluation, matching the
reference's TREC path (QueryProcessorMain.java:105-108).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--queries", default=None, help="TSV qid\\ttext (TREC batch)")
    p.add_argument("--query", default=None, help="single query text ('+...' = conjunctive)")
    p.add_argument("--standard", default="bm25", choices=["bm25", "tfidf"])
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--exhaustive", action="store_true",
                   help="distributed exhaustive scorer instead of MaxScore")
    p.add_argument("--algo", default="maxscore", choices=["maxscore", "bmw"],
                   help="driver-side DAAT pruner: the reference's MaxScore "
                        "or Block-Max WAND (operators/bmw.py); rank-identical")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from mircv_project_spark.operators.bmw import bmw_topk_df
    from mircv_project_spark.operators.maxscore import maxscore_topk_df
    from mircv_project_spark.operators.topk import topk_from_blocks, trec_format
    from mircv_project_spark.session import get_spark
    from mircv_project_spark.sources.index_store import IndexReader

    spark = get_spark("mircv-query", master=args.master)
    reader = IndexReader.from_dir(spark, args.index)
    if args.exhaustive:  # distributed scan of the block store, no pruning
        topk_df = topk_from_blocks
    else:
        topk_df = bmw_topk_df if args.algo == "bmw" else maxscore_topk_df

    queries: list[tuple[str, str]] = []
    conjunctive = False
    if args.queries:
        with open(args.queries, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    qid, text = line.rstrip("\n").split("\t", 1)
                    queries.append((qid, text))
    elif args.query is not None:
        text = args.query
        if text.startswith("+"):
            conjunctive, text = True, text[1:]
        queries = [("0", text)]
    else:
        repl(reader, args.standard, args.k, stdin=sys.stdin, stdout=sys.stdout)
        spark.stop()
        return 0

    out = topk_df(reader, queries, args.standard, k=args.k,
                  conjunctive=conjunctive)
    for r in trec_format(out, args.standard).collect():
        print(f"{r['qid']} Q0 {r['docno']} {r['rank']} {r['score']} {r['standard']}")
    spark.stop()
    return 0


def repl(reader, standard: str, k: int, stdin=None, stdout=None) -> None:
    """Interactive stdin loop — the reference's primary UX
    (``QueryProcessorMain.java:49-84``): empty line -> reprompt, ``q``
    -> exit, leading ``+`` -> conjunctive; results print as
    ``docno\\tscore`` lines with the elapsed milliseconds, served by the
    same driver-side MaxScore DAAT + term cache per query."""
    import time

    from mircv_project_spark.operators.maxscore import maxscore_topk_df

    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    print('To perform conjuctive query, start it with "+" character\n', file=stdout)
    while True:
        print("Insert new query\n", file=stdout, flush=True)
        line = stdin.readline()
        if not line:  # EOF
            break
        query = line.rstrip("\n")
        if not query:
            continue
        if query == "q":
            break
        conj = query.strip().startswith("+")
        text = query.strip()[1:] if conj else query
        t0 = time.monotonic()
        rows = maxscore_topk_df(
            reader, [("0", text)], standard, k=k, conjunctive=conj
        ).collect()
        ms = int((time.monotonic() - t0) * 1000)
        if not rows:
            print("No results found! \n", file=stdout)
        else:
            for r in sorted(rows, key=lambda r: r["rank"]):
                print(f"{r['docno']}\t{r['score']}", file=stdout)
        print(f"({ms} milliseconds )", file=stdout, flush=True)


if __name__ == "__main__":
    sys.exit(main())
