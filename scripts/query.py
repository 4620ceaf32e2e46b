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
    p.add_argument("--standard", default="bm25",
                   choices=["bm25", "tfidf", "qld"],
                   help="qld = Dirichlet query likelihood (exhaustive "
                        "view over the store, operators/qld.py)")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--exhaustive", action="store_true",
                   help="distributed exhaustive scorer instead of MaxScore")
    p.add_argument("--algo", default="maxscore",
                   choices=["maxscore", "wand", "taat", "bmw"],
                   help="traversal family for the serve dispatcher "
                        "(operators/maxscore.serve_topk): all four are "
                        "rank-identical; batches whose posting lists "
                        "exceed the driver budget fail over to the "
                        "distributed pruned path automatically")
    p.add_argument("--mode", default="exact",
                   choices=["exact", "fuzzy", "prefix"],
                   help="fuzzy = Levenshtein-1 expansion (fuzzy-OR); "
                        "prefix = wildcard prefix* retrieval; both serve "
                        "from a term-pruned view of the store")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from mircv_project_spark.operators.maxscore import serve_topk
    from mircv_project_spark.operators.topk import topk_from_blocks, trec_format
    from mircv_project_spark.session import get_spark
    from mircv_project_spark.sources.index_store import IndexReader

    spark = get_spark("mircv-query", master=args.master)
    reader = IndexReader.from_dir(spark, args.index)
    if args.exhaustive:  # distributed scan of the block store, no pruning
        topk_df = topk_from_blocks
    else:
        def topk_df(rdr, qs, std, k, conjunctive=False):
            return serve_topk(
                rdr, qs, std, k=k, conjunctive=conjunctive,
                family=args.algo,
            )

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

    if args.mode != "exact" or args.standard == "qld":
        out = _expanded_mode_topk(reader, queries, args)
    else:
        out = topk_df(reader, queries, args.standard, k=args.k,
                      conjunctive=conjunctive)
    for r in trec_format(out, args.standard).collect():
        print(f"{r['qid']} Q0 {r['docno']} {r['rank']} {r['score']} {r['standard']}")
    spark.stop()
    return 0


def _expanded_mode_topk(reader, queries, args):
    """Serve the expansion-based paths (fuzzy/prefix) and QLD from the
    persisted store: resolve the (expanded) term set FIRST, build a
    term-pruned flat view (blocks outside it never decode), then run
    the InvertedIndex-based operator on the view."""
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.fuzzy import fuzzy_topk, prefix_topk
    from mircv_project_spark.operators.qld import qld_topk
    from mircv_project_spark.operators.spell import deletion_keys_col
    from mircv_project_spark.operators.topk import query_terms

    spark = reader.lexicon.sparkSession
    if args.mode == "prefix":
        prefixes = sorted({text for _, text in queries})
        conds = [F.col("term").startswith(p) for p in prefixes]
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        terms = [r["term"] for r in
                 reader.lexicon.select("term").where(cond).collect()]
        view = reader.as_index_view(terms=terms)
        return prefix_topk(view, queries, args.standard, k=args.k)

    qt = sorted({t for _, t, _ in query_terms(queries, reader.parse)})
    if args.mode == "fuzzy":
        qdf = spark.createDataFrame([(t,) for t in qt], "qterm string")
        qkeys = qdf.select(
            F.explode(deletion_keys_col(F.col("qterm"))).alias("k"), "qterm"
        )
        lkeys = reader.lexicon.select(
            "term", F.explode(deletion_keys_col(F.col("term"))).alias("k")
        )
        terms = [
            r["term"]
            for r in lkeys.join(F.broadcast(qkeys), "k")
            .where(F.levenshtein("qterm", "term") <= 1)
            .select("term").distinct().collect()
        ]
        view = reader.as_index_view(terms=terms)
        return fuzzy_topk(view, queries, args.standard, k=args.k)

    view = reader.as_index_view(terms=qt)
    return qld_topk(view, queries, k=args.k)


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
