#!/usr/bin/env python
"""Index-build CLI — the engine's ``indexer.jar`` equivalent
(reference: ``indexing/IndexingMain.java``; same switches: parse flag,
compression codec).

Run via spark-submit with the packaged library:

    scripts/package.sh
    spark-submit --py-files dist/mircv_project_spark.zip \
        scripts/build_index.py \
        --input /path/to/transcripts_parquet --output /path/to/index \
        --workdir /path/to/checkpoints --parse --codec vb

``--input generate:N`` synthesizes N deterministic transcript turns
(benchmarks / smoke runs; no external data).  The build is staged and
resumable: re-running with the same --workdir continues after the last
completed stage (lineage in <workdir>/lineage.jsonl).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# plain-python convenience: with spark-submit --py-files the package is
# already importable; standalone runs get the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="transcripts parquet dir, or generate:N")
    p.add_argument("--output", required=True, help="index output dir")
    p.add_argument("--workdir", default=None,
                   help="stage-checkpoint dir (enables resumable build)")
    p.add_argument("--parse", action="store_true",
                   help="stopword removal + Porter stemming (reference parse=true)")
    p.add_argument(
        "--codec", default="vb", choices=["vb", "gamma", "ef", "raw"],
        help="posting docId codec: variable-byte d-gaps (default), "
        "Elias-gamma d-gaps, reference-compatible Elias-Fano, or raw",
    )
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args(argv)

    from mircv_project_spark.operators.index_build import (
        build_index,
        filter_indexable,
        staged_build,
        write_index,
    )
    from mircv_project_spark.session import get_spark
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids,
        generate_transcripts,
    )

    spark = get_spark("mircv-index-build", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)
    if args.input.startswith("generate:"):
        t = generate_transcripts(spark, int(args.input.split(":", 1)[1]))
    else:
        t = spark.read.parquet(args.input)
    t = assign_doc_ids(filter_indexable(t))

    if args.workdir:
        idx = staged_build(spark, t, args.workdir, parse=args.parse, codec=args.codec)
    else:
        idx = build_index(spark, t, parse=args.parse, codec=args.codec)
    write_index(idx, args.output)
    print(json.dumps({
        "n_docs": idx.n_docs,
        "sum_doc_len": idx.sum_doc_len,
        "n_terms": idx.lexicon.count(),
        "parse": idx.parse,
        "codec": idx.codec,
        "metrics": idx.metrics,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
