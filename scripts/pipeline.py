#!/usr/bin/env python
"""Training-data pipeline CLI — the batch counterpart of scripts/
build_index.py and query.py for the data-curation half of the engine.

    spark-submit --py-files dist/mircv_project_spark.zip scripts/pipeline.py \
        clean  --input docs.parquet --output clean/      # verdict + kept docs
    ... pipeline.py dedup --input docs.parquet --output kept/
    ... pipeline.py pack  --input docs.parquet --output packed/
    ... pipeline.py stats --input docs.parquet            # one JSON line

Subcommands are thin wrappers over the library operators (the gate
entries pin their semantics):
  clean  — operators/pipeline.training_corpus: near-dup ∘ language ∘
           quality verdict per doc; writes the verdict table AND the
           kept documents.
  dedup  — minhash_lsh_pairs → dedup_keep_list; writes surviving docs.
  pack   — operators/curation.pack_sequences: GPT-style concat-and-
           chunk into fixed windows.
  stats  — corpus profile (docs, token/char sums, per-source counts)
           as one JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(master: str | None):
    from mircv_project_spark.session import get_spark

    return get_spark(master=master or "local[*]")


def cmd_clean(args) -> int:
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.pipeline import training_corpus

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    verdict = training_corpus(docs)
    verdict.write.mode("overwrite").parquet(f"{args.output}/verdict")
    kept = docs.join(
        verdict.where("kept").select(F.col("id").alias("doc_id")), "doc_id"
    )
    kept.write.mode("overwrite").parquet(f"{args.output}/documents")
    n_in, n_out = docs.count(), kept.count()
    print(json.dumps({"input_docs": n_in, "kept_docs": n_out}))
    return 0


def cmd_dedup(args) -> int:
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.dedup import (
        dedup_keep_list,
        minhash_lsh_pairs,
    )

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    pairs = minhash_lsh_pairs(docs, threshold=args.threshold)
    keep = dedup_keep_list(docs, pairs)
    kept = docs.join(
        keep.where("keep").select(F.col("id").alias("doc_id")), "doc_id"
    )
    kept.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"input_docs": docs.count(), "kept_docs": kept.count()}))
    return 0


def cmd_pack(args) -> int:
    from mircv_project_spark.operators.curation import pack_sequences

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    packed = pack_sequences(docs, window=args.window)
    packed.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": packed.count(), "window": args.window}))
    return 0


def cmd_stats(args) -> int:
    from pyspark.sql import functions as F

    from mircv_project_spark.functions.textnorm import tokens_col

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    base = docs.select(
        "source",
        F.col("n_chars").cast("long").alias("nc"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("nt"),
    )
    row = base.agg(
        F.count("*"), F.sum("nc"), F.sum("nt")
    ).collect()[0]
    per_src = {
        r["source"]: r["n"]
        for r in base.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    print(
        json.dumps(
            {
                "docs": int(row[0]),
                "chars": int(row[1] or 0),
                "tokens": int(row[2] or 0),
                "by_source": dict(sorted(per_src.items())),
            }
        )
    )
    return 0


def cmd_chunks(args) -> int:
    from mircv_project_spark.operators.curation import doc_chunks

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    out = doc_chunks(docs, window=args.window, stride=args.stride)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"chunks": out.count()}))
    return 0


def cmd_sft(args) -> int:
    from mircv_project_spark.operators.dialogue import instruction_pairs

    spark = _spark(args.master)
    t = spark.read.parquet(args.input)
    out = instruction_pairs(t)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"pairs": out.count()}))
    return 0


def cmd_fertility(args) -> int:
    from mircv_project_spark.operators.textstats import token_fertility

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    rows = token_fertility(docs).collect()
    print(
        json.dumps(
            {
                r["source"]: {
                    "docs": r["n_docs"],
                    "fertility": r["fert_micro"] / 1e6,
                }
                for r in sorted(rows, key=lambda r: r["source"])
            }
        )
    )
    return 0


def cmd_span_corruption(args) -> int:
    from mircv_project_spark.operators.curation import span_corruption

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    out = span_corruption(docs)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"spans": out.count()}))
    return 0


def cmd_preference_pairs(args) -> int:
    from mircv_project_spark.operators.dialogue import preference_pairs

    spark = _spark(args.master)
    t = spark.read.parquet(args.input)
    out = preference_pairs(t)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"pairs": out.count()}))
    return 0


def cmd_stratified_sample(args) -> int:
    from mircv_project_spark.operators.curation import stratified_sample

    spark = _spark(args.master)
    docs = spark.read.parquet(args.input)
    out = stratified_sample(docs, k=args.k)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"sampled": out.count()}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("clean")
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.set_defaults(fn=cmd_clean)

    d = sub.add_parser("dedup")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--threshold", type=float, default=0.8)
    d.set_defaults(fn=cmd_dedup)

    k = sub.add_parser("pack")
    k.add_argument("--input", required=True)
    k.add_argument("--output", required=True)
    k.add_argument("--window", type=int, default=256)
    k.set_defaults(fn=cmd_pack)

    s = sub.add_parser("stats")
    s.add_argument("--input", required=True)
    s.set_defaults(fn=cmd_stats)

    ch = sub.add_parser("chunks")
    ch.add_argument("--input", required=True)
    ch.add_argument("--output", required=True)
    ch.add_argument("--window", type=int, default=32)
    ch.add_argument("--stride", type=int, default=16)
    ch.set_defaults(fn=cmd_chunks)

    sf = sub.add_parser("sft")
    sf.add_argument("--input", required=True,
                    help="transcript parquet (conv_id, turn_idx, role, text)")
    sf.add_argument("--output", required=True)
    sf.set_defaults(fn=cmd_sft)

    fe = sub.add_parser("fertility")
    fe.add_argument("--input", required=True)
    fe.set_defaults(fn=cmd_fertility)

    sc = sub.add_parser("span-corruption")
    sc.add_argument("--input", required=True)
    sc.add_argument("--output", required=True)
    sc.set_defaults(fn=cmd_span_corruption)

    pp = sub.add_parser("preference-pairs")
    pp.add_argument("--input", required=True,
                    help="transcript parquet (conv_id, turn_idx, role, text)")
    pp.add_argument("--output", required=True)
    pp.set_defaults(fn=cmd_preference_pairs)

    ss = sub.add_parser("stratified-sample")
    ss.add_argument("--input", required=True)
    ss.add_argument("--output", required=True)
    ss.add_argument("--k", type=int, default=20)
    ss.set_defaults(fn=cmd_stratified_sample)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
