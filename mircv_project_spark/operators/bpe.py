"""Distributed BPE tokenizer training (byte-pair encoding merge
learning, Sennrich et al. 2016) — the vocabulary-induction step a
training-data pipeline runs BEFORE it can token-count anything.

Classic BPE training is presented as an in-memory sequential algorithm;
the distributed shape here is the one the published trainers
(subword-nmt, SentencePiece's BPE mode) already exploit:

1. **Word dedup first.**  Merges depend only on the multiset of words,
   so the corpus collapses to (distinct word, occurrence count) — at
   100 TB that's the difference between petabyte-scale token streams
   and a vocabulary table (one tokenizer pass + one map-side-combined
   groupBy, after which NO step ever touches the corpus again).
2. **Each merge step is one scan of the vocabulary table**: adjacent
   symbol-pair occurrences explode map-side, a pair-keyed
   map-side-combined agg produces counts, and the argmax — ONE row —
   is collected to the driver (the same bounded-driver-state pattern
   as k-means centroids, clustering.py).  Applying the merge is a
   map-only string projection; no shuffle.
3. The n_merges iterations are the irreducible sequential core of BPE
   (merge k+1's counts depend on merge k) — the per-step work is what
   parallelizes, exactly as in the reference trainers.

Symbol-sequence representation (pinned on BOTH engines — the oracle
restates it verbatim; change both or neither): a word's symbol state is
a SINGLE-SPACE-joined string, initially its characters
(``trim(regexp_replace(word, '(.)', '$1 '))``).  Applying merge (a, b)
uses the doubled-space trick so plain left-to-right non-overlapping
literal ``replace`` — identical semantics in Spark and DuckDB — is
exactly BPE's greedy left-to-right merge:

- double the separators, pad one space each side:
  ``' ' || replace(sym, ' ', '  ') || ' '``
- ``replace(padded, ' a  b ', ' ab ')``: every occurrence keeps its
  leading separator because a match only consumes ONE of the two
  separator spaces ("a a a" -> "aa a", the greedy rule; token-boundary
  false positives are impossible because in-token characters are never
  space-adjacent)
- re-canonicalize: ``trim(regexp_replace(replaced, ' +', ' '))``

Normalized tokens never contain spaces, so the encoding is unambiguous
and the pair string "a b" splits back losslessly.

Pair counts weight every adjacent POSITION (within-word repeats
included) by the word's corpus count; the winning pair is
(count desc, pair asc) — a deterministic total order, so the whole
merge sequence is engine-independent and the gate can hash it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.textnorm import grams_col

BPE_MERGES = 8


def chars_sym_col(word: Column) -> Column:
    """word -> initial symbol state: characters joined by single
    spaces."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def merge_sym_col(sym: Column, a: str, b: str) -> Column:
    """Apply merge (a, b) to a symbol-state string — greedy
    left-to-right non-overlapping, via the doubled-space literal
    replace (module docstring)."""
    doubled = F.concat(
        F.lit(" "), F.replace(sym, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    replaced = F.replace(
        doubled, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
    )
    return F.trim(F.regexp_replace(replaced, " +", " "))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(word, cnt, sym) -> (pair, c): adjacent symbol-pair occurrences
    (every position, within-word repeats included) weighted by word
    count."""
    toks = F.split(F.col("sym"), " ")
    return (
        words.select("cnt", F.explode(grams_col(toks, 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_train(
    spark: SparkSession,
    vocab: DataFrame,
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Learn the first `n_merges` BPE merges over a (term, cnt)
    vocabulary table.  -> (step, lhs, rhs, cnt): the merge sequence,
    step 1-based, winner per step = (count desc, pair asc).

    Raises if the vocabulary runs out of adjacent pairs before
    n_merges — the pinned gate corpus never does, and silently emitting
    fewer rows would desynchronize the unrolled oracle.
    """
    cur = (
        vocab.select(
            F.col("term").alias("word"),
            F.col("cnt").cast("long").alias("cnt"),
            chars_sym_col(F.col("term")).alias("sym"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            best = (
                _pair_counts(cur)
                .orderBy(F.col("c").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not best:
                raise ValueError(
                    f"vocabulary exhausted after {step - 1} merges "
                    f"(wanted {n_merges})"
                )
            a, b = best[0]["pair"].split(" ")
            merges.append((step, a, b, int(best[0]["c"])))
            nxt = cur.withColumn(
                "sym", merge_sym_col(F.col("sym"), a, b)
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()  # materialize before dropping the parent
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, cnt long"
    )


def bpe_train_corpus(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Gate composition: corpus vocabulary (occurrence-weighted word
    dedup) -> learned merge sequence."""
    from .spell import vocab_counts

    return bpe_train(spark, vocab_counts(docs, text_col), n_merges)


def bpe_segment(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge sequence IN ORDER to a (term, cnt)
    vocabulary — the trainer's serve path (how a tokenizer encodes
    text: greedy left-to-right application of each merge in learned
    order).  -> (word, cnt, sym, n_sym): final symbol state and subword
    count per word.

    Map-only: the merge chain is a fixed projection expression — at
    100 TB this runs as whole-stage-codegen'd string ops over the
    vocabulary table (or directly over token streams), no shuffle."""
    sym = chars_sym_col(F.col("term"))
    for a, b in merges:
        sym = merge_sym_col(sym, a, b)
    return vocab.select(
        F.col("term").alias("word"),
        F.col("cnt").cast("long").alias("cnt"),
        sym.alias("sym"),
    ).withColumn("n_sym", F.size(F.split(F.col("sym"), " ")).cast("int"))


def bpe_segment_corpus(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Gate composition: train the merge sequence, then segment the
    vocabulary with it.  The vocabulary feeds training AND segmentation
    — persisted so the tokenizer pass runs once."""
    from .spell import vocab_counts

    vocab = vocab_counts(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        merges = [
            (r.lhs, r.rhs)
            for r in bpe_train(spark, vocab, n_merges).orderBy("step").collect()
        ]
        out = bpe_segment(vocab, merges).localCheckpoint()
    finally:
        vocab.unpersist()
    return out
