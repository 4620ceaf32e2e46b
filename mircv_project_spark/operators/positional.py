"""Positional inverted index + phrase queries served FROM the store.

The reference index is bag-of-words — (docId, tf) pairs only
(search_engine/src/main/.../model/InvertedIndex.java), so
`operators/phrase.py` answers phrase queries by re-scanning the corpus
token stream.  That is the right one-off shape, but an engine serving
phrase queries repeatedly stores POSITIONS: this module adds the
positional layout and the query path that answers the same pinned
phrase set from the persisted store without touching the corpus.

Layout (columnar, same philosophy as sources/index_store.py: let
parquet be the codec):

    (bucket, term, id, positions array<int>)

- `bucket = pmod(xxhash64(term), n_buckets)` — the SAME hash family as
  the postings/lexicon store, so a query's terms resolve to buckets
  driver-locally (functions/hashing.term_bucket, bit-parity-tested)
  and the scan prunes to one partition directory per term plus parquet
  min/max row-group skipping on the term-sorted files.
- positions are 0-based token offsets, ascending; parquet's
  delta/dictionary encodings are the positional d-gap compression a
  row engine would hand-roll (positions dominate positional-index
  size; the column never decodes through Python).

Phrase evaluation (pinned semantics shared with operators/phrase.py and
the SAME oracle SQL): a phrase t_0..t_{n-1} occurs at position p iff
p + i is in positions(t_i, doc) for every i, so

    n_hits(doc) = |array_intersect_i (positions_i - i)|

counting OVERLAPPING occurrences exactly (positions are distinct within
a doc).  Pure Catalyst: per-term shifted-position projections, an
id-keyed inner-join chain (bounded by the rarest term's df — the
positional analog of conjunctive DAAT), one array_intersect fold, the
shared (n_hits desc, id asc) top-k window.  Nothing is per-row Python.

Scale shape (100 TB): the build is one tokenizer pass + posexplode +
one (term, id) groupBy (map-side combined after the explode's
repartition); the query path reads ONLY the pruned buckets, joins only
the phrase terms' posting rows, and the final window sees candidate
docs, never the corpus.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import term_bucket
from ..functions.textnorm import tokens_col
from ..functions.tokenizer import tokenize
from .. import config

PHRASE_K = 10


def build_positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = config.POSTINGS_TERM_BUCKETS,
) -> DataFrame:
    """-> (bucket, term, id, positions): ascending 0-based token
    offsets per (term, doc)."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )
    return toks.groupBy("term", "id").agg(
        F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias(
            "positions"
        )
    ).select(
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias(
            "bucket"
        ),
        "term",
        "id",
        "positions",
    )


def write_positional_index(pos_df: DataFrame, path: str) -> None:
    """Persist bucket-partitioned, term-sorted within files (partition
    pruning + row-group min/max skipping on the query path)."""
    (
        pos_df.repartition("bucket")
        .sortWithinPartitions("term", "id")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )


def load_positional_postings(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def phrase_topk_positional(
    pos_df: DataFrame,
    phrases: list[tuple[str, str]],
    k: int = PHRASE_K,
    n_buckets: int | None = config.POSTINGS_TERM_BUCKETS,
) -> DataFrame:
    """-> (qid, id, n_hits, rank): the phrase.py result served from the
    positional store.  `n_buckets` must match the build (None skips the
    bucket predicate, e.g. for an unpartitioned in-memory frame)."""
    parsed: list[tuple[str, list[str]]] = []
    for qid, p in phrases:
        ptoks = tokenize(p, False)
        if ptoks:
            parsed.append((qid, ptoks))
    all_terms = sorted({t for _, ptoks in parsed for t in ptoks})
    pruned = pos_df
    if n_buckets and "bucket" in pos_df.columns:
        buckets = sorted({term_bucket(t, n_buckets) for t in all_terms})
        pruned = pruned.where(F.col("bucket").isin(buckets))
    pruned = pruned.where(F.col("term").isin(all_terms)).persist()
    try:
        branches = []
        for qid, ptoks in parsed:
            parts = [
                pruned.where(F.col("term") == t).select(
                    "id",
                    F.transform(
                        "positions", _shift_by(i)
                    ).alias(f"a{i}"),
                )
                for i, t in enumerate(ptoks)
            ]
            joined = reduce(lambda l, r: l.join(r, "id"), parts)
            hits = reduce(
                lambda acc, i: F.array_intersect(acc, F.col(f"a{i}")),
                range(1, len(ptoks)),
                F.col("a0"),
            )
            branches.append(
                joined.select(
                    F.lit(qid).alias("qid"),
                    "id",
                    F.size(hits).cast("long").alias("n_hits"),
                ).where(F.col("n_hits") >= 1)
            )
        allm = reduce(DataFrame.unionByName, branches)
        w = Window.partitionBy("qid").orderBy(
            F.col("n_hits").desc(), F.col("id").asc()
        )
        out = (
            allm.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("qid", "id", "n_hits", F.col("rank").cast("long").alias("rank"))
            .localCheckpoint()
        )
    finally:
        pruned.unpersist()
    return out


def _shift_by(i: int):
    """Closure-building helper: a bare lambda inside F.transform must
    keep single arity (the CLAUDE.md lambda-arity gotcha)."""
    return lambda p: p - i


PROX_SLOP = 3
PROX_K = 10


def _exists_chain(parts_cols: list, slop: int):
    """Nested existential chain over raw position arrays: a position
    p0 of term 0 is a hit iff there exist ordered positions p1, p2, ...
    with p_{i+1} in (p_i, p_i + slop].  FULL existential semantics —
    greedy minimal-next chaining is NOT equivalent (pos2=[2,4],
    pos3=[7], slop 3, p1=1: greedy picks 2 and dies, the 4-chain
    succeeds), so both engines restate the nested EXISTS verbatim."""

    n = len(parts_cols)

    # closures built by named helpers, never default-arg lambdas —
    # an extra default parameter flips Spark's inferred lambda arity
    # to (element, index) (the CLAUDE.md gotcha)
    def pred_given(i: int, prev):
        def pred(p):
            ok = (p > prev) & (p <= prev + slop)
            if i < n - 1:
                return ok & F.exists(parts_cols[i + 1], pred_given(i + 1, p))
            return ok

        return pred

    def first(p0):
        return F.exists(parts_cols[1], pred_given(1, p0))

    return F.size(F.filter(parts_cols[0], first))


def proximity_topk_positional(
    pos_df: DataFrame,
    phrases: list[tuple[str, str]],
    slop: int = PROX_SLOP,
    k: int = PROX_K,
    n_buckets: int | None = config.POSTINGS_TERM_BUCKETS,
) -> DataFrame:
    """Sloppy-phrase (proximity) search from the positional store:
    -> (qid, id, n_hits, rank) where n_hits counts first-term positions
    that begin an ordered within-slop chain of all query terms
    (slop = 1 degenerates to the exact-phrase adjacency).  Pinned:
    rank (n_hits desc, id asc) top k; zero-hit docs emit nothing.

    Same pruned-scan + id-keyed join shape as phrase_topk_positional;
    the chain check is a nested higher-order-function expression over
    the joined position arrays — per-doc cost bounded by the terms'
    in-doc frequencies, no Python."""
    parsed: list[tuple[str, list[str]]] = []
    for qid, p in phrases:
        ptoks = tokenize(p, False)
        if len(ptoks) >= 2:
            parsed.append((qid, ptoks))
    all_terms = sorted({t for _, ptoks in parsed for t in ptoks})
    pruned = pos_df
    if n_buckets and "bucket" in pos_df.columns:
        buckets = sorted({term_bucket(t, n_buckets) for t in all_terms})
        pruned = pruned.where(F.col("bucket").isin(buckets))
    pruned = pruned.where(F.col("term").isin(all_terms)).persist()
    try:
        branches = []
        for qid, ptoks in parsed:
            parts = [
                pruned.where(F.col("term") == t).select(
                    "id", F.col("positions").alias(f"p{i}")
                )
                for i, t in enumerate(ptoks)
            ]
            joined = reduce(lambda l, r: l.join(r, "id"), parts)
            hits = _exists_chain(
                [F.col(f"p{i}") for i in range(len(ptoks))], slop
            )
            branches.append(
                joined.select(
                    F.lit(qid).alias("qid"),
                    "id",
                    hits.cast("long").alias("n_hits"),
                ).where(F.col("n_hits") >= 1)
            )
        allm = reduce(DataFrame.unionByName, branches)
        w = Window.partitionBy("qid").orderBy(
            F.col("n_hits").desc(), F.col("id").asc()
        )
        out = (
            allm.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "qid", "id", "n_hits",
                F.col("rank").cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    finally:
        pruned.unpersist()
    return out


def append_positional_epoch(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = config.POSTINGS_TERM_BUCKETS,
) -> None:
    """Grow a positional store with a NEW batch of documents — a pure
    parquet append into the same bucket partitions.

    Positional postings are per-(term, doc) rows and documents are
    immutable, so incremental growth needs NO merge and NO stat
    recompute (contrast streaming/incremental.compact_index, where
    BM25 upper bounds depend on corpus-wide avgdl and runs must stay
    docid-disjoint).  The caller's contract is append-only NEW doc ids;
    each epoch's files are term-sorted internally, so row-group min/max
    pruning still applies per file."""
    pos = build_positional_postings(new_docs, id_col, text_col, n_buckets)
    (
        pos.repartition("bucket")
        .sortWithinPartitions("term", "id")
        .write.partitionBy("bucket")
        .mode("append")
        .parquet(path)
    )


UW_WIDTH = 6  # unordered-window width in tokens (Indri #uwN's N)


def _uw_hits(parts_cols: list, width: int):
    """Unordered-window hit count: anchor positions p of term 0 such
    that EVERY other term has a position within [p-(W-1), p+(W-1)].
    Flat (non-nested) existentials — order between the other terms
    does not matter, which is exactly what distinguishes #uwN from
    the ordered slop chain."""

    def near(p):
        def q_ok(q):
            return (q >= p - (width - 1)) & (q <= p + (width - 1))

        return q_ok

    def anchor_ok(p):
        cond = None
        for c in parts_cols[1:]:
            e = F.exists(c, near(p))
            cond = e if cond is None else (cond & e)
        return cond

    return F.size(F.filter(parts_cols[0], anchor_ok))


def uw_proximity_topk_positional(
    pos_df: DataFrame,
    phrases: list[tuple[str, str]],
    width: int = UW_WIDTH,
    k: int = PROX_K,
    n_buckets: int | None = config.POSTINGS_TERM_BUCKETS,
) -> DataFrame:
    """Unordered-window proximity (Indri's #uwN) from the positional
    store: -> (qid, id, n_hits, rank) where n_hits counts first-term
    anchor positions around which every query term occurs within
    width-1 tokens, in ANY order — the symmetric sibling of
    proximity_topk_positional's ordered chains.  Pinned: anchor = the
    query's FIRST token's positions (restated verbatim in the
    oracle), rank (n_hits desc, id asc) top k, zero-hit docs emit
    nothing.

    Same pruned-scan + id-keyed join shape as the ordered operator;
    the window check is flat per-term existentials over the joined
    position arrays — no Python, per-doc cost bounded by in-doc tf."""
    parsed: list[tuple[str, list[str]]] = []
    for qid, p in phrases:
        ptoks = tokenize(p, False)
        if len(ptoks) >= 2:
            parsed.append((qid, ptoks))
    all_terms = sorted({t for _, ptoks in parsed for t in ptoks})
    pruned = pos_df
    if n_buckets and "bucket" in pos_df.columns:
        buckets = sorted({term_bucket(t, n_buckets) for t in all_terms})
        pruned = pruned.where(F.col("bucket").isin(buckets))
    pruned = pruned.where(F.col("term").isin(all_terms)).persist()
    try:
        branches = []
        for qid, ptoks in parsed:
            parts = [
                pruned.where(F.col("term") == t).select(
                    "id", F.col("positions").alias(f"p{i}")
                )
                for i, t in enumerate(ptoks)
            ]
            joined = reduce(lambda l, r: l.join(r, "id"), parts)
            hits = _uw_hits(
                [F.col(f"p{i}") for i in range(len(ptoks))], width
            )
            branches.append(
                joined.select(
                    F.lit(qid).alias("qid"),
                    "id",
                    hits.cast("long").alias("n_hits"),
                ).where(F.col("n_hits") >= 1)
            )
        allm = reduce(DataFrame.unionByName, branches)
        w = Window.partitionBy("qid").orderBy(
            F.col("n_hits").desc(), F.col("id").asc()
        )
        out = (
            allm.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "qid", "id", "n_hits",
                F.col("rank").cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    finally:
        pruned.unpersist()
    return out
