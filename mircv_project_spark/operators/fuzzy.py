"""Fuzzy-term retrieval: BM25/TFIDF over Levenshtein-expanded query
terms (the "match despite typos" serve path).

The reference engine drops OOV query terms silently
(``QueryProcessorMain.java:139-154``); fuzzy retrieval is what a search
engine does instead: expand each query token to every vocabulary term
within edit distance 1 and score the union (Lucene's FuzzyQuery-OR
semantics).

Pinned semantics (restated in oracle._fuzzy_topk_sql — change both or
neither):
- expansion = ALL lexicon terms t' with plain Levenshtein(qt, t') <= 1
  (Levenshtein, not Damerau — the spell_correct pin), including qt
  itself when in-lexicon;
- score(q, d) = sum over expanded pairs (qt, t') of qtf(qt) *
  termscore(t', d): every expansion contributes independently (a doc
  matching two variants scores both — the fuzzy-OR pin);
- ranking (round(score, 6) desc, docid asc), top k.

Scale shape: the naive expansion is a |query terms| x |vocab|
levenshtein join; the engine instead reuses the SymSpell deletion-
neighborhood EQUI-join (operators/spell.py — recall exactly 1 for
lev <= 1, exact post-filter discards false candidates), with the tiny
query-key side broadcast past the map-side-exploded lexicon keys.  The
expanded term table is per-query small and broadcasts into the
postings join; everything downstream is the shared exhaustive-top-k
tail.  The DuckDB oracle states the direct levenshtein join — the two
formulations being equal IS the SymSpell recall theorem the spell
module documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .spell import deletion_keys_col
from .topk import _EMPTY_SCHEMA, _score_and_rank, query_terms


def fuzzy_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
) -> DataFrame:
    """-> DataFrame(qid string, docno string, rank long, score double)."""
    spark = index.flat.sparkSession
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    qdf = spark.createDataFrame(qt_rows, "qid string, qterm string, qtf int")
    qkeys = qdf.select(
        "qid",
        "qterm",
        "qtf",
        F.explode(deletion_keys_col(F.col("qterm"))).alias("k"),
    )
    lkeys = index.lexicon.select(
        "term", "df", F.explode(deletion_keys_col(F.col("term"))).alias("k")
    )
    expanded = (
        lkeys.join(F.broadcast(qkeys), "k")
        .select("qid", "qterm", "qtf", "term", "df")
        .distinct()
        .where(F.levenshtein("qterm", "term") <= 1)
        .drop("qterm")
    )

    matched = index.flat.join(F.broadcast(expanded), "term")
    # conjunctive semantics are undefined under expansion (which of the
    # variants would be "required"?) — disjunctive only, like Lucene
    return _score_and_rank(
        matched, standard, index.n_docs, index.avgdl, k, False, {}
    )


def prefix_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
) -> DataFrame:
    """Wildcard (prefix*) retrieval: every lexicon term starting with
    the query prefix contributes termscore once (wildcard-OR, qtf=1) —
    Lucene's PrefixQuery semantics.  Each query is ONE prefix string.

    Scale shape: expansion is a per-length substring EQUI-join (the
    complete_prefix machinery — a starts_with join condition would
    BNLJ the vocabulary): prefixes group by length, the lexicon gets a
    substr(term, 1, L) key per distinct length, prefixes broadcast.
    Downstream is the shared exhaustive-top-k tail.  The oracle states
    the direct starts_with join.
    """
    spark = index.flat.sparkSession
    pairs = [(qid, p) for qid, p in queries if p]
    if not pairs:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    by_len: dict[int, list[tuple[str, str]]] = {}
    for qid, p in pairs:
        by_len.setdefault(len(p), []).append((qid, p))

    expanded = None
    for length, group in sorted(by_len.items()):
        pdf = spark.createDataFrame(group, "qid string, prefix string")
        keyed = index.lexicon.select(
            "term", "df", F.substring("term", 1, length).alias("prefix")
        )
        part = keyed.join(F.broadcast(pdf), "prefix").select(
            "qid", F.lit(1).alias("qtf"), "term", "df"
        )
        expanded = part if expanded is None else expanded.unionByName(part)

    matched = index.flat.join(F.broadcast(expanded), "term")
    return _score_and_rank(
        matched, standard, index.n_docs, index.avgdl, k, False, {}
    )


def wildcard_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
) -> DataFrame:
    """Infix wildcard (``pre*suf``) retrieval — the permuterm-index
    semantics: a term matches iff it starts with ``pre``, ends with
    ``suf``, and the two literal parts do not overlap
    (``len(term) >= len(pre) + len(suf)``) — exactly the term set of
    SQL ``LIKE 'pre%suf'``, which the oracle states directly.  Every
    matching term contributes termscore once (wildcard-OR, qtf=1),
    completing the prefix*/su*fix/*suffix wildcard family
    (reference drops unmatched terms outright,
    ``queryProcessor/QueryProcessorMain.java:139-154``).

    Scale shape: the classic serve structure is a permuterm index
    (rotate ``term$`` so every infix query becomes a prefix lookup);
    on a columnar lexicon the equivalent EQUI-join is simpler — group
    patterns by (len(pre), len(suf)), key the lexicon scan with
    (substr(term, 1, Lp), substr(reverse(term), 1, Ls)) per distinct
    length pair, broadcast the patterns, and guard
    length(term) >= Lp + Ls map-side.  A LIKE join condition would
    BNLJ the vocabulary (the prefix_topk lesson).  Downstream is the
    shared exhaustive-top-k tail.  Empty sides degenerate correctly
    (substr(t, 1, 0) = '' matches the empty literal), so ``pre*`` and
    ``*suf`` are special cases, but the dedicated operators stay the
    serve path for those.
    """
    spark = index.flat.sparkSession
    parsed = []
    for qid, pat in queries:
        pre, star, suf = pat.partition("*")
        if star != "*":
            continue  # not a wildcard pattern — out of scope by contract
        parsed.append((qid, pre, suf))
    if not parsed:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    by_len: dict[tuple[int, int], list[tuple[str, str, str]]] = {}
    for qid, pre, suf in parsed:
        by_len.setdefault((len(pre), len(suf)), []).append((qid, pre, suf[::-1]))

    expanded = None
    for (lp, ls), group in sorted(by_len.items()):
        pdf = spark.createDataFrame(group, "qid string, pre string, rsuf string")
        keyed = index.lexicon.where(F.length("term") >= lp + ls).select(
            "term",
            "df",
            F.substring("term", 1, lp).alias("pre"),
            F.substring(F.reverse(F.col("term")), 1, ls).alias("rsuf"),
        )
        part = keyed.join(F.broadcast(pdf), ["pre", "rsuf"]).select(
            "qid", F.lit(1).alias("qtf"), "term", "df"
        )
        expanded = part if expanded is None else expanded.unionByName(part)

    matched = index.flat.join(F.broadcast(expanded), "term")
    return _score_and_rank(
        matched, standard, index.n_docs, index.avgdl, k, False, {}
    )


def suffix_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
) -> DataFrame:
    """Leading-wildcard (*suffix) retrieval — the classic reversed-term
    trick: a suffix match on term == a prefix match on reverse(term),
    so the expansion is the SAME per-length substring equi-join as
    prefix_topk over a reversed-term key (Lucene's
    ReversedWildcardFilter).  Every matching term contributes once
    (wildcard-OR, qtf=1); each query is ONE suffix string.

    Scale shape: identical to prefix_topk — the reversed key is a
    map-side expression on the driver-small lexicon scan, suffixes
    broadcast, downstream is the shared exhaustive tail.  A production
    store would persist reverse(term) as an indexed column; computing
    it per query batch reads only lexicon rows."""
    spark = index.flat.sparkSession
    pairs = [(qid, s) for qid, s in queries if s]
    if not pairs:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    by_len: dict[int, list[tuple[str, str]]] = {}
    for qid, s in pairs:
        by_len.setdefault(len(s), []).append((qid, s[::-1]))

    expanded = None
    for length, group in sorted(by_len.items()):
        sdf = spark.createDataFrame(group, "qid string, rsuf string")
        keyed = index.lexicon.select(
            "term",
            "df",
            F.substring(F.reverse(F.col("term")), 1, length).alias("rsuf"),
        )
        part = keyed.join(F.broadcast(sdf), "rsuf").select(
            "qid", F.lit(1).alias("qtf"), "term", "df"
        )
        expanded = part if expanded is None else expanded.unionByName(part)

    matched = index.flat.join(F.broadcast(expanded), "term")
    return _score_and_rank(
        matched, standard, index.n_docs, index.avgdl, k, False, {}
    )
