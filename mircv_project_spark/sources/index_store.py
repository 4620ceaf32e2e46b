"""Query-side index access: lexicon-pruned posting fetch (Q2/S5).

The reference answers a term lookup with a binary search over the
sorted fixed-width lexicon.dat plus positional reads of the posting
byte ranges (``model/Lexicon.java:154-195``, ``model/PostingList.java:43-51``).
Columnar equivalent: the postings table is hash-bucketed by term
(partition column ``bucket``) and term-sorted within files, so

    WHERE bucket IN (<buckets of query terms>) AND term IN (...)

prunes to one partition directory per term (partition pruning) and to
the right row groups (parquet min/max + dictionary filters) — only the
query terms' rows are ever read, scaled across executors.  With an
Iceberg catalog the same predicate hits its bucket-transform partition
spec + column stats; plain parquet keeps identical layout/behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import term_bucket
from ..operators.index_build import InvertedIndex, write_index  # noqa: F401 (re-export)
from ..operators.maxscore import TermPostings


@dataclass
class IndexReader:
    postings: DataFrame  # run-grained: term, run, run_df, ..., blocks[, bucket]
    lexicon: DataFrame  # term, df, cf, idf, bm25_ub, tfidf_ub, n_runs[, bucket]
    doc_index: DataFrame
    n_docs: int
    sum_doc_len: int
    parse: bool
    codec: str
    term_buckets: int | None = None  # set when reading a bucketed store
    # driver-side term cache — the columnar analog of the reference's
    # lexicon-entry singleton cache (model/Lexicon.java:137-146), except
    # bounded instead of cleared per query; absent terms cache as None
    # so repeated misses don't re-scan.
    cache_size: int = 50_000
    _cache: dict = field(default_factory=dict, repr=False)

    @property
    def avgdl(self) -> float:
        return self.sum_doc_len / float(self.n_docs)

    @classmethod
    def from_memory(cls, index: InvertedIndex) -> "IndexReader":
        return cls(
            postings=index.postings,
            lexicon=index.lexicon,
            doc_index=index.doc_index,
            n_docs=index.n_docs,
            sum_doc_len=index.sum_doc_len,
            parse=index.parse,
            codec=index.codec,
            term_buckets=index.term_buckets,
        )

    @classmethod
    def from_dir(cls, spark: SparkSession, path: str) -> "IndexReader":
        stats = spark.read.parquet(f"{path}/stats").collect()[0]
        return cls(
            postings=spark.read.parquet(f"{path}/postings"),
            lexicon=spark.read.parquet(f"{path}/lexicon"),
            doc_index=spark.read.parquet(f"{path}/doc_index"),
            n_docs=stats["n_docs"],
            sum_doc_len=stats["sum_doc_len"],
            parse=stats["parse"],
            codec=stats["codec"],
            term_buckets=int(stats["term_buckets"]),
        )

    def as_index_view(self, terms: list[str] | None = None) -> "InvertedIndex":
        """A flat-postings VIEW over the compressed store, so every
        InvertedIndex-based serve path (filtered/fuzzy/prefix/QLD/
        champion retrieval) runs against a persisted index too.  The
        ``flat`` DataFrame decodes blocks lazily (one Arrow-batched
        numpy decode per block — the same kernel as topk_from_blocks).

        Catalyst cannot push a term filter below the mapInPandas decode
        stage, so pass ``terms`` to prune the postings scan (bucket +
        parquet min/max, the Q2 path) BEFORE any block decodes — the
        caller knows its (expanded) term set up front on every serve
        path.  terms=None decodes the whole store (gate-scale only)."""
        from ..operators.topk import _decode_blocks_df

        postings = (
            self._prune(self.postings, sorted(set(terms)))
            if terms is not None
            else self.postings
        )
        blocks = postings.select("term", F.explode("blocks").alias("b"))
        flat = _decode_blocks_df(blocks, self.codec)
        return InvertedIndex(
            tokenized=None,
            doc_index=self.doc_index,
            flat=flat,
            postings=self.postings,
            lexicon=self.lexicon,
            n_docs=self.n_docs,
            sum_doc_len=self.sum_doc_len,
            parse=self.parse,
            codec=self.codec,
            term_buckets=self.term_buckets or 0,
        )

    def _buckets_of(self, spark, terms: list[str]) -> list[int]:
        # driver-local hash, bit-identical to the F.xxhash64 that wrote
        # the bucket column (functions/hashing.py parity test) — a cold
        # query batch pays zero Spark jobs for bucket resolution
        return sorted({term_bucket(t, self.term_buckets) for t in terms})

    def _prune(self, df: DataFrame, terms: list[str]) -> DataFrame:
        if self.term_buckets and "bucket" in df.columns:
            buckets = self._buckets_of(df.sparkSession, terms)
            df = df.where(F.col("bucket").isin(buckets))
        return df.where(F.col("term").isin(terms))

    def fetch(self, terms: list[str]) -> dict[str, TermPostings]:
        """Collect lexicon entries + posting runs for the given terms
        (driver-side MaxScore input).  Bucket + term predicates push
        down to both scans; a term's runs concatenate in run order
        (disjoint, increasing docId ranges by construction).  Cached
        terms (including negative lookups) skip Spark entirely."""
        wanted = sorted(set(terms))
        out = {
            t: self._cache[t]
            for t in wanted
            if t in self._cache and self._cache[t] is not None
        }
        terms = [t for t in wanted if t not in self._cache]
        if not terms:
            return out
        fetched = self._fetch_uncached(terms)
        if len(self._cache) + len(terms) > self.cache_size:
            self._cache.clear()  # simple bound; reference clears per query
        for t in terms:
            self._cache[t] = fetched.get(t)
        out.update(fetched)
        return out

    def _fetch_uncached(self, terms: list[str]) -> dict[str, TermPostings]:
        # the lexicon and postings scans are independent pruned reads —
        # submit both Spark jobs concurrently (a cold batch's wall time
        # is job overhead, not data volume; the scheduler interleaves
        # their tasks across the same executors)
        from concurrent.futures import ThreadPoolExecutor

        def _lex_rows():
            return (
                self._prune(self.lexicon, terms)
                .select("term", "df", "idf", "bm25_ub", "tfidf_ub")
                .collect()
            )

        def _post_rows():
            return (
                self._prune(self.postings, terms)
                .select("term", "run", "blocks")
                .collect()
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            lex_f = pool.submit(_lex_rows)
            post_rows = _post_rows()
            lex = {r["term"]: r for r in lex_f.result()}
        runs: dict[str, list] = {}
        for r in post_rows:
            runs.setdefault(r["term"], []).append((r["run"], r["blocks"]))
        out = {}
        for term, lrow in lex.items():
            blocks = []
            for _, bl in sorted(runs.get(term, []), key=lambda x: x[0]):
                blocks.extend(b.asDict() for b in bl)
            out[term] = TermPostings(
                term=term,
                df=lrow["df"],
                idf=lrow["idf"],
                bm25_ub=lrow["bm25_ub"],
                tfidf_ub=lrow["tfidf_ub"],
                blocks=blocks,
            )
        return out
