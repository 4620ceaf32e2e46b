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

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.index_build import InvertedIndex, write_index  # noqa: F401 (re-export)
from ..operators.maxscore import TermPostings


@dataclass
class IndexReader:
    postings: DataFrame  # term, df, cf, idf, bm25_ub, tfidf_ub, blocks[, bucket]
    doc_index: DataFrame
    n_docs: int
    sum_doc_len: int
    parse: bool
    codec: str
    term_buckets: int | None = None  # set when reading a bucketed store

    @property
    def avgdl(self) -> float:
        return self.sum_doc_len / float(self.n_docs)

    @classmethod
    def from_memory(cls, index: InvertedIndex) -> "IndexReader":
        return cls(
            postings=index.postings,
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
            doc_index=spark.read.parquet(f"{path}/doc_index"),
            n_docs=stats["n_docs"],
            sum_doc_len=stats["sum_doc_len"],
            parse=stats["parse"],
            codec=stats["codec"],
            term_buckets=int(stats["term_buckets"]),
        )

    def fetch(self, terms: list[str]) -> dict[str, TermPostings]:
        """Collect the posting rows for the given terms (driver-side
        MaxScore input).  Pushes bucket + term predicates down to the
        scan so pruning happens storage-side."""
        terms = sorted(set(terms))
        if not terms:
            return {}
        df = self.postings
        if self.term_buckets and "bucket" in df.columns:
            spark = df.sparkSession
            brows = (
                spark.createDataFrame([(t,) for t in terms], "term string")
                .select(
                    F.pmod(F.xxhash64("term"), F.lit(self.term_buckets)).cast("int")
                )
                .distinct()
                .collect()
            )
            df = df.where(F.col("bucket").isin([r[0] for r in brows]))
        rows = df.where(F.col("term").isin(terms)).select(
            "term", "df", "idf", "bm25_ub", "tfidf_ub", "blocks"
        ).collect()
        return {
            r["term"]: TermPostings(
                term=r["term"],
                df=r["df"],
                idf=r["idf"],
                bm25_ub=r["bm25_ub"],
                tfidf_ub=r["tfidf_ub"],
                blocks=[b.asDict() for b in r["blocks"]],
            )
            for r in rows
        }
