"""PySpark-native full-text indexing + BM25/TFIDF retrieval engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference engine (DavideBruni/MIRCV_project, a single-node Java SPIMI
inverted-index builder + MaxScore query processor), re-expressed as
idiomatic PySpark over a table of conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Subpackages
-----------
functions  : tokenizer (vectorized pandas UDF), Porter stemmer, posting
             codecs (varbyte / Elias-gamma / unary over numpy), text stats.
sources    : transcript table derivation/synthesis, docid assignment,
             parquet/iceberg-style catalog IO.
operators  : index build (salted two-stage groupBy), scoring (BM25/TFIDF),
             exhaustive distributed top-k, driver-side MaxScore DAAT,
             dedup / similarity / multimodal pipeline operators.
streaming  : incremental index maintenance via Structured Streaming.
"""

__version__ = "0.1.0"
