#!/bin/sh
# Regenerate tests/fixtures/refrun/ by running the ACTUAL reference
# binaries (/root/reference/*.jar) on the sf0.01 documents corpus.
# The jars resolve everything relative to CWD (data/, utils/stopwords.txt,
# msmarco-test2020-queries.tsv), so each config runs in its own scratch dir.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
OUT="$REPO/tests/fixtures/refrun"
WORK=$(mktemp -d)

python - <<EOF
import duckdb
rows = duckdb.sql("select text from '/root/testdata/sf0.01/documents.parquet' order by doc_id").fetchall()
with open('$WORK/collection.tsv','w') as f:
    for i,(text,) in enumerate(rows):
        f.write(f"{i}\t{text}\n")
EOF
tar -C "$WORK" -czf "$WORK/collection.tar.gz" collection.tsv
cp "$OUT/msmarco-test2020-queries.tsv" "$WORK/"

for parse in true false; do
  d="$WORK/run_$parse"
  mkdir -p "$d/utils"
  cp "$REF/search_engine/utils/stopwords.txt" "$d/utils/"
  cp "$WORK/collection.tar.gz" "$WORK/msmarco-test2020-queries.tsv" "$d/"
  (cd "$d" && java -jar "$REF/indexer.jar" collection.tar.gz $parse true \
    && java -jar "$REF/query_processor.jar" $parse true BM25 true 10 \
    && java -jar "$REF/query_processor.jar" $parse true TFIDF true 10)
  cp "$d"/qres_*.txt "$OUT/"
done
echo "fixtures refreshed in $OUT"

# conjunctive REPL fixture (parsed index, '+' queries via stdin)
d="$WORK/run_true"
python - <<PYEOF
import sys; sys.path.insert(0, "$REPO")
from mircv_project_spark.oracle import CONJ_QUERY_SET
with open("$d/conj_input.txt","w") as f:
    for qid, text in CONJ_QUERY_SET:
        f.write("+" + text + "\n")
    f.write("q\n")
PYEOF
(cd "$d" && java -jar "$REF/query_processor.jar" true true BM25 false 10 \
    < conj_input.txt > conj_raw_out.txt)
python - <<PYEOF
import re, sys; sys.path.insert(0, "$REPO")
from mircv_project_spark.oracle import CONJ_QUERY_SET
raw = open("$d/conj_raw_out.txt").read()
parts = raw.split("Insert new query")[1:]
results = []
for part in parts:
    rows = re.findall(r"^(\d+)\t([0-9.Ee+-]+)\$", part, re.M)
    if rows or "No results found" in part:
        results.append(rows)
results = results[: len(CONJ_QUERY_SET)]
with open("$OUT/conj_BM25_parsed.txt", "w") as f:
    for (qid, _), rows in zip(CONJ_QUERY_SET, results):
        for rank, (pid, score) in enumerate(rows, 1):
            f.write(f"{qid} Q0 {pid} {rank} {score} BM25\n")
PYEOF
